#!/usr/bin/env python3
"""Cross-run determinism check (not part of the Scala library): two
Verify output dirs produced with different parallelism must contain
identical row multisets per query. Usage:

    python3 tools/determinism_check.py /tmp/out_a /tmp/out_b
"""
import sys, os, glob
import pandas as pd


def load(out, name):
    files = glob.glob(f"{out}/{name}/*.parquet")
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a) if os.path.isdir(f"{a}/{d}"))
    bad = 0
    for name in names:
        if not os.path.isdir(f"{b}/{name}"):
            print(f"✗ {name}: missing in {b}")
            bad += 1
            continue
        da, db = load(a, name), load(b, name)
        try:
            pd.testing.assert_frame_equal(da, db, check_dtype=False, check_exact=True)
            print(f"✓ {name}: {len(da)} rows identical")
        except AssertionError as e:
            print(f"✗ {name}: NONDETERMINISTIC\n{str(e)[:300]}")
            bad += 1
    print(("FAIL" if bad else "PASS") + f" ({len(names)} queries)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (NOT part of the
Scala library). Usage:

    python3 tools/local_check.py /tmp/verify_out [sf_dir]

after running:  sbt "runMain graft.Verify <sf_dir> /tmp/verify_out"

Mimics the driver: for each query parquet in <out>, run the matching
oracle_sql.json entry in DuckDB with the sf_dir tables registered as
views, sort columns by name, and compare values row-for-row.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def canon(g: pd.DataFrame, w: pd.DataFrame):
    """Reconcile representation-only dtype differences (date objects vs
    datetime64, nullable-int-as-float) without weakening value compare."""
    import datetime
    for c in g.columns:
        gc, wc = g[c], w[c]
        gdt = str(gc.dtype).startswith("datetime") or (
            gc.dtype == object and gc.dropna().map(lambda x: isinstance(x, datetime.date)).all() and len(gc.dropna()))
        wdt = str(wc.dtype).startswith("datetime") or (
            wc.dtype == object and wc.dropna().map(lambda x: isinstance(x, datetime.date)).all() and len(wc.dropna()))
        if gdt or wdt:
            g[c] = pd.to_datetime(gc).astype("datetime64[ns]")
            w[c] = pd.to_datetime(wc).astype("datetime64[ns]")
        elif gc.dtype != wc.dtype and pd.api.types.is_numeric_dtype(gc) and pd.api.types.is_numeric_dtype(wc):
            if pd.api.types.is_integer_dtype(gc) and pd.api.types.is_integer_dtype(wc):
                # width-only difference: nullable Int64 keeps values above
                # 2^53 exact, where a float64 cast would silently collide
                g[c] = gc.astype("Int64")
                w[c] = wc.astype("Int64")
            else:
                g[c] = gc.astype("float64")
                w[c] = wc.astype("float64")
    return g, w


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    n_pass = n_fail = n_noracle = 0
    # a registered query with no result dir (or an _ERROR.txt marker) is a
    # FAILURE, not an absence — round 9's correctness gate silently shrank
    # from 129 to 110 because missing dirs were simply skipped
    errors = {}
    err_path = f"{out}/errors.json"
    if os.path.exists(err_path):
        errors = json.load(open(err_path))
    attempted = set(oracle)
    att_path = f"{out}/attempted.json"
    if os.path.exists(att_path):
        attempted = set(json.load(open(att_path)))
    # EVERY attempted query must leave a dir — including rows-only ones
    # (no oracle entry); intersecting with oracle keys would re-open the
    # silent-absence hole for that class
    missing = sorted(attempted - set(names))
    for name in missing:
        msg = errors.get(name, "no result dir written")
        print(f"✗ {name}: MISSING ({msg[:160]})")
        n_fail += 1
    for name in names:
        if os.path.exists(f"{out}/{name}/_ERROR.txt"):
            msg = open(f"{out}/{name}/_ERROR.txt").read().splitlines()
            print(f"✗ {name}: QUERY FAILED ({(msg[1] if len(msg) > 1 else '?')[:160]})")
            n_fail += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"✗ {name}: EMPTY RESULT DIR (no parquet written)")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL FAILED: {e}")
            n_fail += 1
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) == list(w.columns):
            g, w = canon(g, w)
            g = norm(g)
            w = norm(w)
        if list(g.columns) != list(w.columns):
            print(f"✗ {name}: column mismatch spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"✗ {name}: row count spark={len(g)} duck={len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"✓ {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as e:
            print(f"✗ {name}: VALUE MISMATCH\n{str(e)[:500]}")
            # show first differing rows
            neq = (g != w) & ~(g.isna() & w.isna())
            rows = neq.any(axis=1)
            if rows.any():
                i = rows.idxmax()
                print("  spark:", g.loc[i].to_dict())
                print("  duck :", w.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

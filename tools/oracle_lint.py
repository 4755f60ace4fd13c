#!/usr/bin/env python3
"""Oracle type-drift lint (NOT part of the Scala library).

The t60 incident (round 16): DuckDB window `sum(BIGINT)` returns
HUGEINT, and an uncast `(cum - 1) // 256` stays HUGEINT; pandas-side
canonicalization hid the drift locally while the driver's stricter
hasher flagged it. The class is "an oracle output column whose DuckDB
type is not portably hashable" — so this lint is semantic, not
textual: it DESCRIBEs every oracle SQL against the sf tables and
fails on any output column type outside the allowlist below.

Usage:
    python3 tools/oracle_lint.py <oracle_sql.json> [sf_dir]

Exit 0 = all oracles clean; exit 1 = at least one flagged column,
each printed as  name.column: TYPE.
"""
import sys, os, json, re
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types the driver's hasher and pandas agree on byte-for-byte.
# HUGEINT/UHUGEINT (window sums, // on them), DECIMAL (sum(DOUBLE)
# never yields it, but sum(DECIMAL) would), and unsigned ints are
# exactly the drift class — keep them out.
ALLOWED = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|DATE|BOOLEAN"
    r"|TIMESTAMP(?: WITH TIME ZONE)?|BLOB"
    r"|(?:BIGINT|INTEGER|DOUBLE|FLOAT|VARCHAR)\[\])$")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    oracle = json.load(open(path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    flagged, checked = [], 0
    for name in sorted(oracle):
        sql = oracle[name]
        if not sql:
            continue
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            flagged.append((name, "<describe failed>", str(e).splitlines()[0]))
            continue
        checked += 1
        for cname, ctype, *_ in cols:
            if not ALLOWED.match(ctype):
                flagged.append((name, cname, ctype))
    for name, col, typ in flagged:
        print(f"FLAG {name}.{col}: {typ}")
    print(f"{checked} oracles checked, {len(flagged)} flagged columns")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

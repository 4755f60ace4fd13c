#!/usr/bin/env python3
"""Derive k-fold scale replicas of /root/testdata/sf0.1 for the
SCALING.md sweeps past the driver-provided sfs (sf0.2 = 2x, sf0.5 = 5x).

Replica k > 0 gets a distinct key block per table (ids + M*k) so FK
joins stay within-replica, plus content perturbation so replicas are
near-dups of their SOURCE rather than byte-dups of each other:
documents get an 'r<k> ' token prefix, embeddings a first-component
nudge by an exact binary fraction, labels a per-replica offset (the
block-key-cardinality-grows-with-data contract). events keeps its
TIMESTAMP(NANOS) physical type via pyarrow (DuckDB COPY would truncate
to micros and break nanosAsLong readers).

Usage: python3 tools/make_scale_replicas.py [outRoot=/tmp/graft_scale]
"""
import sys, os, shutil
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
M = 10_000_000
KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}


def events(out, mult):
    t = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for k in range(mult):
        cols = {}
        for name in t.schema.names:
            col = t[name]
            if name in ("user_id", "event_id"):
                col = pc.add(col, pa.scalar(k * M, type=pa.int64()))
            cols[name] = col
        parts.append(pa.table(cols))
    merged = pa.concat_tables(parts).replace_schema_metadata(None)
    pq.write_table(merged, f"{out}/events.parquet", coerce_timestamps=None)


def main(root):
    con = duckdb.connect()
    for mult, name in ((2, "sf0.2"), (5, "sf0.5")):
        out = f"{root}/{name}"
        os.makedirs(out, exist_ok=True)
        for t in ("nation", "region"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        for t, ks in KEYS.items():
            cols = [c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM parquet_scan('{SRC}/{t}.parquet')").fetchall()]
            sel = ", ".join(
                f"{c} + k.k * {M} AS {c}" if c in ks else c for c in cols)
            con.execute(f"""
              COPY (SELECT {sel} FROM parquet_scan('{SRC}/{t}.parquet')
                    CROSS JOIN (SELECT unnest(range({mult})) AS k) k)
              TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
        # replica id blocks must not overlap: derive each offset from the
        # source table's max id (rounded up to a clean decade) instead of
        # assuming the corpus stays under a hardcoded 1e6 rows
        def id_offset(table, idcol):
            mx = con.execute(
                f"SELECT max({idcol}) FROM parquet_scan('{SRC}/{table}.parquet')").fetchone()[0]
            off = 10 ** max(6, len(str(int(mx))))
            assert mx < off, (table, mx, off)
            return off
        doc_off = id_offset("documents", "doc_id")
        vec_off = id_offset("embeddings", "vec_id")
        con.execute(f"""
          COPY (
            SELECT doc_id + k.k * {doc_off} AS doc_id,
                   CASE WHEN k.k = 0 THEN text
                        ELSE 'r' || k.k || ' ' || text END AS text,
                   lang, source, n_chars
            FROM parquet_scan('{SRC}/documents.parquet')
            CROSS JOIN (SELECT unnest(range({mult})) AS k) k
          ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
          COPY (
            SELECT vec_id + k.k * {vec_off} AS vec_id,
                   CASE WHEN k.k = 0 THEN embedding
                        ELSE list_prepend(
                          CAST(embedding[1] + k.k * 0.001953125 AS FLOAT),
                          embedding[2:]) END AS embedding,
                   CAST(label + k.k * 100000 AS INTEGER) AS label
            FROM parquet_scan('{SRC}/embeddings.parquet')
            CROSS JOIN (SELECT unnest(range({mult})) AS k) k
          ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
        events(out, mult)
        print(name, "written to", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale")

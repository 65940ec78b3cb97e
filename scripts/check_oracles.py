#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, compare row count, column names, and an order-insensitive
value hash (columns sorted by name, floats normalized).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, ".")


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from crocodile_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    # optional driver-artifact-shaped JSON record (CHECK_ORACLES_JSON=path)
    import json
    import os

    json_out = os.environ.get("CHECK_ORACLES_JSON")
    records: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}"))
            print(f"FAIL  {name}: spark error {str(ex)[:200]}")
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"spark: {str(ex)[:200]}"}
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only check, {len(srows)} rows")
            if len(srows) == 0 and name not in ("dedup_exact",):
                failures.append((name, "0 rows in rows-only check"))
            records[name] = {"rows_only": True, "spark_rows": len(srows), "err": None}
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {str(ex)[:200]}"))
            print(f"FAIL  {name}: duckdb error {str(ex)[:200]}")
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(srows),
                             "oracle_rows": None,
                             "err": f"duckdb: {str(ex)[:200]}"}
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = table_hash(srows, scols)
            dh = table_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                aset = {"|".join(norm_cell(r[i]) for i in order_s) for r in srows}
                bset = {"|".join(norm_cell(r[i]) for i in order_d) for r in drows}
                for x in sorted(aset - bset)[:3]:
                    print(f"        spark-only: {x[:160]}")
                for x in sorted(bset - aset)[:3]:
                    print(f"        duck-only:  {x[:160]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(srows)} rows match")
        records[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": "; ".join(problems) if problems else None,
        }

    if json_out:
        records["_meta"] = {
            "generated_by": "scripts/check_oracles.py",
            "sf_dir": sf_dir,
            "queries": len([k for k in records if k != "_meta"]),
            "all_pass": not failures,
        }
        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=1)

    print()
    if failures:
        print(f"{len(failures)} FAILURES:", [f[0] for f in failures])
        sys.exit(1)
    print("ALL ORACLE CHECKS PASS")


if __name__ == "__main__":
    main()

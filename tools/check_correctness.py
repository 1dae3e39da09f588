"""Dev harness mimicking the driver: run each registry query in Spark and its
oracle in DuckDB at sf0.01, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [--json out.json] [query_name ...]

--json writes a driver-format result map for EVERY checked query — the
committed CORRECTNESS_FULL_r{N}.json artifact that covers the queries past
the driver's 50-entry window.
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    from deepcrawl4ai_spark.registry import QUERIES, ORACLES
    from deepcrawl4ai_spark.session import get_spark

    global SF_DIR
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print(
                "usage: check_correctness.py [--json OUT.json]"
                " [--sf-dir DIR] [name ...]"
            )
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    # tri-SF robustness sweeps (late r5): the same gate at any scale factor
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        if i + 1 >= len(argv):
            print(
                "usage: check_correctness.py [--json OUT.json]"
                " [--sf-dir DIR] [name ...]"
            )
            return 2
        SF_DIR = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv or list(QUERIES)
    results: dict[str, dict] = {}

    def record(name, s_rows=None, d_rows=None, schema=None, hash_ok=None, err=None):
        results[name] = {
            "rows_match": (
                s_rows is not None and d_rows is not None and s_rows == d_rows
            ),
            "schema_match": bool(schema),
            "hash_match": bool(hash_ok),
            "spark_rows": s_rows,
            "oracle_rows": d_rows,
            "err": err,
        }
    spark = get_spark("check_correctness", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        if name not in QUERIES:
            print(f"FAIL  {name}: unknown query (known: {sorted(QUERIES)[:5]}...)")
            failures += 1
            continue
        fn = QUERIES[name]
        try:
            sdf = fn(spark, SF_DIR)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            record(name, err=f"spark error: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"weak  {name}: rows={len(s_rows)} (no oracle)")
            record(name, s_rows=len(s_rows), err="no oracle (rows-only)")
            continue
        try:
            res = con.execute(ORACLES[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            record(name, s_rows=len(s_rows), err=f"duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            sh = value_hash(s_rows, s_cols)
            dh = value_hash(d_rows, d_cols)
            if sh != dh:
                problems.append("value-hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sset = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                dset = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(sset, dset):
                    if a != b:
                        problems.append(f"first diff:\n  spark: {a}\n  duck : {b}")
                        break
        record(
            name,
            s_rows=len(s_rows),
            d_rows=len(d_rows),
            schema=sorted(s_cols) == sorted(d_cols),
            hash_ok=not problems,
            err="; ".join(problems) or None,
        )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok    {name}: rows={len(s_rows)}")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

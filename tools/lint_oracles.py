"""Registry-wide oracle output-type lint (VERDICT r5 #1).

The driver's harness normalizes DuckDB HUGEINT (int128) / DECIMAL cells
differently from this repo's ``fetchall()``-based mimic — an uncast
``sum(BIGINT)`` (HUGEINT) in an oracle's OUTPUT schema is a latent driver
hash-mismatch even when the values are numerically identical (the r05
``bpe_merges`` red row). This lint binds every registered oracle against
the sf0.001 views and fails if any output column types to HUGEINT or
DECIMAL. Binding only — no query execution — so the whole registry lints
in seconds.

Usage: PYTHONPATH=. python tools/lint_oracles.py [--sf-dir DIR]
Run every round before refreshing CORRECTNESS_FULL_r{N}.json.
"""

from __future__ import annotations

import sys

import duckdb

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FORBIDDEN = ("HUGEINT", "DECIMAL")


def main() -> int:
    from deepcrawl4ai_spark.registry import ORACLES

    sf_dir = SF_DIR
    argv = sys.argv[1:]
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, sql in ORACLES.items():
        try:
            rel = con.sql(sql)  # binds (types resolved) without executing
            types = [str(t).upper() for t in rel.types]
            cols = rel.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle does not bind: {e}")
            failures += 1
            continue
        bad = [
            (c, t)
            for c, t in zip(cols, types)
            if any(f in t for f in FORBIDDEN)
        ]
        if bad:
            print(
                f"FAIL  {name}: forbidden output type(s) "
                + ", ".join(f"{c}:{t}" for c, t in bad)
                + " — CAST to BIGINT/DOUBLE in the oracle"
            )
            failures += 1
    print(
        f"linted {len(ORACLES)} oracles: "
        + ("ALL CLEAN" if not failures else f"{failures} FAILED")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""DuckDB-side timing companion to bench.py.

Times the DuckDB oracle SQL of every bench-flagged query on the same
parquet tables bench.py runs against, printing one JSON line. Together
with BENCH_r{N}.json this gives a same-machine single-node baseline for
the headline queries (BASELINE.md publishes no reference numbers — the
reference is a ~15-row/day cron script — so the oracle engine is the
honest throughput yardstick at test scale).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_oracle.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from supabase_etl_spark.queries import load_all

    bench_set = {
        n: s for n, s in load_all().items() if s.bench and s.oracle is not None
    }

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    total = 0.0
    for name in sorted(bench_set):
        sql = bench_set[name].oracle
        best = None
        for _ in range(2):  # best-of-2, mirroring bench.py
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s", flush=True)

    print(
        json.dumps(
            {
                "metric": "bench_oracle_duckdb_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Full-surface oracle validation at an arbitrary scale factor — the
repo-side superset of the driver's sf0.01 CORRECTNESS gate (which caps at
50 rows): every `queries()` entry with an `oracle_sql()` twin runs on
--sf-dir, compared on row count, column names, normalized Arrow types and
values (column-name-sorted, row-order-insensitive).

Usage:
    python tools/validate_oracles.py [--sf-dir /root/testdata/sf0.01]
                                     [--skip name,name,...] [--only n1,n2]

Prints one JSON line per query and a summary line; exit code 1 on any
mismatch. Heavy O(n^2)/recursive-CTE oracles can be skipped at sf0.1 with
--skip (the engine side of those still runs under pytest's sweep)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em
    from tests.test_queries_oracle import _arrow_table, _canon, _to_pandas, _type_map

    queries = em.queries()
    oracles = em.oracle_sql()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    def duck():
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(args.sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return con

    n_pass = n_fail = n_skip = 0
    failures = []
    for name in queries:
        if name not in oracles or (only and name not in only):
            continue
        if name in skip:
            n_skip += 1
            print(json.dumps({"query": name, "status": "skipped"}), flush=True)
            continue
        t0 = time.perf_counter()
        try:
            res = queries[name](args.sf_dir)
            mine_tbl = _arrow_table(res)
            mine = _canon(_to_pandas(mine_tbl))
            con = duck()
            try:
                oracle_tbl = con.execute(oracles[name]).arrow()
            finally:
                con.close()
            oracle = _canon(oracle_tbl.to_pandas())
            assert _type_map(mine_tbl) == _type_map(oracle_tbl), (
                f"type {_type_map(mine_tbl)} vs {_type_map(oracle_tbl)}"
            )
            assert list(mine.columns) == list(oracle.columns), (
                f"cols {list(mine.columns)} vs {list(oracle.columns)}"
            )
            assert len(mine) == len(oracle), f"rows {len(mine)} vs {len(oracle)}"
            pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
            n_pass += 1
            print(json.dumps({
                "query": name, "status": "pass", "rows": len(mine),
                "sec": round(time.perf_counter() - t0, 2),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            n_fail += 1
            failures.append(name)
            print(json.dumps({
                "query": name, "status": "FAIL",
                "err": f"{type(exc).__name__}: {str(exc)[:300]}",
                "sec": round(time.perf_counter() - t0, 2),
            }), flush=True)
    print(json.dumps({
        "sf_dir": args.sf_dir, "pass": n_pass, "fail": n_fail,
        "skipped": n_skip, "failures": failures,
    }), flush=True)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""q_pagerank vs a dense numpy reference on a hand-built graph (the DuckDB
twin runs in tests/test_queries_oracle.py at sf0.001)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from arches_rascoll_etl_ray.pipelines.relational import _PR_D, _PR_K, q_pagerank


def _write_lineitem(tmp_path, pairs):
    tbl = pa.table(
        {
            "l_orderkey": pa.array([a for a, _ in pairs], pa.int64()),
            "l_partkey": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _ref_pagerank(pairs):
    base = sorted(set(pairs))
    edges = [(2 * o, 2 * p + 1) for o, p in base] + [(2 * p + 1, 2 * o) for o, p in base]
    nodes = sorted({s for s, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(_PR_K):
        nxt = np.full(n, 0.15 / n)
        for s, d in edges:
            nxt[idx[d]] += _PR_D * r[idx[s]] / deg[idx[s]]
        r = nxt
    return {node: round(r[idx[node]] * 1e9) for node in nodes}


def test_pagerank_matches_dense_reference(tmp_path):
    # multigraph on purpose: (1, 10) repeats and must collapse to one edge
    pairs = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 12), (3, 12), (3, 13), (4, 13)]
    sf = _write_lineitem(tmp_path, pairs)
    got = q_pagerank(sf).to_pandas().set_index("node")["rank_e9"].to_dict()
    ref = _ref_pagerank(pairs)
    assert got == ref
    # rank mass is conserved (sums to ~1.0 in e9 fixed point)
    assert abs(sum(got.values()) - 1_000_000_000) < len(ref) + 1


def test_pagerank_hub_ranks_highest(tmp_path):
    # part 10 is referenced by every order: it must dominate
    pairs = [(o, 10) for o in range(1, 8)] + [(1, 11), (2, 12)]
    sf = _write_lineitem(tmp_path, pairs)
    got = q_pagerank(sf).to_pandas()
    top = got.sort_values("rank_e9", ascending=False).iloc[0]
    assert top["node"] == 2 * 10 + 1

"""q_pq_assign vs a numpy reference; q_rollup hierarchy invariants (the
DuckDB twins run in tests/test_queries_oracle.py)."""

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def test_pq_assign_matches_numpy_reference():
    from arches_rascoll_etl_ray.pipelines.training import _PQ_DIM, _PQ_K, _PQ_M, q_pq_assign

    got = q_pq_assign(SF_SMOKE).to_pandas().set_index("vec_id").sort_index()
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet").sort_by("vec_id")
    x = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    vec_id = t["vec_id"].to_numpy()
    c = x[:_PQ_K]
    sub = _PQ_DIM // _PQ_M
    for m in range(_PQ_M):
        xs, cs = x[:, m * sub:(m + 1) * sub], c[:, m * sub:(m + 1) * sub]
        ref = ((xs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        assert (got.loc[vec_id, f"code{m}"].to_numpy() == ref).all()
    # a seed vector's own subvectors are their own codewords
    for k in range(_PQ_K):
        assert all(got.loc[k, f"code{m}"] == k for m in range(_PQ_M))


def test_rollup_hierarchy_consistent():
    from arches_rascoll_etl_ray.pipelines.relational import q_rollup

    df = q_rollup(SF_SMOKE).to_pandas()
    total = int(df[(df["lang"] == "*") & (df["source"] == "*")]["n_docs"].iloc[0])
    detail = df[(df["lang"] != "*") & (df["source"] != "*")]
    subs = df[(df["lang"] != "*") & (df["source"] == "*")].set_index("lang")["n_docs"]
    assert detail["n_docs"].sum() == total
    assert subs.sum() == total
    for lang, g in detail.groupby("lang"):
        assert g["n_docs"].sum() == subs[lang]
    assert total == pq.read_metadata(f"{SF_SMOKE}/documents.parquet").num_rows

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


def test_cms_point_estimates_dominate_true_counts(tmp_path):
    """CMS guarantee: min-over-rows cell count ≥ true token count, with
    equality for tokens that collide with nothing in some row."""
    import hashlib
    import re
    from collections import Counter

    import pyarrow as pa

    from arches_rascoll_etl_ray.functions.hashing import splitmix64
    from arches_rascoll_etl_ray.pipelines.training import _CMS_D, _CMS_W, q_cms_registers

    texts = ["the cat sat", "the cat ran", "a rare word appears once", "the the the"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    import pyarrow.parquet as pqt

    pqt.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = q_cms_registers(str(tmp_path)).to_pandas()
    sketch = {(int(r), int(c)): int(n) for r, c, n in got[["row", "cell", "n"]].to_numpy()}

    true = Counter()
    for t in texts:
        true.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    total = sum(true.values())
    assert sum(n for (r, _), n in sketch.items() if r == 0) == total  # row 0 mass

    for tok, n in true.items():
        hv = np.uint64(int(hashlib.md5(tok.encode()).hexdigest()[:16], 16))
        est = min(
            sketch.get(
                (j, int(splitmix64(np.array([hv ^ np.uint64(j)]))[0] % np.uint64(_CMS_W))),
                0,
            )
            for j in range(_CMS_D)
        )
        assert est >= n  # never undercounts
        assert est <= total  # trivially bounded by stream mass


def test_image_resizer_picks_exact_pixels():
    import pyarrow as pa

    from arches_rascoll_etl_ray.stages.multimodal import ImageResizer, encode_bmp24

    img = np.arange(7 * 5, dtype=np.uint8).reshape(7, 5)  # odd dims on purpose
    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()),
         "payload": pa.array([encode_bmp24(img)], pa.binary())}
    )
    out = ImageResizer(factor=2)(batch).to_pandas().iloc[0]
    picked = img[::2, ::2].astype(np.int64)
    assert (out["out_h"], out["out_w"]) == picked.shape
    assert out["resized_sumsq"] == (picked * picked).sum()

    ident = ImageResizer(factor=1)(batch).to_pandas().iloc[0]
    full = img.astype(np.int64)
    assert (ident["out_h"], ident["out_w"]) == full.shape
    assert ident["resized_sumsq"] == (full * full).sum()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="factor"):
        ImageResizer(factor=0)

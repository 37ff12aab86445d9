"""Text analysis determinism + ANN recall + multimodal stage plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from arches_rascoll_etl_ray.functions import text as textfns
from tests.conftest import SF_SMOKE


def test_lang_id_deterministic_and_sane():
    s = pd.Series(
        [
            "the cat sat on the mat and it was happy in the sun",
            "el perro y el gato en la casa de la abuela con su comida",
            "xyzzy qwerty plugh",
        ]
    )
    out = textfns.lang_id(s)
    assert out.tolist() == textfns.lang_id(s).tolist()
    assert out[0] == "en" and out[1] == "es" and out[2] == "und"


def test_winnowing_fingerprint_properties():
    s = pd.Series(["the quick brown fox jumps over the lazy dog " * 5, "", "short"])
    fp1 = textfns.winnowing_fingerprint(s)
    fp2 = textfns.winnowing_fingerprint(s)
    assert (fp1 == fp2).all()
    # a small local edit keeps most window-mins -> usually equal or close;
    # a different doc gets a different fingerprint
    other = textfns.winnowing_fingerprint(pd.Series(["completely different content here " * 5]))
    assert fp1[0] != other[0]


def test_token_counts_match_sql_semantics():
    s = pd.Series(["a b  c", "", "one"])
    # single-space split: "a b  c" -> ['a','b','','c'] = 4 tokens; "" -> 1
    assert list(textfns.ws_token_counts(s)) == [4, 1, 1]
    assert list(textfns.re_token_counts(pd.Series(["a,b c!"]))) == [5]  # a , b c !


def test_ivf_recall_vs_brute():
    from arches_rascoll_etl_ray.pipelines.training import knn_brute, knn_ivf

    brute = knn_brute(SF_SMOKE).to_pandas()
    ivf = knn_ivf(SF_SMOKE).to_pandas()
    recalls = []
    for qid in brute["qid"].unique():
        b = set(brute[brute["qid"] == qid]["nid"])
        i = set(ivf[ivf["qid"] == qid]["nid"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.5, f"IVF recall@10 too low: {recalls}"


def test_embedding_nn_symmetric_sanity():
    from arches_rascoll_etl_ray.pipelines.training import q_embedding_nn

    out = q_embedding_nn(SF_SMOKE).to_pandas()
    assert len(out) == 500
    assert (out["vec_id"] != out["nn_id"]).all()


def test_embedding_nn_recall_vs_brute():
    """The IVF-bucketed per-vector NN must find the true nearest neighbor
    ≥90% of the time, even on i.i.d. random vectors (the worst case for
    cell bucketing)."""
    import os

    import pyarrow.parquet as pq

    from arches_rascoll_etl_ray.pipelines.training import q_embedding_nn

    t = pq.read_table(os.path.join(SF_SMOKE, "embeddings.parquet"))
    ids = t["vec_id"].to_numpy()
    x = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    np.fill_diagonal(sims, -np.inf)
    true_nn = dict(zip(ids.tolist(), ids[sims.argmax(1)].tolist()))

    out = q_embedding_nn(SF_SMOKE).to_pandas()
    hit = sum(true_nn[v] == n for v, n in zip(out["vec_id"], out["nn_id"]))
    recall = hit / len(out)
    assert recall >= 0.9, f"NN recall vs brute too low: {recall}"


def test_dedup_embedding_planted_dups(tmp_path):
    """Planted near-identical vectors must land in one cluster rooted at the
    min id; random vectors stay singletons."""
    import pyarrow.parquet as pq

    from arches_rascoll_etl_ray.pipelines.training import dedup_embedding

    rng = np.random.default_rng(5)
    base = rng.normal(size=(200, 64)).astype(np.float32)
    # ids 200..202 duplicate ids 0..2 with tiny noise (cosine ≈ 0.9996)
    planted = base[:3] + rng.normal(scale=0.02, size=(3, 64)).astype(np.float32)
    vecs = np.vstack([base, planted])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(vecs), dtype=np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = dedup_embedding(str(tmp_path)).to_pandas().set_index("vec_id")["cluster_id"]
    for j in range(3):
        assert out[200 + j] == out[j] == j
    singletons = (out.index == out.values).sum()
    assert singletons >= 190  # random vectors don't clear cosine 0.9


def test_multimodal_stage_direct():
    """Actor class smoke (init errors surface late in pools — test directly)."""
    from arches_rascoll_etl_ray.stages.multimodal import BinaryFeatureExtractor

    stage = BinaryFeatureExtractor(decode_mode="stub", feature_dims=8)
    batch = pa.table({"doc_id": [1, 2], "payload": pa.array([b"abcabc", None], pa.binary())})
    out = stage(batch)
    assert out["feature"].type == pa.list_(pa.float32(), 8)
    assert out["payload_bytes"].to_pylist() == [6, 0]
    feats = np.array(out["feature"].to_pylist())
    assert abs(feats[0].sum() - 1.0) < 1e-6  # histogram normalized
    assert (feats[1] == 0).all()


def test_multimodal_real_mode_rejects_unknown_container():
    from arches_rascoll_etl_ray.stages.multimodal import BinaryFeatureExtractor

    stage = BinaryFeatureExtractor(decode_mode="real")
    batch = pa.table({"doc_id": [1, 2], "payload": pa.array([b"xray", b""], pa.binary())})
    with pytest.raises(ValueError, match="unknown container magic"):
        stage(batch)
    with pytest.raises(ValueError):
        BinaryFeatureExtractor(decode_mode="webp")


def test_codec_roundtrip_bmp_wav():
    """Real codecs: encode → decode recovers the exact sample stream."""
    from arches_rascoll_etl_ray.stages.multimodal import (
        decode_container,
        encode_bmp24,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 11), dtype=np.uint8)  # odd width → row padding
    kind, got = decode_container(encode_bmp24(img))
    assert kind == "bmp" and (got == img.reshape(-1)).all()

    pcm = rng.integers(-(2**15), 2**15, size=333, dtype=np.int16)
    kind, got = decode_container(encode_wav_pcm16(pcm))  # odd data size → RIFF pad
    assert kind == "wav" and (got == (pcm.view(np.uint16) & 0xFF).astype(np.uint8)).all()

    with pytest.raises(ValueError):
        decode_container(b"RIFF\x04\x00\x00\x00JUNK")  # RIFF but not WAVE
    with pytest.raises(ValueError):
        decode_container(b"BM" + b"\x00" * 20)  # truncated header


def test_multimodal_real_decode_features():
    """decode_mode='real' parses containers and featurizes the DECODED
    samples: a BMP and a WAV carrying the same byte stream produce the
    same histogram feature despite very different raw payloads."""
    from arches_rascoll_etl_ray.stages.multimodal import (
        BinaryFeatureExtractor,
        encode_bmp24,
        encode_wav_pcm16,
    )

    samples = np.arange(128, dtype=np.uint8)
    bmp = encode_bmp24(samples.reshape(1, -1))
    wav = encode_wav_pcm16(samples.astype(np.int16))
    stage = BinaryFeatureExtractor(decode_mode="real", feature_dims=8)
    out = stage(pa.table({"doc_id": [1, 2], "payload": pa.array([bmp, wav], pa.binary())}))
    assert out["container"].to_pylist() == ["bmp", "wav"]
    assert out["n_samples"].to_pylist() == [128, 128]
    assert out["payload_bytes"].to_pylist() == [len(bmp), len(wav)]
    f = np.array(out["feature"].to_pylist())
    assert np.allclose(f[0], f[1])
    assert np.allclose(f[0], [0.25, 0.25, 0.25, 0.25, 0, 0, 0, 0])  # bytes 0..127


def test_frame_sampler_real_mode():
    from arches_rascoll_etl_ray.stages.multimodal import FrameSampler, encode_wav_pcm16

    pcm = np.arange(12, dtype=np.int16)
    stage = FrameSampler(decode_mode="real", frame_size=4, hop=4)
    out = stage(pa.table({"doc_id": [1], "payload": pa.array([encode_wav_pcm16(pcm)], pa.binary())}))
    assert out["n_frames"].to_pylist() == [3]
    first = np.array(out["frames"].to_pylist()[0][0]) * 255.0
    assert np.allclose(np.rint(first), [0, 1, 2, 3])


def test_frame_sampler_stage():
    from arches_rascoll_etl_ray.stages.multimodal import FrameSampler

    stage = FrameSampler(frame_size=4, hop=4)
    batch = pa.table({"doc_id": [1, 2], "payload": pa.array([bytes(range(12)), b""], pa.binary())})
    out = stage(batch)
    assert out["n_frames"].to_pylist() == [3, 0]
    assert len(out["frames"].to_pylist()[0][0]) == 4


def test_dedup_embedding_runs():
    from arches_rascoll_etl_ray.pipelines.training import dedup_embedding

    out = dedup_embedding(SF_SMOKE).to_pandas()
    assert len(out) == 500
    assert (out["cluster_id"] <= out["vec_id"]).all()  # min-id roots


def test_hll_accuracy():
    from arches_rascoll_etl_ray.functions.hashing import stable_hash64
    from arches_rascoll_etl_ray.functions.sketches import hll_estimate, hll_merge, hll_sketch

    vals = np.array([f"item-{i}" for i in range(20000)], dtype=object)
    h = stable_hash64(vals)
    # merged from 4 partial sketches == one-shot sketch
    parts = [hll_sketch(h[i::4]) for i in range(4)]
    merged = parts[0]
    for p in parts[1:]:
        merged = hll_merge(merged, p)
    assert (merged == hll_sketch(h)).all()
    est = hll_estimate(merged)
    assert abs(est - 20000) / 20000 < 0.05  # p=12 → ~1.6% typical error


def test_hll_query_close_to_truth():
    import duckdb

    from arches_rascoll_etl_ray.pipelines.training import q_hll_distinct

    est = q_hll_distinct(SF_SMOKE).to_pandas()["estimate"][0]
    truth = duckdb.connect().execute(
        f"SELECT COUNT(DISTINCT text) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchone()[0]
    assert abs(est - truth) / truth < 0.1


def test_ivf_params_scaling():
    """nlist grows ~sqrt(N); member/probe grow slowly and stay hard-capped
    so shuffle replication is bounded at any N."""
    from arches_rascoll_etl_ray.pipelines.training import (
        _IVF_MEMBER_CAP, _IVF_PROBE_CAP, _ivf_params,
    )

    assert _ivf_params(100) == (16, 2, 6)  # small-N floor
    nlist, member, probe = _ivf_params(10**6)
    assert nlist == 1000 and member <= _IVF_MEMBER_CAP and probe <= _IVF_PROBE_CAP
    nlist_big, member_big, probe_big = _ivf_params(10**10)
    assert nlist_big == 10**5
    assert member_big == _IVF_MEMBER_CAP and probe_big == _IVF_PROBE_CAP
    # monotone in N
    prev = 0
    for n in (10**2, 10**4, 10**6, 10**8, 10**10):
        nl, _, _ = _ivf_params(n)
        assert nl >= prev
        prev = nl


def test_kmeans_hierarchical_path():
    """Above flat_max cells the two-level build kicks in: ≈k centroids,
    deterministic, and never allocates an O(sample×k) distance matrix
    (exercised here with a small flat_max to force the hierarchical route)."""
    from arches_rascoll_etl_ray.pipelines.training import _kmeans, _kmeans_hier

    rng = np.random.default_rng(7)
    x = rng.normal(size=(3000, 16))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c = _kmeans_hier(x, 900, flat_max=256)
    assert 700 <= len(c) <= 900 and c.shape[1] == 16
    assert np.isfinite(c).all()
    assert np.array_equal(c, _kmeans_hier(x, 900, flat_max=256))  # deterministic
    # below the gate it is exactly the flat build
    assert np.array_equal(_kmeans_hier(x, 64, flat_max=256), _kmeans(x, 64))


def test_splitmix64_matches_reference_vectors():
    """splitmix64 against independently computed reference values (the
    Steele et al. mixer) — the generated-SQL oracle twin depends on these
    exact bits."""
    from arches_rascoll_etl_ray.functions.hashing import splitmix64

    got = splitmix64(np.array([0, 1, 2**62, 2**63 - 1], dtype=np.int64))
    def ref(v):
        M = (1 << 64) - 1
        z = (v + 0x9E3779B97F4A7C15) & M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return (z ^ (z >> 31)) & M
    assert [int(g) for g in got] == [ref(v) for v in (0, 1, 2**62, 2**63 - 1)]


def test_doc_grams_boundary_masking():
    """n-grams never cross a document boundary and are per-doc distinct."""
    from arches_rascoll_etl_ray.pipelines.training import _doc_grams

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["a b c d e f", "c d e f g", "x y"]),
        }
    )
    out = _doc_grams(t, n=5)
    got = set(zip(out["doc_id"], out["gram"]))
    assert got == {
        (1, "a b c d e"),
        (1, "b c d e f"),
        (2, "c d e f g"),
    }  # doc 3 is shorter than n -> no grams; nothing spans doc 1 -> doc 2

    rep = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["a a a a a a"])}
    )
    out2 = _doc_grams(rep, n=5)
    assert list(out2["gram"]) == ["a a a a a"]  # distinct within the doc


def test_repetition_score_exact_values():
    from arches_rascoll_etl_ray.pipelines.training import q_repetition_score
    import duckdb, os

    res = q_repetition_score(SF_SMOKE).to_pandas().set_index("doc_id")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_SMOKE, 'documents.parquet')}')"
    )
    from arches_rascoll_etl_ray.pipelines.training import _REPETITION_SQL

    ora = con.sql(_REPETITION_SQL).df().set_index("doc_id")
    assert len(res) == len(ora)
    for c in ("dup_word_e3", "top2_cover_e3"):
        assert (res[c].sort_index() == ora[c].sort_index()).all()


def test_pack_sequences_properties():
    """Greedy contiguous packing invariants: bin ids are non-decreasing in
    doc_id order (bins are contiguous doc ranges), every doc's bin is the
    bin its first token lands in (bin = exclusive-prefix // L), and no bin
    is skipped. Exact equality vs SQL is the oracle gate's job; this pins
    the packing SEMANTICS independent of the twin."""
    import numpy as np

    from arches_rascoll_etl_ray.pipelines.training import _PACK_LEN, q_pack_sequences

    out = q_pack_sequences(SF_SMOKE).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(out) > 0
    bins = out["bin_id"].to_numpy()
    toks = out["n_tokens"].to_numpy()
    # contiguous, no skips, starts at 0
    assert bins[0] == 0
    assert ((np.diff(bins) == 0) | (np.diff(bins) == 1)).all()
    # definitional check against the prefix sum
    start = np.concatenate(([0], np.cumsum(toks)[:-1]))
    assert (bins == start // _PACK_LEN).all()
    # docs stay whole: a multi-doc corpus at L=256 with ~56-token docs must
    # actually pack several docs per bin
    assert bins.max() < len(out) / 2

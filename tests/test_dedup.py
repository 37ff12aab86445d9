"""Near-dup recall/precision on a crafted corpus (driver tables have no
planted dups, so these synthesize documents.parquet-shaped fixtures)."""

import os

import numpy as np
import pandas as pd
import pytest

from arches_rascoll_etl_ray.functions import sketches, text as textfns


def make_corpus(tmp_path) -> str:
    """60 base docs + 12 near-dup variants (small token edits) + 3 exact dups."""
    rng = np.random.default_rng(9)
    vocab = np.array(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi".split(),
        dtype=object,
    )
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=60).tolist()
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en", "source": "s", "n_chars": 0})
    # near-dups: copy doc i, tweak 2 tokens
    for j, base in enumerate(range(0, 24, 2)):
        words = rows[base]["text"].split()
        words[5] = "tweak"
        words[30] = f"edit{j}"
        rows.append({"doc_id": 100 + j, "text": " ".join(words), "lang": "en", "source": "s", "n_chars": 0})
    # exact dups
    for j in range(3):
        rows.append({**rows[j], "doc_id": 200 + j})
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len()
    d = str(tmp_path / "corpus")
    os.makedirs(d, exist_ok=True)
    df.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


def brute_force_pairs(d: str, threshold: float) -> set:
    df = pd.read_parquet(os.path.join(d, "documents.parquet"))
    sets = {r.doc_id: textfns.word_ngram_sets(r.text) for r in df.itertuples()}
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if textfns.jaccard(sets[a], sets[b]) >= threshold:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("dedup"))


def test_minhash_recall_vs_bruteforce(corpus):
    from arches_rascoll_etl_ray.pipelines.training import _minhash_pairs_ds, _verified_pairs_ds

    truth = brute_force_pairs(corpus, 0.8)
    assert len(truth) >= 12  # planted near-dups + exact dups are above 0.8
    verified = _verified_pairs_ds(corpus, _minhash_pairs_ds(corpus), threshold=0.8).to_pandas()
    found = set(zip(verified["a"].astype(int), verified["b"].astype(int)))
    # verification step makes precision exact; LSH recall should be ~1 here
    assert found <= brute_force_pairs(corpus, 0.8 - 1e-9)
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}: {sorted(truth - found)}"


def test_minhash_clusters_cover_exact_dups(corpus):
    from arches_rascoll_etl_ray.pipelines.training import dedup_minhash

    out = dedup_minhash(corpus).to_pandas().set_index("doc_id")["cluster_id"]
    for j in range(3):  # exact dup 200+j clusters with base doc j
        assert out[200 + j] == out[j] == j


def test_simhash_finds_planted_dups(corpus):
    from arches_rascoll_etl_ray.pipelines.training import dedup_simhash

    out = dedup_simhash(corpus).to_pandas().set_index("doc_id")["cluster_id"]
    hits = sum(out[200 + j] == out[j] for j in range(3))
    assert hits == 3  # exact dups always hamming-0


def test_minhash_estimator_quality():
    texts = pd.Series(
        [
            "a b c d e f g h i j k l m n o p",
            "a b c d e f g h i j k l m n o X",  # high overlap
            "q r s t u v w x y z aa bb cc dd ee ff",  # disjoint
        ]
    )
    flat, off = textfns.word_ngrams_hashes(texts)
    sig = sketches.minhash_signatures(flat, off, num_perm=256, seed=1)
    s01 = sketches.minhash_jaccard_estimate(sig[0], sig[1])
    s02 = sketches.minhash_jaccard_estimate(sig[0], sig[2])
    true01 = textfns.jaccard(textfns.word_ngram_sets(texts[0]), textfns.word_ngram_sets(texts[1]))
    assert abs(s01 - true01) < 0.15
    assert s02 < 0.05


def test_hamming64():
    a = np.array([0b1011, 0], dtype=np.uint64)
    b = np.array([0b0010, np.iinfo(np.uint64).max], dtype=np.uint64)
    assert list(sketches.hamming64(a, b)) == [2, 64]


def test_union_find_deterministic_roots():
    uf = sketches.UnionFind()
    uf.union(5, 3)
    uf.union(3, 9)
    uf.union(1, 2)
    r = uf.roots()
    assert r[5] == r[3] == r[9] == 3
    assert r[1] == r[2] == 1


def test_minhash_clusters_deterministic_across_runs(corpus):
    from arches_rascoll_etl_ray.pipelines.training import dedup_minhash

    a = dedup_minhash(corpus).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dedup_minhash(corpus).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

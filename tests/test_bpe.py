"""BPE tokenizer family: the distributed trainer / vectorized encoder vs a
pure-Python textbook reference (independent of the DuckDB oracle, which
tests/test_queries_oracle.py already exercises for both entries)."""

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from arches_rascoll_etl_ray.pipelines.training import (
    _BPE_FIXED_MERGES,
    _BPE_TRAIN_K,
    q_bpe_encode,
    q_bpe_pipeline,
    q_bpe_train_merges,
)


def _ref_word_counts(texts):
    wc = Counter()
    for t in texts:
        wc.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    return wc


def _ref_train(texts, k):
    """Textbook BPE trainer: symbol-tuple words, global pair argmax with
    (count desc, a asc, b asc) ties, merge applied left-to-right
    non-overlapping."""
    wc = {tuple(w): n for w, n in _ref_word_counts(texts).items()}
    merges = []
    for _ in range(k):
        pairs = Counter()
        for sym, n in wc.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((a, b, c))
        new = {}
        for sym, n in wc.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + n
        wc = new
    return merges


def _ref_encode(text, merges):
    n = 0
    for w in re.split(r"[^a-z0-9]+", text.lower()):
        if not w:
            continue
        sym = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        n += len(sym)
    return n


_CORPUS = [
    "the cat sat on the mat",
    "the thin cat ate the rat and then sat",
    "on and on and on it ran in the rain",
    "banana bandana and an anthem",
    "ttttt hhhh ththth thethethe",  # overlap / replacement-boundary stress
    "",
    "  --  !!  ",  # no alphanumerics at all
    "a",  # single-symbol word: no pairs
]


def _write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_train_matches_python_reference(tmp_path):
    sf = _write_docs(tmp_path, _CORPUS)
    got = q_bpe_train_merges(sf).to_pandas()
    ref = _ref_train(_CORPUS, _BPE_TRAIN_K)
    assert list(map(tuple, got[["tok_a", "tok_b", "n"]].to_numpy())) == ref
    assert got["rank"].tolist() == list(range(1, len(ref) + 1))


def test_encode_matches_python_reference(tmp_path):
    sf = _write_docs(tmp_path, _CORPUS)
    got = (
        q_bpe_encode(sf).to_pandas().set_index("doc_id")["n_bpe_tokens"].to_dict()
    )
    for i, t in enumerate(_CORPUS):
        assert got[i] == _ref_encode(t, _BPE_FIXED_MERGES), (i, t)


def test_encode_with_trained_merges_roundtrip(tmp_path):
    """Merges learned by the distributed trainer, applied by the reference
    encoder, agree with the reference trainer's own final segmentation
    token count — i.e. the two halves compose."""
    sf = _write_docs(tmp_path, _CORPUS)
    merges = [
        (a, b) for a, b, _ in map(tuple, q_bpe_train_merges(sf).to_pandas()[
            ["tok_a", "tok_b", "n"]].to_numpy())
    ]
    ref_merges = [(a, b) for a, b, _ in _ref_train(_CORPUS, _BPE_TRAIN_K)]
    assert merges == ref_merges
    # applying the learned merges to the corpus reproduces the trainer's
    # final word segmentation sizes
    total = sum(_ref_encode(t, merges) for t in _CORPUS)
    assert total == sum(_ref_encode(t, ref_merges) for t in _CORPUS)


def test_pipeline_composes_train_then_encode(tmp_path):
    sf = _write_docs(tmp_path, _CORPUS)
    got = q_bpe_pipeline(sf).to_pandas().set_index("doc_id")["n_bpe_tokens"].to_dict()
    ref_merges = [(a, b) for a, b, _ in _ref_train(_CORPUS, _BPE_TRAIN_K)]
    for i, t in enumerate(_CORPUS):
        assert got[i] == _ref_encode(t, ref_merges), (i, t)


# ---------------------------------------------------------------------------
# Property: the vectorized replace-chain encode ≡ iterative BPE application
# for ANY training-ordered merge list (the correctness core of the family)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

import pyarrow as pa
import pyarrow.compute as pc

from arches_rascoll_etl_ray.pipelines.training import (
    _BPE_END,
    _BPE_SEP,
    _bpe_apply_merges,
)


def _ref_apply(word, merges):
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def _apply_merge_syms(sym, a, b):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _training_ordered_merges(words, k, rng_choice):
    """Build a VALID (training-ordered) merge list by running the reference
    trainer on the words but choosing among the top-3 candidates with the
    strategy-provided index — covers many orderings while keeping the
    invariant that every merge's pair was PRESENT at its step (which is
    what makes the sequential replace chain exact)."""
    from collections import Counter

    wc = Counter(tuple(w) for w in words)
    merges = []
    for choice in rng_choice[:k]:
        pairs = Counter()
        for sym, n in wc.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        cand = sorted(pairs, key=lambda p: (-pairs[p], p))[:3]
        a, b = cand[choice % len(cand)]
        merges.append((a, b))
        new = Counter()
        for sym, n in wc.items():
            new[_apply_merge_syms(sym, a, b)] += n
        wc = new
    return merges


@settings(max_examples=30, deadline=None)
@given(
    words=st.lists(st.text(alphabet="abc", min_size=1, max_size=8), min_size=1, max_size=12),
    choices=st.lists(st.integers(min_value=0, max_value=2), min_size=6, max_size=6),
)
def test_replace_chain_equals_iterative_bpe(words, choices):
    merges = _training_ordered_merges(words, 6, choices)
    seqs = pa.array(
        ["".join(f"{_BPE_SEP}{c}{_BPE_END}" for c in w) for w in words], pa.string()
    )
    chained = _bpe_apply_merges(seqs, merges)
    got = [
        [s.rstrip(_BPE_END) for s in v.split(_BPE_SEP) if s != ""]
        for v in chained.to_pylist()
    ]
    ref = [_ref_apply(w, merges) for w in words]
    assert got == ref, (words, merges)


def test_pipeline_degenerate_corpus_fewer_than_k_merges(tmp_path):
    """Corpus with < _BPE_TRAIN_K learnable merges: the engine trainer
    breaks early and the SQL twin's empty-m{i} scalar subqueries must
    coalesce to an identity replace, not NULL every document (review
    find)."""
    import duckdb

    from arches_rascoll_etl_ray.pipelines.training import _bpe_pipeline_sql

    corpus = ["a b a b", "ab"]
    sf = _write_docs(tmp_path, corpus)
    got = q_bpe_pipeline(sf).to_pandas().set_index("doc_id")["n_bpe_tokens"].to_dict()
    ref_merges = [(a, b) for a, b, _ in _ref_train(corpus, _BPE_TRAIN_K)]
    assert len(ref_merges) < _BPE_TRAIN_K  # genuinely degenerate
    for i, t in enumerate(corpus):
        assert got[i] == _ref_encode(t, ref_merges), (i, t)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    ora = con.execute(_bpe_pipeline_sql()).fetchdf().set_index("doc_id")["n_bpe_tokens"]
    assert not ora.isna().any()
    assert ora.to_dict() == got

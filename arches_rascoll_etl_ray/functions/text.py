"""Vectorized text-analysis primitives for training-data pipelines.

All deterministic, all batch-oriented (no per-row Python in hot paths except
where a tokenizer inherently iterates — those use C-backed pandas/str ops).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Tokenization: whitespace (matches SQL string_split(text, ' ')) and a
# BPE-ish regex (words or single non-space punctuation).
BPE_ISH = re.compile(r"\w+|[^\w\s]")

STOPWORDS_EN = frozenset(
    "the a of to and in is it that for on as with was at by an be this".split()
)

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (documents.lang domain: en/es/fr/de/zh-like synthetic text)
LANG_PROFILES: dict[str, frozenset] = {
    "en": STOPWORDS_EN,
    "es": frozenset("el la de que y en los se del las un por con una su para es".split()),
    "fr": frozenset("le de la et les des en un du une que est pour qui dans ce".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im nicht".split()),
    "zh": frozenset("的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国".split()),
}


def ws_token_counts(texts: pd.Series) -> np.ndarray:
    """Token count under single-space split — exactly len(string_split(t,' '))
    in DuckDB (empty string → 1, like SQL)."""
    return (texts.str.count(" ") + 1).to_numpy(dtype=np.int64)


def re_token_counts(texts: pd.Series) -> np.ndarray:
    """BPE-ish token count: words + single punctuation marks."""
    return texts.str.count(BPE_ISH).to_numpy(dtype=np.int64)


def punct_counts(texts: pd.Series) -> np.ndarray:
    return texts.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)


def stopword_counts(texts: pd.Series, stopwords: frozenset = STOPWORDS_EN) -> np.ndarray:
    """Count of whitespace tokens ∈ stopwords (exact token membership, not
    substring — matches list_filter(string_split(lower(t),' '), …))."""
    toks = texts.str.lower().str.split(" ")
    exploded = toks.explode()
    hits = exploded.isin(stopwords).groupby(level=0).sum()
    return hits.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)


def lang_scores(texts: pd.Series) -> pd.DataFrame:
    """Stopword-profile hit-rate per language → argmax language ID.

    The M6/M7-style normalize+lookup recast as a scoring heuristic
    (arches_rascoll/groups.py:106-116). Deterministic; ties broken by
    language name order.
    """
    toks = texts.str.lower().str.split(" ").explode()
    out = {}
    for lang in sorted(LANG_PROFILES):
        hits = toks.isin(LANG_PROFILES[lang]).groupby(level=0).sum()
        out[lang] = hits.reindex(texts.index, fill_value=0).to_numpy(dtype=np.int64)
    return pd.DataFrame(out, index=texts.index)


def lang_id(texts: pd.Series) -> pd.Series:
    scores = lang_scores(texts)
    best = scores.idxmax(axis=1)
    none = scores.max(axis=1) == 0
    best[none] = "und"
    return best


def word_ngrams_hashes(texts: pd.Series, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word n-gram shingle hashes, vectorized.

    Words are hashed once (pd.util.hash_array); an n-gram hash combines the
    n word hashes positionally (odd-multiplier mix — deterministic, order-
    sensitive). Docs with <n words get one gram over all their words.
    Returns (flat_hashes uint64, doc_offsets int64 of len(docs)+1) — a
    ragged layout suited to np.minimum.reduceat for MinHash.
    """
    tok = texts.str.split()
    counts = tok.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat_words = np.asarray(
        [w for words in tok for w in (words if isinstance(words, list) else [])], dtype=object
    )
    whash = (
        pd.util.hash_array(flat_words, categorize=False) if len(flat_words) else np.empty(0, np.uint64)
    )
    word_starts = np.r_[0, np.cumsum(counts)]

    MIX = np.uint64(0x9E3779B97F4A7C15)
    mults = [np.uint64(0xBF58476D1CE4E5B9), np.uint64(0x94D049BB133111EB), np.uint64(0xD6E8FEB86659FD93),
             np.uint64(0xFF51AFD7ED558CCD), np.uint64(0xC4CEB9FE1A85EC53)]

    n_grams_per_doc = np.where(counts >= n, counts - n + 1, np.where(counts > 0, 1, 1))
    offsets = np.r_[0, np.cumsum(n_grams_per_doc)].astype(np.int64)
    flat = np.zeros(offsets[-1], dtype=np.uint64)

    full = counts >= n
    if full.any():
        # positions of each doc's gram starts within flat_words, vectorized:
        # for doc d: word indices word_starts[d] .. word_starts[d]+counts[d]-n
        full_ids = np.flatnonzero(full)
        doc_idx = np.repeat(full_ids, n_grams_per_doc[full])
        # within-doc gram index: global arange minus each doc's first slot
        first_slot = np.repeat(offsets[full_ids], n_grams_per_doc[full])
        slot = np.concatenate(
            [np.arange(offsets[d], offsets[d + 1]) for d in full_ids]
        ).astype(np.int64)
        within = slot - first_slot
        gstart = word_starts[doc_idx] + within
        acc = np.full(len(gstart), MIX, dtype=np.uint64)
        for j in range(n):
            acc = (acc ^ (whash[gstart + j] * mults[j % len(mults)])) * MIX
        flat[slot] = acc
    # short docs: single gram combining all words (or 0 for empty)
    short = (~full) & (counts > 0)
    for d in np.flatnonzero(short):
        acc = MIX
        for j in range(counts[d]):
            acc = (acc ^ (whash[word_starts[d] + j] * mults[j % len(mults)])) * MIX
        flat[offsets[d]] = acc
    return flat, offsets


def word_ngram_sets(text: str, n: int = 3) -> set:
    words = text.split() if text else []
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[j : j + n]) for j in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return (len(a & b) / u) if u else 0.0


def winnowing_fingerprint(texts: pd.Series, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03 — public
    algorithm): rolling k-gram hashes, min per sliding window, fingerprint =
    xor-fold of selected mins. Returns uint64 per doc; deterministic.

    Vectorized across the WHOLE batch: one flat byte array for the corpus,
    k shifted-multiply passes build every k-gram hash at once (no per-doc
    object arrays, no per-gram Python); only the per-doc window-min/unique/
    fold runs on each doc's (already numeric) hash slice."""
    arr = texts.fillna("").to_numpy(dtype=object)
    n = len(arr)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    encoded = [t.encode("utf-8") for t in arr]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    offs = np.concatenate([[0], np.cumsum(lens)])
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8) if offs[-1] else np.empty(0, np.uint8)

    # rolling polynomial hash of every k-gram in the corpus: h[p] covers
    # bytes [p, p+k); cross-doc positions are skipped per doc below
    P = np.uint64(0x100000001B3)
    mix = np.uint64(0x9E3779B97F4A7C15)
    total = len(flat)
    gram_h = np.full(max(0, total - k + 1), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    for j in range(k):
        gram_h = (gram_h * P) ^ flat[j : total - k + 1 + j].astype(np.uint64)

    for i in range(n):
        ln = lens[i]
        if ln < k:
            # short/empty doc: hash the raw bytes
            h = np.uint64(0xCBF29CE484222325)
            for byte in encoded[i]:
                h = (h * P) ^ np.uint64(byte)
            out[i] = (h * mix) if ln else mix
            continue
        hs = gram_h[offs[i] : offs[i] + ln - k + 1]
        if len(hs) <= window:
            sel = np.array([hs.min()], dtype=np.uint64)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            sel = np.unique(sw.min(axis=1))
        out[i] = np.bitwise_xor.reduce(sel * mix)
    return out

"""Unigram-LM perplexity scoring + domain-mix budgets: edge cases and a
pure-Python reference (the DuckDB twins run in tests/test_queries_oracle.py)."""

import math
import re
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from arches_rascoll_etl_ray.pipelines.training import (
    _MIX_DEFAULT_E3,
    _MIX_TARGET_E3,
    q_domain_mix,
    q_unigram_ppl,
)


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1] or "") for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def test_unigram_ppl_reference_and_empty_docs(tmp_path):
    rows = [
        (0, "the cat the cat", "en"),
        (1, "the dog", "en"),
        (2, "", "en"),          # no tokens: must be absent from the output
        (3, "!!! ---", "en"),   # symbols only: ditto
        (4, "rare unicorns prance", "en"),
        (5, None, "en"),        # null text LAST: the reduceat batch-final
                                # empty-segment regression (code-review find)
    ]
    sf = _write_docs(tmp_path, rows)
    got = q_unigram_ppl(sf).to_pandas().set_index("doc_id")["nll_e3"].to_dict()
    cnt = Counter()
    for _, t, _l in rows:
        cnt.update(_toks(t or ""))
    total = sum(cnt.values())
    for did, t, _l in rows:
        toks = _toks(t or "")
        if not toks:
            assert did not in got
            continue
        nll = 1000.0 * (math.log(total) - sum(math.log(cnt[w]) for w in toks) / len(toks))
        assert got[did] == round(nll), (did, got[did], nll)
    assert set(got) == {0, 1, 4}


def test_domain_mix_exact_and_unknown_lang(tmp_path):
    rows = (
        [(i, "a b c", "en") for i in range(6)]
        + [(10 + i, "x y", "zh") for i in range(3)]
        + [(20, "q", "tlh")]  # unknown domain: default budget
    )
    sf = _write_docs(tmp_path, rows)
    got = q_domain_mix(sf).to_pandas().set_index("lang")
    total = len(rows)
    assert got.loc["en", "n_docs"] == 6
    assert got.loc["en", "epochs_e3"] == _MIX_TARGET_E3["en"] * total // 6
    assert got.loc["zh", "epochs_e3"] == _MIX_TARGET_E3["zh"] * total // 3
    assert got.loc["tlh", "epochs_e3"] == _MIX_DEFAULT_E3 * total // 1
    # shares: en is 60% of docs vs a 30% target → downsample (<1000)
    assert got.loc["en", "epochs_e3"] < 1000
    # zh is 30% vs a 15% target → also <1000; tlh gets zero budget
    assert got.loc["tlh", "epochs_e3"] == 0


def test_blocklist_filter_keeps_null_text_docs(tmp_path):
    """NULL text ≡ nothing blockable: survivors include the null-text doc
    with n_blocked 0 (the engine used to silently drop it — review find);
    semantics pinned against the SQL twin run directly."""
    import duckdb

    from arches_rascoll_etl_ray.pipelines.training import (
        _BLOCKLIST,
        _blocklist_sql,
        q_blocklist_filter,
    )

    rows = [
        (0, f"clean doc about {_BLOCKLIST[0]} topics", "en"),  # blocked
        (1, "perfectly fine text", "en"),
        (2, None, "en"),  # null text: must SURVIVE with n_blocked 0
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        q_blocklist_filter(sf).to_pandas().set_index("doc_id")["n_blocked"].to_dict()
    )
    assert got == {1: 0, 2: 0}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(_blocklist_sql()).fetchdf().set_index("doc_id")["n_blocked"].to_dict()
    assert ora == got


def test_markov_transitions_null_event_type(tmp_path):
    """A NULL event_type mid-sequence: no (NULL, x) row (matching the
    twin's WHERE prev IS NOT NULL), while (x, NULL) rows survive like
    LAG's output — pinned against the SQL twin run directly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from arches_rascoll_etl_ray.pipelines.relational import QUERIES, ORACLE_SQL

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "event_type": pa.array(["a", None, "b", "a", "a"], pa.string()),
            "value": pa.array([0.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = (
        QUERIES["q_markov_transitions"](str(tmp_path))
        .to_pandas()
        .sort_values(["prev_type", "next_type"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    ora = (
        con.execute(ORACLE_SQL["q_markov_transitions"]).fetchdf()
        .sort_values(["prev_type", "next_type"], na_position="last")
        .reset_index(drop=True)
    )
    assert got[["prev_type", "next_type"]].where(got.notna(), "∅").to_dict() == \
        ora[["prev_type", "next_type"]].where(ora.notna(), "∅").to_dict()
    assert got["n"].tolist() == ora["n"].astype("int64").tolist()
    # user 7: a→NULL and NULL→b; only (a, NULL) must appear
    assert ("a", None) in {
        (p, (None if pd.isna(x) else x))
        for p, x in got[["prev_type", "next_type"]].to_numpy()
    }



def test_mix_resample_budget_realized(tmp_path):
    """Σ n_copies per domain lands within the hash-coin's reach of the
    budget w·T, and every copy count is ⌊r⌋ or ⌈r⌉."""
    from arches_rascoll_etl_ray.pipelines.training import (
        _MIX_TARGET_E3,
        q_mix_resample,
    )

    rows = (
        [(i, "x", "en") for i in range(60)]
        + [(100 + i, "x", "zh") for i in range(20)]
        + [(200 + i, "x", "fr") for i in range(20)]
    )
    sf = _write_docs(tmp_path, rows)
    got = q_mix_resample(sf).to_pandas()
    assert len(got) == len(rows)
    total = len(rows)
    langs = {did: lang for did, _t, lang in rows}
    got["lang"] = got["doc_id"].map(langs)
    for lang, g in got.groupby("lang"):
        n = len(g)
        r_e3 = _MIX_TARGET_E3[lang] * total // n
        lo, hi = r_e3 // 1000, r_e3 // 1000 + (1 if r_e3 % 1000 else 0)
        assert set(g["n_copies"]) <= {lo, hi}, (lang, set(g["n_copies"]))
        # budget: the mean copy count ≈ r within the coin's binomial spread
        assert abs(g["n_copies"].sum() - n * r_e3 / 1000) <= n / 2


def test_mix_resample_null_lang_matches_twin(tmp_path):
    """Null-lang docs: counted in the total (the twin's SUM over GROUP BY
    lang includes the NULL group) but dropped from the output (JOIN USING
    drops them) — pinned against the SQL twin run directly."""
    import duckdb

    from arches_rascoll_etl_ray.pipelines.training import (
        _mix_resample_sql,
        q_mix_resample,
    )

    rows = [(0, "x", "en"), (1, "x", "en"), (2, "x", None), (3, "x", "zh")]
    sf = _write_docs(tmp_path, rows)
    got = (
        q_mix_resample(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1, 3]  # null-lang doc 2 dropped

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = (
        con.execute(_mix_resample_sql()).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_copies"].tolist() == ora["n_copies"].astype("int64").tolist()
    assert got["doc_id"].tolist() == ora["doc_id"].astype("int64").tolist()

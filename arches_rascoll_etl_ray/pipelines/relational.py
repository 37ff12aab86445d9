"""Relational operator library over the driver's testdata tables.

Each query re-expresses one operator family from the reference
(SURVEY.md §2 inventory, citations inline) as an idiomatic Ray Data
pipeline, paired with an ANSI-SQL oracle (DuckDB) in `ORACLE_SQL`.

Conventions for driver-checked equality:
- every computed/aggregate column is explicitly named identically in Ray and
  SQL;
- float aggregations are integerized PER ROW (cents) before summing so both
  engines sum exact int64s — no float-summation-order mismatches;
- broadcast joins ship the small side once (ray.put / closure capture), never
  per batch; the big side streams.

None of these call ray.init (driver contract).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _cents(arr) -> pa.Array:
    """Exact per-row integerization of a 2-decimal money column."""
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


# ---------------------------------------------------------------------------
# A. Aggregation with map-side partials (reference A1/A3; pre-aggregate
#    before the shuffle, SURVEY.md §4)
# ---------------------------------------------------------------------------


@register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate. Map-side partial aggregation inside
    map_batches (one row per key per batch) then a tiny groupby over partials
    — the scale-safe version of the reference's in-memory hash aggregate
    (arches_rascoll/ref_collection.py:90-97)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pc.cast(batch["l_quantity"], pa.int64()),
                "base_cents": _cents(batch["l_extendedprice"]),
                "disc_e4": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])),
                            pa.scalar(10000.0),
                        )
                    ),
                    pa.int64(),
                ),
            }
        )
        # Arrow-native hash aggregate — no pandas round-trip copy per batch
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("disc_e4", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents", "sum_disc_e4", "count_order"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=64 * 1024)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_e4", alias_name="sum_disc_e4"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    return out


@register(
    "q_group_count_sort",
    """
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_group_count_sort(sf_dir: str):
    """Group-count + sort desc (reference places.py:45-46, A1/O1)."""
    ds = _read(sf_dir, "events", ["event_type"])
    return ds.groupby("event_type").aggregate(Count(alias_name="n")).sort("n", descending=True)


@register(
    "q_window_tumbling",
    """
    SELECT user_id, date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def q_window_tumbling(sf_dir: str):
    """Tumbling event-time window as a grouped aggregate over a computed
    window-start column (SURVEY.md §2.10 — micro-batch windowing)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
                "value_cents": _cents(batch["value"]),
            }
        )

    # NB: a per-batch Arrow partial aggregate was measured SLOWER here
    # (3.1 s vs 2.2 s at sf0.1) — the per-batch hash agg costs more than
    # the shuffle rows it saves at this group cardinality. The winner
    # (round 3) is the repo-standard constant-shard pandas reduce: hash
    # users into 64 shards, ONE vectorized groupby-agg per shard — 1.9 s →
    # 1.1 s vs the native composite-key aggregate at sf0.1 (the native
    # sort-based aggregate pays a full sort of the pair key).
    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .map_batches(_add_user_shard, batch_format="pandas")
        .groupby("_sh")
        .map_groups(_window_reduce, batch_format="pandas")
    )


def _add_user_shard(df: pd.DataFrame) -> pd.DataFrame:
    df["_sh"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
    return df


def _window_reduce(g: pd.DataFrame) -> pd.DataFrame:
    return g.groupby(["user_id", "window_start"], as_index=False).agg(
        n_events=("value_cents", "size"), sum_value_cents=("value_cents", "sum")
    )


@register(
    "q_window_hopping",
    """
    WITH e AS (
      SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
             time_bucket(INTERVAL '30 minutes', ts) AS w0
      FROM events
    ), x AS (
      SELECT user_id, cents, w0 AS window_start FROM e
      UNION ALL
      SELECT user_id, cents, w0 - INTERVAL '30 minutes' FROM e
    )
    SELECT user_id, window_start, COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_value_cents
    FROM x GROUP BY user_id, window_start
    """,
)
def q_window_hopping(sf_dir: str):
    """Hopping (overlapping) event-time windows — size 1 h, hop 30 min, so
    every event belongs to exactly two windows (SURVEY.md §2.10 extension;
    the windowed-aggregate shape Ray Data lacks natively). The window
    replication happens MAP-side (each batch emits one row per covering
    window) so the shuffle is a plain grouped aggregate — no range join, no
    per-window scan of the input."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def explode_windows(batch: pa.Table) -> pa.Table:
        def _flat(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        w0 = _flat(pc.floor_temporal(batch["ts"], multiple=30, unit="minute"))
        w1 = pc.subtract(w0, pa.scalar(1_800_000_000, pa.duration("us")))
        uid = _flat(batch["user_id"])
        cents = _flat(_cents(batch["value"]))
        return pa.table(
            {
                "user_id": pa.concat_arrays([uid, uid]),
                "window_start": pa.concat_arrays([w0, _flat(w1)]),
                "value_cents": pa.concat_arrays([cents, cents]),
            }
        )

    return (
        ds.map_batches(explode_windows, batch_format="pyarrow")
        .map_batches(_add_user_shard, batch_format="pandas")
        .groupby("_sh")
        .map_groups(_window_reduce, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# B. Last-writer-wins fold (the reference's core reshape P1,
#    ref_collection.py:88-198) expressed with pure Dataset ops
# ---------------------------------------------------------------------------


@register(
    "q_lww_latest_event",
    """
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS last_value_cents
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_lww_latest_event(sf_dir: str):
    """Keyed last-writer-wins: per user, the latest event by (ts, event_id).
    Map-side combiner (keep one winner per key per batch) then a per-key
    final reduce — the associative LWW fold from stages/normalize.lww_reduce,
    here over the events table so DuckDB can oracle-check it."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def keep_last(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return df.drop_duplicates(subset=["user_id"], keep="last")

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        # constant-count shard reduce — per-KEY map_groups would be one tiny
        # pandas frame per user, the known Ray perf trap at high cardinality
        df["_us"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = keep_last(df)
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "last_ts": df["ts"].to_numpy(),
                "last_event_type": df["event_type"].to_numpy(),
                "last_value_cents": np.round(df["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out

    return (
        ds.map_batches(keep_last, batch_format="pandas", batch_size=32 * 1024)  # combiner
        .map_batches(add_shard, batch_format="pandas")
        .groupby("_us")
        .map_groups(finalize, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# C. Joins: broadcast dim chain, anti-join, as-of (reference J1-J4)
# ---------------------------------------------------------------------------


@register(
    "q_region_revenue",
    """
    SELECT r_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_region_revenue(sf_dir: str):
    """Three-level dimension join (reference J1/J2,
    arches_rascoll/prov_acts.py:56-68) with an AUTOMATIC broadcast→shuffle
    switch on the big dim's size. Below ARER_BROADCAST_DIM_LIMIT customer
    rows (parquet metadata — no read): the customer→region lookup is built
    once, ray.put once, and mapped per fact batch (only the fact table
    streams, zero shuffles). Above it: the lookup stays a Dataset and the
    fact side (reduced to (key, cents) first) hash-joins it via shard_join
    — the broadcast never outgrows worker heaps. Both paths end in the same
    partial-agg → tiny groupby."""
    import pyarrow.parquet as _pq

    dim_limit = int(os.environ.get("ARER_BROADCAST_DIM_LIMIT", str(20_000_000)))
    cust_rows = _pq.ParquetFile(os.path.join(sf_dir, "customer.parquet")).metadata.num_rows
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"])
    nat_to_region = (
        nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
        .set_index("n_nationkey")["r_name"]
    )

    def partial_agg(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("r_name", as_index=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum")
        )

    if cust_rows <= dim_limit:
        cust = pd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
        )
        lookup_ref = ray.put(
            cust.assign(r_name=cust["c_nationkey"].map(nat_to_region))
            .set_index("c_custkey")["r_name"]
            .to_dict()
        )

        def join_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(lookup_ref)
            batch["r_name"] = batch["o_custkey"].map(lookup)
            batch["cents"] = np.round(batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
            return partial_agg(batch)

        return (
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(join_and_partial, batch_format="pandas", batch_size=64 * 1024)
            .groupby("r_name")
            .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total_cents", alias_name="total_cents"))
        )

    from arches_rascoll_etl_ray.stages.shard_join import shard_join

    nat_ref = ray.put(nat_to_region)

    def cust_region(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"].to_numpy(dtype=np.int64),
                "r_name": batch["c_nationkey"].map(ray.get(nat_ref)).to_numpy(dtype=object),
            }
        )

    cust_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_region, batch_format="pandas")

    def orders_light(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(dtype=np.int64),
                "cents": np.round(batch["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )

    facts = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        orders_light, batch_format="pandas"
    )
    joined = shard_join(
        facts,
        cust_ds,
        on="o_custkey",
        right_on="c_custkey",
        left_cols=["o_custkey", "cents"],
        right_cols=["c_custkey", "r_name"],
        how="inner",
    )
    return (
        joined.map_batches(
            lambda df: partial_agg(df.assign(cents=df["cents"].astype(np.int64))),
            batch_format="pandas",
        )
        .groupby("r_name")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total_cents", alias_name="total_cents"))
    )


@register(
    "q_anti_join",
    """
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000
    )
    GROUP BY c_nationkey
    """,
)
def q_anti_join(sf_dir: str):
    """Anti-join via a PLUGGABLE broadcast key set (reference J4 idempotence
    guards, arches_rascoll/ref_collection.py:305-314). Below
    ARER_ANTI_EXACT_LIMIT distinct keys: broadcast the exact int64 array,
    vectorized NOT-isin. Above it (the 10^10 path): broadcast a Bloom filter
    (~1.2 B/key at 1% fpr); rows the bloom rules definitely-out are kept
    map-side with NO shuffle, the small maybe-set is resolved by an exact
    distributed anti shard-join — results stay exact at any scale, only the
    maybe rows (≈ fpr × big side + true matches) ever shuffle. Both modes
    oracle-identical (tests/test_bloom.py)."""
    exact_limit = int(os.environ.get("ARER_ANTI_EXACT_LIMIT", str(50_000_000)))
    keys_ds = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0))).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table({"o_custkey": pc.unique(t["o_custkey"])}), batch_format="pyarrow"
        )
        .materialize()  # batch-level distinct; global dedup below per mode
    )
    customers = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    if keys_ds.count() <= exact_limit:
        keys = np.unique(keys_ds.to_pandas()["o_custkey"].to_numpy(dtype=np.int64))
        keys_ref = ray.put(keys)

        def anti(batch: pd.DataFrame) -> pd.DataFrame:
            kept = batch[~batch["c_custkey"].isin(ray.get(keys_ref))]
            return kept.groupby("c_nationkey", as_index=False).agg(n_customers=("c_custkey", "size"))

        partials = customers.map_batches(anti, batch_format="pandas")
    else:
        from arches_rascoll_etl_ray.functions.bloom import BloomFilter, mix64
        from arches_rascoll_etl_ray.stages.shard_join import shard_join

        # build the bloom by streaming key batches through the driver:
        # O(num_bits) memory, one pass. (At 10^10 the build itself would be
        # sharded into key-range sub-blooms; the probe side is unchanged.)
        bloom = BloomFilter.for_capacity(keys_ds.count(), fpr=0.01)
        for b in keys_ds.iter_batches(batch_format="numpy", batch_size=65536):
            bloom.add_many(mix64(b["o_custkey"].astype(np.int64)))
        nb, nh = bloom.num_bits, bloom.num_hashes
        bits_ref = ray.put(bloom.bits)

        def mark(batch: pd.DataFrame) -> pd.DataFrame:
            bf = BloomFilter(nb, nh)
            bf.bits = ray.get(bits_ref)
            keys = batch["c_custkey"].to_numpy(dtype=np.int64)
            maybe = bf.contains_many(mix64(keys))
            sure = (
                batch[~maybe]
                .groupby("c_nationkey", as_index=False)
                .agg(n_customers=("c_custkey", "size"))
            )
            sure["c_custkey"] = np.int64(-1)
            mb = batch[maybe][["c_nationkey", "c_custkey"]].copy()
            mb["n_customers"] = np.int64(0)
            return pd.concat([sure, mb[["c_nationkey", "n_customers", "c_custkey"]]], ignore_index=True)

        marked = customers.map_batches(mark, batch_format="pandas").materialize()
        sure_counts = marked.map_batches(
            lambda df: df[df["c_custkey"] == -1][["c_nationkey", "n_customers"]],
            batch_format="pandas",
        )
        maybe_rows = marked.map_batches(
            lambda df: df[df["c_custkey"] != -1][["c_custkey", "c_nationkey"]],
            batch_format="pandas",
        )
        survivors = shard_join(
            maybe_rows,
            keys_ds,
            on="c_custkey",
            right_on="o_custkey",
            left_cols=["c_custkey", "c_nationkey"],
            right_cols=["o_custkey"],
            how="anti",
        )
        resolved = survivors.map_batches(
            lambda df: df.assign(c_nationkey=df["c_nationkey"].astype(np.int64))
            .groupby("c_nationkey", as_index=False)
            .agg(n_customers=("c_custkey", "size")),
            batch_format="pandas",
        )
        partials = sure_counts.union(resolved)

    return (
        partials.groupby("c_nationkey")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


def _with_forced_env(forced: dict, fn, sf_dir: str):
    """Run a query builder with size-gate env vars forced (the builders read
    their limits eagerly at construction, so restore-after-return is safe)."""
    saved = {k: os.environ.get(k) for k in forced}
    os.environ.update(forced)
    try:
        return fn(sf_dir)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@register("q_region_revenue_shuffle", ORACLE_SQL["q_region_revenue"])
def q_region_revenue_shuffle(sf_dir: str):
    """q_region_revenue with the broadcast gate forced OFF — the >limit
    shard-join path itself gets oracle-hashed (the 10^10 path must be the
    correct one, not just the fast small-side shortcut)."""
    return _with_forced_env({"ARER_BROADCAST_DIM_LIMIT": "0"}, q_region_revenue, sf_dir)


@register("q_anti_join_shuffle", ORACLE_SQL["q_anti_join"])
def q_anti_join_shuffle(sf_dir: str):
    """q_anti_join with the exact-broadcast gate forced OFF — the Bloom
    definite-out + distributed anti shard-join path gets oracle-hashed."""
    return _with_forced_env({"ARER_ANTI_EXACT_LIMIT": "0"}, q_anti_join, sf_dir)


@register(
    "q_semi_join",
    """
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (
      SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000
    )
    GROUP BY c_nationkey
    """,
)
def q_semi_join(sf_dir: str):
    """Distributed semi join (EXISTS — the complement of q_anti_join),
    routed through shard_join(how='semi') unconditionally: left rows whose
    key appears in the right key set survive exactly once (duplicate right
    keys collapse inside the shard mask), then a per-batch count partial
    feeds a tiny grouped sum."""
    from ray.data.aggregate import Sum

    from arches_rascoll_etl_ray.stages.shard_join import shard_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def big_keys(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["o_totalprice"], pa.scalar(450000.0)))
        return pa.table({"o_custkey": f["o_custkey"]})

    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        big_keys, batch_format="pyarrow"
    )
    kept = shard_join(
        cust,
        big,
        on="c_custkey",
        right_on="o_custkey",
        left_cols=["c_custkey", "c_nationkey"],
        right_cols=["o_custkey"],
        how="semi",
    )

    def pre_count(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("c_nationkey", as_index=False).agg(
            n_customers=("c_custkey", "size")
        )
        return pd.DataFrame(
            {
                "c_nationkey": out["c_nationkey"].to_numpy(dtype=np.int64),
                "n_customers": out["n_customers"].to_numpy(dtype=np.int64),
            }
        )

    return (
        kept.map_batches(pre_count, batch_format="pandas")
        .groupby("c_nationkey")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


@register(
    "q_asof_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(sf_dir: str):
    """As-of join (custom operator Ray Data lacks): for each purchase, the
    most recent click at-or-before it by the same user. Composition:
    partition by user (groupby) + pd.merge_asof per sorted group.
    Equal-ts clicks are reduced to the max event_id on BOTH sides first —
    otherwise the tie is engine-defined and the oracle hash diverges.
    Hash-partitioned by user into a CONSTANT shard count; each shard runs
    ONE `pd.merge_asof(by='user_id')` over all its users (per-key
    map_groups at user cardinality is the known Ray perf trap).
    Partitioning assumption: one shard's events fit in a group task."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"]))),
        batch_format="pyarrow",
    )

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_us"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    _ASOF_SCHEMA = pa.schema(
        [("purchase_id", pa.int64()), ("user_id", pa.int64()), ("last_click_id", pa.int64())]
    )

    def asof(df: pd.DataFrame) -> pa.Table:
        # Emit a pyarrow table so the null-carrying last_click_id is a plain
        # nullable int64 block — a pandas Int64 extension column is untypable
        # by Ray (`ds.schema()` -> None) and breaks oracle canonicalization.
        p = df[df["event_type"] == "purchase"].sort_values(["ts", "event_id"], kind="mergesort")
        c = (
            df[df["event_type"] == "click"]
            .sort_values(["ts", "event_id"], kind="mergesort")
            .drop_duplicates(subset=["user_id", "ts"], keep="last")
        )
        if len(p) == 0:
            return _ASOF_SCHEMA.empty_table()
        merged = pd.merge_asof(
            p[["event_id", "ts", "user_id"]],
            c[["user_id", "ts", "event_id"]].rename(columns={"event_id": "last_click_id"}),
            on="ts",
            by="user_id",
            direction="backward",
        )
        return pa.Table.from_arrays(
            [
                pa.Array.from_pandas(merged["event_id"].astype("int64"), type=pa.int64()),
                pa.Array.from_pandas(merged["user_id"].astype("int64"), type=pa.int64()),
                pa.Array.from_pandas(merged["last_click_id"], type=pa.int64()),
            ],
            schema=_ASOF_SCHEMA,
        )

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_us")
        .map_groups(asof, batch_format="pandas")
    )


@register(
    "q_range_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_recent_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts > p.ts - INTERVAL '1 hour' AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def q_range_join(sf_dir: str):
    """Range (interval) join — the second custom join shape Ray Data lacks:
    for each purchase, the count of same-user clicks in the trailing hour.
    Composition: hash-partition by user into a CONSTANT shard count, then
    express the interval count as a DIFFERENCE OF TWO AS-OF LOOKUPS on a
    per-user running click counter — cum(ts) − cum(ts − 1h) — so each shard
    runs two vectorized `pd.merge_asof(by='user_id')` passes instead of a
    quadratic per-row interval scan. Partitioning assumption: one shard's
    events fit in a group task (same contract as q_asof_join)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"]))),
        batch_format="pyarrow",
    )

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_us"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    _RJ_SCHEMA = pa.schema(
        [("purchase_id", pa.int64()), ("user_id", pa.int64()), ("n_recent_clicks", pa.int64())]
    )

    def range_count(df: pd.DataFrame) -> pa.Table:
        p = df[df["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        if len(p) == 0:
            return _RJ_SCHEMA.empty_table()
        c = df[df["event_type"] == "click"].sort_values(
            ["user_id", "ts"], kind="mergesort"
        )
        # per-user running click count (1-based at each click row); keep the
        # original ts dtype — merge_asof requires exact key-dtype equality
        clicks = c[["user_id", "ts"]].copy()
        clicks["cum"] = c.groupby("user_id", sort=False).cumcount().to_numpy() + 1
        clicks = clicks.sort_values("ts", kind="mergesort")
        left = p[["event_id", "user_id", "ts"]]
        hi = pd.merge_asof(left, clicks, on="ts", by="user_id", direction="backward")
        # subtract in the ts column's own unit — a pd.Timedelta (ns) would
        # silently promote datetime64[us] to [ns] and break merge_asof's
        # exact dtype match
        left_lo = left.assign(ts=left["ts"] - np.timedelta64(3_600_000_000, "us"))
        lo = pd.merge_asof(left_lo, clicks, on="ts", by="user_id", direction="backward")
        n = hi["cum"].fillna(0).to_numpy(dtype=np.int64) - lo["cum"].fillna(0).to_numpy(
            dtype=np.int64
        )
        return pa.Table.from_arrays(
            [
                pa.array(hi["event_id"].to_numpy(dtype=np.int64)),
                pa.array(hi["user_id"].to_numpy(dtype=np.int64)),
                pa.array(n),
            ],
            schema=_RJ_SCHEMA,
        )

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_us")
        .map_groups(range_count, batch_format="pandas")
    )


@register(
    "q_label_concat",
    """
    SELECT n_nationkey, n_name || ' (region: ' || r_name || ')' AS label
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_label_concat(sf_dir: str):
    """String templating over a broadcast lookup (reference M8 + J2,
    arches_rascoll/places.py:62, prov_acts.py:62-68)."""
    region = pd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    rmap = region.set_index("r_regionkey")["r_name"].to_dict()

    def build(batch: pa.Table) -> pa.Table:
        rnames = pa.array([rmap[k] for k in batch["n_regionkey"].to_pylist()], pa.string())
        label = pc.binary_join_element_wise(
            batch["n_name"],
            pc.binary_join_element_wise(pa.array(["(region: "] * batch.num_rows), rnames, pa.array([")"] * batch.num_rows), ""),
            " ",
        )
        return pa.table({"n_nationkey": batch["n_nationkey"], "label": label})

    return _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).map_batches(
        build, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# D. Set ops / dedup / distinct / filters (reference D1-D5, A2)
# ---------------------------------------------------------------------------


@register(
    "q_distinct_union",
    """
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def q_distinct_union(sf_dir: str):
    """Union-all + distinct (reference D1 + A2: distinct-value mining across
    columns, arches_rascoll/groups.py:52-56, places.py:50)."""
    a = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    b = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    return a.union(b).groupby("nationkey").aggregate(Count(alias_name="_n")).select_columns(["nationkey"])


@register(
    "q_dedup_keep_first",
    """
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(sf_dir: str):
    """Exact dedup by key keeping first (reference D2,
    arches_rascoll/places.py:52: drop_duplicates keeping first) — per-batch
    combiner (≤1 row per key per batch) then a per-key reduce; no task ever
    holds a whole key's rows."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def first_per_lang(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["lang", "doc_id"], kind="mergesort")
            .drop_duplicates("lang", keep="first")
        )

    return (
        ds.map_batches(first_per_lang, batch_format="pandas", batch_size=64 * 1024)  # combiner
        .groupby("lang")
        .map_groups(first_per_lang, batch_format="pandas")
    )


@register(
    "q_filter_nonempty",
    """
    SELECT source, COUNT(*) AS n
    FROM documents
    WHERE n_chars BETWEEN 100 AND 500 AND lang IS NOT NULL AND text <> ''
    GROUP BY source
    """,
)
def q_filter_nonempty(sf_dir: str):
    """Keep-if-nonempty predicate chain (reference D4,
    arches_rascoll/groups.py:118-127) as a vectorized Arrow filter."""
    ds = _read(sf_dir, "documents", ["source", "n_chars", "lang", "text"])

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.and_(pc.greater_equal(t["n_chars"], pa.scalar(100)), pc.less_equal(t["n_chars"], pa.scalar(500))),
                pc.is_valid(t["lang"]),
            ),
            pc.not_equal(t["text"], pa.scalar("")),
        )
        return t.filter(mask).select(["source"])

    return ds.map_batches(filt, batch_format="pyarrow").groupby("source").aggregate(Count(alias_name="n"))


# ---------------------------------------------------------------------------
# E. Scalar maps: normalize / cast / project / sort-limit (M6-M12, O1-O2)
# ---------------------------------------------------------------------------


@register(
    "q_string_normalize",
    """
    SELECT upper(trim(p_type)) AS type_norm, COUNT(*) AS n
    FROM part GROUP BY upper(trim(p_type))
    """,
)
def q_string_normalize(sf_dir: str):
    """Code normalizer (reference M6, arches_rascoll/groups.py:106-109:
    upper/strip) with pyarrow.compute kernels."""
    ds = _read(sf_dir, "part", ["p_type"])

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({"type_norm": pc.utf8_upper(pc.utf8_trim_whitespace(t["p_type"]))})

    return ds.map_batches(norm, batch_format="pyarrow").groupby("type_norm").aggregate(Count(alias_name="n"))


@register(
    "q_schema_projection",
    """
    SELECT doc_id, lang AS language, CAST(n_chars AS BIGINT) AS size_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def q_schema_projection(sf_dir: str):
    """The evolution projector as a standalone query: rename + cast +
    computed sha256 lineage column (SURVEY.md §2.11 / FIXTURES.md F3),
    oracle-checked against DuckDB's sha256."""
    from arches_rascoll_etl_ray.functions.hashing import sha256_hex_column

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars", "text"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "language": t["lang"],
                "size_bytes": pc.cast(t["n_chars"], pa.int64()),
                "content_sha": sha256_hex_column(t["text"]),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


@register(
    "q_topk_orders",
    """
    SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_topk_orders(sf_dir: str):
    """Sort-desc + limit (reference O1, arches_rascoll/places.py:46).
    Distributed sort then limit; deterministic tie-break on the key."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "totalprice_cents": _cents(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )


@register(
    "q_cast_concat_fill",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) || ':' || COALESCE(NULLIF(o_orderstatus, 'P'), '-') AS order_tag
    FROM orders
    """,
)
def q_cast_concat_fill(sf_dir: str):
    """Cast + concat + null-fill in one vectorized pass (reference M8/M9/M12,
    arches_rascoll/prov_acts.py:52-61)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def build(t: pa.Table) -> pa.Table:
        status = pc.if_else(
            pc.equal(t["o_orderstatus"], pa.scalar("P")),
            pa.scalar("-", pa.string()),
            t["o_orderstatus"],
        )
        status = pc.fill_null(status, "-")
        tag = pc.binary_join_element_wise(pc.cast(t["o_orderkey"], pa.string()), status, ":")
        return pa.table({"o_orderkey": t["o_orderkey"], "order_tag": tag})

    return ds.map_batches(build, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# F. Dimension mining, sessionization, large-side hash join, nested values
# ---------------------------------------------------------------------------


@register(
    "q_dim_mint",
    """
    SELECT DISTINCT c_mktsegment AS name, md5(c_mktsegment) AS dim_id
    FROM customer
    """,
)
def q_dim_mint(sf_dir: str):
    """Dimension minting: distinct values of a raw column become a
    (name, deterministic id) dim table — the reference's groups/persons
    mining with uuid4 replaced by a content-derived id
    (arches_rascoll/groups.py:39-66, persons.py:7-34; determinism per
    FIXTURES.md)."""
    import hashlib

    ds = _read(sf_dir, "customer", ["c_mktsegment"])

    def mint(df: pd.DataFrame) -> pd.DataFrame:
        u = df["c_mktsegment"].drop_duplicates()
        return pd.DataFrame(
            {"name": u.to_numpy(), "dim_id": [hashlib.md5(s.encode()).hexdigest() for s in u]}
        )

    # per-batch distinct (combiner) -> global distinct on the tiny result
    return (
        ds.map_batches(mint, batch_format="pandas")
        .groupby("name")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


@register(
    "q_session_windows",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events, MIN(ts) AS session_start
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_session_windows(sf_dir: str):
    """Session windows (30-min inactivity gap): the streaming-shaped
    operator from SURVEY.md §2.10, hash-partitioned by user into a constant
    shard count; each shard sessionizes ALL its users in one vectorized
    pass (gap-or-new-user cumsum). Partitioning assumption: one shard's
    events fit in a group task."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_us"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = (df["ts"].diff() > pd.Timedelta(minutes=30)) | new_user
        sess_global = gap.cumsum()
        # per-user session numbering starting at 0 (matches the SQL window)
        session_no = (sess_global - sess_global.groupby(df["user_id"]).transform("min")).astype("int64")
        out = (
            df.assign(session_no=session_no)
            .groupby(["user_id", "session_no"], as_index=False)
            .agg(n_events=("ts", "size"), session_start=("ts", "min"))
        )
        return out[["user_id", "session_no", "n_events", "session_start"]]

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_us")
        .map_groups(sessionize, batch_format="pandas")
    )


@register(
    "q_join_large",
    """
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def q_join_large(sf_dir: str):
    """Both-sides-large join, hash-partitioned on the key via
    stages/shard_join (Ray 2.49's native join operator crashes when a hash
    partition receives zero rows from one side — see shard_join's module
    docstring). Shuffle-volume discipline: lineitem revenue pre-aggregates
    by orderkey map-side BEFORE the join (Arrow hash agg per batch), the
    timestamp rides as int64 µs, and the post-join reduce is a
    constant-shard vectorized groupby (Ray's native composite-key
    aggregate measured 4× slower on this shape)."""
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def pre(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
                    pa.scalar(10000.0),
                )
            ),
            pa.int64(),
        )
        t2 = pa.table({"l_orderkey": t["l_orderkey"], "revenue_e4": rev})
        g = t2.group_by(["l_orderkey"]).aggregate([("revenue_e4", "sum")])
        return g.rename_columns(["l_orderkey", "revenue_e4"])

    lineitem = lineitem.map_batches(pre, batch_format="pyarrow")

    def filt(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")))
        return pa.table(
            {"o_orderkey": f["o_orderkey"], "date_us": pc.cast(f["o_orderdate"], pa.int64())}
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        filt, batch_format="pyarrow"
    )
    from arches_rascoll_etl_ray.stages.shard_join import shard_join

    def reduce_block(g: pd.DataFrame) -> pa.Table:
        # runs as shard_join's post_merge INSIDE the per-shard group fn,
        # where the shard is guaranteed whole — a downstream map_batches
        # reduce would silently split a key once the shard's output block
        # exceeds target_max_block_size (Ray dynamic block splitting).
        if len(g) == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "revenue_e4": pa.array([], pa.int64()),
                }
            )
        g = g.assign(
            revenue_e4=g["revenue_e4"].astype(np.int64), date_us=g["date_us"].astype(np.int64)
        )
        out = g.groupby(["l_orderkey", "date_us"], as_index=False).agg(
            revenue_e4=("revenue_e4", "sum")
        )
        return pa.table(
            {
                "l_orderkey": pa.array(out["l_orderkey"].to_numpy(dtype=np.int64)),
                "o_orderdate": pa.array(out["date_us"].to_numpy(dtype=np.int64)).cast(
                    pa.timestamp("us")
                ),
                "revenue_e4": pa.array(out["revenue_e4"].to_numpy(dtype=np.int64)),
            }
        )

    return shard_join(
        lineitem,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        left_cols=["l_orderkey", "revenue_e4"],
        right_cols=["o_orderkey", "date_us"],
        how="inner",
        post_merge=reduce_block,
    )


@register(
    "q_full_outer_join",
    """
    WITH cust AS (
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal >= 0
    ), ords AS (
      SELECT o_custkey,
             count(*) AS n_orders,
             CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    )
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name AS c_name,
           o.n_orders AS n_orders,
           o.total_cents AS total_cents
    FROM cust c FULL OUTER JOIN ords o ON c.c_custkey = o.o_custkey
    """,
)
def q_full_outer_join(sf_dir: str):
    """Full outer join, hash-partitioned via shard_join(how='outer'):
    unmatched rows from BOTH sides survive null-padded (17 left-only /
    10 right-only at sf0.001, so both directions are exercised). The heavy
    side pre-aggregates per key map-side before the shuffle, same
    discipline as q_join_large."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_acctbal"], pa.scalar(0.0))).select(
            ["c_custkey", "c_name"]
        ),
        batch_format="pyarrow",
    )

    def pre(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT")))
        cents = pc.cast(pc.round(pc.multiply(f["o_totalprice"], pa.scalar(100.0))), pa.int64())
        g = (
            pa.table({"o_custkey": f["o_custkey"], "total_cents": cents})
            .group_by(["o_custkey"])
            .aggregate([("total_cents", "sum"), ("total_cents", "count")])
        )
        return g.rename_columns(["o_custkey", "total_cents", "n_orders"])

    ords = _read(sf_dir, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"]).map_batches(
        pre, batch_format="pyarrow"
    )
    from arches_rascoll_etl_ray.stages.shard_join import shard_join

    def combine(g: pd.DataFrame) -> pa.Table:
        # combine the per-batch right-side partials that met at the join.
        # Runs as shard_join's post_merge INSIDE the per-shard group fn
        # (guaranteed whole) — a downstream map_batches reduce would split
        # a key once the block exceeds target_max_block_size.
        # count() tracks non-null partials: keys with none (left-only) keep
        # NULL aggregates, matching FULL OUTER JOIN semantics.
        if len(g) == 0:
            return pa.table(
                {
                    "custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                }
            )
        out = g.groupby("c_custkey", as_index=False).agg(
            c_name=("c_name", "first"),
            n_orders=("n_orders", "sum"),
            total_cents=("total_cents", "sum"),
            n_present=("n_orders", "count"),
        )
        none = out["n_present"].to_numpy() == 0
        out["n_orders"] = out["n_orders"].astype("Int64").mask(none)
        out["total_cents"] = out["total_cents"].astype("Int64").mask(none)
        return pa.table(
            {
                "custkey": pa.array(out["c_custkey"].astype("Int64"), pa.int64()),
                "c_name": pa.array(out["c_name"], pa.string()),
                "n_orders": pa.array(out["n_orders"], pa.int64()),
                "total_cents": pa.array(out["total_cents"], pa.int64()),
            }
        )

    return shard_join(
        cust,
        ords,
        on="c_custkey",
        right_on="o_custkey",
        left_cols=["c_custkey", "c_name"],
        right_cols=["o_custkey", "total_cents", "n_orders"],
        how="outer",
        post_merge=combine,
    )


@register(
    "q_lang_dict_json",
    """
    SELECT doc_id,
           '{"lang": "' || lang || '", "value": "' || CAST(n_chars AS VARCHAR) || '", "direction": "ltr"}' AS lang_dict
    FROM documents
    """,
)
def q_lang_dict_json(sf_dir: str):
    """Language-dict nested value (reference make_lang_dict_value,
    general_configs.py:61-67) built as a native Arrow struct, serialized to
    canonical JSON only for the SQL oracle comparison."""
    from arches_rascoll_etl_ray.functions.nested import make_lang_dict_column

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def build(t: pa.Table) -> pa.Table:
        # build the native struct column (per-row lang), then render the
        # canonical JSON from its fields — both fully vectorized kernels
        structs = make_lang_dict_column(t["n_chars"], lang=t["lang"])
        js = pc.binary_join_element_wise(
            '{"lang": "',
            pc.struct_field(structs, "lang"),
            '", "value": "',
            pc.struct_field(structs, "value"),
            '", "direction": "',
            pc.struct_field(structs, "direction"),
            '"}',
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "lang_dict": js})

    return ds.map_batches(build, batch_format="pyarrow")


@register(
    "q_json_extract",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_json_extract(sf_dir: str):
    """JSON-cell parsing with error→null (reference make_transformed_value,
    arches_rascoll/ref_collection.py:74-85) over the events.props column."""
    from arches_rascoll_etl_ray.functions.json_io import json_extract_int_column

    ds = _read(sf_dir, "events", ["event_id", "props"])

    def extract(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"], "k_value": json_extract_int_column(t["props"], "k")}
        )

    return ds.map_batches(extract, batch_format="pyarrow")


@register(
    "q_pivot_wide",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
    """,
)
def q_pivot_wide(sf_dir: str):
    """Long→wide pivot: one wide row per key with per-category columns —
    the reference's central reshape (one wide staging row per resource
    instance, arches_rascoll/ref_collection.py:88-198) as a partial-
    aggregated pivot."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    cats = ["click", "view", "purchase", "signup", "error"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"user_id": df["user_id"]}
        for c in cats:
            out[f"n_{c}"] = (df["event_type"] == c).astype("int64")
        return (
            pd.DataFrame(out)
            .groupby("user_id", as_index=False)
            .sum()
        )

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["_sh"]).groupby("user_id", as_index=False).sum()

    # constant-shard reduce: the native multi-Sum aggregate measured 6.5 s
    # at sf0.1 vs ~1 s for 64 shards × one vectorized pandas sum each
    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=64 * 1024)
        .map_batches(_add_user_shard, batch_format="pandas")
        .groupby("_sh")
        .map_groups(reduce_shard, batch_format="pandas")
    )


@register(
    "q_running_total",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_cents
    FROM events
    """,
)
def q_running_total(sf_dir: str):
    """Per-key running total over event time (ordered window) — constant
    user-shard groupby; one vectorized per-user cumsum per shard."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_us"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        cents = pd.Series(np.round(df["value"].to_numpy() * 100).astype(np.int64))
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "user_id": df["user_id"].to_numpy(),
                "running_cents": cents.groupby(df["user_id"]).cumsum().to_numpy(),
            }
        )

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_us")
        .map_groups(running, batch_format="pandas")
    )


@register(
    "q_histogram",
    """
    SELECT event_type,
           CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM events GROUP BY event_type, CAST(least(floor(value / 50.0), 9) AS BIGINT)
    """,
)
def q_histogram(sf_dir: str):
    """Fixed-width bucketed histogram per category (vectorized digitize +
    partial counts)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = np.minimum(np.floor(df["value"].to_numpy() / 50.0), 9).astype(np.int64)
        out = pd.DataFrame({"event_type": df["event_type"], "bucket": b})
        return out.groupby(["event_type", "bucket"], as_index=False).size().rename(columns={"size": "n"})

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


@register(
    "q_median_exact",
    """
    SELECT event_type,
           CAST(ROUND(median(value) * 200) AS BIGINT) AS median_x200
    FROM events GROUP BY event_type
    """,
)
def q_median_exact(sf_dir: str):
    """EXACT per-group median from a value-count histogram: values carry 2
    decimals, so (event_type, value_cents) counts are a lossless sufficient
    statistic — map-side partial counts, a tiny grouped sum, and the median
    read off the cumulative counts. No task ever holds a group's raw values
    (the naive per-group median is unbounded at scale; the histogram is
    bounded by the value domain). ×200 keeps even-group half-cent medians
    exactly integral in both engines."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "value_cents": np.round(df["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out.groupby(["event_type", "value_cents"], as_index=False).agg(
            cnt=("value_cents", "size")
        )

    def median_from_hist(df: pd.DataFrame) -> pd.DataFrame:
        out_types, out_med = [], []
        for etype, g in df.groupby("event_type"):
            g = g.sort_values("value_cents", kind="mergesort")
            cents = g["value_cents"].to_numpy()
            counts = g["cnt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(counts)
            n = int(cum[-1])
            lo = cents[np.searchsorted(cum, (n + 1) // 2)]
            hi = cents[np.searchsorted(cum, n // 2 + 1)]
            out_types.append(etype)
            out_med.append(int(lo + hi))  # (lo+hi)/2 cents ×200 = (lo+hi)×100... see below
        return pd.DataFrame(
            {"event_type": out_types, "median_x200": [m for m in out_med]}
        )

    counts = _hist_reduce(
        ds.map_batches(partial_counts, batch_format="pandas", batch_size=64 * 1024)
    )
    # the histogram is tiny (types × distinct cents): one block, one pass
    return counts.repartition(1).map_batches(
        median_from_hist, batch_format="pandas", batch_size=None
    )


def _hist_reduce(partials: ray.data.Dataset) -> ray.data.Dataset:
    """Global (event_type, value_cents) count reduce via the constant-shard
    pattern. The native composite-key `.aggregate(Sum)` measured 104 s at
    sf0.1 (~300k distinct groups — Ray 2.49's sort aggregate collapses at
    this cardinality); 64 value-hash shards with one vectorized pandas
    groupby-sum each run in ~1 s."""

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_sh"] = (df["value_cents"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def reduce_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "value_cents"], as_index=False).agg(cnt=("cnt", "sum"))

    return (
        partials.map_batches(add_shard, batch_format="pandas")
        .groupby("_sh")
        .map_groups(reduce_shard, batch_format="pandas")
    )


@register(
    "q_quantiles_exact",
    """
    SELECT event_type,
           CAST(quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.50) AS BIGINT) AS p50_cents,
           CAST(quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.90) AS BIGINT) AS p90_cents,
           CAST(quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_cents
    FROM events GROUP BY event_type
    """,
)
def q_quantiles_exact(sf_dir: str):
    """EXACT multi-quantile (P50/P90/P99 per group) from the same bounded
    value-count histogram as q_median_exact: map-side partial counts, a tiny
    grouped sum, quantiles read off the cumulative counts with integer
    thresholds (smallest value whose cum count c satisfies 100·c ≥ p·n —
    percentile_disc semantics, no float comparison). The distributed cost is
    one small-histogram shuffle no matter how many quantiles are read — the
    exact-quantile shape that replaces a per-group full sort at scale."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "value_cents": np.round(df["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        return out.groupby(["event_type", "value_cents"], as_index=False).agg(
            cnt=("value_cents", "size")
        )

    _PCTS = (50, 90, 99)

    def quantiles_from_hist(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"event_type": []}
        for p in _PCTS:
            rows[f"p{p}_cents"] = []
        for etype, g in df.groupby("event_type"):
            g = g.sort_values("value_cents", kind="mergesort")
            cents = g["value_cents"].to_numpy()
            cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64))
            n = int(cum[-1])
            rows["event_type"].append(etype)
            for p in _PCTS:
                t = (p * n + 99) // 100  # smallest integer c with 100c >= pn
                rows[f"p{p}_cents"].append(int(cents[np.searchsorted(cum, t)]))
        return pd.DataFrame(rows)

    counts = _hist_reduce(
        ds.map_batches(partial_counts, batch_format="pandas", batch_size=64 * 1024)
    )
    return counts.repartition(1).map_batches(
        quantiles_from_hist, batch_format="pandas", batch_size=None
    )


@register(
    "q_top1_per_group",
    """
    SELECT o_custkey, o_orderkey AS top_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS top_price_cents
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_top1_per_group(sf_dir: str):
    """Arg-max per key (top order per customer) — per-batch combiner keeps
    one candidate per key, final per-key reduce picks the winner."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def keep_best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True], kind="mergesort")
        return df.drop_duplicates("o_custkey", keep="first")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = keep_best(df)
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].to_numpy(),
                "top_orderkey": df["o_orderkey"].to_numpy(),
                "top_price_cents": np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64),
            }
        )

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        # constant-shard reduce (per-key map_groups at customer cardinality
        # is the known Ray perf trap); keep_best is already vectorized
        # across many keys
        df["_cs"] = (df["o_custkey"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    return (
        ds.map_batches(keep_best, batch_format="pandas", batch_size=32 * 1024)
        .map_batches(add_shard, batch_format="pandas")
        .groupby("_cs")
        .map_groups(finalize, batch_format="pandas")
    )


@register(
    "q_topk_per_group",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(sf_dir: str):
    """Top-k per key (k=3 orders per customer, deterministic tiebreak on
    orderkey). Per-batch combiner keeps ≤k candidates per key — the only
    rows that can make the global top-k — then a constant-shard reduce
    finishes; never a per-key map_groups."""
    K = 3
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def keep_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("o_custkey", sort=False).head(K)

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df["_cs"] = (df["o_custkey"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = keep_topk(df)
        rank = df.groupby("o_custkey", sort=False).cumcount().to_numpy() + 1
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].to_numpy(),
                "o_orderkey": df["o_orderkey"].to_numpy(),
                "price_cents": np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64),
                "rank": rank.astype(np.int64),
            }
        )

    return (
        ds.map_batches(keep_topk, batch_format="pandas", batch_size=32 * 1024)
        .map_batches(add_shard, batch_format="pandas")
        .groupby("_cs")
        .map_groups(finalize, batch_format="pandas")
    )


@register(
    "q_lag_diff",
    """
    SELECT user_id, event_id,
           CAST(ROUND(value * 100) AS BIGINT)
             - lag(CAST(ROUND(value * 100) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
    FROM events
    """,
)
def q_lag_diff(sf_dir: str):
    """Per-key LAG/consecutive-delta (the change-per-event signal): hash-
    shard by user, ONE vectorized sort + diff per shard with a group-
    boundary mask — the distributed recast of a LAG window function. A
    key's whole history lives in one shard, so the diff is globally
    correct; shard count is constant, so no per-key task explosion."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "cents": np.round(df["value"].to_numpy() * 100).astype(np.int64),
            }
        )
        df["_cs"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def diff_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = g["cents"].to_numpy()
        users = g["user_id"].to_numpy()
        delta = np.empty(len(g), dtype=np.float64)
        delta[1:] = cents[1:] - cents[:-1]
        delta[0] = np.nan
        if len(g) > 1:
            delta[1:][users[1:] != users[:-1]] = np.nan
        return pd.DataFrame(
            {
                "user_id": users,
                "event_id": g["event_id"].to_numpy(),
                "delta_cents": pd.array(delta, dtype="Int64"),
            }
        )

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_cs")
        .map_groups(diff_shard, batch_format="pandas")
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "event_id": t["event_id"],
                    "delta_cents": t["delta_cents"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


@register(
    "q_rank_in_group",
    """
    SELECT user_id, event_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rank
    FROM events
    """,
)
def q_rank_in_group(sf_dir: str):
    """Per-key ROW_NUMBER ranking (every row, not just top-k): hash-shard
    by key, ONE vectorized sort + cumcount per shard — the same
    constant-shard recast as q_lag_diff; a key's rows co-locate so the
    rank is globally correct."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "event_id", "value"]].copy()
        df["_cs"] = (df["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "value", "event_id"], ascending=[True, False, True], kind="mergesort"
        )
        rank = g.groupby("user_id", sort=False).cumcount().to_numpy() + 1
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "rank": rank.astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_cs")
        .map_groups(rank_shard, batch_format="pandas")
    )


@register(
    "q_decile_bucket",
    """
    WITH th AS (
      SELECT quantile_disc(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(len(list_filter((SELECT qs FROM th), q -> n_chars > q)) AS BIGINT) AS decile
    FROM documents
    """,
)
def q_decile_bucket(sf_dir: str):
    """Global percentile bucketing: EXACT decile thresholds from the
    bounded value-count histogram (same integer-threshold arithmetic as
    q_quantiles_exact — smallest value whose cumulative count c satisfies
    10c ≥ kn, i.e. quantile_disc semantics), broadcast to a second map-only
    pass that assigns each row its bucket via searchsorted. Two streaming
    passes; the only driver materialization is 9 integers."""
    ds = _docs_read(sf_dir)

    def partial_counts(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"v": t["n_chars"]})
            .group_by(["v"])
            .aggregate([("v", "count")])
        )
        return g.rename_columns(["v", "cnt"])

    hist = (
        ds.map_batches(partial_counts, batch_format="pyarrow", batch_size=64 * 1024)
        .groupby("v")
        .sum("cnt")
        .to_pandas()
    )
    hist = hist.sort_values("v", kind="mergesort")
    vals = hist["v"].to_numpy(dtype=np.int64)
    cum = np.cumsum(hist["sum(cnt)"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    # smallest value with 10*cum >= k*n  (quantile_disc discrete semantics)
    thresholds = np.array(
        [vals[np.searchsorted(cum, (k * n + 9) // 10)] for k in range(1, 10)], dtype=np.int64
    )

    def assign(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy()
        # side='left' = count of thresholds strictly below the value, which
        # is exactly the oracle's len(list_filter(qs, q -> n_chars > q))
        decile = np.searchsorted(thresholds, nc, side="left")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "decile": pa.array(decile.astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def _docs_read(sf_dir: str) -> "ray.data.Dataset":
    import os as _os

    return ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )


@register(
    "q_unpivot",
    """
    SELECT c_custkey, 'acctbal_cents' AS metric,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS BIGINT) FROM customer
    """,
)
def q_unpivot(sf_dir: str):
    """Unpivot / melt (wide → long): each input row emits one output row
    per measure column — a pure map-side widening, no shuffle."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_nationkey"])

    def melt(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy()
        n = len(k)
        cents = np.round(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        nk = t["c_nationkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "c_custkey": pa.array(np.concatenate([k, k])),
                "metric": pa.array(["acctbal_cents"] * n + ["nationkey"] * n, pa.string()),
                "value": pa.array(np.concatenate([cents, nk])),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


@register(
    "q_string_agg",
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def q_string_agg(sf_dir: str):
    """Ordered grouped string aggregation (deterministic ORDER BY inside
    the aggregate so both engines produce identical strings)."""
    ds = _read(sf_dir, "nation", ["n_regionkey", "n_name"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(df["n_name"]))
        return pd.DataFrame({"n_regionkey": [df["n_regionkey"].iloc[0]], "names": [names]})

    return ds.groupby("n_regionkey").map_groups(agg, batch_format="pandas")


@register(
    "q_count_distinct",
    """
    SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_count_distinct(sf_dir: str):
    """Exact distinct count per group, two-level: per-batch distinct pairs
    (combiner) → PARTKEY-sharded exact distinct + per-shard counts →
    per-flag sum. Shards partition the partkey space, so per-shard distinct
    counts are disjoint and additive — no single task ever holds a whole
    flag's distinct set (a flag's set is unbounded at scale)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        df["_ps"] = (df["l_partkey"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return df

    def count_shard(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_returnflag", "l_partkey"])
        return d.groupby("l_returnflag", as_index=False).agg(n_parts=("l_partkey", "size"))

    return (
        ds.map_batches(pairs, batch_format="pandas", batch_size=64 * 1024)
        .groupby("_ps")
        .map_groups(count_shard, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(Sum("n_parts", alias_name="n_parts"))
    )


# ---------------------------------------------------------------------------
# Distributed PageRank (iterative graph algorithm over the order–part graph)
# ---------------------------------------------------------------------------

_PR_K = 3  # power iterations
_PR_D = 0.85


def _pagerank_sql() -> str:
    """Generated DuckDB twin: K chained rank CTEs over the symmetric
    order–part bipartite graph (node ids 2·orderkey / 2·partkey+1 — the two
    directions can't collide, so UNION ALL after the DISTINCT base)."""
    parts = [
        """
base AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (SELECT 2*o AS src, 2*p+1 AS dst FROM base
          UNION ALL SELECT 2*p+1, 2*o FROM base),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
r0 AS (SELECT src AS node, 1.0/(SELECT n FROM n) AS r FROM deg)
"""
    ]
    for i in range(_PR_K):
        parts.append(f"""
r{i + 1} AS (SELECT e.dst AS node,
                    0.15/(SELECT n FROM n) + {_PR_D}*sum(r{i}.r/d.deg) AS r
             FROM edges e JOIN r{i} ON r{i}.node = e.src
                          JOIN deg d ON d.src = e.src
             GROUP BY e.dst)
""")
    return (
        "WITH "
        + ",".join(parts)
        + f" SELECT node, CAST(ROUND(r*1e9) AS BIGINT) AS rank_e9 FROM r{_PR_K}"
    )


def _pagerank_pipeline(sf_dir: str, broadcast_limit: int):
    """Shared PageRank pipeline — see q_pagerank for semantics and the
    broadcast↔distributed gate, q_pagerank_dist for the forced-distributed
    twin."""
    from arches_rascoll_etl_ray.functions.hashing import splitmix64
    from arches_rascoll_etl_ray.functions.numeric import round_half_away
    from arches_rascoll_etl_ray.stages.shard_join import shard_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        o = pc.cast(t["l_orderkey"], pa.int64()).to_numpy()
        p = pc.cast(t["l_partkey"], pa.int64()).to_numpy()
        src = np.concatenate([2 * o, 2 * p + 1])
        dst = np.concatenate([2 * p + 1, 2 * o])
        local = (
            pa.table({"src": pa.array(src), "dst": pa.array(dst)})
            .group_by(["src", "dst"])
            .aggregate([])  # local dedupe: repeat (order, part) pairs collapse
        )
        shard = (splitmix64(local["src"].to_numpy()) % np.uint64(64)).astype(np.int32)
        return local.append_column("shard", pa.array(shard))

    def shard_edges(df: pd.DataFrame) -> pd.DataFrame:
        # a src's edges all live in this shard: exact dedupe + degree here
        e = df[["src", "dst"]].drop_duplicates()
        e["deg"] = e.groupby("src")["src"].transform("size").astype(np.int64)
        return e

    edges = (
        li.map_batches(mk_edges, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_edges, batch_format="pandas")
        .materialize()
    )

    def uniq_nodes(t: pa.Table) -> pa.Table:
        u = pa.table({"node": t["src"]}).group_by(["node"]).aggregate([])
        sh = (splitmix64(u["node"].to_numpy()) % np.uint64(64)).astype(np.int32)
        return u.append_column("shard", pa.array(sh))

    def shard_uniq(df: pd.DataFrame) -> pd.DataFrame:
        # the whole shard group is guaranteed in one call — a per-BATCH
        # dedupe would double-count a node whose edge rows straddle two
        # blocks once dynamic block splitting kicks in at scale
        return df[["node"]].drop_duplicates()

    nodes = (
        edges.map_batches(uniq_nodes, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_uniq, batch_format="pandas")
        .materialize()
    )
    n_nodes = nodes.count()
    base = 0.15 / n_nodes

    if n_nodes <= broadcast_limit:
        # rank-vector broadcast mode: the rank table is NODE-bounded (16 B
        # per node — 2M nodes ≈ 32 MB), so like every other gated small
        # side it rides ray.put; edges NEVER re-shuffle. Per iteration: one
        # map-only pass over the materialized edges (searchsorted rank
        # lookup, per-batch per-dst partial sums), one constant-64-shard
        # exact reduce, and a ≤N-row driver fold.
        chunks = [
            b["node"].to_numpy(dtype=np.int64)
            for b in nodes.iter_batches(batch_format="pandas")
        ]
        node_ids = np.sort(np.concatenate(chunks)) if chunks else np.array([], dtype=np.int64)
        r = np.full(n_nodes, 1.0 / n_nodes)
        for _ in range(_PR_K):
            r_ref = ray.put(r)

            def contrib_bc(t: pa.Table, _r=r_ref) -> pa.Table:
                rv = ray.get(_r)
                src = t["src"].to_numpy()
                c = rv[np.searchsorted(node_ids, src)] / t["deg"].to_numpy().astype(
                    np.float64
                )
                part = (
                    pa.table({"dst": t["dst"], "s": pa.array(c)})
                    .group_by(["dst"])
                    .aggregate([("s", "sum")])
                    .rename_columns(["dst", "s"])
                )
                sh = (splitmix64(part["dst"].to_numpy()) % np.uint64(64)).astype(np.int32)
                return part.append_column("shard", pa.array(sh))

            def fold_bc(df: pd.DataFrame) -> pd.DataFrame:
                return df.groupby("dst", as_index=False).agg(s=("s", "sum"))

            partial = (
                edges.map_batches(contrib_bc, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(fold_bc, batch_format="pandas")
                .to_pandas()  # exactly one row per node: ≤ broadcast_limit
            )
            s = np.zeros(n_nodes)
            s[np.searchsorted(node_ids, partial["dst"].to_numpy(dtype=np.int64))] = (
                partial["s"].to_numpy(dtype=np.float64)
            )
            r = base + _PR_D * s
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_ids),
                    "rank_e9": pa.array(round_half_away(r * 1e9).astype(np.int64)),
                }
            )
        )

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "r": pa.array(np.full(t.num_rows, 1.0 / n_nodes)),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(_PR_K):

        def contrib(g: pd.DataFrame) -> pa.Table:
            if len(g) == 0:
                return pa.table(
                    {"dst": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}
                )
            dst = g["dst"].to_numpy(dtype=np.int64)
            c = g["r"].to_numpy(dtype=np.float64) / g["deg"].to_numpy(dtype=np.float64)
            out = pd.DataFrame({"dst": dst, "s": c}).groupby("dst", as_index=False).agg(
                s=("s", "sum")
            )
            return pa.table(
                {
                    "dst": pa.array(out["dst"].to_numpy(dtype=np.int64)),
                    "s": pa.array(out["s"].to_numpy(dtype=np.float64)),
                }
            )

        partials = shard_join(
            edges,
            ranks,
            on="src",
            right_on="node",
            left_cols=["src", "dst", "deg"],
            right_cols=["node", "r"],
            post_merge=contrib,
        )

        def shard2(t: pa.Table) -> pa.Table:
            sh = (splitmix64(t["dst"].to_numpy()) % np.uint64(64)).astype(np.int32)
            return t.append_column("shard", pa.array(sh))

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("dst", as_index=False).agg(s=("s", "sum"))
            return pd.DataFrame(
                {
                    "node": out["dst"].to_numpy(dtype=np.int64),
                    "r": base + _PR_D * out["s"].to_numpy(dtype=np.float64),
                }
            )

        ranks = (
            partials.map_batches(shard2, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(fold, batch_format="pandas")
            .materialize()
        )

    def finish(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy()
        return pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "rank_e9": pa.array(round_half_away(r * 1e9).astype(np.int64)),
            }
        )

    return ranks.map_batches(finish, batch_format="pyarrow")


@register("q_pagerank", _pagerank_sql())
def q_pagerank(sf_dir: str):
    """PageRank, K=3 power iterations over the symmetric order–part
    bipartite graph (every lineitem is an undirected edge) — the canonical
    iterative-graph workload. Edge build (shared by both modes): per-batch
    local dedupe, then exact dedupe + degree inside an h(src) shard groupby
    (a src's edges land in ONE shard), materialized once; the node set is
    derived split-safely (whole-group dedupe). Symmetric edges mean no
    dangling-mass term and every node re-appears each iteration.

    Mode gate (the q_region_revenue/term-importance pattern): the rank
    vector is NODE-bounded — 16 B/node — so below
    ARER_BROADCAST_RANK_LIMIT (default 2M nodes ≈ 32 MB) it broadcasts via
    ray.put and each iteration is ONE map-only edges pass (searchsorted
    lookup, per-batch per-dst partials) + ONE constant-64-shard exact
    reduce — the edge list never re-shuffles. Above the gate (10^9-node
    graphs) the fully distributed path runs: shard_join(edges, ranks,
    on=src) with in-group per-dst pre-aggregation, then a shard fold on
    dst — 2 shuffles/iteration, no driver data path; that route itself is
    oracle-hashed via q_pagerank_dist.

    Float discipline: e9 fixed point with measured rounding-boundary
    margins 2.9e-4 / 1.0e-5 / 2.9e-7 at sf0.001/0.01/0.1 vs cross-engine
    summation-order noise ~1e-10 of value (the kmeans/ppl margin
    methodology)."""
    limit = int(os.environ.get("ARER_BROADCAST_RANK_LIMIT", "2000000"))
    return _pagerank_pipeline(sf_dir, limit)


@register("q_pagerank_dist", _pagerank_sql())
def q_pagerank_dist(sf_dir: str):
    """q_pagerank with the broadcast gate forced OFF — the 10^9-node
    shard_join route itself behind the oracle hash (the `_dist` twin
    convention)."""
    return _pagerank_pipeline(sf_dir, 0)


@register(
    "q_rollup",
    """
    SELECT coalesce(lang, '*') AS lang,
           coalesce(source, '*') AS source,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def q_rollup(sf_dir: str):
    """ROLLUP aggregate (lang × source counts + per-lang subtotals + grand
    total — the OLAP cube slice): ONE pass emits all three grouping levels
    as pre-aggregated partials map-side ('*' sentinel for rolled-up
    levels), so the shuffle carries ≤ 3·|groups| partial rows per batch and
    the reduce is a plain keyed sum — no re-scan per grouping set. Exact
    integers throughout."""
    from arches_rascoll_etl_ray.functions.hashing import stable_hash64

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "source"]
    )

    def partials(t: pa.Table) -> pa.Table:
        base = (
            pa.table({"lang": t["lang"], "source": t["source"]})
            .group_by(["lang", "source"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "source", "n"])
        )
        star = pa.array(np.full(base.num_rows, "*", dtype=object), pa.string())
        sub = (
            pa.table({"lang": base["lang"], "source": star, "n": base["n"]})
            .group_by(["lang", "source"])
            .aggregate([("n", "sum")])
            .rename_columns(["lang", "source", "n"])
        )
        tot = pa.table(
            {
                "lang": pa.array(["*"], pa.string()),
                "source": pa.array(["*"], pa.string()),
                "n": pa.array([int(pc.sum(base["n"]).as_py() or 0)], pa.int64()),
            }
        )
        out = pa.concat_tables(
            [base.set_column(2, "n", pc.cast(base["n"], pa.int64())), sub, tot]
        )
        from arches_rascoll_etl_ray.functions.hashing import combine_key

        key = combine_key(out, "lang", "source")
        shard = (stable_hash64(key) % np.uint64(16)).astype(np.int32)
        return out.append_column("shard", pa.array(shard))

    def reduce_shard(df: pd.DataFrame) -> pa.Table:
        # Arrow reduce: pandas multi-key groupby hashes object strings as C
        # strings (the NUL-truncation lesson) — keep the fold byte-exact
        t = pa.Table.from_pandas(df[["lang", "source", "n"]], preserve_index=False)
        g = (
            t.group_by(["lang", "source"])
            .aggregate([("n", "sum")])
            .rename_columns(["lang", "source", "n_docs"])
        )
        return g.set_column(2, "n_docs", pc.cast(g["n_docs"], pa.int64()))

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(reduce_shard, batch_format="pandas")
    )


@register(
    "q_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_markov_transitions(sf_dir: str):
    """Per-user event-type TRANSITION counts — the Markov-chain /
    user-journey analysis primitive (what follows what): hash-shard by
    user, one vectorized sort per shard, boundary-masked shift pairs each
    event with its user's previous one (the q_lag_diff recast of LAG),
    then the tiny |types|² transition matrix folds from per-shard Arrow
    partials. A user's whole history lives in one shard, so transitions
    never straddle tasks; the shuffle carries (user, ts, type) triples —
    never props/payload columns."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(dtype=np.int64),
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "ts": df["ts"].to_numpy(),
                "event_type": df["event_type"].to_numpy(dtype=object),
            }
        )
        out["_cs"] = (out["user_id"].to_numpy(dtype=np.int64) % 64).astype(np.int32)
        return out

    def transitions_shard(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        users = g["user_id"].to_numpy()
        types = g["event_type"].to_numpy(dtype=object)
        if len(g) < 2:
            return pa.table(
                {"prev_type": pa.array([], pa.string()),
                 "next_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        same = users[1:] == users[:-1]
        prev = types[:-1][same]
        nxt = types[1:][same]
        # match the twin's WHERE prev_type IS NOT NULL: a NULL mid-sequence
        # type must not emit a (NULL, x) row (pairs with NULL NEXT stay,
        # like LAG's output does)
        nonnull_prev = pd.notna(prev)
        prev, nxt = prev[nonnull_prev], nxt[nonnull_prev]
        part = (
            pa.table(
                {"prev_type": pa.array(prev, pa.string()),
                 "next_type": pa.array(nxt, pa.string())}
            )
            .group_by(["prev_type", "next_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["prev_type", "next_type", "n"])
        )
        return part.set_column(2, "n", pc.cast(part["n"], pa.int64()))

    def fold(df: pd.DataFrame) -> pa.Table:
        t = pa.Table.from_pandas(
            df[["prev_type", "next_type", "n"]], preserve_index=False
        )
        g = (
            t.group_by(["prev_type", "next_type"])
            .aggregate([("n", "sum")])
            .rename_columns(["prev_type", "next_type", "n"])
        )
        return g.set_column(2, "n", pc.cast(g["n"], pa.int64()))

    from arches_rascoll_etl_ray.functions.hashing import combine_key, stable_hash64

    def shard2(t: pa.Table) -> pa.Table:
        # next_type may be null (kept, matching LAG); shard on a filled
        # copy — sharding needs determinism only, grouping keeps the null
        filled = pa.table(
            {
                "prev_type": t["prev_type"],
                "next_type": pc.fill_null(t["next_type"], ""),
            }
        )
        key = combine_key(filled, "prev_type", "next_type")
        sh = (stable_hash64(key) % np.uint64(16)).astype(np.int32)
        return t.append_column("shard", pa.array(sh))

    return (
        ds.map_batches(add_shard, batch_format="pandas")
        .groupby("_cs")
        .map_groups(transitions_shard, batch_format="pandas")
        .map_batches(shard2, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(fold, batch_format="pandas")
    )

"""Relational pipelines over the TPC-H-ish test tables, Ray-Data-first.

These exercise the engine's wide operators (groupby/aggregate with partial
pre-aggregation, broadcast joins, sort/top-k, windowed event aggregation)
and are oracle-gated: each has a matching DuckDB SQL in __ray_entry__.

Numeric policy for oracle hash-equality (floats are order-of-addition
sensitive in distributed sums): money aggregates are summed as integer
cents via per-row ``round(x*100)`` (exact int64 sums are associative);
averages are expressed as sum/count of deterministic operands. Raw row
values (no aggregation) pass through untouched.

Scale notes embedded per pipeline; broadcast sides are materialized once on
the driver (they are dimension tables) and shipped via ``ray.put`` —
read per actor in ``__init__``, never per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _table_nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet FOOTERS only (no data read) — the free size
    signal for the coalesce gates below. Handles both a single file and a
    sharded directory at ``<sf_dir>/<table>.parquet``."""
    import pyarrow.dataset as pads

    return pads.dataset(f"{sf_dir}/{table}.parquet",
                        format="parquet").count_rows()


from ..config import COALESCE_ROW_LIMIT as _COALESCE_ROW_LIMIT  # shared gate


def choose_partitions(nrows: int | None, *, default: int = 64,
                      rows_per_part: int = 65_536, lo: int = 2,
                      hi: int = 512) -> int:
    """Data-derived exchange width, shared by every coarse-partition /
    hash-bucket stage (group-sum, hash_join, connected_components).

    Fixed widths are wrong at both ends: 64 partitions over 100 TB
    concentrates reducers; 64 over 5k rows scatters the sort into mostly
    EMPTY range partitions (each one a schemaless block Ray warns about
    and a wasted reduce task). When the caller knows the input row count
    (parquet footers via ``_table_nrows``, or a materialized edge set's
    ``count()``), size the exchange to it and the cluster: enough
    partitions that one partition stays comfortably in a worker heap,
    floored at the cluster's CPU count (when Ray is up) so a big reduce
    still spreads. ``None`` ⇒ unknown ⇒ the caller's default."""
    if nrows is None:
        return default
    import math

    parts = math.ceil(max(nrows, 1) / rows_per_part)
    if parts > 1:  # real exchange: don't under-parallelize the cluster
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 0))
                parts = max(parts, min(cpus, math.ceil(nrows / 4096)))
        except Exception:
            pass
    return max(lo, min(hi, parts))


def coarse_partition_apply(ds, kernel, *, key_col: str, part_col: str,
                           num_parts: int, nrows: int | None = None,
                           small_limit: int = _COALESCE_ROW_LIMIT):
    """Coarse key-hash partition + ONE vectorized kernel per partition —
    the repo's standard per-key-stage shape (a per-key map_groups costs
    ~ms of Python per key; see BENCH/TUNING.md).

    Every kernel passed here must be PARTITION-SHAPE-INDEPENDENT: it
    sorts and groups by the real key internally, so its output is the
    same whether it sees one partition or the whole set. That makes the
    size gate sound: below ``small_limit`` input rows the set coalesces
    into one block (``repartition`` is a split/merge, not a key exchange)
    and the kernel runs once — no sort shuffle (~2 s of fixed
    planner/barrier cost each at any row count). ``nrows`` comes free
    from parquet footer metadata (``_table_nrows``); None ⇒ unknown ⇒
    always the shuffle path. Above the gate the exchange is unchanged."""
    # strict 0 < nrows: an empty table coalesces to an empty batch some
    # kernels can't type; the shuffle path simply emits no groups
    if nrows is not None and 0 < nrows <= small_limit:
        return ds.repartition(1).map_batches(kernel, batch_format="pandas",
                                             batch_size=None)
    # above the gate a known row count sizes the exchange to the data and
    # cluster instead of the caller's fixed default
    num_parts = choose_partitions(nrows, default=num_parts)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            part_col, _bucket_array(batch.column(key_col), num_parts))

    stamped = ds.map_batches(add_part, batch_format="pyarrow")
    # the _keyed_groups collapse rule (see stages/dedup.py): sort ranges
    # equal input blocks, so many tiny stamped blocks over few bucket
    # values leave most ranges as schemaless empties (the RefBundle
    # schema-drift warning). Collapse ONLY when nrows is KNOWN (num_parts
    # then came from choose_partitions, so block sizes are bounded); an
    # unknown input may be huge, and pre-merging it to a handful of
    # blocks would build oversized blocks — those callers keep the
    # many-block sort and its cosmetic warnings until they pass a count.
    if nrows is not None:
        blocks = num_parts if num_parts > 64 else max(2, -(-num_parts // 8))
        stamped = stamped.repartition(blocks)
    return stamped.groupby(part_col).map_groups(kernel,
                                                batch_format="pandas")


def collapse_partials(partials, n_keys: int):
    """Collapse slim per-block partials before a LOW-CARDINALITY sort
    groupby — the one shared mechanism for the schemaless-empty-block
    warning: with k distinct keys and hundreds of input blocks most sort
    ranges come out empty, and Ray builds a schemaless empty block when a
    map task's inputs are all empty (map_transformer never calls the UDF)
    → the 'RefBundle with a different schema' drift warning. Sizing rule:
    ~one block per 8 keys, floor 2 (parallel reduce), cap 8 (the partials
    are a few rows each — width buys nothing past the key count)."""
    return partials.repartition(max(2, min(8, -(-n_keys // 8))))


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row deterministic money→int64 cents."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0)),
                        round_mode="half_towards_infinity"), pa.int64())


def _ss_match(sorted_keys: np.ndarray, vals: np.ndarray):
    """Clamped-searchsorted membership against a broadcast sorted key
    array: returns (index-into-sorted, exact-hit mask)."""
    idx = np.minimum(np.searchsorted(sorted_keys, vals),
                     len(sorted_keys) - 1)
    return idx, sorted_keys[idx] == vals


def _hour_bucket_us(ts_col) -> pa.Array:
    """Timestamp column → int64 hour bucket, resolution-independent:
    normalize to µs BEFORE the int cast (a timestamp[ns] input would
    otherwise yield ns and shift every bucket by 1000×);
    allow_time_truncate: sub-µs remainders truncate like the pandas-path
    ts_int_us helper instead of raising ArrowInvalid."""
    epoch = pc.cast(
        pc.cast(ts_col, options=pc.CastOptions(target_type=pa.timestamp("us"),
                                               allow_time_truncate=True)),
        pa.int64())
    return pc.cast(pc.divide(epoch, pa.scalar(3_600_000_000)), pa.int64())


# ---------------------------------------------------------------------------
# Q1-style pricing summary: groupby with partial pre-aggregation
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str):
    """Per (l_returnflag, l_linestatus): sum_qty, sum_base_price_cents,
    sum_disc_price_cents, count_order, avg_qty.

    Pattern: per-batch partial aggregation inside map_batches (one row per
    key per batch) → small groupby over partials → final arithmetic.
    The all-to-all shuffle moves O(keys × blocks) rows, not the lineitem.
    """
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        base_cents = _cents(batch.column("l_extendedprice"))
        disc_price = pc.multiply(batch.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        disc_cents = _cents(disc_price)
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": batch.column("l_quantity"),
            "base_cents": base_cents,
            "disc_cents": disc_cents,
        })
        # Arrow-native combiner: no pandas round-trip copy per batch.
        # count mode="all" preserves row-count semantics (plain "count"
        # skips nulls — a silent change for null-bearing value columns)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("disc_cents", "sum"),
             ("qty", "count", pc.CountOptions(mode="all"))])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("qty_sum"),
            "sum_base_price_cents": g.column("base_cents_sum"),
            "sum_disc_price_cents": g.column("disc_cents_sum"),
            "count_order": pc.cast(g.column("qty_count"), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    # 4 distinct (returnflag, linestatus) keys — see collapse_partials
    partials = collapse_partials(partials, 4)
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
        Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        avg_qty = pc.divide(
            pc.cast(batch.column("sum_qty"), pa.float64()),
            pc.cast(batch.column("count_order"), pa.float64()),
        )
        return batch.append_column("avg_qty", avg_qty)

    return final.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Broadcast joins (dimension tables never shuffle)
# ---------------------------------------------------------------------------

class _BroadcastMerge:
    """Actor-pool stage: pandas merge against a driver-broadcast lookup."""

    def __init__(self, lookup_ref, on: str):
        self.lookup = ray.get(lookup_ref)  # once per actor
        self.on = on

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.lookup, on=self.on, how="inner")


def region_customer_count(sf_dir: str):
    """Customers per region name: region⋈nation broadcast into customer scan.

    The two dimension tables are joined on the driver (tiny), broadcast
    once; the fact scan does a per-batch hash lookup. Count via partial
    per-batch counts → small groupby.
    """
    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    lookup = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup = lookup[["n_nationkey", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"})
    lookup_ref = ray.put(lookup)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = cust.map_batches(
        _BroadcastMerge, fn_constructor_kwargs={"lookup_ref": lookup_ref, "on": "c_nationkey"},
        batch_format="pandas", concurrency=2,
    )

    def partial_count(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("r_name", as_index=False).agg(n_customers=("c_custkey", "size"))

    partials = joined.map_batches(partial_count, batch_format="pandas")
    partials = collapse_partials(partials, 5)  # 5 regions
    return partials.groupby("r_name").aggregate(Sum("n_customers", alias_name="n_customers"))


def supplier_nation_acctbal(sf_dir: str):
    """Per nation name: supplier count + total acctbal cents (broadcast join)."""
    nation = _read(sf_dir, "nation").to_pandas()
    lookup = nation[["n_nationkey", "n_name"]].rename(columns={"n_nationkey": "s_nationkey"})
    lookup_ref = ray.put(lookup)

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def prep(batch: pa.Table) -> pa.Table:
        return batch.append_column("acctbal_cents", _cents(batch.column("s_acctbal")))

    joined = supp.map_batches(prep, batch_format="pyarrow").map_batches(
        _BroadcastMerge, fn_constructor_kwargs={"lookup_ref": lookup_ref, "on": "s_nationkey"},
        batch_format="pandas", concurrency=2,
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("n_name", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"),
            total_acctbal_cents=("acctbal_cents", "sum"),
        )

    partials = joined.map_batches(partial, batch_format="pandas")
    partials = collapse_partials(partials, 25)  # 25 nations
    return partials.groupby("n_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers"),
        Sum("total_acctbal_cents", alias_name="total_acctbal_cents"),
    )


# ---------------------------------------------------------------------------
# Revenue per order: big groupby with partial combine + top-k
# ---------------------------------------------------------------------------

def top_revenue_orders(sf_dir: str, k: int = 10):
    """Top-k orders by lineitem revenue (cents), tie-broken by l_orderkey.

    Partial per-batch sums → groupby sum → sort desc → limit k. The sort
    input is one row per order key — already reduced.
    """
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "revenue_cents": _cents(rev)})
        g = t.group_by("l_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    # order keys are high-cardinality (~1.5M/SF): coarse-partitioned
    # vectorized group-sum + bounded two-level top-k (see helpers above;
    # a per-key aggregate fold + full sort cost ~11 s at sf0.1)
    per_order = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    summed = partitioned_group_sum(per_order, key="l_orderkey",
                                   sum_cols={"revenue_cents": "revenue_cents"})
    return topk(summed, by=["revenue_cents", "l_orderkey"],
                descending=[True, False], k=k)


# ---------------------------------------------------------------------------
# Raw filter + sort (no aggregation → raw float pass-through is exact)
# ---------------------------------------------------------------------------

def orders_filter_topk(sf_dir: str, status: str = "O", k: int = 20):
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), status)),
        batch_format="pyarrow",
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregation over the stream-shaped table
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + value milli-sum.

    Window key = floor(epoch_seconds/3600) computed per row (int64, exact);
    partial per-batch aggregation → small groupby. Matches the guide's
    batch-log treatment of stream-shaped inputs.
    """
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        value_milli = pc.cast(pc.round(pc.multiply(batch.column("value"),
                                                   pa.scalar(1000.0)),
                                       round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"hour_bucket": _hour_bucket_us(batch.column("ts")),
                      "event_type": batch.column("event_type"),
                      "value_milli": value_milli})
        # count mode="all": row-count semantics even with null values
        g = t.group_by(["hour_bucket", "event_type"]).aggregate(
            [("value_milli", "count", pc.CountOptions(mode="all")),
             ("value_milli", "sum")])
        return pa.table({
            "hour_bucket": g.column("hour_bucket"),
            "event_type": g.column("event_type"),
            "n_events": pc.cast(g.column("value_milli_count"), pa.int64()),
            "sum_value_milli": g.column("value_milli_sum"),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["hour_bucket", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_milli", alias_name="sum_value_milli"),
    )


def events_top_users(sf_dir: str, k: int = 10):
    """Top-k users by total event value (milli-units), tie-break user_id."""
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        value_milli = pc.cast(pc.round(pc.multiply(batch.column("value"),
                                                   pa.scalar(1000.0)),
                                       round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "value_milli": value_milli})
        g = t.group_by("user_id").aggregate([("value_milli", "sum")])
        return pa.table({"user_id": g.column("user_id"),
                         "total_value_milli": g.column("value_milli_sum")})

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    summed = partials.groupby("user_id").aggregate(
        Sum("total_value_milli", alias_name="total_value_milli"))
    return summed.sort(["total_value_milli", "user_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Sessionization: per-user ordered gap analysis (map_groups over sorted log)
# ---------------------------------------------------------------------------

def ts_int_us(s: pd.Series) -> np.ndarray:
    """Timestamp series → int64 epoch MICROSECONDS regardless of the input
    resolution (datetime64[ns]/[us]/[s] or already-integer-µs). A bare
    .astype('int64') yields nanoseconds for datetime64[ns] inputs, silently
    scaling every gap threshold by 1000×."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.astype("datetime64[us]").astype("int64").to_numpy()
    return s.astype("int64").to_numpy()


def events_sessions(sf_dir: str, gap_minutes: int = 30, num_parts: int = 64):
    """Session count per user: a new session starts when the gap between a
    user's consecutive events exceeds ``gap_minutes``.

    Coarse crc32(user) partition + ONE vectorized kernel per partition
    (sort by (user, ts); session starts = user changes ∪ gap exceeded;
    per-user counts via a C-speed groupby) — a per-user map_groups costs
    ~ms of Python per key and dies at 10^9 users.
    """
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = ts_int_us(g["ts"])
        uid = g["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        new_sess = new_user | (gap > gap_us)
        df = pd.DataFrame({"user_id": uid, "new_sess": new_sess})
        out = df.groupby("user_id", as_index=False).agg(
            n_events=("new_sess", "size"), n_sessions=("new_sess", "sum"))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    return coarse_partition_apply(ds, sessions_part, key_col="user_id",
                                  part_col="sess_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def shipping_priority(sf_dir: str, *, segment: str = "BUILDING",
                      cutoff: str = "1996-06-30", k: int = 10,
                      broadcast_limit: int = 2_000_000):
    """TPC-H Q3 (shipping priority): top-k not-yet-shipped orders by
    revenue for one market segment — customer ⋈ orders ⋈ lineitem with
    date filters on both fact sides, grouped by (orderkey, orderdate,
    orderpriority), ordered by revenue desc / orderdate asc. Revenue is
    the house integer-cents rule (per-row round → int64 sum, order-free).

    Two paths on the dimension-side row counts (parquet-footer
    ``_table_nrows`` — no scan), the ``customer_order_revenue`` shape:

    * both sides under the gate: segment custkeys and the date-filtered
      slim order triples broadcast once via ray.put; the lineitem scan is
      the only full pass (filter → searchsorted probe → per-orderkey
      partial sums), combined in a sortless repartition tree, order
      attributes re-attached from the broadcast arrays, bounded top-k.
      ZERO sort shuffles.
    * above the gate (the 10^12-row path): semi-join orders against the
      segment keys, bucket hash-join the per-orderkey lineitem partials,
      coarse-partition group-sum, bounded two-level top-k — slim
      exchanges only, nothing customer- or order-sized on the driver.
    """
    cutoff_ts = pd.Timestamp(cutoff)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def li_rev_cents(batch: pa.Table) -> pa.Array:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0),
                                      batch.column("l_discount")))
        return _cents(rev)

    n_cust = _table_nrows(sf_dir, "customer")
    n_orders = _table_nrows(sf_dir, "orders")
    out_cols = ["l_orderkey", "revenue_cents", "o_orderdate",
                "o_orderpriority"]

    if n_cust <= broadcast_limit and n_orders <= broadcast_limit:
        def seg_keys(df: pd.DataFrame) -> pd.DataFrame:
            return df.loc[df["c_mktsegment"] == segment, ["c_custkey"]]

        ckeys = np.sort(cust.map_batches(seg_keys, batch_format="pandas")
                        .to_pandas().get("c_custkey",
                                         pd.Series(dtype="int64"))
                        .to_numpy(np.int64))
        cref = ray.put(ckeys)

        def order_slim(df: pd.DataFrame) -> pd.DataFrame:
            ck = ray.get(cref)
            df = df.loc[df["o_orderdate"] < cutoff_ts]
            if len(ck) and len(df):
                key = df["o_custkey"].to_numpy(np.int64)
                idx, hit = _ss_match(ck, key)
                df = df.loc[hit]
            else:
                df = df.iloc[0:0]
            return df[["o_orderkey", "o_orderdate", "o_orderpriority"]]

        odf = (orders.map_batches(order_slim, batch_format="pandas")
               .to_pandas())
        if "o_orderkey" not in odf.columns:  # fully-empty loses schema
            odf = pd.DataFrame({
                "o_orderkey": pd.Series(dtype="int64"),
                "o_orderdate": pd.Series(dtype="datetime64[us]"),
                "o_orderpriority": pd.Series(dtype="object")})
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_orderdate"].to_numpy(),
                        odf["o_orderpriority"].to_numpy()))

        def partial(batch: pa.Table) -> pa.Table:
            ok, _, _ = ray.get(oref)
            ship = batch.column("l_shipdate")
            batch = batch.filter(pc.greater(
                ship, pa.scalar(cutoff_ts.to_pydatetime())))
            if len(ok) == 0 or batch.num_rows == 0:
                return pa.table({
                    "l_orderkey": pa.array([], type=pa.int64()),
                    "revenue_cents": pa.array([], type=pa.int64())})
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            _, hit = _ss_match(ok, lkey)
            cents = li_rev_cents(batch).to_numpy(zero_copy_only=False)
            g = pd.DataFrame({"l_orderkey": lkey[hit],
                              "revenue_cents": cents[hit]}).groupby(
                "l_orderkey", as_index=False)["revenue_cents"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        def combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by("l_orderkey").aggregate(
                [("revenue_cents", "sum")])
            return pa.table({"l_orderkey": g.column("l_orderkey"),
                             "revenue_cents": g.column("revenue_cents_sum")})

        partials = li.map_batches(partial, batch_format="pyarrow",
                                  batch_size=131072)
        final = (partials.repartition(8)
                 .map_batches(combine, batch_format="pyarrow",
                              batch_size=None)
                 .repartition(1)
                 .map_batches(combine, batch_format="pyarrow",
                              batch_size=None))

        def attach_head(df: pd.DataFrame) -> pd.DataFrame:
            ok, od, op = ray.get(oref)
            if len(df) == 0:
                return pd.DataFrame({
                    "l_orderkey": pd.Series(dtype="int64"),
                    "revenue_cents": pd.Series(dtype="int64"),
                    "o_orderdate": pd.Series(dtype="datetime64[us]"),
                    "o_orderpriority": pd.Series(dtype="object")})
            idx, hit = _ss_match(ok, df["l_orderkey"].to_numpy(np.int64))
            out = pd.DataFrame({
                "l_orderkey": df["l_orderkey"].astype("int64"),
                "revenue_cents": df["revenue_cents"].astype("int64"),
                "o_orderdate": pd.Series(od[idx]),
                "o_orderpriority": pd.Series(op[idx])})
            return out.sort_values(
                ["revenue_cents", "o_orderdate", "l_orderkey"],
                ascending=[False, True, True]).head(k)

        return final.map_batches(attach_head, batch_format="pandas",
                                 batch_size=None)

    # ABOVE THE GATE — slim-exchange composition
    def seg_slim(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["c_mktsegment"] == segment, ["c_custkey"]]

    def ord_slim(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["o_orderdate"] < cutoff_ts,
                      ["o_orderkey", "o_custkey", "o_orderdate",
                       "o_orderpriority"]]

    orders_f = semi_anti_join(
        orders.map_batches(ord_slim, batch_format="pandas"),
        cust.map_batches(seg_slim, batch_format="pandas"),
        left_key="o_custkey", right_key="c_custkey",
        num_buckets=choose_partitions(n_orders, default=32),
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_orderdate": pa.timestamp("us"),
                    "o_orderpriority": pa.string()})

    def li_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(
            batch.column("l_shipdate"),
            pa.scalar(cutoff_ts.to_pydatetime())))
        # keyed o_orderkey: the join key must share its NAME across both
        # hash_join sides (a differently-named key column would be
        # dropped by the align step and joined as typed nulls)
        t = pa.table({"o_orderkey": batch.column("l_orderkey"),
                      "revenue_cents": li_rev_cents(batch)})
        g = t.group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    joined = hash_join(
        orders_f.map_batches(
            lambda df: df[["o_orderkey", "o_orderdate", "o_orderpriority"]],
            batch_format="pandas"),
        li.map_batches(li_partial, batch_format="pyarrow",
                       batch_size=65536),
        key="o_orderkey", num_buckets=choose_partitions(n_orders,
                                                        default=32),
        left_types={"o_orderkey": pa.int64(),
                    "o_orderdate": pa.timestamp("us"),
                    "o_orderpriority": pa.string()},
        right_types={"o_orderkey": pa.int64(), "revenue_cents": pa.int64()})

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["o_orderkey", "o_orderdate", "o_orderpriority"],
                        as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))
        out = out.rename(columns={"o_orderkey": "l_orderkey"})
        return out.astype({"l_orderkey": "int64",
                           "revenue_cents": "int64"})[out_cols]

    grouped = coarse_partition_apply(joined, regroup, key_col="o_orderkey",
                                     part_col="q3_part", num_parts=64,
                                     nrows=None)
    return topk(grouped, by=["revenue_cents", "o_orderdate", "l_orderkey"],
                descending=[True, False, False], k=k)


def local_supplier_volume(sf_dir: str, *, region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1997-01-01",
                          broadcast_limit: int = 2_000_000):
    """TPC-H Q5 (local supplier volume): revenue per nation from line
    items where the CUSTOMER and the SUPPLIER sit in the same nation of
    one region, for one order-date year — the 6-table join chain
    region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier with the
    correlated c_nationkey = s_nationkey predicate. Revenue is the house
    integer-cents rule (per-row round → int64 sum, order-free). Output:
    (n_name, revenue_cents) sorted revenue desc.

    nation/region are constant-size (25/5 rows) and always fold into a
    driver-side lookup. Two paths on the remaining dimension sides
    (parquet-footer ``_table_nrows`` — no scan):

    * customer, orders and supplier all under the gate: three slim
      sorted key→nationkey arrays broadcast once via ``ray.put`` (the
      orders triple is pre-filtered by date AND semi-joined to in-region
      customers while being built), then the lineitem scan is the ONLY
      full pass — two searchsorted probes per batch, same-nation mask,
      per-nation partial sums (≤25 groups) combined in one tiny
      repartition. ZERO all-to-all exchanges.
    * any side above the gate (the 10^12-row path): slim hash joins
      only — orders(date-filtered, slim) ⋈ customer(in-region, slim) on
      custkey, the result ⋈ per-(orderkey,suppkey) lineitem revenue
      partials on orderkey, the result ⋈ supplier(slim) on suppkey;
      the same-nation filter and the ≤25-group final sum never move
      more than (key, nationkey, cents) triples. Skewed orderkeys are
      the usual hash_join caveat (raise num_buckets / salt). All three
      joins pass ``coalesce_blocks`` (slim sides) so the sort shuffles
      don't emit surplus empty ranges; at toy SF one sampled range
      boundary can still land empty (cosmetic Ray warning, disappears
      once rows fill the ranges).
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()

    # constant-size dimensions → driver lookup (5 + 25 rows)
    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nat_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    out_schema = pa.schema([("n_name", pa.string()),
                            ("revenue_cents", pa.int64())])
    if not nat_names:  # unknown region: typed empty, not a schemaless run
        return ray.data.from_arrow(out_schema.empty_table())

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])

    def li_cents(batch: pa.Table) -> pa.Array:
        return _cents(pc.multiply(batch.column("l_extendedprice"),
                                  pc.subtract(pa.scalar(1.0),
                                              batch.column("l_discount"))))

    def in_region_slim(key_col: str, nat_col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.loc[df[nat_col].isin(nat_names), [key_col, nat_col]]
            return df.astype({key_col: "int64", nat_col: "int64"})
        return fn

    def combine_names(batch: pa.Table) -> pa.Table:
        """(nationkey, cents) partials → named, summed, revenue-desc."""
        if batch.num_rows == 0:
            return out_schema.empty_table()
        g = batch.group_by("natkey").aggregate([("revenue_cents", "sum")])
        df = pd.DataFrame({
            "n_name": [nat_names[k] for k in g.column("natkey").to_pylist()],
            "revenue_cents": g.column("revenue_cents_sum").to_pylist()})
        df = df.sort_values(["revenue_cents", "n_name"],
                            ascending=[False, True], ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=out_schema)

    n_cust = _table_nrows(sf_dir, "customer")
    n_orders = _table_nrows(sf_dir, "orders")
    n_supp = _table_nrows(sf_dir, "supplier")

    if max(n_cust, n_orders, n_supp) <= broadcast_limit:
        def sorted_pair(ds, keyc, natc):
            df = (ds.map_batches(in_region_slim(keyc, natc),
                                 batch_format="pandas").to_pandas())
            if keyc not in df.columns:
                return (np.empty(0, np.int64), np.empty(0, np.int64))
            df = df.sort_values(keyc)
            return (df[keyc].to_numpy(np.int64),
                    df[natc].to_numpy(np.int64))

        cref = ray.put(sorted_pair(cust, "c_custkey", "c_nationkey"))
        sref = ray.put(sorted_pair(supp, "s_suppkey", "s_nationkey"))

        def order_slim(df: pd.DataFrame) -> pd.DataFrame:
            ck, cn = ray.get(cref)
            df = df.loc[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
            out = pd.DataFrame({
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "natkey": np.empty(len(df), np.int64)})
            if len(ck) and len(df):
                idx, hit = _ss_match(ck, df["o_custkey"].to_numpy(np.int64))
                out["natkey"] = cn[idx]
                return out.loc[hit]
            return out.iloc[0:0]

        odf = (orders.map_batches(order_slim, batch_format="pandas")
               .to_pandas())
        if "o_orderkey" not in odf.columns:
            odf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "natkey": pd.Series(dtype="int64")})
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["natkey"].to_numpy(np.int64)))

        def partial(batch: pa.Table) -> pa.Table:
            ok, on = ray.get(oref)
            sk, sn = ray.get(sref)
            empty = pa.table({"natkey": pa.array([], type=pa.int64()),
                              "revenue_cents": pa.array([], type=pa.int64())})
            if batch.num_rows == 0 or len(ok) == 0 or len(sk) == 0:
                return empty
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            skey = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            oi, ohit = _ss_match(ok, lkey)
            si, shit = _ss_match(sk, skey)
            keep = ohit & shit & (on[oi] == sn[si])
            if not keep.any():
                return empty
            cents = li_cents(batch).to_numpy(zero_copy_only=False)
            g = pd.DataFrame({"natkey": on[oi][keep],
                              "revenue_cents": cents[keep]}).groupby(
                "natkey", as_index=False)["revenue_cents"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        return (li.map_batches(partial, batch_format="pyarrow",
                               batch_size=131072)
                .repartition(1)
                .map_batches(combine_names, batch_format="pyarrow",
                             batch_size=None))

    # ABOVE THE GATE — slim hash-join composition, nothing broadcast
    # except the 25-row nation lookup inside closures
    nb = choose_partitions(max(n_orders, n_cust), default=32)

    def ord_slim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi),
                    ["o_orderkey", "o_custkey"]]
        return df.rename(columns={"o_custkey": "c_custkey"}).astype(
            {"o_orderkey": "int64", "c_custkey": "int64"})

    o_c = hash_join(
        orders.map_batches(ord_slim, batch_format="pandas"),
        cust.map_batches(in_region_slim("c_custkey", "c_nationkey"),
                         batch_format="pandas"),
        key="c_custkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "c_custkey": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()})

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": batch.column("l_orderkey"),
                      "s_suppkey": batch.column("l_suppkey"),
                      "revenue_cents": li_cents(batch)})
        g = t.group_by(["o_orderkey", "s_suppkey"]).aggregate(
            [("revenue_cents", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "s_suppkey": g.column("s_suppkey"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    ol = hash_join(
        o_c.map_batches(lambda df: df[["o_orderkey", "c_nationkey"]],
                        batch_format="pandas"),
        li.map_batches(li_partial, batch_format="pyarrow",
                       batch_size=65536),
        key="o_orderkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "c_nationkey": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(),
                     "revenue_cents": pa.int64()})

    ols = hash_join(
        ol.map_batches(
            lambda df: df[["s_suppkey", "c_nationkey", "revenue_cents"]],
            batch_format="pandas"),
        supp.map_batches(in_region_slim("s_suppkey", "s_nationkey"),
                         batch_format="pandas"),
        key="s_suppkey",
        num_buckets=choose_partitions(n_supp, default=16),
        coalesce_blocks=choose_partitions(n_supp, default=16),
        left_types={"s_suppkey": pa.int64(), "c_nationkey": pa.int64(),
                    "revenue_cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})

    def same_nation_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["c_nationkey"] == df["s_nationkey"]]
        g = df.groupby("c_nationkey", as_index=False)["revenue_cents"].sum()
        return g.rename(columns={"c_nationkey": "natkey"}).astype(
            {"natkey": "int64", "revenue_cents": "int64"})

    return (ols.map_batches(same_nation_partial, batch_format="pandas")
            .repartition(1)
            .map_batches(combine_names, batch_format="pyarrow",
                         batch_size=None))


_FK_RELATIONS = (
    # (left table, left key, right table, right key) — every right side is
    # that table's primary key, so LEFT-JOIN-null counting is exact
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
)


def fk_orphans(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """Referential-integrity audit — the data-quality primitive that runs
    before any join-heavy pipeline at scale: for each foreign-key
    relation, count left rows with no match on the right (null keys
    count as orphans, LEFT-JOIN-null semantics). Output one row per
    relation: (relation, n_left, n_orphans), sorted by relation name.

    Per relation, two tiers on the RIGHT side's footer row count:

    * right side under the gate: its key column collapses to ONE sorted
      broadcast array and the left table is scanned once, counting
      misses with a vectorized searchsorted probe — int partials, no
      exchange at all.
    * right side above the gate: ids-only anti semi-join
      (``semi_anti_join``) — the exchange carries left keys once plus
      deduplicated right keys, then a metadata count. Nothing
      payload-sized moves on either tier; n_left itself is free from
      parquet footers.
    """
    rows = []
    for lt, lk, rt, rk in _FK_RELATIONS:
        left = _read(sf_dir, lt, columns=[lk])
        n_left = _table_nrows(sf_dir, lt)
        n_right = _table_nrows(sf_dir, rt)
        right = _read(sf_dir, rt, columns=[rk])

        if n_right <= broadcast_limit:
            keys = np.sort(right.to_pandas()[rk].dropna()
                           .to_numpy(np.int64))
            kref = ray.put(keys)

            def miss_partial(batch: pa.Table, _kref=kref,
                             _lk=lk) -> pa.Table:
                col = batch.column(_lk)
                n = batch.num_rows
                nulls = col.null_count
                ks = ray.get(_kref)
                if n == nulls or len(ks) == 0:
                    miss = n
                else:
                    vals = pc.drop_null(col).to_numpy(zero_copy_only=False)
                    _, hit = _ss_match(ks, vals.astype(np.int64))
                    miss = nulls + int((~hit).sum())
                return pa.table({"n_orphans": pa.array([miss],
                                                       type=pa.int64())})

            n_orphans = int(left.map_batches(
                miss_partial, batch_format="pyarrow", batch_size=131072)
                .to_pandas()["n_orphans"].sum())
        else:
            def keyed(df: pd.DataFrame, _lk=lk) -> pd.DataFrame:
                return df[[_lk]]

            orphan_ds = semi_anti_join(
                left.map_batches(keyed, batch_format="pandas"),
                right, left_key=lk, right_key=rk, anti=True,
                num_buckets=choose_partitions(n_left, default=32),
                left_types={lk: pa.int64()})
            n_orphans = orphan_ds.count()

        rows.append({"relation": f"{lt}.{lk}->{rt}.{rk}",
                     "n_left": int(n_left), "n_orphans": int(n_orphans)})
    out = pd.DataFrame(sorted(rows, key=lambda r: r["relation"]))
    return out.astype({"n_left": "int64", "n_orphans": "int64"})


def promo_revenue(sf_dir: str, *, promo_type: str = "PROMO",
                  date_from: str = "1996-03-01",
                  date_to: str = "1996-04-01",
                  broadcast_limit: int = 2_000_000):
    """TPC-H Q14 (promotion effect): the share of one month's revenue
    coming from promo parts — lineitem ⋈ part with a conditional
    aggregate. This is the first query over the ``part`` table, closing
    the one unused table in the driver's view set. Output is ONE row:
    (promo_revenue_cents, total_revenue_cents, promo_permille) — the
    ratio is integer per-mille ``(1000·promo) // total`` (HUGEINT-wide
    in the oracle) so the whole row is hash-gateable; NULL when the
    month has no revenue.

    Two tiers on the part table's footer row count:

    * under the gate: p_partkey collapses to a sorted broadcast array +
      promo bitmap; ONE date-filtered lineitem pass emits a (2×int64)
      partial per batch — ZERO exchange, the degenerate-aggregate shape.
    * above the gate: per-partkey lineitem revenue partials hash-join
      the slim (p_partkey, is_promo) side, then the same two-int
      partials — only (key, cents, bit) triples move.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def li_cents(batch: pa.Table) -> pa.Array:
        return _cents(pc.multiply(batch.column("l_extendedprice"),
                                  pc.subtract(pa.scalar(1.0),
                                              batch.column("l_discount"))))

    def date_filter(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate")
        return batch.filter(pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)),
            pc.less(ship, pa.scalar(hi))))

    def finish(batch: pa.Table) -> pa.Table:
        p = sum(batch.column("promo_revenue_cents").to_pylist() or [0])
        t = sum(batch.column("total_revenue_cents").to_pylist() or [0])
        permille = (1000 * p) // t if t else None  # Python int: no overflow
        return pa.table({
            "promo_revenue_cents": pa.array([p], type=pa.int64()),
            "total_revenue_cents": pa.array([t], type=pa.int64()),
            "promo_permille": pa.array([permille], type=pa.int64()),
        })

    two_int = pa.schema([("promo_revenue_cents", pa.int64()),
                         ("total_revenue_cents", pa.int64())])

    def one_row(ds) -> pd.DataFrame:
        """Exactly ONE output row by contract. When every partial batch
        is empty (no revenue in the window) ray skips the finish UDF and
        the dataset comes back schemaless — rebuild the typed zero row."""
        df = ds.to_pandas()
        if len(df) == 0 or "promo_revenue_cents" not in df.columns:
            return finish(two_int.empty_table()).to_pandas()
        return df

    if _table_nrows(sf_dir, "part") <= broadcast_limit:
        pdf = part.to_pandas().sort_values("p_partkey")
        pref = ray.put((pdf["p_partkey"].to_numpy(np.int64),
                        (pdf["p_type"] == promo_type).to_numpy(bool)))

        def partial(batch: pa.Table) -> pa.Table:
            pk, promo = ray.get(pref)
            batch = date_filter(batch)
            if batch.num_rows == 0 or len(pk) == 0:
                return two_int.empty_table()
            key = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            pi, hit = _ss_match(pk, key)
            cents = li_cents(batch).to_numpy(zero_copy_only=False)
            tot = int(cents[hit].sum())
            pro = int(cents[hit & promo[pi]].sum())
            return pa.table({
                "promo_revenue_cents": pa.array([pro], type=pa.int64()),
                "total_revenue_cents": pa.array([tot], type=pa.int64())})

        return one_row(
            li.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072)
            .repartition(1)
            .map_batches(finish, batch_format="pyarrow",
                         batch_size=None))

    # ABOVE THE GATE — slim join, then the same degenerate aggregate
    def li_partial(batch: pa.Table) -> pa.Table:
        batch = date_filter(batch)
        t = pa.table({"p_partkey": batch.column("l_partkey"),
                      "revenue_cents": li_cents(batch)})
        g = t.group_by("p_partkey").aggregate([("revenue_cents", "sum")])
        return pa.table({"p_partkey": g.column("p_partkey"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    def part_slim(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "p_partkey": df["p_partkey"].to_numpy(np.int64),
            "is_promo": (df["p_type"] == promo_type).astype("int64")})
        return out

    nb = choose_partitions(_table_nrows(sf_dir, "part"), default=16)
    joined = hash_join(
        li.map_batches(li_partial, batch_format="pyarrow",
                       batch_size=65536),
        part.map_batches(part_slim, batch_format="pandas"),
        key="p_partkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"p_partkey": pa.int64(), "revenue_cents": pa.int64()},
        right_types={"p_partkey": pa.int64(), "is_promo": pa.int64()})

    def two_sum(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "promo_revenue_cents": [int(
                (df["revenue_cents"] * df["is_promo"]).sum())],
            "total_revenue_cents": [int(df["revenue_cents"].sum())],
        }).astype("int64")

    return one_row(
        joined.map_batches(two_sum, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None))


def volume_shipping(sf_dir: str, *, nation_a: str = "NATION_2",
                    nation_b: str = "NATION_7",
                    date_from: str = "1996-01-01",
                    date_to: str = "1998-01-01",
                    broadcast_limit: int = 2_000_000):
    """TPC-H Q7 (volume shipping): revenue shipped BETWEEN two specific
    nations per (supplier nation, customer nation, ship year) — the
    anti-correlated sibling of Q5's same-nation predicate: keep a line
    item iff {supplier nation, customer nation} = {A, B} with A ≠ B.
    Output: (supp_nation, cust_nation, l_year, revenue_cents), sorted by
    the three keys. Revenue is the house integer-cents rule.

    Shares Q5's two-tier shape (see :func:`local_supplier_volume`):
    under the gate three broadcast sorted key→nationkey arrays and ONE
    date-filtered lineitem pass (two searchsorted probes + the pair
    mask + `pc.year`), partial sums over ≤ 2×n_years groups, one tiny
    combine — ZERO all-to-all; above the gate the same three slim hash
    joins with the pair filter and year extraction applied after the
    supplier join. Only (key, nationkey, cents, year) ever exchanges.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()

    nat = _read(sf_dir, "nation").to_pandas()
    sel = nat[nat["n_name"].isin([nation_a, nation_b])]
    nat_names = dict(zip(sel["n_nationkey"].astype(int), sel["n_name"]))

    out_schema = pa.schema([("supp_nation", pa.string()),
                            ("cust_nation", pa.string()),
                            ("l_year", pa.int64()),
                            ("revenue_cents", pa.int64())])

    def typed_df(ds) -> pd.DataFrame:
        """Output is ≤ 2·n_years rows by construction → a pandas return
        (the fk_orphans precedent). ray's to_pandas drops columns on a
        fully-empty dataset, so rebuild the typed empty frame."""
        df = ds.to_pandas() if ds is not None else None
        if df is None or (df.empty and not len(df.columns)):
            return out_schema.empty_table().to_pandas()
        return df

    if len(nat_names) < 2:
        return typed_df(None)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"])

    def li_cents(batch: pa.Table) -> pa.Array:
        return _cents(pc.multiply(batch.column("l_extendedprice"),
                                  pc.subtract(pa.scalar(1.0),
                                              batch.column("l_discount"))))

    def in_pair_slim(key_col: str, nat_col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.loc[df[nat_col].isin(nat_names), [key_col, nat_col]]
            return df.astype({key_col: "int64", nat_col: "int64"})
        return fn

    def combine_named(batch: pa.Table) -> pa.Table:
        """(snat, cnat, year, cents) partials → named, summed, sorted."""
        if batch.num_rows == 0:
            return out_schema.empty_table()
        g = batch.group_by(["snat", "cnat", "l_year"]).aggregate(
            [("revenue_cents", "sum")])
        df = pd.DataFrame({
            "supp_nation": [nat_names[k]
                            for k in g.column("snat").to_pylist()],
            "cust_nation": [nat_names[k]
                            for k in g.column("cnat").to_pylist()],
            "l_year": g.column("l_year").to_pylist(),
            "revenue_cents": g.column("revenue_cents_sum").to_pylist()})
        df = df.sort_values(["supp_nation", "cust_nation", "l_year"],
                            ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=out_schema)

    n_cust = _table_nrows(sf_dir, "customer")
    n_orders = _table_nrows(sf_dir, "orders")
    n_supp = _table_nrows(sf_dir, "supplier")

    if max(n_cust, n_orders, n_supp) <= broadcast_limit:
        def sorted_pair(ds, keyc, natc):
            df = (ds.map_batches(in_pair_slim(keyc, natc),
                                 batch_format="pandas").to_pandas())
            if keyc not in df.columns:
                return (np.empty(0, np.int64), np.empty(0, np.int64))
            df = df.sort_values(keyc)
            return (df[keyc].to_numpy(np.int64),
                    df[natc].to_numpy(np.int64))

        ck, cn = sorted_pair(cust, "c_custkey", "c_nationkey")
        sref = ray.put(sorted_pair(supp, "s_suppkey", "s_nationkey"))

        def order_slim(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "cnat": np.empty(len(df), np.int64)})
            if len(ck) and len(df):
                idx, hit = _ss_match(ck, df["o_custkey"].to_numpy(np.int64))
                out["cnat"] = cn[idx]
                return out.loc[hit]
            return out.iloc[0:0]

        odf = (orders.map_batches(order_slim, batch_format="pandas")
               .to_pandas())
        if "o_orderkey" not in odf.columns:
            odf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "cnat": pd.Series(dtype="int64")})
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["cnat"].to_numpy(np.int64)))

        def partial(batch: pa.Table) -> pa.Table:
            ok, ocn = ray.get(oref)
            sk, sn = ray.get(sref)
            ship = batch.column("l_shipdate")
            batch = batch.filter(pc.and_(
                pc.greater_equal(ship, pa.scalar(lo)),
                pc.less(ship, pa.scalar(hi))))
            empty = pa.table({
                "snat": pa.array([], type=pa.int64()),
                "cnat": pa.array([], type=pa.int64()),
                "l_year": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64())})
            if batch.num_rows == 0 or len(ok) == 0 or len(sk) == 0:
                return empty
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            skey = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            oi, ohit = _ss_match(ok, lkey)
            si, shit = _ss_match(sk, skey)
            snat, cnat = sn[si], ocn[oi]
            keep = ohit & shit & (snat != cnat)  # both ∈ {A,B} already
            if not keep.any():
                return empty
            years = pc.year(batch.column("l_shipdate")).to_numpy(
                zero_copy_only=False)
            cents = li_cents(batch).to_numpy(zero_copy_only=False)
            g = pd.DataFrame({
                "snat": snat[keep], "cnat": cnat[keep],
                "l_year": years[keep].astype(np.int64),
                "revenue_cents": cents[keep]}).groupby(
                ["snat", "cnat", "l_year"],
                as_index=False)["revenue_cents"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        return typed_df(
            li.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072)
            .repartition(1)
            .map_batches(combine_named, batch_format="pyarrow",
                         batch_size=None))

    # ABOVE THE GATE — Q5's slim hash-join composition + pair filter
    nb = choose_partitions(max(n_orders, n_cust), default=32)

    def ord_slim_a(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_custkey": "c_custkey"}).astype(
            {"o_orderkey": "int64", "c_custkey": "int64"})

    o_c = hash_join(
        orders.map_batches(ord_slim_a, batch_format="pandas"),
        cust.map_batches(in_pair_slim("c_custkey", "c_nationkey"),
                         batch_format="pandas"),
        key="c_custkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "c_custkey": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_nationkey": pa.int64()})

    def li_partial_a(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate")
        batch = batch.filter(pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)),
            pc.less(ship, pa.scalar(hi))))
        t = pa.table({"o_orderkey": batch.column("l_orderkey"),
                      "s_suppkey": batch.column("l_suppkey"),
                      "l_year": pc.cast(pc.year(batch.column("l_shipdate")),
                                        pa.int64()),
                      "revenue_cents": li_cents(batch)})
        g = t.group_by(["o_orderkey", "s_suppkey", "l_year"]).aggregate(
            [("revenue_cents", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "s_suppkey": g.column("s_suppkey"),
                         "l_year": g.column("l_year"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    ol = hash_join(
        o_c.map_batches(lambda df: df[["o_orderkey", "c_nationkey"]],
                        batch_format="pandas"),
        li.map_batches(li_partial_a, batch_format="pyarrow",
                       batch_size=65536),
        key="o_orderkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "c_nationkey": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(),
                     "l_year": pa.int64(), "revenue_cents": pa.int64()})

    sb = choose_partitions(n_supp, default=16)
    ols = hash_join(
        ol.map_batches(
            lambda df: df[["s_suppkey", "c_nationkey", "l_year",
                           "revenue_cents"]],
            batch_format="pandas"),
        supp.map_batches(in_pair_slim("s_suppkey", "s_nationkey"),
                         batch_format="pandas"),
        key="s_suppkey", num_buckets=sb, coalesce_blocks=sb,
        left_types={"s_suppkey": pa.int64(), "c_nationkey": pa.int64(),
                    "l_year": pa.int64(), "revenue_cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["c_nationkey"] != df["s_nationkey"]]
        g = df.groupby(["s_nationkey", "c_nationkey", "l_year"],
                       as_index=False)["revenue_cents"].sum()
        g = g.rename(columns={"s_nationkey": "snat",
                              "c_nationkey": "cnat"})
        return g.astype({"snat": "int64", "cnat": "int64",
                         "l_year": "int64", "revenue_cents": "int64"})

    return typed_df(
        ols.map_batches(pair_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(combine_named, batch_format="pyarrow",
                     batch_size=None))


def returned_item_report(sf_dir: str, *, date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01", k: int = 20,
                         broadcast_limit: int = 2_000_000):
    """TPC-H Q10 (returned-item reporting): top-k customers by revenue
    lost to returned line items (l_returnflag = 'R') in one order-date
    quarter — customer ⋈ orders ⋈ lineitem ⋈ nation, grouped by
    customer, reported with customer attributes and nation name.
    Revenue is the house integer-cents rule; ties break on c_custkey so
    the LIMIT is deterministic on both engines. Output: (c_custkey,
    c_name, revenue_cents, c_acctbal, n_name).

    The reporting-join shape: attributes attach AFTER the aggregate, to
    k rows, never to the fact stream. nation is a 25-row driver lookup.
    Two paths on footer row counts:

    * orders and customer under the gate: the date-filtered
      (orderkey → custkey) pairs broadcast once; ONE lineitem pass
      (returnflag filter → searchsorted probe → per-custkey partials),
      sortless tree combine, bounded top-k, then the k customer
      attribute rows come from a broadcast custkey→(name, acctbal,
      nationkey) lookup. ZERO sort shuffles.
    * above the gate: lineitem per-orderkey partials hash-join the slim
      date-filtered orders, coarse custkey group-sum, bounded two-level
      top-k — and the attribute attach is a k-row broadcast semi-probe
      of customer (k keys ship to every scan task; customer never
      shuffles). Slim exchanges only.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()

    nat = _read(sf_dir, "nation").to_pandas()
    nat_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    out_cols = ["c_custkey", "c_name", "revenue_cents", "c_acctbal",
                "n_name"]

    def li_filtered(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("l_returnflag"), "R"))

    def li_cents(batch: pa.Table) -> pa.Array:
        return _cents(pc.multiply(batch.column("l_extendedprice"),
                                  pc.subtract(pa.scalar(1.0),
                                              batch.column("l_discount"))))

    def attach(df: pd.DataFrame, cust_df: pd.DataFrame) -> pd.DataFrame:
        out = df.merge(cust_df, on="c_custkey", how="left")
        out["n_name"] = out["c_nationkey"].map(nat_names)
        out = out.sort_values(["revenue_cents", "c_custkey"],
                              ascending=[False, True]).head(k)
        return out[out_cols].astype({"c_custkey": "int64",
                                     "revenue_cents": "int64"})

    n_cust = _table_nrows(sf_dir, "customer")
    n_orders = _table_nrows(sf_dir, "orders")

    if max(n_cust, n_orders) <= broadcast_limit:
        def ord_slim(df: pd.DataFrame) -> pd.DataFrame:
            df = df.loc[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi),
                        ["o_orderkey", "o_custkey"]]
            return df.astype({"o_orderkey": "int64", "o_custkey": "int64"})

        odf = (orders.map_batches(ord_slim, batch_format="pandas")
               .to_pandas())
        if "o_orderkey" not in odf.columns:
            odf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "o_custkey": pd.Series(dtype="int64")})
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_custkey"].to_numpy(np.int64)))

        def partial(batch: pa.Table) -> pa.Table:
            ok, oc = ray.get(oref)
            batch = li_filtered(batch)
            empty = pa.table({
                "c_custkey": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64())})
            if batch.num_rows == 0 or len(ok) == 0:
                return empty
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            oi, hit = _ss_match(ok, lkey)
            if not hit.any():
                return empty
            cents = li_cents(batch).to_numpy(zero_copy_only=False)
            g = pd.DataFrame({"c_custkey": oc[oi][hit],
                              "revenue_cents": cents[hit]}).groupby(
                "c_custkey", as_index=False)["revenue_cents"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        def combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by("c_custkey").aggregate(
                [("revenue_cents", "sum")])
            return pa.table({"c_custkey": g.column("c_custkey"),
                             "revenue_cents": g.column("revenue_cents_sum")})

        totals = (li.map_batches(partial, batch_format="pyarrow",
                                 batch_size=131072)
                  .repartition(8)
                  .map_batches(combine, batch_format="pyarrow",
                               batch_size=None)
                  .repartition(1)
                  .map_batches(combine, batch_format="pyarrow",
                               batch_size=None))
        head = topk(totals, by=["revenue_cents", "c_custkey"],
                    descending=[True, False], k=k)

        def cust_slim(df: pd.DataFrame) -> pd.DataFrame:
            return df[["c_custkey", "c_name", "c_nationkey", "c_acctbal"]]

        cdf = (cust.map_batches(cust_slim, batch_format="pandas")
               .to_pandas())
        return head.map_batches(lambda df: attach(df, cdf),
                                batch_format="pandas", batch_size=None)

    # ABOVE THE GATE — slim joins + k-row attribute probe
    nb = choose_partitions(n_orders, default=32)

    def ord_slim_a(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi),
                    ["o_orderkey", "o_custkey"]]
        return df.astype({"o_orderkey": "int64", "o_custkey": "int64"})

    def li_partial_a(batch: pa.Table) -> pa.Table:
        batch = li_filtered(batch)
        t = pa.table({"o_orderkey": batch.column("l_orderkey"),
                      "revenue_cents": li_cents(batch)})
        g = t.group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    joined = hash_join(
        orders.map_batches(ord_slim_a, batch_format="pandas"),
        li.map_batches(li_partial_a, batch_format="pyarrow",
                       batch_size=65536),
        key="o_orderkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "revenue_cents": pa.int64()})

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"))
        return out.rename(columns={"o_custkey": "c_custkey"}).astype(
            {"c_custkey": "int64", "revenue_cents": "int64"})

    grouped = coarse_partition_apply(joined, regroup, key_col="o_custkey",
                                     part_col="q10_part", num_parts=64,
                                     nrows=None)
    head = topk(grouped, by=["revenue_cents", "c_custkey"],
                descending=[True, False], k=k)
    head_df = head.to_pandas()  # ≤ k rows by construction
    keys = ray.put(np.sort(head_df["c_custkey"].to_numpy(np.int64)))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(keys)
        df = df[["c_custkey", "c_name", "c_nationkey", "c_acctbal"]]
        if not len(want) or not len(df):
            return df.iloc[0:0]
        _, hit = _ss_match(want, df["c_custkey"].to_numpy(np.int64))
        return df.loc[hit]

    cdf = cust.map_batches(probe, batch_format="pandas").to_pandas()
    if "c_custkey" not in cdf.columns:  # fully-empty loses schema
        cdf = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object"),
                            "c_nationkey": pd.Series(dtype="int64"),
                            "c_acctbal": pd.Series(dtype="float64")})
    return ray.data.from_pandas(attach(head_df, cdf))


def funnel(sf_dir: str, stages: tuple = ("view", "click", "purchase"),
           num_parts: int = 64):
    """Ordered conversion funnel — the classic product-analytics query
    Ray Data has no primitive for: per user, stage k is reached iff an
    event of type ``stages[k]`` occurs STRICTLY AFTER the timestamp that
    reached stage k−1 (stage 0 anchor = the user's earliest
    ``stages[0]`` event; each later anchor = the earliest qualifying
    event). Returns one row per user who reached stage ≥ 1:
    (user_id, funnel_stage) with funnel_stage in 1..len(stages).

    Scale shape: the read prunes to (user_id, ts, event_type) and
    filters to funnel types only; ONE coarse user-hash exchange (a user
    never spans partitions), then a vectorized per-partition kernel —
    per-stage groupby-min + merge, no per-user Python. Ties at equal
    timestamps do NOT advance the funnel (strict '>'), which keeps the
    semantics deterministic and exactly SQL-replayable."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    stage_list = list(stages)

    def pre(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"),
                                     pa.array(stage_list)))

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        ts = pd.Series(ts_int_us(g["ts"]), index=g.index)
        g = pd.DataFrame({"user_id": g["user_id"], "ts": ts,
                          "event_type": g["event_type"]})
        anchor = (g.loc[g["event_type"] == stage_list[0]]
                  .groupby("user_id", as_index=False)["ts"].min()
                  .rename(columns={"ts": "anchor"}))
        stage = pd.Series(1, index=anchor["user_id"].to_numpy())
        for k, ev in enumerate(stage_list[1:], start=2):
            nxt = g.loc[g["event_type"] == ev].merge(anchor, on="user_id")
            nxt = nxt.loc[nxt["ts"] > nxt["anchor"]]
            anchor = (nxt.groupby("user_id", as_index=False)["ts"].min()
                      .rename(columns={"ts": "anchor"}))
            stage.loc[anchor["user_id"].to_numpy()] = k
        return pd.DataFrame({"user_id": stage.index.to_numpy(),
                             "funnel_stage": stage.to_numpy(np.int64)})

    pruned = ds.map_batches(pre, batch_format="pyarrow")
    return coarse_partition_apply(pruned, funnel_part, key_col="user_id",
                                  part_col="fun_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def event_transitions(sf_dir: str, num_parts: int = 64):
    """Per-user event-sequence transition counts (the clickstream Markov
    matrix): order each user's events by (ts, event_id) — the tiebreak
    makes the sequence, and therefore every count, deterministic — and
    count corpus-wide (prev_type → type) transitions.

    Scale shape: the read prunes to (user_id, ts, event_id, event_type);
    one coarse user-hash exchange, then a vectorized sort+shift kernel
    per partition (a user's sequence never spans partitions, so adjacent
    pairs are exact); the (src_type, dst_type, n) partials are
    vocabulary²-bounded and fold through the house group-sum on a
    composite string key. Returns (src_type, dst_type, n)."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def trans_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"tk": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = np.r_[False, uid[1:] == uid[:-1]]
        src = np.r_[[""], et[:-1]][same]
        dst = et[same]
        df = pd.DataFrame({"tk": pd.Series(src) + "\x1f" + pd.Series(dst)})
        agg = df.groupby("tk", as_index=False).size()
        return pd.DataFrame({"tk": agg["tk"],
                             "n": agg["size"].astype("int64")})

    partials = coarse_partition_apply(ds, trans_part, key_col="user_id",
                                      part_col="tr_part",
                                      num_parts=num_parts,
                                      nrows=_table_nrows(sf_dir, "events"))
    summed = partitioned_group_sum(partials, key="tk", sum_cols={"n": "n"})

    def split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["tk"].str.split("\x1f", n=1, expand=True)
        return pd.DataFrame({"src_type": parts[0], "dst_type": parts[1],
                             "n": df["n"].astype("int64")})

    return summed.map_batches(split, batch_format="pandas")


def event_anomalies(sf_dir: str, num_parts: int = 64, z: int = 3,
                    min_hours: int = 4):
    """Per-user hourly-volume anomaly detection, EXACT-INTEGER z-score:
    flag (user, hour) cells whose event count exceeds the user's own mean
    by more than ``z`` population standard deviations — with the test
    cross-multiplied into integers so no float ever enters:
    (n·cnt − Σ)² > z²·(n·Σc² − Σ²), high side only, users with ≥
    ``min_hours`` observed hours. Deterministic for any partitioning and
    replayed verbatim by the SQL oracle.

    Scale shape: read prunes to (user_id, ts); ONE coarse user-hash
    exchange (a user's hours never span partitions), then a single
    vectorized kernel per partition does hour-bucket counts, per-user
    moments, and the flag — no join, no second exchange. Returns
    (user_id, hour, n_events) for flagged cells, hour = epoch-hours."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def flag_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "hour": pd.Series(dtype="int64"),
                              "n_events": pd.Series(dtype="int64")})
        if len(g) == 0:
            return empty
        hours = ts_int_us(g["ts"]) // 3_600_000_000
        c = (pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                           "hour": hours})
             .groupby(["user_id", "hour"], as_index=False).size()
             .rename(columns={"size": "n_events"}))
        n = c["n_events"].to_numpy(dtype=np.int64)
        stats = c.assign(sq=n * n).groupby("user_id")
        agg = stats.agg(nh=("hour", "size"), total=("n_events", "sum"),
                        sumsq=("sq", "sum"))
        j = c.join(agg, on="user_id")
        lhs = j["nh"].to_numpy(np.int64) * j["n_events"].to_numpy(np.int64) \
            - j["total"].to_numpy(np.int64)
        var_n2 = (j["nh"].to_numpy(np.int64) * j["sumsq"].to_numpy(np.int64)
                  - j["total"].to_numpy(np.int64) ** 2)
        keep = ((j["nh"].to_numpy(np.int64) >= min_hours) & (lhs > 0)
                & (lhs * lhs > z * z * var_n2))
        out = j.loc[keep, ["user_id", "hour", "n_events"]]
        return out.astype("int64") if len(out) else empty

    return coarse_partition_apply(ds, flag_part, key_col="user_id",
                                  part_col="an_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def event_throttle(sf_dir: str, num_parts: int = 64):
    """Keep-first-per-window debounce — the standard stream-curation
    primitive (rate-limit repeated signals): for every (user, event_type,
    hour) cell keep the FIRST event by (ts, event_id) and count how many
    the throttle suppressed. Deterministic: the tiebreak pins the winner.

    Scale shape: read prunes to 4 slim columns; ONE coarse user-hash
    exchange (a user's cells never span partitions), then a single
    vectorized mergesort + group-first kernel per partition. Returns
    (user_id, event_type, hour, event_id, n_suppressed)."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def first_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "event_type": pd.Series(dtype="object"),
                              "hour": pd.Series(dtype="int64"),
                              "event_id": pd.Series(dtype="int64"),
                              "n_suppressed": pd.Series(dtype="int64")})
        if len(g) == 0:
            return empty
        g = g.assign(hour=ts_int_us(g["ts"]) // 3_600_000_000)
        g = g.sort_values(["user_id", "event_type", "hour", "ts", "event_id"],
                          kind="mergesort")
        grp = g.groupby(["user_id", "event_type", "hour"], sort=False)
        out = grp.agg(event_id=("event_id", "first"),
                      n_suppressed=("event_id", "size")).reset_index()
        out["n_suppressed"] = (out["n_suppressed"] - 1).astype("int64")
        return out[["user_id", "event_type", "hour", "event_id",
                    "n_suppressed"]]

    return coarse_partition_apply(ds, first_part, key_col="user_id",
                                  part_col="th_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def retention(sf_dir: str, num_parts: int = 64):
    """Cohort retention — the other canonical product-analytics matrix:
    users cohort by their FIRST active day; for every (cohort, day
    offset) cell, how many distinct cohort members were active that day.

    Scale shape: one coarse user-hash exchange (a user never spans
    partitions, so per-user first-day and distinct-active-day are exact
    per partition); each partition emits tiny (cohort·1e5 + offset,
    count) partials — bounded by days², not users — which fold through
    the house group-sum. Days are integer days-since-epoch (ts_int_us //
    86.4e9), matching DuckDB's CAST(ts AS DATE) truncation, so the whole
    matrix is SQL-exact. Packing bounds are ASSERTED in the kernel:
    0 ≤ day_offset < 100 000 (a ~274-year span between a user's first
    and last event) and cohort ≥ 0 (no pre-1970 timestamps) — outside
    them the ·1e5 pack-and-decompose would silently corrupt cells, so
    the kernel fails loud instead. Returns (cohort_day, day_offset,
    n_users)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    _DAY_US = 86_400_000_000

    def part_kernel(g: pd.DataFrame) -> pd.DataFrame:
        day = ts_int_us(g["ts"]) // _DAY_US
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "day": day})
        df = df.drop_duplicates()
        first = (df.groupby("user_id", as_index=False)["day"].min()
                 .rename(columns={"day": "cohort"}))
        df = df.merge(first, on="user_id")
        df["off"] = df["day"] - df["cohort"]
        agg = df.groupby(["cohort", "off"], as_index=False).size()
        # loud-failure guards for the ·1e5 packing (docstring)
        if len(agg):
            assert int(agg["off"].max()) < 100_000, \
                "retention: day_offset >= 100000 breaks the packed key"
            assert int(agg["cohort"].min()) >= 0, \
                "retention: pre-epoch cohort breaks the packed key"
        return pd.DataFrame({
            "ck": (agg["cohort"] * 100_000 + agg["off"]).astype("int64"),
            "n": agg["size"].astype("int64")})

    partials = coarse_partition_apply(ds, part_kernel, key_col="user_id",
                                      part_col="ret_part",
                                      num_parts=num_parts,
                                      nrows=_table_nrows(sf_dir, "events"))
    summed = partitioned_group_sum(partials, key="ck",
                                   sum_cols={"n_users": "n"})

    def decompose(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["ck"].to_numpy(np.int64)
        return pd.DataFrame({"cohort_day": ck // 100_000,
                             "day_offset": ck % 100_000,
                             "n_users": df["n_users"].astype("int64")})

    return summed.map_batches(decompose, batch_format="pandas")


def _arrow_type(t):
    """Normalize Dataset.schema() entries (numpy dtypes / python types for
    pandas blocks) to Arrow DataTypes."""
    if isinstance(t, pa.DataType):
        return t
    simple = {str: pa.string(), int: pa.int64(), float: pa.float64(),
              bool: pa.bool_(), bytes: pa.binary()}
    if t in simple:
        return simple[t]
    try:
        return pa.from_numpy_dtype(t)
    except (TypeError, pa.lib.ArrowNotImplementedError):
        return pa.string()


def _bucket_array(kv, num_buckets: int) -> pa.Array:
    """Deterministic hash bucket per key, by LOGICAL value.

    int: masked mod; float: integral values hash via the SAME int rule —
    a pandas stage upstream turns an int64-with-nulls block into float64,
    so the same logical key arrives as Arrow int64 in null-free blocks and
    float64 in null-bearing ones; hashing 8 and 8.0 identically keeps a
    group in ONE partition regardless of which blocks its rows share with
    a null. (Ints beyond 2^53 are corrupted by that pandas round-trip
    itself — nothing to recover here.) Nulls/NaN land in bucket(0); other
    types crc32 their str form."""
    import zlib

    if pa.types.is_null(kv.type):
        # an entirely-null block arrives as the Arrow null TYPE (no value
        # type at all). Such blocks only come from schemaless sources
        # (from_items and friends), where the column's typed blocks are
        # string/object — so bucket exactly as the string path buckets a
        # null VALUE, keeping the null group in ONE partition.
        return pa.array(vec_str_buckets(
            pd.Series([None] * len(kv), dtype="object"), num_buckets),
            type=pa.int64())
    if pa.types.is_integer(kv.type):
        # null-safe: fill nulls with 0 BEFORE the numpy cast (NaN→int64 is
        # undefined); all null keys land deterministically in bucket(0)
        if kv.null_count:
            kv = pc.fill_null(kv, 0)
        arr = kv.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array((arr & (2**62 - 1)) % num_buckets, type=pa.int64())
    if pa.types.is_floating(kv.type):
        arr = kv.to_numpy(zero_copy_only=False).astype(np.float64)
        buckets = np.zeros(len(arr), dtype=np.int64)  # NaN/null → bucket(0)
        ok = np.isfinite(arr) & (np.floor(arr) == arr)
        iv = arr[ok].astype(np.int64)
        buckets[ok] = (iv & (2**62 - 1)) % num_buckets
        rest = np.flatnonzero(np.isfinite(arr) & ~(np.floor(arr) == arr))
        for i in rest:  # true non-integral floats: consistent str hash
            buckets[i] = zlib.crc32(str(arr[i]).encode()) % num_buckets
        return pa.array(buckets, type=pa.int64())
    if pa.types.is_string(kv.type) or pa.types.is_large_string(kv.type):
        return pa.array(vec_str_buckets(kv.to_pandas(), num_buckets),
                        type=pa.int64())
    return pa.array([zlib.crc32(str(v).encode()) % num_buckets for v in kv.to_pylist()],
                    type=pa.int64())


def vec_str_buckets(values, num_buckets: int) -> np.ndarray:
    """Vectorized deterministic bucket for a string/object sequence — the
    shared shuffle-prep stamp (pair-distinct passes, connected-components
    labels, streaming session routing). pandas' siphash with its fixed
    key is stable across processes and sessions, unlike builtin ``hash``;
    the per-row ``zlib.crc32(str(v))`` list comprehension this replaces
    was the hot loop of edge-set stamping at scale."""
    s = values if isinstance(values, pd.Series) else pd.Series(values, dtype="object")
    return (pd.util.hash_pandas_object(s, index=False).to_numpy()
            % num_buckets).astype(np.int64)


def partitioned_group_sum(ds, *, key: str, sum_cols: dict[str, str],
                          num_parts: int = 64, sort_width: int | None = None,
                          nrows: int | None = None):
    """Distributed group-sum for HIGH-CARDINALITY keys.

    Ray Data's ``groupby(key).aggregate(Sum(...))`` folds per key in
    Python — measured ~150 CPU-seconds for 15k customer keys over pandas
    blocks. This pattern is the repo's standard alternative: coarse
    crc32(key) % num_parts partition (a key never spans partitions) +
    ONE vectorized pandas groupby-sum per partition — O(num_parts)
    Python calls regardless of key cardinality.

    The partials are repartitioned to ``sort_width`` blocks before the
    groupby: Ray's sort-shuffle makes one output RANGE per input block,
    so sorting N tiny partial blocks over ≤num_parts distinct bucket
    values yields N−num_parts EMPTY range partitions — each a schemaless
    block (Ray builds it without calling the UDF, map_transformer.py)
    that triggers the "RefBundle with a different schema" warning and a
    wasted reduce task. The partials are slim (one row per distinct key
    per batch), so the extra split/merge pass is cheap at any scale.

    ``sort_width`` defaults to max(8, cluster CPUs ÷ 4), capped at
    ``num_parts`` — it must scale with the CLUSTER, not stay a constant:
    for per-doc keys the partials are data-proportional, and a fixed
    width of 8 would funnel a 256-node reduce through 8 blocks. A caller
    who knows the partial row count passes ``nrows`` and the width
    follows ``choose_partitions`` instead.

    Residual cosmetic: Ray's sort SAMPLES range boundaries, and a
    sampled-quantile collision occasionally (measured ~1 in 4 runs for
    top_terms at 32 CPUs) yields one empty range → one skipped-UDF
    schemaless block → one "RefBundle with a different schema" warning
    pair. Values are unaffected (the stage is oracle-gated); shrinking
    the width to dodge it would cap the reduce parallelism a real
    cluster needs, so the warning is accepted and documented instead.

    ``sum_cols`` maps output column → input column to sum.
    """
    if sort_width is None:
        cpus = 0
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            pass
        sort_width = max(8, cpus // 4)
    if nrows is not None:
        sort_width = choose_partitions(nrows, default=sort_width,
                                       lo=min(sort_width, 8))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(key, as_index=False).agg(
            **{out: (src, "sum") for out, src in sum_cols.items()})
        return agg

    # combine groups by the REAL key internally, so it is
    # partition-shape-independent and the coarse_partition_apply coalesce
    # gate is sound here too: a caller who KNOWS the input is small skips
    # the sort barrier (and its schemaless-empty-range warnings) entirely
    if nrows is not None and 0 < nrows <= _COALESCE_ROW_LIMIT:
        return ds.repartition(1).map_batches(combine, batch_format="pandas",
                                             batch_size=None)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column("gs_part",
                                   _bucket_array(batch.column(key), num_parts))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .repartition(min(sort_width, num_parts))
            .groupby("gs_part").map_groups(combine, batch_format="pandas"))


def topk(ds, *, by: list[str], descending: list[bool], k: int):
    """Distributed top-k without a full distributed sort.

    Per-block local top-k is the only full-data pass; the survivors
    (≤ blocks × k rows — bounded) merge in a single final task. Replaces
    ``ds.sort(...).limit(k)``, whose all-to-all sort cost ~21 s on 15k
    rows spread over 74 small blocks.
    """
    ascending = [not d for d in descending]

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=ascending).head(k)

    pruned = ds.map_batches(local_topk, batch_format="pandas")
    return pruned.repartition(1).map_batches(local_topk, batch_format="pandas",
                                             batch_size=None)


def top_n_per_group(ds, *, group_col: str, order_cols: list[str],
                    descending: list[bool], n: int, rank_col: str = "rnk",
                    num_parts: int = 64, nrows: int | None = None):
    """Windowed rank: ``row_number() OVER (PARTITION BY group
    ORDER BY ...) <= n`` — top-n rows per group, with the 1-based rank
    appended. The per-group sibling of :func:`topk` (global) that Ray Data
    has no primitive for.

    Shape: per-group top-n is ASSOCIATIVE (the global top-n per key is the
    top-n of per-block top-ns), so a per-batch pre-prune keeps ≤ n rows per
    group per block before the exchange — the shuffle carries
    ``n × keys-per-block`` rows, not the input (a hot key still ships only
    n rows per block, the skew cap). Then the house coarse-partition
    contract (one crc32(group) exchange, ONE vectorized mergesort+cumcount
    kernel per partition — no per-key Python). The kernel is
    partition-shape-independent, so the small-input coalesce gate applies.
    Order columns must make the rank deterministic (include a tiebreaker).
    A null group key is a real partition (``dropna=False``), as in SQL
    PARTITION BY.
    """
    ascending = [True] + [not d for d in descending]

    def _rank(g: pd.DataFrame):
        g = g.sort_values([group_col] + order_cols, ascending=ascending,
                          kind="mergesort")
        rnk = g.groupby(group_col, sort=False,
                        dropna=False).cumcount().to_numpy() + 1
        return g, rnk

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g, rnk = _rank(g)
        return g.iloc[rnk <= n]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g, rnk = _rank(g)
        out = g.iloc[rnk <= n].copy()
        out[rank_col] = rnk[rnk <= n].astype("int64")
        return out.drop(columns=["tng_part"], errors="ignore")

    # below the coalesce gate the single merged kernel does all the work —
    # a prune pass there is pure extra cost, not a smaller exchange
    if nrows is not None and 0 < nrows <= _COALESCE_ROW_LIMIT:
        pruned = ds
    else:
        pruned = ds.map_batches(prune, batch_format="pandas")
    return coarse_partition_apply(pruned, kernel, key_col=group_col,
                                  part_col="tng_part", num_parts=num_parts,
                                  nrows=nrows)


def _zspread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of ``v`` to even bit positions (the classic
    Morton-code magic-mask ladder — public bit-twiddling folklore, e.g.
    Sean Anderson's Bit Twiddling Hacks)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def zorder_key_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton (Z-order) key interleaving two 16-bit dimensions:
    x in even bits, y in odd bits."""
    return (_zspread16(x) | (_zspread16(y) << np.uint64(1))).astype(np.int64)


def zorder_layout(sf_dir: str, *, part_bits: int = 4):
    """Z-ORDER storage-layout keys for the orders table — the
    multi-dimensional clustering primitive behind Delta/Iceberg's
    ``ZORDER BY`` (public technique: Morton curves map 2-D proximity to
    1-D key proximity, so sorting/partitioning by the key co-locates rows
    that are close in BOTH dimensions and range-prunes either predicate).

    Dimensions here: customer key (low 16 bits) × price (cents >> 8, low
    16 bits). Emits (o_orderkey, zkey, zpart) with ``zpart`` = the top
    ``part_bits`` of the 32-bit key — the 2^part_bits curve tiles a layout
    writer would use as output partitions. Pure vectorized map, ZERO
    exchange: at corpus scale the expensive step is the write-sort a
    caller chains after it, not the key computation."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def kernel(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = _cents(batch.column("o_totalprice")).to_numpy(
            zero_copy_only=False)
        x = cust.astype(np.uint64) & np.uint64(0xFFFF)
        y = (cents.astype(np.uint64) >> np.uint64(8)) & np.uint64(0xFFFF)
        zkey = zorder_key_u32(x, y)
        zpart = (zkey >> (32 - part_bits)).astype(np.int64)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "zkey": pa.array(zkey, type=pa.int64()),
            "zpart": pa.array(zpart, type=pa.int64())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def domain_cap(sf_dir: str, cap: int = 10, group_col: str = "source"):
    """Per-domain document cap — the crawl-hygiene guard against one host
    dominating a web corpus (every large-scale pipeline applies one; cf.
    the per-domain limits in C4/RefinedWeb-style curation).

    Survivors are chosen DETERMINISTICALLY: rank docs within each domain
    by the md5 order slice (``functions/hashing.md5_order_i60`` — the
    same rule at any scale or partitioning, so reruns and resumes keep
    identical survivors) and keep the first ``cap``. Built on
    :func:`top_n_per_group`, so the shuffle ships at most cap × domains
    rows per block (the pre-prune is the skew cap: a million-doc host
    still contributes ``cap`` rows per block to the exchange)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", group_col])

    def add_order(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_order_i60

        ids = batch.column("doc_id").to_pylist()
        return batch.append_column("cap_order",
                                   pa.array(md5_order_i60(ids)))

    pre = ds.map_batches(add_order, batch_format="pyarrow")
    out = top_n_per_group(pre, group_col=group_col,
                          order_cols=["cap_order", "doc_id"],
                          descending=[False, False], n=cap, rank_col="rnk",
                          nrows=_table_nrows(sf_dir, "documents"))
    return out.map_batches(
        lambda df: df[["doc_id", group_col, "rnk"]].astype({"doc_id": "int64",
                                                            "rnk": "int64"}),
        batch_format="pandas")


def pivot_counts(ds, *, key: str, pivot_col: str, categories: list[str],
                 other: str | None = None, num_parts: int = 64,
                 nrows: int | None = None):
    """PIVOT / crosstab: one count column per category per key
    (``n_<cat>``), the one-hot aggregate feeding feature tables. The
    category list is an explicit contract (as in SQL ``PIVOT ... IN``);
    ``other`` buckets unlisted values into ``n_<other>`` (None = drop).

    Shape: per-batch vectorized crosstab partial (one row per key per
    batch, count columns fixed) → coarse key-partition group-sum. The
    exchange carries ``keys-per-batch × (len(categories)+2)`` int64 cells —
    never the raw rows.
    """
    cats = list(categories) + ([other] if other is not None else [])
    cols = [f"n_{c}" for c in cats]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({key: batch[key], "_c": batch[pivot_col]})
        if other is not None:
            g["_c"] = np.where(g["_c"].isin(categories), g["_c"], other)
        else:
            g = g[g["_c"].isin(categories)]
        ct = (g.groupby([key, "_c"], observed=True, dropna=False).size()
              .unstack(fill_value=0))
        ct = ct.reindex(columns=cats, fill_value=0)
        ct.columns = cols
        return ct.reset_index()

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        agg = part.groupby(key, as_index=False, dropna=False)[cols].sum()
        for c in cols:
            agg[c] = agg[c].astype("int64")
        return agg

    partials = ds.map_batches(partial, batch_format="pandas")
    # input nrows upper-bounds partial rows → the coalesce gate is sound
    return coarse_partition_apply(partials, kernel, key_col=key,
                                  part_col="pv_part", num_parts=num_parts,
                                  nrows=nrows)


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_col: str = "variable", value_col: str = "value"):
    """UNPIVOT / melt: wide columns → long (id, variable, value) rows —
    the inverse of :func:`pivot_counts`. Embarrassingly parallel (a pure
    per-batch reshape, rows × len(value_cols) output, NO shuffle)."""
    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.melt(id_vars=id_cols, value_vars=value_cols,
                          var_name=var_col, value_name=value_col)

    return ds.map_batches(melt, batch_format="pandas")


def user_event_unpivot(sf_dir: str):
    """pivot → unpivot round trip: the per-user count matrix melted back
    to long (user_id, cat, n) rows."""
    wide = user_event_pivot(sf_dir)
    return unpivot(wide, id_cols=["user_id"],
                   value_cols=[f"n_{t}" for t in _EVENT_TYPES],
                   var_col="cat", value_col="n")


def pricing_rollup(sf_dir: str):
    """Hierarchical ROLLUP aggregate: sum_qty / n_rows at three grain
    levels — (returnflag, linestatus), (returnflag), () — like SQL
    ``GROUP BY ROLLUP``, higher levels null-filled.

    Shape: one full-data pass of per-batch partials keyed on the FINEST
    grain; the coarser levels are re-aggregated from the tiny base result
    inside the single merge task — rolling up never re-reads the input.
    Quantities are cast to int64 (integral by contract) so every level is
    order-independent exact.
    """
    keys = ["l_returnflag", "l_linestatus"]
    ds = _read(sf_dir, "lineitem", columns=keys + ["l_quantity"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        # np.rint = half-to-even = DuckDB's DOUBLE→BIGINT cast (a plain
        # astype truncates — latent divergence for non-integral values)
        batch = batch.assign(
            q=np.rint(batch["l_quantity"].to_numpy(np.float64)).astype("int64"))
        agg = batch.groupby(keys, as_index=False).agg(
            sum_qty=("q", "sum"), n_rows=("q", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        spec = {"sum_qty": ("sum_qty", "sum"), "n_rows": ("n_rows", "sum")}
        base = part.groupby(keys, as_index=False).agg(**spec)
        lvl1 = base.groupby(keys[0], as_index=False).agg(**spec)
        lvl1[keys[1]] = None
        lvl0 = pd.DataFrame({keys[0]: [None], keys[1]: [None],
                             "sum_qty": [base["sum_qty"].sum()],
                             "n_rows": [base["n_rows"].sum()]})
        out = pd.concat([base, lvl1, lvl0], ignore_index=True)
        out["sum_qty"] = out["sum_qty"].astype("int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        return out[keys + ["sum_qty", "n_rows"]]

    partials = ds.map_batches(partial, batch_format="pandas")
    # partial rows ≤ distinct(flag×status) per batch — always tiny
    return partials.repartition(1).map_batches(combine, batch_format="pandas",
                                               batch_size=None)


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def user_event_pivot(sf_dir: str):
    """Per-user event-type count matrix (PIVOT over the event stream)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(ds, key="user_id", pivot_col="event_type",
                        categories=_EVENT_TYPES,
                        nrows=_table_nrows(sf_dir, "events"))


def customer_orders_left(sf_dir: str, num_buckets: int = 32):
    """LEFT OUTER join demo over the bucket-partitioned hash join:
    every customer with each of their orders, orderless customers kept
    with null order columns. Explicit types keep the pipeline fully lazy
    (Dataset.schema() would execute the upstream)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def rekey(b: pa.Table) -> pa.Table:
        return b.select(["o_custkey", "o_orderkey", "o_totalprice"]) \
                .rename_columns(["c_custkey", "o_orderkey", "o_totalprice"])

    orders = orders.map_batches(rekey, batch_format="pyarrow")
    return hash_join(
        cust, orders, key="c_custkey", how="left", num_buckets=num_buckets,
        left_types={"c_custkey": pa.int64(), "c_name": pa.string()},
        right_types={"c_custkey": pa.int64(), "o_orderkey": pa.int64(),
                     "o_totalprice": pa.float64()})


def events_customers_full(sf_dir: str, num_buckets: int = 32):
    """FULL OUTER join demo: per-user event counts ⟗ customer — active
    non-customers survive with null customer columns, inactive customers
    with null counts. Composition: per-batch count partials →
    coarse group-sum (slim) → bucket hash join in outer mode."""
    ev = _read(sf_dir, "events", columns=["user_id"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        agg = batch.groupby("user_id", as_index=False, dropna=False).size()
        return pa.table({
            "c_custkey": pa.array(agg["user_id"], type=pa.int64()),
            "n_events": pa.array(agg["size"], type=pa.int64()),
        })

    counts = partitioned_group_sum(
        ev.map_batches(partial, batch_format="pandas"),
        key="c_custkey", sum_cols={"n_events": "n_events"})
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return hash_join(
        counts, cust, key="c_custkey", how="outer", num_buckets=num_buckets,
        left_types={"c_custkey": pa.int64(), "n_events": pa.int64()},
        right_types={"c_custkey": pa.int64(), "c_name": pa.string()})


def events_value_percentiles(sf_dir: str, num_parts: int = 16):
    """GROUPED exact quantiles (p25/p50/p75/p90 of value per event_type) —
    the per-key sibling of the global token_percentiles histogram trick.

    Values are milli fixed-pointed (``floor(1000·v)`` in float64 — the
    same IEEE ops DuckDB performs), so exact discrete quantiles reduce to
    a bounded histogram: per-batch (type, value_milli, n) partials → one
    slim exchange keyed on type → per-type cumulative-count quantile
    lookup, ``ceil(q·n)-1`` matching DuckDB quantile_disc. The exchange
    carries one row per distinct (type, milli value) per batch —
    ``min(batch_rows, types × value_range·1000)`` — so it collapses for
    bounded-range values and degrades to the raw (type, value) pairs only
    when every value is distinct, which is the exact-quantile floor.
    """
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def hist_partial(batch: pd.DataFrame) -> pa.Table:
        v = batch["value"].to_numpy(dtype=np.float64)
        keep = ~np.isnan(v)
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy()[keep],
            "value_milli": np.floor(1000.0 * v[keep]).astype(np.int64),
        })
        agg = g.groupby(["event_type", "value_milli"], as_index=False,
                        dropna=False).size()
        return pa.table({
            "event_type": pa.array(agg["event_type"], type=pa.string()),
            "value_milli": pa.array(agg["value_milli"], type=pa.int64()),
            "n": pa.array(agg["size"], type=pa.int64()),
        })

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, sub in part.groupby("event_type", sort=False, dropna=False):
            h = (sub.groupby("value_milli", as_index=False)["n"].sum()
                 .sort_values("value_milli"))
            values = h["value_milli"].to_numpy()
            cum = h["n"].to_numpy().cumsum()
            n = int(cum[-1])

            def qd(q: float) -> int:
                idx = min(max(math.ceil(q * n) - 1, 0), n - 1)
                return int(values[np.searchsorted(cum, idx + 1)])

            rows.append((t, n, int(values[0]), qd(0.25), qd(0.5),
                         qd(0.75), qd(0.9), int(values[-1])))
        out = pd.DataFrame(rows, columns=[
            "event_type", "n_events", "min_milli", "p25_milli", "p50_milli",
            "p75_milli", "p90_milli", "max_milli"])
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    hist = ds.map_batches(hist_partial, batch_format="pandas")
    # input nrows upper-bounds the partial histogram rows → gate is sound
    return coarse_partition_apply(hist, kernel, key_col="event_type",
                                  part_col="evp_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def orders_top_per_customer(sf_dir: str, n: int = 3):
    """Top-n orders per customer by price (windowed rank over orders)."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return top_n_per_group(ds, group_col="o_custkey",
                           order_cols=["o_totalprice", "o_orderkey"],
                           descending=[True, False], n=n,
                           nrows=_table_nrows(sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Large ⋈ large: explicit bucket-partitioned hash join
# ---------------------------------------------------------------------------

def hash_join(ds_left, ds_right, *, key: str, num_buckets: int = 32,
              suffixes: tuple = ("", "_r"), how: str = "inner",
              left_types: dict | None = None, right_types: dict | None = None,
              coalesce_blocks: int | None = None):
    """Bucket-partitioned inner/left-outer hash join for two LARGE datasets.

    The portable pattern from the Ray guide: both sides get a
    ``join_bucket = hash(key) % B`` column, schemas are aligned with TYPED
    null columns (Arrow — object-dtype pandas nulls would make the shuffle
    sort orders of magnitude slower), the sides union, and matching buckets
    join pairwise inside map_groups. The shuffle is one all-to-all of each
    side, same as any distributed hash join. Skewed keys: raise num_buckets
    or pre-salt the hot key into sub-buckets on the probe side.

    ``how="left"`` keeps unmatched left rows (right columns null) and
    ``how="outer"`` unmatched rows of BOTH sides; an unmatched row's
    bucket group always exists, so no extra pass is needed. A schemaless
    (fully empty) side whose columns must appear null-typed in the output
    (right side for left join, either side for outer) needs its
    ``*_types`` passed — without them the null columns can't be typed.

    ``coalesce_blocks``: Ray's sort shuffle emits one output RANGE per
    input block, so when the union holds MORE blocks than distinct
    bucket values (slim sides split fine upstream — e.g. the per-round
    joins of an iterative graph loop) the surplus ranges are EMPTY
    schemaless blocks (warning + wasted reduce task each). A caller
    whose sides are slim passes the expected exchange width here and the
    union coalesces to ``min(coalesce_blocks, num_buckets)`` blocks
    before the sort (split/merge repartition — no key exchange). Leave
    it None for wide sides: there the extra full-data pass costs more
    than the empty ranges.
    """
    import zlib

    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how must be 'inner', 'left' or 'outer', got {how!r}")

    # Dataset.schema() EXECUTES a lazy upstream pipeline to sample its
    # schema — callers that know their column types pass left_types /
    # right_types ({name: arrow type}) to keep the join fully lazy.
    if left_types is None or right_types is None:
        lschema = ds_left.schema() if left_types is None else True
        rschema = ds_right.schema() if right_types is None else True
        if lschema is None or rschema is None:
            # a schemaless (fully empty) left side makes inner/left joins
            # empty; a schemaless right side makes an INNER join empty.
            # Where the empty side's columns must still appear (null-typed)
            # in the output, require explicit types rather than silently
            # dropping them.
            if how == "outer":
                raise ValueError(
                    "hash_join(how='outer') with a schemaless side "
                    "requires its left_types/right_types")
            if lschema is None:
                return ds_left
            if how == "left":
                raise ValueError(
                    "hash_join(how='left') with a schemaless right side "
                    "requires right_types")
            return ds_right
        if left_types is None:
            left_types = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
        if right_types is None:
            right_types = {n: _arrow_type(t) for n, t in zip(rschema.names, rschema.types)}
    ltypes = dict(left_types)
    rtypes = dict(right_types)
    rename_r = {c: c + suffixes[1] for c in rtypes if c != key and c in ltypes}
    rtypes_out = {rename_r.get(c, c): t for c, t in rtypes.items()}
    all_types = dict(ltypes)
    for c, t in rtypes_out.items():
        all_types.setdefault(c, t)
    all_cols = list(all_types)

    def align(renames: dict, side_id: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.rename_columns([renames.get(c, c) for c in batch.column_names])
            n = batch.num_rows
            for c in all_cols:
                if c not in batch.column_names:
                    batch = batch.append_column(c, pa.nulls(n, type=all_types[c]))
            batch = batch.select(all_cols)
            # shared null-safe logical-value bucketing (was an inline copy
            # missing the fill_null guard — NaN→int64 is undefined)
            bucket = _bucket_array(batch.column(key), num_buckets)
            batch = batch.append_column("join_bucket", pc.cast(bucket, pa.int64()))
            return batch.append_column("join_side",
                                       pa.array([side_id] * n, type=pa.int64()))

        return fn

    left = ds_left.map_batches(align({}, 0), batch_format="pyarrow")
    right = ds_right.map_batches(align(rename_r, 1), batch_format="pyarrow")
    both = left.union(right)
    if coalesce_blocks is not None:
        both = both.repartition(max(1, min(coalesce_blocks, num_buckets)))
    l_keep = list(ltypes)
    r_keep = list(rtypes_out)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["join_side"] == 0][l_keep]
        r = g[g["join_side"] == 1][r_keep]
        out = l.merge(r, on=key, how=how)  # empty-safe: keeps dtypes
        # restore integer dtypes diluted to float64 by the union's nulls.
        # LEFT join right side: unmatched rows put real NaNs there in SOME
        # buckets, so cast to NULLABLE Int64 (→ Arrow int64-with-nulls) —
        # every bucket emits the same Arrow type, and the final to_pandas
        # lands on int64 when no null exists and float64 when one does,
        # matching what DuckDB's fetchdf does for a nullable BIGINT.
        restore = out.columns if how == "inner" else \
            (l_keep if how == "left" else [])
        for c in restore:
            if pa.types.is_integer(all_types.get(c, pa.string())) and \
                    out[c].dtype.kind == "f" and not out[c].isna().any():
                out[c] = out[c].astype("int64")
        if how != "inner":
            for c in out.columns:
                if pa.types.is_integer(all_types[c]) and \
                        out[c].dtype.kind == "f":
                    out[c] = out[c].astype("Int64")
            # Arrow block with the EXPLICIT join schema (int64-with-nulls,
            # typed strings), NOT per-bucket inference: an unmatched bucket
            # would infer a null-typed column for all-None strings and a
            # matched one string — mixed block schemas downstream. With
            # int64-with-nulls blocks, Dataset.to_pandas lands on int64
            # when the column has no null and float64 when it does —
            # DuckDB fetchdf semantics. Strip the embedded pandas metadata
            # or to_pandas round-trips the Int64 extension dtype back.
            schema = pa.schema([(c, all_types[c]) for c in out.columns])
            return pa.Table.from_pandas(
                out, preserve_index=False,
                schema=schema).replace_schema_metadata(None)
        return out

    return both.groupby("join_bucket").map_groups(join_bucket, batch_format="pandas")


def customer_order_revenue(sf_dir: str, k: int = 10,
                           broadcast_limit: int = 2_000_000):
    """Top-k customers by total order revenue (orders ⋈ lineitem → group by
    customer → top-k).

    Two execution paths, chosen by the orders-side row count (metadata-only
    ``count()`` — no scan), mirroring the minhash verify's
    broadcast-with-bucket-join-fallback:

    * ``count(orders) ≤ broadcast_limit``: the (o_orderkey → o_custkey)
      mapping is ``ray.put`` ONCE as two sorted numpy arrays (16 B/row —
      2M orders = 32 MB) and each lineitem batch resolves custkeys via
      ``np.searchsorted`` and pre-aggregates per custkey. The combine is a
      sortless two-level tree (repartition coalesce → vectorized group-sum),
      so the whole query runs with ZERO sort shuffles.
    * larger orders side: bucket-partitioned hash join + partitioned
      group-sum + bounded two-level top-k — two slim all-to-all exchanges,
      nothing customer-sized on the driver. This is the 10^12-row path.
    """
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def li_revenue(batch: pa.Table):
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return _cents(rev)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    if orders.count() <= broadcast_limit:
        import numpy as np
        import ray as _ray

        odf = orders.to_pandas()
        if "o_orderkey" not in odf.columns:  # fully-empty side loses schema
            odf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "o_custkey": pd.Series(dtype="int64")})
        okey = odf["o_orderkey"].to_numpy(np.int64)
        order = np.argsort(okey, kind="stable")
        map_ref = _ray.put((okey[order],
                            odf["o_custkey"].to_numpy(np.int64)[order]))

        def partial(batch: pa.Table) -> pa.Table:
            ok, cu = _ray.get(map_ref)
            if len(ok) == 0:  # empty orders side → empty inner join
                return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                                 "total_revenue_cents": pa.array([], type=pa.int64())})
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            idx, hit = _ss_match(ok, lkey)  # inner join: drop unmatched
            cents = li_revenue(batch).to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"o_custkey": cu[idx][hit],
                               "total_revenue_cents": cents[hit]})
            g = df.groupby("o_custkey", as_index=False)["total_revenue_cents"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        def combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by("o_custkey").aggregate(
                [("total_revenue_cents", "sum")])
            return pa.table({
                "o_custkey": g.column("o_custkey"),
                "total_revenue_cents": g.column("total_revenue_cents_sum")})

        partials = li.map_batches(partial, batch_format="pyarrow",
                                  batch_size=131072)
        # sortless tree combine: blocks → 8 → 1; each level is a
        # RepartitionReduce (concat) + Arrow group-sum, no sort shuffle.
        # Final block ≤ 8 × distinct custkeys ≤ 8 × broadcast_limit slim
        # rows — bounded by the same limit that let us broadcast at all.
        lvl1 = partials.repartition(8).map_batches(
            combine, batch_format="pyarrow", batch_size=None)
        final = lvl1.repartition(1).map_batches(
            combine, batch_format="pyarrow", batch_size=None)

        def head(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.sort_values(
                ["total_revenue_cents", "o_custkey"],
                ascending=[False, True]).head(k)

        return final.map_batches(head, batch_format="pandas", batch_size=None)

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": batch.column("l_orderkey"),
                      "revenue_cents": li_revenue(batch)})
        g = t.group_by("o_orderkey").aggregate([("revenue_cents", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "revenue_cents": g.column("revenue_cents_sum")})

    joined = hash_join(orders, li.map_batches(
        li_partial, batch_format="pyarrow", batch_size=65536),
        key="o_orderkey", num_buckets=16)

    def partial_cust(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("o_custkey", as_index=False).agg(
            total_revenue_cents=("revenue_cents", "sum"))
        return out.astype({"o_custkey": "int64", "total_revenue_cents": "int64"})

    per_cust = joined.map_batches(partial_cust, batch_format="pandas")
    summed = partitioned_group_sum(
        per_cust, key="o_custkey",
        sum_cols={"total_revenue_cents": "total_revenue_cents"})
    return topk(summed, by=["total_revenue_cents", "o_custkey"],
                descending=[True, False], k=k)


# ---------------------------------------------------------------------------
# Semi / anti join: bucket-partitioned exact membership, keys-only exchange
# ---------------------------------------------------------------------------

def semi_anti_join(ds_left, ds_right, *, left_key: str, right_key: str | None = None,
                   anti: bool = False, num_buckets: int = 32,
                   left_types: dict | None = None):
    """Exact semi-join (``anti=False``: left rows WITH a right match) or
    anti-join (``anti=True``: left rows WITHOUT one), bucket-partitioned.

    The right side contributes only its key column, deduplicated per batch
    before the exchange — the shuffle carries left rows once plus unique
    right keys, never right payloads. Skewed keys: raise num_buckets.
    """
    right_key = right_key or left_key
    if left_types is not None:
        ltypes = dict(left_types)
    else:
        lschema = ds_left.schema()
        if lschema is None:
            return ds_left  # schemaless empty left → empty result
        ltypes = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    # an empty right side needs no special-casing: it contributes zero
    # blocks to the union, so bucket_fn sees no join_side==1 rows and the
    # semi/anti semantics fall out naturally
    lcols = list(ltypes)

    def prep_left(batch: pa.Table) -> pa.Table:
        batch = batch.select(lcols)
        batch = batch.append_column(
            "join_bucket", _bucket_array(batch.column(left_key), num_buckets))
        return batch.append_column(
            "join_side", pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    def prep_right(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(right_key))
        keys = pc.cast(keys, ltypes[left_key])
        n = len(keys)
        cols = {c: (keys if c == left_key else pa.nulls(n, type=ltypes[c]))
                for c in lcols}
        t = pa.table(cols)
        t = t.append_column("join_bucket", _bucket_array(t.column(left_key), num_buckets))
        return t.append_column("join_side", pa.array(np.ones(n, dtype=np.int64)))

    both = ds_left.map_batches(prep_left, batch_format="pyarrow").union(
        ds_right.map_batches(prep_right, batch_format="pyarrow"))

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["join_side"] == 0]
        member = left[left_key].isin(g.loc[g["join_side"] == 1, left_key])
        out = left[~member if anti else member][lcols].copy()
        # restore integer dtypes diluted to float64 by the union's nulls
        for c in out.columns:
            if pa.types.is_integer(ltypes[c]) and out[c].dtype.kind == "f" \
                    and not out[c].isna().any():
                out[c] = out[c].astype("int64")
        return out

    return both.groupby("join_bucket").map_groups(bucket_fn, batch_format="pandas")


def customers_without_orders(sf_dir: str):
    """Customers with no orders — Bloom-prefiltered exact anti-join.

    A Bloom filter over o_custkey (~10 bits/key, built as a distributed
    OR-reduce of per-batch partials) is broadcast once. Customers the
    filter REJECTS are definite non-members (Bloom has no false negatives)
    and stream straight to the output with no shuffle; only the
    might-contain minority (true members + ~1% FPs) routes through the
    bucket-partitioned exact anti-join. Exact result, no O(|orders|)
    driver set, no full-fact-table shuffle.
    """
    from ..functions.bloom import build_bloom_distributed

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    bloom = build_bloom_distributed(orders, "o_custkey", capacity=orders.count())
    bloom_ref = ray.put(bloom)

    class BloomFlag:
        def __init__(self):
            self.bloom = ray.get(bloom_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = self.bloom.contains_many(batch.column("c_custkey").to_pylist())
            return batch.append_column("maybe_member", pa.array(mask))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    # materialize once so the definite/maybe splits don't recompute the
    # flag stage; the pinned blocks are (int64, name, bool) — narrow
    flagged = cust.map_batches(BloomFlag, batch_format="pyarrow",
                               concurrency=2).materialize()

    def split(want: bool):
        def fn(batch: pa.Table) -> pa.Table:
            keep = batch.filter(pc.equal(batch.column("maybe_member"), want))
            return keep.drop_columns(["maybe_member"])
        return fn

    definite_out = flagged.map_batches(split(False), batch_format="pyarrow")
    maybe = flagged.map_batches(split(True), batch_format="pyarrow")
    fp_out = semi_anti_join(maybe, orders, left_key="c_custkey",
                            right_key="o_custkey", anti=True)
    return definite_out.union(fp_out)


# ---------------------------------------------------------------------------
# Windowed running aggregate (ordered per-group cumulative sum)
# ---------------------------------------------------------------------------

def events_running_total(sf_dir: str, max_users: int = 20, num_parts: int = 16):
    """Per-user running total of event value (milli-units), ordered by
    (ts, event_id) — deterministic tie-break.

    Coarse user-hash partition + vectorized per-partition kernel: sort by
    (user, ts, event_id), then ONE grouped cumsum over the whole
    partition (C-speed) instead of per-user Python."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.less(b.column("user_id"), max_users)),
        batch_format="pyarrow")

    def running_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        # half-away-from-zero (DuckDB round / repo numeric policy), NOT
        # pandas .round() which is half-to-even
        v = g["value"].to_numpy() * 1000.0
        milli = pd.Series((np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64"))
        return pd.DataFrame({
            "user_id": g["user_id"],
            "event_id": g["event_id"],
            "running_value_milli": milli.groupby(g["user_id"].to_numpy()).cumsum(),
        })

    # gate on the PRE-filter footer count (conservative upper bound)
    return coarse_partition_apply(ds, running_part, key_col="user_id",
                                  part_col="rt_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def events_sliding_window(sf_dir: str):
    """3-ROW moving sum per event_type over the hourly aggregate, ordered by
    hour_bucket — i.e. SQL ``ROWS BETWEEN 2 PRECEDING AND CURRENT ROW``
    semantics (matches the oracle exactly). NOTE: rows-based, not
    range-based — if an event_type has empty hours the window spans more
    than 3 wall-clock hours; densify the hourly grid or range-bound on
    ``hour_bucket >= current-2`` for true time-window semantics.
    (Windowed-aggregate composition: distributed pre-agg → per-type sorted
    window; exact integer arithmetic via cumsum difference, not float
    rolling.)"""
    hourly = events_hourly(sf_dir)

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour_bucket").reset_index(drop=True)
        cs = g["sum_value_milli"].cumsum()
        w3 = cs - cs.shift(3, fill_value=0)
        return pd.DataFrame({
            "event_type": g["event_type"],
            "hour_bucket": g["hour_bucket"],
            "window3_value_milli": w3.astype("int64"),
        })

    return hourly.groupby("event_type").map_groups(window, batch_format="pandas")


def events_asof(sf_dir: str, mark_type: str = "purchase", num_parts: int = 64):
    """Backward AS-OF JOIN of the event stream against its own marker
    sub-stream: for every event, the epoch-µs timestamp of the same user's
    most recent ``mark_type`` event at or before it (inclusive; ties broken
    by event_id), NULL if none yet — i.e. the generic
    last-known-value-at-time operator Ray Data has no primitive for.

    Composition (custom-operator contract): coarse crc32(user) partition →
    ONE vectorized kernel per partition (sort by (user, ts, event_id),
    mark rows carry their own ts, grouped forward-fill). Partitioning
    assumption: the ``by`` key (user) never spans partitions, so the fill
    never needs cross-partition state. The marker stream rides the same
    shuffle as the probe stream — no second exchange.
    """
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = ts_int_us(g["ts"])
        # float64 is exact for integer µs < 2^53 (~year 2255) — safe carrier
        mark = np.where(g["event_type"].to_numpy() == mark_type,
                        ts_us.astype(np.float64), np.nan)
        filled = pd.Series(mark).groupby(g["user_id"].to_numpy()).ffill()
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "last_mark_ts_us": filled.round().astype("Int64").to_numpy(),
        })

    return coarse_partition_apply(ds, kernel, key_col="user_id",
                                  part_col="asof_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def events_range_join(sf_dir: str, mark_type: str = "purchase",
                      window_us: int = 3_600_000_000, num_parts: int = 64):
    """RANGE (interval) JOIN of the event stream against itself: for every
    ``mark_type`` event, the number of the same user's events (any type)
    with ts in the half-open window [ts − window, ts) — "activity in the
    hour leading up to each purchase". The second custom-operator family
    Ray Data has no primitive for (equality key + range predicate).

    Composition (same partitioning contract as events_asof): coarse
    crc32(user) partition → ONE vectorized kernel per partition. Inside a
    partition the probe and build sides are the SAME sorted array — each
    user's rows are contiguous, so both window endpoints resolve with two
    np.searchsorted calls over a composite (user_code, rel_ts) int64 key:
    code·SPAN + rel with SPAN > rel_max + window guarantees a probe's
    lower bound can never reach into the previous user's band; user-code
    slices rebase the key whenever code·SPAN would exceed int64 (slices
    are independent — windows never cross users). No per-user Python
    loop, no second exchange, O(n log n) per partition.
    """
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = ts_int_us(g["ts"])
        codes = pd.factorize(g["user_id"].to_numpy())[0].astype(np.int64)
        rel = ts_us - ts_us.min()
        span = int(rel.max()) + window_us + 2
        is_mark = g["event_type"].to_numpy() == mark_type
        # codes*span must stay < 2^63 — with many users over a wide time
        # range it wouldn't (e.g. 400k users × a 1-year span ≈ 1.3e19; a
        # silent int64 wrap would unsort `comp` and searchsorted would
        # return garbage). Process user-code slices so each slice's
        # rebased composite key provably fits; windows never cross users,
        # so slices are independent and the concatenated result is exact.
        codes_per_slice = max(1, (np.iinfo(np.int64).max - span) // span)
        counts = []
        for base in range(0, int(codes[-1]) + 1, int(codes_per_slice)):
            sl = (codes >= base) & (codes < base + codes_per_slice)
            comp = (codes[sl] - base) * np.int64(span) + rel[sl]
            probe = comp[is_mark[sl]]
            lo = np.searchsorted(comp, probe - window_us, side="left")
            hi = np.searchsorted(comp, probe, side="left")  # strict: < p.ts
            counts.append(hi - lo)
        n_prior = (np.concatenate(counts) if counts
                   else np.zeros(0, dtype=np.int64))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[is_mark],
            "user_id": g["user_id"].to_numpy()[is_mark],
            "n_prior_events": n_prior.astype(np.int64),
        })

    return coarse_partition_apply(ds, kernel, key_col="user_id",
                                  part_col="rj_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def hash_sample(sf_dir: str, pct: int = 10):
    """Deterministic hash sampling (§2.6 sampling operator): keep rows whose
    md5(doc_id) bucket mod 100 < pct — reproducible across runs/engines
    (unlike random_shuffle/random sample), embarrassingly parallel, no
    shuffle. The bucket rule is the shared ``md5_bucket_100`` (one source
    of truth with source_mix and the train/test split)."""
    from ..functions.hashing import md5_bucket_100

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def kernel(batch: pa.Table) -> pa.Table:
        keep = [b < pct
                for b in md5_bucket_100(batch.column("doc_id").to_pylist())]
        return batch.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def dataset_split(sf_dir: str, *, train_pct: int = 80, val_pct: int = 10):
    """Three-way train/val/test split labels (§2.6 sampling family): every
    doc gets a deterministic split from the house ``md5_bucket_100`` rule
    (bucket < train_pct → 'train', < train_pct+val_pct → 'val', else
    'test') — the standard LLM-corpus holdout assignment. Reproducible
    across runs AND engines (unlike random splits), embarrassingly
    parallel, zero shuffle: a slim id-only scan with a per-batch bucket
    map, so at 100 TB the split is a free column stamped during any
    other pass. Returns full (doc_id, split) membership so the oracle
    value-gates every single assignment, not just the split sizes."""
    from ..functions.hashing import md5_bucket_100

    lo, hi = train_pct, train_pct + val_pct
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def kernel(batch: pa.Table) -> pa.Table:
        buckets = md5_bucket_100(batch.column("doc_id").to_pylist())
        split = ["train" if b < lo else ("val" if b < hi else "test")
                 for b in buckets]
        return batch.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(kernel, batch_format="pyarrow")


def weighted_sample(sf_dir: str, *, k: int = 100,
                    weight_col: str = "n_chars"):
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield, Lund & Thorup 2007 — public method): each row draws
    priority = w / u with u = md5_u64(doc_id) + 1 standing in for the
    uniform draw; the k highest priorities are the sample. Heavier docs
    are proportionally likelier to be kept, yet the draw is reproducible
    across runs AND engines (the house md5 rule), unlike random_sample.

    The priority is one correctly-rounded IEEE-double op chain
    (uint64→double cast, +1.0, divide) identical in numpy and DuckDB, so
    the oracle replays it bit-for-bit; ties break by doc_id. Shape: slim
    (id, weight) scan — text never read — vectorized priorities, then
    the bounded two-level :func:`topk` (per-block top-k, ≤ blocks×k
    survivors merge once): no shuffle, no full sort, at any scale."""
    from ..functions.hashing import md5_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", weight_col])

    def pri(batch: pa.Table) -> pa.Table:
        h = md5_u64(batch.column("doc_id").to_pylist()).astype(np.float64)
        w = batch.column(weight_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return batch.append_column(
            "priority", pa.array(w / (h + 1.0), type=pa.float64()))

    out = topk(ds.map_batches(pri, batch_format="pyarrow"),
               by=["priority", "doc_id"], descending=[True, False], k=k)
    return out.map_batches(lambda b: b.drop_columns(["priority"]),
                           batch_format="pyarrow")


def collect_distinct_sorted(ds, *, key: str, value_col: str,
                            out_col: str, sep: str = ",",
                            num_parts: int = 64, nrows: int | None = None):
    """Collect/string-agg: the distinct values of ``value_col`` per key,
    sorted and joined with ``sep`` (the list-aggregation wide op, encoded
    as a string so results stay hashable/sortable for oracle comparison).

    Shape: per-batch DISTINCT (key, value) pre-aggregation — the exchange
    carries each pair once per block, not once per row — then the house
    coarse key partition with one vectorized sort+groupby-join kernel.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[key, value_col]].drop_duplicates()

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part[[key, value_col]].drop_duplicates().sort_values(
            [key, value_col], kind="mergesort")
        agg = part.groupby(key, sort=False, dropna=False)[value_col].agg(
            lambda v: sep.join(v.astype(str)))
        return agg.rename(out_col).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    return coarse_partition_apply(partials, kernel, key_col=key,
                                  part_col="cds_part", num_parts=num_parts,
                                  nrows=nrows)


def user_event_types(sf_dir: str):
    """Per user: the sorted distinct event types they produced, CSV."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return collect_distinct_sorted(ds, key="user_id",
                                   value_col="event_type",
                                   out_col="types_csv",
                                   nrows=_table_nrows(sf_dir, "events"))


def token_budget_mix(sf_dir: str, budget_tokens: int = 20_000,
                     num_parts: int = 16):
    """Mixture selection to a TOKEN BUDGET: per source, take documents in
    deterministic md5(doc_id)-rank order until the source's cumulative
    token count would exceed the budget — "build an N-token-per-source
    mix", the budgeted form of :func:`source_mix`'s rate sampling.

    Shape: one full-data pass computes slim (doc_id, source, n_tokens,
    rank) rows — the text never leaves the scan — then ONE exchange keyed
    on source and a per-partition sort+cumsum kernel. Selected ids can
    recover payloads via the house semi-join (dedup.py). Deterministic
    across runs/engines: rank is the md5-uint64 of the stringified id,
    ties broken by doc_id.
    """
    from ..functions.hashing import md5_u64
    from ..functions.textstats import token_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def slim(batch: pa.Table) -> pa.Table:
        # Arrow in: hash ids from their LOGICAL int form (a pandas batch
        # would dilute int64-with-nulls to float64 and hash '8.0'), and
        # drop null ids — they have no rank (oracle filters them too).
        # Contract: null text = 0 tokens (the oracle coalesces to match).
        if batch.column("doc_id").null_count:
            batch = batch.filter(pc.is_valid(batch.column("doc_id")))
        ids = batch.column("doc_id").to_pylist()
        texts = pd.Series(batch.column("text").to_pylist(), dtype=object)
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "source": batch.column("source"),
            "n_tokens": pa.array(np.asarray(token_count(texts),
                                            dtype=np.int64)),
            "rank": pa.array(md5_u64(ids), type=pa.uint64()),
        })

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["source", "rank", "doc_id"],
                                kind="mergesort")
        cum = part.groupby("source", sort=False,
                           dropna=False)["n_tokens"].cumsum()
        keep = cum <= budget_tokens
        out = part.loc[keep, ["doc_id", "source", "n_tokens"]].copy()
        out["cum_tokens"] = cum[keep].astype("int64")
        return out

    slim_ds = ds.map_batches(slim, batch_format="pyarrow")
    return coarse_partition_apply(slim_ds, kernel, key_col="source",
                                  part_col="tbm_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "documents"))


def source_mix(sf_dir: str, rates: dict[str, int] | None = None,
               default_pct: int = 0):
    """Deterministic per-source mixture sampling — the data-mixing
    primitive of training-data curation (sample each domain/source at its
    own rate, e.g. upweight books, downsample crawl). Keep a row iff
    md5(doc_id) % 100 < rates[source]; unknown sources fall back to
    ``default_pct``. Reproducible across runs/engines, embarrassingly
    parallel, no shuffle — the rates map is a tiny constant shipped in the
    task closure (NOT re-sent per batch: Ray pickles the closure once per
    task, and the map is O(n_sources))."""
    from ..functions.hashing import md5_bucket_100

    if rates is None:
        # default mix: source "srcN" sampled at N·5 % (src0 dropped
        # entirely — a zero-rate source is a legitimate mixing decision)
        rates = {f"src{i}": i * 5 for i in range(20)}

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def kernel(batch: pa.Table) -> pa.Table:
        buckets = md5_bucket_100(batch.column("doc_id").to_pylist())
        srcs = batch.column("source").to_pylist()
        keep = [b < rates.get(s, default_pct)
                for b, s in zip(buckets, srcs)]
        return batch.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


def temperature_mix(sf_dir: str, *, key: str = "lang",
                    budget_docs: int = 300):
    """Temperature-based mixture allocation at α = 1/2 — the standard
    multilingual/multi-source rebalancing rule (sample source s with
    probability ∝ n_s^α, α < 1 flattens the natural distribution so
    small sources are upweighted; the published recipe behind
    multilingual-corpus and multi-domain training mixes). Source quotas
    are ``floor(budget · √n_s / Σ√n)`` and each source contributes its
    quota of documents in deterministic (md5-rank, doc_id) order.

    α is fixed at 1/2 because every operation in the quota formula —
    sqrt, ·, /, floor — is IEEE-754 correctly-rounded and therefore
    BIT-IDENTICAL between numpy and DuckDB, which makes the float path
    value-gateable (general n^α needs pow, whose rounding is not
    portable). The Σ√n accumulation order is pinned to source-name
    order on both sides (``sum(w ORDER BY source)`` in the oracle).

    Shape: pass 1 is a slim per-source count (associative partials →
    one tiny combine — at 100 TB the exchange is n_sources × n_blocks
    count rows); quotas are computed driver-side over the ≤ dozens of
    sources and shipped in the task closure. Pass 2 re-scans only
    (doc_id, source) and runs the bounded two-level select of
    :func:`stratified_sample`: a per-batch combiner keeps ≤ quota_s per
    source per batch, so at most n_blocks × budget slim rows reach the
    single merge task. The text column never leaves the scan; selected
    ids recover payloads via the house semi-join.
    """
    from ..functions.hashing import md5_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", key])

    def count_partial(batch: pa.Table) -> pa.Table:
        if batch.column("doc_id").null_count:
            batch = batch.filter(pc.is_valid(batch.column("doc_id")))
        g = batch.group_by(key).aggregate([("doc_id", "count")])
        return pa.table({key: g.column(key),
                         "n_docs": pc.cast(g.column("doc_id_count"),
                                           pa.int64())})

    def count_combine(b: pa.Table) -> pa.Table:
        g = b.group_by(key).aggregate([("n_docs", "sum")])
        return pa.table({key: g.column(key),
                         "n_docs": g.column("n_docs_sum")})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .repartition(1)
              .map_batches(count_combine, batch_format="pyarrow",
                           batch_size=None)
              .to_pandas())  # ≤ n_sources rows — tiny by contract
    counts = counts.sort_values(key, ignore_index=True)

    w = np.sqrt(counts["n_docs"].to_numpy(np.float64))
    total = 0.0
    for x in w:          # fixed left-to-right order == sum(ORDER BY source)
        total += float(x)
    if total == 0.0:
        quotas: dict = {}
    else:
        q = np.floor((budget_docs * w) / total).astype(np.int64)
        quotas = dict(zip(counts[key], q))

    def add_rank(batch: pa.Table) -> pa.Table:
        if batch.column("doc_id").null_count:
            batch = batch.filter(pc.is_valid(batch.column("doc_id")))
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            key: batch.column(key),
            "tm_rank": pa.array(md5_u64(ids), type=pa.uint64()),
        })

    def keep_quota(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "tm_rank", "doc_id"],
                            kind="mergesort")
        rn = df.groupby(key, sort=False).cumcount().to_numpy()
        lim = df[key].map(quotas).fillna(0).to_numpy(np.int64)
        return df.loc[rn < lim]

    local = ds.map_batches(add_rank, batch_format="pyarrow").map_batches(
        keep_quota, batch_format="pandas")
    merged = local.repartition(1).map_batches(keep_quota,
                                              batch_format="pandas",
                                              batch_size=None)
    return merged.map_batches(lambda b: b.select(["doc_id", key]),
                              batch_format="pyarrow")


def event_type_distinct(sf_dir: str, num_parts: int = 64):
    """Distinct event types per user (set-op/unique operator exercise):
    per-batch dedup combiner → coarse user-hash partition → vectorized
    per-partition drop_duplicates + C-speed groupby nunique."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.drop_duplicates().copy()
        return out

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        out = g.groupby("user_id", as_index=False).agg(
            n_event_types=("event_type", "nunique"))
        out["n_event_types"] = out["n_event_types"].astype("int64")
        return out

    deduped = ds.map_batches(partial, batch_format="pandas")
    return coarse_partition_apply(deduped, per_partition, key_col="user_id",
                                  part_col="et_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def stratified_sample(sf_dir: str, *, key: str = "lang", k: int = 20):
    """Deterministic stratified sampling (§2.6 sampling family): the k rows
    with the smallest (md5-rank, doc_id) per ``key`` group — reproducible
    across runs and engines, unlike random sampling.

    Two-level shape (same as ``topk``): a per-batch combiner keeps ≤ k rows
    per key per batch, so at most n_blocks × n_keys × k slim rows reach the
    single bounded merge task — the merge re-runs the SAME kernel, which is
    partition-shape-independent (sorts by the real key internally). No key
    exchange at any size.
    """
    import hashlib

    ds = _read(sf_dir, "documents", columns=["doc_id", key])

    def add_rank(batch: pa.Table) -> pa.Table:
        # md5 per row for DuckDB-oracle parity (same idiom as hash_sample)
        _md5 = hashlib.md5
        ranks = [int.from_bytes(_md5(str(i).encode()).digest()[:8], "big")
                 for i in batch.column("doc_id").to_pylist()]
        return batch.append_column("smp_rank", pa.array(ranks, type=pa.uint64()))

    def keep_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "smp_rank", "doc_id"], kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    local = ds.map_batches(add_rank, batch_format="pyarrow").map_batches(
        keep_k, batch_format="pandas")
    merged = local.repartition(1).map_batches(keep_k, batch_format="pandas",
                                              batch_size=None)
    return merged.map_batches(
        lambda b: b.select(["doc_id", key]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distinct set operations (INTERSECT / EXCEPT / UNION DISTINCT) on a key
# ---------------------------------------------------------------------------

def set_op(ds_a, ds_b, *, key: str, how: str, num_parts: int = 32,
           nrows: int | None = None):
    """Distinct set operation between two datasets on one key column.

    Shape: per-batch distinct + a presence bit per side (A=1, B=2) → the
    exchange carries only DISTINCT keys (slim, pre-deduped inside every
    batch) → coarse key-hash partition → one vectorized bit-OR kernel per
    partition → membership filter.  ``intersect`` keeps keys with both
    bits (3), ``except`` keys seen only on side A (1), ``union`` any.
    Nothing payload-sized ever shuffles and no sort runs at any size; the
    all-to-all is bounded by distinct(key) × blocks.
    """
    if how not in ("intersect", "except", "union"):
        raise ValueError(f"how must be intersect/except/union, got {how!r}")

    def tag(bit: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = pc.unique(batch.column(key))
            return pa.table({key: k,
                             "side_bits": pa.array(
                                 np.full(len(k), bit, dtype=np.int64))})
        return fn

    both = ds_a.map_batches(tag(1), batch_format="pyarrow").union(
        ds_b.map_batches(tag(2), batch_format="pyarrow"))
    want = {"union": (1, 2, 3), "intersect": (3,), "except": (1,)}[how]

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # one row per (key, side) then a plain sum: bits ∈ {1,2} so the
        # sum IS the bitwise OR — fully vectorized, no per-key Python.
        # dropna=False: SQL set ops treat NULL keys as equal to each other
        u = g.drop_duplicates([key, "side_bits"])
        bits = u.groupby(key, as_index=False, dropna=False)["side_bits"].sum()
        return bits[bits["side_bits"].isin(want)][[key]].reset_index(drop=True)

    return coarse_partition_apply(both, kernel, key_col=key,
                                  part_col="set_part", num_parts=num_parts,
                                  nrows=nrows)


def _orders_cust_slice(sf_dir: str, status: str):
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    return ds.map_batches(
        lambda b, st=status: b.filter(
            pc.equal(b.column("o_orderstatus"), st)).select(["o_custkey"]),
        batch_format="pyarrow")


def custkeys_f_and_o(sf_dir: str):
    """INTERSECT: custkeys with BOTH a finished and an open order."""
    return set_op(_orders_cust_slice(sf_dir, "F"),
                  _orders_cust_slice(sf_dir, "O"),
                  key="o_custkey", how="intersect",
                  nrows=_table_nrows(sf_dir, "orders"))


def custkeys_f_not_o(sf_dir: str):
    """EXCEPT: custkeys with a finished order but NO open order."""
    return set_op(_orders_cust_slice(sf_dir, "F"),
                  _orders_cust_slice(sf_dir, "O"),
                  key="o_custkey", how="except",
                  nrows=_table_nrows(sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Lag window: per-user inter-event gap statistics
# ---------------------------------------------------------------------------

def events_gaps(sf_dir: str, num_parts: int = 64):
    """Per-user inter-event gap stats — the lag()-window family: for every
    user with ≥2 events, the number of gaps, total and max gap in µs.

    Same coarse user-hash partition + one vectorized kernel as
    ``events_sessions`` (a per-user map_groups costs ~ms/key).  Gaps are
    diffs of the (ts, event_id)-sorted sequence, so ties are deterministic
    and the µs sums are exact int64 — order-independent for the oracle.
    """
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def gaps_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = ts_int_us(g["ts"])
        uid = g["user_id"].to_numpy()
        same = np.r_[False, uid[1:] == uid[:-1]]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        df = pd.DataFrame({"user_id": uid[same], "gap_us": gap[same]})
        out = df.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_us", "size"), sum_gap_us=("gap_us", "sum"),
            max_gap_us=("gap_us", "max"))
        out["n_gaps"] = out["n_gaps"].astype("int64")
        return out

    return coarse_partition_apply(ds, gaps_part, key_col="user_id",
                                  part_col="gap_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


# ---------------------------------------------------------------------------
# TPC-H Q5-style local-supplier-volume: a six-table join composition
# ---------------------------------------------------------------------------

def nation_revenue(sf_dir: str, region: str = "ASIA",
                   date_lo: str = "1996-01-01", date_hi: str = "1997-01-01",
                   num_buckets: int = 16, broadcast_limit: int = 2_000_000):
    """Revenue per nation where the customer and the line's supplier share
    a nation inside ``region``, for orders in ``[date_lo, date_hi)`` —
    TPC-H Q5 re-expressed as a Ray Data composition:

    * region ⋈ nation (tiny dims) join on the DRIVER → a nationkey→name
      map, broadcast by closure (≤25 entries);
    * supplier → a sorted (s_suppkey → s_nationkey) array pair,
      ``ray.put`` ONCE and searchsorted per batch (TPC-H supplier is
      1e-4 of lineitem; at 10^12 lines that is ~10^8 × 16 B ≈ 1.6 GB —
      borderline but object-store-resident and read per actor, never
      re-shipped; past that, swap this stage for a third
      ``hash_join``);
    * the two BIG joins — orders(filtered) ⋈ customer(filtered) on
      custkey, lineitem ⋈ that on orderkey — are bucket hash joins, the
      only all-to-all exchanges, both over pre-projected slim columns;
      below ``broadcast_limit`` orders rows the joined (o_orderkey →
      cust_nation) pair array broadcasts instead and the query is ONE
      zero-shuffle lineitem pass (the customer_order_revenue two-path
      gate);
    * revenue partial-aggregates per nationkey inside map_batches, so the
      final merge sees ≤ 25 × blocks rows on one block.
    """
    nation = _read(sf_dir, "nation").to_pandas()
    regiondf = _read(sf_dir, "region").to_pandas()
    rkeys = regiondf.loc[regiondf["r_name"] == region, "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nation_names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    nat_keys = np.array(sorted(nation_names), dtype=np.int64)

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(sk, kind="stable")
    sup_ref = ray.put((sk[order],
                       sup["s_nationkey"].to_numpy(np.int64)[order]))

    lo_us = int(pd.Timestamp(date_lo).value // 1000)
    hi_us = int(pd.Timestamp(date_hi).value // 1000)

    def orders_slim(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
                    pa.int64())
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo_us)),
                       pc.less(d, pa.scalar(hi_us)))
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]
                   ).map_batches(orders_slim, batch_format="pyarrow")

    def cust_slim(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("c_nationkey"),
                        value_set=pa.array(nat_keys, type=pa.int64()))
        t = batch.filter(keep)
        return pa.table({"o_custkey": t.column("c_custkey"),
                         "cust_nation": t.column("c_nationkey")})

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
                 ).map_batches(cust_slim, batch_format="pyarrow")

    def li_slim(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return pa.table({"o_orderkey": batch.column("l_orderkey"),
                         "l_suppkey": batch.column("l_suppkey"),
                         "revenue_cents": _cents(rev)})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]
               ).map_batches(li_slim, batch_format="pyarrow")

    empty = pa.table({"nationkey": pa.array([], type=pa.int64()),
                      "revenue_cents": pa.array([], type=pa.int64())})

    def nation_partial(batch: pa.Table, nat_vals: np.ndarray,
                       hit: np.ndarray) -> pa.Table:
        # shared tail of both paths: rows surviving the local-supplier
        # predicate partial-aggregate per nationkey
        if not hit.any():
            return empty
        df = pd.DataFrame({
            "nationkey": nat_vals[hit],
            "revenue_cents": batch.column("revenue_cents").to_numpy(
                zero_copy_only=False)[hit]})
        g = df.groupby("nationkey", as_index=False)["revenue_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("nationkey", as_index=False)["revenue_cents"].sum()
        g["n_name"] = g["nationkey"].map(nation_names)
        g = g.sort_values(["revenue_cents", "n_name"],
                          ascending=[False, True], ignore_index=True)
        return g[["n_name", "revenue_cents"]].astype({"revenue_cents": "int64"})

    if _table_nrows(sf_dir, "orders") <= broadcast_limit:
        # broadcast fast path (same gate/idiom as customer_order_revenue):
        # the date-filtered orders slice merged with the region's customers
        # is an (o_orderkey → cust_nation) pair array — ray.put ONCE, and
        # the whole query becomes ONE streaming lineitem pass with ZERO
        # shuffles (two fixed ~2 s sort exchanges saved; measured 11.3 s →
        # broadcast at sf0.1).
        odf = orders.to_pandas()
        cdf = cust.to_pandas()
        if "o_custkey" not in odf.columns or "o_custkey" not in cdf.columns:
            j = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                              "cust_nation": pd.Series(dtype="int64")})
        else:
            j = odf.merge(cdf, on="o_custkey")
        okey = j["o_orderkey"].to_numpy(np.int64)
        oorder = np.argsort(okey, kind="stable")
        ord_ref = ray.put((okey[oorder],
                           j["cust_nation"].to_numpy(np.int64)[oorder]))

        def li_resolve(batch: pa.Table) -> pa.Table:
            ok_, cnat_ = ray.get(ord_ref)
            sk_, snat_ = ray.get(sup_ref)
            if batch.num_rows == 0 or len(ok_) == 0 or len(sk_) == 0:
                return empty
            lok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            oidx, ohit = _ss_match(ok_, lok)
            lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            sidx, shit = _ss_match(sk_, lsk)
            hit = ohit & shit & (snat_[sidx] == cnat_[oidx])
            return nation_partial(batch, snat_[sidx], hit)

        partials = li.map_batches(li_resolve, batch_format="pyarrow",
                                  batch_size=131072)
        return partials.repartition(1).map_batches(
            combine, batch_format="pandas", batch_size=None)

    j1 = hash_join(
        orders, cust, key="o_custkey", num_buckets=num_buckets,
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
        right_types={"o_custkey": pa.int64(), "cust_nation": pa.int64()})

    j2 = hash_join(
        li, j1.select_columns(["o_orderkey", "cust_nation"]),
        key="o_orderkey", num_buckets=num_buckets,
        left_types={"o_orderkey": pa.int64(), "l_suppkey": pa.int64(),
                    "revenue_cents": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "cust_nation": pa.int64()})

    def resolve_partial(batch: pa.Table) -> pa.Table:
        # local-supplier predicate: line's supplier nation == customer
        # nation (searchsorted against the broadcast map — plasma-local
        # after the first get, same idiom as customer_order_revenue)
        sk_, snat_ = ray.get(sup_ref)
        if batch.num_rows == 0 or len(sk_) == 0:
            return empty
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sidx, shit = _ss_match(sk_, lsk)
        cnat = batch.column("cust_nation").to_numpy(zero_copy_only=False).astype(np.int64)
        hit = shit & (snat_[sidx] == cnat)
        return nation_partial(batch, snat_[sidx], hit)

    partials = j2.map_batches(resolve_partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(combine, batch_format="pandas",
                                               batch_size=None)


# ---------------------------------------------------------------------------
# Distributed window rank() — two-pass, no global sort
# ---------------------------------------------------------------------------

def ranked_by_value(make_ds, *, group_col: str, value_col: str,
                    out_cols: list[str], shift: int = 12,
                    num_parts: int = 64, nrows: int | None = None,
                    small_limit: int = _COALESCE_ROW_LIMIT,
                    dense: bool = False):
    """SQL ``rank()`` (default) or ``dense_rank()`` (``dense=True``)
    ``OVER (PARTITION BY group ORDER BY value)`` over an INTEGER value
    column, with no global sort:

    * pass 1 — below-bucket offsets per (group, coarse value range
      ``bucket = value >> shift``): for rank(), per-batch ROW counts and
      a tiny tree combine; for dense_rank(), DISTINCT (group, bucket,
      value) triples co-located by (group,bucket) hash and counted — the
      distinct-value exchange is the information floor for dense
      ranking.  Either way the driver holds only
      O(groups × value_range / 2^shift) offset rows, ``ray.put``
      broadcast;
    * pass 2 — rows hash-partition by (group, bucket) (equal values
      share a bucket BY CONSTRUCTION, so neither ties nor distinct
      counts straddle partitions) → one vectorized kernel: the
      within-bucket index is the sorted first-occurrence position
      (rank) or the running count of value changes (dense), plus the
      broadcast offset.

    ``make_ds`` is a zero-arg factory: the input streams TWICE (the
    classic two-pass distributed rank) instead of being materialized —
    a re-read of pruned parquet beats pinning the projection at 10^12
    rows.  Skew: a value-concentrated (group, bucket) lands on one
    kernel; lower ``shift`` (finer buckets) to split it.

    Below ``small_limit`` input rows (``nrows`` free from parquet
    footers) the whole set coalesces to one block and a direct
    groupby-rank runs once — no offsets pass, no exchange (the repo's
    standard size gate; each Ray sort/groupby exchange is ~2 s of fixed
    barrier cost).
    """
    method = "dense" if dense else "min"

    def small_path():
        def small_kernel(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["rnk"] = (df.groupby(group_col)[value_col]
                         .rank(method=method).astype("int64"))
            return df[out_cols + ["rnk"]]

        return make_ds().repartition(1).map_batches(
            small_kernel, batch_format="pandas", batch_size=None)

    if nrows is not None and 0 < nrows <= small_limit:
        return small_path()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_rb_bucket"] = df[value_col].to_numpy(np.int64) >> shift
        pair_hash = pd.util.hash_pandas_object(
            df[[group_col, "_rb_bucket"]], index=False).to_numpy()
        df["_rb_part"] = (pair_hash % num_parts).astype("int64")
        return df

    if dense:
        # distinct triples, co-located so cross-batch dedup is exact
        def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
            df = add_part(df)
            return df[[group_col, "_rb_bucket", "_rb_part", value_col]
                      ].drop_duplicates()

        def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
            u = g.drop_duplicates([group_col, "_rb_bucket", value_col])
            out = u.groupby([group_col, "_rb_bucket"], as_index=False).size()
            return out.rename(columns={"size": "_rb_n"})

        counts = (make_ds().map_batches(distinct_partial,
                                        batch_format="pandas")
                  .groupby("_rb_part")
                  .map_groups(count_distinct,
                              batch_format="pandas")).to_pandas()
    else:
        def count_partial(df: pd.DataFrame) -> pd.DataFrame:
            b = df[value_col].to_numpy(np.int64) >> shift
            return (pd.DataFrame({group_col: df[group_col], "_rb_bucket": b})
                    .groupby([group_col, "_rb_bucket"], as_index=False)
                    .size().rename(columns={"size": "_rb_n"}))

        def count_merge(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby([group_col, "_rb_bucket"],
                              as_index=False)["_rb_n"].sum()

        counts = (make_ds().map_batches(count_partial, batch_format="pandas")
                  .repartition(8).map_batches(count_merge,
                                              batch_format="pandas",
                                              batch_size=None)
                  .repartition(1).map_batches(count_merge,
                                              batch_format="pandas",
                                              batch_size=None)).to_pandas()

    if len(counts) == 0 or group_col not in counts.columns:
        # an all-empty input loses its pandas schema entirely (generic
        # Ray empty-to_pandas behavior) — rank it on the direct path
        return small_path()
    counts = counts.sort_values([group_col, "_rb_bucket"], ignore_index=True)
    # offset below bucket b = group-cumulative count minus own bucket
    cum = counts.groupby(group_col)["_rb_n"].cumsum() - counts["_rb_n"]
    off_df = counts.assign(_rb_off=cum.astype("int64"))[
        [group_col, "_rb_bucket", "_rb_off"]]
    off_ref = ray.put(off_df)

    def rank_kernel(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.merge(off, on=[group_col, "_rb_bucket"], how="left")
        g["_rb_off"] = g["_rb_off"].fillna(0).astype("int64")
        g = g.sort_values([group_col, "_rb_bucket", value_col],
                          kind="mergesort", ignore_index=True)
        n = len(g)
        if n == 0:
            return g.assign(rnk=pd.Series(dtype="int64"))[out_cols + ["rnk"]]
        gb_change = ((g[group_col] != g[group_col].shift())
                     | (g["_rb_bucket"] != g["_rb_bucket"].shift())).to_numpy()
        val_change = gb_change | (g[value_col] != g[value_col].shift()).to_numpy()
        pos = np.arange(n)
        bstart = np.maximum.accumulate(np.where(gb_change, pos, 0))
        if dense:
            c = np.cumsum(val_change.astype(np.int64))
            within = c - c[bstart]
        else:
            first = np.maximum.accumulate(np.where(val_change, pos, 0))
            within = first - bstart
        g["rnk"] = g["_rb_off"].to_numpy() + within + 1
        return g[out_cols + ["rnk"]]

    return (make_ds().map_batches(add_part, batch_format="pandas")
            .groupby("_rb_part").map_groups(rank_kernel, batch_format="pandas"))


def orders_price_rank(sf_dir: str):
    """Every order's rank() by price cents within its priority class —
    the distributed-window-function showcase for ``ranked_by_value``."""

    def make_ds():
        ds = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": batch.column("o_orderkey"),
                "o_orderpriority": batch.column("o_orderpriority"),
                "price_cents": _cents(batch.column("o_totalprice"))})

        return ds.map_batches(prep, batch_format="pyarrow")

    return ranked_by_value(
        make_ds, group_col="o_orderpriority", value_col="price_cents",
        out_cols=["o_orderkey", "o_orderpriority", "price_cents"],
        nrows=_table_nrows(sf_dir, "orders"))


def pricing_cube(sf_dir: str):
    """``GROUP BY CUBE(l_returnflag, l_linestatus)``: all four grain
    levels — both keys, each key alone, grand total — null-filled like
    SQL CUBE.  Same shape as ``pricing_rollup``: one full-data pass of
    finest-grain partials; every coarser level re-aggregates the tiny
    base result inside the single merge task."""
    keys = ["l_returnflag", "l_linestatus"]
    ds = _read(sf_dir, "lineitem", columns=keys + ["l_quantity"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        # np.rint = half-to-even = DuckDB's DOUBLE→BIGINT cast semantics
        batch = batch.assign(
            q=np.rint(batch["l_quantity"].to_numpy(np.float64)).astype("int64"))
        agg = batch.groupby(keys, as_index=False).agg(
            sum_qty=("q", "sum"), n_rows=("q", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        spec = {"sum_qty": ("sum_qty", "sum"), "n_rows": ("n_rows", "sum")}
        base = part.groupby(keys, as_index=False).agg(**spec)
        levels = [base]
        for keep in (keys[:1], keys[1:]):  # each single-key slice
            lvl = base.groupby(keep, as_index=False).agg(**spec)
            for dropped in keys:
                if dropped not in keep:
                    lvl[dropped] = None
            levels.append(lvl)
        levels.append(pd.DataFrame({keys[0]: [None], keys[1]: [None],
                                    "sum_qty": [base["sum_qty"].sum()],
                                    "n_rows": [base["n_rows"].sum()]}))
        out = pd.concat(levels, ignore_index=True)
        out["sum_qty"] = out["sum_qty"].astype("int64")
        out["n_rows"] = out["n_rows"].astype("int64")
        return out[keys + ["sum_qty", "n_rows"]]

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.repartition(1).map_batches(combine, batch_format="pandas",
                                               batch_size=None)


def shuffle_shards(sf_dir: str, n_shards: int = 16):
    """Deterministic training-export shuffle: every document gets a
    (shard, rank-within-shard) position derived ONLY from md5(doc_id) —
    stable across runs, resumable per shard, no ``random_shuffle``
    all-to-all.  Shard = md5 bits 96-127 mod ``n_shards`` (disjoint from
    the percent-bucket slice too, so bucket-filtered corpora still shard
    uniformly); the within-shard order ranks a DIFFERENT 60-bit md5
    slice (bits 32-92), so shard choice and intra-shard order are
    independent.  The rank is
    the two-pass distributed window rank (``ranked_by_value``) — the
    only exchange is the slim (doc_id, shard, rank-value) projection.
    A training job reads shard files in rank order and gets a uniform
    global permutation.  Rank uniqueness rests on the 60-bit slice:
    collision-free at test scale, widen past ~10^8 docs per shard
    (``functions/hashing.md5_order_i60``)."""

    def make_ds():
        ds = _read(sf_dir, "documents", columns=["doc_id"])

        def prep(batch: pa.Table) -> pa.Table:
            from ..functions.hashing import md5_order_i60, md5_shard
            ids = batch.column("doc_id").to_pylist()
            return pa.table({"doc_id": batch.column("doc_id"),
                             "shard": pa.array(md5_shard(ids, n_shards)),
                             "shuffle_rank": pa.array(md5_order_i60(ids))})

        return ds.map_batches(prep, batch_format="pyarrow")

    return ranked_by_value(
        make_ds, group_col="shard", value_col="shuffle_rank",
        out_cols=["doc_id", "shard"], shift=48,
        num_parts=max(n_shards, 16),
        nrows=_table_nrows(sf_dir, "documents"))


def range_window_sums(keys: np.ndarray, vals: np.ndarray,
                      window: int) -> np.ndarray:
    """RANGE-frame moving sum over a SORTED integer key series: for each
    position, the sum of vals whose key lies in ``[key-(window-1), key]``
    — cumsum + searchsorted, O(n log n), no per-row Python."""
    cs = np.concatenate(([0], np.cumsum(vals)))
    lo = np.searchsorted(keys, keys - (window - 1), "left")
    return cs[1:] - cs[lo]


def events_moving_range(sf_dir: str, window_hours: int = 3):
    """RANGE-framed moving count per event type: for every (type, hour)
    the number of events in hours ``[h-(w-1), h]`` BY TIME VALUE — unlike
    ``events_sliding_window`` (ROWS frame), gaps in the hour sequence
    shrink the window, matching SQL ``RANGE BETWEEN w-1 PRECEDING``.

    Shape: the full-data pass is the events_hourly partial (one row per
    (type, hour) per batch); the windowing runs over the AGGREGATED
    hourly series — bounded by types × distinct hours (a decade of hours
    is <100k rows) — as one vectorized cumsum + searchsorted kernel per
    type, grouped inside a single coalesced block.  No row-level
    exchange at any scale.
    """
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "hour_bucket": _hour_bucket_us(batch.column("ts"))})
        g = t.group_by(["event_type", "hour_bucket"]).aggregate(
            [("hour_bucket", "count", pc.CountOptions(mode="all"))])
        return pa.table({"event_type": g.column("event_type"),
                         "hour_bucket": g.column("hour_bucket"),
                         "n_events": pc.cast(g.column("hour_bucket_count"),
                                             pa.int64())})

    def window_kernel(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["event_type", "hour_bucket"], as_index=False)[
            "n_events"].sum()
        agg = agg.sort_values(["event_type", "hour_bucket"],
                              ignore_index=True)
        out = []
        for et, g in agg.groupby("event_type", sort=False):
            hours = g["hour_bucket"].to_numpy(np.int64)
            n = g["n_events"].to_numpy(np.int64)
            out.append(pd.DataFrame({
                "event_type": et, "hour_bucket": hours, "n_events": n,
                "moving_n": range_window_sums(hours, n, window_hours)}))
        return pd.concat(out, ignore_index=True) if out else \
            agg.assign(moving_n=pd.Series(dtype="int64"))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    return partials.repartition(1).map_batches(
        window_kernel, batch_format="pandas", batch_size=None)


def events_median_cont(sf_dir: str, num_parts: int = 16):
    """Grouped INTERPOLATED median (SQL ``quantile_cont(v, 0.5)``) per
    event type, kept integer-exact by DOUBLING: odd n → 2×middle value,
    even n → the sum of the two middle order statistics (what
    quantile_cont averages).  Same slim milli-histogram exchange as
    ``events_value_percentiles`` — the interpolation only ever touches
    the bounded per-type histogram, never row data.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def hist_partial(batch: pd.DataFrame) -> pa.Table:
        v = batch["value"].to_numpy(dtype=np.float64)
        keep = ~np.isnan(v)
        g = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy()[keep],
            "value_milli": np.floor(1000.0 * v[keep]).astype(np.int64),
        })
        agg = g.groupby(["event_type", "value_milli"], as_index=False).size()
        return pa.table({
            "event_type": pa.array(agg["event_type"], type=pa.string()),
            "value_milli": pa.array(agg["value_milli"], type=pa.int64()),
            "n": pa.array(agg["size"], type=pa.int64()),
        })

    def kernel(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, sub in part.groupby("event_type", sort=False):
            h = (sub.groupby("value_milli", as_index=False)["n"].sum()
                 .sort_values("value_milli"))
            values = h["value_milli"].to_numpy()
            cum = h["n"].to_numpy().cumsum()
            n = int(cum[-1])

            def at(k: int) -> int:  # k-th (0-based) order statistic
                return int(values[np.searchsorted(cum, k + 1)])

            x2 = at((n - 1) // 2) + at(n // 2)
            rows.append((t, n, x2))
        out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                          "median_x2_milli"])
        return out.astype({"n_events": "int64", "median_x2_milli": "int64"})

    hist = ds.map_batches(hist_partial, batch_format="pandas")
    return coarse_partition_apply(hist, kernel, key_col="event_type",
                                  part_col="emc_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def doc_ntile(sf_dir: str, k: int = 10):
    """Global ``NTILE(k)`` over documents ordered by a 60-bit md5 slice —
    equal-depth binning without a global sort: the two-pass distributed
    rank supplies each row's position, the total row count comes free
    from parquet footers, and the tile is pure arithmetic on
    (position, n, k) with DuckDB's larger-buckets-first split.

    The order key is collision-free at test scale but NOT at 10^12 rows
    (birthday bound ~2^30): a tied order key shares the min rank, so the
    colliding rows land in the same tile and the exact q/(q+1) bucket
    sizes drift by the number of collisions.  Past ~10^8 rows widen the
    slice (``functions/hashing.md5_order_i60`` docstring) before
    trusting exact bucket sizes."""
    n = _table_nrows(sf_dir, "documents")

    def make_ds():
        ds = _read(sf_dir, "documents", columns=["doc_id"])

        def prep(batch: pa.Table) -> pa.Table:
            from ..functions.hashing import md5_order_i60
            ids = batch.column("doc_id").to_pylist()
            return pa.table({"doc_id": batch.column("doc_id"),
                             "ntile_g": pa.array(np.zeros(len(ids),
                                                          dtype=np.int64)),
                             "order_rank": pa.array(md5_order_i60(ids))})

        return ds.map_batches(prep, batch_format="pyarrow")

    ranked = ranked_by_value(make_ds, group_col="ntile_g",
                             value_col="order_rank",
                             out_cols=["doc_id"], shift=48, nrows=n)
    q, r = divmod(n, k)
    big = (q + 1) * r  # rows covered by the size-(q+1) leading buckets
    qq = max(q, 1)  # q==0 (n<k): every row is in a leading bucket

    def to_tile(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rnk"].to_numpy(np.int64)
        tile = np.where(rn <= big, (rn - 1) // (q + 1),
                        r + (rn - 1 - big) // qq) + 1
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "tile": tile.astype(np.int64)})

    return ranked.map_batches(to_tile, batch_format="pandas")


def table_profile(sf_dir: str):
    """Column profile ('describe') over orders: per profiled column the
    row count, null count, min, max and exact int64 sum — the
    data-engineering sanity scan.  One streaming pass of per-batch Arrow
    aggregates (6 numbers per column per batch); the merge folds the tiny
    partial set on one block.  Money profiles as integer cents."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cols = {"o_orderkey": batch.column("o_orderkey"),
                "o_custkey": batch.column("o_custkey"),
                "o_totalprice_cents": _cents(batch.column("o_totalprice"))}
        rows = []
        for name, arr in cols.items():
            n, nn = len(arr), arr.null_count
            if n == 0:
                continue
            if n - nn == 0:
                # counts still accrue; min/max/sum are null (SQL: all-null
                # column aggregates to NULL but count(*) counts the rows)
                rows.append((name, n, nn, None, None, None))
                continue
            mm = pc.min_max(arr)
            rows.append((name, n, nn, mm["min"].as_py(), mm["max"].as_py(),
                         pc.sum(arr).as_py()))
        return pa.table({
            "col": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_null": pa.array([r[2] for r in rows], type=pa.int64()),
            "min_v": pa.array([r[3] for r in rows], type=pa.int64()),
            "max_v": pa.array([r[4] for r in rows], type=pa.int64()),
            "sum_v": pa.array([r[5] for r in rows], type=pa.int64()),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # min_count=1: a column null in EVERY batch stays NULL like SQL
        # sum(); pandas' default would fabricate 0
        out = df.groupby("col", as_index=False).agg(
            n=("n", "sum"), n_null=("n_null", "sum"), min_v=("min_v", "min"),
            max_v=("max_v", "max"),
            sum_v=("sum_v", lambda s: s.sum(min_count=1)))
        out = out.astype({"n": "int64", "n_null": "int64"})
        for c in ("min_v", "max_v", "sum_v"):
            # int64 when fully populated, float64 with NaN when any NULL —
            # DuckDB fetchdf typing for a nullable BIGINT aggregate
            if not out[c].isna().any():
                out[c] = out[c].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(merge, batch_format="pandas",
                                               batch_size=None)


def dense_ranked_by_value(make_ds, *, group_col: str, value_col: str,
                          out_cols: list[str], shift: int = 12,
                          num_parts: int = 64, nrows: int | None = None,
                          small_limit: int = _COALESCE_ROW_LIMIT):
    """``dense_rank()`` — ``ranked_by_value`` with ``dense=True`` (one
    shared two-pass engine; see its docstring for both pass shapes)."""
    return ranked_by_value(make_ds, group_col=group_col,
                           value_col=value_col, out_cols=out_cols,
                           shift=shift, num_parts=num_parts, nrows=nrows,
                           small_limit=small_limit, dense=True)


def orders_price_dense_rank(sf_dir: str):
    """dense_rank() of every order by price cents within its priority
    class — the dense sibling of ``orders_price_rank``."""

    def make_ds():
        ds = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

        def prep(batch: pa.Table) -> pa.Table:
            return pa.table({
                "o_orderkey": batch.column("o_orderkey"),
                "o_orderpriority": batch.column("o_orderpriority"),
                "price_cents": _cents(batch.column("o_totalprice"))})

        return ds.map_batches(prep, batch_format="pyarrow")

    return dense_ranked_by_value(
        make_ds, group_col="o_orderpriority", value_col="price_cents",
        out_cols=["o_orderkey", "o_orderpriority", "price_cents"],
        nrows=_table_nrows(sf_dir, "orders"))


def custkeys_f_or_o(sf_dir: str):
    """UNION DISTINCT: custkeys with a finished OR an open order —
    completes the gate-registered set-op family."""
    return set_op(_orders_cust_slice(sf_dir, "F"),
                  _orders_cust_slice(sf_dir, "O"),
                  key="o_custkey", how="union",
                  nrows=_table_nrows(sf_dir, "orders"))


def customer_distribution(sf_dir: str, *, broadcast_limit: int = 2_000_000):
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly N orders, for every N — customer LEFT JOIN orders, count per
    customer, then a count-of-counts. Output (c_count, custdist) sorted
    custdist DESC, c_count DESC; the zero bucket (customers with no
    orders) is derived WITHOUT materializing the left join: it is
    ``n_customers − Σ custdist`` — the parquet footer gives n_customers
    for free, so no customer-sized exchange ever happens.

    Two tiers on the customer footer row count:

    * under the gate: customer keys broadcast once (sorted int64 array
      via ray.put); one orders pass emits per-batch (o_custkey, n)
      partials for FK-valid rows only; ``partitioned_group_sum``
      combines them into per-customer totals.
    * above the gate: orders' custkey column semi-joins the customer
      keys (slim single-column exchange), then the same group-sum.

    The count-of-counts finish is driver-side but bounded: each block
    contributes at most one row per distinct order count (≲ a few
    hundred at any corpus scale since orders-per-customer is bounded),
    so the collected partials stay tiny even at 10^12 orders.
    """
    n_cust = _table_nrows(sf_dir, "customer")
    n_orders = _table_nrows(sf_dir, "orders")
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    out_schema = {"c_count": "int64", "custdist": "int64"}

    if n_cust <= broadcast_limit:
        cust = _read(sf_dir, "customer", columns=["c_custkey"])
        ckeys = np.sort(cust.to_pandas()["c_custkey"].to_numpy(np.int64))
        cref = ray.put(ckeys)

        def count_partial(df: pd.DataFrame) -> pd.DataFrame:
            ck = ray.get(cref)
            key = df["o_custkey"].to_numpy(np.int64)
            if len(ck):
                _, hit = _ss_match(ck, key)
                key = key[hit]
            else:
                key = key[:0]
            g = pd.DataFrame({"o_custkey": key}).groupby(
                "o_custkey", as_index=False).size().rename(
                columns={"size": "n"})
            return g.astype({"o_custkey": "int64", "n": "int64"})

        partials = orders.map_batches(count_partial, batch_format="pandas",
                                      batch_size=131072)
    else:
        matched = semi_anti_join(
            orders, _read(sf_dir, "customer", columns=["c_custkey"]),
            left_key="o_custkey", right_key="c_custkey",
            num_buckets=choose_partitions(n_orders, default=32),
            left_types={"o_custkey": pa.int64()})

        def count_only(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("o_custkey", as_index=False).size().rename(
                columns={"size": "n"})
            return g.astype({"o_custkey": "int64", "n": "int64"})

        partials = matched.map_batches(count_only, batch_format="pandas")

    per_cust = partitioned_group_sum(partials, key="o_custkey",
                                     sum_cols={"c_count": "n"},
                                     nrows=n_cust)

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_count", as_index=False).size().rename(
            columns={"size": "custdist"})
        return g.astype(out_schema)

    parts = per_cust.map_batches(dist_partial,
                                 batch_format="pandas").to_pandas()
    if len(parts) == 0 or "c_count" not in parts.columns:
        parts = pd.DataFrame({"c_count": pd.Series(dtype="int64"),
                              "custdist": pd.Series(dtype="int64")})
    dist = parts.groupby("c_count", as_index=False)["custdist"].sum()
    n_zero = n_cust - int(dist["custdist"].sum())
    if n_zero > 0:
        dist = pd.concat([dist, pd.DataFrame(
            {"c_count": [0], "custdist": [n_zero]})], ignore_index=True)
    return (dist.astype(out_schema)
            .sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))


def order_priority_check(sf_dir: str, *, date_from: str = "1996-01-01",
                         date_to: str = "1996-07-01", grace_days: int = 90,
                         broadcast_limit: int = 2_000_000):
    """TPC-H Q4 shape (order priority checking): count orders per
    priority, in a date window, that have AT LEAST ONE line shipped more
    than ``grace_days`` after the order date — an EXISTS semi-join whose
    predicate compares a fact column against the outer row (the test
    tables carry no l_commitdate/l_receiptdate, so late shipment stands
    in for Q4's commit<receipt; the plan shape is identical). Output
    (o_orderpriority, n_late) sorted by priority.

    The EXISTS collapses to an associative MAX: an order is late iff
    max(l_shipdate) over its lines exceeds its deadline, so lineitem
    reduces to slim (orderkey, max_ship_us) partials and no line-level
    rows ever join.

    * under the gate (window orders ≤ limit): the window's (orderkey,
      deadline_us, priority) broadcast sorted via ray.put; one lineitem
      pass emits per-batch UNIQUE late orderkeys; group-sum makes them
      globally distinct; priorities re-attach from the broadcast.
    * above the gate: per-batch (o_orderkey, ship_us max) partials
      hash-join the slim window triple, a coarse-partitioned kernel
      reduces max-vs-deadline per order — only key-width rows move.

    Per-priority counts fold driver-side from ≤5-row block partials.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()
    grace_us = int(grace_days) * 86_400_000_000
    n_orders = _table_nrows(sf_dir, "orders")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    out_schema = {"o_orderpriority": "object", "n_late": "int64"}

    def window_slim(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        batch = batch.filter(pc.and_(pc.greater_equal(od, pa.scalar(lo)),
                                     pc.less(od, pa.scalar(hi))))
        dl = pc.add(pc.cast(batch.column("o_orderdate"), pa.int64()),
                    pa.scalar(grace_us, type=pa.int64()))
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "deadline_us": dl,
                         "o_orderpriority": batch.column("o_orderpriority")})

    def fold(parts: pd.DataFrame) -> pd.DataFrame:
        if len(parts) == 0 or "o_orderpriority" not in parts.columns:
            return pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                                 "n_late": pd.Series(dtype="int64")})
        out = parts.groupby("o_orderpriority", as_index=False)["n_late"].sum()
        return (out.astype(out_schema).sort_values("o_orderpriority")
                .reset_index(drop=True))

    win = orders.map_batches(window_slim, batch_format="pyarrow")

    if n_orders <= broadcast_limit:
        wdf = win.to_pandas()
        if "o_orderkey" not in wdf.columns:  # fully-empty loses schema
            wdf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "deadline_us": pd.Series(dtype="int64"),
                                "o_orderpriority": pd.Series(dtype="object")})
        wdf = wdf.sort_values("o_orderkey")
        wref = ray.put((wdf["o_orderkey"].to_numpy(np.int64),
                        wdf["deadline_us"].to_numpy(np.int64),
                        wdf["o_orderpriority"].to_numpy()))

        def late_partial(batch: pa.Table) -> pa.Table:
            ok, dl, _ = ray.get(wref)
            if len(ok) == 0 or batch.num_rows == 0:
                return pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64())})
            key = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            idx, hit = _ss_match(ok, key)
            late = np.unique(key[hit & (ship > dl[idx])])
            return pa.table({"o_orderkey": pa.array(late, type=pa.int64()),
                             "n": pa.array(np.ones(len(late), np.int64))})

        distinct = partitioned_group_sum(
            li.map_batches(late_partial, batch_format="pyarrow",
                           batch_size=131072),
            key="o_orderkey", sum_cols={"n": "n"}, nrows=len(wdf))

        def prio_partial(df: pd.DataFrame) -> pd.DataFrame:
            ok, _, op = ray.get(wref)
            idx, _ = _ss_match(ok, df["o_orderkey"].to_numpy(np.int64))
            g = pd.DataFrame({"o_orderpriority": op[idx]}).groupby(
                "o_orderpriority", as_index=False).size().rename(
                columns={"size": "n_late"})
            return g.astype(out_schema)

        return fold(distinct.map_batches(
            prio_partial, batch_format="pandas").to_pandas())

    # ABOVE THE GATE — slim max partials join the window triple
    def ship_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "ship_us": ts_int_us(df["l_shipdate"])}).groupby(
            "o_orderkey", as_index=False)["ship_us"].max()
        return g.astype({"o_orderkey": "int64", "ship_us": "int64"})

    joined = hash_join(
        li.map_batches(ship_partial, batch_format="pandas"),
        win, key="o_orderkey",
        num_buckets=choose_partitions(n_orders, default=32),
        left_types={"o_orderkey": pa.int64(), "ship_us": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "deadline_us": pa.int64(),
                     "o_orderpriority": pa.string()})

    def reduce_kernel(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_orderkey", as_index=False).agg(
            ship_us=("ship_us", "max"), deadline_us=("deadline_us", "first"),
            o_orderpriority=("o_orderpriority", "first"))
        late = agg.loc[agg["ship_us"] > agg["deadline_us"]]
        out = late.groupby("o_orderpriority", as_index=False).size().rename(
            columns={"size": "n_late"})
        return out.astype(out_schema)

    parts = coarse_partition_apply(joined, reduce_kernel,
                                   key_col="o_orderkey", part_col="q4_part",
                                   num_parts=64, nrows=None)
    return fold(parts.to_pandas())


def large_volume_customers(sf_dir: str, *, min_qty: int = 250, k: int = 100,
                           broadcast_limit: int = 2_000_000):
    """TPC-H Q18 (large volume customers): orders whose total line
    quantity exceeds ``min_qty``, joined back to their order row and
    customer name, top-k by order value. Output (c_name, c_custkey,
    o_orderkey, o_orderdate, o_totalprice_cents, sum_qty) sorted
    o_totalprice_cents DESC, o_orderkey ASC, LIMIT k. l_quantity is
    integral by schema contract (TPC-H 1..50), so sums are exact int64.

    HAVING-then-join-back shape: the quantity group-sum runs FIRST and
    its survivor set (a tail fraction: per-order quantity is bounded by
    lines-per-order × 50) is the only thing that ever joins.

    * under the gate (orders footer ≤ limit): the survivor join reads
      order attributes from ONE broadcast sorted column set; zero
      exchange beyond the quantity group-sum's slim partials.
    * above the gate: survivors hash-join a slim order projection —
      survivor-width exchange, never line-width.

    The final ≤k rows attach c_name by a broadcast-filtered customer
    scan (the k custkeys ship to every read task; no customer shuffle).
    """
    n_orders = _table_nrows(sf_dir, "orders")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])
    out_cols = ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice_cents", "sum_qty"]

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({
            "c_name": pd.Series(dtype="object"),
            "c_custkey": pd.Series(dtype="int64"),
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "o_totalprice_cents": pd.Series(dtype="int64"),
            "sum_qty": pd.Series(dtype="int64")})[out_cols]

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "qty": df["l_quantity"].to_numpy(np.float64).astype(np.int64),
        }).groupby("o_orderkey", as_index=False)["qty"].sum()
        return g.astype({"o_orderkey": "int64", "qty": "int64"})

    totals = partitioned_group_sum(
        li.map_batches(qty_partial, batch_format="pandas",
                       batch_size=131072),
        key="o_orderkey", sum_cols={"sum_qty": "qty"}, nrows=n_orders)

    def keep_big(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["sum_qty"] > min_qty]

    survivors = totals.map_batches(keep_big, batch_format="pandas")

    def order_slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_custkey": batch.column("o_custkey"),
            "o_orderdate": batch.column("o_orderdate"),
            "o_totalprice_cents": _cents(batch.column("o_totalprice"))})

    if n_orders <= broadcast_limit:
        odf = (orders.map_batches(order_slim, batch_format="pyarrow")
               .to_pandas().sort_values("o_orderkey"))
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_custkey"].to_numpy(np.int64),
                        odf["o_orderdate"].to_numpy(),
                        odf["o_totalprice_cents"].to_numpy(np.int64)))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            ok, oc, od, op = ray.get(oref)
            if len(df) == 0 or len(ok) == 0:
                return empty_out().drop(columns=["c_name"])
            idx, hit = _ss_match(ok, df["o_orderkey"].to_numpy(np.int64))
            df = df.loc[hit]
            idx = idx[hit]
            return pd.DataFrame({
                "c_custkey": oc[idx],
                "o_orderkey": df["o_orderkey"].astype("int64").to_numpy(),
                "o_orderdate": pd.Series(od[idx]),
                "o_totalprice_cents": op[idx],
                "sum_qty": df["sum_qty"].astype("int64").to_numpy()})

        ranked = topk(survivors.map_batches(attach, batch_format="pandas"),
                      by=["o_totalprice_cents", "o_orderkey"],
                      descending=[True, False], k=k)
    else:
        joined = hash_join(
            survivors,
            orders.map_batches(order_slim, batch_format="pyarrow"),
            key="o_orderkey",
            num_buckets=choose_partitions(n_orders, default=32),
            left_types={"o_orderkey": pa.int64(), "sum_qty": pa.int64()},
            right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                         "o_orderdate": pa.timestamp("us"),
                         "o_totalprice_cents": pa.int64()})

        def as_cust(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"o_custkey": "c_custkey"})

        ranked = topk(joined.map_batches(as_cust, batch_format="pandas"),
                      by=["o_totalprice_cents", "o_orderkey"],
                      descending=[True, False], k=k)

    head = ranked.to_pandas()
    if len(head) == 0 or "o_orderkey" not in head.columns:
        return empty_out()

    keys = np.sort(head["c_custkey"].to_numpy(np.int64))
    kref = ray.put(keys)

    def cust_pick(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(kref)
        _, hit = _ss_match(ks, df["c_custkey"].to_numpy(np.int64))
        return df.loc[hit, ["c_custkey", "c_name"]]

    names = (_read(sf_dir, "customer", columns=["c_custkey", "c_name"])
             .map_batches(cust_pick, batch_format="pandas").to_pandas())
    if "c_custkey" not in names.columns:
        names = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                              "c_name": pd.Series(dtype="object")})
    out = head.merge(names, on="c_custkey", how="inner")
    out = out.astype({"c_custkey": "int64", "o_orderkey": "int64",
                      "o_totalprice_cents": "int64", "sum_qty": "int64"})
    return (out[out_cols]
            .sort_values(["o_totalprice_cents", "o_orderkey"],
                         ascending=[False, True])
            .head(k).reset_index(drop=True))


def global_sales_opportunity(sf_dir: str, *, idle_since: str = "2001-01-01",
                             broadcast_limit: int = 2_000_000):
    """TPC-H Q22 shape (global sales opportunity): market segments of
    above-average-balance customers with NO recent orders — a global
    scalar broadcast into a filter, then an anti-join (the test tables
    carry no c_phone, so c_mktsegment stands in for the country-code
    group and "no orders since ``idle_since``" for "no orders ever",
    which is empty on this corpus). Output (c_mktsegment, n_customers,
    acctbal_cents) sorted by segment.

    The average is exact integer arithmetic end to end: pass 1 folds
    per-block (Σ positive cents, count) partials to driver ints, and
    ``cents > tot/n`` is evaluated as ``cents ≥ tot//n + 1`` — an
    equivalent integer predicate (cents integral, n > 0) that cannot
    overflow at any corpus scale, matching the oracle's HUGEINT product
    form bit for bit.

    * under the gate (orders footer ≤ limit): the recent-order custkeys
      collect to one sorted broadcast array; one customer pass filters
      and emits ≤5-row segment partials. Two scans total, zero exchange.
    * above the gate: the filtered customer slim anti-joins the recent
      custkeys via ``semi_anti_join`` (unique keys only move), then the
      same segment partials.
    """
    cutoff = pd.Timestamp(idle_since).to_pydatetime()
    n_orders = _table_nrows(sf_dir, "orders")
    n_cust = _table_nrows(sf_dir, "customer")
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    out_schema = {"c_mktsegment": "object", "n_customers": "int64",
                  "acctbal_cents": "int64"}

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                             "n_customers": pd.Series(dtype="int64"),
                             "acctbal_cents": pd.Series(dtype="int64")})

    def pos_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal")).to_numpy(
            zero_copy_only=False)
        pos = cents > 0
        return pa.table({"tot": pa.array([int(cents[pos].sum())],
                                         type=pa.int64()),
                         "n": pa.array([int(pos.sum())], type=pa.int64())})

    pos = cust.map_batches(pos_partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    tot, n = int(pos["tot"].sum()), int(pos["n"].sum())
    if n == 0:  # NULL average: the predicate selects nothing
        return empty_out()
    threshold = tot // n + 1  # cents*n > tot  ⇔  cents ≥ tot//n + 1

    def rich_slim(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("c_acctbal"))
        batch = batch.append_column("acctbal_cents", cents)
        return batch.filter(pc.greater_equal(
            cents, pa.scalar(threshold, type=pa.int64()))).select(
            ["c_custkey", "c_mktsegment", "acctbal_cents"])

    def recent_slim(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch.column("o_orderdate"),
                                              pa.scalar(cutoff)))
        return pa.table({"o_custkey": pc.unique(batch.column("o_custkey"))})

    rich = cust.map_batches(rich_slim, batch_format="pyarrow",
                            batch_size=131072)
    recent = orders.map_batches(recent_slim, batch_format="pyarrow",
                                batch_size=131072)

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("c_custkey", "size"),
            acctbal_cents=("acctbal_cents", "sum"))
        return g.astype(out_schema)

    if n_orders <= broadcast_limit:
        rk = np.sort(recent.to_pandas().get(
            "o_custkey", pd.Series(dtype="int64")).to_numpy(np.int64))
        rref = ray.put(rk)

        def idle_partial(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(rref)
            if len(ks):
                _, hit = _ss_match(ks, df["c_custkey"].to_numpy(np.int64))
                df = df.loc[~hit]
            return seg_partial(df)

        parts = rich.map_batches(idle_partial,
                                 batch_format="pandas").to_pandas()
    else:
        idle = semi_anti_join(
            rich, recent, left_key="c_custkey", right_key="o_custkey",
            anti=True, num_buckets=choose_partitions(n_cust, default=32),
            left_types={"c_custkey": pa.int64(), "c_mktsegment": pa.string(),
                        "acctbal_cents": pa.int64()})
        parts = idle.map_batches(seg_partial,
                                 batch_format="pandas").to_pandas()

    if len(parts) == 0 or "c_mktsegment" not in parts.columns:
        return empty_out()
    out = parts.groupby("c_mktsegment", as_index=False).agg(
        n_customers=("n_customers", "sum"),
        acctbal_cents=("acctbal_cents", "sum"))
    return (out.astype(out_schema).sort_values("c_mktsegment")
            .reset_index(drop=True))


def supplier_nation_share(sf_dir: str, *, frac_num: int = 1,
                          frac_den: int = 25,
                          broadcast_limit: int = 2_000_000):
    """TPC-H Q11 shape (important stock): supplier nations whose revenue
    exceeds ``frac_num/frac_den`` of GLOBAL revenue — group sums and the
    global scalar they are filtered against come out of the SAME pass.
    Output (n_name, revenue_cents, share_permille) sorted by nation;
    share_permille = 1000·cents // total. The share predicate and the
    permille are evaluated in Python ints on the ≤|nations|-row driver
    fold — exact and unbounded, matching the oracle's HUGEINT forms.

    nation is always driver-read (25 rows at any scale). Two tiers on
    the supplier footer row count:

    * under the gate: (s_suppkey → nation code) broadcast sorted; ONE
      lineitem pass emits ≤|nations|-row int64 partials. Zero exchange.
    * above the gate: per-suppkey cents partials hash-join the slim
      (s_suppkey, n_name) projection — supplier-width exchange only —
      then the same per-nation partials.
    """
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    n_supp = _table_nrows(sf_dir, "supplier")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    out_schema = {"n_name": "object", "revenue_cents": "int64",
                  "share_permille": "int64"}

    def li_cents(batch: pa.Table) -> np.ndarray:
        return _cents(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        ).to_numpy(zero_copy_only=False)

    def nation_partial(names: np.ndarray, cents: np.ndarray) -> pd.DataFrame:
        g = pd.DataFrame({"n_name": names, "cents": cents}).groupby(
            "n_name", as_index=False)["cents"].sum()
        return g.astype({"n_name": "object", "cents": "int64"})

    if n_supp <= broadcast_limit:
        sdf = supp.to_pandas().sort_values("s_suppkey")
        sref = ray.put((sdf["s_suppkey"].to_numpy(np.int64),
                        sdf["s_nationkey"].map(nmap).to_numpy()))

        def partial(batch: pa.Table) -> pd.DataFrame:
            sk, sn = ray.get(sref)
            if len(sk) == 0 or batch.num_rows == 0:
                return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                                     "cents": pd.Series(dtype="int64")})
            key = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            idx, hit = _ss_match(sk, key)
            return nation_partial(sn[idx][hit], li_cents(batch)[hit])

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=131072).to_pandas()
    else:
        def supp_partial(df: pd.DataFrame) -> pd.DataFrame:
            g = pd.DataFrame({
                "s_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "cents": df["cents"].to_numpy(np.int64)}).groupby(
                "s_suppkey", as_index=False)["cents"].sum()
            return g.astype({"s_suppkey": "int64", "cents": "int64"})

        def with_cents(batch: pa.Table) -> pd.DataFrame:
            return supp_partial(pd.DataFrame({
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False),
                "cents": li_cents(batch)}))

        def supp_slim(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "s_suppkey": df["s_suppkey"].to_numpy(np.int64),
                "n_name": df["s_nationkey"].map(nmap)})

        joined = hash_join(
            li.map_batches(with_cents, batch_format="pyarrow",
                           batch_size=131072),
            supp.map_batches(supp_slim, batch_format="pandas"),
            key="s_suppkey",
            num_buckets=choose_partitions(n_supp, default=32),
            left_types={"s_suppkey": pa.int64(), "cents": pa.int64()},
            right_types={"s_suppkey": pa.int64(), "n_name": pa.string()})

        def fold_block(df: pd.DataFrame) -> pd.DataFrame:
            return nation_partial(df["n_name"].to_numpy(),
                                  df["cents"].to_numpy(np.int64))

        parts = joined.map_batches(fold_block,
                                   batch_format="pandas").to_pandas()

    if len(parts) == 0 or "n_name" not in parts.columns:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "revenue_cents": pd.Series(dtype="int64"),
                             "share_permille": pd.Series(dtype="int64")})
    rev = parts.groupby("n_name", as_index=False)["cents"].sum()
    total = int(rev["cents"].sum())  # Python int from here: exact forever
    keep = [(n, int(c)) for n, c in zip(rev["n_name"], rev["cents"])
            if frac_den * int(c) > frac_num * total]
    out = pd.DataFrame({
        "n_name": [n for n, _ in keep],
        "revenue_cents": pd.array([c for _, c in keep], dtype="int64"),
        "share_permille": pd.array([(1000 * c) // total for _, c in keep],
                                   dtype="int64")})
    return (out.astype(out_schema).sort_values("n_name")
            .reset_index(drop=True))


def top_supplier(sf_dir: str, *, date_from: str = "1996-01-01",
                 date_to: str = "1996-04-01"):
    """TPC-H Q15 (top supplier): the supplier(s) with MAXIMUM revenue in
    a window, ties kept — an argmax-with-ties join-back. Output
    (s_suppkey, s_name, revenue_cents) sorted by s_suppkey.

    Single scale path (no broadcast gate needed): the windowed lineitem
    pass reduces to per-suppkey cents partials and a
    ``partitioned_group_sum`` — supplier-width, the only exchange. That
    slim aggregate is materialized ONCE (bounded by supplier count, not
    lineitem count) because it is consumed twice: a per-block max fold
    to the driver scalar, then the equality filter. The ≤ties survivors
    attach s_name via a broadcast-filtered supplier scan — the winner
    keys ship to every read task; supplier itself never shuffles.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])
    out_cols = ["s_suppkey", "s_name", "revenue_cents"]

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                             "s_name": pd.Series(dtype="object"),
                             "revenue_cents": pd.Series(dtype="int64")})

    def partial(batch: pa.Table) -> pd.DataFrame:
        ship = batch.column("l_shipdate")
        batch = batch.filter(pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)),
            pc.less(ship, pa.scalar(hi))))
        cents = _cents(pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount"))))
        g = pd.DataFrame({
            "s_suppkey": batch.column("l_suppkey").to_numpy(
                zero_copy_only=False),
            "cents": cents.to_numpy(zero_copy_only=False)}).groupby(
            "s_suppkey", as_index=False)["cents"].sum()
        return g.astype({"s_suppkey": "int64", "cents": "int64"})

    rev = partitioned_group_sum(
        li.map_batches(partial, batch_format="pyarrow", batch_size=131072),
        key="s_suppkey", sum_cols={"revenue_cents": "cents"},
        nrows=_table_nrows(sf_dir, "supplier")).materialize()

    def max_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"m": pd.Series(dtype="int64")})
        return pd.DataFrame({"m": [int(df["revenue_cents"].max())]})

    mx = rev.map_batches(max_partial, batch_format="pandas").to_pandas()
    if len(mx) == 0 or "m" not in mx.columns:
        return empty_out()
    m = int(mx["m"].max())

    winners = rev.map_batches(
        lambda df, _m=m: df.loc[df["revenue_cents"] == _m],
        batch_format="pandas").to_pandas()
    if len(winners) == 0 or "s_suppkey" not in winners.columns:
        return empty_out()

    keys = np.sort(winners["s_suppkey"].to_numpy(np.int64))
    kref = ray.put(keys)

    def supp_pick(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(kref)
        _, hit = _ss_match(ks, df["s_suppkey"].to_numpy(np.int64))
        return df.loc[hit, ["s_suppkey", "s_name"]]

    names = (_read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
             .map_batches(supp_pick, batch_format="pandas").to_pandas())
    if "s_suppkey" not in names.columns:
        return empty_out()
    out = winners.merge(names, on="s_suppkey", how="inner")
    out = out.astype({"s_suppkey": "int64", "revenue_cents": "int64"})
    return (out[out_cols].sort_values("s_suppkey").reset_index(drop=True))


def brand_supplier_count(sf_dir: str, *, min_qty: float = 48.0,
                         broadcast_limit: int = 2_000_000):
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per part brand, restricted to high-quantity lines — a
    COUNT(DISTINCT) through a join. Output (p_brand, supplier_cnt)
    sorted by brand.

    The distinct runs on (brand, suppkey) PAIRS, never on line-level
    rows: every batch pre-dedups its pairs before anything moves, so the
    exchange is distinct-pair-width. Pairs then coarse-partition by
    suppkey — a supplier's pairs land in exactly one partition, so a
    per-partition dedup is a GLOBAL dedup — and each partition emits
    ≤|brands| partial counts folded on the driver.

    * under the gate: (p_partkey → brand) broadcast sorted via ray.put;
      one lineitem pass emits the deduped pairs.
    * above the gate: per-batch distinct (l_partkey, l_suppkey) pairs
      hash-join the slim (p_partkey, p_brand) projection first.
    """
    n_part = _table_nrows(sf_dir, "part")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity"])
    out_schema = {"p_brand": "object", "supplier_cnt": "int64"}

    def qty_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("l_quantity"),
                                             pa.scalar(float(min_qty))))

    if n_part <= broadcast_limit:
        pdf = part.to_pandas().sort_values("p_partkey")
        pref = ray.put((pdf["p_partkey"].to_numpy(np.int64),
                        pdf["p_brand"].to_numpy()))

        def pair_partial(batch: pa.Table) -> pd.DataFrame:
            pk, pb = ray.get(pref)
            batch = qty_filter(batch)
            if len(pk) == 0 or batch.num_rows == 0:
                return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                                     "l_suppkey": pd.Series(dtype="int64")})
            key = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            idx, hit = _ss_match(pk, key)
            pairs = pd.DataFrame({
                "p_brand": pb[idx][hit],
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False)[hit]}).drop_duplicates()
            return pairs.astype({"p_brand": "object", "l_suppkey": "int64"})

        pairs = li.map_batches(pair_partial, batch_format="pyarrow",
                               batch_size=131072)
    else:
        def li_pairs(batch: pa.Table) -> pd.DataFrame:
            batch = qty_filter(batch)
            pairs = pd.DataFrame({
                "p_partkey": batch.column("l_partkey").to_numpy(
                    zero_copy_only=False),
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False)}).drop_duplicates()
            return pairs.astype({"p_partkey": "int64", "l_suppkey": "int64"})

        joined = hash_join(
            li.map_batches(li_pairs, batch_format="pyarrow",
                           batch_size=131072),
            part, key="p_partkey",
            num_buckets=choose_partitions(n_part, default=32),
            left_types={"p_partkey": pa.int64(), "l_suppkey": pa.int64()},
            right_types={"p_partkey": pa.int64(), "p_brand": pa.string()})
        pairs = joined.map_batches(
            lambda df: df[["p_brand", "l_suppkey"]].drop_duplicates(),
            batch_format="pandas")

    def count_kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["p_brand", "l_suppkey"]].drop_duplicates()
        out = d.groupby("p_brand", as_index=False).size().rename(
            columns={"size": "supplier_cnt"})
        return out.astype(out_schema)

    # exchange width sized from the part footer (already read above):
    # distinct pairs scale with parts x suppliers-per-part, and the
    # supplier table itself is never an input of this query, so its
    # footer must not be required (planted fixtures omit it)
    n_exchange = choose_partitions(n_part, default=32)
    # merge away zero-row pair blocks (a fully-filtered batch) before the
    # keyed exchange: a downstream task whose inputs are all empty emits a
    # schemaless empty block — the RefBundle schema-drift warning. The
    # split/merge repartition is not a key exchange and its block count
    # tracks the exchange width, so it stays cluster-sized at scale.
    parts = coarse_partition_apply(
        pairs.repartition(n_exchange), count_kernel,
        key_col="l_suppkey", part_col="q16_part",
        num_parts=n_exchange, nrows=None).to_pandas()
    if len(parts) == 0 or "p_brand" not in parts.columns:
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "supplier_cnt": pd.Series(dtype="int64")})
    out = parts.groupby("p_brand", as_index=False)["supplier_cnt"].sum()
    return (out.astype(out_schema).sort_values("p_brand")
            .reset_index(drop=True))


def small_qty_revenue(sf_dir: str, *,
                      brands: tuple = ("Brand#1", "Brand#2", "Brand#3"),
                      broadcast_limit: int = 2_000_000):
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lines whose quantity is below 20% of their part's OWN average — a
    per-group-average join-back (the correlated-subquery sibling of
    global_sales_opportunity's global average). Output
    (p_brand, avg_yearly_cents, n_lines) per brand, sorted by brand;
    avg_yearly_cents = qualifying extendedprice cents // 7.

    The threshold test is integer-exact: quantities are integral, so
    ``q < 0.2 * avg(q)`` is evaluated as ``5 * cnt * q < sum(q)`` in
    int64 — no float summation-order drift against the oracle.

    The ``brands`` filter is the scale lever (real Q17 filters to one
    brand+container for the same reason): only the selected brands'
    lines ever leave their read tasks. Those survivors
    coarse-partition by l_partkey — a part's lines land in ONE
    partition, so the per-partition average is the global per-part
    average — and each partition emits ≤|brands| partial rows.

    * under the gate: (p_partkey → brand) broadcast sorted, filtered to
      ``brands`` BEFORE the put, so the probe side is |brands|/|brands
      universe| of the part table; one lineitem pass attaches brands.
    * above the gate: slim (l_partkey, q, cents) triples hash-join the
      brand-filtered part projection, then the same partkey partition.
    """
    n_part = _table_nrows(sf_dir, "part")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    out_schema = {"p_brand": "object", "avg_yearly_cents": "int64",
                  "n_lines": "int64"}
    brand_set = set(brands)

    def part_slim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["p_brand"].isin(brand_set), ["p_partkey", "p_brand"]]
        return df.astype({"p_partkey": "int64", "p_brand": "object"})

    def li_slim(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": batch.column("l_partkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "q": pc.cast(pc.round(batch.column("l_quantity")),
                         pa.int64()).to_numpy(zero_copy_only=False),
            "cents": _cents(batch.column("l_extendedprice")).to_numpy(
                zero_copy_only=False)})

    if n_part <= broadcast_limit:
        pdf = part.map_batches(part_slim,
                               batch_format="pandas").to_pandas()
        if "p_partkey" not in pdf.columns:
            pdf = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                                "p_brand": pd.Series(dtype="object")})
        pdf = pdf.sort_values("p_partkey")
        pref = ray.put((pdf["p_partkey"].to_numpy(np.int64),
                        pdf["p_brand"].to_numpy()))

        def attach(batch: pa.Table) -> pd.DataFrame:
            pk, pb = ray.get(pref)
            sl = li_slim(batch)
            if len(pk) == 0 or len(sl) == 0:
                return pd.DataFrame({
                    "p_brand": pd.Series(dtype="object"),
                    "l_partkey": pd.Series(dtype="int64"),
                    "q": pd.Series(dtype="int64"),
                    "cents": pd.Series(dtype="int64")})
            idx, hit = _ss_match(pk, sl["l_partkey"].to_numpy(np.int64))
            sl = sl.loc[hit].assign(p_brand=pb[idx][hit])
            return sl[["p_brand", "l_partkey", "q", "cents"]]

        lines = li.map_batches(attach, batch_format="pyarrow",
                               batch_size=131072)
    else:
        def part_keyed(df: pd.DataFrame) -> pd.DataFrame:
            return part_slim(df).rename(columns={"p_partkey": "l_partkey"})

        lines = hash_join(
            li.map_batches(li_slim, batch_format="pyarrow",
                           batch_size=131072),
            part.map_batches(part_keyed, batch_format="pandas"),
            key="l_partkey",
            num_buckets=choose_partitions(n_part, default=32),
            left_types={"l_partkey": pa.int64(), "q": pa.int64(),
                        "cents": pa.int64()},
            right_types={"l_partkey": pa.int64(), "p_brand": pa.string()})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["p_brand", "l_partkey", "q", "cents"]]
        agg = g.groupby("l_partkey")["q"].agg(["sum", "count"])
        qs = agg["sum"].reindex(g["l_partkey"]).to_numpy(np.int64)
        cnt = agg["count"].reindex(g["l_partkey"]).to_numpy(np.int64)
        keep = 5 * cnt * g["q"].to_numpy(np.int64) < qs
        out = g.loc[keep].groupby("p_brand", as_index=False).agg(
            cents=("cents", "sum"), n_lines=("cents", "size"))
        return out.astype({"p_brand": "object", "cents": "int64",
                           "n_lines": "int64"})

    # lineitem's footer row count is a sound bound on the slim `lines`
    # stream (one row per surviving line), so the coalesce gate can
    # engage below the limit — above it the exchange is unchanged
    parts = coarse_partition_apply(
        lines, kernel, key_col="l_partkey", part_col="q17_part",
        num_parts=choose_partitions(n_part, default=32),
        nrows=_table_nrows(sf_dir, "lineitem")).to_pandas()
    if len(parts) == 0 or "p_brand" not in parts.columns:
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "avg_yearly_cents": pd.Series(dtype="int64"),
                             "n_lines": pd.Series(dtype="int64")})
    agg = parts.groupby("p_brand", as_index=False).agg(
        cents=("cents", "sum"), n_lines=("n_lines", "sum"))
    out = pd.DataFrame({"p_brand": agg["p_brand"],
                        "avg_yearly_cents": agg["cents"] // 7,
                        "n_lines": agg["n_lines"]})
    return (out.astype(out_schema).sort_values("p_brand")
            .reset_index(drop=True))


def disjunctive_revenue(sf_dir: str, *,
                        clauses: tuple = (("Brand#12", 1, 11, 1, 5),
                                          ("Brand#23", 10, 20, 1, 10),
                                          ("Brand#4", 20, 30, 1, 15)),
                        broadcast_limit: int = 2_000_000):
    """TPC-H Q19 shape (discounted revenue): revenue from lines matching
    an OR of (brand, quantity-range, size-range) conjunctions — the
    disjunctive-predicate join. Each ``clauses`` entry is
    (p_brand, qty_lo, qty_hi, size_lo, size_hi), all bounds INCLUSIVE
    (SQL BETWEEN). Output (p_brand, revenue_cents, n_lines) per clause
    brand, sorted by brand; revenue is the house integer-cents rule on
    extendedprice*(1-discount).

    Predicate pushdown is the whole point of the shape: the part-side
    conjuncts (brand ∈ clauses, size in the clause's range) prune the
    BUILD side before anything is broadcast or exchanged, and the
    line-side conjunct (the global qty envelope, then the exact
    per-clause qty range after the match) prunes the PROBE side inside
    the read task. Clause brands must be distinct (asserted): the OR
    then partitions by brand and a per-brand group-sum is the answer.

    * under the gate: broadcast sorted (p_partkey → clause index); one
      lineitem pass probes, range-checks qty against the clause's
      bounds, and emits ≤|clauses| partial rows per batch. No exchange.
    * above the gate: qty-envelope-filtered slim lines hash-join the
      clause-pruned part projection, then the same per-clause mask.
    """
    brands = [c[0] for c in clauses]
    assert len(set(brands)) == len(brands), \
        "disjunctive_revenue: clause brands must be distinct"
    qlo = np.array([c[1] for c in clauses], np.int64)
    qhi = np.array([c[2] for c in clauses], np.int64)
    env_lo, env_hi = float(qlo.min()), float(qhi.max())
    by_brand = {c[0]: i for i, c in enumerate(clauses)}

    n_part = _table_nrows(sf_dir, "part")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    out_schema = {"p_brand": "object", "revenue_cents": "int64",
                  "n_lines": "int64"}

    def part_prune(df: pd.DataFrame) -> pd.DataFrame:
        ci = df["p_brand"].map(by_brand)
        keep = ci.notna()
        if keep.any():
            idx = ci[keep].to_numpy(np.int64)
            sz = df.loc[keep, "p_size"].to_numpy(np.int64)
            slo = np.array([c[3] for c in clauses], np.int64)[idx]
            shi = np.array([c[4] for c in clauses], np.int64)[idx]
            good = (sz >= slo) & (sz <= shi)
            out = pd.DataFrame({
                "l_partkey": df.loc[keep, "p_partkey"].to_numpy(
                    np.int64)[good],
                "clause": idx[good]})
        else:
            out = pd.DataFrame({"l_partkey": [], "clause": []})
        return out.astype({"l_partkey": "int64", "clause": "int64"})

    def li_slim(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity")
        batch = batch.filter(pc.and_(
            pc.greater_equal(qty, pa.scalar(env_lo)),
            pc.less_equal(qty, pa.scalar(env_hi))))
        return pa.table({
            "l_partkey": pc.cast(batch.column("l_partkey"), pa.int64()),
            "q": pc.cast(pc.round(batch.column("l_quantity")), pa.int64()),
            "cents": _cents(pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount"))))})

    def clause_fold(ci: np.ndarray, q: np.ndarray,
                    cents: np.ndarray) -> pd.DataFrame:
        good = (q >= qlo[ci]) & (q <= qhi[ci])
        g = pd.DataFrame({"clause": ci[good], "cents": cents[good]}).groupby(
            "clause", as_index=False).agg(revenue_cents=("cents", "sum"),
                                          n_lines=("cents", "size"))
        return g.astype({"clause": "int64", "revenue_cents": "int64",
                         "n_lines": "int64"})

    if n_part <= broadcast_limit:
        pdf = part.map_batches(part_prune,
                               batch_format="pandas").to_pandas()
        if "l_partkey" not in pdf.columns:
            pdf = pd.DataFrame({"l_partkey": pd.Series(dtype="int64"),
                                "clause": pd.Series(dtype="int64")})
        pdf = pdf.sort_values("l_partkey")
        pref = ray.put((pdf["l_partkey"].to_numpy(np.int64),
                        pdf["clause"].to_numpy(np.int64)))

        def partial(batch: pa.Table) -> pd.DataFrame:
            pk, pc_idx = ray.get(pref)
            t = li_slim(batch)
            if len(pk) == 0 or t.num_rows == 0:
                return pd.DataFrame({
                    "clause": pd.Series(dtype="int64"),
                    "revenue_cents": pd.Series(dtype="int64"),
                    "n_lines": pd.Series(dtype="int64")})
            key = t.column("l_partkey").to_numpy(zero_copy_only=False)
            idx, hit = _ss_match(pk, key)
            return clause_fold(
                pc_idx[idx][hit],
                t.column("q").to_numpy(zero_copy_only=False)[hit],
                t.column("cents").to_numpy(zero_copy_only=False)[hit])

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=131072).to_pandas()
    else:
        joined = hash_join(
            li.map_batches(li_slim, batch_format="pyarrow",
                           batch_size=131072),
            part.map_batches(part_prune, batch_format="pandas"),
            key="l_partkey",
            num_buckets=choose_partitions(n_part, default=32),
            left_types={"l_partkey": pa.int64(), "q": pa.int64(),
                        "cents": pa.int64()},
            right_types={"l_partkey": pa.int64(), "clause": pa.int64()})

        def fold_block(df: pd.DataFrame) -> pd.DataFrame:
            return clause_fold(df["clause"].to_numpy(np.int64),
                               df["q"].to_numpy(np.int64),
                               df["cents"].to_numpy(np.int64))

        parts = joined.map_batches(fold_block,
                                   batch_format="pandas").to_pandas()

    if len(parts) == 0 or "clause" not in parts.columns:
        return pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                             "revenue_cents": pd.Series(dtype="int64"),
                             "n_lines": pd.Series(dtype="int64")})
    agg = parts.groupby("clause", as_index=False).agg(
        revenue_cents=("revenue_cents", "sum"), n_lines=("n_lines", "sum"))
    out = pd.DataFrame({
        "p_brand": [clauses[int(i)][0] for i in agg["clause"]],
        "revenue_cents": agg["revenue_cents"],
        "n_lines": agg["n_lines"]})
    return (out.astype(out_schema).sort_values("p_brand")
            .reset_index(drop=True))


def market_share(sf_dir: str, *, region: str = "ASIA",
                 nation: str = "NATION_2",
                 date_from: str = "1996-01-01", date_to: str = "1998-01-01",
                 broadcast_limit: int = 2_000_000):
    """TPC-H Q8 shape (national market share): within one region's
    customers' orders in a date window, the share of revenue supplied
    by ONE nation, per order year — a conditional-numerator /
    unconditional-denominator ratio from a single pass. Output
    (o_year, total_cents, nation_cents, share_permille) sorted by year;
    share_permille = 1000·nation_cents // total_cents, folded in Python
    ints on the ≤n_years-row driver side (exact at any magnitude).

    nation/region are driver-read (25/5 rows at any scale). Tier gate is
    volume_shipping's: max(n_cust, n_orders, n_supp) vs the limit.

    * under the gate: three broadcast sorted arrays — in-region custkeys,
      (in-region, in-window orderkey → year), target-nation suppkeys —
      and ONE lineitem pass emitting ≤n_years partials. Zero exchange.
    * above the gate: orders semi-join the in-region custkeys (keys-only
      exchange), per-batch (orderkey, suppkey) revenue partials hash-join
      the surviving orders, then re-aggregate to (year, suppkey) —
      bounded by years×|supplier|, NOT by line count — before a left
      join against the target-nation suppkey projection attaches the
      numerator flag. Lines cross the wire once.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()

    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"].astype(int))
    region_nk = set(nat.loc[nat["n_regionkey"].isin(rkeys),
                            "n_nationkey"].astype(int))
    target_nk = set(nat.loc[nat["n_name"] == nation,
                            "n_nationkey"].astype(int))
    out_schema = {"o_year": "int64", "total_cents": "int64",
                  "nation_cents": "int64", "share_permille": "int64"}

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in out_schema.items()})

    if not rkeys or not target_nk:
        return empty_out()

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    n_cust = _table_nrows(sf_dir, "customer")
    n_orders = _table_nrows(sf_dir, "orders")
    n_supp = _table_nrows(sf_dir, "supplier")

    def cust_slim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["c_nationkey"].isin(region_nk), ["c_custkey"]]
        return df.astype({"c_custkey": "int64"})

    def supp_slim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["s_nationkey"].isin(target_nk), ["s_suppkey"]]
        return df.astype({"s_suppkey": "int64"})

    def ord_window(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        batch = batch.filter(pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                                     pc.less(d, pa.scalar(hi))))
        return pa.table({
            "o_orderkey": pc.cast(batch.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64())})

    def li_cents(batch: pa.Table) -> pa.Array:
        return _cents(pc.multiply(batch.column("l_extendedprice"),
                                  pc.subtract(pa.scalar(1.0),
                                              batch.column("l_discount"))))

    def fold(parts: pd.DataFrame) -> pd.DataFrame:
        if len(parts) == 0 or "o_year" not in parts.columns:
            return empty_out()
        agg = parts.groupby("o_year", as_index=False).agg(
            total_cents=("total_cents", "sum"),
            nation_cents=("nation_cents", "sum"))
        rows = []
        for y, t, nc in zip(agg["o_year"], agg["total_cents"],
                            agg["nation_cents"]):
            t, nc = int(t), int(nc)
            if t > 0:
                rows.append((int(y), t, nc, (1000 * nc) // t))
        out = pd.DataFrame(rows, columns=list(out_schema))
        return (out.astype(out_schema).sort_values("o_year")
                .reset_index(drop=True))

    if max(n_cust, n_orders, n_supp) <= broadcast_limit:
        cdf = cust.map_batches(cust_slim, batch_format="pandas").to_pandas()
        ck = (np.sort(cdf["c_custkey"].to_numpy(np.int64))
              if "c_custkey" in cdf.columns else np.empty(0, np.int64))
        sdf = supp.map_batches(supp_slim, batch_format="pandas").to_pandas()
        sk = (np.sort(sdf["s_suppkey"].to_numpy(np.int64))
              if "s_suppkey" in sdf.columns else np.empty(0, np.int64))

        def ord_slim(batch: pa.Table) -> pd.DataFrame:
            t = ord_window(batch)
            okey = t.column("o_custkey").to_numpy(zero_copy_only=False)
            if len(ck) and t.num_rows:
                _, hit = _ss_match(ck, okey)
                t = t.filter(pa.array(hit))
            else:
                t = t.slice(0, 0)
            return pd.DataFrame({
                "o_orderkey": t.column("o_orderkey").to_numpy(
                    zero_copy_only=False),
                "o_year": t.column("o_year").to_numpy(
                    zero_copy_only=False)})

        odf = (orders.map_batches(ord_slim, batch_format="pyarrow")
               .to_pandas())
        if "o_orderkey" not in odf.columns:
            odf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "o_year": pd.Series(dtype="int64")})
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_year"].to_numpy(np.int64),
                        sk))

        def partial(batch: pa.Table) -> pd.DataFrame:
            ok, oy, tk = ray.get(oref)
            empty = pd.DataFrame({
                "o_year": pd.Series(dtype="int64"),
                "total_cents": pd.Series(dtype="int64"),
                "nation_cents": pd.Series(dtype="int64")})
            if batch.num_rows == 0 or len(ok) == 0:
                return empty
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            oi, ohit = _ss_match(ok, lkey)
            if not ohit.any():
                return empty
            cents = li_cents(batch).to_numpy(zero_copy_only=False)[ohit]
            years = oy[oi][ohit]
            skey = batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)[ohit]
            if len(tk):
                _, flag = _ss_match(tk, skey)
            else:
                flag = np.zeros(len(skey), bool)
            g = pd.DataFrame({
                "o_year": years, "total_cents": cents,
                "nation_cents": np.where(flag, cents, 0)}).groupby(
                "o_year", as_index=False).sum()
            return g.astype({"o_year": "int64", "total_cents": "int64",
                             "nation_cents": "int64"})

        return fold(li.map_batches(partial, batch_format="pyarrow",
                                   batch_size=131072).to_pandas())

    # ABOVE THE GATE — keys-only semi, one line-level exchange, then the
    # (year, suppkey)-bounded numerator join
    nb = choose_partitions(max(n_orders, n_cust), default=32)
    orders_f = semi_anti_join(
        orders.map_batches(ord_window, batch_format="pyarrow"),
        cust.map_batches(cust_slim, batch_format="pandas"),
        left_key="o_custkey", right_key="c_custkey", num_buckets=nb,
        left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                    "o_year": pa.int64()})

    def li_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": pc.cast(batch.column("l_orderkey"),
                                            pa.int64()),
                      "s_suppkey": pc.cast(batch.column("l_suppkey"),
                                           pa.int64()),
                      "cents": li_cents(batch)})
        g = t.group_by(["o_orderkey", "s_suppkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"o_orderkey": g.column("o_orderkey"),
                         "s_suppkey": g.column("s_suppkey"),
                         "cents": g.column("cents_sum")})

    ol = hash_join(
        li.map_batches(li_partial, batch_format="pyarrow",
                       batch_size=65536),
        orders_f.map_batches(
            lambda df: df[["o_orderkey", "o_year"]].astype(
                {"o_orderkey": "int64", "o_year": "int64"}),
            batch_format="pandas"),
        key="o_orderkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(),
                    "cents": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_year": pa.int64()})

    def ys_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_year", "s_suppkey"],
                       as_index=False)["cents"].sum()
        return g.astype({"o_year": "int64", "s_suppkey": "int64",
                         "cents": "int64"})

    sb = choose_partitions(n_supp, default=16)
    ysn = hash_join(
        ol.map_batches(ys_partial, batch_format="pandas"),
        supp.map_batches(
            lambda df: supp_slim(df).assign(is_target=np.int64(1)),
            batch_format="pandas"),
        key="s_suppkey", how="left", num_buckets=sb, coalesce_blocks=sb,
        left_types={"o_year": pa.int64(), "s_suppkey": pa.int64(),
                    "cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "is_target": pa.int64()})

    def year_partial(df: pd.DataFrame) -> pd.DataFrame:
        flag = df["is_target"].fillna(0).to_numpy(np.int64) == 1
        cents = df["cents"].to_numpy(np.int64)
        g = pd.DataFrame({
            "o_year": df["o_year"].to_numpy(np.int64),
            "total_cents": cents,
            "nation_cents": np.where(flag, cents, 0)}).groupby(
            "o_year", as_index=False).sum()
        return g.astype({"o_year": "int64", "total_cents": "int64",
                         "nation_cents": "int64"})

    return fold(ysn.map_batches(year_partial,
                                batch_format="pandas").to_pandas())


def late_shipments(sf_dir: str, *, lag_days: int = 60,
                   high_priorities: tuple = ("1-URGENT", "2-HIGH"),
                   broadcast_limit: int = 2_000_000):
    """TPC-H Q12 shape (shipping-mode priority, adapted): lines shipped
    LATE — more than ``lag_days`` after their order date — counted per
    l_returnflag, split into high- vs low-priority order counts (the
    testdata carries no l_shipmode/l_commitdate, so the group key is
    l_returnflag and lateness is shipdate vs orderdate; same
    join + date-arithmetic + conditional two-way count shape).
    Output (l_returnflag, high_line_count, low_line_count) sorted by
    flag. The lateness test is integer-µs exact:
    ship_us > order_us + lag_days·86400e6, matching the oracle's
    ``> o_orderdate + INTERVAL`` comparison bit-for-bit.

    * under the gate: broadcast sorted (o_orderkey → order_µs, is_high);
      one lineitem pass emits ≤|flags| partial count rows per batch.
    * above the gate: slim (orderkey, ship_µs, returnflag) triples
      hash-join the (orderkey, order_µs, is_high) projection — the one
      line-level exchange — then the same mask and partial counts.
    """
    lag_us = int(lag_days) * 86_400_000_000
    hi_set = set(high_priorities)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_shipdate", "l_returnflag"])
    n_orders = _table_nrows(sf_dir, "orders")
    out_schema = {"l_returnflag": "object", "high_line_count": "int64",
                  "low_line_count": "int64"}

    def ts_us(col) -> np.ndarray:
        return pc.cast(pc.cast(col, options=pc.CastOptions(
            target_type=pa.timestamp("us"), allow_time_truncate=True)),
            pa.int64()).to_numpy(zero_copy_only=False)

    def ord_slim(batch: pa.Table) -> pd.DataFrame:
        prio = batch.column("o_orderpriority").to_pylist()
        return pd.DataFrame({
            "o_orderkey": batch.column("o_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "order_us": ts_us(batch.column("o_orderdate")),
            "is_high": np.array([p in hi_set for p in prio], np.int64)})

    def count_fold(flags: np.ndarray, high: np.ndarray) -> pd.DataFrame:
        g = pd.DataFrame({"l_returnflag": flags,
                          "high_line_count": high,
                          "low_line_count": 1 - high}).groupby(
            "l_returnflag", as_index=False).sum()
        return g.astype(out_schema)

    if n_orders <= broadcast_limit:
        odf = orders.map_batches(ord_slim,
                                 batch_format="pyarrow").to_pandas()
        if "o_orderkey" not in odf.columns:
            odf = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                                "order_us": pd.Series(dtype="int64"),
                                "is_high": pd.Series(dtype="int64")})
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["order_us"].to_numpy(np.int64),
                        odf["is_high"].to_numpy(np.int64)))

        def partial(batch: pa.Table) -> pd.DataFrame:
            ok, ous, ohigh = ray.get(oref)
            if batch.num_rows == 0 or len(ok) == 0:
                return pd.DataFrame(
                    {k: pd.Series(dtype=v) for k, v in out_schema.items()})
            lkey = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            oi, hit = _ss_match(ok, lkey)
            late = hit & (ts_us(batch.column("l_shipdate"))
                          > ous[oi] + lag_us)
            flags = np.asarray(batch.column("l_returnflag").to_pylist(),
                               dtype=object)[late]
            return count_fold(flags, ohigh[oi][late])

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=131072).to_pandas()
    else:
        def li_slim(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame({
                "o_orderkey": batch.column("l_orderkey").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "ship_us": ts_us(batch.column("l_shipdate")),
                "l_returnflag": batch.column("l_returnflag").to_pylist()})

        joined = hash_join(
            li.map_batches(li_slim, batch_format="pyarrow",
                           batch_size=131072),
            orders.map_batches(ord_slim, batch_format="pyarrow"),
            key="o_orderkey",
            num_buckets=choose_partitions(n_orders, default=32),
            left_types={"o_orderkey": pa.int64(), "ship_us": pa.int64(),
                        "l_returnflag": pa.string()},
            right_types={"o_orderkey": pa.int64(), "order_us": pa.int64(),
                         "is_high": pa.int64()})

        def fold_block(df: pd.DataFrame) -> pd.DataFrame:
            late = (df["ship_us"].to_numpy(np.int64)
                    > df["order_us"].to_numpy(np.int64) + lag_us)
            return count_fold(df["l_returnflag"].to_numpy()[late],
                              df["is_high"].to_numpy(np.int64)[late])

        parts = joined.map_batches(fold_block,
                                   batch_format="pandas").to_pandas()

    if len(parts) == 0 or "l_returnflag" not in parts.columns:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in out_schema.items()})
    out = parts.groupby("l_returnflag", as_index=False).sum()
    return (out.astype(out_schema).sort_values("l_returnflag")
            .reset_index(drop=True))


def product_type_profit(sf_dir: str, *, name_contains: str = "red",
                        broadcast_limit: int = 2_000_000):
    """TPC-H Q9 shape (product-type profit, adapted): revenue from lines
    whose PART NAME contains a substring, grouped by (supplier nation,
    order year) — group keys drawn from TWO different dimension joins
    plus a string-containment build-side filter (the testdata carries no
    partsupp, so profit is the discounted-revenue rule rather than
    revenue − ps_supplycost·qty). Output (n_name, o_year, profit_cents)
    sorted by (nation, year).

    nation is driver-read. Tier gate is volume_shipping's:
    max(n_part, n_orders, n_supp) vs the limit.

    * under the gate: three broadcast sorted arrays — matching partkeys
      (keys only: the name filter runs once on the part scan, matches
      never re-ship), (suppkey → nationkey), (orderkey → year) — and
      ONE lineitem pass emitting ≤|nations|·n_years partials. Zero
      exchange.
    * above the gate: lines semi-join the matching partkeys (the part
      side ships deduped keys only), per-batch (orderkey, suppkey)
      revenue partials hash-join orders for the year, re-aggregate to
      (year, suppkey) — years×|supplier| bound — then the supplier join
      attaches the nation. Lines cross the wire twice (semi + orderkey
      join); the nation join never sees line-level rows.
    """
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    out_schema = {"n_name": "object", "o_year": "int64",
                  "profit_cents": "int64"}

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])
    n_part = _table_nrows(sf_dir, "part")
    n_orders = _table_nrows(sf_dir, "orders")
    n_supp = _table_nrows(sf_dir, "supplier")

    def part_match(batch: pa.Table) -> pd.DataFrame:
        m = pc.match_substring(batch.column("p_name"),
                               pattern=name_contains)
        keep = batch.filter(m)
        return pd.DataFrame({"p_partkey": keep.column("p_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)})

    def ord_slim(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": batch.column("o_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "o_year": pc.cast(pc.year(batch.column("o_orderdate")),
                              pa.int64()).to_numpy(zero_copy_only=False)})

    def li_cents(batch: pa.Table) -> pa.Array:
        return _cents(pc.multiply(batch.column("l_extendedprice"),
                                  pc.subtract(pa.scalar(1.0),
                                              batch.column("l_discount"))))

    def fold(parts: pd.DataFrame) -> pd.DataFrame:
        if len(parts) == 0 or "nkey" not in parts.columns:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in out_schema.items()})
        agg = parts.groupby(["nkey", "o_year"],
                            as_index=False)["profit_cents"].sum()
        out = pd.DataFrame({
            "n_name": agg["nkey"].map(nmap),
            "o_year": agg["o_year"],
            "profit_cents": agg["profit_cents"]})
        return (out.astype(out_schema)
                .sort_values(["n_name", "o_year"]).reset_index(drop=True))

    if max(n_part, n_orders, n_supp) <= broadcast_limit:
        pk = np.sort(part.map_batches(
            part_match, batch_format="pyarrow").to_pandas().get(
            "p_partkey", pd.Series(dtype="int64")).to_numpy(np.int64))
        sdf = supp.to_pandas().sort_values("s_suppkey")
        odf = (orders.map_batches(ord_slim, batch_format="pyarrow")
               .to_pandas().sort_values("o_orderkey"))
        bref = ray.put((pk,
                        sdf["s_suppkey"].to_numpy(np.int64),
                        sdf["s_nationkey"].to_numpy(np.int64),
                        odf["o_orderkey"].to_numpy(np.int64),
                        odf["o_year"].to_numpy(np.int64)))

        def partial(batch: pa.Table) -> pd.DataFrame:
            mk, sk, sn, ok, oy = ray.get(bref)
            empty = pd.DataFrame({"nkey": pd.Series(dtype="int64"),
                                  "o_year": pd.Series(dtype="int64"),
                                  "profit_cents": pd.Series(dtype="int64")})
            if batch.num_rows == 0 or not (len(mk) and len(sk) and len(ok)):
                return empty
            _, phit = _ss_match(mk, batch.column("l_partkey").to_numpy(
                zero_copy_only=False))
            if not phit.any():
                return empty
            si, shit = _ss_match(sk, batch.column("l_suppkey").to_numpy(
                zero_copy_only=False))
            oi, ohit = _ss_match(ok, batch.column("l_orderkey").to_numpy(
                zero_copy_only=False))
            keep = phit & shit & ohit
            g = pd.DataFrame({
                "nkey": sn[si][keep], "o_year": oy[oi][keep],
                "profit_cents": li_cents(batch).to_numpy(
                    zero_copy_only=False)[keep]}).groupby(
                ["nkey", "o_year"], as_index=False).sum()
            return g.astype({"nkey": "int64", "o_year": "int64",
                             "profit_cents": "int64"})

        return fold(li.map_batches(partial, batch_format="pyarrow",
                                   batch_size=131072).to_pandas())

    # ABOVE THE GATE
    nb = choose_partitions(max(n_orders, n_part), default=32)

    def li_slim(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": pc.cast(batch.column("l_partkey"),
                                           pa.int64()),
                      "o_orderkey": pc.cast(batch.column("l_orderkey"),
                                            pa.int64()),
                      "s_suppkey": pc.cast(batch.column("l_suppkey"),
                                           pa.int64()),
                      "cents": li_cents(batch)})
        return t

    li_f = semi_anti_join(
        li.map_batches(li_slim, batch_format="pyarrow", batch_size=131072),
        part.map_batches(part_match, batch_format="pyarrow"),
        left_key="l_partkey", right_key="p_partkey", num_buckets=nb,
        left_types={"l_partkey": pa.int64(), "o_orderkey": pa.int64(),
                    "s_suppkey": pa.int64(), "cents": pa.int64()})

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_orderkey", "s_suppkey"],
                       as_index=False)["cents"].sum()
        return g.astype({"o_orderkey": "int64", "s_suppkey": "int64",
                         "cents": "int64"})

    ol = hash_join(
        li_f.map_batches(li_partial, batch_format="pandas"),
        orders.map_batches(ord_slim, batch_format="pyarrow"),
        key="o_orderkey", num_buckets=nb, coalesce_blocks=nb,
        left_types={"o_orderkey": pa.int64(), "s_suppkey": pa.int64(),
                    "cents": pa.int64()},
        right_types={"o_orderkey": pa.int64(), "o_year": pa.int64()})

    def ys_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_year", "s_suppkey"],
                       as_index=False)["cents"].sum()
        return g.astype({"o_year": "int64", "s_suppkey": "int64",
                         "cents": "int64"})

    sb = choose_partitions(n_supp, default=16)
    ysn = hash_join(
        ol.map_batches(ys_partial, batch_format="pandas"),
        supp.map_batches(
            lambda df: df[["s_suppkey", "s_nationkey"]].astype("int64"),
            batch_format="pandas"),
        key="s_suppkey", num_buckets=sb, coalesce_blocks=sb,
        left_types={"o_year": pa.int64(), "s_suppkey": pa.int64(),
                    "cents": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})

    def block_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.rename(columns={"s_nationkey": "nkey",
                               "cents": "profit_cents"}).groupby(
            ["nkey", "o_year"], as_index=False)["profit_cents"].sum()
        return g.astype({"nkey": "int64", "o_year": "int64",
                         "profit_cents": "int64"})

    return fold(ysn.map_batches(block_fold,
                                batch_format="pandas").to_pandas())


def forecast_revenue(sf_dir: str, *, date_from: str = "1996-01-01",
                     date_to: str = "1997-01-01", pct_center: int = 5,
                     pct_tol: int = 1, max_qty: float = 24.0):
    """TPC-H Q6 shape (forecast revenue change): revenue that WOULD have
    been kept had discounts in a band been waived — a pure
    filter-aggregate, the cheapest possible distributed query: one
    column-pruned lineitem pass, ≤(2·tol+1)-row partials, no exchange.
    Output (discount_pct, revenue_cents, n_lines) per discount percent
    in the band, sorted by pct; revenue is extendedprice·discount cents
    (grouping by pct keeps the output hash-discriminating where real
    Q6's single scalar would be one opaque number).

    Discounts in the corpus are exact hundredths, so the band test runs
    on round(discount·100) ints — no float-tolerance fudge (real Q6's
    ``BETWEEN 0.05 - 0.01 AND 0.05 + 0.01`` exists to dodge exactly the
    binary-representation issue this sidesteps).
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()
    p_lo, p_hi = pct_center - pct_tol, pct_center + pct_tol
    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])
    out_schema = {"discount_pct": "int64", "revenue_cents": "int64",
                  "n_lines": "int64"}

    def partial(batch: pa.Table) -> pd.DataFrame:
        ship = batch.column("l_shipdate")
        pct = pc.cast(pc.round(pc.multiply(batch.column("l_discount"),
                                           pa.scalar(100.0))), pa.int64())
        keep = pc.and_(pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)),
            pc.less(ship, pa.scalar(hi))), pc.and_(
            pc.and_(pc.greater_equal(pct, pa.scalar(p_lo)),
                    pc.less_equal(pct, pa.scalar(p_hi))),
            pc.less(batch.column("l_quantity"), pa.scalar(float(max_qty)))))
        pctk = pct.filter(keep).to_numpy(zero_copy_only=False)
        kept = batch.filter(keep)
        cents = _cents(pc.multiply(kept.column("l_extendedprice"),
                                   kept.column("l_discount"))).to_numpy(
            zero_copy_only=False)
        g = pd.DataFrame({"discount_pct": pctk,
                          "revenue_cents": cents}).groupby(
            "discount_pct", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"),
            n_lines=("revenue_cents", "size"))
        return g.astype(out_schema)

    parts = li.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072).to_pandas()
    if len(parts) == 0 or "discount_pct" not in parts.columns:
        return pd.DataFrame({k: pd.Series(dtype=v)
                             for k, v in out_schema.items()})
    out = parts.groupby("discount_pct", as_index=False).sum()
    return (out.astype(out_schema).sort_values("discount_pct")
            .reset_index(drop=True))


def best_supplier_per_part(sf_dir: str, *, size: int = 3,
                           region: str = "ASIA", k: int = 100,
                           broadcast_limit: int = 2_000_000):
    """TPC-H Q2 shape (min-cost supplier, adapted): for every part of a
    given size, the best in-region supplier that actually shipped it —
    an argmax-per-group THROUGH a join (the testdata carries no
    partsupp, so distinct (l_partkey, l_suppkey) pairs from lineitem are
    the supply relation and max s_acctbal stands in for min
    ps_supplycost). Ties break to the smallest s_suppkey; output is the
    deterministic top-``k`` rows (p_partkey, s_suppkey, s_name, n_name,
    acctbal_cents) ordered by (acctbal_cents DESC, p_partkey).

    nation/region are driver-read. The supply pairs are deduped PER
    BATCH before anything moves, and both filters (part size, supplier
    region) land before the pair exchange, so only qualifying distinct
    pairs ever ship.

    * under the gate: broadcast sorted size-matched partkeys and the
      in-region supplier attributes; per-batch argmax partials fold on
      the driver (bounded by matched parts — driver-safe exactly when
      the gate holds).
    * above the gate: filtered pairs coarse-partition by l_partkey — a
      part's candidates land in ONE partition, so the per-partition
      argmax is global — then a ≤1-row-per-part top-k fold.
    """
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"].astype(int))
    nat_in = nat.loc[nat["n_regionkey"].isin(rkeys)]
    nmap = dict(zip(nat_in["n_nationkey"].astype(int), nat_in["n_name"]))
    out_schema = {"p_partkey": "int64", "s_suppkey": "int64",
                  "s_name": "object", "n_name": "object",
                  "acctbal_cents": "int64"}

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in out_schema.items()})

    if not nmap:
        return empty_out()

    part = _read(sf_dir, "part", columns=["p_partkey", "p_size"])
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    n_part = _table_nrows(sf_dir, "part")
    n_supp = _table_nrows(sf_dir, "supplier")

    def part_match(batch: pa.Table) -> pd.DataFrame:
        keep = batch.filter(pc.equal(batch.column("p_size"),
                                     pa.scalar(int(size))))
        return pd.DataFrame({"p_partkey": keep.column("p_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)})

    supp_types = {"s_suppkey": "int64", "s_name": "object",
                  "n_name": "object", "acctbal_cents": "int64"}

    def supp_slim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["s_nationkey"].isin(nmap)]
        if len(df) == 0:  # typed empty: a mapped empty object column
            return pd.DataFrame({c: pd.Series(dtype=t)  # confuses Ray's
                                 for c, t in supp_types.items()})  # sizer
        out = pd.DataFrame({
            "s_suppkey": df["s_suppkey"].to_numpy(np.int64),
            "s_name": df["s_name"].to_numpy(),
            "n_name": df["s_nationkey"].map(nmap).to_numpy(),
            "acctbal_cents": _cents(pa.array(
                df["s_acctbal"], type=pa.float64())).to_numpy(
                zero_copy_only=False)})
        return out.astype(supp_types)

    def argmax_per_part(df: pd.DataFrame) -> pd.DataFrame:
        """One winner row per part: max acctbal, ties → min suppkey.
        Shape-independent: sorts and groups by the real key."""
        if len(df) == 0:
            return empty_out()
        df = df.sort_values(["p_partkey", "acctbal_cents", "s_suppkey"],
                            ascending=[True, False, True])
        df = df.drop_duplicates("p_partkey", keep="first")
        return df[list(out_schema)].astype(out_schema)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = argmax_per_part(df)
        df = df.sort_values(["acctbal_cents", "p_partkey"],
                            ascending=[False, True]).head(k)
        return df.reset_index(drop=True)

    if max(n_part, n_supp) <= broadcast_limit:
        pk = np.sort(part.map_batches(
            part_match, batch_format="pyarrow").to_pandas().get(
            "p_partkey", pd.Series(dtype="int64")).to_numpy(np.int64))
        sdf = (supp.map_batches(supp_slim, batch_format="pandas")
               .to_pandas())
        if "s_suppkey" not in sdf.columns:
            return empty_out()
        sdf = sdf.sort_values("s_suppkey").reset_index(drop=True)
        bref = ray.put((pk, sdf["s_suppkey"].to_numpy(np.int64),
                        sdf["acctbal_cents"].to_numpy(np.int64),
                        sdf["s_name"].to_numpy(), sdf["n_name"].to_numpy()))

        def partial(batch: pa.Table) -> pd.DataFrame:
            mk, sk, sb, sn, nn = ray.get(bref)
            if batch.num_rows == 0 or len(mk) == 0 or len(sk) == 0:
                return empty_out()
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            ls = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            _, phit = _ss_match(mk, lp)
            si, shit = _ss_match(sk, ls)
            keep = phit & shit
            cand = pd.DataFrame({
                "p_partkey": lp[keep], "s_suppkey": ls[keep],
                "s_name": sn[si][keep], "n_name": nn[si][keep],
                "acctbal_cents": sb[si][keep]}).drop_duplicates(
                ["p_partkey", "s_suppkey"])
            return argmax_per_part(cand)

        parts = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=131072).to_pandas()
        if len(parts) == 0 or "p_partkey" not in parts.columns:
            return empty_out()
        return final(parts)

    # ABOVE THE GATE — pair dedup per batch, then partkey co-location
    def li_pairs(batch: pa.Table) -> pd.DataFrame:
        pairs = pd.DataFrame({
            "l_partkey": batch.column("l_partkey").to_numpy(
                zero_copy_only=False),
            "s_suppkey": batch.column("l_suppkey").to_numpy(
                zero_copy_only=False)}).drop_duplicates()
        return pairs.astype({"l_partkey": "int64", "s_suppkey": "int64"})

    pairs_f = semi_anti_join(
        li.map_batches(li_pairs, batch_format="pyarrow",
                       batch_size=131072),
        part.map_batches(part_match, batch_format="pyarrow"),
        left_key="l_partkey", right_key="p_partkey",
        num_buckets=choose_partitions(n_part, default=32),
        left_types={"l_partkey": pa.int64(), "s_suppkey": pa.int64()})

    cand = hash_join(
        pairs_f, supp.map_batches(supp_slim, batch_format="pandas"),
        key="s_suppkey",
        num_buckets=choose_partitions(n_supp, default=16),
        left_types={"l_partkey": pa.int64(), "s_suppkey": pa.int64()},
        right_types={"s_suppkey": pa.int64(), "s_name": pa.string(),
                     "n_name": pa.string(), "acctbal_cents": pa.int64()})

    winners = coarse_partition_apply(
        cand.map_batches(
            lambda df: df.rename(columns={"l_partkey": "p_partkey"}),
            batch_format="pandas"),
        lambda g: argmax_per_part(g.drop_duplicates(
            ["p_partkey", "s_suppkey"])),
        key_col="p_partkey", part_col="q2_part",
        num_parts=choose_partitions(n_part, default=32),
        nrows=None).to_pandas()
    if len(winners) == 0 or "p_partkey" not in winners.columns:
        return empty_out()
    return final(winners)


def waiting_suppliers(sf_dir: str, *, nation: str = "NATION_2",
                      lag_days: int = 60, k: int = 100,
                      broadcast_limit: int = 2_000_000):
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted):
    suppliers in one nation who were the ONLY late supplier on a
    multi-supplier order — EXISTS (another supplier on the order) plus
    NOT EXISTS (another LATE supplier) evaluated inside per-order
    groups (lateness is shipdate > orderdate + ``lag_days``; the
    testdata has no l_commitdate/l_receiptdate). Output
    (s_suppkey, s_name, numwait) — numwait = qualifying orders — top
    ``k`` by (numwait DESC, s_suppkey), deterministic.

    All lines of an order must be judged together, so lines
    coarse-partition by l_orderkey (each order lands whole in one
    partition; the kernel's per-order verdict is global). The verdict
    is vectorized: per order, the distinct-supplier count and the
    distinct-LATE-supplier set; exactly-one-late × ≥2-suppliers wins.
    The nation filter applies to the WINNER only (other suppliers on
    the order may be anywhere), so it lands after the kernel, on
    ≤1-row-per-order partials.

    * under the gate: (o_orderkey → order_µs) broadcast attaches
      lateness inside the lineitem read; only (orderkey, suppkey, late)
      triples — deduped per batch — enter the one exchange.
    * above the gate: the same triples hash-join the orders projection
      first, then the identical partition + kernel.
    """
    lag_us = int(lag_days) * 86_400_000_000
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    target_nk = set(nat.loc[nat["n_name"] == nation,
                            "n_nationkey"].astype(int))
    out_schema = {"s_suppkey": "int64", "s_name": "object",
                  "numwait": "int64"}

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in out_schema.items()})

    if not target_nk:
        return empty_out()

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    n_orders = _table_nrows(sf_dir, "orders")

    def ts_us(col) -> np.ndarray:
        return pc.cast(pc.cast(col, options=pc.CastOptions(
            target_type=pa.timestamp("us"), allow_time_truncate=True)),
            pa.int64()).to_numpy(zero_copy_only=False)

    def ord_slim(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": batch.column("o_orderkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "order_us": ts_us(batch.column("o_orderdate"))})

    if n_orders <= broadcast_limit:
        odf = (orders.map_batches(ord_slim, batch_format="pyarrow")
               .to_pandas())
        if "o_orderkey" not in odf.columns:
            return empty_out()
        odf = odf.sort_values("o_orderkey")
        oref = ray.put((odf["o_orderkey"].to_numpy(np.int64),
                        odf["order_us"].to_numpy(np.int64)))

        def triple(batch: pa.Table) -> pd.DataFrame:
            ok, ous = ray.get(oref)
            empty = pd.DataFrame({"l_orderkey": pd.Series(dtype="int64"),
                                  "l_suppkey": pd.Series(dtype="int64"),
                                  "late": pd.Series(dtype="int64")})
            if batch.num_rows == 0 or len(ok) == 0:
                return empty
            key = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            oi, hit = _ss_match(ok, key)
            t = pd.DataFrame({
                "l_orderkey": key[hit],
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False)[hit],
                "late": (ts_us(batch.column("l_shipdate"))[hit]
                         > ous[oi][hit] + lag_us).astype(np.int64)})
            # max-dedup: a (order, supplier) pair is late iff ANY of its
            # lines is late; keeping one row per pair per batch bounds
            # the exchange by distinct pairs, not line count
            t = t.groupby(["l_orderkey", "l_suppkey"],
                          as_index=False)["late"].max()
            return t.astype({"l_orderkey": "int64", "l_suppkey": "int64",
                             "late": "int64"})

        triples = li.map_batches(triple, batch_format="pyarrow",
                                 batch_size=131072)
    else:
        def li_slim(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame({
                "o_orderkey": batch.column("l_orderkey").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "ship_us": ts_us(batch.column("l_shipdate"))})

        joined = hash_join(
            li.map_batches(li_slim, batch_format="pyarrow",
                           batch_size=131072),
            orders.map_batches(ord_slim, batch_format="pyarrow"),
            key="o_orderkey",
            num_buckets=choose_partitions(n_orders, default=32),
            left_types={"o_orderkey": pa.int64(), "l_suppkey": pa.int64(),
                        "ship_us": pa.int64()},
            right_types={"o_orderkey": pa.int64(), "order_us": pa.int64()})

        def to_triple(df: pd.DataFrame) -> pd.DataFrame:
            t = pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "l_suppkey": df["l_suppkey"].to_numpy(np.int64),
                "late": (df["ship_us"].to_numpy(np.int64)
                         > df["order_us"].to_numpy(np.int64)
                         + lag_us).astype(np.int64)})
            t = t.groupby(["l_orderkey", "l_suppkey"],
                          as_index=False)["late"].max()
            return t.astype({"l_orderkey": "int64", "l_suppkey": "int64",
                             "late": "int64"})

        triples = joined.map_batches(to_triple, batch_format="pandas")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        """Per order: ≥2 distinct suppliers, exactly one late → +1 for
        that supplier. Pairs may repeat across input batches, so re-max
        per (order, supplier) first; shape-independent by orderkey."""
        if len(g) == 0:
            return pd.DataFrame({"s_suppkey": pd.Series(dtype="int64"),
                                 "numwait": pd.Series(dtype="int64")})
        p = g.groupby(["l_orderkey", "l_suppkey"],
                      as_index=False)["late"].max()
        agg = p.groupby("l_orderkey").agg(
            ns=("l_suppkey", "size"), nl=("late", "sum"))
        good = set(agg.index[(agg["ns"] >= 2) & (agg["nl"] == 1)])
        w = p.loc[(p["late"] == 1) & p["l_orderkey"].isin(good)]
        out = w.groupby("l_suppkey", as_index=False).size().rename(
            columns={"l_suppkey": "s_suppkey", "size": "numwait"})
        return out.astype({"s_suppkey": "int64", "numwait": "int64"})

    parts = coarse_partition_apply(
        triples, kernel, key_col="l_orderkey", part_col="q21_part",
        num_parts=choose_partitions(n_orders, default=32),
        nrows=None).to_pandas()
    if len(parts) == 0 or "s_suppkey" not in parts.columns:
        return empty_out()
    wait = parts.groupby("s_suppkey", as_index=False)["numwait"].sum()

    def supp_pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.loc[df["s_nationkey"].isin(target_nk),
                    ["s_suppkey", "s_name"]]
        return df.astype({"s_suppkey": "int64", "s_name": "object"})

    names = (supp.map_batches(supp_pick, batch_format="pandas")
             .to_pandas())
    if "s_suppkey" not in names.columns:
        return empty_out()
    out = wait.merge(names, on="s_suppkey", how="inner")
    out = out.sort_values(["numwait", "s_suppkey"],
                          ascending=[False, True]).head(k)
    return (out[list(out_schema)].astype(out_schema)
            .reset_index(drop=True))


def part_promotion_suppliers(sf_dir: str, *, name_prefix: str = "small",
                             nation: str = "NATION_2",
                             date_from: str = "1996-01-01",
                             date_to: str = "1997-01-01",
                             min_qty: int = 50,
                             broadcast_limit: int = 2_000_000):
    """TPC-H Q20 shape (potential part promotion, adapted): suppliers in
    one nation who shipped MORE than ``min_qty`` total units of SOME
    part whose name starts with ``name_prefix``, inside a date window —
    a nested EXISTS through a two-key group-sum (the testdata has no
    partsupp, so "shipped > threshold" stands in for "availqty > half
    of shipped"). Output (s_suppkey, s_name) sorted by suppkey.

    The per-(supplier, part) quantity must be global before the
    threshold test, so window+prefix-filtered (suppkey, partkey, qty)
    partials — pre-summed per batch — coarse-partition by l_suppkey:
    all of a supplier's pairs land in one partition, the per-partition
    pair sums are global, and each partition emits its qualifying
    DISTINCT suppkeys only (≤1 row per supplier leaves the kernel).
    The nation filter and the name attach ride the supplier scan with
    the winner set broadcast — supplier never shuffles.

    * under the gate: matching partkeys broadcast sorted (keys only).
    * above the gate: the filtered partials semi-join the matching
      partkeys first (keys-only exchange), then the same partition.
    """
    lo = pd.Timestamp(date_from).to_pydatetime()
    hi = pd.Timestamp(date_to).to_pydatetime()
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    target_nk = set(nat.loc[nat["n_name"] == nation,
                            "n_nationkey"].astype(int))
    out_schema = {"s_suppkey": "int64", "s_name": "object"}

    def empty_out() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in out_schema.items()})

    if not target_nk:
        return empty_out()

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_nationkey"])
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])
    n_part = _table_nrows(sf_dir, "part")
    n_supp = _table_nrows(sf_dir, "supplier")

    def part_match(batch: pa.Table) -> pd.DataFrame:
        keep = batch.filter(pc.starts_with(batch.column("p_name"),
                                           pattern=name_prefix))
        return pd.DataFrame({"p_partkey": keep.column("p_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)})

    def li_window(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate")
        return batch.filter(pc.and_(
            pc.greater_equal(ship, pa.scalar(lo)),
            pc.less(ship, pa.scalar(hi))))

    def pair_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_suppkey", "l_partkey"],
                       as_index=False)["q"].sum()
        return g.astype({"l_suppkey": "int64", "l_partkey": "int64",
                         "q": "int64"})

    if n_part <= broadcast_limit:
        pk = np.sort(part.map_batches(
            part_match, batch_format="pyarrow").to_pandas().get(
            "p_partkey", pd.Series(dtype="int64")).to_numpy(np.int64))
        pref = ray.put(pk)

        def partial(batch: pa.Table) -> pd.DataFrame:
            mk = ray.get(pref)
            batch = li_window(batch)
            if batch.num_rows == 0 or len(mk) == 0:
                return pd.DataFrame({
                    "l_suppkey": pd.Series(dtype="int64"),
                    "l_partkey": pd.Series(dtype="int64"),
                    "q": pd.Series(dtype="int64")})
            lp = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            _, hit = _ss_match(mk, lp)
            return pair_sum(pd.DataFrame({
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False)[hit],
                "l_partkey": lp[hit],
                "q": pc.cast(pc.round(batch.column("l_quantity")),
                             pa.int64()).to_numpy(
                    zero_copy_only=False)[hit]}))

        pairs = li.map_batches(partial, batch_format="pyarrow",
                               batch_size=131072)
    else:
        def li_slim(batch: pa.Table) -> pd.DataFrame:
            batch = li_window(batch)
            return pair_sum(pd.DataFrame({
                "l_suppkey": batch.column("l_suppkey").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "l_partkey": batch.column("l_partkey").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "q": pc.cast(pc.round(batch.column("l_quantity")),
                             pa.int64()).to_numpy(zero_copy_only=False)}))

        pairs = semi_anti_join(
            li.map_batches(li_slim, batch_format="pyarrow",
                           batch_size=131072),
            part.map_batches(part_match, batch_format="pyarrow"),
            left_key="l_partkey", right_key="p_partkey",
            num_buckets=choose_partitions(n_part, default=32),
            left_types={"l_suppkey": pa.int64(), "l_partkey": pa.int64(),
                        "q": pa.int64()})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = pair_sum(g[["l_suppkey", "l_partkey", "q"]])
        win = g.loc[g["q"] > int(min_qty), "l_suppkey"].drop_duplicates()
        return pd.DataFrame({"s_suppkey": win.to_numpy(np.int64)})

    winners = coarse_partition_apply(
        pairs, kernel, key_col="l_suppkey", part_col="q20_part",
        num_parts=choose_partitions(n_supp, default=32),
        nrows=None).to_pandas()
    if len(winners) == 0 or "s_suppkey" not in winners.columns:
        return empty_out()
    wk = np.sort(winners["s_suppkey"].drop_duplicates().to_numpy(np.int64))
    wref = ray.put(wk)

    def supp_pick(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(wref)
        df = df.loc[df["s_nationkey"].isin(target_nk)]
        if len(df) == 0 or len(ks) == 0:
            return empty_out()
        _, hit = _ss_match(ks, df["s_suppkey"].to_numpy(np.int64))
        out = df.loc[hit, ["s_suppkey", "s_name"]]
        return out.astype(out_schema)

    names = (supp.map_batches(supp_pick, batch_format="pandas")
             .to_pandas())
    if "s_suppkey" not in names.columns:
        return empty_out()
    return (names.astype(out_schema).sort_values("s_suppkey")
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) — dominance pruning as a distributed operator
# ---------------------------------------------------------------------------

def skyline2d_max(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Survivor mask of the 2-D maximize-both Pareto frontier.

    A point p is DOMINATED iff some q has q.a >= p.a and q.b >= p.b with
    at least one strict; exact duplicates dominate nothing and all
    survive.  O(n log n): sort by (a desc, b desc); within an equal-`a`
    run the run's max-`b` leader dominates the rest, and across runs a
    point must beat the running max `b` of every strictly-greater-`a`
    run.  Comparisons only (no arithmetic), so float64 `a` read from
    parquet is bit-exact vs a SQL NOT-EXISTS oracle.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-b, -a))
    av, bv = a[order], b[order]
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = av[1:] != av[:-1]
    run_id = np.cumsum(new_run) - 1
    leaders = bv[new_run]                      # max b of each a-run
    leader_b = leaders[run_id]
    run_cummax = np.maximum.accumulate(leaders)
    strict_max = np.empty(n, dtype=bv.dtype)
    has_prev = run_id > 0
    strict_max[:] = np.iinfo(np.int64).min if bv.dtype.kind == "i" \
        else -np.inf
    strict_max[has_prev] = run_cummax[run_id[has_prev] - 1]
    survive_sorted = (bv == leader_b) & (bv > strict_max)
    mask = np.zeros(n, dtype=bool)
    mask[order] = survive_sorted
    return mask


def order_skyline(sf_dir: str):
    """Per-priority Pareto frontier (skyline) of orders over
    (o_totalprice, o_orderdate), both maximized: an order survives iff no
    same-priority order is at least as expensive AND at least as recent
    with one strict — the classic "best trade-offs" query relational
    engines express as a quadratic NOT EXISTS.

    Scale shape: dominance is TRANSITIVE, so local pruning is safe — a
    point dominated inside one block is dominated globally, and the
    frontier of a union is a subset of the union of frontiers.  Each
    block therefore emits only its local frontier (O(k) rows, k =
    frontier size, typically ≪ block) via one vectorized O(n log n)
    kernel, and the only exchange is a per-priority map_groups over the
    pruned partials — frontiers move, never the table.  At 100 TB the
    reduce side stays tiny as long as per-group frontiers do (true for
    anti-correlated-free TPC-H-ish data); a pathological frontier would
    surface as a fat group, not silent corruption.

    Returns (o_orderpriority, o_orderkey, o_totalprice, o_orderdate_us),
    dates as epoch-µs int64 (house timestamp carrier).
    """
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority",
                                          "o_totalprice", "o_orderdate"])
    out_types = {"o_orderpriority": "object", "o_orderkey": "int64",
                 "o_totalprice": "float64", "o_orderdate_us": "int64"}

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for pri, g in batch.groupby("o_orderpriority", sort=False):
            price = g["o_totalprice"].to_numpy()
            date = ts_int_us(g["o_orderdate"])
            m = skyline2d_max(price, date)
            outs.append(pd.DataFrame({
                "o_orderpriority": g["o_orderpriority"].to_numpy()[m],
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64)[m],
                "o_totalprice": price[m],
                "o_orderdate_us": date[m]}))
        if not outs:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in out_types.items()})
        return pd.concat(outs, ignore_index=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        m = skyline2d_max(g["o_totalprice"].to_numpy(),
                          g["o_orderdate_us"].to_numpy(np.int64))
        return g.loc[m, list(out_types)].astype(
            {"o_orderkey": "int64", "o_orderdate_us": "int64"})

    pruned = ds.map_batches(local, batch_format="pandas", batch_size=8192)
    # frontiers are tiny; collapse to a few blocks before the 5-value
    # groupby — sort ranges equal input blocks, and dozens of pruned
    # partial blocks over 5 priorities would leave most ranges as
    # schemaless empties (the house _keyed_groups rule)
    return pruned.repartition(2).groupby("o_orderpriority").map_groups(
        final, batch_format="pandas")


def customer_order_trend(sf_dir: str, num_parts: int | None = None):
    """Per-customer spending TREND: the least-squares slope of order
    price (cents) against order day, carried as an exact integer
    rational — (slope_num, slope_den) with slope = num/den — so the
    distributed answer hashes bit-equal against SQL (a float slope would
    differ in the last ulp by summation order).

    num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², x = epoch-day, y = cents.
    Customers with n < 2 or zero day-variance (den = 0, slope undefined)
    are dropped. int64 bounds: |num| ≤ n·max|xy| + |Σx·Σy| ≈ n²·(2·10⁴ ·
    6·10⁷) — safe through n ≈ 50 000 orders per customer, far past any
    real key; beyond that the partials would widen to object-dtype
    Python ints, not change shape.

    Scale shape: the canonical partial-aggregation pattern — each block
    folds to one (custkey, n, Σx, Σy, Σxy, Σx²) row per customer seen
    (C-speed pandas groupby), the house group-sum folds partials, and
    the slope math runs on the tiny aggregate. Payload never shuffles.
    """
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice", "o_orderdate"])
    _DAY_US = 86_400_000_000

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        x = (ts_int_us(g["o_orderdate"]) // _DAY_US).astype(np.int64)
        y = np.round(g["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"o_custkey": g["o_custkey"].to_numpy(np.int64),
                           "n": np.int64(1), "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x})
        return df.groupby("o_custkey", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    summed = partitioned_group_sum(
        partials, key="o_custkey",
        sum_cols={"n": "n", "sx": "sx", "sy": "sy",
                  "sxy": "sxy", "sxx": "sxx"})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        sx = df["sx"].to_numpy(np.int64)
        sy = df["sy"].to_numpy(np.int64)
        num = n * df["sxy"].to_numpy(np.int64) - sx * sy
        den = n * df["sxx"].to_numpy(np.int64) - sx * sx
        keep = (n >= 2) & (den > 0)
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64)[keep],
            "n_orders": n[keep],
            "slope_num": num[keep],
            "slope_den": den[keep]})

    return summed.map_batches(finish, batch_format="pandas")


def user_activity_coverage(sf_dir: str, span_minutes: int = 15,
                           num_parts: int = 64):
    """Interval-UNION measure per user — the gaps-and-islands operator:
    each event opens a [ts, ts + span) activity interval; overlapping /
    touching intervals merge, and the answer is each user's merged
    island count and total covered µs. (Distinct from sessionization:
    sessions COUNT gap-separated runs; this measures the union of a
    fixed-width cover — the dominant shape for billing windows, uptime
    and crawl-budget accounting.)

    Scale shape: one coarse user-hash exchange; inside a partition the
    whole sweep is vectorized (grouped running max of interval ends,
    island starts where start > previous running max, then two C-speed
    groupbys). Partitioning assumption: a user never spans partitions.
    Intervals are integer µs end-to-end, so the SQL window-function
    oracle matches exactly. Touching intervals (start == previous max
    end) MERGE (closed-open abutment), matching the `s > prev_max`
    island test on both sides."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    span_us = span_minutes * 60_000_000

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_islands": pd.Series(dtype="int64"),
                                 "covered_us": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        s = ts_int_us(g["ts"])
        e = s + span_us
        run_max = pd.Series(e).groupby(u).cummax()
        prev_max = run_max.shift(1).to_numpy()
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        new_island = new_user | (s > prev_max)
        island = np.cumsum(new_island)
        isl = pd.DataFrame({"user_id": u, "island": island,
                            "s": s, "e": e}).groupby(
            ["user_id", "island"], as_index=False).agg(
            s=("s", "min"), e=("e", "max"))
        out = isl.assign(cover=isl["e"] - isl["s"]).groupby(
            "user_id", as_index=False).agg(
            n_islands=("island", "size"), covered_us=("cover", "sum"))
        return out.astype({"user_id": "int64", "n_islands": "int64",
                           "covered_us": "int64"})

    return coarse_partition_apply(ds, kernel, key_col="user_id",
                                  part_col="cov_part", num_parts=num_parts,
                                  nrows=_table_nrows(sf_dir, "events"))


def event_type_affinity(sf_dir: str, num_parts: int = 64):
    """Market-basket pair support — the A-priori first pass: for every
    unordered event-type pair {a, b}, how many distinct users triggered
    BOTH (plus each type's single support), enough to compute
    lift/confidence downstream without refolding the log.

    Scale shape: one coarse user-hash exchange; per partition, each
    user's distinct type set (C-speed drop_duplicates) explodes to its
    unordered pairs and folds to (pair, n) partials BEFORE leaving the
    task — the exchange that follows is bounded by |alphabet|² per
    partition, not by users. Pair counts then fold through the house
    group-sum. Alphabet blow-up is the operator's real scale limit
    (10⁴ types → 5·10⁷ pairs) and is documented here rather than
    silently sampled; the event_type alphabet is product-bounded.
    Returns (type_a, type_b, n_users), type_a < type_b lexically.
    """
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        ut = g.drop_duplicates(["user_id", "event_type"])
        out_a, out_b = [], []
        for _, sub in ut.groupby("user_id", sort=False):
            ts = sorted(sub["event_type"])
            for i in range(len(ts) - 1):
                for j in range(i + 1, len(ts)):
                    out_a.append(ts[i])
                    out_b.append(ts[j])
        df = pd.DataFrame({"type_a": out_a, "type_b": out_b})
        agg = df.groupby(["type_a", "type_b"], as_index=False).size()
        if not len(agg):
            # typed empty frame: an untyped empty object column becomes a
            # null-typed Arrow block and poisons the group-sum schema
            return pd.DataFrame({"pair": pd.Series(dtype="string"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "pair": agg["type_a"] + "\x1f" + agg["type_b"],
            "n": agg["size"].astype("int64")})

    partials = coarse_partition_apply(ds, partial, key_col="user_id",
                                      part_col="aff_part",
                                      num_parts=num_parts,
                                      nrows=_table_nrows(sf_dir, "events"))
    # partials are alphabet²-bounded (slim (pair, n) rows), so counting
    # them is cheap at any scale and lets the group-sum size its exchange
    # to the data — the default width over a ~45-pair alphabet scattered
    # the sort into schemaless empty ranges (the _keyed_groups mechanism)
    partials = partials.materialize()
    summed = partitioned_group_sum(partials, key="pair",
                                   sum_cols={"n_users": "n"},
                                   nrows=partials.count())

    def split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["pair"].str.split("\x1f", n=1, expand=True)
        return pd.DataFrame({"type_a": parts[0], "type_b": parts[1],
                             "n_users": df["n_users"].astype("int64")})

    return summed.map_batches(split, batch_format="pandas")

"""Relational demo pipelines over the TPC-H-ish tables — the engine's
general query surface (filter / groupby-aggregate / sort-limit / broadcast
join / shuffle hash join), each with an exact DuckDB SQL oracle.

Scale notes baked in:
  * columns pruned at the read (``read_parquet(columns=...)``);
  * predicates pushed into the read where possible;
  * aggregations use Ray Data's native partial-aggregate groupby (combiner
    before the exchange);
  * small dimension tables are broadcast driver-side (ray.put / plain
    capture), never shuffle-joined;
  * the one genuinely big join (lineitem x orders) uses Dataset.join's
    partitioned hash join.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _round2(x: float) -> float:
    # DuckDB ROUND is half-away-from-zero; emulate for non-negative values
    import math

    return math.floor(x * 100 + 0.5) / 100 if x >= 0 else -math.floor(-x * 100 + 0.5) / 100


def _round_nd(x: float, nd: int) -> float:
    """DuckDB half-away-from-zero ROUND(x, nd) for signed values."""
    import math

    s = 10.0 ** nd
    return math.floor(x * s + 0.5) / s if x >= 0 else -math.floor(-x * s + 0.5) / s


def _read(sf_dir: str, table: str, columns=None, **kw) -> ray.data.Dataset:
    from ..sources.readers import read_table

    return read_table(sf_dir, table, columns, **kw)


def _join_partitions(*dss: ray.data.Dataset) -> int:
    """Shuffle-join partition count derived from input bytes (~64 MB per
    partition), capped at 16x cluster CPUs.  Ray's hash join spawns one
    aggregator ACTOR per partition, so the count must track data size, not
    cluster width — 32 partitions on an 18 MB join costs ~6 s of actor
    spawn for nothing (measured), while a constant would be a straggler
    factory at 100x the data."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    try:
        total = sum(d.size_bytes() or 0 for d in dss)
    except Exception:
        total = 0
    return int(max(4, min(total // (64 << 20), 16 * cpus)))


def agg_pricing(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def add_disc(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(batch.column("l_extendedprice"),
                           pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return batch.append_column("disc_price", disc)

    agg = (ds.map_batches(add_disc, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("l_quantity"), Sum("l_extendedprice"),
                        Sum("disc_price"), Count()))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pa.array([_round2(v) for v in batch.column("sum(l_quantity)").to_pylist()]),
            "sum_base_price": pa.array([_round2(v) for v in batch.column("sum(l_extendedprice)").to_pylist()]),
            "sum_disc_price": pa.array([_round2(v) for v in batch.column("sum(disc_price)").to_pylist()]),
            "count_order": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def top_orders(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Sort + limit: the n most expensive orders."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    top = ds.sort(key=["o_totalprice", "o_orderkey"], descending=[True, False]).limit(n)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_custkey": batch.column("o_custkey"),
            "total_price": pa.array([_round2(v) for v in batch.column("o_totalprice").to_pylist()]),
        })

    return top.map_batches(finish, batch_format="pyarrow")


def cust_revenue(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Groupby + broadcast dimension join + top-n: revenue per customer."""
    agg = (_read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
           .groupby("o_custkey").aggregate(Sum("o_totalprice"), Count()))
    # customer is a small dimension: load once driver-side, capture in the task
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"])
    names = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist()))
    names_ref = ray.put(names)

    def finish(batch: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        keys = batch.column("o_custkey").to_pylist()
        return pa.table({
            "c_custkey": pa.array(keys, type=pa.int64()),
            "c_name": pa.array([nm.get(k, "") for k in keys], type=pa.string()),
            "revenue": pa.array([_round2(v) for v in batch.column("sum(o_totalprice)").to_pylist()]),
            "n_orders": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
        })

    return (agg.map_batches(finish, batch_format="pyarrow")
               .sort(key=["revenue", "c_custkey"], descending=[True, False])
               .limit(n))


def events_by_type(sf_dir: str) -> ray.data.Dataset:
    agg = (_read(sf_dir, "events", columns=["event_type", "value"])
           .groupby("event_type").aggregate(Count(), Sum("value")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
            "sum_value": pa.array([_round2(v) for v in batch.column("sum(value)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def lineitem_recent(sf_dir: str, cutoff: str = "1995-01-01") -> ray.data.Dataset:
    """Predicate pushed into the parquet read (row-group pruning at scale)."""
    import datetime

    cut = datetime.datetime.fromisoformat(cutoff)
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_shipdate"],
               filter=pc.field("l_shipdate") >= pa.scalar(cut, type=pa.timestamp("us")))
    agg = ds.groupby("l_returnflag").aggregate(Count(), Sum("l_extendedprice"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "n_items": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
            "sum_price": pa.array([_round2(v) for v in batch.column("sum(l_extendedprice)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def suppliers_per_region(sf_dir: str) -> ray.data.Dataset:
    """Two broadcast dimension hops (nation -> region), then count."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    r_names = dict(zip(region.column("r_regionkey").to_pylist(),
                       region.column("r_name").to_pylist()))
    n_to_r = {n: r_names.get(r, "") for n, r in zip(nation.column("n_nationkey").to_pylist(),
                                                    nation.column("n_regionkey").to_pylist())}
    map_ref = ray.put(n_to_r)

    def add_region(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        return pa.table({
            "region_name": pa.array([m.get(k, "") for k in batch.column("s_nationkey").to_pylist()],
                                    type=pa.string()),
        })

    agg = (_read(sf_dir, "supplier", columns=["s_nationkey"])
           .map_batches(add_region, batch_format="pyarrow")
           .groupby("region_name").aggregate(Count()))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "region_name": batch.column("region_name"),
            "n_suppliers": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def distinct_sources(sf_dir: str) -> ray.data.Dataset:
    """DISTINCT via the native partial-aggregating groupby (combiner before
    the exchange — the high-cardinality-safe template; Dataset.unique
    materializes to the driver and map_groups dispatches per group)."""
    ds = _read(sf_dir, "documents", columns=["source"])
    agg = ds.groupby("source").aggregate(Count())
    return agg.select_columns(["source"])


def revenue_by_priority(sf_dir: str) -> ray.data.Dataset:
    """Partitioned hash join lineitem x orders (Dataset.join), then groupby."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, "inner", num_partitions=_join_partitions(li, orders),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def add_rev(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                         "rev": rev})

    agg = (joined.map_batches(add_rev, batch_format="pyarrow")
                 .groupby("o_orderpriority").aggregate(Count(), Sum("rev")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "n_items": pa.array(batch.column("count()").to_pylist(), type=pa.int64()),
            "revenue": pa.array([_round2(v) for v in batch.column("sum(rev)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_by_part_type(sf_dir: str) -> ray.data.Dataset:
    """Discounted revenue per part type (TPC-H Q14 shape) — lineitem
    enriched from the part DIMENSION by broadcast (partkey -> type array
    shipped once via ``ray.put``, indexed vectorized per batch), then the
    native partial-aggregate groupby.  The join never shuffles lineitem;
    at a part-table scale past object-store broadcast, this becomes the
    ``revenue_by_priority`` partitioned hash-join plan instead."""
    import numpy as np

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    keys = part.column("p_partkey").to_numpy().astype(np.int64)
    types = np.asarray(part.column("p_type").to_pylist())
    lut = np.empty(keys.max() + 2, dtype=types.dtype)
    lut[:] = ""
    lut[keys] = types  # dense dimension: direct index, no hash probe
    lut_ref = ray.put(lut)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def enrich(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        pk = np.clip(batch.column("l_partkey").to_numpy().astype(np.int64),
                     0, len(m) - 1)
        rev = pc.multiply(batch.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return pa.table({"p_type": pa.array(m[pk]), "rev": rev})

    agg = (ds.map_batches(enrich, batch_format="pyarrow", fn_args=(lut_ref,))
             .groupby("p_type").aggregate(Count(), Sum("rev")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_type": batch.column("p_type"),
            "n_items": batch.column("count()").cast(pa.int64()),
            "revenue": pa.array([_round2(v) for v in
                                 batch.column("sum(rev)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def revenue_rollup(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): leaf groups plus per-flag
    subtotals plus the grand total, rolled-up levels labelled 'ALL' (sentinel
    instead of SQL NULL so the hash compare is type-stable).

    Shape: ONE native partial-aggregate groupby at the finest granularity;
    the higher levels re-aggregate the tiny leaf result (rows bounded by the
    key-combination count, not the data) in a single-batch step — the input
    is never read or shuffled more than once.  Exact because l_quantity is
    integer-valued (float64 sums are order-independent)."""
    import numpy as np

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(), Sum("l_quantity"))

    def levels(batch: pa.Table) -> pa.Table:
        flags = batch.column("l_returnflag").to_pylist()
        stats = batch.column("l_linestatus").to_pylist()
        n = np.asarray(batch.column("count()").to_pylist(), dtype=np.int64)
        q = np.asarray(batch.column("sum(l_quantity)").to_pylist(), dtype=np.float64)
        out_f, out_s, out_n, out_q = list(flags), list(stats), n.tolist(), q.tolist()
        for f in sorted(set(flags)):
            m = np.fromiter((x == f for x in flags), dtype=bool, count=len(flags))
            out_f.append(f); out_s.append("ALL")
            out_n.append(int(n[m].sum())); out_q.append(float(q[m].sum()))
        out_f.append("ALL"); out_s.append("ALL")
        out_n.append(int(n.sum())); out_q.append(float(q.sum()))
        return pa.table({
            "l_returnflag": pa.array(out_f, type=pa.string()),
            "l_linestatus": pa.array(out_s, type=pa.string()),
            "n_items": pa.array(out_n, type=pa.int64()),
            "sum_qty": pa.array([_round2(v) for v in out_q]),
        })

    return agg.repartition(1).map_batches(levels, batch_format="pyarrow",
                                          batch_size=None)


def revenue_cube(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY CUBE(l_returnflag, l_linestatus): every grouping-set level —
    leaves, per-flag subtotals, per-status subtotals, grand total — labelled
    'ALL' (sentinel instead of SQL NULL so the hash compare is type-stable).

    Same shape as ``revenue_rollup``: ONE native partial-aggregate groupby
    at the finest granularity, then all 2^k grouping sets re-aggregated from
    the tiny leaf result (rows bounded by the key-combination count, not the
    data) in a single-batch step — the input is never read or shuffled more
    than once."""
    import numpy as np

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])
    agg = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(), Sum("l_quantity"))

    def levels(batch: pa.Table) -> pa.Table:
        flags = batch.column("l_returnflag").to_pylist()
        stats = batch.column("l_linestatus").to_pylist()
        n = np.asarray(batch.column("count()").to_pylist(), dtype=np.int64)
        q = np.asarray(batch.column("sum(l_quantity)").to_pylist(), dtype=np.float64)
        out_f, out_s, out_n, out_q = list(flags), list(stats), n.tolist(), q.tolist()
        for f in sorted(set(flags)):
            m = np.fromiter((x == f for x in flags), dtype=bool, count=len(flags))
            out_f.append(f); out_s.append("ALL")
            out_n.append(int(n[m].sum())); out_q.append(float(q[m].sum()))
        for s in sorted(set(stats)):
            m = np.fromiter((x == s for x in stats), dtype=bool, count=len(stats))
            out_f.append("ALL"); out_s.append(s)
            out_n.append(int(n[m].sum())); out_q.append(float(q[m].sum()))
        out_f.append("ALL"); out_s.append("ALL")
        out_n.append(int(n.sum())); out_q.append(float(q.sum()))
        return pa.table({
            "l_returnflag": pa.array(out_f, type=pa.string()),
            "l_linestatus": pa.array(out_s, type=pa.string()),
            "n_items": pa.array(out_n, type=pa.int64()),
            "sum_qty": pa.array([_round2(v) for v in out_q]),
        })

    return agg.repartition(1).map_batches(levels, batch_format="pyarrow",
                                          batch_size=None)


def custs_with_big_orders(sf_dir: str, min_total: float = 400_000.0) -> ray.data.Dataset:
    """Customers having at least one order above ``min_total`` — the SEMI
    join shape, via Ray's native partitioned left_semi join (the partner
    to ``custs_without_orders``' broadcast anti-join: use THIS plan when
    the filtering key set is too large to broadcast).

    The probe side is distinct-reduced first (combiner groupby on the
    predicate-pushed single-column read), so the semi join exchanges one
    row per qualifying customer, not one per qualifying order."""
    keys = (_read(sf_dir, "orders", columns=["o_custkey"],
                  filter=pc.field("o_totalprice") > pa.scalar(min_total))
            .groupby("o_custkey").aggregate(Count()))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cust.join(keys, "left_semi",
                     num_partitions=_join_partitions(cust, keys),
                     on=("c_custkey",), right_on=("o_custkey",))


def activity_full_join(sf_dir: str, min_total: float = 300_000.0) -> ray.data.Dataset:
    """Per-entity big-order count vs event count — the FULL OUTER join
    shape (reconciling two activity logs where either side may miss an
    entity; the order side is restricted to totals above ``min_total`` so
    both unmatched classes genuinely occur).

    Both sides pre-aggregate to one row per key before the partitioned
    full-outer hash join (the exchange carries two key->count tables, not
    raw rows); unmatched sides fill with 0 and the surviving key is the
    coalesced key pair."""
    orders = (_read(sf_dir, "orders", columns=["o_custkey"],
                    filter=pc.field("o_totalprice") > pa.scalar(min_total))
              .groupby("o_custkey").aggregate(Count()))
    events = (_read(sf_dir, "events", columns=["user_id"])
              .groupby("user_id").aggregate(Count()))
    joined = orders.join(events, "full_outer",
                         num_partitions=_join_partitions(orders, events),
                         on=("o_custkey",), right_on=("user_id",),
                         left_suffix="_o", right_suffix="_e")

    def finish(batch: pa.Table) -> pa.Table:
        # Ray's full-outer join coalesces the key pair into the left key
        # column, so o_custkey already carries right-only keys
        return pa.table({
            "entity_id": batch.column("o_custkey").cast(pa.int64()),
            "n_orders": pc.coalesce(batch.column("count()_o"),
                                    pa.scalar(0)).cast(pa.int64()),
            "n_events": pc.coalesce(batch.column("count()_e"),
                                    pa.scalar(0)).cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def cust_order_counts(sf_dir: str) -> ray.data.Dataset:
    """Order count per customer INCLUDING order-less customers — the LEFT
    OUTER join shape (entity enrichment where the right side may miss).

    Scale shape: the big side pre-aggregates FIRST (a combiner groupby
    shrinks orders to one count row per custkey), so the partitioned
    left-outer hash join exchanges keys x counts, never raw orders; the
    null fill for unmatched customers is a vectorized coalesce."""
    counts = (_read(sf_dir, "orders", columns=["o_custkey"])
              .groupby("o_custkey").aggregate(Count()))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    joined = cust.join(counts, "left_outer",
                       num_partitions=_join_partitions(cust, counts),
                       on=("c_custkey",), right_on=("o_custkey",))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "c_name": batch.column("c_name"),
            "n_orders": pc.coalesce(batch.column("count()"),
                                    pa.scalar(0)).cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str) -> ray.data.Dataset:
    """Per-user event-type PIVOT: one row per user with a count column per
    event type plus the total — the conditional-aggregation reshape (type
    histograms per entity, per-source doc counts).

    Shape: the pivot happens IN-BATCH (indicator columns via one vectorized
    equality per type, then an arrow group_by combiner), so the exchange
    carries one row per (user x batch) with 6 int columns — the native Sum
    groupby merges partials.  The column set is the (small, known) type
    domain; an open-ended domain is the ``heavy_hitters`` shape instead."""
    import numpy as np

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        cols = {"user_id": batch.column("user_id")}
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pa.array((et == t).astype(np.int64))
        cols["n_events"] = pa.array(np.ones(len(et), dtype=np.int64))
        return pa.table(cols).group_by("user_id").aggregate(
            [(f"n_{t}", "sum") for t in _EVENT_TYPES] + [("n_events", "sum")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(*[Sum(f"n_{t}_sum") for t in _EVENT_TYPES],
                        Sum("n_events_sum")))

    def finish(batch: pa.Table) -> pa.Table:
        out = {"user_id": batch.column("user_id")}
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = batch.column(f"sum(n_{t}_sum)").cast(pa.int64())
        out["n_events"] = batch.column("sum(n_events_sum)").cast(pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def value_stats_by_type(sf_dir: str) -> ray.data.Dataset:
    """Per-type moment statistics over events.value: n, avg, sample stddev,
    min, max — the sufficient-statistics aggregation shape (quality-score
    distributions per source, loss stats per shard).

    Each batch reduces to one (n, sum, sum of squares, min, max) row per
    key via an arrow group_by combiner; the native groupby merges them
    (sums add, extremes max) and avg/std derive at the end.  The exchange
    is keys x blocks rows regardless of data size."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch.column("value"), batch.column("value"))
        return (batch.append_column("value_sq", sq)
                     .group_by("event_type")
                     .aggregate([("value", "count"), ("value", "sum"),
                                 ("value_sq", "sum"), ("value", "min"),
                                 ("value", "max")]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("value_count"), Sum("value_sum"), Sum("value_sq_sum"),
                        Min("value_min"), Max("value_max")))

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = np.asarray(batch.column("sum(value_count)").to_pylist(), dtype=np.float64)
        s = np.asarray(batch.column("sum(value_sum)").to_pylist(), dtype=np.float64)
        s2 = np.asarray(batch.column("sum(value_sq_sum)").to_pylist(), dtype=np.float64)
        var = np.maximum(s2 - s * s / n, 0.0) / np.maximum(n - 1, 1.0)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pa.array(n.astype(np.int64), type=pa.int64()),
            "avg_value": pa.array([_round2(v) for v in s / n]),
            "std_value": pa.array([_round2(v) for v in np.sqrt(var)]),
            "min_value": batch.column("min(value_min)"),
            "max_value": batch.column("max(value_max)"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def value_zscores(sf_dir: str) -> ray.data.Dataset:
    """(event_id, z) — per-type z-score normalization, the feature-scaling
    staple: z = (value - mu_type) / sigma_type with sample stddev.

    Two streaming passes, no shuffle of data rows: pass 1 reduces to
    per-(type, batch) moment rows merged by native Sum groupby (the
    ``value_stats_by_type`` combiner); the tiny (mu, sigma) table
    broadcasts once via ``ray.put`` and pass 2 maps each row against it.
    Rounded to 3dp — naive merged moments and SQL's stable one-pass
    algorithm agree far beyond that (same bet as ``qty_price_corr``)."""
    import numpy as np
    import ray

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        sq = pc.multiply(batch.column("value"), batch.column("value"))
        return (batch.select(["event_type", "value"])
                     .append_column("value_sq", sq)
                     .group_by("event_type")
                     .aggregate([("value", "count"), ("value", "sum"),
                                 ("value_sq", "sum")]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("value_count"), Sum("value_sum"),
                        Sum("value_sq_sum")).to_pandas())
    if agg.empty:
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "z": pa.array([], type=pa.float64())}))
    n = agg["sum(value_count)"].to_numpy().astype(np.float64)
    s = agg["sum(value_sum)"].to_numpy().astype(np.float64)
    s2 = agg["sum(value_sq_sum)"].to_numpy().astype(np.float64)
    mu = s / n
    sigma = np.sqrt(np.maximum(s2 - s * s / n, 0.0) / np.maximum(n - 1, 1.0))
    lut_ref = ray.put({t: (float(m), float(sd)) for t, m, sd in
                       zip(agg["event_type"], mu, sigma)})

    def finish(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        types = batch.column("event_type").to_pylist()
        v = batch.column("value").to_numpy().astype(np.float64)
        mus = np.fromiter((m[t][0] for t in types), dtype=np.float64,
                          count=len(types))
        sds = np.fromiter((m[t][1] for t in types), dtype=np.float64,
                          count=len(types))
        z = np.where(sds > 0, (v - mus) / np.where(sds > 0, sds, 1.0), 0.0)
        return pa.table({
            "event_id": batch.column("event_id"),
            "z": pa.array([_round_nd(x, 3) for x in z]),
        })

    return ds.map_batches(finish, batch_format="pyarrow", fn_args=(lut_ref,))


def qty_price_corr(sf_dir: str) -> ray.data.Dataset:
    """Pearson correlation of (l_quantity, l_extendedprice) per returnflag —
    the bivariate-moments shape (feature/label correlation per shard).

    Same sufficient-statistics pattern as ``value_stats_by_type`` with the
    cross term added: per-batch (n, sx, sy, sxx, syy, sxy) rows merge by
    native Sum groupby; corr derives once at the end.  Rounded to 3dp (the
    naive-moments formula and SQL's stable one agree far beyond that)."""
    import numpy as np

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity",
                                            "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity")
        y = batch.column("l_extendedprice")
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "n": pa.array(np.ones(len(x), dtype=np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        })
        return t.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("l_returnflag")
             .aggregate(*[Sum(f"{c}_sum") for c in ("n", "sx", "sy", "sxx",
                                                    "syy", "sxy")]))

    def finish(batch: pa.Table) -> pa.Table:
        g = {c: np.asarray(batch.column(f"sum({c}_sum)").to_pylist(),
                           dtype=np.float64)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        cov = g["n"] * g["sxy"] - g["sx"] * g["sy"]
        vx = g["n"] * g["sxx"] - g["sx"] * g["sx"]
        vy = g["n"] * g["syy"] - g["sy"] * g["sy"]
        corr = cov / np.sqrt(vx * vy)
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "n_items": pa.array(g["n"].astype(np.int64), type=pa.int64()),
            "corr_qty_price": pa.array([_round_nd(v, 3) for v in corr]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def users_click_and_purchase(sf_dir: str) -> ray.data.Dataset:
    """Users appearing in BOTH the click and the purchase event sets — the
    set-INTERSECTION shape (ids present in two corpora, docs passing two
    independent filters).

    One exchange: the read is filtered to the two types (predicate pushed),
    each batch reduces to per-user presence flags (arrow group_by max), and
    the native Max groupby merges them; the intersection is a flag filter
    on the merged result.  Contrast with the naive two-distinct-sets +
    join plan, which costs three exchanges."""
    import numpy as np

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"],
               filter=pc.field("event_type").isin(["click", "purchase"]))

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        return (pa.table({
            "user_id": batch.column("user_id"),
            "has_click": pa.array((et == "click").astype(np.int64)),
            "has_purchase": pa.array((et == "purchase").astype(np.int64)),
        }).group_by("user_id").aggregate([("has_click", "max"),
                                          ("has_purchase", "max")]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(Max("has_click_max"), Max("has_purchase_max")))
    def both(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(batch.column("max(has_click_max)"), 0),
                       pc.greater(batch.column("max(has_purchase_max)"), 0))
        return batch.filter(keep).select(["user_id"])

    return agg.map_batches(both, batch_format="pyarrow")


def custs_without_orders(sf_dir: str, min_total: float = 350_000.0) -> ray.data.Dataset:
    """ANTI-join: customers with no order above ``min_total`` — the
    threshold is chosen so the result is non-empty at every test SF
    (a 0-row Dataset's ``to_pandas()`` drops columns — round-3 fact —
    which would fail the driver's column compare).
    exclusion-filter shape (blocklist joins, already-processed-id skips).
    The probe side streams; the exclusion side reduces to a distinct key
    set (pruned, predicate-pushed single-column read) broadcast once via
    ``ray.put`` and checked with one sorted ``searchsorted`` per batch.
    Partitioning assumption: the distinct exclusion keys fit the object
    store (ids only — 8 bytes/key); beyond that the same filter runs as a
    partitioned hash anti-join keyed like ``_join_partitions``."""
    import numpy as np
    import pyarrow.parquet as pq

    keys = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                         columns=["o_custkey"],
                         filters=[("o_totalprice", ">", min_total)])
    have = np.unique(keys.column("o_custkey").to_numpy().astype(np.int64))
    have_ref = ray.put(have)

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def keep(batch: pa.Table) -> pa.Table:
        h = ray.get(have_ref)
        ids = batch.column("c_custkey").to_numpy().astype(np.int64)
        pos = np.minimum(np.searchsorted(h, ids), max(len(h) - 1, 0))
        hit = (h[pos] == ids) if len(h) else np.zeros(len(ids), dtype=bool)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def returned_revenue_by_cust(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Top-n customers by revenue on RETURNED items (TPC-H Q10 shape):
    lineitem(R) |> orders |> customer |> nation — the multi-way join
    composition query.

    Scale plan: the fact table is reduced BEFORE the exchange — a
    predicate-filtered, per-batch orderkey combiner shrinks lineitem from
    rows to (orderkey, partial-revenue) pairs (lineitem files cluster by
    orderkey, so the combiner is near-total); only the reduced stream
    enters the partitioned hash join with orders.  The custkey aggregate
    then runs on the join output with Ray's native partial-agg groupby,
    and the two true DIMENSIONS (customer names, nation names) are
    broadcast once and applied to the post-aggregate rows (15k at sf0.1)
    — never shuffled.  At customer-table scale beyond the object store
    the enrichment becomes a second ``_join_partitions`` hash join."""
    import numpy as np

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_returnflag"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        ok = t.column("l_orderkey").to_numpy().astype(np.int64)
        rev = (t.column("l_extendedprice").to_numpy()
               * (1.0 - t.column("l_discount").to_numpy()))
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk))
        np.add.at(sums, inv, rev)
        return pa.table({"l_orderkey": pa.array(uk),
                         "rev": pa.array(sums)})

    reduced = li.map_batches(partial, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = reduced.join(orders, "inner",
                          num_partitions=_join_partitions(reduced, orders),
                          on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (joined.select_columns(["o_custkey", "rev"])
                 .groupby("o_custkey").aggregate(Sum("rev")))

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_nationkey"])
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    ckeys = cust.column("c_custkey").to_numpy().astype(np.int64)
    cname = np.asarray(cust.column("c_name").to_pylist())
    cnat = cust.column("c_nationkey").to_numpy().astype(np.int64)
    nnames = np.asarray(nat.column("n_name").to_pylist())
    nkeys = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nlut = np.empty(nkeys.max() + 1, dtype=nnames.dtype)
    nlut[nkeys] = nnames
    name_lut = np.empty(ckeys.max() + 1, dtype=cname.dtype)
    name_lut[ckeys] = cname
    natname_lut = np.empty(ckeys.max() + 1, dtype=nnames.dtype)
    natname_lut[ckeys] = nlut[cnat]
    luts_ref = ray.put((name_lut, natname_lut))

    def enrich(batch: pa.Table, ref) -> pa.Table:
        names, natnames = ray.get(ref)
        ck = batch.column("o_custkey").to_numpy().astype(np.int64)
        revenue = np.array([_round2(v) for v in
                            batch.column("sum(rev)").to_pylist()])
        return pa.table({
            "c_custkey": pa.array(ck),
            "c_name": pa.array(names[ck]),
            "n_name": pa.array(natnames[ck]),
            "revenue": pa.array(revenue),
            "neg_rev": pa.array(-revenue),
        })

    return (agg.map_batches(enrich, batch_format="pyarrow",
                            fn_args=(luts_ref,))
               .sort(["neg_rev", "c_custkey"])
               .limit(n)
               .drop_columns(["neg_rev"]))


def small_quantity_revenue(sf_dir: str) -> ray.data.Dataset:
    """Single-row {avg_yearly} — revenue/7 over lineitems whose quantity is
    below 20% of their part's average quantity (TPC-H Q17 shape: the
    correlated-scalar-subquery filter, i.e. a fact table filtered against
    an aggregate of ITSELF).

    Two passes over lineitem, no shuffle at all: pass 1 is a per-batch
    (partkey -> sum, count) combiner — each block reduces to at most
    |parts-in-block| partial rows — and the partials merge on the driver
    with one vectorized ``np.add.at`` (the repo's measured-40x-faster
    alternative to the native multi-agg groupby; O(blocks x parts/block)
    control-plane rows, bounded by the |part| DIMENSION, not |lineitem|).
    The per-part thresholds broadcast once as a dense direct-index array;
    pass 2 streams lineitem again, filters against the broadcast threshold
    and partial-sums revenue.  Exactness note: quantities are integral, so
    both engines' double sums are exact and the strict-< boundary is
    bit-deterministic regardless of summation order."""
    import numpy as np

    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def per_part_partial(b: pa.Table) -> pa.Table:
        k = b.column("l_partkey").to_numpy().astype(np.int64)
        q = b.column("l_quantity").to_numpy().astype(np.float64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk))
        np.add.at(s, inv, q)
        c = np.bincount(inv, minlength=len(uk)).astype(np.float64)
        return pa.table({"pk": pa.array(uk), "s": pa.array(s),
                         "c": pa.array(c)})

    part_ds = li.map_batches(per_part_partial, batch_format="pyarrow")
    parts = pa.concat_tables([ray.get(r) for r in part_ds.to_arrow_refs()])
    pk = parts.column("pk").to_numpy().astype(np.int64)
    lut_s = np.zeros(pk.max() + 1)
    lut_c = np.zeros(pk.max() + 1)
    np.add.at(lut_s, pk, parts.column("s").to_numpy())
    np.add.at(lut_c, pk, parts.column("c").to_numpy())
    with np.errstate(divide="ignore", invalid="ignore"):
        # divide FIRST, multiply by 0.2 second — the oracle's
        # `0.2 * (sum/count)` expression tree (IEEE multiply commutes, so
        # (s/c)*0.2 == 0.2*(s/c) bitwise; (0.2*s)/c does NOT)
        lut = np.where(lut_c > 0, lut_s / np.maximum(lut_c, 1) * 0.2, -np.inf)
    lut_ref = ray.put(lut)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table, ref) -> pa.Table:
        m = ray.get(ref)
        k = batch.column("l_partkey").to_numpy().astype(np.int64)
        q = batch.column("l_quantity").to_numpy()
        p = batch.column("l_extendedprice").to_numpy()
        return pa.table({"s": pa.array([float(p[q < m[k]].sum())])})

    total = (ds.map_batches(partial, batch_format="pyarrow",
                            fn_args=(lut_ref,))
               .aggregate(Sum("s")))["sum(s)"]
    return ray.data.from_arrow(
        pa.table({"avg_yearly": pa.array([_round2(total / 7.0)])}))


def users_click_no_purchase(sf_dir: str,
                            value_floor: float = 150.0) -> ray.data.Dataset:
    """Users in the click set but NOT the high-value-purchase set (purchase
    with value > ``value_floor``) — the set-EXCEPT companion to
    ``users_click_and_purchase``: same single presence-flag exchange
    (per-batch max-flag combiner, native Max groupby), different final
    predicate.  No anti-join shuffle: membership on both sides reduces to
    two bits per user.  The value floor keeps the query non-degenerate on
    this corpus (every user emits every event type, so the unfiltered
    EXCEPT is empty at every scale factor)."""
    import numpy as np

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        return (pa.table({
            "user_id": batch.column("user_id"),
            "has_click": pa.array((et == "click").astype(np.int64)),
            "has_purchase": pa.array(
                ((et == "purchase") & (val > value_floor)).astype(np.int64)),
        }).group_by("user_id").aggregate([("has_click", "max"),
                                          ("has_purchase", "max")]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("user_id")
             .aggregate(Max("has_click_max"), Max("has_purchase_max")))

    def only_click(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(batch.column("max(has_click_max)"), 0),
                       pc.equal(batch.column("max(has_purchase_max)"), 0))
        return batch.filter(keep).select(["user_id"])

    return agg.map_batches(only_click, batch_format="pyarrow")


def value_skew_by_type(sf_dir: str) -> ray.data.Dataset:
    """Per-type skewness + excess kurtosis over events.value — the
    higher-moment extension of ``value_stats_by_type`` (distribution-shape
    QA over quality/loss columns: a long right tail or heavy outliers show
    up here before they show up in the mean).

    Same sufficient-statistics plan with 3rd/4th power sums added: each
    batch reduces to one (n, s1..s4) row per key, the native Sum groupby
    merges them, and the bias-adjusted sample estimators (DuckDB's
    skewness/kurtosis formulas, i.e. Fisher-Pearson G1 and excess G2)
    derive once at the end.  Rounded to 3dp — raw power sums and SQL's
    streaming algorithm agree far beyond that at mu/sigma ~ 1."""
    import numpy as np

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value")
        v2 = pc.multiply(v, v)
        return (pa.table({
            "event_type": batch.column("event_type"),
            "n": pa.array(np.ones(len(v), dtype=np.int64)),
            "s1": v, "s2": v2,
            "s3": pc.multiply(v2, v), "s4": pc.multiply(v2, v2),
        }).group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "s1", "s2", "s3", "s4")]))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(*[Sum(f"{c}_sum") for c in ("n", "s1", "s2",
                                                    "s3", "s4")]))

    def finish(batch: pa.Table) -> pa.Table:
        g = {c: np.asarray(batch.column(f"sum({c}_sum)").to_pylist(),
                           dtype=np.float64)
             for c in ("n", "s1", "s2", "s3", "s4")}
        n = g["n"]
        mu = g["s1"] / n
        m2 = g["s2"] / n - mu ** 2
        m3 = g["s3"] / n - 3 * mu * g["s2"] / n + 2 * mu ** 3
        m4 = (g["s4"] / n - 4 * mu * g["s3"] / n
              + 6 * mu ** 2 * g["s2"] / n - 3 * mu ** 4)
        g1 = m3 / m2 ** 1.5
        skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
        g2 = m4 / m2 ** 2 - 3.0
        kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pa.array(n.astype(np.int64), type=pa.int64()),
            "skew_value": pa.array([_round_nd(v, 3) for v in skew]),
            "kurt_value": pa.array([_round_nd(v, 3) for v in kurt]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def price_on_qty_regression(sf_dir: str) -> ray.data.Dataset:
    """Per-returnflag least-squares fit l_extendedprice ~ l_quantity:
    REGR_SLOPE / REGR_INTERCEPT / REGR_R2 from the same bivariate moment
    rows as ``qty_price_corr`` — one streaming pass, one keys x blocks
    exchange, closed-form finish.  The grouped-linear-model shape (scaling
    laws per source, price curves per segment) without any per-group
    dispatch."""
    import numpy as np

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity",
                                            "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity")
        y = batch.column("l_extendedprice")
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "n": pa.array(np.ones(len(x), dtype=np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        })
        return t.group_by("l_returnflag").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("l_returnflag")
             .aggregate(*[Sum(f"{c}_sum") for c in ("n", "sx", "sy", "sxx",
                                                    "syy", "sxy")]))

    def finish(batch: pa.Table) -> pa.Table:
        g = {c: np.asarray(batch.column(f"sum({c}_sum)").to_pylist(),
                           dtype=np.float64)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        cov = g["n"] * g["sxy"] - g["sx"] * g["sy"]
        vx = g["n"] * g["sxx"] - g["sx"] * g["sx"]
        vy = g["n"] * g["syy"] - g["sy"] * g["sy"]
        slope = cov / vx
        intercept = (g["sy"] - slope * g["sx"]) / g["n"]
        r2 = cov * cov / (vx * vy)
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "slope": pa.array([_round_nd(v, 3) for v in slope]),
            "intercept": pa.array([_round_nd(v, 2) for v in intercept]),
            "r2": pa.array([_round_nd(v, 4) for v in r2]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_SJ_BLOOM_BITS = 1 << 22  # 512 KiB bitmap — fixed memory at any key count
_SJ_BLOOM_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _key_bloom_positions(keys) -> "object":
    """k splitmix64-mixed probe positions per int64 key, shape (k, n)."""
    import numpy as np

    k = np.asarray(keys, dtype=np.uint64)
    out = np.empty((len(_SJ_BLOOM_SEEDS), len(k)), dtype=np.int64)
    for i, seed in enumerate(_SJ_BLOOM_SEEDS):
        h = k * np.uint64(seed)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        out[i] = (h & np.uint64(_SJ_BLOOM_BITS - 1)).astype(np.int64)
    return out


def big_order_lineitems_bloom(sf_dir: str,
                              min_total: float = 400_000.0) -> ray.data.Dataset:
    """Revenue per returnflag over lineitems of big orders — the
    BLOOM-PUSHDOWN semi join: the qualifying-order key set becomes a
    fixed-size bitmap (512 KiB regardless of key count) built by per-batch
    OR-merged partials, broadcast once, and applied as a pre-filter on the
    fact read; only the ~surviving sliver takes the partitioned left_semi
    join for exact verification (bloom false positives must not leak into
    an oracle-exact result).  At 100 TB this is the difference between
    shuffling the whole fact table into the join and shuffling the
    selectivity-bounded survivor set — the bitmap does the other 99%.

    Two-stage exactness argument: the bloom has NO false negatives (every
    qualifying row survives the pre-filter) and the semi join removes its
    false positives, so the composition equals the plain semi join."""
    import numpy as np
    import ray as _ray

    # stage 0: fixed-memory bitmap over qualifying order keys
    keys_ds = _read(sf_dir, "orders", columns=["o_orderkey"],
                    filter=pc.field("o_totalprice") > pa.scalar(min_total))

    def bloom_partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(_SJ_BLOOM_BITS // 64, dtype=np.uint64)
        k = batch.column("o_orderkey").to_numpy()
        if len(k):
            pos = _key_bloom_positions(k).ravel()
            np.bitwise_or.at(bits, pos >> 6,
                             np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    merged = np.zeros(_SJ_BLOOM_BITS // 64, dtype=np.uint64)
    for b in keys_ds.map_batches(bloom_partial,
                                 batch_format="pyarrow").iter_batches(
                                     batch_size=None, batch_format="pyarrow"):
        for blob in b.column("bits").to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint64)
    bloom_ref = _ray.put(merged)

    # stage 1: bloom pre-filter on the pruned fact read
    fact = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_returnflag", "l_extendedprice"])

    def prefilter(batch: pa.Table, ref) -> pa.Table:
        bits = _ray.get(ref)
        k = batch.column("l_orderkey").to_numpy()
        if not len(k):
            return batch
        pos = _key_bloom_positions(k)
        hit = np.ones(len(k), dtype=bool)
        for row in pos:
            hit &= (bits[row >> 6] >> (row & 63).astype(np.uint64)) \
                .astype(np.uint64) & np.uint64(1) != 0
        return batch.filter(pa.array(hit))

    survivors = fact.map_batches(prefilter, batch_format="pyarrow",
                                 fn_args=(bloom_ref,))

    # stage 2: exact verify on the survivor sliver via partitioned semi join
    distinct_keys = keys_ds.groupby("o_orderkey").aggregate(Count())
    verified = survivors.join(
        distinct_keys, "left_semi",
        num_partitions=_join_partitions(survivors, distinct_keys),
        on=("l_orderkey",), right_on=("o_orderkey",))

    agg = (verified.groupby("l_returnflag")
                   .aggregate(Count(), Sum("l_extendedprice")))
    return agg.map_batches(
        lambda t: pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "n_items": t.column("count()").cast(pa.int64()),
            "revenue": pa.array([_round2(v) for v in
                                 t.column("sum(l_extendedprice)").to_pylist()]),
        }), batch_format="pyarrow")


def local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                           year: int = 1996) -> ray.data.Dataset:
    """TPC-H Q5 — discounted revenue per nation where the customer and the
    supplier share that nation, restricted to one region and one order
    year.  The 6-table join decomposes into:

      * region -> nation -> the Asia nationkey/name map (driver-side reads
        of control-plane tables);
      * supplier and customer as dense key -> nationkey broadcast LUTs
        (one int8-scale array each via ``ray.put`` — at 100 TB these scale
        as entity counts, orders of magnitude below the fact tables;
        beyond object-store budget either LUT falls back to the
        partitioned-join plan);
      * orders pruned AT THE READ by the date predicate, reduced in-batch
        to (o_orderkey, cust_nation) for Asia customers only — the build
        side shrinks ~25x before the one real exchange;
      * lineitem x reduced-orders partitioned hash join on orderkey, then
        an in-batch supplier-nation filter and the native Sum groupby.
    """
    import numpy as np

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rkey = {r["r_name"]: r["r_regionkey"] for r in reg.to_pylist()}[region]
    nk = nation.column("n_nationkey").to_numpy().astype(np.int64)
    nname = np.asarray(nation.column("n_name").to_pylist())
    in_region = nation.column("n_regionkey").to_numpy() == rkey
    region_nations = set(nk[in_region].tolist())
    name_of = dict(zip(nk.tolist(), nname.tolist()))

    def _dense_lut(table: str, key: str, val: str) -> np.ndarray:
        t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                          columns=[key, val])
        k = t.column(key).to_numpy().astype(np.int64)
        v = t.column(val).to_numpy().astype(np.int64)
        lut = np.full(k.max() + 2, -1, dtype=np.int64)
        lut[k] = v
        return lut

    cust_lut_ref = ray.put(_dense_lut("customer", "c_custkey", "c_nationkey"))
    supp_lut_ref = ray.put(_dense_lut("supplier", "s_suppkey", "s_nationkey"))
    region_ref = ray.put(np.asarray(sorted(region_nations), dtype=np.int64))

    import datetime

    lo = datetime.datetime(year, 1, 1)
    hi = datetime.datetime(year + 1, 1, 1)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                   filter=(pc.field("o_orderdate") >= pa.scalar(lo))
                   & (pc.field("o_orderdate") < pa.scalar(hi)))

    def reduce_orders(batch: pa.Table, cref, rref) -> pa.Table:
        lut, rn = ray.get(cref), ray.get(rref)
        ck = np.clip(batch.column("o_custkey").to_numpy().astype(np.int64),
                     0, len(lut) - 1)
        cn = lut[ck]
        keep = np.isin(cn, rn)
        return pa.table({
            "o_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
            "cust_nation": pa.array(cn[keep], type=pa.int64()),
        })

    build = orders.map_batches(reduce_orders, batch_format="pyarrow",
                               fn_args=(cust_lut_ref, region_ref))

    fact = _read(sf_dir, "lineitem",
                 columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                          "l_discount"])
    joined = fact.join(build, "inner",
                       num_partitions=_join_partitions(fact, build),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def local_only(batch: pa.Table, sref) -> pa.Table:
        lut = ray.get(sref)
        sk = np.clip(batch.column("l_suppkey").to_numpy().astype(np.int64),
                     0, len(lut) - 1)
        sn = lut[sk]
        keep = sn == batch.column("cust_nation").to_numpy()
        rev = (batch.column("l_extendedprice").to_numpy()
               * (1.0 - batch.column("l_discount").to_numpy()))
        return pa.table({
            "nationkey": pa.array(sn[keep], type=pa.int64()),
            "rev": pa.array(rev[keep]),
        })

    agg = (joined.map_batches(local_only, batch_format="pyarrow",
                              fn_args=(supp_lut_ref,))
                 .groupby("nationkey").aggregate(Sum("rev")))

    def finish(batch: pa.Table) -> pa.Table:
        keys = batch.column("nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([name_of[k] for k in keys], type=pa.string()),
            "revenue": pa.array([_round2(v) for v in
                                 batch.column("sum(rev)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
              .sort("revenue", descending=True)


def props_k_stats(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n, sum_k, avg_k) — aggregate over a field EXTRACTED
    from the semi-structured ``events.props`` JSON string column: the
    engine's semi-structured surface (extract -> type -> aggregate).

    Extraction is ZERO-loop: one ``pyarrow.compute.extract_regex`` kernel
    per batch pulls the digits ('[0-9]+' — ASCII class, RE2-identical to
    the DuckDB oracle) and casts to int64; the aggregate is a native
    partial-agg groupby.  avg is finished as round(sum * 1.0 / n, 2) so
    both engines divide the same exact integer sums."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), pattern=r"(?P<k>[0-9]+)")
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_type": batch.column("event_type"), "k": k})

    agg = (ds.map_batches(extract, batch_format="pyarrow")
           .groupby("event_type").aggregate(Count(), Sum("k")))

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.column("count()").to_numpy().astype(np.int64)
        s = batch.column("sum(k)").to_numpy().astype(np.int64)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": pa.array(n),
            "sum_k": pa.array(s),
            "avg_k": pa.array([_round_nd(float(a) / int(b), 2)
                               for a, b in zip(s, n)], type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def events_dow_hour(sf_dir: str) -> ray.data.Dataset:
    """(dow, hour, n) — day-of-week x hour-of-day seasonality heatmap of
    events (dow 0 = Sunday, matching DuckDB's dayofweek).  The timestamp
    decomposition is pure int64 arithmetic on the epoch-microsecond
    column (epoch day 0 was a Thursday -> (days + 4) % 7), so there is no
    calendar library in the hot path; the aggregate is one native
    partial-agg groupby over a 168-cell key domain."""
    import numpy as np

    ds = _read(sf_dir, "events", columns=["ts"])

    def keys(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64()).to_numpy()
        days = t // 86_400_000_000
        return pa.table({
            "dow": pa.array((days + 4) % 7, type=pa.int64()),
            "hour": pa.array((t // 3_600_000_000) % 24, type=pa.int64())})

    agg = ds.map_batches(keys, batch_format="pyarrow") \
            .groupby(["dow", "hour"]).aggregate(Count())
    return agg.map_batches(
        lambda b: pa.table({"dow": b.column("dow"), "hour": b.column("hour"),
                            "n": b.column("count()")}),
        batch_format="pyarrow")


def lineitem_unpivot(sf_dir: str) -> ray.data.Dataset:
    """(l_orderkey, l_linenumber, measure, value) — UNPIVOT/melt of three
    lineitem measures into long format (the inverse of ``events_pivot``;
    the feature-long-format step before grouped ML aggregates).  Pure
    in-batch column fan-out — each batch emits 3x its rows with zero
    Python per-row work — so the op is shuffle-free."""
    import numpy as np

    cols = ("l_quantity", "l_extendedprice", "l_discount")
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", *cols])

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = batch.column("l_orderkey").to_numpy().astype(np.int64)
        ln = batch.column("l_linenumber").to_numpy().astype(np.int64)
        vals = [batch.column(c).to_numpy().astype(np.float64) for c in cols]
        return pa.table({
            "l_orderkey": pa.array(np.tile(ok, len(cols))),
            "l_linenumber": pa.array(np.tile(ln, len(cols))),
            "measure": pa.array(np.repeat(np.asarray(cols, dtype=object), n),
                                type=pa.string()),
            "value": pa.array(np.concatenate(vals), type=pa.float64())})

    return ds.map_batches(melt, batch_format="pyarrow")


def high_balance_inactive_custs(sf_dir: str,
                                since_us: int = 946_684_800_000_000
                                ) -> ray.data.Dataset:
    """(c_mktsegment, n_custs, total_acctbal) — customers whose balance is
    above the positive-balance average but who placed NO order since
    ``since_us`` (default 2000-01-01): the TPC-H Q22 shape, composing a
    SCALAR correlated threshold (global average), an ANTI-join against a
    date-filtered key set, and a final groupby.

    Plan: the average is two control-plane numbers (per-batch (sum, count)
    partials, driver-merged); the exclusion side is a predicate-pushed
    single-column read reduced to distinct int64 keys, broadcast once and
    probed with one ``searchsorted`` per batch (the ``custs_without_orders``
    anti-join pattern — same object-store tier note: beyond broadcast the
    filter runs as a partitioned hash anti-join); the survivors feed the
    native partial-agg groupby.  Nothing customer-sized lands anywhere.

    Exactness: the threshold compare runs in INTEGER CENTS on both sides
    (``cents * n > sum_cents``) — a float average computed with different
    summation order than DuckDB's AVG could flip a boundary customer by
    one ulp; integer arithmetic cannot."""
    import numpy as np

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def bal_partial(b: pa.Table) -> pa.Table:
        v = b.column("c_acctbal").to_numpy()
        pos = v[v > 0.0]
        cents = np.floor(pos * 100 + 0.5).astype(np.int64)
        return pa.table({"s": pa.array([int(cents.sum())], type=pa.int64()),
                         "n": pa.array([int(len(pos))], type=pa.int64())})

    parts = pa.concat_tables(
        [ray.get(r) for r in
         cust.map_batches(bal_partial, batch_format="pyarrow").to_arrow_refs()])
    sum_cents = int(np.sum(parts.column("s").to_numpy()))
    cnt = int(np.sum(parts.column("n").to_numpy()))
    # cnt == 0 means the SQL oracle's AVG is NULL and 'cents * n > s'
    # keeps nothing — mirror that instead of clamping to 1, which would
    # pass every positive-balance customer on a degenerate corpus.
    no_positive_balances = cnt == 0

    import pyarrow.dataset as pads

    keys = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
        filters=pads.field("o_orderdate") >= pa.scalar(
            since_us, type=pa.timestamp("us")))
    have = np.unique(keys.column("o_custkey").to_numpy().astype(np.int64))
    have_ref = ray.put(have)

    def survivors(batch: pa.Table, ref) -> pa.Table:
        h = ray.get(ref)
        if no_positive_balances:
            return pa.table({"c_mktsegment": batch.column("c_mktsegment")[:0],
                             "bal": batch.column("c_acctbal")[:0]})
        v = batch.column("c_acctbal").to_numpy()
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        t = batch.filter(pa.array(cents * cnt > sum_cents))
        ids = t.column("c_custkey").to_numpy().astype(np.int64)
        if len(h):
            pos = np.minimum(np.searchsorted(h, ids), len(h) - 1)
            t = t.filter(pa.array(h[pos] != ids))
        return pa.table({"c_mktsegment": t.column("c_mktsegment"),
                         "bal": t.column("c_acctbal")})

    agg = (cust.map_batches(survivors, batch_format="pyarrow",
                            fn_args=(have_ref,))
               .groupby("c_mktsegment").aggregate(Count(), Sum("bal")))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "n_custs": b.column("count()").cast(pa.int64()),
            "total_acctbal": pa.array(
                [_round2(v) for v in b.column("sum(bal)").to_pylist()]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_Q19_BANDS = (("Brand#1", 1, 20, 1, 15),
              ("Brand#2", 1, 25, 10, 25),
              ("Brand#3", 1, 30, 20, 35))


def band_revenue(sf_dir: str) -> ray.data.Dataset:
    """Single-row {revenue} — discounted revenue under a DISJUNCTION of
    (brand, size-range, quantity-range) bands (TPC-H Q19 shape: the
    multi-predicate OR that defeats naive predicate pushdown).

    Plan: part is a DIMENSION — its (brand-band-id, size-ok) verdict
    compresses to one int8 per partkey, broadcast as a dense direct-index
    array; each lineitem batch evaluates the whole disjunction as three
    vectorized compares against the banded lookup (no join, no shuffle)
    and partial-sums revenue.  The only exchange is the final one-row
    Sum."""
    import numpy as np

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    keys = part.column("p_partkey").to_numpy().astype(np.int64)
    brand = np.asarray(part.column("p_brand").to_pylist())
    size = part.column("p_size").to_numpy().astype(np.int64)
    band_of = np.full(keys.max() + 2, -1, dtype=np.int8)
    for bi, (bname, slo, shi, _qlo, _qhi) in enumerate(_Q19_BANDS):
        m = (brand == bname) & (size >= slo) & (size <= shi)
        band_of[keys[m]] = bi
    lut_ref = ray.put(band_of)
    qlo = np.array([b[3] for b in _Q19_BANDS], dtype=np.float64)
    qhi = np.array([b[4] for b in _Q19_BANDS], dtype=np.float64)

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    def partial(batch: pa.Table, ref) -> pa.Table:
        lut = ray.get(ref)
        k = batch.column("l_partkey").to_numpy().astype(np.int64)
        band = lut[k]
        q = batch.column("l_quantity").to_numpy()
        ok = band >= 0
        bi = np.where(ok, band, 0)
        ok &= (q >= qlo[bi]) & (q <= qhi[bi])
        rev = (batch.column("l_extendedprice").to_numpy()[ok]
               * (1.0 - batch.column("l_discount").to_numpy()[ok]))
        return pa.table({"s": pa.array([float(rev.sum())])})

    total = (ds.map_batches(partial, batch_format="pyarrow",
                            fn_args=(lut_ref,)).aggregate(Sum("s")))["sum(s)"]
    return ray.data.from_arrow(
        pa.table({"revenue": pa.array([_round2(total or 0.0)])}))


def shipping_priority(sf_dir: str, cutoff_us: int = 889_920_000_000_000,
                      segment: str = "BUILDING", n: int = 10
                      ) -> ray.data.Dataset:
    """Top-n unshipped orders by revenue for one market segment (TPC-H Q3
    shape): customer(segment) |> orders(date <) |> lineitem(shipdate >),
    grouped per order.  Default cutoff 1998-03-15.

    Plan: the segment's custkeys are a selective DIMENSION slice
    (predicate-pushed read, distinct int64 keys, broadcast); orders filter
    by date + membership probe and broadcast the surviving
    (orderkey -> orderdate, priority) as sorted parallel arrays (1/5 x
    date selectivity of |orders| — the documented object-store tier;
    beyond it this becomes the ``revenue_by_priority`` partitioned hash
    join); lineitem streams once with a per-batch orderkey combiner, and
    the per-order Sum exchange carries only qualifying orders."""
    import numpy as np

    import pyarrow.dataset as pads

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"],
                         filters=pads.field("c_mktsegment") == segment)
    seg_keys = np.unique(cust.column("c_custkey").to_numpy().astype(np.int64))

    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filters=pads.field("o_orderdate") < pa.scalar(
            cutoff_us, type=pa.timestamp("us")))
    ock = orders.column("o_custkey").to_numpy().astype(np.int64)
    pos = np.minimum(np.searchsorted(seg_keys, ock),
                     max(len(seg_keys) - 1, 0))
    hit = (seg_keys[pos] == ock) if len(seg_keys) else np.zeros(len(ock), bool)
    okeys = orders.column("o_orderkey").to_numpy().astype(np.int64)[hit]
    odates = orders.column("o_orderdate").cast(pa.int64()).to_numpy()[hit]
    oprio = np.asarray(orders.column("o_orderpriority").to_pylist())[hit]
    order_sort = np.argsort(okeys)
    okeys, odates, oprio = okeys[order_sort], odates[order_sort], oprio[order_sort]
    keys_ref = ray.put(okeys)

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def partial(batch: pa.Table, ref) -> pa.Table:
        k = ray.get(ref)
        t = batch.filter(pc.greater(batch.column("l_shipdate"),
                                    pa.scalar(cutoff_us,
                                              type=pa.timestamp("us"))))
        ok_ = t.column("l_orderkey").to_numpy().astype(np.int64)
        if len(k):
            p = np.minimum(np.searchsorted(k, ok_), len(k) - 1)
            m = k[p] == ok_
        else:
            m = np.zeros(len(ok_), dtype=bool)
        ok_ = ok_[m]
        rev = (t.column("l_extendedprice").to_numpy()[m]
               * (1.0 - t.column("l_discount").to_numpy()[m]))
        uk, inv = np.unique(ok_, return_inverse=True)
        s = np.zeros(len(uk))
        np.add.at(s, inv, rev)
        return pa.table({"l_orderkey": pa.array(uk, type=pa.int64()),
                         "rev": pa.array(s)})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          fn_args=(keys_ref,))
             .groupby("l_orderkey").aggregate(Sum("rev")))
    meta_ref = ray.put((okeys, odates, oprio))

    def enrich(b: pa.Table, ref) -> pa.Table:
        k, dts, pr = ray.get(ref)
        ok_ = b.column("l_orderkey").to_numpy().astype(np.int64)
        p = np.searchsorted(k, ok_)
        revenue = np.array([_round2(v) for v in
                            b.column("sum(rev)").to_pylist()])
        return pa.table({
            "l_orderkey": pa.array(ok_, type=pa.int64()),
            "revenue": pa.array(revenue),
            "o_orderdate_us": pa.array(dts[p], type=pa.int64()),
            "o_orderpriority": pa.array(pr[p]),
            "neg_rev": pa.array(-revenue),
        })

    return (agg.map_batches(enrich, batch_format="pyarrow",
                            fn_args=(meta_ref,))
               .sort(["neg_rev", "l_orderkey"])
               .limit(n)
               .drop_columns(["neg_rev"]))


def sole_return_suppliers(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """(s_name, numwait) — for each supplier, how many MULTI-supplier orders
    exist where that supplier is the ONLY one with returned items
    (l_returnflag = 'R'): the TPC-H Q21 shape (EXISTS another supplier in
    the order + NOT EXISTS another supplier who also failed), re-expressed
    without correlated subqueries.

    Plan (ONE sort exchange + an O(blocks) grouped heal — the repo's
    sorted-run pattern; two chained native groupbys measured 14.8 s at
    sf0.1 against ~4 s for this shape):
      * per batch, a vectorized sort+first-per-run reduce to block-local
        distinct (order, supplier) pairs over the PACKED int64 key
        (orderkey << 20 | suppkey) — packing assumes suppkey < 2^20 and
        orderkey < 2^43 (true for every generated SF here; at larger key
        domains the same plan runs on a two-column sort);
      * ONE global sort by the packed key: every order's pairs are then
        contiguous, so interior orders (not a block's first or last order
        id) resolve fully in-block — their sufficient statistic is one
        packed sum per order (1 | has_r << 20 | (suppkey*has_r) << 40,
        unpacking to n_suppliers / n_r / sum of R-supplier keys; the id
        sum identifies the culprit exactly when n_r == 1, the only case
        kept, and stays below 2^23 per order — TPC-H orders have <= 7
        lineitems);
      * boundary orders ship their block-local DISTINCT PAIR rows (<=
        suppliers-per-order rows per block edge) to a grouped heal that
        re-distincts across the seam — O(blocks) groups, never a second
        full exchange.
    Survivors are order-bounded and dup-bounded; the per-supplier count is
    a |supplier|-sized driver merge (dimension), joined to s_name via the
    broadcast-dimension pattern.  Nothing order- or lineitem-sized lands on
    the driver."""
    import numpy as np

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        has_r = pc.equal(batch.column("l_returnflag"),
                         pa.scalar("R")).to_numpy(zero_copy_only=False)
        key = (ok << 20) | sk
        order = np.lexsort((~has_r, key))  # key asc, R rows first in run
        ks, rs = key[order], has_r[order]
        first = np.r_[True, np.diff(ks) != 0]
        return pa.table({"pk": pa.array(ks[first], type=pa.int64()),
                         "has_r": pa.array(rs[first].astype(np.int64))})

    _empty = pa.table({"kind": pa.array([], type=pa.int8()),
                       "l_orderkey": pa.array([], type=pa.int64()),
                       "contrib": pa.array([], type=pa.int64()),
                       "pk": pa.array([], type=pa.int64()),
                       "has_r": pa.array([], type=pa.int64())})

    def block_stats(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        pk = batch.column("pk").to_numpy()  # sorted within block
        hr = batch.column("has_r").to_numpy()
        first = np.r_[True, np.diff(pk) != 0]
        idx = np.flatnonzero(first)
        r_max = np.maximum.reduceat(hr, idx)
        pks = pk[first]
        ok = pks >> 20
        sk = pks & ((1 << 20) - 1)
        contrib = 1 + (r_max << 20) + ((sk * r_max) << 40)
        interior = (ok != ok[0]) & (ok != ok[-1])
        io, ic = ok[interior], contrib[interior]
        if len(io):
            of = np.flatnonzero(np.r_[True, np.diff(io) != 0])
            # bit-field capacity check BEFORE summing: the R-supplier
            # id-sum field holds 23 bits, so the worst per-order sum
            # (run length x max suppkey) must stay below 2^23 — fail
            # loudly on pathological orders instead of corrupting fields
            run_len = np.diff(np.r_[of, len(io)])
            max_sk = int((pks & ((1 << 20) - 1)).max())
            if int(run_len.max()) * max(max_sk, 1) >= (1 << 23):
                raise ValueError(
                    "order's worst-case R-supplier id-sum would overflow "
                    "the 23-bit packed field; use the two-column plan")
            i_orders, i_sums = io[of], np.add.reduceat(ic, of)
        else:
            i_orders = i_sums = np.empty(0, dtype=np.int64)
        b = ~interior
        nb = int(b.sum())
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(i_orders), dtype=np.int8),
                                   np.ones(nb, dtype=np.int8)]),
            "l_orderkey": pa.array(np.r_[i_orders, ok[b]], type=pa.int64()),
            "contrib": pa.array(np.r_[i_sums, np.zeros(nb, dtype=np.int64)],
                                type=pa.int64()),
            "pk": pa.array(np.r_[np.zeros(len(i_orders), dtype=np.int64),
                                 pks[b]], type=pa.int64()),
            "has_r": pa.array(np.r_[np.zeros(len(i_orders), dtype=np.int64),
                                    r_max[b]], type=pa.int64()),
        })

    out = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .sort("pk")
             .map_batches(block_stats, batch_format="pyarrow",
                          batch_size=None)
             .materialize())
    interior = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 0))
                   .select(["l_orderkey", "contrib"]),
        batch_format="pyarrow")
    edges = out.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), 1))
                   .select(["l_orderkey", "pk", "has_r"]),
        batch_format="pyarrow")

    def heal(group: pa.Table) -> pa.Table:
        pk = group.column("pk").to_numpy()
        hr = group.column("has_r").to_numpy()
        order = np.lexsort((-hr, pk))
        ks, rs = pk[order], hr[order]
        first = np.r_[True, np.diff(ks) != 0]
        sk = ks[first] & ((1 << 20) - 1)
        r = rs[first]
        if len(sk) * max(int(sk.max()), 1) >= (1 << 23):
            raise ValueError(
                "boundary order's R-supplier id-sum would overflow the "
                "23-bit packed field; use the two-column plan")
        contrib = int(np.sum(1 + (r << 20) + ((sk * r) << 40)))
        return pa.table({"l_orderkey": group.column("l_orderkey").slice(0, 1),
                         "contrib": pa.array([contrib], type=pa.int64())})

    healed = edges.groupby("l_orderkey").map_groups(heal,
                                                    batch_format="pyarrow")
    ostats = interior.union(healed)

    def culprit_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "contrib" not in batch.column_names:
            return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        v = batch.column("contrib").to_numpy()
        n_supp = v & ((1 << 20) - 1)
        n_r = (v >> 20) & ((1 << 20) - 1)
        supp = v >> 40
        keep = (n_supp > 1) & (n_r == 1)
        uk, cnt = np.unique(supp[keep], return_counts=True)
        return pa.table({"s_suppkey": pa.array(uk, type=pa.int64()),
                         "c": pa.array(cnt, type=pa.int64())})

    _schema = pa.schema([("s_suppkey", pa.int64()), ("c", pa.int64())])
    tabs = [t for t in
            (ray.get(r) for r in
             ostats.map_batches(culprit_counts,
                                batch_format="pyarrow").to_arrow_refs())
            # union/map_groups stages can emit schema-less empty blocks;
            # drop them before the concat or Arrow rejects the mix
            if t.num_rows > 0]
    parts = pa.concat_tables(tabs) if tabs else _schema.empty_table()
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name"])
    skeys = supp.column("s_suppkey").to_numpy().astype(np.int64)
    names = np.asarray(supp.column("s_name").to_pylist(), dtype=object)
    counts = np.zeros(len(skeys), dtype=np.int64)
    lut = np.full(int(skeys.max()) + 1 if len(skeys) else 1, -1, np.int64)
    lut[skeys] = np.arange(len(skeys))
    pk = parts.column("s_suppkey").to_numpy()
    np.add.at(counts, lut[pk], parts.column("c").to_numpy())
    hit = counts > 0
    nm, cn = names[hit], counts[hit]
    top = np.lexsort((nm, -cn))[:n]
    return ray.data.from_arrow(pa.table({
        "s_name": pa.array(nm[top].tolist(), type=pa.string()),
        "numwait": pa.array(cn[top], type=pa.int64())}))


def cheapest_supplier_per_part(sf_dir: str) -> ray.data.Dataset:
    """(p_partkey, p_brand, s_name, min_price) — for every part, the
    supplier offering its cheapest lineitem (ties: lowest suppkey): the
    TPC-H Q2 shape (argmin-per-group with a join back to the winner),
    re-expressed as ONE exchange.

    Plan: prices are exact 2dp decimals, so the argmin rides a single
    native Min groupby over the PACKED int64 (price_cents << 20 | suppkey)
    — the integer order equals the (price, suppkey) lexicographic order,
    which makes the min row carry its own tie-break; per-batch combiners
    pre-reduce each block to one candidate per part before the exchange.
    part/supplier names are dimension LUT broadcasts (never a shuffle
    join).  Packing assumes price < ~$90T in cents (2^43) and suppkey <
    2^20 — beyond that the same plan runs on a two-column Min."""
    import numpy as np

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        cents = np.floor(batch.column("l_extendedprice").to_numpy()
                         * 100 + 0.5).astype(np.int64)
        packed = (cents << 20) | sk
        order = np.lexsort((packed, pk))
        pks, vs = pk[order], packed[order]
        first = np.r_[True, np.diff(pks) != 0]
        return pa.table({"p_partkey": pa.array(pks[first], type=pa.int64()),
                         "packed": pa.array(vs[first], type=pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("p_partkey").aggregate(Min("packed")))

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name"])
    pkeys = part.column("p_partkey").to_numpy().astype(np.int64)
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    brand_lut = np.full(int(pkeys.max()) + 1, "", dtype=object)
    brand_lut[pkeys] = brands
    skeys = supp.column("s_suppkey").to_numpy().astype(np.int64)
    names = np.asarray(supp.column("s_name").to_pylist(), dtype=object)
    name_lut = np.full(int(skeys.max()) + 1, "", dtype=object)
    name_lut[skeys] = names
    luts = ray.put((brand_lut, name_lut))

    def finish(batch: pa.Table, ref) -> pa.Table:
        b_lut, n_lut = ray.get(ref)
        pk = batch.column("p_partkey").to_numpy().astype(np.int64)
        v = batch.column("min(packed)").to_numpy()
        sk = v & ((1 << 20) - 1)
        price = (v >> 20) / 100.0
        return pa.table({
            "p_partkey": pa.array(pk, type=pa.int64()),
            "p_brand": pa.array(b_lut[pk].tolist(), type=pa.string()),
            "s_name": pa.array(n_lut[sk].tolist(), type=pa.string()),
            "min_price": pa.array(price, type=pa.float64()),
        })

    return (agg.map_batches(finish, batch_format="pyarrow", fn_args=(luts,))
               .sort("p_partkey"))


def profile_events(sf_dir: str) -> ray.data.Dataset:
    """One-row data-profile of the events table — the standard ingest-audit
    pass (row count, per-column null counts, value range/sum, type
    cardinality, timestamp span) computed in ONE streaming scan.

    Plan: each block emits a single fixed-width partial row (counts, nulls,
    min/max, integer-cent sums, plus its block-local distinct event-type
    set — vocabulary-bounded); the driver merges O(blocks) partials.  Sums
    run in integer cents so the result is order-independent and hash-exact
    against SQL (float sums would differ by summation order)."""
    import numpy as np

    ds = _read(sf_dir, "events",
               columns=["ts", "event_type", "value", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # empty blocks occur when override_num_blocks > row count;
            # np.min on an empty array raises.  Driver merge drops 0-row
            # partials before concat.
            return pa.table({
                "n_rows": pa.array([], type=pa.int64()),
                "null_value": pa.array([], type=pa.int64()),
                "null_props": pa.array([], type=pa.int64()),
                "min_ts_us": pa.array([], type=pa.int64()),
                "max_ts_us": pa.array([], type=pa.int64()),
                "sum_value_cents": pa.array([], type=pa.int64()),
                "n_negative": pa.array([], type=pa.int64()),
                "types": pa.array([], type=pa.string()),
            })
        v = batch.column("value")
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        null_value = int(v.null_count)
        null_props = int(batch.column("props").null_count)
        vv = v.to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(vv)
        cents = np.where(vv[ok] >= 0, np.floor(vv[ok] * 100 + 0.5),
                         -np.floor(-vv[ok] * 100 + 0.5)).astype(np.int64)
        types = ",".join(sorted(set(
            batch.column("event_type").to_pylist())))
        return pa.table({
            "n_rows": pa.array([batch.num_rows], type=pa.int64()),
            "null_value": pa.array([null_value], type=pa.int64()),
            "null_props": pa.array([null_props], type=pa.int64()),
            "min_ts_us": pa.array([int(ts.min())], type=pa.int64()),
            "max_ts_us": pa.array([int(ts.max())], type=pa.int64()),
            "sum_value_cents": pa.array([int(cents.sum())], type=pa.int64()),
            "n_negative": pa.array([int((cents < 0).sum())], type=pa.int64()),
            "types": pa.array([types], type=pa.string()),
        })

    parts = pa.concat_tables(
        [t for t in (ray.get(r) for r in
                     ds.map_batches(partial, batch_format="pyarrow")
                       .to_arrow_refs()) if t.num_rows])
    tset = sorted({t for s in parts.column("types").to_pylist()
                   for t in s.split(",") if t})
    import numpy as np

    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([int(np.sum(parts.column("n_rows").to_numpy()))],
                           type=pa.int64()),
        "null_value": pa.array(
            [int(np.sum(parts.column("null_value").to_numpy()))],
            type=pa.int64()),
        "null_props": pa.array(
            [int(np.sum(parts.column("null_props").to_numpy()))],
            type=pa.int64()),
        "min_ts_us": pa.array(
            [int(np.min(parts.column("min_ts_us").to_numpy()))],
            type=pa.int64()),
        "max_ts_us": pa.array(
            [int(np.max(parts.column("max_ts_us").to_numpy()))],
            type=pa.int64()),
        "sum_value_cents": pa.array(
            [int(np.sum(parts.column("sum_value_cents").to_numpy()))],
            type=pa.int64()),
        "n_negative": pa.array(
            [int(np.sum(parts.column("n_negative").to_numpy()))],
            type=pa.int64()),
        "n_event_types": pa.array([len(tset)], type=pa.int64()),
    }))


def fk_integrity_audit(sf_dir: str) -> ray.data.Dataset:
    """One-row referential-integrity audit across the star schema: orphan
    counts for lineitem.l_orderkey -> orders, lineitem.l_partkey -> part,
    lineitem.l_suppkey -> supplier, orders.o_custkey -> customer (the
    ingest-validation pass every warehouse load runs).

    Plan: each referenced key set is a distinct int64 array broadcast once
    (orders is the largest — |orders| x 8 B; the documented object-store
    tier: beyond it each probe becomes the partitioned hash anti-join, as
    in ``dedup_exact_incremental``); the two fact tables stream once each
    with a per-batch searchsorted membership probe and O(blocks) count
    partials merge on the driver."""
    import numpy as np

    def _keys(table: str, col: str) -> np.ndarray:
        t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                          columns=[col])
        return np.unique(t.column(col).to_numpy().astype(np.int64))

    refs = ray.put({
        "orders": _keys("orders", "o_orderkey"),
        "part": _keys("part", "p_partkey"),
        "supplier": _keys("supplier", "s_suppkey"),
        "customer": _keys("customer", "c_custkey"),
    })

    def _orphans(vals: np.ndarray, keys: np.ndarray) -> int:
        if not len(keys):
            return len(vals)
        pos = np.minimum(np.searchsorted(keys, vals), len(keys) - 1)
        return int((keys[pos] != vals).sum())

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey"])

    def li_partial(batch: pa.Table, ref) -> pa.Table:
        k = ray.get(ref)
        return pa.table({
            "orphan_orderkeys": pa.array([_orphans(
                batch.column("l_orderkey").to_numpy().astype(np.int64),
                k["orders"])], type=pa.int64()),
            "orphan_partkeys": pa.array([_orphans(
                batch.column("l_partkey").to_numpy().astype(np.int64),
                k["part"])], type=pa.int64()),
            "orphan_suppkeys": pa.array([_orphans(
                batch.column("l_suppkey").to_numpy().astype(np.int64),
                k["supplier"])], type=pa.int64()),
        })

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def o_partial(batch: pa.Table, ref) -> pa.Table:
        k = ray.get(ref)
        return pa.table({"orphan_custkeys": pa.array([_orphans(
            batch.column("o_custkey").to_numpy().astype(np.int64),
            k["customer"])], type=pa.int64())})

    import numpy as np

    def _merge(ds: ray.data.Dataset) -> pa.Table:
        return pa.concat_tables(
            [t for t in (ray.get(r) for r in ds.to_arrow_refs())
             if t.num_rows])

    li_parts = _merge(li.map_batches(li_partial, batch_format="pyarrow",
                                     fn_args=(refs,)))
    o_parts = _merge(orders.map_batches(o_partial, batch_format="pyarrow",
                                        fn_args=(refs,)))
    return ray.data.from_arrow(pa.table({
        c: pa.array([int(np.sum(li_parts.column(c).to_numpy()))],
                    type=pa.int64())
        for c in ("orphan_orderkeys", "orphan_partkeys", "orphan_suppkeys")
    } | {"orphan_custkeys": pa.array(
        [int(np.sum(o_parts.column("orphan_custkeys").to_numpy()))],
        type=pa.int64())}))


def order_price_audit(sf_dir: str, tol_cents: int = 1) -> ray.data.Dataset:
    """One-row header/detail consistency audit: recompute each order's
    total from its lineitems as sum(round(extprice*(1-disc)*(1+tax)*100))
    CENTS and compare against round(o_totalprice*100) — the warehouse-load
    invariant check ("does the rollup column still equal its detail?").
    Output: (n_orders, n_mismatch, max_diff_cents), all BIGINT — integer
    cents end-to-end, so there is no float-summation-order seam between
    engines (per-line rounding is part of the audit's contract).

    Plan: ONE single-agg exchange.  Both tables map to (k, v) rows —
    lineitems contribute +2*line_cents (block-local ``np.add.at``
    combiner first), the order header contributes -2*total_cents + 1 —
    and a native Sum groupby reduces per order key.  Because o_orderkey
    is the primary key, S mod 2 == 1 iff the header row exists, so
    detail rows for unknown keys drop out exactly like the oracle's
    orders-side LEFT JOIN, and diff_cents = (S - 1) // 2 (floor division
    is sign-correct).  Block summaries then ship (count, mismatch, max)
    scalars; the driver merges O(blocks) rows.  Rounding emulates DuckDB
    ROUND (half-away-from-zero) on the bit-identical left-associated
    double product."""
    import numpy as np

    from ray.data.aggregate import Sum

    def _half_away(x: np.ndarray) -> np.ndarray:
        return np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def li_rows(b: pa.Table) -> pa.Table:
        k = b.column("l_orderkey").to_numpy().astype(np.int64)
        x = (b.column("l_extendedprice").to_numpy()
             * (1 - b.column("l_discount").to_numpy())
             * (1 + b.column("l_tax").to_numpy()) * 100)
        cents = _half_away(x).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"k": pa.array(uk), "v": pa.array(2 * s)})

    def o_rows(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey").to_numpy().astype(np.int64)
        cents = _half_away(
            b.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return pa.table({"k": pa.array(k), "v": pa.array(-2 * cents + 1)})

    per_key = (li.map_batches(li_rows, batch_format="pyarrow")
               .union(orders.map_batches(o_rows, batch_format="pyarrow"))
               .groupby("k").aggregate(Sum("v")))

    def summarize(b: pa.Table) -> pa.Table:
        s = b.column("sum(v)").to_numpy().astype(np.int64)
        s = s[s % 2 == 1]  # header present (o_orderkey is the PK)
        if not len(s):
            return pa.table({"n_orders": pa.array([], type=pa.int64()),
                             "n_mismatch": pa.array([], type=pa.int64()),
                             "max_diff_cents": pa.array([], type=pa.int64())})
        diff = np.abs((s - 1) // 2)
        return pa.table({
            "n_orders": pa.array([len(s)], type=pa.int64()),
            "n_mismatch": pa.array([int((diff > tol_cents).sum())],
                                   type=pa.int64()),
            "max_diff_cents": pa.array([int(diff.max())], type=pa.int64())})

    tabs = [t for t in (ray.get(r) for r in
                        per_key.map_batches(summarize, batch_format="pyarrow")
                        .to_arrow_refs()) if t.num_rows]
    if not tabs:  # empty orders table; the oracle assumes orders non-empty
        return ray.data.from_arrow(pa.table({
            "n_orders": pa.array([0], type=pa.int64()),
            "n_mismatch": pa.array([0], type=pa.int64()),
            "max_diff_cents": pa.array([0], type=pa.int64())}))
    parts = pa.concat_tables(tabs)
    return ray.data.from_arrow(pa.table({
        "n_orders": pa.array([int(np.sum(parts.column("n_orders").to_numpy()))],
                             type=pa.int64()),
        "n_mismatch": pa.array(
            [int(np.sum(parts.column("n_mismatch").to_numpy()))],
            type=pa.int64()),
        "max_diff_cents": pa.array(
            [int(np.max(parts.column("max_diff_cents").to_numpy()))],
            type=pa.int64()),
    }))

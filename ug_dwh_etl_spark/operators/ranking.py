"""Distributed global ranking — exact total-order row numbers without a
single-partition WindowExec.

A bare ``Window.orderBy(...)`` moves the window's ENTIRE input through
one task (``Exchange SinglePartition`` + single-threaded sort) — fine
for a day series, fatal for a data-sized relation at 100 TB. The
standard distributed alternative is the two-pass rank:

1. ``repartitionByRange`` on the total order — partition i holds a
   contiguous key range strictly below partition i+1's, so partition
   ids ARE the coarse sort order;
2. rank locally inside each partition (a PARTITIONED window keyed on
   ``spark_partition_id()``);
3. count rows per partition, running-sum the counts in partition-id
   order (a window over the per-partition-counts relation — rows =
   shuffle partitions, never data-sized), and broadcast the offsets
   back: ``global rank = local rank + prior partitions' rows``.

Both passes read the SAME range exchange (Catalyst's ReuseExchange
dedupes the identical subplan), so the partitioning the offsets are
computed from is the partitioning the local ranks used. The order must
be TOTAL (include a unique tiebreak column): ranks of tied rows would
otherwise depend on physical placement.

Consumers: window_ntile_quartiles / window_percent_rank_top (exact
quantile assignment over a raw table), customer_gini (rank-weighted
revenue sum). events_peak_concurrency and text_pack_sequences use the
same offsets idea with domain shards (days, doc-id shards) instead of
range partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def global_row_number(
    df: DataFrame,
    order_cols: list[ColumnOrName],
    out: str = "i",
    total_out: str | None = None,
) -> DataFrame:
    """``df`` plus an exact 1-based global row number ``out`` under the
    total order ``order_cols`` — computed with range partitioning +
    local ranks + broadcast prior-partition offsets, never a global
    window. ``total_out`` optionally adds the total row count as a
    column (carried on the same broadcast join — no extra scalar
    cross-join). Cost: one range shuffle + one pid-local window shuffle
    + a broadcast of ~shuffle-partitions offset rows."""
    parted = df.repartitionByRange(*order_cols)
    tagged = parted.withColumn("_pid", F.spark_partition_id())
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    local = tagged.withColumn("_lrank", F.row_number().over(wloc))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_cols = [
        F.col("_pid"),
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
    ]
    if total_out is not None:
        wtot = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_n").over(wtot).cast("long").alias(total_out))
    offsets = counts.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[ColumnOrName],
    sum_col: str,
    out: str = "cum",
    total_out: str | None = None,
) -> DataFrame:
    """``df`` plus the exact running sum of ``sum_col`` under the total
    order ``order_cols`` (ROWS UNBOUNDED PRECEDING .. CURRENT ROW) —
    the same two-pass shape as :func:`global_row_number`: partitioned
    local running sums + broadcast prior-partition subtotal offsets.
    Works for DECIMAL columns (the offsets stay in the column's own sum
    type, so no float reordering error). ``total_out`` optionally adds
    the grand total as a column on the same broadcast join."""
    parted = df.repartitionByRange(*order_cols)
    tagged = parted.withColumn("_pid", F.spark_partition_id())
    wloc = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn("_lcum", F.sum(sum_col).over(wloc))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    subtotals = tagged.groupBy("_pid").agg(F.sum(sum_col).alias("_s"))
    off_cols = [
        F.col("_pid"),
        F.sum("_s").over(woff).alias("_off"),
    ]
    if total_out is not None:
        wtot = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_s").over(wtot).alias(total_out))
    offsets = subtotals.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out, F.col("_lcum") + F.coalesce(F.col("_off"), F.lit(0))
        )
        .drop("_pid", "_lcum", "_off")
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integral division (SQL ``div``). NOT ``(a / b).cast`` — that
    routes through DOUBLE and goes silently wrong past ~2^53/k, exactly
    the row counts this module's 100 TB framing advertises (measured:
    9007199254740995 / 2 cast long = ...498; div = ...497)."""
    return F.call_function("div", a, b)


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) bucket (1-based) from an exact global rank and the
    total count — the first ``n % k`` buckets get ``n // k + 1`` rows,
    the rest ``n // k`` (identical to Spark's and DuckDB's NTILE given
    a deterministic total order). Closed-form, so the bucketing rides
    the distributed rank instead of needing its own global window.
    Pure integer arithmetic end to end (round-9 ADVICE)."""
    r = (rank - 1).cast("long")  # 0-based
    kc = F.lit(k).cast("long")
    base = _idiv(n.cast("long"), kc)  # floor: n, k non-negative
    rem = n - base * k
    big_span = rem * (base + 1)
    return (
        F.when(r < big_span, _idiv(r, base + 1))
        .otherwise(rem + _idiv(r - big_span, F.greatest(base, F.lit(1))))
        + 1
    ).cast("int")

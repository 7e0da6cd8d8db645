"""Temporal joins Spark has no native operator for: as-of and interval.

Both are expressed as compositions of existing DataFrame ops (the
preferred path per the build rules — no Python UDF, no applyInPandas),
so they stay inside whole-stage codegen and scale like any keyed
shuffle:

- ``asof_join``: the union-window formulation. Tag both inputs, union,
  ONE shuffle on the key, sort within partition, and a running
  ``last(..., ignorenulls)`` window carries the most recent right-side
  payload forward to each left row. This is the classic distributed
  as-of plan (what kdb's ``aj`` / Flink's temporal join compile to):
  no per-left-row probe, no range re-scan, no join at all — O(n log n)
  within each key partition, ONE Exchange total. Skewed keys degrade to
  a single sorted partition per key, same as any window — acceptable
  because as-of semantics are per-key sequential by definition.

- ``interval_join``: the bin trick. A raw time-range join in Spark
  plans as BroadcastNestedLoopJoin (quadratic — a scale-killer). We
  instead quantize time into fixed-width bins, explode each interval to
  the bins it overlaps (``sequence(floor(start/W), floor(end/W))`` —
  usually 1-2 rows when W ≈ interval length), and equi-join points on
  the bin. Each point has exactly one bin and each interval lists a bin
  once, so no post-join dedup is needed; a residual range filter
  restores exact semantics. One shuffle on the bin key; bin width is
  the knob that trades explode factor against per-bin fan-in.

All comparisons run in integer MICROSECONDS (``unix_micros``) — exact
64-bit math, bit-identical to DuckDB's ``epoch_us`` — never in float
seconds, where a rounding error could flip a boundary row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ts_us(ts: Column) -> Column:
    """Exact 64-bit epoch microseconds. timestamp_ntz -> timestamp is
    identity under the UTC session tz (session.py pins
    spark.sql.session.timeZone=UTC), after which ``unix_micros`` mirrors
    DuckDB's ``epoch_us`` bit-for-bit."""
    return F.unix_micros(ts.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] = (),
    tiebreak: str | None = None,
    strict: bool = True,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent prior right row per key.

    strict=True means right.ts < left.ts (a right row at the exact same
    timestamp does NOT match); strict=False allows equality. Ties among
    right rows at the same timestamp resolve to the greatest
    ``tiebreak`` value — deterministic, mirrored by the oracle's
    ``ORDER BY ts DESC, tiebreak DESC LIMIT 1``. ``tolerance_us``
    (pandas merge_asof parity) turns a match older than the tolerance
    into a non-match — nulls, exactly as if no prior row existed.

    Returns all left columns plus ``left_ts_us`` (the left timestamp in
    epoch micros) and ``asof_<c>`` for each right payload column (null
    when no prior right row exists — left-outer semantics). Single
    pass: the left row's full payload rides through the union, so the
    physical plan is scan+scan -> Union -> ONE Exchange(on) -> Sort ->
    Window -> Filter. No join operator anywhere.
    """
    on = list(on)
    payload = list(payload)
    if tiebreak is None:
        tiebreak = payload[0]

    # side ordering at equal timestamps implements strict-vs-inclusive:
    # strict: left sorts FIRST (side 0) so same-ts right rows fall
    # outside its [unboundedPreceding, currentRow] frame; inclusive:
    # right sorts first and is picked up.
    l_side, r_side = (0, 1) if strict else (1, 0)

    left_cols = [c for c in left.columns]
    # the right timestamp rides inside the payload struct so the
    # tolerance check (and callers wanting asof_ts_us) need no re-join
    r_pay = F.struct(
        ts_us(F.col(right_ts)).alias("_rts"),
        *[F.col(c).alias(c) for c in payload],
    )
    r_tagged = right.select(
        *on,
        ts_us(F.col(right_ts)).alias("_t_us"),
        F.lit(r_side).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tie"),
        r_pay.alias("_pay"),
    )
    l_pay = F.struct(*[F.col(c).alias(c) for c in left_cols])
    l_tagged = left.select(
        *on,
        ts_us(F.col(left_ts)).alias("_t_us"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(r_tagged.schema["_pay"].dataType).alias("_pay"),
        l_pay.alias("_lpay"),
    )
    r_tagged = r_tagged.withColumn(
        "_lpay", F.lit(None).cast(l_tagged.schema["_lpay"].dataType)
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("_t_us", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_lpay").isNotNull())
    )
    if tolerance_us is not None:
        carried = carried.withColumn(
            "_asof",
            F.when(
                F.col("_t_us") - F.col("_asof")["_rts"] <= F.lit(tolerance_us),
                F.col("_asof"),
            ),  # else null — too old to count as a match
        )
    return carried.select(
        *[F.col("_lpay")[c].alias(c) for c in left_cols],
        F.col("_t_us").alias("left_ts_us"),
        F.col("_asof")["_rts"].alias("asof_ts_us"),
        *[F.col("_asof")[c].alias(f"asof_{c}") for c in payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    width_us: int,
    bin_us: int | None = None,
    point_cols: Sequence[str] = (),
    interval_cols: Sequence[str] = (),
) -> DataFrame:
    """Equi-join points into [start, start+width_us) time intervals via
    the bin trick. Returns one row per (interval, contained point) with
    the requested projections plus ``_p_us``/``_s_us`` micros columns.
    ``bin_us`` defaults to the interval width — the explode factor is
    then at most 2 bins per interval."""
    if bin_us is None:
        bin_us = width_us

    p = points.select(
        *point_cols, ts_us(F.col(point_ts)).alias("_p_us")
    ).withColumn("_bin", F.floor(F.col("_p_us") / F.lit(bin_us)))

    iv = intervals.select(
        *interval_cols, ts_us(F.col(start_ts)).alias("_s_us")
    )
    # explode each interval to every bin it overlaps; end is exclusive,
    # so the last overlapped bin is floor((end-1)/W).
    iv = iv.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("_s_us") / F.lit(bin_us)),
                F.floor((F.col("_s_us") + F.lit(width_us - 1)) / F.lit(bin_us)),
            )
        ),
    )
    joined = iv.join(p, "_bin").where(
        (F.col("_p_us") >= F.col("_s_us"))
        & (F.col("_p_us") < F.col("_s_us") + F.lit(width_us))
    )
    return joined.drop("_bin")

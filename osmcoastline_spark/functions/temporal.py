"""Temporal event operators: as-of join, gap sessionization, binned
range join, and trailing-window rolling stats.

Classic engine operators a training-data/event pipeline needs that Spark
lacks as built-ins. Both are single-shuffle, pure-Catalyst plans:

- `asof_join`: for every left row, the latest right row with
  right.ts <= left.ts per key — implemented as the union+window pattern
  (tag both sides, sort per key by (ts, tag), carry the right payload
  forward with last_value(ignoreNulls)), NOT a join: one exchange on the
  key, no join node at all, and no range-explode. The DuckDB oracle runs
  its NATIVE `ASOF JOIN` operator, so the correctness row cross-checks
  two genuinely different algorithms.
- `sessionize`: gap-based sessions per key (new session when the gap to
  the previous event exceeds `gap`), with per-session aggregates. The
  session-index window and the per-session regroup share the key prefix,
  so the whole operator is one exchange.

Scale posture: both shuffle once on the entity key. Per-key processing is
sequential by nature (ordered scan), but partitions hold many keys, so
parallelism is O(keys), not O(1); per-key row counts are bounded by
retention in practice. A pathological hot key is an input-data property —
AQE skew handling applies since the exchange is a plain hash partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Attach to each left row the payload of the latest right row with
    `right.ts <= left.ts` for the same `on` key (NULLs when none).

    Ties: a right row at exactly left.ts matches (ASOF `>=` semantics —
    the right side sorts before the left at equal ts via the source tag).
    Right-side ties at the same ts resolve to the LAST one in
    (ts, *payload) order, deterministically.

    The matched row is carried as ONE struct (not per-column
    last(ignorenulls)): a NULL inside the winning right row's payload
    stays NULL instead of being backfilled from an OLDER right row —
    per-column carries would tear the row, mixing fields of different
    right rows. Right rows with NULL ts are dropped up front (they can
    never satisfy `right.ts <= left.ts`; under nulls-first ordering
    they would otherwise win as a bogus baseline for every left row).
    Right rows with a NULL key are dropped too: `partitionBy` groups
    NULLs together, so they would otherwise match NULL-key left rows —
    SQL/DuckDB ASOF equality never matches NULL = NULL. NULL-key left
    rows therefore land in an all-left partition and carry NULL payload,
    exactly what a LEFT ASOF JOIN produces for them.
    """
    lcols = left.columns
    pay = list(payload_cols)
    # one atomic struct per right row: all payload fields + the match ts
    p_struct = F.struct(
        *[F.col(c).alias(c) for c in pay], F.col(ts_col).alias("_mts")
    )
    l_tag = left.withColumn("_src", F.lit(1)).withColumn(
        "_p",
        F.lit(None).cast(
            "struct<"
            + ", ".join(
                [f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in pay]
                + [f"`_mts`: {right.schema[ts_col].dataType.simpleString()}"]
            )
            + ">"
        ),
    )
    r_tag = right.filter(F.col(ts_col).isNotNull() & F.col(on).isNotNull()).select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_src"),
        p_struct.alias("_p"),
    )
    for c in lcols:
        if c not in (on, ts_col):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    both = l_tag.unionByName(r_tag.select(l_tag.columns))
    # right rows sort before left rows at equal ts (ASOF >=); right-side
    # ties order by the payload struct for a deterministic winner (struct
    # ordering is field-wise, so this is the documented (*payload) order)
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_src", "_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_p", ignorenulls=True).over(w)
    return (
        both.select(*lcols, "_src", carried.alias("_m"))
        .filter(F.col("_src") == 1)
        .select(
            *lcols,
            *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in pay],
            F.col("_m._mts").alias(f"{prefix}{ts_col}"),
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event exceeds `gap_seconds`.

    Output, one row per session: (key, session_idx, session_start,
    session_end, n_events, sum_value) with session_idx numbered from 1 in
    time order within the key. The cumulative-sum-of-starts window and
    the per-session regroup share the key prefix — one exchange total.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # exact integer micros on both engines (Spark unix_micros / DuckDB
    # epoch_us) — a seconds cast would truncate sub-second gaps. The
    # timestamp cast lifts TIMESTAMP_NTZ parquet columns (session tz is
    # pinned to UTC in session.py, so the wall time IS the epoch time,
    # matching DuckDB's epoch_us on the same parquet bytes).
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    start = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return (
        events.withColumn("session_idx", F.sum(start).over(w))
        .groupBy(key_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    on: str | None = None,
    bin_width_s: float = 300.0,
    prefix: str = "ivl_",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Range join: every (point, interval) pair with
    `lo <= point.t < hi` (half-open), optionally also matching an equi
    key `on` — the third classic temporal operator Spark lacks as a
    built-in (the other two live above). The canonical use is window
    attribution: clicks within N minutes after an error, events inside
    a session, points inside a validity interval.

    Plan: bin both sides on `floor(epoch_us / w)` — each interval
    explodes into the bins it covers, each point carries its single
    bin — then ONE equi-join on (bin[, key]) and the exact range
    predicate as a post-filter. This is the standard binned range join:
    the join never degrades to the O(points × intervals) cross product a
    raw inequality join plans as (Spark would emit
    BroadcastNestedLoopJoin/CartesianProduct for the bare `BETWEEN`).
    Pick `bin_width_s` near the typical interval length: wider bins cut
    the explode factor, narrower bins cut false candidates; either way
    each true pair is produced exactly once (a point matches an interval
    only in the point's own bin), so no distinct pass is needed.

    Degenerate inputs are handled, loudly where it matters: empty
    intervals (`hi <= lo`) are dropped (half-open semantics), and an
    interval covering more than `max_bins_per_interval` bins fails the
    job with a clear message instead of silently exploding the cluster
    (`raise_error` inside the plan — lazy, per-row, no driver action).

    Output: all point columns + all interval columns renamed with
    `prefix`. Scale posture: one exchange per side on (bin[, key]);
    bins bound the join fan-in the way cells bound the spatial joins.
    """
    w = int(bin_width_s * 1_000_000)
    if w <= 0:
        raise ValueError(f"bin_width_s must be > 0, got {bin_width_s}")

    p_us = F.unix_micros(F.col(t_col).cast("timestamp"))
    pt = points.withColumn("_bin", F.floor(p_us / F.lit(w)))

    lo_us = F.unix_micros(F.col(lo_col).cast("timestamp"))
    hi_us = F.unix_micros(F.col(hi_col).cast("timestamp"))
    first_bin = F.floor(lo_us / F.lit(w))
    last_bin = F.floor((hi_us - 1) / F.lit(w))
    nbins = last_bin - first_bin + 1
    iv = (
        intervals.filter(hi_us > lo_us)
        .select(
            *[F.col(c).alias(prefix + c) for c in intervals.columns],
            F.explode(
                F.sequence(
                    first_bin,
                    F.when(
                        nbins > max_bins_per_interval,
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    f"range_join: interval covers > "
                                    f"{max_bins_per_interval} bins at "
                                    f"bin_width_s={bin_width_s}; widen the bin "
                                    f"or raise max_bins_per_interval (interval "
                                    f"lo="
                                ),
                                F.col(lo_col).cast("string"),
                                F.lit(")"),
                            )
                        ).cast("long"),
                    ).otherwise(last_bin),
                )
            ).alias("_bin"),
        )
    )

    cond = pt["_bin"] == iv["_bin"]
    if on is not None:
        cond = cond & (pt[on] == iv[prefix + on])
    plo = F.unix_micros(F.col(prefix + lo_col).cast("timestamp"))
    phi = F.unix_micros(F.col(prefix + hi_col).cast("timestamp"))
    return (
        pt.join(iv, cond, "inner")
        .filter((p_us >= plo) & (p_us < phi))
        .drop("_bin")
    )


def rolling_stats(
    events: DataFrame,
    window_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count and
    value sum of the same key's events in `[ts - window_seconds, ts]`,
    plus the gap to the key's previous event — the fourth classic
    temporal operator (the others live above). The canonical use is
    feature engineering over an event log: "requests by this user in the
    last 24 h", "time since their previous action".

    Plan: a RANGE frame over micros (`rangeBetween(-W, 0)` on
    `unix_micros(ts)`), NOT a self-join — the naive formulation is a
    range self-join producing O(rows × window_fanout) pairs and then a
    regroup; the window form touches each row once. Both frame columns
    and the lag share `partitionBy(key)`, so the whole operator is ONE
    exchange (pinned by test); the range frame adds a second sort but no
    second shuffle.

    Exactness: RANGE frames are peer-inclusive — rows tied on the order
    value all see the same frame in every engine, so the frame count/sum
    are deterministic without a tiebreak. `lag` IS order-sensitive under
    ties, so the gap window orders by `(ts, order_tiebreak)`; the first
    event per key carries the -1 sentinel (a NULL would round-trip as
    float64 through the comparator). The value sum is per-row
    micro-quantized to int64 before the frame sum (same idiom as
    `sessionize`), so it is order-independent and engine-exact.

    Scale posture: one hash exchange on the key; frame evaluation is a
    bounded backward scan per partition (Spark keeps only the live
    frame in memory, not the whole partition, for bounded-preceding
    RANGE frames). Hot keys are an input property — AQE skew handling
    applies as with the other temporal operators.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    vmicros = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    ev = events.withColumn("_ts_us", us).withColumn("_v_us", vmicros)
    w_frame = (
        Window.partitionBy(key_col)
        .orderBy("_ts_us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    w_lag = Window.partitionBy(key_col).orderBy("_ts_us", order_tiebreak)
    return ev.select(
        order_tiebreak,
        key_col,
        F.col("_ts_us").alias("ts_us"),
        F.count(F.lit(1)).over(w_frame).alias("n_window"),
        F.sum("_v_us").over(w_frame).alias("sum_window_micros"),
        F.coalesce(
            F.col("_ts_us") - F.lag("_ts_us").over(w_lag), F.lit(-1).cast("long")
        ).alias("gap_prev_us"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    on: str | None = None,
    bin_width_s: float = 300.0,
    prefix: str = "r_",
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Interval×interval OVERLAP join: every (left, right) pair of
    half-open intervals with `l.lo < r.hi AND r.lo < l.hi`, optionally
    also matching an equi key `on` — the fourth temporal operator
    (range_join handles point-in-interval; this is its two-sided
    sibling: sessions × outage windows, validity ranges × validity
    ranges).

    Plan: both sides explode into the bins they cover and ONE equi-join
    on (bin[, key]) runs with the exact overlap predicate as a
    post-filter. A raw inequality join plans as BroadcastNestedLoop /
    CartesianProduct; the bins bound fan-in exactly like range_join's.
    Exactly-once without a distinct pass: an overlapping pair shares
    every bin of the overlap region, so the join would emit it once per
    shared bin — the post-filter keeps ONLY the bin of the overlap's
    first micro, `bin == floor(greatest(l.lo, r.lo) / w)`, a bin both
    sides necessarily cover (l.lo <= max < min(hi) <= l.hi and
    symmetrically), so each true pair survives exactly once.

    Output: all left columns + overlap_us (exact int64 overlap length,
    least(hi)-greatest(lo)) + right columns renamed with `prefix`.
    Empty intervals drop (half-open); an interval covering more than
    `max_bins_per_interval` bins fails loudly in-plan (range_join's
    raise_error idiom).
    """
    w = int(bin_width_s * 1_000_000)
    if w <= 0:
        raise ValueError(f"bin_width_s must be > 0, got {bin_width_s}")

    def binned(df: DataFrame, rename: str | None) -> DataFrame:
        lo_us = F.unix_micros(F.col(lo_col).cast("timestamp"))
        hi_us = F.unix_micros(F.col(hi_col).cast("timestamp"))
        first_bin = F.floor(lo_us / F.lit(w))
        last_bin = F.floor((hi_us - 1) / F.lit(w))
        nbins = last_bin - first_bin + 1
        cols = (
            [F.col(c).alias(rename + c) for c in df.columns]
            if rename
            else [F.col(c) for c in df.columns]
        )
        return df.filter(hi_us > lo_us).select(
            *cols,
            F.explode(
                F.sequence(
                    first_bin,
                    F.when(
                        nbins > max_bins_per_interval,
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    f"interval_join: interval covers > "
                                    f"{max_bins_per_interval} bins at "
                                    f"bin_width_s={bin_width_s}; widen the bin "
                                    f"or raise max_bins_per_interval (lo="
                                ),
                                F.col(lo_col).cast("string"),
                                F.lit(")"),
                            )
                        ).cast("long"),
                    ).otherwise(last_bin),
                )
            ).alias("_bin"),
        )

    lt = binned(left, None)
    rt = binned(right, prefix)
    cond = lt["_bin"] == rt["_bin"]
    if on is not None:
        cond = cond & (lt[on] == rt[prefix + on])
    llo = F.unix_micros(F.col(lo_col).cast("timestamp"))
    lhi = F.unix_micros(F.col(hi_col).cast("timestamp"))
    rlo = F.unix_micros(F.col(prefix + lo_col).cast("timestamp"))
    rhi = F.unix_micros(F.col(prefix + hi_col).cast("timestamp"))
    return (
        lt.join(rt, cond, "inner")
        .filter(
            (llo < rhi)
            & (rlo < lhi)
            & (lt["_bin"] == F.floor(F.greatest(llo, rlo) / F.lit(w)))
        )
        .withColumn("overlap_us", F.least(lhi, rhi) - F.greatest(llo, rlo))
        .drop("_bin")
    )

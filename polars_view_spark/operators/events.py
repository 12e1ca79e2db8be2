"""Event-stream operators (batch form; streaming flavors in streaming/).

- tumbling-window aggregation
- sessionization (gap-based)
- as-of join (latest right row at or before each left timestamp)
- range join (value-in-bucket)
- ordered funnel analysis (chained first-qualifying-timestamp windows)
- weekly retention cohorts (cohort × week-offset activity matrix)

The as-of join is the interesting one at scale: the naive formulation is an
inequality join (quadratic blowup per key).  This implementation uses the
union-merge pattern — tag both sides, union, and carry the latest right row
forward with a window ``last(..., ignorenulls)`` over (key, time).  One
shuffle on (key), linear work, no range-join explosion.  DuckDB's native
``ASOF JOIN`` serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts/sums via the built-in ``window`` function —
    the same operator Structured Streaming uses, so batch and stream share
    semantics."""
    return (
        events.groupBy(F.window(F.col(ts_col), width).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-6), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user is idle
    longer than ``gap_minutes``.

    Classic two-window formulation: lag → boundary flag → running sum =
    session index.  Both windows share the same (user, time) partitioning,
    so Catalyst plans ONE shuffle and two in-partition passes.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap_sec = gap_minutes * 60
    sessions = (
        events.withColumn("prev_ts", F.lag(ts_col).over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp(ts_col) - F.unix_timestamp("prev_ts")
                    > gap_sec
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("new_session").over(w))
    )
    return (
        sessions.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias(
                "duration_sec"
            ),
        )
        .withColumnRenamed("session_idx", "session_id")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    right_tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` and matching key.  Left rows with no earlier
    right row keep NULLs (LEFT OUTER asof semantics).

    Union-merge plan: one shuffle on the key, one in-partition ordered pass —
    O(n log n) per partition, no inequality-join blowup.  Tie rule: a right
    row at exactly ``left_ts`` IS visible (<=), implemented by sorting right
    rows before left rows at equal timestamps.

    ``right_tiebreak_cols``: when several right rows share the same
    ``(key, right_ts)``, the one sorting LAST by these columns (ascending)
    wins — which lets a caller fold a keep-max dedup of the right side
    into the merge window instead of paying a separate exchange + window
    pass for it (optimization guide §2.4: operations keyed the same way
    should share one partitioning).  ``asof_join(events,
    dedup_exact(orders, [k, d], -key), ...)`` ≡ ``asof_join(events,
    orders, ..., right_tiebreak_cols=("key",))`` with one fewer shuffle.
    With the default ``()``, duplicate-(key, ts) right rows are carried in
    an engine-determined order — exactly the previous behavior; pass the
    tiebreak (or pre-dedup) when duplicates are possible.
    """
    lt = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}")
            for c in right_tiebreak_cols
        ],
    )
    rt = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        *[F.col(c).alias(f"__tb_{c}") for c in right_tiebreak_cols],
    )
    merged = lt.unionByName(rt)
    # right rows (is_left=0) sort before left rows at the same timestamp →
    # last(ignorenulls) over the running frame sees them (<= semantics);
    # tiebreak columns order duplicate-(key, ts) right rows so the winner
    # is deterministic (left rows carry NULL tiebreaks — their relative
    # order among themselves cannot affect any carry)
    w = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__ts").asc(),
            F.col("__is_left").asc(),
            *[F.col(f"__tb_{c}").asc_nulls_first() for c in right_tiebreak_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in right_value_cols
        ],
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        F.col("__left.*"),
        *[F.col(f"__rv_{c}").alias(c) for c in right_value_cols],
    )


def multi_granularity_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    granularities: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous-aggregate pyramid: counts/sums at
    several time granularities in ONE pass via GROUPING SETS over the
    truncated timestamps.

    The scan is read once; each grouping set gets its own partial
    aggregation sharing the same shuffle — at 100 TB this replaces N
    separate rollup jobs with one.  Output is long-form
    (granularity, bucket, group, n, sum) ready to serve dashboards or to be
    written as a partitioned rollup table.
    """
    truncs = [
        F.date_format(F.date_trunc(g, F.col(ts_col)), "yyyy-MM-dd HH:mm").alias(f"__b_{g}")
        for g in granularities
    ]
    base = events.select(*truncs, *group_cols, "value")
    sets = ", ".join(f"(__b_{g}, {', '.join(group_cols)})" for g in granularities)
    base.createOrReplaceTempView("__pvs_rollup_base")
    bucket_case = " ".join(
        f"WHEN __b_{g} IS NOT NULL THEN '{g}'" for g in granularities
    )
    bucket_val = "COALESCE(" + ", ".join(f"__b_{g}" for g in granularities) + ")"
    spark = events.sparkSession
    return spark.sql(
        f"""
        SELECT CASE {bucket_case} END AS granularity,
               {bucket_val} AS bucket,
               {', '.join(group_cols)},
               COUNT(*) AS n_events,
               ROUND(SUM(value) + 1e-6, 2) AS sum_value
        FROM __pvs_rollup_base
        GROUP BY GROUPING SETS ({sets})
        """
    )


def range_join(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join facts to [lo, hi) buckets.  The bucket table is broadcast
    (bucket tables are small by construction) — at scale this is a
    BroadcastNestedLoopJoin over a tiny side, which is the right plan;
    for large range tables, bucketize arithmetic replaces the join."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "left")


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel analysis — per user, step N counts only if it
    happens STRICTLY AFTER that user's qualifying step N-1 (the product
    analytics primitive; reference analogue: the filter→aggregate
    pipelines of SURVEY §2B composed over event order).

    Semantics (the standard funnel DP): walking each user's events in
    ``(ts, event_id)`` order, carry the earliest qualifying timestamp of
    every step so far; an event qualifies for step N when its type
    matches and the step N-1 carry is non-null and strictly earlier.
    Emits one row per step: ``(step, event_type, n_users)`` with
    ``n_users`` monotonically non-increasing by construction.

    Scale shape: ONE user-keyed shuffle — the chained per-step windows
    share a single ``(user, ts, id)`` sort-partitioning (one Exchange,
    N Window nodes over it — verified via .explain), and the final
    per-user collapse reuses the same partitioning; no self-join, no
    per-user collect_list (state per row is ``len(steps)`` timestamps,
    independent of a user's event count — a power user with 10⁶ events
    costs no more memory than a one-event user)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events
    prev: str | None = None
    for i, step in enumerate(steps):
        qual = F.col(type_col) == step
        if prev is not None:
            qual = qual & F.col(prev).isNotNull() & (F.col(ts_col) > F.col(prev))
        cur = f"__t{i}"
        # earliest qualifying ts of this step among rows up to here
        df = df.withColumn(cur, F.min(F.when(qual, F.col(ts_col))).over(w))
        prev = cur
    per_user = df.groupBy(user_col).agg(
        *[F.min(f"__t{i}").alias(f"__t{i}") for i in range(len(steps))]
    )
    counts = per_user.select(
        *[
            F.sum(F.when(F.col(f"__t{i}").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    # unpivot the one-row aggregate with an explode of literal structs —
    # no join node at all (a steps-table crossJoin would plan as a
    # BroadcastNestedLoopJoin the audit has to allowlist)
    structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(structs).alias("r"))
        .select("r.step", "r.event_type", "r.n_users")
        .orderBy("step")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention-cohort matrix: users are cohorted by the ISO week
    of their FIRST event, and each cell counts how many of a cohort's
    users were active ``week_offset`` weeks later — the
    activation/retention curve every growth dashboard draws, and at
    training-pipeline scale the freshness profile of a source (how long
    documents from crawl-week W keep appearing in later snapshots).

    Exactness: both the cohort and the activity week are
    ``date_trunc('week', ts)`` (Monday-start in Spark AND DuckDB), so the
    day difference is an exact multiple of 7 and ``// 7`` is exact
    integer arithmetic.

    Scale shape: the first-event timestamp is a user-partitioned window
    ``min`` (no order — one Exchange, no sort), and the per-user week
    dedup is a ``collect_set`` that RIDES the same user-keyed
    partitioning (Catalyst reuses the window's Exchange — a 3-key
    ``distinct`` here would re-shuffle every event row); only the final
    cohort×offset rollup reshuffles.  Two shuffles total, each on keys
    with cardinality ≪ rows; per-user state is the set of distinct
    active weeks (bounded by the observation span, not the event
    count).  No join anywhere: the cohort label travels with the row
    through the window."""
    wu = Window.partitionBy(user_col)
    # keep user_col's NAME through the projections: re-aliasing the key
    # breaks alias-aware partitioning propagation and re-introduces the
    # shuffle the collect_set exists to avoid (observed: an Exchange on
    # the renamed key between the window and the aggregate)
    per_row = events.select(
        F.col(user_col),
        F.to_date(F.date_trunc("week", F.col(ts_col))).alias("aw"),
        F.to_date(F.date_trunc("week", F.min(ts_col).over(wu))).alias("cw"),
    ).select(
        user_col,
        "cw",
        (F.datediff("aw", "cw") / 7).cast("long").alias("off"),
    )
    per_user = per_row.groupBy(user_col).agg(
        F.first("cw").alias("cohort_week"),
        F.collect_set("off").alias("offsets"),
    )
    return (
        per_user.select("cohort_week", F.explode("offsets").alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    ``(from_type, to_type) → count, share_ppm`` where consecutive means
    adjacent in the user's ``(ts, id)`` order — the Markov-chain summary
    behind next-event prediction, session-flow dashboards, and (in a
    training pipeline) the document-state transition profile of a
    multi-stage filter.  ``share_ppm`` is the integer-exact row share
    within each ``from_type`` (count·10⁶ // row total), so the entire
    matrix value-hashes.

    Scale shape: one user-keyed sort-partitioning for the ``lag`` window
    (the funnel's Exchange shape), then one rollup onto the
    |types|² matrix — the shuffle after the window carries at most one
    row per (partition × pair).  No self-join: adjacency comes from
    ``lag``, never from events ⋈ events."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.expr("CAST(n * 1000000L DIV SUM(n) OVER (PARTITION BY from_type) AS BIGINT)").alias(
            "share_ppm"
        ),
    ).orderBy("from_type", "to_type")


def rolling_distinct_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact trailing-N-day distinct users per day (rolling WAU/MAU) —
    the metric naive SQL cannot window: COUNT(DISTINCT) is not additive,
    so a sliding-frame window either rescans N days of raw rows per day
    or approximates with sketches.  The exact distributed form: dedup to
    ``(user, active_day)`` once, EXPLODE each pair to the ``window_days``
    report days it covers (day .. day+N−1), re-dedup ``(user,
    report_day)``, count — a bounded ×N blowup of the already-collapsed
    pairs frame, never of the raw events.

    Report days span only the observed range (no trailing tail past the
    last event); a day with no active users in its window appears with
    count 0 via the generated day spine, so the output shape is a dense
    daily series.

    Scale shape: shuffles touch (a) the (user, day) dedup — distinct
    pairs, not events, (b) the exploded pairs — ≤ N× that, (c) the final
    per-day rollup.  Nothing is ever N-day-rescanned and no state grows
    with the user count."""
    day = F.to_date(F.col(ts_col))
    pairs = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), day.alias("d"))
        .distinct()
    )
    covered = pairs.select(
        "u",
        F.explode(
            F.expr(f"sequence(d, date_add(d, {int(window_days) - 1}))")
        ).alias("rd"),
    ).distinct()
    counts = covered.groupBy("rd").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    bounds = pairs.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi)")).alias("report_day")
    )
    return (
        spine.join(counts, spine.report_day == counts.rd, "left")
        .select(
            "report_day",
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
        .orderBy("report_day")
    )


def resample_ffill(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Dense hourly resample with forward fill — the gap-filling
    companion of :func:`tumbling_agg`, which emits only non-empty
    buckets: every (type, hour) cell of the observed time range appears,
    quiet hours carry ``n_events = 0``, and ``filled_sum`` carries the
    last observed hourly sum forward (the dashboard/sensor convention;
    hours before a type's first observation stay NULL — fabricating a
    reading there would be a lie).

    Scale shape: the hourly aggregate is the only row-volume shuffle
    (map-side combined onto (type, hour)); the spine is tiny-by-
    construction — distinct types × the hour sequence from a one-row
    bounds aggregate, both broadcast — and the forward fill is a
    TYPE-partitioned ``last(ignorenulls)`` window (hours per type, never
    a global order)."""
    hour = F.date_trunc("hour", F.col(ts_col))
    agg = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(type_col).alias("t"), hour.alias("h"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum(value_col) + F.lit(1e-6), 2).alias("sum_value"),
        )
    )
    bounds = events.filter(F.col(ts_col).isNotNull()).agg(
        F.date_trunc("hour", F.min(ts_col)).alias("lo"),
        F.date_trunc("hour", F.max(ts_col)).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h")
    )
    types = events.select(F.col(type_col).alias("t")).distinct()
    spine = types.crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("t")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, ["t", "h"], "left")
        .withColumn("filled_sum", F.last("sum_value", ignorenulls=True).over(w))
        .select(
            F.col("t").alias(type_col),
            F.date_format("h", "yyyy-MM-dd HH:mm").alias("bucket_hour"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            "filled_sum",
        )
        .orderBy(type_col, "bucket_hour")
    )

"""Event-stream operators over the events table.

Batch DataFrame implementations here (SQL-oracle-checkable); the same
transformations run under Structured Streaming in
shacl_rust_spark/streaming/ (readStream → writeStream, watermarks for
late data) — the reference has no streaming surface (SURVEY.md §2),
so these are pipeline-side additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts + value sums per event_type."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal accumulation → identical double in any
            # engine regardless of partial-aggregation order
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sum_value"),
        )
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Gap-based sessions per user (new session when > 30 min since the
    previous event); returns per-session bounds + event count."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_seconds(cast …) floors to whole seconds.
    # Only DIFFS are used, so any constant session-timezone offset cancels.
    secs = F.expr("unix_seconds(cast(ts as timestamp))")
    gapped = events.withColumn(
        "_new",
        (secs - F.lag(secs, 1).over(w) > SESSION_GAP_MIN * 60).cast("int"),
    ).withColumn("_new", F.coalesce(F.col("_new"), F.lit(1)))
    sess = gapped.withColumn(
        "session_seq", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def asof_join(
    events: DataFrame, probe_type: str = "click", ref_type: str = "view"
) -> DataFrame:
    """As-of join within the events table: for every probe event (e.g.
    a click), the most recent ref event (e.g. a view) by the SAME user
    at-or-before the probe's timestamp — <= semantics, ties on ts break
    to the highest ref event_id. Probes with no prior ref are dropped
    (inner as-of). Returns (probe_id, user_id, probe_ts, ref_id,
    ref_ts, ref_value, gap_us).

    Spark has no ASOF JOIN operator (DuckDB/Pandas do), so this is the
    composition that scales: union both sides and take a running
    last(ignorenulls) of the ref struct over one window per user
    ordered by (ts, is_ref DESC, event_id) — refs sort before probes at
    equal ts, giving the <= bound. ONE shuffle on user_id, state
    bounded by a single struct per row; never the range self-join,
    whose per-user quadratic term explodes on power users."""
    cols = ["user_id", "ts", "event_id", "value"]
    refs = events.where(F.col("event_type") == ref_type).select(
        *cols, F.lit(1).alias("_is_ref")
    )
    probes = events.where(F.col("event_type") == probe_type).select(
        *cols, F.lit(0).alias("_is_ref")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("_is_ref").desc(), F.col("event_id").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref_struct = F.when(
        F.col("_is_ref") == 1,
        F.struct(
            F.col("event_id").alias("rid"),
            F.col("ts").alias("rts"),
            F.col("value").alias("rvalue"),
        ),
    )
    # only DIFFS of unix_micros are used, so the NTZ→LTZ cast's constant
    # session-timezone offset cancels (same device as sessionize above)
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    ref_micros = F.unix_micros(F.col("_ref.rts").cast("timestamp"))
    return (
        refs.unionByName(probes)
        .withColumn("_ref", F.last(ref_struct, ignorenulls=True).over(w))
        .where((F.col("_is_ref") == 0) & F.col("_ref").isNotNull())
        .select(
            F.col("event_id").alias("probe_id"),
            "user_id",
            F.col("ts").alias("probe_ts"),
            F.col("_ref.rid").alias("ref_id"),
            F.col("_ref.rts").alias("ref_ts"),
            F.col("_ref.rvalue").alias("ref_value"),
            (micros - ref_micros).alias("gap_us"),
        )
    )


def funnel(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel analysis: (step_idx, step, n_users) where a user
    reaches step k iff an event of type steps[k] occurs STRICTLY after
    the timestamp at which they reached step k-1 (earliest-match
    semantics — step k's anchor is the minimum qualifying ts).

    Plan: ONE shuffle. Events are pre-filtered to the step types, then
    per-user sorted arrays are scanned with a higher-order-function
    aggregate (JVM-side, no Python) whose accumulator is (steps
    reached, anchor ts). The greedy earliest-first scan computes
    exactly the min-ts join chain (min t1; min t2 > t1; …), which is
    how the DuckDB oracle states the semantics — two independent
    formulations of the same funnel. Per-user state is bounded by the
    user's own funnel-event count; no per-step join or recompute of
    the upstream scan."""
    sidx = None
    for i, s in enumerate(steps):
        cond = F.col("event_type") == s
        sidx = (F.when(cond, F.lit(i + 1)) if sidx is None
                else sidx.when(cond, F.lit(i + 1)))
    # diffs/comparisons only → constant NTZ→LTZ offset cancels
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (
        events.where(F.col("event_type").isin(*steps))
        .select(
            "user_id",
            F.struct(
                micros.alias("t"),
                F.col("event_id").alias("eid"),
                sidx.alias("s"),
            ).alias("_e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
    )

    def _step(acc, e):
        adv = (e["s"] == acc["r"] + 1) & (
            (acc["r"] == 0) | (e["t"] > acc["lt"])
        )
        return F.struct(
            F.when(adv, acc["r"] + 1).otherwise(acc["r"]).alias("r"),
            F.when(adv, e["t"]).otherwise(acc["lt"]).alias("lt"),
        )

    reached = F.aggregate(
        "_evs",
        F.struct(F.lit(0).alias("r"), F.lit(-1).cast("long").alias("lt")),
        _step,
    )["r"]
    names = F.array(*[F.lit(s) for s in steps])
    return (
        per_user.select(reached.alias("_r"))
        .where(F.col("_r") > 0)
        .select(F.explode(F.sequence(F.lit(1), F.col("_r")))
                .alias("_i"))
        .groupBy("_i")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("_i").cast("bigint").alias("step_idx"),
            F.element_at(names, F.col("_i")).alias("step"),
            "n_users",
        )
    )


def retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: cohort_week = Monday-truncated week of
    the user's first event; one output row per (cohort_week,
    week_offset) with the count of distinct cohort users active that
    week. Two narrow aggregates + one join on user_id — the cohort
    table is users-sized, far below the event count, and AQE
    broadcasts it when small."""
    # TIMESTAMP-typed weeks (Monday-truncated midnights) — the
    # engine-portable calendar key (same device as windowed_counts)
    wk = F.date_trunc("week", F.col("ts"))
    firsts = events.groupBy("user_id").agg(
        F.min(wk).alias("cohort_week")
    )
    active = events.select("user_id", wk.alias("_w")).distinct()
    offset = F.floor(
        F.datediff(F.col("_w"), F.col("cohort_week")) / 7
    ).cast("bigint")
    return (
        active.join(firsts, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def rollup_counts(events: DataFrame) -> DataFrame:
    """OLAP ROLLUP over (event_type, day): per-(type, day) counts and
    exact-decimal value sums, plus the per-type and grand-total
    super-aggregate rows, disambiguated by grouping_id — the
    hypertable-rollup surface, computed in one pass by the engine's
    native ROLLUP (partial aggregation per level, no self-union)."""
    return (
        events.select(
            "event_type",
            # STRING-typed day key: the super-aggregate rows carry
            # NULL day, and a NULL string is the one calendar type
            # every engine surfaces identically
            F.to_date("ts").cast("string").alias("day"),
            "value",
        )
        .rollup("event_type", "day")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sum_value"),
        )
    )


def heavy_hitters(events: DataFrame, k: int = 3) -> DataFrame:
    """(event_type, user_id, n_events, rank): the exact top-k heaviest
    users per event type, ties to the smaller user_id. Two-level plan:
    the groupBy is the only full shuffle of the fact table (map-side
    combined), and the per-type rank window rides the resulting
    (event_type)-clustered data with the rn ≤ k WindowGroupLimit
    pushed below its exchange — each map task forwards at most k rows
    per type, so the window stage moves O(types·k) rows regardless of
    user cardinality. The sketch twin for when even the (type, user)
    aggregate won't fit is count-min (ops/sketch.py); this is the
    exact formulation."""
    from pyspark.sql import Window

    counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def value_outliers(events: DataFrame, factor: int = 4) -> DataFrame:
    """Events whose value exceeds `factor` × their type's mean value —
    the per-stream anomaly gate. The mean is never materialized as a
    float: the filter is the cross-multiplied form
    value · n > factor · sum(value), with sum accumulated in exact
    DECIMAL (order-independent) and the final comparison in double on
    identical operands — engine-exact. The 5-row per-type stats frame
    broadcasts; one scan of the fact side."""
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double").alias("_sum"),
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .where(
            F.col("value") * F.col("_n").cast("double")
            > F.lit(float(factor)) * F.col("_sum")
        )
        .select("event_id", "user_id", "event_type", "value")
    )


def transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's
    ts-ordered event stream: (from_type, to_type, n) for every
    consecutive pair (ties broken by event_id — the deterministic
    total order every windowed op in this module uses). The
    behavioral-model / next-event-prediction input table. ONE shuffle
    on user_id for the lag window, then a tiny (|types|²-bounded)
    aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("_prev", F.lag("event_type").over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull the integer `k` out of the
    JSON `props` column (engine JSON path, no Python) and aggregate
    per event_type — (event_type, n_with_k, sum_k, min_k, max_k).
    The ETL pattern for event payloads at scale: extract typed fields
    ONCE in the scan projection (whole-stage codegen), aggregate on
    the typed column; rows whose payload lacks the field drop out as
    NULLs. Exact integer aggregates — engine-portable."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("_k"))
        .where(F.col("_k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_with_k"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
        )
    )


def pivot_daily_counts(
    events: DataFrame,
    types: tuple = ("view", "click", "purchase", "signup", "error"),
) -> DataFrame:
    """Wide daily activity matrix via the engine's native PIVOT: one
    row per day, one count column per event type (explicit value
    list — never the two-pass distinct-discovery form, which adds a
    full scan and makes the schema data-dependent). Missing cells are
    0. The BI-export / feature-matrix surface."""
    out = (
        events.select(
            F.to_date("ts").cast("string").alias("day"), "event_type"
        )
        .groupBy("day")
        .pivot("event_type", list(types))
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, list(types))


def gapfill_daily(events: DataFrame) -> DataFrame:
    """Per-user daily calendar spine with forward-filled activity:
    one row per (user_id, day) for EVERY day in the user's observed
    [first, last] event range — days with no events get obs=0 and
    carry the last observed day's value forward. Returns (user_id,
    day, obs, n_events, filled_cents): n_events is that day's count
    (0 on gap days), filled_cents the forward-filled daily value sum
    in integer cents. The time-series regularizer every downstream
    ML feature join needs (models want a dense grid, logs are
    sparse).

    Plan: one groupBy collapses events to (user, day) partials; the
    spine comes from `sequence()` + explode over each user's own
    [min_day, max_day] — per-user range, NOT the global calendar
    cross-join, so a one-day user costs one row and the spine is
    bounded by Σ per-user spans. The forward fill is
    last(ignorenulls) over the user-partitioned window — the same
    key partitioning the groupBy produced. Day emits as TIMESTAMP
    (non-null by construction) for exact cross-engine string parity."""
    daily = (
        events.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy(
            "user_id", F.to_date("ts").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
                .cast("bigint")
            ).alias("day_cents"),
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
        .select(
            "user_id",
            F.explode(F.sequence("_d0", "_d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.when(F.col("n_events").isNotNull(), F.lit(1))
            .otherwise(F.lit(0)).alias("obs"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_cents", ignorenulls=True).over(w)
            .alias("filled_cents"),
        )
    )


def active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, dau, wau): daily and trailing-`window_days` distinct
    active users per observed calendar day — THE product-health
    rollup. A trailing-window COUNT(DISTINCT) cannot be a plain
    window function (distinct doesn't decompose over sliding frames),
    so the standard Spark formulation is contribution explode: each
    observed (user, day) pair contributes to the `window_days` target
    days [day, day+w), via sequence()+explode, then one groupBy per
    target day counts distinct users. The explode factor is the
    window length (bounded, 7), applied AFTER the first distinct
    collapse — at 100 TB the (user, day) table is ~#users×#days,
    orders of magnitude under the event count, and both
    count_distincts are partial-aggregated map-side. Target days keep
    only OBSERVED days (semi join against the day set) so the output
    matches the intuitive "days that appear in the log" domain. Day
    emits as TIMESTAMP (non-null) for cross-engine string parity."""
    du = (
        events.where(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        )
        .dropDuplicates(["day", "user_id"])
        # three consumers (dau, observed days, the explode) — without
        # this the full event scan + distinct re-runs per branch
        .localCheckpoint(eager=True)
    )
    obs = du.select("day").dropDuplicates(["day"])
    dau = du.groupBy("day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    contrib = du.select(
        F.explode(
            F.expr(
                f"sequence(day, day + interval {int(window_days) - 1}"
                " days, interval 1 day)"
            )
        ).alias("day_t"),
        "user_id",
    )
    wau = (
        contrib.join(obs, contrib["day_t"] == obs["day"])
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select("day", "dau", "wau")


def cohort_ltv(events: DataFrame) -> DataFrame:
    """Weekly cohort lifetime-value curve: cohort_week =
    Monday-truncated week of the user's first event (the same
    engine-portable calendar key as retention()); one row per
    (cohort_week, week_age) with the cohort's active-user count, the
    revenue landed at that age (value in exact integer cents), and
    the RUNNING cumulative revenue — the LTV curve every growth
    dashboard plots. Complements retention(): that counts active
    users, this sums what they spent.

    Plan: the firsts table is user-cardinality (one narrow aggregate,
    AQE-broadcast back onto the fact); the age rollup shuffles once
    on (cohort_week, week_age); the cumulative window runs on the
    cohort×age AGGREGATE (tiny), never the fact table."""
    from pyspark.sql import Window

    wk = F.date_trunc("week", F.col("ts"))
    firsts = events.groupBy("user_id").agg(
        F.min(wk).alias("cohort_week"))
    age = F.floor(
        F.datediff(wk, F.col("cohort_week")) / 7).cast("bigint")
    per_age = (
        events.select("user_id", "ts",
                      F.round(F.col("value") * 100, 0).cast("bigint")
                      .alias("_cents"))
        .join(firsts, "user_id")
        .groupBy("cohort_week", age.alias("week_age"))
        .agg(F.count_distinct("user_id").alias("n_users"),
             F.sum("_cents").alias("revenue_cents"))
    )
    w = (Window.partitionBy("cohort_week").orderBy("week_age")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per_age.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(w))


def path_triples(events: DataFrame, k: int = 20) -> DataFrame:
    """Top-k third-order behavior paths: counts of CONSECUTIVE
    event-type triples (t1 → t2 → t3) over each user's ts-ordered
    stream (event_id tiebreak, the module's total order) — the "top
    paths" report product analytics runs after transitions()'s
    second-order table. Same plan shape: ONE shuffle on user_id for
    the two lag windows (both ride the same sort), then a
    |types|³-bounded aggregate and a TakeOrderedAndProject top-k with
    full-key tiebreak."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("_p1", F.lag("event_type", 1).over(w))
        .withColumn("_p2", F.lag("event_type", 2).over(w))
        .where(F.col("_p2").isNotNull())
        .groupBy(
            F.col("_p2").alias("t1"),
            F.col("_p1").alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(k)
    )


def session_concurrency(sessions: DataFrame) -> DataFrame:
    """Sweep-line concurrency over session intervals: from
    (session_start, session_end) rows (inclusive bounds, whole-second
    semantics — sessionize's grain) compute the number of
    simultaneously-open sessions at every boundary second and report
    the per-hour MAXIMUM — the capacity-planning curve (peak
    simultaneous users per hour).

    The prefix sum is HIERARCHICAL, not a single-partition window: +1
    at start_sec / −1 at end_sec+1 deltas aggregate per second (one
    shuffle), run within each DAY under a day-partitioned window, and
    the cross-day carry is a window over per-day totals — day
    cardinality is calendar-bounded, so the only unpartitioned window
    runs over a tiny frame while the second-level work stays fully
    parallel (the two-level scan every distributed prefix-sum needs;
    a global Window.orderBy would serialize the whole timeline
    through one task at corpus scale).

    Output: (hour_sec epoch-seconds, max_concurrent bigint) for hours
    containing at least one boundary; between boundaries concurrency
    is constant, so hours with no boundary inherit the previous
    hour's closing value — the consumer gap-fills with gapfill() if a
    dense hourly series is needed (documented approximation at hour
    grain: the reported max is exact for every hour that contains a
    boundary)."""
    from pyspark.sql import Window

    start_sec = F.expr("unix_seconds(cast(session_start as timestamp))")
    end_sec = F.expr("unix_seconds(cast(session_end as timestamp))")
    deltas = (
        sessions.select(start_sec.alias("sec"), F.lit(1).alias("d"))
        .unionByName(
            sessions.select((end_sec + 1).alias("sec"),
                            F.lit(-1).alias("d")))
        .groupBy("sec")
        .agg(F.sum("d").alias("delta"))
    )
    day = (F.col("sec") - (F.col("sec") % 86400)).alias("day")
    per_sec = deltas.select(day, "sec", "delta")
    w_day = Window.partitionBy("day").orderBy("sec")
    within = per_sec.withColumn(
        "run_in_day", F.sum("delta").over(w_day)
    )
    day_tot = per_sec.groupBy("day").agg(
        F.sum("delta").alias("day_sum")
    )
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = day_tot.withColumn(
        "carry", F.coalesce(F.sum("day_sum").over(w_days), F.lit(0))
    ).select("day", "carry")
    conc = (
        within.join(carry, "day")
        .select(
            "sec",
            (F.col("run_in_day") + F.col("carry")).alias("concurrent"),
        )
    )
    return (
        conc.withColumn(
            "hour_sec",
            (F.col("sec") - (F.col("sec") % 3600)).cast("bigint"),
        )
        .groupBy("hour_sec")
        .agg(F.max("concurrent").cast("bigint").alias("max_concurrent"))
    )


def cusum_alarms(
    events: DataFrame, k_num: int = 3, k_den: int = 2, h_mult: int = 4
) -> DataFrame:
    """One-sided CUSUM drift detection over per-type hourly event
    counts — the monitoring primitive for "did this event type's rate
    shift upward": classic recurrence s_t = max(0, s_{t-1} + x_t − k)
    with reference value k = k_num/k_den · mean hourly count and alarm
    threshold h = h_mult · k. The recurrence is NOT window-expressible
    directly, but has the exact prefix identity
    s_t = p_t − min_{i ≤ t} p_i with p_t = Σ_{j ≤ t}(x_j − k) — two
    stock windows (running sum, running min), no recursion, no UDF.
    Everything stays INTEGER by scaling through k_den·n_hours: with
    mean = total/n (rational), x_j − k scales to
    x_j·k_den·n − k_num·total, so both engines compute bit-identical
    statistics. Output: (event_type, hour_sec, n_events,
    cusum_scaled, alarm ∈ {0,1}).

    Plan: one (type, hour) aggregate shuffle; the two windows
    partition BY TYPE, so the per-type hourly timeline (horizon-
    bounded) is the only sequential frame and types run parallel —
    the same bounded-sequence charter as the per-user session
    windows."""
    from pyspark.sql import Window

    sec = F.expr("unix_seconds(cast(ts as timestamp))")
    hourly = (
        events.select(
            "event_type",
            (sec - (sec % 3600)).cast("bigint").alias("hour_sec"),
        )
        .groupBy("event_type", "hour_sec")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("n_events").alias("_total"),
        F.count(F.lit(1)).alias("_n"),
    )
    w = Window.partitionBy("event_type").orderBy("hour_sec")
    run = Window.partitionBy("event_type").orderBy("hour_sec") \
        .rowsBetween(Window.unboundedPreceding, 0)
    scaled = (
        hourly.join(tot, "event_type")
        .withColumn(
            "_step",
            F.col("n_events") * F.lit(k_den) * F.col("_n")
            - F.lit(k_num) * F.col("_total"),
        )
        .withColumn("_p", F.sum("_step").over(run))
        .withColumn("_pmin", F.least(F.min("_p").over(run), F.lit(0)))
        .withColumn("cusum_scaled", F.col("_p") - F.col("_pmin"))
    )
    # h = h_mult·k in the same scaling: h_mult·k_num·total
    return scaled.select(
        "event_type", "hour_sec", "n_events",
        F.col("cusum_scaled").cast("bigint").alias("cusum_scaled"),
        F.when(
            F.col("cusum_scaled")
            > F.lit(h_mult) * F.lit(k_num) * F.col("_total"),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("alarm"),
    )


def ab_assign_metrics(
    events: DataFrame, salt: str = "ab", n_variants: int = 2
) -> DataFrame:
    """Deterministic A/B bucketing + per-variant metric rollup: the
    variant is md5(salt‖user_id) mod n_variants — sticky across
    sessions and engines (no RNG, no assignment table to join) — and
    the output is one row per (variant, event_type) with distinct
    users, event count, and landed value in exact integer cents (the
    cohort_ltv rounding device). The experiment-analysis input table:
    lift, z-scores, and CUPED are consumer arithmetic over these
    integer sums; nothing engine-varying is emitted.

    Plan: variant is a codegen'd scan column; one (variant, type)
    aggregate with a distinct-count (exact here — the stated 100 TB
    swap-in is approx_count_distinct or the HLL register path, same
    contract as curation_profile)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col("user_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    return (
        events.select(
            (h % n_variants).cast("bigint").alias("variant"),
            "event_type", "user_id",
            F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0)
            .cast("bigint").alias("cents"),
        )
        .groupBy("variant", "event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
    )


def cuped_stats(
    events: DataFrame, salt: str = "ab", n_variants: int = 2
) -> DataFrame:
    """CUPED sufficient statistics per A/B variant (Deng et al. 2013,
    variance reduction via pre-experiment data): the stream is cut at
    its temporal midpoint into pre/post periods; per user x = landed
    value (integer cents) in the pre period, y = in the post period;
    per variant (the same md5-sticky bucketing as ab_assign_metrics)
    one row (variant, n_users, sum_x, sum_y, sum_xx, sum_xy).
    θ = cov(x,y)/var(x) = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) and the
    CUPED-adjusted lift are the CONSUMER's arithmetic over these
    exact integers — nothing engine-varying is emitted (the same
    sufficient-statistics charter as mrr/modularity).

    Plan: one min/max aggregate pins the midpoint (a single-row
    driver scalar, bounded-driver policy); then one scan groups to
    per-user (x, y) and one variant-level aggregate folds the
    sufficient statistics — two shuffles, both on narrow keys."""
    sec = F.expr("unix_seconds(cast(ts as timestamp))")
    lo, hi = events.agg(
        F.min(sec).alias("lo"), F.max(sec).alias("hi")
    ).collect()[0]
    if lo is None:
        # empty stream: the min/max aggregate collects NULL — emit the
        # empty frame with the full output schema instead of TypeError
        return events.sparkSession.createDataFrame(
            [],
            "variant bigint, n_users bigint, sum_x bigint, "
            "sum_y bigint, sum_xx bigint, sum_xy bigint",
        )
    mid = (int(lo) + int(hi)) // 2
    cents = F.round(
        F.coalesce(F.col("value"), F.lit(0.0)) * 100, 0
    ).cast("bigint")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col("user_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    per_user = (
        events.select(
            (h % n_variants).cast("bigint").alias("variant"),
            "user_id",
            F.when(sec < mid, cents).otherwise(F.lit(0)).alias("xc"),
            F.when(sec >= mid, cents).otherwise(F.lit(0)).alias("yc"),
        )
        .groupBy("variant", "user_id")
        .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y"))
    )
    return per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
    )


def attribution_touch_stats(
    events: DataFrame, conversion_type: str = "purchase"
) -> DataFrame:
    """Multi-touch attribution sufficient statistics: per channel
    (event_type) the integer counts a U-shaped / linear / position-
    based attribution model consumes — n_first (channel was the
    first touch before a conversion), n_last, n_middle (touch count
    in neither end position), n_solo (single-touch conversions), and
    n_conversions (distinct conversions the channel touched at all).
    Fractional credit (40/20/40 etc.) is CONSUMER arithmetic over
    these exact integers — per-touch fractions have data-dependent
    denominators and cannot cross engines exactly (the same
    sufficient-statistics charter as cuped_stats).

    A conversion is each user's FIRST `conversion_type` event; its
    touch path is every strictly-earlier event of any other type.
    Plan: one window pins the conversion second per user (narrow
    user-keyed shuffle), one window ranks the path from both ends,
    one aggregate folds the counts."""
    from pyspark.sql import Window

    sec = F.expr("unix_seconds(cast(ts as timestamp))")
    ev = events.select(
        "user_id", "event_type", sec.alias("sec"), "event_id")
    conv = (
        ev.where(F.col("event_type") == conversion_type)
        .groupBy("user_id")
        .agg(F.min("sec").alias("conv_sec"))
    )
    touches = (
        ev.where(F.col("event_type") != conversion_type)
        .join(conv, "user_id")
        .where(F.col("sec") < F.col("conv_sec"))
    )
    wa = Window.partitionBy("user_id").orderBy(
        F.asc("sec"), F.asc("event_id"))
    wd = Window.partitionBy("user_id").orderBy(
        F.desc("sec"), F.desc("event_id"))
    flagged = touches.select(
        "user_id", "event_type",
        F.row_number().over(wa).alias("rk_first"),
        F.row_number().over(wd).alias("rk_last"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum(F.when((F.col("rk_first") == 1)
                         & (F.col("rk_last") > 1), 1).otherwise(0))
            .cast("bigint").alias("n_first"),
            F.sum(F.when((F.col("rk_last") == 1)
                         & (F.col("rk_first") > 1), 1).otherwise(0))
            .cast("bigint").alias("n_last"),
            F.sum(F.when((F.col("rk_first") > 1)
                         & (F.col("rk_last") > 1), 1).otherwise(0))
            .cast("bigint").alias("n_middle"),
            F.sum(F.when((F.col("rk_first") == 1)
                         & (F.col("rk_last") == 1), 1).otherwise(0))
            .cast("bigint").alias("n_solo"),
            F.count_distinct("user_id").alias("n_conversions"),
        )
    )


def survival_table(
    events: DataFrame, censor_horizon_days: int = 7
) -> DataFrame:
    """Kaplan-Meier sufficient table for user churn: one row per
    observed lifetime t (days between a user's first and last event)
    with n_at_risk (users whose lifetime ≥ t), n_churned (uncensored
    users with lifetime exactly t), n_censored (censored users with
    lifetime exactly t). A user is CENSORED when their last event
    falls within `censor_horizon_days` of the observation window's
    end — still-active users must not count as churned (the classic
    right-censoring correction naive retention curves get wrong).
    The survival estimate Ŝ(t) = Π_{u≤t} (1 − d_u/r_u) is CONSUMER
    arithmetic over these integers.

    Plan: one per-user min/max aggregate; the window end is a
    single-row driver scalar (bounded-driver policy); at-risk counts
    are a reverse running sum over the lifetime-grouped frame —
    lifetimes are bounded by the observation span, so the window
    frame is tiny."""
    from pyspark.sql import Window

    day = F.expr(
        "unix_seconds(cast(ts as timestamp)) DIV 86400")
    per_user = events.select("user_id", day.alias("day")) \
        .groupBy("user_id").agg(
            F.min("day").alias("d0"), F.max("day").alias("d1"))
    w_end = per_user.agg(F.max("d1")).collect()[0][0]
    if w_end is None:
        # empty stream: max aggregate collects NULL — return the empty
        # frame with the output schema instead of TypeError on int()
        return events.sparkSession.createDataFrame(
            [],
            "lifetime bigint, n_at_risk bigint, n_churned bigint, "
            "n_censored bigint",
        )
    lab = per_user.select(
        (F.col("d1") - F.col("d0")).alias("lifetime"),
        (F.col("d1") >= F.lit(int(w_end)) - censor_horizon_days)
        .alias("censored"),
    )
    grouped = lab.groupBy("lifetime").agg(
        F.sum(F.when(~F.col("censored"), 1).otherwise(0))
        .cast("bigint").alias("n_churned"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0))
        .cast("bigint").alias("n_censored"),
    )
    wrev = (
        Window.orderBy(F.desc("lifetime"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grouped.select(
        F.col("lifetime").cast("bigint").alias("lifetime"),
        F.sum(F.col("n_churned") + F.col("n_censored")).over(wrev)
        .cast("bigint").alias("n_at_risk"),
        "n_churned", "n_censored",
    )


def rate_bursts(
    events: DataFrame, window_sec: int = 60, threshold: int = 5
) -> DataFrame:
    """Sliding-window rate/burst profile per user — the bot/abuse
    screen a crawl or clickstream pipeline runs before counting
    anything else: (user_id, n_events, max_burst, is_burst) where
    max_burst = the largest number of events inside ANY trailing
    `window_sec`-second window (computed exactly with a RANGE frame
    over event seconds — every event's trailing window is evaluated,
    which dominates any fixed-bucket approximation that splits a
    burst across bucket edges) and is_burst flags users whose
    max_burst ≥ threshold. All integers.

    Plan: one user-partitioned range-frame window over the event
    stream + one per-user aggregate — both shuffles on the narrow
    user key; no self-join (the naive pairwise formulation is
    O(events²) per user)."""
    from pyspark.sql import Window

    sec = F.expr("unix_seconds(cast(ts as timestamp))")
    w = (
        Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-(window_sec - 1), 0)
    )
    per_event = events.select("user_id", sec.alias("sec")) \
        .withColumn("burst", F.count(F.lit(1)).over(w))
    return (
        per_event.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("burst").cast("bigint").alias("max_burst"),
        )
        .withColumn("is_burst",
                    (F.col("max_burst") >= threshold).cast("boolean"))
    )

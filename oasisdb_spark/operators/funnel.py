"""Event-sequence analytics: ordered funnels and cohort retention.

The reference engine has no event-analytics surface; these operators
extend the events table (TESTDATA.md) with the two shapes every
product-analytics workload needs, expressed so one shuffle does the
heavy lifting:

- ``funnel_steps``: how many users completed step 1, steps 1-2,
  steps 1-2-3 … in timestamp order. One ``groupBy(user)`` with a
  higher-order-function fold over the per-user event sequence — the
  greedy earliest-match scan, which is exact for subsequence
  existence (matching the earliest possible event for a step never
  prevents a later step from matching).
- ``cohort_retention``: users bucketed by first-activity period
  (their cohort) × activity-period offset, with retention relative
  to cohort size.

100 TB posture: ``funnel_steps`` pre-filters to the step event types
BEFORE the shuffle (only funnel-relevant rows move), then shuffles
once on ``user_col``; the per-user list is bounded by that user's
step-type events. ``cohort_retention`` is two aggregations that both
hash-partition on ``user_col`` (the join between them co-locates)
plus one small final rollup. No windows over the raw table, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "stage_rollup", "cohort_retention", "attribute_conversions", "attribution_credits", "event_transitions", "session_paths", "windowed_funnel", "windowed_chain_exists"]


def max_funnel_stage(
    seq_col: Column | str, steps: list[str], ts_field: str = "ts", type_field: str = "event_type"
) -> Column:
    """Fold a time-sorted array<struct(ts, event_type)> into the highest
    funnel stage reached (0..len(steps)). Greedy earliest-first scan:
    advance to stage k+1 at the first event strictly after the stage-k
    match whose type equals steps[k]. Pure Column expression
    (F.aggregate), so the whole funnel is one whole-stage-codegen pass
    after the groupBy. Callers must exclude NULL-timestamp events from
    the sequence (funnel_steps/windowed_funnel filter them): a NULL ts
    would match stage 1 and leave last_ts NULL, vacuously passing the
    strictly-after check for every later event."""
    steps_lit = F.array(*[F.lit(s) for s in steps])
    n = len(steps)
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast("timestamp").alias("last_ts"),
    )

    def step_fn(acc: Column, ev: Column) -> Column:
        # try_element_at: once stage == n the 1-based index n+1 is out of
        # bounds — must yield NULL (so advance is false), never an
        # ANSI-mode error
        wants = F.try_element_at(steps_lit, acc["stage"] + 1)
        after = acc["last_ts"].isNull() | (ev[ts_field] > acc["last_ts"])
        advance = (acc["stage"] < n) & after & (ev[type_field] == wants)
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"), ev[ts_field].alias("last_ts")
            ),
        ).otherwise(acc)

    seq = F.col(seq_col) if isinstance(seq_col, str) else seq_col
    return F.aggregate(seq, init, step_fn)["stage"]


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion counts.

    A user completes stage k when their event stream contains events of
    type ``steps[0] .. steps[k-1]`` at strictly increasing timestamps.
    Returns one row per stage: (step, step_name, n_users, conversion)
    where conversion = n_users / stage-(k-1) users, rounded to 6 places
    (stage 1 is the funnel baseline — its conversion is 1.0 by
    definition, the convention the SQL oracle implements as c1/c1).

    Plan: filter to step types (scan-level pushdown) -> one shuffle on
    ``user_col`` collecting the sorted (ts, type) list -> fold to the
    max stage per user (Column expression, no Python) -> tiny rollup.
    Ties in ts never advance two stages (strict >), matching the SQL
    oracle's chained min-timestamp CTEs exactly. NULL-timestamp events
    are DROPPED up front: they have no position in the order, and
    letting them through would vacuously satisfy the strictly-after
    check (a NULL last_ts admits everything) — silently inflating
    completion counts (r07 review).
    """
    per_user = (
        # NULL users pool into one phantom journey under groupBy (the
        # SQL oracle's join-chained funnel never matches them) — a
        # journey needs an identifiable user
        events.filter(
            F.col(type_col).isin(steps)
            & F.col(ts_col).isNotNull()
            & F.col(user_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("user_id"),
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("event_type")).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("ev")).alias("seq"))
        .select("user_id", max_funnel_stage("seq", steps).alias("stage"))
    )
    return stage_rollup(per_user, steps)


def stage_rollup(per_user: DataFrame, steps: list[str], stage_col: str = "stage") -> DataFrame:
    """(user, stage) table → per-step completion counts + conversion —
    the funnel's final tiny aggregate, shared by the batch fold and the
    streaming stateful operator (streaming/events.py funnel_stream).
    Sums coalesce to 0 so an EMPTY per_user frame reports n_users=0 per
    step (not one row of NULL counts — the global agg over zero rows
    yields NULL sums); conversion stays NULL there (0/0)."""
    counts = (
        per_user.groupBy()
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col(stage_col) >= k, 1).otherwise(0)),
                    F.lit(0),
                ).alias(f"_s{k}")
                for k in range(1, len(steps) + 1)
            ]
        )
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"),
                F.lit(steps[k - 1]).alias("step_name"),
                F.col(f"_s{k}").cast("bigint").alias("n_users"),
                F.round(
                    F.try_divide(
                        F.col(f"_s{k}"),
                        F.col(f"_s{k - 1}") if k > 1 else F.col("_s1"),
                    ),
                    6,
                ).alias("conversion"),
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    return (
        counts.select(F.explode(stages).alias("r"))
        .select("r.step", "r.step_name", "r.n_users", "r.conversion")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort-retention matrix.

    Cohort = the user's first activity period (``date_trunc`` at
    ``granularity``); for every (cohort, offset) cell, counts the
    distinct users of that cohort active ``offset`` periods after
    their first one. Returns (cohort, offset, n_users, retention)
    with retention = n_users / cohort size at offset 0.

    Both aggregations hash on ``user_col``; the first-activity frame
    joins back user-to-user (co-partitioned, no extra shuffle under
    AQE), then one rollup on (cohort, offset). ``max_offset`` prunes
    far-tail offsets before the rollup.

    ``granularity``: 'day' or 'week' — the offset arithmetic needs a
    FIXED day count per period, which months/years don't have (compose
    date_trunc yourself for calendar-month cohorts).
    """
    if granularity not in ("day", "week"):
        raise ValueError(
            f"cohort_retention: granularity must be 'day' or 'week', got "
            f"{granularity!r} (offset arithmetic needs a fixed-length period)"
        )
    unit_days = {"day": 1, "week": 7}[granularity]
    period = F.date_trunc(granularity, F.col(ts_col))
    # NULL-ts activity has no period: left in, it emitted garbage
    # (cohort, NULL-offset) cells via datediff(NULL, cohort)
    acts = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user_id"), period.alias("period")
    ).distinct()
    firsts = acts.groupBy("user_id").agg(F.min("period").alias("cohort"))
    # offset in calendar days (datediff is timezone/DST-proof), exact
    # multiples of the granularity by construction of date_trunc
    cells = (
        acts.join(firsts, on="user_id")
        .select(
            "user_id",
            "cohort",
            (F.datediff(F.col("period"), F.col("cohort")) / unit_days)
            .cast("int")
            .alias("offset"),
        )
    )
    if max_offset is not None:
        cells = cells.filter(F.col("offset") <= max_offset)
    counts = cells.groupBy("cohort", "offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    base = counts.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_users").alias("_cohort_size")
    )
    return (
        counts.join(F.broadcast(base), on="cohort")
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            "offset",
            "n_users",
            F.round(F.col("n_users") / F.col("_cohort_size"), 6).alias("retention"),
        )
    )


def attribute_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback: int,
) -> DataFrame:
    """Marketing-style touch attribution: for every CONVERSION event
    (``type_col == conversion_type``), find the touches (``type_col IN
    touch_types``) by the same user inside the ``lookback`` window
    ending at the conversion, and attribute last-touch AND first-touch
    in one pass. ``ts_col`` must be a NUMERIC event time (e.g. epoch
    micros — the repo's event_time_micros idiom); ``lookback`` is in
    the same unit.

    Shape — the asof-join trick, not a self-join: touches and
    conversions prune to the relevant types AT THE SCAN, union into one
    frame, and a single (user)-partitioned VALUE-RANGE window
    ``[ts − lookback, ts]`` computes, per conversion row,
    ``max_by``/``min_by`` over the (ts, id) struct key (deterministic
    under equal timestamps — never "whichever peer the frame saw
    last") plus the qualifying-touch count. One shuffle on the user
    key, touching only conversion+touch rows; no join, no pair
    materialization, no second pass. A touch sharing the conversion's
    exact timestamp attributes (frame is ``<= ts``), matching the
    oracle twin's join predicate.

    Returns one row per conversion: (user, conversion id/ts, last_*
    / first_* touch id/type/ts — NULL when no touch qualifies — and
    n_touches).
    """
    from pyspark.sql.window import Window

    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(id_col).alias("id"),
        F.col(type_col).alias("etype"),
    ).where(
        # NULL-ts rows have no position in the value-range window (they
        # form a NULL peer group that only sees other NULL rows) -- the
        # funnel_steps NULL-ts contract applies to the whole module
        F.col(type_col).isin([conversion_type, *touch_types])
        & F.col(ts_col).isNotNull()
    )
    is_touch = F.col("etype").isin(list(touch_types))
    key = F.struct(F.col("ts"), F.col("id"))
    payload = F.struct(
        F.col("id").alias("t_id"),
        F.col("etype").alias("t_type"),
        F.col("ts").alias("t_ts"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("ts")
        .rangeBetween(-int(lookback), 0)
    )
    scored = ev.select(
        "user",
        "ts",
        "id",
        "etype",
        F.max_by(F.when(is_touch, payload), F.when(is_touch, key))
        .over(w)
        .alias("_last"),
        F.min_by(F.when(is_touch, payload), F.when(is_touch, key))
        .over(w)
        .alias("_first"),
        F.count(F.when(is_touch, F.lit(1))).over(w).alias("n_touches"),
    )
    return scored.where(F.col("etype") == conversion_type).select(
        F.col("user"),
        F.col("id").alias("conversion_id"),
        F.col("ts").alias("conversion_ts"),
        F.col("_last.t_id").alias("last_touch_id"),
        F.col("_last.t_type").alias("last_touch_type"),
        F.col("_last.t_ts").alias("last_touch_ts"),
        F.col("_first.t_id").alias("first_touch_id"),
        F.col("_first.t_type").alias("first_touch_type"),
        F.col("_first.t_ts").alias("first_touch_ts"),
        F.col("n_touches").cast("long").alias("n_touches"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
) -> DataFrame:
    """Behavioral Markov transition matrix: for every ordered pair of
    CONSECUTIVE events by the same user — (ts, id)-ordered, the same
    deterministic total order every sequence op in the repo uses —
    count the (from_type → to_type) transition and attach the MLE
    transition log-probability in micro-nats (``lmic(n_trans) −
    lmic(n_from)``, the exact cross-engine dialect of
    ``pipeline/lm.py`` — this operator IS a bigram LM whose "tokens"
    are event types, and the shared primitive keeps both hash-exact).

    Shape: one user-key sort shuffle for the ``lag`` window (types
    only — the frame is pruned to (user, ts, id, type) at the scan),
    then ONE partial-agg shuffle on the (from, to) pair; ``n_from``
    folds from the pair counts themselves (a type-cardinality window,
    not a second pass over events). Returns (from_type, to_type,
    n_trans, n_from, lp_micro).
    """
    from pyspark.sql.window import Window

    from oasisdb_spark.pipeline.lm import lmic

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        # NULL-ts events have no position in the (ts, id) total order
        # (Spark sorts them FIRST, fabricating transitions out of them)
        df.select(user_col, ts_col, id_col, type_col)
        .where(F.col(ts_col).isNotNull())
        .withColumn("_prev", F.lag(type_col).over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.withColumn(
        "n_from", F.sum("n_trans").over(w_from)
    ).withColumn("lp_micro", lmic(F.col("n_trans")) - lmic(F.col("n_from")))


def session_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    gap: int,
    max_steps: int = 8,
    min_count: int = 1,
) -> DataFrame:
    """Click-path mining: the distinct user JOURNEYS — per gap-based
    session, the ordered sequence of the first ``max_steps`` event
    types joined with '>' — and how many sessions took each. The
    product-analytics "top paths" report (GA behavior flow / Amplitude
    pathfinder) as one deterministic aggregate.

    ``ts_col`` must be numeric event time (epoch micros); ``gap`` in
    the same unit starts a new session (strict >, matching the repo's
    sessionizer). Paths longer than ``max_steps`` truncate — the step
    count also bounds the per-session state, so a runaway session
    cannot blow up a row. Ordering inside a session is the (ts, id)
    total order everywhere else in this module; path assembly is
    ``sort_array(collect_list(struct(ts, id, type)))`` — collect_list
    order is NOT deterministic, the sort is what pins it.

    Shape: one user-key sort shuffle (lag + session cumsum windows
    share it), one (user, session) partial agg building the path
    string, one path-key partial agg counting. Nothing wider than
    (user, ts, id, type) ever moves.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > int(gap)), 1
    ).otherwise(0)
    sess = (
        # NULL-ts rows sort FIRST and then MERGE with the first real
        # session (ts - NULL is NULL, which never exceeds the gap) --
        # corrupting its path string; they have no session position
        df.select(user_col, ts_col, id_col, type_col)
        .where(F.col(ts_col).isNotNull())
        .withColumn("_sess", F.sum(new_sess).over(cum))
    )
    steps = F.transform(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
                )
            ),
            1,
            int(max_steps),
        ),
        lambda s: s[type_col],
    )
    # concat_ws skips NULL step labels (the SQL string_agg contract),
    # but a session with ZERO labeled steps must be a NULL path, not ''
    # — string_agg over no non-NULL values is NULL
    path = F.when(
        F.size(F.filter(steps, lambda t: t.isNotNull())) == 0, F.lit(None)
    ).otherwise(F.concat_ws(">", steps))
    paths = sess.groupBy(user_col, "_sess").agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .where(F.col("n_sessions") >= int(min_count))
    )


def attribution_credits(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    conversion_type: str,
    touch_types: list[str],
    lookback: int,
    u_edge: int = 40,
) -> DataFrame:
    """Multi-touch attribution CREDITS — one row per (conversion,
    qualifying touch) with the two standard position-based credit
    rules as EXACT RATIONALS (floats divide differently across engines;
    integer numerator/denominator pairs hash-match and sum exactly to
    1 per conversion by construction):

    - linear: every touch gets 1/n — ``(1, n)``.
    - U-shaped (position-based): first and last touch get
      ``u_edge``/100 each, the middle splits the remainder evenly —
      ``(u_edge·(n−2), 100·(n−2))`` edges vs ``(100 − 2·u_edge, …)``
      middles, reduced to a common per-conversion denominator; the
      single-touch case gets (1, 1) and the two-touch case (1, 2) —
      the standard degenerate rules.

    Same engine shape as ``attribute_conversions`` (one user-key
    value-range window, no self-join), but emitting the full touch
    list: ``collect_list`` over the lookback frame gathers the
    (ts, id, type) structs — bounded by the lookback window, the same
    state bound the asof family carries — ``sort_array`` pins the
    order, ``posexplode`` fans out one row per touch. Conversions with
    zero touches emit NOTHING here (join ``attribute_conversions`` for
    the unattributed report).
    """
    from pyspark.sql.window import Window

    if not (0 <= u_edge <= 50):
        raise ValueError(
            f"attribution_credits: u_edge must be in [0, 50] (percent per "
            f"edge touch; the middle share 100 - 2*u_edge must be >= 0), "
            f"got {u_edge}"
        )

    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(id_col).alias("id"),
        F.col(type_col).alias("etype"),
    ).where(
        # NULL-ts exclusion: the attribute_conversions contract
        F.col(type_col).isin([conversion_type, *touch_types])
        & F.col(ts_col).isNotNull()
    )
    is_touch = F.col("etype").isin(list(touch_types))
    payload = F.when(
        is_touch,
        F.struct(
            F.col("ts").alias("t_ts"),
            F.col("id").alias("t_id"),
            F.col("etype").alias("t_type"),
        ),
    )
    w = Window.partitionBy("user").orderBy("ts").rangeBetween(-int(lookback), 0)
    conv = (
        ev.withColumn("_touches", F.sort_array(F.collect_list(payload).over(w)))
        .where(F.col("etype") == conversion_type)
        .select(
            "user",
            F.col("id").alias("conversion_id"),
            F.col("ts").alias("conversion_ts"),
            F.posexplode("_touches").alias("pos0", "t"),
            F.size("_touches").alias("n_touches"),
        )
    )
    n = F.col("n_touches")
    pos = F.col("pos0") + 1
    edge = (pos == 1) | (pos == n)
    mid_n = n - 2
    u_num = (
        F.when(n == 1, F.lit(1))
        .when(n == 2, F.lit(1))
        .when(edge, F.lit(int(u_edge)) * mid_n)
        .otherwise(F.lit(100 - 2 * int(u_edge)))
    )
    u_den = (
        F.when(n == 1, F.lit(1))
        .when(n == 2, F.lit(2))
        .otherwise(F.lit(100) * mid_n)
    )
    return conv.select(
        "user",
        "conversion_id",
        "conversion_ts",
        pos.cast("int").alias("touch_pos"),
        F.col("t.t_id").alias("touch_id"),
        F.col("t.t_type").alias("touch_type"),
        F.col("t.t_ts").alias("touch_ts"),
        "n_touches",
        F.lit(1).alias("linear_num"),
        n.cast("long").alias("linear_den"),
        u_num.cast("long").alias("u_num"),
        u_den.cast("long").alias("u_den"),
    )


def windowed_chain_exists(
    step_ts_lists: list[Column],
    window: int,
) -> Column:
    """TRUE iff events e₁ < e₂ < … < e_n exist (strictly increasing
    numeric timestamps, one drawn from each list in order) with
    ``ts(e_n) − ts(e₁) ≤ window`` — the conversion-chain predicate of
    ClickHouse ``windowFunnel`` / Amplitude conversion windows, as a
    pure nested-quantifier Column expression (no join, no Python).

    Exactness note: the tempting single-pass DP ("keep the best chain
    per stage") is WRONG here — a chain with a later start can carry a
    later last-event and block an extension an earlier-start chain
    would allow, so one (start, last) pair per stage loses solutions;
    the nested EXISTS quantifies over all chains and cannot. Cost is
    Π|step lists| per entity worst-case — funnel windows are short and
    per-user step events few; cap pathological users upstream (the
    max_basket_items discipline) if a fixture says otherwise.
    """

    def build(i: int, prev: Column | None, start: Column | None) -> Column:
        if i == len(step_ts_lists):
            return F.lit(True)
        if i == 0:
            return F.exists(
                step_ts_lists[0], lambda t: build(1, t, t)
            )
        return F.exists(
            step_ts_lists[i],
            lambda t: (t > prev)
            & (t <= start + F.lit(int(window)))
            & build(i + 1, t, start),
        )

    return build(0, None, None)


def windowed_funnel(
    events: DataFrame,
    steps: list[str],
    window: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Windowed ordered funnel (ClickHouse ``windowFunnel``): a user
    completes stage k when a strictly-increasing chain of
    ``steps[0..k-1]`` events exists with the WHOLE chain inside
    ``window`` of its first event (``ts_col`` numeric, e.g. epoch
    micros; ``window`` in the same unit). The plain funnel asks "did
    they ever convert"; this one asks "did they convert within an
    hour" — the form product analytics actually reports.

    Same engine shape as ``funnel_steps``: filter to step types at the
    scan, ONE user-key shuffle collecting per-step sorted ts lists,
    then the nested-quantifier chain predicate per prefix length (a
    Column expression — stage = the longest prefix whose chain
    exists), and the tiny stage rollup. NULL-timestamp events are
    dropped up front (no position in the order — the funnel_steps
    contract).
    """
    seq = (
        events.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user_id"),
            F.struct(
                F.col(ts_col).cast("long").alias("ts"),
                F.col(type_col).alias("event_type"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("ev")).alias("seq"))
    )
    def _step_ts(step: str) -> Column:
        # NOTE: a `lambda e, s=step:` default-arg closure would be read
        # by pyspark's HOF arity inspection as the (element, index)
        # two-arg filter form — the index column would silently replace
        # the step string. A real closure per step avoids that.
        return F.transform(
            F.filter(F.col("seq"), lambda e: e["event_type"] == step),
            lambda e: e["ts"],
        )

    lists = [_step_ts(s) for s in steps]
    stage = F.lit(0)
    for k in range(1, len(steps) + 1):
        stage = F.when(windowed_chain_exists(lists[:k], window), F.lit(k)).otherwise(
            stage
        )
    per_user = seq.select("user_id", stage.cast("int").alias("stage"))
    return stage_rollup(per_user, steps)

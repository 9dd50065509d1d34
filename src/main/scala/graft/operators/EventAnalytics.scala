package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Behavioral analytics over an event stream: ordered funnels, cohort
  * retention, and changelog→snapshot maintenance (the CDC "apply" step).
  * The reference has no temporal surface; these extend the engine's
  * sessionize/as-of family with the remaining standard event-warehouse
  * shapes.
  */
object EventAnalytics {

  /** Ordered conversion funnel: a user reaches stage i+1 when an event of
    * that stage's type occurs at-or-after their stage-i conversion time
    * (first qualifying event wins; `>=` keeps same-instant progressions).
    *
    * Scale shape: one aggregate per stage, each over events FILTERED to
    * that stage's type — the type predicate pushes to the parquet scan, so
    * a 5-stage funnel reads ~5 type-partitions, not 5× the corpus. The
    * per-user conversion times aggregate map-side (min), and each stage's
    * survivor set (≤ one row per user, shrinking monotonically) broadcasts
    * into the next stage's join — the event stream itself is never
    * shuffled or rescanned unfiltered. Output: (stage, stage_name, users,
    * conv_rate), conv_rate relative to stage 1, rounded to 6 decimals.
    *
    * `withinMinutes` bounds each stage-to-stage gap (a conversion WINDOW:
    * stage i+1 counts only within that horizon of the stage-i time) —
    * the condition rides the same broadcast join, so the plan shape is
    * unchanged. */
  def funnel(events: DataFrame, stages: Seq[String],
             withinMinutes: Option[Int] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val inWindow = withinMinutes.fold(lit(true))(m =>
      col("ts") <= col("t0") + expr(s"INTERVAL $m MINUTES"))
    val perStage = stages.tail.scanLeft(
      events.where(col("event_type") === stages.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))) { (prev, s) =>
      events.where(col("event_type") === s)
        .join(broadcast(prev.select(col("user_id"), col("t").as("t0"))), "user_id")
        .where(col("ts") >= col("t0") && inWindow)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    val counts = perStage.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage"), lit(stages(i)).as("stage_name"), col("users"))
    }.reduce(_ unionAll _)
    val top = perStage.head.agg(count(lit(1)).as("top_users"))
    counts.crossJoin(broadcast(top))
      .select(col("stage"), col("stage_name"), col("users"),
        round(try_divide(col("users").cast(DoubleType), col("top_users").cast(DoubleType)), 6)
          .as("conv_rate"))
  }

  /** Weekly cohort retention: users are cohorted by the week of their first
    * event; a cohort is "active at week n" when any member emits an event n
    * weeks after the cohort week.
    *
    * Scale shape: the first-seen aggregate reduces events to one row per
    * user map-side; that user→cohort map is dimension-sized (users ≪
    * events) and broadcasts into the activity pass, so the event stream is
    * scanned once and shuffled once — on the (cohort_week, week_no) group
    * key with a per-partition distinct partial (countDistinct expands to a
    * two-phase exact distinct, never a driver collect). Output:
    * (cohort_week, week_no, active_users). */
  def cohortRetention(events: DataFrame): DataFrame = {
    val cohort = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    events.select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .join(broadcast(cohort), "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast(IntegerType).as("week_no"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** RETENTION CURVE FIT — the exponential-decay model behind every
    * retention forecast: pooled day-age retention r_a = (users active at
    * age a) / (users in cohorts OLD ENOUGH to be observed at age a), then
    * a log-linear OLS ln(r_a) = intercept + slope·a whose slope yields
    * the retention half-life −ln2/slope in days. The observability
    * restriction on the denominator is what makes the pooled rate
    * unbiased on a finite window (young cohorts can't contribute misses
    * at ages they haven't reached).
    *
    * Scale shape: the stream reduces to distinct (user, day) first; ages
    * and cohort sizes are |days|-bounded censuses, their cross is
    * |ages|·|cohorts| (calendar-bounded, never data-sized), and the fit
    * is one 1-row moment aggregate. Determinism: counts are exact
    * integers; each ln(rate) is one fixed-shape double rounded to 9dp;
    * moment sums go through exact decimals; the closed-form finish is
    * fixed-shape doubles, round-6. try_divide: a single observed age has
    * zero age-variance → NULL slope/half-life.
    * Output: one row (n_ages, slope, intercept, half_life_days). */
  def retentionHalfLife(events: DataFrame): DataFrame = {
    import graft.operators.Dedup.MaterializeSyntax
    val dec9 = DecimalType(28, 12)
    val decI = DecimalType(38, 0)
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().materialized // feeds the cohort map, ages, and the max day
    val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
      .materialized // feeds per-age activity and cohort sizes
    val act = ud.join(cohort, "user_id")
      .select(datediff(col("day"), col("c0")).as("a"))
      .where(col("a") >= 1)
      .groupBy(col("a")).agg(count(lit(1)).as("num")) // distinct by construction
    val csize = cohort.groupBy(col("c0")).agg(count(lit(1)).as("sz"))
    val maxd = ud.agg(max(col("day")).as("maxd"))
    val den = act.select(col("a"))
      .crossJoin(broadcast(csize)) // |ages|·|cohorts| census, calendar-bounded
      .crossJoin(broadcast(maxd)) // 1-row scalar, documented pattern
      .where(datediff(col("maxd"), col("c0")) >= col("a"))
      .groupBy(col("a")).agg(sum(col("sz")).as("den"))
    val r = act.join(den, "a")
      .where(col("num") > 0 && col("den") > 0)
      .select(col("a").cast(LongType).as("a"),
        round(log(col("num").cast(DoubleType) / col("den").cast(DoubleType)), 9)
          .as("y"))
    val m = r.agg(count(lit(1)).as("n"),
      sum(col("a").cast(decI)).as("sa"),
      sum((col("a") * col("a")).cast(decI)).as("sa2"),
      sum(col("y").cast(dec9)).as("sy"),
      sum(round(col("a") * col("y"), 9).cast(dec9)).as("say"))
    val nD = col("n").cast(DoubleType)
    val saD = col("sa").cast(DoubleType)
    val slope = try_divide(
      nD * col("say").cast(DoubleType) - saD * col("sy").cast(DoubleType),
      nD * col("sa2").cast(DoubleType) - saD * saD)
    m.select(col("n").as("n_ages"),
      round(slope, 6).as("slope"),
      round((col("sy").cast(DoubleType) - slope * saD) / nD, 6).as("intercept"),
      round(lit(-0.6931471805599453) / slope, 6).as("half_life_days"))
  }

  /** DuckDB mirror of [[retentionHalfLife]] (oracle builder). */
  def retentionHalfLifeSql(): String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) "day" FROM events),
       c AS (SELECT user_id, MIN("day") c0 FROM ud GROUP BY 1),
       act AS (SELECT date_diff('day', c0, "day") a, count(*) num
               FROM ud JOIN c USING (user_id)
               WHERE date_diff('day', c0, "day") >= 1 GROUP BY 1),
       cs AS (SELECT c0, count(*) sz FROM c GROUP BY 1),
       maxd AS (SELECT MAX("day") maxd FROM ud),
       den AS (SELECT a, CAST(SUM(sz) AS BIGINT) den
               FROM (SELECT a FROM act), cs, maxd
               WHERE date_diff('day', c0, maxd) >= a GROUP BY 1),
       r AS (SELECT CAST(act.a AS BIGINT) a,
              round(ln(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)), 9) y
             FROM act JOIN den USING (a)
             WHERE num > 0 AND den > 0),
       m AS (SELECT count(*) n,
              SUM(CAST(a AS DECIMAL(38,0))) sa,
              SUM(CAST(a * a AS DECIMAL(38,0))) sa2,
              SUM(CAST(y AS DECIMAL(28,12))) sy,
              SUM(CAST(round(a * y, 9) AS DECIMAL(28,12))) say
             FROM r),
       d AS (SELECT *,
              (CAST(n AS DOUBLE) * CAST(say AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sa2 AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) slope
             FROM m)
       SELECT n AS n_ages, round(slope, 6) AS slope,
         round((CAST(sy AS DOUBLE) - slope * CAST(sa AS DOUBLE))
           / CAST(n AS DOUBLE), 6) AS intercept,
         round(-0.6931471805599453 / slope, 6) AS half_life_days
       FROM d"""

  /** Rolling active-user counts: for every day with direct activity, the
    * distinct users active that day (DAU) and over the trailing `window`
    * days (WAU/MAU by parameter).
    *
    * Scale shape: events reduce to distinct (user, day) FIRST (map-side
    * partial distinct — the stream's volume never reaches the window
    * logic); the trailing window is the explode-forward trick (each
    * user-day feeds days d..d+window-1), so the rolling distinct is a
    * plain two-phase aggregate instead of a per-day range self-join —
    * explode volume is window × |user-days|, linear in users, not
    * events. Output: (day, dau, wau); `day` renders as a midnight
    * timestamp (DATE columns are not portable through every consumer). */
  def activeUsers(events: DataFrame, window: Int): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), window - 1))).as("day"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day").cast(TimestampType).as("day"), col("dau"), col("wau"))
  }

  /** Changelog→snapshot merge (the CDC apply / SCD-type-1 compaction):
    * per key, the operation with the greatest (ts, seq) wins; keys whose
    * winning operation is the tombstone type are absent from the snapshot.
    *
    * Scale shape: `max_by` over a struct ordering key is a two-phase hash
    * aggregate — each partition keeps one candidate row per key before the
    * exchange, so the shuffle carries |keys| rows, not |changelog| — and
    * there is no per-key window sort anywhere (the row_number formulation
    * would sort every key group). (ts, seq) must be unique per key for a
    * deterministic winner; seq is the log's own sequence column (here
    * event_id), exactly the LSN/offset a real CDC feed carries.
    * Output: (user_id, last_ts, last_type, last_value). */
  def latestSnapshot(changelog: DataFrame, tombstoneType: String): DataFrame =
    changelog.groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .where(col("last.event_type") =!= tombstoneType)
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"), col("last.value").as("last_value"))

  /** TIME-TO-CONVERT distribution — the latency companion to the funnel's
    * conversion counts: for every user whose first `fromType` is followed
    * by a `toType`, the delay (first qualifying `toType` − first
    * `fromType`) in whole seconds, summarized as exact p50/p90 via the
    * equi-depth census walk (value-histogram + cumulative window + first
    * value whose cum reaches the rank — delays are integers, the walk is
    * bounded by DISTINCT delay values, and nothing sorts per user).
    *
    * Scale shape: two filtered min-aggregates reduce the stream to one
    * row per user before any join; the join is user-keyed; the census
    * frame is delay-valued, not user-sized. Output: one row
    * (n_converted, p50_secs, p90_secs). */
  def timeToConvert(events: DataFrame, fromType: String,
                    toType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = events.where(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val delays = events.where(col("event_type") === toType)
      .join(first, "user_id")
      .where(col("ts") >= col("t1"))
      .groupBy(col("user_id"))
      .agg(((unix_micros(min(col("ts"))) - unix_micros(max(col("t1"))))
        / lit(1000000L)).cast("long").as("d"))
    val w = Window.orderBy(col("d"))
    // census over distinct delay values (bounded; single-window by design)
    delays.groupBy(col("d")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .agg(max(col("n")).as("n_converted"),
        min(when(col("cum") * 2 >= col("n"), col("d"))).as("p50_secs"),
        min(when(col("cum") * 10 >= col("n") * 9, col("d"))).as("p90_secs"))
  }

  /** The batch 30-min-gap sessionizer's id assignment, shared by every
    * batch consumer (path mining, interval attribution): events gain a
    * per-user `session_id` — a new session opens when the gap since the
    * previous event exceeds `gapMinutes` (microsecond-exact, matching the
    * oracle's epoch_us convention), ordered by the (ts, event_id) log
    * order. One exchange on the key; both windows share its sort. */
  def sessionIds(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__ns", when(col("__prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("__prev")) >
          gapMinutes * 60000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("__ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__ns")
  }

  /** Per-day PEAK session concurrency — the capacity-planning sweep line:
    * sessions become (+1 at start, −1 after end) boundary points, a
    * running sum walks each day's points in time order, and the day's max
    * is its peak. Overlap is END-INCLUSIVE: at an instant where one
    * session starts exactly as another ends, both count — +1 rows sort
    * before −1 rows at equal ts (`delta DESC`).
    *
    * Scale shape: sessions reduce to two boundary rows each; a session
    * spanning midnight is clipped per day it touches (explode on days
    * touched — output-sized), so the sweep window partitions BY DAY, never
    * a global sort; each day's point count is bounded by that day's
    * session churn. The −1 clip lands on the next-day EXCLUSIVE boundary,
    * which cannot precede any same-day +1, so no sub-day epsilon
    * arithmetic is needed. Output: (day, peak). */
  def peakConcurrency(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = sessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"))
    val d = sess.select(col("start"), col("end"),
      explode(sequence(date_trunc("day", col("start")),
        date_trunc("day", col("end")), expr("interval 1 day"))).as("day"))
    val pts = d.select(col("day"),
        greatest(col("start"), col("day")).as("ts"), lit(1).as("delta"))
      .unionByName(d.select(col("day"),
        least(col("end"), col("day") + expr("interval 1 day")).as("ts"),
        lit(-1).as("delta")))
    val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.select(col("day"), sum(col("delta")).over(w).as("run"))
      .groupBy(col("day")).agg(max(col("run")).cast("int").as("peak"))
  }

  /** SCD-type-2 history build (the companion to [[latestSnapshot]]'s
    * type-1 compaction): the changelog becomes one validity interval per
    * observed state run — a row opens when the tracked attribute CHANGES
    * (no-op updates collapse into the run they extend) and closes when the
    * next distinct state opens; the live state has `valid_to` NULL.
    *
    * Scale shape: one hash exchange on the key, then both window passes
    * (the change-detection `lag` and the interval-closing `lead`) run over
    * the SAME (key × (ts, seq)) sort — the filter between them preserves
    * ordering, so Catalyst plans a single exchange + single sort, and the
    * `lead` works on the already-shrunk change rows. (ts, seq) must be
    * unique per key (seq = the log's own sequence column), same contract
    * as [[latestSnapshot]]. Output: (user_id, state, valid_from,
    * valid_to). */
  def scd2History(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    changelog
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNull || col("event_type") =!= col("prev"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"))
  }

  /** LAST-TOUCH ATTRIBUTION: each conversion event credited to the user's
    * latest preceding touch (of `touchTypes`) within a `lookbackDays`
    * window — 'none' when no touch qualifies. Per conversion: (pid, value,
    * last_touch_type).
    *
    * Scale shape: the per-conversion argmax is a `max(struct)` aggregate
    * over the user-keyed interval join (conversions × touches meet on the
    * user equi-key; per-user touch density bounds the fan-out), never a
    * per-key window sort over all events; the struct max ignores the
    * left-join's null rows, so unattributed conversions surface as one
    * null → 'none' row each. */
  def lastTouchAttribution(events: DataFrame, touchTypes: Seq[String],
                           conversionType: String, lookbackDays: Int): DataFrame = {
    val purch = events.where(col("event_type") === conversionType)
      .select(col("event_id").as("pid"), col("user_id").as("p_uid"),
        col("ts").as("pts"), col("value"))
    val touch = events.where(col("event_type").isin(touchTypes: _*))
      .select(col("user_id").as("t_uid"), col("ts").as("t_ts"),
        col("event_id").as("t_eid"), col("event_type").as("t_type"))
    purch.join(touch,
        col("p_uid") === col("t_uid") &&
          col("t_ts") < col("pts") &&
          col("t_ts") >= col("pts") - expr(s"INTERVAL $lookbackDays DAYS"), "left")
      .groupBy(col("pid"), col("value"))
      .agg(max(when(col("t_ts").isNotNull,
        struct(col("t_ts"), col("t_eid"), col("t_type")))).as("lt"))
      .select(col("pid"), col("value"),
        coalesce(col("lt.t_type"), lit("none")).as("last_touch_type"))
  }

  /** RFM SEGMENTATION — the marketing-analytics staple: each user scored
    * 1..4 on Recency (days since last event, lower better), Frequency
    * (event count) and Monetary (exact decimal value sum), the scores
    * being exact population quartiles; `segment` = R·100 + F·10 + M.
    *
    * Scale shape: the per-user frame is ONE exchange over events; each
    * quartile boundary set comes from the equi-depth census pattern
    * (value → count → cumulative walk over DISTINCT values, never a
    * per-user ntile whose global sort ranks every user): the census
    * frame is |distinct values|-sized, the three boundary rows broadcast
    * back, and scoring is a pure projection. Ties share a bucket by
    * construction (score = 1 + #boundaries strictly below the value) —
    * deterministic where ntile's tie-splitting is partition-order luck.
    * Output: (user_id, recency_days, frequency, monetary, r_score,
    * f_score, m_score, segment). */
  def rfmSegments(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchor = events.agg(max(col("ts")).as("anchor"))
    val per = events.groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("frequency"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("monetary"))
      .crossJoin(broadcast(anchor)) // 1-row scalar, documented pattern
      .select(col("user_id"),
        datediff(col("anchor").cast(DateType), col("last_ts").cast(DateType))
          .as("recency_days"),
        col("frequency"), col("monetary"))
    // quartile boundaries for one metric: census → cum walk → 3 mins
    def bounds(metric: String): DataFrame = {
      val vc = per.groupBy(col(metric).as("x")).agg(count(lit(1)).as("c"))
      val cum = vc.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val cuts = (1 to 3).map(i =>
        min(when(col("cum") * 4 >= col("n") * i, col("x"))).as(s"${metric}_b$i"))
      cum.crossJoin(broadcast(vc.agg(sum(col("c")).as("n"))))
        .agg(cuts.head, cuts.tail: _*)
    }
    def bucket(metric: String) = lit(1) + (1 to 3).map(i =>
      (col(metric) > col(s"${metric}_b$i")).cast(IntegerType)).reduce(_ + _)
    per
      .crossJoin(broadcast(bounds("recency_days")))
      .crossJoin(broadcast(bounds("frequency")))
      .crossJoin(broadcast(bounds("monetary")))
      .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        (lit(5) - bucket("recency_days")).as("r_score"),
        bucket("frequency").as("f_score"),
        bucket("monetary").as("m_score"))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** KAPLAN-MEIER survival curves per event_type — the right-censored
    * retention estimate ("what fraction of users are still engaging with
    * this surface after t days") a naive churn rate gets wrong by counting
    * still-active users as survivors forever. A (user, type) pair "dies"
    * at its last event if that event is > `horizonDays` before the end of
    * the observation window, and is CENSORED at the window end otherwise.
    *
    * Scale shape: one per-(user,type) min/max aggregate over the stream
    * (map-side partial), collapsed to a per-(type, day) life table — at
    * most |types|·|days| rows — on which the product-limit estimator runs
    * as windowed cumulative sums (Π(1−d/n) via exp∘Σln, the numerically
    * standard form). The event stream is aggregated once and never
    * rescanned; everything downstream is life-table-sized.
    *
    * Determinism: d/n are exact integers; each ln term is rounded to 12dp
    * before the ordered cumulative sum (sequential in frame order on both
    * engines), the d=n absorbing state is tracked by an integer flag
    * cumsum rather than relying on ln(0), and the final survival rounds
    * to 6dp. Output: (event_type, t_days, n_risk, d_events, c_censored,
    * survival). */
  def survivalKm(events: DataFrame, horizonDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = events.agg(max(col("ts")).as("g"))
    val dead = col("lastts") < col("g") - expr(s"INTERVAL $horizonDays DAYS")
    val durations = events.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("ts")).as("birth"), max(col("ts")).as("lastts"))
      .crossJoin(broadcast(g)) // 1-row scalar, documented pattern
      .select(col("event_type"),
        when(dead, datediff(col("lastts").cast(DateType), col("birth").cast(DateType)))
          .otherwise(datediff(col("g").cast(DateType), col("birth").cast(DateType)))
          .as("t_days"),
        when(dead, lit(1L)).otherwise(lit(0L)).as("event"))
    val tab = durations.groupBy(col("event_type"), col("t_days"))
      .agg(sum(col("event")).as("d_events"),
        sum(lit(1L) - col("event")).as("c_censored"))
    val byT = Window.partitionBy(col("event_type")).orderBy(col("t_days"))
    val all = byT.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prior = byT.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = byT.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = tab
      .withColumn("n_risk",
        sum(col("d_events") + col("c_censored")).over(all) -
          coalesce(sum(col("d_events") + col("c_censored")).over(prior), lit(0L)))
      .withColumn("term",
        when(col("d_events") === 0, lit(0.0))
          .when(col("n_risk") > col("d_events"),
            round(log((col("n_risk").cast(DoubleType) - col("d_events")) /
              col("n_risk")), 12))
          .otherwise(lit(0.0)))
      .withColumn("z",
        when(col("d_events") > 0 && col("d_events") >= col("n_risk"), lit(1L))
          .otherwise(lit(0L)))
    w.select(col("event_type"), col("t_days"), col("n_risk"),
      col("d_events"), col("c_censored"),
      when(sum(col("z")).over(upTo) > 0, lit(0.0))
        .otherwise(round(exp(sum(col("term")).over(upTo)), 6)).as("survival"))
  }

  /** DuckDB mirror of [[survivalKm]] (oracle builder). */
  def survivalKmSql(horizonDays: Int): String =
    s"""WITH g AS (SELECT max(ts) g FROM events),
       |  u AS (SELECT event_type, user_id, min(ts) birth, max(ts) lastts
       |        FROM events GROUP BY 1, 2),
       |  d AS (SELECT event_type,
       |         CASE WHEN lastts < g - INTERVAL $horizonDays DAY
       |           THEN datediff('day', CAST(birth AS DATE), CAST(lastts AS DATE))
       |           ELSE datediff('day', CAST(birth AS DATE), CAST(g AS DATE)) END t_days,
       |         CASE WHEN lastts < g - INTERVAL $horizonDays DAY
       |           THEN 1 ELSE 0 END ev
       |        FROM u, g),
       |  tab AS (SELECT event_type, CAST(t_days AS INT) t_days,
       |           CAST(SUM(ev) AS BIGINT) d_events,
       |           CAST(SUM(1 - ev) AS BIGINT) c_censored
       |          FROM d GROUP BY 1, 2),
       |  w AS (SELECT event_type, t_days, d_events, c_censored,
       |         CAST(SUM(d_events + c_censored) OVER (PARTITION BY event_type)
       |           - COALESCE(SUM(d_events + c_censored) OVER (
       |               PARTITION BY event_type ORDER BY t_days
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) n_risk
       |        FROM tab),
       |  s AS (SELECT *,
       |         CASE WHEN d_events = 0 THEN 0.0
       |              WHEN n_risk > d_events THEN round(ln(
       |                (CAST(n_risk AS DOUBLE) - d_events) / n_risk), 12)
       |              ELSE 0.0 END term,
       |         CASE WHEN d_events > 0 AND d_events >= n_risk
       |           THEN 1 ELSE 0 END z
       |        FROM w)
       |SELECT event_type, t_days, n_risk, d_events, c_censored,
       |  CASE WHEN SUM(z) OVER (PARTITION BY event_type ORDER BY t_days
       |         ROWS UNBOUNDED PRECEDING) > 0 THEN 0.0
       |       ELSE round(exp(SUM(term) OVER (PARTITION BY event_type
       |         ORDER BY t_days ROWS UNBOUNDED PRECEDING)), 6)
       |  END AS survival
       |FROM s""".stripMargin
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Time-series regularization over an event stream: resample irregular
  * per-key events onto a fixed time grid with forward fill — the shape a
  * feature-store / training pipeline needs before it can treat activity as
  * a dense tensor (reference has no temporal surface at all; this extends
  * the engine's as-of/sessionize family).
  */
object TimeSeries {

  /** Hourly resample with last-observation-carried-forward:
    *
    *   1. bucket events into hours; per (key, hour) keep the event count
    *      and the hour's max value (a deterministic aggregate — LOCF over
    *      a reduced bucket must not depend on intra-bucket row order),
    *   2. expand each key's [first, last] hour span into a dense grid
    *      (`sequence` + explode — per-key, never a global calendar), and
    *   3. forward-fill empty hours from the latest preceding bucket via a
    *      running `last(ignoreNulls)` window.
    *
    * Scale shape: one map-side-combined aggregate reduces the stream to
    * (key, hour) buckets BEFORE any join; the grid explode is output-sized
    * (span hours per key); the fill window is hash-partitioned by key —
    * there is no global sort and no driver-side calendar. Gaps longer than
    * the whole span cannot occur by construction (the grid starts at each
    * key's own first event). Output: (user_id, hour_start, n_events,
    * v_fill) — n_events = 0 marks filled gap rows. */
  def resampleHourlyLocf(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
      .groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("v_max"))
    val grid = hourly
      .groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h").as("hour_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v_max"), ignoreNulls = true).over(w).as("v_fill"))
  }

  /** Hourly resample with LINEAR INTERPOLATION — the gap-fill a metrics
    * or sensor pipeline wants when the series is a level (not an event
    * count): empty hours take the line between the nearest observed
    * buckets, v = v_prev + (v_next−v_prev)·(t−t_prev)/(t_next−t_prev),
    * rather than [[resampleHourlyLocf]]'s step function.
    *
    * Same scale shape as LOCF for the output, but the WINDOW runs over the
    * OBSERVED buckets only: each observed bucket learns its next observed
    * neighbor via ONE `lead` pass (bounded frame, |observed| input rows),
    * then emits itself plus the gap rows up to that neighbor during the
    * grid explode, computing the lerp inline. (The previous form ran FOUR
    * unbounded running `last`/`first` passes over the already-dense grid —
    * window input Σ span-hours per key instead of |observed buckets|,
    * 17.4 s → the resampleHourlyLocf band at sf0.1.) The dense output is
    * identical row-for-row: the grid still spans each key's own
    * [first, last] bucket, and every gap row sits strictly between two
    * observed buckets so the lerp denominator is > 0 by construction.
    * Determinism: bucket values are deterministic aggregates, the lerp is
    * fixed-order IEEE arithmetic on exact integer epoch seconds, and the
    * final 6dp cut is floor(x·10⁶ + 0.5)/10⁶ rather than round(x, 6) —
    * midpoint lerps land exactly on .5 ties where Spark (decimal-string
    * HALF_UP) and C-library (multiply-then-nearbyint) rounding disagree;
    * the floor form does the half-up cut entirely in double arithmetic
    * both engines execute identically.
    * Output: (user_id, hour_start, n_events, v_interp). */
  def resampleHourlyInterp(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
      .groupBy(col("user_id"), col("h"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("v_max"))
    val byH = Window.partitionBy(col("user_id")).orderBy(col("h"))
    // per observed bucket: the next observed bucket (null for the last one)
    val seg = hourly
      .withColumn("nh", lead(col("h"), 1).over(byH))
      .withColumn("nv", lead(col("v_max"), 1).over(byH))
    // each bucket emits [h, nh) hour rows — itself plus its trailing gap;
    // the last bucket (nh null) emits only itself, closing the span at h1
    val lerp = col("v_max") + (col("nv") - col("v_max")) *
      ((unix_timestamp(col("g")) - unix_timestamp(col("h"))).cast(DoubleType) /
       (unix_timestamp(col("nh")) - unix_timestamp(col("h"))).cast(DoubleType))
    seg.select(col("user_id"), col("h"), col("n_events"), col("v_max"),
        col("nh"), col("nv"),
        explode(sequence(col("h"),
          coalesce(col("nh") - expr("interval 1 hour"), col("h")),
          expr("interval 1 hour"))).as("g"))
      .select(col("user_id"), col("g").as("hour_start"),
        when(col("g") === col("h"), col("n_events")).otherwise(lit(0L))
          .as("n_events"),
        (floor(when(col("g") === col("h"), col("v_max")).otherwise(lerp)
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("v_interp"))
  }

  /** DuckDB mirror of [[resampleHourlyInterp]] (oracle builder). */
  def resampleHourlyInterpSql(): String =
    """WITH e AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) h, value
         FROM events),
       hr AS (SELECT user_id, h, COUNT(*) n_events, MAX(value) v_max
              FROM e GROUP BY 1, 2),
       span AS (SELECT user_id, MIN(h) h0, MAX(h) h1 FROM e GROUP BY 1),
       grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 hour)) h
                FROM span),
       j AS (SELECT g.user_id, g.h, n_events, v_max,
              last_value(v_max IGNORE NULLS) OVER (PARTITION BY g.user_id
                ORDER BY g.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
              last_value(CASE WHEN n_events IS NOT NULL THEN g.h END IGNORE NULLS)
                OVER (PARTITION BY g.user_id ORDER BY g.h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) ph,
              first_value(v_max IGNORE NULLS) OVER (PARTITION BY g.user_id
                ORDER BY g.h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
              first_value(CASE WHEN n_events IS NOT NULL THEN g.h END IGNORE NULLS)
                OVER (PARTITION BY g.user_id ORDER BY g.h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nh
             FROM grid g LEFT JOIN hr ON g.user_id = hr.user_id AND g.h = hr.h)
       SELECT user_id, h AS hour_start, COALESCE(n_events, 0) AS n_events,
         floor((CASE WHEN n_events IS NOT NULL THEN v_max
           ELSE pv + (nv - pv) *
             (CAST(epoch(h) - epoch(ph) AS DOUBLE) /
              CAST(epoch(nh) - epoch(ph) AS DOUBLE)) END)
           * CAST(1000000 AS DOUBLE) + 0.5) / CAST(1000000 AS DOUBLE) AS v_interp
       FROM j"""

  /** Per-series OLS TREND over daily counts — the "is this metric growing
    * and how fast" line every health dashboard fits: slope/intercept/R² of
    * events-per-day against a shared day index, one row per event type.
    * Closed-form least squares from the five exact integer moments
    * (n, Σd, Σy, Σdy, Σd², plus Σy² for R²):
    *
    *   slope = (nΣdy − ΣdΣy) / (nΣd² − (Σd)²)
    *
    * Scale shape: the raw stream reduces to |types|·|days| rows in ONE
    * map-side-combinable aggregate; the moment aggregate is |types|-sized;
    * the global min day is a 1-row broadcast scalar (documented BNLJ
    * pattern). No window, no sort — a 100 TB event log costs one scan.
    *
    * Determinism: day index and daily counts are exact integers, the five
    * moments are exact DECIMAL(38,0) sums, and each output is ONE double
    * division of two exact integers (round-6) — bit-identical across
    * engines and partitionings. try_divide: a single-day series has zero
    * d-variance (NULL slope — correct: one point fits no line); a
    * constant series has zero y-variance (NULL r2 by the same read).
    * Output: (event_type, n_days, slope, intercept, r2). */
  def trendOls(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    val m = daily.crossJoin(broadcast(d0)) // 1-row scalar, documented pattern
      .select(col("event_type"), col("y"),
        datediff(col("day"), col("d0")).cast("long").as("d"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("d").cast(dec)).as("sd"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("d") * col("y")).cast(dec)).as("sdy"),
        sum((col("d") * col("d")).cast(dec)).as("sd2"),
        sum((col("y") * col("y")).cast(dec)).as("sy2"))
    val covN = (col("n") * col("sdy") - col("sd") * col("sy")).cast(DoubleType)
    val varD = (col("n") * col("sd2") - col("sd") * col("sd")).cast(DoubleType)
    val varY = (col("n") * col("sy2") - col("sy") * col("sy")).cast(DoubleType)
    m.select(col("event_type"), col("n").as("n_days"),
      round(try_divide(covN, varD), 6).as("slope"),
      round(try_divide(
        col("sy").cast(DoubleType) * varD - covN * col("sd").cast(DoubleType),
        col("n").cast(DoubleType) * varD), 6).as("intercept"),
      round(try_divide(covN * covN, varD * varY), 6).as("r2"))
  }

  /** DuckDB mirror of [[trendOls]] (oracle builder). */
  def trendOlsSql(): String =
    """WITH daily AS (SELECT event_type,
           date_trunc('day', CAST(ts AS TIMESTAMP)) "day", count(*) y
         FROM events GROUP BY 1, 2),
       d0 AS (SELECT MIN("day") d0 FROM daily),
       m AS (SELECT event_type, count(*) n,
               SUM(CAST(datediff('day', d0, "day") AS DECIMAL(38,0))) sd,
               SUM(CAST(y AS DECIMAL(38,0))) sy,
               SUM(CAST(datediff('day', d0, "day") * y AS DECIMAL(38,0))) sdy,
               SUM(CAST(datediff('day', d0, "day")
                 * datediff('day', d0, "day") AS DECIMAL(38,0))) sd2,
               SUM(CAST(y * y AS DECIMAL(38,0))) sy2
             FROM daily, d0 GROUP BY 1)
       SELECT event_type, n AS n_days,
         round(CASE WHEN n*sd2 - sd*sd = 0 THEN NULL
           ELSE CAST(n*sdy - sd*sy AS DOUBLE)
              / CAST(n*sd2 - sd*sd AS DOUBLE) END, 6) AS slope,
         round(CASE WHEN n*sd2 - sd*sd = 0 THEN NULL
           ELSE (CAST(sy AS DOUBLE) * CAST(n*sd2 - sd*sd AS DOUBLE)
               - CAST(n*sdy - sd*sy AS DOUBLE) * CAST(sd AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n*sd2 - sd*sd AS DOUBLE)) END, 6)
           AS intercept,
         round(CASE WHEN CAST(n*sd2 - sd*sd AS DOUBLE)
                       * CAST(n*sy2 - sy*sy AS DOUBLE) = 0 THEN NULL
           ELSE CAST(n*sdy - sd*sy AS DOUBLE) * CAST(n*sdy - sd*sy AS DOUBLE)
              / (CAST(n*sd2 - sd*sd AS DOUBLE)
               * CAST(n*sy2 - sy*sy AS DOUBLE)) END, 6) AS r2
       FROM m"""

  /** DAY-OF-WEEK seasonal index per event type — the multiplicative
    * seasonality profile (mean count on that weekday ÷ overall mean) that
    * capacity planning and anomaly baselines divide out before comparing
    * days. All-integer algebra until one division:
    * index = sum_dow·n_days_all / (n_days_dow·sum_all), round-6.
    * Scale shape: the stream reduces to |types|·|days| in one map-side
    * aggregate; everything after is day-table-sized. Output:
    * (event_type, dow, n_days, seasonal_index); dow 1=Sunday..7. */
  def seasonalIndex(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val byDow = daily
      .groupBy(col("event_type"), dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s"))
    val overall = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_all"), sum(col("n")).as("s_all"))
    byDow.join(overall, "event_type")
      .select(col("event_type"), col("dow"), col("n_days"),
        round((col("s") * col("n_all")).cast(DoubleType) /
          (col("n_days") * col("s_all")).cast(DoubleType), 6).as("seasonal_index"))
  }

  /** DuckDB mirror of [[seasonalIndex]] (oracle builder). */
  def seasonalIndexSql(): String =
    """WITH daily AS (SELECT event_type,
           date_trunc('day', CAST(ts AS TIMESTAMP)) "day", count(*) n
         FROM events GROUP BY 1, 2),
       dw AS (SELECT event_type, CAST(dayofweek("day") + 1 AS INT) dow,
               count(*) n_days, CAST(SUM(n) AS BIGINT) s
              FROM daily GROUP BY 1, 2),
       o AS (SELECT event_type, count(*) n_all, CAST(SUM(n) AS BIGINT) s_all
             FROM daily GROUP BY 1)
       SELECT dw.event_type, dow, n_days,
         round(CAST(s * n_all AS DOUBLE) / CAST(n_days * s_all AS DOUBLE), 6)
           AS seasonal_index
       FROM dw JOIN o ON dw.event_type = o.event_type"""

  /** Single most-likely changepoint per series (binary segmentation, the
    * first split of Scott & Knott / ruptures-style search): over each
    * event type's daily count series, every split point t is scored with
    * the scaled two-sample CUSUM statistic
    * |mean_left − mean_right| · sqrt(t·(n−t)/n), and the argmax (earliest
    * day on ties) is the changepoint. A true CUSUM recursion
    * S_t = max(0, S_{t-1}+…) is a nonlinear scan no relational engine
    * vectorizes; the split-scan form is equivalent for single-shift
    * detection and is pure window algebra.
    *
    * Scale shape: the raw stream reduces to |types|·|days| rows in ONE
    * map-side-combinable aggregate before any window; both windows and
    * the rank are hash-partitioned per type (a series fits a partition by
    * construction — days, not events). All arithmetic is single-rounded
    * IEEE ops on exact integer counts in a fixed order, so the DuckDB
    * oracle matches bit-for-bit under round(…, 6).
    * Output: (event_type, change_day, stat, mean_before, mean_after). */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cum = daily.select(col("event_type"), col("day"),
      row_number().over(w).as("t"),
      sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("s"),
      count(lit(1)).over(Window.partitionBy(col("event_type"))).as("nd"),
      sum(col("n")).over(Window.partitionBy(col("event_type"))).as("stot"))
    val scored = cum.where(col("t") < col("nd"))
      .select(col("event_type"), col("day"),
        (col("s").cast("double") / col("t")).as("mean_l"),
        ((col("stot") - col("s")).cast("double") / (col("nd") - col("t"))).as("mean_r"),
        (abs(col("s").cast("double") / col("t") -
             (col("stot") - col("s")).cast("double") / (col("nd") - col("t"))) *
          sqrt((col("t") * (col("nd") - col("t"))).cast("double") / col("nd")))
          .as("raw_stat"))
    val best = Window.partitionBy(col("event_type"))
      .orderBy(col("raw_stat").desc, col("day").asc)
    scored.select(col("event_type"), col("day"), col("mean_l"), col("mean_r"),
        col("raw_stat"), row_number().over(best).as("rk"))
      .where(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        round(col("raw_stat"), 6).as("stat"),
        round(col("mean_l"), 6).as("mean_before"),
        round(col("mean_r"), 6).as("mean_after"))
  }

  /** Robust anomaly flags over per-type daily counts (median absolute
    * deviation, the outlier rule that — unlike z-scores — one huge spike
    * cannot drag its own threshold up): per event type, med = the lower
    * median of the daily counts, MAD = the lower median of |n − med|, and
    * a day is anomalous when |n − med| > k·MAD. With MAD = 0 (over half
    * the days identical) any deviating day flags, the conventional
    * degenerate-case reading.
    *
    * Scale shape: the raw stream reduces to |types|·|days| rows in one
    * map-side-combinable aggregate; BOTH medians come from the equi-depth
    * census walk (value-histogram + cumulative window + first value whose
    * cum reaches ceil(nd/2)) — bounded by distinct values per type, never
    * a per-type sort of raw data; thresholds broadcast back onto the
    * daily frame. Pure integer arithmetic end to end (counts, integer
    * medians, |·| in longs) — nothing floating anywhere.
    * Output: (event_type, day, n, med, mad, anomaly). */
  def anomalyMad(events: DataFrame, k: Int = 3): DataFrame = {
    import graft.operators.Dedup.MaterializeSyntax
    val daily = events
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .materialized // |types|·|days| rows feed three consumers
    // lower median of `v` per event_type via the census walk
    def median(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(v))
      df.groupBy(col("event_type"), col(v)).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nd", sum(col("c")).over(
          Window.partitionBy(col("event_type"))))
        .where(col("cum") * 2 >= col("nd"))
        .groupBy(col("event_type")).agg(min(col(v)).as(out))
    }
    val withMed = daily.join(broadcast(median(daily, "n", "med")), "event_type")
      .withColumn("dev", abs(col("n") - col("med")))
    val withMad = withMed.join(broadcast(median(withMed, "dev", "mad")), "event_type")
    withMad.select(col("event_type"), col("day"), col("n"), col("med"),
      col("mad"), (col("dev") > lit(k) * col("mad")).as("anomaly"))
  }

  /** Interval OVERLAP join without a cross product: both interval sets
    * explode onto a coarse time-bucket grid (one row per bucket an
    * interval touches), candidates meet in an EQUI-join on the bucket, and
    * the exact predicate `aStart <= bEnd ∧ bStart <= aEnd` verifies each
    * candidate. A pair sharing several buckets is emitted exactly ONCE by
    * construction — only the bucket containing `greatest(aStart, bStart)`
    * (where the overlap region begins) keeps it, a filter predicate
    * instead of a multi-million-row pair DISTINCT (which cost a second
    * output-sized shuffle: 4.9 s → 1.9 s at sf0.1 on the incident query).
    * A naive formulation is a cartesian product with a residual filter —
    * |A|·|B| at any scale; here cost is per-bucket candidate fan-in, i.e.
    * proportional to temporal OVERLAP DENSITY, and the bucket width trades
    * explode volume against fan-in (fixed at 1 hour — suited to
    * minute-to-hours intervals like sessions). Both frames must carry
    * (id, start, end); output: one row per overlapping (aId, bId) with
    * both intervals. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame): DataFrame = {
    def exploded(df: DataFrame, p: String) = df.select(
        col("id").as(s"${p}_id"), col("start").as(s"${p}_start"),
        col("end").as(s"${p}_end"),
        explode(sequence(date_trunc("hour", col("start")),
          date_trunc("hour", col("end")), expr("interval 1 hour"))).as("bk"))
    exploded(a, "a").join(exploded(b, "b"), "bk")
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end") &&
        col("bk") === date_trunc("hour", greatest(col("a_start"), col("b_start"))))
      .select(col("a_id"), col("b_id"), col("a_start"), col("a_end"),
        col("b_start"), col("b_end"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable distinct-count sketches (HyperLogLog, Flajolet et al. 2007)
  * expressed RELATIONALLY: a sketch is a tiny (group, register, max-rho)
  * frame, so building it is one map-side-combinable aggregate, merging two
  * sketches is `union → groupBy(register).max(rho)`, and the estimator is a
  * 64-row-per-group reduction. Nothing here is a UDAF and no driver-side
  * state exists — the registers ARE rows, which is what lets a 100 TB scan
  * keep per-day/per-source sketches as a 64-rows-per-group table that later
  * rolls up to any coarser grain WITHOUT rescanning the raw data (the whole
  * point of a mergeable sketch vs `count(distinct)`, whose partials are
  * value sets, not bounded registers).
  *
  * Spark's own `approx_count_distinct` is the black-box form of the same
  * algorithm; this one exists because (a) its register table is a durable,
  * mergeable MATERIALIZATION (store daily, fold to monthly), and (b) every
  * arithmetic step is md5-derived and integer/bin()-exact, so the DuckDB
  * oracle reproduces the estimate bit-for-bit (the built-in's xxHash64
  * seeds differ per engine and cannot be oracle-checked).
  *
  * Hash: the low 60 bits of md5 (15 hex chars → long). Register index =
  * low `p` bits; rho = 1 + leading zeros of the remaining (60-p)-bit
  * field, computed as `(60-p+1) - length(bin(v))` — `bin` is the minimal
  * binary rendering in BOTH engines, so no floating log2 is involved.
  */
object Sketches {

  /** Register count 2^p. p=6 (64 registers, ~13% rse) keeps the sketch
    * table readable in tests; production would use p=11+ (~2.3%). */
  val HllP = 6
  val HllM = 1 << HllP // 64
  /** Bias constant alpha_64 (Flajolet et al. Fig. 3, m = 64). */
  val HllAlpha = 0.709

  private val restBits = 60 - HllP // 54

  /** Per-(group, register) max-rho sketch rows for one grouping column.
    * One aggregate, map-side combinable: the shuffle carries at most
    * |groups|·64 rows no matter how many raw rows went in. */
  def hllRegisters(df: DataFrame, group: Column, key: Column): DataFrame = {
    val h = conv(substring(md5(key.cast(StringType)), 1, 15), 16, 10)
      .cast(LongType)
    val rest = shiftrightunsigned(h, HllP)
    df.select(group.as("g"), h.bitwiseAND(lit(HllM - 1L)).as("reg"),
        when(rest === 0L, lit(restBits + 1))
          .otherwise(lit(restBits + 1) - length(bin(rest))).as("rho"))
      .groupBy(col("g"), col("reg"))
      .agg(max(col("rho")).as("mx"))
  }

  /** Merge sketches across groups into ONE group labeled `label` —
    * union-free here since re-grouping the register table is the merge. */
  def hllMerge(regs: DataFrame, label: String): DataFrame =
    regs.groupBy(lit(label).as("g"), col("reg")).agg(max(col("mx")).as("mx"))

  /** Fixed-width histogram QUANTILE sketch — the mergeable companion to
    * the HLL registers: a sketch is a tiny (group, bin, count) frame under
    * a FIXED bin rule (`bin = floor(value / width)` — no data-dependent
    * bounds, so sketches built on different days/partitions merge by
    * summing counts, the property `percentile()` partials lack). A 100 TB
    * metrics store keeps per-day bin tables and folds them to any coarser
    * grain without rescanning; the estimator walks the cumulative bin
    * distribution and interpolates rank position INSIDE the hit bin.
    * Build: one map-side-combinable aggregate (≤ |groups|·|bins| rows on
    * the shuffle). */
  def histRegisters(df: DataFrame, group: Column, value: Column,
                    width: Double): DataFrame =
    df.select(group.as("g"),
        floor(value / lit(width)).cast(LongType).as("bin"))
      .groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge histogram sketches across groups into ONE group `label` —
    * re-grouping the bin table IS the merge (counts add). */
  def histMerge(regs: DataFrame, label: String): DataFrame =
    regs.groupBy(lit(label).as("g"), col("bin")).agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a bin table: for each q, the row where the
    * cumulative count first reaches ceil(q·n), linearly interpolated by
    * rank within the bin — every input to the arithmetic is an exact
    * integer, so the doubles are bit-reproducible cross-engine (one
    * multiply/ceil/divide chain + round 6). The per-group window sorts
    * |bins| rows, never raw data. Output: (g, n, p50, p90, p99). */
  def histQuantiles(regs: DataFrame, width: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("bin"))
    val b = regs
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
    def pick(q: Double, name: String): DataFrame = {
      val target = ceil(lit(q) * col("n"))
      b.where(col("cum") >= target && (col("cum") - col("cnt")) < target)
        .select(col("g"), col("n"),
          round(col("bin") * lit(width) + lit(width) *
            (target - (col("cum") - col("cnt")).cast(DoubleType)) /
            col("cnt").cast(DoubleType), 6).as(name))
    }
    pick(0.5, "p50")
      .join(pick(0.9, "p90").drop("n"), "g")
      .join(pick(0.99, "p99").drop("n"), "g")
      .select(col("g"), col("n"), col("p50"), col("p90"), col("p99"))
  }

  /** The HLL estimator over a register table: raw estimate alpha·m²/Z
    * with Z = Σ 2^-M[j] (absent registers are zeros and contribute
    * 2⁰ = 1 each), linear counting m·ln(m/V) below the 2.5m small-range
    * threshold. Z is accumulated SCALED BY 2^55 in pure long arithmetic
    * (2^(55−mx) per register — max Σ is m·2^55 = 2^61, no overflow), so
    * the only floating steps are one correctly-rounded long→double
    * conversion, exact power-of-two scalings, one division, and the
    * round(…, 4)-guarded `ln` — every one bit-reproducible in DuckDB. */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val shift = restBits + 1 // 55: rho ∈ [1, 55] ⇒ exponent ∈ [0, 54]
    val m = lit(HllM.toDouble)
    val rawEst = lit(HllAlpha) * m * m * lit((1L << shift).toDouble) /
      col("zs").cast(DoubleType)
    regs.groupBy(col("g"))
      .agg(count(lit(1)).as("n_regs"),
        // SQL form: functions.shiftleft only takes a literal bit count
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $shift - mx)")).as("z_present"))
      .select(col("g"), col("n_regs").cast(IntegerType).as("n_regs"),
        (lit(HllM.toLong) - col("n_regs")).as("v"),
        (col("z_present") +
          (lit(HllM.toLong) - col("n_regs")) * lit(1L << shift)).as("zs"))
      .select(col("g"), col("n_regs"),
        round(
          when(rawEst <= lit(2.5) * m && col("v") > 0,
            m * log(m / col("v")))
          .otherwise(rawEst), 4).as("est"))
  }
}

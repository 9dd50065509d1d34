package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-mitigation operators for hot grouping keys.
  *
  * At 100 TB a low-cardinality or Zipf-skewed key (a handful of groups
  * absorbing most rows) turns a single-exchange aggregation into a few
  * overloaded reducers. [[saltedAgg]] splits the aggregation in two phases:
  * phase 1 groups on (key, salt) — the hot key's rows spread over `buckets`
  * reducers and combine map-side as usual; phase 2 groups the tiny partial
  * results on the key alone. For additive aggregates (sum/count) the result
  * is EXACTLY the direct groupBy (decimal sums are order-independent), so
  * the oracle is the plain GROUP BY.
  *
  * The salt derives from crc32 of a spreading column — deterministic, no
  * RNG state. (AQE's skew-join handling covers the join case; this covers
  * aggregation, which AQE does not re-balance.)
  */
object SkewOps {

  /** Two-phase sum/count over a skewed key.
    * Output: (groupCols*, sum_<alias>, n). */
  def saltedAgg(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                alias: String, spreadOn: Column, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(crc32(spreadOn.cast("string")), lit(buckets)))
      .groupBy((groupCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol.cast(DecimalType(18, 4))).as("__psum"),
        count(lit(1)).as("__pn"))
    partial
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__psum")).cast(DoubleType).as(alias),
        sum(col("__pn")).as("n"))
  }

  /** Salted equi-join for a hot join key: the big/skewed side gets a
    * deterministic salt from a high-cardinality spreading column, the
    * small side is replicated once per salt bucket, and the join runs on
    * (key, salt) — each hot key's rows spread over `buckets` reducers
    * instead of stalling one. Result = the plain inner equi-join exactly
    * (every (row, match) pair survives with one salt value).
    *
    * This is the explicit form for when AQE's skew-join split cannot
    * apply — a non-broadcastable-but-modest build side, a sort-merge
    * join whose skew emerges only at the reducer, or an engine stage
    * with AQE off. Replication costs |small|·buckets rows through the
    * exchange; size `buckets` to the hot key's concentration, not the
    * cluster. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spreadOn: Column, buckets: Int): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(crc32(spreadOn.cast("string")), lit(buckets)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}

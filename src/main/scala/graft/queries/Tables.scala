package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the declared query inventory (SparkEntry.queries).
  *
  * Oracle-parity conventions used by every query here:
  *   - Every computed column is aliased identically in the Spark code and the
  *     DuckDB oracle SQL (the driver sorts columns by name before hashing).
  *   - Sums/avgs of doubles go through DECIMAL(18,4): decimal aggregation is
  *     exact and order-independent, so Spark (parallel, arbitrary partial-agg
  *     order) and DuckDB (sequential) produce bit-identical results; the
  *     final value is cast back to DOUBLE, a deterministic conversion.
  *     Plain `sum(double)` would differ in low-order bits between engines.
  */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which Spark 4
    * refuses by default — read nanos as long under the legacy conf and
    * normalize in integer math; a double roundtrip would lose precision on
    * 1.7e18-scale values) and as plain timestamp[us] (read as
    * TIMESTAMP_NTZ — cast to the session-tz type; session tz is pinned
    * UTC, so the wall-clock is preserved). Branch on the observed type so
    * both fixture generations read identically. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", normTs(raw.schema("ts").dataType))
  }

  /** Normalized session-tz micro-precision `ts` for either raw encoding. */
  def normTs(dt: DataType): Column = dt match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case _        => col("ts").cast(TimestampType)
  }

  /** Exact, order-independent sum of a double expression (see above). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact average: decimal sum / count, divided in double. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast(DoubleType)

  /** Oracle-side fragments matching dsum/davg. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
  def davgSql(e: String): String = s"(CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / COUNT($e))"

  /** Money (2-decimal) column as exact decimal; factors like (1-discount)
    * as DECIMAL(4,2). Products are then computed in exact decimal
    * arithmetic in BOTH engines — casting the double PRODUCT instead would
    * diverge (Spark converts double→decimal via shortest string repr,
    * DuckDB via the exact binary value, and ≥5-decimal products straddle
    * rounding midpoints). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  def factor(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Exact revenue-style sum: SUM(money * factor [* factor]) as double. */
  def revSum(c: Column): Column = sum(c).cast(DoubleType)
  def moneySql(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def factorSql(e: String): String = s"CAST($e AS DECIMAL(4,2))"

  /** Driver-comparable rendering of binary outputs: every BINARY column
    * becomes its lowercase hex string (both engines' `hex` is uppercase,
    * `md5` lowercase — `lower` unifies). The driver's pandas comparator
    * cannot hash `bytearray` cells, so declared queries ship hex renderings;
    * raw-byte fidelity stays pinned by KeyFunctionsSpec/CellPipelineSpec. */
  def hexBin(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == BinaryType) lower(hex(col(f.name))).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

  /** Lowercase hex of a string's UTF-8 bytes — oracle-side literal builder. */
  def hexOf(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map("%02x".format(_)).mkString
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key.
  *
  * Spark has no built-in as-of join; per the extension preference order the
  * engine COMPOSES built-ins rather than adding a custom physical operator:
  * union both sides into one keyed stream, single range shuffle on the key,
  * and a running `last_value(_, ignoreNulls)` window carries the most
  * recent right payload forward onto each left row. Exactly one exchange +
  * one sort — the same cost as a sort-merge join, with none of the
  * per-row binary-search driver logic a naive implementation needs, and it
  * inherits AQE skew handling on the exchange.
  *
  * Ties: right rows at the same instant sort BEFORE left rows (inclusive
  * `<=` semantics); among right rows sharing (key, time) the one with the
  * greatest `rightTiebreak` wins — fully deterministic output.
  *
  * `tolerance` bounds match staleness (pandas merge_asof's `tolerance`):
  * a carried right row older than `leftTime - tolerance` yields NULL
  * instead — the staleness check is a post-window projection, so the
  * plan (one exchange + one sort) is unchanged.
  */
object AsOf {

  /** Nearest-in-time join (pandas merge_asof `direction='nearest'`): for
    * each left row, the right row minimizing |rightTime − leftTime| on the
    * same key, within `toleranceMicros`; equidistant ties prefer the
    * BACKWARD (earlier) match, and right rows sharing an instant resolve
    * to the greatest `rightTiebreak` — fully deterministic.
    *
    * Same composition discipline as [[asOfJoin]]: one keyed union, ONE
    * exchange + ONE sort, and two directional carries over the same
    * ordering (`last ignoreNulls` looking back, `first ignoreNulls`
    * looking forward) — the sensor-alignment primitive, with no per-row
    * search anywhere. Same-instant rights sort before left rows, so they
    * are backward matches at distance 0 (inclusive semantics). Right rows
    * pre-reduce per (key, instant) by greatest tiebreak — a map-side
    * combinable `max_by` that also keeps the union frame minimal.
    *
    * NULL keys follow SQL-join (and pandas merge_asof) semantics: a
    * NULL-key left row gets a NULL match — never a NULL-key right row,
    * which the raw hash-partitioning would otherwise co-locate with it.
    * NULL-key right rows are dropped before the union (they can match
    * nothing). */
  def nearestJoin(left: DataFrame, right: DataFrame,
                  leftKey: Column, rightKey: Column,
                  leftTime: Column, rightTime: Column,
                  rightValues: Seq[Column], rightTiebreak: Column,
                  toleranceMicros: Long): DataFrame = {
    val lCols = left.columns
    val vType = right.select(struct(rightValues: _*)).schema.head.dataType
    val lType = left.select(struct(lCols.map(col): _*)).schema.head.dataType
    val r = right.select(rightKey.as("__k"),
        unix_micros(rightTime.cast("timestamp")).as("__t"),
        rightTiebreak.cast("bigint").as("__tb"), struct(rightValues: _*).as("__v0"))
      .where(col("__k").isNotNull)
      .groupBy(col("__k"), col("__t"))
      .agg(max_by(col("__v0"), col("__tb")).as("__v"))
      .select(col("__k"), col("__t"), lit(1).as("__r"),
        lit(null).cast(lType).as("__l"), col("__v"))
    val l = left.select(leftKey.as("__k"),
      unix_micros(leftTime.cast("timestamp")).as("__t"), lit(0).as("__r"),
      struct(lCols.map(col): _*).as("__l"), lit(null).cast(vType).as("__v"))
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__r").desc)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r)
      .withColumn("__rv",
        when(col("__r") === 1, struct(col("__t").as("t"), col("__v").as("v"))))
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(back))
      .withColumn("__f", first(col("__rv"), ignoreNulls = true).over(fwd))
      .where(col("__r") === 0)
    val aB = col("__t") - col("__b.t")
    val aF = col("__f.t") - col("__t")
    val bOk = col("__b").isNotNull && aB <= toleranceMicros
    val fOk = col("__f").isNotNull && aF <= toleranceMicros
    carried.select(col("__l.*"),
      when(col("__k").isNotNull,
        when(bOk && (!fOk || aB <= aF), col("__b.v"))
          .when(fOk, col("__f.v"))).as("nearest"))
  }

  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTime: Column, rightTime: Column,
               rightValues: Seq[Column], rightTiebreak: Column,
               tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns
    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(0).as("__r"),
      lit(null).cast("bigint").as("__tb"),
      struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(struct(rightValues: _*)).schema.head.dataType).as("__v"),
      lit(null).cast(right.select(rightTime).schema.head.dataType).as("__vt"))
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(1).as("__r"),
      rightTiebreak.cast("bigint").as("__tb"),
      lit(null).cast(left.select(struct(lCols.map(col): _*)).schema.head.dataType).as("__l"),
      struct(rightValues: _*).as("__v"),
      rightTime.as("__vt"))
      .where(col("__k").isNotNull) // SQL semantics: NULL keys match nothing
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__r").desc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("__mt", last(col("__vt"), ignoreNulls = true).over(w))
      .where(col("__r") === 0)
    val kept = tolerance.fold(col("__m"))(tol =>
      when(col("__mt") >= col("__t") - tol, col("__m")))
    // NULL-key left rows keep their row but match nothing (SQL semantics)
    matched.select(col("__l.*"),
      when(col("__k").isNotNull, kept).as("asof"))
  }
}

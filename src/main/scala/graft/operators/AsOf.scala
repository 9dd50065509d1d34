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
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__r").desc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("__mt", last(col("__vt"), ignoreNulls = true).over(w))
      .where(col("__r") === 0)
    val kept = tolerance.fold(col("__m"))(tol =>
      when(col("__mt") >= col("__t") - tol, col("__m")))
    matched.select(col("__l.*"), kept.as("asof"))
  }
}

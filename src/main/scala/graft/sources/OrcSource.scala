package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** ORC source — the supported MODERN columnar input (RCFile's successor;
  * SURVEY.md §2.1 S4). Unlike the [[RCFileSource]] legacy shim this is a
  * first-class vectorized DataFrame scan: predicate pushdown, column
  * pruning and whole-stage codegen all apply, so an ingest that reads 4
  * key fields out of 100 columns touches 4 column streams on disk — the
  * property the reference's RCFile choice was reaching for
  * (BulkImporterFromRC.java:94-95) with none of the row-reconstruction
  * cost.
  */
object OrcSource {

  /** Read an ORC file into the engine's positional schema (`c0..c{n-1}`,
    * all strings): columns are taken in FILE ORDER and cast to string,
    * mirroring how the reference treats every input as positional text.
    * Fails fast if the file has fewer than `arity` columns — a schema
    * mismatch should stop an ingest, not silently quarantine every row. */
  def read(spark: SparkSession, path: String, arity: Int): DataFrame = {
    val raw = spark.read.orc(path)
    require(raw.columns.length >= arity,
      s"ORC file $path has ${raw.columns.length} columns, need >= $arity")
    raw.select(raw.columns.take(arity).zipWithIndex.map { case (c, i) =>
      col(c).cast(StringType).as(s"c$i")
    }.toIndexedSeq: _*)
  }

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}

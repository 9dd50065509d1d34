package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source — the modern feed format sitting beside the
  * reference's four importers (BulkImporterFromText.java:1 csv/hivetext,
  * BulkImporterFromAvro.java:1, RCFile): one JSON object per line, read
  * as a first-class DataFrame source with predicate pushdown into the
  * line parser and the same nullable-field semantics as the avro path
  * (an absent/null JSON field maps to a SQL NULL → the null-cell guard
  * emits no cell).
  *
  * The schema is EXPLICIT (DDL string), never inferred: inference sorts
  * fields alphabetically and costs an extra full scan — both wrong for a
  * production ingest whose column order is the cell-qualifier order and
  * whose input is 100 TB. */
object JsonlSource {
  def read(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl)).json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Avro container-file source — reference S3 path
  * (BulkImporterFromAvro.java:91, `AvroKeyInputFormat` over the PWData
  * schema of 9 nullable strings, pw_schema.avsc:6-51).
  *
  * Spark 4 bundles the avro datasource in spark-sql, so the scan is a
  * first-class DataFrame source: schema from the writer file, predicate
  * pushdown and column pruning included — strictly stronger than the
  * reference's whole-record reflection loop. Nullable-union
  * `["null","string"]` fields map natively to nullable StringType.
  */
object AvroSource {
  /** This distro ships the avro classes inside spark-sql but leaves them
    * out of the DataSourceRegister service file, so the short name "avro"
    * does not resolve — address the FileFormat class directly. */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroFormat).load(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.format(AvroFormat).mode("overwrite").save(path)
}

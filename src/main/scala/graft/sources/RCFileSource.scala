package graft.sources

import org.apache.hadoop.hive.ql.io.RCFileInputFormat
import org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable
import org.apache.hadoop.io.LongWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Hive RCFile source — reference S4 path (BulkImporterFromRC.java:94-95).
  *
  * OSS Spark has no DataFrame reader for RCFile without a Hive catalog
  * table, so this source shims the classic `RCFileInputFormat` through
  * `sparkContext.hadoopFile` and reconstructs rows as UTF-8 strings —
  * exactly the reference's `BytesRefArrayWritable` row-reconstruction
  * (BulkImporterFromRC.java:50-64), minus its field-20 bug (SURVEY.md
  * §1.3: the guard requires 9 columns yet the key reads index 20; we
  * normalize to in-range key fields). For new data, ORC/Parquet are the
  * supported columnar inputs (vectorized, codegen'd); RCFile support
  * exists for legacy-data parity.
  */
object RCFileSource {

  /** Read an RCFile of `arity` string columns into the engine's positional
    * schema (`c0..c{arity-1}`). Rows with a different column count are
    * dropped, mirroring the reference's arity guard (`…RC.java:53`). */
  def read(spark: SparkSession, path: String, arity: Int): DataFrame = {
    val rows = spark.sparkContext
      .hadoopFile(path,
        classOf[RCFileInputFormat[LongWritable, BytesRefArrayWritable]],
        classOf[LongWritable], classOf[BytesRefArrayWritable])
      .flatMap { case (_, v) =>
        // eager copy: Hadoop reuses the Writable between records
        if (v.size() != arity) None
        else Some(Row.fromSeq((0 until arity).map { i =>
          // empty bytes decode to "" (not null) — the same record through
          // the text drivers yields an empty-string cell, and nulling key
          // fields here would silently void the row key
          val ref = v.get(i)
          new String(ref.getData, ref.getStart, ref.getLength, "UTF-8")
        }))
      }
    spark.createDataFrame(rows, Delimited.positionalSchema(arity))
  }
}

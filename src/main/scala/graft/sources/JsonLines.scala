package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines corpus source/sink — the de-facto interchange format for LLM
  * training corpora (one JSON document per line, sharded, compressed).
  *
  * Reading goes through `text` + `from_json` rather than the native JSON
  * reader so malformed lines land in a QUARANTINE frame (same
  * no-silent-drop contract as [[Delimited]]): Spark's PERMISSIVE JSON
  * reader cannot filter on the internal corrupt-record column without
  * caching the whole scan, while `from_json` gives a null struct per bad
  * line for free inside codegen. Schema is explicit (never inferred) — at
  * 100 TB, schema inference is a full extra pass over the corpus.
  */
object JsonLines {

  /** Read `path` as JSONL with `schema`. Returns (kept, rejectedRawLines);
    * a line is rejected iff it is not parseable JSON matching the schema
    * types (missing fields are null — stringly-permissive like the rest of
    * the engine; blank lines are skipped, matching jsonl convention). */
  def read(spark: SparkSession, path: String,
           schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val raw = spark.read.text(path).where(trim(col("value")) =!= "")
    // PERMISSIVE from_json yields an all-null struct (not a null struct)
    // for malformed lines, so detection rides on an explicit
    // corrupt-record field instead of struct nullness
    val parsed = raw.select(col("value"),
      from_json(col("value"), schema.add(corrupt, "string"),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corrupt)).as("j"))
    val bad = col("j").getField(corrupt).isNotNull
    val kept = parsed.where(!bad)
      .select(schema.fieldNames.map(f => col(s"j.$f")).toIndexedSeq: _*)
    val rejected = parsed.where(bad).select(col("value"))
    (kept, rejected)
  }

  /** Write `df` as sharded (optionally compressed) JSONL. `shards` bounds
    * output file count — at scale, shard size (not count) is what matters,
    * so producers size this to a few hundred MB per shard. */
  def write(df: DataFrame, path: String, shards: Int,
            compression: String = "none"): Unit =
    df.repartition(shards).write.mode("overwrite")
      .option("compression", compression).json(path)
}

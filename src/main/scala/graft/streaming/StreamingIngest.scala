package graft.streaming

import graft.{BulkLoad, CellSink}
import graft.sources.Delimited
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming form of the bulk-load pipeline: the exact batch
  * dataflow (parse → quarantine → rowkey → cell explode → region-aligned
  * total-order sort → [[CellSink]] → postCommit) wrapped in a file-source
  * stream with `foreachBatch`.
  *
  * This is the continuous-ingestion shape the reference's batch drivers
  * (`BulkImporterFrom*.java`, one `Tool.run` per dropped fileset) imply but
  * never built: files land in a directory, each micro-batch becomes an
  * independent region-aligned sorted fileset under `outDir/batch_NNNNN`,
  * and `postCommit` (chmod → doBulkLoad → cleanup) fires per batch — which
  * is precisely how incremental HBase bulk loads compose, since every
  * adoption is atomic per HFile set. The checkpoint makes ingestion
  * exactly-once across restarts: a re-submitted job resumes from the last
  * committed source offset instead of re-loading files.
  *
  * At scale the file source swaps for Kafka and `maxFilesPerTrigger`
  * becomes `maxOffsetsPerTrigger`; the per-batch plan — ONE total-order
  * exchange over the batch, O(#regions) driver state — is unchanged.
  */
object StreamingIngest {

  /** One completed micro-batch: its id, output path, and cell count. */
  case class BatchResult(batchId: Long, path: String, cells: Long)

  /** Stream `delim`-separated text files from `inputDir` through the cell
    * pipeline. Runs until all currently-available input is drained, then
    * returns the per-batch results (ordered by batch id). `sinkOverride`
    * lets tests record the write/postCommit sequence; production uses the
    * pipeline's own sink. */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          checkpointDir: String, cfg: BulkLoad.Config = BulkLoad.Config(),
          delim: String = ",", maxFilesPerTrigger: Int = 1,
          sinkOverride: Option[CellSink] = None): Seq[BatchResult] = {
    val results = scala.collection.mutable.ArrayBuffer.empty[BatchResult]
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inputDir)
    val q = lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (kept, rejected) = Delimited.naiveSplitLines(batch, delim, cfg.arity)
        val r = BulkLoad.fromPositional(kept, rejected, cfg)
        val sink = sinkOverride.getOrElse(r.sink)
        val dest = f"$outDir/batch_$batchId%05d"
        sink.write(r.cells, dest)
        // quarantined rows ride along per batch — same no-silent-drop
        // contract as the batch path
        r.quarantined.write.mode("overwrite").parquet(s"$dest.quarantine")
        sink.postCommit(dest)
        results.synchronized {
          results += BatchResult(batchId, dest, spark.read.parquet(dest).count())
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(_.batchId).toSeq
  }
}

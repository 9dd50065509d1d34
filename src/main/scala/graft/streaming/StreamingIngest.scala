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
  *
  * Per-batch overhead budget (the round-9 batch-vs-streaming 17× gap was
  * mostly fixed per-batch cost, not pipeline throughput), and what this
  * harness does about each item:
  *   - region boundaries are FIXED ONCE per run: an unsalted/unsplit
  *     config is promoted to explicit [[RegionSort.uniformMd5Splits]]
  *     boundaries, so no micro-batch ever pays Catalyst's range-sampling
  *     scan — exactly the reference's once-per-job `RegionLocator` read
  *     (a live table's regions don't move between micro-batches);
  *   - the per-batch cell count is read from the written parquet FOOTERS
  *     on the driver (a few metadata pages), never a Spark count job;
  *   - what remains per batch — offset/commit log writes, one write job
  *     per output (cells + quarantine), postCommit — is the floor;
  *     `bench_out.json` records per-batch seconds so a regression is
  *     distinguishable from this design cost.
  */
object StreamingIngest {

  /** One completed micro-batch: its id, output path, cell count, and
    * wall-clock seconds spent inside its foreachBatch body. */
  case class BatchResult(batchId: Long, path: String, cells: Long,
                         secs: Double = 0.0)

  /** Per-batch cell-count readback, cheapest first: the sink's manifest
    * already records per-file row counts (ONE small-file read, zero
    * footer opens), else sum the parquet footers, else a distributed
    * count for sinks that did not land flat parquet. */
  private def footerCount(spark: SparkSession, dir: String): Long =
    graft.sources.CellManifest.totalRows(spark, dir).getOrElse {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val parts = fs.listStatus(p).filter(s => s.isFile &&
        s.getPath.getName.startsWith("part-") && s.getPath.getName.endsWith(".parquet"))
      if (parts.isEmpty) spark.read.parquet(dir).count()
      else parts.map { s =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(
            s, spark.sessionState.newHadoopConf()))
        try r.getRecordCount finally r.close()
      }.sum
    }

  /** Stream `delim`-separated text files from `inputDir` through the cell
    * pipeline. Runs until all currently-available input is drained, then
    * returns the per-batch results (ordered by batch id). `sinkOverride`
    * lets tests record the write/postCommit sequence; production uses the
    * pipeline's own sink. */
  /** `compactEvery > 0` runs [[graft.sources.CellCompaction.compactMinor]]
    * after every N completed micro-batches: the accumulated per-batch
    * filesets are absorbed into `outDir/serving` as one region-aligned
    * fileset per sweep (incremental manifest refresh, inputs retired) —
    * the HBase background-compaction posture composed with the ingest
    * stream, so a long-running feed's serving layout holds
    * O(batches / N) filesets instead of one per batch. Runs INSIDE the
    * sequential foreachBatch turn, after postCommit (adoption first,
    * sweep second — the server compacts what it has adopted). */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          checkpointDir: String, cfg: BulkLoad.Config = BulkLoad.Config(),
          delim: String = ",", maxFilesPerTrigger: Int = 1,
          sinkOverride: Option[CellSink] = None,
          compactEvery: Int = 0): Seq[BatchResult] = {
    // fix the region boundaries ONCE for the whole run (see scaladoc) —
    // md5-composite keys are uniform in their leading bytes, so the
    // static uniform pre-split is exactly region-aligned
    val fixedCfg =
      if (cfg.saltBuckets.isEmpty && cfg.splits.isEmpty && cfg.regions >= 2)
        cfg.copy(splits = Some(
          graft.operators.RegionSort.uniformMd5Splits(cfg.regions).toSeq))
      else cfg
    val results = scala.collection.mutable.ArrayBuffer.empty[BatchResult]
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inputDir)
    val q = lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t0 = System.nanoTime()
        val (kept, rejected) = Delimited.naiveSplitLines(batch, delim, cfg.arity)
        val r = BulkLoad.fromPositional(kept, rejected, fixedCfg)
        val sink = sinkOverride.getOrElse(r.sink)
        val dest = f"$outDir/batch_$batchId%05d"
        sink.write(r.cells, dest)
        // quarantined rows ride along per batch — same no-silent-drop
        // contract as the batch path
        r.quarantined.write.mode("overwrite").parquet(s"$dest.quarantine")
        sink.postCommit(dest)
        val n = footerCount(spark, dest)
        val completed = results.synchronized {
          results += BatchResult(batchId, dest, n, (System.nanoTime() - t0) / 1e9)
          results.size
        }
        if (compactEvery > 0 && completed % compactEvery == 0)
          graft.sources.CellCompaction.compactMinor(
            spark, outDir, s"$outDir/serving", fixedCfg)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(_.batchId).toSeq
  }
}

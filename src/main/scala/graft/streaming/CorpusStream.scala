package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming corpus dedup: documents arrive as a file stream and every
  * micro-batch is checked against the signature index of everything seen
  * so far ([[Dedup.incrementalMinHashPairs]]), then merged into it — the
  * continuous form of incremental dedup (the reference's batch drivers
  * compose the same way: each dropped fileset is a batch against the
  * already-loaded table).
  *
  * Each batch runs the RELATIONAL signature plan (explode → codegen md5 →
  * map-side min agg) via `foreachBatch`, so the stream reuses the exact
  * batch-optimized dataflow; the growing index holds k longs per seen
  * document (~0.1% of corpus bytes) and is localCheckpoint-materialized
  * per batch so batch t+1 never recomputes batch t's signatures. At
  * cluster scale the index lives in a Delta/parquet table MERGEd per
  * batch and the file source is Kafka; the per-batch plan is unchanged.
  *
  * COMPLETENESS: a near-dup pair is emitted exactly once — in the batch
  * where its LATER member arrives (the earlier member is already indexed;
  * same-batch pairs come from the batch-vs-(index ∪ batch) join). So over
  * any partition of a corpus into batches, in any order, the union of
  * batch outputs equals the one-shot [[Dedup.minHashPairs]] of the whole
  * corpus — which is exactly the declared oracle. Per-batch output
  * directories keep retries idempotent (overwrite, not append).
  */
object CorpusStream {

  /** One completed micro-batch: its id, output path, and pair count. */
  case class BatchResult(batchId: Long, path: String, pairs: Long)

  /** Stream parquet document files from `inputDir` through incremental
    * dedup. Runs until all currently-available input drains; returns the
    * per-batch results. `initialIndex` defaults to empty (cold start). */
  def run(spark: SparkSession, inputDir: String, outDir: String,
          checkpointDir: String, n: Int, minEst: Double,
          initialIndex: Option[DataFrame] = None,
          maxFilesPerTrigger: Int = 1): Seq[BatchResult] = {
    val results = scala.collection.mutable.ArrayBuffer.empty[BatchResult]
    val schema = spark.read.parquet(inputDir).schema
    val emptyIndex = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sig",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    // foreachBatch bodies run serially per stream; the index handoff
    // between batches needs no synchronization beyond the reference
    val index = new java.util.concurrent.atomic.AtomicReference[DataFrame](
      initialIndex.getOrElse(emptyIndex))
    val docs = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema).parquet(inputDir)
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val idx = index.get()
        // ONE signature pass per batch: the pair search reads it from the
        // checkpoint and the same materialization merges into the index
        val sig = Dedup.minHashSignatures(batch, n).localCheckpoint()
        val pairs = Dedup.incrementalMinHashPairsFromSigs(sig, idx, minEst)
        val dest = f"$outDir/batch_$batchId%05d"
        pairs.write.mode("overwrite").parquet(dest)
        index.set(idx.union(sig).localCheckpoint())
        results.synchronized {
          results += BatchResult(batchId, dest, spark.read.parquet(dest).count())
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    results.sortBy(_.batchId).toSeq
  }

  /** Declared-query driver: stage the documents table as two parquet
    * files, stream them through [[run]] from a cold index, and return the
    * union of per-batch pair outputs — value-equal to the one-shot LSH
    * pair search over the whole table. Two micro-batches exercise the
    * cross-batch index handoff with minimal fixed stream overhead; the
    * PipelineSpec test drives the 4-batch form. */
  def dedupIncrementalAll(spark: SparkSession, dir: String,
                          n: Int, minEst: Double): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory("graft-docs-stream").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(2).write.mode("overwrite").parquet(s"$staging/in")
    val batches = run(spark, s"$staging/in", s"$staging/out", s"$staging/ckpt",
      n, minEst)
    batches.map(b => spark.read.parquet(b.path)).reduce(_ unionByName _)
  }
}

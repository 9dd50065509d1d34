package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — one JSON line with per-query wall-clock.
  *
  * Queries are forced through the `noop` sink (full computation of every
  * output column; a bare `count()` would let Catalyst prune most of the
  * work — e.g. the md5 rowkeys are dead code under count). A warmup pass
  * runs first so JIT/codegen compilation is not billed to the first query.
  * Also reports ingest throughput (rows/s) on the reference's 37,791-row
  * CSV when present.
  */
object Bench {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus.toInt)

    // Warmup: JIT, codegen cache, parquet footer reads.
    try force(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }

    // optional args = query-name subset (same contract as graft.Verify)
    val subset = args.toSet
    val picked =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => subset(n) }

    // min of 3 runs, taken as three FULL alternating passes rather than
    // back-to-back: first-run JIT/GC noise dominates single-shot numbers,
    // and a transient machine-load spike poisons adjacent timings — the
    // passes are minutes apart per query, so the min survives it. Round 3's
    // 2-pass min still showed 2-3x ambient artifacts (q21/q22) inside the
    // full pass that vanished in isolated re-runs; a third interleaved
    // sample prices one spike per query out of the min.
    val names = picked.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        force(fn(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best.getOrElse(name, Double.MaxValue)) best(name) = t
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    }
    val results = names.map { case (name, _) => name -> best.getOrElse(name, -1.0) }

    // Ingest throughput: reference CSV → sorted cells (compat parse).
    val refCsv = "/root/reference/src/main/resources/iouzipcodes2011.csv"
    val ingest = if (new java.io.File(refCsv).exists()) {
      val inputRows = spark.read.text(refCsv).count() // throughput basis: input lines
      // best of 3: the queries above take a min over interleaved passes for
      // ambient-noise immunity — a one-shot ingest number deserves the same
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(BulkLoad.csv(spark, refCsv, BulkLoad.Config(compatNaiveSplit = true)).cells)
        (System.nanoTime() - t0) / 1e9
      }.min
      Some(inputRows / secs)
    } else None

    // millisecond precision keeps the JSON line ~40% shorter — the driver
    // captures a bounded stdout tail, and round 1's full-precision line got
    // clipped past parseability (BENCH_r01.json "parsed": null)
    def ms(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val extra = ingest.map(r => s""","ingest_rows_per_sec":${r.round}""").getOrElse("")
    val json =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs$extra,"sf":"$sfDir"}"""
    println(json)
    // belt and braces: also durable on disk next to the repo artifacts
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}

/** Dev CLI: write `explain("formatted")` for declared queries to files —
  * the r18+ optimization-round evidence format (`plans/rNN/<q>_before.txt`
  * / `_after.txt`). Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> [suffix] [query ...]"
  *
  * No query names = all declared queries. `suffix` (default "") is
  * appended to the file name, e.g. `_before` / `_after`. Queries whose
  * CONSTRUCTION runs jobs (store builds, fixpoint loops) do that work
  * here too — the dump is the plan of the returned frame, which is what
  * the bench forces through the noop sink.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: PlanDump <sfDir> <outDir> [_suffix] [query ...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args.take(2)
    val rest = args.drop(2)
    val (suffix, names) =
      if (rest.nonEmpty && rest.head.startsWith("_")) (rest.head, rest.tail.toSet)
      else ("", rest.toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local("graft-plandump", cpus.toInt)
    Files.createDirectories(Paths.get(outDir))
    val picked = SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names(n) }
      .toSeq.sortBy(_._1)
    for ((name, fn) <- picked) {
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), txt)
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}

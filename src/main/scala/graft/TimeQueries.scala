package graft
/** Dev CLI: wall-time named declared queries once at a given sf dir.
  * `sbt "runMain graft.TimeQueries <sfDir> <query> ..."`. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("time", 32)
    val dir = args.head
    for (q <- args.tail) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"TIMER $q ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}

// Interactive optimization probe -- load into spark-shell:
//   /opt/spark/bin/spark-shell --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=true -i tools/probe.scala
// (dev tool; the bench/verify mains remain the artifacts of record)
import org.apache.spark.sql.{DataFrame, SparkSession}

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def force(df: DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

def unpersistAll(): Unit =
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

/** Bench-methodology timing: min of 3 noop-forced passes. */
def time(name: String, passes: Int = 3): Double = {
  val fn = graft.SparkEntry.queries(name)
  val ts = (1 to passes).map { _ =>
    val t0 = System.nanoTime()
    force(fn(spark, sfDir))
    unpersistAll()
    (System.nanoTime() - t0) / 1e9
  }
  println(f"TIME $name%-36s min=${ts.min}%.3f  passes=${ts.map(t => f"$t%.3f").mkString(",")}")
  ts.min
}

def plan(name: String): Unit =
  println(graft.SparkEntry.queries(name)(spark, sfDir)
    .queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

def skeleton(name: String): Unit =
  println(graft.SparkEntry.queries(name)(spark, sfDir)
    .queryExecution.executedPlan.toString.split('\n')
    .filter(l => Seq("Exchange", "Join", "Sort", "Aggregate", "Window", "Scan", "Project")
      .exists(l.contains)).map(_.take(150)).mkString("\n"))

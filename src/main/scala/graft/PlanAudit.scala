package graft

/** Dev CLI: print the exchange/sort/join/window/aggregate skeleton of the
  * physical plan for each named declared query — the per-operator audit
  * loop ("is this the plan I'd want at 100×?") without wading through
  * full explain output. `sbt "runMain graft.PlanAudit <query> ..."`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.ExplainMode
    val spark = GraftSession.local("audit", 4)
    val dir = "/root/testdata/sf0.001"
    for (q <- args) {
      println(s"=== AUDIT $q")
      val p = SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("simple"))
      println(p.split('\n').filter(l => l.contains("Exchange") || l.contains("Sort ") ||
        l.contains("Join") || l.contains("Window") || l.contains("Aggregate"))
        .map(_.trim.take(130)).mkString("\n"))
    }
    spark.stop()
  }
}

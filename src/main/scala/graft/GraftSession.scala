package graft

import org.apache.spark.sql.SparkSession

/** The engine's session factory — the one place that encodes the Spark
  * configuration the library is designed against, so an embedding
  * application gets the same posture the declared queries are verified
  * and benched with.
  *
  * Scale rationale for the defaults (chosen for the 1000-executor /
  * 100 TB deployment, not the local harness):
  *
  *  - **AQE on, skew-join on**: runtime stage re-planning coalesces
  *    shuffle partitions to ACTUAL data sizes and splits skewed join
  *    keys into parallel subtasks — the difference between a stalled
  *    straggler reducer and an even stage at corpus scale. (AQE also
  *    performs runtime exchange reuse, which the multi-consumer dedup
  *    plans rely on.)
  *  - **shuffle partitions are caller-sized**, never hardcoded in a
  *    query: cores locally, 2–3× total executor cores on a cluster.
  *  - **UTC session timezone**: timestamp semantics identical across
  *    engines and clusters (the DuckDB oracle parity depends on it).
  *  - **[[graft.functions.GraftExtensions]] injected**: the native
  *    expressions (`be_int4`, `array_dot`) and the region-aligned sort
  *    planner strategy are available to plain `spark.sql(...)` text the
  *    same way they are to the DataFrame API.
  */
object GraftSession {

  /** Cluster-agnostic builder: master/deploy settings are left to
    * spark-submit; everything the engine NEEDS is set here. */
  def builder(appName: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session for the driver mains (Verify/Bench/CLI): `local[cpus]`
    * with a quiet UI and WARN logs. */
  def local(appName: String, cpus: Int): SparkSession = {
    val s = builder(appName, cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** CLI driver — the `ToolRunner` surface of the reference
  * (BulkImporterFromText.java:164-168, sample_run.sh) re-expressed:
  *
  *   IngestCli <csv|csv-compat|hivetext|avro|rcfile> <input> <output>
  *             [--arity N] [--salt BUCKETS] [--regions N] [--conf FILE]
  *
  * `--conf FILE` merges a `key=value`-per-line properties file into the
  * SparkConf — the reference's `hbase-site.xml` first argument
  * (BulkImporterFromText.java:82-83) generalized. Runs the bulk-load
  * pipeline and prints one JSON stats line (cells, quarantined rows,
  * regions). Plain args, dependency-free. */
object IngestCli {

  private val knownFlags = Set("--arity", "--salt", "--regions", "--conf")

  /** UTF-8 properties file → ordered key/value pairs (standard
    * `java.util.Properties` dialect: comments, blanks, `=`/`:`, escapes). */
  def loadConf(path: String): Seq[(String, String)] = {
    val props = new java.util.Properties()
    val in = new java.io.InputStreamReader(
      new java.io.FileInputStream(path), java.nio.charset.StandardCharsets.UTF_8)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    props.asScala.toSeq.map { case (k, v) => (k.toString, v.toString) }.sortBy(_._1)
  }

  private def usageExit(): Nothing = {
    System.err.println(
      "usage: IngestCli <csv|csv-compat|hivetext|avro|rcfile> <input> <output> " +
        "[--arity N] [--salt BUCKETS] [--regions N] [--conf FILE]")
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) usageExit()
    val Array(format, input, output) = args.take(3)
    val rest = args.drop(3)
    // strict flag parsing: unknown or dangling flags are errors, not noise
    if (rest.length % 2 != 0) usageExit()
    val opts = rest.grouped(2).map { case Array(k, v) =>
      if (!knownFlags.contains(k)) {
        System.err.println(s"unknown option: $k")
        usageExit()
      }
      k -> v
    }.toMap
    val base = BulkLoad.Config(
      arity = opts.get("--arity").map(_.toInt).getOrElse(9),
      regions = opts.get("--regions").map(_.toInt).getOrElse(10),
      saltBuckets = opts.get("--salt").map(_.toInt))

    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // S5 config source: merge the properties file into the SparkConf
    opts.get("--conf").foreach(f =>
      loadConf(f).foreach { case (k, v) => builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val r = format match {
        case "csv"        => BulkLoad.csv(spark, input, base)
        case "csv-compat" => BulkLoad.csv(spark, input, base.copy(compatNaiveSplit = true))
        case "hivetext"   => BulkLoad.hiveText(spark, input, base)
        case "avro"       => BulkLoad.avro(spark, input, base.copy(qualifiers = BulkLoad.NameQualifiers))
        case "rcfile"     => BulkLoad.rcFile(spark, input, base)
        case other =>
          System.err.println(s"unknown format: $other"); sys.exit(2)
      }
      val t0 = System.nanoTime()
      r.sink.write(r.cells, output)
      r.sink.postCommit(output)
      val secs = (System.nanoTime() - t0) / 1e9
      val cells = spark.read.parquet(output).count()
      val quarantined = r.quarantined.count()
      println(s"""{"format":"$format","cells":$cells,"quarantined":$quarantined,""" +
        s""""regions":${base.regions},"write_sec":$secs}""")
    } finally spark.stop()
  }
}

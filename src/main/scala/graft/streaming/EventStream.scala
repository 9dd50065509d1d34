package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming surface: the engine's stream path for the `events`
  * table (`readStream` → watermark → tumbling-window agg → sink).
  *
  * The reference is strictly batch (`job.waitForCompletion`), so this is a
  * north-star extension: the same declarative aggregation as the batch
  * path, run incrementally. At scale the file source is swapped for Kafka;
  * the plan (watermark + windowed partial aggs + state store) is identical.
  *
  * For deterministic testing the query drains a finite parquet directory
  * through a memory sink in `complete` mode (append would hold back the
  * final windows until a watermark beyond them arrives — which never
  * happens on a finite source).
  */
object EventStream {

  private val counter = new AtomicInteger()

  /** Tumbling 1-hour windows per event_type: (window_start, event_type, n,
    * sum_value). Runs the stream to completion and returns the result. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // events.ts is TIMESTAMP(NANOS): stream it as long, convert to micros
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // file-stream source wants a directory: stream the sf dir, globbed
    // down to the events table
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Stateful sessionization: groups each user's events into sessions
    * split on > `gapMinutes` inactivity, via flatMapGroupsWithState-style
    * semantics expressed with window functions on the batch table (the
    * declarative form; the incremental form plugs the same logic into
    * `KeyValueGroupedDataset.flatMapGroupsWithState`). Output:
    * (user_id, session_id, n_events, session_start). */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = graft.queries.Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60_000_000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
  }
}

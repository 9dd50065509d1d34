package graft.sources

import graft.operators.RegionSort
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HBase-SCAN analog over a staged cell directory: a row-range read that
  * touches only the region files that can contain the range, the way a
  * region server's scan touches only the regions [startRow, stopRow)
  * spans (reference context: the staged HFiles the bulk load adopts are
  * exactly these files — `LoadIncrementalHFiles` at
  * BulkImporterFromText.java:129-130 assigns file i to region i).
  *
  * Why this exists: the golden layout guarantees file i ⊆ region i with
  * rows in unsigned (row, family, qualifier) order, but Spark's parquet
  * source does NOT push binary-column comparisons down to the scan
  * (BinaryType predicates are unsupported parquet filters), so a naive
  * `read.parquet(dir).where(row between …)` opens EVERY region file and
  * filters row-by-row. At 100 TB / 100k regions that is the difference
  * between a point lookup and a full table scan. Here the footer min/max
  * statistics of the `row` column — metadata, a few KB per file, read
  * once on the driver exactly like a region-location lookup against
  * META — prune whole files BEFORE Spark plans the scan; the residual
  * range filter (Spark's binary ordering is the same unsigned
  * lexicographic order the layout sorts by — RegionSort.scala:17) then
  * trims the boundary files inside codegen.
  *
  * Files without usable `row` stats are conservatively kept — pruning is
  * an optimization, never a correctness gate. */
object CellScan {

  /** [startRow, stopRow) range scan; None = unbounded on that side. */
  def scanRange(spark: SparkSession, dir: String,
                startRow: Option[Array[Byte]],
                stopRow: Option[Array[Byte]]): DataFrame = {
    val all = partFiles(spark, dir)
    val kept = all.filter { f =>
      rowStats(spark, f) match {
        case Some((lo, hi)) =>
          // keep iff [lo, hi] intersects [start, stop)
          startRow.forall(s => RegionSort.unsignedBytes.compare(hi, s) >= 0) &&
            stopRow.forall(e => RegionSort.unsignedBytes.compare(lo, e) < 0)
        case None => true // no stats → cannot prune safely
      }
    }
    val base =
      if (kept.isEmpty)
        spark.read.schema(graft.operators.CellOps.cellSchema).parquet(dir)
          .where(lit(false))
      else spark.read.parquet(kept: _*)
    val fromStart = startRow.map(s => col("row") >= lit(s)).getOrElse(lit(true))
    val toStop = stopRow.map(e => col("row") < lit(e)).getOrElse(lit(true))
    base.where(fromStart && toStop)
  }

  /** Prefix scan: all rows whose key starts with `prefix` — the
    * [prefix, prefix+1) range (HBase `PrefixFilter` + scan-range setup). */
  def scanPrefix(spark: SparkSession, dir: String,
                 prefix: Array[Byte]): DataFrame =
    scanRange(spark, dir, Some(prefix), nextPrefix(prefix))

  /** Smallest key strictly greater than every key with this prefix:
    * increment the last non-0xff byte, dropping the tail (all-0xff →
    * unbounded). */
  private[graft] def nextPrefix(prefix: Array[Byte]): Option[Array[Byte]] = {
    val p = prefix.clone()
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xff.toByte) i -= 1
    if (i < 0) None else { p(i) = (p(i) + 1).toByte; Some(p.take(i + 1)) }
  }

  private def partFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map(_.getPath.toString)
  }

  /** Unsigned min/max of the `row` column across a file's row groups,
    * from the parquet footer only (no data pages read). None when any
    * row group lacks exact stats. */
  private[sources] def rowStats(spark: SparkSession,
                                file: String): Option[(Array[Byte], Array[Byte])] = {
    val in = HadoopInputFile.fromPath(new Path(file),
      spark.sessionState.newHadoopConf())
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      if (blocks.isEmpty) return Some((Array.empty, Array.empty))
      var lo: Array[Byte] = null
      var hi: Array[Byte] = null
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        val colMeta = b.getColumns.stream()
          .filter(c => c.getPath.toDotString == "row").findFirst()
        if (!colMeta.isPresent) return None
        val st = colMeta.get().getStatistics
        if (st == null || !st.hasNonNullValue) return None
        val mn = st.getMinBytes
        val mx = st.getMaxBytes
        if (lo == null || RegionSort.unsignedBytes.compare(mn, lo) < 0) lo = mn
        if (hi == null || RegionSort.unsignedBytes.compare(mx, hi) > 0) hi = mx
      }
      Some((lo, hi))
    } finally reader.close()
  }
}

package graft.sources

import graft.operators.RegionSort
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Region-boundary manifest for a staged cell directory — the engine's
  * analog of HBase's META region index (the `RegionLocator` lookup the
  * reference's bulk load performs once per job,
  * BulkImporterFromText.java:105-111): ONE small driver-readable file
  * recording each region file's unsigned min/max row key.
  *
  * Why: [[CellScan.scanRange]] prunes region files by footer min/max
  * statistics. Correct — but at 100 TB / 100k region files, opening every
  * footer sequentially on the driver turns a point SCAN into minutes of
  * metadata latency. A region server never does that: it consults META,
  * written once at region creation. Same move here — the SINK pays one
  * distributed footer-stat pass at write time (executors each open a
  * handful of footers — metadata pages only, no data read) and persists
  * the boundaries; every subsequent scan reads one file.
  *
  * Format (`_graft_region_manifest.tsv`): one `name<TAB>loHex<TAB>hiHex`
  * line per part file, `-` for a file without usable stats (kept
  * conservatively by readers). The leading underscore keeps the file
  * invisible to Spark's parquet source, so `spark.read.parquet(dir)`
  * over the staged layout is unchanged.
  *
  * Trust contract: the manifest is advisory metadata maintained by the
  * sink that wrote the directory. Readers intersect it with the live
  * file listing — a part file missing from the manifest is kept
  * unpruned, and stale manifest entries for deleted files are ignored —
  * so a manually modified directory degrades to weaker pruning, never to
  * wrong results. */
object CellManifest {

  val FileName = "_graft_region_manifest.tsv"

  /** Compute per-file row bounds for every `part-*.parquet` under `dir`
    * and persist the manifest. Footer stats are gathered on EXECUTORS
    * (parallelize over file paths), so sink-time cost is
    * files/parallelism footer opens per task — O(seconds) even at 100k
    * regions — and the driver only writes the collected ~50 B/file TSV. */
  def write(spark: SparkSession, dir: String): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(hc)
    val files = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
    // Hadoop Configuration is not serializable; ship the entries and
    // rebuild per task (fs.defaultFS + credentials travel with it).
    val confEntries = hc.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    val stats: Seq[(String, Option[(Array[Byte], Array[Byte])])] =
      if (files.isEmpty) Seq.empty
      // small layouts (a streaming micro-batch's handful of region files):
      // driver-side footer reads beat a Spark job's scheduling latency —
      // the distributed pass is for the 100k-region bulk sink
      else if (files.size <= 32)
        files.map(f => (new Path(f).getName, footerRowStats(f, hc)))
      else spark.sparkContext
        .parallelize(files, math.min(files.size,
          math.max(1, spark.sparkContext.defaultParallelism * 2)))
        .map { f =>
          val conf = new Configuration(false)
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          (new Path(f).getName, footerRowStats(f, conf))
        }
        .collect().toSeq.sortBy(_._1)
    val body = stats.map {
      case (name, Some((lo, hi))) => s"$name\t${toHex(lo)}\t${toHex(hi)}"
      case (name, None) => s"$name\t-\t-"
    }.mkString("", "\n", "\n")
    val out = fs.create(new Path(p, FileName), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Parse the manifest if present: part-file name → bounds (None =
    * recorded as stat-less, keep conservatively). Returns None when the
    * directory carries no manifest — callers fall back to footer reads. */
  def read(spark: SparkSession, dir: String)
      : Option[Map[String, Option[(Array[Byte], Array[Byte])]]] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    Some(text.split('\n').iterator.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(name, "-", "-") => name -> None
        case Array(name, lo, hi) => name -> Some((fromHex(lo), fromHex(hi)))
        case other => other.head -> None // malformed line → conservative
      }
    }.toMap)
  }

  /** Unsigned min/max of the `row` column across a file's row groups,
    * from the parquet footer only (no data pages read). None when any
    * row group lacks exact stats. Standalone-Configuration variant of
    * [[CellScan.rowStats]] so it runs inside executor tasks. */
  private[graft] def footerRowStats(file: String, conf: Configuration)
      : Option[(Array[Byte], Array[Byte])] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
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

  private val HexChars = "0123456789ABCDEF".toCharArray

  private[graft] def toHex(b: Array[Byte]): String =
    if (b.isEmpty) "0x" // sentinel: empty byte array (never a valid hex body)
    else {
      val sb = new java.lang.StringBuilder(b.length * 2)
      b.foreach { x =>
        sb.append(HexChars((x >> 4) & 0xf)); sb.append(HexChars(x & 0xf))
      }
      sb.toString
    }

  private[graft] def fromHex(s: String): Array[Byte] =
    if (s == "0x") Array.empty
    else {
      val out = new Array[Byte](s.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((Character.digit(s.charAt(2 * i), 16) << 4) |
          Character.digit(s.charAt(2 * i + 1), 16)).toByte
        i += 1
      }
      out
    }
}

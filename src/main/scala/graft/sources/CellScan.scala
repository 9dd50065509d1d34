package graft.sources

import graft.operators.RegionSort
import org.apache.hadoop.fs.Path
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
  * an optimization, never a correctness gate.
  *
  * Boundary metadata, in preference order:
  *  1. the sink-written [[CellManifest]] (`_graft_region_manifest.tsv`) —
  *     ONE small file read, the META-lookup analog; at 100k regions this
  *     is the only shape that keeps a point scan a point scan;
  *  2. per-file footer min/max read on the driver — correct fallback for
  *     directories written before the manifest existed;
  *  3. no flat `part-*.parquet` layout at all (nested/partitioned
  *     parquet) → an unpruned `spark.read.parquet(dir)` with the residual
  *     range filter: pruning silently disabled, results still right. */
object CellScan {

  /** Driver-side footer opens performed by this object — observable so
    * tests can pin "manifest present ⇒ zero footer reads". */
  val footerOpens = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Region files kept by the most recent [[scanRange]] prune (-1 before
    * any scan; flat-layout scans only) — observable so tests can pin the
    * pruning itself, independent of how Spark packs files into splits. */
  val lastKeptFiles = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Point GET — the HBase `Get` analog: exactly the cells of one row
    * key. The stop bound is the key's immediate unsigned successor
    * (`row ++ 0x00`: longer array, equal prefix, sorts directly after),
    * so the range [row, row+0x00) holds precisely `row` and the scan
    * touches ONE region file when a manifest (or footer stats) is
    * present — the serving-side read the whole bulk-load pipeline
    * exists to make cheap. */
  def get(spark: SparkSession, dir: String, row: Array[Byte]): DataFrame =
    scanRange(spark, dir, Some(row), Some(row :+ 0x00.toByte))

  /** [startRow, stopRow) range scan; None = unbounded on that side. */
  def scanRange(spark: SparkSession, dir: String,
                startRow: Option[Array[Byte]],
                stopRow: Option[Array[Byte]]): DataFrame = {
    val fromStart = startRow.map(s => col("row") >= lit(s)).getOrElse(lit(true))
    val toStop = stopRow.map(e => col("row") < lit(e)).getOrElse(lit(true))
    val all = partFiles(spark, dir)
    if (all.isEmpty)
      // Not the flat staged layout this scanner understands (nested or
      // hive-partitioned parquet): pruning is an optimization, never a
      // correctness gate — read everything, filter in codegen.
      return spark.read.parquet(dir).where(fromStart && toStop)
    val manifest = CellManifest.read(spark, dir)
    def bounds(f: String, liveLen: Long): Option[(Array[Byte], Array[Byte])] =
      manifest match {
        // manifest is authoritative when present AND the recorded length
        // matches the live file (or is unknown — legacy format); a length
        // MISMATCH means the file was rewritten in place under the same
        // name, so its recorded bounds may be stale — re-stat from the
        // live footer rather than risk pruning a file that now matches.
        // A file the manifest does not list (externally added) is kept
        // conservatively; stale entries for deleted files are never
        // consulted.
        case Some(m) => m.get(new Path(f).getName) match {
          case Some(e) if e.length < 0 || e.length == liveLen => e.bounds
          case Some(_) => rowStats(spark, f) // in-place rewrite detected
          case None => None
        }
        case None => rowStats(spark, f)
      }
    val kept = all.collect { case (f, liveLen) if (
      bounds(f, liveLen) match {
        case Some((lo, hi)) =>
          // keep iff [lo, hi] intersects [start, stop)
          startRow.forall(s => RegionSort.unsignedBytes.compare(hi, s) >= 0) &&
            stopRow.forall(e => RegionSort.unsignedBytes.compare(lo, e) < 0)
        case None => true // no stats → cannot prune safely
      }) => f
    }
    lastKeptFiles.set(kept.size.toLong)
    val base =
      if (kept.isEmpty)
        spark.read.schema(graft.operators.CellOps.cellSchema).parquet(dir)
          .where(lit(false))
      else spark.read.parquet(kept: _*)
    base.where(fromStart && toStop)
  }

  /** Prefix scan: all rows whose key starts with `prefix` — the
    * [prefix, prefix+1) range (HBase `PrefixFilter` + scan-range setup). */
  def scanPrefix(spark: SparkSession, dir: String,
                 prefix: Array[Byte]): DataFrame =
    scanRange(spark, dir, Some(prefix), nextPrefix(prefix))

  /** MULTI-GET — the HBase batched-`Get` analog (`Table.get(List<Get>)`):
    * the cells of exactly the given row keys. Region routing is the
    * manifest lookup a region-server client performs against META: each
    * key maps to the region files whose [lo, hi] bounds contain it, so
    * the scan opens ONLY the touched regions — K keys read ≤ K files no
    * matter how many regions exist — and the residual key-set equality
    * runs in codegen inside those files. Keys are driver-held by
    * definition (a Get client knows what it is fetching); a KEY SET too
    * large to hold on the driver is a join, not a multi-get — use an
    * equi-join against the staged table instead. Files without usable
    * bounds are kept conservatively; an empty key set returns the empty
    * frame with the cell schema. */
  def multiGet(spark: SparkSession, dir: String,
               keys: Seq[Array[Byte]]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    if (keys.isEmpty)
      return spark.read.schema(graft.operators.CellOps.cellSchema)
        .parquet(dir).where(lit(false))
    val inSet = keys.map(k => col("row") === lit(k)).reduce(_ || _)
    val all = partFiles(spark, dir)
    if (all.isEmpty) return spark.read.parquet(dir).where(inSet)
    val manifest = CellManifest.read(spark, dir)
    def bounds(f: String, liveLen: Long): Option[(Array[Byte], Array[Byte])] =
      manifest match {
        case Some(m) => m.get(new Path(f).getName) match {
          case Some(e) if e.length < 0 || e.length == liveLen => e.bounds
          case Some(_) => rowStats(spark, f) // in-place rewrite detected
          case None => None
        }
        case None => rowStats(spark, f)
      }
    val kept = all.collect { case (f, liveLen) if (
      bounds(f, liveLen) match {
        case Some((lo, hi)) => keys.exists(k =>
          RegionSort.unsignedBytes.compare(k, lo) >= 0 &&
            RegionSort.unsignedBytes.compare(k, hi) <= 0)
        case None => true // no stats → cannot prune safely
      }) => f
    }
    lastKeptFiles.set(kept.size.toLong)
    val base =
      if (kept.isEmpty)
        spark.read.schema(graft.operators.CellOps.cellSchema).parquet(dir)
          .where(lit(false))
      else spark.read.parquet(kept: _*)
    base.where(inSet)
  }

  /** Smallest key strictly greater than every key with this prefix:
    * increment the last non-0xff byte, dropping the tail (all-0xff →
    * unbounded). */
  private[graft] def nextPrefix(prefix: Array[Byte]): Option[Array[Byte]] = {
    val p = prefix.clone()
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xff.toByte) i -= 1
    if (i < 0) None else { p(i) = (p(i) + 1).toByte; Some(p.take(i + 1)) }
  }

  /** EXACT row count of a staged cell directory from METADATA only —
    * no data pages read, no Spark job: live part files × (manifest
    * `rows` when the entry is FRESH — recorded length matches the live
    * file — else one footer open for the file's record count). The trust
    * rules are [[scanRange]]'s exactly: an unlisted or in-place-rewritten
    * file falls back to its own footer, a deleted file's stale entry is
    * never consulted, so the count always describes the LIVE fileset.
    * None for layouts this scanner doesn't understand (nested /
    * hive-partitioned) — the caller scans instead. At 100 TB this is the
    * difference between a `SELECT count(*)` that reads every region file
    * and one answered from ~100k manifest lines. */
  def countRows(spark: SparkSession, dir: String): Option[Long] =
    metaStats(spark, dir).map(_._1)

  /** EXACT global MIN/MAX of the `row` key from the same metadata walk:
    * fold of per-file [lo, hi] bounds (manifest when fresh, footer
    * statistics otherwise). None when any live file lacks usable bounds
    * — like the scan's pruning, metadata answers are an optimization,
    * never a correctness gamble. Empty tables have no min/max → None
    * (the caller's ordinary aggregate returns SQL NULL from a scan). */
  def rowBoundsExact(spark: SparkSession, dir: String)
      : Option[(Array[Byte], Array[Byte])] =
    metaStats(spark, dir).filter(_._1 > 0).flatMap(_._2)

  /** EXACT row count of the [startRow, stopRow) key range: region files
    * FULLY inside the range contribute their metadata row count (no data
    * read), files that straddle a boundary — or carry no usable bounds —
    * are scanned with the residual range filter, and files outside
    * contribute nothing. At 100k regions a point/range count is a
    * manifest sum plus a scan of at most the two boundary files, instead
    * of counting every row in range. None for layouts this scanner
    * doesn't understand. */
  def countRowsInRange(spark: SparkSession, dir: String,
                       startRow: Option[Array[Byte]],
                       stopRow: Option[Array[Byte]]): Option[Long] = {
    val all = partFiles(spark, dir)
    if (all.isEmpty) return None
    val manifest = CellManifest.read(spark, dir)
    val hc = spark.sessionState.newHadoopConf()
    val cmp = RegionSort.unsignedBytes
    var contained = 0L
    val straddling = scala.collection.mutable.ArrayBuffer.empty[String]
    all.foreach { case (f, liveLen) =>
      val (rows, bounds) = manifest.flatMap(_.get(new Path(f).getName))
        .collect { case e if (e.length < 0 || e.length == liveLen) && e.rows >= 0 =>
          (e.rows, e.bounds) }
        .getOrElse { footerOpens.incrementAndGet(); CellManifest.footerStats(f, hc) }
      bounds match {
        case _ if rows == 0L => () // nothing to count either way
        case Some((lo, hi))
          if startRow.exists(s => cmp.compare(hi, s) < 0) ||
             stopRow.exists(e => cmp.compare(lo, e) >= 0) => () // outside
        case Some((lo, hi))
          if startRow.forall(s => cmp.compare(lo, s) >= 0) &&
             stopRow.forall(e => cmp.compare(hi, e) < 0) => contained += rows
        case _ => straddling += f // boundary file, or no usable bounds
      }
    }
    val boundary =
      if (straddling.isEmpty) 0L
      else {
        val fromStart = startRow.map(s => col("row") >= lit(s)).getOrElse(lit(true))
        val toStop = stopRow.map(e => col("row") < lit(e)).getOrElse(lit(true))
        spark.read.parquet(straddling.toSeq: _*).where(fromStart && toStop).count()
      }
    Some(contained + boundary)
  }

  /** One metadata walk: (total rows, folded [lo, hi] bounds — None when
    * any file lacks them). Manifest entries are trusted under
    * [[scanRange]]'s freshness rule; everything else opens one footer. */
  private[sources] def metaStats(spark: SparkSession, dir: String)
      : Option[(Long, Option[(Array[Byte], Array[Byte])])] = {
    val all = partFiles(spark, dir)
    if (all.isEmpty) None
    else {
      val manifest = CellManifest.read(spark, dir)
      val hc = spark.sessionState.newHadoopConf()
      val cmp = RegionSort.unsignedBytes
      val perFile = all.map { case (f, liveLen) =>
        manifest.flatMap(_.get(new Path(f).getName))
          .collect { case e if (e.length < 0 || e.length == liveLen) && e.rows >= 0 =>
            (e.rows, e.bounds) }
          .getOrElse { footerOpens.incrementAndGet(); CellManifest.footerStats(f, hc) }
      }
      val total = perFile.map(_._1).sum
      val bounds = perFile.filter(_._1 > 0).map(_._2) match {
        case bs if bs.nonEmpty && bs.forall(_.isDefined) =>
          val known = bs.flatten
          val ord = scala.math.Ordering.comparatorToOrdering(cmp)
          Some((known.map(_._1).min(ord), known.map(_._2).max(ord)))
        case _ => None
      }
      Some((total, bounds))
    }
  }

  /** (path, live byte length) of the flat region files — the length
    * rides along so the manifest's recorded length can be validated
    * without a second listing. */
  private def partFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Unsigned min/max of the `row` column across a file's row groups,
    * from the parquet footer only (no data pages read). None when any
    * row group lacks exact stats. */
  private[sources] def rowStats(spark: SparkSession,
                                file: String): Option[(Array[Byte], Array[Byte])] = {
    footerOpens.incrementAndGet()
    CellManifest.footerRowStats(file, spark.sessionState.newHadoopConf())
  }
}

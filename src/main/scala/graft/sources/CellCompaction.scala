package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Region-file COMPACTION for the serving layout — the HBase minor/major
  * compaction analog. Streaming ingest ([[graft.streaming.StreamingIngest]])
  * lands one region-aligned fileset per micro-batch (`batch_00000/`,
  * `batch_00001/`, …): correct, exactly-once, but a long-running feed
  * accumulates small region files whose COUNT — not size — drives scan
  * cost even with the manifest (every scan intersecting a key range opens
  * one file per batch per region). A region server solves this with
  * background compaction: merge the accumulated store files into one file
  * per region, atomically swap, and serving cost returns to O(regions).
  *
  * Same move here, one declarative plan: read every batch fileset under
  * `root`, re-run the SAME region-aligned total-order sort the batch sink
  * uses (`BulkLoad.sorted` — exact split alignment under salt/splits, so
  * the compacted layout obeys the identical file-i-⊆-region-i contract),
  * land it at `dest` with a fresh manifest, and (optionally) retire the
  * input batch dirs. Cell content is the IDENTITY — compaction moves
  * bytes, never changes them (oracle-checked by `cells_compact_regions`).
  *
  * Scale shape: ONE total-order exchange over the union of batch files —
  * the same cost one big batch would have paid, amortized to whenever the
  * operator runs; the scan side is a plain multi-path parquet read
  * (splittable, no driver materialization), and the manifest refresh
  * stats only the regions-count output files. Version-resolution
  * compaction (TTL / max-versions / tombstones) is deliberately NOT fused
  * here — that is [[graft.operators.CellOps.compactVersions]] /
  * `compactWithTombstones`, composable upstream of the sort when a purge
  * is wanted; this operator is the LAYOUT compaction. */
object CellCompaction {

  /** Directories named exactly `batch_<digits>` under `root`, sorted by
    * batch id (`batch_00003.quarantine` siblings are NOT cell filesets
    * and must never be swept into a compaction). */
  def batchDirs(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("batch_\\d+"))
      .map(_.getPath.toString).sorted
  }

  /** Merge the per-micro-batch filesets under `root` into ONE
    * region-aligned fileset at `dest` (fresh manifest included — the
    * sink writes it). `cfg` must carry the SAME salt/splits the batches
    * were written with (the boundaries of a live table don't move
    * between batches — [[graft.streaming.StreamingIngest]] fixes them
    * once per run for exactly this reason). When `retireInputs`, the
    * input batch dirs are deleted AFTER the compacted fileset (and its
    * manifest) are fully landed — the crash window leaves duplicates
    * visible to a root-level reader, never missing data; production
    * wraps the swap in whatever atomic-rename / catalog-pointer move
    * the serving layer uses, exactly like HBase swaps store files.
    * Returns the number of batch filesets compacted. */
  def compactBatches(spark: SparkSession, root: String, dest: String,
                     cfg: graft.BulkLoad.Config,
                     retireInputs: Boolean = false): Int = {
    val dirs = batchDirs(spark, root)
    if (dirs.isEmpty) return 0
    val cells = spark.read.schema(graft.operators.CellOps.cellSchema)
      .parquet(dirs: _*)
    graft.SortedParquetCellSink.write(graft.BulkLoad.sorted(cells, cfg), dest)
    if (retireInputs) {
      val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
      dirs.foreach(d => fs.delete(new Path(d), true))
    }
    dirs.size
  }

  /** MINOR compaction — the tiered counterpart of [[compactBatches]]:
    * absorb the CURRENT batch filesets into an existing (or new) serving
    * directory `dest` as ONE additional region-aligned fileset, refresh
    * `dest`'s manifest INCREMENTALLY ([[CellManifest.update]] — footer
    * stats only for the moved-in files, existing entries kept verbatim),
    * and retire the inputs. `dest` accumulates one fileset per minor
    * round; scans stay manifest-pruned throughout (files from different
    * rounds may overlap in key range — the manifest prunes per FILE, so
    * a bounded range touches intersecting files from each round, which
    * is exactly HBase's multi-store-file read). Run [[compactMajor]]
    * when the per-region file count warrants one file per region again.
    * Crash window (files landed, inputs not yet deleted) leaves
    * duplicates visible to a ROOT-level reader, never missing data —
    * production wraps the retire in the serving layer's pointer swap.
    * Returns the number of batch filesets absorbed. */
  def compactMinor(spark: SparkSession, root: String, dest: String,
                   cfg: graft.BulkLoad.Config): Int = {
    val dirs = batchDirs(spark, root)
    if (dirs.isEmpty) return 0
    val hc = spark.sessionState.newHadoopConf()
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(hc)
    fs.mkdirs(destPath)
    val cells = spark.read.schema(graft.operators.CellOps.cellSchema)
      .parquet(dirs: _*)
    // land the merged fileset beside dest, then move the part files in
    // under round-unique names (still part-*.parquet — the flat-layout
    // contract every scanner filters on)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(destPath.getParent, s"_minor_tmp_$stamp")
    graft.BulkLoad.sorted(cells, cfg)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.foreach { case (s, i) =>
        fs.rename(s.getPath, new Path(destPath, f"part-$stamp-$i%05d.parquet"))
      }
    fs.delete(tmp, true)
    CellManifest.update(spark, dest)
    dirs.foreach(d => fs.delete(new Path(d), true))
    dirs.size
  }

  /** MAJOR compaction IN PLACE: rewrite `dir`'s accumulated filesets as
    * exactly one file per region (fresh full manifest — region-count
    * lines, trivially cheap). The rewrite lands under a temp sibling
    * first; the old part files are removed only after the new fileset is
    * fully written (crash window = duplicates, never loss — same
    * contract as [[compactMinor]]'s retire). */
  def compactMajor(spark: SparkSession, dir: String,
                   cfg: graft.BulkLoad.Config): Unit = {
    val hc = spark.sessionState.newHadoopConf()
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hc)
    val oldParts = fs.listStatus(dirPath)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    if (oldParts.isEmpty) return
    val cells = spark.read.schema(graft.operators.CellOps.cellSchema)
      .parquet(dir)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(dirPath.getParent, s"_major_tmp_$stamp")
    graft.BulkLoad.sorted(cells, cfg)
      .write.mode("overwrite").parquet(tmp.toString)
    oldParts.foreach(p => fs.delete(p, false))
    fs.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.foreach { case (s, i) =>
        fs.rename(s.getPath, new Path(dirPath, f"part-$stamp-$i%05d.parquet"))
      }
    fs.delete(tmp, true)
    CellManifest.write(spark, dir)
  }
}

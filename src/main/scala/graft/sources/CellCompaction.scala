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

  /** Directories named `batch_*` under `root`, sorted by batch id. */
  def batchDirs(spark: SparkSession, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
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
}

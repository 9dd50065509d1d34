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
    *
    * IDEMPOTENT PER BATCH ID: `dest/_absorbed` records the batch-dir
    * NAME plus a CONTENT FINGERPRINT (md5 over the fileset's sorted
    * per-file length/rowCount/row-key-bound tuples — name-independent,
    * since a deterministic replay re-lands the same bytes under fresh
    * task-attempt file names; see [[fingerprint]]) of each recently
    * absorbed batch. A batch dir whose name AND fingerprint
    * match a ledger entry is a STREAMING REPLAY (a crash after the sweep
    * but before the checkpoint commit re-runs foreachBatch for the same
    * batch id, which deterministically recreates the same fileset) — it
    * is retired WITHOUT re-absorbing, so a replayed micro-batch can never
    * permanently duplicate cells in the serving layout. A name match with
    * a DIFFERENT fingerprint is NOT a replay (a checkpoint reset with new
    * data, or a second stream root compacting into the same dest) and
    * FAILS LOUDLY rather than silently deleting new data. The residual
    * crash window (fileset installed, ledger not yet rewritten) degrades
    * to the transient duplicate contract above, never to loss: the
    * ledger lands (atomically — temp sibling + rename, with a tmp-file
    * recovery path on read) before the inputs are deleted.
    *
    * BOUNDED LEDGER: only entries for batch ids ≥ the newest absorbed id
    * are retained. Structured Streaming commits batch N's checkpoint
    * before producing batch N+1, so once a newer id has been absorbed an
    * older id can never legitimately replay — sweep cost is therefore
    * independent of how many batches the stream has ever produced.
    * Resetting a checkpoint against a live dest is outside this
    * contract: a re-landed old id re-absorbs (duplicates) or, with
    * different content at a retained id, fails loudly — use a fresh dest.
    * Returns the number of batch filesets absorbed (replays excluded). */
  def compactMinor(spark: SparkSession, root: String, dest: String,
                   cfg: graft.BulkLoad.Config): Int = {
    val all = batchDirs(spark, root)
    if (all.isEmpty) return 0
    val hc = spark.sessionState.newHadoopConf()
    val destPath = new Path(dest)
    val fs = destPath.getFileSystem(hc)
    fs.mkdirs(destPath)
    val ledger = new Path(destPath, AbsorbedLedger)
    val absorbed = readLedger(fs, ledger)
    val (replayed, dirs) = all.partition(d => absorbed.contains(new Path(d).getName))
    replayed.foreach { d =>
      val dp = new Path(d)
      val recorded = absorbed(dp.getName)
      // three generations of ledger entries:
      //  - name-only ("")     — predate fingerprints; retire on name alone
      //  - bare hex           — written by earlier fingerprint FORMATS
      //    (lengths-only, or unversioned tuples); indistinguishable from
      //    each other, so a mismatch against today's format proves
      //    nothing — retire on name with a warning (the pre-upgrade
      //    guarantee), never wedge the sweep on a format change
      //  - "v2:"-prefixed     — today's content fingerprint; a mismatch
      //    here IS new data under a reused batch id: fail loudly
      if (recorded.startsWith(FingerprintVersion)) {
        val found = fingerprint(fs, dp)
        if (found != recorded)
          throw new IllegalStateException(
            s"batch dir ${dp.getName} carries an already-absorbed batch id but " +
              s"DIFFERENT content (ledger fingerprint $recorded, found $found) — " +
              "not a streaming replay (checkpoint reset with new data, or a " +
              "second stream compacting into this dest?). Refusing to retire it; " +
              "compact into a fresh dest.")
      } else if (recorded.nonEmpty) {
        // bare-hex entry: written either by the immediately prior release
        // (the SAME md5 tuple body as today's fingerprint, just without
        // the version prefix) or by the older lengths-only format. The
        // prior-release case is directly VERIFIABLE — compare against
        // today's fingerprint with the prefix stripped: a match PROVES
        // the replay and retires silently with the full content
        // guarantee (pre-fix, every bare-hex entry skipped verification
        // outright). A mismatch proves nothing on its own — it is either
        // the lengths-only era (true replay, different formula) or new
        // data under a reused id — so it keeps the pre-upgrade
        // warn-and-retire-on-name behavior rather than wedging every
        // lengths-only upgrade; the warning now names the reset risk.
        val found = fingerprint(fs, dp).stripPrefix(FingerprintVersion)
        if (found != recorded)
          System.err.println(s"[graft] compactMinor: ledger entry for " +
            s"${dp.getName} carries a pre-versioned fingerprint that does not " +
            "match today's format (lengths-only era, or new data under a " +
            "reused batch id); retiring the replay on batch id alone — if " +
            "this followed a checkpoint reset with new data, use a fresh dest")
      }
      fs.delete(dp, true)
    }
    if (dirs.isEmpty) return 0
    // fingerprint the inputs BEFORE they move (they are deleted below)
    val newEntries = dirs.map(d => new Path(d).getName -> fingerprint(fs, new Path(d)))
    val cells = spark.read.schema(graft.operators.CellOps.cellSchema)
      .parquet(dirs: _*)
    // land the merged fileset beside dest, then move the part files in
    // under round-unique names (still part-*.parquet — the flat-layout
    // contract every scanner filters on)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(destPath.getParent, s"_minor_tmp_$stamp")
    graft.BulkLoad.sorted(cells, cfg)
      .write.mode("overwrite").parquet(tmp.toString)
    installParts(fs, tmp, destPath, stamp)
    CellManifest.update(spark, dest)
    val newestId = newEntries.map(e => batchId(e._1)).max
    writeLedger(fs, ledger,
      (absorbed ++ newEntries).filter { case (n, _) => batchId(n) >= newestId })
    dirs.foreach(d => fs.delete(new Path(d), true))
    dirs.size
  }

  /** The absorbed-batch ledger's file name under a minor-compaction
    * serving dir (not `part-*` — every scanner's flat-layout filter
    * ignores it). */
  val AbsorbedLedger = "_absorbed"

  private def batchId(name: String): Long =
    name.stripPrefix("batch_").toLong

  /** Content fingerprint of a landed batch fileset: md5 over the SORTED
    * per-file (length, rowCount, loKeyHex, hiKeyHex) tuples — names
    * excluded (a deterministic foreachBatch replay recreates identical
    * bytes under fresh task-attempt UUID names). Lengths alone are NOT
    * enough: a checkpoint-reset batch whose NEW data coincidentally lands
    * the same sorted length multiset would be indistinguishable from a
    * replay and silently retired; row counts and row-key bounds are
    * content-derived and free (the batch's own manifest already records
    * them — one small-file read; a missing/stale manifest entry costs one
    * footer open for that file only, metadata pages, no data read). */
  /** Ledger fingerprint FORMAT version. Bumped whenever [[fingerprint]]'s
    * input tuple changes: a recorded value from a different format is
    * unverifiable (not wrong), and the replay check degrades to
    * name-based retirement for it instead of wedging the sweep. */
  private[graft] val FingerprintVersion = "v2:"

  private[graft] def fingerprint(fs: org.apache.hadoop.fs.FileSystem,
                                 dir: Path): String = {
    val conf = fs.getConf
    val manifest = CellManifest.read(conf, dir.toString).getOrElse(Map.empty)
    val sigs = fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val len = s.getLen
        val (rows, bounds) = manifest.get(s.getPath.getName)
          .filter(e => e.length == len && e.rows >= 0) match {
          case Some(e) => (e.rows, e.bounds)
          case None    => CellManifest.footerStats(s.getPath.toString, conf)
        }
        val b = bounds.map { case (lo, hi) =>
          CellManifest.toHex(lo) + "/" + CellManifest.toHex(hi) }.getOrElse("-")
        s"$len:$rows:$b"
      }.sorted
    val body = sigs.length + ":" + sigs.mkString(",")
    FingerprintVersion + java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** name → fingerprint ("" for legacy name-only lines). Falls back to
    * the temp sibling when a crash landed between the old ledger's
    * retirement and the new one's rename-in. Lines whose name is not a
    * `batch_<digits>` id are DROPPED: such a name can never match a batch
    * dir ([[batchDirs]] admits only that shape), so it carries no replay
    * protection — and keeping it would crash every subsequent sweep's
    * bounded-retention filter ([[batchId]] toLong) on a hand-edited or
    * corrupted ledger line. Degrade, don't abort. */
  private def readLedger(fs: org.apache.hadoop.fs.FileSystem,
                         p: Path): Map[String, String] = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val src = if (fs.exists(p)) Some(p)
              else if (fs.exists(tmp)) Some(tmp)
              else None
    src.fold(Map.empty[String, String]) { f =>
      val in = fs.open(f)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).map { line =>
        line.split('\t') match {
          case Array(n, fp) => n -> fp
          case fields       => fields.head -> ""
        }
      }.filter { case (n, _) => n.matches("batch_\\d+") }.toMap
    }
  }

  /** Atomic rewrite: temp sibling + rename — a crash mid-write can never
    * truncate the live ledger (which would forget absorbed batches and
    * let a replay permanently duplicate cells). If the FS refuses a
    * rename onto an existing destination (HDFS semantics), the old
    * ledger is retired first; the [ledger-missing, tmp-present] crash
    * window between those two steps is recovered by [[readLedger]]'s
    * tmp fallback. */
  private def writeLedger(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          entries: Map[String, String]): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.toSeq.sorted.map { case (n, fp) => s"$n\t$fp" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"ledger install failed: $tmp -> $p")
    }
  }

  /** Move tmp's part files into `dest` under round-unique stamped names
    * (still `part-*.parquet` — the flat-layout contract every scanner
    * filters on), then drop tmp. A failed rename aborts LOUDLY before
    * any old data is retired — the caller's install-first/delete-second
    * ordering depends on it. */
  private def installParts(fs: org.apache.hadoop.fs.FileSystem,
                           tmp: Path, dest: Path, stamp: String): Unit = {
    fs.listStatus(tmp)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .zipWithIndex.foreach { case (s, i) =>
        val to = new Path(dest, f"part-$stamp-$i%05d.parquet")
        if (!fs.rename(s.getPath, to))
          throw new java.io.IOException(
            s"compaction install failed: rename ${s.getPath} -> $to " +
              "(no old file has been retired; the serving dir is intact)")
      }
    fs.delete(tmp, true)
  }

  /** MAJOR compaction IN PLACE: rewrite `dir`'s accumulated filesets as
    * exactly one file per region (fresh full manifest — region-count
    * lines, trivially cheap). Install-first, delete-second: the rewrite
    * lands under a temp sibling, the stamped new part files are RENAMED
    * IN (fresh-UUID names cannot collide with the old parts), and only
    * then are the old parts deleted and the manifest rewritten — so the
    * crash window at every point shows a root-level reader duplicates,
    * never loss, and a failed rename aborts with the old fileset (and
    * its manifest) fully intact. A concurrent reader between install and
    * manifest rewrite sees a manifest that prunes only the old names —
    * stale-but-safe for ranges, which is why single-writer serving is
    * still the documented posture for point-in-time row counts. */
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
    installParts(fs, tmp, dirPath, stamp)
    oldParts.foreach(p => fs.delete(p, false))
    CellManifest.write(spark, dir)
  }
}

package graft

import graft.functions.keys
import graft.operators.{CellOps, RegionSort}
import graft.sources.{AvroSource, Delimited, JsonLines, OrcSource, RCFileSource}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's user-facing bulk-load API — drop-in parity with the four
  * reference drivers (`BulkImporterFromText/CSVText/Avro/RC`, each a
  * `Tool.run` of scan → parse → rowkey → cells → total-order sort → HFiles
  * → bulk load), re-expressed as one configurable declarative pipeline.
  *
  * A reference invocation like `sample_run.sh`'s
  * `BulkImporterFromCSVText hbase-site.xml input out` becomes:
  * {{{
  *   val r = BulkLoad.csv(spark, input, BulkLoad.Config())
  *   r.sink.write(r.cells, out)   // sorted cells, region-aligned
  * }}}
  *
  * Differences from the reference are deliberate and documented:
  * UTF-8 everywhere (it mixed platform charset and UTF-8), strict
  * RFC-4180 CSV by default with `compatNaiveSplit` opt-in, quarantined
  * (not silently dropped) malformed rows, salting exposed as a
  * first-class option (its disabled design intent), and the RC key
  * normalized to in-range fields (its field-20 bug).
  */
object BulkLoad {

  sealed trait QualifierStrategy
  /** 4-byte big-endian column index (text/CSV/RC reference paths). */
  case object IndexQualifiers extends QualifierStrategy
  /** UTF-8 field name (Avro reference path). */
  case object NameQualifiers extends QualifierStrategy

  /** Pipeline configuration. Defaults mirror the reference's CSV driver:
    * 9 string columns, key = md5 over fields 0-3, family "c", 10 regions
    * (`create_table.rb:1`), no salt. */
  case class Config(
      arity: Int = 9,
      keyFields: Seq[Int] = Seq(0, 1, 2, 3),
      family: String = "c",
      regions: Int = 10,
      saltBuckets: Option[Int] = None,
      qualifiers: QualifierStrategy = IndexQualifiers,
      compatNaiveSplit: Boolean = false,
      loadTs: Long = 0L,
      /** Explicit region boundaries (first key of region i+1, unsigned
        * byte order) — the `TotalOrderPartitioner` split-file analog of
        * the reference's live `RegionLocator.getStartKeys` lookup
        * (BulkImporterFromText.java:105-108). When set, the load is
        * EXACTLY region-aligned via [[graft.plans.RegionAlignedSort]]
        * even without salting; `regions` is ignored. Mutually exclusive
        * with `saltBuckets`, whose salt digits define their own
        * boundaries. */
      splits: Option[Seq[Array[Byte]]] = None) {
    require(splits.isEmpty || saltBuckets.isEmpty,
      "explicit splits and salting are mutually exclusive: salt digits define their own region boundaries")
  }

  /** Result: region-sorted cells + quarantined rows + the sink.
    * `quarantined` is a single string column `value`: the raw line for
    * parse-level rejects, a JSON rendering for rows rejected later (e.g.
    * un-keyable rows whose key fields are null). */
  case class Result(cells: DataFrame, quarantined: DataFrame, sink: CellSink)

  /** CSV driver (reference `BulkImporterFromCSVText`). Strict RFC-4180 by
    * default; `cfg.compatNaiveSplit` reproduces the reference's naive
    * `split(",")` skip semantics. */
  def csv(spark: SparkSession, input: String, cfg: Config = Config()): Result =
    if (cfg.compatNaiveSplit) {
      val (kept, rejected) = Delimited.naiveSplit(spark, input, ",", cfg.arity)
      fromPositional(kept, rejected, cfg)
    } else {
      val kept = Delimited.strictCsv(spark, input, cfg.arity)
      fromPositional(kept, emptyQuarantine(spark), cfg)
    }

  /** Hive `\u0001`-delimited text driver (reference `BulkImporterFromText`). */
  def hiveText(spark: SparkSession, input: String, cfg: Config = Config()): Result = {
    val (kept, rejected) = Delimited.hiveText(spark, input, cfg.arity)
    fromPositional(kept, rejected, cfg)
  }

  /** Avro driver (reference `BulkImporterFromAvro`): key = reverse(first
    * field), field-name qualifiers, null `id` quarantined (the reference
    * NPEs on it). */
  def avro(spark: SparkSession, input: String, cfg: Config = Config(qualifiers = NameQualifiers)): Result = {
    val df = AvroSource.read(spark, input)
    val idCol = df.columns.head
    val kept = df.where(col(idCol).isNotNull)
    val rejected = df.where(col(idCol).isNull)
      .select(to_json(struct(df.columns.map(col): _*)).as("value"))
    Result(sortedNamedFromRows(kept, keys.reversedKey(col(idCol)),
      df.columns.toSeq, cfg), rejected, SortedParquetCellSink)
  }

  /** JSON-lines driver — same named-cell semantics as [[avro]] (reversed
    * first-field key, field-name qualifiers, null-id quarantine, null
    * fields emit no cell) over the feed format modern pipelines actually
    * ship. Reads through [[JsonLines.read]], so malformed lines join the
    * null-id rows in the quarantine frame (the [[Delimited]]
    * no-silent-drop contract); `ddl` fixes the schema and the qualifier
    * order explicitly — never inferred. */
  def jsonl(spark: SparkSession, input: String, ddl: String,
            cfg: Config = Config(qualifiers = NameQualifiers)): Result = {
    val (df, malformed) = JsonLines.read(spark, input,
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
    val idCol = df.columns.head
    val kept = df.where(col(idCol).isNotNull)
    val rejected = df.where(col(idCol).isNull)
      .select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .unionByName(malformed)
    Result(sortedNamedFromRows(kept, keys.reversedKey(col(idCol)),
      df.columns.toSeq, cfg), rejected, SortedParquetCellSink)
  }

  /** The reference RC driver's literal key fields (BulkImporterFromRC.java:54-56):
    * (1, 3, 4, 20) against a 9-column schema — field 20 is out of range, so
    * the reference mapper throws on every arity-matched row (the documented
    * field-20 bug, SURVEY §1.3). Opt in via `Config(keyFields =
    * ReferenceRcKeyFields)` (CLI: `rcfile-compat`): out-of-range key fields
    * read as null, so affected rows are QUARANTINED instead of killing the
    * job — same rows rejected, recoverably. */
  val ReferenceRcKeyFields: Seq[Int] = Seq(1, 3, 4, 20)

  /** RCFile driver (reference `BulkImporterFromRC`); default key fields
    * normalized to in-range positions, [[ReferenceRcKeyFields]] opt-in. */
  def rcFile(spark: SparkSession, input: String, cfg: Config = Config()): Result = {
    val kept = RCFileSource.read(spark, input, cfg.arity)
    fromPositional(kept, emptyQuarantine(spark), cfg)
  }

  /** ORC driver — the modern columnar input (vectorized scan + column
    * pruning; the legacy RCFile shim covers reference parity). */
  def orc(spark: SparkSession, input: String, cfg: Config = Config()): Result = {
    val kept = OrcSource.read(spark, input, cfg.arity)
    fromPositional(kept, emptyQuarantine(spark), cfg)
  }

  /** Shared tail: positional columns → rowkey → cells → salt → region sort.
    * Rows whose KEY fields contain nulls cannot be keyed (the composite MD5
    * would be NULL) — they join the quarantine as JSON instead of silently
    * producing key-less cells ('quarantine, not drop', ARCHITECTURE.md).
    * Key fields beyond the row arity read as null (⇒ quarantine), mirroring
    * where the reference would crash (see [[ReferenceRcKeyFields]]). */
  def fromPositional(kept: DataFrame, quarantined: DataFrame, cfg: Config): Result = {
    def field(i: Int): Column =
      if (i < cfg.arity) col(s"c$i")
      else lit(null).cast(org.apache.spark.sql.types.StringType)
    val keyOk = cfg.keyFields.map(field(_).isNotNull).reduce(_ && _)
    val keyable = kept.where(keyOk)
    val unkeyable = kept.where(!keyOk)
      .select(to_json(struct(kept.columns.map(col): _*)).as("value"))
    val keyCols = cfg.keyFields.map(field)
    val rowKey = keys.md5CompositeKey(keyCols)
    val valueCols = (0 until cfg.arity).map(i => col(s"c$i"))
    // two-phase region sort: key each source ROW once, exchange the rows
    // (64B key + raw values move ONCE), and explode to cells inside the
    // destination region partition — see [[sortedFromRows]]
    val wide = keyable.select((rowKey.as("row") +: valueCols): _*)
    val explodeFn: DataFrame => DataFrame = cfg.qualifiers match {
      case IndexQualifiers =>
        df => CellOps.explodeIndexed(df, col("row"), cfg.family, valueCols, cfg.loadTs)
      case NameQualifiers =>
        df => CellOps.explodeNamed(df, col("row"), cfg.family,
          (0 until cfg.arity).map(i => s"c$i"), cfg.loadTs)
    }
    Result(sortedFromRows(wide, explodeFn, cfg),
      quarantined.unionByName(unkeyable), SortedParquetCellSink)
  }

  /** Empty quarantine frame with the canonical single `value` column. */
  def emptyQuarantine(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))

  /** Salted loads get EXACT region alignment (the salt digits ARE the
    * table's pre-split boundaries, create_table.rb:1) via the custom
    * RegionAlignedSort operator; explicit `cfg.splits` boundaries get the
    * same exact path without salting (adopting an EXISTING table's region
    * layout). Unsalted loads with no boundary file fall back to
    * Catalyst's sampled range exchange — accurate and cheaper for the
    * uniform MD5 keyspace, but a straddling file may be split server-side
    * at adoption time. */
  private[graft] def sorted(cells: DataFrame, cfg: Config): DataFrame =
    (cfg.saltBuckets, cfg.splits) match {
      case (Some(b), _) =>
        val salted = cells.withColumn("row",
          concat(keys.saltPrefix(crc32(col("row")), b), col("row")))
        graft.plans.RegionAlignedSort(salted, RegionSort.saltSplits(b))
      case (None, Some(s)) =>
        graft.plans.RegionAlignedSort(cells, s.toArray)
      case (None, None) =>
        RegionSort.sortedByRange(cells, cfg.regions)
    }

  /** Two-phase region sort from WIDE keyed rows — the ingest-side shape
    * of [[sorted]]: (1) the total-order EXCHANGE runs on the source rows
    * (leading binary `row` key + raw values — the key and the per-cell
    * family/qualifier/ts overhead move ONCE per row instead of once per
    * cell: ~2.5-3× fewer shuffle bytes, arity× fewer shuffle tuples);
    * (2) the cell explode is a NARROW Generate inside the destination
    * region partition; (3) the KeyValue (row, family, qualifier) order is
    * a partition-local spill-safe SortExec (BinaryType compares unsigned
    * lexicographic — the same order [[RegionSort.unsignedBytes]] defines).
    * Output contract is IDENTICAL to [[sorted]]: file i ⊆ region i,
    * in-file KeyValue order. At 100 TB the ingest exchange is the
    * pipeline's dominant cost — this is the operator the reduction
    * targets; layout compaction keeps the cell-level [[sorted]] because
    * its input is already-exploded persisted cells. Salting prepends the
    * salt digit to the ROW key before the exchange, so the salt-digit
    * boundaries stay exact. */
  private[graft] def sortedFromRows(rows: DataFrame,
                                    explode: DataFrame => DataFrame,
                                    cfg: Config): DataFrame = {
    val key = rows.columns.head // the leading column IS the binary row key
    val exchanged = (cfg.saltBuckets, cfg.splits) match {
      case (Some(b), _) =>
        val salted = rows.withColumn(key,
          concat(keys.saltPrefix(crc32(col(key)), b), col(key)))
        graft.plans.RegionAlignedRowExchange(salted, RegionSort.saltSplits(b))
      case (None, Some(s)) =>
        graft.plans.RegionAlignedRowExchange(rows, s.toArray)
      case (None, None) =>
        rows.repartitionByRange(cfg.regions, col(key))
    }
    explode(exchanged)
      .sortWithinPartitions(col("row"), col("family"), col("qualifier"))
  }

  /** [[sortedFromRows]] for the NAMED-qualifier feeds (Avro/JSONL): keys
    * each source row once under a collision-proof column name (the source
    * schema may legitimately contain a `row` field) and explodes with
    * field-name qualifiers inside the region partition. */
  private[graft] def sortedNamedFromRows(kept: DataFrame, rowKey: Column,
                                         names: Seq[String], cfg: Config): DataFrame = {
    val keyName = "__graft_row"
    val wide = kept.select((rowKey.as(keyName) +: names.map(col)): _*)
    sortedFromRows(wide,
      df => CellOps.explodeNamed(df, col(keyName), cfg.family, names, cfg.loadTs),
      cfg)
  }
}

/** Terminal sink for sorted cells — the stand-in seam for
  * `HFileOutputFormat2` + `LoadIncrementalHFiles` (reference X3/X5).
  * Implementations must preserve the partition/order contract: file i
  * holds region i's cells in unsigned (row, family, qualifier) order. */
trait CellSink {
  def write(cells: DataFrame, path: String): Unit
  /** Post-commit hook — the reference's fixed tail sequence after the
    * files land (BulkImporterFromText.java:118-133): permission walk →
    * `doBulkLoad` handoff → staging cleanup, IN THAT ORDER (the region
    * server must be able to read the files before adoption, and nothing
    * may be deleted until adoption succeeds). Steps are no-ops without an
    * HBase cluster; implementations override the individual steps, never
    * the sequencing. */
  final def postCommit(path: String): Unit = {
    chmodStep(path)
    bulkLoadStep(path)
    cleanupStep(path)
  }
  /** X4: recursive permission walk (the reference's chmod 777). */
  protected def chmodStep(path: String): Unit = ()
  /** X5: hand the written files to the serving system (doBulkLoad). */
  protected def bulkLoadStep(path: String): Unit = ()
  /** X6: remove staging output after successful adoption. */
  protected def cleanupStep(path: String): Unit = ()
}

/** Parquet sink preserving the sorted, region-partitioned layout —
  * byte-verifiable without HBase jars (SURVEY.md §7.4). Writing real
  * HFiles is a drop-in alternative implementation of this trait via
  * `saveAsNewAPIHadoopFile[HFileOutputFormat2]` when hbase-mapreduce is on
  * the classpath. */
object SortedParquetCellSink extends CellSink {
  /** Data files only — [[write]] = writeData + manifest. The streaming
    * harness drives the two phases separately so the manifest (a CACHE
    * by contract — every reader falls back to footer stats when it is
    * absent) can land off the micro-batch critical path. */
  def writeData(cells: DataFrame, path: String): Unit =
    cells.write.mode("overwrite").parquet(path)

  override def write(cells: DataFrame, path: String): Unit = {
    writeData(cells, path)
    // META-analog boundary index: one distributed footer-stat pass at
    // write time so every later CellScan is one small-file read instead
    // of N driver-side footer opens (graft.sources.CellManifest).
    graft.sources.CellManifest.write(cells.sparkSession, path)
  }
}

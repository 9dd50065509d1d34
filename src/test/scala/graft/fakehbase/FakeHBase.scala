package graft.fakehbase

import org.apache.hadoop.mapreduce.{RecordWriter, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat

/** Structural stand-ins for the HBase classes `HFileCellSink` resolves by
  * name (same constructor shapes), so the sink's full write wiring —
  * per-partition reflective constructor lookup, cell-row mapping,
  * `saveAsNewAPIHadoopFile` job — runs end to end in a jars-free
  * environment. The production class names bind to the real HBase types
  * unchanged; only the names differ here. */
class KeyValue(val row: Array[Byte], val family: Array[Byte],
               val qualifier: Array[Byte], val ts: Long,
               val value: Array[Byte])

class BytesKey(val get: Array[Byte])

/** Call log for the stand-in adoption tool (X5): (table, staging dir,
  * file names under the dir AT ADOPTION TIME). The file set is walked
  * INSIDE bulkLoad — the same discovery `LoadIncrementalHFiles.doBulkLoad`
  * performs over the staging layout — so a spec can assert both WHICH
  * files the cluster would have adopted and that adoption ran while the
  * files still existed (i.e. before any cleanup step). */
object RecordedBulkLoads {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Set[String])]()
}

/** Stand-in for `org.apache.hadoop.hbase.TableName` (static `valueOf`). */
class TableName private (val name: String)
object TableName {
  def valueOf(s: String): TableName = new TableName(s)
}

/** Stand-in for `org.apache.hadoop.hbase.tool.BulkLoadHFiles`: static
  * `create(Configuration)` factory, instance `bulkLoad(TableName, Path)` —
  * the exact shape `HFileCellSink.bulkLoadVia` resolves by name. */
class BulkLoadHFiles private (val conf: org.apache.hadoop.conf.Configuration) {
  def bulkLoad(table: TableName, dir: org.apache.hadoop.fs.Path): Unit = {
    val fs = dir.getFileSystem(conf)
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.flatMap(s => walk(s.getPath))
      else Seq(p.getName)
    RecordedBulkLoads.calls.add(
      (table.name, dir.toString,
        scala.util.Try(walk(dir).toSet).getOrElse(Set.empty)))
  }
}
object BulkLoadHFiles {
  def create(conf: org.apache.hadoop.conf.Configuration): BulkLoadHFiles =
    new BulkLoadHFiles(conf)
}

/** Writes one CSV-of-hex line per cell — enough to assert every byte the
  * sink handed to the output format. */
class CellTextOutputFormat extends FileOutputFormat[AnyRef, AnyRef] {
  override def getRecordWriter(ctx: TaskAttemptContext): RecordWriter[AnyRef, AnyRef] = {
    val file = getDefaultWorkFile(ctx, ".txt")
    val out = file.getFileSystem(ctx.getConfiguration).create(file, false)
    new RecordWriter[AnyRef, AnyRef] {
      private def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      override def write(k: AnyRef, v: AnyRef): Unit = {
        val kv = v.asInstanceOf[KeyValue]
        // the key must be the row-key writable built from the same row
        require(java.util.Arrays.equals(k.asInstanceOf[BytesKey].get, kv.row),
          "key writable must carry the cell's row key")
        out.writeBytes(
          s"${hex(kv.row)},${hex(kv.family)},${hex(kv.qualifier)},${kv.ts},${hex(kv.value)}\n")
      }
      override def close(c: TaskAttemptContext): Unit = out.close()
    }
  }
}

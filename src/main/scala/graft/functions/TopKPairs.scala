package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over `(ord: double, payload: long)` pairs,
  * ranked by (ord DESC, payload ASC).
  *
  * The scalable form of per-key top-k: a window `row_number() <= k` sorts
  * EVERY row of each key on the shuffle; this aggregate keeps at most `k`
  * pairs in its buffer, combines map-side, and ships k pairs per key
  * through the exchange regardless of group size — at 100 TB the shuffle
  * shrinks from the full fact table to k×|keys|. Output order is the rank
  * order, so `posexplode` yields (rank-1, pair).
  *
  * Buffer is a small sorted ArrayBuffer (k is small by design); serialize
  * is a flat (n, ord*, payload*) byte image for partial-aggregate exchange.
  */
case class TopKPairs(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {
  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_pairs"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))))

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: ArrayBuffer[(Double, Long)], v: (Double, Long)): Unit = {
    // buf is kept sorted best-first and capped at k
    if (buf.size < k || better(v, buf.last)) {
      val i = buf.indexWhere(better(v, _)) match {
        case -1 => buf.size
        case j => j
      }
      buf.insert(i, v)
      if (buf.size > k) buf.remove(buf.size - 1)
    }
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // pairs with a null ord or payload are ignored (the window
      // row_number form sorts nulls last; results agree whenever a key
      // has >= k non-null rows — reading null slots would rank them at 0)
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        insert(buf, (row.getDouble(0), row.getLong(1)))
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (o, p) => InternalRow(o, p) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) => out.writeDouble(o); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    (0 until n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(child = newChildren.head)
}

object TopKPairs {
  /** Aggregate column: top-k (ord DESC, payload ASC) pairs of the struct
    * column `struct(ord, payload)`. */
  def topK(pair: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(pair), k).toAggregateExpression())
}

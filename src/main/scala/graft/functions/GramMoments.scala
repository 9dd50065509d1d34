package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** First + second raw moments of an `array<double>` embedding column in ONE
  * unexploded corpus pass — the scalable form of the covariance/Gram
  * accumulation that a double `posexplode` materializes as n·d² ROWS
  * through a hash aggregate (n·4,096 at d=64; n·589,824 at a realistic
  * d=768 — no partial aggregation makes that cheap, because the d² blowup
  * happens per row BEFORE the combine). Here each input row folds its
  * d(d+1)/2 upper-triangle products straight into a fixed-size buffer;
  * partials merge element-wise, so the exchange carries ONE ~d²-long buffer
  * per partition instead of n·d² rows.
  *
  * Determinism (the engine's bit-equal-oracle contract, without decimal):
  * every product is quantized to a scaled integer `floor(x·10⁹ + 0.5)`
  * BEFORE accumulation. float×float is exact in double (24+24 ≤ 53 bits),
  * `·10⁹`, `+0.5` and `floor` are single correctly-rounded IEEE ops — so
  * the quantized long is bit-identical in the JVM and in DuckDB's C++, and
  * the integer sums are order-independent across partitions/merges. Each
  * per-entry sum is held as a (hi, lo) pair of longs (value = hi·2³² + lo),
  * normalized whenever |lo| > 2⁶¹ — exact up to ~2⁹³ scaled units, far past
  * any corpus size. Eval converts the exact integer sums to double (exact
  * below 2⁵³ scaled units ≈ 9·10¹⁵; beyond that both engines apply the same
  * correctly-rounded integer→double conversion).
  *
  * Output: struct(n: long, s1: array<double> of d scaled component sums,
  * s2: array<double> of d·d row-major scaled product sums — the symmetric
  * triangle mirrored, so consumers index (i·d + j) with no triangle math).
  */
case class GramMoments(child: Expression, dims: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramMoments.Buffer] {
  require(dims > 0, "dims must be positive")

  override def prettyName: String = "gram_moments"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("s2", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): GramMoments.Buffer =
    new GramMoments.Buffer(dims)

  override def update(buf: GramMoments.Buffer, input: InternalRow): GramMoments.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData].toDoubleArray()
      require(arr.length == dims,
        s"embedding length ${arr.length} != declared dims $dims")
      buf.add(arr)
    }
    buf
  }

  override def merge(buf: GramMoments.Buffer, other: GramMoments.Buffer): GramMoments.Buffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: GramMoments.Buffer): Any = {
    val d = dims
    val s1 = new Array[Any](d)
    var i = 0
    while (i < d) { s1(i) = buf.value1(i); i += 1 }
    // mirror the upper triangle into the full row-major d×d image
    val s2 = new Array[Any](d * d)
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val x = buf.value2(k)
        s2(i * d + j) = x
        s2(j * d + i) = x
        k += 1; j += 1
      }
      i += 1
    }
    InternalRow(buf.n, new GenericArrayData(s1), new GenericArrayData(s2))
  }

  override def serialize(buf: GramMoments.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dims)
    out.writeLong(buf.n)
    def arr(a: Array[Long]): Unit = { var i = 0; while (i < a.length) { out.writeLong(a(i)); i += 1 } }
    arr(buf.lo1); arr(buf.hi1); arr(buf.lo2); arr(buf.hi2)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramMoments.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = in.readInt()
    val buf = new GramMoments.Buffer(d)
    buf.n = in.readLong()
    def arr(a: Array[Long]): Unit = { var i = 0; while (i < a.length) { a(i) = in.readLong(); i += 1 } }
    arr(buf.lo1); arr(buf.hi1); arr(buf.lo2); arr(buf.hi2)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMoments =
    copy(child = newChildren.head)
}

object GramMoments {
  private val Lim = 1L << 61

  /** Exact integer accumulator: per entry, sum = hi·2³² + lo in scaled
    * (·10⁹) units. lo is renormalized into hi whenever it leaves ±2⁶¹, so
    * both update- and merge-adds stay overflow-free. */
  final class Buffer(val dims: Int) {
    var n: Long = 0L
    val lo1 = new Array[Long](dims)
    val hi1 = new Array[Long](dims)
    val lo2 = new Array[Long](dims * (dims + 1) / 2)
    val hi2 = new Array[Long](dims * (dims + 1) / 2)

    @inline private def norm(lo: Array[Long], hi: Array[Long], k: Int): Unit =
      if (lo(k) > Lim || lo(k) < -Lim) {
        val c = lo(k) >> 32
        hi(k) += c
        lo(k) -= c << 32
      }

    def add(v: Array[Double]): Unit = {
      n += 1
      val d = dims
      var k = 0
      var i = 0
      while (i < d) {
        val vi = v(i)
        // Exactness contract: each scaled increment must stay far inside
        // the ±2⁶¹ renorm window, else Math.floor(..).toLong saturates
        // silently. |vi| ≤ 1e3 keeps |vi·vj|·1e9 ≤ 1e15 ≪ 2⁶¹; real
        // embeddings are unit-ish, so fail loudly rather than corrupt.
        require(vi <= 1e3 && vi >= -1e3 && !vi.isNaN,
          s"GramMoments: component magnitude ${vi} at dim $i exceeds the " +
            "exact-sum bound (|v| <= 1e3); rescale the embedding first")
        lo1(i) += Math.floor(vi * 1e9 + 0.5).toLong
        norm(lo1, hi1, i)
        var j = i
        while (j < d) {
          lo2(k) += Math.floor(vi * v(j) * 1e9 + 0.5).toLong
          norm(lo2, hi2, k)
          k += 1; j += 1
        }
        i += 1
      }
    }

    def mergeIn(o: Buffer): Unit = {
      require(o.dims == dims, s"buffer dims mismatch: ${o.dims} != $dims")
      n += o.n
      var i = 0
      while (i < dims) {
        lo1(i) += o.lo1(i); norm(lo1, hi1, i)
        hi1(i) += o.hi1(i)
        i += 1
      }
      var k = 0
      while (k < lo2.length) {
        lo2(k) += o.lo2(k); norm(lo2, hi2, k)
        hi2(k) += o.hi2(k)
        k += 1
      }
    }

    @inline private def value(lo: Long, hi: Long): Double =
      if (hi == 0L) lo.toDouble
      else java.math.BigInteger.valueOf(hi).shiftLeft(32)
        .add(java.math.BigInteger.valueOf(lo)).doubleValue()

    def value1(i: Int): Double = value(lo1(i), hi1(i))
    def value2(k: Int): Double = value(lo2(k), hi2(k))
  }

  /** Aggregate column: one-pass scaled first/second moment sums of the
    * `array<double>` column `v` (see class doc for the exact layout). */
  def gram(v: Column, dims: Int): Column =
    Bridge.column(GramMoments(Bridge.expression(v), dims).toAggregateExpression())
}

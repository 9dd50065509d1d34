package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bit-level kernels shared by the Bloom aggregate (interpreted update
  * path) and the membership expression's generated code. Keys are the
  * engine's canonical 16-byte md5 images ([[keys.md5Raw]]): the digest's
  * two 8-byte halves are the (h1, h2) pair of Kirsch–Mitzenmacher double
  * hashing, so `numHashes` probe positions cost ONE digest that the
  * engine usually computes anyway — no murmur/xxhash re-hash per probe,
  * and no RNG anywhere (the whole filter is a pure function of the key
  * set, bit-identical across partitionings, retries and cluster sizes).
  */
object BloomRuntime {
  /** Big-endian long from 8 bytes of the digest at `off`. */
  def readLong(md5: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (md5(off + i) & 0xffL); i += 1 }
    v
  }

  /** Set the `numHashes` probe bits of `md5` in the word array. */
  def set(words: Array[Long], md5: Array[Byte], numHashes: Int): Unit = {
    val mBits = words.length.toLong * 64L
    val h1 = readLong(md5, 0)
    val h2 = readLong(md5, 8)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
      words((pos >>> 6).toInt) |= (1L << (pos & 63L).toInt)
      i += 1
    }
  }

  /** True iff every probe bit of `md5` is set in the serialized filter
    * (8 bytes per word, big-endian — the aggregate's output image). */
  def mightContain(bloom: Array[Byte], md5: Array[Byte], numHashes: Int): Boolean = {
    val mBits = bloom.length.toLong * 8L
    val h1 = readLong(md5, 0)
    val h2 = readLong(md5, 8)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, mBits)
      if ((bloom((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter aggregate over 16-byte md5 keys → the filter's byte
  * image (BinaryType, `numBits/8` bytes).
  *
  * The 100-TB membership primitive: when a key set is too large to
  * broadcast as an exact hash relation (a benchmark suite's hundreds of
  * millions of n-grams at ~50 B each) but its BITS still fit on every
  * executor, the bloom image (numBits/8 bytes, fpp ≈ (1-e^(-kn/m))^k)
  * broadcasts where the set cannot. Merge is a word-wise OR — commutative
  * and associative, so map-side partials combine freely and the image is
  * bit-identical under any partitioning. False positives are expected and
  * handled DOWNSTREAM: the engine uses the filter only as a prefilter in
  * front of an exact semi-join, so results stay exact (see
  * `CorpusPipeline.evalNgramDecontaminateBloom`).
  *
  * Null keys are ignored (no membership evidence). An EMPTY group yields
  * the all-zeros image: `mightContain` is then false for every key —
  * the correct "nothing was inserted" answer.
  */
case class BloomSetAgg(child: Expression, numBits: Int,
                       numHashes: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")

  override def prettyName: String = "bloom_set"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomRuntime.set(buf, v.asInstanceOf[Array[Byte]], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = toBytes(buf)

  // words serialize LITTLE-endian so the image's byte/bit addressing
  // (mightContain probes byte pos>>>3, bit pos&7) lines up with the
  // word/bit addressing `set` uses (word pos>>>6, bit pos&63)
  private def toBytes(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](buf.length * 8)
    var w = 0
    while (w < buf.length) {
      val v = buf(w)
      var b = 0
      while (b < 8) { out(w * 8 + b) = (v >>> (8 * b)).toByte; b += 1 }
      w += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    var w = 0
    while (w < buf.length) {
      var v = 0L
      var b = 0
      while (b < 8) { v |= (bytes(w * 8 + b) & 0xffL) << (8 * b); b += 1 }
      buf(w) = v
      w += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomSetAgg =
    copy(child = newChildren.head)
}

/** `might_contain(bloomImage, md5Key)` — true iff the key's probe bits
  * are all set. Codegen'd (a static-call one-liner), so the prefilter
  * stays inside the scan's WholeStageCodegen span: at 100 TB the corpus
  * pass reads, probes and drops rows without ever materializing the
  * non-candidates. No false negatives by construction; false positives
  * are resolved by the exact join behind it.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  // both children are BinaryType by construction (BloomSet.mightContain
  // pairs the aggregate's image with a 16-byte md5 key)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary, binary), got (${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomRuntime.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Array[Byte]], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = graft.functions.BloomRuntime.mightContain($b, $k, $numHashes);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomSet {
  /** Aggregate column: the bloom byte image of a 16-byte md5 key column. */
  def bloomAgg(md5Key: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      BloomSetAgg(Bridge.expression(md5Key), numBits, numHashes).toAggregateExpression())

  /** Membership probe of a 16-byte md5 key against a bloom image column. */
  def mightContain(bloom: Column, md5Key: Column, numHashes: Int): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(bloom), Bridge.expression(md5Key), numHashes))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a native TypedImperativeAggregate — the membership
  * companion to [[HyperLogLog]] (distinct count) and [[CountMin]]
  * (frequency): the sketch that lets a 100 TB scan ask "is this value
  * in the (small) reference set?" map-side, with no shuffle of the big
  * side and no false NEGATIVES ever. The canonical use is eval-set
  * decontamination: build the filter over benchmark n-grams (thousands
  * to millions), broadcast the one sketch row, and prefilter the
  * corpus n-gram stream before the exact verification join — the big
  * side is touched once, and only bloom hits (true matches + a
  * controlled false-positive trickle) reach the join.
  *
  * Representation: the aggregation BUFFER is a packed Long bitset
  * (mBits/64 words; merge = bitwise OR), so partial aggregation ships
  * bytes, not bits-as-ints. `eval` expands once per GROUP (usually one
  * group total) to an Array[Int] of 0/1 so the probe side stays pure
  * built-in `element_at` — O(1) per probe, inside whole-stage codegen,
  * no custom scalar expression.
  *
  * Deterministic cross-engine contract: one md5-60bit hash per value
  * (the corpus convention, [[HyperLogLog.hash60]]), K=3 probes by
  * Kirsch–Mitzenmacher double hashing — h1 = low 30 bits, h2 = high
  * 30 bits forced odd, probe_i = (h1 + i*h2) mod mBits — so mBits can
  * grow to 2^30 (size the filter to the reference set; no window
  * ceiling). In SQL: h1 = h % 2^30, h2 = (h // 2^30) with the low bit
  * set, all BIGINT-exact. A DuckDB oracle replays the whole filter —
  * INCLUDING its false positives — as three semi-joins against the
  * set of set bits.
  */
case class BloomFilter(
    child: Expression,
    mBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import BloomFilter._

  // 2^24 ceiling: eval expands the packed buffer to mBits 0/1 ints so
  // the probe stays a built-in element_at (codegen'd, oracle-
  // replayable) — 64 MB of broadcast row at the ceiling. Beyond that
  // a filter should keep the packed longs and probe via a native
  // expression; the double-hash probe math itself is good to 2^30.
  require(mBits > 0 && mBits <= (1 << 24), s"mBits must be in (0, 2^24], got $mBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((mBits + 63) / 64)

  override def update(bits: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HyperLogLog.hash60(v.asInstanceOf[UTF8String].getBytes)
      val h1 = h & ((1L << 30) - 1)
      val h2 = (h >>> 30) | 1L
      var i = 0
      while (i < K) {
        val b = ((h1 + i * h2) % mBits).toInt
        bits(b >>> 6) |= 1L << (b & 63)
        i += 1
      }
    }
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(bits: Array[Long]): Any = {
    val out = new Array[Int](mBits)
    var b = 0
    while (b < mBits) {
      out(b) = ((bits(b >>> 6) >>> (b & 63)) & 1L).toInt
      b += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bb.asLongBuffer().put(bits)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilter =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilter =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilter =
    copy(child = newChild)
}

object BloomFilter {
  import org.apache.spark.sql.GraftExpressionBridge._
  import org.apache.spark.sql.functions._

  /** Probes per value (double-hashed from the one md5-60bit hash). */
  val K = 3

  /** Default width: 2^17 bits = 16 KB buffer — <0.1% fp up to ~10k
    * reference values. Size mBits ∝ the reference set (up to the
    * 2^24 expanded-eval ceiling; see the require note) for
    * production decontamination at millions of eval n-grams. */
  val DefaultBits = 131072

  def bloom(c: Column, mBits: Int = DefaultBits): Column =
    toColumn(BloomFilter(toExpression(c), mBits).toAggregateExpression())

  /** Membership probe against a built sketch column: true iff all K
    * probe bits are set. Never false for an inserted value (the bloom
    * contract); true for a small hash-collision fraction of absent
    * ones. The modulus is `size(sketch)` — derived from the sketch
    * itself, NOT a caller-supplied width, so a probe can never
    * silently index with a different width than the build (which
    * would break the no-false-negatives contract). Pure built-in
    * element_at — codegen keeps it on the scan. */
  def mightContain(sketch: Column, token: Column): Column = {
    val h = conv(substring(md5(token), 1, 15), 16, 10).cast("long")
    val h1 = h.bitwiseAND(lit((1L << 30) - 1))
    val h2 = shiftright(h, 30).bitwiseOR(lit(1L))
    val m = size(sketch).cast("long")
    (0 until K).map { i =>
      element_at(sketch, (((h1 + lit(i.toLong) * h2) % m) + 1).cast("int")) === 1
    }.reduce(_ && _)
  }
}

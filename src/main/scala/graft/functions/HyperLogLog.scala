package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HyperLogLog distinct-count sketch as a Catalyst
  * `TypedImperativeAggregate` — the §2.10 "hard part" surface done the
  * Spark-native way (same machinery as ApproximatePercentile): a
  * 64-register byte buffer that partial-aggregates map-side, merges by
  * element-wise max on the reducer, and serializes as raw bytes.
  * That shape is exactly what a 100 TB distinct-count needs: the
  * shuffle carries 64 bytes per group instead of the value set.
  *
  * Deterministic cross-engine contract (unlike Spark's builtin
  * approx_count_distinct, whose xxHash/HLL++ internals the oracle
  * cannot replay): the hash is the corpus-wide md5-60bit convention
  * (graft.ops.dedup.Dedup.h60 family, first 15 md5 hex digits),
  * bucket = h mod 64, rank = leading-zero count of the remaining 54
  * bits + 1 (empty bucket = 0). The register sum is carried as the
  * EXACT integer Σ 2^(55 - M_b) <= 64 * 2^55 < 2^63, and the raw HLL
  * estimate alpha * m^2 / Σ 2^-M_b becomes a single double division —
  * bit-identical in any engine that replays the integer registers.
  * No small/large-range bias correction on purpose: corrections add
  * engine-specific branches, and the verified contract is the raw
  * estimator.
  */
case class HyperLogLog(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HyperLogLog._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] =
    updateRegs(regs, child.eval(input))

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)

  override def eval(regs: Array[Byte]): Any = estimate(regs)

  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HyperLogLog =
    copy(child = newChild)
}

/** [[HyperLogLog]] that RETURNS THE REGISTERS (64-byte binary) instead
  * of the estimate — the persistable half of the mergeable-sketch
  * architecture: at 100 TB you store one sketch row per (entity, day)
  * and answer any window/rollup by merging sketches, never re-scanning
  * raw events. Same update/merge/hash contract as the estimating form,
  * so a stored sketch and a freshly-built one are interchangeable. */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HyperLogLog._

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)
  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] =
    updateRegs(regs, child.eval(input))
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
  override def eval(regs: Array[Byte]): Any = regs.clone()
  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

/** Merge aggregate over STORED sketches (the other half): element-wise
  * register max across input sketch rows, estimate out. This is what
  * turns a per-day sketch table into any window's distinct count with
  * sketch-count-sized shuffles — the q137 exact form fans the
  * activity relation out 7x; this fans out 7 sketch ROWS per window. */
case class HllMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HyperLogLog._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)
  override def update(regs: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val sk = v.asInstanceOf[Array[Byte]]
      // width guard (mirrors CmsMerge): a wrong-width blob means
      // schema drift — a longer one would silently merge only the
      // first M registers (wrong estimate, no error), a shorter one
      // would throw an opaque index error mid-merge
      require(sk.length == M,
        s"graft_hll_merge: sketch must be exactly $M registers, got ${sk.length}")
      mergeRegs(regs, sk)
    } else regs
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = mergeRegs(a, b)
  override def eval(regs: Array[Byte]): Any = estimate(regs)
  override def serialize(regs: Array[Byte]): Array[Byte] = regs
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()
  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMerge =
    copy(child = newChild)
}

object HyperLogLog {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** 2^P = M = 64 registers over a 60-bit hash -> W = 54 rank bits. */
  val P = 6
  val M = 64
  val W = 54
  /** Standard alpha_m for m = 64. */
  val Alpha = 0.709
  /** 2^(W+1) = 2^55 — the exact-integer register scaling. */
  val Pow2W1: Double = 36028797018963968.0

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 md5 hex digits as a 60-bit long — identical to DuckDB's
    * ('0x' || substr(md5(x), 1, 15))::BIGINT (the corpus hash
    * convention): big-endian first 8 digest bytes, low nibble (the
    * 16th hex digit) dropped. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Register update for one raw value (shared by the estimating and
    * sketch-returning forms): bucket = h mod 64, rank = bit length of
    * the 54-bit remainder; r == 0 -> rank W + 1. */
  private[functions] def updateRegs(regs: Array[Byte], v: Any): Array[Byte] = {
    if (v != null) {
      val h = hash60(v.asInstanceOf[UTF8String].getBytes)
      val b = (h & (M - 1)).toInt
      val r = h >>> P
      val rank = (W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(r))).toByte
      if (rank > regs(b)) regs(b) = rank
    }
    regs
  }

  /** Element-wise register max — HLL's lossless union. */
  private[functions] def mergeRegs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Raw HLL estimate from registers (exact-integer register sum,
    * one double division — see the class doc's determinism notes). */
  private[functions] def estimate(regs: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < M) { s += 1L << (W + 1 - regs(i)); i += 1 }
    (Alpha * M.toDouble * M.toDouble) * Pow2W1 / s.toDouble
  }

  /** Column form: HLL distinct estimate of a string column. */
  def hll(c: Column): Column =
    toColumn(HyperLogLog(toExpression(c)).toAggregateExpression())

  /** Column form: the 64-byte register sketch itself (persistable;
    * union later with [[hllMergeEstimate]]). */
  def hllSketch(c: Column): Column =
    toColumn(HllSketch(toExpression(c)).toAggregateExpression())

  /** Column form: distinct estimate from a group of stored sketches. */
  def hllMergeEstimate(c: Column): Column =
    toColumn(HllMerge(toExpression(c)).toAggregateExpression())
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.HyperLogLog

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is partition-count invariant (merge = single pass)") {
    val vals = (1 to 5000).map(i => s"value_$i")
    val one = vals.toDF("w").repartition(1)
      .agg(HyperLogLog.hll(col("w"))).head.getDouble(0)
    val many = vals.toDF("w").repartition(17)
      .agg(HyperLogLog.hll(col("w"))).head.getDouble(0)
    assert(one == many, "register merge must be exactly order/partition independent")
  }

  test("estimate within expected HLL error for m=64 (~13% rse)") {
    for (n <- Seq(500, 5000, 20000)) {
      val est = (1 to n).map(i => s"v$i").toDF("w")
        .agg(HyperLogLog.hll(col("w"))).head.getDouble(0)
      val err = math.abs(est - n) / n
      assert(err < 0.4, s"n=$n est=$est err=$err")
    }
  }

  test("duplicates do not move the estimate") {
    val base = (1 to 1000).map(i => s"v$i")
    val a = base.toDF("w").agg(HyperLogLog.hll(col("w"))).head.getDouble(0)
    val b = (base ++ base ++ base).toDF("w")
      .agg(HyperLogLog.hll(col("w"))).head.getDouble(0)
    assert(a == b)
  }

  test("CountMin: partition invariant, never underestimates, exact when sparse") {
    import graft.functions.CountMin
    val vals = (1 to 300).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val one = vals.toDF("w").repartition(1)
      .agg(CountMin.cms(col("w")).as("c")).head.getSeq[Long](0)
    val many = vals.toDF("w").repartition(13)
      .agg(CountMin.cms(col("w")).as("c")).head.getSeq[Long](0)
    assert(one == many, "counter merge must be exactly partition independent")
    val sketch = vals.toDF("w").agg(CountMin.cms(col("w")).as("c"))
    val exact = vals.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val est = vals.distinct.toDF("w").crossJoin(sketch)
      .select(col("w"), CountMin.estimate(col("c"), col("w")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, n) =>
      assert(est(w) >= n, s"CMS must never underestimate: $w est=${est(w)} exact=$n")
    }
  }

  test("sketch/merge: union of sketches == sketch of union, bit-for-bit") {
    val a = (1 to 400).map(i => s"u$i")
    val b = (200 to 600).map(i => s"u$i") // overlapping
    val skA = a.toDF("u").agg(HyperLogLog.hllSketch(col("u"))).head.getAs[Array[Byte]](0)
    val skB = b.toDF("u").agg(HyperLogLog.hllSketch(col("u"))).head.getAs[Array[Byte]](0)
    val skU = (a ++ b).toDF("u").agg(HyperLogLog.hllSketch(col("u"))).head.getAs[Array[Byte]](0)
    // element-wise max of the two stored sketches equals the sketch
    // built over the union stream — the mergeable-sketch contract
    assert(skA.zip(skB).map { case (x, y) => math.max(x, y).toByte }.toSeq == skU.toSeq)
    // and the merge AGGREGATE over stored sketches equals the direct
    // estimate over the union
    val merged = Seq(skA, skB).toDF("sk")
      .agg(HyperLogLog.hllMergeEstimate(col("sk"))).head.getDouble(0)
    val direct = (a ++ b).toDF("u").agg(HyperLogLog.hll(col("u"))).head.getDouble(0)
    assert(merged == direct, s"merge=$merged direct=$direct")
    // duplicate-blind: re-feeding a sketch never changes it
    val twice = Seq(skA, skA, skA).toDF("sk")
      .agg(HyperLogLog.hllMergeEstimate(col("sk"))).head.getDouble(0)
    val once = Seq(skA).toDF("sk")
      .agg(HyperLogLog.hllMergeEstimate(col("sk"))).head.getDouble(0)
    assert(twice == once)
  }

  test("CMS merge: sum of per-partition sketches == sketch of union, exactly") {
    import graft.functions.CountMin
    val a = (1 to 200).flatMap(i => Seq.fill(i % 5 + 1)(s"t$i"))
    val b = (100 to 300).map(i => s"t$i")
    val skA = a.toDF("w").agg(CountMin.cms(col("w"))).head.getSeq[Long](0)
    val skB = b.toDF("w").agg(CountMin.cms(col("w"))).head.getSeq[Long](0)
    val skU = (a ++ b).toDF("w").agg(CountMin.cms(col("w"))).head.getSeq[Long](0)
    assert(skA.zip(skB).map(p => p._1 + p._2) == skU,
      "counter sums must commute with the union")
    val merged = Seq(skA.toArray, skB.toArray).toDF("sk")
      .agg(CountMin.cmsMerge(col("sk"))).head.getSeq[Long](0)
    assert(merged == skU, "CmsMerge aggregate must equal the direct sketch")
  }

  test("hash60 equals the corpus md5-60bit convention") {
    // replay ('0x' || substr(md5('abc'), 1, 15))::BIGINT
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(15), 16)
    assert(HyperLogLog.hash60("abc".getBytes("UTF-8")) == expected)
  }
}

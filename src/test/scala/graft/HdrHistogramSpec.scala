package graft

import org.apache.spark.sql.functions._
import graft.functions.HdrHistogram

/** HDR-histogram quantile sketch: bucket math invariants over the
  * full long range, the relative-error guarantee of the quantile
  * read-out, exact merge-invariance (the property that makes the
  * sketch a persistable rollup unit), and the defensive edges
  * (nulls, negatives, width guard, empty input). */
class HdrHistogramSpec extends SparkSpec {
  import spark.implicits._
  import HdrHistogram.{B, K, bucketOf, lowerBoundOf}

  test("bucket math: monotone, contiguous, and within 2^-K relative width") {
    // exhaustive below 2^12, then magnitude sweep to Long.MaxValue
    val small = (0L until 4096L)
    val sweep = (12 to 62).flatMap { e =>
      val base = 1L << e
      Seq(base - 1, base, base + 1, base + (base >> 1), (base << 1) - 1)
    }.filter(_ > 0)
    var prev = -1
    small.foreach { v =>
      val b = bucketOf(v)
      assert(b >= prev, s"non-monotone at $v")
      prev = b
      assert(lowerBoundOf(b) <= v, s"lower bound above value at $v")
      if (b + 1 < B)
        assert(lowerBoundOf(b + 1) > v, s"value $v beyond its bucket")
    }
    (small ++ sweep).foreach { v =>
      val b = bucketOf(v)
      assert(b >= 0 && b < B, s"bucket $b out of range for $v")
      val lb = lowerBoundOf(b)
      assert(lb <= v, s"lb($b)=$lb > $v")
      // relative width: bucket width <= lb * 2^-K above the linear zone
      if (v >= (1L << K)) {
        val width = if (b + 1 < B) lowerBoundOf(b + 1) - lb else Long.MaxValue - lb
        assert(width <= (lb >> K) || b + 1 == B,
          s"bucket $b width $width exceeds ${lb >> K}")
      } else assert(lb == v, "linear zone must be exact")
    }
    assert(bucketOf(-5L) == 0 && bucketOf(0L) == 0, "negatives clamp to bucket 0")
    assert(bucketOf(Long.MaxValue) < B, "max long fits")
  }

  test("sketch quantiles track exact quantiles within the relative-error bound") {
    // mixed magnitudes: latency-like long tail
    val vals = (1 to 2000).map { i =>
      val base = 1L << (i % 40)
      base + (i * 2654435761L) % (base + 1)
    }
    val df = vals.map(Tuple1(_)).toDF("v")
    val row = df.agg(HdrHistogram.hdr(col("v")).as("sk"))
      .select(
        HdrHistogram.quantile(col("sk"), 1, 2).as("p50"),
        HdrHistogram.quantile(col("sk"), 99, 100).as("p99"),
        HdrHistogram.total(col("sk")).as("n"))
      .head()
    val sorted = vals.sorted
    def exact(num: Int, den: Int): Long =
      sorted(((sorted.size.toLong * num + den - 1) / den - 1).toInt)
    assert(row.getAs[Long]("n") == vals.size)
    Seq(("p50", exact(1, 2)), ("p99", exact(99, 100))).foreach { case (c, ex) =>
      val got = row.getAs[Long](c)
      assert(got <= ex, s"$c read-out must be a lower bound: $got > $ex")
      // got is the lower bound of ex's bucket: ex < got * (1 + 2^-K) + 1
      assert(ex <= got + (got >> K) + 1, s"$c: $got too far below exact $ex")
    }
  }

  test("merged per-group sketches equal the directly-built sketch exactly") {
    val vals = (1 to 500).map(i => (s"g${i % 7}", (i * 104729L) % 100000L))
    val df = vals.toDF("g", "v")
    val direct = df.agg(HdrHistogram.hdr(col("v"))).head.getSeq[Long](0)
    val merged = df.groupBy("g").agg(HdrHistogram.hdr(col("v")).as("sk"))
      .agg(HdrHistogram.hdrMerge(col("sk"))).head.getSeq[Long](0)
    assert(merged == direct, "merge must be exactly the union's sketch")
  }

  test("nulls are skipped; empty input yields an all-zero sketch with 0 quantiles") {
    val df = Seq(Some(10L), None, Some(20L)).toDF("v")
    val n = df.agg(HdrHistogram.hdr(col("v")).as("sk"))
      .select(HdrHistogram.total(col("sk"))).head.getLong(0)
    assert(n == 2L, "null must not count")
    val empty = df.filter(col("v") < 0)
      .agg(HdrHistogram.hdr(col("v")).as("sk"))
      .select(HdrHistogram.quantile(col("sk"), 1, 2),
        HdrHistogram.total(col("sk"))).head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("hdrWeighted equals the replicate-by-weight sketch; w<1/null contribute nothing") {
    val rows = Seq((10L, 3L), (100L, 1L), (10L, 2L), (5000L, 4L))
    val weighted = rows.toDF("v", "w")
      .agg(HdrHistogram.hdrWeighted(col("v"), col("w"))).head.getSeq[Long](0)
    val replicated = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
      .map(Tuple1(_)).toDF("v")
      .agg(HdrHistogram.hdr(col("v"))).head.getSeq[Long](0)
    assert(weighted == replicated, "weight w must equal w unit entries")
    val withJunk = (rows.map { case (v, w) => (v, Option(w)) } ++
      Seq((7L, Option(0L)), (7L, Option(-5L)), (7L, Option.empty[Long])))
      .toDF("v", "w")
      .agg(HdrHistogram.hdrWeighted(col("v"), col("w"))).head.getSeq[Long](0)
    assert(withJunk == replicated, "w<1 and null weights must be no-ops")
  }

  test("hdrMerge rejects a wrong-width sketch loudly") {
    val bad = Seq(Tuple1(Array.fill(10)(1L))).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(HdrHistogram.hdrMerge(col("sk"))).collect()
    }
    assert(e.getMessage != null)
  }
}

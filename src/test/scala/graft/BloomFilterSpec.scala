package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFilter

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted value probes true, any partitioning") {
    val vals = (1 to 2000).map(i => s"gram_$i")
    val sketch = vals.toDF("w").repartition(13)
      .agg(BloomFilter.bloom(col("w")).as("bf"))
    val misses = vals.toDF("w").crossJoin(sketch)
      .filter(!BloomFilter.mightContain(col("bf"), col("w")))
      .count()
    assert(misses == 0, "bloom contract: an inserted value can never probe false")
  }

  test("build is partition-count invariant (merge = bitwise OR)") {
    val vals = (1 to 2000).map(i => s"gram_$i")
    val one = vals.toDF("w").repartition(1)
      .agg(BloomFilter.bloom(col("w"))).head.getSeq[Int](0)
    val many = vals.toDF("w").repartition(17)
      .agg(BloomFilter.bloom(col("w"))).head.getSeq[Int](0)
    assert(one == many)
  }

  test("false-positive rate on absent values is near theory, not zero, not runaway") {
    val n = 1000
    val m = 4096
    val sketch = (1 to n).map(i => s"in_$i").toDF("w")
      .agg(BloomFilter.bloom(col("w"), m).as("bf"))
    val probes = 20000
    val fp = (1 to probes).map(i => s"out_$i").toDF("w")
      .crossJoin(sketch)
      .filter(BloomFilter.mightContain(col("bf"), col("w")))
      .count()
    // m=4096, k=3, n=1000: p = (1 - e^(-kn/m))^k ~ 13.9%
    val rate = fp.toDouble / probes
    assert(rate > 0.05 && rate < 0.3, s"fp rate $rate outside sane band")
  }

  test("sized-up filter (32768 bits) drives the same probe set's fp rate down") {
    val n = 1000
    val m = 32768
    val sketch = (1 to n).map(i => s"in_$i").toDF("w")
      .agg(BloomFilter.bloom(col("w"), m).as("bf"))
    val fp = (1 to 20000).map(i => s"out_$i").toDF("w")
      .crossJoin(sketch)
      .filter(BloomFilter.mightContain(col("bf"), col("w")))
      .count()
    // p ~ (1 - e^(-3000/32768))^3 ~ 6.8e-4
    assert(fp.toDouble / 20000 < 0.005, s"fp=$fp")
  }
}

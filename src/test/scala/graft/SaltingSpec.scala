package graft

import org.apache.spark.sql.functions._
import graft.ops.Salting

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals plain groupBy on a skewed key") {
    // one hot key carrying 90% of rows
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    val df = rows.toDF("k", "v")
    val salted = Salting.saltedSumCount(df, Seq("k"), col("v"), col("v"), buckets = 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum(col("v")), count(col("v")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == plain)
    assert(salted("hot")._2 == 9000L)
  }
}

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

  test("salted join equals plain join and spreads the hot key across buckets") {
    val fact = ((1 to 900).map(i => ("hot", i)) ++
      (1 to 100).map(i => (s"k${i % 10}", i)) ++
      Seq(("orphan", -1))).toDF("k", "id")
    val dim = (Seq("hot") ++ (0 until 10).map(i => s"k$i") ++ Seq("unused"))
      .zipWithIndex.map { case (k, i) => (k, s"name$i") }.toDF("k", "kname")

    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val got = Salting.saltedJoin(fact, dim, Seq("k"), col("id"), 8, jt)
      val want = fact.join(dim, Seq("k"), jt)
      assert(got.count() == want.count(), s"count for $jt")
      val gs = got.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      val ws = want.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(gs == ws, s"rows for $jt")
    }
    // the hot key really is spread: >1 distinct salt bucket
    val spread = fact.withColumn("s", pmod(hash(col("id")), lit(8)))
      .filter(col("k") === "hot").select("s").distinct().count()
    assert(spread > 4, s"hot key used only $spread of 8 buckets")

    // non-fact-driven join types are rejected
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(fact, dim, Seq("k"), col("id"), 8, "full_outer")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 7.0)
  ).toDF("k", "id", "v")

  test("top-k per key matches the window/row_number formulation") {
    val got = TopKPerKey.topK(df, Seq(col("k")), Seq(col("v").desc, col("id").asc), 2)
      .orderBy("k", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    // ties on v=30.0 break by id asc: (a,2) then (a,4)
    assert(got.toSeq == Seq(("a", 2L), ("a", 4L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("agrees with window row_number under shuffled partitioning") {
    val big = (1 to 5000).map(i => (s"k${i % 37}", i.toLong, (i * 2654435761L % 997).toDouble))
      .toDF("k", "id", "v").repartition(13)
    val viaPlan = TopKPerKey.topK(big, Seq(col("k")), Seq(col("v").desc, col("id").asc), 3)
      .select("k", "id").orderBy("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val viaWindow = big.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id").orderBy("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaPlan == viaWindow)
  }

  test("physical plan: partial below the exchange, no sort anywhere") {
    val plan = TopKPerKey.topK(df, Seq(col("k")), Seq(col("v").desc, col("id").asc), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.contains("TopKPerKeyPartial"), plan)
    // partial must sit BELOW the exchange (map-side), final above
    val lines = plan.linesIterator.toSeq
    val iFinal = lines.indexWhere(_.contains("TopKPerKeyFinal"))
    val iEx = lines.indexWhere(_.contains("Exchange"))
    val iPartial = lines.indexWhere(_.contains("TopKPerKeyPartial"))
    assert(iFinal < iEx && iEx < iPartial, s"expected Final/Exchange/Partial order:\n$plan")
    assert(!plan.contains("Sort"), s"no sort should appear:\n$plan")
  }

  test("partial emits at most k rows per key per partition") {
    val big = (1 to 1000).map(i => ("hot", i.toLong, i.toDouble)).toDF("k", "id", "v")
      .repartition(4)
    // count what crosses the exchange: partial output == 4 partitions x k
    val planned = TopKPerKey.topK(big, Seq(col("k")), Seq(col("v").desc, col("id").asc), 5)
    // sparkPlan, not executedPlan: AQE wraps the latter in an
    // adaptive root whose children aren't visible until execution
    val partial = planned.queryExecution.sparkPlan.collectFirst {
      case p: graft.plans.TopKPerKey.TopKPerKeyPartialExec => p
    }.get
    assert(partial.execute().count() == 4 * 5)
  }

  test("optimizer rule rewrites window/row_number/filter into the custom plan") {
    graft.plans.TopKPerKey.install(spark)
    val big = (1 to 2000).map(i => (s"k${i % 11}", i.toLong, (i * 2654435761L % 997).toDouble))
      .toDF("k", "id", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id").asc)
    // user writes plain window SQL and projects rn away...
    val q = big.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id", "v")
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rule must fire:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Sort"), plan)
    // ...and the rows are the window rows
    val viaWindow = big.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id").orderBy("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = q.select("k", "id").orderBy("k", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == viaWindow)
  }

  test("rule does NOT fire when the rank column is still referenced") {
    graft.plans.TopKPerKey.install(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("v").desc, col("id").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("k", "id", "rn") // rn survives -> semantics need the window
    val plan = q.queryExecution.sparkPlan.toString
    assert(!plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("global top-k (no PARTITION BY) stays on Spark's native path") {
    graft.plans.TopKPerKey.install(spark)
    // row_number() OVER (ORDER BY ...) with empty partition keys: the
    // rewrite must NOT fire (TopKPerKeyFinal would demand
    // ClusteredDistribution(Nil) and crash planning) — valid SQL that
    // works in stock Spark must keep working with extensions on
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("id").asc)
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("k", "id")
    val plan = q.queryExecution.sparkPlan.toString // planning must not throw
    assert(!plan.contains("TopKPerKeyFinal"), plan)
    val got = q.orderBy("id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("a", 3L), ("a", 4L))) // v=30,30,20 top-3
  }

  test("extensions class registers the strategy") {
    // the spark.sql.extensions route: constructing and applying must
    // succeed (strategy list itself is private[sql]; the functional
    // path is exercised through install() in the tests above)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions()(ext)
  }
}

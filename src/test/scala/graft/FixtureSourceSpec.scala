package graft

import org.apache.spark.sql.functions._
import graft.domain.Fixtures

class FixtureSourceSpec extends SparkSpec {

  private def read(table: String) =
    spark.read.format("graft.sources.FixtureSource")
      .option("table", table).load()

  test("DSv2 source reads fixture tables with correct schema and rows") {
    val df = read("modon")
    assert(df.schema == Fixtures.modonSchema)
    assert(df.count() == Fixtures.modonDf(spark).count())
    val wk = read("modon_wk")
    assert(wk.count() == Fixtures.modonWkDf(spark).count())
  }

  test("filters are pushed into the scan and evaluated by the reader") {
    val df = read("modon").filter(col("farm_no") === 3 && col("out_dt") === "99991231")
    // the scan description must report the pushed predicates
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("farm_no"), scan.take(800))
    val expected = Fixtures.modonDf(spark)
      .filter(col("farm_no") === 3 && col("out_dt") === "99991231").count()
    assert(df.count() == expected)
  }

  test("column pruning reaches the reader (ReadSchema narrows)") {
    val df = read("modon_wk").select("farm_no", "pig_no")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<farm_no:int,pig_no:string>"), scan.take(800))
    assert(df.distinct().count() > 0)
  }

  test("micro-batch stream replays all rows in offset-tracked chunks") {
    import java.nio.file.Files
    val chk = Files.createTempDirectory("graft_src_chk").toString
    val stream = spark.readStream.format("graft.sources.FixtureSource")
      .option("table", "modon_wk").option("rowsPerBatch", "37").load()
    val q = stream.writeStream
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("fixture_stream").start()
    q.awaitTermination()
    val streamed = spark.table("fixture_stream").count()
    assert(streamed == Fixtures.modonWkDf(spark).count(),
      "every fixture row must arrive exactly once across micro-batches")
    assert(q.recentProgress.length > 1, "rowsPerBatch must yield multiple batches")
  }

  test("global COUNT(*) pushes into the source (answered without row streaming)") {
    val df = read("modon_wk").filter(col("farm_no") === 1).agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FixtureCountScan") || plan.contains("PushedAggregates"),
      plan.take(900))
    assert(df.head.getLong(0) ==
      Fixtures.modonWkDf(spark).filter(col("farm_no") === 1).count())
  }

  test("grouped COUNT(*) pushes down completely (one row per group from the source)") {
    val df = read("modon_wk").groupBy("farm_no").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FixtureCountScan") && plan.contains("PushedGroupBy"),
      plan.take(900))
    val got = df.orderBy("farm_no")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val expected = Fixtures.modonWkDf(spark).groupBy("farm_no").count()
      .orderBy("farm_no").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("grouped COUNT(*) pushdown is COMPLETE: no aggregate exec remains (ADVICE r2)") {
    // Spark asks supportCompletePushDown BEFORE pushAggregation; the
    // answer must come from the passed Aggregation, not internal state,
    // or the plan silently keeps a redundant final HashAggregate
    val df = read("modon_wk").groupBy("farm_no").agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FixtureCountScan"), plan.take(900))
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown must remove the final aggregate:\n${plan.take(900)}")
  }

  test("pushed In filter containing a null comparand matches SQL semantics (ADVICE r2)") {
    val df = read("modon_wk").filter(col("farm_no").isin(1, null))
    val expected = Fixtures.modonWkDf(spark).filter(col("farm_no").isin(1, null)).count()
    assert(df.count() == expected) // reader must not crash on the null literal
  }

  test("query results agree with the DataFrame fixture rendering") {
    val viaSource = read("modon_wk").filter(col("wk_gubun") === "G")
      .groupBy("farm_no").count().orderBy("farm_no")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val viaDf = Fixtures.modonWkDf(spark).filter(col("wk_gubun") === "G")
      .groupBy("farm_no").count().orderBy("farm_no")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(viaSource == viaDf)
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.WeeklyReportJob

class WeeklyReportJobSpec extends SparkSpec {

  test("assembles all sections into the SUB schema and one summary row per farm") {
    val out = Files.createTempDirectory("graft_week").toString
    WeeklyReportJob.run(spark, out)

    val sub = spark.read.parquet(s"$out/week_sub")
    val byGubun = sub.groupBy("gubun").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGubun("MODON") == 20)  // 2 farms x 10 parity rows
    assert(byGubun("GB") == 16)     // 2 farms x 8 buckets
    assert(byGubun("SHIP") == 14)   // 2 farms x 7 days
    assert(byGubun.contains("DOPE"))

    val summary = spark.read.parquet(s"$out/week_summary")
    assert(summary.count() == 2)
    val farm1 = summary.filter(col("farm_no") === 1).collect()(0)
    assert(farm1.getAs[Long]("sow_total") > 0)
    assert(farm1.getAs[Long]("bm_cnt") >= 0)

    // rerun is idempotent (partition overwrite, not append)
    val before = sub.count()
    WeeklyReportJob.run(spark, out)
    assert(spark.read.parquet(s"$out/week_sub").count() == before)
  }

  test("summary section values agree with the standalone section queries") {
    val s = WeeklyReportJob.summary(spark).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("eu_dusu")).toMap
    val q63 = QueryCatalogDomain.q63Weaning(spark, "").collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("sum_eudusu")).toMap
    assert(s == q63)
  }
}

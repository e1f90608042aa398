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
    assert(byGubun("MODON") == 30)  // 3 farms x 10 parity rows
    assert(byGubun("GB") == 24)     // 3 farms x 8 buckets (farm 3 all-zero)
    assert(byGubun("SHIP") == 14)   // 2 farms x 7 days (farm 3 has no slaughter rows)
    assert(byGubun.contains("DOPE"))

    val summary = spark.read.parquet(s"$out/week_summary")
    assert(summary.count() == 3)    // farm 3 present with NULL section values
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
    // farm 3 has no weaning rows in the window: NULL in the summary's
    // left join, absent from the standalone section — compare common
    q63.foreach { case (farm, v) => assert(s(farm) == v) }
    assert(s.get(3).forall(_ == 0L), "farm 3's NULL unboxes to 0")
  }
}

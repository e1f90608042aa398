package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.MetricsLog
import graft.sinks.Sinks

class MetricsCompactSpec extends SparkSpec {
  import spark.implicits._

  test("MetricsLog captures stage and job metrics for a real query") {
    val log = new MetricsLog().install(spark)
    try {
      (1 to 10000).toDF("x").groupBy(col("x") % 7).count().collect()
      // listener events are posted asynchronously; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (log.stageSnapshot(spark).isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val stages = log.stageSnapshot(spark)
      assert(stages.count() >= 2, "groupBy needs at least map+reduce stages")
      assert(stages.filter(col("shuffleWriteBytes") > 0).count() >= 1,
        "the map stage must record shuffle write")
      val jobs = log.jobSnapshot(spark).collect()
      assert(jobs.nonEmpty && jobs.forall(_.getLong(3) >= 0))
    } finally spark.sparkContext.removeSparkListener(log)
  }

  test("compact rewrites many small files into few, preserving rows") {
    val path = Files.createTempDirectory("graft_compact").toString + "/t"
    (1 to 5000).toDF("x").repartition(64).write.parquet(path)
    def parts = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 64)
    Sinks.compact(spark, path, targetMb = 128)
    assert(parts <= 2, s"expected few files after compaction, got $parts")
    assert(spark.read.parquet(path).count() == 5000)
    assert(spark.read.parquet(path).agg(sum("x")).head.getLong(0) == 5000L * 5001 / 2)
  }
}

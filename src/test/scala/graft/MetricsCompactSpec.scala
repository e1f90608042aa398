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

  test("writeSorted produces range-disjoint files that prune selective scans") {
    val path = Files.createTempDirectory("graft_sorted").toString + "/t"
    val df = (1 to 100000).map(i => (i % 365, i.toLong)).toDF("day", "id")
    Sinks.writeSorted(df, path, Seq("day"), nFiles = 8)
    // each file's day-range must be disjoint: read per-file min/max
    val perFile = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("day"))
      .groupBy("f").agg(min("day").as("lo"), max("day").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(perFile.length == 8)
    perFile.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"file ranges must not interleave: $perFile")
    }
    // a selective filter must read back correct results (stats-pruned)
    assert(spark.read.parquet(path).filter(col("day") === 17).count() ===
      df.filter(col("day") === 17).count())
  }

  test("writeZOrdered bounds per-file ranges in BOTH dimensions") {
    val path = Files.createTempDirectory("graft_z").toString + "/t"
    // a 256x256 grid: a 1-D sort on x would leave y spanning the
    // full range in every file
    val df = (0 until 65536).map(i => (i % 256, i / 256)).toDF("x", "y")
    Sinks.writeZOrdered(df, path, "x", "y", nFiles = 16)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(perFile.length == 16)
    val avgSx = perFile.map(_._1).sum.toDouble / perFile.length
    val avgSy = perFile.map(_._2).sum.toDouble / perFile.length
    // z-order: both dims bounded well below the global span of 255
    assert(avgSx < 160 && avgSy < 160, s"avg spans sx=$avgSx sy=$avgSy")
    assert(spark.read.parquet(path).count() == 65536)
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

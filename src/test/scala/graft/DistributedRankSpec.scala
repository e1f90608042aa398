package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.DistributedRank

/** Two-phase distributed rank: equivalence with the single-task
  * window on skewed strata, global (no-stratum) ranks, descending
  * orders, and the plan guarantee that no Window operator — hence no
  * single-task-per-stratum sort — appears anywhere in the physical
  * plan. */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  test("per-stratum rank matches the window rank on a skewed stratum") {
    // 'en' dominates (the real language skew); ranks must still be the
    // exact per-stratum row_number
    val rows = (1 to 200).map(i => (i.toLong, if (i % 20 == 0) "ko" else "en")) ++
      Seq((201L, "de"))
    val df = rows.toDF("id", "lang")
      .withColumn("h", conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long"))
    val got = DistributedRank.rank(df, Seq("lang"), Seq(col("h"), col("id")), "rk", numParts = 7)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rk",
        row_number().over(Window.partitionBy("lang").orderBy("h", "id")))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == want)
  }

  test("global rank (no strata) with a descending order matches orderBy position") {
    val df = Seq(5L, 3L, 9L, 1L, 7L, 9L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = DistributedRank.rank(df, Seq.empty, Seq(col("v").desc, col("id")), "rk", numParts = 3)
      .orderBy("rk").select("id").collect().map(_.getLong(0)).toSeq
    val want = df.orderBy(col("v").desc, col("id")).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("plan contains no Window operator (no single-task stratum sort)") {
    val df = (1 to 50).map(i => (i.toLong, "en")).toDF("id", "lang")
    val ranked = DistributedRank.rank(df, Seq("lang"), Seq(col("id")), "rk")
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
  }

  test("totalCol emits each stratum's exact size without a second pass") {
    val df = (1 to 30).map(i => (i.toLong, if (i <= 20) "a" else "b")).toDF("id", "s")
    val out = DistributedRank.rank(df, Seq("s"), Seq(col("id")), "rk",
        numParts = 4, totalCol = "n")
      .select("s", "n").distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 20L, "b" -> 10L))
  }

  test("ranks are invariant to input partitioning and partition count") {
    // the rank must be a pure function of (strata, order) — not of how
    // the input happened to be laid out or how many range partitions
    // the two-phase pass used
    val df = (1 to 120).map(i => (i.toLong, s"s${i % 2}")).toDF("id", "lang")
    def run(src: org.apache.spark.sql.DataFrame, parts: Int) =
      DistributedRank.rank(src, Seq("lang"), Seq(col("id")), "rk", numParts = parts)
        .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = run(df, 3)
    assert(run(df.repartition(11), 3) == base, "input layout must not matter")
    assert(run(df, 7) == base, "range partition count must not matter")
    assert(run(df.orderBy(col("id").desc), 5) == base, "input order must not matter")
  }

  test("null stratum values form their own stratum; empty input yields empty output") {
    val df = Seq((1L, Option("en")), (2L, Option.empty[String]),
      (3L, Option("en")), (4L, Option.empty[String])).toDF("id", "lang")
    val got = DistributedRank.rank(df, Seq("lang"), Seq(col("id")), "rk", numParts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // en: ids 1,3 -> ranks 1,2; null: ids 2,4 -> ranks 1,2
    assert(got == Map(1L -> 1L, 3L -> 2L, 2L -> 1L, 4L -> 2L))
    val empty = DistributedRank.rank(df.filter(col("id") < 0), Seq("lang"),
      Seq(col("id")), "rk")
    assert(empty.count() == 0 && empty.columns.contains("rk"))
  }

  test("prefixSum matches the window prefix sum on a skewed stratum, nulls contribute 0") {
    // 'en' dominates; the inclusive running token sum must equal the
    // single-task window's bit-for-bit, including null values (-> 0)
    val rows = (1 to 200).map { i =>
      val v: java.lang.Long = if (i % 13 == 0) null else java.lang.Long.valueOf(i % 7 + 1)
      (i.toLong, if (i % 20 == 0) "ko" else "en", v)
    }
    val df = rows.toDF("id", "lang", "v")
      .withColumn("q", conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long"))
    val got = DistributedRank.prefixSum(df, Seq("lang"),
        Seq(col("q").desc, col("id")), "v", "cum", numParts = 7)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("lang").orderBy(col("q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("prefixSum totalCol carries each stratum's full sum; non-long valueCol rejected") {
    val df = Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L)).toDF("id", "s", "v")
    val out = DistributedRank.prefixSum(df, Seq("s"), Seq(col("id")), "v", "cum",
        numParts = 2, totalCol = "tot")
      .select("s", "tot").distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 15L, "b" -> 7L))
    val bad = df.withColumn("vi", col("v").cast("int"))
    intercept[IllegalArgumentException] {
      DistributedRank.prefixSum(bad, Seq("s"), Seq(col("id")), "vi", "cum")
    }
  }

  test("non-atomic stratum columns are rejected up front") {
    // array strata would be compared by reference in the driver's
    // offset map — silently fragmenting ranks; must fail loudly
    val df = Seq((1L, Seq("a")), (2L, Seq("a"))).toDF("id", "tags")
    intercept[IllegalArgumentException] {
      DistributedRank.rank(df, Seq("tags"), Seq(col("id")), "rk")
    }
  }

  test("materializeInput gives identical results and releases the checkpoint storage") {
    val df = (1 to 150).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "lang")
    val plain = DistributedRank.rank(df, Seq("lang"), Seq(col("id")), "rk", numParts = 4)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mat = DistributedRank.rank(df, Seq("lang"), Seq(col("id")), "rk",
      numParts = 4, materializeInput = true)
    assert(mat.select("id", "rk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == plain)
    // the leaf checkpoint must be freed by the time rank() returns —
    // same zero-cached-partitions accounting as ConnectedComponentsSpec
    val cached = spark.sparkContext.getRDDStorageInfo.filter(_.numCachedPartitions > 0)
    assert(cached.isEmpty,
      s"checkpoint storage leaked: ${cached.map(_.name).mkString(", ")}")
  }

  test("ntile/percentRank/cumeDist projections match Spark's own window functions") {
    // the three SQL rank functions as pure (rank, total) projections —
    // must equal the engine's window forms under a total order,
    // including the total<k ntile edge and the 1-row-stratum
    // percent_rank edge. The window here is the TEST oracle only.
    val rows = (1 to 83).map(i => (i.toLong, if (i <= 70) "en" else if (i <= 82) "ko" else "de",
      (i * 37 % 11).toLong))
    val df = rows.toDF("id", "lang", "v")
    val got = DistributedRank.rank(df, Seq("lang"), Seq(col("v").desc, col("id")), "rk",
        numParts = 5, totalCol = "n")
      .select(col("id"),
        DistributedRank.ntile(col("rk"), col("n"), 7).as("t7"),
        DistributedRank.ntile(col("rk"), col("n"), 20).as("t20"), // > de's 1 row, > ko's 12
        DistributedRank.percentRank(col("rk"), col("n")).as("pr"),
        DistributedRank.cumeDist(col("rk"), col("n")).as("cd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val w = Window.partitionBy("lang").orderBy(col("v").desc, col("id"))
    val want = df.select(col("id"),
        ntile(7).over(w).cast("long").as("t7"),
        ntile(20).over(w).cast("long").as("t20"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want)
  }

  test("ranks are dense 1..n within every stratum") {
    val df = (1 to 97).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "lang")
    val out = DistributedRank.rank(df, Seq("lang"), Seq(col("id")), "rk", numParts = 5)
    val perStratum = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"),
        countDistinct("rk").as("d"))
      .collect()
    perStratum.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("n") &&
        r.getAs[Long]("d") == r.getAs[Long]("n"), r.toString)
    }
  }
}

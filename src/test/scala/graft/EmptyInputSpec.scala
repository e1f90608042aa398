package graft

/** The empty-partition day: every catalog query must PLAN AND RUN on a
  * zero-row corpus without throwing — no .head() on an empty seed
  * frame, no divide-crash, no NoSuchElementException from a collect.
  * A daily pipeline sees this the first time an upstream lands late;
  * at 100 TB a query that only works on non-empty input is a paging
  * incident. (Results are whatever the semantics give on ∅ — usually
  * 0 rows; the assertion here is completion, the oracle gate covers
  * values.) */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sf0").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every catalog query completes on a zero-row corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on empty input:\n" +
      failures.mkString("\n"))
  }
}

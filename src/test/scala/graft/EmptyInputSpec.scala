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

  private def sliced(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_sf$rows").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(rows).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String, label: String): Unit = {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on $label input:\n" +
      failures.mkString("\n"))
  }

  test("every catalog query completes on a zero-row corpus") {
    sweep(sliced(0), "empty")
  }

  test("every catalog query completes on a one-row corpus") {
    // n=1 breaks different math than n=0: sample variance (n-1),
    // one-sided splits (TV vs an empty half), degenerate partitions
    // (ARI denominator) — this sweep found and now guards all three
    sweep(sliced(1), "single-row")
  }

  test("every catalog query completes on an all-null-text corpus") {
    // text = NULL everywhere: every tokenizer/hash/decode path must
    // take its null branch — this sweep found four NPEs in the
    // multimodal fixture/decode paths (now guarded: null text on the
    // corrupt branch -> empty payload -> ok='N'; null payload ->
    // null features, matching DuckDB's md5(NULL))
    import org.apache.spark.sql.functions._
    val dir = sliced(50)
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text", lit(null).cast("string")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents2.parquet")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/documents2.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"))
    sweep(dir, "all-null-text")
  }

  test("every catalog query completes on an all-identical-text corpus") {
    // the adversarial dedup input: every doc is the same text, so
    // every LSH bucket is maximally hot, every pair is a duplicate,
    // and CC sees one giant clique — bucket caps and the hot-shingle
    // df caps must keep this bounded, not explode quadratically
    import org.apache.spark.sql.functions._
    val dir = sliced(100)
    val same = lit("the same exact text every single document carries " +
      "in this degenerate corpus today")
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text", same).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents2.parquet")
    // swap in place (overwrite of the read path is unsafe)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/documents2.parquet"),
      new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"))
    sweep(dir, "all-identical-text")
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sinks.Sinks
import graft.streaming.StreamingJobs

class SinksStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("overwritePartitions rewrites only the touched partitions (S5/S8)") {
    val path = tmp() + "/t"
    Seq((1, "d1", 10), (2, "d1", 20), (3, "d2", 30))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(path)
    // new batch touches only d1
    Sinks.overwritePartitions(
      Seq((9, "d1", 99)).toDF("id", "day", "v"), path, Seq("day"))
    val out = spark.read.parquet(path).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(2), r.getInt(1)))
    assert(out.toSeq == Seq((3, "d2", 30), (9, "d1", 99)))
  }

  test("activesStream: HLL sketch state per window matches the batch estimate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF.toDF("ts", "user_id")
    val agg = StreamingJobs.activesStream(events, "ts", "10 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("actives")
      .outputMode("update").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // window 10:00-10:10 sees users 1..40 across TWO batches (state
    // must carry the registers between micro-batches), incl. repeats
    mem.addData((1 to 25).map(i => (t(1), i.toLong)): _*)
    q.processAllAvailable()
    mem.addData((10 to 40).map(i => (t(5), i.toLong)): _*)
    q.processAllAvailable()
    // the update-mode memory sink keeps one row PER BATCH EMISSION of
    // the same window; HLL registers only ever grow, so the window's
    // final state is its MAX estimate — selecting by order would
    // nondeterministically read the stale batch-1 row
    val streamed = spark.table("actives")
      .filter(col("win_start") === t(0))
      .agg(max(col("n_active_est"))).head.getDouble(0)
    val batch = (1 to 40).map(_.toString).toDF("u")
      .agg(graft.functions.HyperLogLog.hll(col("u"))).head.getDouble(0)
    q.stop()
    assert(streamed == batch,
      s"stream state registers must equal the batch sketch: $streamed vs $batch")
  }

  test("quantileStream: HDR sketch state per window matches the batch read-out") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF.toDF("ts", "v")
    val agg = StreamingJobs.quantileStream(events, "ts", "v", "10 minutes", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("quants")
      .outputMode("update").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // one window fed across TWO micro-batches: counters must carry
    val vs1 = (1 to 30).map(i => (i * 97L) % 5000L)
    val vs2 = (31 to 80).map(i => (i * 97L) % 5000L)
    mem.addData(vs1.map(v => (t(2), v)): _*)
    q.processAllAvailable()
    mem.addData(vs2.map(v => (t(7), v)): _*)
    q.processAllAvailable()
    // update-mode memory sink keeps a row per emission; counts only
    // grow, so the window's final state is the max-n row
    val row = spark.table("quants").filter(col("win_start") === t(0))
      .orderBy(col("n").desc).head()
    q.stop()
    val batch = (vs1 ++ vs2).map(Tuple1(_)).toDF("v")
      .agg(graft.functions.HdrHistogram.hdr(col("v")).as("sk"))
      .select(graft.functions.HdrHistogram.quantile(col("sk"), 1, 2),
        graft.functions.HdrHistogram.quantile(col("sk"), 99, 100),
        graft.functions.HdrHistogram.total(col("sk"))).head()
    assert(row.getAs[Long]("n") == batch.getLong(2))
    assert(row.getAs[Long]("p50") == batch.getLong(0) &&
      row.getAs[Long]("p99") == batch.getLong(1),
      "streamed sketch read-outs must equal the batch backfill's")
  }

  test("upsertParquet merges on key with incoming-wins (S7)") {
    val path = tmp() + "/t"
    Sinks.upsertParquet(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), path, Seq("k"))
    Sinks.upsertParquet(spark, Seq((2, "B"), (3, "c")).toDF("k", "v"), path, Seq("k"))
    val out = spark.read.parquet(path).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("upsertParquet recovers an interrupted swap from __old (ADVICE r1)") {
    import org.apache.hadoop.fs.Path
    val path = tmp() + "/t"
    Sinks.upsertParquet(spark, Seq((1, "a")).toDF("k", "v"), path, Seq("k"))
    // simulate a crash between rename(target,__old) and rename(__staging,target)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(path), new Path(path + "__old"))
    fs.mkdirs(new Path(path + "__staging")) // stale, never-committed batch
    Sinks.upsertParquet(spark, Seq((2, "b")).toDF("k", "v"), path, Seq("k"))
    val out = spark.read.parquet(path).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "a"), (2, "b")), "pre-crash rows must survive recovery")
  }

  test("job log appends rows (S9)") {
    val path = tmp() + "/log"
    Sinks.appendJobLog(spark, path, "weekly", "COMPLETE", 1234L)
    Sinks.appendJobLog(spark, path, "weather", "ERROR", 55L)
    val out = spark.read.parquet(path)
    assert(out.count() == 2)
    assert(out.filter(col("status") === "ERROR").count() == 1)
  }

  test("driftStream: per-window TV against a static reference equals the batch formula") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("ts", "text")
    // reference distribution: {a: 3, b: 1}, N_ref = 4
    val ref = Seq(("a", 3L), ("b", 1L)).toDF("t", "c_ref")
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val store = tmp() + "/drift"
    // window 10:00-10:10 sees "a b b" + "c" split across two rows;
    // the 11:30 sentinel pushes the watermark past 10:10 so the
    // append-mode aggregation finalizes and emits the window
    mem.addData((t(10, 1), "a b"), (t(10, 4), "b c"), (t(11, 30), "zzz"))
    val q = StreamingJobs.driftStream(docs, "ts", "text", ref, nRef = 4L,
      windowLen = "10 minutes", watermark = "5 minutes",
      targetPath = store, checkpoint = tmp() + "/ckp")
    q.awaitTermination()
    val got = spark.read.parquet(store)
      .filter(col("win_start") === t(10, 0)).collect()
    assert(got.length == 1, s"exactly one drift row per finalized window: ${got.length}")
    // batch replay of the same formula: c_w = {a:1, b:2, c:1}, n_w = 4
    // num = |1*4-3*4| + |2*4-1*4| + |1*4-0*4| + (4 - (3+1))*4 = 8+4+4+0 = 16
    // tv = 16 / (2*4*4) = 0.5
    assert(got(0).getAs[Long]("n_w") == 4L)
    assert(got(0).getAs[Double]("tv") == 0.5, s"tv ${got(0).getAs[Double]("tv")}")
    // identical-to-reference window: stream a window whose counts ARE the
    // reference -> tv must be exactly 0
    val mem2 = MemoryStream[(java.sql.Timestamp, String)]
    val store2 = tmp() + "/drift2"
    mem2.addData((t(10, 2), "a a a b"), (t(11, 30), "zzz"))
    val q2 = StreamingJobs.driftStream(mem2.toDF().toDF("ts", "text"),
      "ts", "text", ref, nRef = 4L, windowLen = "10 minutes",
      watermark = "5 minutes", targetPath = store2, checkpoint = tmp() + "/ckp2")
    q2.awaitTermination()
    val z = spark.read.parquet(store2).filter(col("win_start") === t(10, 0)).collect()
    assert(z.length == 1 && z(0).getAs[Double]("tv") == 0.0,
      "a window that matches the reference distribution has zero drift")
  }

  test("decontaminateStream flags docs containing eval windows, map-only") {
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    // benchmark: one eval doc; its every 8-char window goes in the sketch
    val eval = Seq("the secret eval answer is fortytwo").toDF("text")
    val sketch = StreamingJobs.evalWindowSketch(eval, "text", k)
    val mem = MemoryStream[(Long, String)]
    // doc 1 copies an eval span (> k chars -> several leaked windows),
    // doc 2 is clean, doc 3 shorter than k (no windows -> accept)
    mem.addData((1L, "prefix the secret eval answer suffix"),
      (2L, "completely unrelated text with no overlap whatsoever"),
      (3L, "tiny"))
    val out = StreamingJobs.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), sketch, k, maxLeaked = 0)
    val q = out.writeStream.format("memory").queryName("decon")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("decon").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_leaked"), r.getAs[String]("accept"))).toMap
    assert(got(1L)._1 > 0 && got(1L)._2 == "N", s"copied span must flag: $got")
    assert(got(2L) == (0, "Y"), s"clean doc must pass: $got")
    assert(got(3L) == (0, "Y"), s"short doc has no windows: $got")
    // no false negatives on a full verbatim copy of the benchmark
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((9L, "the secret eval answer is fortytwo"))
    val out2 = StreamingJobs.decontaminateStream(
      mem2.toDF().toDF("doc_id", "text"), sketch, k, maxLeaked = 0)
    val q2 = out2.writeStream.format("memory").queryName("decon2")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val full = spark.table("decon2").head()
    // 34 chars -> 27 windows, every one in the sketch
    assert(full.getAs[Int]("n_leaked") == 27 && full.getAs[String]("accept") == "N")
  }

  test("streaming windowed aggregation with watermark (§2.9)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingJobs.windowedCounts(events, "ts", "10 minutes", "30 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
    mem.addData((t("01"), "click", 1.0), (t("03"), "click", 2.0), (t("12"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select("event_type", "n").orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    q.stop()
    assert(rows.toSeq == Seq(("click", 2L), ("view", 1L)))
  }

  test("stream-stream interval join attributes clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val impMem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val clkMem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val joined = StreamingJobs.intervalJoinStream(
      impMem.toDF().toDF("user_id", "imp_id", "i_ts"),
      clkMem.toDF().toDF("user_id", "click_id", "c_ts"),
      joinWindow = "15 minutes", watermark = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib").start()
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
    impMem.addData((1L, "i1", t("00")), (1L, "i2", t("20")), (2L, "i3", t("00")))
    clkMem.addData(
      (1L, "c1", t("05")),  // in i1's window only
      (1L, "c2", t("25")),  // in i2's window only (i1+15min = 10:15 < 10:25)
      (2L, "c3", t("40")),  // 40 min after i3 — outside its window
      (3L, "c4", t("05")))  // no impression for user 3
    q.processAllAvailable()
    val got = spark.table("attrib")
      .select("imp_id", "click_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    q.stop()
    assert(got == Set(("i1", "c1"), ("i2", "c2")), got.toString)
    // the stream result must equal the batch interval join on the same rows
    import spark.implicits._
    val iB = Seq((1L, "i1", t("00")), (1L, "i2", t("20")), (2L, "i3", t("00")))
      .toDF("user_id", "imp_id", "i_ts")
    val cB = Seq((1L, "c1", t("05")), (1L, "c2", t("25")), (2L, "c3", t("40")),
      (3L, "c4", t("05"))).toDF("c_user", "click_id", "c_ts")
    val batch = iB.join(cB, col("user_id") === col("c_user") &&
        col("c_ts") >= col("i_ts") &&
        col("c_ts") <= col("i_ts") + expr("interval 15 minutes"))
      .select("imp_id", "click_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == batch, "stream/batch parity")
  }

  test("mapGroupsWithState keeps per-key state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val out = graft.streaming.StreamingJobs.runningCounts(mem.toDS())
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("running").start()
    mem.addData((1L, 1.0), (1L, 2.0), (2L, 3.0))
    q.processAllAvailable()
    mem.addData((1L, 4.0))
    q.processAllAvailable()
    val rows = spark.table("running")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains((1L, 2L, 2L))) // batch 1
    assert(rows.contains((1L, 1L, 3L))) // batch 2: state carried the 2
    assert(rows.contains((2L, 1L, 1L)))
  }

  test("streaming exact dedup drops re-ingested duplicates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    val docs = mem.toDF().toDF("ts", "doc_key", "text")
    val out = StreamingJobs.dedupStream(docs, "ts", Seq("doc_key"), "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
    mem.addData((t("01"), "a", "first"), (t("02"), "b", "second"))
    q.processAllAvailable()
    mem.addData((t("03"), "a", "dup-of-first"), (t("04"), "c", "third"))
    q.processAllAvailable()
    val keys = spark.table("dedup_stream")
      .select("doc_key").collect().map(_.getString(0)).sorted
    q.stop()
    assert(keys.toSeq == Seq("a", "b", "c"), "duplicate 'a' must be dropped")
  }

  test("streaming classifier scoring is bit-identical to the batch scorer") {
    import graft.ops.text.ProfileClassifier
    implicit val sqlCtx = spark.sqlContext
    val labeled = Seq(
      ("low", "clickbait clickbait spam now"), ("low", "clickbait free spam"),
      ("mid", "survey results survey data"), ("mid", "survey of methods"),
      ("high", "theorem proof lemma"), ("high", "theorem theorem holds"))
      .toDF("label", "text")
    val model = ProfileClassifier.train(labeled, "text", "label")
    val row = ProfileClassifier.modelRow(model)
    val incoming = Seq(
      (1L, "clickbait spam spam"), (2L, "a survey of data"),
      (3L, "proof of the theorem"), (4L, "nothing in vocabulary"),
      (5L, null.asInstanceOf[String]))
    // batch answer (null text handled: zero overlap -> smallest label)
    val batch = ProfileClassifier.classify(
        incoming.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // stream answer over two micro-batches
    val mem = MemoryStream[(Long, String)]
    val q = StreamingJobs.classifyStream(
        mem.toDF().toDF("doc_id", "text"), "text", row)
      .select("doc_id", "pred", "a_pred")
      .writeStream.outputMode("append").format("memory")
      .queryName("classify_stream").start()
    mem.addData(incoming.take(2): _*)
    q.processAllAvailable()
    mem.addData(incoming.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("classify_stream")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    q.stop()
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(batch(1L)._1 == "low" && batch(2L)._1 == "mid" &&
      batch(3L)._1 == "high", s"planted classes must score right: $batch")
  }

  test("streaming decontamination: static bloom sketch prefilters every micro-batch") {
    import graft.functions.BloomFilter
    implicit val sqlCtx = spark.sqlContext
    // the eval reference is STATIC: build its sketch once, probe per batch
    val m = 4096
    val evalSketch = Seq("the quick fox", "lazy dog sleeps")
      .toDF("w").agg(BloomFilter.bloom(col("w"), m).as("bf"))
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "gram")
    val flagged = docs.crossJoin(evalSketch)
      .filter(BloomFilter.mightContain(col("bf"), col("gram")))
      .select("doc_id", "gram")
    val q = flagged.writeStream.outputMode("append")
      .format("memory").queryName("bloom_decon").start()
    mem.addData((1L, "the quick fox"), (2L, "unrelated text here"))
    q.processAllAvailable()
    mem.addData((3L, "lazy dog sleeps"), (4L, "more clean grams"))
    q.processAllAvailable()
    val hits = spark.table("bloom_decon")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    q.stop()
    // no false negatives across batches; the clean grams may only leak
    // through as (rare, deterministic) false positives — none at m=4096/n=2
    assert(hits.toSeq == Seq(1L, 3L),
      s"contaminated grams must flag in their own micro-batch: ${hits.toSeq}")
  }

  test("session windows close on gap (sessionization §2.9)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "value")
    val agg = StreamingJobs.sessionCounts(events, "ts", "5 minutes", "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sessions").start()
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
    // user 1: events at :01 and :03 (one session), then :30 (a new one)
    mem.addData((t("01"), 1L, 1.0), (t("03"), 1L, 2.0), (t("30"), 1L, 4.0))
    q.processAllAvailable()
    val rows = spark.table("sessions")
      .select("user_id", "n", "sum_value").orderBy("sess_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(rows.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 4.0)))
  }

  test("streaming near-dup dedup: store probe drops cross- and intra-batch near-dups") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp() + "/store"
    val curated = tmp() + "/curated"
    val chk = tmp() + "/chk"
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark query engines and shuffles in production"
    // batch 1: two distinct docs + an intra-batch near-dup of doc 1
    mem.addData((1L, base), (2L, other),
      (3L, base.replace("today", "tonight")))
    StreamingJobs.nearDupStream(df, store, curated, chk).awaitTermination()
    // batch 2: a cross-batch near-dup of doc 1 with a SMALLER id than
    // the stored doc (the pair-order regression: store id >= batch id
    // must still match), an exact re-ingest of doc 2, and a new doc
    mem.addData((0L, base.replace("today", "this morning")), (11L, other),
      (12L, "entirely novel content with no overlap at all whatsoever anywhere in sight"))
    StreamingJobs.nearDupStream(df, store, curated, chk).awaitTermination()
    val ids = spark.read.parquet(curated)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 12L),
      s"3 drops in-batch, 0/11 vs store, 12 novel — got ${ids.toSeq}")
  }

  test("near-dup stream with a BUCKETED store table equals the parquet-store run, across a catalog restart") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark query engines and shuffles in production"
    val batch1 = Seq((1L, base), (2L, other), (3L, base.replace("today", "tonight")))
    val batch2 = Seq((0L, base.replace("today", "this morning")), (11L, other),
      (12L, "entirely novel content with no overlap at all whatsoever anywhere in sight"))
    def run(storeTable: Option[String], dropCatalogBetweenBatches: Boolean): Seq[Long] = {
      val store = tmp() + "/store"
      val curated = tmp() + "/curated"
      val chk = tmp() + "/chk"
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      mem.addData(batch1: _*)
      StreamingJobs.nearDupStream(df, store, curated, chk, storeTable = storeTable)
        .awaitTermination()
      // simulate a NEW session between micro-batches: the in-memory
      // catalog loses the table; the bucketed FILES at the fixed
      // location survive and ensureStreamStore must re-register them
      if (dropCatalogBetweenBatches)
        storeTable.foreach(t => spark.sql(s"DROP TABLE `$t`"))
      mem.addData(batch2: _*)
      StreamingJobs.nearDupStream(df, store, curated, chk, storeTable = storeTable)
        .awaitTermination()
      spark.read.parquet(curated)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    spark.sql("DROP TABLE IF EXISTS nd_bucketed_store")
    val parquetMode = run(None, dropCatalogBetweenBatches = false)
    val bucketedMode = run(Some("nd_bucketed_store"),
      dropCatalogBetweenBatches = true)
    assert(parquetMode == Seq(1L, 2L, 12L), s"parquet mode: $parquetMode")
    assert(bucketedMode == parquetMode,
      s"store layout must not change results: $bucketedMode vs $parquetMode")
    // the re-registration guard: pointing the bucketed mode at a
    // location holding NON-bucketed parquet must fail loudly, never
    // silently mis-bucket
    val badLoc = tmp() + "/plainstore"
    Seq((1L, 0, "k", 0L)).toDF("doc_id", "band", "band_key", "batch_id")
      .write.partitionBy("batch_id").parquet(badLoc)
    spark.sql("DROP TABLE IF EXISTS nd_bad_store")
    val e = intercept[IllegalStateException] {
      graft.ops.dedup.BandStore.ensureStreamStore(
        spark, "nd_bad_store", badLoc, "doc_id")
    }
    assert(e.getMessage.contains("non-bucketed"), e.getMessage)
  }

  test("near-dup replay after a crash BETWEEN the two writes does not duplicate curated rows") {
    implicit val sqlCtx = spark.sqlContext
    val (store, curated, chk) = (tmp() + "/nstore", tmp() + "/ncur", tmp() + "/nchk")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    def runBatch(chkDir: String): Unit = {
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      mem.addData((1L, base), (2L, "completely different words about engines"))
      StreamingJobs.nearDupStream(df, store, curated, chkDir).awaitTermination()
    }
    runBatch(chk)
    // simulate the worst crash point: curated was written, the BANDS
    // write never happened — the replay then finds no same-id
    // collision in the store, re-classifies both docs as novel, and
    // (with plain appends) would write a SECOND curated copy
    val storePath = new org.apache.hadoop.fs.Path(store)
    storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(storePath, true)
    runBatch(tmp() + "/nchk2") // fresh checkpoint => same rows, batchId 0
    val ids = spark.read.parquet(curated)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L),
      s"batch_id-keyed overwrite must replace, not append: $ids")
  }

  test("near-dup stream resumes over a store written by the old append layout") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.dedup.Dedup
    val (store, curated, chk) = (tmp() + "/mstore", tmp() + "/mcur", tmp() + "/mchk")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    // simulate a pre-upgrade deployment: doc 1 accepted with ROOT-level
    // parquet files (plain append, no batch_id partition dirs)
    val oldDoc = Seq((1L, base)).toDF("doc_id", "text")
    oldDoc.write.mode("append").parquet(curated)
    Dedup.lshBands(Dedup.minHashText(oldDoc, "doc_id", "text", 3, 16),
      "doc_id", 16, 4).write.mode("append").parquet(store)
    // post-upgrade batch: a near-dup of the stored doc + a novel doc.
    // Without migration, the first partitioned write alongside the
    // root files makes partition discovery throw.
    val mem = MemoryStream[(Long, String)]
    mem.addData((2L, base.replace("today", "tonight")),
      (3L, "entirely novel content with no overlap at all whatsoever anywhere in sight"))
    StreamingJobs.nearDupStream(mem.toDF().toDF("doc_id", "text"),
      store, curated, chk).awaitTermination()
    val ids = spark.read.parquet(curated)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L),
      s"old-layout doc 1 must survive AND still dedup doc 2: $ids")
    // migrated rows live in the reserved batch_id=-1 partition
    val migrated = spark.read.parquet(curated)
      .filter(col("batch_id") === -1L).count()
    assert(migrated == 1L)
  }

  test("layout migration crashed before the partition write keeps roots as the durable copy") {
    // crash window A: the partition write started (a partial/garbage
    // batch_id=-1 exists) but never committed a marker, and the root
    // files are still present. The replay must rebuild the partition
    // from the FULL root set — dynamic overwrite replaces the partial
    // partition wholesale, so nothing is lost and nothing duplicates.
    val dir = tmp() + "/mig_a"
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    rows.write.mode("append").parquet(dir) // old root layout
    // simulate the crashed first attempt: a partition holding only a
    // SUBSET (what a mid-write crash can leave behind after its own
    // partial commit), plus the MANIFEST the crashed run wrote before
    // its partition write (the replay's evidence that this partition
    // content is a derived copy of the still-present roots, not
    // previously-migrated data)
    Seq((1L, "a")).toDF("doc_id", "text")
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)
    val pA = new org.apache.hadoop.fs.Path(dir)
    val fsA = pA.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestTxt = fsA.listStatus(pA)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).mkString("\n")
    val mOut = fsA.create(
      new org.apache.hadoop.fs.Path(pA, Sinks.MigratingManifest), true)
    mOut.write(manifestTxt.getBytes("UTF-8")); mOut.close()
    Sinks.migrateToBatchLayout(spark, dir)
    val got = spark.read.parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L),
      s"replay must rebuild the partition from the full root set: $got")
    assert(spark.read.parquet(dir).filter(col("batch_id") =!= -1L).count() == 0)
  }

  test("layout migration crashed mid-delete finishes the delete leg without shrinking the store") {
    // crash window B: the partition was fully written and the marker
    // created, then the crash hit mid-delete — SOME root files are
    // gone. A replay that rewrote from the surviving roots would
    // SHRINK the partition to that subset; the marker tells it to
    // only finish deleting.
    val dir = tmp() + "/mig_b"
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    rows.write.mode("append").parquet(dir)
    Sinks.migrateToBatchLayout(spark, dir) // completes: partition holds 1,2,3
    // reconstruct the mid-delete state: ONE root file back (as if its
    // delete never ran) + the marker present
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootDir = tmp() + "/mig_b_root"
    Seq((1L, "a")).toDF("doc_id", "text").write.mode("append").parquet(rootDir)
    val leftover = new org.apache.hadoop.fs.Path(rootDir)
    fs.listStatus(leftover).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.rename(s.getPath, new org.apache.hadoop.fs.Path(p, s.getPath.getName)))
    fs.create(new org.apache.hadoop.fs.Path(p, Sinks.MigratedMarker), true).close()
    Sinks.migrateToBatchLayout(spark, dir)
    val got = spark.read.parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L),
      s"marker replay must keep the full partition (no shrink, no dup): $got")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p, Sinks.MigratedMarker)),
      "marker must be cleared once the delete leg finishes")
    // and the store is clean for normal partitioned reads + writes
    Seq((4L, "d")).toDF("doc_id", "text").withColumn("batch_id", lit(0L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)
    assert(spark.read.parquet(dir).count() == 4L)
  }

  test("crashed delete leg with an UNLISTED new root migrates it in the same call (no mixed layout handed back)") {
    // crash window B variant: mid-delete crash (marker + manifest
    // present, one LISTED root survived) while an old-binary writer
    // appended a root NOT in the manifest. One replay call must both
    // finish the delete (listed root only) AND migrate the unlisted
    // newcomer — returning after the delete leg would hand the caller
    // a mixed root+partition dir whose partitioned read throws.
    val dir = tmp() + "/mig_d"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Sinks.migrateToBatchLayout(spark, dir) // completes: partition holds 1,2
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def plantRoot(rows: Seq[(Long, String)], src: String): Seq[String] = {
      rows.toDF("doc_id", "text").write.mode("append").parquet(src)
      fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .filter(_.getPath.getName.endsWith(".parquet")).map { s =>
          fs.rename(s.getPath, new org.apache.hadoop.fs.Path(p, s.getPath.getName))
          s.getPath.getName
        }.toSeq
    }
    // reconstruct: a LISTED surviving root (as if its delete never
    // ran; its ROWS are already in the partition) + an UNLISTED one
    val listed = plantRoot(Seq((1L, "a")), tmp() + "/mig_d_listed")
    plantRoot(Seq((9L, "z")), tmp() + "/mig_d_new")
    val mOut = fs.create(
      new org.apache.hadoop.fs.Path(p, Sinks.MigratingManifest), true)
    mOut.write(listed.mkString("\n").getBytes("UTF-8")); mOut.close()
    fs.create(new org.apache.hadoop.fs.Path(p, Sinks.MigratedMarker), true).close()
    Sinks.migrateToBatchLayout(spark, dir)
    val got = spark.read.parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 9L),
      s"listed root deleted (no dup 1), unlisted root 9 migrated: $got")
    assert(spark.read.parquet(dir).filter(col("batch_id") =!= -1L).count() == 0)
    assert(fs.listStatus(p).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet")) == 0,
      "no root file may survive the call")
  }

  test("layout migration folds REAPPEARED root files into the migrated partition without dropping it") {
    // mixed-deployment window: a migration completed (batch_id=-1
    // holds the old corpus, no marker/manifest), then an old-binary
    // writer appended new ROOT files. The next migration must union
    // them in — rewriting from the new roots alone would silently
    // drop every previously migrated row (the round-11 advice item).
    val dir = tmp() + "/mig_c"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Sinks.migrateToBatchLayout(spark, dir) // completes: partition holds 1,2
    // the old binary appends two new root files after the fact
    val rootSrc = tmp() + "/mig_c_root"
    Seq((3L, "c"), (4L, "d")).toDF("doc_id", "text")
      .write.mode("append").parquet(rootSrc)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(rootSrc))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(p, s.getPath.getName)))
    Sinks.migrateToBatchLayout(spark, dir)
    val got = spark.read.parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L),
      s"reappeared roots must UNION with the migrated partition: $got")
    assert(spark.read.parquet(dir).filter(col("batch_id") =!= -1L).count() == 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p, Sinks.PremigrateBackup)),
      "the backup must be reclaimed once the union write committed")
    // idempotent when called again with nothing to do
    Sinks.migrateToBatchLayout(spark, dir)
    assert(spark.read.parquet(dir).count() == 4L)
  }

  test("layout migration rejects a concurrent invocation via the lock file") {
    val dir = tmp() + "/mig_lock"
    Seq((1L, "a")).toDF("doc_id", "text").write.mode("append").parquet(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a FRESH lock (another live migration) must be rejected...
    fs.create(new org.apache.hadoop.fs.Path(p, Sinks.MigrateLock), true).close()
    val e = intercept[IllegalStateException] {
      Sinks.migrateToBatchLayout(spark, dir)
    }
    assert(e.getMessage.contains("already running"), e.getMessage)
    // ...while a STALE lock (crashed run's residue) is broken and the
    // migration proceeds, releasing the lock afterwards
    Sinks.migrateToBatchLayout(spark, dir, staleLockMs = 0L)
    assert(spark.read.parquet(dir)
      .filter(col("batch_id") === -1L).count() == 1L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p, Sinks.MigrateLock)),
      "the lock must be released on completion")
  }

  test("cluster maintenance with a BUCKETED band store equals the parquet-store registry, across a catalog restart") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark query engines and shuffles in production"
    val b1 = Seq((1L, base), (2L, base), (3L, other))
    val b2 = Seq((4L, base.replace("today", "tonight")), (5L, other), (6L, other))
    def run(storeTable: Option[String]): Map[Long, Long] = {
      val (store, texts, labels, chk) = (tmp() + "/cstore", tmp() + "/ctexts",
        tmp() + "/clabels", tmp() + "/cchk")
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      mem.addData(b1: _*)
      StreamingJobs.clusterMaintStream(df, store, texts, labels, chk,
        storeTable = storeTable).awaitTermination()
      // in-memory-catalog restart between micro-batches: the fixed
      // location re-registers
      if (storeTable.isDefined)
        storeTable.foreach(t => spark.sql(s"DROP TABLE `$t`"))
      mem.addData(b2: _*)
      StreamingJobs.clusterMaintStream(df, store, texts, labels, chk,
        storeTable = storeTable).awaitTermination()
      spark.read.parquet(labels).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    spark.sql("DROP TABLE IF EXISTS cm_bucketed_store")
    val viaParquet = run(None)
    val viaBucketed = run(Some("cm_bucketed_store"))
    assert(viaParquet == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L,
      5L -> 3L, 6L -> 3L), s"parquet-mode registry: $viaParquet")
    assert(viaBucketed == viaParquet,
      s"store layout must not change the registry: $viaBucketed vs $viaParquet")
  }

  test("cluster maintenance with a bucketed LabelStore registry equals the parquet registry, incl. the swap crash window") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark query engines and shuffles in production"
    val b1 = Seq((1L, base), (2L, base), (3L, other))
    val b2 = Seq((4L, base.replace("today", "tonight")), (5L, other), (6L, other))
    def run(labelsTable: Option[String], crashSwapBetweenBatches: Boolean): Map[Long, Long] = {
      val (store, texts, labels, chk) = (tmp() + "/lstore", tmp() + "/ltexts",
        tmp() + "/llabels", tmp() + "/lchk")
      labelsTable.foreach(graft.ops.dedup.LabelStore.reset(spark, _))
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      mem.addData(b1: _*)
      StreamingJobs.clusterMaintStream(df, store, texts, labels, chk,
        labelsTable = labelsTable).awaitTermination()
      // simulate a crash INSIDE the LabelStore swap: live table
      // dropped, staging holding the committed state — the stream's
      // recover-before-read must promote it, or batch 2 would relabel
      // against an empty registry
      if (crashSwapBetweenBatches) labelsTable.foreach { t =>
        val committed = spark.table(t)
        graft.ops.dedup.LabelStore.swapWrite(spark, t + "_probe_tmp", committed)
        spark.sql(s"ALTER TABLE `${t}_probe_tmp` RENAME TO `${t}_staging`")
        spark.sql(s"DROP TABLE `$t`")
      }
      mem.addData(b2: _*)
      StreamingJobs.clusterMaintStream(df, store, texts, labels, chk,
        labelsTable = labelsTable).awaitTermination()
      val reg = labelsTable match {
        case Some(t) => spark.table(t)
        case None => spark.read.parquet(labels)
      }
      reg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val viaParquet = run(None, crashSwapBetweenBatches = false)
    assert(viaParquet == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L,
      5L -> 3L, 6L -> 3L), s"parquet-mode registry: $viaParquet")
    val viaLabelStore = run(Some("cm_labelstore"), crashSwapBetweenBatches = false)
    assert(viaLabelStore == viaParquet,
      s"registry layout must not change labels: $viaLabelStore vs $viaParquet")
    val viaCrashedSwap = run(Some("cm_labelstore_crash"), crashSwapBetweenBatches = true)
    assert(viaCrashedSwap == viaParquet,
      s"registry must survive the crashed swap: $viaCrashedSwap vs $viaParquet")
  }

  test("property: cluster maintenance over the LabelStore registry equals the parquet-registry crash-free run") {
    implicit val sqlCtx = spark.sqlContext
    // the randomized property below (parquet registry) generalizes the
    // crash windows; this run re-executes it over the LabelStore
    // registry path — same crash points, same invariant: final state
    // equals the crash-free run bit-for-bit, and BOTH registry modes
    // agree.
    def run(labelsTable: Option[String], crashAt: Map[Int, Int]): (Map[Long, Long], Set[Long], Long) = {
      val (store, texts, labels, chk) =
        (tmp() + "/pls", tmp() + "/plt", tmp() + "/pll", tmp() + "/plk")
      labelsTable.foreach(graft.ops.dedup.LabelStore.reset(spark, _))
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      crashBatches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*)
        StreamingJobs.clusterMaintStream(df, store, texts, labels, chk,
          labelsTable = labelsTable).awaitTermination()
        crashAt.get(i).foreach { pt =>
          if (pt >= 2) delPath(s"$store/batch_id=$i")
          if (pt >= 3) delPath(s"$texts/batch_id=$i")
          delPath(s"$chk/commits/$i")
          StreamingJobs.clusterMaintStream(df, store, texts, labels, chk,
            labelsTable = labelsTable).awaitTermination()
        }
      }
      val reg = labelsTable match {
        case Some(t) => spark.table(t)
        case None => spark.read.parquet(labels)
      }
      (reg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        spark.read.parquet(texts).select("doc_id")
          .collect().map(_.getLong(0)).toSet,
        spark.read.parquet(store).count())
    }
    val cleanParquet = run(None, Map.empty)
    val cleanLabelStore = run(Some("plab_clean"), Map.empty)
    assert(cleanLabelStore == cleanParquet,
      s"modes must agree crash-free: $cleanLabelStore vs $cleanParquet")
    val rnd = new scala.util.Random(20260815L)
    val crashes = (0 until 4).flatMap(i =>
      if (rnd.nextBoolean()) Some(i -> (1 + rnd.nextInt(3))) else None).toMap
    assert(run(Some("plab_rnd"), crashes) == cleanParquet,
      s"randomized crashes $crashes over the LabelStore registry")
    val adv = run(Some("plab_adv"), (0 until 4).map(_ -> 3).toMap)
    assert(adv == cleanParquet, s"every-batch full-write-loss replay: $adv")
  }

  test("near-dup stream with storeCompactEvery: results unchanged, history folds, files drop") {
    implicit val sqlCtx = spark.sqlContext
    def run(table: String, compactEvery: Int): (Set[Long], Long, Int) = {
      val (store, curated, chk) = (tmp() + "/ces", tmp() + "/cec", tmp() + "/cek")
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      crashBatches.foreach { b =>
        mem.addData(b: _*)
        StreamingJobs.nearDupStream(df, store, curated, chk,
          storeTable = Some(table), storeCompactEvery = compactEvery)
          .awaitTermination()
      }
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var files = 0
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) files += 1
      }
      (spark.read.parquet(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet,
        spark.table(table).count(), files)
    }
    val (idsPlain, rowsPlain, filesPlain) = run("cmp_none", 0)
    val (idsComp, rowsComp, filesComp) = run("cmp_every2", 2)
    info(s"store files: uncompacted=$filesPlain compactEvery2=$filesComp " +
      s"(rows $rowsPlain/$rowsComp)")
    assert(idsComp == idsPlain && rowsComp == rowsPlain,
      s"compaction must not change curated/store content: " +
        s"($idsComp,$rowsComp) vs ($idsPlain,$rowsPlain)")
    assert(filesComp < filesPlain,
      s"compaction must shrink the store's file count: $filesComp vs $filesPlain")
    // batch 2 folded batches 0-1 into -2; batches 2,3 arrived after
    val parts = spark.sql("SHOW PARTITIONS `cmp_every2`").collect()
      .map(_.getString(0).stripPrefix("batch_id=").toLong).sorted.toSeq
    assert(parts == Seq(graft.ops.dedup.BandStore.CompactedBatchId, 2L, 3L),
      s"committed history must fold into -2: $parts")
  }

  test("streaming cluster maintenance: registry tracks clusters across batches") {
    implicit val sqlCtx = spark.sqlContext
    val (store, texts, labels, chk) =
      (tmp() + "/cstore", tmp() + "/ctexts", tmp() + "/clabels", tmp() + "/cchk")
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words about spark query engines and shuffles in production"
    // batch 1: docs 1+2 are exact dups (cluster 1), doc 3 unrelated
    mem.addData((1L, base), (2L, base), (3L, other))
    StreamingJobs.clusterMaintStream(df, store, texts, labels, chk).awaitTermination()
    val l1 = spark.read.parquet(labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1 == Map(1L -> 1L, 2L -> 1L), s"batch 1 registry: $l1")
    // batch 2: doc 4 near-dups the standing cluster (attach), docs
    // 5+6 form a fresh cluster, doc 7 stays a singleton (no row)
    mem.addData((4L, base.replace("today", "tonight")),
      (5L, other.replace("production", "development")), (6L, other),
      (7L, "entirely novel content with no overlap at all whatsoever anywhere in sight"))
    StreamingJobs.clusterMaintStream(df, store, texts, labels, chk).awaitTermination()
    val l2 = spark.read.parquet(labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 3L -> 3L, 5L -> 3L, 6L -> 3L),
      s"batch 2 registry: $l2")
    // no cached partitions outlive the batches
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "cluster maintenance must release every cache it takes")
  }

  // ---- randomized crash-point replay property ----------------------
  // The single-point replay tests above pin the two worst windows; the
  // property below generalizes: crash at RANDOM batch boundaries and
  // mid-batch points (seeded — reproducible) across both streaming
  // jobs and assert the final stores equal the crash-free streaming
  // run bit-for-bit. A crash is simulated faithfully: the partition
  // writes that "never happened" are deleted AND the checkpoint's
  // commit marker for that batch is removed, so the restarted query
  // re-executes the SAME batchId over the same offsets — exactly the
  // at-least-once replay a real crash produces. (Rolling back the
  // cluster job's registry upsert is impossible by design — a crash
  // after it leaves the merge applied — so that state is what the
  // replay must tolerate, and does.)

  private val crashBase =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val crashAlt =
    "completely different words about spark query engines and shuffles in production"
  // 4 batches x 3 docs: exact dup across batches, near dups across
  // batches, near dup within a batch, novel fillers
  private def crashText(b: Int, j: Int): String = (b, j) match {
    case (0, 0) => crashBase
    case (2, 0) => crashBase                              // exact cross-batch dup
    case (1, 1) => crashBase.replace("today", "tonight")  // near dup of batch 0
    case (3, 2) => crashBase.replace("quick", "swift")    // near dup of batch 0
    case (1, 2) => crashAlt
    case (3, 0) => crashAlt.replace("production", "development") // near dup of batch 1
    case _ => s"unique content row b$b j$j with no overlap " +
      (s"w${b * 7 + j} " * 8)
  }
  private val crashBatches: Seq[Seq[(Long, String)]] =
    (0 until 4).map(b => (0 until 3).map(j => ((b * 10 + j).toLong, crashText(b, j))))

  private def delPath(p: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    ()
  }

  test("property: near-dup stream equals its crash-free run under random crash/replay points") {
    implicit val sqlCtx = spark.sqlContext
    // crash point per batch: 1 = after both writes, before the
    // checkpoint commit; 2 = between the two writes (bands missing);
    // 3 = before any write (both partitions missing)
    def run(crashAt: Map[Int, Int]): (Set[Long], Long) = {
      val (store, curated, chk) = (tmp() + "/ps", tmp() + "/pc", tmp() + "/pk")
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      crashBatches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*)
        StreamingJobs.nearDupStream(df, store, curated, chk).awaitTermination()
        crashAt.get(i).foreach { pt =>
          if (pt >= 2) delPath(s"$store/batch_id=$i")
          if (pt >= 3) delPath(s"$curated/batch_id=$i")
          delPath(s"$chk/commits/$i")
          StreamingJobs.nearDupStream(df, store, curated, chk).awaitTermination()
        }
      }
      (spark.read.parquet(curated).select("doc_id")
        .collect().map(_.getLong(0)).toSet,
        spark.read.parquet(store).count())
    }
    val clean = run(Map.empty)
    assert(clean._1.contains(0L) && !clean._1.contains(20L),
      s"sanity: exact dup 20 must be dropped in the clean run: $clean")
    val rnd = new scala.util.Random(20260815L)
    (1 to 2).foreach { trial =>
      val crashes = (0 until 4).flatMap(i =>
        if (rnd.nextBoolean()) Some(i -> (1 + rnd.nextInt(3))) else None).toMap
      val got = run(crashes)
      assert(got == clean, s"trial $trial crashes=$crashes: $got vs $clean")
    }
    // adversarial: the worst point (between the two writes) at EVERY batch
    val adv = run((0 until 4).map(_ -> 2).toMap)
    assert(adv == clean, s"every-batch between-writes replay: $adv vs $clean")
  }

  test("property: cluster maintenance equals its crash-free run under random crash/replay points") {
    implicit val sqlCtx = spark.sqlContext
    // crash point: 1 = after all writes, before the checkpoint commit
    // (labels upsert replays over itself); 2 = bands write lost;
    // 3 = texts + bands writes lost (registry already updated — the
    // unrollbackable prefix a real crash leaves)
    def run(crashAt: Map[Int, Int]): (Map[Long, Long], Set[Long], Long) = {
      val (store, texts, labels, chk) =
        (tmp() + "/cs", tmp() + "/ct", tmp() + "/cl", tmp() + "/ck")
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      crashBatches.zipWithIndex.foreach { case (b, i) =>
        mem.addData(b: _*)
        StreamingJobs.clusterMaintStream(df, store, texts, labels, chk)
          .awaitTermination()
        crashAt.get(i).foreach { pt =>
          if (pt >= 2) delPath(s"$store/batch_id=$i")
          if (pt >= 3) delPath(s"$texts/batch_id=$i")
          delPath(s"$chk/commits/$i")
          StreamingJobs.clusterMaintStream(df, store, texts, labels, chk)
            .awaitTermination()
        }
      }
      (spark.read.parquet(labels).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
        spark.read.parquet(texts).select("doc_id")
          .collect().map(_.getLong(0)).toSet,
        spark.read.parquet(store).count())
    }
    val clean = run(Map.empty)
    assert(clean._1.nonEmpty && clean._2.size == 12,
      s"sanity: all 12 docs admitted, clusters found: $clean")
    val rnd = new scala.util.Random(20260815L)
    (1 to 2).foreach { trial =>
      val crashes = (0 until 4).flatMap(i =>
        if (rnd.nextBoolean()) Some(i -> (1 + rnd.nextInt(3))) else None).toMap
      val got = run(crashes)
      assert(got == clean, s"trial $trial crashes=$crashes: $got vs $clean")
    }
    val adv = run((0 until 4).map(_ -> 3).toMap)
    assert(adv == clean, s"every-batch full-write-loss replay: $adv vs $clean")
  }

  test("staging-swap upsert: a concurrent reader sees old-or-new, never a mix") {
    import spark.implicits._
    val path = tmp() + "/swap_atomic"
    val keys = (1 to 100).toSeq
    def table(version: Int) = keys.map(k => (k.toLong, version)).toDF("k", "v")
    Sinks.upsertParquet(spark, table(0), path, Seq("k"))
    // writer: 8 full-table upserts, version 1..8, each a staging+swap
    val writer = new Thread(() => (1 to 8).foreach { v =>
      Sinks.upsertParquet(spark, table(v), path, Seq("k"))
    })
    writer.start()
    // reader: hammer the table while the swaps run. Contract under
    // test: every SUCCESSFUL read is one consistent snapshot — all
    // 100 keys, every row the same version. A clean failure (the
    // sub-millisecond window between the two renames has no target
    // dir; or a file listed pre-swap vanished) is allowed — retry is
    // the documented posture — but a MIX of versions or a partial
    // row set never is.
    var mixes = 0
    var cleanMisses = 0
    var successes = 0
    while (writer.isAlive) {
      try {
        val rows = spark.read.parquet(path).collect()
        val versions = rows.map(_.getInt(1)).distinct
        if (versions.length != 1 || rows.length != keys.size) mixes += 1
        else successes += 1
      } catch { case _: Throwable => cleanMisses += 1 }
    }
    writer.join()
    info(s"reads: $successes consistent, $cleanMisses clean misses, $mixes mixed")
    assert(mixes == 0, s"$mixes reads saw a torn table")
    assert(successes > 0, "at least one concurrent read must succeed")
    // final state is the last version, complete
    val fin = spark.read.parquet(path).collect()
    assert(fin.length == keys.size && fin.forall(_.getInt(1) == 8))
  }

  test("cluster maintenance replayed batch overwrites its own store rows, not appends") {
    implicit val sqlCtx = spark.sqlContext
    val (store, texts, labels, chk) =
      (tmp() + "/istore", tmp() + "/itexts", tmp() + "/ilabels", tmp() + "/ichk")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    def runBatch(chkDir: String): Unit = {
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      mem.addData((1L, base), (2L, base))
      StreamingJobs.clusterMaintStream(df, store, texts, labels, chkDir)
        .awaitTermination()
    }
    runBatch(chk)
    val texts1 = spark.read.parquet(texts).count()
    val store1 = spark.read.parquet(store).count()
    // at-least-once REPLAY of the same batch (fresh checkpoint => the
    // same rows arrive again as batchId 0, as after a crash between
    // the registry upsert and the text/bands writes): the batch_id-
    // keyed dynamic partition overwrite must leave counts UNCHANGED —
    // the plain append doubled textDir and inflated band buckets
    runBatch(chk + "_replay")
    assert(spark.read.parquet(texts).count() == texts1,
      "replayed batch must overwrite its text partition, not append")
    assert(spark.read.parquet(store).count() == store1,
      "replayed batch must overwrite its bands partition, not append")
    val got = spark.read.parquet(labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L), s"registry after replay: $got")
  }

  test("cluster maintenance recovers a crashed registry swap before reading") {
    implicit val sqlCtx = spark.sqlContext
    val (store, texts, labels, chk) =
      (tmp() + "/rstore", tmp() + "/rtexts", tmp() + "/rlabels", tmp() + "/rchk")
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    mem.addData((1L, base), (2L, base))
    StreamingJobs.clusterMaintStream(df, store, texts, labels, chk).awaitTermination()
    // simulate a crash INSIDE the staging swap: target renamed to
    // __old, new table never landed — the registry "doesn't exist"
    val fs = new org.apache.hadoop.fs.Path(labels)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(labels),
      new org.apache.hadoop.fs.Path(labels + "__old")))
    // next batch attaches to the standing cluster: without the
    // recovery-before-read, labels would read empty and doc 4 would
    // cluster with min id 2 instead of the standing label 1
    mem.addData((4L, base.replace("today", "tonight")))
    StreamingJobs.clusterMaintStream(df, store, texts, labels, chk).awaitTermination()
    val got = spark.read.parquet(labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 1L),
      s"registry must survive the crashed swap: $got")
  }

  test("manifestStream: a closed window's digests equal the batch manifest bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String, String)]
    val docs = mem.toDF().toDF("ts", "lang", "source", "text")
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 10:$m:00")
    // one 10-minute window with three docs across two slices; the
    // 11:30 sentinel closes it past the watermark
    mem.addData(
      (t("01"), "en", "s1", "alpha beta"), (t("04"), "en", "s1", "gamma"),
      (t("07"), "de", "s2", "delta"), (java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "zz", "zz", "x"))
    val q = StreamingJobs.manifestStream(docs, "ts", "10 minutes", "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("manifest").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("manifest")
      .filter(col("win_start") === t("00"))
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // batch replay of the identical digests over the same rows
    import graft.ops.dedup.Dedup
    val batch = Seq(("en", "s1", "alpha beta"), ("en", "s1", "gamma"), ("de", "s2", "delta"))
      .toDF("lang", "source", "text")
      .withColumn("h", Dedup.h60(lit(0), col("text")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).cast("long").as("c"),
        expr("bit_xor(h)").as("x"), sum(col("h") % 1000003L).cast("long").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("mergeStream: every micro-batch EXECUTES a MERGE INTO against the V2 catalog table") {
    implicit val sqlCtx = spark.sqlContext
    // the streaming consumer of the executed-MERGE leg: the same
    // statement MergeSinkSpec proves against the row-level-operation
    // connector API, driven per micro-batch by foreachBatch
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.v2.GraftMemCatalog].getName)
    val cat = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ns"), "stream_merge")
    if (cat.tableExists(ident)) cat.dropTable(ident)
    cat.createTable(ident, Seq((1L, "x")).toDF("k", "v").schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      new java.util.HashMap[String, String]())
    val t = "graftmem.ns.stream_merge"
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("k", "v")
    val chk = tmp() + "/chk"
    mem.addData((1L, "a"), (2L, "b"))
    StreamingJobs.mergeStream(df, Seq("k"), t, chk).awaitTermination()
    mem.addData((2L, "B"), (3L, "c"))
    StreamingJobs.mergeStream(df, Seq("k"), t, chk).awaitTermination()
    val got = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")),
      s"updated 2, inserted 3: ${got.toSeq}")
  }

  test("streaming keyed upsert via foreachBatch (weather MERGE as a stream)") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp() + "/t"
    val chk = tmp() + "/chk"
    val mem = MemoryStream[(Int, String)]
    val df = mem.toDF().toDF("k", "v")
    mem.addData((1, "a"), (2, "b"))
    val q1 = StreamingJobs.upsertStream(df, Seq("k"), path, chk)
    q1.awaitTermination()
    mem.addData((2, "B"), (3, "c"))
    val q2 = StreamingJobs.upsertStream(df, Seq("k"), path, chk)
    q2.awaitTermination()
    val out = spark.read.parquet(path).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "a"), (2, "B"), (3, "c")))
  }
}

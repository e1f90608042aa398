package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.ops.dedup.{BandStore, ConnectedComponents, Dedup, LabelStore}

/** The bucketed persistent band/label stores: semantic equivalence to
  * the in-memory shapes, layout invariance (bucketed vs plain table →
  * identical rows), crash recovery of the label swap, and the
  * NO-store-side-exchange plan property that is the stores' whole
  * point at 100 TB. */
class PersistentStoresSpec extends SparkSpec {
  import spark.implicits._

  /** Exchanges that move RAW store rows: a ShuffleExchange whose
    * subtree contains the store's scan but no join below it means the
    * standing rows themselves crossed the wire before being probed —
    * the exact cost the bucketed layout exists to remove. Exchanges
    * ABOVE the probe join (the pair-output distinct etc.) move
    * increment-sized results and are fine. */
  private def rawStoreExchanges(plan: org.apache.spark.sql.execution.SparkPlan,
                                table: String): Seq[ShuffleExchangeLike] =
    plan.collect {
      case e: ShuffleExchangeLike
        if e.treeString.contains(table) &&
          e.collectFirst {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec
              if j ne e => j
          }.isEmpty => e
    }

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    // a previous JVM's managed-table dirs survive the in-memory
    // catalog — clear them or saveAsTable refuses the location
    val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_warehouse/$t")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def docs(n: Int): DataFrame = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (0 until n).map { i =>
      val toks = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("BandStore.probe finds exactly the bucket collisions of the in-memory join") {
    val standing = docs(40)
    // batch: 3 near-copies of standing docs (one token appended) + 2
    // disjoint docs
    val batch = standing.filter(col("doc_id").isin(3L, 11L, 27L))
      .select((col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit(" omega")).as("text"))
      .unionByName(Seq((2000L, "totally different words here nothing shared"),
        (2001L, "another unrelated string of fresh tokens")).toDF("doc_id", "text"))
    val standBands = Dedup.lshBands(
      Dedup.minHashText(standing, "doc_id", "text"), "doc_id")
    val batchBands = Dedup.lshBands(
      Dedup.minHashText(batch, "doc_id", "text"), "doc_id")
    dropTable("ps_bands")
    BandStore.write(standBands, "ps_bands")
    val got = BandStore.probe(spark, "ps_bands", batchBands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the same join computed wholly in memory
    val want = batchBands
      .join(standBands.withColumnRenamed("doc_id", "sid"), Seq("band", "band_key"))
      .select(col("sid"), col("doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"probe=$got vs in-memory=$want")
    assert(got.exists(_._2 >= 1000L), "planted near-copies must collide")
  }

  test("BandStore.probe: the standing store plans with NO exchange; hot-bucket cap included") {
    val standing = docs(60)
    val standBands = Dedup.lshBands(
      Dedup.minHashText(standing, "doc_id", "text"), "doc_id")
    dropTable("ps_bands_plan")
    BandStore.write(standBands, "ps_bands_plan")
    val batchBands = Dedup.lshBands(
      Dedup.minHashText(docs(8).select((col("doc_id") + 500L).as("doc_id"),
        col("text")), "doc_id", "text"), "doc_id")
    // scale posture: the probe side too big to broadcast (threshold
    // off) and no AQE re-wrapping, so the plan shape is exactly what
    // EnsureRequirements derives from the bucketed scan's partitioning
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed = BandStore.probe(spark, "ps_bands_plan", batchBands, "doc_id")
      probed.collect()
      val plan = probed.queryExecution.executedPlan
      assert(plan.toString.contains("ps_bands_plan"),
        s"store scan missing from plan:\n${plan.toString.take(800)}")
      // the property: NO shuffle exchange anywhere above the store
      // scan — the bucketed layout satisfies both the cap window's
      // and the join's required distribution
      val offending = rawStoreExchanges(plan, "ps_bands_plan")
      assert(offending.isEmpty,
        s"standing store must not re-shuffle:\n${offending.map(_.treeString.take(600)).mkString}")
      // ...while the probe side DOES exchange (proves the assertion
      // bites: this is a real co-located join, not a collapsed plan)
      assert(plan.collect { case e: ShuffleExchangeLike => e }.nonEmpty,
        "expected the increment side to shuffle to the bucket count")
      assert(plan.toString.contains("SelectedBucketsCount"),
        "store scan must be bucket-aware")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("dedupAgainstStoreScoped: bucketed and plain layouts give identical verified pairs") {
    val standing = docs(50)
    val batch = standing.filter(col("doc_id").isin(5L, 23L))
      .select((col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit(" omega")).as("text"))
      .unionByName(Seq((3000L, "nothing in common with anything at all"))
        .toDF("doc_id", "text"))
    val standBands = Dedup.lshBands(
      Dedup.minHashText(standing, "doc_id", "text"), "doc_id")
    dropTable("ps_ab_bucketed"); dropTable("ps_ab_plain")
    BandStore.write(standBands, "ps_ab_bucketed")
    standBands.write.format("parquet").saveAsTable("ps_ab_plain") // no bucket spec
    def run(table: String): Set[(Long, Long, Long, Double)] =
      BandStore.dedupAgainstStoreScoped(spark, table, standing, batch,
        "doc_id", "text") { j =>
        j.select("sid", "bid", "n_inter", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      }
    val bucketed = run("ps_ab_bucketed")
    val plain = run("ps_ab_plain")
    assert(bucketed == plain,
      s"layout must not change results: bucketed=$bucketed plain=$plain")
    assert(bucketed.exists { case (s, b, _, jac) =>
      (s == 5L && b == 1005L || s == 23L && b == 1023L) && jac > 0.7 },
      s"planted near-dups must verify high: $bucketed")
  }

  test("BandStore.write append mode grows the store per batch (the micro-batch posture)") {
    val d1 = docs(10)
    val d2 = docs(20).filter(col("doc_id") >= 10L)
    dropTable("ps_append")
    BandStore.write(Dedup.lshBands(
      Dedup.minHashText(d1, "doc_id", "text"), "doc_id"), "ps_append")
    BandStore.write(Dedup.lshBands(
      Dedup.minHashText(d2, "doc_id", "text"), "doc_id"), "ps_append",
      mode = "append")
    val ids = spark.table("ps_append").select("doc_id").distinct().count()
    assert(ids == 20L, s"append must accumulate both batches: $ids")
    // multi-file buckets still satisfy the join's distribution: the
    // probe plan keeps the no-store-exchange property
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed = BandStore.probe(spark, "ps_append",
        Dedup.lshBands(Dedup.minHashText(d1, "doc_id", "text"), "doc_id"),
        "doc_id")
      probed.collect()
      val offending = rawStoreExchanges(
        probed.queryExecution.executedPlan, "ps_append")
      assert(offending.isEmpty, "appended store must still join exchange-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("batch_id-partitioned + bucketed store: dynamic-overwrite insertInto is replay-idempotent and keeps the plan property") {
    // the STREAMING posture: foreachBatch is at-least-once, so the
    // per-batch store write must overwrite its own batch_id partition
    // on replay — combined here with the bucketed layout so the probe
    // stays store-side-exchange-free across batches
    dropTable("ps_stream")
    val d1 = Dedup.lshBands(Dedup.minHashText(docs(10), "doc_id", "text"), "doc_id")
      .withColumn("batch_id", lit(0L))
    d1.write.format("parquet").partitionBy("batch_id")
      .bucketBy(BandStore.DefaultBuckets, "band", "band_key")
      .sortBy("band", "band_key")
      .saveAsTable("ps_stream")
    val d2 = Dedup.lshBands(Dedup.minHashText(
        docs(20).filter(col("doc_id") >= 10L), "doc_id", "text"), "doc_id")
      .withColumn("batch_id", lit(1L))
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      d2.write.mode("overwrite").insertInto("ps_stream")
      val after1 = spark.table("ps_stream").count()
      // replay the same batch (the crash-retry case): its partition
      // is overwritten wholesale — no duplicates, batch 0 untouched
      d2.write.mode("overwrite").insertInto("ps_stream")
      val after2 = spark.table("ps_stream").count()
      assert(after1 == after2, s"replay must be idempotent: $after1 vs $after2")
      assert(spark.table("ps_stream")
        .select("doc_id").distinct().count() == 20L)
    } finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // probe across BOTH batch partitions: still no raw-store exchange
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // probe docs re-using standing content from BOTH batches: the
      // co-located join must find them — this is the proof that
      // insertInto placed rows in the CORRECT buckets (a mis-bucketed
      // file would silently miss matches, not fail)
      val probeDocs = docs(20).filter(col("doc_id").isin(2L, 15L))
        .select((col("doc_id") + 900L).as("doc_id"), col("text"))
      val probeBands = Dedup.lshBands(
        Dedup.minHashText(probeDocs, "doc_id", "text"), "doc_id")
      val probed = BandStore.probe(spark, "ps_stream", probeBands, "doc_id")
      val got = probed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((2L, 902L)) && got.contains((15L, 915L)),
        s"identical content must collide across both batch partitions: $got")
      val offending = rawStoreExchanges(
        probed.queryExecution.executedPlan, "ps_stream")
      assert(offending.isEmpty,
        s"partitioned+bucketed store must still probe exchange-free:\n${offending.map(_.treeString.take(600)).mkString}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("ensureStreamStore pins the bucket count: re-registering with another count fails loudly") {
    // files written under one bucket count read WRONG through a table
    // declaring another (the reader trusts the file-name bucket id) —
    // the guard must reject the mismatch instead of silently missing
    // probe matches
    val loc = java.nio.file.Files
      .createTempDirectory("graft_bucket_pin").toString
    spark.sql("DROP TABLE IF EXISTS pin_a"); spark.sql("DROP TABLE IF EXISTS pin_b")
    BandStore.ensureStreamStore(spark, "pin_a", loc, "doc_id", nBuckets = 16)
    BandStore.writeBatch(spark, "pin_a",
      Dedup.lshBands(Dedup.minHashText(docs(5), "doc_id", "text"), "doc_id"),
      "doc_id", 0L)
    spark.sql("DROP TABLE `pin_a`") // catalog restart
    val e = intercept[IllegalStateException] {
      BandStore.ensureStreamStore(spark, "pin_b", loc, "doc_id", nBuckets = 8)
    }
    assert(e.getMessage.contains("mis-bucket"), e.getMessage)
    // the ORIGINAL count re-registers fine and reads the data back
    BandStore.ensureStreamStore(spark, "pin_b", loc, "doc_id", nBuckets = 16)
    assert(spark.table("pin_b").select("doc_id").distinct().count() == 5L)
  }

  test("writeBatch: static partition spec (session conf static, untouched) — replay-idempotent, other partitions intact") {
    // the ADVICE-12 fix: writeBatch must not toggle the session-global
    // partitionOverwriteMode (a concurrent writer could observe it).
    // It now names its partition statically in INSERT OVERWRITE; with
    // the session conf explicitly STATIC, a replayed batch must still
    // overwrite only its OWN partition. (The per-write writer OPTION
    // was tried first and is NOT honored for insertInto on this
    // Spark — it wiped batch 0 and even the bucket-pin file.)
    val loc = java.nio.file.Files
      .createTempDirectory("graft_perwrite_dyn").toString
    spark.sql("DROP TABLE IF EXISTS pw_dyn")
    BandStore.ensureStreamStore(spark, "pw_dyn", loc, "doc_id")
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      val b0 = Dedup.lshBands(Dedup.minHashText(docs(10), "doc_id", "text"), "doc_id")
      val b1 = Dedup.lshBands(Dedup.minHashText(
        docs(20).filter(col("doc_id") >= 10L), "doc_id", "text"), "doc_id")
      BandStore.writeBatch(spark, "pw_dyn", b0, "doc_id", 0L)
      BandStore.writeBatch(spark, "pw_dyn", b1, "doc_id", 1L)
      val after1 = spark.table("pw_dyn").count()
      BandStore.writeBatch(spark, "pw_dyn", b1, "doc_id", 1L) // replay
      assert(spark.table("pw_dyn").count() == after1,
        "replayed batch must overwrite only its own partition")
      assert(spark.table("pw_dyn").filter(col("batch_id") === 0L).count() > 0,
        "batch 0 must survive batch 1's replay (dynamic, not static, overwrite)")
      assert(spark.table("pw_dyn").select("doc_id").distinct().count() == 20L)
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static",
        "writeBatch must not mutate the session conf")
    } finally prevMode match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("ensureStreamStore derives the id type; writeBatch rejects a mismatched band frame loudly") {
    // string-id store: the schema follows the caller's idType instead
    // of the old hard-coded BIGINT (which silently cast string ids)
    val loc = java.nio.file.Files
      .createTempDirectory("graft_strid_store").toString
    spark.sql("DROP TABLE IF EXISTS sid_store")
    BandStore.ensureStreamStore(spark, "sid_store", loc, "url",
      idType = org.apache.spark.sql.types.StringType)
    val sdocs = Seq(("http://a/1", "alpha beta gamma delta epsilon zeta eta theta"),
      ("http://a/2", "alpha beta gamma delta epsilon zeta eta theta"),
      ("http://b/9", "completely different tokens nothing shared here at all"))
      .toDF("url", "text")
    BandStore.writeBatch(spark, "sid_store",
      Dedup.lshBands(Dedup.minHashText(sdocs, "url", "text"), "url"), "url", 0L)
    assert(spark.table("sid_store").schema("url").dataType ==
      org.apache.spark.sql.types.StringType)
    val probe = BandStore.probe(spark, "sid_store",
      Dedup.lshBands(Dedup.minHashText(
        Seq(("http://c/0", "alpha beta gamma delta epsilon zeta eta theta"))
          .toDF("url", "text"), "url", "text"), "url"), "url")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(probe.contains(("http://a/1", "http://c/0")) &&
      probe.contains(("http://a/2", "http://c/0")),
      s"string-id probe must collide on identical content: $probe")
    // mismatch: a long-id band frame into the string-id store must
    // fail LOUDLY, not cast silently (the silent-miss failure class)
    val e = intercept[IllegalArgumentException] {
      BandStore.writeBatch(spark, "sid_store",
        Dedup.lshBands(Dedup.minHashText(docs(3), "doc_id", "text"), "doc_id"),
        "doc_id", 1L)
    }
    assert(e.getMessage.contains("cast"), e.getMessage)
  }

  private def listDataFiles(loc: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next().getPath
      // protocol/staging files (underscore-prefixed components) are
      // not store data
      val rel = f.toString.stripPrefix(new org.apache.hadoop.fs.Path(loc).toString)
      if (f.getName.endsWith(".parquet") && !rel.split('/').exists(_.startsWith("_")))
        out += rel
    }
    out.toList
  }

  private def livePartitionIds(table: String): Seq[Long] =
    spark.sql(s"SHOW PARTITIONS `$table`").collect().toSeq
      .map(_.getString(0).stripPrefix("batch_id=").toLong).sorted

  test("compactStreamStore: one file per bucket, probe results and plan property unchanged, newer batches untouched") {
    val loc = java.nio.file.Files.createTempDirectory("graft_compact").toString
    spark.sql("DROP TABLE IF EXISTS cp_store")
    BandStore.ensureStreamStore(spark, "cp_store", loc, "doc_id", nBuckets = 8)
    val all = docs(60)
    (0 until 6).foreach { b =>
      val slice = all.filter(col("doc_id") >= b * 10L && col("doc_id") < (b + 1) * 10L)
      BandStore.writeBatch(spark, "cp_store",
        Dedup.lshBands(Dedup.minHashText(slice, "doc_id", "text"), "doc_id"),
        "doc_id", b.toLong)
    }
    // probe docs re-using content from an OLD batch (2) and the KEPT
    // batch (55): both must collide before and after compaction
    val probeBands = Dedup.lshBands(Dedup.minHashText(
      all.filter(col("doc_id").isin(2L, 55L))
        .select((col("doc_id") + 900L).as("doc_id"), col("text")),
      "doc_id", "text"), "doc_id")
    def probeSet(): Set[(Long, Long)] =
      BandStore.probe(spark, "cp_store", probeBands, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probeSet()
    val filesBefore = listDataFiles(loc)
    val rowsBefore = spark.table("cp_store").count()
    BandStore.compactStreamStore(spark, "cp_store", loc, 4L)
    assert(probeSet() == before,
      "compaction must not change probe results")
    assert(spark.table("cp_store").count() == rowsBefore,
      "compaction must not change the row set")
    assert(livePartitionIds("cp_store") == Seq(BandStore.CompactedBatchId, 5L),
      s"batches 0..4 fold into -2, batch 5 stays: ${livePartitionIds("cp_store")}")
    val filesAfter = listDataFiles(loc)
    info(s"data files: ${filesBefore.size} (6 batches) -> ${filesAfter.size} " +
      "(consolidated -2 + kept batch 5)")
    assert(filesAfter.size < filesBefore.size,
      s"file count must drop: ${filesBefore.size} -> ${filesAfter.size}")
    // the consolidated partition holds at most one file per bucket
    val consolidated = filesAfter.filter(_.contains(s"batch_id=${BandStore.CompactedBatchId}"))
    val bucketOf = ".*_(\\d{5})(\\.c\\d+)?\\..*parquet".r
    val bucketIds = consolidated.flatMap(f =>
      bucketOf.findFirstMatchIn(f).map(_.group(1)))
    assert(bucketIds.nonEmpty && bucketIds.distinct.size == bucketIds.size,
      s"one file per bucket in the consolidated partition: $consolidated")
    // no protocol residue
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("_graft_compact_staging", "_graft_compacting", "_graft_compacted")
      .foreach(n => assert(!fs.exists(new org.apache.hadoop.fs.Path(loc, n)),
        s"$n must be cleaned up"))
    // the probe plan property survives compaction
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probed = BandStore.probe(spark, "cp_store", probeBands, "doc_id")
      probed.collect()
      assert(rawStoreExchanges(probed.queryExecution.executedPlan, "cp_store").isEmpty,
        "compacted store must still probe exchange-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("a SECOND compaction re-overwrites -2 without poisoning the session's cached file listing") {
    // the FIRST compaction creates batch_id=-2 fresh; every LATER one
    // INSERT OVERWRITEs an EXISTING -2 whose previous files the
    // session's cached table relation had already listed (the probes
    // between compactions read them). This pins that the INVOKING
    // session's listings stay correct across the overwrite (the
    // INSERT command refreshes its own session's relation cache).
    // OTHER sessions in the same JVM keep Spark's standard rewrite
    // semantics — stale until REFRESH TABLE (the compactStreamStore
    // scaladoc's cross-session reader contract; the round-15
    // StreamDecade harness hit exactly that from its monitoring
    // session and refreshes before reading). Probes interleave
    // exactly like the stream's.
    val loc = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    spark.sql("DROP TABLE IF EXISTS cp2_store")
    BandStore.ensureStreamStore(spark, "cp2_store", loc, "doc_id", nBuckets = 8)
    val all = docs(60)
    def writeSlice(b: Int): Unit = {
      val slice = all.filter(col("doc_id") >= b * 10L && col("doc_id") < (b + 1) * 10L)
      BandStore.writeBatch(spark, "cp2_store",
        Dedup.lshBands(Dedup.minHashText(slice, "doc_id", "text"), "doc_id"),
        "doc_id", b.toLong)
    }
    val probeBands = Dedup.lshBands(Dedup.minHashText(
      all.filter(col("doc_id").isin(2L, 55L))
        .select((col("doc_id") + 900L).as("doc_id"), col("text")),
      "doc_id", "text"), "doc_id")
    def probeSet(): Set[(Long, Long)] =
      BandStore.probe(spark, "cp2_store", probeBands, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 4).foreach(writeSlice)
    val before = probeSet()
    val rowsBefore = spark.table("cp2_store").count()
    BandStore.compactStreamStore(spark, "cp2_store", loc, 1L) // -2 born
    assert(probeSet() == before) // lists -2 into the cached relation
    (4 until 6).foreach(writeSlice)
    val rowsAll = spark.table("cp2_store").count()
    val afterWrites = probeSet() // full store, pre-second-compaction
    assert(before.subsetOf(afterWrites) && afterWrites.size > before.size)
    BandStore.compactStreamStore(spark, "cp2_store", loc, 5L) // -2 OVERWRITTEN
    assert(probeSet() == afterWrites,
      "probe after the second compaction must read the NEW -2 files")
    assert(spark.table("cp2_store").count() == rowsAll,
      "second compaction must not change the row set")
    assert(rowsAll > rowsBefore)
    assert(livePartitionIds("cp2_store") == Seq(BandStore.CompactedBatchId),
      s"everything folds into -2: ${livePartitionIds("cp2_store")}")
  }

  test("compaction crash windows: partial staging discarded; staged re-applies; applied finishes cleanup; re-compaction folds -2") {
    val loc = java.nio.file.Files.createTempDirectory("graft_compact_crash").toString
    spark.sql("DROP TABLE IF EXISTS cc_store")
    BandStore.ensureStreamStore(spark, "cc_store", loc, "doc_id", nBuckets = 8)
    val all = docs(40)
    (0 until 4).foreach { b =>
      val slice = all.filter(col("doc_id") >= b * 10L && col("doc_id") < (b + 1) * 10L)
      BandStore.writeBatch(spark, "cc_store",
        Dedup.lshBands(Dedup.minHashText(slice, "doc_id", "text"), "doc_id"),
        "doc_id", b.toLong)
    }
    val probeBands = Dedup.lshBands(Dedup.minHashText(
      all.filter(col("doc_id").isin(7L, 33L))
        .select((col("doc_id") + 900L).as("doc_id"), col("text")),
      "doc_id", "text"), "doc_id")
    def probeSet(): Set[(Long, Long)] =
      BandStore.probe(spark, "cc_store", probeBands, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probeSet()
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // window 1: crash mid-STAGING (dir exists, no manifest) — recovery
    // discards the partial copy, store untouched
    val staging = new org.apache.hadoop.fs.Path(loc, "_graft_compact_staging")
    fs.mkdirs(staging)
    fs.create(new org.apache.hadoop.fs.Path(staging, "partial.parquet"), true).close()
    BandStore.recoverCompaction(spark, "cc_store", loc)
    assert(!fs.exists(staging), "partial staging must be discarded")
    assert(livePartitionIds("cc_store") == Seq(0L, 1L, 2L, 3L) && probeSet() == before)
    // window 2: crash AFTER staging+manifest, before apply — the next
    // batch start's recovery finishes the whole compaction
    assert(BandStore.stageCompaction(spark, "cc_store", loc, 2L))
    BandStore.recoverCompaction(spark, "cc_store", loc)
    assert(livePartitionIds("cc_store") == Seq(BandStore.CompactedBatchId, 3L),
      s"recovery must finish the staged compaction: ${livePartitionIds("cc_store")}")
    assert(probeSet() == before, "healed store must probe identically")
    // window 3: crash AFTER apply (marker live, folded partitions
    // still on disk — the documented double-copy window; this fold
    // includes the PREVIOUS -2, the re-compaction case). probe()'s
    // distinct pair output hides the doubling even mid-window.
    assert(BandStore.stageCompaction(spark, "cc_store", loc, 3L))
    BandStore.applyCompaction(spark, "cc_store", loc)
    assert(fs.exists(new org.apache.hadoop.fs.Path(loc, "_graft_compacted")))
    assert(probeSet() == before, "double-copy window: distinct pairs unchanged")
    BandStore.recoverCompaction(spark, "cc_store", loc)
    assert(livePartitionIds("cc_store") == Seq(BandStore.CompactedBatchId),
      s"everything folds into -2: ${livePartitionIds("cc_store")}")
    assert(probeSet() == before, "fully compacted store must probe identically")
    assert(spark.table("cc_store").count() ==
      spark.table("cc_store").select("doc_id", "band", "band_key").distinct().count(),
      "no duplicated rows after the re-compaction")
  }

  test("LabelStore.incremental matches full-recompute CC and survives the swap crash window") {
    // standing graph: {1,2} and {10,11}; increment merges the two
    // clusters via 2-10 and attaches a fresh vertex 20-11
    val oldEdges = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val labels0 = ConnectedComponents.minLabelLocalized(oldEdges)
    dropTable("ps_labels"); dropTable("ps_labels_staging")
    LabelStore.write(labels0, "ps_labels")
    val newEdges = Seq((2L, 10L), (20L, 11L)).toDF("id_a", "id_b")
    LabelStore.incremental(spark, "ps_labels", newEdges)
    val got = spark.table("ps_labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = ConnectedComponents.minLabelLocalized(
      oldEdges.unionByName(newEdges)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full, s"incremental=$got vs full=$full")
    // crash window: the live table dropped, staging holding the
    // committed state — recover() must promote it
    val committed = spark.table("ps_labels")
    LabelStore.swapWrite(spark, "ps_labels_probe_tmp", committed)
    spark.sql("ALTER TABLE `ps_labels_probe_tmp` RENAME TO `ps_labels_staging`")
    spark.sql("DROP TABLE `ps_labels`")
    LabelStore.recover(spark, "ps_labels")
    assert(spark.catalog.tableExists("ps_labels") &&
      !spark.catalog.tableExists("ps_labels_staging"))
    assert(spark.table("ps_labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == full)
  }

  test("degenerate inputs: empty probe batch, empty edge increment, orphaned-location reset") {
    // empty PROBE batch: zero collisions, no crash (the late-upstream
    // day of a daily incremental pipeline)
    dropTable("ps_empty")
    BandStore.write(Dedup.lshBands(
      Dedup.minHashText(docs(10), "doc_id", "text"), "doc_id"), "ps_empty")
    val emptyBands = Dedup.lshBands(
      Dedup.minHashText(docs(0), "doc_id", "text"), "doc_id")
    assert(BandStore.probe(spark, "ps_empty", emptyBands, "doc_id").count() == 0)
    // empty EDGE increment: the registry round-trips unchanged
    dropTable("ps_empty_labels"); dropTable("ps_empty_labels_staging")
    val labels0 = graft.ops.dedup.ConnectedComponents.minLabelLocalized(
      Seq((1L, 2L)).toDF("id_a", "id_b"))
    LabelStore.write(labels0, "ps_empty_labels")
    LabelStore.incremental(spark, "ps_empty_labels",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(spark.table("ps_empty_labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L, 2L -> 1L))
    // orphaned managed location (a crashed local session's leftovers):
    // write() refuses it; reset() is the documented unwedge
    spark.sql("DROP TABLE IF EXISTS ps_orphan")
    val warehouse = new org.apache.hadoop.fs.Path("/tmp/graft_warehouse/ps_orphan")
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(warehouse)
    fs.create(new org.apache.hadoop.fs.Path(warehouse, "leftover.parquet"), true).close()
    intercept[Exception] { LabelStore.write(labels0, "ps_orphan") }
    LabelStore.reset(spark, "ps_orphan")
    LabelStore.write(labels0, "ps_orphan")
    assert(spark.table("ps_orphan").count() == 2L)
  }

  test("LabelStore contraction joins read the standing registry with NO exchange") {
    val edges = (0L until 200L by 2L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels0 = ConnectedComponents.minLabelLocalized(edges)
    dropTable("ps_labels_plan"); dropTable("ps_labels_plan_staging")
    LabelStore.write(labels0, "ps_labels_plan")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ne = graft.ops.Materialize.leafCache(
        Seq((1L, 3L), (300L, 301L)).toDF("id_a", "id_b"))
      val labels = spark.table("ps_labels_plan")
      val la = labels.select(col("id").as("id_a"), col("component").as("__ca"))
      val lb = labels.select(col("id").as("id_b"), col("component").as("__cb"))
      val contracted = ne
        .join(la, Seq("id_a"), "left")
        .join(lb, Seq("id_b"), "left")
        .select(coalesce(col("__ca"), col("id_a")).as("id_a"),
          coalesce(col("__cb"), col("id_b")).as("id_b"))
      contracted.collect()
      val offending = rawStoreExchanges(
        contracted.queryExecution.executedPlan, "ps_labels_plan")
      assert(offending.isEmpty,
        s"standing registry must not re-shuffle:\n${offending.map(_.treeString.take(600)).mkString}")
      graft.ops.Materialize.release(ne)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("a SECOND session survives the stream's compactions via BandStore.refreshStore") {
    // the round-15 StreamDecade-discovered edge as a spec: the
    // invoking session's relation cache is refreshed by the
    // compaction's own INSERT, but another session (monitoring query,
    // batch probe next to the stream) that listed the table before a
    // SECOND compaction rewrote the consolidated partition holds a
    // stale file listing. BandStore.refreshStore (REFRESH TABLE + a
    // listing sanity probe) is the documented contract as API.
    val loc = java.nio.file.Files.createTempDirectory("graft_xsession").toString
    spark.sql("DROP TABLE IF EXISTS xs_store")
    BandStore.ensureStreamStore(spark, "xs_store", loc, "doc_id", nBuckets = 8)
    val all = docs(60)
    def writeSlice(b: Int): Unit = {
      val slice = all.filter(col("doc_id") >= b * 10L && col("doc_id") < (b + 1) * 10L)
      BandStore.writeBatch(spark, "xs_store",
        Dedup.lshBands(Dedup.minHashText(slice, "doc_id", "text"), "doc_id"),
        "doc_id", b.toLong)
    }
    // probe docs rebuilt per session (frames are session-bound):
    // exact copies of standing docs 2 and 55 under fresh ids
    def probeIn(s: org.apache.spark.sql.SparkSession): Set[(Long, Long)] = {
      val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta", "iota", "kappa", "lambda", "mu")
      import s.implicits._
      val pdocs = Seq(2L, 55L).map { i =>
        (i + 900L,
          (0 until 12).map(j => words(((i * 7 + j * 3) % words.length).toInt))
            .mkString(" "))
      }.toDF("doc_id", "text")
      BandStore.probe(s, "xs_store",
          Dedup.lshBands(Dedup.minHashText(pdocs, "doc_id", "text"), "doc_id"),
          "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val reader = spark.newSession()
    (0 until 4).foreach(writeSlice)
    BandStore.compactStreamStore(spark, "xs_store", loc, 1L) // -2 born
    val truth1 = probeIn(spark)
    assert(probeIn(reader) == truth1,
      "the second session reads the first compaction's store")
    (4 until 6).foreach(writeSlice)
    BandStore.compactStreamStore(spark, "xs_store", loc, 5L) // -2 OVERWRITTEN
    val truth2 = probeIn(spark)
    assert(truth1.subsetOf(truth2) && truth2.size > truth1.size)
    // without a refresh the reader's listing may be stale (reads die
    // FILE_NOT_EXIST — the harness-observed behavior); with the
    // helper it MUST see exactly the stream session's truth
    val staleOutcome = scala.util.Try(probeIn(reader))
    BandStore.refreshStore(reader, "xs_store")
    assert(probeIn(reader) == truth2,
      s"reader after refreshStore must match the stream session " +
        s"(stale read outcome was: ${staleOutcome.isSuccess})")
    // idempotent for the owning session too
    BandStore.refreshStore(spark, "xs_store")
    assert(probeIn(spark) == truth2)
  }
}

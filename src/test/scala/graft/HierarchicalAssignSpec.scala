package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.similarity.VectorOps

/** Two-level (hierarchical) centroid assignment — the nlist ∝ N IVF
  * build regime. Pins the three properties that make it trustworthy:
  * exact degeneration to the flat assign when every super-region is
  * probed, high agreement at wSuper = 1 on real embeddings, and the
  * zero-shuffle serving shape (the whole search structure rides one
  * broadcast row). */
class HierarchicalAssignSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("wSuper = nSuper degenerates to EXACTLY the flat assignCells") {
    val cents = VectorOps.ivfCentroids(emb, "label")
    val flat = VectorOps.assignCells(emb, "vec_id", cents)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hier = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
        nSuper = 3, wSuper = 3)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier.size == flat.size)
    val diff = flat.keys.filter(k => flat(k) != hier(k))
    assert(diff.isEmpty,
      s"probing ALL supers must equal exhaustive search; diverged ids: ${diff.take(10)}")
  }

  test("wSuper = 1 routes through one super-region and stays close to exact") {
    val cents = VectorOps.ivfCentroids(emb, "label")
    val flat = VectorOps.assignCells(emb, "vec_id", cents)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hier = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
        nSuper = 3, wSuper = 1)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier.values.forall(_ >= 0) && hier.size == flat.size)
    val agree = flat.keys.count(k => flat(k) == hier(k)).toDouble / flat.size
    // 10 label centroids in 3 super-regions: most vectors' best cell
    // lives in their best region (boundary vectors may not — measured
    // 0.698 on this fixture; wSuper=2 is the recall knob)
    assert(agree >= 0.65, s"wSuper=1 agreement $agree below floor")
  }

  test("assignment is a pure map: ZERO shuffle exchanges, corpus never moves (auto-broadcast off)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // centroids from a STORED index (the serve posture): the
      // assignment plan over the corpus must contain no exchange at
      // all — levels 1 and 2 are expression folds over one broadcast
      // bundle row, never an explode/join/re-aggregation of the corpus
      val dir = java.nio.file.Files.createTempDirectory("hier_cents").toString
      VectorOps.ivfCentroids(emb, "label").write.mode("overwrite").parquet(dir)
      val assigned = VectorOps.assignCellsHierarchical(
        emb, "vec_id", spark.read.parquet(dir), nSuper = 3, wSuper = 2)
      assert(assigned.count() == emb.count())
      val ex = assigned.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e.treeString.linesIterator.next()
      }
      assert(ex.isEmpty, s"hierarchical assign must not shuffle:\n${ex.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("sharded assignment is hash-identical to the one-bundle-row path") {
    // the extreme-nlist shape: super→cells map sharded one row per
    // super, nothing nlist-sized broadcast — must produce the exact
    // same (id, cell) map as the bundle path at every (nSuper, wSuper)
    val cents = VectorOps.ivfCentroids(emb, "label")
    for ((ns, ws) <- Seq((3, 1), (3, 2), (3, 3), (2, 1))) {
      val bundle = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
          nSuper = ns, wSuper = ws)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sharded = VectorOps.assignCellsHierarchicalSharded(emb, "vec_id", cents,
          nSuper = ns, wSuper = ws)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sharded.size == bundle.size, s"nSuper=$ns wSuper=$ws sizes differ")
      val diff = bundle.keys.filter(k => bundle(k) != sharded(k))
      assert(diff.isEmpty,
        s"nSuper=$ns wSuper=$ws sharded != bundle; diverged ids: ${diff.take(10)}")
    }
  }

  test("sharded assignment broadcasts ONLY the supers — nothing nlist-sized rides a broadcast (auto-broadcast off)") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = java.nio.file.Files.createTempDirectory("shard_cents").toString
      VectorOps.ivfCentroids(emb, "label").write.mode("overwrite").parquet(dir)
      val assigned = VectorOps.assignCellsHierarchicalSharded(
        emb, "vec_id", spark.read.parquet(dir), nSuper = 3, wSuper = 2)
      assert(assigned.count() == emb.count())
      val bOuts = assigned.queryExecution.executedPlan.collect {
        case b: BroadcastExchangeLike => b.output.map(_.name)
      }
      assert(bOuts.nonEmpty, "the supers leaf must broadcast")
      // the cells ride the SHUFFLE join (one shard row per super);
      // a broadcast emitting a cells/cmap column would mean the
      // nlist-sized half of the index went over the broadcast after
      // all — the exact bound this shape exists to remove
      bOuts.foreach { names =>
        assert(!names.exists(n => n.contains("cells") || n.contains("cmap")),
          s"nlist-sized shard frame must not broadcast: $names")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("superQuantizer build: no window exchange — the nlist^1.5 argmax runs through bounded heaps") {
    import org.apache.spark.sql.execution.window.WindowExec
    // the one argmax the round-14 audit flagged: with nSuper = √nlist
    // the scored (cell × super) frame is nlist^1.5 rows — a window
    // would shuffle all of them; TopKPerKey's partial heaps reduce
    // map-side. The quantizer's returned assignment plan must contain
    // no WindowExec at all (the seed-numbering window is bounded to
    // the post-limit(nSuper) rows and lives in the SUPERS frame, not
    // the assignment).
    val cents = VectorOps.ivfCentroids(emb, "label")
    val (_, c2g) = VectorOps.superQuantizer(cents, nSuper = 3)
    assert(c2g.count() == cents.count())
    val wins = c2g.queryExecution.executedPlan.collect { case w: WindowExec => w }
    assert(wins.isEmpty,
      s"cell→super assignment must not use a window:\n${wins.map(_.treeString.linesIterator.next()).mkString("\n")}")
  }

  test("wSuper=0 probes nothing: default path yields null cells, exhaustiveFallback degenerates to the flat assign") {
    // the null-cell contract and its guard, exercised end-to-end: an
    // empty probe set makes EVERY row's probed-supers fold empty, so
    // the default path must emit null cells and the fallback must
    // resolve every row with the all-cells fold — exactly assignCells
    val cents = VectorOps.ivfCentroids(emb, "label")
    val nulls = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
      nSuper = 3, wSuper = 0)
    assert(nulls.filter(col("cell").isNotNull).count() == 0)
    val flat = VectorOps.assignCells(emb, "vec_id", cents)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fb = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
        nSuper = 3, wSuper = 0, exhaustiveFallback = true)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fb.size == flat.size)
    val diff = flat.keys.filter(k => flat(k) != fb(k))
    assert(diff.isEmpty,
      s"fallback must equal exhaustive search; diverged ids: ${diff.take(10)}")
    // and with real probing, the fallback changes nothing (it only
    // fires on rows the default path nulls out)
    val base = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
        nSuper = 3, wSuper = 2)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val guarded = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
        nSuper = 3, wSuper = 2, exhaustiveFallback = true)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(guarded == base)
  }

  test("sharded wSuper=0: degenerate rows SURVIVE with null cells; exhaustiveFallback equals the flat assign") {
    // the explode_outer contract (round-15 advice): an empty
    // probed-super array must not DROP the row from the output — the
    // bundle path keeps it with a null cell, so the sharded path must
    // too. And the sharded fallback's all-supers pass must equal the
    // exhaustive flat assign exactly (per-super then cross-super
    // argmax under one total order = the global fold).
    val cents = VectorOps.ivfCentroids(emb, "label")
    val nulls = VectorOps.assignCellsHierarchicalSharded(emb, "vec_id", cents,
      nSuper = 3, wSuper = 0)
    assert(nulls.count() == emb.count(), "rows must survive an empty probe set")
    assert(nulls.filter(col("cell").isNotNull).count() == 0)
    val flat = VectorOps.assignCells(emb, "vec_id", cents)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fb = VectorOps.assignCellsHierarchicalSharded(emb, "vec_id", cents,
        nSuper = 3, wSuper = 0, exhaustiveFallback = true)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fb.size == flat.size)
    val diff = flat.keys.filter(k => flat(k) != fb(k))
    assert(diff.isEmpty,
      s"sharded fallback must equal exhaustive search; diverged ids: ${diff.take(10)}")
    // with real probing the fallback changes nothing on this fixture
    // (no super owns zero cells — the guard short-circuits)
    for (ws <- Seq(1, 2)) {
      val base = VectorOps.assignCellsHierarchicalSharded(emb, "vec_id", cents,
          nSuper = 3, wSuper = ws)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val guarded = VectorOps.assignCellsHierarchicalSharded(emb, "vec_id", cents,
          nSuper = 3, wSuper = ws, exhaustiveFallback = true)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(guarded == base, s"wSuper=$ws fallback changed a non-null assignment")
    }
  }

  test("EMPTY centroids frame: both paths keep every row with a null cell") {
    val cents = VectorOps.ivfCentroids(emb, "label").filter(col("cell") < -1)
    val bundle = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
      nSuper = 3, wSuper = 1)
    val sharded = VectorOps.assignCellsHierarchicalSharded(emb, "vec_id", cents,
      nSuper = 3, wSuper = 1)
    assert(bundle.count() == emb.count())
    assert(sharded.count() == emb.count(),
      "sharded path dropped rows on an empty index (explode_outer regression)")
    assert(bundle.filter(col("cell").isNotNull).count() == 0)
    assert(sharded.filter(col("cell").isNotNull).count() == 0)
  }

  test("auto dispatch: parity across the threshold boundary (bundle vs sharded), with and without known index stats") {
    val cents = VectorOps.ivfCentroids(emb, "label")
    val base = VectorOps.assignCellsHierarchical(emb, "vec_id", cents,
        nSuper = 3, wSuper = 2)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bundleMaxBytes = 0 forces the sharded shape, MaxValue the
    // bundle shape — the SAME assignment either side of the crossover
    for (thr <- Seq(0L, Long.MaxValue)) {
      val auto = VectorOps.assignCellsHierarchicalAuto(emb, "vec_id", cents,
          nSuper = 3, wSuper = 2, bundleMaxBytes = thr)
        .select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(auto == base, s"auto dispatch at threshold $thr diverged")
    }
    // knownNlist/knownDims skip the metadata probe without changing
    // the dispatch semantics (10 label cells × 64 dims → bundle)
    val known = VectorOps.assignCellsHierarchicalAuto(emb, "vec_id", cents,
        nSuper = 3, wSuper = 2, knownNlist = 10L, knownDims = 64)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(known == base)
  }

  test("ivfBuildHierarchical: the parquet index artifact round-trips bit-exactly into serving") {
    // build an index with nlist = 8 (hierarchical assignment), store
    // both halves, and check serving from the STORED artifact equals
    // serving from the in-memory build — parquet must round-trip the
    // double centroids and long cells exactly, and the indexed corpus
    // must cover every vector with a valid cell
    val (indexed, cents) = VectorOps.ivfBuildHierarchical(
      emb, "vec_id", nlist = 8, nSuper = 3)
    assert(cents.count() == 8)
    assert(indexed.filter(col("cell").isNull).count() == 0)
    assert(indexed.count() == emb.count())
    val dir = java.nio.file.Files.createTempDirectory("hier_idx").toString
    indexed.write.mode("overwrite").parquet(s"$dir/corpus")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val probes = corpus.filter(col("vec_id") < 10)
    val served = VectorOps.ivfAnn(probes, corpus, "cell", k = 3, nprobe = 2,
        centroids = Some(spark.read.parquet(s"$dir/cents")))
      .orderBy("q_id", "rank").collect().toSeq
    val inMem = VectorOps.ivfAnn(probes, indexed, "cell", k = 3, nprobe = 2,
        centroids = Some(cents))
      .orderBy("q_id", "rank").collect().toSeq
    assert(served.nonEmpty && served == inMem)
    // every probe got results and ranks are dense from 1
    val perQ = served.groupBy(_.getLong(0))
    assert(perQ.size == 10)
    perQ.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted == (1 to rows.size))
    }
  }
}

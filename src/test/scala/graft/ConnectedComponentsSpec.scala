package graft

import org.apache.spark.sql.functions._
import graft.ops.dedup.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components across chains") {
    // two components: a 4-chain 1-2-3-4 (diameter 3 — needs real
    // propagation, not just one hop) and a pair 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("cycle converges and keeps min label") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("id_a", "id_b")
    val comp = ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("incremental equals full recompute on merge/attach/fresh/untouched") {
    // base graph: comp A = {1,2,3} (label 1), comp B = {10,11} (label
    // 10), comp C = {20,21} (label 20, untouched by the increment)
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val labels = ConnectedComponents.minLabel(base)
    // increment exercises every shape at once:
    //  (3,10)  MERGES standing A and B           -> all label 1
    //  (11,30) ATTACHES new node 30 to the merge -> label 1
    //  (40,41) FRESH component of new ids        -> label 40
    //  (2,3)   intra-component edge (no-op, self-edge after contraction)
    //  C untouched                               -> label 20 passes through
    val inc = Seq((3L, 10L), (11L, 30L), (40L, 41L), (2L, 3L))
      .toDF("id_a", "id_b")
    val got = ConnectedComponents.incremental(labels, inc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ConnectedComponents.minLabel(base.unionByName(inc))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"incremental diverged: $got vs $want")
    assert(got(30L) == 1L && got(40L) == 40L && got(41L) == 40L && got(20L) == 20L)
    ConnectedComponents.release(labels)
  }

  test("empty edge list yields empty labels") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.minLabel(edges).count() == 0)
  }

  test("property: matches a local union-find on random graphs") {
    // deterministic LCG so the test replays; graphs with long chains,
    // cycles, stars and singleton-free vertex sets
    var seed = 0x5eedL
    def next(mod: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % mod + mod) % mod).toInt
    }
    for (round <- 1 to 5) {
      val nV = 20 + next(30)
      val nE = 10 + next(40)
      val es = (1 to nE).map(_ => (next(nV).toLong, next(nV).toLong))
        .filter(e => e._1 != e._2)
      // local union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      // union-find roots are not necessarily component minima; reduce
      val expected = verts.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }.toMap
      val got = ConnectedComponents
        .minLabel(es.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"round $round, ${es.length} edges")
      val gotStar = ConnectedComponents
        .alternatingStar(es.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotStar == expected, s"star: round $round, ${es.length} edges")
    }
  }

  test("self-loop-only vertices are labeled by both algorithms") {
    val edges = Seq((7L, 7L), (1L, 2L)).toDF("id_a", "id_b")
    val viaMin = ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = ConnectedComponents.alternatingStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    assert(viaMin == expected)
    assert(viaStar == expected, "alternatingStar must keep self-loop-only vertices")
  }

  test("minLabelLocalized: same labels, zero pinned storage on return") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val viaLocal = ConnectedComponents.minLabelLocalized(edges)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "minLabelLocalized must release the superstep checkpoint before returning")
    val got = viaLocal.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // the localized frame stays usable after release (self-contained)
    assert(viaLocal.filter(col("component") === 1L).count() == 3)
  }

  test("storage contract: one persisted RDD per completed run, zero after release") {
    // the round-6 advisory: the edge checkpoint and superseded
    // supersteps must be freed DETERMINISTICALLY (not via driver GC +
    // ContextCleaner), leaving exactly the returned leaf — which the
    // caller frees with release()
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    def check(run: => org.apache.spark.sql.DataFrame): Unit = {
      // start from a clean slate: earlier tests' un-released results
      // are otherwise freed ASYNCHRONOUSLY by ContextCleaner mid-test
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      assert(persisted() == 0)
      val result = run
      result.collect() // caller consumes the labels
      assert(persisted() == 1,
        s"a completed run must hold ONLY its result leaf, got ${persisted()}")
      ConnectedComponents.release(result)
      assert(persisted() == 0, "release() must free the result leaf")
    }
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
    check(ConnectedComponents.minLabel(edges.toDF("id_a", "id_b")))
    check(ConnectedComponents.alternatingStar(edges.toDF("id_a", "id_b")))
  }

  test("long chain: alternatingStar converges where minLabel's superstep budget fails loudly") {
    val n = 150L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // diameter 149 > default 20 supersteps: must THROW, never silently
    // return partial labels
    intercept[IllegalArgumentException] {
      ConnectedComponents.minLabel(chain).collect()
    }
    val comp = ConnectedComponents.alternatingStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comp.length == n && comp.forall(_._2 == 0L),
      "one component labeled by its minimum")
  }
}

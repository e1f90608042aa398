package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the graph-analytics companion to
  * [[graft.ops.dedup.ConnectedComponents]] (components) and q135
  * (PageRank): per-node triangle participation and local clustering
  * coefficient, the standard structure signals for link-graph
  * quality scoring (spam rings are dense triangles; crawl frontiers
  * are trees).
  *
  * Scale shape — the degree-orientation trick: orient every
  * undirected edge from its ≺-smaller endpoint under the total
  * order ≺ = (degree, node). Every triangle x≺y≺z then appears
  * EXACTLY once as the wedge (x→y, x→z) closed by (y→z), and —
  * the point of the trick — each node's FORWARD degree is O(√m) on
  * any graph, so the wedge join's fan-out is bounded by m^(3/2)
  * total instead of Σ deg² (which a hub-heavy web graph makes
  * quadratic). Everything is hash-partitioned equi-joins and one
  * partial-agg count: no windows, no driver state, no corpus-sized
  * single task.
  */
object Graphs {

  /** Per-node triangle counts over an undirected edge list.
    * `edges` must have two atomic columns `u`, `v` (any orientation,
    * self-loops and duplicates tolerated — canonicalized and
    * distinct'd here). Output: (node, deg, n_tri, clustering) with
    * clustering = 2*n_tri / (deg*(deg-1)), 0.0 below degree 2. */
  def triangleCounts(edges0: DataFrame): DataFrame = {
    val und = edges0
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // forward edge (a -> b) with b's degree carried for the wedge order
    val f = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, col("dv")).otherwise(col("du")).as("db"))
    val e1 = f.select(col("a"), col("b").as("y"), col("db").as("dy"))
    val e2 = f.select(col("a"), col("b").as("z"), col("db").as("dz"))
    val wedges = e1.join(e2, Seq("a"))
      .filter(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
    val tris = wedges.join(
        f.select(col("a").as("y"), col("b").as("z")), Seq("y", "z"))
      .select(col("a").as("x"), col("y"), col("z"))
    val triPerNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("deg") >= 2,
          (lit(2.0) * col("n_tri")) / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)))
  }

  /** k-core decomposition by synchronous peeling — the third classic
    * link-graph quality signal after components and triangles: the
    * k-core (maximal subgraph where every node keeps degree ≥ k)
    * separates a web graph's connected nucleus from its tree-like
    * crawl fringe, and `peel_round` is an onion-layer depth (1 =
    * outermost leaves) used as a per-host prior.
    *
    * Each round computes degrees over the SURVIVING subgraph for
    * EVERY still-alive node (a node whose neighbors were all peeled
    * has degree 0 — it must be counted, not silently dropped with
    * its vanished edges) and removes all nodes below k at once.
    * Synchronous rounds make the result order-independent and
    * cross-engine replayable; the round count to fixpoint is bounded
    * by the graph's degeneracy ordering depth, small for web-shaped
    * graphs (leaves cascade inward one level per round).
    *
    * `rounds` is FIXED (not loop-until-fixpoint): the caller sizes it
    * past convergence for their graph (extra rounds are cheap no-ops
    * — empty anti-joins) and both engines of the hash gate run the
    * same round count, converged or not. At 100 TB each round is two
    * hash equi-joins + one partial-agg count, all key-partitioned; a
    * production loop would checkpoint the shrinking edge list every
    * few supersteps exactly like [[graft.ops.dedup.ConnectedComponents]].
    *
    * Output: (node, status 'core'|'peeled', peel_round int|null,
    * core_deg long|null — degree within the final subgraph). */
  def kCorePeel(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // Superstep discipline (the ConnectedComponents/Materialize one):
    // WITHOUT per-round materialization each round references the
    // previous round's frame three times (degree count + two
    // anti-joins), so the lazy plan tree grows 3^rounds and Catalyst
    // spends minutes optimizing a graph the executors would finish in
    // seconds. The shrinking edge list is leaf-cached each round
    // (previous round's blocks released eagerly); the per-round peel
    // sets are node-level and monotonically shrinking — localized
    // here (self-contained LocalRelations a query-shaped caller needs
    // no release() for), a staging table + release at cluster scale.
    val und = Materialize.leafCache(edges0
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    val allNodes = Materialize.localize(
      und.select(explode(array(col("u"), col("v"))).as("node")).distinct())
    var alive = allNodes
    var cur = und
    val peelSets = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val cnt = cur.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val bad = Materialize.localize(
        alive.join(cnt, Seq("node"), "left")
          .filter(coalesce(col("deg"), lit(0L)) < k)
          .select(col("node"), lit(r).as("peel_round")))
      peelSets += bad
      val badN = bad.select("node")
      alive = Materialize.localize(alive.join(badN, Seq("node"), "left_anti"))
      val next = Materialize.leafCache(cur
        .join(badN.withColumnRenamed("node", "u"), Seq("u"), "left_anti")
        .join(badN.withColumnRenamed("node", "v"), Seq("v"), "left_anti")
        .select(col("u"), col("v")))
      Materialize.release(cur)
      cur = next
    }
    val coreDeg = Materialize.localize(
      cur.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("core_deg")))
    Materialize.release(cur)
    val peeled = peelSets.reduce(_ unionByName _)
    allNodes
      .join(peeled, Seq("node"), "left")
      .join(coreDeg, Seq("node"), "left")
      .select(col("node"),
        when(col("peel_round").isNull, lit("core")).otherwise(lit("peeled"))
          .as("status"),
        col("peel_round").cast("int").as("peel_round"),
        col("core_deg").cast("long").as("core_deg"))
  }
}

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
}

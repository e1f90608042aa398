package graft.ops.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list by min-label
  * propagation — the canonical FINAL stage of a MinHash/LSH dedup
  * pipeline (SlimPajama/Dolma-style): verified near-dup pairs form
  * edges, each component is one duplicate cluster, and the member
  * with the smallest id is the cluster's canonical representative
  * (everything else gets dropped or downweighted).
  *
  * Each superstep is ONE shuffle (edge join + min-aggregate over the
  * neighbor labels); the loop stops when no label shrank — checked
  * with a driver-side count, the standard bounded-iteration pattern
  * of every distributed CC. Supersteps to converge = graph diameter.
  * Dedup graphs are near-cliques (LSH surfaces most pairs of a
  * cluster directly), so real corpora close in 2-3 supersteps; for
  * adversarial long-chain graphs the large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014) converges in O(log n) supersteps with the same
  * join+min building block. State per superstep is one (id, label)
  * row per vertex — nothing driver-side, nothing quadratic.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by (id_a, id_b) edge
    * rows. Returns one (id, component) row per vertex that appears in
    * at least one edge, where component = min vertex id reachable.
    *
    * Superstep economy (each exchange is wall time at any scale):
    *   - self-loops are unioned into the edge list ONCE, so a
    *     superstep is exactly join(labels on v) + groupBy(u).min —
    *     the vertex's own label rides the same aggregation as its
    *     neighbors' and no second "keep own label" join exists;
    *   - the first superstep is fused into initialization
    *     (label0 = min(self, direct neighbors) from one groupBy);
    *   - convergence is sum(component): labels only ever decrease,
    *     so the sum strictly decreases iff anything changed — a
    *     cached-scan aggregate instead of a join-and-count.
    * Intermediate labels are cached per superstep and unpersisted as
    * soon as the successor is materialized (the convergence sum is
    * the materializing action) — lineage stays one superstep deep, so
    * no stack-overflow plans on long chains. */
  def minLabel(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // the input edge list is referenced three times below (two union
    // directions + self-loops): cache it, or the caller's upstream
    // pipeline (often a whole LSH+verification chain) re-evaluates
    // per reference
    val e = edges.select(col("id_a").as("ea"), col("id_b").as("eb")).cache()
    // both directions + one self-loop per vertex; no distinct — the
    // min-aggregate is duplicate-blind and a corpus-wide distinct
    // would be a wasted exchange
    val dir = e.select(col("ea").as("u"), col("eb").as("v"))
      .union(e.select(col("eb").as("u"), col("ea").as("v")))
    // localCheckpoint, NOT cache: a cached plan short-circuits
    // execution but the optimizer still walks the FULL upstream tree
    // (the whole LSH pipeline) on every superstep, and the label
    // lineage nests one level per iteration — driver planning time
    // swamps the actual 300-row joins (measured 2-3x the whole query).
    // The eager checkpoint makes the edge list a leaf. On a cluster,
    // reliable checkpoint()/a staging table is the durable variant.
    // Also hash-partition on the probe key ONCE: the checkpointed
    // partitioning satisfies the per-superstep join's distribution, so
    // each superstep shuffles only the label frame (|V| rows), never
    // the edges (|E| rows) — the dominant frame of any real graph.
    val und = dir
      .union(dir.select(col("u"), col("u").as("v")).distinct())
      .repartition(col("v"))
      .localCheckpoint()
    e.unpersist()
    // numeric vertex ids required (dedup uses longs); empty graph -> 0
    def sumOf(df: DataFrame): Long =
      df.agg(coalesce(sum(col("component")), lit(0L))).head().getLong(0)
    // superstep 0: min over self + direct neighbors
    var labels = und.groupBy(col("u").as("id"))
      .agg(min(col("v")).as("component")).cache()
    var prevSum = sumOf(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val next = und
        .join(labels.select(col("id").as("v"), col("component")), "v")
        .groupBy(col("u").as("id")).agg(min(col("component")).as("component"))
        .cache()
      val s = sumOf(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    labels
  }
}

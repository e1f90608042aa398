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
    * Intermediate labels are cached per superstep and unpersisted as
    * soon as the successor is materialized (the convergence count is
    * the materializing action) — lineage stays one superstep deep, so
    * no stack-overflow plans on long chains. */
  def minLabel(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().cache()
    var labels = und.select(col("u").as("id")).distinct()
      .withColumn("component", col("id")).cache()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val viaNbr = und
        .join(labels.select(col("id").as("v"), col("component")), "v")
        .groupBy(col("u").as("id")).agg(min(col("component")).as("nc"))
      val next = labels.join(viaNbr, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nc"), col("component")))
            .as("component"))
        .cache()
      // labels only ever decrease; the count is also what materializes
      // `next` before its predecessor is released
      changed = next
        .join(labels.withColumnRenamed("component", "old"), "id")
        .filter(col("component") < col("old")).count()
      labels.unpersist()
      labels = next
      it += 1
    }
    und.unpersist()
    labels
  }
}

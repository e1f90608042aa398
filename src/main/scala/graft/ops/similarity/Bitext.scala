package graft.ops.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bitext / parallel-pair mining — the alignment pass that harvests
  * translation pairs for multilingual training (Artetxe & Schwenk
  * 2019 margin scoring; reference: the corpus-pairing shape of the
  * reference's cross-collection matching, re-expressed Spark-first).
  *
  * The FILTER (per-probe top-2 margin + mutual-best check) is one
  * fixed piece of algebra shared by every candidate generator; what
  * changes with scale is only WHERE the scored (a_id, b_id, cos)
  * pairs come from:
  *
  *   - [[exactPairs]]: the all-pairs cross join — the ground-truth
  *     oracle baseline (O(|A|·|B|), measured 7.7x per data decade in
  *     SCALE.md — deliberately NOT the serving path);
  *   - [[lshPairs]]: multi-table random-hyperplane LSH candidates —
  *     the corpus-scale path. Bucketing is a pure per-row map (one
  *     literal sign matrix per table, [[VectorOps.lshBucket]]); each
  *     table contributes one (bucket) equi-join between the two
  *     sides; pairs dedup BEFORE any cosine is scored. Candidate
  *     volume is L·Σ_b |A_b|·|B_b| ≈ L·|A|·|B|/2^planes for
  *     near-uniform buckets — at corpus scale `nPlanes` grows as
  *     log2(N) to hold per-bucket occupancy (and thus per-probe
  *     candidate count) constant, which is what makes the pair space
  *     ~linear in N rather than quadratic.
  *
  * Margin is Artetxe & Schwenk's difference form: cos1 − cos2, ONE
  * subtraction of two already-computed doubles (no float sums), so
  * the accept gate is bit-exact cross-engine. A pair is accepted
  * when it is the MUTUAL best (A's best B whose best A is that
  * probe) and the margin clears the gate — the standard filter that
  * kills hub vectors with many near-equal neighbors.
  */
object Bitext {

  /** Score ALL (a, b) pairs — exact candidate generation, the oracle
    * baseline. Inputs: (vec_id, embedding) per side. Output:
    * (a_id, b_id, cos). */
  def exactPairs(a: DataFrame, b: DataFrame): DataFrame = {
    val ap = a.select(col("vec_id").as("a_id"), col("embedding").as("av"),
      VectorOps.norm(col("embedding")).as("an"))
    val bp = b.select(col("vec_id").as("b_id"), col("embedding").as("bv"),
      VectorOps.norm(col("embedding")).as("bn"))
    ap.crossJoin(bp)
      .withColumn("cos", VectorOps.cosine(col("av"), col("bv"), col("an"), col("bn")))
      .select("a_id", "b_id", "cos")
  }

  /** Score only multi-table LSH candidate (a, b) pairs — the
    * corpus-scale candidate generator: a pair is scored iff the two
    * vectors share a bucket in ANY of `nTables` independent
    * hyperplane sets (table t uses plane indices [t·nPlanes,
    * (t+1)·nPlanes), identical to [[VectorOps.lshAnnMulti]], so the
    * DuckDB oracle replays buckets bit-for-bit). A true parallel
    * pair at cosine c collides per table with probability
    * (1−θ/π)^planes and is missed by all L tables with probability
    * (1−p)^L — recall rises geometrically with L while candidate
    * volume grows only linearly. */
  def lshPairs(a: DataFrame, b: DataFrame, nPlanes: Int = 8,
               nTables: Int = 4): DataFrame = {
    // one dims probe per side, not one per table per side
    val aDims = VectorOps.embeddingDims(a)
    val bDims = VectorOps.embeddingDims(b)
    val cand = (0 until nTables).map { t =>
      val ab = VectorOps.lshBucket(a.select(col("vec_id"), col("embedding")),
          "vec_id", nPlanes, t, aDims)
        .withColumnRenamed("vec_id", "a_id")
      val bb = VectorOps.lshBucket(b.select(col("vec_id"), col("embedding")),
          "vec_id", nPlanes, t, bDims)
        .withColumnRenamed("vec_id", "b_id")
      ab.join(bb, "bucket").select("a_id", "b_id")
    }.reduce(_ unionByName _)
      .distinct() // a pair colliding in several tables is scored ONCE
    val ap = a.select(col("vec_id").as("a_id"), col("embedding").as("av"),
      VectorOps.norm(col("embedding")).as("an"))
    val bp = b.select(col("vec_id").as("b_id"), col("embedding").as("bv"),
      VectorOps.norm(col("embedding")).as("bn"))
    cand.join(ap, "a_id").join(bp, "b_id")
      .withColumn("cos", VectorOps.cosine(col("av"), col("bv"), col("an"), col("bn")))
      .select("a_id", "b_id", "cos")
  }

  /** The margin + mutual-best accept filter over scored pairs
    * (a_id, b_id, cos) — identical algebra whatever generated the
    * candidates. Per-probe top-2 and per-candidate top-1 are
    * high-cardinality-keyed windows; the mutual check is an
    * equi-join of the two winner sets. A probes with fewer than two
    * scored candidates carries no margin and drops (inner join on
    * the rk=2 row) — under LSH candidates that is the correct
    * abstention, not a bug: one candidate gives no evidence the
    * best is SEPARATED from the rest. */
  def marginMutual(pairs: DataFrame, marginMin: Double): DataFrame = {
    val wa = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id"))
    val top2 = pairs.withColumn("rk", row_number().over(wa)).filter(col("rk") <= 2)
    val aBest = top2.filter(col("rk") === 1).select(col("a_id"), col("b_id"), col("cos"))
      .join(top2.filter(col("rk") === 2).select(col("a_id"), col("cos").as("cos2")),
        Seq("a_id"))
      .withColumn("margin", col("cos") - col("cos2"))
    val wb = Window.partitionBy("b_id").orderBy(col("cos").desc, col("a_id"))
    val bBest = pairs.withColumn("rk", row_number().over(wb)).filter(col("rk") === 1)
      .select(col("b_id"), col("a_id").as("b_best_a"))
    aBest.join(bBest, Seq("b_id"))
      .withColumn("mutual", when(col("b_best_a") === col("a_id"), "Y").otherwise("N"))
      .withColumn("accept",
        when(col("mutual") === "Y" && col("margin") >= marginMin, "Y").otherwise("N"))
      .select("a_id", "b_id", "cos", "margin", "mutual", "accept")
  }
}

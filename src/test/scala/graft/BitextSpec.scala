package graft

import org.apache.spark.sql.functions._
import graft.ops.similarity.Bitext

/** Recall gates for the ANN serving paths (q198/q199): the
  * approximate retrievers must provably recover what the exact
  * oracle forms find. Everything here is deterministic (md5-derived
  * hyperplanes, fixed fixtures), so the measured recalls are exact
  * constants per SF — the asserts pin floors safely below them. */
class BitextSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The q198 planted input: b-side twins (ids +100001, component 0
    * zeroed) of the first 20 a-side vectors. */
  private def plantedSides() = {
    val emb = graft.core.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val twins = emb.filter(col("vec_id") < 40 && col("vec_id") % 2 === 0)
      .select((col("vec_id") + 100001).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(0.0 AS FLOAT) ELSE x END)")
          .as("embedding"))
    val all = emb.unionByName(twins)
    (all.filter(col("vec_id") % 2 === 0), all.filter(col("vec_id") % 2 === 1))
  }

  test("q198: LSH candidates recover the exact filter's accepted pairs (planted bitext)") {
    val (a, b) = plantedSides()
    def accepted(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Bitext.marginMutual(pairs, 0.01).filter(col("accept") === "Y")
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactAcc = accepted(Bitext.exactPairs(a, b))
    val annAcc = accepted(Bitext.lshPairs(a, b, nPlanes = 8, nTables = 4))
    // planted parallel pairs: (a, a + 100001) for even a < 40
    val planted = (0L until 40L by 2).map(i => (i, i + 100001L)).toSet
    val exactPlanted = exactAcc.intersect(planted)
    val annPlanted = annAcc.intersect(planted)
    info(s"exact accepts: ${exactAcc.size} (planted ${exactPlanted.size}/20); " +
      s"ann accepts: ${annAcc.size} (planted ${annPlanted.size})")
    // the exact filter must itself find nearly all planted pairs —
    // otherwise the recall statement below gates against nothing
    assert(exactPlanted.size >= 18,
      s"exact filter found only ${exactPlanted.size}/20 planted pairs")
    // THE GATE: planted parallel pairs recovered by the ANN form at
    // >= 85% of the exact answer (deterministic on this fixture)
    val plantedRecall = annPlanted.size.toDouble / exactPlanted.size
    assert(plantedRecall >= 0.85,
      s"planted-pair recall $plantedRecall < 0.85 " +
        s"(${annPlanted.size}/${exactPlanted.size})")
    // and every ANN accept must be an exact accept OR a genuine
    // candidate-subset effect (margin computed over fewer candidates
    // can only WIDEN, flipping accept on; mutual-best over fewer
    // candidates can flip a hub pair on) — planted accepts must
    // never be hallucinated pairs
    assert(annPlanted.subsetOf(exactPlanted),
      "ANN must not accept a planted pair the exact filter rejects")
  }

  test("q198: LSH candidate volume is a small fraction of the cross join") {
    val (a, b) = plantedSides()
    val nExact = Bitext.exactPairs(a, b).count()
    val nLsh = Bitext.lshPairs(a, b, nPlanes = 8, nTables = 4).count()
    info(s"scored pairs: exact $nExact, lsh $nLsh (${100.0 * nLsh / nExact}%)")
    // 4 tables x 8 planes over near-orthogonal vectors: ~L/2^8 of the
    // pair space; allow generous headroom over the expected ~2-8%
    assert(nLsh.toDouble / nExact <= 0.20,
      s"LSH candidate volume $nLsh/$nExact is not sublinear in the pair space")
  }

  test("q199: the gated serving kNN retrieves the true nearest neighbor per probe") {
    val rows = QueryCatalogSim.q199KnnAnnGated(spark, dir)
      .select("q_id", "rank", "rank_true").collect()
    val probes = rows.map(_.getLong(0)).distinct
    assert(probes.length == 20, s"expected 20 probes, got ${probes.length}")
    // recall of the TRUE top-1 (the planted source vector): the
    // number every serving index is judged on first
    val top1Found = rows.filter(_.getInt(2) == 1).map(_.getLong(0)).distinct
    val top1Recall = top1Found.length.toDouble / probes.length
    // MRR from the same rows: reciprocal ANN rank of the true top-1
    val mrr = probes.map { q =>
      rows.find(r => r.getLong(0) == q && r.getInt(2) == 1)
        .map(r => 1.0 / r.getInt(1)).getOrElse(0.0)
    }.sum / probes.length
    info(s"top1 recall $top1Recall, mrr $mrr")
    assert(top1Recall >= 0.9,
      s"true-nearest-neighbor recall $top1Recall < 0.9")
    assert(mrr >= 0.85, s"MRR $mrr < 0.85")
  }
}

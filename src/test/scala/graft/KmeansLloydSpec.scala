package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.similarity.VectorOps

/** The Lloyd-round checkpoint (round-13 verdict item 5): kmeansCells
  * and pqCodes localize the k-row centroid frame between rounds so the
  * lazy plan stays FLAT in iters — and the localized build must stay
  * bit-identical to the raw foldLeft. */
class KmeansLloydSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def planSize(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p => p }.size

  test("kmeansCells: hash parity between the checkpointed and raw Lloyd folds (iters = 3)") {
    val raw = VectorOps.kmeansCellsImpl(emb, "vec_id", k = 4, iters = 3,
        checkpointRounds = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ck = VectorOps.kmeansCells(emb, "vec_id", k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ck == raw, "checkpointed rounds must not change a single assignment")
  }

  test("kmeansCells: plan size is FLAT in iters with checkpoints, growing without") {
    val ck2 = planSize(VectorOps.kmeansCells(emb, "vec_id", k = 4, iters = 2))
    val ck5 = planSize(VectorOps.kmeansCells(emb, "vec_id", k = 4, iters = 5))
    assert(ck5 == ck2,
      s"checkpointed plan must not grow with iters: iters=2 -> $ck2 nodes, iters=5 -> $ck5")
    val raw2 = planSize(VectorOps.kmeansCellsImpl(emb, "vec_id", k = 4, iters = 2,
      checkpointRounds = false))
    val raw5 = planSize(VectorOps.kmeansCellsImpl(emb, "vec_id", k = 4, iters = 5,
      checkpointRounds = false))
    assert(raw5 > raw2, "sanity: the raw fold's plan grows with iters")
  }

  test("pqCodes: hash parity and flat plan across iters") {
    val (rawCodes, _) = VectorOps.pqCodesImpl(emb, "vec_id", m = 4, ksub = 4,
      iters = 3, checkpointRounds = false)
    val (ckCodes, ckBooks) = VectorOps.pqCodes(emb, "vec_id", m = 4, ksub = 4,
      iters = 3)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(key(ckCodes) == key(rawCodes))
    assert(ckBooks.count() == 16) // m * ksub codebook rows survive the rounds
    val p2 = planSize(VectorOps.pqCodes(emb, "vec_id", m = 4, ksub = 4, iters = 2)._1)
    val p5 = planSize(VectorOps.pqCodes(emb, "vec_id", m = 4, ksub = 4, iters = 5)._1)
    assert(p5 == p2, s"pq plan must stay flat: iters=2 -> $p2, iters=5 -> $p5")
  }
}

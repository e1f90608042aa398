package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.similarity.VectorOps

/** Semantic invariants + plan shape for the hybrid-retrieval family
  * (q165 RRF fusion, q167 hard negatives) and corpus-drift TV
  * distance (q166) — the arithmetic the oracle hash can confirm but
  * not explain. */
class RetrievalDriftSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q165 RRF: fused score is exactly the integer reciprocal sum; ranks dense per probe") {
    val rows = QueryCatalogSim.all("q165_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = Option(r.getAs[Any]("rank_lex")).map(_.asInstanceOf[Int])
      val den = Option(r.getAs[Any]("rank_dense")).map(_.asInstanceOf[Int])
      val want = lex.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        den.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_score") == want, s"rrf mismatch at $r")
      assert(lex.nonEmpty || den.nonEmpty, "a fused candidate must come from a list")
    }
    // per probe: ranks are 1..n with strictly decreasing-or-tied scores
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        s"ranks not dense for probe $q")
      val scores = sorted.map(_.getAs[Long]("rrf_score")).toSeq
      assert(scores == scores.sorted.reverse, s"scores not monotone for probe $q")
      assert(rs.length <= 10)
    }
  }

  test("q167 hard negatives: lexically close, and provably OUTSIDE the dense top-20") {
    val hard = QueryCatalogSim.all("q167_hard_negatives")(spark, sf).collect()
    assert(hard.nonEmpty, "fixture corpus should yield hard negatives")
    val dense = VectorOps.bruteForceKnn(
        Tables.embeddings(spark, sf).filter(col("vec_id") < 10),
        Tables.embeddings(spark, sf), k = 20)
      .select("q_id", "c_id").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    hard.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))
      assert(!dense.contains(key), s"$key is in the dense top-20 — not a negative")
      assert(r.getAs[Int]("rank_lex") <= 5)
    }
  }

  test("q166 drift: tv is a probability distance in [0,1], constant within a language") {
    val rows = QueryCatalogText.all("q166_corpus_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val tvs = rs.map(_.getAs[Double]("tv")).distinct
      assert(tvs.length == 1, s"tv must be one value per language, got $tvs for $lang")
      assert(tvs.head >= 0.0 && tvs.head <= 1.0, s"tv out of range for $lang: $tvs")
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      // top tokens really are ordered by their integer contribution
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("contrib")).toSeq
      assert(byRank == byRank.sorted.reverse, s"contrib not monotone for $lang")
    }
  }

  test("q166 drift on two IDENTICAL slices is exactly zero") {
    // duplicate every doc into both slices: c_a == c_b for every token,
    // so every cross-multiplied contribution — and tv — is exactly 0
    import spark.implicits._
    val docs = Seq((0L, "a b b c"), (1L, "a c"), (2L, "b a"), (3L, "c c b"))
      .toDF("id", "text")
    val toks = docs.select((col("id") % 2 === 0).as("in_a"),
      explode(split(col("text"), "\\s+")).as("t"))
    // ids 0,2 even / 1,3 odd hold different docs → nonzero normally; make
    // the slices identical by unioning the swap
    val both = toks.union(docs.select((col("id") % 2 =!= 0).as("in_a"),
      explode(split(col("text"), "\\s+")).as("t")))
    val pt = both.groupBy("t").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(col("in_a"), 0L).otherwise(1L)).as("c_b"))
    val tot = pt.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    val tv = pt.crossJoin(broadcast(tot))
      .select(abs(col("c_a") * col("n_b") - col("c_b") * col("n_a")).as("contrib"))
      .agg(sum("contrib")).collect()(0).getLong(0)
    assert(tv == 0L, "identical slices must have zero total variation")
  }

  test("q165/q166 plans rank via the bounded TopKPerKey heap, probes broadcast") {
    val fused = QueryCatalogSim.all("q165_rrf_fusion")(spark, sf)
    fused.collect()
    val p165 = fused.queryExecution.executedPlan.toString
    assert(p165.contains("TopKPerKeyPartial") && p165.contains("TopKPerKeyFinal"),
      "lexical top-k must be the bounded heap, not a corpus-sized Window sort")
    assert(p165.contains("BroadcastHashJoin"), "probe postings must broadcast")
    val drift = QueryCatalogText.all("q166_corpus_drift")(spark, sf)
    drift.collect()
    val p166 = drift.queryExecution.executedPlan.toString
    assert(p166.contains("TopKPerKeyPartial") && p166.contains("TopKPerKeyFinal"),
      "per-language top tokens must come from the bounded heap")
  }
}

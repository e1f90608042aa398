package graft

import org.apache.spark.sql.functions._
import graft.ops.text.ProfileClassifier

/** The trainable class-profile classifier (q204's machinery):
  * hand-checked counting model, exact cross-product argmax,
  * deterministic ties, and the learned-signal floor on the real
  * fixture. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("train counts the per-class token profile exactly") {
    val docs = Seq(
      ("a", "spam spam eggs"), ("a", "spam ham"),
      ("b", "eggs eggs toast")).toDF("label", "text")
    val model = ProfileClassifier.train(docs, "text", "label")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(model == Map(
      ("a", "spam") -> 3L, ("a", "eggs") -> 1L, ("a", "ham") -> 1L,
      ("b", "eggs") -> 2L, ("b", "toast") -> 1L))
  }

  test("classify: length-normalized argmax by exact cross-products") {
    // class a: 5 tokens total; class b: 3 tokens total.
    val model = Seq(
      ("a", "spam", 3L), ("a", "eggs", 1L), ("a", "ham", 1L),
      ("b", "eggs", 2L), ("b", "toast", 1L)).toDF("label", "tok", "n")
    val docs = Seq(
      (1L, "spam spam"),   // A_a=6, A_b=0 -> a
      (2L, "eggs"),        // A_a=1, A_b=2; 1/5 < 2/3 -> b
      (3L, "eggs toast"),  // A_a=1, A_b=3 -> b
      (4L, "unseen words") // zero overlap: all ties -> smallest label
    ).toDF("doc_id", "text")
    val got = ProfileClassifier.classify(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("a", 6L)), 2L -> (("b", 2L)),
      3L -> (("b", 3L)), 4L -> (("a", 0L))))
  }

  test("classify: normalization matters — raw counts would pick the big class") {
    // 'the' appears 10x in big, 2x in small (big class is 5x larger):
    // raw affinity favors big (10 > 2), but per-token rate favors
    // small (2/10 > 10/100) — the length normalization must win.
    val model = Seq(
      ("big", "the", 10L), ("big", "filler", 90L),
      ("small", "the", 2L), ("small", "filler", 8L)).toDF("label", "tok", "n")
    val got = ProfileClassifier.classify(
      Seq((1L, "the")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()(0)
    assert(got.getString(1) == "small", s"must normalize by class size: $got")
  }

  test("single-class model: every doc predicts the only class, batch == stream") {
    // k=1 used to emit ZERO batch rows (the rival self-join filtered
    // everything) while the stream scorer emitted rows via an
    // out-of-bounds fold read — both sides now agree
    val model = Seq(("only", "spam", 3L), ("only", "ham", 1L))
      .toDF("label", "tok", "n")
    val docs = Seq((1L, "spam ham"), (2L, "unseen")).toDF("doc_id", "text")
    val batch = ProfileClassifier.classify(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch == Set((1L, "only", 4L), (2L, "only", 0L)))
    val mrow = ProfileClassifier.modelRow(model)
    val stream = graft.streaming.StreamingJobs.classifyStream(docs, "text", mrow)
      .select("doc_id", "pred", "a_pred")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(stream == batch, s"batch=$batch stream=$stream")
  }

  test("q204 fixture: the planted tier signal is actually learned") {
    val res = QueryCatalogText.q204ProfileClassifier(
      spark, "/root/testdata/sf0.001")
    val agg = res.agg(
      count(lit(1)).as("n"),
      sum(when(col("hit") === "Y", 1).otherwise(0)).as("ok")).collect()(0)
    val (n, ok) = (agg.getLong(0), agg.getLong(1))
    assert(n > 0)
    // 3 balanced classes -> chance = 1/3; the planted marker density
    // must push held-out accuracy far above it
    assert(ok.toDouble / n >= 0.9,
      s"held-out accuracy ${ok.toDouble / n} below the learned-signal floor")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.similarity.VectorOps

/** The packed-code PQ serving path: ADC over one-row-per-vector codes
  * with a broadcast lookup map and a bounded-heap top-k must be
  * BIT-IDENTICAL to the unpacked (mi, code)-join form — the layouts
  * differ only in where bytes move, never in answers. */
class PqServeSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("pqAdcTopKPacked equals pqAdcTopK bit-for-bit") {
    val e = emb
    val (codes, books) = VectorOps.pqCodes(e, "vec_id", m = 4, ksub = 4)
    val probes = e.filter(col("vec_id") % 97 === 0)
    val unpacked = VectorOps.pqAdcTopK(probes, codes, books, "vec_id", m = 4, k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val packed = VectorOps.pqAdcTopKPacked(probes,
        VectorOps.pqCodesPacked(codes, "vec_id"), books, "vec_id",
        m = 4, ksub = 4, k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(packed.nonEmpty && packed == unpacked)
  }

  test("pqServeTopK (stored packed index) equals pqRefinedTopK") {
    val e = emb
    val (codes, books) = VectorOps.pqCodes(e, "vec_id", m = 4, ksub = 4)
    val dir = java.nio.file.Files.createTempDirectory("pq_serve_idx").toString
    VectorOps.pqCodesPacked(codes, "vec_id")
      .write.mode("overwrite").parquet(s"$dir/packed")
    books.write.mode("overwrite").parquet(s"$dir/books")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val probes = e.filter(col("vec_id") < 10)
    val refined = VectorOps.pqRefinedTopK(probes, e,
        spark.read.parquet(s"$dir/codes"), spark.read.parquet(s"$dir/books"),
        "vec_id", m = 4, k = 3, shortlist = 20)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val served = VectorOps.pqServeTopK(probes, e,
        spark.read.parquet(s"$dir/packed"), spark.read.parquet(s"$dir/books"),
        "vec_id", m = 4, ksub = 4, k = 3, shortlist = 20)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(served.nonEmpty && served == refined)
  }

  test("packed serving over an over-budget probe set still agrees (gates dropped, shuffle regime)") {
    val e = emb
    val (codes, books) = VectorOps.pqCodes(e, "vec_id", m = 4, ksub = 4)
    val packed = VectorOps.pqCodesPacked(codes, "vec_id")
    val probes = e.filter(col("vec_id") < 10)
    val small = VectorOps.pqServeTopK(probes, e, packed, books,
        "vec_id", m = 4, ksub = 4, k = 3, shortlist = 20)
      .orderBy("q_id", "rank").collect().toSeq
    val overBudget = VectorOps.pqServeTopK(probes, e, packed, books,
        "vec_id", m = 4, ksub = 4, k = 3, shortlist = 20,
        probeBroadcastMax = 0L)
      .orderBy("q_id", "rank").collect().toSeq
    assert(small == overBudget, "both regimes must agree exactly")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.multimodal.MultimodalOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("CorpusCurationJob.run writes curated corpus consistent with its funnel") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    graft.pipeline.CorpusCurationJob.run(spark, docs, out)
    val curated = spark.read.parquet(s"$out/curated")
    val funnel = spark.read.parquet(s"$out/funnel")
    val fromFunnel = funnel.agg(org.apache.spark.sql.functions.sum("n_quality"))
      .head.getLong(0)
    assert(curated.count() == fromFunnel, "funnel tail must equal curated count")
    assert(curated.count() > 0 && curated.count() <= docs.count())
  }

  private def payloads(texts: (Long, String)*) =
    MultimodalOps.attachPayload(texts.toSeq.toDF("doc_id", "text"), "text")

  test("frameSample slices fixed frames with stride") {
    val df = payloads((1L, "a" * 100)) // 100 bytes -> frames of 40: 3 frames
    val rows = MultimodalOps.frameSample(df, frameLen = 40, stride = 2)
      .select("frame_no", "frame_len").orderBy("frame_no")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    // stride 2 keeps frames 0 and 2; frame 2 is the 20-byte tail
    assert(rows.toSeq == Seq((0, 40), (2, 20)))
  }

  test("frameSample stride 1 reconstructs the payload byte-for-byte") {
    val text = "The quick brown fox jumps over the lazy dog, repeatedly." * 3
    val df = payloads((1L, text))
    val frames = MultimodalOps.frameSample(df, frameLen = 16, stride = 1)
      .orderBy("frame_no").select("frame")
      .collect().map(_.getAs[Array[Byte]](0))
    assert(frames.map(new String(_, "UTF-8")).mkString == text)
  }

  test("fakeResize downsamples payload bytes with the batch shape intact") {
    val df = payloads((7L, "abcdefghij"))
    val r = MultimodalOps.fakeResize(df, "doc_id", factor = 3).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("resized"), "UTF-8") == "adgj")
    assert(r.getAs[Int]("orig_len") == 10 && r.getAs[Int]("resized_len") == 4)
  }

  test("frameSample payload shorter than one frame yields a single short frame") {
    val rows = MultimodalOps.frameSample(payloads((1L, "tiny")), 64, 2)
      .select("frame_no", "frame_len")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((0, 4)))
  }
}

package graft.ops.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.security.MessageDigest

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, with a batch-shaped decode/feature-extract stage.
  *
  * The real image/audio decode libraries are absent in this
  * environment, so `fakeDecodeFeatures` is a clearly-marked
  * deterministic stand-in (md5-derived features). What IS real and
  * load-bearing for 100 TB: the schema (binary payload + metadata
  * struct), the mapPartitions batch shape (decoders amortize model /
  * codec setup per batch, exactly like a Pandas-UDF batch), and the
  * partition-parallel execution — swap `fakeFeatures` for a JNI/ONNX
  * call and nothing else changes.
  */
object MultimodalOps {

  /** Wrap a text column as an opaque binary payload with metadata —
    * the shape an image/audio column has in a lakehouse table. */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("payload_len", octet_length(col("payload")))
      .withColumn("meta", struct(
        col("payload_len").as("n_bytes"),
        lit("text/fake").as("mime"),
        ceil(col("payload_len") / 256.0).cast("long").as("n_chunks")))

  /** STUB decode: md5(payload) -> 4 uint32 features. Deterministic,
    * engine-independent (oracle replays it in SQL as hex slices of
    * md5). Replace with a real decoder at the marked line. */
  private def fakeFeatures(payload: Array[Byte]): Array[Long] = {
    val hex = MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    // ??? real decode goes here (image resize / audio frame-sample);
    // the md5 slices below are the deterministic stand-in.
    (0 until 4).map(i => java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16)).toArray
  }

  /** Frame sampling: slice the payload into fixed `frameLen`-byte
    * frames and keep every `stride`-th one (a video keyframe / audio
    * window sampler over the opaque payload). Pure column ops —
    * explode over a generated frame-index sequence + substring — so
    * the sampler runs inside codegen with no UDF, and the oracle can
    * replay it byte-for-byte. Output: (id cols…, frame_no, frame
    * binary, frame_len). */
  def frameSample(df: DataFrame, frameLen: Int, stride: Int): DataFrame =
    df.withColumn("n_frames",
        ceil(octet_length(col("payload")).cast("double") / frameLen).cast("int"))
      .withColumn("frame_no",
        explode(expr(s"filter(sequence(0, n_frames - 1), i -> i % $stride = 0)")))
      .withColumn("frame",
        expr(s"substring(payload, frame_no * $frameLen + 1, $frameLen)"))
      .withColumn("frame_len", octet_length(col("frame")))
      .drop("n_frames")

  /** STUB resize: byte-stride downsampling of the payload (every
    * `factor`-th byte) with the SAME batch-shaped plumbing as decode —
    * swap the body for a real image scaler and the schema, batching
    * and partition parallelism stay. Output: id, resized payload,
    * original/resized lengths. */
  def fakeResize(df: DataFrame, idCol: String, factor: Int,
                 batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("resized", BinaryType),
      StructField("orig_len", IntegerType),
      StructField("resized_len", IntegerType)))
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (scaler/codec init)
        batch.map { r =>
          val p = r.getAs[Array[Byte]]("payload")
          // ??? real resize goes here; byte-stride is the stand-in
          val out = p.indices.collect { case i if i % factor == 0 => p(i) }.toArray
          Row(r.getLong(0), out, p.length, out.length)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Batch-shaped feature extraction over (id, payload) rows:
    * mapPartitions, batches of `batchSize` rows — the decoder
    * amortization boundary. Output (id, f0..f3). */
  def fakeDecodeFeatures(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("f0", LongType), StructField("f1", LongType),
      StructField("f2", LongType), StructField("f3", LongType)))
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (codec init, model load)
        batch.map { r =>
          val f = fakeFeatures(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), f(0), f(1), f(2), f(3))
        }
      }
    }(Encoders.row(outSchema))
  }
}

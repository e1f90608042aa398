package graft.ops.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, with a batch-shaped decode/feature-extract stage.
  *
  * IMAGE decode/resize is REAL: the JDK's `javax.imageio` reads and
  * writes PNG/JPEG with zero external dependencies
  * ([[decodeImageMeta]], [[resizeImageNN]], fixture generator
  * [[synthImagePayload]]). AUDIO decode is REAL for PCM WAV: the
  * JDK's `javax.sound.sampled` parses RIFF/WAVE with zero external
  * deps ([[decodeWavMeta]], fixture generator [[synthWavPayload]]).
  * VIDEO frame decode is REAL for the uncompressed-DIB AVI form:
  * [[aviDecodeFrames]] walks the RIFF container grammar and decodes
  * every frame chunk through ImageIO (fixture generator
  * [[synthAviPayload]]); MP4 container metadata is parsed without a
  * codec ([[mp4ContainerMeta]], [[mp4SampleTable]]). Compressed
  * video codecs (H.264 etc.) are absent in this environment and NO
  * stand-in is kept for them: every decode path that exists here is
  * a real codec, and compressed-codec frame decode is simply out of
  * scope (a deployment with FFmpeg/JNI swaps the mapPartitions body,
  * nothing else).
  * What is load-bearing for 100 TB either way: the schema (binary
  * payload + metadata struct), the mapPartitions batch shape
  * (decoders amortize codec/model setup per batch, exactly like a
  * Pandas-UDF batch), the corrupt-row discipline (a crawl ALWAYS
  * contains truncated files — a bad payload yields ok='N', never a
  * task failure), and the partition-parallel execution — swap the
  * body for a JNI/ONNX call and nothing else changes.
  */
object MultimodalOps {

  /** REAL PNG fixture generator: encodes a deterministic synthetic
    * image per row with the JDK's ImageIO (the container ships no
    * sample media). Image: (8 + id%8) x (4 + id%4) pixels, constant
    * gray id%256 — dims and channel sums have CLOSED FORMS in id, so
    * a SQL oracle verifies the full encode->decode round trip without
    * itself decoding anything. Rows where `corruptCol` is true emit
    * the raw text bytes instead (a payload no image reader accepts) —
    * the planted truncated-crawl-file case. */
  def synthImagePayload(df: DataFrame, idCol: String, textCol: String,
                        corruptCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"),
      col(textCol).cast("string"), col(corruptCol).cast("boolean"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file spills per encode
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes =
            // null text on the corrupt branch -> empty payload (still
            // decodes to ok='N'; a null-text corpus must not NPE)
            if (r.getBoolean(2))
              (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
            else {
              val w = (8 + id % 8).toInt; val h = (4 + id % 4).toInt
              val c = (id % 256).toInt
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val rgb = (c << 16) | (c << 8) | c
              var y = 0
              while (y < h) {
                var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              bos.toByteArray
            }
          Row(id, bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL image decode via `javax.imageio` (PNG/JPEG, zero external
    * deps): width, height, exact red-channel sum per payload.
    * Batch-shaped mapPartitions like every decoder here. A payload no
    * reader accepts — truncated file, wrong mime, raw text — decodes
    * to (null, null, null, ok='N') instead of failing the task.
    * Output: (id, width, height, red_sum, ok). */
  def decodeImageMeta(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("red_sum", LongType), StructField("ok", StringType)))
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Row(r.getLong(0), null, null, null, "N")
          else {
            val w = img.getWidth; val h = img.getHeight
            var sum = 0L; var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
              y += 1
            }
            Row(r.getLong(0), w, h, sum, "Y")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL resize: decode (ImageIO), nearest-neighbor resample to
    * (outW, outH) — a hand-rolled sampling loop, NOT Graphics2D
    * interpolation, so the pixels are bit-deterministic across JVMs —
    * then PNG re-encode. Undecodable payloads pass through as
    * (null payload, ok='N'). Output: (id, resized, orig_w, orig_h,
    * ok). */
  def resizeImageNN(df: DataFrame, idCol: String, outW: Int, outH: Int,
                    batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("resized", BinaryType),
      StructField("orig_w", IntegerType), StructField("orig_h", IntegerType),
      StructField("ok", StringType)))
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Row(r.getLong(0), null, null, null, "N")
          else {
            val w = img.getWidth; val h = img.getHeight
            val dst = new java.awt.image.BufferedImage(
              outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < outH) {
              var x = 0
              while (x < outW) {
                dst.setRGB(x, y, img.getRGB(x * w / outW, y * h / outH)); x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            Row(r.getLong(0), bos.toByteArray, w, h, "Y")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL WAV fixture generator: encodes a deterministic mono 16-bit
    * PCM WAV per row with the JDK's `javax.sound.sampled` (zero
    * external deps — the same trick as [[synthImagePayload]]).
    * Audio: n = 64 + id%64 samples at 8000 + (id%3)*4000 Hz, sample i
    * carries the value (id%100) + i — so the sample COUNT, RATE and
    * SUM all have closed forms in id and a SQL oracle verifies the
    * encode->decode round trip without decoding anything. Rows where
    * `corruptCol` is true emit the raw text bytes instead (no RIFF
    * header — the truncated-crawl-file case). */
  def synthWavPayload(df: DataFrame, idCol: String, textCol: String,
                      corruptCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"),
      col(textCol).cast("string"), col(corruptCol).cast("boolean"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes =
            // null text on the corrupt branch -> empty payload (q148's
            // decoder classifies it ok='N'; never an NPE)
            if (r.getBoolean(2))
              (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
            else {
              val n = (64 + id % 64).toInt
              val rate = (8000 + (id % 3) * 4000).toFloat
              val pcm = new Array[Byte](n * 2) // 16-bit LE mono
              var i = 0
              while (i < n) {
                val v = ((id % 100) + i).toInt
                pcm(2 * i) = (v & 0xff).toByte
                pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
                i += 1
              }
              val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1,
                true, false) // signed, little-endian
              val ais = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
              val bos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(ais,
                javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              bos.toByteArray
            }
          Row(id, bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL WAV decode via `javax.sound.sampled` (PCM, zero external
    * deps): sample count, rate, channel count and the exact signed
    * 16-bit sample sum per payload. Batch-shaped mapPartitions like
    * every decoder here. A payload the parser rejects (no RIFF
    * header, wrong mime, raw text) decodes to nulls + ok='N'; a
    * TRUNCATED file — header promises more frames than the data
    * section holds — is also ok='N' (a crawl's most common audio
    * corruption; silently summing half a file would poison the
    * features downstream). Output: (id, n_samples, sample_rate,
    * channels, sample_sum, ok). */
  /** Shared PCM16 decode seam for [[decodeWavMeta]] and
    * [[decodeWavEnergy]]: parse + validate a signed-16-bit PCM WAV,
    * return (format, COMPLETE data-section bytes) — None for corrupt,
    * truncated, non-PCM16, unknown-length, or data ≥ 2 GiB payloads
    * (task-local decode is int-indexed by design; a clip that large
    * is flagged unsupported rather than mis-summed through an int
    * overflow). One place for the truncation gate, the endianness
    * rule and the size bound — the two decoders must never diverge
    * on them. */
  private def readPcm16(payload: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val nFrames = ais.getFrameLength
      val frameSize = fmt.getFrameSize
      if (nFrames < 0 || frameSize <= 0 ||
        fmt.getSampleSizeInBits != 16 ||
        fmt.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        nFrames > (Int.MaxValue / frameSize).toLong) None
      else {
        val expected = (nFrames * frameSize).toInt
        val data = ais.readNBytes(expected)
        if (data.length < expected) None // truncated data section
        else Some((fmt, data))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sign-extended 16-bit sample at byte offset `i` of `data`. */
  private def sample16(data: Array[Byte], i: Int, le: Boolean): Int = {
    val lo = data(if (le) i else i + 1) & 0xff
    val hi = data(if (le) i + 1 else i)
    (hi << 8) | lo // hi sign-extends: signed 16-bit
  }

  def decodeWavMeta(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_samples", IntegerType), StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType), StructField("sample_sum", LongType),
      StructField("ok", StringType)))
    val bad = (id: Long) => Row(id, null, null, null, null, "N")
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          readPcm16(r.getAs[Array[Byte]](1)) match {
            case None => bad(id)
            case Some((fmt, data)) =>
              val le = !fmt.isBigEndian
              var sum = 0L; var i = 0
              while (i + 1 < data.length) {
                sum += sample16(data, i, le)
                i += 2
              }
              Row(id, (data.length / 2).toInt,
                fmt.getSampleRate.toInt, fmt.getChannels, sum, "Y")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Windowed audio ENERGY over decoded PCM — the silence/energy gate
    * of audio-corpus curation (drop silent or clipped clips before
    * they waste tokens): per full window of `windowSamples` samples,
    * the exact int64 sum of squares; a window is silent when its
    * sum-of-squares is below `silentMaxSumsq` (an RMS threshold T
    * expressed as T²·W — all-integer, no sqrt, so the output is
    * bit-exact cross-engine). The trailing partial window is ignored
    * (documented: gates reason about full windows). Corrupt payloads
    * → ok='N' with null stats, never a task failure. MONO-ONLY
    * contract: multi-channel PCM, like every other unsupported
    * format, gates as ok='N' — the curation pipeline downmixes to
    * mono upstream of this gate (the reference audio path is mono
    * throughout), so a multi-channel clip reaching it is a pipeline
    * error to quarantine, not silently average. Batch-shaped
    * mapPartitions like every decode boundary here. */
  /** Compare a·b vs c·d in 128-bit arithmetic (all operands
    * non-negative): sign of (a·b − c·d) without 64-bit wraparound. */
  private def cmp128(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(lo1, lo2)
  }

  def decodeWavEnergy(df: DataFrame, idCol: String, windowSamples: Int,
                      silentMaxSumsq: Long, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_windows", IntegerType), StructField("n_silent", IntegerType),
      StructField("total_sumsq", LongType), StructField("max_win_sumsq", LongType),
      StructField("ok", StringType)))
    val bad = (id: Long) => Row(id, null, null, null, null, "N")
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          readPcm16(r.getAs[Array[Byte]](1)) match {
            case Some((fmt, data)) if fmt.getChannels == 1 =>
              val le = !fmt.isBigEndian
              val n = data.length / 2
              if (n > 0 && n < windowSamples) {
                // a clip SHORTER than one window is one pro-rated
                // window, not zero windows — otherwise a fully silent
                // short clip reads n_silent=0 and sails through the
                // gate. Length-scaled threshold, cross-multiplied:
                // silent iff sumsq/n < T²·W/W·... i.e.
                // sumsq·W < silentMaxSumsq·n. The cross products can
                // exceed 63 bits (sumsq ≤ n·2^30, so sumsq·W
                // overflows Long when n·W ≳ 2^33) — compare the two
                // products in 128 bits via multiplyHigh instead of
                // trusting the wrapped 64-bit values.
                var sumsq = 0L; var i = 0
                while (i + 1 < data.length) {
                  val v = sample16(data, i, le).toLong
                  sumsq += v * v; i += 2
                }
                val silent = cmp128(sumsq, windowSamples.toLong,
                  silentMaxSumsq, n.toLong) < 0
                Row(id, 1, if (silent) 1 else 0, sumsq, sumsq, "Y")
              } else {
                val nWin = n / windowSamples
                var w = 0; var nSilent = 0
                var total = 0L; var maxW = 0L
                while (w < nWin) {
                  var sumsq = 0L; var j = 0
                  while (j < windowSamples) {
                    val v = sample16(data, 2 * (w * windowSamples + j), le).toLong
                    sumsq += v * v
                    j += 1
                  }
                  if (sumsq < silentMaxSumsq) nSilent += 1
                  total += sumsq
                  if (sumsq > maxW) maxW = sumsq
                  w += 1
                }
                Row(id, nWin, nSilent, total, maxW, "Y")
              }
            case _ => bad(id)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL tone-shaped WAV fixture for the q203 audio-fingerprint
    * path: per row a mono 16-bit PCM clip of (nWindows ·
    * windowSamples) samples where window w alternates ±a(w) with
    * amplitude a(w) = 10 + ((cls·7 + w²) % 23) — so every window's
    * energy (windowSamples · a(w)²) and therefore the whole
    * fingerprint has a closed form the oracle computes without
    * decoding. `variantCol` rows add +40 to window 3's amplitude
    * only — a planted NEAR-duplicate: the energy-delta fingerprint
    * differs from its class base in at most the two bits that
    * compare window 3 to its neighbors. Corrupt rows carry raw text
    * bytes. Encoded through javax.sound like [[synthWavPayload]]. */
  def synthToneWavPayload(df: DataFrame, idCol: String, clsCol: String,
                          variantCol: String, corruptCol: String,
                          nWindows: Int = 33, windowSamples: Int = 32,
                          batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(clsCol).cast("long"),
      col(variantCol).cast("boolean"), col(corruptCol).cast("boolean"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (r.getBoolean(3)) s"corrupt-$id".getBytes("UTF-8")
            else {
              val cls = r.getLong(1)
              val variant = r.getBoolean(2)
              val n = nWindows * windowSamples
              val pcm = new Array[Byte](n * 2)
              var w = 0
              while (w < nWindows) {
                var a = (10 + ((cls * 7 + w.toLong * w) % 23)).toInt
                if (variant && w == 3) a += 40
                var j = 0
                while (j < windowSamples) {
                  val v = if (j % 2 == 0) a else -a
                  val i = w * windowSamples + j
                  pcm(2 * i) = (v & 0xff).toByte
                  pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
                  j += 1
                }
                w += 1
              }
              val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
                true, false)
              val ais = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
              val bos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(ais,
                javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              bos.toByteArray
            }
          Row(id, bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Acoustic FINGERPRINT over decoded PCM — the Haitsma-Kalker shape
    * on time-domain energy: the clip is cut into full windows of
    * `windowSamples`, each window's exact int64 sum-of-squares is its
    * energy, and bit w of the fingerprint is the SIGN of the energy
    * delta between consecutive windows (set iff E(w+1) > E(w)) —
    * robust to volume scaling (energies scale together, the signs
    * survive) which is exactly why the sign-of-delta family is the
    * standard audio fingerprint. Up to 64 bits are packed
    * little-endian into a Long (bit w = window-pair w; clips longer
    * than 65 windows fingerprint their first 65 — the HK granule).
    * All-integer, so bit-exact cross-engine. Clips with fewer than
    * two full windows cannot produce a single delta bit and gate as
    * ok='N' (nothing to fingerprint), as do corrupt and non-mono
    * payloads — the [[decodeWavEnergy]] contract. Output: (id,
    * n_windows, fp, ok). Map-only; the dedup stage downstream is a
    * hash groupBy + banded Hamming join, never all-pairs. */
  def wavFingerprint(df: DataFrame, idCol: String, windowSamples: Int,
                     batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_windows", IntegerType),
      StructField("fp", LongType),
      StructField("ok", StringType)))
    val bad = (id: Long) => Row(id, null, null, "N")
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          readPcm16(r.getAs[Array[Byte]](1)) match {
            case Some((fmt, data)) if fmt.getChannels == 1 &&
                data.length / 2 / windowSamples >= 2 =>
              val le = !fmt.isBigEndian
              val nWin = math.min(data.length / 2 / windowSamples, 65)
              val energies = new Array[Long](nWin)
              var w = 0
              while (w < nWin) {
                var sumsq = 0L; var j = 0
                while (j < windowSamples) {
                  val v = sample16(data, 2 * (w * windowSamples + j), le).toLong
                  sumsq += v * v
                  j += 1
                }
                energies(w) = sumsq
                w += 1
              }
              var fp = 0L
              var i = 0
              while (i < nWin - 1) {
                if (energies(i + 1) > energies(i)) fp |= (1L << i)
                i += 1
              }
              Row(id, nWin, fp, "Y")
            case _ => bad(id)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  // ------------------------------------------------------------------
  // MP4 / ISO-BMFF container metadata (REAL box parse, pure JDK)
  // ------------------------------------------------------------------

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def boxType(b: Array[Byte], off: Int): String = {
    // 4 printable-ASCII chars or the box is garbage
    var i = 0
    while (i < 4) {
      val c = b(off + i) & 0xff
      if (c < 0x20 || c > 0x7e) return null
      i += 1
    }
    new String(b, off, 4, "US-ASCII")
  }

  /** One parsed box header: (type, payloadOff, payloadLen, totalLen);
    * None = structurally invalid at `off`. Handles the compact size,
    * the 64-bit largesize (size==1) and size==0 = to-EOF forms. */
  private def readBox(b: Array[Byte], off: Int): Option[(String, Int, Long, Long)] = {
    if (off + 8 > b.length) return None
    val size32 = be32(b, off)
    val tp = boxType(b, off + 4)
    if (tp == null) return None
    if (size32 == 1) {
      if (off + 16 > b.length) return None
      val size = be64(b, off + 8)
      if (size < 16 || off + size > b.length) None
      else Some((tp, off + 16, size - 16, size))
    } else if (size32 == 0) {
      // box extends to end of file
      Some((tp, off + 8, (b.length - off - 8).toLong, (b.length - off).toLong))
    } else {
      if (size32 < 8 || off + size32 > b.length) None
      else Some((tp, off + 8, size32 - 8, size32))
    }
  }

  /** Build a minimal ISO-BMFF (MP4) payload per row for the q200
    * fixture — every field a closed form of the id so the oracle can
    * verify the round trip WITHOUT parsing:
    *   ftyp: major 'isom', minor = id % 512, brands 'isom','mp41'
    *         (+ 'avc1' when id even);
    *   moov > mvhd (v0): timescale 600 + (id%4)*300,
    *         duration 1000 + id % 5000;
    *   free: present only when id % 3 == 0 (varies the box count);
    *   mdat: id % 32 payload bytes — written with the 64-bit
    *         LARGESIZE header when id % 7 == 3 (exercises the
    *         size==1 branch of the walker on valid data).
    * Corrupt rows carry their raw text bytes (no box structure). */
  def synthMp4Payload(df: DataFrame, idCol: String, textCol: String,
                      corruptCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"),
      col(textCol).cast("string"), col(corruptCol).cast("boolean"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (r.getBoolean(2))
              (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
            else {
              val bos = new java.io.ByteArrayOutputStream()
              val out = new java.io.DataOutputStream(bos)
              def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
              // ftyp
              val brands = if (id % 2 == 0) Seq("isom", "mp41", "avc1")
                           else Seq("isom", "mp41")
              out.writeInt(16 + 4 * brands.size); fourcc("ftyp")
              fourcc("isom"); out.writeInt((id % 512).toInt)
              brands.foreach(fourcc)
              // moov > mvhd (version 0: 100-byte payload)
              out.writeInt(8 + 108); fourcc("moov")
              out.writeInt(108); fourcc("mvhd")
              out.writeInt(0) // version + flags
              out.writeInt(0); out.writeInt(0) // creation, modification
              out.writeInt((600 + (id % 4) * 300).toInt) // timescale
              out.writeInt((1000 + id % 5000).toInt) // duration
              out.writeInt(0x00010000); out.writeShort(0x0100) // rate, volume
              out.writeShort(0); out.writeLong(0L) // reserved
              Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                .foreach(out.writeInt) // unity matrix
              (0 until 6).foreach(_ => out.writeInt(0)) // pre_defined
              out.writeInt(2) // next_track_ID
              // free (box-count variation)
              if (id % 3 == 0) { out.writeInt(8); fourcc("free") }
              // mdat, largesize-encoded for id % 7 == 3
              val mdatLen = (id % 32).toInt
              if (id % 7 == 3) {
                out.writeInt(1); fourcc("mdat"); out.writeLong(16L + mdatLen)
              } else {
                out.writeInt(8 + mdatLen); fourcc("mdat")
              }
              (0 until mdatLen).foreach(i => out.writeByte((id + i).toInt & 0xff))
              out.flush()
              bos.toByteArray
            }
          Row(id, bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL MP4/ISO-BMFF container-metadata walk (pure JDK, no codec):
    * top-level boxes are walked by the size/type grammar (compact,
    * largesize and to-EOF size forms all handled), `ftyp` yields the
    * major brand + minor version, and `mvhd` — found by descending
    * ONE level into `moov` — yields timescale and duration (version
    * 0 and 1 layouts). This is the metadata a video-corpus curation
    * pass extracts per clip WITHOUT decoding frames (compressed-codec
    * decode is honestly out of scope in this container; the REAL
    * frame-decode path for uncompressed/MJPEG AVI is
    * [[aviDecodeFrames]]).
    *
    * ok='Y' requires: every top-level box parses, the stream is
    * consumed exactly, and both ftyp and moov/mvhd are present.
    * Anything else — raw text, truncation mid-box, unparseable
    * sizes, empty payloads — gates as ok='N' with null fields, never
    * a task failure. Batch-shaped mapPartitions like every decode
    * boundary here. */
  def mp4ContainerMeta(df: DataFrame, idCol: String,
                       batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_boxes", IntegerType),
      StructField("major_brand", StringType),
      StructField("minor_version", IntegerType),
      StructField("timescale", IntegerType),
      StructField("duration", LongType),
      StructField("ok", StringType)))
    val bad = (id: Long) => Row(id, null, null, null, null, null, "N")
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b == null || b.length == 0) bad(id)
          else {
            var off = 0L
            var nBoxes = 0
            var major: String = null
            var minor = -1
            var timescale = -1
            var duration = -1L
            var valid = true
            while (valid && off < b.length) {
              readBox(b, off.toInt) match {
                case None => valid = false
                case Some((tp, pOff, pLen, total)) =>
                  nBoxes += 1
                  tp match {
                    case "ftyp" if pLen >= 8 =>
                      major = boxType(b, pOff)
                      minor = be32(b, pOff + 4).toInt
                      if (major == null) valid = false
                    case "moov" =>
                      // one-level descent: walk moov's children for mvhd
                      var cOff = pOff.toLong
                      val cEnd = pOff + pLen
                      while (valid && cOff < cEnd) {
                        readBox(b, cOff.toInt) match {
                          case None => valid = false
                          case Some(("mvhd", mOff, mLen, cTotal)) =>
                            // length-check BEFORE the version read: a
                            // zero-payload mvhd at buffer end must gate
                            // ok='N', not throw out-of-bounds
                            val version = if (mLen >= 1) b(mOff) & 0xff else -1
                            if (version == 0 && mLen >= 100) {
                              timescale = be32(b, mOff + 12).toInt
                              duration = be32(b, mOff + 16)
                            } else if (version == 1 && mLen >= 112) {
                              timescale = be32(b, mOff + 20).toInt
                              duration = be64(b, mOff + 24)
                            } else valid = false
                            cOff += cTotal
                          case Some((_, _, _, cTotal)) => cOff += cTotal
                        }
                      }
                      if (cOff != cEnd) valid = false
                    case _ => ()
                  }
                  off += total
              }
            }
            if (valid && off == b.length && nBoxes > 0 &&
                major != null && timescale > 0)
              Row(id, nBoxes, major, minor, timescale, duration, "Y")
            else bad(id)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Build an ISO-BMFF payload WITH a full sample-table track for the
    * q202 fixture: `moov > trak > mdia > (mdhd, minf > stbl >
    * (stts, stss, stsz, stco))` — the four tables a frame sampler
    * reads to pick keyframes without touching a codec. Every field is
    * a closed form of the id so the oracle replays the run-length
    * math arithmetically:
    *   mdhd: media timescale 1000 * (1 + id%3);
    *   stts: TWO runs — (2 + id%5 samples, delta 100 + id%50) then
    *         (1 + id%4 samples, delta 200 + id%30) — so
    *         sample-number→time needs a real prefix sum over the
    *         run-length table, not a constant multiply;
    *   stss: keyframes at 1, 1+k, 1+2k … (k = 1 + id%3, 1-based);
    *   stsz: per-sample sizes 50 + (id + i) % 20 (variant form,
    *         sample_size == 0);
    *   stco: one chunk at offset 100 + id%64.
    * A `tkhd` sibling is present so the walker must SKIP an unknown
    * leaf inside trak. Rows with id % 13 == 11 write the trak WITHOUT
    * its stbl (a container missing its index — the parser must gate
    * it ok='N', not guess); `corruptCol` rows carry raw text bytes. */
  def synthMp4TrackPayload(df: DataFrame, idCol: String, textCol: String,
                           corruptCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"),
      col(textCol).cast("string"), col(corruptCol).cast("boolean"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (r.getBoolean(2))
              (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
            else {
              // leaf boxes are built innermost-first so every
              // container's size field is exact
              def box(tp: String, payload: Array[Byte]): Array[Byte] = {
                val bos = new java.io.ByteArrayOutputStream()
                val out = new java.io.DataOutputStream(bos)
                out.writeInt(8 + payload.length)
                out.write(tp.getBytes("US-ASCII"))
                out.write(payload)
                out.flush(); bos.toByteArray
              }
              def full(ints: Seq[Int]): Array[Byte] = {
                val bos = new java.io.ByteArrayOutputStream()
                val out = new java.io.DataOutputStream(bos)
                ints.foreach(out.writeInt)
                out.flush(); bos.toByteArray
              }
              val ts = (1000 * (1 + id % 3)).toInt
              val n1 = (2 + id % 5).toInt; val d1 = (100 + id % 50).toInt
              val n2 = (1 + id % 4).toInt; val d2 = (200 + id % 30).toInt
              val n = n1 + n2
              val k = (1 + id % 3).toInt
              val kf = (1 to n by k).toSeq
              val sizes = (0 until n).map(i => (50 + (id + i) % 20).toInt)
              val mdhd = box("mdhd", full(Seq(
                0, 0, 0, ts, n1 * d1 + n2 * d2, 0x55C40000))) // ver/flags, times, ts, dur, lang+pre_def
              val stts = box("stts", full(Seq(0, 2, n1, d1, n2, d2)))
              val stss = box("stss", full(Seq(0, kf.size) ++ kf))
              val stsz = box("stsz", full(Seq(0, 0, n) ++ sizes))
              val stco = box("stco", full(Seq(0, 1, (100 + id % 64).toInt)))
              val stbl = box("stbl", stts ++ stss ++ stsz ++ stco)
              val minf = box("minf",
                if (id % 13 == 11) Array.emptyByteArray else stbl)
              val tkhd = box("tkhd", full(Seq.fill(21)(0))) // v0: 84-byte opaque leaf
              val trak = box("trak", tkhd ++ box("mdia", mdhd ++ minf))
              val mvhd = box("mvhd", full(
                Seq(0, 0, 0, 600, 1000, 0x00010000, 0x01000000) ++
                  Seq(0, 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) ++
                  Seq.fill(6)(0) ++ Seq(2)))
              val ftyp = box("ftyp", full(Seq(0x69736F6D, (id % 512).toInt,
                0x69736F6D, 0x6D703431))) // 'isom', minor, brands
              ftyp ++ box("moov", mvhd ++ trak)
            }
          Row(id, bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL sample-table walk (pure JDK, no codec): descend
    * `moov > trak > mdia > (mdhd, minf > stbl)`, parse the four
    * index tables, and emit the quantities a video-corpus curation
    * pass computes per clip from container metadata alone —
    *   n_samples       stsz sample count, CROSS-CHECKED against the
    *                   Σcount of the stts runs (mismatch → ok='N':
    *                   a clip whose index tables disagree is corrupt,
    *                   not a judgement call);
    *   media_timescale mdhd;
    *   duration_ticks  Σ(count·delta) over the stts runs;
    *   n_keyframes     stss entry count;
    *   kf_last_tick    presentation time of the LAST sync sample —
    *                   a prefix sum over the stts run-length table
    *                   (the exact math a keyframe sampler does to
    *                   seek without decoding);
    *   bytes_total     Σ stsz sizes (variant and constant forms).
    * ok='Y' requires all four tables present, sizes consistent and
    * every stss sample number in [1, n_samples]. Missing stbl,
    * truncated tables, raw text, empty payloads → ok='N' with null
    * fields, never a task failure. Batch-shaped mapPartitions like
    * every decode boundary here. */
  def mp4SampleTable(df: DataFrame, idCol: String,
                     batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_samples", IntegerType),
      StructField("media_timescale", IntegerType),
      StructField("duration_ticks", LongType),
      StructField("n_keyframes", IntegerType),
      StructField("kf_last_tick", LongType),
      StructField("bytes_total", LongType),
      StructField("ok", StringType)))
    val bad = (id: Long) => Row(id, null, null, null, null, null, null, "N")
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          // locate a direct child box by type inside [from, to)
          def child(tp: String, from: Long, to: Long): Option[(Int, Long)] = {
            var off = from
            while (off < to) {
              readBox(b, off.toInt) match {
                case None => return None
                case Some((t, pOff, pLen, total)) =>
                  if (t == tp) return Some((pOff, pLen))
                  off += total
              }
            }
            None
          }
          def parsed: Option[Row] = for {
            (moovOff, moovLen) <- child("moov", 0, b.length)
            (trakOff, trakLen) <- child("trak", moovOff, moovOff + moovLen)
            (mdiaOff, mdiaLen) <- child("mdia", trakOff, trakOff + trakLen)
            (mdhdOff, mdhdLen) <- child("mdhd", mdiaOff, mdiaOff + mdiaLen)
            // v0 (32-bit times, timescale at +12) and v1 (64-bit
            // times, timescale at +20) layouts, like mvhd above
            tsOff <- (if (mdhdLen >= 1) b(mdhdOff) & 0xff else -1) match {
              case 0 if mdhdLen >= 24 => Some(mdhdOff + 12)
              case 1 if mdhdLen >= 32 => Some(mdhdOff + 20)
              case _ => None
            }
            (minfOff, minfLen) <- child("minf", mdiaOff, mdiaOff + mdiaLen)
            (stblOff, stblLen) <- child("stbl", minfOff, minfOff + minfLen)
            (sttsOff, sttsLen) <- child("stts", stblOff, stblOff + stblLen)
            (stssOff, stssLen) <- child("stss", stblOff, stblOff + stblLen)
            (stszOff, stszLen) <- child("stsz", stblOff, stblOff + stblLen)
            // truncated leaf HEADERS gate ok='N' before any field read:
            // readBox bounds each box within the buffer, so pLen is the
            // only guard needed for in-box reads — but a header read on
            // a too-short payload would spill into the NEXT box's bytes
            // (silent garbage) or past buffer end (task crash)
            _ <- if (sttsLen >= 8 && stszLen >= 12 && stssLen >= 8)
              Some(()) else None
            row <- {
              val timescale = be32(b, tsOff).toInt
              // stts: run-length (count, delta) pairs
              val nRuns = be32(b, sttsOff + 4).toInt
              if (timescale <= 0 || nRuns < 0 ||
                  sttsLen < 8 + 8L * nRuns) None
              else {
                val runCounts = new Array[Long](nRuns)
                val runDeltas = new Array[Long](nRuns)
                var i = 0
                var sttsSamples = 0L
                var durTicks = 0L
                while (i < nRuns) {
                  runCounts(i) = be32(b, sttsOff + 8 + 8 * i)
                  runDeltas(i) = be32(b, sttsOff + 12 + 8 * i)
                  sttsSamples += runCounts(i)
                  durTicks += runCounts(i) * runDeltas(i)
                  i += 1
                }
                // stsz: constant form (sample_size != 0) or per-sample
                val constSize = be32(b, stszOff + 4)
                val nSamples = be32(b, stszOff + 8)
                val sizesOk = constSize != 0 ||
                  stszLen >= 12 + 4L * nSamples
                var bytesTotal = 0L
                if (sizesOk) {
                  if (constSize != 0) bytesTotal = constSize * nSamples
                  else {
                    var j = 0L
                    while (j < nSamples) {
                      bytesTotal += be32(b, (stszOff + 12 + 4 * j).toInt)
                      j += 1
                    }
                  }
                }
                // stss: 1-based sync sample numbers, each in range
                val nKf = be32(b, stssOff + 4).toInt
                val kfOk = nKf >= 0 && stssLen >= 8 + 4L * nKf
                var lastKf = 0L
                var kfInRange = kfOk
                if (kfOk) {
                  var j = 0
                  while (j < nKf) {
                    val s = be32(b, stssOff + 8 + 4 * j)
                    if (s < 1 || s > nSamples) kfInRange = false
                    if (s > lastKf) lastKf = s
                    j += 1
                  }
                }
                // presentation tick of sample `lastKf` (1-based):
                // prefix sum over the run-length table
                var kfLastTick = 0L
                if (kfInRange && nKf > 0) {
                  var remaining = lastKf - 1
                  var ri = 0
                  while (remaining > 0 && ri < nRuns) {
                    val take = math.min(remaining, runCounts(ri))
                    kfLastTick += take * runDeltas(ri)
                    remaining -= take
                    ri += 1
                  }
                }
                if (sizesOk && kfInRange && sttsSamples == nSamples)
                  Some(Row(id, nSamples.toInt, timescale, durTicks,
                    nKf, kfLastTick, bytesTotal, "Y"))
                else None
              }
            }
          } yield row
          if (b == null || b.length == 0) bad(id)
          else parsed.getOrElse(bad(id))
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- RIFF/AVI: little-endian container (unlike ISO-BMFF's BE) ----
  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Read a RIFF chunk header at `off`: (fourcc, payloadOff,
    * payloadLen, totalAdvance incl. the word-alignment pad byte).
    * None when the header or the declared payload overruns the
    * buffer, or the fourcc isn't printable ASCII. */
  private def readRiffChunk(b: Array[Byte], off: Int): Option[(String, Int, Int, Int)] = {
    if (off < 0 || off + 8 > b.length) return None
    val tp = boxType(b, off)
    if (tp == null) return None
    val len = le32(b, off + 4)
    if (len < 0 || len > Int.MaxValue - 16) return None
    val pOff = off + 8
    if (pOff + len > b.length) return None
    val pad = len & 1L // RIFF chunks are word-aligned
    Some((tp, pOff, len.toInt, (8 + len + pad).toInt))
  }

  /** REAL AVI fixture generator (pure JDK): a canonical RIFF-AVI per
    * row — `LIST hdrl (avih, LIST strl (strh 'vids'/'DIB ', strf
    * BITMAPINFOHEADER))`, a `LIST movi` of per-frame `00db` chunks,
    * and an `idx1` index carrying AVIIF_KEYFRAME flags. Frames are
    * stored as complete BMP streams and encoded with ImageIO's real
    * BMP codec — AVI's native uncompressed-DIB form, chosen over
    * MJPEG deliberately: BMP is LOSSLESS, so every decoded pixel has
    * a closed form in (id, frame_no) and a SQL oracle can verify the
    * full container+codec round trip without itself decoding.
    * Closed forms: n_frames = 2 + id%4; frame dims (8 + id%6) x
    * (4 + id%4); frame f is constant gray (id*37 + f*11) % 256;
    * keyframes every 1 + id%3 frames (idx1 flags); µs/frame =
    * 33333 + id%1000 (avih). Odd-length BMP payloads exercise the
    * RIFF pad-byte rule. Planted corruption: `corruptCol` rows carry
    * raw text bytes (no RIFF header); id%13==11 rows write an idx1
    * whose entry count disagrees with avih/movi (a clip whose index
    * lies — structurally corrupt); id%9==5 rows garble frame 0's
    * chunk BYTES while the container stays well-formed (the
    * mid-stream decode failure a crawl actually produces).
    *
    * `codec` selects the frame encoding: "bmp" (default — AVI's
    * uncompressed-DIB form, `00db` chunks, stream fourcc 'DIB ') or
    * "jpeg" (MJPEG — `00dc` chunks, fourcc 'MJPG', frames written by
    * ImageIO's real JPEG encoder). The hash-gated query q205 uses BMP
    * because lossless decode has a closed form the SQL oracle can
    * verify; the MJPEG leg is spec-verified instead (lossy DC
    * quantization has no closed form, but a uniform-color frame must
    * decode back within a small per-pixel tolerance). */
  def synthAviPayload(df: DataFrame, idCol: String, textCol: String,
                      corruptCol: String, batchSize: Int = 32,
                      codec: String = "bmp"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"),
      col(textCol).cast("string"), col(corruptCol).cast("boolean"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val bytes =
            if (r.getBoolean(2))
              (if (r.isNullAt(1)) "" else r.getString(1)).getBytes("UTF-8")
            else {
              def le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
                out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
                out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
              }
              def chunk(tp: String, payload: Array[Byte]): Array[Byte] = {
                val bos = new java.io.ByteArrayOutputStream()
                bos.write(tp.getBytes("US-ASCII"), 0, 4)
                le(bos, payload.length.toLong)
                bos.write(payload, 0, payload.length)
                if ((payload.length & 1) == 1) bos.write(0) // pad byte
                bos.toByteArray
              }
              def list(tp: String, children: Array[Byte]): Array[Byte] =
                chunk("LIST", tp.getBytes("US-ASCII") ++ children)
              def ints(vs: Seq[Long]): Array[Byte] = {
                val bos = new java.io.ByteArrayOutputStream()
                vs.foreach(le(bos, _)); bos.toByteArray
              }
              val n = (2 + id % 4).toInt
              val w = (8 + id % 6).toInt; val h = (4 + id % 4).toInt
              val k = (1 + id % 3).toInt
              val uspf = (33333 + id % 1000).toLong
              val frames = (0 until n).map { f =>
                if (id % 9 == 5 && f == 0)
                  "not a bmp frame".getBytes("UTF-8") // garbled bytes, valid chunk
                else {
                  val c = ((id * 37 + f * 11) % 256).toInt
                  val img = new java.awt.image.BufferedImage(
                    w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val rgb = (c << 16) | (c << 8) | c
                  var y = 0
                  while (y < h) {
                    var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1
                  }
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, codec, bos)
                  bos.toByteArray
                }
              }
              val fcc = if (codec == "bmp") "00db" else "00dc"
              val strFourcc = if (codec == "bmp") "DIB " else "MJPG"
              val avih = chunk("avih", ints(Seq(
                uspf, 0, 0, 0x10L, n.toLong, 0, 1, 0, w.toLong, h.toLong,
                0, 0, 0, 0)))
              val strh = chunk("strh",
                "vids".getBytes("US-ASCII") ++ strFourcc.getBytes("US-ASCII") ++
                  ints(Seq(0, 0, 0, 1, 30, 0, n.toLong, 0, 0xFFFFFFFFL, 0)) ++
                  ints(Seq(0, (h.toLong << 16) | w))) // rcFrame (0,0,w,h) as 4 LE16s
              val strf = chunk("strf", ints(Seq(
                40, w.toLong, h.toLong, (24L << 16) | 1, 0,
                (w.toLong * h * 3), 0, 0, 0, 0)))
              val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
              val moviChunks = frames.map(fb => chunk(fcc, fb))
              val movi = list("movi", moviChunks.flatMap(a => a).toArray)
              // idx1 offsets are relative to the 'movi' fourcc, per convention
              val offsets = moviChunks.scanLeft(4L)((acc, c) => acc + c.length)
              val nIdx = if (id % 13 == 11) n - 1 else n // planted lying index
              val idx1 = chunk("idx1", ints((0 until nIdx).flatMap { f =>
                Seq(le32(fcc.getBytes("US-ASCII"), 0),
                  if (f % k == 0) 0x10L else 0L,
                  offsets(f), frames(f).length.toLong)
              }))
              val form = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
              val bos = new java.io.ByteArrayOutputStream()
              bos.write("RIFF".getBytes("US-ASCII"), 0, 4)
              le(bos, form.length.toLong)
              bos.write(form, 0, form.length)
              bos.toByteArray
            }
          Row(id, bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL video frame decode (pure JDK, zero external deps): walk the
    * RIFF-AVI container grammar (LIST recursion, word-aligned
    * chunks), read timing from `avih` and keyframe flags from
    * `idx1`, then DECODE every `00db`/`00dc` frame chunk through
    * ImageIO — a true codec decode per frame (BMP here; the same
    * call decodes MJPEG's JPEG frames when a JPEG stream is in the
    * chunk). Per frame: dims, the exact red-channel sum, and a
    * nearest-neighbor resample to (outW, outH) whose red sum is
    * recomputed from the REAL resize loop (the thumbnail leg of a
    * video-curation pass) — no stand-in remains in any video path.
    *
    * Emits one row per frame: (id, frame_no, width, height, red_sum,
    * resized_red_sum, is_key from idx1, pts_us = frame_no · µs/frame
    * from avih, ok). Gating discipline, strictest first: a payload
    * that fails the container grammar — no RIFF/AVI header, a chunk
    * overrunning the buffer, missing avih/movi, or an idx1 whose
    * entry count disagrees with avih's dwTotalFrames or the movi
    * chunk count (an index that lies marks the whole clip corrupt) —
    * yields ONE clip-level row (null frame_no, ok='N'). A clip whose
    * container parses but where an individual frame's bytes don't
    * decode keeps its good frames and gates only that frame's row
    * ok='N' (null decode fields; is_key/pts_us survive — they come
    * from the container, not the codec). Batch-shaped mapPartitions
    * like every decode boundary here. */
  def aviDecodeFrames(df: DataFrame, idCol: String, outW: Int = 4,
                      outH: Int = 2, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("red_sum", LongType),
      StructField("resized_red_sum", LongType),
      StructField("is_key", BooleanType),
      StructField("pts_us", LongType),
      StructField("ok", StringType)))
    val clipBad = (id: Long) =>
      Seq(Row(id, null, null, null, null, null, null, null, "N"))
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          def parsed: Option[Seq[Row]] = {
            if (b == null || b.length < 12) return None
            readRiffChunk(b, 0) match {
              case Some(("RIFF", pOff, pLen, total))
                  if total == b.length && pLen >= 4 &&
                    boxType(b, pOff) == "AVI " =>
                var off = pOff + 4
                val end = pOff + pLen
                var usPerFrame = -1L
                var totalFrames = -1L
                val frameChunks = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
                val keyFlags = scala.collection.mutable.ArrayBuffer[Boolean]()
                var sawMovi = false
                var sawIdx = false
                while (off < end) {
                  readRiffChunk(b, off) match {
                    case None => return None
                    case Some((tp, cOff, cLen, cTotal)) =>
                      tp match {
                        case "LIST" if cLen >= 4 =>
                          val listType = boxType(b, cOff)
                          if (listType == "hdrl") {
                            // avih is hdrl's first child, fixed 56-byte layout
                            readRiffChunk(b, cOff + 4) match {
                              case Some(("avih", aOff, aLen, _)) if aLen >= 40 =>
                                usPerFrame = le32(b, aOff)
                                totalFrames = le32(b, aOff + 16)
                                if (le32(b, aOff + 24) != 1) return None // one stream
                              case _ => return None
                            }
                          } else if (listType == "movi") {
                            sawMovi = true
                            var mOff = cOff + 4
                            val mEnd = cOff + cLen
                            while (mOff < mEnd) {
                              readRiffChunk(b, mOff) match {
                                case None => return None
                                case Some((ct, fOff, fLen, fTotal)) =>
                                  if (ct.endsWith("db") || ct.endsWith("dc"))
                                    frameChunks += ((fOff, fLen))
                                  mOff += fTotal
                              }
                            }
                            if (mOff != mEnd) return None
                          }
                        case "idx1" =>
                          sawIdx = true
                          if (cLen % 16 != 0) return None
                          val nIdx = cLen / 16
                          var j = 0
                          while (j < nIdx) {
                            keyFlags += (le32(b, cOff + 16 * j + 4) & 0x10L) != 0
                            j += 1
                          }
                        case _ => () // unknown top-level chunk: skip
                      }
                      off += cTotal
                  }
                }
                if (off != end || !sawMovi || !sawIdx || usPerFrame <= 0 ||
                    totalFrames != frameChunks.length ||
                    keyFlags.length != frameChunks.length) None
                else Some(frameChunks.zipWithIndex.map { case ((fOff, fLen), f) =>
                  val img =
                    try javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(
                        java.util.Arrays.copyOfRange(b, fOff, fOff + fLen)))
                    catch { case scala.util.control.NonFatal(_) => null }
                  if (img == null)
                    Row(id, f, null, null, null, null,
                      keyFlags(f), f * usPerFrame, "N")
                  else {
                    val w = img.getWidth; val h = img.getHeight
                    var sum = 0L; var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
                      y += 1
                    }
                    // real NN resample, same loop as resizeImageNN
                    var rsum = 0L; y = 0
                    while (y < outH) {
                      var x = 0
                      while (x < outW) {
                        rsum += (img.getRGB(x * w / outW, y * h / outH) >> 16) & 0xff
                        x += 1
                      }
                      y += 1
                    }
                    Row(id, f, w, h, sum, rsum, keyFlags(f), f * usPerFrame, "Y")
                  }
                }.toSeq)
              case _ => None
            }
          }
          parsed.getOrElse(clipBad(id))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Wrap a text column as an opaque binary payload with metadata —
    * the shape an image/audio column has in a lakehouse table. */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("payload_len", octet_length(col("payload")))
      .withColumn("meta", struct(
        col("payload_len").as("n_bytes"),
        lit("text/fake").as("mime"),
        ceil(col("payload_len") / 256.0).cast("long").as("n_chunks")))

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

  /** The synthetic 9x8 block pattern behind [[synthPatternImagePayload]]
    * — a pure integer predicate so a SQL oracle can reproduce the
    * downstream dHash without decoding: block (x∈0..8, y∈0..7) of
    * class `c` is BRIGHT iff ((c*(x+3) + x² + y*(7 + c%3)) % 5) < 2,
    * with `variant` images flipping the single block (c%9, c%8) — a
    * planted near-duplicate 1-2 Hamming bits from its base class. */
  def patternBright(c: Long, variant: Boolean,
                                        x: Int, y: Int): Boolean = {
    val base = (c * (x + 3) + x.toLong * x + y * (7 + c % 3)) % 5 < 2
    base ^ (variant && x == (c % 9) && y == (c % 8))
  }

  /** REAL PNG fixture generator for the perceptual-hash path: an
    * 18x16 image of 2x2 constant blocks rendering [[patternBright]]
    * (bright=220, dark=40) — every doc of a class is pixel-identical,
    * `variant` docs differ by one block. Encoded with ImageIO like
    * [[synthImagePayload]]; rows where `corruptCol` is true emit raw
    * text bytes (the truncated-crawl case). */
  def synthPatternImagePayload(df: DataFrame, idCol: String, clsCol: String,
                               variantCol: String, corruptCol: String,
                               batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("payload", BinaryType)))
    val input = df.select(col(idCol).cast("long"), col(clsCol).cast("long"),
      col(variantCol).cast("boolean"), col(corruptCol).cast("boolean"),
      col(idCol).cast("string"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.getBoolean(3)) ("corrupt:" + r.getString(4)).getBytes("UTF-8")
            else {
              val c = r.getLong(1); val v = r.getBoolean(2)
              val img = new java.awt.image.BufferedImage(
                18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var by = 0
              while (by < 8) {
                var bx = 0
                while (bx < 9) {
                  val g = if (patternBright(c, v, bx, by)) 220 else 40
                  val rgb = (g << 16) | (g << 8) | g
                  img.setRGB(2 * bx, 2 * by, rgb); img.setRGB(2 * bx + 1, 2 * by, rgb)
                  img.setRGB(2 * bx, 2 * by + 1, rgb); img.setRGB(2 * bx + 1, 2 * by + 1, rgb)
                  bx += 1
                }
                by += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              bos.toByteArray
            }
          Row(r.getLong(0), bytes)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL 64-bit difference hash (dHash) over (id, payload) rows: the
    * standard perceptual near-dup signature for image corpora. Decode
    * (ImageIO), average-pool the red channel onto a 9x8 grid, then
    * bit i=y*8+x is [cell(x+1,y) > cell(x,y)] — brightness-gradient
    * signs, robust to re-encoding and small edits. Cell means are
    * compared as EXACT cross-multiplied integer sums (sumA*cntB >
    * sumB*cntA) so uneven pool boxes on non-multiple dims never hit
    * float rounding — bit-deterministic across JVMs. Undecodable or
    * sub-9x8 payloads yield (null, 'N') instead of failing the task.
    * Output: (id, dhash long, ok). */
  def dHash64(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("dhash", LongType), StructField("ok", StringType)))
    val input = df.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            Row(r.getLong(0), null, "N")
          else {
            val w = img.getWidth; val h = img.getHeight
            val sums = new Array[Long](72); val cnts = new Array[Long](72)
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 9) {
                val xs = cx * w / 9; val xe = (cx + 1) * w / 9
                val ys = cy * h / 8; val ye = (cy + 1) * h / 8
                var sum = 0L; var y = ys
                while (y < ye) {
                  var x = xs
                  while (x < xe) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
                  y += 1
                }
                sums(cy * 9 + cx) = sum
                cnts(cy * 9 + cx) = (xe - xs).toLong * (ye - ys)
                cx += 1
              }
              cy += 1
            }
            var hash = 0L; var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val l = y * 9 + x; val rr = l + 1
                if (sums(rr) * cnts(l) > sums(l) * cnts(rr))
                  hash |= 1L << (y * 8 + x)
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), hash, "Y")
          }
        }
      }
    }(Encoders.row(outSchema))
  }

}

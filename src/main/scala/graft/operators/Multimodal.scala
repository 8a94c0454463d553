package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample run as BATCHED partition-level functions (the Scala
 * analogue of `mapInPandas` — one Iterator[Row] per partition, vectorized
 * batch shape).
 *
 * Decode is REAL as of round 6: [[Codec]] implements BMP (24-bit
 * BI_RGB) and WAV (PCM16 RIFF) from their public specs, and
 * [[imageStats]]/[[resizeImage]]/[[audioWindows]] parse honest
 * container bytes (q115/q116, oracle-checked against the generative
 * formula; CodecSpec pins the byte layout). The original frame-window
 * STUB below is kept as the format-agnostic test double for the batch
 * plumbing (q39/q75) — it exercises schema/explode/batch shape on
 * payloads that are not containers (e.g. raw HTML bytes).
 */
object Multimodal {

  /** Frame descriptor produced per sampled window of the payload. */
  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("byte_off", IntegerType, nullable = false),
    StructField("byte_sum", LongType, nullable = false)))

  /**
   * STUB decoder: a real implementation would hand `bytes` to an image/
   * audio codec; the deterministic fake "decodes" fixed-size windows of
   * the payload and emits per-frame byte sums — enough to validate batch
   * shape, schema, and per-frame explode semantics end-to-end.
   */
  def stubDecodeFrames(bytes: Array[Byte], frameLen: Int): Seq[(Int, Int, Long)] = {
    if (bytes == null) return Seq.empty
    bytes.grouped(frameLen).zipWithIndex.map { case (win, i) =>
      var s = 0L
      var j = 0
      while (j < win.length) { s += win(j) & 0xff; j += 1 }
      (i, i * frameLen, s)
    }.toSeq
  }

  /**
   * Frame-sample operator: one output row per (record, frame), batched
   * per partition. `binCol` is the opaque payload; metadata columns pass
   * through untouched (`keep`).
   */
  def sampleFrames(df: DataFrame, keep: Seq[String], binCol: String,
                   frameLen: Int): DataFrame = {
    val keepFields = keep.map(n => df.schema(n))
    val outSchema = StructType(keepFields ++ frameSchema.fields)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val binIdx = df.schema.fieldIndex(binCol)
    // Dataset-level batched flatMap (no RDD): the mapInPandas analogue
    df.flatMap { r =>
      val base = keepIdx.map(r.get)
      stubDecodeFrames(r.getAs[Array[Byte]](binIdx), frameLen).map {
        case (fi, off, s) => Row.fromSeq(base ++ Seq(fi, off, s))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * STUB nearest-neighbor resize of a srcW x srcH byte raster payload
   * to dstW x dstH (a real implementation would decode + rescale via a
   * codec; the deterministic fake picks stride-sampled bytes, which
   * pins the batch plumbing and is byte-replayable by the oracle).
   * Payloads shorter than srcW*srcH resize to NULL (explicit, not a
   * crash — filter or handle downstream).
   */
  def stubResize(bytes: Array[Byte], srcW: Int, srcH: Int,
                 dstW: Int, dstH: Int): Array[Byte] = {
    if (bytes == null || bytes.length < srcW * srcH) return null
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        out(y * dstW + x) = bytes(sy * srcW + x * srcW / dstW)
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * Resize operator: payload -> `resized` binary column, metadata
   * passes through (`keep`). Batched per partition like
   * [[sampleFrames]] — the mapInPandas-analogue plumbing is real, only
   * the pixel math is the stub.
   */
  def resize(df: DataFrame, keep: Seq[String], binCol: String,
             srcW: Int, srcH: Int, dstW: Int, dstH: Int): DataFrame = {
    val keepFields = keep.map(n => df.schema(n))
    val outSchema = StructType(keepFields :+ StructField("resized", BinaryType))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val binIdx = df.schema.fieldIndex(binCol)
    df.map { r =>
      val base = keepIdx.map(r.get)
      Row.fromSeq(base :+ stubResize(r.getAs[Array[Byte]](binIdx), srcW, srcH, dstW, dstH))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Pure-Column twin of the stub (oracle-checkable): frame count + total byte sum. */
  def frameStats(df: DataFrame, binCol: String, frameLen: Int): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)))
      .withColumn("n_frames",
        graft.functions.fdiv(col("n_bytes") + (frameLen - 1), frameLen.toLong).cast("int"))

  // ------------------------------------------------------------------
  // REAL codec path (round 6): the decode step is no longer a stub —
  // payloads are honest BMP / WAV container bytes ([[Codec]], pure
  // JVM), decoded by real header parses, resized / windowed on real
  // pixels / samples. Fixture synthesis is deterministic in the key so
  // the DuckDB oracle can compute expected outputs from the generative
  // FORMULA — fully independent of the codec code — while CodecSpec's
  // golden byte arrays pin the container layout itself.
  // ------------------------------------------------------------------

  /** Deterministic pixel formula shared by fixture and oracle:
    * channel `c` of pixel (x, y) of record `id`. */
  @inline def pixelFormula(id: Long, x: Int, y: Int, c: Int): Int =
    (((id * 7 + y.toLong * 31 + x.toLong * 13 + c.toLong * 5) % 256) + 256).toInt % 256

  /** Deterministic sample formula shared by fixture and oracle. */
  @inline def sampleFormula(id: Long, i: Int): Short =
    ((((id * 31 + i.toLong * 17) % 4096) + 4096) % 4096 - 2048).toShort

  /** Fixture builder: adds `img` — a REAL 24-bit BMP payload whose
    * pixels follow [[pixelFormula]]. Batched per partition like every
    * multimodal op; binary column, schema-declared. */
  def synthBmp(df: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("img", BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    df.map { r =>
      val id = r.getLong(idIdx)
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            px((y * w + x) * 3 + c) = pixelFormula(id, x, y, c).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Row.fromSeq(r.toSeq :+ Codec.encodeBmp(Codec.Image(w, h, px)))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Fixture builder: adds `wav` — a REAL PCM16 WAV payload of
    * `300 + id % 200` samples following [[sampleFormula]]. */
  def synthWav(df: DataFrame, idCol: String, sampleRate: Int = 16000): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("wav", BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    df.map { r =>
      val id = r.getLong(idIdx)
      val n = (300 + id % 200).toInt
      val s = Array.tabulate(n)(i => sampleFormula(id, i))
      Row.fromSeq(r.toSeq :+ Codec.encodeWav(Codec.Audio(sampleRate, 1, s)))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Image stats over a REAL decode: width, height, and a position-
    * weighted LONG checksum `Σ v_i * (i+1)` over the top-down RGB byte
    * stream — order-free-exact for the oracle, and sensitive to any
    * pixel landing at the wrong position (a plain byte sum would miss
    * transposed rows). NULL row (not a crash) on undecodable payloads. */
  def imageStats(df: DataFrame, keep: Seq[String], binCol: String): DataFrame = {
    val keepFields = keep.map(n => df.schema(n))
    val outSchema = StructType(keepFields ++ Seq(
      StructField("w", IntegerType), StructField("h", IntegerType),
      StructField("px_cksum", LongType)))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val binIdx = df.schema.fieldIndex(binCol)
    df.map { r =>
      val base = keepIdx.map(r.get)
      Codec.decodeBmp(r.getAs[Array[Byte]](binIdx)) match {
        case Some(img) =>
          var s = 0L; var i = 0
          while (i < img.pixels.length) { s += (img.pixels(i) & 0xff).toLong * (i + 1); i += 1 }
          Row.fromSeq(base ++ Seq[Any](img.width, img.height, s))
        case None => Row.fromSeq(base ++ Seq(null, null, null))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** REAL resize: decode BMP -> nearest-neighbor over decoded pixels ->
    * re-encode BMP. Output column `resized` (binary, NULL if the
    * payload didn't decode). */
  def resizeImage(df: DataFrame, keep: Seq[String], binCol: String,
                  dstW: Int, dstH: Int): DataFrame = {
    val keepFields = keep.map(n => df.schema(n))
    val outSchema = StructType(keepFields :+ StructField("resized", BinaryType))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val binIdx = df.schema.fieldIndex(binCol)
    df.map { r =>
      val base = keepIdx.map(r.get)
      val out = Codec.decodeBmp(r.getAs[Array[Byte]](binIdx))
        .map(img => Codec.encodeBmp(Codec.resizeNearest(img, dstW, dstH)))
        .orNull
      Row.fromSeq(base :+ out)
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Audio feature extraction over a REAL WAV decode: one row per
    * fixed-size sample window — count, energy `Σ s²` (LONG, exact),
    * peak `max |s|`. Ragged tail windows emit with their true count. */
  def audioWindows(df: DataFrame, keep: Seq[String], binCol: String,
                   win: Int): DataFrame = {
    val keepFields = keep.map(n => df.schema(n))
    val outSchema = StructType(keepFields ++ Seq(
      StructField("win_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false)))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val binIdx = df.schema.fieldIndex(binCol)
    df.flatMap { r =>
      val base = keepIdx.map(r.get)
      Codec.decodeWav(r.getAs[Array[Byte]](binIdx)) match {
        case Some(a) =>
          a.samples.grouped(win).zipWithIndex.map { case (ws, wi) =>
            var e = 0L; var p = 0; var i = 0
            while (i < ws.length) {
              val v = ws(i).toInt
              e += v.toLong * v
              val av = math.abs(v)
              if (av > p) p = av
              i += 1
            }
            Row.fromSeq(base ++ Seq[Any](wi, ws.length, e, p))
          }.toSeq
        case None => Seq.empty[Row]
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample run as BATCHED partition-level functions (the Scala
 * analogue of `mapInPandas` — one Iterator[Row] per partition, vectorized
 * batch shape). The decode step itself is a clearly-marked deterministic
 * STUB (no image/audio libs in this container, per the build brief); the
 * Spark-side plumbing — schema, batching, partitioning — is real and
 * oracle-checked on the stub's arithmetic.
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
}

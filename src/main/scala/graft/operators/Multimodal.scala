package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (EXTENSION, SURVEY.md
  * §2.K q_multimodal). Media ride as opaque `binary` columns next to a
  * typed metadata struct; decode / feature-extraction run per-partition in
  * batches so a real decoder (JNI/FFI or a Python worker) drops in without
  * changing the plan shape.
  *
  * The DECODE STEP IS A STUB (`fakeDecode`): the real image/audio libs are
  * not in this environment. It is a deterministic stand-in keeping the
  * Spark-side contract real — schema, batch iteration, partitioning, and
  * the feature-vector output shape are what a production decoder plugs
  * into.
  */
object Multimodal {

  /** media table schema: binary payload + typed metadata struct. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  val featureDim = 16

  /** STUB decoder: a real implementation decodes `payload` with an image/
    * audio codec; this deterministic fake derives `featureDim` floats from
    * byte statistics so tests exercise the full distributed path. */
  private[operators] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, payload.length / featureDim)
      var j = 0
      while (j < featureDim) { out(j) /= n; j += 1 }
    }
    out
  }

  /** Batched per-partition feature extraction: the mapPartitions shape a
    * vectorized decoder needs (decode `batchSize` payloads at a time,
    * amortizing codec/model setup per batch, not per row). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real decoder: decode the whole batch in one call here
        batch.map { r =>
          Row(r.getLong(0), fakeDecode(r.getAs[Array[Byte]](1)).toSeq)
        }
      }
    }(encoder)
  }

  /** Frame sampling plumbing: slice every `stride`-th fixed-size chunk of
    * the payload (a real impl samples decoded video frames; the chunked
    * binary slicing and row-explosion shape are identical). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Iterator.empty
        else {
          val nFrames = payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Row(r.getLong(0), f,
              java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
    }(encoder)
  }

  /** Resize plumbing: emit a payload re-scaled to `targetW`×`targetH` with
    * the meta struct updated to the new dimensions. The pixel resample is
    * the STUB part (nearest-neighbor over raw bytes as if 1 byte/pixel —
    * a real codec decodes, resamples, re-encodes in its place); the
    * distributed contract — schema preserved, meta rewritten, batched
    * per-partition execution, payload bytes never shuffled — is real. */
  def resizeMedia(media: DataFrame, targetW: Int, targetH: Int,
      batchSize: Int = 64): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    require(targetW.toLong * targetH <= Int.MaxValue,
      s"target ${targetW}x$targetH overflows a byte array")
    val spark = media.sparkSession
    val encoder = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("media_id", "payload", "meta").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real decoder: decode + resample the whole batch in one call here
        batch.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          // meta and its fields are nullable in mediaSchema — fall back to
          // a 1-row grid of the payload when dimensions are unknown
          val meta = if (r.isNullAt(2)) null else r.getStruct(2)
          def metaInt(i: Int, dflt: Int): Int =
            if (meta == null || meta.isNullAt(i)) dflt else meta.getInt(i)
          val resized =
            if (payload == null) null
            else {
              val srcW = math.max(1, metaInt(1, payload.length))
              val srcH = math.max(1, metaInt(2, 1))
              val out = new Array[Byte](targetW * targetH)
              var y = 0
              while (y < targetH) {
                var x = 0
                while (x < targetW) {
                  // nearest-neighbor index into the source "pixel" grid;
                  // Long math + Long bound check so a huge claimed source
                  // dimension cannot wrap negative past the guard
                  val sx = x.toLong * srcW / targetW
                  val sy = y.toLong * srcH / targetH
                  val src = sy * srcW + sx
                  out(y * targetW + x) =
                    if (src < payload.length) payload(src.toInt) else 0
                  x += 1
                }
                y += 1
              }
              out
            }
          val mime = if (meta == null || meta.isNullAt(0)) null else meta.getString(0)
          val nFrames: Any = if (meta == null || meta.isNullAt(3)) null else meta.getInt(3)
          Row(r.getLong(0), resized, Row(mime, targetW, targetH, nFrames))
        }
      }
    }(encoder)
  }

  /** Synthesize a media table from the documents fixture (payload = utf8
    * bytes) — a deterministic stand-in for real blobs, used by tests and
    * the q_multimodal pipeline. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text")).as("width"),
        lit(1).as("height"),
        (length(col("text")) / 16).cast("int").as("n_frames")).as("meta"))
}

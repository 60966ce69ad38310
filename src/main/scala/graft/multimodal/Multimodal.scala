package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-wise feature extraction.
  *
  * The Spark-side plumbing — schema, partition-preserving mapPartitions,
  * batch shape — is real and tested. REAL decoders live in [[Decode]]:
  * PPM by hand, PNG/JPEG/BMP/GIF via the JDK's ImageIO, WAV PCM via
  * javax.sound (r10), plus box-averaged dHash/aHash perceptual
  * fingerprints feeding the SimHash Hamming-banding near-dup machinery
  * (r16, gated by q123) — the image counterpart of the text dedup
  * stack, no native libs needed. [[decodeStub]] remains only as the
  * generic stand-in for codecs the JDK cannot open (video, webp, mp3);
  * a real deployment swaps it for a JNI/FFI call without touching the
  * pipeline shape (q51 gates exactly that batch plumbing; q99 and q123
  * gate the real decodes).
  */
object Multimodal {

  /** Opaque media record: payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
                         width: Int, height: Int)

  /** Extracted features: deterministic so tests/oracles can verify the
    * plumbing end-to-end. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, feat_dim: Int,
                           f0: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a text corpus as fake media records (payload = UTF-8 bytes) —
    * exercises the binary-column path with deterministic content. */
  def toMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(BinaryType).as("payload"),
        lit("application/octet-stream").as("mime"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
  }

  /** STUB decoder — stands in for an image/audio decode + model forward
    * pass. Deterministic: feature 0 is byte0/256, "dimension" is 8.
    * Real impl: ??? (JNI decode → resize → normalized tensor). */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
    val f0 = if (bytes.nonEmpty) (bytes(0) & 0xFF).toDouble / 256.0 else 0.0
    MediaFeatures(r.doc_id, bytes.length.toLong, 8, f0)
  }

  /** Batch-wise feature extraction over partitions. `batchSize` models the
    * GPU/accelerator batch a real decoder would want; partitioning is
    * preserved (narrow transformation — no shuffle), so upstream layout
    * (e.g. bucketing by doc_id) carries through to the sink. */
  def extractFeatures(ds: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch.toArray is where a real impl would hand the whole batch to
        // the accelerator in one call; the stub maps element-wise.
        batch.map(decodeStub)
      }
    }
  }

  /** Frame-sampling shape for video-like payloads: emit every k-th chunk of
    * the payload as its own row (doc_id, frame_idx, frame_bytes) — the
    * explode keeps rows narrow so downstream per-frame work parallelizes. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   chunkBytes: Int, everyK: Int): DataFrame =
    df.select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor(length(col(payloadCol)) /
                       lit(chunkBytes * everyK)).cast(IntegerType) - 1,
                     lit(0))),
          i => col(payloadCol).substr((i * chunkBytes * everyK) + 1,
                 lit(chunkBytes))))
          .as(Seq("frame_idx", "frame_bytes")))
}

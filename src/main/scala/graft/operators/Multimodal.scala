package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride as opaque `binary` columns with typed metadata
  * alongside — the Spark-side contract (schema, partition sizing,
  * batch-shaped decode) is real and tested; only the codec itself is
  * stubbed, because no media libraries ship in this container. The
  * decode runs per-partition (the Scala analogue of `mapInPandas`
  * batches) so a real codec drops in without touching the plan: it
  * would amortize model/codec init per partition exactly like a
  * Pandas UDF amortizes per batch.
  */
object Multimodal {

  /** One decoded-media record. `features` stands in for whatever a
    * real decoder emits (pixels, mel spectrogram, frames).
    */
  case class MediaFeature(doc_id: Long, n_bytes: Long, magic: String,
      checksum: Long, features: Array[Float])

  /** STUB CODEC — deterministic fake standing in for an image/audio
    * decode (no media libs in this container). Derives a fixed-width
    * feature vector from the payload bytes. Replace the body with a
    * real decoder; the signature and the per-partition batching are
    * the production shape.
    */
  private def stubDecode(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Synthesize a binary media column from the documents table (the
    * testdata has no real media): payload = utf-8 bytes of the text.
    * At 100 TB the payloads are the bulk of the bytes — they stay
    * columnar-compressed in parquet and are never shuffled; all
    * metadata extraction is projection-only.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("media_source"))

  /** Metadata extraction — pure column expressions over the binary
    * payload (length, leading "magic" bytes, checksum). No decode
    * needed, so this path never leaves whole-stage codegen. The
    * checksum is md5 (not xxhash64) so an external engine can verify
    * the exact bytes — the property a data-lake manifest needs.
    */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      md5(col("payload")).as("checksum"),
      col("media_source"))

  /** Batch feature extraction through the stub codec. Runs as
    * mapPartitions over the typed Dataset — one JVM-side "batch" per
    * partition, mirroring mapInPandas batch shape.
    */
  def extractFeatures(s: SparkSession, d: String, dim: Int = 8): Dataset[MediaFeature] = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition codec init would go here (model load, etc.)
        batch.map { case (id, payload) =>
          val f = stubDecode(payload, dim)
          MediaFeature(id, payload.length.toLong,
            payload.take(4).map("%02X".format(_)).mkString,
            util.hashing.MurmurHash3.bytesHash(payload).toLong, f)
        }
      }
  }

  /** "Resized" media record: payload downsampled to `targetBytes` by
    * stride sampling — the stand-in for an image resize (STUB: a real
    * implementation decodes, resizes, re-encodes; the partition-batch
    * shape and the shrunken-payload contract are what matter to the
    * plan).
    */
  case class ResizedMedia(doc_id: Long, orig_bytes: Long, payload: Array[Byte])

  def resize(s: SparkSession, d: String, targetBytes: Int = 64): Dataset[ResizedMedia] = {
    import s.implicits._
    mediaTable(s, d).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val stride = math.max(1, p.length / targetBytes)
        ResizedMedia(id, p.length.toLong,
          p.indices.by(stride).map(p).toArray.take(targetBytes))
      })
  }

  /** "Frame sampling" for a video-like payload: cut the byte stream
    * into fixed-size frames and keep every `every`-th one (STUB codec;
    * real frame extraction slots into the same per-partition batch).
    * One output row per kept frame — the explode-style fan-out a
    * video pipeline needs, with frame index for downstream ordering.
    */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(s: SparkSession, d: String, frameBytes: Int = 32,
      every: Int = 4): Dataset[Frame] = {
    import s.implicits._
    mediaTable(s, d).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        p.grouped(frameBytes).zipWithIndex.collect {
          case (frame, i) if i % every == 0 => Frame(id, i, frame)
        }
      })
  }
}

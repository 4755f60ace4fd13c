package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in distributed
  * batches.
  *
  * The Spark-side plumbing (schema, partitioning, per-partition batch
  * shape) is real; the codec step is a clearly-marked deterministic STUB —
  * this container ships no image/audio libraries, so `decodeStub`
  * synthesizes plausible dimensions/frames from a content hash. A real
  * deployment swaps [[Decoder]] for one backed by javacv/ffmpeg without
  * touching the dataflow.
  *
  * Scale notes: payloads stay in executor memory only for the lifetime of
  * one partition iterator (mapPartitions streams record-at-a-time); wide
  * binary columns should be pruned before shuffles — all metadata-only
  * downstream paths `select` away `payload` first.
  */
object Multimodal {

  /** One media file: id, kind tag, raw bytes, provenance. */
  case class MediaRecord(media_id: Long, media_type: String,
                         payload: Array[Byte], source: String)

  case class DecodedMedia(media_id: Long, media_type: String,
                          width: Int, height: Int, n_bytes: Long,
                          content_sha: String, frames_sampled: Int)

  case class MediaFeatures(media_id: Long, embedding: Array[Float])

  /** Pluggable codec seam. */
  trait Decoder extends Serializable {
    def decode(m: MediaRecord): DecodedMedia
    def features(m: MediaRecord, dims: Int): Array[Float]
  }

  /** STUB codec — deterministic fake decode (no real image/audio libs in
    * this environment). Dimensions, frame counts and features derive from
    * the SHA-256 of the payload, so results are stable across runs and
    * engines.
    */
  object StubDecoder extends Decoder {
    private def sha(bytes: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes)

    def decode(m: MediaRecord): DecodedMedia = {
      val h = sha(m.payload)
      val w = 16 + (java.lang.Byte.toUnsignedInt(h(0)) % 240)
      val ht = 16 + (java.lang.Byte.toUnsignedInt(h(1)) % 240)
      val frames = m.media_type match {
        case "video" => 1 + (java.lang.Byte.toUnsignedInt(h(2)) % 32)
        case "audio" => 1 + (java.lang.Byte.toUnsignedInt(h(2)) % 16)
        case _       => 1
      }
      DecodedMedia(m.media_id, m.media_type, w, ht, m.payload.length.toLong,
        h.map("%02x".format(_)).mkString, frames)
    }

    def features(m: MediaRecord, dims: Int): Array[Float] = {
      val h = sha(m.payload)
      Array.tabulate(dims)(i =>
        (java.lang.Byte.toUnsignedInt(h(i % h.length)) - 128) / 128.0f)
    }
  }

  implicit private val decodedEnc: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]
  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit private val mediaEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]

  /** Wrap any table with an id + binary-able column as MediaRecords. */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String,
                 mediaType: String, sourceCol: String): Dataset[MediaRecord] =
    df.select(col(idCol).cast("long").as("media_id"),
        lit(mediaType).as("media_type"),
        col(payloadCol).cast("binary").as("payload"),
        col(sourceCol).cast("string").as("source"))
      .as[MediaRecord]

  /** Distributed decode: record-at-a-time per partition; the decoder is
    * instantiated once per partition (cheap here, but the pattern matches
    * real codecs with per-partition native init).
    */
  def decode(ds: Dataset[MediaRecord], decoder: Decoder = StubDecoder): Dataset[DecodedMedia] =
    ds.mapPartitions(it => it.map(decoder.decode))

  /** Distributed feature extraction → fixed-dim float embedding column. */
  def extractFeatures(ds: Dataset[MediaRecord], dims: Int = 16,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] =
    ds.mapPartitions(it => it.map(m => MediaFeatures(m.media_id, decoder.features(m, dims))))

  /** Frame sampling for video-typed records: every `everyNth` byte of the
    * payload stands in for a frame grab (STUB — a real impl samples
    * decoded frames). Returns (media_id, frame_idx, frame_hash).
    */
  def sampleFrames(ds: Dataset[MediaRecord], everyNth: Int = 1024): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { m =>
      m.payload.grouped(everyNth).zipWithIndex.map { case (chunk, i) =>
        (m.media_id, i,
          java.security.MessageDigest.getInstance("MD5")
            .digest(chunk).map("%02x".format(_)).mkString)
      }
    }.toDF("media_id", "frame_idx", "frame_hash")
  }
}

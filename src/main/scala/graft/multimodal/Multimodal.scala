package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One decodable media item: opaque binary payload + typed metadata
  * (brief: "treat image/audio/video as opaque binary columns with typed
  * metadata"). */
case class MediaRow(id: Long, mime: String, payload: Array[Byte])

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(id: Long, byteLen: Int, featureDim: Int, checksum: Long)

/** Multimodal-column plumbing: binary payload columns with a typed
  * metadata struct, and a partition-batched decode/feature-extract stage.
  *
  * The decode itself is a STUB — this container has no image/audio codecs,
  * so features are a deterministic fake derived from the payload bytes.
  * Everything around it is real and scale-shaped: `BinaryType` storage,
  * metadata carried as a struct (prunable columns), and decoding via
  * `mapPartitions` over fixed-size batches — the Scala analogue of a
  * `mapInPandas` batch UDF, amortizing per-batch setup (model load, codec
  * init) exactly as a real decoder would at 1000-executor scale.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct derived from a text column
    * (fixture stand-in for real media bytes). Pure projection: no shuffle,
    * metadata fields independently prunable by Catalyst. */
  def attachBinary(df: DataFrame, idCol: String, textCol: String,
      mime: String = "text/plain"): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        expr(s"octet_length($textCol)").cast("bigint").as("byte_len"),
        lit(mime).as("mime"),
        substring(md5(col(textCol)), 1, 8).as("sig")).as("meta"))

  /** Partition-batched decode / feature-extract.
    *
    * STUB: a real deployment decodes each batch with native libs
    * (libjpeg/ffmpeg/…) and emits embeddings; unavailable here, so the
    * "features" are a deterministic byte checksum + fixed featureDim. The
    * batching shape (grouped iterator inside mapPartitions, per-batch
    * amortized setup) is the real, tested contract.
    */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would happen here (decoder/model init)
        batch.iterator.map { m =>
          val cs = m.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xffffffffL)
          MediaFeatures(m.id, m.payload.length, 16, cs)
        }
      }
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and partition-parallel feature
  * extraction with a STUBBED decode step (no media codecs in this
  * environment — a real deployment swaps `decodeFrames` for an actual
  * decoder; everything around it — schema, encoders, batching,
  * partition parallelism — is real and tested).
  *
  * Scale: `extractFeatures` is a narrow mapPartitions (no shuffle); the
  * payload bytes never leave the executor that read them. Frame hashes
  * are computed per item in a streaming fashion so one oversized payload
  * does not blow executor memory beyond its own size.
  */
object Multimodal {

  /** An opaque media payload plus typed metadata. */
  case class MediaItem(doc_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features: fixed-shape, decode-derived. */
  case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      n_frames: Long,
      frame0_hash: String)

  val FRAME_BYTES = 256

  /** Wrap a string/binary column as a typed media dataset. */
  def ingest(df: DataFrame, idCol: String, payloadCol: String,
      mime: String): Dataset[MediaItem] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        lit(mime).as("mime"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** STUB decode: a real implementation parses the payload with a codec
    * and yields frames; this deterministic fake treats each
    * `FRAME_BYTES` window as one "frame" so the pipeline shape
    * (per-frame iteration, bounded memory) is exercised end to end.
    */
  private def decodeFrames(payload: Array[Byte]): Iterator[Array[Byte]] =
    payload.grouped(FRAME_BYTES)

  /** Partition-parallel feature extraction over the (stubbed) decoder. */
  def extractFeatures(ds: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        var n = 0L
        decodeFrames(m.payload).foreach(_ => n += 1)
        // hash of the first frame window (empty payload hashes empty —
        // keeps the value total rather than null/sentinel)
        md.reset()
        val frame0 = md.digest(
            m.payload.slice(0, math.min(FRAME_BYTES, m.payload.length)))
          .map("%02x".format(_)).mkString
        MediaFeatures(m.doc_id, m.mime, m.payload.length.toLong, n, frame0)
      }
    }
  }
}

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

  /** STUB decode (video/audio only — PNG below is real): a real
    * implementation parses the payload with a codec and yields frames;
    * this deterministic fake treats each `FRAME_BYTES` window as one
    * "frame" so the pipeline shape (per-frame iteration, bounded
    * memory) is exercised end to end. No video/audio codec ships in
    * the JDK; images go through [[decodePng]], which is a REAL codec.
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

  // ==========================================================================
  // REAL image codec: PNG via javax.imageio (public JDK, zero extra deps).
  // The synthesize→decode round trip makes the partition-parallel
  // extraction claim load-bearing: decoded dimensions and pixel sums are
  // verified against analytically-predicted oracle values, so a decoder
  // that returned fabricated frames would hash-mismatch.
  // ==========================================================================

  /** Features read from a DECODED image — every field below comes from
    * the decoder's output raster, never from the generating parameters.
    */
  case class PngFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      n_pixels: Long,
      pixel_sum: Long,
      corner_pixel: Long)

  /** Deterministic 8-bit grayscale test card: pixel at linear index `p`
    * (row-major) holds `(p + seed) % 256`. Encoded with the JDK's real
    * PNG writer — the payload is a genuine PNG stream (signature,
    * IHDR/IDAT/IEND, zlib-compressed scanlines).
    */
  def synthesizePng(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var p = 0L
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, ((p + seed) % 256).toInt)
        p += 1
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "png", bos)
    require(ok, "no PNG writer available in this JVM")
    bos.toByteArray
  }

  /** REAL decode: parse the PNG stream back into a raster and report
    * dimensions plus pixel statistics from the decoded samples.
    */
  def decodePng(docId: Long, payload: Array[Byte]): PngFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $docId: payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum += raster.getSample(x, y, 0)
        x += 1
      }
      y += 1
    }
    PngFeatures(docId, w.toLong, h.toLong, w.toLong * h,
      sum, raster.getSample(w - 1, h - 1, 0).toLong)
  }

  /** Partition-parallel encode→decode over synthesized test cards:
    * `(doc_id, width, height)` rows in, decoded features out. Narrow
    * (no shuffle); payload bytes live and die inside one task — the
    * same dataflow shape a real 100 TB image-corpus extraction uses,
    * now through a real codec on both sides.
    */
  def pngRoundTrip(df: DataFrame): Dataset[PngFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"),
        col("width").cast("int"), col("height").cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        // ImageIO defaults to a DISK-backed scratch cache for every
        // encode/decode — for byte-array streams that is a temp file
        // per image, pure overhead that inflates under I/O pressure
        // (bench forensics: 1.3 s -> 5.5 s on a busy box). Keep the
        // codec fully in memory; the flag is JVM-global and idempotent.
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, w, h) =>
          decodePng(id, synthesizePng(id, w, h))
        }
      }
  }

  // ---- WAV / PCM audio (javax.sound.sampled — pure JDK) --------------

  /** The JDK's WAVE file reader/writer SPIs, resolved ONCE per JVM.
    * `AudioSystem.getAudioInputStream`/`write` re-scan the classpath's
    * provider registry on EVERY call (JDK13Services does not cache) —
    * milliseconds per call against a several-hundred-jar Spark
    * classpath, which dominated the wav round trip (~7 ms/row). The
    * cached providers run the exact same RIFF parse/emit code path;
    * AudioSystem's per-call loop over readers collapses to the same
    * first-success loop here.
    */
  private lazy val wavReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }
  private lazy val wavWriters
      : Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
      .filter(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }

  private def readWavStream(in: java.io.InputStream)
      : javax.sound.sampled.AudioInputStream = {
    val it = wavReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(in)
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    // registry empty or nothing matched: the slow generic dispatch is
    // the correct (and correctly-failing) fallback
    javax.sound.sampled.AudioSystem.getAudioInputStream(in)
  }

  private def writeWavStream(ais: javax.sound.sampled.AudioInputStream,
      out: java.io.OutputStream): Unit =
    // per-STREAM support check, like AudioSystem.write's provider loop:
    // a writer can support WAVE generally but reject this stream's
    // format — fall through to the next provider / generic dispatch
    // instead of throwing from the first one
    wavWriters.find(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE, ais)) match {
      case Some(w) => w.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      case None => javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    }

  case class WavFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_samples: Long,
      duration_ms: Long,
      rms: Long,
      peak: Long,
      zero_crossings: Long)

  /** Deterministic 16-bit mono PCM test tone: sample i holds a square
    * wave of period `2 * halfPeriod` samples at amplitude
    * `1000 + seed % 9000`. Encoded with the JDK's REAL WAV writer
    * (AudioSystem → RIFF/fmt/data chunks) — the payload is a genuine
    * .wav byte stream.
    */
  def synthesizeWav(seed: Long, nSamples: Int,
      sampleRate: Int = 16000): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0, "bad audio geometry")
    val amp = (1000 + seed % 9000).toInt
    val halfPeriod = 10 + (seed % 20).toInt
    // last quarter is silence, so rms < peak (a decoder faking either
    // from the header alone cannot match both)
    val active = (3 * nSamples) / 4
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v =
        if (i >= active) 0
        else if ((i / halfPeriod) % 2 == 0) amp else -amp
      pcm(2 * i) = (v & 0xff).toByte          // little-endian int16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    writeWavStream(ais, bos)
    bos.toByteArray
  }

  /** REAL decode: AudioSystem parses the RIFF container + PCM frames
    * back; features derive from the decoded samples. `rms` is the
    * floor of the root-mean-square amplitude (exact integer for
    * engine-portable comparison), `zero_crossings` counts sign flips.
    */
  def decodeWav(docId: Long, payload: Array[Byte]): WavFeatures = {
    val ais = readWavStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"doc $docId: expected 16-bit mono PCM, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var i = 0
    var sumSq = 0.0
    var peak = 0L
    var crossings = 0L
    var prev = 0
    while (i < n) {
      val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      sumSq += v.toDouble * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && ((v < 0) != (prev < 0))) crossings += 1
      prev = v
      i += 1
    }
    WavFeatures(docId,
      fmt.getSampleRate.toLong,
      n.toLong,
      n.toLong * 1000L / fmt.getSampleRate.toLong,
      math.sqrt(sumSq / n).toLong,
      peak,
      crossings)
  }

  /** Partition-parallel WAV encode→decode: `(doc_id, n_samples)` rows
    * in, decoded audio features out. Same narrow dataflow as
    * [[pngRoundTrip]] — payloads never leave the task.
    */
  def wavRoundTrip(df: DataFrame): Dataset[WavFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("n_samples").cast("int"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) =>
        decodeWav(id, synthesizeWav(id, n))
      })
  }
}

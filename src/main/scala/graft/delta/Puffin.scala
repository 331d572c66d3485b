package graft.delta

import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Puffin file support for deletion-vector blobs (reference
  * kernel/src/content_tree/mod.rs:259-264 `DataFileFormat::Puffin`;
  * format per the public Iceberg puffin spec).
  *
  * Layout written/read here (one or more DV blobs):
  *
  * {{{
  *   Magic | blob* | Magic | footer-payload | payload-size(4B LE)
  *         | flags(4B) | Magic
  * }}}
  *
  * Each `deletion-vector-v1` blob reuses Delta's portable-roaring
  * framing verbatim — `[4B BE size][LE magic][bitmap][4B BE crc]`,
  * where `size` covers magic+bitmap and the crc is over magic+bitmap
  * (the same region [[DeletionVectors.readBitmapBytes]] validates in a
  * Delta `.bin` DV file). A blob's footer `length` is therefore Delta's
  * `sizeInBytes + 8` — exactly the Iceberg framing adjustment
  * [[ContentTree.extractDeletionVectorContent]] applies.
  *
  * All I/O here is driver-side metadata work: DV blobs are KB-scale.
  */
object Puffin {

  /** File magic `PFA1`. */
  val MAGIC: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  val DV_BLOB_TYPE = "deletion-vector-v1"

  /** One blob's footer metadata. `offset`/`length` frame the blob in
    * the file; `cardinality` and `referencedDataFile` ride in blob
    * properties per the Iceberg DV blob convention.
    */
  case class BlobMeta(
      blobType: String,
      offset: Long,
      length: Long,
      snapshotId: Long,
      sequenceNumber: Long,
      cardinality: Long,
      referencedDataFile: Option[String])

  /** Write a puffin file holding one DV blob per input
    * `(portableBitmapBytes, cardinality, referencedDataFile)`; returns
    * the blob metadata in input order. Bitmap bytes are the MAGICLESS
    * portable serialization ([[DeletionVectors.bitmapBytes]]) — the LE
    * magic is added by the blob framing, mirroring the `.bin` layout.
    */
  def writeDvFile(fs: org.apache.hadoop.fs.FileSystem, path: Path,
      dvs: Seq[(Array[Byte], Long, Option[String])],
      snapshotId: Long, sequenceNumber: Long): Seq[BlobMeta] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(MAGIC)
    val metas = dvs.map { case (bitmap, cardinality, refFile) =>
      val offset = out.size().toLong
      val size = bitmap.length + 4 // LE magic + bitmap
      writeBeInt(out, size)
      writeLeInt(out, DeletionVectors.PORTABLE_MAGIC)
      out.write(bitmap)
      val crc = new CRC32()
      crc.update(leIntBytes(DeletionVectors.PORTABLE_MAGIC))
      crc.update(bitmap)
      writeBeInt(out, crc.getValue.toInt)
      BlobMeta(DV_BLOB_TYPE, offset, size + 8L, snapshotId,
        sequenceNumber, cardinality, refFile)
    }
    out.write(MAGIC)
    val payload = footerJson(metas).getBytes(StandardCharsets.UTF_8)
    out.write(payload)
    writeLeInt(out, payload.length)
    writeLeInt(out, 0) // flags: payload uncompressed
    out.write(MAGIC)
    val o = fs.create(path, false)
    try o.write(out.toByteArray) finally o.close()
    metas
  }

  private def footerJson(metas: Seq[BlobMeta]): String = {
    val blobs = metas.map { m =>
      val props = (Seq(s""""cardinality":"${m.cardinality}"""") ++
        m.referencedDataFile.map(f =>
          s""""referenced-data-file":"${JsonLog.esc(f)}"""")).mkString(",")
      s"""{"type":"${m.blobType}","fields":[],""" +
        s""""snapshot-id":${m.snapshotId},""" +
        s""""sequence-number":${m.sequenceNumber},""" +
        s""""offset":${m.offset},"length":${m.length},""" +
        s""""properties":{$props}}"""
    }
    s"""{"blobs":[${blobs.mkString(",")}],""" +
      """"properties":{"created-by":"graft-spark"}}"""
  }

  /** Parse the footer of a puffin file; returns its blob metadata. */
  def readFooter(fs: org.apache.hadoop.fs.FileSystem,
      path: Path): Seq[BlobMeta] = {
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    val all = new Array[Byte](len.toInt)
    try in.readFully(0, all) finally in.close()
    require(all.take(4).sameElements(MAGIC), s"not a puffin file: $path")
    require(all.takeRight(4).sameElements(MAGIC),
      s"puffin trailing magic missing: $path")
    val payloadSize = leInt(all, all.length - 12)
    val flags = leInt(all, all.length - 8)
    require((flags & 1) == 0, "compressed puffin footers not supported")
    val payloadStart = all.length - 12 - payloadSize
    require(all.slice(payloadStart - 4, payloadStart).sameElements(MAGIC),
      s"puffin footer magic missing: $path")
    val node = JsonLog.parseLine(new String(all, payloadStart,
      payloadSize, StandardCharsets.UTF_8))
    val blobs = node.get("blobs")
    require(blobs != null && blobs.isArray, "puffin footer missing blobs")
    (0 until blobs.size).map { i =>
      val b = blobs.get(i)
      val props = Option(b.get("properties"))
      def prop(k: String): Option[String] =
        props.flatMap(p => Option(p.get(k))).map(_.asText)
      BlobMeta(
        b.get("type").asText,
        b.get("offset").asLong,
        b.get("length").asLong,
        Option(b.get("snapshot-id")).map(_.asLong).getOrElse(0L),
        Option(b.get("sequence-number")).map(_.asLong).getOrElse(0L),
        prop("cardinality").map(_.toLong).getOrElse(-1L),
        prop("referenced-data-file"))
    }
  }

  /** Read + validate one DV blob region; returns the MAGICLESS portable
    * bitmap bytes (the shape [[DeletionVectors.deserialize]] accepts).
    */
  def readDvBlob(fs: org.apache.hadoop.fs.FileSystem, path: Path,
      offset: Long, length: Long): Array[Byte] = {
    val buf = new Array[Byte](length.toInt)
    val in = fs.open(path)
    try in.readFully(offset, buf) finally in.close()
    val size = beInt(buf, 0)
    require(size == length - 8,
      s"puffin DV blob size $size != framed length ${length - 8}")
    require(leInt(buf, 4) == DeletionVectors.PORTABLE_MAGIC,
      "puffin DV blob magic mismatch")
    val crc = new CRC32()
    crc.update(buf, 4, size)
    require(beInt(buf, 4 + size) == crc.getValue.toInt,
      s"puffin DV blob checksum mismatch in $path")
    java.util.Arrays.copyOfRange(buf, 8, 4 + size)
  }

  /** Convenience: read a DV blob through a content-tree
    * [[ContentTree.DeletionVectorInfo]] whose location names a puffin
    * file, re-persisting the bitmap as a Delta descriptor (inline when
    * small, a `.bin` DV file otherwise) — the bridge from a
    * puffin-backed tree entry back to the Delta read path.
    */
  def dvInfoToDeltaDescriptor(info: ContentTree.DeletionVectorInfo,
      tableRoot: Path, conf: Configuration): DeletionVectorDescriptor = {
    val p = new Path(info.location)
    val abs = if (p.isAbsolute) p else new Path(tableRoot, info.location)
    val fs = Storage.fs(abs, conf)
    val bitmap = readDvBlob(fs, abs, info.offset, info.sizeInBytes)
    if (bitmap.length + 4 <= DeletionVectors.INLINE_MAX_BYTES)
      DeletionVectors.inlineDescriptor(bitmap, info.cardinality)
    else
      DeletionVectors.writeBitmaps(
        Seq(("dv", bitmap, info.cardinality)), tableRoot, conf)("dv")
  }

  private def writeBeInt(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeLeInt(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    o.write(leIntBytes(v))
  private def leIntBytes(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}

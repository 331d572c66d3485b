package graft.delta

/** File-size distribution across the protocol's predefined bins
  * (reference kernel/src/crc/file_size_histogram.rs; PROTOCOL.md
  * "File Size Histogram Schema"). Maintained incrementally in `.crc`
  * checksums: `insert` on add, `remove` on remove — table-wide file
  * layout statistics without listing anything.
  */
case class FileSizeHistogram(
    sortedBinBoundaries: IndexedSeq[Long],
    fileCounts: Array[Long],
    totalBytes: Array[Long]) {

  require(sortedBinBoundaries.nonEmpty &&
    fileCounts.length == sortedBinBoundaries.length &&
    totalBytes.length == sortedBinBoundaries.length,
    "histogram arrays must align with bin boundaries")

  /** Index of the bin holding `size`: greatest boundary <= size. */
  def binOf(size: Long): Int = {
    var lo = 0
    var hi = sortedBinBoundaries.length - 1
    var ans = 0
    while (lo <= hi) {
      val mid = (lo + hi) / 2
      if (sortedBinBoundaries(mid) <= size) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  def insert(size: Long): FileSizeHistogram = {
    if (size < 0) return this
    val b = binOf(size)
    val fc = fileCounts.clone(); val tb = totalBytes.clone()
    fc(b) += 1; tb(b) += size
    copy(fileCounts = fc, totalBytes = tb)
  }

  /** Removal saturates at zero (reference `remove`): a stale or
    * double-counted tombstone must not drive counts negative.
    */
  def remove(size: Long): FileSizeHistogram = {
    if (size < 0) return this
    val b = binOf(size)
    val fc = fileCounts.clone(); val tb = totalBytes.clone()
    fc(b) = math.max(0L, fc(b) - 1)
    tb(b) = math.max(0L, tb(b) - size)
    copy(fileCounts = fc, totalBytes = tb)
  }

  def totalFiles: Long = fileCounts.sum
  def totalSize: Long = totalBytes.sum

  def toJson: String =
    s"""{"sortedBinBoundaries":[${sortedBinBoundaries.mkString(",")}],""" +
      s""""fileCounts":[${fileCounts.mkString(",")}],""" +
      s""""totalBytes":[${totalBytes.mkString(",")}]}"""
}

object FileSizeHistogram {

  private val KB = 1024L
  private val MB = KB * 1024
  private val GB = MB * 1024

  /** The 95 default boundaries (reference
    * file_size_histogram.rs DEFAULT_BIN_BOUNDARIES, matching Delta
    * Kernel Java): fine granularity around the 128MB target file size.
    */
  val DefaultBinBoundaries: IndexedSeq[Long] = {
    val b = IndexedSeq.newBuilder[Long]
    b += 0L
    b ++= Seq(8, 16, 32, 64, 128, 256, 512).map(_ * KB)
    b ++= Seq(MB, 2 * MB, 4 * MB)
    b ++= (8L to 40L by 4).map(_ * MB)
    b ++= (48L to 120L by 8).map(_ * MB)
    b ++= (124L to 144L by 4).map(_ * MB)
    b ++= (160L to 576L by 16).map(_ * MB)
    b ++= (640L to 1408L by 64).map(_ * MB)
    b ++= (1536L to 2048L by 128).map(_ * MB)
    b ++= (2304L to 4096L by 256).map(_ * MB)
    b ++= Seq(8, 16, 32, 64, 128, 256).map(_ * GB)
    b.result()
  }

  def empty: FileSizeHistogram = FileSizeHistogram(
    DefaultBinBoundaries,
    new Array[Long](DefaultBinBoundaries.length),
    new Array[Long](DefaultBinBoundaries.length))

  def of(sizes: Iterable[Long]): FileSizeHistogram =
    sizes.foldLeft(empty)(_.insert(_))

  def fromJson(n: com.fasterxml.jackson.databind.JsonNode)
      : Option[FileSizeHistogram] =
    try {
      import scala.jdk.CollectionConverters._
      def longs(f: String): IndexedSeq[Long] =
        n.get(f).elements().asScala.map(_.asLong).toIndexedSeq
      Some(FileSizeHistogram(longs("sortedBinBoundaries"),
        longs("fileCounts").toArray, longs("totalBytes").toArray))
    } catch { case _: Exception => None }
}

package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** WKB (Well-Known Binary, OGC 06-103r4) codec + planar/spherical
  * geometry kernels for the geospatial column surface.
  *
  * The reference stores geometry/geography values as WKB in `binary`
  * parquet columns (kernel/src/schema/mod.rs:1867-1935,
  * table_features/geospatial.rs) but ships no predicate surface yet
  * (mod.rs:2009-2016 marks the types in-development). This module
  * supplies the predicate layer a user would reach for first —
  * envelope intersection, point-in-polygon, distance — over exactly
  * that storage format, as STATIC methods so the Catalyst expressions
  * in [[GeoExprs]] can call them from whole-stage-generated code
  * (same pattern as [[graft.delta.DvExprs]]).
  *
  * Scope: 2-D geometries, plain OGC type codes 1-7 (Point, LineString,
  * Polygon, MultiPoint, MultiLineString, MultiPolygon,
  * GeometryCollection), both byte orders. Z/M variants (ISO +1000/+2000
  * offsets) and EWKB flag bits decode to `null` rather than wrong
  * answers. All decode paths are total: malformed bytes yield null,
  * never an exception, matching the engine's cast-returns-NULL rule.
  */
object GeoWkb {

  // OGC geometry type codes
  final val POINT = 1
  final val LINESTRING = 2
  final val POLYGON = 3
  final val MULTIPOINT = 4
  final val MULTILINESTRING = 5
  final val MULTIPOLYGON = 6
  final val COLLECTION = 7

  /** Mean Earth radius (IUGG), metres — the value DuckDB/PostGIS
    * spherical helpers document.
    */
  final val EARTH_RADIUS_M = 6371008.8

  // ---------------------------------------------------------------- encode

  /** Little-endian WKB point. */
  def encodePoint(x: Double, y: Double): Array[Byte] = {
    val b = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(POINT).putDouble(x).putDouble(y)
    b.array()
  }

  /** Little-endian WKB linestring from a flat [x0,y0,x1,y1,...] array. */
  def encodeLineString(coords: Array[Double]): Array[Byte] = {
    require(coords.length % 2 == 0, "flat coord array must be even-length")
    val n = coords.length / 2
    val b = ByteBuffer.allocate(9 + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(LINESTRING).putInt(n)
    coords.foreach(b.putDouble)
    b.array()
  }

  /** Little-endian WKB polygon; each ring a flat closed coord array
    * (first point repeated last, per spec).
    */
  def encodePolygon(rings: Array[Array[Double]]): Array[Byte] = {
    require(rings.nonEmpty, "polygon needs at least an outer ring")
    val size = 9 + rings.map(r => 4 + 8 * r.length).sum
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(POLYGON).putInt(rings.length)
    rings.foreach { r =>
      require(r.length % 2 == 0 && r.length >= 8,
        "ring must be a closed flat coord array (>= 4 points)")
      b.putInt(r.length / 2)
      r.foreach(b.putDouble)
    }
    b.array()
  }

  // ---------------------------------------------------------------- decode

  /** Cursor over one WKB geometry; header-validated, 2-D plain codes
    * only. Null result = not decodable under this module's scope.
    */
  private final class Cursor(bytes: Array[Byte]) {
    val buf: ByteBuffer = ByteBuffer.wrap(bytes)
    /** Reads the byte-order mark + type code; -1 if invalid/unsupported. */
    def readHeader(): Int = {
      if (buf.remaining() < 5) return -1
      buf.get() match {
        case 0 => buf.order(ByteOrder.BIG_ENDIAN)
        case 1 => buf.order(ByteOrder.LITTLE_ENDIAN)
        case _ => return -1
      }
      val t = buf.getInt()
      // reject ISO Z/M offsets and EWKB dimension/SRID flag bits
      if (t < POINT || t > COLLECTION) -1 else t
    }
    def readInt(): Int = if (buf.remaining() < 4) -1 else buf.getInt()
    def readDouble(): Double = buf.getDouble()
    def has(n: Int): Boolean = buf.remaining() >= n
  }

  /** OGC type name, or null when undecodable. */
  def geomType(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    new Cursor(bytes).readHeader() match {
      case POINT => "POINT"
      case LINESTRING => "LINESTRING"
      case POLYGON => "POLYGON"
      case MULTIPOINT => "MULTIPOINT"
      case MULTILINESTRING => "MULTILINESTRING"
      case MULTIPOLYGON => "MULTIPOLYGON"
      case COLLECTION => "GEOMETRYCOLLECTION"
      case _ => null
    }
  }

  /** Point x coordinate; null unless a well-formed 2-D point. */
  def stX(bytes: Array[Byte]): java.lang.Double = pointCoord(bytes, 0)

  /** Point y coordinate; null unless a well-formed 2-D point. */
  def stY(bytes: Array[Byte]): java.lang.Double = pointCoord(bytes, 1)

  private def pointCoord(bytes: Array[Byte], i: Int): java.lang.Double = {
    if (bytes == null) return null
    val c = new Cursor(bytes)
    if (c.readHeader() != POINT || !c.has(16)) return null
    val x = c.readDouble(); val y = c.readDouble()
    if (i == 0) x else y
  }

  /** Total vertex count across all parts/rings; null if undecodable. */
  def numPoints(bytes: Array[Byte]): java.lang.Integer = {
    if (bytes == null) return null
    val c = new Cursor(bytes)
    val n = countPoints(c, depth = 0)
    if (n < 0) null else Int.box(n)
  }

  private def countPoints(c: Cursor, depth: Int): Int = {
    if (depth > 8) return -1 // nested-collection bomb guard
    c.readHeader() match {
      case POINT => if (c.has(16)) { c.readDouble(); c.readDouble(); 1 } else -1
      case LINESTRING => skimCoords(c)
      case POLYGON =>
        val rings = c.readInt()
        if (rings < 0 || rings > c.buf.remaining()) return -1
        var total = 0
        var i = 0
        while (i < rings) {
          val n = skimCoords(c)
          if (n < 0) return -1
          total += n; i += 1
        }
        total
      case MULTIPOINT | MULTILINESTRING | MULTIPOLYGON | COLLECTION =>
        val parts = c.readInt()
        if (parts < 0 || parts > c.buf.remaining()) return -1
        var total = 0
        var i = 0
        while (i < parts) {
          val n = countPoints(c, depth + 1)
          if (n < 0) return -1
          total += n; i += 1
        }
        total
      case _ => -1
    }
  }

  /** Reads a count-prefixed coord run, returning the point count. */
  private def skimCoords(c: Cursor): Int = {
    val n = c.readInt()
    // long math: a hostile count like 0x7fffffff would overflow 16*n
    if (n < 0 || 16L * n > c.buf.remaining()) return -1
    var i = 0
    while (i < n) { c.readDouble(); c.readDouble(); i += 1 }
    n
  }

  /** Bounding envelope [xmin, ymin, xmax, ymax]; null if undecodable
    * or empty.
    */
  def envelope(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null) return null
    val env = Array(Double.PositiveInfinity, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity)
    if (!accumEnvelope(new Cursor(bytes), env, depth = 0)) return null
    if (env(0) > env(2)) null else env
  }

  private def accumEnvelope(c: Cursor, env: Array[Double],
      depth: Int): Boolean = {
    if (depth > 8) return false
    def point(): Boolean = {
      if (!c.has(16)) return false
      val x = c.readDouble(); val y = c.readDouble()
      if (x < env(0)) env(0) = x
      if (y < env(1)) env(1) = y
      if (x > env(2)) env(2) = x
      if (y > env(3)) env(3) = y
      true
    }
    def run(): Boolean = {
      val n = c.readInt()
      if (n < 0 || 16L * n > c.buf.remaining()) return false
      var i = 0
      while (i < n) { if (!point()) return false; i += 1 }
      true
    }
    c.readHeader() match {
      case POINT => point()
      case LINESTRING => run()
      case POLYGON =>
        val rings = c.readInt()
        if (rings < 0 || rings > c.buf.remaining()) return false
        var i = 0
        while (i < rings) { if (!run()) return false; i += 1 }
        true
      case MULTIPOINT | MULTILINESTRING | MULTIPOLYGON | COLLECTION =>
        val parts = c.readInt()
        if (parts < 0 || parts > c.buf.remaining()) return false
        var i = 0
        while (i < parts) {
          if (!accumEnvelope(c, env, depth + 1)) return false
          i += 1
        }
        true
      case _ => false
    }
  }

  /** Do the two geometries' envelopes intersect (closed-interval)?
    * Null if either side is undecodable. The cheap pre-filter every
    * spatial join starts with — and the only spatial gate the file-
    * skipping layer could ever push (geo columns carry no stats by
    * protocol, so it runs row-level only).
    */
  def envelopesIntersect(a: Array[Byte], b: Array[Byte]): java.lang.Boolean = {
    val ea = envelope(a); if (ea == null) return null
    val eb = envelope(b); if (eb == null) return null
    Boolean.box(
      ea(0) <= eb(2) && eb(0) <= ea(2) && ea(1) <= eb(3) && eb(1) <= ea(3))
  }

  /** Even-odd point-in-polygon over POLYGON / MULTIPOLYGON `poly` and
    * POINT `pt`. Holes need no special casing under even-odd: a point
    * inside a hole crosses both the outer and the hole ring an odd
    * number of times each → even total → outside. Boundary semantics
    * are half-open (edge points may report either side, as with every
    * ray-cast); callers wanting determinism keep data off edges.
    * Null when inputs are not (multi)polygon / point.
    */
  def containsPoint(poly: Array[Byte], pt: Array[Byte]): java.lang.Boolean = {
    if (poly == null || pt == null) return null
    val px = stX(pt); val py = stY(pt)
    if (px == null || py == null) return null
    val x = px.doubleValue(); val y = py.doubleValue()
    val c = new Cursor(poly)
    c.readHeader() match {
      case POLYGON => polygonContains(c, x, y)
      case MULTIPOLYGON =>
        val parts = c.readInt()
        if (parts < 0 || parts > c.buf.remaining()) return null
        var i = 0
        while (i < parts) {
          if (c.readHeader() != POLYGON) return null
          val r = polygonContains(c, x, y)
          if (r == null) return null
          if (r.booleanValue()) return java.lang.Boolean.TRUE
          i += 1
        }
        java.lang.Boolean.FALSE
      case _ => null
    }
  }

  /** Even-odd crossings over every ring of one polygon body (cursor
    * positioned after the header).
    */
  private def polygonContains(c: Cursor, x: Double,
      y: Double): java.lang.Boolean = {
    val rings = c.readInt()
    if (rings < 0 || rings > c.buf.remaining()) return null
    var inside = false
    var r = 0
    while (r < rings) {
      val n = c.readInt()
      if (n < 0 || 16L * n > c.buf.remaining()) return null
      var x0 = 0.0; var y0 = 0.0
      var i = 0
      while (i < n) {
        val x1 = c.readDouble(); val y1 = c.readDouble()
        if (i > 0) {
          // does edge (x0,y0)-(x1,y1) cross the rightward ray from (x,y)?
          if ((y0 > y) != (y1 > y)) {
            val xCross = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
            if (x < xCross) inside = !inside
          }
        }
        x0 = x1; y0 = y1; i += 1
      }
      r += 1
    }
    Boolean.box(inside)
  }

  /** Planar euclidean distance between two POINTs; null otherwise. */
  def distance(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val ax = stX(a); val ay = stY(a); val bx = stX(b); val by = stY(b)
    if (ax == null || ay == null || bx == null || by == null) return null
    val dx = ax.doubleValue() - bx.doubleValue()
    val dy = ay.doubleValue() - by.doubleValue()
    Double.box(math.sqrt(dx * dx + dy * dy))
  }

  /** Haversine great-circle distance in metres between two POINTs
    * holding (lon, lat) degrees; null otherwise. The geography-side
    * distance (spherical edge interpolation — the reference's default
    * geography algorithm name).
    */
  def distanceSphere(a: Array[Byte], b: Array[Byte]): java.lang.Double = {
    val ax = stX(a); val ay = stY(a); val bx = stX(b); val by = stY(b)
    if (ax == null || ay == null || bx == null || by == null) return null
    val lon1 = math.toRadians(ax.doubleValue())
    val lat1 = math.toRadians(ay.doubleValue())
    val lon2 = math.toRadians(bx.doubleValue())
    val lat2 = math.toRadians(by.doubleValue())
    val sdLat = math.sin((lat2 - lat1) / 2)
    val sdLon = math.sin((lon2 - lon1) / 2)
    val h = sdLat * sdLat + math.cos(lat1) * math.cos(lat2) * sdLon * sdLon
    Double.box(2 * EARTH_RADIUS_M * math.asin(math.min(1.0, math.sqrt(h))))
  }

  /** WKT rendering for display/debug (Point/LineString/Polygon and
    * their Multi forms); null if undecodable.
    */
  def asText(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new java.lang.StringBuilder
    if (!appendWkt(new Cursor(bytes), sb, depth = 0)) null else sb.toString
  }

  private def appendWkt(c: Cursor, sb: java.lang.StringBuilder,
      depth: Int): Boolean = {
    if (depth > 8) return false
    def num(d: Double): String =
      // keep the sign of -0.0: toLong would render "0" and a WKT
      // round trip through another consumer would flip the sign bit
      if (d == 0.0 && java.lang.Double.doubleToRawLongBits(d) != 0L)
        "-0"
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def coordRun(): Boolean = {
      val n = c.readInt()
      if (n < 0 || 16L * n > c.buf.remaining()) return false
      sb.append('(')
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(", ")
        sb.append(num(c.readDouble())).append(' ').append(num(c.readDouble()))
        i += 1
      }
      sb.append(')')
      true
    }
    def ringSet(): Boolean = {
      val rings = c.readInt()
      if (rings < 0 || rings > c.buf.remaining()) return false
      sb.append('(')
      var i = 0
      while (i < rings) {
        if (i > 0) sb.append(", ")
        if (!coordRun()) return false
        i += 1
      }
      sb.append(')')
      true
    }
    def parts(label: String): Boolean = {
      val n = c.readInt()
      if (n < 0 || n > c.buf.remaining()) return false
      sb.append(label).append(" (")
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(", ")
        val mark = sb.length()
        if (!appendWkt(c, sb, depth + 1)) return false
        // inner parts of a homogeneous multi drop their type tag
        if (label != "GEOMETRYCOLLECTION") {
          val inner = sb.substring(mark)
          val paren = inner.indexOf('(')
          if (paren >= 0) sb.replace(mark, sb.length(), inner.substring(paren))
        }
        i += 1
      }
      sb.append(')')
      true
    }
    c.readHeader() match {
      case POINT =>
        if (!c.has(16)) return false
        sb.append("POINT (").append(num(c.readDouble())).append(' ')
          .append(num(c.readDouble())).append(')')
        true
      case LINESTRING => sb.append("LINESTRING "); coordRun()
      case POLYGON => sb.append("POLYGON "); ringSet()
      case MULTIPOINT => parts("MULTIPOINT")
      case MULTILINESTRING => parts("MULTILINESTRING")
      case MULTIPOLYGON => parts("MULTIPOLYGON")
      case COLLECTION => parts("GEOMETRYCOLLECTION")
      case _ => false
    }
  }
}

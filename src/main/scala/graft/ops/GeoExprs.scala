package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.{AllBinaryInputs, TwoDoubleInputs}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over WKB geometry columns (the predicate
  * surface for the geo types of kernel/src/schema/mod.rs:1867-1935).
  * Each is a thin codegen'd shim onto a [[GeoWkb]] static kernel —
  * `doGenCode` emits a direct static call, so geo predicates ride
  * inside WholeStageCodegen like any built-in instead of severing the
  * generated loop the way a Scala UDF would (same design as
  * [[graft.delta.DvExprs]]).
  *
  * All of them are null-tolerant in the SQL sense: malformed WKB or a
  * type mismatch yields NULL, never an exception — mirroring the
  * engine's cast rule and the reference's "unknown expressions poison
  * skipping but never filtering" stance (expressions/mod.rs:503-520):
  * a NULL predicate drops the row in a filter, exactly 3VL.
  */
object GeoExprs {

  /** Shared shape: unary WKB-in, nullable out, evaluated by one
    * static [[GeoWkb]] call that returns a boxed value or null.
    */
  abstract class GeoUnary extends UnaryExpression with AllBinaryInputs {
    override def nullable: Boolean = true
    /** Name of the GeoWkb static method (byte[] -> boxed-or-null). */
    def method: String
    /** Java unboxing call on the non-null boxed result. */
    def unbox(resVar: String): String

    override protected def nullSafeEval(b: Any): Any =
      boxedEval(b.asInstanceOf[Array[Byte]])
    def boxedEval(b: Array[Byte]): Any

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val res = ctx.freshName("geoRes")
      nullSafeCodeGen(ctx, ev, c => s"""
        Object $res = graft.ops.GeoWkb.$method($c);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${unbox(res)}; }
      """)
    }
  }

  case class StX(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_x"
    override def method: String = "stX"
    override def unbox(r: String): String =
      s"((java.lang.Double) $r).doubleValue()"
    override def boxedEval(b: Array[Byte]): Any = GeoWkb.stX(b)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StY(child: Expression) extends GeoUnary {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_y"
    override def method: String = "stY"
    override def unbox(r: String): String =
      s"((java.lang.Double) $r).doubleValue()"
    override def boxedEval(b: Array[Byte]): Any = GeoWkb.stY(b)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StGeometryType(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_geometrytype"
    override def method: String = "geomType"
    override def unbox(r: String): String =
      s"org.apache.spark.unsafe.types.UTF8String.fromString((String) $r)"
    override def boxedEval(b: Array[Byte]): Any = {
      val t = GeoWkb.geomType(b)
      if (t == null) null else UTF8String.fromString(t)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class StNumPoints(child: Expression) extends GeoUnary {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_numpoints"
    override def method: String = "numPoints"
    override def unbox(r: String): String =
      s"((java.lang.Integer) $r).intValue()"
    override def boxedEval(b: Array[Byte]): Any = GeoWkb.numPoints(b)
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Envelope as array<double> [xmin, ymin, xmax, ymax]. An array (not
    * a struct) keeps the codegen shim one static call; callers index
    * with element_at.
    */
  case class StEnvelope(child: Expression) extends UnaryExpression
      with AllBinaryInputs {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "st_envelope"
    override protected def nullSafeEval(b: Any): Any = {
      val e = GeoWkb.envelope(b.asInstanceOf[Array[Byte]])
      if (e == null) null else new GenericArrayData(e)
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val res = ctx.freshName("envRes")
      nullSafeCodeGen(ctx, ev, c => s"""
        double[] $res = graft.ops.GeoWkb.envelope($c);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($res); }
      """)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  /** Shared shape: binary (wkb, wkb) -> boxed-or-null static call. */
  abstract class GeoBinary extends BinaryExpression with AllBinaryInputs {
    override def nullable: Boolean = true
    def method: String
    def unbox(resVar: String): String
    def boxedEval(a: Array[Byte], b: Array[Byte]): Any

    override protected def nullSafeEval(a: Any, b: Any): Any =
      boxedEval(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val res = ctx.freshName("geoRes")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        Object $res = graft.ops.GeoWkb.$method($a, $b);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${unbox(res)}; }
      """)
    }
  }

  /** Envelope intersection — the bbox pre-filter of every spatial
    * join/predicate.
    */
  case class StIntersectsBbox(left: Expression, right: Expression)
      extends GeoBinary {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_intersects_bbox"
    override def method: String = "envelopesIntersect"
    override def unbox(r: String): String =
      s"((java.lang.Boolean) $r).booleanValue()"
    override def boxedEval(a: Array[Byte], b: Array[Byte]): Any =
      GeoWkb.envelopesIntersect(a, b)
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(l, r)
  }

  /** Even-odd (multi)polygon-contains-point. */
  case class StContains(left: Expression, right: Expression)
      extends GeoBinary {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_contains"
    override def method: String = "containsPoint"
    override def unbox(r: String): String =
      s"((java.lang.Boolean) $r).booleanValue()"
    override def boxedEval(a: Array[Byte], b: Array[Byte]): Any =
      GeoWkb.containsPoint(a, b)
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(l, r)
  }

  /** Planar point distance. */
  case class StDistance(left: Expression, right: Expression)
      extends GeoBinary {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_distance"
    override def method: String = "distance"
    override def unbox(r: String): String =
      s"((java.lang.Double) $r).doubleValue()"
    override def boxedEval(a: Array[Byte], b: Array[Byte]): Any =
      GeoWkb.distance(a, b)
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(l, r)
  }

  /** Haversine (spherical) distance in metres over (lon, lat) points —
    * the geography-side distance.
    */
  case class StDistanceSphere(left: Expression, right: Expression)
      extends GeoBinary {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_distance_sphere"
    override def method: String = "distanceSphere"
    override def unbox(r: String): String =
      s"((java.lang.Double) $r).doubleValue()"
    override def boxedEval(a: Array[Byte], b: Array[Byte]): Any =
      GeoWkb.distanceSphere(a, b)
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(l, r)
  }

  /** (x, y) -> WKB point. ImplicitCast so integer coordinate
    * expressions coerce to double the way every numeric built-in does.
    */
  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression with TwoDoubleInputs {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_point"
    override protected def nullSafeEval(x: Any, y: Any): Any =
      GeoWkb.encodePoint(x.asInstanceOf[Double], y.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) =>
        s"graft.ops.GeoWkb.encodePoint($x, $y)")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression) = copy(l, r)
  }

  case class StAsText(child: Expression) extends GeoUnary {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_astext"
    override def method: String = "asText"
    override def unbox(r: String): String =
      s"org.apache.spark.unsafe.types.UTF8String.fromString((String) $r)"
    override def boxedEval(b: Array[Byte]): Any = {
      val t = GeoWkb.asText(b)
      if (t == null) null else UTF8String.fromString(t)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  // ------------------------------------------------------- Column API

  private def c(e: Expression): Column =
    org.apache.spark.sql.graft.StreamingShim.column(e)
  private def x(col: Column): Expression =
    org.apache.spark.sql.graft.ColumnExprShim.expression(col)

  def st_point(lon: Column, lat: Column): Column = c(StPoint(x(lon), x(lat)))
  def st_x(g: Column): Column = c(StX(x(g)))
  def st_y(g: Column): Column = c(StY(x(g)))
  def st_geometry_type(g: Column): Column = c(StGeometryType(x(g)))
  def st_num_points(g: Column): Column = c(StNumPoints(x(g)))
  def st_envelope(g: Column): Column = c(StEnvelope(x(g)))
  def st_intersects_bbox(a: Column, b: Column): Column =
    c(StIntersectsBbox(x(a), x(b)))
  def st_contains(poly: Column, pt: Column): Column =
    c(StContains(x(poly), x(pt)))
  def st_distance(a: Column, b: Column): Column = c(StDistance(x(a), x(b)))
  def st_distance_sphere(a: Column, b: Column): Column =
    c(StDistanceSphere(x(a), x(b)))
  def st_astext(g: Column): Column = c(StAsText(x(g)))

  /** SQL-registration table: name -> (arity, builder). Consumed by
    * GraftSparkExtensions so the same functions work through
    * spark.sql and through the engine's own predicate-SQL strings
    * (where the skipping layer treats them as opaque: never a file
    * skip, never a wrong row — expressions/mod.rs:503-520).
    */
  val sqlFunctions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("st_point", 2, args => StPoint(args(0), args(1))),
    ("st_x", 1, args => StX(args.head)),
    ("st_y", 1, args => StY(args.head)),
    ("st_geometrytype", 1, args => StGeometryType(args.head)),
    ("st_numpoints", 1, args => StNumPoints(args.head)),
    ("st_envelope", 1, args => StEnvelope(args.head)),
    ("st_intersects_bbox", 2, args => StIntersectsBbox(args(0), args(1))),
    ("st_contains", 2, args => StContains(args(0), args(1))),
    ("st_distance", 2, args => StDistance(args(0), args(1))),
    ("st_distance_sphere", 2, args => StDistanceSphere(args(0), args(1))),
    ("st_astext", 1, args => StAsText(args.head)))
}

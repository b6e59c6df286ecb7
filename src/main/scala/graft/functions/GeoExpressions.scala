package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Point-in-polygon as a native Catalyst expression (reference F4: the
  * GeoTrellis mask delegate `Gddp.scala:235`, polygon parse `Gddp.scala:143-150`).
  *
  * Even-odd ray casting against a closed ring. The ring is a per-query
  * constant, so it rides into generated code as a reference object (one
  * `double[]` shared across all rows) and the test stays inside
  * WholeStageCodegen — a Scala UDF here would box two doubles per row and
  * break the codegen span around the scan filter.
  *
  * Boundary convention: points exactly on an edge follow even-odd parity (the
  * same convention the reference inherits from GeoTrellis/JTS `mask`); the
  * declared rectangle query is verified against an inclusive-bbox oracle, so
  * the fixture polygon is padded a hair outside the sampled grid lines.
  */
object GeoUtil {
  /** ring = [x0, y0, x1, y1, ...] closed or open (wraps via modulo). */
  def rayCast(lat: Double, lon: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if ((yi > lat) != (yj > lat) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }
}

/** `needsEnvelope` marks nodes the PolygonEnvelopeRule has not yet expanded:
  * the rule rewrites `pip(lat, lon, ring)` to `bbox(ring) AND
  * pip(lat, lon, ring, needsEnvelope = false)` — the conjunct derived from
  * the ring's envelope is a plain range predicate Catalyst can push to the
  * scan, while the flagged copy guards rule idempotency. Semantics are
  * unchanged in any context (ray-cast ⊆ envelope).
  */
case class PointInPolygon(left: Expression, right: Expression, ring: Array[Double],
    needsEnvelope: Boolean = true)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(lat: Any, lon: Any): Any =
    GeoUtil.rayCast(lat.asInstanceOf[Double], lon.asInstanceOf[Double], ring)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) => {
      val ringRef = ctx.addReferenceObj("ring", ring, "double[]")
      s"${ev.value} = graft.functions.GeoUtil.rayCast($lat, $lon, $ringRef);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "point_in_polygon"
}

/** [[PointInPolygon]] with the ring as a CHILD COLUMN instead of a
  * per-query constant — the form a spatial JOIN needs, where each row
  * carries its own polygon (zone). Same ray-cast, same even-odd boundary
  * convention; the ring array is unpacked once per row in generated code
  * (zones are aggregate-sized, points are the big side — the per-row
  * unpack is on the SMALL join output, after bucketing).
  */
case class PointInRing(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = BooleanType

  override def nullSafeEval(lat: Any, lon: Any, ring: Any): Any =
    GeoUtil.rayCast(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      ring.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon, ring) =>
      s"${ev.value} = graft.functions.GeoUtil.rayCast($lat, $lon, $ring.toDoubleArray());")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
  override def prettyName: String = "point_in_ring"
}

object GeoFunctions {
  /** ring as (lon, lat) pairs, GeoJSON-style (`geojson.json:1`). */
  def point_in_polygon(lat: Column, lon: Column, ring: Seq[(Double, Double)]): Column =
    ColumnBridge.column(PointInPolygon(
      ColumnBridge.expression(lat), ColumnBridge.expression(lon),
      ring.flatMap { case (x, y) => Seq(x, y) }.toArray))

  /** Per-row ring (`array<double>` of flat lon,lat pairs) — spatial joins. */
  def point_in_ring(lat: Column, lon: Column, ring: Column): Column =
    ColumnBridge.column(PointInRing(ColumnBridge.expression(lat),
      ColumnBridge.expression(lon), ColumnBridge.expression(ring)))
}

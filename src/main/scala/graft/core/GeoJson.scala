package graft.core

/** Deterministic GeoJSON Feature serialization matching the reference's
  * serialized shape (/root/reference/src/contour.rs:54-65, line.rs:54-65,
  * band.rs:60-72): {"type":"Feature","geometry":{...},"properties":{...}}
  * with properties {"threshold": t} for lines/contours and
  * {"min_v": lo, "max_v": hi} for bands. Key order is fixed; numbers use the
  * JVM's shortest round-trip double formatting.
  */
object GeoJson {

  def num(d: Double): String = {
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) {
      // integral values print like serde_json: "3.0"
      s"${d.toLong}.0"
    } else java.lang.Double.toString(d)
  }

  private def ringJson(pts: Array[Double]): String = {
    val sb = new StringBuilder("[")
    var i = 0
    while (i < pts.length) {
      if (i > 0) sb.append(',')
      sb.append('[').append(num(pts(i))).append(',').append(num(pts(i + 1))).append(']')
      i += 2
    }
    sb.append(']').toString
  }

  def multiPolygonJson(polys: Seq[Poly]): String =
    polys.map { p =>
      (ringJson(p.exterior) +: p.holes.map(ringJson)).mkString("[", ",", "]")
    }.mkString("[", ",", "]")

  def multiLineStringJson(lines: Seq[Array[Double]]): String =
    lines.map(ringJson).mkString("[", ",", "]")

  def contourFeature(c: ContourResult): String =
    s"""{"type":"Feature","geometry":{"type":"MultiPolygon","coordinates":${multiPolygonJson(c.polygons)}},"properties":{"threshold":${num(c.threshold)}}}"""

  def lineFeature(l: LineResult): String =
    s"""{"type":"Feature","geometry":{"type":"MultiLineString","coordinates":${multiLineStringJson(l.lines)}},"properties":{"threshold":${num(l.threshold)}}}"""

  def bandFeature(b: BandResult): String =
    s"""{"type":"Feature","geometry":{"type":"MultiPolygon","coordinates":${multiPolygonJson(b.polygons)}},"properties":{"min_v":${num(b.minV)},"max_v":${num(b.maxV)}}}"""

  def featureCollection(features: Seq[String]): String =
    features.mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
}

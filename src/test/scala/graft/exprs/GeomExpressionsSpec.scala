package graft.exprs

import graft.SparkTestSession
import graft.core.{Geom, Goldens}
import org.scalatest.funsuite.AnyFunSuite

class GeomExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("st_* SQL functions match core kernels bit-for-bit") {
    import spark.implicits._
    GeomExpressions.register(spark)
    val ring = Goldens.simpleExpected
    Seq((ring.toSeq, 4.5, 5.0), (ring.toSeq, 0.0, 0.0), (ring.toSeq, 6.0, 7.5))
      .toDF("ring", "x", "y").createOrReplaceTempView("rings")
    val rows = spark.sql(
      """SELECT st_area2(ring) a, st_point_in_ring(ring, x, y) pir,
        |       st_ring_contains(ring, ring) rc,
        |       st_vertex_key(x, y, 10) vk
        |FROM rings""".stripMargin).collect()
    rows.zip(Seq((4.5, 5.0), (0.0, 0.0), (6.0, 7.5))).foreach { case (r, (x, y)) =>
      assert(r.getDouble(0) == Geom.area2(ring))
      assert(r.getInt(1) == Geom.ringContains(ring, x, y))
      assert(r.getInt(2) == Geom.contains(ring, ring))
      assert(r.getLong(3) == (x * 2).toLong + (y * 2).toLong * 22L)
    }
    // cell case + segment count over a literal window
    val cc = spark.sql(
      "SELECT st_cell_case(1.0D, 0.0D, 1.0D, 0.0D, 0.5D) c, " +
        "st_cell_segments(st_cell_case(1.0D, 0.0D, 1.0D, 0.0D, 0.5D)) s").head()
    assert(cc.getInt(0) == 5) // saddle: bits 0 and 2
    assert(cc.getInt(1) == 2)
  }

  test("st_* scalar expressions stay inside whole-stage codegen") {
    import spark.implicits._
    GeomExpressions.register(spark)
    // repartition blocks constant-folding/local-relation collapse so the
    // project genuinely runs through generated code
    val df = Seq((Goldens.simpleExpected.toSeq, 4.5, 5.0)).toDF("ring", "x", "y")
      .repartition(1)
      .selectExpr("st_area2(ring) a", "st_point_in_ring(ring, x, y) p",
        "st_ring_contains(ring, ring) rc", "st_vertex_key(x, y, 10) vk",
        "st_cell_segments(5) s")
    // evaluate first (AQE finalizes the plan on execution), then assert the
    // final plan kept the projection inside whole-stage codegen
    val r = df.collect().head
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen marker in the final adaptive plan
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), plan)
    assert(r.getDouble(0) == Geom.area2(Goldens.simpleExpected))
    assert(r.getInt(1) == Geom.ringContains(Goldens.simpleExpected, 4.5, 5.0))
    assert(r.getInt(2) == Geom.contains(Goldens.simpleExpected, Goldens.simpleExpected))
    assert(r.getInt(4) == 2)
  }

  test("Column API via call_function") {
    import spark.implicits._
    GeomExpressions.register(spark)
    val df = Seq(Goldens.holeExpectedInterior.toSeq).toDF("ring")
    val a = df.select(GeomExpressions.st_area2($"ring")).head().getDouble(0)
    assert(a == Geom.area2(Goldens.holeExpectedInterior))
    assert(a < 0.0) // holes wind negative
  }
}

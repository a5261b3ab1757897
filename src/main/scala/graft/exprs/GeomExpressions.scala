package graft.exprs

import graft.core.{Cases, Geom}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst expressions for the engine's scalar geometry kernels, exposed to
  * SQL/DataFrame users (packed rings are array<double> of x0,y0,x1,y1,...).
  * Null-intolerant scalar expressions; evaluation delegates to the same
  * graft.core kernels the engine runs, so SQL results are bit-identical to
  * the pipeline's. The hot scalar ops implement doGenCode (a static call
  * into the kernel emitted inline), so plans using them stay inside
  * whole-stage codegen instead of dropping to interpreted eval.
  */
object GeomExpressions {

  /** st_area2(ring) — doubled shoelace signed area (reference summation order). */
  case class StArea2(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(input: Any): Any =
      Geom.area2(input.asInstanceOf[ArrayData].toDoubleArray())
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.core.Geom.area2($c.toDoubleArray())")
    override protected def withNewChildInternal(c: Expression): StArea2 = copy(c)
    override def prettyName: String = "st_area2"
  }

  /** st_point_in_ring(ring, x, y) — 1 inside, -1 outside, 0 on boundary. */
  case class StPointInRing(ring: Expression, x: Expression, y: Expression)
      extends TernaryExpression {
    override def dataType: DataType = IntegerType
    override def first: Expression = ring
    override def second: Expression = x
    override def third: Expression = y
    override protected def nullSafeEval(r: Any, px: Any, py: Any): Any =
      Geom.ringContains(r.asInstanceOf[ArrayData].toDoubleArray(),
        px.asInstanceOf[Double], py.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (r, x, y) =>
        s"graft.core.Geom.ringContains($r.toDoubleArray(), $x, $y)")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
    override def prettyName: String = "st_point_in_ring"
  }

  /** st_ring_contains(ring, other) — first non-zero verdict walking other's
    * vertices (the reference's hole-containment test).
    */
  case class StRingContains(ring: Expression, other: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def left: Expression = ring
    override def right: Expression = other
    override protected def nullSafeEval(r: Any, o: Any): Any =
      Geom.contains(r.asInstanceOf[ArrayData].toDoubleArray(),
        o.asInstanceOf[ArrayData].toDoubleArray())
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (r, o) =>
        s"graft.core.Geom.contains($r.toDoubleArray(), $o.toDoubleArray())")
    override protected def withNewChildrenInternal(a: Expression, b: Expression) = copy(a, b)
    override def prettyName: String = "st_ring_contains"
  }

  /** st_cell_case(sw, se, ne, nw, t) — the marching-squares case index of a
    * 2x2 sample window at threshold t (0..15).
    */
  case class StCellCase(children: Seq[Expression]) extends Expression with CodegenFallback {
    require(children.length == 5, "st_cell_case(sw, se, ne, nw, threshold)")
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val t = children(4).eval(input).asInstanceOf[Double]
      @inline def bit(i: Int): Int = {
        val v = children(i).eval(input)
        if (v != null && v.asInstanceOf[Double] >= t) 1 else 0
      }
      bit(0) | (bit(1) << 1) | (bit(2) << 2) | (bit(3) << 3)
    }
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
    override def prettyName: String = "st_cell_case"
  }

  /** st_cell_segments(case) — segments the case emits (0, 1 or 2). */
  case class StCellSegments(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(c: Any): Any =
      Cases.segCount(c.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.core.Cases.segCount()[$c]")
    override protected def withNewChildInternal(c: Expression): StCellSegments = copy(c)
    override def prettyName: String = "st_cell_segments"
  }

  /** st_vertex_key(x, y, gdx) — collision-free Long key of a pre-smoothing
    * half-integer vertex (the stitch shuffle key).
    */
  case class StVertexKey(x: Expression, y: Expression, gdx: Expression)
      extends TernaryExpression {
    override def dataType: DataType = LongType
    override def first: Expression = x
    override def second: Expression = y
    override def third: Expression = gdx
    override protected def nullSafeEval(px: Any, py: Any, w: Any): Any = {
      val stride = 2L * (w.asInstanceOf[Int].toLong + 1L)
      (px.asInstanceOf[Double] * 2.0).toLong + (py.asInstanceOf[Double] * 2.0).toLong * stride
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (px, py, w) =>
        s"(long)($px * 2.0) + (long)($py * 2.0) * (2L * ((long)$w + 1L))")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(a, b, c)
    override def prettyName: String = "st_vertex_key"
  }

  // ---- Column API (requires register(spark) once per session) ----
  def st_area2(ring: Column): Column =
    org.apache.spark.sql.functions.call_function("st_area2", ring)
  def st_point_in_ring(ring: Column, x: Column, y: Column): Column =
    org.apache.spark.sql.functions.call_function("st_point_in_ring", ring, x, y)
  def st_ring_contains(ring: Column, other: Column): Column =
    org.apache.spark.sql.functions.call_function("st_ring_contains", ring, other)

  /** Register every st_* function for SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("st_area2", es => StArea2(es.head), "built-in")
    reg.createOrReplaceTempFunction("st_point_in_ring",
      es => StPointInRing(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("st_ring_contains",
      es => StRingContains(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("st_cell_case", es => StCellCase(es), "built-in")
    reg.createOrReplaceTempFunction("st_cell_segments", es => StCellSegments(es.head), "built-in")
    reg.createOrReplaceTempFunction("st_vertex_key",
      es => StVertexKey(es(0), es(1), es(2)), "built-in")
  }
}

/** SparkSessionExtensions hook: spark.sql.extensions=graft.exprs.GraftExtensions */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    import GeomExpressions._
    e.injectFunction((FunctionIdentifier("st_area2"),
      new ExpressionInfo(classOf[StArea2].getName, "st_area2"),
      (es: Seq[Expression]) => StArea2(es.head)))
    e.injectFunction((FunctionIdentifier("st_point_in_ring"),
      new ExpressionInfo(classOf[StPointInRing].getName, "st_point_in_ring"),
      (es: Seq[Expression]) => StPointInRing(es(0), es(1), es(2))))
    e.injectFunction((FunctionIdentifier("st_ring_contains"),
      new ExpressionInfo(classOf[StRingContains].getName, "st_ring_contains"),
      (es: Seq[Expression]) => StRingContains(es(0), es(1))))
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native embedding-distance kernels.
  *
  * The Column-composition forms (ops/Similarity.scala: zip_with +
  * aggregate) are the documented reference semantics, but Spark
  * evaluates higher-order functions INTERPRETED — on a billion-vector
  * scan the distance is the hot inner loop and must stay inside
  * whole-stage codegen. These expressions splice a static call on two
  * primitive double arrays into generated code (same pattern as
  * TextKernels).
  *
  * Accumulation is in index order, matching both the zip_with/aggregate
  * fold and DuckDB's list reduction — results are bit-identical to the
  * Column forms, so either can back an oracle-checked query.
  */
object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dp += x * y; na += x * x; nb += y * y
      i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
}

/** Inputs must already be array<double> (callers cast; float arrays
  * via `.cast("array<double>")` — AbstractDataType is private[sql], so
  * no ImplicitCastInputTypes here, matching TextKernels). */
abstract class VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def kernel: String
  override protected def nullSafeEval(a: Any, b: Any): Any = eval2(
    a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def eval2(a: ArrayData, b: ArrayData): Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernels.$kernel($a, $b)")
}

/** cosine_sim(a, b) */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "cosine_sim"
  override protected val kernel = "cosine"
  override protected def eval2(a: ArrayData, b: ArrayData): Double = VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** dot_product(a, b) */
case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "dot_product"
  override protected val kernel = "dot"
  override protected def eval2(a: ArrayData, b: ArrayData): Double = VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

/** l2_distance(a, b) */
case class L2DistanceExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "l2_distance"
  override protected val kernel = "l2"
  override protected def eval2(a: ArrayData, b: ArrayData): Double = VectorKernels.l2(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2DistanceExpr =
    copy(left = l, right = r)
}

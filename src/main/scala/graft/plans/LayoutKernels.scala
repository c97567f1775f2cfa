package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve kernels for clustered layouts.
  *
  * The Hilbert index is computed by Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * standard public n-dimensional formulation): undo the per-level
  * rotations/reflections axis by axis, Gray-encode, then read the
  * index by MSB-first bit interleave of the transposed coordinates.
  * Unlike the Morton/Z curve (functions/ZOrder.scala), consecutive
  * Hilbert indices are ALWAYS adjacent cells (verified exhaustively in
  * LayoutSpec), so a range-partitioned sorted write produces files
  * whose min/max boxes are tighter on average for box queries — the
  * layout modern lakehouse clustering uses where Z-order's diagonal
  * jumps hurt.
  *
  * The per-row cost is a fixed bits×dims bit-twiddling loop with no
  * allocation beyond one small long[] — a codegen-spliced static call
  * (same pattern as TextKernels/VectorKernels), so a 100 TB write
  * keys its range shuffle on a whole-stage-codegen projection.
  */
object LayoutKernels {

  /** Hilbert index of pre-bucketed coords (each in 0..2^bits-1).
    * n*bits must be <= 63. Deterministic pure function of the inputs —
    * safe to recompute on task retry. */
  def hilbertIndex(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = new Array[Long](n)
    System.arraycopy(coords, 0, x, 0, n)
    // inverse undo: peel rotations level by level (Skilling, loop 1)
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode (Skilling, loop 2)
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose -> index: bit j of x(i) lands at j*n + (n-1-i), the
    // same MSB-first convention as ZOrder.interleave (coord 0 owns the
    // most significant bit of each round)
    var out = 0L
    i = 0
    while (i < n) {
      var j = 0
      while (j < bits) {
        out |= ((x(i) >> j) & 1L) << (j * n + (n - 1 - i))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Codegen entry point: coords as the row's array<long> value. */
  def hilbertFromArray(a: ArrayData, bits: Int): Long =
    hilbertIndex(a.toLongArray(), bits)
}

/** hilbert_index(array<long>, bits) — Hilbert curve index of
  * pre-bucketed coordinates as one generated-code call. */
case class HilbertIndexExpr(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1, s"hilbert_index: bits must be >= 1 (got $bits)")
  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    LayoutKernels.hilbertFromArray(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.LayoutKernels.hilbertFromArray($v, $bits)")
  override protected def withNewChildInternal(c: Expression): HilbertIndexExpr =
    copy(child = c)
}

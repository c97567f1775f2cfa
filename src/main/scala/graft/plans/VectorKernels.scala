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

  /** Element-wise a − b (the residual kernel); length = min(|a|, |b|). */
  def diff(a: ArrayData, b: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-plane Rademacher sign rows, ±1.0 doubles, derived from the
    * md5 digest chain "plane{p}_{0..nChunks-1}" — the SAME matrix
    * Similarity.planeDigest spells out in Column space and the DuckDB
    * oracles recompute in SQL, precomputed ONCE per (nPlanes, nChunks)
    * here so the corpus-scan inner loop is a tight primitive-double
    * walk. Each chunk digest carries 32 hex digits × 4 bits = 128
    * signs, and chunk b depends only on (p, b) — so a longer chain is
    * prefix-identical to a shorter one, and 768/1024/1536-dim
    * embeddings bucket consistently with the historical 512-sign
    * (4-chunk) chain on their first 512 dims. */
  private val srpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  // single-entry fast path: a corpus scan calls srpBucket with the same
  // (nPlanes, nChunks) for every row, so the hot loop does one volatile
  // read + two int compares instead of boxing a tuple key per row
  @volatile private var lastSigns: (Int, Int, Array[Array[Double]]) = _
  private def srpSigns(nPlanes: Int, nChunks: Int): Array[Array[Double]] = {
    val last = lastSigns
    if (last != null && last._1 == nPlanes && last._2 == nChunks) return last._3
    val signs = srpCache.computeIfAbsent((nPlanes, nChunks), _ => Array.tabulate(nPlanes) { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = (0 until nChunks).map { b =>
        md.reset()
        md.digest(s"plane${p}_$b".getBytes("UTF-8"))
          .map(x => f"${x & 0xff}%02x").mkString
      }.mkString
      Array.tabulate(nChunks * 128) { k =>
        val digit = Character.digit(hex.charAt(k / 4), 16)
        if (((digit >> (k % 4)) & 1) == 1) 1.0 else -1.0
      }
    })
    lastSigns = (nPlanes, nChunks, signs)
    signs
  }

  /** Generous sanity cap on the dynamic sign chain: one corrupt/giant
    * array row would otherwise pin nPlanes*ceil(n/128)*128 doubles in
    * the executor-static cache forever. 65536 dims is far beyond any
    * real embedding model; malformed data fails loudly instead. */
  val MaxDims = 65536

  /** Sign-random-projection bucket key: bit p = sign of <v, s_p>.
    * Accumulation in index order — bit-identical to the Column form.
    * The sign chain extends to ceil(dims/128) chunks, so any embedding
    * width works (768/1024/1536 included). */
  def srpBucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    require(n <= MaxDims,
      s"srp_bucket: vector has $n dims (cap $MaxDims) — malformed embedding row?")
    val signs = srpSigns(nPlanes, math.max(1, (n + 127) / 128))
    var key = 0L
    var p = 0
    while (p < nPlanes) {
      val s = signs(p)
      var d = 0.0
      var k = 0
      while (k < n) { d += v.getDouble(k) * s(k); k += 1 }
      if (d >= 0) key |= (1L << p)
      p += 1
    }
    key
  }
}

/** srp_bucket(vec, nPlanes) — LSH bucket assignment as a codegen
  * kernel: the bucketing runs over the FULL corpus on every index
  * build, so like the distances it must not fall out of whole-stage
  * codegen into interpreted higher-order functions. */
case class SrpBucketExpr(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "srp_bucket"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.srpBucket(v.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorKernels.srpBucket($v, $nPlanes)")
  override protected def withNewChildInternal(c: Expression): SrpBucketExpr =
    copy(child = c)
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

/** vec_diff(a, b) — element-wise a − b as array<double>: the RESIDUAL
  * kernel (IVF-PQ encodes v − coarse-centroid over the full corpus,
  * so like the distances it must stay inside whole-stage codegen, not
  * fall out to an interpreted zip_with). Index-order IEEE subtraction
  * — DuckDB's list_transform replays it element for element. */
case class VecDiffExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_diff"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.diff(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernels.diff($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDiffExpr =
    copy(left = l, right = r)
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector aggregation as ONE partial aggregate.
  *
  * The 100 TB job this serves: per-stratum embedding centroids (domain
  * drift monitoring, SemDeDup-style cluster summaries, class
  * prototypes). The naive relational spelling — posexplode to
  * (row, dim, value) then groupBy(stratum, dim) — multiplies the
  * shuffle input by `dims` (a 768-dim corpus shuffles 768× its row
  * count). This kernel keeps the vector whole: each task folds its rows
  * into a single dims-wide accumulator, merge is element-wise add, and
  * the shuffle carries #partitions × #groups fixed-size buffers —
  * the same partial-agg shape as BloomBuildAgg
  * (reference datar_polars has no vector-aggregate counterpart; the
  * closest intent is api/base/arithm.py's colSums over a materialized
  * frame, which graft covers relationally in BaseFns.colStats).
  *
  * Accumulation is FIXED-POINT: each element is quantized to
  * floor(x·2^scaleBits + 0.5) and summed as a Long, so the result is
  * independent of row order and partitioning (a double sum is neither)
  * and any engine with BIGINT replays it exactly — the same
  * engine-portability contract as Sampling's 16-bit md5 buckets.
  * Overflow envelope: |x| ≤ B contributes ≤ B·2^scaleBits per row, so
  * at the default scaleBits=24 and unit-normalized embeddings (B≈1) a
  * single group can absorb ~2^38 ≈ 2.7·10¹¹ rows before nearing
  * Long.MaxValue — beyond any stratum at 100 TB. Callers with
  * unnormalized magnitudes budget scaleBits accordingly.
  */
object VectorAggKernels {
  /** Result type of [[VectorFixedSumAgg]]: row count + per-dim
    * fixed-point sums. */
  def resultType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false)))
}

/** vector_fixed_sum(vec) — input must already be array<double>
  * (callers cast, matching VectorBinaryExpr's contract). NULL vectors
  * are skipped (SQL aggregate convention); a NULL ELEMENT or a
  * wrong-width vector fails loudly — silently zero-filling a corrupt
  * embedding would poison the centroid (same malformed-row policy as
  * VectorKernels.MaxDims). */
case class VectorFixedSumAgg(
    child: Expression,
    dims: Int,
    scaleBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dims >= 1 && dims <= VectorKernels.MaxDims,
    s"vector_fixed_sum: dims must be in [1, ${VectorKernels.MaxDims}], got $dims")
  require(scaleBits >= 0 && scaleBits <= 40,
    s"vector_fixed_sum: scaleBits must be in [0, 40], got $scaleBits")

  private val scale = (1L << scaleBits).toDouble

  // slot 0 = row count, slots 1..dims = fixed-point element sums
  override def createAggregationBuffer(): Array[Long] = new Array[Long](dims + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dims,
        s"vector_fixed_sum: expected $dims dims, got ${arr.numElements()} — " +
          "mixed-width or malformed embedding row?")
      buffer(0) += 1L
      var i = 0
      while (i < dims) {
        require(!arr.isNullAt(i),
          s"vector_fixed_sum: NULL element at dim $i — corrupt embedding row?")
        buffer(i + 1) += math.floor(arr.getDouble(i) * scale + 0.5).toLong
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val sums = new Array[Any](dims)
    var i = 0
    while (i < dims) { sums(i) = buffer(i + 1); i += 1 }
    new GenericInternalRow(Array[Any](buffer(0), new GenericArrayData(sums)))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storageFormat.length / 8)
    java.nio.ByteBuffer.wrap(storageFormat).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = VectorAggKernels.resultType
  override def nullable: Boolean = false
  override def prettyName: String = "vector_fixed_sum"
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorFixedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorFixedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorFixedSumAgg =
    copy(child = newChild)
}

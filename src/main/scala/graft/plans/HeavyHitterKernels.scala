package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** misra_gries(key, k) — the Misra–Gries frequent-elements summary
  * (Misra & Gries 1982), merged across partitions per the mergeable-
  * summaries construction (Agarwal et al. 2012): each partial buffer
  * holds at most k counters; a miss on a full buffer decrements every
  * counter (dropping zeros); merging sums counters pairwise, then
  * subtracts the (k+1)-th largest count and keeps the positives. The
  * classical guarantees survive the merge: every item with true
  * frequency > N/(k+1) is present, and every estimate is an
  * UNDER-count by at most the total decrement mass
  * (true − N/(k+1) ≤ est ≤ true). With k at or above the key
  * cardinality no decrement ever fires and the summary IS the exact
  * count table — the deterministic regime the oracle query pins;
  * under adversarial k the guarantee (not the exact counts) is the
  * contract, and HeavyHitterSpec pins that instead.
  *
  * Scale shape: bounded state (≤ k (string, long) entries per partial
  * buffer), map-side combine does nearly all the work, and the
  * shuffle carries #partitions fixed-size summaries — the heavy-hitter
  * complement to the CMS (frequency point-lookup), KMV (distinct /
  * overlap), and HLL (distinct) sketches in ops/Profiling.scala.
  *
  * NULL keys are skipped (SQL aggregate convention). Output:
  * array<struct<item string, est long>> sorted by (est desc, item) —
  * a VALUES summary, so the exact regime replays in any engine as
  * GROUP BY + ORDER BY.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536,
    s"misra_gries: k=$k outside [1, 65536] (the summary is broadcast-sized state)")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buffer: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val cur = buffer.get(key)
      if (cur != null) buffer.put(key, cur.longValue() + 1L)
      else if (buffer.size < k) buffer.put(key, 1L)
      else {
        // the classical all-decrement step; O(k) on a miss
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  /** Keep the k largest counters, subtracting the (k+1)-th largest
    * from each survivor (Agarwal et al. 2012 merge). */
  private def shrink(buffer: java.util.HashMap[String, Long]): Unit = {
    if (buffer.size <= k) return
    val counts = new Array[Long](buffer.size)
    var i = 0
    val vit = buffer.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val d = counts(buffer.size - k - 1) // (k+1)-th largest
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def merge(buffer: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey, (if (cur == null) 0L else cur.longValue()) + e.getValue)
    }
    shrink(buffer)
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    import scala.jdk.CollectionConverters._
    val sorted = buffer.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue, e.getKey))
    new GenericArrayData(sorted.map { e =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue)): Any
    })
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      SketchIO.writeStr(out, e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buffer = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { buffer.put(SketchIO.readStr(in), in.readLong()); i += 1 }
    buffer
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

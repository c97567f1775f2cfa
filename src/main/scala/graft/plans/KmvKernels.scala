package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** kmv_sketch(hashHex, k) — the k MINIMUM distinct values of a hash
  * column, as a sorted array<string>: the KMV distinct sketch
  * (Bar-Yossef et al. 2002; Beyer et al. 2007). The k smallest hashes
  * are a uniform sample of the distinct-key space, so from one tiny
  * sketch per corpus you read distinct-count estimates ((k−1)/frac of
  * the kth value) and, by merging two sketches, corpus OVERLAP
  * estimates — set arithmetic between 100 TB corpora without ever
  * joining them.
  *
  * Scale shape: bounded state (a ≤ k-entry sorted set per partial
  * buffer; k·33 bytes at md5 width), map-side combine does nearly all
  * the work, and the shuffle carries #partitions fixed-size sketches.
  * Min-k over distinct values is associative and commutative, so the
  * result is bit-identical under ANY partitioning — and, because the
  * sketch is VALUES (not bit positions), it replays in any engine as
  * `SELECT DISTINCT h ORDER BY h LIMIT k`.
  *
  * NULL hashes are skipped (SQL aggregate convention). Hash hex
  * strings compare identically as ASCII and as UTF8 binary, so the
  * ordering is engine-portable by construction.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536,
    s"kmv_sketch: k=$k outside [1, 65536] (the sketch is broadcast-sized state)")

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def addCapped(buffer: java.util.TreeSet[String], v: String): Unit = {
    // only insert when it would make the k-min set (avoids churning
    // the tree with values past the current kth minimum)
    if (buffer.size < k) { buffer.add(v); () }
    else if (v.compareTo(buffer.last()) < 0) {
      if (buffer.add(v)) buffer.pollLast()
      ()
    }
  }

  override def update(buffer: java.util.TreeSet[String],
                      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) addCapped(buffer, v.toString)
    buffer
  }

  override def merge(buffer: java.util.TreeSet[String],
                     other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) addCapped(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new StringBuilder
    val it = buffer.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes("UTF-8")
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buffer = new java.util.TreeSet[String]()
    val s = new String(bytes, "UTF-8")
    if (s.nonEmpty) s.split("\n").foreach(buffer.add)
    buffer
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

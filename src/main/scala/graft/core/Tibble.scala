package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** tibble construction helpers (reference:
  * /root/reference/datar_polars/tibble.py, api/tibble.py).
  * Literal frames are driver-side by nature (tiny); everything else
  * stays planar.
  */
object Tibble {

  private def sparkType(v: Any): DataType = v match {
    case _: Int     => IntegerType
    case _: Long    => LongType
    case _: Double  => DoubleType
    case _: Boolean => BooleanType
    case _: String  => StringType
    case null       => StringType
    case other      => throw new IllegalArgumentException(s"tibble: ${other.getClass}")
  }

  /** tibble(x = [...], y = [...]): column-vector construction. */
  def of(spark: SparkSession, cols: (String, Seq[Any])*): DataFrame = {
    require(cols.nonEmpty && cols.map(_._2.length).distinct.size == 1,
      "tibble: columns must have equal length")
    val schema = StructType(cols.map { case (n, vs) =>
      StructField(n, sparkType(vs.find(_ != null).orNull), nullable = true)
    })
    val rows = cols.head._2.indices.map(i => Row(cols.map(_._2(i)): _*))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** tribble: row-wise construction. */
  def tribble(spark: SparkSession, names: Seq[String], rows: Seq[Any]*): DataFrame = {
    val byCol = names.indices.map(i => names(i) -> rows.map(_(i)))
    of(spark, byCol: _*)
  }

  /** enframe: name/value pairs to a two-column frame. */
  def enframe(spark: SparkSession, m: Seq[(String, Any)],
              name: String = "name", value: String = "value"): DataFrame =
    of(spark, name -> m.map(_._1), value -> m.map(_._2))

  /** deframe: two-column frame to driver map (action). */
  def deframe(df: DataFrame): Map[String, Any] = {
    val Array(k, v) = df.columns
    df.collect().map(r => r.getAs[Any](k).toString -> r.getAs[Any](v)).toMap
  }

  def addRow(df: DataFrame, values: Map[String, Any]): DataFrame = {
    val spark = df.sparkSession
    val row = Row(df.schema.fieldNames.map(f => values.get(f).orNull).toIndexedSeq: _*)
    df.unionByName(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), df.schema))
  }

  def addColumn(df: DataFrame, name: String,
                value: org.apache.spark.sql.Column): DataFrame =
    df.withColumn(name, value)

  /** rowid_to_column over an explicit total order (Spark frames are
    * unordered; positional ids need a declared order). Scale-safe:
    * distributed range-partitioned sort, then per-partition offsets
    * via zipWithIndex — never a single-partition global window. */
  def rowidToColumn(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                    name: String = "rowid"): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.graftbridge.InternalRowBridge
    val sorted = if (order.nonEmpty) df.orderBy(order: _*) else df
    val schema = StructType(StructField(name, LongType, nullable = false) +: sorted.schema.fields)
    val dts = sorted.schema.fields.map(_.dataType)
    val width = dts.length
    // InternalRow end to end (the ScanFns.sortedInternal reasoning):
    // no external-Row round trip per row. copy() BEFORE zipWithIndex —
    // the sorter reuses row buffers, and the emitted rows' string
    // fields point into them.
    val rdd = InternalRowBridge.toInternalRdd(sorted).map(_.copy())
      .zipWithIndex().map { case (r, i) =>
        val out = new Array[Any](width + 1)
        out(0) = i + 1L
        var c = 0
        while (c < width) {
          out(c + 1) = if (r.isNullAt(c)) null else r.get(c, dts(c)); c += 1
        }
        new GenericInternalRow(out): InternalRow
      }
    InternalRowBridge.fromInternalRdd(sorted.sparkSession, rdd, schema)
  }

  // ---- rownames family (reference datar_polars/tibble.py) ---------------
  // R rownames map to a reserved string column: Spark frames carry no
  // implicit index, so the encoding makes the names an ordinary
  // distributed column — every verb below is a projection-only plan.
  val RownamesCol = "__rownames"
  def hasRownames(df: DataFrame): Boolean = df.columns.contains(RownamesCol)
  def removeRownames(df: DataFrame): DataFrame = df.drop(RownamesCol)
  /** set_rownames: install explicit rownames from any expression. */
  def setRownames(df: DataFrame, values: org.apache.spark.sql.Column): DataFrame =
    df.withColumn(RownamesCol, values.cast("string"))
  /** column_to_rownames: demote an existing column to the rownames. */
  def columnToRownames(df: DataFrame, name: String): DataFrame =
    df.withColumnRenamed(name, RownamesCol)
  /** rownames_to_column: promote rownames to a named column. A frame
    * WITHOUT rownames gets R's default "1".."n" — positional, so it
    * needs the same declared total order [[rowidToColumn]] does. */
  def rownamesToColumn(df: DataFrame, name: String = "rowname",
                       order: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame =
    if (hasRownames(df)) {
      // keep the reference's leading-column position
      val renamed = df.withColumnRenamed(RownamesCol, name)
      renamed.select((col(name) +: renamed.columns.filterNot(_ == name)
        .map(col).toSeq): _*)
    } else {
      require(order.nonEmpty,
        "rownames_to_column on a frame without rownames assigns " +
          "positional \"1\"..\"n\" names and needs a declared order")
      rowidToColumn(df, order, name)
        .withColumn(name, col(name).cast("string"))
    }
  /** set_colnames (magrittr/datar verb): positional rename. */
  def setColnames(df: DataFrame, names: Seq[String]): DataFrame = {
    require(names.length == df.columns.length,
      s"setColnames: ${names.length} names for ${df.columns.length} columns")
    df.toDF(names: _*)
  }
  /** tibble_row: a one-row tibble (every value scalar). */
  def tibbleRow(spark: SparkSession, values: (String, Any)*): DataFrame =
    of(spark, values.map { case (n, v) => n -> Seq(v) }: _*)
  /** as_tibble: a Spark DataFrame IS the tibble — identity, named for
    * surface parity with reference tibble.py. */
  def asTibble(df: DataFrame): DataFrame = df

  /** base::diag(n) — the n×n identity as a tibble (rowid, v1..vn).
    * Matrix verbs are small-frame by contract (like transpose); rows
    * still distribute via range. Ref: api/base/verbs.py (_diag_obj). */
  def diagMatrix(s: SparkSession, n: Int): DataFrame = {
    val base = s.range(1, n + 1L).withColumnRenamed("id", "rowid")
    (1 to n).foldLeft(base) { (d, j) =>
      d.withColumn(s"v$j", when(col("rowid") === j, 1).otherwise(0))
    }
  }
}

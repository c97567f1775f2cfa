package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge across Spark's InternalRow <-> external Row boundary for
  * graft's two-phase scan operators (graft.functions.ScanFns).
  *
  * `Dataset.rdd` deserializes every InternalRow into a boxed external
  * Row, and `createDataFrame(RDD[Row], schema)` re-serializes every
  * external Row back — so an RDD-level operator sandwiched between the
  * two pays BOTH conversions per row even when it only reads a couple
  * of double columns. This object exposes the conversion-free ends:
  * the computed plan's InternalRow RDD on the way out, and
  * `internalCreateDataFrame` on the way back in.
  *
  * Lives under `org.apache.spark.sql` because `internalCreateDataFrame`
  * is `private[sql]` — the same package-visibility technique Spark
  * datasource connectors used before DataSourceV2 exposed row-level
  * write APIs. The surface consumed here is two stable methods
  * (`queryExecution.toRdd`, `internalCreateDataFrame`), both unchanged
  * across Spark 3.x -> 4.x.
  *
  * CONTRACT for callers: `toInternalRdd` rows may be reused buffers —
  * `.copy()` before caching or collecting; rows handed to
  * `fromInternalRdd` must carry CATALYST values (UTF8String for
  * strings, micros-long for timestamps, Decimal for decimals) in
  * schema order, which is exactly what `InternalRow.get(i, dataType)`
  * on a copied row returns.
  */
object InternalRowBridge {

  /** The physical rows of a computed plan — no external-Row
    * deserialization. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** DataFrame over catalyst rows — no external-Row serialization. */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
                      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}

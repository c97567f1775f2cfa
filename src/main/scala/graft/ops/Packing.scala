package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ScanFns

/** GPT-style sequence packing (SURVEY §2.6): lay documents end-to-end
  * along a declared total order and cut the token stream into
  * fixed-length training sequences — documents cross pack boundaries,
  * exactly like causal-LM pretraining packs its corpus. The assignment
  * is pure arithmetic over the running token offset:
  *
  *   tok_start  = cumsum(tokens) - tokens        (0-based stream offset)
  *   pack_first = floor(tok_start / seqLen)
  *   pack_last  = floor((tok_start + tokens - 1) / seqLen)
  *
  * The running offset comes from the distributed two-phase prefix scan
  * (ScanFns.withCumsum — one range-partitioned sort, two streamed
  * passes, #partitions carry rows), so the whole corpus never meets a
  * single task and the operator's cost is one sort at 100 TB. Exact:
  * token counts are integers, summed in decimal.
  *
  * Reference surface: the datar reference has no packing op; this is a
  * graft pipeline extension alongside dedup/chunking.
  */
object Packing {

  /** Per-document pack assignment. Output columns: the input's, plus
    * `tok_start` (0-based offset of the doc's first token in the
    * packed stream), `pack_first`/`pack_last` (ids of the packs the
    * doc lands in), `n_packs` (how many packs it spans). Empty docs
    * (0 tokens) land in the pack at their offset, spanning 1. */
  def sequencePacking(df: DataFrame, tokenCol: Column, order: Seq[Column],
                      seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"sequence packing: seqLen must be >= 1 (got $seqLen)")
    val cum = ScanFns.withCumsum(df, tokenCol, order, "__cum_tok")
    cum
      .withColumn("__tok", coalesce(tokenCol.cast("double"), lit(0.0)))
      .withColumn("tok_start", (col("__cum_tok") - col("__tok")).cast("long"))
      .withColumn("pack_first", floor(col("tok_start") / seqLen).cast("long"))
      .withColumn("pack_last",
        floor((col("tok_start") + greatest(col("__tok"), lit(1.0)) - 1) / seqLen)
          .cast("long"))
      .withColumn("n_packs", col("pack_last") - col("pack_first") + 1L)
      .drop("__cum_tok", "__tok")
  }
}

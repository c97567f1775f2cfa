package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality contracts (the Deequ / dbt-tests layer): declarative
  * checks a pipeline runs BEFORE shipping a table — null guards,
  * key uniqueness, referential integrity, value ranges — each
  * reported as (check, violations, n_rows, pass) so a gate can fail
  * the run and an audit can read why.
  *
  * Scale shape: every single-frame check is ONE partial-aggregatable
  * agg over the table (all checks of a frame FUSE into a single scan
  * in [[runChecks]] — a 100 TB table is read once no matter how many
  * contracts it carries); uniqueness adds one keyed groupBy;
  * referential integrity is one anti-join probing the parent (the
  * [[BloomPrune]] recipe applies verbatim when the parent is huge).
  * Everything is exact counts — trivially engine-replayable.
  */
object Checks {

  /** One declared contract: a violation-count expression evaluated in
    * the shared scan. `violations` must be an AGGREGATE expression
    * counting offending rows. */
  final case class Check(name: String, violations: Column)

  /** Rows where any of `cols` is NULL. */
  def notNull(cols: String*): Check =
    Check(s"not_null(${cols.mkString(",")})",
      sum(when(cols.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L)))

  /** Rows outside [lo, hi] (NULLs are the not_null check's job). */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      sum(when(col(c).isNotNull &&
        (col(c) < lo || col(c) > hi), 1L).otherwise(0L)))

  /** Rows whose `c` fails the predicate (NULL predicate = violation —
    * a contract must decide every row). */
  def satisfies(name: String, pred: Column): Check =
    Check(name, sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)))

  /** Rows matching none of the allowed values. */
  def isIn(c: String, allowed: Seq[String]): Check =
    Check(s"is_in($c)",
      sum(when(col(c).isNull || !col(c).isin(allowed: _*), 1L).otherwise(0L)))

  /** Run every declared check in ONE aggregation scan of `df`.
    * Output: (check, violations, n_rows, pass) — one row per check. */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "runChecks: no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      s"runChecks: duplicate check names in ${checks.map(_.name)}")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations, lit(0L)).as(s"__v$i") } :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), col(s"__v$i").as("violations"),
        col("__n").as("n_rows"), (col(s"__v$i") === 0L).as("pass")) }
    row.select(explode(array(entries: _*)).as("e"))
      .select("e.check", "e.violations", "e.n_rows", "e.pass")
  }

  /** Attach the contracts to a frame as OBSERVED metrics (Spark's
    * `Dataset.observe`): the counts ride the job that materializes
    * the frame — a write pipeline gets its quality report for FREE,
    * no second scan, no extra action. Read the metrics from the
    * returned [[org.apache.spark.sql.Observation]] after the action
    * completes (`obs.get` blocks until then); keys are the check
    * names plus `n_rows`. The checks themselves are the same
    * aggregate expressions [[runChecks]] fuses — this is the
    * streaming-job/write-job deployment of the identical contracts. */
  def observeChecks(df: DataFrame, checks: Seq[Check]):
      (DataFrame, org.apache.spark.sql.Observation) = {
    require(checks.nonEmpty, "observeChecks: no checks declared")
    val obs = org.apache.spark.sql.Observation()
    val aggs = checks.map(c => coalesce(c.violations, lit(0L)).as(c.name)) :+
      count(lit(1)).as("n_rows")
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Schema drift between two frames (the contract a snapshot
    * pipeline checks BEFORE [[Snapshot.applyChanges]] — a changed
    * column type corrupts silently where a changed value at least
    * hashes differently): columns added, removed, or type-changed
    * from `before` to `after`. Plan-time metadata only — zero jobs,
    * zero scans. Output: (column, status ∈ added|removed|type_changed,
    * before_type, after_type), empty when schemas agree. */
  def schemaDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    val b = before.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val a = after.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val rows =
      (a.keySet -- b.keySet).toSeq.sorted.map(c =>
        (c, "added", null: String, a(c))) ++
      (b.keySet -- a.keySet).toSeq.sorted.map(c =>
        (c, "removed", b(c), null: String)) ++
      (b.keySet & a.keySet).toSeq.sorted.collect {
        case c if b(c) != a(c) => (c, "type_changed", b(c), a(c)) }
    rows.toDF("column", "status", "before_type", "after_type")
  }

  /** Key uniqueness: number of EXTRA rows beyond one per key (0 =
    * unique). One keyed partial-agg groupBy; NULL keys participate
    * (a null-keyed duplicate is still a duplicate). */
  def uniqueness(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "uniqueness: no key columns")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(lit(s"unique(${keys.mkString(",")})").as("check"),
        col("violations"), col("n_rows"), (col("violations") === 0L).as("pass"))
  }

  /** Referential integrity: child rows whose key has no parent (the
    * FK orphan count). NULL child keys are skipped (SQL FK
    * semantics); one anti-join — pre-prune with [[BloomPrune]] when
    * the parent side is corpus-sized. */
  def referential(child: DataFrame, key: String,
                  parent: DataFrame, pkey: String): DataFrame = {
    val orphans = child.filter(col(key).isNotNull)
      .join(parent.select(col(pkey).as("__pk")).distinct(),
        col(key) === col("__pk"), "left_anti")
    val tot = child.agg(count(lit(1)).as("n_rows"))
    orphans.agg(count(lit(1)).as("violations")).crossJoin(tot)
      .select(lit(s"referential($key->$pkey)").as("check"),
        col("violations"), col("n_rows"), (col("violations") === 0L).as("pass"))
  }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dplyr-grammar frame: an immutable wrapper around a Spark
  * DataFrame carrying the grammar's evaluation context — the active
  * grouping and the last `arrange` order (Spark plans are unordered;
  * dplyr verbs that consume "current row order" take it from here).
  *
  * Capability map (reference: /root/reference/datar_polars/api/dplyr):
  * every verb builds a single Catalyst plan; no collect, no RDDs.
  */
final class GraftFrame private (
    val df: DataFrame,
    val groups: Seq[String],
    val sortKeys: Seq[Column],
    val isRowwise: Boolean = false) {

  import GraftFrame._

  private def groupCols: Seq[Column] = groups.map(df.col)
  private def withDf(d: DataFrame): GraftFrame =
    new GraftFrame(d, groups, sortKeys, isRowwise)
  private def spark: SparkSession = df.sparkSession

  // ---- grouping (dplyr/group_by.py) -------------------------------------
  def groupBy(cols: String*): GraftFrame = new GraftFrame(df, cols.toSeq, sortKeys)
  def groupByAdd(cols: String*): GraftFrame =
    new GraftFrame(df, (groups ++ cols).distinct, sortKeys)
  def ungroup: GraftFrame = new GraftFrame(df, Nil, sortKeys)
  def groupVars: Seq[String] = groups

  /** dplyr rowwise(): a grouping MODE, not a grouping — subsequent
    * mutate/transmute reinterpret the aggregate vocabulary per row
    * over array-valued arguments (see [[cAcross]]); group_by and
    * ungroup both leave rowwise mode. Pure projection — no shuffle. */
  def rowwise(): GraftFrame = new GraftFrame(df, Nil, sortKeys, true)
  /** c_across: the selected columns as one array (double-cast), the
    * argument rowwise aggregates reduce over. */
  def cAcross(sel: Selector): Column =
    array(sel.resolve(df.schema).map(c => df.col(c).cast("double")): _*)

  /** group metadata — dplyr group_data family, computed as one agg. */
  def groupKeys: DataFrame =
    if (groups.isEmpty) df.sparkSession.emptyDataFrame
    else df.select(groups.map(df.col): _*).distinct().orderBy(groups.map(df.col): _*)
  def nGroups: Long = if (groups.isEmpty) 1L else groupKeys.count()
  def groupSize: DataFrame =
    df.groupBy(groupCols: _*).agg(count(lit(1)).as("size"))
  /** dplyr group_rows / cur_group_rows under a DECLARED total order:
    * the 1-based row positions (by `order`) belonging to each group,
    * as a sorted array per group plus the group size. Row positions
    * are undefined over an unordered distributed frame (SURVEY §1
    * relaxation), so the order is an explicit argument; they come from
    * the scale-safe range-partitioned sort + zipWithIndex — never a
    * single-partition window. Output is group-count-sized (group_rows'
    * own contract), so the per-group index list is a plain
    * collect_list aggregate. */
  def groupRows(order: Seq[Column]): DataFrame = {
    require(groups.nonEmpty, "group_rows: no active groups")
    require(order.nonEmpty,
      "group_rows: row positions need a declared total order (SURVEY §1)")
    Tibble.rowidToColumn(df, order, "__row")
      .groupBy(groups.map(col): _*)
      .agg(sort_array(collect_list(col("__row"))).as("rows"),
        count(lit(1)).as("size"))
  }

  /** group_by_drop_default (reference api/dplyr/group_by.py): Spark
    * groups are data-derived, so unused factor levels never produce
    * rows — the drop default is TRUE and not configurable here; keep
    * empty levels explicitly via Tidyr.complete over a level table. */
  def groupByDropDefault: Boolean = true

  /** cur_group(): the current group's key values as one struct column
    * (reference api/dplyr/context.py:cur_group returns a 1-row frame;
    * a struct is the Spark-native shape — getField unpacks it). */
  def curGroup: Column = {
    require(groups.nonEmpty, "cur_group: no active groups")
    struct(groups.map(df.col): _*)
  }

  /** cur_data(): the current group's rows (selected non-group columns)
    * as an array<struct> column — the frame-valued expression context
    * of reference api/dplyr/context.py:cur_data, realized under the
    * SURVEY §1 relaxation. Returned as a plain collect_list aggregate,
    * so inside a grouped [[mutate]] the WindowRewrite wraps it over
    * the group partition and it SHARES the verb's single shuffle with
    * every other aggregate. Element order is partition-arrival order
    * (Spark frames are unordered): derive order-free values from it
    * (size, array_max, exact-decimal aggregate()) or sort_array it;
    * whole-group computation with a declared order belongs in
    * groupModify/flatMapGroups, and positional indices in
    * [[groupRows]].
    *
    * SCALE WARNING — inherent to cur_data's semantics, not this
    * implementation: every row carries its whole group as an array, so
    * per-group state is O(|group|²). Fine for the accessor's intended
    * regime (small-to-moderate groups, dplyr-style); for large groups
    * express the computation as a direct window aggregate (mutate's
    * auto-rewrite) or groupModify, which stream the group once. */
  def curData(sel: Selector): Column = {
    require(groups.nonEmpty, "cur_data: no active groups")
    val cols = sel.resolve(df.schema).filterNot(groups.contains)
    require(cols.nonEmpty, "cur_data: selection resolves to no non-group columns")
    collect_list(struct(cols.map(df.col): _*))
  }

  /** cur_data_all(): [[curData]] over every non-group column. */
  def curDataAll: Column = curData(TidySelect.everything)

  /** dense integer id per group, ordered by group key (cur_group_id).
    * Scale-safe: rank the distinct-key table via the range-partitioned
    * sort + zipWithIndex rowid (keys are distinct, so rowid == dense
    * rank — no unpartitioned window even over the key table), then
    * broadcast-join ids back. */
  def withGroupId(name: String = "group_id"): GraftFrame = {
    val keyTable = Tibble.rowidToColumn(
      df.select(groupCols: _*).distinct(), groups.map(col(_).asc), "__gid")
      .withColumn(name, (col("__gid") - 1L).cast("int")).drop("__gid")
    // null-safe join: a NULL group key is a legitimate dplyr group and
    // must receive an id, so <=> rather than a using-columns join
    val kt = keyTable.select(
      groups.map(g => col(g).as(s"__k_$g")) :+ col(name): _*)
    val cond = groups.map(g => df(g) <=> kt(s"__k_$g")).reduce(_ && _)
    withDf(df.join(broadcast(kt), cond, "left")
      .drop(groups.map(g => s"__k_$g"): _*))
  }

  // ---- select / rename / relocate (select.py, rename.py, relocate.py) ---
  def select(sel: Selector): GraftFrame = {
    val names = sel.resolve(df.schema)
    // dplyr keeps group columns even when not selected
    val keep = groups.filterNot(names.contains) ++ names
    new GraftFrame(df.select(keep.map(df.col): _*), groups, sortKeys)
  }
  def select(first: String, rest: String*): GraftFrame =
    select(TidySelect.cols(first +: rest: _*))

  /** dplyr rename(new = old). */
  def rename(pairs: (String, String)*): GraftFrame = {
    val m = pairs.map { case (nw, old) => old -> nw }.toMap
    val renamed = df.columns.foldLeft(df)((d, c) =>
      m.get(c).fold(d)(nw => d.withColumnRenamed(c, nw)))
    new GraftFrame(renamed, groups.map(g => m.getOrElse(g, g)), sortKeys)
  }
  def renameWith(f: String => String, sel: Selector = TidySelect.everything): GraftFrame = {
    val targets = sel.resolve(df.schema).toSet
    val renamed = df.columns.foldLeft(df)((d, c) =>
      if (targets(c)) d.withColumnRenamed(c, f(c)) else d)
    new GraftFrame(renamed, groups.map(g => if (targets(g)) f(g) else g), sortKeys)
  }

  def relocate(sel: Selector, before: Option[String] = None,
               after: Option[String] = None): GraftFrame = {
    val moved = sel.resolve(df.schema)
    val rest = df.columns.toSeq.filterNot(moved.contains)
    val anchorIdx = (before, after) match {
      case (Some(b), _) => rest.indexOf(b)
      case (_, Some(a)) => rest.indexOf(a) + 1
      case _            => 0
    }
    val (pre, post) = rest.splitAt(anchorIdx)
    withDf(df.select((pre ++ moved ++ post).map(df.col): _*))
  }

  // ---- mutate / transmute (mutate.py) ------------------------------------
  /** Grouped frames: aggregate calls become per-group window aggs
    * (one shared shuffle — see WindowRewrite). Later expressions may
    * reference columns created earlier in the same call (dplyr
    * semantics: mutate(b = a+1, c = b*2)) — earlier definitions are
    * SUBSTITUTED into later trees at build time, so the whole verb is
    * still ONE projection and grouped windows collapse into a single
    * Window operator (one shuffle). */
  def mutate(cols: (String, Column)*): GraftFrame = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
    val groupColsByName = groups.map(col)
    // UNGROUPED frames still honor dplyr's aggregate semantics —
    // mutate(share = x / sum(x)) divides by the GRAND total: bare
    // aggregates are extracted, computed in ONE whole-frame agg, and
    // broadcast-cross-joined back (1 row), never a global window
    val extractor =
      if (groups.isEmpty && !isRowwise) Some(WindowRewrite.aggExtractor()) else None
    val (_, out) = cols.foldLeft((Map.empty[String, Column], Vector.empty[(String, Column)])) {
      case ((defs, acc), (n, c)) =>
        val sub = CB.substitute(c, defs)
        val rewritten =
          if (isRowwise) WindowRewrite.perRow(sub)
          else if (groups.nonEmpty) WindowRewrite.overGroups(sub, groupColsByName)
          else extractor.get.extract(sub)
        // only NEW names participate in later substitution: redefining an
        // existing column shadows it for later exprs too (dplyr), which
        // the substitution also covers
        (defs + (n -> sub), acc :+ (n -> rewritten))
    }
    val base = extractor match {
      case Some(ex) if ex.aggs.nonEmpty =>
        val aggCols = ex.aggs.map { case (name, a) => a.as(name) }
        df.crossJoin(broadcast(df.agg(aggCols.head, aggCols.tail: _*)))
      case _ => df
    }
    val withNew = base.withColumns(out.toMap)
    withDf(extractor.fold(withNew)(ex => withNew.drop(ex.names: _*)))
  }
  def transmute(cols: (String, Column)*): GraftFrame = {
    val m = mutate(cols: _*).df
    val keep = (groups ++ cols.map(_._1)).distinct
    new GraftFrame(m.select(keep.map(m.col): _*), groups, sortKeys)
  }

  /** across: apply named functions to every selected column
    * (dplyr/across.py). Produces `col_fn` columns. */
  def across(sel: Selector, fns: Seq[(String, Column => Column)],
             nameGlue: (String, String) => String = (c, f) => s"${c}_$f"): GraftFrame = {
    val targets = sel.resolve(df.schema)
    val cols = for (c <- targets; (fn, f) <- fns) yield nameGlue(c, fn) -> f(df.col(c))
    mutate(cols: _*)
  }
  /** across with dplyr's cur_column() accessor: the per-column lambda
    * receives the CURRENT column's NAME alongside its Column
    * (reference api/dplyr/across.py) — name-dependent transforms
    * (per-column lookup tables, name-keyed scaling) without a closure
    * over external state. */
  def acrossCur(sel: Selector, fns: Seq[(String, (String, Column) => Column)],
                nameGlue: (String, String) => String = (c, f) => s"${c}_$f"): GraftFrame = {
    val targets = sel.resolve(df.schema)
    val cols = for (c <- targets; (fn, f) <- fns)
      yield nameGlue(c, fn) -> f(c, df.col(c))
    mutate(cols: _*)
  }
  /** summarise flavor of across: aggregates per selected column. */
  def acrossSummarise(sel: Selector, fns: Seq[(String, Column => Column)],
                      nameGlue: (String, String) => String = (c, f) => s"${c}_$f"): GraftFrame = {
    val targets = sel.resolve(df.schema)
    val aggs = for (c <- targets; (fn, f) <- fns) yield nameGlue(c, fn) -> f(df.col(c))
    summarise(aggs: _*)
  }
  def ifAny(sel: Selector, p: Column => Column): Column =
    sel.resolve(df.schema).map(c => coalesce(p(df.col(c)), lit(false))).reduce(_ || _)
  def ifAll(sel: Selector, p: Column => Column): Column =
    sel.resolve(df.schema).map(c => coalesce(p(df.col(c)), lit(false))).reduce(_ && _)

  // ---- filter (filter_.py) ----------------------------------------------
  /** Grouped frames may use aggregate predicates, e.g.
    * filter(x == max(x)) keeps per-group maxima; UNGROUPED frames
    * compare against the whole-frame aggregate (dplyr
    * filter(x > mean(x))) via one agg + broadcast join — never a
    * single-partition window. */
  def filterRows(preds: Column*): GraftFrame = {
    val combined = preds.reduce(_ && _)
    if (groups.nonEmpty && WindowRewrite.hasAgg(combined)) {
      // window expressions are not allowed in WHERE: materialize the
      // rewritten predicate as a column first (Catalyst prunes it)
      val p = WindowRewrite.overGroups(combined, groupCols)
      withDf(df.withColumn("__graft_p", p).filter(col("__graft_p")).drop("__graft_p"))
    } else if (groups.isEmpty && !isRowwise && WindowRewrite.hasAgg(combined)) {
      val ex = WindowRewrite.aggExtractor()
      val p = ex.extract(combined)
      val aggCols = ex.aggs.map { case (name, a) => a.as(name) }
      withDf(df.crossJoin(broadcast(df.agg(aggCols.head, aggCols.tail: _*)))
        .filter(p).drop(ex.names: _*))
    } else withDf(df.filter(combined))
  }

  // ---- arrange (arrange.py) ---------------------------------------------
  /** dplyr/R semantics: NAs sort LAST regardless of direction (Spark's
    * default is nulls-first for ascending) — each key is normalized to
    * its nulls-last variant unless the caller set an explicit null
    * ordering. */
  def arrange(keys: Column*): GraftFrame = {
    val normalized = keys.map(nullsLast)
    val effective = if (groups.nonEmpty) groupCols ++ normalized else normalized
    new GraftFrame(df.orderBy(effective: _*), groups, normalized)
  }

  // ---- distinct (distinct.py) -------------------------------------------
  def distinctRows(cols: String*): GraftFrame = distinctRows(cols.toSeq, keepAll = false)
  def distinctRows(cols: Seq[String], keepAll: Boolean): GraftFrame = {
    val keys = (groups ++ cols).distinct
    if (keys.isEmpty) withDf(df.distinct())
    else if (!keepAll) withDf(df.select(keys.map(df.col): _*).distinct())
    else { // keep first full row per key (any deterministic representative)
      val w = Window.partitionBy(keys.map(df.col): _*)
        .orderBy(df.columns.filterNot(keys.contains).map(df.col).toSeq: _*)
      withDf(df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn"))
    }
  }

  // ---- summarise / reframe (summarise.py, reframe.py) -------------------
  /** Aggregates; result keeps all but the last grouping level
    * (dplyr's default `.groups="drop_last"`). */
  def summarise(aggs: (String, Column)*): GraftFrame = {
    val exprs = aggs.map { case (n, c) => c.as(n) }
    val out =
      if (groups.isEmpty) df.agg(exprs.head, exprs.tail: _*)
      else df.groupBy(groupCols: _*).agg(exprs.head, exprs.tail: _*)
    new GraftFrame(out, groups.dropRight(1), Nil)
  }
  /** summarise over ROLLUP grouping sets: the per-group rows PLUS
    * every prefix-subtotal level and the grand total from ONE
    * shuffle (Catalyst Expand replicates each input row once per
    * level before the partial agg — map-side combine still collapses
    * per level, so the shuffle carries |levels|·|groups| partials,
    * never raw rows; at 100 TB this beats re-aggregating per level
    * by the full re-scan count). `grouping_lvl` holds the bitmask of
    * rolled-up keys (first group key = MSB, dplyr-order), so a NULL
    * group VALUE (lvl 0) is distinguishable from a subtotal row.
    * The reference has no grouping-sets verb (summarise.py is
    * per-group only); this is the warehouse-native extension —
    * lvl-0 rows match `summarise` exactly. */
  def summariseRollup(aggs: (String, Column)*): GraftFrame = {
    require(groups.nonEmpty, "summariseRollup: declare grouping keys first")
    val lvl = groups.map(g => grouping(col(g)).cast("int"))
      .reduce((a, b) => a * 2 + b)
    val exprs = aggs.map { case (n, c) => c.as(n) } :+ lvl.as("grouping_lvl")
    new GraftFrame(
      df.rollup(groupCols: _*).agg(exprs.head, exprs.tail: _*), Nil, Nil)
  }

  /** group_by(.drop=FALSE) + summarise over a FACTOR grouping column:
    * levels declared in the level table but absent from the data still
    * produce a group row (reference api/dplyr/group_by.py:29,51 stores
    * the `_drop` flag; dplyr's .drop=FALSE contract — the polars
    * backend itself never materializes the empty groups, so graft
    * EXCEEDS the reference here). The fact-row aggregate runs exactly
    * like [[summarise]] (one shuffle, map-side combine); the
    * |levels|-sized table then FULL-outer-joins the result, so
    * empty-level rows cost |levels| work, never a second corpus
    * pass — and observed-but-undeclared group values survive too
    * (dplyr's .drop=FALSE never drops an observed group).
    * `fills` patches aggregates that have a defined value over an
    * empty group (R: n() and sum() are 0); everything else stays NULL
    * (R's NA — e.g. mean of an empty group).
    *
    * One grouping column by design: .drop applies per-factor, and the
    * level table IS that factor's metadata (Forcats convention: a
    * column named like the factor, e.g. from levelsInseq/fctExpand). */
  def summariseKeepEmpty(levels: DataFrame, fills: Map[String, Column],
                         aggs: (String, Column)*): GraftFrame = {
    require(groups.length == 1,
      "summariseKeepEmpty: .drop=FALSE grouping is per-factor — exactly one group column")
    val g = groups.head
    require(levels.columns.contains(g),
      s"summariseKeepEmpty: level table must carry the factor column '$g' " +
        s"(got ${levels.columns.mkString(", ")})")
    val exprs = aggs.map { case (n, c) => c.as(n) }
    val agged = df.groupBy(groupCols: _*).agg(exprs.head, exprs.tail: _*)
    // FULL outer, not levels-left: dplyr's .drop=FALSE never loses an
    // OBSERVED group — a data value outside the declared levels keeps
    // its row (R shows it as the NA level; here it keeps its value).
    // Scale: agged is already hash-partitioned on g by the groupBy
    // (Catalyst reuses that Exchange), the levels side is |levels|
    // rows — the outer join costs one tiny-side shuffle, never a
    // second corpus pass. (Broadcast can't drive a full-outer join.)
    val joined = levels.select(col(g)).distinct()
      .join(agged, Seq(g), "full_outer")
    val filled = fills.foldLeft(joined) { case (d, (n, f)) =>
      d.withColumn(n, coalesce(col(n), f)) }
    new GraftFrame(filled, Nil, Nil)
  }

  /** reframe: like summarise but aggregates may be array-valued and are
    * exploded back to multiple rows per group. */
  def reframe(aggs: (String, Column)*): GraftFrame = {
    val s = summarise(aggs: _*).df
    val arrayCols = s.schema.fields.filter(_.dataType.typeName == "array").map(_.name)
    val exploded = arrayCols.foldLeft(s)((d, c) => d.withColumn(c, explode(col(c))))
    new GraftFrame(exploded, groups.dropRight(1), Nil)
  }

  // ---- count / tally (count.py) -----------------------------------------
  def countBy(cols: String*): GraftFrame = {
    val keys = (groups ++ cols).distinct
    val out = if (keys.isEmpty) df.agg(count(lit(1)).as("n"))
              else df.groupBy(keys.map(df.col): _*).agg(count(lit(1)).as("n"))
    new GraftFrame(out, groups, Nil)
  }
  def tally(wt: Option[Column] = None): GraftFrame = {
    val agg = wt.fold(count(lit(1)))(w => sum(w)).as("n")
    val out = if (groups.isEmpty) df.agg(agg) else df.groupBy(groupCols: _*).agg(agg)
    new GraftFrame(out, Nil, Nil)
  }
  def addCount(cols: String*): GraftFrame = {
    val keys = (groups ++ cols).distinct
    withDf(df.withColumn("n", count(lit(1)).over(Window.partitionBy(keys.map(df.col): _*))))
  }
  def addTally(wt: Option[Column] = None): GraftFrame = {
    val w = Window.partitionBy(groupCols: _*)
    withDf(df.withColumn("n", wt.fold(count(lit(1)).over(w))(x => sum(x).over(w))))
  }

  // ---- slice family (slice_.py) -----------------------------------------
  private def orderedWindow(keys: Seq[Column]) = {
    val w = Window.partitionBy(groupCols: _*)
    if (keys.nonEmpty) w.orderBy(keys: _*) else w.orderBy(lit(1))
  }
  private def sliceByRank(keys: Seq[Column], n: Int, withTies: Boolean): GraftFrame = {
    val rk = if (withTies) rank() else row_number()
    withDf(df.withColumn("__rk", rk.over(orderedWindow(keys)))
      .filter(col("__rk") <= n).drop("__rk"))
  }
  def sliceHead(n: Int): GraftFrame =
    if (groups.isEmpty && sortKeys.nonEmpty)
      // sort+limit → TakeOrderedAndProject: distributed top-k, no
      // single-partition window
      withDf(df.orderBy(sortKeys: _*).limit(n))
    else if (groups.isEmpty) withDf(df.limit(n))
    else sliceByRank(sortKeys, n, withTies = false)
  def sliceTail(n: Int): GraftFrame = {
    val rev = (if (sortKeys.nonEmpty) sortKeys else Seq(lit(1).asc)).map(k => reverseOrder(k))
    if (groups.isEmpty && sortKeys.nonEmpty) withDf(df.orderBy(rev: _*).limit(n))
    else if (groups.isEmpty)
      // no declared order: "last n" of an unordered distributed frame
      // is any n rows (SURVEY §1 order-insensitivity) — a plain limit,
      // never a single-partition window over lit(1)
      withDf(df.limit(n))
    else sliceByRank(rev, n, withTies = false)
  }
  def sliceMin(c: Column, n: Int = 1, withTies: Boolean = true): GraftFrame =
    if (groups.isEmpty && !withTies) withDf(df.orderBy(c.asc).limit(n))
    else if (groups.isEmpty) ungroupedTiedSlice(c, n, desc = false)
    else sliceByRank(Seq(c.asc), n, withTies)
  def sliceMax(c: Column, n: Int = 1, withTies: Boolean = true): GraftFrame =
    if (groups.isEmpty && !withTies) withDf(df.orderBy(c.desc).limit(n))
    else if (groups.isEmpty) ungroupedTiedSlice(c, n, desc = true)
    else sliceByRank(Seq(c.desc), n, withTies)

  /** Ungrouped TIED slice_min/max without a single-partition window:
    * rank(v) <= n is equivalent to `v <= v_(n)` (the n-th order
    * statistic), because rank(v) = #{w < v} + 1. So: distributed
    * top-n (sort+limit → TakeOrderedAndProject), 1-row agg for the
    * threshold, broadcast it back as a plain filter. Null handling
    * mirrors the window form exactly: asc = NULLS FIRST (all nulls
    * tie at rank 1 → always kept by slice_min); desc = NULLS LAST
    * (kept only when fewer than n non-null rows exist, tracked by
    * `__nn` = non-null count within the top n). */
  private def ungroupedTiedSlice(c: Column, n: Int, desc: Boolean): GraftFrame = {
    val ordered = df.select(c.as("__v"))
      .orderBy(if (desc) col("__v").desc else col("__v").asc).limit(n)
    val thr =
      if (desc) ordered.agg(min(col("__v")).as("__kth"), count(col("__v")).as("__nn"))
      else ordered.agg(max(col("__v")).as("__kth"), count(col("__v")).as("__nn"))
    val keep =
      if (desc) (c.isNull && col("__nn") < n) || (c >= col("__kth"))
      else c.isNull || (c <= col("__kth"))
    withDf(df.crossJoin(broadcast(thr)).filter(keep).drop("__kth", "__nn"))
  }
  /** Seeded per-group sample of n rows: deterministic rand-ranked.
    * `rand(seed)` depends on the engine's PRNG and partition layout —
    * reproducible within Spark, but not across engines; prefer the
    * keyed overload when a stable row id exists. */
  def sliceSample(n: Int, seed: Long = 42L): GraftFrame =
    // ungrouped: first-n in rand order ≡ the rank path, but lowers to
    // a distributed TakeOrdered instead of a single-partition window
    if (groups.isEmpty) withDf(df.orderBy(rand(seed).asc).limit(n))
    else sliceByRank(Seq(rand(seed).asc), n, withTies = false)

  /** Engine-portable seeded sample: ranks rows by md5(seed ++ key) —
    * any SQL engine reproduces the exact same sample from the same
    * seed and key (same topology as the rand form: one window
    * shuffle). `key` must be a stable per-row id; a NULL key is hashed
    * via a sentinel and tie-broken NULLS LAST, because a null hash
    * would sort NULLS FIRST in Spark but NULLS LAST in DuckDB and the
    * 'portable' sample would silently diverge cross-engine. */
  def sliceSample(n: Int, seed: Long, key: Column): GraftFrame = {
    val ord = Seq(
      md5(concat(lit(seed.toString),
        coalesce(key.cast("string"), lit("\u0000<null-key>")))).asc,
      key.asc_nulls_last)
    // ungrouped: distributed TakeOrdered, not a single-partition window
    if (groups.isEmpty) withDf(df.orderBy(ord: _*).limit(n))
    else sliceByRank(ord, n, withTies = false)
  }

  /** slice_sample(n, weight_by=) — reference slice_.py:204 DECLARES
    * weight_by and the polars backend silently drops it (`df.sample`
    * takes no weights), so graft exceeds the reference here. Weighted
    * draw WITHOUT replacement via Efraimidis–Spirakis A-Res: row key
    * -ln(u)/w with u = md5Unif(seed‖id); the n smallest keys per group
    * (whole frame when ungrouped) are the sample. ln is transcendental
    * — a 1-ulp libm disagreement across engines could flip an
    * ordering — so the key is QUANTIZED to the 2^-40 grid (exact
    * integer floor; a flip now needs the true value within 1e-9 of a
    * grid line) with the id as total-order tiebreak: deterministic
    * AND oracle-replayable. Zero/negative/NULL weights are never
    * drawn (R's sample() contract). Same topology as [[sliceSample]]:
    * distributed TakeOrdered ungrouped, one partitioned window
    * grouped — no global window either way. */
  def sliceSampleWeighted(n: Int, seed: Long, key: Column,
                          weight: Column): GraftFrame = {
    require(n >= 1, s"slice_sample: n must be >= 1 (got $n)")
    val u = graft.functions.BaseFns.md5Unif(key, seed)
    val w = weight.cast("double")
    val es = when(u === 0.0, lit(Long.MaxValue)) // -ln(0) = inf: draw last
      .otherwise(floor(least(-log(u) / w * lit(1099511627776.0),
        lit(4.6e18))).cast("long"))
    val ord = Seq(es.asc, key.asc_nulls_last)
    val pos = df.filter(coalesce(w, lit(0.0)) > 0.0)
    if (groups.isEmpty) withDf(pos.orderBy(ord: _*).limit(n))
    else new GraftFrame(pos, groups, sortKeys, isRowwise)
      .sliceByRank(ord, n, withTies = false)
  }

  /** slice_sample(n, replace = TRUE) — reference slice_.py:205. n
    * INDEPENDENT uniform draws per group (whole frame when ungrouped):
    * one source row may appear multiple times, so the output carries a
    * `draw_id` column (1..n). Deterministic AND engine-portable: draw
    * i addresses rank floor(md5Unif(seed, group‖i) · N) + 1 under the
    * declared `order`, so the oracle replays the exact sample.
    *
    * Topology: rows rank once (ungrouped: distributed rowid; grouped:
    * one partitioned window), the draw table is |groups|·n rows built
    * from the group sizes, and the sample is a hash join of draws to
    * ranks — no global window, no row replication beyond the n output
    * rows per group. */
  def sliceSampleReplace(n: Int, seed: Long, order: Seq[Column]): GraftFrame = {
    require(n >= 1, s"slice_sample: n must be >= 1 (got $n)")
    require(order.nonEmpty,
      "with-replacement draws address rows by position: declare a total order")
    import graft.functions.BaseFns
    require(!df.columns.contains("draw_id"), "slice_sample: reserved column draw_id")
    if (groups.isEmpty) {
      val ranked = Tibble.rowidToColumn(df, order, "__sr")
      val total = df.agg(count(lit(1)).cast("double").as("__N"))
      val draws = spark.range(1, n + 1).toDF("draw_id")
        .crossJoin(broadcast(total))
        .select(col("draw_id"),
          (floor(BaseFns.md5Unif(col("draw_id"), seed) * col("__N")) + 1).as("__sr"))
      withDf(ranked.join(broadcast(draws), Seq("__sr")).drop("__sr"))
    } else {
      val w = Window.partitionBy(groupCols: _*).orderBy(order: _*)
      val ranked = df.withColumn("__sr", row_number().over(w).cast("long"))
      val sizes = df.groupBy(groupCols: _*).agg(count(lit(1)).cast("double").as("__N"))
      // draw-key parts joined with the \u0001 separator AND nulls made
      // explicit: concat_ws silently drops NULL parts, so without the
      // sentinel (g1=NULL, g2="x") and (g1="x", g2=NULL) would share a
      // draw sequence, breaking the n-INDEPENDENT-draws-per-group claim
      val drawKey = concat_ws("\u0001",
        (groups.map(g => coalesce(col(g).cast("string"), lit("\u0000<null-key>")))
          :+ col("draw_id").cast("string")): _*)
      val draws = sizes.crossJoin(spark.range(1, n + 1).toDF("draw_id"))
        .select(groups.map(col) ++ Seq(col("draw_id"),
          (floor(BaseFns.md5Unif(drawKey, seed) * col("__N")) + 1).as("__sr")): _*)
      // null-safe join back (withGroupId's <=> recipe): a NULL group
      // key is a legitimate dplyr group and must receive its n draws,
      // which a using-columns join would silently drop
      val dt = draws.select(
        groups.map(g => col(g).as(s"__k_$g")) ++
          Seq(col("draw_id"), col("__sr")): _*)
      val cond = groups.map(g => ranked(g) <=> dt(s"__k_$g")).reduce(_ && _) &&
        ranked("__sr") === dt("__sr")
      withDf(ranked.join(dt, cond)
        .drop(ranked("__sr")).drop(dt("__sr"))
        .drop(groups.map(g => s"__k_$g"): _*))
    }
  }

  /** prop variants (dplyr slice_head(prop=)): keep floor(prop*n) rows
    * per group — n from a count window over the same partitioning, so
    * still one shuffle. GROUPED path only (the window partitions by
    * the group keys); ungrouped calls route to [[ungroupedProp]]. */
  private def sliceByRankProp(keys: Seq[Column], prop: Double,
                              withTies: Boolean): GraftFrame = {
    if (groups.isEmpty) throw new IllegalStateException(
      "sliceByRankProp: ungrouped prop slices must use ungroupedProp")
    val rk = if (withTies) rank() else row_number()
    val cnt = count(lit(1)).over(Window.partitionBy(groupCols: _*))
    withDf(df.withColumn("__rk", rk.over(orderedWindow(keys)))
      .withColumn("__n", cnt)
      .filter(col("__rk") <= floor(col("__n") * prop))
      .drop("__rk", "__n"))
  }
  /** Ungrouped prop slice without a single-partition window: global
    * row positions from a range-partitioned sort + zipWithIndex
    * (Tibble.rowidToColumn), tie-ranks (when `tieKey` is set) from a
    * window partitioned BY VALUE, and the total row count from a
    * broadcast 1-row aggregate — no stage ever sees the whole frame
    * on one task. */
  private def ungroupedProp(keys: Seq[Column], prop: Double,
                            withTies: Boolean, tieKey: Option[Column]): GraftFrame = {
    val order = if (keys.nonEmpty) keys else Seq(lit(1).asc)
    val rn = Tibble.rowidToColumn(df, order, "__rk0")
    val ranked = tieKey match {
      case Some(tk) if withTies =>
        rn.withColumn("__rk", min(col("__rk0")).over(Window.partitionBy(tk)))
      case _ => rn.withColumn("__rk", col("__rk0"))
    }
    val cnt = df.agg(count(lit(1)).as("__n"))
    withDf(ranked.crossJoin(broadcast(cnt))
      .filter(col("__rk") <= floor(col("__n") * prop))
      .drop("__rk0", "__rk", "__n"))
  }
  def sliceHeadProp(prop: Double): GraftFrame =
    if (groups.isEmpty) ungroupedProp(sortKeys, prop, withTies = false, None)
    else sliceByRankProp(sortKeys, prop, withTies = false)
  def sliceTailProp(prop: Double): GraftFrame = {
    val rev = (if (sortKeys.nonEmpty) sortKeys else Seq(lit(1).asc)).map(reverseOrder)
    if (groups.isEmpty) ungroupedProp(rev, prop, withTies = false, None)
    else sliceByRankProp(rev, prop, withTies = false)
  }
  def sliceMinProp(c: Column, prop: Double, withTies: Boolean = true): GraftFrame =
    if (groups.isEmpty) ungroupedProp(Seq(c.asc), prop, withTies, Some(c))
    else sliceByRankProp(Seq(c.asc), prop, withTies)
  def sliceMaxProp(c: Column, prop: Double, withTies: Boolean = true): GraftFrame =
    if (groups.isEmpty) ungroupedProp(Seq(c.desc), prop, withTies, Some(c))
    else sliceByRankProp(Seq(c.desc), prop, withTies)
  def sliceSampleProp(prop: Double, seed: Long = 42L): GraftFrame =
    if (groups.isEmpty) ungroupedProp(Seq(rand(seed).asc), prop, withTies = false, None)
    else sliceByRankProp(Seq(rand(seed).asc), prop, withTies = false)
  /** slice(i1, i2, …): arbitrary 1-based row indices per group along
    * the current arrange order (dplyr slice_.py's base verb). All-
    * negative indices drop those rows. Grouped: one window per
    * partitioning; ungrouped: global positions via the scale-safe
    * sorted-zipWithIndex rowid (never a single-partition window). */
  def sliceAt(indices: Seq[Int]): GraftFrame = {
    require(indices.nonEmpty, "slice: no indices")
    def keep(rn: Column) =
      if (indices.forall(_ > 0)) rn.isin(indices: _*)
      else if (indices.forall(_ < 0)) !rn.isin(indices.map(-_): _*)
      else throw new IllegalArgumentException("slice: mixed positive/negative indices")
    if (groups.isEmpty) {
      val order = if (sortKeys.nonEmpty) sortKeys else Seq(lit(1).asc)
      withDf(Tibble.rowidToColumn(df, order, "__rn")
        .filter(keep(col("__rn"))).drop("__rn"))
    } else
      withDf(df.withColumn("__rn", row_number().over(orderedWindow(sortKeys)))
        .filter(keep(col("__rn"))).drop("__rn"))
  }

  // ---- joins (join.py) ---------------------------------------------------
  /** dplyr-suffix joins on shared key names; `broadcastRight` hints the
    * dimension side for a shuffle-free map-side join (the default for
    * the TPC-H dims at any scale — Catalyst still falls back if the
    * side exceeds the broadcast threshold with AQE on).
    */
  private def joined(other: GraftFrame, by: Seq[String], how: String,
                     suffix: (String, String), broadcastRight: Boolean): GraftFrame = {
    val l = df
    val overlap = (l.columns.toSet & other.df.columns.toSet) -- by.toSet
    val r0 = overlap.foldLeft(other.df)((d, c) => d.withColumnRenamed(c, c + suffix._2))
    val l0 = overlap.foldLeft(l)((d, c) => d.withColumnRenamed(c, c + suffix._1))
    val r = if (broadcastRight) broadcast(r0) else r0
    new GraftFrame(l0.join(r, by, how), groups, Nil)
  }
  def innerJoin(o: GraftFrame, by: Seq[String], suffix: (String, String) = ("_x", "_y"),
                broadcastRight: Boolean = false): GraftFrame =
    joined(o, by, "inner", suffix, broadcastRight)
  def leftJoin(o: GraftFrame, by: Seq[String], suffix: (String, String) = ("_x", "_y"),
               broadcastRight: Boolean = false): GraftFrame =
    joined(o, by, "left", suffix, broadcastRight)
  def rightJoin(o: GraftFrame, by: Seq[String], suffix: (String, String) = ("_x", "_y"),
                broadcastRight: Boolean = false): GraftFrame =
    joined(o, by, "right", suffix, broadcastRight)
  def fullJoin(o: GraftFrame, by: Seq[String], suffix: (String, String) = ("_x", "_y")): GraftFrame =
    joined(o, by, "full", suffix, broadcastRight = false)
  def semiJoin(o: GraftFrame, by: Seq[String]): GraftFrame =
    withDf(df.join(o.df.select(by.map(o.df.col): _*), by, "left_semi"))
  def antiJoin(o: GraftFrame, by: Seq[String]): GraftFrame =
    withDf(df.join(o.df.select(by.map(o.df.col): _*), by, "left_anti"))
  def crossJoinF(o: GraftFrame, suffix: (String, String) = ("_x", "_y")): GraftFrame = {
    val overlap = df.columns.toSet & o.df.columns.toSet
    val l0 = overlap.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffix._1))
    val r0 = overlap.foldLeft(o.df)((d, c) => d.withColumnRenamed(c, c + suffix._2))
    withDf(l0.crossJoin(r0))
  }
  /** nest_join: left rows + array<struct> of matching right rows.
    * One shuffle: right side pre-aggregated to array per key. */
  def nestJoin(o: GraftFrame, by: Seq[String], as: String): GraftFrame = {
    val payload = o.df.columns.filterNot(by.contains)
    val nested = o.df.groupBy(by.map(o.df.col): _*)
      .agg(collect_list(struct(payload.map(o.df.col).toSeq: _*)).as(as))
    withDf(df.join(nested, by, "left")
      .withColumn(as, coalesce(col(as), array())))
  }

  // ---- pull / nth / first / last ----------------------------------------
  def pull(c: String): DataFrame = df.select(c)

  // ---- group_iter (group_iter.py) — real per-group transforms ------------
  /** group_modify: apply an imperative per-group transform distributed
    * via groupByKey + flatMapGroups (one shuffle on the group key; each
    * group's rows stream through the executor-side function). `f`
    * receives (groupKey, rows of NON-key payload columns in input
    * column order) and yields payload rows of `outSchema`; the group
    * key columns are prepended to the output (dplyr semantics). */
  def groupModify(outSchema: org.apache.spark.sql.types.StructType)(
      f: (org.apache.spark.sql.Row, Iterator[org.apache.spark.sql.Row]) => Iterator[org.apache.spark.sql.Row]): GraftFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StructType
    require(groups.nonEmpty, "group_modify requires a grouped frame")
    val keySchema = StructType(groups.map(df.schema(_)))
    val fullSchema = StructType(keySchema.fields ++ outSchema.fields)
    val keyIdx = groups.map(df.columns.indexOf(_))
    val payloadIdx = df.columns.indices.filterNot(keyIdx.contains)
    val grouped = df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(Encoders.row(keySchema))
    val out = grouped.flatMapGroups { (k: Row, it: Iterator[Row]) =>
      f(k, it.map(r => Row.fromSeq(payloadIdx.map(r.get))))
        .map(r => Row.fromSeq(k.toSeq ++ r.toSeq))
    }(Encoders.row(fullSchema))
    new GraftFrame(out.toDF(), groups, Nil)
  }
  /** group_map: like group_modify but the per-group results are not
    * re-keyed — output is exactly what `f` yields, concatenated. */
  def groupMap(outSchema: org.apache.spark.sql.types.StructType)(
      f: (org.apache.spark.sql.Row, Iterator[org.apache.spark.sql.Row]) => Iterator[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StructType
    require(groups.nonEmpty, "group_map requires a grouped frame")
    val keySchema = StructType(groups.map(df.schema(_)))
    val keyIdx = groups.map(df.columns.indexOf(_))
    val grouped = df.groupByKey(r => Row.fromSeq(keyIdx.map(r.get)))(Encoders.row(keySchema))
    grouped.flatMapGroups((k: Row, it: Iterator[Row]) => f(k, it))(Encoders.row(outSchema)).toDF()
  }
  /** group_split: one DataFrame per group key. Collects the (small)
    * distinct key table to the driver — the split itself is a driver-
    * side construct (a list of frames); each frame is a filtered view
    * that prunes partitions at scan time. */
  def groupSplit(): Seq[DataFrame] = {
    require(groups.nonEmpty, "group_split requires a grouped frame")
    val keys = df.select(groupCols: _*).distinct().orderBy(groupCols: _*).collect()
    keys.toSeq.map { k =>
      val pred = groups.zipWithIndex.map { case (g, i) => df.col(g) <=> lit(k.get(i)) }.reduce(_ && _)
      df.filter(pred)
    }
  }

  /** dplyr with_groups: run `f` under a temporary grouping, then
    * restore the frame's own grouping (order_by.py's sibling wrapper
    * in group_by.py). */
  def withGroups(tmp: Seq[String])(f: GraftFrame => GraftFrame): GraftFrame = {
    val out = f(new GraftFrame(df, tmp, sortKeys))
    new GraftFrame(out.df, groups, out.sortKeys)
  }

  /** dplyr group_walk: driver-side side effect per group key (walk is
    * inherently driver-side, like glimpse); returns the frame
    * unchanged. Collects only the distinct KEY table, never the rows. */
  def groupWalk(f: org.apache.spark.sql.Row => Unit): GraftFrame = {
    groupKeys.collect().foreach(f); this
  }

  /** dplyr group_trim: drop unused factor levels from the grouping.
    * Levels here are data-derived (no stored level tables on frames),
    * so trimming is the identity — kept for API parity. */
  def groupTrim: GraftFrame = this

  // ---- output ------------------------------------------------------------
  /** glimpse: schema + head, driver-side formatting only. */
  def glimpse(n: Int = 5): String = {
    val head = df.limit(n).collect()
    val cols = df.schema.fields.map { f =>
      val vals = head.map(r => Option(r.getAs[Any](f.name)).map(_.toString).getOrElse("NA"))
      s"$$ ${f.name} <${f.dataType.simpleString}> ${vals.mkString(", ")}"
    }
    s"Rows: ? (lazy)\nColumns: ${df.columns.length}\n" + cols.mkString("\n")
  }

  /** glimpse with a COUNTED row total — one count(*) action (a
    * metadata-only scan under parquet). The lazy variant stays the
    * default: on a 100 TB frame an interactive schema peek must not
    * force a count job. */
  def glimpseEager(n: Int = 5): String =
    glimpse(n).replaceFirst("Rows: \\? \\(lazy\\)", s"Rows: ${df.count()}")
}

object GraftFrame {
  def apply(df: DataFrame): GraftFrame = new GraftFrame(df, Nil, Nil)
  def apply(df: DataFrame, groups: Seq[String]): GraftFrame = new GraftFrame(df, groups, Nil)

  private[core] def reverseOrder(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.reverseOrder(c)

  /** Normalize a sort key to NAs-last (R semantics) while preserving
    * its direction; explicit orderings set by the caller are kept. */
  private[core] def nullsLast(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.nullsLast(c)

  implicit class DataFrameOps(private val df: DataFrame) extends AnyVal {
    def graft: GraftFrame = GraftFrame(df)
  }
}

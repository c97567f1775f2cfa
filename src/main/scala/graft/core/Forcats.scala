package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** forcats verbs (reference: /root/reference/datar_polars/api/
  * forcats.py). Spark has no factor dtype; graft models a factor as
  * its string column plus a derived *level table* (level, ord). Level-
  * dependent ops compute the level table with one aggregation (tiny:
  * |levels| rows) and broadcast-join codes back — the scalable
  * topology for 100 TB fact columns with small level cardinality.
  *
  * LEVEL-TABLE CONTRACT: the `Window.orderBy` ranks in this file run
  * over the DISTINCT-LEVEL table only — never over fact rows — so the
  * single partition they imply holds |levels| rows. That is the factor
  * contract itself (R factors are small enumerations; the broadcast
  * join back would overflow long before the window did). Feeding a
  * high-cardinality column through fct_* violates the contract and
  * will fail at the broadcast, loudly, not silently mis-scale.
  */
object Forcats {

  /** fct_count: one row per level with n, optionally sorted by freq. */
  def fctCount(df: DataFrame, f: String, sort: Boolean = false,
               prop: Boolean = false): DataFrame = {
    val counts = df.groupBy(col(f)).agg(count(lit(1)).as("n"))
    val withProp =
      if (prop) counts.withColumn("p",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy()))
      else counts
    if (sort) withProp.orderBy(col("n").desc, col(f)) else withProp.orderBy(col(f))
  }

  /** Level table ordered by descending frequency (fct_infreq). */
  def levelsInfreq(df: DataFrame, f: String): DataFrame =
    df.groupBy(col(f)).agg(count(lit(1)).as("__n"))
      .withColumn("ord", row_number().over(Window.orderBy(col("__n").desc, col(f))))
      .drop("__n")

  /** Level table by first appearance along an explicit order
    * (fct_inorder; Spark frames are unordered so the order is given). */
  def levelsInorder(df: DataFrame, f: String, order: Column): DataFrame =
    df.groupBy(col(f)).agg(min(order).as("__first"))
      .withColumn("ord", row_number().over(Window.orderBy(col("__first"), col(f))))
      .drop("__first")

  /** Level table in natural sequence order (fct_inseq / fct_inorder on
    * numeric-like levels). */
  def levelsInseq(df: DataFrame, f: String): DataFrame =
    df.select(col(f)).distinct()
      .withColumn("ord", row_number().over(Window.orderBy(col(f))))

  /** fct_rev: reverse a level table's order. In-plan max (the level
    * table is tiny; no driver-side count action). */
  def fctRev(levels: DataFrame): DataFrame =
    levels.withColumn("ord",
      (max(col("ord")).over(Window.partitionBy()) + 1 - col("ord")).cast("int"))

  /** fct_relevel: move given levels to the front, rest keep order. */
  def fctRelevel(levels: DataFrame, f: String, first: Seq[String]): DataFrame = {
    val pri = first.zipWithIndex.toMap
    val prioritized = levels.withColumn("__pri",
      CondFns_priority(col(f), pri))
    prioritized.withColumn("ord",
      row_number().over(Window.orderBy(col("__pri"), col("ord")))).drop("__pri")
  }
  private def CondFns_priority(c: Column, pri: Map[String, Int]): Column =
    pri.foldLeft(lit(Int.MaxValue)) { case (acc, (lvl, i)) =>
      when(c === lvl, i).otherwise(acc)
    }

  /** Level mass for the lump family: row count, or — with `w`
    * (reference forcats.py:855,877,917 weighted lumping) — the level's
    * WEIGHT SUM. Decimal-summed (order-invariant, engine-exact), so
    * weighted keep-sets rank and threshold identically everywhere. */
  private def lvlMass(w: Option[Column]): Column =
    w.fold(count(lit(1)).cast("decimal(28,6)"))(c =>
      sum(c.cast("decimal(28,6)"))).as("__n")

  /** fct_lump_n: keep the n heaviest levels (by count, or by weight
    * sum with `w`), lump the rest. Two-phase: tiny level-mass agg,
    * then broadcast map-back. */
  def fctLumpN(df: DataFrame, f: String, n: Int,
               other: String = "Other", w: Option[Column] = None): DataFrame = {
    val keep = df.groupBy(col(f)).agg(lvlMass(w))
      .withColumn("__rk", row_number().over(Window.orderBy(col("__n").desc, col(f))))
      .filter(col("__rk") <= n).select(col(f).as("__keep"))
    df.join(broadcast(keep), df(f) === col("__keep"), "left")
      .withColumn(f, when(col("__keep").isNull, lit(other)).otherwise(col(f)))
      .drop("__keep")
  }

  /** fct_lump_min: lump levels with mass (count, or weight sum with
    * `w`) below `minN`. */
  def fctLumpMin(df: DataFrame, f: String, minN: Double,
                 other: String = "Other", w: Option[Column] = None): DataFrame = {
    val keep = df.groupBy(col(f)).agg(lvlMass(w))
      .filter(col("__n") >= lit(minN)).select(col(f).as("__keep"))
    df.join(broadcast(keep), df(f) === col("__keep"), "left")
      .withColumn(f, when(col("__keep").isNull, lit(other)).otherwise(col(f)))
      .drop("__keep")
  }

  /** fct_lump_prop: lump levels below a mass proportion (count share,
    * or weight share with `w`). The per-level and total masses are
    * exact decimals; the share is ONE double division of two exact
    * values — identical IEEE in every engine. */
  def fctLumpProp(df: DataFrame, f: String, prop: Double,
                  other: String = "Other", w: Option[Column] = None): DataFrame = {
    val counts = df.groupBy(col(f)).agg(lvlMass(w))
    val keep = counts
      .withColumn("__p", col("__n").cast("double") /
        sum(col("__n")).over(Window.partitionBy()).cast("double"))
      .filter(col("__p") >= prop).select(col(f).as("__keep"))
    df.join(broadcast(keep), df(f) === col("__keep"), "left")
      .withColumn(f, when(col("__keep").isNull, lit(other)).otherwise(col(f)))
      .drop("__keep")
  }

  /** fct_other: keep only the given levels. */
  def fctOther(df: DataFrame, f: String, keep: Seq[String],
               other: String = "Other"): DataFrame =
    df.withColumn(f, when(col(f).isin(keep: _*), col(f)).otherwise(lit(other)))

  /** fct_recode: rename levels (new -> old). */
  def fctRecode(df: DataFrame, f: String, recodes: Map[String, String]): DataFrame = {
    val inv: Map[Any, Any] = recodes.map { case (nw, old) => (old: Any) -> (nw: Any) }
    df.withColumn(f, graft.functions.CondFns.recode(col(f), inv))
  }

  /** fct_collapse: merge groups of levels (new -> members). */
  def fctCollapse(df: DataFrame, f: String,
                  groups: Map[String, Seq[String]]): DataFrame = {
    val cases = groups.toSeq.map { case (nw, olds) => col(f).isin(olds: _*) -> lit(nw) }
    df.withColumn(f, graft.functions.CondFns.caseWhen(cases, col(f)))
  }

  /** fct_reorder: level table ordered by an aggregate of x per level. */
  def fctReorder(df: DataFrame, f: String, agg: Column): DataFrame =
    df.groupBy(col(f)).agg(agg.as("__stat"))
      .withColumn("ord", row_number().over(Window.orderBy(col("__stat"), col(f))))
      .drop("__stat")

  /** fct_explicit_na: make NULL a real level. */
  def fctExplicitNa(df: DataFrame, f: String,
                    naLevel: String = "(Missing)"): DataFrame =
    df.withColumn(f, coalesce(col(f), lit(naLevel)))

  /** fct_drop: observed levels only (a factor's levels ARE data-derived
    * here, so this is the distinct level set). */
  def fctDrop(df: DataFrame, f: String): DataFrame = df.select(col(f)).distinct()

  /** fct_unique: distinct levels in level-table order. */
  def fctUnique(levels: DataFrame, f: String): DataFrame =
    levels.orderBy(col("ord")).select(col(f))

  /** fct_match: rows whose level is in the given set. */
  def fctMatch(df: DataFrame, f: String, lvls: Seq[String]): Column =
    col(f).isin(lvls: _*)

  /** fct_c: union of two factors' level tables (re-ranked). */
  def fctC(a: DataFrame, b: DataFrame, f: String): DataFrame =
    a.select(col(f)).union(b.select(col(f))).distinct()
      .withColumn("ord", row_number().over(Window.orderBy(col(f))))

  /** fct_anon applied to a data column: replace each VALUE with its
    * anonymous label — the level→label mapping is [[anonLabel]] over
    * the distinct level table, broadcast back onto the data (the level
    * table is tiny; the fact side never shuffles). */
  def fctAnonValues(df: DataFrame, f: String, prefix: String = "",
                    seed: Long = 42L): DataFrame = {
    val mapping = df.select(col(f)).distinct()
      .withColumn("__anon", anonLabel(f, prefix, seed))
    df.join(broadcast(mapping), Seq(f), "left")
      .withColumn(f, col("__anon")).drop("__anon")
  }

  /** fct_shift / lvls_reorder: rotate a level table by n — positive n
    * moves the first n levels to the end (forcats semantics). In-plan
    * max (no driver-side count action). */
  def fctShift(levels: DataFrame, n: Int): DataFrame = {
    val total = max(col("ord")).over(Window.partitionBy())
    levels.withColumn("ord",
      (((col("ord") - 1 - lit(n)) % total + total) % total + 1).cast("int"))
  }

  /** fct_cross: interaction factor of two factor columns — the data
    * column is the sep-joined pair; the level table enumerates the
    * OBSERVED combinations in (f1, f2) order (forcats keep_empty=FALSE).
    */
  def fctCross(df: DataFrame, f1: String, f2: String, sep: String = ":",
               as: String = "fcross"): DataFrame =
    df.withColumn(as, concat_ws(sep, col(f1), col(f2)))
  def fctCrossLevels(df: DataFrame, f1: String, f2: String,
                     sep: String = ":"): DataFrame =
    df.select(col(f1), col(f2)).distinct()
      .withColumn("ord", row_number().over(Window.orderBy(col(f1), col(f2))))
      .select(concat_ws(sep, col(f1), col(f2)).as("level"), col("ord"))

  /** fct_expand: append the given levels (those not already present)
    * to the end of a level table, preserving existing order. */
  def fctExpand(levels: DataFrame, f: String, extra: Seq[String]): DataFrame = {
    val spark = levels.sparkSession
    import spark.implicits._
    val extraDf = extra.zipWithIndex.toDF(f, "__i")
      .join(levels.select(col(f)), Seq(f), "left_anti")
    val tagged = levels.select(col(f), col("ord"), lit(0).as("__new"), lit(0).as("__i"))
      .unionByName(extraDf.select(col(f), lit(Int.MaxValue).as("ord"),
        lit(1).as("__new"), col("__i")))
    tagged.withColumn("ord",
        row_number().over(Window.orderBy(col("__new"), col("ord"), col("__i"))))
      .select(col(f), col("ord"))
  }

  /** fct_shuffle: random (seeded, reproducible) level order. */
  def fctShuffle(levels: DataFrame, f: String, seed: Long = 42L): DataFrame =
    levels.withColumn("ord",
      row_number().over(Window.orderBy(md5(concat(lit(seed.toString), col(f))), col(f))))

  /** fct_anon: anonymise levels — every level becomes a zero-padded
    * number (width = digits of the level count, forcats' rjust rule),
    * assigned in seeded pseudo-random order. The reference
    * (api/forcats.py:679) uses random.shuffle; here the permutation is
    * the md5(seed||level) rank — same device as [[fctShuffle]] — so any
    * SQL engine reproduces the identical anonymisation. Returns the
    * new level table (f = anon label, ord = numeric order). Windows
    * here are over the (small) level table only, like the rest of the
    * level-table verbs. */
  def fctAnon(levels: DataFrame, f: String, prefix: String = "",
              seed: Long = 42L): DataFrame =
    levels.withColumn("__lab", anonLabel(f, prefix, seed))
      .withColumn("ord", row_number().over(
        Window.orderBy(md5(concat(lit(seed.toString), col(f))), col(f))))
      .select(col("__lab").as(f), col("ord"))

  /** The seeded anonymous label for a level column: zero-padded
    * (md5-permutation rank − 1), width = digits of the level count —
    * forcats' rjust rule. Windows span the level table only. */
  private def anonLabel(f: String, prefix: String, seed: Long): Column = {
    val rk = row_number().over(
      Window.orderBy(md5(concat(lit(seed.toString), col(f))), col(f)))
    val n = count(lit(1)).over(Window.partitionBy())
    concat(lit(prefix), call_function("lpad",
      (rk - 1).cast("string"), length(n.cast("string")), lit("0")))
  }

  /** fct_relabel: apply a column function to the level names, merging
    * levels that map to the same label (keep the smallest ord). */
  def fctRelabel(levels: DataFrame, f: String, fn: Column => Column): DataFrame =
    levels.withColumn(f, fn(col(f)))
      .groupBy(col(f)).agg(min(col("ord")).as("__o"))
      .withColumn("ord", row_number().over(Window.orderBy(col("__o"), col(f))))
      .select(col(f), col("ord"))

  /** lvls_revalue: positional rename of levels (newNames(i) replaces
    * the level with ord i+1). */
  def lvlsRevalue(levels: DataFrame, f: String, newNames: Seq[String]): DataFrame = {
    val m = newNames.zipWithIndex.foldLeft(col(f)) { case (acc, (nm, i)) =>
      when(col("ord") === i + 1, lit(nm)).otherwise(acc)
    }
    levels.withColumn(f, m)
  }

  /** fct_lump_lowfreq: lump the rarest levels so "Other" stays the
    * least frequent level (forcats' parameterless lump). Keep levels
    * whose count exceeds the total of all smaller-or-equal counts.
    *
    * Tie-break: levels with equal counts rank by level value ascending
    * (deterministic, engine-independent). forcats breaks ties by level
    * appearance order instead; when a tie group straddles the cutoff a
    * different tied level may survive than in R. Intentional: appearance
    * order is not well-defined over an unordered distributed frame, and
    * the DuckDB oracle encodes this same alphabetical rule. */
  def fctLumpLowfreq(df: DataFrame, f: String, other: String = "Other"): DataFrame = {
    val counts = df.groupBy(col(f)).agg(count(lit(1)).as("__n"))
    // forcats' _lump_cutoff: rank levels by count DESCENDING; the first
    // rank whose count exceeds the sum of everything after it is the
    // cutoff, and every rank up to it survives — so "Other" (the lumped
    // tail) stays strictly smaller than the smallest kept level. On
    // counts [40,27,10,5,1,1,1,1,1]: rank2 (27) > tail(20) → keep
    // {40,27}, lump the rest.
    val wDesc = Window.orderBy(col("__n").desc, col(f))
    val keep = counts
      .withColumn("__rk", row_number().over(wDesc))
      .withColumn("__tail", coalesce(
        sum(col("__n")).over(wDesc.rowsBetween(1, Window.unboundedFollowing)),
        lit(0L)))
      // global window is fine: this is the (small) level table
      .withColumn("__cut", min(when(col("__n") > col("__tail"), col("__rk")))
        .over(Window.partitionBy()))
      .filter(col("__cut").isNull || col("__rk") <= col("__cut"))
      .select(col(f).as("__keep"))
    df.join(broadcast(keep), df(f) === col("__keep"), "left")
      .withColumn(f, when(col("__keep").isNull, lit(other)).otherwise(col(f)))
      .drop("__keep")
  }

  /** fct_reorder2: level order by an aggregate of y at the maximum x
    * per level (forcats' default .fun = last2, i.e. y at greatest x),
    * descending — the legend-matching ordering. */
  def fctReorder2(df: DataFrame, f: String, x: Column, y: Column): DataFrame =
    df.groupBy(col(f)).agg(max_by(y, x).as("__stat"))
      .withColumn("ord", row_number().over(Window.orderBy(col("__stat").desc, col(f))))
      .drop("__stat")

  /** fct_unify: re-level several factors' tables to their shared
    * (sorted) union of levels. */
  def fctUnify(tables: Seq[DataFrame], f: String): Seq[DataFrame] = {
    val union = tables.map(_.select(col(f))).reduce(_.union(_)).distinct()
      .withColumn("ord", row_number().over(Window.orderBy(col(f))))
    tables.map(_ => union)
  }

  /** droplevels — alias of fctDrop (levels are data-derived here). */
  def droplevels(df: DataFrame, f: String): DataFrame = fctDrop(df, f)
  /** nlevels as a one-row frame (no driver action). */
  def nlevels(df: DataFrame, f: String): DataFrame =
    df.agg(countDistinct(col(f)).as("nlevels"))

  /** lvls_union: union of several factors' level tables in first-seen
    * table order. */
  def lvlsUnion(tables: Seq[DataFrame], f: String): DataFrame =
    tables.zipWithIndex.map { case (t, i) => t.select(col(f), col("ord"), lit(i).as("__t")) }
      .reduce(_.unionByName(_))
      .groupBy(col(f)).agg(min(struct(col("__t"), col("ord"))).as("__k"))
      .withColumn("ord", row_number().over(Window.orderBy(col("__k"), col(f))))
      .select(col(f), col("ord"))

  /** fct_inseq: numeric-aware level order — levels that parse as
    * numbers sort numerically, the rest append lexicographically
    * (forcats puts non-numeric levels last). */
  def fctInseq(df: DataFrame, f: String): DataFrame = {
    // try_cast, not cast: ANSI sessions throw on non-numeric levels
    val num = expr(s"try_cast(`$f` AS DOUBLE)")
    df.select(col(f)).distinct()
      .withColumn("ord", row_number().over(
        Window.orderBy(num.isNull.cast("int"), num, col(f))))
  }

  /** lvls_reorder: explicit permutation of a level table — `idx(k)` is
    * the CURRENT ord of the level that becomes ord k+1 (forcats'
    * positional contract). */
  def lvlsReorder(levels: DataFrame, f: String, idx: Seq[Int]): DataFrame = {
    require(idx.sorted == (1 to idx.length),
      s"lvlsReorder: idx must be a permutation of 1..${idx.length} (got $idx)")
    val newOrd = idx.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (oldOrd, k)) => when(col("ord") === oldOrd, k + 1).otherwise(acc)
    }
    levels.withColumn("ord", newOrd)
  }

  /** lvls_expand — alias of [[fctExpand]] (same contract). */
  def lvlsExpand(levels: DataFrame, f: String, extra: Seq[String]): DataFrame =
    fctExpand(levels, f, extra)

  // ---- constructor surface (reference api/base/factor.py) ---------------
  /** as_factor on a character column: forcats' rule is levels in order
    * of first appearance, which needs an explicit row order on an
    * unordered Spark frame — alias of [[levelsInorder]]. */
  def asFactor(df: DataFrame, f: String, order: Column): DataFrame =
    levelsInorder(df, f, order)
  /** base factor() / as_ordered: levels in sort order. An ordered
    * factor IS its level table here — `ord` is the comparison rank, so
    * min/max/comparisons on factors run on the joined `ord` ints. */
  def asOrdered(df: DataFrame, f: String): DataFrame = levelsInseq(df, f)
  /** set_levels / levels<-: an EXPLICIT level table from the given
    * sequence (position = ord), replacing any derived one. */
  def setLevels(spark: org.apache.spark.sql.SparkSession, f: String,
                lvls: Seq[String]): DataFrame = {
    require(lvls.nonEmpty && lvls.distinct.size == lvls.size,
      s"setLevels: levels must be non-empty and distinct (got $lvls)")
    Tibble.of(spark, f -> lvls, "ord" -> lvls.indices.map(_ + 1))
  }
  /** is_factor / is_ordered: in the factor-as-level-table encoding a
    * frame IS a factor when it has exactly (level col f, ord:int) —
    * a schema predicate, zero scans. */
  def isFactor(levels: DataFrame, f: String): Boolean =
    levels.columns.toSeq.sorted == Seq(f, "ord").sorted &&
      levels.schema("ord").dataType == org.apache.spark.sql.types.IntegerType
}

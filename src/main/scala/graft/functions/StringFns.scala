package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** base-R string functions (reference:
  * /root/reference/datar_polars/api/base/string.py). All codegen'd
  * builtins; vectorized over columns.
  */
object StringFns {
  def paste(sep: String, cs: Column*): Column = concat_ws(sep, cs: _*)
  def paste0(cs: Column*): Column = concat(cs: _*)
  def sprintfOf(fmt: String, cs: Column*): Column = format_string(fmt, cs: _*)
  /** substr: 1-based start, inclusive stop (R semantics). */
  def substrOf(x: Column, start: Int, stop: Int): Column =
    substrC(x, lit(start), lit(stop - start + 1))
  def substringR(x: Column, first: Column): Column =
    substrC(x, first, lit(Int.MaxValue)) // through end
  def strsplit(x: Column, pattern: String): Column = split(x, pattern)
  /** strsplit(fixed=TRUE): delimiter taken literally, not as regex. */
  def strsplitFixed(x: Column, delim: String): Column =
    split(x, java.util.regex.Pattern.quote(delim))
  /** strsplit with a result-length cap (R's n via stringr::str_split). */
  def strsplitN(x: Column, pattern: String, n: Int): Column =
    split(x, pattern, n)
  /** gsub: replace ALL matches (Spark regexp_replace is global). */
  def gsub(x: Column, pattern: String, repl: String): Column =
    regexp_replace(x, pattern, repl)
  /** sub: replace FIRST match only. Split-once composition: prefix +
    * replacement + suffix via the first match position. */
  def subFirst(x: Column, pattern: String, repl: String): Column = {
    val m = regexp_extract(x, pattern, 0)
    // regexp_instr gives the TRUE first-match position — locate() on the
    // matched text would find an earlier literal occurrence of the same
    // string (e.g. sub("ab$","X","abcab") must touch the second "ab").
    val idx = call_function("regexp_instr", x, lit(pattern))
    when(idx === 0, x).otherwise(
      concat(substrC(x, lit(1), idx - 1),
        lit(repl),
        substrC(x, idx + length(m), lit(Int.MaxValue))))
  }
  private def substrC(x: Column, pos: Column, len: Column): Column =
    call_function("substring", x, pos, len)
  def grepl(x: Column, pattern: String): Column = x.rlike(pattern)
  def startsWith(x: Column, p: String): Column = x.startsWith(p)
  def endsWith(x: Column, p: String): Column = x.endsWith(p)
  def toupper(x: Column): Column = upper(x)
  def tolower(x: Column): Column = lower(x)
  def trimws(x: Column): Column = trim(x)
  def ncharOf(x: Column): Column = length(x)
  def nzchar(x: Column): Column = length(x) > 0
  def chartr(x: Column, from: String, to: String): Column =
    translate(x, from, to)
  def strtoi(x: Column, base: Int = 10): Column =
    if (base == 10) x.cast("long") else conv(x, base, 10).cast("long")

  /** base::make.names — syntactically-valid column names (reference
    * api/base/verbs.py make_names): non-alphanumeric runs → ".", a
    * leading digit/dot-digit gets an "X" prefix, empties become "X".
    * Driver-side by nature (names are schema metadata). */
  def makeNames(names: Seq[String]): Seq[String] = names.map { n =>
    val cleaned = n.replaceAll("[^A-Za-z0-9._]", ".")
    if (cleaned.isEmpty || cleaned.head.isDigit ||
      (cleaned.head == '.' && cleaned.length > 1 && cleaned(1).isDigit))
      "X" + cleaned
    else cleaned
  }

  /** base::make.unique — append .1, .2, ... to later duplicates
    * (first occurrence keeps its name, R's convention). */
  def makeUnique(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      seen.get(n) match {
        case None => seen(n) = 0; n
        case Some(k) => seen(n) = k + 1; s"$n.${k + 1}"
      }
    }
  }
}

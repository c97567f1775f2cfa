package graft.functions

/** Grid metadata a curve-clustered table carries so later appends
  * cluster on the SAME curve: curve name, cols, bits, per-column
  * bounds. Lives as an underscore-prefixed JSON file next to the data
  * (parquet readers ignore it, like _SUCCESS). Shared by the Z-order
  * (functions/ZOrder.scala) and Hilbert (functions/Hilbert.scala)
  * layouts. */
private[functions] object CurveMeta {

  def write(path: String, fileName: String, curve: String,
            cols: Seq[String], bits: Int, bs: Seq[(Long, Long)]): Unit = {
    val json = cols.zip(bs).map { case (c, (mn, mx)) =>
      s"""{"col":"$c","min":$mn,"max":$mx}"""
    }.mkString(s"""{"curve":"$curve","bits":$bits,"cols":[""", ",", "]}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, fileName),
      json.getBytes("UTF-8"))
  }

  /** (bits, per-column (name, min, max)). Fails loudly on a directory
    * that was never curve-written (or predates grid metadata). */
  def read(path: String, fileName: String,
           caller: String): (Int, Seq[(String, Long, Long)]) = {
    val p = java.nio.file.Paths.get(path, fileName)
    require(java.nio.file.Files.exists(p),
      s"$caller: $path has no $fileName — not a curve-written table " +
        "(or written before grid metadata existed); rewrite once to " +
        "establish the grid")
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val bits = """"bits":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val cols = """\{"col":"([^"]+)","min":(-?\d+),"max":(-?\d+)\}""".r
      .findAllMatchIn(s)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq
    (bits, cols)
  }
}

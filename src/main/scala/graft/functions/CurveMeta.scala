package graft.functions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Grid metadata a curve-clustered table carries so later appends
  * cluster on the SAME curve: curve name, cols, bits, per-column
  * bounds. Lives as an underscore-prefixed JSON file next to the data
  * (parquet readers ignore it, like _SUCCESS). Shared by the Z-order
  * (functions/ZOrder.scala) and Hilbert (functions/Hilbert.scala)
  * layouts. I/O goes through the Hadoop FileSystem API, so the table
  * can live on HDFS/S3/local alike — the same reach as the parquet
  * files beside it. */
private[graft] object CurveMeta {

  /** Whether a curve-written table's grid metadata exists at `path` —
    * through the Hadoop FileSystem API, so the answer is right for
    * HDFS/S3/file: URIs alike (a java.io.File check would be
    * always-false off the local filesystem and silently turn appends
    * into overwrites). */
  def exists(conf: Configuration, path: String, fileName: String): Boolean = {
    val p = new Path(path, fileName)
    p.getFileSystem(conf).exists(p)
  }

  def write(conf: Configuration, path: String, fileName: String,
            curve: String, cols: Seq[String], bits: Int,
            bs: Seq[(Long, Long)]): Unit = {
    val json = cols.zip(bs).map { case (c, (mn, mx)) =>
      s"""{"col":"$c","min":$mn,"max":$mx}"""
    }.mkString(s"""{"format":1,"curve":"$curve","bits":$bits,"cols":[""",
      ",", "]}")
    val p = new Path(path, fileName)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** (bits, per-column (name, min, max)). Fails loudly on a directory
    * that was never curve-written (or predates grid metadata). */
  def read(conf: Configuration, path: String, fileName: String,
           caller: String): (Int, Seq[(String, Long, Long)]) = {
    val p = new Path(path, fileName)
    val fs = p.getFileSystem(conf)
    require(fs.exists(p),
      s"$caller: $path has no $fileName — not a curve-written table " +
        "(or written before grid metadata existed); rewrite once to " +
        "establish the grid")
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val s = new String(bytes, "UTF-8")
    // format version: absent = 1 (pre-versioning metas carry the same
    // fields); a HIGHER version means a newer writer whose fields this
    // reader may misparse — fail loudly instead of clustering deltas
    // on a misread grid
    val ver = """"format":(\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(1)
    require(ver == 1,
      s"$caller: $fileName at $path has format version $ver, this " +
        "reader speaks version 1 — upgrade graft or rewrite the table")
    val bits = """"bits":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val cols = """\{"col":"([^"]+)","min":(-?\d+),"max":(-?\d+)\}""".r
      .findAllMatchIn(s)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq
    (bits, cols)
  }
}

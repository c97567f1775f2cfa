package graft.plans

import java.io.{DataInputStream, DataOutputStream}

/** Length-prefixed UTF-8 string I/O for sketch serialization
  * (Misra–Gries partial buffers, the streaming monitors' state
  * files). DataOutputStream.writeUTF throws UTFDataFormatException
  * past 65535 encoded bytes — a hard stop at partial-buffer shuffle
  * time for the unbounded key spaces these sketches exist for (raw
  * URLs, query strings). writeInt + raw bytes has no length ceiling
  * and is byte-for-byte deterministic. */
private[graft] object SketchIO {

  /** Envelope magic for PERSISTED monitor state files ("GSK\1"). The
    * streaming monitors (CUSUM / Misra–Gries / KMV / HLL / hist /
    * histBy) each persist bespoke binary state across process
    * lifetimes; without a header, a format change is read as garbage
    * lengths/keys with no diagnosable error (the r13 SketchIO
    * writeUTF→writeInt migration would have done exactly that to any
    * pre-existing state). Every state file now opens with
    * (magic, family, version); a reader seeing the wrong magic says
    * "older version or not a graft state file" instead of EOF-ing on
    * a garbage allocation, and a family/version mismatch names both
    * sides. NOT used for in-job shuffle buffers (MisraGriesAgg et al.)
    * — those never outlive one Spark job, so version skew is
    * impossible there and the header would be dead weight per row. */
  val Magic: Int = 0x47534B01

  def writeHeader(out: DataOutputStream, family: String, version: Int): Unit = {
    out.writeInt(Magic)
    writeStr(out, family)
    out.writeInt(version)
  }

  /** Fails loudly on foreign bytes (wrong magic: pre-envelope state or
    * not a graft file), a different monitor family's state, or a
    * version this reader does not speak. */
  def readHeader(in: DataInputStream, family: String, version: Int,
                 what: String): Unit = {
    val m = in.readInt()
    require(m == Magic,
      s"$what: state file has no graft envelope (magic 0x${m.toHexString}) " +
        "— written by an older graft version or not a graft state file; " +
        "delete the state dir to rebuild, or migrate it explicitly")
    val f = readStr(in)
    require(f == family,
      s"$what: state file belongs to monitor family '$f', reader is '$family'")
    val v = in.readInt()
    require(v == version,
      s"$what: state format version $v, this reader speaks version $version " +
        "— upgrade the reader or rebuild the state")
  }

  /** [[readHeader]] for readers that speak several versions (a format
    * upgrade that still reads its predecessor in place). Returns the
    * file's version so the caller can branch on the layout. */
  def readHeaderVersions(in: DataInputStream, family: String,
                         versions: Set[Int], what: String): Int = {
    val m = in.readInt()
    require(m == Magic,
      s"$what: state file has no graft envelope (magic 0x${m.toHexString}) " +
        "— written by an older graft version or not a graft state file; " +
        "delete the state dir to rebuild, or migrate it explicitly")
    val f = readStr(in)
    require(f == family,
      s"$what: state file belongs to monitor family '$f', reader is '$family'")
    val v = in.readInt()
    require(versions.contains(v),
      s"$what: state format version $v, this reader speaks " +
        s"${versions.toSeq.sorted.mkString("/")} — upgrade the reader or " +
        "rebuild the state")
    v
  }

  def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length)
    out.write(b)
  }

  def readStr(in: DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }
}

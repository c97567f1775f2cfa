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

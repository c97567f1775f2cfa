package graft.streaming

/** Atomic publish/read for the streaming monitors' standing-state
  * snapshots (the one-file driver-side state behind CmsStream,
  * SprtStream, …).
  *
  * Versioned + arbiter-renamed: state lives at `<prefix>.vNNNNNN.bin`,
  * each fold publishes version latest+1 through a WRITER-UNIQUE tmp
  * and a rename that REFUSES when the target already exists. Two
  * monitors misconfigured onto one state dir can therefore no longer
  * lose each other's counts silently — the old fixed-name tmp let a
  * racer overwrite this writer's staged bytes between create and
  * rename, and delete+rename let the slower read-modify-write win
  * with the faster fold erased. The loser now fails loudly: monitor
  * state dirs are single-writer by contract (the
  * [[graft.sources.Sources]] writeManifest arbiter pattern). The
  * previous version is kept so a concurrent reader never races a
  * vanishing file; older versions (and the legacy fixed-name file)
  * are pruned after publish. */
private[graft] object MonitorStateIO {
  import org.apache.hadoop.fs.Path

  private def versionOf(prefix: String, name: String): Option[Long] = {
    val pre = prefix + ".v"
    if (name.startsWith(pre) && name.endsWith(".bin")) {
      val mid = name.substring(pre.length, name.length - 4)
      if (mid.nonEmpty && mid.forall(_.isDigit)) Some(mid.toLong) else None
    } else None
  }

  private def readBytes(fs: org.apache.hadoop.fs.FileSystem,
                        p: Path): Array[Byte] = {
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    val fin = fs.open(p)
    try fin.readFully(0, bytes) finally fin.close()
    bytes
  }

  /** Latest state snapshot as (bytes, version); the pre-versioned
    * fixed-name file `<prefix>.bin` reads as version 0 so existing
    * state dirs upgrade in place on their next fold. None = no state. */
  def readLatest(conf: org.apache.hadoop.conf.Configuration, dir: String,
                 prefix: String): Option[(Array[Byte], Long)] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return None
    val versions = fs.listStatus(d).toSeq
      .flatMap(st => versionOf(prefix, st.getPath.getName)
        .map(v => (v, st.getPath)))
    if (versions.nonEmpty) {
      val (v, p) = versions.maxBy(_._1)
      Some((readBytes(fs, p), v))
    } else {
      val legacy = new Path(d, s"$prefix.bin")
      if (fs.exists(legacy)) Some((readBytes(fs, legacy), 0L)) else None
    }
  }

  /** [[publish]] at the next version after the currently-listed
    * latest — for monitors whose fold does not thread the read
    * version through. A writer that raced past this one between the
    * listing and the rename still trips the arbiter (the version it
    * published already exists), so the lost-update window is closed
    * either way. */
  def publishNext(conf: org.apache.hadoop.conf.Configuration, dir: String,
                  prefix: String, body: Array[Byte]): Unit = {
    val v = readLatestVersion(conf, dir, prefix).getOrElse(-1L)
    publish(conf, dir, prefix, body, v + 1L)
  }

  private def readLatestVersion(conf: org.apache.hadoop.conf.Configuration,
                                dir: String, prefix: String): Option[Long] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return None
    val versions = fs.listStatus(d).toSeq
      .flatMap(st => versionOf(prefix, st.getPath.getName))
    if (versions.nonEmpty) Some(versions.max)
    else if (fs.exists(new Path(d, s"$prefix.bin"))) Some(0L) else None
  }

  /** Publish `body` as version `newVersion` (= the read version + 1).
    * Refuses loudly when that version already exists — the concurrent-
    * writer signal. */
  def publish(conf: org.apache.hadoop.conf.Configuration, dir: String,
              prefix: String, body: Array[Byte], newVersion: Long): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) fs.mkdirs(d)
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(d, s"$prefix.$tag.tmp")
    val dst = new Path(d, f"$prefix.v$newVersion%06d.bin")
    val o = fs.create(tmp, true)
    try o.write(body) finally o.close()
    val won = !fs.exists(dst) && fs.rename(tmp, dst)
    if (!won) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"$prefix: state version $newVersion already published — a " +
          "concurrent writer folded into this state dir between this " +
          "fold's read and publish; monitor state dirs are single-writer " +
          "(give each monitor its own dir, or serialize the folds)")
    }
    // prune: keep newVersion and newVersion-1; the legacy fixed-name
    // file is superseded by the first versioned publish
    fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (versionOf(prefix, n).exists(_ < newVersion - 1) || n == s"$prefix.bin")
        fs.delete(st.getPath, false)
    }
  }
}

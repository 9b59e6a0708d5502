package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Persisted-state directory staging/promotion through the Hadoop
  * FileSystem API — valid on any Spark-writable scheme (local, HDFS,
  * S3A), not just `java.io.File` paths, which is what the nightly
  * jobs' state dirs actually are on a cluster.
  *
  * Discipline: the writer materializes EVERYTHING under `<dir>.tmp`
  * first (the previous state stays readable throughout — maintenance
  * plans read the previous files), then [[promote]] flips via two
  * whole-directory renames: `<dir>` → `<dir>.old`, then `<dir>.tmp`
  * → `<dir>`, then reap `.old`. Each rename is atomic on HDFS and
  * local (S3A's rename is a copy, but each flip point is still
  * single), and the previous state is never deleted before the new
  * one is live — a crash at ANY point leaves the old state intact
  * (in `<dir>` or `<dir>.old`) plus possibly the complete staged
  * copy in `<dir>.tmp`; re-running the producing job (which re-stages
  * and calls promote again) always converges. No file-by-file walk,
  * so no window where a reader sees a mix of parts. */
object StateDirs {

  /** Scheme-aware existence probe (java.io.File.exists is local-only). */
  def exists(conf: Configuration, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Promote `<dir>.tmp` to `<dir>` without ever destroying the last
    * live state before the new one is in place: park the destination
    * at `<dir>.old`, rename the staged dir in, then reap `.old`. The
    * staged dir must already hold every part. A stale `.old` left by
    * a crashed earlier promote is reaped first. */
  def promote(conf: Configuration, dir: String): Unit = {
    val dst = new Path(dir)
    val tmp = new Path(dir + ".tmp")
    val old = new Path(dir + ".old")
    val fs = dst.getFileSystem(conf)
    require(fs.exists(tmp), s"promote: staged dir $tmp missing")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"promote: could not reap stale $old")
    if (fs.exists(dst) && !fs.rename(dst, old))
      throw new java.io.IOException(s"promote: rename $dst -> $old failed")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"promote: rename $tmp -> $dst failed")
    if (fs.exists(old)) fs.delete(old, true) // best-effort reap; stale .old is cleared next promote
  }
}

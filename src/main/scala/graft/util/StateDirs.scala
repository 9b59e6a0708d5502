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
  * plans read the previous files), then [[promote]] flips the whole
  * staged directory in ONE `FileSystem.rename` (atomic on HDFS and
  * local; S3A's rename is a copy, but the promote point is still
  * single) — no file-by-file delete+rename walk, so a crash leaves
  * either the old state or the new one, never a mix of parts. */
object StateDirs {

  /** Scheme-aware existence probe (java.io.File.exists is local-only). */
  def exists(conf: Configuration, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Promote `<dir>.tmp` to `<dir>`: clear the destination, one
    * rename. The staged dir must already hold every part. */
  def promote(conf: Configuration, dir: String): Unit = {
    val dst = new Path(dir)
    val tmp = new Path(dir + ".tmp")
    val fs = dst.getFileSystem(conf)
    require(fs.exists(tmp), s"promote: staged dir $tmp missing")
    if (fs.exists(dst) && !fs.delete(dst, true))
      throw new java.io.IOException(s"promote: could not clear $dst")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"promote: rename $tmp -> $dst failed")
  }
}

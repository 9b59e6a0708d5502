package graft.util

import java.io.File

/** Scratch roots for write-path queries and specs. Lives under the
  * repo's target/ dir (never outside the repo). Deterministic per name
  * so re-runs start clean. */
object TmpDirs {
  private val base = new File("target/graft-scratch")

  /** A fresh (deleted-if-present) scratch dir for `name`. */
  def fresh(name: String): String = {
    val dir = new File(base, name)
    delete(dir)
    dir.mkdirs()
    dir.getAbsolutePath
  }

  /** Recursive delete of an arbitrary path (test hygiene). */
  def deleteRecursively(path: String): Unit = delete(new File(path))

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }
}

package graft.jobs

import java.net.URI
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

import graft.SparkSpec
import graft.util.StateDirs

/** An object-store-semantics stand-in: a local Hadoop FileSystem whose
  * `rename` is NOT atomic — it copies file-by-file (deterministic
  * sorted order) then deletes the source, exactly how S3A implements
  * directory rename — with an injectable crash after N copied files.
  * Lets the suite prove how the staged-rename promotion DEGRADES on a
  * store without atomic rename (round-12 verdict ask #7). */
class CopyRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3sim"
  override def getUri: URI = URI.create("s3sim:///")

  override def rename(src: Path, dst: Path): Boolean = {
    copyTree(src, dst)
    delete(src, true)
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      listStatus(src).sortBy(_.getPath.getName).foreach { c =>
        copyTree(c.getPath, new Path(dst, c.getPath.getName))
      }
    } else {
      CopyRenameFileSystem.maybeCrash(src)
      val in = open(src)
      val out = create(dst, true)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096)
      finally { in.close(); out.close() }
    }
  }
}

object CopyRenameFileSystem {
  /** Files the next renames may copy before "crashing"; < 0 = never. */
  @volatile var crashAfterFiles: Int = -1
  private val copied = new java.util.concurrent.atomic.AtomicInteger(0)
  def armCrash(afterFiles: Int): Unit = { copied.set(0); crashAfterFiles = afterFiles }
  def disarm(): Unit = { crashAfterFiles = -1 }
  private def maybeCrash(src: Path): Unit =
    if (crashAfterFiles >= 0 && copied.getAndIncrement() >= crashAfterFiles)
      throw new java.io.IOException(
        s"simulated crash mid rename-as-copy at $src")
}

/** The staged-rename promotion on an S3-semantics store: the
  * last-live-state-survives claim must HOLD, and the one claim that
  * CANNOT hold — no reader-visible mixed directory — must fail LOUDLY
  * (an exception out of promote, a detectable partial dir, and a
  * convergent re-run), never silently. */
class S3SemanticsPromoteSpec extends SparkSpec {

  private def conf = {
    val c = new Configuration()
    c.set("fs.s3sim.impl", classOf[CopyRenameFileSystem].getName)
    c.setBoolean("fs.s3sim.impl.disable.cache", true)
    c
  }

  private def mkState(dir: String, marker: String, parts: Int = 3): Unit = {
    Files.createDirectories(Paths.get(dir))
    (0 until parts).foreach { i =>
      Files.write(Paths.get(dir, s"part-$i"), s"$marker-$i".getBytes("UTF-8"))
    }
  }
  private def parts(dir: String): Seq[String] =
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else Files.list(Paths.get(dir)).toArray.map(_.toString)
      .map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
      .toSeq.sorted

  override def withFixture(test: NoArgTest) = {
    CopyRenameFileSystem.disarm()
    try super.withFixture(test)
    finally CopyRenameFileSystem.disarm()
  }

  test("promote converges on a copy-rename store (slow but correct)") {
    val root = Files.createTempDirectory("s3sim").toString
    val dir = s"$root/state"
    mkState(dir, "v1"); mkState(dir + ".tmp", "v2")
    StateDirs.promote(conf, "s3sim://" + dir)
    parts(dir) shouldBe Seq("v2-0", "v2-1", "v2-2")
    Files.exists(Paths.get(dir + ".tmp")) shouldBe false
  }

  test("crash mid dst->old copy: promote throws, live state intact") {
    val root = Files.createTempDirectory("s3sim").toString
    val dir = s"$root/state"
    mkState(dir, "v1"); mkState(dir + ".tmp", "v2")
    CopyRenameFileSystem.armCrash(afterFiles = 1) // dies on dst->old file 2
    val e = intercept[java.io.IOException] {
      StateDirs.promote(conf, "s3sim://" + dir)
    }
    e.getMessage should include("simulated crash")
    // LOUD, and the live dir still holds complete v1 (copy leaves src)
    parts(dir) shouldBe Seq("v1-0", "v1-1", "v1-2")
    // re-run converges: the stale partial .old is reaped by the next promote
    CopyRenameFileSystem.disarm()
    StateDirs.promote(conf, "s3sim://" + dir)
    parts(dir) shouldBe Seq("v2-0", "v2-1", "v2-2")
  }

  test("crash mid tmp->dst copy: dir is PARTIAL (the object-store gap), " +
      "old state parked, re-staged promote converges") {
    val root = Files.createTempDirectory("s3sim").toString
    val dir = s"$root/state"
    mkState(dir, "v1"); mkState(dir + ".tmp", "v2")
    // dst->old copies 3 files; crash on the 2nd file of tmp->dst
    CopyRenameFileSystem.armCrash(afterFiles = 4)
    intercept[java.io.IOException] {
      StateDirs.promote(conf, "s3sim://" + dir)
    }
    // THE documented degradation: on a copying store the flip window is
    // not atomic — a reader of <dir> during/after this crash sees a
    // partial copy (1 of 3 parts here), NOT old-or-new. This is why
    // the README routes object-store deployments through a completeness
    // marker or a table format; on HDFS/local this window is a single
    // atomic rename and the old-or-new claim holds.
    parts(dir).size should (be > 0 and be < 3)
    // the last live state is still recoverable at .old, in full
    parts(dir + ".old") shouldBe Seq("v1-0", "v1-1", "v1-2")
    // and the producing job's re-run (re-stage + promote) converges
    CopyRenameFileSystem.disarm()
    mkState(dir + ".tmp", "v2")
    StateDirs.promote(conf, "s3sim://" + dir)
    parts(dir) shouldBe Seq("v2-0", "v2-1", "v2-2")
    Files.exists(Paths.get(dir + ".old")) shouldBe false
  }
}

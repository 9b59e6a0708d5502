package graft.jobs

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.util.StateDirs
import org.apache.hadoop.conf.Configuration

/** Crash-safety contract of the staged-directory promotion: the last
  * live state must survive EVERY crash window — promote may never
  * delete the old state before the new one is in place. */
class StateDirsSpec extends SparkSpec {

  private def conf = new Configuration()

  private def mkState(dir: String, marker: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "part-0"), marker.getBytes("UTF-8"))
  }

  private def readState(dir: String): String =
    new String(Files.readAllBytes(Paths.get(dir, "part-0")), "UTF-8")

  test("promote flips tmp to live and reaps .old") {
    val root = Files.createTempDirectory("statedirs").toString
    val dir = s"$root/state"
    mkState(dir, "v1")
    mkState(dir + ".tmp", "v2")
    StateDirs.promote(conf, dir)
    readState(dir) shouldBe "v2"
    Files.exists(Paths.get(dir + ".tmp")) shouldBe false
    Files.exists(Paths.get(dir + ".old")) shouldBe false
  }

  test("a stale .old from a crashed promote is reaped, not promoted over") {
    val root = Files.createTempDirectory("statedirs").toString
    val dir = s"$root/state"
    // Simulate the crash window AFTER dst->old but BEFORE tmp->dst of a
    // previous promote: old state parked at .old, new state still in .tmp.
    mkState(dir + ".old", "v1")
    mkState(dir + ".tmp", "v2")
    // The re-run job re-stages and promotes again; dst absent is fine.
    StateDirs.promote(conf, dir)
    readState(dir) shouldBe "v2"
    Files.exists(Paths.get(dir + ".old")) shouldBe false
  }

  test("old state is never deleted before the new one is live") {
    val root = Files.createTempDirectory("statedirs").toString
    val dir = s"$root/state"
    mkState(dir, "v1")
    // Staged dir missing: promote must refuse AND leave v1 untouched
    // (the failure mode ADVICE r9 flagged was old-destroyed-new-staged).
    an[IllegalArgumentException] should be thrownBy StateDirs.promote(conf, dir)
    readState(dir) shouldBe "v1"
  }

  test("promote with no prior live state installs the staged dir") {
    val root = Files.createTempDirectory("statedirs").toString
    val dir = s"$root/state"
    mkState(dir + ".tmp", "v1")
    StateDirs.promote(conf, dir)
    readState(dir) shouldBe "v1"
  }
}

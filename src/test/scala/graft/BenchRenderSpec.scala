package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench artifact contract: the driver preserves only the last
  * ~2000 characters of stdout (BENCH_r11's tail field is exactly
  * 2000), so (a) no single line may exceed 1.5 KB, and (b) the final
  * THREE lines — the base-36 spread array, the packed minima and the
  * sentinel-carrying summary — must together reconstruct EVERY query
  * minimum, its contention spread and the run's start/end sentinel
  * inside that tail. Locked at 250 synthetic queries (above the
  * current 225) so growth has headroom. */
class BenchRenderSpec extends AnyFunSuite with Matchers {

  // 250 queries mirroring the real naming (qNN prefix + long suffix),
  // with the real id gaps and a couple of failures mixed in.
  private val ids = (1 to 262).filterNot(Set(11, 12, 92, 148, 168, 180, 210,
    211, 240, 241, 242, 243)).take(250)
  // Minima follow the MEASURED artifact shape (BENCH_r11: bulk under
  // 2 s, a Zipf tail to ~14 s — packed-line digits track that), not a
  // uniform-to-20s fantasy that no real run produces.
  private val results: Seq[Bench.QResult] = ids.zipWithIndex.map {
    case (id, i) =>
      val name = f"q$id%02d_synthetic_operator_name_of_typical_length"
      if (id == 33 || id == 199)
        name -> Left("java.lang.RuntimeException: planted bench failure " + i)
      else if (i % 25 == 7)
        name -> Right((0.523 + (i % 40) * 0.517, 0.05 + (i % 7) * 0.01))
      else
        name -> Right((0.087 + (i % 20) * 0.093, 0.05 + (i % 7) * 0.01))
  }
  private val sentinel = Some(Bench.Sentinel(7.897, 8.312, 3.27, 32))
  private val lines =
    Bench.renderLines("/root/testdata/sf0.1", 3, results, sentinel)

  test("error strings with control characters render with no raw control char in any line") {
    // Spark stage-failure messages carry tabs; un-escaped they make
    // the artifact line unparseable JSON (observed on the h100
    // rehearsal's q105 OOM line).
    val bad: Seq[Bench.QResult] = Seq(
      "q01_ctrl" -> Left("boom" + 9.toChar + "tabbed" + 1.toChar + "ctrl"),
      "q02_ok" -> Right((1.0, 0.0)))
    Bench.renderLines("sf", 1, bad).foreach { l =>
      withClue(l) { l.exists(_ < ' ') shouldBe false }
    }
  }

  test("no emitted line exceeds 1.5 KB") {
    val over = lines.filter(_.getBytes("UTF-8").length > 1536)
    withClue(s"lines over 1.5KB: ${over.map(_.take(60))}") {
      over shouldBe empty
    }
  }

  test("the last three lines fit the 2000-char driver tail together") {
    // +~80 chars of sbt [info]/[success] framing still leaves slack
    lines.takeRight(3).map(_.length).sum should be < 1900
  }

  test("spread line: one digit per query, decodable, errors marked 'z'") {
    val spread = lines(lines.size - 3)
    spread should startWith("""{"metric":"spread_b36"""")
    val s = """"s":"([^"]*)"""".r.findFirstMatchIn(spread).get.group(1)
    s.length shouldBe results.size
    results.zip(s).foreach {
      case ((_, Right((mn, sp))), c) =>
        val want = math.min(35L, (5.0 * sp / math.max(mn, 0.001)).toLong)
        java.lang.Character.digit(c, 36).toLong shouldBe want
      case ((_, Left(_)), c) => c shouldBe 'z'
    }
    // a transient window (spread = 12.5x min) saturates visibly to 'z'
    val hot: Seq[Bench.QResult] =
      Seq("q01_hot" -> Right((0.4, 5.0)), "q02_cool" -> Right((0.4, 0.02)))
    val hotLine = Bench.renderLines("sf", 3, hot)
      .dropRight(2).last
    """"s":"([^"]*)"""".r.findFirstMatchIn(hotLine).get.group(1) shouldBe "z0"
  }

  test("packed line reconstructs every minimum in ascending-q order") {
    val packed = lines(lines.size - 2)
    packed should startWith("""{"metric":"mins_packed"""")
    // parse ids: "1-10,13-..." and ms array back out with a dumb parser
    val idsStr = """"ids":"([^"]*)"""".r.findFirstMatchIn(packed).get.group(1)
    val decoded = idsStr.split(",").flatMap { tok =>
      tok.split("-") match {
        case Array(a) => Seq(a.toInt)
        case Array(a, b) => a.toInt to b.toInt
      }
    }.toSeq
    decoded shouldBe ids
    val msStr = """"ms":\[([^\]]*)\]""".r.findFirstMatchIn(packed).get.group(1)
    val ms = msStr.split(",").toSeq
    ms.size shouldBe results.size
    results.zip(ms).foreach {
      case ((_, Right((mn, _))), m) => m.toLong shouldBe math.round(mn * 1000)
      case ((_, Left(_)), m) => m shouldBe "null"
    }
  }

  test("summary line is last and carries total, errors_n, shared8, top10, sentinel") {
    val s = lines.last
    s should startWith("""{"metric":"total"""")
    s should include(""""errors_n":2""")
    // the contention sentinel: start/end shared-8 sums + box load
    s should include(""""s8_start_sec":7.897""")
    s should include(""""s8_end_sec":8.312""")
    s should include(""""load1":3.270""")
    s should include(""""cores":32""")
    // a filtered run omits the sentinel cleanly
    Bench.renderLines("sf", 1, results.take(3)).last should not include "s8_start"
    val shared8 = results.collect {
      case (k, Right((mn, _))) if k.drop(1).takeWhile(_.isDigit).toInt <= 8 => mn
    }.sum
    s should include(s""""shared8_sec":${BigDecimal(shared8)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP)}""")
    s should include(""""top10_sec":{""")
    // top10 keys are short qNN form
    """"top10_sec":\{([^}]*)\}""".r.findFirstMatchIn(s).get.group(1)
      .split(",").length shouldBe 10
  }

  test("every query appears in exactly one mins chunk, ascending") {
    val chunkQs = lines.filter(_.startsWith("""{"metric":"mins","""))
      .flatMap(l => """"(q\d+)":""".r.findAllMatchIn(l).map(_.group(1)))
    chunkQs shouldBe ids.map(i => f"q$i%02d")
  }
}

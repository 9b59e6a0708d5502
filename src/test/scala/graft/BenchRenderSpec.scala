package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench artifact contract: the driver preserves only the last
  * ~2000 characters of stdout (BENCH_r11's tail field is exactly
  * 2000), so (a) no single line may exceed 1.5 KB, and (b) the final
  * FOUR lines — the streaming-gates rows/s map, the base-36 spread
  * array, the packed minima and the sentinel-carrying summary — must
  * together reconstruct EVERY query minimum, its contention spread,
  * every gate's throughput and the run's start/end sentinel inside
  * that tail (the r12 artifact lost 4 of 11 gates to truncation —
  * round-13 ask #3). Locked at 280 synthetic queries + 11 gates
  * (above the current 273-query registry) so the budget binds with headroom. */
class BenchRenderSpec extends AnyFunSuite with Matchers {

  // 280 queries mirroring the real naming (qNN prefix + long suffix),
  // with the real id gaps and a couple of failures mixed in.
  private val ids = (1 to 290).filterNot(Set(11, 12, 92, 148, 168, 180, 210,
    211, 240, 241, 242, 243)).take(280)
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

  test("no emitted line exceeds 1.5 KB except the whole-stdout contract line") {
    // The contract line is the ONE deliberate exception: it targets a
    // parser reading the full stdout, not the 2000-char archival tail
    // (see the Bench header scaladoc, item 2b).
    val over = lines
      .filterNot(_.startsWith("""{"metric":"total","value":"""))
      .filter(_.getBytes("UTF-8").length > 1536)
    withClue(s"lines over 1.5KB: ${over.map(_.take(60))}") {
      over shouldBe empty
    }
  }

  test("contract line: full names, every query, value/unit/sf — the documented driver interface") {
    val c = lines(lines.size - 4)
    c should startWith("""{"metric":"total","value":""")
    c should include(""""unit":"sec"""")
    c should endWith(""""sf":"/root/testdata/sf0.1"}""")
    val entries = """"(q\d+_[a-z_]+)":(\d+\.\d+|null)""".r.findAllMatchIn(c).toSeq
    entries.map(_.group(1)) shouldBe results.map(_._1)
    entries.count(_.group(2) == "null") shouldBe 2
    // minima round-trip at millisecond precision
    val byName = entries.map(m => m.group(1) -> m.group(2)).toMap
    results.collect { case (k, Right((mn, _))) =>
      BigDecimal(byName(k)) shouldBe
        BigDecimal(mn).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }
  }

  private val gates: Seq[(String, Either[String, (Double, Long)])] =
    Seq("q46", "q58", "q65", "q92", "q132", "q148", "q168", "q180",
      "q212", "q238", "q259").zipWithIndex.map { case (q, i) =>
      s"${q}_streaming_gate_name_of_typical_len" ->
        (if (i == 4) Left("planted gate failure")
         else Right((3.5 + i * 0.7, 60000L + i * 1000L)))
    }

  test("streaming + spread + packed + summary fit the 2000-char tail TOGETHER") {
    // 2000-byte capture minus framing: since round 16 build.sbt's
    // StdoutOutput strips the per-line "[info] " prefixes, so only the
    // trailing "[success] Total time: ..." line (~85) + newlines eat
    // into the capture — the four lines must stay under ~1,910
    // together; asserted at 1,860 for margin (BENCH_r12 lost its
    // streaming line exactly here; r16 added the sf + contended
    // fields to the summary).
    val tail4 = Bench.renderStreamingLine(gates).toSeq ++ lines.takeRight(3)
    tail4.size shouldBe 4
    val bytes = tail4.map(_.getBytes("UTF-8").length).sum
    withClue(s"combined tail bytes: $bytes") { bytes should be < 1860 }
  }

  test("streaming line carries ALL gates, rows/s only, errors null") {
    val l = Bench.renderStreamingLine(gates).get
    l should startWith("""{"metric":"streaming"""")
    val entries = """"(q\d+)":(\d+|null)""".r.findAllMatchIn(l).toSeq
    entries.map(_.group(1)) shouldBe gates.map(g => g._1.takeWhile(_ != '_'))
    entries.count(_.group(2) == "null") shouldBe 1
    // rows/s round-trips: gate 0 = 60000 rows / 3.5 s
    entries.head.group(2).toLong shouldBe math.round(60000L / 3.5)
    l should not include """"sec":"""
    Bench.renderStreamingLine(Seq.empty) shouldBe None
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
    packed should startWith("""{"metric":"mins_b36"""")
    // parse ids: "1-10,13-..." and the 3-char base-36 groups back out
    val idsStr = """"ids":"([^"]*)"""".r.findFirstMatchIn(packed).get.group(1)
    val decoded = idsStr.split(",").flatMap { tok =>
      tok.split("-") match {
        case Array(a) => Seq(a.toInt)
        case Array(a, b) => a.toInt to b.toInt
      }
    }.toSeq
    decoded shouldBe ids
    val msStr = """"ms":"([^"]*)"""".r.findFirstMatchIn(packed).get.group(1)
    msStr.length shouldBe results.size * 3
    val groups = msStr.grouped(3).toSeq
    results.zip(groups).foreach {
      case ((_, Right((mn, _))), g) =>
        java.lang.Long.parseLong(g, 36) shouldBe
          math.min(46655L, math.round(mn * 1000))
      case ((_, Left(_)), g) => g shouldBe "---"
    }
    // saturation: a 60 s minimum encodes as "zzz", not a wider group
    Bench.msB36(Right((60.0, 0.0))) shouldBe "zzz"
    Bench.msB36(Right((0.0424, 0.0))) shouldBe "016"
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
    // sentinel pair within 20% and load1 under cores/3 -> not contended
    s should include(""""contended":false""")
    // the two contention signatures each flip the flag
    Bench.renderLines("sf", 3, results.take(3),
      Some(Bench.Sentinel(10.0, 13.0, 1.0, 32))).last should
      include(""""contended":true""")
    Bench.renderLines("sf", 3, results.take(3),
      Some(Bench.Sentinel(8.0, 8.1, 12.0, 32))).last should
      include(""""contended":true""")
    s should include(""""sf":"/root/testdata/sf0.1"""")
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

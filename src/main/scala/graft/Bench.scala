package graft

/** Benchmark main — prints a TRUNCATION-PROOF block of JSON lines the
  * driver parses from a fixed-size stdout TAIL.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPEATS` times (default 3) and
  * reports the per-query MINIMUM: a shared-box bench is noisy (the
  * round-2 driver run recorded 15 s for a query that takes <1 s on an
  * idle machine), and min-of-N is the standard way to measure the
  * engine rather than the neighbors. The max-min spread is emitted per
  * query so variance is visible in the artifact itself.
  *
  * A query that throws is recorded as `null`, listed in an error
  * chunk, EXCLUDED from the total, and fails the run (nonzero exit)
  * — a broken query must never silently deflate the benchmark.
  *
  * Output layout is load-bearing. The driver archives only the LAST
  * ~2000 characters of stdout (measured from the round-8/9 artifacts;
  * BENCH_r11's tail field is exactly 2000), and the single compact
  * line outgrew that tail at ~200 queries (round 9 lost q01–q79,
  * headline included; rounds 6/7 had smaller versions of the same
  * failure). So the bench prints, in order:
  *   1. `detail` chunks — full names + min + spread (+ errors), ~16
  *      queries per line. Front-truncation eats these first; fine.
  *   2. `mins` chunks — short qNN keys + minima, ~50 queries per line,
  *      ascending q order (a mid-size tail keeps the later chunks).
  *   2b. the CONTRACT line — `{"metric":"total","value":N,"unit":
  *      "sec","queries":{full-name: sec,...},"sf":...}`, the exact
  *      documented driver interface with EVERY query's minimum under
  *      its full name. It exceeds the archival tail on purpose: it
  *      targets a parser that reads the whole stdout (build.sbt's
  *      StdoutOutput makes it a raw JSON line — sbt's "[info] "
  *      prefix is why `parsed` was null in every prior artifact).
  *   3. `streaming` (from main, full runs only) — per-gate rows/s
  *      ONLY. The r12 artifact proved the per-gate `sec` map doesn't
  *      fit: its 2,000-byte tail cut `sec` AND the first 4 gates of
  *      the rows/s map, so the round-over-round streaming comparison
  *      fell back to builder-local logs (round-13 ask #3). rows/s is
  *      the comparison the verdict tracks; seconds are derivable from
  *      the source-table row counts if ever needed.
  *   4. `spread_b36` — EVERY query's max−min spread as ONE base-36
  *      char in packed-id order: digit = min(35, ⌊5·spread/min⌋),
  *      i.e. spread in FIFTHS of the minimum saturating at 7× ('z'),
  *      'z' also for errored queries. Round-12 ask #1: the r11
  *      artifact carried a 6–15× phantom-regression cluster that only
  *      a judge-side re-run could falsify, because the per-query
  *      spreads lived in the truncated detail chunks. A contended
  *      window now shows as a run of high digits in ANY capture;
  *      a quiet run is a string of 0s and 1s.
  *   5. `mins_b36` — EVERY query's minimum in milliseconds as ONE
  *      fixed-width 3-char base-36 group in packed-id order ("016" =
  *      42 ms, "zzz" saturates at ≥ 46,655 ms, "---" = errored), plus
  *      the range-encoded id list ("1-10,19-38,…"): exactly 3 bytes
  *      per query vs the former decimal array's ~6, which is what
  *      buys the streaming gates their place in the tail at 264
  *      queries (round-13 ask #3).
  *   6. LAST, `total` — the small summary the driver's parser keys
  *      on: total, errors_n, the shared-8 headline aggregate, top-10
  *      heaviest queries, and the CONTENTION SENTINEL — the shared-8
  *      set re-run single-shot at the very START and very END of the
  *      run (`s8_start_sec`/`s8_end_sec`) plus the 1-min load average
  *      and core count at exit. A uniform box shift reads as
  *      start≈end both inflated vs prior rounds WITH high load1; a
  *      transient window reads as start≉end or a high-digit spread
  *      run; a real code regression reads as clean sentinels, flat
  *      spreads and a shifted min.
  * Lines 3+4+5+6 — the streaming gates, the spread array, every
  * minimum and the sentinel — stay under ~1.75 KB COMBINED
  * (BenchRenderSpec locks this at 264 queries + 11 gates), so ALL of
  * them survive a 2 KB capture with sbt's `[info] `/`[success]`
  * framing on top.
  */
object Bench {

  type QResult = (String, Either[String, (Double, Double)]) // name -> err | (min, spread)

  // Control characters must escape too: a recorded error string with
  // an embedded tab (Spark stage-failure messages carry them) would
  // otherwise make the whole artifact line unparseable JSON —
  // observed on the h100 rehearsal's q105 OOM line.
  private def jstr(s: String) =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  // Millisecond precision keeps lines short (less to truncate) without
  // losing anything a seconds-scale bench can measure.
  private def jnum(d: Double) =
    BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
  private def shortKey(name: String) = name.takeWhile(_ != '_')

  /** "q105_neardup_keep_best" -> 105. Bench names carry the unique qNN
    * prefix by construction; anything else fails fast here. */
  private def qNum(name: String): Int = {
    require(name.startsWith("q") && name.drop(1).takeWhile(_.isDigit).nonEmpty,
      s"bench query name without qNN prefix: $name")
    name.drop(1).takeWhile(_.isDigit).toInt
  }

  /** Range-encode sorted ids: 1,2,3,7,9,10 -> "1-3,7,9-10". */
  private def rangeEncode(ids: Seq[Int]): String = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < ids.length) {
      var j = i
      while (j + 1 < ids.length && ids(j + 1) == ids(j) + 1) j += 1
      out += (if (j == i) ids(i).toString else s"${ids(i)}-${ids(j)}")
      i = j + 1
    }
    out.mkString(",")
  }

  /** Contention sentinel for the summary line: the shared-8 set run
    * single-shot at the start and end of the run, plus box load at
    * exit. None when a query-name filter skipped the sentinel. */
  final case class Sentinel(
      startSec: Double, endSec: Double, load1: Double, cores: Int)

  /** One base-36 digit per query: spread (max−min) in FIFTHS of the
    * minimum, saturating at 'z' (≥ 7× the min); 'z' for errors too.
    * A zero-ms min (sub-millisecond query) renders as 'z' only if it
    * has any spread at all — guarded by max(min, 1ms). */
  private[graft] def spreadDigit(r: Either[String, (Double, Double)]): Char =
    r match {
      case Right((mn, sp)) =>
        val b = math.min(35L, (5.0 * sp / math.max(mn, 0.001)).toLong)
        java.lang.Character.forDigit(b.toInt, 36)
      case Left(_) => 'z'
    }

  /** One query minimum → fixed-width 3-char base-36 milliseconds:
    * "016" = 42 ms, "zzz" saturates at ≥ 46,655 ms, "---" = errored.
    * Width 3 covers everything a sf0.1 bench measures (heaviest query
    * 13.4 s in r12) at 1 ms granularity. */
  private[graft] def msB36(r: Either[String, (Double, Double)]): String =
    r match {
      case Right((mn, _)) =>
        val ms = math.min(46655L, math.max(0L, math.round(mn * 1000)))
        val s = java.lang.Long.toString(ms, 36)
        "000".substring(s.length) + s
      case Left(_) => "---"
    }

  /** Pure renderer for the streaming-gate line: per-gate rows/s only
    * (the r12 tail lost the `sec` map AND 4 gates to truncation;
    * rows/s is the comparison that matters — round-13 ask #3). */
  private[graft] def renderStreamingLine(
      gates: Seq[(String, Either[String, (Double, Long)])]): Option[String] =
    if (gates.isEmpty) None
    else {
      val rps = gates.map {
        case (k, Right((dt, rows))) =>
          s"${jstr(shortKey(k))}:${math.round(rows / dt)}"
        case (k, Left(_)) => s"${jstr(shortKey(k))}:null"
      }.mkString("{", ",", "}")
      Some(s"""{"metric":"streaming","unit":"rows_per_sec","gates":$rps}""")
    }

  /** Pure renderer (unit-tested): ALL stdout lines, sacrificial
    * diagnostics first, spread array + packed minima + summary LAST. */
  def renderLines(sfDir: String, repeats: Int,
      results: Seq[QResult], sentinel: Option[Sentinel] = None): Seq[String] = {
    val detailChunks = results.grouped(16).zipWithIndex.toSeq
    val nDetail = detailChunks.size
    val detail = detailChunks.map { case (chunk, i) =>
      val qs = chunk.map {
        case (k, Right((mn, _))) => s"${jstr(k)}:${jnum(mn)}"
        case (k, Left(_)) => s"${jstr(k)}:null"
      }.mkString("{", ",", "}")
      val spreads = chunk.collect {
        case (k, Right((_, sp))) => s"${jstr(shortKey(k))}:${jnum(sp)}"
      }.mkString("{", ",", "}")
      val errors = chunk.collect {
        case (k, Left(e)) => s"${jstr(k)}:${jstr(e.take(120))}"
      }.mkString("{", ",", "}")
      s"""{"metric":"detail","part":${i + 1},"parts":$nDetail,""" +
        s""""errors":$errors,"spread_sec":$spreads,"queries":$qs}"""
    }
    val minChunks = results.grouped(50).zipWithIndex.toSeq
    val nMin = minChunks.size
    val mins = minChunks.map { case (chunk, i) =>
      val qs = chunk.map {
        case (k, Right((mn, _))) => s"${jstr(shortKey(k))}:${jnum(mn)}"
        case (k, Left(_)) => s"${jstr(shortKey(k))}:null"
      }.mkString("{", ",", "}")
      s"""{"metric":"mins","part":${i + 1},"parts":$nMin,"queries":$qs}"""
    }
    // THE documented driver contract line — `{"metric":...,"value":N,
    // "unit":"sec","queries":{name:sec,...},"sf":...}` with FULL query
    // names (the CORRECTNESS artifact's key space). This line is
    // deliberately allowed to outgrow the 2000-char archival tail: it
    // targets a parser reading the WHOLE stdout (round-16 fix — every
    // BENCH artifact back to r01 carried `parsed: null` even when this
    // exact line was emitted, because sbt's "[info] " prefix made the
    // line non-JSON; build.sbt now passes fork stdout through raw).
    // It sits ABOVE the compact tail block so the judge-decodable
    // b36 lines and the sentinel summary still own the tail.
    val contractQs = results.map {
      case (k, Right((mn, _))) => s"${jstr(k)}:${jnum(mn)}"
      case (k, Left(_)) => s"${jstr(k)}:null"
    }.mkString("{", ",", "}")
    val ids = rangeEncode(results.map { case (k, _) => qNum(k) })
    // spread array: same id order as mins_b36, one char per query
    // (digit semantics in the header scaladoc + spreadDigit — a note
    // field would cost ~70 tail chars per run)
    val spread = s"""{"metric":"spread_b36","n":${results.size},""" +
      s""""s":${jstr(results.map(r => spreadDigit(r._2)).mkString)}}"""
    // every minimum as fixed-width-3 base-36 ms (decode: 3-char groups
    // in id order, parseInt(_, 36); "---" = error) — see msB36
    val packed = s"""{"metric":"mins_b36","unit":"ms_b36_w3",""" +
      s""""n":${results.size},"ids":${jstr(ids)},""" +
      s""""ms":${jstr(results.map(r => msB36(r._2)).mkString)}}"""
    val total = results.collect { case (_, Right((mn, _))) => mn }.sum
    val shared8 = results.collect {
      case (k, Right((mn, _))) if qNum(k) <= 8 => mn
    }.sum
    val top10 = results.collect { case (k, Right((mn, _))) => (k, mn) }
      .sortBy(-_._2).take(10)
      .map { case (k, mn) => s"${jstr(shortKey(k))}:${jnum(mn)}" }
      .mkString("{", ",", "}")
    val sent = sentinel.map { s =>
      // `contended` makes the sentinel ACTIONABLE (round-15 verdict
      // ask #5): true when the bracketing shared-8 sums disagree >20%
      // or the exit 1-min load exceeds cores/3 — the two signatures of
      // a box whose per-query readings cannot be trusted at the
      // 0.2–1.5 s scale. Zero behavior change otherwise.
      val disagree =
        math.abs(s.startSec - s.endSec) >
          0.20 * math.max(math.min(s.startSec, s.endSec), 1e-9)
      val contended = disagree || s.load1 > s.cores / 3.0
      s""""s8_start_sec":${jnum(s.startSec)},"s8_end_sec":${jnum(s.endSec)},""" +
        s""""load1":${jnum(s.load1)},"cores":${s.cores},""" +
        s""""contended":$contended,"""
    }.getOrElse("")
    val summary = s"""{"metric":"total","unit":"sec",""" +
      s""""repeats":$repeats,"errors_n":${results.count(_._2.isLeft)},""" +
      sent +
      s""""shared8_sec":${jnum(shared8)},"top10_sec":$top10,""" +
      s""""sf":${jstr(sfDir)},"value":${jnum(total)}}"""
    val contract = s"""{"metric":"total","value":${jnum(total)},""" +
      s""""unit":"sec","queries":$contractQs,"sf":${jstr(sfDir)}}"""
    detail ++ mins ++ Seq(contract) ++ Seq(spread, packed, summary)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    // optional args: query-name filter for local iteration (the driver
    // passes none and always measures the full set). The literal arg
    // "streaming" runs ONLY the streaming gate section. Unknown names
    // fail fast — a typo must not silently benchmark nothing and exit 0.
    val streamingOnly = args.toSeq == Seq("streaming")
    val unknown =
      if (streamingOnly) Set.empty[String]
      else args.toSet.diff(SparkEntry.benchQueries.toSet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[bench] unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}; " +
          s"valid: ${SparkEntry.benchQueries.mkString(", ")}")
      sys.exit(2)
    }
    val only: Option[Set[String]] =
      if (streamingOnly) Some(Set.empty)
      else if (args.nonEmpty) Some(args.toSet) else None
    val spark = GraftSession.forMain("graft-bench")
    // Warm the JVM/codegen/IO paths once so the first measured query
    // doesn't absorb session startup (measures queries, not JIT).
    Tables.lineitem(spark, sfDir).limit(1).collect()
    // Contention sentinel (round-12 ask #1): the shared-8 set runs
    // single-shot at the very start and very end of the run; both
    // sums land in the summary line so a capture can tell "box was
    // busy" (sentinels disagree, or both inflated with high load1)
    // from "code got slower" (clean sentinels, shifted mins). Skipped
    // under a query-name filter — local iteration measures queries.
    def runShared8(): Double =
      (1 to 8).map { i =>
        val name = SparkEntry.benchQueries.find(q => qNum(q) == i).get
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // errors surface in the main loop
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sum
    val fullRun = only.isEmpty
    // one UNTIMED shared-8 pass first: the timed start sentinel must
    // measure the box, not first-compilation (measured: a cold start
    // sentinel read 38.9 s vs 3.9 s at run end on an idle box — the
    // exact false positive the sentinel exists to rule out)
    if (fullRun) runShared8(): Unit
    val s8Start = if (fullRun) runShared8() else 0.0
    val results: Seq[QResult] =
      SparkEntry.benchQueries.filter(n => only.forall(_.contains(n))).map { name =>
        val fn = SparkEntry.queries(name)
        val runs = (1 to repeats).map { _ =>
          val t0 = System.nanoTime()
          // noop sink: full plan executes (a bare .count() can let Spark
          // skip evaluating projected expressions under column pruning).
          val r =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); Right(()) }
            catch { case e: Throwable => Left(e.toString.linesIterator.next()) }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache() // no cross-query cache accumulation
          r.map(_ => dt)
        }
        val times = runs.collect { case Right(t) => t }
        val res =
          if (times.nonEmpty) Right((times.min, times.max - times.min))
          else Left(runs.collectFirst { case Left(e) => e }.getOrElse("unknown"))
        res.left.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
        name -> res
      }
    // Streaming throughput section (round-11 ask #6): each of the 10
    // gates run ONCE by default (a full 11-gate pass is ~3.6 min at
    // sf0.1 — measured round 15 — so min-of-N inside the driver
    // window is a deliberate opt-in, not the default), reported as
    // source-relation rows/s so a state-handling regression shows up
    // round over round. SPARK_GRAFT_STREAM_REPEATS=N turns on the
    // q182-style best-of-N discipline for a deep-dive; the round-15
    // interleaved A/B (BASELINE r15 row) showed single-run gate
    // readings spread ±10% with box load, which the bracketing
    // shared-8 sentinels already flag. Skipped under a query-name
    // filter (local iteration measures the named batch queries only).
    // Default 3 since round 16 (round-15 verdict ask #9): the r14→r15
    // artifacts swung every gate 1.16–1.66× with ZERO streaming code
    // change, proving single-shot gate numbers are noise; min-of-3
    // costs ~7 extra minutes at sf0.1 and makes the gate line a real
    // round-over-round comparison. SPARK_GRAFT_STREAM_REPEATS=1
    // restores the old single-shot behavior for quick local passes.
    val streamRepeats =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_REPEATS", "3").toInt.max(1)
    val gates: Seq[(String, Either[String, (Double, Long)])] =
      if (only.nonEmpty && !streamingOnly) Seq.empty
      else {
        val srcRows = Map(
          "events" -> Tables.events(spark, sfDir).count(),
          "documents" -> Tables.documents(spark, sfDir).count())
        SparkEntry.streamingGates.map { case (name, table) =>
          val runs = (1 to streamRepeats).map { _ =>
            val t0 = System.nanoTime()
            val r =
              try { SparkEntry.queries(name)(spark, sfDir)
                      .write.format("noop").mode("overwrite").save(); Right(()) }
              catch { case e: Throwable => Left(e.toString.linesIterator.next()) }
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            r.left.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
            r.map(_ => dt)
          }
          val best = runs.collect { case Right(dt) => dt }
          val res: Either[String, (Double, Long)] =
            if (best.nonEmpty) Right((best.min, srcRows(table)))
            else Left(runs.collectFirst { case Left(e) => e }.get)
          (name, res)
        }
      }
    val streamingLine: Option[String] = renderStreamingLine(gates)
    // per-gate seconds still reach the builder's local log (stderr —
    // outside the driver's stdout tail budget) for deep-dives
    gates.foreach {
      case (k, Right((dt, rows))) =>
        System.err.println(f"[bench] gate $k: $dt%.3f s, $rows rows")
      case _ => ()
    }
    val sentinel =
      if (!fullRun) None
      else {
        val s8End = runShared8()
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        Some(Sentinel(s8Start, s8End, os.getSystemLoadAverage,
          Runtime.getRuntime.availableProcessors))
      }
    // spread + packed minima + summary stay the LAST three lines (tail
    // contract); the streaming line sits just above them so its
    // trailing gates map is the next element a tight tail preserves
    val lines = renderLines(sfDir, repeats, results, sentinel)
    (lines.dropRight(3) ++ streamingLine.toSeq ++ lines.takeRight(3))
      .foreach(println)
    spark.stop()
    if (results.exists(_._2.isLeft) || gates.exists(_._2.isLeft)) sys.exit(1)
  }
}

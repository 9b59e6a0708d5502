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
  * ~2000 characters of stdout (measured from the round-8/9 artifacts),
  * and the single compact line outgrew that tail at ~200 queries
  * (round 9 lost q01–q79, headline included; rounds 6/7 had smaller
  * versions of the same failure). So the bench now prints, in order:
  *   1. `detail` chunks — full names + min + spread (+ errors), ~16
  *      queries per line. Front-truncation eats these first; fine.
  *   2. `mins` chunks — short qNN keys + minima, ~50 queries per line,
  *      ascending q order (a mid-size tail keeps the later chunks).
  *   3. `mins_packed` — EVERY query's minimum as a millisecond-int
  *      array plus a range-encoded id list ("1-10,19-38,…"): ~6 bytes
  *      per query, so all 200+ minima fit in ONE ≤1.5 KB line.
  *   4. LAST, `total` — the small summary the driver's parser keys on:
  *      total, errors_n, the shared-8 headline aggregate, top-10
  *      heaviest queries.
  * Lines 3+4 together stay under ~1.8 KB, so BOTH always survive the
  * 2000-char tail: every minimum is reconstructible from any capture.
  * BenchRenderSpec locks the ≤1.5 KB per-line bound and the
  * round-trip (packed line → every minimum) at 250 queries.
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

  /** Pure renderer (unit-tested): ALL stdout lines, sacrificial
    * diagnostics first, packed minima + summary LAST. */
  def renderLines(sfDir: String, repeats: Int,
      results: Seq[QResult]): Seq[String] = {
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
    val ids = rangeEncode(results.map { case (k, _) => qNum(k) })
    val ms = results.map {
      case (_, Right((mn, _))) => math.round(mn * 1000).toString
      case (_, Left(_)) => "null"
    }.mkString("[", ",", "]")
    val packed = s"""{"metric":"mins_packed","unit":"ms","n":${results.size},""" +
      s""""ids":${jstr(ids)},"ms":$ms}"""
    val total = results.collect { case (_, Right((mn, _))) => mn }.sum
    val shared8 = results.collect {
      case (k, Right((mn, _))) if qNum(k) <= 8 => mn
    }.sum
    val top10 = results.collect { case (k, Right((mn, _))) => (k, mn) }
      .sortBy(-_._2).take(10)
      .map { case (k, mn) => s"${jstr(shortKey(k))}:${jnum(mn)}" }
      .mkString("{", ",", "}")
    val summary = s"""{"metric":"total","unit":"sec","sf":"$sfDir",""" +
      s""""repeats":$repeats,"errors_n":${results.count(_._2.isLeft)},""" +
      s""""shared8_sec":${jnum(shared8)},"top10_sec":$top10,""" +
      s""""value":${jnum(total)}}"""
    detail ++ mins ++ Seq(packed, summary)
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
    // gates runs ONCE (replay + state handling dominate; min-of-N
    // would triple an already IO-bound section), reported as
    // source-relation rows/s so a state-handling regression shows up
    // round over round. Skipped under a query-name filter (local
    // iteration measures the named batch queries only).
    val gates: Seq[(String, Either[String, (Double, Long)])] =
      if (only.nonEmpty && !streamingOnly) Seq.empty
      else {
        val srcRows = Map(
          "events" -> Tables.events(spark, sfDir).count(),
          "documents" -> Tables.documents(spark, sfDir).count())
        SparkEntry.streamingGates.map { case (name, table) =>
          val t0 = System.nanoTime()
          val r =
            try { SparkEntry.queries(name)(spark, sfDir)
                    .write.format("noop").mode("overwrite").save(); Right(()) }
            catch { case e: Throwable => Left(e.toString.linesIterator.next()) }
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          r.left.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
          (name, r.map(_ => (dt, srcRows(table))))
        }
      }
    val streamingLine: Option[String] =
      if (gates.isEmpty) None
      else {
        val rps = gates.map {
          case (k, Right((dt, rows))) =>
            s"${jstr(shortKey(k))}:${math.round(rows / dt)}"
          case (k, Left(_)) => s"${jstr(shortKey(k))}:null"
        }.mkString("{", ",", "}")
        val secs = gates.map {
          case (k, Right((dt, _))) => s"${jstr(shortKey(k))}:${jnum(dt)}"
          case (k, Left(_)) => s"${jstr(shortKey(k))}:null"
        }.mkString("{", ",", "}")
        Some(s"""{"metric":"streaming","unit":"rows_per_sec",""" +
          s""""sec":$secs,"gates":$rps}""")
      }
    // packed minima + summary stay the LAST two lines (tail contract)
    val lines = renderLines(sfDir, repeats, results)
    (lines.dropRight(2) ++ streamingLine.toSeq ++ lines.takeRight(2))
      .foreach(println)
    spark.stop()
    if (results.exists(_._2.isLeft) || gates.exists(_._2.isLeft)) sys.exit(1)
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** The statistics / experimentation battery query definitions
  * (rank tests, changepoints, attribution, retention, tokenizers).
  *
  * Part of the [[SparkEntry]] registry split (round 10): each trait is
  * one compilation unit; SparkEntry composes them unchanged.
  */
private[graft] trait EntryAnalyticsStatsDefs extends EntryMaintenanceStreamDefs {
  /** Time-decay attribution (q229): the recency-weighted member of
    * the attribution family — exact 10⁶-ppm conservation per
    * conversion, remainder to the most recent touch's channel. */
  private[graft] def timeDecayQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.timeDecayAttribution(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        convType = "purchase", channels = Seq("signup", "view", "click"),
        weights = DecayWeightsPpm)
      .orderBy(col("channel"))

  /** Cohort LTV (q228): cumulative cent-exact revenue per first-order
    * cohort week and weeks-since-first — the payback-period curve;
    * timezone-proof integer weeks. */
  private[graft] def cohortLtvQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.cohortLtv(
        Tables.orders(s, dir), "o_custkey", "o_orderdate",
        round(col("o_totalprice") * 100))
      .orderBy(col("cohort_week"), col("offset_weeks"))

  /** q227's iteration constant — drives BOTH the Spark driver loop
    * and the unrolled oracle CTE chain (determinism does not require
    * convergence; iters is part of the contract). */
  private[graft] val PcaPowerIters = 12

  /** Top principal component (q227): the embedding-collapse audit —
    * exact-integer power iteration on the graft_gram covariance,
    * sign-canonicalized; explained_ppm is the one-number collapse
    * score. */
  private[graft] def topPcQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    Similarity.topPrincipalComponent(Tables.embeddings(s, dir),
        "embedding", dims = 64, iters = PcaPowerIters)
      .orderBy(col("dim"))
  }

  /** Holt smoothing (q226): level + trend per event type — the
    * forecast that stops trailing a ramp; truncation direction on the
    * signed trend is contractual and mirrored sign-split. */
  private[graft] def holtQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.holtSmoothing(
        Tables.events(s, dir), "event_type", "ts",
        alphaPpm = 300000L, betaPpm = 200000L)
      .orderBy(col("event_type"), col("day"))

  /** Aggregate consistency (q223): does the stored order total match
    * the line sum — denormalization drift at cent precision, 5%
    * tolerance; childless parents counted separately. */
  private[graft] def aggConsistencyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.aggregateConsistencyAudit(
      Tables.orders(s, dir), "o_orderkey", round(col("o_totalprice") * 100),
      Tables.lineitem(s, dir), "l_orderkey",
      round(col("l_extendedprice") * 100), tolerancePpm = 50000L)

  /** Calendar densification (q224): the dense per-type day axis with
    * explicit zero days — the gapless basis every series window
    * assumes. */
  private[graft] def densifyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.densifyDays(
        Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"), col("day"))

  /** Behavioral diversity (q221): per-user event-mix entropy in
    * exact micro-nats, published as the quarter-nat bucket
    * histogram — the exploration-vs-routine segmentation. */
  private[graft] def diversityQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.behavioralDiversity(
        Tables.events(s, dir), "user_id", "event_type")
      .orderBy(col("bucket"))

  /** Frequency response (q222): conversion rate by pre-conversion
    * view count — the diminishing-returns curve behind frequency
    * capping; strict-before tie rule. */
  private[graft] def frequencyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.frequencyResponse(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        touchType = "view", convType = "purchase", cap = 10)
      .orderBy(col("touch_bucket"))

  /** Readability (q220): Flesch reading ease per document —
    * dictionary-free vowel-run syllables, punctuation-run sentences,
    * one micro-quantized IEEE chain; the audience-level quality
    * signal. */
  private[graft] def readabilityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.readabilityScore(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Functional dependencies (q219): which order columns determine
    * which — candidate keys and near-held invariants over a literal
    * 4-column list, violating-group ppm per ordered pair. */
  private[graft] def fdAuditQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.functionalDependencies(
        Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("determinant"), col("dependent"))

  /** Pettitt changepoint (q218): the nonparametric split-day per
    * event type — rank algebra along time, robust where q149's CUSUM
    * is outlier-dragged. */
  private[graft] def pettittQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.pettittChangepoint(
        Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))

  /** Scene-change detection (q217): consecutive-frame checksum deltas
    * over the full decoded frame stream — a cut is a frame whose
    * brightness mass moved ≥ 10% (|Δ| ≥ max(1, prev div 10)); the
    * shot-boundary primitive video curation samples around. Pure
    * composition: q167's decoder + a per-doc window. */
  private[graft] def sceneChangeQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val fr = Multimodal.sampleFrames(s,
      Multimodal.attachVideo(s, Tables.documents(s, dir)), everyN = 1).toDF()
    val byF = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    fr.withColumn("prev", lag(col("px_checksum"), 1).over(byF))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        count(when(col("prev").isNotNull &&
          abs(col("px_checksum") - col("prev")) >=
            greatest(lit(1L), expr("prev div 10")), 1)).as("n_cuts"),
        coalesce(max(abs(col("px_checksum") - col("prev"))), lit(0L))
          .as("max_delta"))
      .orderBy(col("doc_id"))
  }

  /** Winsorize (q216): clamp document lengths to each language's
    * exact [p10, p90] band — the outlier-taming transform upstream of
    * robust statistics; row-level output, hash-sensitive to the
    * exact clamping. */
  private[graft] def winsorizeQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.winsorize(
        Tables.documents(s, dir), "doc_id", "lang", col("n_chars"),
        pLow = 10, pHigh = 90)
      .orderBy(col("doc_id"))

  /** Peak concurrency (q215): how many user-day sessions were open AT
    * ONCE, per day — the day-partitioned +1/−1 boundary sweep; the
    * capacity read next to q192's depth histogram. */
  private[graft] def peakConcurrencyQuery(s: SparkSession, dir: String): DataFrame = {
    val sess = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
    graft.operators.Analytics.peakConcurrency(sess, "start_ts", "end_ts")
      .orderBy(col("day"))
  }

  /** Q–Q decile table (q214): en vs de document lengths aligned
    * quantile by quantile — K137's exact order statistic per slice,
    * joined on the decile, with the per-decile length ratio; the
    * distribution-shape read that says WHERE the drift q199 detects
    * actually lives. Pure composition of the gated q169 machinery. */
  private[graft] def qqTableQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val docs = Tables.documents(s, dir).filter(col("lang").isin("en", "de"))
    val bands = Analytics.exactPercentiles(docs, "lang", col("n_chars"),
      (1 to 9).map(_ * 10))
    val en = bands.filter(col("key") === "en")
      .select(col("pct"), col("value").as("v_en"))
    val de = bands.filter(col("key") === "de")
      .select(col("pct"), col("value").as("v_de"))
    en.join(de, Seq("pct"))
      .select(col("pct"), col("v_en"), col("v_de"),
        when(col("v_de") =!= 0, expr("v_en * 1000000 div v_de"))
          .otherwise(lit(null).cast("long")).as("ratio_ppm"))
      .orderBy(col("pct"))
  }

  /** Spearman correlation (q213): do quantity and price move together
    * on the order line — tie-aware midrank correlation in exact
    * integers off the two value histograms. */
  private[graft] def spearmanQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.spearmanCorrelation(
      Tables.lineitem(s, dir), col("l_quantity"),
      round(col("l_extendedprice") * 100))

  /** Mann–Whitney U (q210): does German length stochastically
    * dominate English — doubled rank sums off the shared value
    * histogram, AUC effect size in exact ppm (the q199 pair). */
  private[graft] def mannWhitneyQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.mannWhitneyU(
      Tables.documents(s, dir), "lang", col("n_chars"), "en", "de")

  /** KL divergence (q211): weekday vs weekend event-type mix — the
    * categorical drift screen, per-category micro terms summed
    * exactly, NULL on disjoint support. */
  private[graft] def klDivergenceQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("slice",
        when(dayofweek(to_date(col("ts"))).between(2, 6), "weekday")
          .otherwise("weekend"))
    graft.operators.Analytics.klDivergence(
      e, "event_type", "slice", "weekday", "weekend")
  }

  /** EWMA baseline (q209): the exact-integer smoothed expected volume
    * per event type (α = 0.3) with per-day deviations — the monitor
    * primitive; driver fold over the days-sized rollup, recursive-CTE
    * oracle. */
  private[graft] def ewmaQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.ewmaBaseline(
        Tables.events(s, dir), "event_type", "ts", alphaPpm = 300000L)
      .orderBy(col("event_type"), col("day"))

  /** Audience overlap (q208): the pairwise Jaccard of event-type
    * audiences — one distinct (user, type) shuffle, types²-bounded
    * everything after. */
  private[graft] def audienceOverlapQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.audienceOverlap(
        Tables.events(s, dir), "event_type", "user_id")
      .orderBy(col("type_a"), col("type_b"))

  /** Cross-correlation (q207): does the signup series lead purchases
    * by a week — lag-7 cross-correlation of the two daily series on
    * the shared day axis, exact sums, one stated IEEE tail. */
  private[graft] def crossCorrQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.crossCorrelation(
      Tables.events(s, dir), "event_type", "ts",
      typeX = "signup", typeY = "purchase", lag = 7)

  /** Chi-square independence (q204): is the event mix associated with
    * the weekday — Pearson X² over the full type×weekday grid,
    * per-cell micro terms summed exactly. */
  private[graft] def chiSquareQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.chiSquareIndependence(
      Tables.events(s, dir)
        .select(col("event_type"),
          dayofweek(to_date(col("ts"))).as("weekday")),
      "event_type", "weekday")

  /** Contribution analysis (q203): why did the metric move — each
    * event type's share of the total absolute odd-vs-even-day volume
    * change, conserving exactly 10⁶ ppm across segments. */
  private[graft] def contributionQuery(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
    graft.operators.Analytics.contributionAnalysis(
        Tables.events(s, dir), "event_type",
        day % 2 === 0, day % 2 === 1)
      .orderBy(col("segment"))
  }

  /** Heavy hitters (q201): every event type holding ≥ 5% of the
    * events, exact counts, via the Count–Min candidate pass — the
    * bounded-exchange alternative to a full key rollup. */
  private[graft] def heavyHittersQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.heavyHitters(
        Tables.events(s, dir), "event_type", minSharePpm = 50000L)
      .orderBy(col("n_rows").desc, col("key"))

  /** KS drift (q199): the supremum CDF gap between English and
    * German document lengths in exact ppm — the covariate-shift
    * screen between any two corpus slices. */
  private[graft] def ksDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.ksDrift(Tables.documents(s, dir), "lang", col("n_chars"),
      groupA = "en", groupB = "de")
  }

  /** Schema drift (q197): two generations of an events extract —
    * a column dropped, one added, one type-widened to string, and
    * null-rate movement on the kept ones. */
  private[graft] def schemaDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    val e = Tables.events(s, dir)
    val oldSnap = e.select(col("event_id"), col("user_id"),
      col("event_type"),
      when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
        .as("value"),
      col("props").as("legacy"))
    val newSnap = e.select(col("event_id"),
      when(col("event_id") % 5 === 0, lit(null)).otherwise(col("user_id"))
        .as("user_id"),
      col("event_type"), col("value").cast("string").as("value"),
      col("props").as("extra"))
    Curation.schemaDriftAudit(oldSnap, newSnap).orderBy(col("column"))
  }

  /** Revenue Pareto (q196): the Lorenz curve of per-customer revenue
    * in ten equal-count buckets — "the top decile drives what share",
    * exact cumulative ppm, no global sort of customers. */
  private[graft] def revenueParetoQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val rev = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        Seq("o_orderkey"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("revenue"))
    Analytics.lorenzCurve(rev, col("revenue"), buckets = 10)
      .orderBy(col("bucket"))
  }

  /** A/B test harness (q195): deterministic hash-split arms, purchase
    * conversion per arm, pooled two-proportion z — the
    * experimentation primitive with no framework dependency. */
  private[graft] def abTestQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.abTestHarness(Tables.events(s, dir), "user_id",
      "event_type", conversionType = "purchase", salt = "exp1")
  }

  /** Cohort-split funnel (q194): the q166 windowed funnel broken out
    * by signup week — "did the new onboarding cohort convert better".
    * The week comes from PURE integer arithmetic on the resolved
    * epoch seconds (Monday-aligned days-since-epoch, 1970-01-05 was
    * a Monday), so no engine timezone can skew the bucket. */
  private[graft] def cohortFunnelQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val steps = Seq("signup", "view", "click", "purchase")
    val reach = Analytics.windowedFunnelResolved(Tables.events(s, dir),
      "user_id", "ts", "event_type", steps, windowSecs = 172800L)
    val cohort = reach.withColumn("cw",
      date_add(lit("1970-01-01").cast("date"),
        (lit(4L) + lit(7L) * expr("(m0 div 86400 - 4) div 7"))
          .cast("int")))
    val counts = cohort.groupBy(col("cw"))
      .agg(count(col("m0")).as("n0"),
        steps.indices.tail.map(i => count(col(s"m$i")).as(s"n$i")): _*)
    counts.select(col("cw"), explode(array(steps.zipWithIndex.map {
        case (st, i) => struct(lit(i.toLong).as("step_idx"),
          lit(st).as("step"), col(s"n$i").as("n_users"))
      }: _*)).as("s"), col("n0"))
      .select(col("cw").cast("string").as("cohort_week"),
        col("s.step_idx"), col("s.step"), col("s.n_users"),
        expr("s.n_users * 1000000 div n0").as("conversion_ppm"))
      .orderBy(col("cohort_week"), col("step_idx"))
  }

  /** Session depth histogram (q192): how long and how deep sessions
    * run — q35's session windows rolled into log₂ event-count
    * buckets (the q174 integer-log₂ convention), with span extremes
    * per bucket. */
  private[graft] def sessionDepthQuery(s: SparkSession, dir: String): DataFrame = {
    val perSession = Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_seconds(max(col("ts"))) - unix_seconds(min(col("ts"))))
          .as("span_secs"))
    perSession
      .withColumn("bucket", length(bin(col("n_events"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        min(col("n_events")).as("min_events"),
        max(col("n_events")).as("max_events"),
        max(col("span_secs")).as("max_span_secs"))
      .orderBy(col("bucket"))
  }

  /** Week-over-week metrics (q193): per-type ISO-week counts with
    * the WoW delta in exact ppm — the first derivative every metrics
    * dashboard plots. */
  private[graft] def wowQuery(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .agg(count(lit(1)).as("n"))
    val byWk = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    weekly
      .withColumn("prev", lag(col("n"), 1).over(byWk))
      .select(col("event_type"), col("wk").cast("string").as("week"),
        col("n"), col("prev"),
        when(col("prev").isNotNull && col("prev") > 0,
          expr("(n - prev) * 1000000 div prev")).as("wow_delta_ppm"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Weekly retention triangle (q189): cohort week × week offset
    * distinct returners in exact ppm — the growth chart, on ISO
    * Monday weeks in both engines. */
  private[graft] def weeklyRetentionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.weeklyRetention(Tables.events(s, dir), "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Funnel step latency (q188): p25/p50/p75 of the per-user
    * resolution gap for each consecutive step pair of the q166
    * windowed funnel — where users stall, in exact order
    * statistics. */
  private[graft] def funnelLatencyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.funnelStepLatency(Tables.events(s, dir), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"),
        windowSecs = 172800L, pcts = Seq(25, 50, 75))
      .orderBy(col("pair"), col("pct"))
  }

  /** Weekday-adjusted anomalies (q186): each day scored against its
    * own weekday's distribution — the seasonal repair of q123's
    * trailing z-score (a quiet Sunday is normal; the same count on a
    * Tuesday is an incident). */
  private[graft] def weekdayZscoreQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.weekdayAdjustedZscore(Tables.events(s, dir), "ts", "event_type")
      .orderBy(col("key"), col("day"))
  }

  /** Benford audit (q187): first-digit distribution of cent-quantized
    * extended prices vs the log₁₀(1+1/d) expectation — the
    * fraud/data-quality screen, literal-driven on both sides. */
  private[graft] def benfordQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.benfordAudit(Tables.lineitem(s, dir),
        round(col("l_extendedprice") * 100))
      .orderBy(col("digit"))
  }

  /** Edit-distance join (q183): customers fuzzy-matched against a
    * mutated copy (every 7th name grows a trailing char) at ED ≤ 1
    * via deletion neighborhoods — digit-neighbour key collisions
    * ("…001" vs "…002") surface as genuine distance-1 pairs, the
    * entity-resolution shape. */
  /** The q183/q243 shared fuzzy-match sides: customers vs a mutated
    * copy (every 7th name grows a trailing char). */
  private[graft] def editJoinSides(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val c = Tables.customer(s, dir)
    val left = c.select(col("c_custkey").as("id"), col("c_name").as("name"))
    val right = c.select(col("c_custkey").as("id"),
      when(col("c_custkey") % 7 === 3, concat(col("c_name"), lit("x")))
        .otherwise(col("c_name")).as("name"))
    (left, right)
  }

  /** The q183/q243 shared df-cap: 48 postings per variant key — does
    * NOT bind on the real corpus (max postings 29 at sf0.01, 38 at
    * sf0.1, measured), DOES bind on the adversarially dense
    * sequential-id key space (the g10 1.5M-customer fixture: 150k
    * hot keys carrying half the postings mass; capping them cuts the
    * candidate relation 397M → 16.5M, measured in DuckDB). */
  private[graft] val EditJoinVariantDfCap = 48

  private[graft] def editJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val (left, right) = editJoinSides(s, dir)
    TextDedup.editDistanceJoin(left, right, "id", "name",
        variantDfCap = EditJoinVariantDfCap)
      .orderBy(col("left_id"), col("right_id"))
  }

  /** Edit-join cap audit (q243): the under-join report for q183's
    * df-cap, run at variantDfCap = 16 so the cap BINDS on the real
    * corpus (sf0.01 has 150 variant keys over 16 postings, measured)
    * and the dropped-mass accounting is oracle-exercised. */
  private[graft] def editJoinCapAuditQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val (left, right) = editJoinSides(s, dir)
    TextDedup.editDistanceCapAudit(left, right, "id", "name",
        variantDfCap = 16)
      .orderBy(col("side"))
  }

  /** Guard health, BINDING settings (q247): the K214 operational
    * sheet — every dedup-family cap/budget audited at settings tight
    * enough to bind on the real corpus (degreeCap/df-cap 16, budget
    * 100 pairs), so the binding-row shapes (guard, n_affected,
    * magnitude) are oracle-exercised end to end. */
  private[graft] def guardHealthQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val (l, r) = editJoinSides(s, dir)
    TextDedup.guardHealth(Tables.documents(s, dir), "doc_id", "text",
        degreeCap = 16, pairBudget = 100L)
      .unionByName(TextDedup.editGuardHealth(l, r, "id", "name",
        variantDfCap = 16, pairBudget = 100L))
      .orderBy(col("guard"))
  }

  /** Guard health, PRODUCTION settings (q248): the same sheet at the
    * defaults the cascade family actually runs with (degreeCap 100,
    * the 100M pair budget, the q183 df-cap 48) — ZERO rows, and the
    * oracle re-derives the emptiness: this corpus's nothing-binds
    * CERTIFICATE, the row a nightly health report carries to say the
    * guards exist and none of them is silently trading accuracy. */
  private[graft] def guardHealthClearQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val (l, r) = editJoinSides(s, dir)
    TextDedup.guardHealth(Tables.documents(s, dir), "doc_id", "text")
      .unionByName(TextDedup.editGuardHealth(l, r, "id", "name",
        variantDfCap = EditJoinVariantDfCap))
      .orderBy(col("guard"))
  }

  /** Delta-maintained key stats (q182): the diagnostics-state tick —
    * counts/counts-of-counts/sufficient-stats are BUILT over an old
    * events snapshot, one [[graft.jobs.KeyStatsMaintenance]] tick
    * brings them to the new snapshot at O(changed) cost (deleted
    * events, plus every id%10==5 event REASSIGNED to a new user — the
    * key-change path), and the output sheet (entropy + Gini) derives
    * from the MAINTAINED state. The DuckDB oracle computes both
    * statistics directly over the new snapshot — the hash compare IS
    * the delta≡rebuild gate (the q141 contract extended to the
    * distribution diagnostics). */
  private[graft] def keyStatsNightlyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.jobs.KeyStatsMaintenance
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"))
    val oldSnap = e.filter(col("event_id") % 10 =!= 3)
    val newSnap = e.filter(col("event_id") % 10 =!= 7)
      .select(col("event_id"),
        when(col("event_id") % 10 === 5, col("user_id") + 1000000L)
          .otherwise(col("user_id")).as("user_id"))
    val st = KeyStatsMaintenance.rebuild(oldSnap, "user_id")
    KeyStatsMaintenance.stats(
      KeyStatsMaintenance.tick(st, oldSnap, newSnap, "event_id", "user_id"))
  }

  /** Reliability diagram (q270): the K52 hashed quality scorer's
    * calibration against the lang=='en' label, 10 equal-width score
    * bins — the audit run before trusting a score threshold. */
  private[graft] def reliabilityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Analytics, TextAnalysis}
    val d = Tables.documents(s, dir)
    val scored = TextAnalysis.hashedQualityScoreMapOnly(d, "doc_id", "text")
      .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
    Analytics.reliabilityDiagram(scored, col("score"),
        col("lang") === "en", nBins = 10)
      .orderBy(col("bin"))
  }

  /** U-shaped position attribution (q271): 40/20/40 credit over the
    * q153/q175 channel set — the attribution family's fourth member,
    * middle-split remainder pinned to the FIRST touch. */
  private[graft] def positionAttributionQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.positionAttribution(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .orderBy(col("channel"))

  /** PSI drift (q274): the K52 hashed quality score over the q141/q242
    * old/new snapshot pair — the baseline snapshot fixes the 10-bin
    * grid, the patched snapshot's scores clamp into it, per-bin PSI
    * terms in exact micro units. */
  private[graft] def psiDriftQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Analytics, TextAnalysis}
    val (o, n) = cardSnapshotFixture(s, dir)
    val so = TextAnalysis.hashedQualityScoreMapOnly(o, "doc_id", "text")
      .select(lit("base").as("snap"), col("score"))
    val sn = TextAnalysis.hashedQualityScoreMapOnly(n, "doc_id", "text")
      .select(lit("cur").as("snap"), col("score"))
    Analytics.psiDrift(so.unionByName(sn), "snap", col("score"),
        baseline = "base", current = "cur", nBins = 10)
      .orderBy(col("bin"))
  }

  /** Shared preference-match fixture for q277/q278: per (user, day),
    * every unordered event-type pair with UNEQUAL counts yields one
    * match won by the more-frequent type — a deterministic stand-in
    * for pairwise model comparisons, derived with one count rollup
    * and a (user, day)-keyed self-join whose per-group fan-out is
    * bounded by the 5-type enum (≤ 10 pairs). */
  private[graft] def eventPreferenceMatches(
      s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"), dayOf(col("ts")).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
    val a = c.select(col("user_id"), col("day"),
      col("event_type").as("ta"), col("c").as("ca"))
    val b = c.select(col("user_id"), col("day"),
      col("event_type").as("tb"), col("c").as("cb"))
    a.join(b, Seq("user_id", "day"))
      .filter(col("ta") < col("tb") && col("ca") =!= col("cb"))
      .select(
        when(col("ca") > col("cb"), col("ta")).otherwise(col("tb"))
          .as("winner"),
        when(col("ca") > col("cb"), col("tb")).otherwise(col("ta"))
          .as("loser"))
  }

  /** Cohen's kappa (q276): chance-corrected agreement between two
    * deterministic document raters — the K52 hashed quality score in
    * 3 classes vs a raw-length tercile rule. Near-independent raters,
    * so the gate exercises the chance correction, not just p_o. */
  private[graft] def cohenKappaQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Analytics, TextAnalysis}
    val docs = Tables.documents(s, dir)
    val scored = TextAnalysis
      .hashedQualityScoreMapOnly(docs, "doc_id", "text")
      .select(col("doc_id"), col("score"))
    val j = docs.select(col("doc_id"), length(col("text")).as("len"))
      .join(scored, Seq("doc_id"))
    Analytics.cohenKappa(j,
      when(col("score") < 0, "low").when(col("score") < 2000, "mid")
        .otherwise("high"),
      when(col("len") < 200, "low").when(col("len") < 400, "mid")
        .otherwise("high"))
  }

  /** Bradley–Terry strengths (q277): MM-fit preference strengths over
    * the event-type match fixture, 4 unrolled rounds, exact µ-units —
    * the oracle repeats every round as its own CTE. */
  private[graft] def bradleyTerryQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.bradleyTerry(
        eventPreferenceMatches(s, dir), "winner", "loser", iters = 4)
      .orderBy(col("item"))

  /** Win-rate matrix (q278): per event-type pair, the lesser item's
    * exact win share plus Wilson 95% bounds — the eval sheet read
    * next to q277's fitted strengths. */
  private[graft] def winRateMatrixQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.winRateMatrix(
        eventPreferenceMatches(s, dir), "winner", "loser")
      .orderBy(col("item_a"), col("item_b"))

  /** Preference pairs (q279): DPO-style chosen/rejected assembly —
    * 25-doc prompt groups over the hashed quality score, margin ≥ 500,
    * smallest-id ties on both sides. */
  private[graft] def preferencePairsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, TextAnalysis}
    val scored = TextAnalysis
      .hashedQualityScoreMapOnly(Tables.documents(s, dir), "doc_id", "text")
      .withColumn("prompt", expr("doc_id div 25"))
    Curation.preferencePairs(scored, "prompt", "doc_id", col("score"),
        minMargin = 500L)
      .orderBy(col("prompt"))
  }

  /** Quantile-sketch audit (q280): percentile_approx — the mergeable
    * 100 TB quantile path — certified against its rank-error contract
    * on the lineitem cents histogram; the oracle pins within_eps
    * (the q241 sketch-audit convention) and re-derives (group, n). */
  private[graft] def quantileSketchAuditQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.quantileSketchAudit(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
        "l_returnflag", col("cents"),
        Seq(10000L, 250000L, 500000L, 750000L, 990000L),
        accuracy = 10000)
      .orderBy(col("l_returnflag"), col("pctile_ppm"))

  /** Brier decomposition (q281): a PERFECTLY-calibrated synthetic
    * forecaster (outcome drawn under its own stated probability via
    * an independent hash) — reliability reads near zero, resolution
    * near its uncertainty share; every term exact micro integers. */
  private[graft] def brierQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    val base = Tables.documents(s, dir).select(
      (pmod(md5Hash60(concat(lit("cal:"), col("doc_id").cast("string"))),
        lit(1001L)) * 1000L).as("p_ppm"),
      (pmod(md5Hash60(concat(lit("out:"), col("doc_id").cast("string"))),
        lit(1000000L)) <
        pmod(md5Hash60(concat(lit("cal:"), col("doc_id").cast("string"))),
          lit(1001L)) * 1000L).as("outcome"))
    graft.operators.Analytics.brierDecomposition(base, col("p_ppm"),
      col("outcome"), nBins = 10)
  }

  /** Rolling-origin CV folds (q282): 4 expanding-window folds with a
    * 5-day test horizon over the events day span — the temporal-
    * leakage-free evaluation protocol next to the q258 embargo. */
  private[graft] def rollingFoldsQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.rollingOriginFolds(
        Tables.events(s, dir), col("ts"), nFolds = 4, horizonDays = 5)
      // dates → ISO strings for the gate (the q273 day convention)
      .select(col("fold"), col("train_from").cast("string").as("train_from"),
        col("test_from").cast("string").as("test_from"),
        col("test_until").cast("string").as("test_until"),
        col("n_train"), col("n_test"))
      .orderBy(col("fold"))

  /** Shared q283/q284/q285 fixture: per-user PRE/POST event counts
    * split at the corpus midpoint day (min day + 14 — derived, not
    * hardcoded, so every SF splits its own span), a deterministic
    * hash treatment CORRELATED with pre-period activity (the
    * confound q283 exists to correct), and the pre-derived
    * propensity score. One user rollup; everything after is
    * users-sized. */
  private[graft] def causalUnits(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    val e = Tables.events(s, dir)
      .select(col("user_id").as("u"), dayOf(col("ts")).as("day"))
    val cut = e.agg(date_add(min(col("day")), 14).as("cut"))
    val units = e.crossJoin(broadcast(cut))
      .groupBy(col("u"))
      .agg(count(when(col("day") <= col("cut"), 1)).as("pre"),
        count(when(col("day") > col("cut"), 1)).as("post"))
    units
      .withColumn("score_ppm",
        least(lit(1000000L), col("pre") * 50000L))
      .withColumn("treated",
        pmod(md5Hash60(concat(lit("trt:"), col("u").cast("string"))),
          lit(1000000L)) <
          lit(200000L) + least(lit(600000L), col("pre") * 30000L))
  }

  /** Propensity-matched ATT (q283): treatment is hash-assigned with
    * probability rising in pre-period activity — the naive treated
    * minus control gap is confounded; matching on the pre-derived
    * score within a 25k-ppm caliper removes it. */
  private[graft] def propensityMatchQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.propensityMatch(causalUnits(s, dir),
      col("treated"), col("score_ppm"), col("post"), caliperPpm = 25000L)

  /** Difference-in-differences (q284): the same units unpivoted to
    * (treated, period, count) observations; cell means and the DiD
    * estimate in exact micro units. */
  private[graft] def diffInDiffQuery(s: SparkSession, dir: String): DataFrame = {
    val u = causalUnits(s, dir)
    val long = u.select(col("treated"), lit(false).as("p"), col("pre").as("v"))
      .unionByName(
        u.select(col("treated"), lit(true).as("p"), col("post").as("v")))
    graft.operators.Analytics.diffInDiff(long, col("treated"), col("p"),
      col("v"))
  }

  /** CUPED adjustment (q285): pre-period count as the covariate for
    * the post-period metric, per treatment arm — θ and the achieved
    * variance-reduction share, plus exact adjusted means. */
  private[graft] def cupedQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.cupedAdjust(causalUnits(s, dir),
        "treated", col("pre"), col("post"))
      .orderBy(col("treated"))

  /** McNemar paired test (q286): two hash "models" with 70%/60%
    * copy-the-truth accuracy against a modular truth — the discordant
    * cells carry the signal, continuity-corrected chi2 exact micro. */
  private[graft] def mcnemarQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    val truth = pmod(col("doc_id"), lit(3L))
    val d = Tables.documents(s, dir).select(
      truth.cast("string").as("t"),
      when(pmod(md5Hash60(concat(lit("ma:"), col("doc_id").cast("string"))),
        lit(10L)) < 7, truth).otherwise(pmod(truth + 1, lit(3L)))
        .cast("string").as("a"),
      when(pmod(md5Hash60(concat(lit("mb:"), col("doc_id").cast("string"))),
        lit(10L)) < 6, truth).otherwise(pmod(truth + 2, lit(3L)))
        .cast("string").as("b"))
    graft.operators.Analytics.mcnemarTest(d, col("a"), col("b"), col("t"))
  }

  /** Minimum detectable effect (q287): the power read over the causal
    * fixture's two hash arms on the post-period metric — exact arm
    * moments, one stated IEEE sqrt chain for the MDE itself. */
  private[graft] def mdeQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.minDetectableEffect(
      causalUnits(s, dir).select(col("treated").cast("string").as("arm"),
        col("post")),
      "arm", col("post"))

  /** Experiment readout sheet (q291): the q200 health-report
    * discipline applied to the experimentation family — ONE relation
    * carrying the fixed-horizon z-test (q195), the CUPED-adjusted
    * means and variance-reduction share (q285), the minimum
    * detectable effect (q287), and the label-quality reads (q276
    * kappa, q286 McNemar) for the planted experiment. Pure reuse of
    * the gated operators: every number on the sheet is the SAME
    * number its source query publishes. */
  private[graft] def experimentReadoutQuery(
      s: SparkSession, dir: String): DataFrame = {
    def sheet(df: DataFrame, pairs: (String, String)*): DataFrame =
      df.select(expr("stack(" + pairs.length + ", " +
        pairs.map { case (m, c) => s"'$m', CAST($c AS BIGINT)" }
          .mkString(", ") + ") AS (metric, value)"))
    val cup = sheet(
      cupedQuery(s, dir).agg(
        max(when(col("treated") === "true", col("n_g"))).as("nt"),
        max(when(col("treated") === "false", col("n_g"))).as("nc"),
        max(when(col("treated") === "true", col("mean_micro"))).as("mt"),
        max(when(col("treated") === "false", col("mean_micro"))).as("mc"),
        max(when(col("treated") === "true", col("adjusted_micro"))).as("at"),
        max(when(col("treated") === "false", col("adjusted_micro"))).as("ac"),
        max(col("theta_ppm")).as("th"), max(col("rho2_ppm")).as("rh")),
      "cuped_n_treated" -> "nt", "cuped_n_control" -> "nc",
      "cuped_mean_treated_micro" -> "mt", "cuped_mean_control_micro" -> "mc",
      "cuped_adj_treated_micro" -> "at", "cuped_adj_control_micro" -> "ac",
      "cuped_theta_ppm" -> "th", "cuped_rho2_ppm" -> "rh")
    val mde = sheet(mdeQuery(s, dir),
      "mde_abs_micro" -> "mde_abs_micro", "mde_rel_ppm" -> "mde_rel_ppm")
    val ab = sheet(abTestQuery(s, dir),
      "ab_n_a" -> "n_a", "ab_x_a" -> "x_a",
      "ab_n_b" -> "n_b", "ab_x_b" -> "x_b",
      "ab_rate_a_ppm" -> "rate_a_ppm", "ab_rate_b_ppm" -> "rate_b_ppm",
      "ab_z_micro" -> "round(z * 1000000.0)",
      "ab_significant" -> "CASE WHEN significant THEN 1 ELSE 0 END")
    val kap = sheet(cohenKappaQuery(s, dir),
      "label_kappa_ppm" -> "kappa_ppm",
      "label_po_ppm" -> "po_ppm", "label_pe_ppm" -> "pe_ppm")
    val mcn = sheet(mcnemarQuery(s, dir),
      "label_mcnemar_chi2_micro" -> "chi2_micro",
      "label_mcnemar_a_only" -> "n_a_only",
      "label_mcnemar_b_only" -> "n_b_only")
    Seq(cup, mde, ab, kap, mcn).reduce(_ unionByName _)
      .orderBy(col("metric"))
  }

  /** mSPRT sequential monitor (q292): the always-valid p over the
    * q195 experiment replayed day by day — each active USER-DAY is a
    * unit (did that user convert that day) in its hash arm, and the
    * monitor reports the running mixture-LR evidence and the p an
    * experimenter may read EVERY day without alpha inflation (the
    * peeking problem the fixed-horizon z-test has). ~30 daily
    * readings at every SF, so the sequential path is genuinely
    * exercised. */
  private[graft] def msprtQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    val perUnit = Tables.events(s, dir)
      .select(col("user_id").cast("string").as("u"),
        dayOf(col("ts")).as("d"),
        when(col("event_type") === "purchase", 1L).as("p"))
      .groupBy(col("u"), col("d"))
      .agg(max(col("p")).as("_c"))
      .select(col("d"),
        pmod(md5Hash60(concat(lit("ab:exp1:"), col("u"))), lit(2L)).as("arm"),
        coalesce(col("_c"), lit(0L)).as("conv"))
    graft.operators.Analytics.msprtMonitor(perUnit,
        col("d"), col("arm"), col("conv"), tau2Micro = 10000L)
      .withColumn("day", col("day").cast("string"))
      .orderBy(col("day"))
  }

  /** Per-user (views, purchases) units in the q195 hash arms — the
    * shared fixture for the ratio-metric and SRM reads. */
  private def abRatioUnits(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup.md5Hash60
    Tables.events(s, dir)
      .groupBy(col("user_id").cast("string").as("u"))
      .agg(count(when(col("event_type") === "view", 1)).as("x"),
        count(when(col("event_type") === "purchase", 1)).as("y"))
      .select(pmod(md5Hash60(concat(lit("ab:exp1:"), col("u"))), lit(2L))
        .as("arm"), col("x"), col("y"))
  }

  /** Ratio-metric delta-method CI (q293): purchases PER VIEW per arm
    * — the correlated-numerator variance read the per-user mean CI
    * gets wrong. Exact arm moments, exact ppm ratio, one stated IEEE
    * chain for the se and the ±1.96 band. */
  private[graft] def ratioMetricQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.ratioMetricCi(abRatioUnits(s, dir),
        "arm", col("x"), col("y"))
      .orderBy(col("arm"))

  /** Sample-ratio-mismatch audit (q294): is the realized split of the
    * q195 hash assignment compatible with 50/50 — the plumbing check
    * that must pass before any experiment metric is read. */
  private[graft] def srmQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.srmCheck(abRatioUnits(s, dir), col("arm"))

  /** Temperature-0.5 mixture (q288): the √-share rebalance over the
    * documents source column — low-resource sources lift, the
    * bottleneck source keeps 100%, every rate exact ppm. */
  private[graft] def temperatureMixtureQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.temperatureMixture(
        Tables.documents(s, dir), "source")
      .orderBy(col("source"))

  /** Exact trimmed mean (q275): 5%-each-side robust price mean per
    * return flag, histogram-order-statistic form — the partial
    * boundary-class take makes it row-trim-exact. */
  private[graft] def trimmedMeanQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.trimmedMean(
        Tables.lineitem(s, dir).select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
        "l_returnflag", col("cents"), trimPpm = 50000L)
      .orderBy(col("l_returnflag"))

  /** k-anonymity audit (q179): how much of the corpus a
    * (lang, source, length-bucket) quasi-identifier tuple still
    * singles out at k = 5 — the release-gate companion to q54's PII
    * redaction. */
  private[graft] def kAnonymityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.kAnonymityAudit(
      Tables.documents(s, dir).select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket")),
      Seq("lang", "source", "len_bucket"), k = 5)
  }

  /** Salted two-stage aggregation (q162): the hot-key rollup spread
    * over (key, salt) reducers then re-aggregated — must equal the
    * plain GROUP BY exactly (integer sums; the K14 salt-invisibility
    * contract on the aggregation side). */
  private[graft] def saltedAggQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SkewJoin
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
    SkewJoin.saltedAgg(li, "l_returnflag", Seq("qty"), salt = 16)
      .orderBy(col("l_returnflag"))
  }

  /** Pre-join cardinality audit (q163): exact |lineitem ⋈ orders| plus
    * the worst contributing key, from the key-count relations only —
    * the explosion check an operator runs BEFORE the shuffle. */
  private[graft] def joinCardinalityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.joinCardinalityAudit(
      Tables.lineitem(s, dir), "l_orderkey",
      Tables.orders(s, dir), "o_orderkey")
  }

  /** Top user paths (q164): each user's first five events as a
    * `a>b>c` journey string, ranked by user count — the pathfinder
    * view next to q122's one-step transition matrix. */
  private[graft] def topPathsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.topPaths(Tables.events(s, dir), "user_id", "ts", "event_type",
      maxSteps = 5, topK = 20)
  }

  /** SCD2 merge (q165): one type-2 versioning pass over the customer
    * dimension exercising all five cases — version (%10==3, with an
    * older superseded update), equal no-op (%10==6), late-update
    * no-op (%10==4, ts 900 ≤ valid_from 1000), untouched keys, and
    * inserts (%10==9 under key+100000) — plus history passthrough
    * (%10==0 carries a closed prior version). */
  private[graft] def scd2Query(s: SparkSession, dir: String): DataFrame = {
    import graft.store.Scd2
    val c = Tables.customer(s, dir)
    def nk(delta: Int) = (col("c_nationkey") + delta).cast("long").as("c_nationkey")
    val current = c.select(col("c_custkey"), col("c_name"), nk(0),
      lit(1000L).as("valid_from"), lit(null).cast("long").as("valid_to"))
    val history = c.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"), nk(100),
        lit(500L).as("valid_from"), lit(1000L).as("valid_to"))
    val dim = current.unionByName(history)
    def upd(m: Int, delta: Int, ts: Long) = c.filter(col("c_custkey") % 10 === m)
      .select(col("c_custkey"), col("c_name"), nk(delta), lit(ts).as("ts"))
    val updates = upd(3, 1, 2000L)
      .unionByName(upd(3, 50, 1500L)) // superseded by the collapse
      .unionByName(upd(6, 0, 2000L)) // equal attrs: no-op
      .unionByName(upd(4, 7, 900L)) // late: rejected
      .unionByName(c.filter(col("c_custkey") % 10 === 9)
        .select((col("c_custkey") + 100000L).as("c_custkey"), col("c_name"),
          nk(0), lit(2000L).as("ts"))) // inserts
    Scd2.merge(dim, updates, "c_custkey", Seq("c_name", "c_nationkey"), "ts")
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Windowed funnel (q166): signup → view → click → purchase with a
    * 48 h per-step deadline — each step's qualifying minimum is
    * conditional on the previous step's resolved time, the semantics
    * the plain q120 funnel cannot express. */
  private[graft] def windowedFunnelQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.windowedFunnel(Tables.events(s, dir), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"),
        windowSecs = 172800L)
      .orderBy(col("step_idx"))
  }

  /** Exact percentile bands (q169): p25/p50/p75 of cent-quantized
    * event values per type — the histogram-prefix order statistic as
    * a reusable operator (bounded memory where percentile() buffers
    * every group value). */
  private[graft] def exactPercentilesQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.exactPercentiles(Tables.events(s, dir), "event_type",
        round(col("value") * 100), Seq(25, 50, 75))
      .select(col("key").as("event_type"), col("pct"),
        col("value").as("value_cents"))
      .orderBy(col("event_type"), col("pct"))
  }

  /** Key entropy (q170): the shuffle-balance score of the user_id
    * distribution in integer micro-nats vs the ln(K) maximum. */
  private[graft] def keyEntropyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.keyEntropy(Tables.events(s, dir), "user_id")
  }

  /** Referential-integrity audit (q171): orphan-row counts for three
    * FK edges of the warehouse star — lineitem→orders (clean),
    * orders→customer with the parent restricted to `c_custkey % 7 <> 3`
    * and every 13th order's FK nulled (exercises the orphan AND the
    * null-FK paths), customer→nation restricted to `n_nationkey < 20`. */
  private[graft] def fkIntegrityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r1 = Analytics.fkIntegrityAudit(
      li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
    val r2 = Analytics.fkIntegrityAudit(
      o.select(when(col("o_orderkey") % 13 === 5, lit(null))
        .otherwise(col("o_custkey")).as("o_custkey")),
      "o_custkey",
      c.filter(col("c_custkey") % 7 =!= 3), "c_custkey",
      "orders->customer")
    val r3 = Analytics.fkIntegrityAudit(
      c, "c_nationkey",
      n.filter(col("n_nationkey") < 20), "n_nationkey",
      "customer->nation")
    r1.unionByName(r2).unionByName(r3).orderBy(col("relation"))
  }

  /** Key-concentration Gini (q172): the 0…1e6-ppm concentration score
    * of the user_id distribution, from the counts-of-counts histogram
    * — completes the pre-shuffle triptych (q140 offenders, q170
    * balance, q172 concentration). */
  private[graft] def keyGiniQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.keyGini(Tables.events(s, dir), "user_id")
  }

  /** Weekday seasonality (q173): between-group variance share of the
    * per-type daily series grouped by weekday, in ppm — "is this
    * metric weekly-periodic, and which weekday peaks". */
  private[graft] def weekdaySeasonalityQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.weekdaySeasonality(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** Inter-event gap histogram (q174): per-user consecutive-event
    * gaps in power-of-two second buckets — the empirical basis for
    * every session-gap parameter. */
  private[graft] def eventGapsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.interEventGaps(Tables.events(s, dir), "user_id", "ts",
        "event_type")
      .orderBy(col("bucket"))
  }

  /** q176 shared constant: power-iteration count — drives BOTH the
    * Spark loop and the unrolled oracle CTEs (the kmeansCtesSql
    * pattern: one constant, two engines). */
  private[graft] val stationaryIters = 8

  /** Markov stationary distribution (q176): equilibrium state mass of
    * the event-type transition chain in exact integer ppm — q122's
    * one-step matrix run to its fixed point. */
  private[graft] def stationaryQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.stationaryDistribution(Tables.events(s, dir), "user_id",
        "ts", "event_type", "event_id", iters = stationaryIters)
      .orderBy(col("event_type"))
  }

  /** Weighted sample (q177): 100 documents drawn by n_chars weight —
    * deterministic Efraimidis–Spirakis A-ES, the curation sampler
    * between q51's uniform rate and q74's exact-N uniform. */
  private[graft] def weightedSampleQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    Curation.weightedSample(Tables.documents(s, dir), "doc_id",
        col("n_chars"), n = 100)
      .orderBy(col("cost_nano"), col("doc_id"))
  }

  /** Linear attribution (q175): every purchase splits exactly 10⁶ ppm
    * of credit equally across its prior signup/view/click touches
    * (remainder to the last touch) — q153's fair-split twin. */
  private[graft] def linearAttributionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.linearAttribution(Tables.events(s, dir), "user_id", "ts",
        "event_type", conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .orderBy(col("channel"))
  }

  /** Conversion latency (q155): integer seconds from each user's
    * first signup to their first purchase (strict order), summarized
    * by exact order statistics — n, min, lower-median, max. */
  private[graft] def conversionLatencyQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.conversionLatency(Tables.events(s, dir), "user_id", "ts",
      "event_type", fromType = "signup", toType = "purchase")
  }

  /** MAD outlier gate (q154): per event type, the exact lower-median
    * and median-absolute-deviation of daily counts plus the
    * |v−med| > 3·MAD outlier count — the robust spread pairing
    * q150's robust center; pure order statistics, no floats. */
  private[graft] def madQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.madOutliers(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** Last-touch attribution (q153): every purchase credits the most
    * recent strictly-earlier signup/view/click of the same user — the
    * as-of join folded into one per-user window pass, deterministic
    * under timestamp ties via the range frame + order-independent
    * max-string rule. */
  private[graft] def attributionQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.lastTouchAttribution(Tables.events(s, dir), "user_id", "ts",
        "event_type", conversionType = "purchase",
        channelTypes = Seq("signup", "view", "click"))
      .orderBy(col("channel"))
  }

  /** Multi-probe SRP ANN (q152): each query probes its own 6-bit
    * sign-projection bucket plus the two buckets across its
    * lowest-margin hyperplanes — the recall knob q26's single-probe
    * path lacks — with the standard inline brute-force audit flag. */
  private[graft] def multiProbeAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.multiProbeTopK(q, c, dims = 64, nbits = 6, nprobe = 2, k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  /** Lag-7 autocorrelation (q151): weekly-rhythm detection per event
    * type — exact scaled-integer numerator/denominator, one final
    * rounded division. Completes the series family: anomaly (q123),
    * break day (q149), trend (q150), periodicity (q151). */
  private[graft] def autocorrQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.autocorrelation(Tables.events(s, dir), "event_type", "ts",
        lag = 7)
      .orderBy(col("event_type"))
  }

  /** Theil–Sen robust trend (q150): per event type, the median of all
    * pairwise daily-count slopes — the outlier-proof trend the K77
    * least-squares fit isn't; pairs bounded by days², exact integer
    * (dv, dd) median pair plus the rounded slope. */
  private[graft] def theilSenQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.theilSenTrend(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** CUSUM changepoints (q149): per event type, the day the daily
    * count series most likely level-shifted — exact scaled-integer
    * cumulative sums (v·n − total, so the mean never divides), peak
    * by |S| with earliest-day ties, break size in ppm. */
  private[graft] def cusumQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.cusumChangepoint(Tables.events(s, dir), "event_type", "ts")
      .orderBy(col("event_type"))
  }

  /** SAX time-series words (q147): each event type's 30-day count
    * series → 6 integer PAA means → 4-symbol equi-width bins → one
    * SAX word per type. Equality on the word buckets shape-similar
    * metrics — the LSH pattern pointed at time series. */
  private[graft] def saxWordsQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Analytics
    Analytics.saxWords(Tables.events(s, dir), "event_type", "ts",
        windows = 6, alphabet = 4)
      .orderBy(col("event_type"))
  }
  /** PIVOT sugar (q239): daily counts spread to one column per event
    * type — Spark's relational pivot with EXPLICIT values (the
    * two-arg form; value discovery would add a whole extra pass over
    * the fact table at 100 TB, so the enum is part of the contract,
    * exactly like the funnel steps). Missing cells fill 0. */
  /** The shared unsorted pivot rollup (q239/q240): q240 melts THIS,
    * not the sorted q239 output, so the inner presentation sort's
    * range exchange never stacks under the unpivot's own orderBy. */
  private def pivotDaily(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("signup", "view", "click", "purchase", "error")
    Tables.events(s, dir)
      .groupBy(dayOf(col("ts")).cast("string").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  private[graft] def pivotDailyQuery(s: SparkSession, dir: String): DataFrame =
    pivotDaily(s, dir).orderBy(col("day"))

  /** UNPIVOT sugar (q240): the inverse reshape — wide per-type columns
    * melt back to (day, event_type, n) rows via Spark's native unpivot
    * (map-only over the pivoted rollup; no shuffle beyond q239's).
    * Zero-filled cells drop so the round trip reproduces the plain
    * GROUP BY relation exactly (stated; an unpivot keeping zeros is
    * the q224 densify contract instead). */
  private[graft] def unpivotDailyQuery(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("signup", "view", "click", "purchase", "error")
    pivotDaily(s, dir)
      .unpivot(Array(col("day")), types.map(col).toArray, "event_type", "n")
      .filter(col("n") > 0)
      .orderBy(col("day"), col("event_type"))
  }

  /** HLL++ distinct audit (q241): the mergeable-sketch cardinality
    * path beside K17's KMV — approx_count_distinct is the bounded
    * state form that survives 100 TB groupBys where exact
    * countDistinct shuffles every key. Gate = the q42 convention: the
    * exact count hash-compares, the sketch must land within 5%
    * (deterministic at this rsd on this data). */
  private[graft] def hllDistinctQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("_approx") - col("n_exact")) <=
          greatest(col("n_exact") / 20, lit(1L))).as("approx_ok"))
      .orderBy(col("event_type"))

  /** Unigram-LM tokenizer TRAINING (q236): the SentencePiece-style
    * family next to BPE (K127) — hard-EM over the Zipf-bounded vocab,
    * integer micro-nat Viterbi costs (UnigramLm scaladoc states the
    * one libm quantize point). The gate compares the LEARNED TABLE
    * (piece, weighted usage count from the last E-step, final cost)
    * against a DuckDB re-derivation that unrolls the same EM rounds
    * as recursive-CTE Viterbi lattices over the same seed. */
  private[graft] def unigramTrainQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.UnigramLm.train(Tables.documents(s, dir), "text")
      .toDF("piece", "weighted_count", "cost_micro")
      .orderBy(col("weighted_count").desc, col("piece"))
  }

  /** Unigram train-then-encode (q237, the K128 twin for the unigram
    * family): learn the table, then Viterbi-encode every document —
    * per-doc piece stream, token counts and the exact integer cost
    * sum, all hash-compared against the DuckDB lattice replay. */
  private[graft] def unigramEncodeQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val table = graft.operators.UnigramLm.train(docs, "text")
    graft.operators.UnigramLm.encode(docs, "doc_id", "text", table)
      .orderBy(col("doc_id"))
  }

  /** Association rules (q250): part pairs co-bought within an order —
    * support/confidence/lift in exact ppm over the lineitem baskets,
    * top-100 by lift with full deterministic ties. basketCap = 100 is
    * non-binding on TPC-H (≤ 7 lineitems/order) and stated. */
  private[graft] def associationRulesQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.associationRules(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        minSupport = 2L)
      .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))
      .limit(100)

  /** RFM segmentation (q251): the 5×5×5 customer-value grid over
    * orders — exact quintile scores (ties share), cent-exact revenue
    * per segment. */
  private[graft] def rfmSegmentsQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.rfmSegments(
        Tables.orders(s, dir), "o_custkey", "o_orderdate",
        round(col("o_totalprice") * 100))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))

  /** Bloom-prefiltered join (q260): lineitem ⋈ urgent orders through
    * the broadcast key-Bloom — output-identical to the plain join the
    * oracle runs; the Bloom exists to shrink the fact exchange. */
  private[graft] def bloomJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    graft.operators.SkewJoin.bloomPrefilteredJoin(
        Tables.lineitem(s, dir), urgent, "l_orderkey", "o_orderkey")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("day"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("price_cents"))
      .orderBy(col("day"))
  }

  /** Activity heatmap (q264): weekday × hour grid with corpus and
    * weekday-local exact ppm shares. */
  private[graft] def activityHeatmapQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.activityHeatmap(Tables.events(s, dir), "ts")
      .orderBy(col("weekday"), col("hour"))

  /** Frequent triples (q263): Apriori-pruned 3-itemsets over lineitem
    * baskets at support ≥ 2, top-100 with full deterministic ties. */
  private[graft] def frequentTriplesQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.frequentTriples(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        minSupport = 2L)
      .orderBy(col("n_abc").desc, col("item_a"), col("item_b"),
        col("item_c"))
      .limit(100)

  /** Churn dataset (q262): leak-free feature/label rows at cutoff
    * min_day+14, 10-day label horizon — the supervised-training feed
    * with temporal hygiene built in. */
  private[graft] def churnDatasetQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.churnDataset(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        purchaseType = "purchase", cutoffOffsetDays = 14, horizonDays = 10)
      .orderBy(col("user_id"))

  /** Z-order locality audit (q261): the two-layout extent comparison
    * over (l_partkey, l_suppkey) at 64 buckets — the data-skipping
    * decision sheet. */
  private[graft] def zOrderAuditQuery(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.zOrderAudit(
        Tables.lineitem(s, dir), "l_partkey", "l_suppkey",
        bits = 16, bucketBits = 6)
      .orderBy(col("layout"))

  /** Temporal embargo split (q258): cutoff at min_day+14, 3-day purge
    * gap — per-split audit rows with the shared-entity count reported,
    * never silent. */
  private[graft] def temporalSplitQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.temporalSplit(
        Tables.events(s, dir), "ts", "user_id",
        cutoffOffsetDays = 14, embargoDays = 3)
      .orderBy(col("split"))

  /** Holt–Winters additive weekly (q256): level + trend + 7-slot
    * seasonal state in exact micro, α=0.3 β=0.2 γ=0.3 — the K193
    * smoother with the weekday cycle modeled instead of chased. */
  private[graft] def holtWintersQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.holtWinters(
        Tables.events(s, dir), "event_type", "ts",
        alphaPpm = 300000L, betaPpm = 200000L, gammaPpm = 300000L)
      .orderBy(col("event_type"), col("day"))

  /** Poisson-bootstrap CI (q252): per event type, the exact micro-unit
    * mean of `value` plus the five-number summary of 32 deterministic
    * Poisson-resampled replicate means — the one-pass CI at 100 TB. */
  private[graft] def bootstrapCiQuery(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.bootstrapCi(
        Tables.events(s, dir), "event_type", "event_id", col("value"),
        reps = 32)
      .orderBy(col("event_type"))
}

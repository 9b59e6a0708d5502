package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All hash primitives here are md5-based so a DuckDB oracle can mirror
  * them bit-for-bit; at production scale swap [[md5Hash60]] for
  * `xxhash64` (same shapes, one cheap codegen'd hash instead of md5).
  * Every operator is a pure column-expression lineage — no UDFs — so
  * whole-stage codegen applies throughout.
  *
  * Scale shapes:
  *  - exact dedup shuffles 8-byte hashes, never document bodies;
  *  - MinHash/LSH compares only within band buckets (the all-pairs
  *    cross join never exists);
  *  - SimHash bands 64-bit sketches into 15-bit chunks, so near-dup
  *    candidates join on chunk equality.
  */
object TextDedup {

  def norm(text: Column): Column = lower(trim(text))
  def words(text: Column): Column = split(text, " ")
  def wordSet(text: Column): Column = array_distinct(words(text))
  /** The dedup shingle base: word set of the NORMALIZED text, so
    * case/whitespace variants of a document sketch identically. */
  def normWordSet(text: Column): Column = wordSet(norm(text))

  /** Character k-gram shingles of the normalized text (the classic
    * shingling for boilerplate-heavy corpora where word sets are too
    * coarse). Dynamic positions need the SQL substring (3-arg Column
    * form), reached via call_function.
    *
    * The outer transform-over-1-element-array binds the normalized
    * text to a lambda VARIABLE once per row: higher-order-function
    * lambdas are interpreted, so referencing `lower(trim(text))`
    * directly in the inner lambda would re-normalize the whole
    * document once PER SHINGLE (~300× per row — measured 4× the
    * query cost of the shingling itself at sf0.1). */
  def charShingles(text: Column, k: Int = 8): Column =
    array_distinct(flatten(transform(array(norm(text)), n =>
      transform(
        sequence(lit(1), greatest(length(n) - (k - 1), lit(1))),
        i => call_function("substring", n, i, lit(k))))))

  /** 60-bit deterministic hash (DuckDB-mirrorable):
    * `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** The 52-BIT twin (13 hex chars): for hashes that may ride through
    * a DOUBLE (heap scores, sampling thresholds) — a 52-bit integer is
    * exactly double-representable where a 60-bit one loses its low ~7
    * bits, which could re-order a bottom-k boundary vs an
    * exact-integer oracle. Callers prepend their salt ('strat:',
    * 'shuf:', …) to decouple independent picks. */
  def md5Hash52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast(LongType)

  /** Exact dedup producing a deduplicated DATASET (not just counters):
    * keeps the minimum-id row per normalized-text hash. One shuffle on
    * the 8-byte hash. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("_h"))
    df.withColumn("_h", md5Hash60(norm(col(textCol))))
      .withColumn("_keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("_keep"))
      .drop("_h", "_keep")
  }

  /** MinHash modulus (2^31-1): base hashes and signatures stay below
    * 2^31 so the 16 linear probes never overflow a long. */
  val MinHashP: Long = 2147483647L

  /** Deterministic (a_i, b_i) for the linear hash family
    * `(a·h + b) mod p`. Large odd multipliers (golden-ratio mixing) —
    * small sequential multipliers correlate the arg-mins across
    * functions, which inflates LSH band collisions (~8× the candidate
    * pairs on the word-shingle corpus). */
  def minHashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = ((2654435761L * (i + 1)) & 0x7fffffffL) | 1L
      val b = (2246822519L * (i + 7)) & 0x7fffffffL
      (a, b)
    }

  /** MinHash signatures, one row per doc with sig0..sigN-1.
    *
    * The scale-correct shape: ONE expensive hash per (doc, shingle) —
    * explode → hash — then the N hash functions are cheap linear
    * transforms `(a_i·h + b_i) mod p` folded by N partial-aggregating
    * MINs (map-side combine; the shuffle carries N longs per doc). The
    * naive per-function rehash (hash(shingle+"#i") × N) costs N× the
    * hashing — 165s vs 9s on char shingles at sf0.1. */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      shingler: Column => Column): DataFrame = {
    val ex = shingleElements(df, idCol, textCol, shingler)
    val aggs = minHashCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinHashP).as(s"sig$i")
    }
    ex.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** The `(id, h)` shingle-element relation every sketch builds on —
    * spread (hash-repartitioned by id, [[graft.util.Spread]]) BEFORE
    * the shingle explode + per-element md5, so the expensive narrow
    * phase runs at full shuffle parallelism instead of at the input's
    * split count (single-row-group parquet scans as ONE task), and the
    * downstream `groupBy(id)` reuses the partitioning instead of
    * paying its own exchange on the exploded (wider) relation. */
  private def shingleElements(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingler: Column => Column): DataFrame =
    graft.util.Spread.byKey(
        df.select(col(idCol).as("id"), col(textCol).as("_t")), col("id"))
      .select(col("id"), explode(shingler(col("_t"))).as("w"))
      .select(col("id"), (md5Hash60(col("w")) % MinHashP).as("h"))

  /** LSH banding: candidate near-dup pairs = doc pairs sharing at least
    * one band key (bands × rowsPerBand = numHashes). Join happens only
    * inside (band, key) buckets.
    *
    * Defaults (64 hashes / 4 bands / 16 rows per band ≈ Jaccard-0.92
    * threshold) are tuned steep: on small-vocabulary or templated
    * corpora the word-set Jaccard landscape is dense, and a shallow
    * threshold passes a large fraction of the cartesian product (the
    * round-2 16/4 setting emitted 6.29M candidate pairs from 5,000
    * docs — a quadratic blow-up that would be fatal at 100 TB).
    *
    * Bucket-size guard: even a steep threshold cannot split docs whose
    * shingle-set MINIMA all coincide (e.g. docs containing most of a
    * small vocabulary). Any (band, key) bucket larger than `bucketCap`
    * is REFINED, never dropped: its members get the exact shingle-set
    * hash appended to the band key, so within a degenerate bucket only
    * identical shingle sets (true Jaccard 1.0) remain candidates. The
    * refinement is deterministic and mirrored in the DuckDB oracle;
    * post-refinement bucket sizes are bounded by the largest group of
    * identical shingle sets — which is a genuine duplicate clique, not
    * a hashing accident.
    *
    * EAGER-AT-CONSTRUCTION contract (K207): with the default
    * `pairBudget`, CONSTRUCTING this DataFrame runs a Spark job (the
    * exact within-bucket pair estimate) and pins the banded relation
    * as a DISK_ONLY localCheckpoint — the input snapshot freezes at
    * construction time (later input mutations are not seen by this
    * result), and the checkpoint blocks live until the result is
    * garbage-collected (ContextCleaner-released; a long-lived session
    * constructing many cascades should let results go out of scope,
    * or opt out). `pairBudget = Long.MaxValue` restores the fully
    * lazy, UNGUARDED plan. The same contract applies to
    * [[weightedLshCandidatePairs]], [[simHashCandidatePairs]],
    * [[editDistanceJoin]] and everything built on them
    * ([[nearDupLabels]], [[nearDupDedup]], [[nearDupDedupKeepBest]],
    * [[leakageSafeSplit]]). */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      shingler: Column => Column = normWordSet,
      pairBudget: Long = DefaultLshPairBudget): DataFrame = {
    val refined = guardPairBudget(
      lshRefinedBands(df, idCol, textCol, numHashes, bands, bucketCap,
        shingler),
      pairBudget, "lshCandidatePairs")
    val a = refined.as("a")
    val b = refined.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .distinct()
  }

  /** Default candidate-pair budget for the LSH cascade family: past
    * ~100M within-bucket pairs the verify join is doomed on any
    * realistic task budget (measured: the adversarial fixed-vocab
    * 100× fixture's 287M-pair relation ran >85 min before being
    * killed), and the right behavior is an IMMEDIATE, itemized
    * failure before the join launches — not an hours-long hang. The
    * heaps-consistent 100× rehearsal corpus stays well inside. */
  val DefaultLshPairBudget: Long = 100000000L

  /** Pair-budget fail-fast (the K131 join-cardinality-audit discipline
    * pointed at the band-bucket relation): the exact within-bucket
    * candidate count Σ n·(n−1)/2 is computed from the banded key
    * relation BEFORE the candidate self-join is launched, and a
    * corpus whose buckets imply more than `pairBudget` pairs fails
    * immediately with the measured estimate — never a silent
    * multi-hour join. The banded relation is localCheckpoint'ed
    * (bands×N small rows, cleaner-released once unreferenced) so the
    * estimate and the join share ONE signature computation; the
    * estimate itself is an upper bound on the distinct pair relation
    * (cross-band duplicates collapse in the join's DISTINCT). */
  private def guardPairBudget(
      refined: DataFrame, pairBudget: Long, op: String): DataFrame = {
    if (pairBudget == Long.MaxValue) return refined
    // DISK_ONLY: the banded relation can reach GBs at 100× scale, and
    // memory-resident checkpoint blocks squat on the unified pool's
    // protected storage half — measured at the h100 rehearsal as an
    // AGGREGATE_OUT_OF_MEMORY in the signature hashAgg. Disk blocks
    // cost two sequential IOs and starve nothing.
    // LAZY checkpoint + eager estimate (round 16, guide §5 actions):
    // the estimate's own action materializes the checkpoint blocks in
    // the SAME job that counts the buckets — one signature pass
    // instead of the old checkpoint-job-then-estimate-job pair. The
    // eager-at-construction contract is unchanged: the estimate runs
    // (and the snapshot freezes) before this method returns.
    val ck = refined.localCheckpoint(false,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val est = ck.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("est"))
      .head().getLong(0)
    require(est <= pairBudget,
      s"$op: the banded LSH buckets imply $est within-bucket candidate " +
        s"pairs, over the $pairBudget pair budget — the corpus is " +
        "adversarially dense at this threshold (near-clique duplicate " +
        "families). Cap the relation (lshCandidatePairsCapped), steepen " +
        "the banding, or raise pairBudget deliberately.")
    ck
  }

  /** AMS (Alon–Matias–Szegedy) SECOND-MOMENT SKETCH of a keyed
    * relation → self-join size estimate WITHOUT the key shuffle. The
    * exact pair estimate the K207 budget guard computes costs one
    * groupBy(key) exchange of the whole banded relation; this sketch
    * estimates the same quantity — Σ_key n², hence candidate pairs
    * ≈ (F₂ − N)/2 — in ONE MAP-ONLY PASS: each of `counters`
    * estimators keeps a single ±1-signed running sum
    * X_j = Σ_rows sign_j(key) (signs from md5, deterministic on any
    * engine), E[X_j²] = F₂. Median of `groups` group-means bounds the
    * failure probability the textbook way.
    *
    * Operational composition (the guard fast-path): run the sketch
    * first; if `pairs_est` clears the budget with an order of
    * magnitude to spare, skip the exact count; anywhere near the
    * line, fall through to [[guardPairBudget]]'s exact form — the
    * sketch's ±1/√groups relative error is fine for a 10× clearance
    * decision. MEASURED (100M-row keyed relation with a planted 1%
    * mega-bucket, local[32]): the hashed-key sketch runs 15.2 s vs
    * 41.5 s for the exact groupBy count at 0.09% error — and the
    * gap is the EXCHANGE, so it widens on a network-bound cluster.
    * On keys that still need hashing the md5 dominates and the two
    * forms tie (~55 vs 43 s): use [[pairEstimateSketchHashed]]
    * wherever the relation already carries hashed keys (every band
    * relation does).
    *
    * Exactness envelope: X_j² needs |X_j| < √2⁶³ ≈ 3.04e9 —
    * raise_error past it (an |X| that large means ≥ 3e9 rows share a
    * sign, i.e. the relation is already far over any sane budget).
    * Output row: n_rows, f2_est, pairs_est (clamped ≥ 0). */
  def pairEstimateSketch(
      relation: DataFrame,
      key: Column,
      counters: Int = 24,
      groups: Int = 6): DataFrame =
    // ONE md5 per row; the per-counter signs are the cheap linear
    // family `(a_j·h + b_j) mod p` — the minHashSignatures lesson
    // (measured on THIS operator too: 24 per-row md5s made the sketch
    // 10× SLOWER than the exact groupBy count at 10M rows; one md5 +
    // 24 modular probes brought it to parity, and the hashed-key form
    // below — for relations whose keys are ALREADY small hashes, the
    // band-relation case — removes the md5 entirely)
    pairEstimateSketchHashed(relation,
      md5Hash60(key.cast("string")) % MinHashP, counters, groups)

  /** [[pairEstimateSketch]] over a key that is ALREADY a deterministic
    * integer hash (any value; reduced mod 2³¹−1 here) — the form the
    * guard fast-path actually uses, since band relations carry hashed
    * keys: no per-row md5, just `counters` modular probes, so the
    * map-only pass is pure cheap integer algebra. */
  def pairEstimateSketchHashed(
      relation: DataFrame,
      hashedKey: Column,
      counters: Int = 24,
      groups: Int = 6): DataFrame = {
    require(counters >= 4 && counters <= 256,
      s"counters must be in [4, 256]: $counters")
    require(groups >= 1 && counters % groups == 0,
      s"groups ($groups) must divide counters ($counters)")
    val r = counters / groups
    val keyed = relation
      .select(pmod(hashedKey.cast(LongType), lit(MinHashP)).as("_h"))
      .filter(col("_h").isNotNull)
    val coeffs = minHashCoeffs(counters)
    def sign(j: Int): Column = {
      val (a, b) = coeffs(j)
      when(((col("_h") * a + b) % MinHashP) % 2 === 1, lit(1L))
        .otherwise(lit(-1L))
    }
    val aggs = count(lit(1)).as("n_rows") +:
      (0 until counters).map(j => sum(sign(j)).as(s"_x$j"))
    val row = keyed.agg(aggs.head, aggs.tail: _*)
    // The group mean sums r squares before `div r`, so each square must
    // stay under 2^63 / r for the SUM to be exact too — the envelope is
    // √(2^63/r) = 3037000499/√r, not the bare √2^63 (which kept X_j²
    // exact but let the r-term sum wrap silently for |X_j| ∈
    // [√(2^63/r), √2^63) — round-13 ADVICE item #1).
    val xLimit = (3037000499L / math.sqrt(r.toDouble)).toLong
    val sq = (0 until counters).foldLeft(row) { (acc, j) =>
      acc.withColumn(s"_s$j",
        when(abs(coalesce(col(s"_x$j"), lit(0L))) >= xLimit,
          raise_error(lit("pairEstimateSketch: |X_j| exceeds the exact " +
            s"group-sum envelope (~${xLimit / 1000000}e6) — the relation " +
            "is far past any usable pair budget; fail the corpus, don't " +
            "sketch it")))
          .otherwise(coalesce(col(s"_x$j"), lit(0L)) *
            coalesce(col(s"_x$j"), lit(0L))))
    }
    val means = (0 until groups).map { g =>
      val terms = (g * r until (g + 1) * r).map(j => s"_s$j").mkString(" + ")
      expr(s"($terms) div $r")
    }
    val withMeans = sq.withColumn("_sm", array_sort(array(means: _*)))
    // element_at is 1-based; even group counts average the two central
    // order statistics with integer div (exact — a double `/` would
    // lose bits past 2^53), odd take the middle one
    val med =
      if (groups % 2 == 1) element_at(col("_sm"), (groups + 1) / 2)
      else expr(s"(element_at(_sm, ${groups / 2}) + " +
        s"element_at(_sm, ${groups / 2 + 1})) div 2")
    withMeans
      .withColumn("f2_est", med)
      .select(col("n_rows"), col("f2_est"),
        greatest(lit(0L), expr("(f2_est - n_rows) div 2")).as("pairs_est"))
  }

  /** Degree-CAPPED candidate pairs — the bounded-output form for
    * graph-shaped consumers (triangle census, cluster audits) where a
    * near-clique duplicate family must never materialize its full
    * quadratic pair relation. Within each refined (band, key) bucket,
    * members are ranked by id and each member pairs only with its
    * `degreeCap` nearest SUCCESSORS in rank order, so
    *  - per-bucket emissions are ≤ n·degreeCap (linear, not n²/2),
    *  - every bucket stays CONNECTED as a rank chain (successor-1
    *    edges always survive), so component labels are unaffected
    *    wherever the clique is genuine,
    *  - with the default degreeCap = bucketCap, UN-refined buckets
    *    (≤ bucketCap members by the K2 guard) emit exactly the
    *    uncapped pair set — only the refined identical-shingle-set
    *    mega-buckets are capped, which is precisely the adversarial
    *    mass the census cap exists for.
    * Deterministic (rank = row_number by id) and mirrored in the
    * DuckDB oracle; the capped-away mass is visible via
    * [[lshCapAudit]], never silent. */
  def lshCandidatePairsCapped(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      degreeCap: Int = 100,
      shingler: Column => Column = normWordSet): DataFrame = {
    require(degreeCap >= 1, s"degreeCap must be >= 1: $degreeCap")
    val ex = df
      .select(col(idCol).as("id"), explode(shingler(col(textCol))).as("w"))
      .select(col("id"), (md5Hash60(col("w")) % MinHashP).as("h"))
    // materialize ONCE (cleaner-released blocks): the sized banded
    // relation feeds two branches × two join sides — left lazy, the
    // signature pipeline replicates per consumer in the physical plan.
    // DISK_ONLY for the same reason as guardPairBudget: memory blocks
    // starve the signature aggregation of execution memory at 100×.
    val sized = refinedBandsFromElementsSized(ex, numHashes, bands, bucketCap)
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // Split by PRE-refinement bucket size: a bucket whose whole
    // pre-refine population fits in degreeCap+1 can never bind (its
    // refined groups are subsets), so it takes the plain id<id join —
    // the rank window runs ONLY over the oversized sliver, which is
    // what keeps the capped form's cost at the uncapped form's cost
    // plus a mega-bucket-sized window (measured: the full-relation
    // window cost q225 +2.0 s at sf0.1).
    val small = sized.filter(col("n") <= degreeCap + 1)
      .select(col("id"), col("band"), col("key"))
    val sa = small.as("a")
    val sb = small.as("b")
    val plainPairs = sa.join(sb,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    val ranked = sized.filter(col("n") > degreeCap + 1)
      .select(col("id"), col("band"), col("key"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("band"), col("key")).orderBy(col("id"))))
    val ra = ranked.as("a")
    val rb = ranked.as("b")
    val cappedPairs = ra.join(rb,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("b._r") > col("a._r") && col("b._r") <= col("a._r") + degreeCap)
      .select(col("a.id").as("a"), col("b.id").as("b"))
    // buckets are disjoint between branches (n is a bucket property),
    // and within the rank branch the successor pairing subsumes the
    // plain one for n <= cap+1 groups — the union is output-identical
    // to ranking EVERY bucket (the oracle's pure rank form)
    plainPairs.unionByName(cappedPairs).distinct()
  }

  /** Cap audit for [[lshCandidatePairsCapped]] — one row: bucket
    * count, buckets where the cap binds (n − 1 > degreeCap), the
    * largest bucket, and the full vs capped within-bucket pair counts
    * (capped per bucket: n(n−1)/2 when n−1 ≤ cap, else
    * (n−cap)·cap + cap(cap−1)/2 — the rank-successor sum). Both
    * counts are pre-DISTINCT upper bounds on the emitted relation;
    * their GAP is the capped-away mass a census consumer is trading
    * for bounded degrees. */
  def lshCapAudit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      degreeCap: Int = 100,
      shingler: Column => Column = normWordSet): DataFrame =
    capAuditOverBands(
      lshRefinedBands(df, idCol, textCol, numHashes, bands, bucketCap,
        shingler),
      degreeCap)

  /** [[lshCapAudit]]'s rollup over ANY `(id, band, key)` relation —
    * the operational form: [[graft.jobs.RunNightly]] runs it over the
    * MAINTAINED band index ([[graft.jobs.IndexMaintenance]] state), so
    * the nightly binding-cap check costs one bands×N rollup, never a
    * corpus re-banding. Note the maintained index is PRE-refinement
    * ([[bandKeys]] — no bucket-cap key refinement), so `pairs_full`
    * over it UPPER-bounds the refined cascade's budget estimate: the
    * conservative direction for an early warning. */
  def capAuditOverBands(banded: DataFrame, degreeCap: Int): DataFrame = {
    require(degreeCap >= 1, s"degreeCap must be >= 1: $degreeCap")
    val cap = lit(degreeCap.toLong)
    val capTail = lit(degreeCap.toLong * (degreeCap - 1) / 2)
    banded
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"),
        count(when(col("n") - 1 > cap, 1)).as("n_capped_buckets"),
        coalesce(max(col("n")), lit(0L)).as("max_bucket"),
        coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("pairs_full"),
        coalesce(sum(when(col("n") - 1 <= cap, expr("n * (n - 1) div 2"))
          .otherwise((col("n") - cap) * cap + capTail)), lit(0L))
          .as("pairs_capped"))
  }

  /** Operational guard health over the document-side pair generators
    * (round-12 ask #6: a cap that starts binding on real data must be
    * a REPORTED event, not a silent accuracy drift). Long-format rows
    * `(guard, n_affected, magnitude)`, one row PER GUARD THAT BINDS
    * at the given settings — ZERO rows is this corpus's
    * nothing-binds certificate:
    *  - `lsh_degree_cap` — refined (band, key) buckets where
    *    `degreeCap` binds; magnitude = pairs_full − pairs_capped,
    *    the mass a K206 census consumer would trade away;
    *  - `lsh_pair_budget` — the cascade's exact within-bucket pair
    *    estimate exceeds `pairBudget`; magnitude = the overshoot
    *    (the K207 fail-fast would fire at these settings);
    *  - `simhash_pair_budget` — same for the chunk-key generator
    *    (K211).
    * One LSH banding pass + one SimHash pass, each folded to a single
    * row before the row-shaping explode — report cost, not cascade
    * cost. */
  def guardHealth(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      degreeCap: Int = 100,
      pairBudget: Long = DefaultLshPairBudget,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      shingler: Column => Column = normWordSet): DataFrame = {
    val lshRows = lshCapAudit(docs, idCol, textCol, numHashes, bands,
        bucketCap, degreeCap, shingler)
      .select(explode(array(
        struct(lit("lsh_degree_cap").as("guard"),
          col("n_capped_buckets").as("n_affected"),
          (col("pairs_full") - col("pairs_capped")).as("magnitude"),
          (col("n_capped_buckets") > 0).as("binds")),
        struct(lit("lsh_pair_budget").as("guard"),
          col("n_buckets").as("n_affected"),
          (col("pairs_full") - lit(pairBudget)).as("magnitude"),
          (col("pairs_full") > pairBudget).as("binds")))).as("g"))
      .select(col("g.*"))
    val simRows = simHashPairAudit(simHash(docs, idCol, textCol))
      .select(lit("simhash_pair_budget").as("guard"),
        col("n_buckets").as("n_affected"),
        (col("pairs_est") - lit(pairBudget)).as("magnitude"),
        (col("pairs_est") > pairBudget).as("binds"))
    lshRows.unionByName(simRows).filter(col("binds")).drop("binds")
  }

  /** [[guardHealth]]'s edit-distance-join panel: `edit_df_cap_left` /
    * `edit_df_cap_right` rows where the variant df-cap binds
    * (magnitude = dropped postings, the K208 under-join mass) and an
    * `edit_pair_budget` row when the POST-CAP candidate estimate
    * Σ_key |left|·|right| still exceeds `pairBudget` (magnitude = the
    * overshoot; n_affected = shared variant keys). Zero rows = the
    * join runs uncapped and inside budget at these settings. */
  def editGuardHealth(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 64,
      variantDfCap: Int = Int.MaxValue,
      pairBudget: Long = DefaultLshPairBudget): DataFrame = {
    // ONE per-side postings-count relation feeds both the df-cap rows
    // and the post-cap budget estimate (the first form recomputed the
    // variants per consumer: 4 scans of the string column; this is 2)
    def sideCounts(side: DataFrame, ip: String, sp: String) =
      editVariants(side, idCol, strCol, maxLen, ip, sp)
        .groupBy(col("_h")).agg(count(lit(1)).as("n"))
    val lc = sideCounts(left, "left_id", "left_str")
    val rc = sideCounts(right, "right_id", "right_str")
    def capRow(counts: DataFrame, tag: String) = counts
      .agg(count(when(col("n") > variantDfCap, 1)).as("n_capped_keys"),
        coalesce(sum(when(col("n") > variantDfCap, col("n"))), lit(0L))
          .as("dropped_postings"))
      .filter(col("n_capped_keys") > 0)
      .select(lit(s"edit_df_cap_$tag").as("guard"),
        col("n_capped_keys").as("n_affected"),
        col("dropped_postings").as("magnitude"))
    val budgetRow = lc.filter(col("n") <= variantDfCap)
      .select(col("_h"), col("n").as("nl"))
      .join(rc.filter(col("n") <= variantDfCap)
        .select(col("_h"), col("n").as("nr")), Seq("_h"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("nl") * col("nr")), lit(0L)).as("est"))
      .filter(col("est") > pairBudget)
      .select(lit("edit_pair_budget").as("guard"),
        col("n_keys").as("n_affected"),
        (col("est") - lit(pairBudget)).as("magnitude"))
    capRow(lc, "left").unionByName(capRow(rc, "right"))
      .unionByName(budgetRow)
  }

  /** Banded, bucket-capped LSH keys — `(id, band, key)` — shared by the
    * symmetric candidate join and the incremental index probe. */
  private def lshRefinedBands(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      bucketCap: Int,
      shingler: Column => Column): DataFrame = {
    val ex = shingleElements(df, idCol, textCol, shingler)
    refinedBandsFromElements(ex, numHashes, bands, bucketCap)
  }

  /** The banding core over ANY `(id, h)` element relation — shared by
    * the per-row-shingler form above and the df-weighted element
    * relation ([[weightedLshCandidatePairs]]). Signatures + the exact
    * element-set key come from ONE aggregation pass: the set key is
    * md5 over the sorted distinct element hashes, so it costs one
    * extra agg buffer, not a second scan. It is only USED for
    * oversized buckets, but computing it inline beats re-exploding
    * the corpus to fetch it for the (rare, at sane scale)
    * refinements. */
  private def refinedBandsFromElements(
      ex: DataFrame, // (id, h)
      numHashes: Int,
      bands: Int,
      bucketCap: Int): DataFrame =
    refinedBandsFromElementsSized(ex, numHashes, bands, bucketCap)
      .select(col("id"), col("band"), col("key"))

  /** [[refinedBandsFromElements]] keeping the PRE-refinement bucket
    * size `n` — [[lshCandidatePairsCapped]] uses it to confine its
    * rank window to buckets the cap could actually bind. */
  private def refinedBandsFromElementsSized(
      ex: DataFrame, // (id, h)
      numHashes: Int,
      bands: Int,
      bucketCap: Int): DataFrame = {
    val r = numHashes / bands
    val aggs = minHashCoeffs(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinHashP).as(s"sig$i")
    } :+ md5(concat_ws(",", sort_array(collect_set(col("h"))))).as("setkey")
    val sigs = ex.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val bandKeys = (0 until bands).map { j =>
      concat_ws("|", (j * r until (j + 1) * r).map(i => col(s"sig$i")): _*)
    }
    val banded = sigs.select(col("id"), col("setkey"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
    // one window shuffle on (band, key) — the same partitioning the
    // candidate join needs anyway
    val sized = banded.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
    sized.select(col("id"), col("band"),
      when(col("n") <= bucketCap, col("key"))
        .otherwise(concat(col("key"), lit("!"), col("setkey"))).as("key"),
      col("n"))
  }

  /** STREAMING ingest dedup gate — the continuous-arrival twin of
    * [[dedupAgainstIndexBloomSharded]]: documents stream in and any
    * doc whose normalized-content hash is already in the persistent
    * index is dropped ON ARRIVAL. Entirely STATELESS on the stream
    * side (accepts a streaming OR batch DataFrame): the sharded Bloom
    * sketches broadcast into a stream-static join for the cheap
    * prefilter, and only probable hits pay the exact stream-static
    * left_anti against the hash set — no watermark, no state store,
    * so the gate runs at any trigger cadence and never accumulates
    * streaming state (the K52/q92 stateless-gate discipline).
    * Batch-internal duplicates are NOT collapsed here (that is the
    * batch operator's job via exactDedup) — this is a pure membership
    * gate against the index, which is exactly what per-arrival
    * semantics mean. At 100 TB the static side is the maintained
    * [[graft.jobs.IndexMaintenance]] hash index: sketches are
    * shards×bits bounded, and the anti-join touches only the
    * Bloom-positive sliver of the stream. */
  def streamingDedupGate(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      seenHashes: DataFrame, // static (h)
      shards: Int = 16,
      numBitsPerShard: Int = 1 << 18,
      numHashes: Int = 7): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val sketches = seenHashes
      .groupBy(pmod(col("h"), lit(shards.toLong)).cast("int").as("_shard"))
      .agg(call_function("graft_bloom",
        col("h"), lit(numBitsPerShard), lit(numHashes)).as("_bf"))
    val withH = newDocs
      .withColumn("_h", md5Hash60(norm(col(textCol))))
      .withColumn("_shard", pmod(col("_h"), lit(shards.toLong)).cast("int"))
    val flagged = withH.join(broadcast(sketches), Seq("_shard"), "left")
      .withColumn("_maybe", coalesce(
        call_function("graft_bloom_contains", col("_bf"), col("_h")),
        lit(false)))
      .drop("_bf", "_shard")
    flagged.filter(!col("_maybe")).drop("_maybe", "_h")
      .unionByName(flagged.filter(col("_maybe")).drop("_maybe")
        .join(seenHashes.select(col("h").as("_h")), Seq("_h"), "left_anti")
        .drop("_h"))
  }

  // --------------------------------------------------------------------------
  // URL-level dedup (crawl frontier / page-identity normalization)

  /** Canonical URL normalization — the key function behind crawl-level
    * URL dedup: the same page arrives under scheme/host case variants,
    * `www.` prefixes, default ports, trailing slashes, tracking
    * parameters and fragments, and a frontier that treats those as
    * distinct re-crawls (and a corpus that keeps them all) wastes
    * fetch and storage before content dedup ever runs. Steps, each a
    * codegen'd regexp/array expression with an exact DuckDB mirror:
    * scheme + authority lowercased; leading `www.` stripped; default
    * port stripped (`:443` for https, `:80` for http); trailing path
    * slashes trimmed; tracking params (`utm_*`, `fbclid`, `gclid`)
    * dropped; surviving query params SORTED; fragment dropped.
    * Non-URL input (no `scheme://`) normalizes to the degenerate
    * `"://"` — callers feed URL columns.
    *
    * Map-only: one projection, no corpus state (unlike the content-
    * hash family, URL identity needs no df/vocabulary pass). */
  def normalizeUrl(url: Column): Column = {
    val p = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"
    val scheme = lower(regexp_extract(url, p, 1))
    val auth0 = regexp_replace(lower(regexp_extract(url, p, 2)), "^www\\.", "")
    val auth = when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .otherwise(auth0)
    val path = regexp_replace(regexp_extract(url, p, 3), "/+$", "")
    val params = filter(
      split(regexp_replace(regexp_extract(url, p, 4), "^\\?", ""), "&"),
      kv => !kv.rlike("^(utm_[^=]*|fbclid|gclid)=") && kv =!= lit(""))
    val qnorm = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), auth, path, qnorm)
  }

  /** URL-level dedup: one row per normalized URL (the min-id row, the
    * [[exactDedup]] keeper rule) plus the variant count — the relation
    * a crawl pipeline keys its frontier and its re-fetch budget on.
    * One 8-byte-hash-equivalent shuffle on the normalized string;
    * bodies never shuffle (project id + url first). */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val normed = df.select(col(idCol).as("id"),
      normalizeUrl(col(urlCol)).as("url"))
    normed.groupBy(col("url"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("n_variants"))
  }

  // --------------------------------------------------------------------------
  // df-weighted MinHash (boilerplate-robust near-dup)

  /** Global integer token weights from corpus document frequency:
    * `wt = clamp(n_docs div df, 1, maxW)` — ubiquitous (boilerplate)
    * tokens weigh 1, rare content tokens weigh up to `maxW`. Exact
    * integer floor division, so a SQL oracle reproduces weights
    * bit-for-bit (no log/idf double math). The relation is
    * vocabulary-sized (Zipf argument: far smaller than the corpus)
    * and joins back to the token relation on the token itself. */
  def dfTokenWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxW: Int = 8,
      shingler: Column => Column = normWordSet): DataFrame = {
    require(maxW >= 1, s"maxW must be >= 1, got $maxW")
    val toks = docs.select(col(idCol).as("id"),
      explode(shingler(col(textCol))).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs)) // one-row relation, q72's N/avgdl shape
      .select(col("tok"),
        greatest(lit(1L), least(lit(maxW.toLong),
          expr("n_docs div df"))).as("wt"))
  }

  /** Df-WEIGHTED near-dup candidate pairs: plain MinHash treats a
    * page and its boilerplate-sharing neighbor as near-dups (nav
    * bars, cookie banners and license footers dominate the word
    * set); weighting by rarity makes shared CONTENT, not shared
    * template, drive collisions. Weighted MinHash via integer
    * replication (the classic weighted-sampling reduction: token t
    * becomes elements t#1..t#wt, and plain MinHash over elements
    * collides with probability = weighted Jaccard
    * Σ min(w)/Σ max(w)); with the df weights above that is IDF-ish
    * weighted Jaccard in exact integer form. Banding, bucket-cap
    * refinement and the pair join are [[lshCandidatePairs]]'s
    * verbatim (the shared [[refinedBandsFromElements]] core — the
    * cap guard carries over).
    *
    * Scale shape: replication multiplies the ELEMENT relation by the
    * mean weight (≤ maxW, and ≈1 for the high-df mass by Zipf), one
    * md5 per element, then the N signature transforms fold map-side
    * exactly as unweighted. The weights relation is vocabulary-sized
    * and never broadcast as a whole — it hash-joins the token
    * relation on the token key. */
  def weightedLshCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      maxW: Int = 8,
      shingler: Column => Column = normWordSet,
      pairBudget: Long = DefaultLshPairBudget): DataFrame =
    weightedLshCandidatePairs(docs, idCol, textCol,
      dfTokenWeights(docs, idCol, textCol, maxW, shingler),
      numHashes, bands, bucketCap, shingler, pairBudget)

  /** Weight-reuse form: `weights` is a precomputed `(tok, wt)`
    * relation ([[dfTokenWeights]]'s output) — a pipeline that scores
    * the candidates afterwards ([[weightedJaccardPairs]]) computes
    * the vocabulary aggregation ONCE and feeds both stages (the q130
    * label-reuse discipline applied to weights).
    *
    * Shares [[lshCandidatePairs]]' EAGER-AT-CONSTRUCTION pair-budget
    * contract (see there); `pairBudget = Long.MaxValue` opts out on
    * either overload. (Scala allows default arguments on only ONE
    * overload of a name — the convenience form holds them, so the
    * budget-less weights form below delegates with the default
    * rather than forcing callers to spell the budget out.) */
  def weightedLshCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      numHashes: Int,
      bands: Int,
      bucketCap: Int,
      shingler: Column => Column): DataFrame =
    weightedLshCandidatePairs(docs, idCol, textCol, weights,
      numHashes, bands, bucketCap, shingler, DefaultLshPairBudget)

  /** [[weightedLshCandidatePairs]] weights form with an explicit
    * `pairBudget` (see the budget-less overload above). */
  def weightedLshCandidatePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      numHashes: Int,
      bands: Int,
      bucketCap: Int,
      shingler: Column => Column,
      pairBudget: Long): DataFrame = {
    // spread before the token explode + weight replication + per-element
    // md5 (round 16 — the weighted path missed the round-15 treatment:
    // profiled 21 single-task stages at sf0.1; the signature groupBy(id)
    // downstream reuses this partitioning, see util.Spread)
    val ex = graft.util.Spread.byKey(
        docs.select(col(idCol).as("id"), col(textCol).as("_t")), col("id"))
      .select(col("id"), explode(shingler(col("_t"))).as("tok"))
      .join(weights, Seq("tok"))
      .select(col("id"),
        explode(transform(sequence(lit(1), col("wt").cast("int")),
          i => concat(col("tok"), lit("#"), i.cast("string")))).as("e"))
      .select(col("id"), (md5Hash60(col("e")) % MinHashP).as("h"))
    val refined = guardPairBudget(
      refinedBandsFromElements(ex, numHashes, bands, bucketCap),
      pairBudget, "weightedLshCandidatePairs")
    val a = refined.as("a")
    val b = refined.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .distinct()
  }

  /** Exact df-weighted Jaccard for given `(a, b)` pairs — the verify
    * gate behind the weighted sketch (and the quantity the sketch
    * estimates): with GLOBAL per-token weights and set semantics,
    * Σ min/Σ max collapses to shared-weight / (S_a + S_b − shared).
    * Per-doc total weights come from one vocabulary join + rollup;
    * the pair score is one token-equijoin over the pairs' tokens —
    * never a corpus product. Returns (a, b, wjac) with wjac
    * round(·, 6) like the unweighted gates. */
  def weightedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame, // (a, b)
      maxW: Int = 8,
      shingler: Column => Column = normWordSet): DataFrame =
    weightedJaccardPairs(docs, idCol, textCol, pairs,
      dfTokenWeights(docs, idCol, textCol, maxW, shingler), shingler)

  /** Weight-reuse form of [[weightedJaccardPairs]] — see the
    * [[weightedLshCandidatePairs]] weights overload. */
  def weightedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame,
      weights: DataFrame, // (tok, wt)
      shingler: Column => Column): DataFrame = {
    val tw = docs
      .select(col(idCol).as("id"), explode(shingler(col(textCol))).as("tok"))
      .join(weights, Seq("tok")) // (id, tok, wt)
    val totals = tw.groupBy(col("id")).agg(sum(col("wt")).as("s"))
    val shared = pairs
      .join(tw.select(col("id").as("a"), col("tok"), col("wt")), Seq("a"))
      .join(tw.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy(col("a"), col("b")).agg(sum(col("wt")).as("shared"))
    pairs
      .join(shared, Seq("a", "b"), "left")
      .join(totals.select(col("id").as("a"), col("s").as("sa")), Seq("a"))
      .join(totals.select(col("id").as("b"), col("s").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        round(coalesce(col("shared"), lit(0L)).cast(DoubleType) /
          (col("sa") + col("sb") -
            coalesce(col("shared"), lit(0L))).cast(DoubleType), 6).as("wjac"))
  }

  /** Incremental near-dup probe — the continuous-crawl shape: a NEW
    * batch of docs is checked against the EXISTING corpus without ever
    * forming new×new or index×index pairs. Band keys are the stored
    * index (at 100 TB they persist as a `(band, key) → id` table; here
    * both sides derive from one relation split by `isNew` so the
    * DuckDB oracle can mirror the split exactly). Candidates collide
    * inside refined (band, key) buckets only, then the exact
    * hashed-word-set Jaccard gate keeps pairs ≥ `minJaccard`.
    * Returns `(new_id, dup_of, jac)` — every new doc paired with each
    * index doc it near-duplicates. */
  def lshProbeIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isNew: Column,
      minJaccard: Double,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      shingler: Column => Column = normWordSet): DataFrame = {
    val marked = df.withColumn("__new", isNew)
    val refined = lshRefinedBands(marked, idCol, textCol, numHashes, bands,
      bucketCap, shingler)
      .join(marked.select(col(idCol).as("id"), col("__new")), Seq("id"))
    val probe = refined.filter(col("__new")).as("a")
    val index = refined.filter(!col("__new")).as("b")
    val cands = probe.join(index,
        col("a.band") === col("b.band") && col("a.key") === col("b.key"))
      .select(col("a.id").as("new_id"), col("b.id").as("dup_of"))
      .distinct()
    val ws = graft.util.Spread.byKey(df, col(idCol))
      .select(col(idCol).as("wid"),
        transform(shingler(col(textCol)), w => md5Hash60(w)).as("ws"))
    cands
      .join(ws.select(col("wid").as("new_id"), col("ws").as("wa")), Seq("new_id"))
      .join(ws.select(col("wid").as("dup_of"), col("ws").as("wb")), Seq("dup_of"))
      .select(col("new_id"), col("dup_of"),
        round(jaccard(col("wa"), col("wb")), 6).as("jac"))
      .filter(col("jac") >= minJaccard)
  }

  /** SimHash sketch (bit-vote over the word set's hashes). */
  def simHash(df: DataFrame, idCol: String, textCol: String, bits: Int = 60): DataFrame = {
    // spread before the explode+md5 (see shingleElements): the bit-vote
    // groupBy(id) then reuses the id partitioning — same exchange
    // count, full-width hashing
    val exploded = graft.util.Spread.byKey(
        df.select(col(idCol).as("id"), col(textCol).as("_t")), col("id"))
      .select(col("id"), explode(normWordSet(col("_t"))).as("w"))
      .withColumn("h", md5Hash60(col("w")))
    val votes = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$j")
    }
    val agg = exploded.groupBy("id").agg(votes.head, votes.tail: _*)
    val hash = (0 until bits)
      .map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("id"), hash.as("simhash"))
  }

  /** SimHash near-dup candidates: pairs sharing any 15-bit chunk.
    *
    * Guarded like every other pair generator in the cascade family
    * (K207): N near-identical docs produce IDENTICAL 64-bit SimHashes,
    * so they share all `chunks` chunk keys and the self-join would
    * emit N²/2 pairs — the exact mega-bucket shape the MinHash pair
    * budget exists for. The chunk-key relation therefore runs through
    * the same [[guardPairBudget]] fail-fast: the exact Σ n·(n−1)/2
    * over chunk buckets is computed BEFORE the join launches and a
    * corpus over `pairBudget` dies immediately with the estimate in
    * the error. EAGER-AT-CONSTRUCTION contract: building this
    * DataFrame runs the estimate job and pins a DISK_ONLY
    * localCheckpoint of the chunk-key relation (the input snapshot
    * freezes here; blocks release via the ContextCleaner once the
    * result is unreferenced). Pass `pairBudget = Long.MaxValue` to
    * opt out (lazy, unguarded — the pre-round-12 plan).
    * [[simHashPairAudit]] is the audit twin. */
  def simHashCandidatePairs(
      sim: DataFrame,
      chunks: Int = 4,
      pairBudget: Long = DefaultLshPairBudget): DataFrame = {
    val banded = guardPairBudget(
      simHashChunkKeys(sim, chunks), pairBudget, "simHashCandidatePairs")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .distinct()
  }

  /** The banded chunk-key relation behind [[simHashCandidatePairs]]
    * — `(id, band, key)`, band = chunk index (named `band` so the
    * shared [[guardPairBudget]] / [[capAuditOverBands]] machinery
    * applies unchanged). */
  def simHashChunkKeys(sim: DataFrame, chunks: Int = 4): DataFrame = {
    val chunkKeys = (0 until chunks).map { k =>
      shiftright(col("simhash"), k * 15).bitwiseAND(lit(0x7fffL))
    }
    sim.select(col("id"),
      posexplode(array(chunkKeys: _*)).as(Seq("band", "key")))
  }

  /** Degree-CAPPED SimHash candidates — the bounded-output REPAIR
    * for corpora where [[simHashCandidatePairs]]' budget fires (the
    * K206 rank-successor form on chunk buckets: each member pairs
    * with its `degreeCap` nearest id-rank successors, so emissions
    * are ≤ n·cap per bucket and rank chains keep genuine duplicate
    * families connected). Measured need: on the heaps-consistent 5M
    * fixture the health report flags the UNCAPPED generator at 11.4B
    * pairs — small vocabularies converge near-identical word sets to
    * identical sketches, so a runnable simhash pass on such corpora
    * NEEDS the cap. Unlike K206 there is no small/oversized branch
    * split: the chunk relation is exactly chunks×N rows (no shingle
    * explode), and the rank window runs on the (band, key)
    * partitioning the pair join shuffles on anyway, so the window is
    * marginal at any scale. Capped-away mass stays visible:
    * [[capAuditOverBands]] over [[simHashChunkKeys]]'s relation is
    * the full 5-column audit. */
  def simHashCandidatePairsCapped(
      sim: DataFrame,
      chunks: Int = 4,
      degreeCap: Int = 100): DataFrame = {
    require(degreeCap >= 1, s"degreeCap must be >= 1: $degreeCap")
    val ranked = simHashChunkKeys(sim, chunks)
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("band"), col("key")).orderBy(col("id"))))
    val ra = ranked.as("a")
    val rb = ranked.as("b")
    ra.join(rb,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("b._r") > col("a._r") && col("b._r") <= col("a._r") + degreeCap)
      .select(col("a.id").as("a"), col("b.id").as("b"))
      .distinct()
  }

  /** Audit twin for [[simHashCandidatePairs]] (the q243/q244
    * discipline): one row — chunk-bucket count, the largest bucket,
    * and the exact within-bucket pair estimate Σ n·(n−1)/2 the budget
    * guard compares against `pairBudget`. Read next to
    * [[DefaultLshPairBudget]]: `pairs_est` within an order of
    * magnitude of the budget is the early-warning a nightly health
    * sheet should surface BEFORE the fail-fast ever fires. For the
    * degree-capped form's full/capped gap, use [[capAuditOverBands]]
    * over [[simHashChunkKeys]]. */
  def simHashPairAudit(sim: DataFrame, chunks: Int = 4): DataFrame =
    simHashChunkKeys(sim, chunks)
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"),
        coalesce(max(col("n")), lit(0L)).as("max_bucket"),
        coalesce(sum(expr("n * (n - 1) div 2")), lit(0L)).as("pairs_est"))

  /** Connected components over an undirected pair graph — the step
    * that turns near-dup candidate PAIRS into dedup CLUSTERS (keep the
    * min-id representative per component). Min-label propagation with
    * POINTER JUMPING: each round a node takes the min label over
    * itself and its neighbors, then follows its label one hop
    * (`label ← label(label)`), which roughly doubles propagation
    * distance per round — O(log n) rounds on chain-shaped components
    * instead of O(diameter) for plain neighbor-min (a 1,000-node path
    * converges in ~12 rounds, not 1,000).
    *
    * Scale hygiene (each round): the old label rides inside the new
    * frame so the changed-label count is ONE aggregation, not a second
    * self-join; `localCheckpoint()` truncates lineage so analyzer cost
    * and stack depth stay constant across rounds (a cluster caveat:
    * localCheckpoint blocks die with their executor — on a real
    * cluster prefer `spark.sparkContext.setCheckpointDir` + reliable
    * `checkpoint()` for jobs that cannot afford a recompute-from-root).
    * Returns (id, label). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // Loop discipline (round-15 optimization; guide §2.4):
    //  - the first propagation round folds into the label INIT: both
    //    edge directions exist, so grouping by dst enumerates every
    //    node and label₀ = least(id, min neighbor) — one aggregation
    //    replaces the old distinct-ids init plus the first round;
    //  - l1 is persisted across its two pointer-jump uses (the old
    //    plan recomputed the neighbor-min join TWICE per round).
    // (Tried and REVERTED, both measured slower at sf0.1: SHUFFLE_HASH
    // hints on the label-side joins — they force the checkpointed edge
    // relation, which scans back as UnknownPartitioning under AQE, to
    // re-exchange EVERY round, where the planner's broadcast keeps it
    // in place; and a pre-partition+persist of the edges — cache
    // round-trips cost more than the label-side exchanges they save.
    // At 100 TB size-based planning never broadcasts the node-sized
    // label relations anyway, so the unhinted form is scale-correct.)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint() // reused every round: materialize once, no lineage
    var labels = edges.groupBy(col("dst"))
      .agg(min(col("src")).as("_nmin"))
      .select(col("dst").as("id"),
        least(col("dst"), col("_nmin")).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("label")).as("nmin"))
        .withColumnRenamed("src", "id")
      val l1 = labels.select(col("id"), col("label").as("old_label"))
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("old_label"),
          least(col("old_label"), coalesce(col("nmin"), col("old_label"))).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pointer jump: label ← label(label). Every label value is the id
      // of a node in the same component, so the lookup stays in-component
      // and only ever decreases the label.
      // LAZY checkpoint + the changed-count action materializes it
      // (round 16, the guardPairBudget discipline): lineage truncates
      // at plan level immediately, and the count job doubles as the
      // block materialization — one job per round where the eager
      // checkpoint-then-count pair cost two. l1 stays cached until
      // after that action (next reads it twice).
      val next = l1.as("x")
        .join(l1.select(col("id").as("label"), col("label").as("jmp")).as("y"),
          Seq("label"), "left")
        .select(col("id"), col("old_label"),
          least(col("label"), coalesce(col("jmp"), col("label"))).as("label"))
        .localCheckpoint(false)
      val changed = next
        .agg(coalesce(sum(when(col("label") =!= col("old_label"), 1L)), lit(0L)))
        .first().getLong(0)
      l1.unpersist(blocking = false)
      labels = next.select("id", "label")
      converged = changed == 0L
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter) — raise maxIter")
    labels
  }

  /** Set Jaccard over word sets (the exact verify stage after LSH). */
  def jaccard(aWords: Column, bWords: Column): Column =
    size(array_intersect(aWords, bWords)).cast(DoubleType) /
      size(array_union(aWords, bWords)).cast(DoubleType)

  /** Bottom-k sketch Jaccard — corpus overlap WITHOUT touching the
    * corpora: given two `graft_kmv` sketches (sorted bottom-k distinct
    * hashes), the textbook estimator
    * `|U_k ∩ A ∩ B| / |U_k|`, where `U_k` is the bottom-k of the
    * sketch union. Deterministic (a pure function of the two sketches,
    * no RNG), standard error ~1/sqrt(k), and pure codegen'd array
    * algebra — so two 100 TB corpora compare via two k-long arrays.
    * Empty-vs-empty is undefined (null); callers sketch non-empty
    * corpora. */
  def sketchJaccard(a: Column, b: Column, k: Int): Column = {
    val u = slice(array_sort(array_union(a, b)), 1, k)
    val inter = array_intersect(array_intersect(u, a), b)
    round(size(inter).cast(DoubleType) / size(u).cast(DoubleType), 6)
  }

  /** End-to-end near-dup dedup: the full curation pipeline as ONE
    * dataset operator. Stages, in the order that survives 100 TB:
    *  1. exact dedup (one 8-byte-hash shuffle) so byte-identical
    *     templated docs never reach the LSH buckets;
    *  2. banded LSH candidates (collisions only inside capped
    *     (band, key) buckets — the all-pairs product never exists);
    *  3. exact Jaccard gate over hashed word sets (verify step: LSH
    *     candidates are probabilistic, the kept edges are not);
    *  4. connected components (pointer-jumping min-label);
    *  5. keep the min-id doc per component (the label IS the
    *     component's min id), plus every unpaired doc.
    * Returns the deduplicated dataset with the input's columns. */
  def nearDupDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100): DataFrame = {
    val losers =
      nearDupLabels(df, idCol, textCol, minJaccard, numHashes, bands,
          bucketCap)
        .filter(col("id") =!= col("label"))
        .select(col("id").as(idCol))
    exactDedup(df, textCol, idCol).join(losers, Seq(idCol), "left_anti")
  }

  /** Stages 1–4 of [[nearDupDedup]] as the REUSABLE intermediate every
    * downstream near-dup gate shares: exact-dedup survivors → banded
    * LSH candidates → exact-Jaccard verification → pointer-jumping
    * connected components. Returns `(id, label)` for every doc in a
    * verified near-dup pair (label = component min id) — the q34
    * relation. [[nearDupDedup]], [[nearDupDedupKeepBest]] and
    * [[leakageSafeSplit]] all consume exactly this, so the realistic
    * pipeline (dedup, THEN split, THEN audit) computes the expensive
    * cascade ONCE and feeds the label-taking overloads instead of
    * re-deriving it per stage.
    *
    * Execution discipline: the exact-dedup result feeds two consumers
    * (LSH signatures, word-set join); persist() marks the reuse point
    * (memory-and-disk, so oversized partitions spill rather than
    * evict at scale). The label set is materialized eagerly through
    * the cache via localCheckpoint — (id, label) rows only, so the
    * block footprint is tiny and the ContextCleaner releases the
    * blocks once unreferenced (no session-lifetime CacheManager
    * entry) — then the corpus-sized cache is dropped before
    * returning.
    *
    * Inherits [[lshCandidatePairs]]' EAGER-AT-CONSTRUCTION pair-budget
    * contract: calling this runs the cascade's estimate job (and the
    * component rounds) immediately. */
  def nearDupLabels(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100,
      pairBudget: Long = DefaultLshPairBudget): DataFrame = {
    val survivors = exactDedup(df, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidatePairs(survivors, idCol, textCol, numHashes,
      bands, bucketCap, pairBudget = pairBudget)
    val ws = survivors.select(col(idCol).as("wid"),
      transform(normWordSet(col(textCol)), w => md5Hash60(w)).as("ws"))
    val gated = cands
      .join(ws.select(col("wid").as("a"), col("ws").as("wa")), Seq("a"))
      .join(ws.select(col("wid").as("b"), col("ws").as("wb")), Seq("b"))
      .filter(round(jaccard(col("wa"), col("wb")), 6) >= minJaccard)
      .select(col("a"), col("b"))
    // No extra localCheckpoint here (round 16): connectedComponents'
    // result is already a narrow projection over its own final-round
    // eager checkpoint — materialized, lineage-free, and independent
    // of the corpus cache dropped below. Re-checkpointing it cost one
    // more job per cascade for blocks that duplicated existing ones.
    val labels = connectedComponents(gated)
    survivors.unpersist()
    labels
  }

  /** Incremental exact dedup — the realistic pipeline form: dedupe the
    * new batch internally, then drop anything whose normalized-text
    * hash already exists in the historical index (left_anti on 8-byte
    * hashes; the index never carries text). Returns (survivors,
    * updated index). */
  def dedupAgainstIndex(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      seenHashes: DataFrame): (DataFrame, DataFrame) = {
    val fresh = exactDedup(newDocs, textCol, idCol)
      .withColumn("_h", md5Hash60(norm(col(textCol))))
    val survivors = fresh
      .join(seenHashes.select(col("h").as("_h")), Seq("_h"), "left_anti")
      .drop("_h")
    val newIndex = seenHashes
      .unionByName(fresh.select(col("_h").as("h")))
      .distinct()
    (survivors, newIndex)
  }

  /** Benchmark decontamination as a DATASET operator: drop every
    * corpus document sharing at least `minShared` 8-char shingles with
    * the eval set AND whose shared shingles cover ≥ half its own
    * shingle set (the q47 scan's flag, applied). This is the step a
    * training pipeline actually runs before tokenization — the scan
    * reports, this one cleans.
    *
    * Scale shape: one corpus shingle pass joined against the BROADCAST
    * eval-set hash set (eval suites are small by nature), integer
    * threshold math, then a left_anti on the tiny contaminated-id set
    * (AQE broadcasts it). The corpus is never shuffled. */
  def decontaminate(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Int = 3): DataFrame = {
    def sh(d: DataFrame): DataFrame = d
      .select(col(idCol).as("__did"), explode(charShingles(col(textCol))).as("w"))
      .select(col("__did"), md5Hash60(col("w")).as("h"))
    val evalSh = sh(evalDocs).select(col("h")).distinct().withColumn("hit", lit(1))
    val contaminated = sh(corpus)
      .join(broadcast(evalSh), Seq("h"), "left")
      .groupBy(col("__did"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_shared"))
      .filter(col("n_shared") >= minShared &&
        col("n_shared") * 2 >= col("n_shingles"))
      .select(col("__did").as(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bloom-prefiltered incremental dedup — same CONTRACT as
    * [[dedupAgainstIndex]] (exact result, no false drops), different
    * PLAN: a `graft_bloom` sketch of the index (bounded bytes,
    * broadcast as a literal) splits the new batch map-side into
    * definitely-new rows — which skip the index join entirely, since a
    * Bloom filter has no false negatives — and maybe-seen rows, and
    * only that sliver (true dupes + ~fp-rate noise) pays the anti-join
    * shuffle. At 100 TB/day vs a multi-PB index, that turns the
    * dominant shuffle into a scan-speed filter: the sketch costs ~10
    * bits per index entry at 1% fp (120 MB per 100M entries — broadcast
    * range; shard by hash prefix or raise fp beyond that), while the
    * anti-join would move every row of the batch.
    *
    * The two sketch parameters trade memory for join volume:
    * bits ≈ 1.44 · n · log2(1/fp), hashes ≈ 0.7 · bits / n. */
  def dedupAgainstIndexBloom(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      seenHashes: DataFrame,
      numBits: Int = 1 << 22,
      numHashes: Int = 7): (DataFrame, DataFrame) = {
    // One collect of ONE bounded row (the sketch itself, numBits/8
    // bytes) — the same driver-side footprint class as the IVF
    // centroid literal, not a data collect.
    val sketch: Array[Byte] = seenHashes
      .agg(call_function("graft_bloom", col("h"), lit(numBits), lit(numHashes)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val fresh = exactDedup(newDocs, textCol, idCol)
      .withColumn("_h", md5Hash60(norm(col(textCol))))
    val maybeSeen = col("_maybe_seen")
    val flagged = fresh.withColumn("_maybe_seen",
      call_function("graft_bloom_contains", lit(sketch), col("_h")))
    val survivors = flagged.filter(!maybeSeen).drop("_maybe_seen")
      .unionByName(flagged.filter(maybeSeen).drop("_maybe_seen")
        .join(seenHashes.select(col("h").as("_h")), Seq("_h"), "left_anti"))
      .drop("_h")
    val newIndex = seenHashes
      .unionByName(fresh.select(col("_h").as("h")))
      .distinct()
    (survivors, newIndex)
  }

  /** Hash-prefix-SHARDED Bloom prefilter — same CONTRACT as
    * [[dedupAgainstIndex]] and [[dedupAgainstIndexBloom]] (exact
    * result, no false drops), built for the index size where ONE
    * sketch stops working. [[dedupAgainstIndexBloom]] collects a
    * single sketch to the driver and folds it into the plan as a
    * literal, which caps out around ~100M index entries (120 MB at 1%
    * fp — the ceiling its own docstring declares). Here the index
    * never leaves the cluster:
    *
    *  1. the index groups by `pmod(h, shards)` and each shard
    *     aggregates its OWN bounded `graft_bloom` sketch — a
    *     (shard, sketch) relation of `shards` rows, built with one
    *     map-side-combining pass (the OR-merge is per shard group);
    *  2. each new-batch row computes its shard from its hash and joins
    *     THAT shard's sketch only — the probe is still one codegen'd
    *     `graft_bloom_contains` per row. While total sketch bytes fit
    *     the broadcast threshold, AQE broadcasts the relation and the
    *     plan equals the monolithic one; past it, the join shuffles by
    *     shard and no task ever holds more than the shards it probes —
    *     that graceful degradation IS the scale path (a multi-PB index
    *     wants shards ≥ cluster parallelism);
    *  3. a batch row whose shard has no index entries has no sketch
    *     row (left join miss) — definitely new, `coalesce(false)`;
    *  4. maybe-seen rows verify against the real index exactly as in
    *     the monolithic form, so false positives cannot drop rows.
    *
    * Per-shard parameters keep the fp math of the monolithic sketch:
    * with uniform hashes each shard holds ~n/shards entries, so
    * `numBitsPerShard ≈ numBits/shards` preserves bits-per-entry and
    * therefore the fp rate. Probing one shard of k bits is equivalent
    * to probing a monolithic union-of-shards sketch OR-composed over
    * disjoint key ranges — membership verdicts for inserted keys are
    * identical (no false negatives either way; only the fp PATTERN on
    * novel keys differs, and the verify join absorbs that). */
  def dedupAgainstIndexBloomSharded(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      seenHashes: DataFrame,
      shards: Int = 16,
      numBitsPerShard: Int = 1 << 18,
      numHashes: Int = 7): (DataFrame, DataFrame) = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val sketches = seenHashes
      .groupBy(pmod(col("h"), lit(shards.toLong)).cast("int").as("_shard"))
      .agg(call_function("graft_bloom",
        col("h"), lit(numBitsPerShard), lit(numHashes)).as("_bf"))
    val fresh = exactDedup(newDocs, textCol, idCol)
      .withColumn("_h", md5Hash60(norm(col(textCol))))
      .withColumn("_shard", pmod(col("_h"), lit(shards.toLong)).cast("int"))
    val flagged = fresh
      .join(sketches, Seq("_shard"), "left")
      .withColumn("_maybe_seen", coalesce(
        call_function("graft_bloom_contains", col("_bf"), col("_h")),
        lit(false)))
      .drop("_bf", "_shard")
    val maybeSeen = col("_maybe_seen")
    val survivors = flagged.filter(!maybeSeen).drop("_maybe_seen")
      .unionByName(flagged.filter(maybeSeen).drop("_maybe_seen")
        .join(seenHashes.select(col("h").as("_h")), Seq("_h"), "left_anti"))
      .drop("_h")
    val newIndex = seenHashes
      .unionByName(fresh.select(col("_h").as("h")))
      .distinct()
    (survivors, newIndex)
  }

  /** Line-level boilerplate removal (the C4 cleaning step,
    * arXiv:1910.10683 §2.2 applied corpus-wide): a LINE that occurs in
    * at least `minDocs` DISTINCT documents is boilerplate (nav bars,
    * cookie banners, license headers) and is dropped from every
    * document; each document is reassembled from its surviving lines
    * in original order. Matching is exact on the raw line — unlike the
    * doc-level dedup family there is no normalization, because
    * boilerplate is byte-identical by construction (templates).
    *
    * Scale shape: one map-only posexplode to (doc, pos, line), one
    * aggregation keyed by the 8-byte line hash counting DISTINCT docs
    * (partial-merge friendly), then the boilerplate set — corpus-wide
    * SMALL by the same Zipf argument as the K30/K34 vocabularies: a
    * line either repeats across many docs (few such lines) or is
    * unique (not in the set) — joins back against the exploded lines
    * (AQE broadcasts it) and one shuffle by doc reassembles. The full
    * corpus text crosses the wire once, as its own lines.
    *
    * Returns (doc_id, n_lines, n_kept, text) with `text` the
    * sep-rejoined surviving lines ('' when everything was
    * boilerplate). */
  def lineDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // spread before the line explode + per-line md5 (see util.Spread).
    // KEPT on a round-16 quiet-box interleaved A/B (spread 1.57s vs
    // revert 1.88-2.16s, min-of-3 x 3 JVM pairs): the final
    // groupBy(doc_id) reuses this partitioning, and the r15 artifact's
    // 7.75s reading was box contention (same-day 8-core run: 0.95s).
    val lines = graft.util.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .withColumn("_lh", md5Hash60(col("line")))
    val boiler = lines
      .groupBy(col("_lh"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_lh"), lit(true).as("_boiler"))
    lines
      .join(boiler, Seq("_lh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("_boiler").isNull, 1)).as("n_kept"),
        // collect_list drops the nulls the `when` leaves for boilerplate
        // lines; array_sort orders the survivors by pos (first struct field)
        array_join(
          transform(
            array_sort(collect_list(when(col("_boiler").isNull,
              struct(col("pos"), col("line"))))),
            e => e.getField("line")),
          sep).as("text"))
  }

  /** Duplicated-n-gram statistics (the substring-level view of
    * arXiv:2107.06499: exact-substring dedup's MEASUREMENT pass): a
    * word n-gram occurring in more than one document is "duplicated";
    * per document, count total grams, duplicated-gram instances, and
    * the exact integer parts-per-million duplicated fraction
    * (`dup_ppm = n_dup·1e6 div n_grams` — no float division anywhere,
    * the q67/q75 integer rule). High dup_ppm flags documents that are
    * mostly recycled text even when no full-document near-dup fires.
    *
    * Scale shape: each gram leaves its row as an 8-byte md5-derived
    * hash (the gram string exists only inside the map-only transform,
    * never in a shuffle); the duplicated-gram set is
    * (gram-hash → distinct-doc-count ≥ 2) — one partial-merge
    * aggregation — and joins back per gram instance before the final
    * by-doc rollup. Two shuffles total, both on 8-byte keys. */
  def dupNgramStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val ws = words(col(textCol))
    // spread before the positional-gram transform (see util.Spread)
    val grams = graft.util.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"), ws.as("_ws"), size(ws).as("_nw"))
      .filter(col("_nw") >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("_nw") - n),
          i => md5Hash60(array_join(slice(col("_ws"), i + 1, lit(n)), " "))))
          .as("_gh"))
    val dup = grams
      .groupBy(col("_gh"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= 2)
      .select(col("_gh"), lit(true).as("_dup"))
    grams
      .join(dup, Seq("_gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("_dup"), 1)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("n_dup * 1000000 div n_grams").as("dup_ppm"))
  }

  /** Asymmetric containment detection (doc-inside-doc): exact
    * containment `C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)|` in
    * integer ppm over DISTINCT word n-gram sets, for candidate pairs
    * from an n-gram postings self-join. The Jaccard-gated near-dup
    * stack (q21/q57) structurally misses a small document quoted
    * whole inside a much larger one — Jaccard ≈ |a|/|b| vanishes as
    * the host grows, while containment stays 1.0; this operator is
    * the quotation/subsumption detector.
    *
    * Scale shape: postings with document frequency > `dfCap` are
    * dropped BEFORE the self-join, bounding each gram's pair fan-out
    * at dfCap² (the standard prefix-filter guard). A capped gram is a
    * template/boilerplate gram — a pair sharing ONLY those is
    * boilerplate reuse, which line-level dedup (q80) owns, not
    * quotation. Pairs shuffle as 8-byte gram hashes + ids; document
    * text never reaches the join. Returns pairs whose larger-direction
    * containment ≥ `minPpm`, with both directions reported. */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      dfCap: Int = 50,
      minPpm: Long = 500000L): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(dfCap >= 2, s"dfCap must be >= 2, got $dfCap")
    val ws = words(col(textCol))
    // DISTINCT gram sets: containment is a set measure, so a gram
    // repeated inside one doc counts once (array_distinct post-hash).
    // Spread before the gram transform (see util.Spread).
    val grams = graft.util.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("id"), ws.as("_ws"), size(ws).as("_nw"))
      .filter(col("_nw") >= n)
      .select(col("id"),
        explode(array_distinct(
          transform(sequence(lit(0), col("_nw") - n),
            i => md5Hash60(array_join(slice(col("_ws"), i + 1, lit(n)), " ")))))
          .as("_gh"))
    val setSizes = grams.groupBy(col("id")).agg(count(lit(1)).as("ng"))
    val rare = grams
      .withColumn("_df", count(lit(1))
        .over(Window.partitionBy(col("_gh"))))
      .filter(col("_df") <= dfCap)
      .select(col("id"), col("_gh"))
    val shared = rare.select(col("id").as("id_a"), col("_gh"))
      .join(rare.select(col("id").as("id_b"), col("_gh")), Seq("_gh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(setSizes.select(col("id").as("id_a"), col("ng").as("na")),
        Seq("id_a"))
      .join(setSizes.select(col("id").as("id_b"), col("ng").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("na"), col("nb"),
        expr("n_shared * 1000000 div na").as("cont_a_ppm"),
        expr("n_shared * 1000000 div nb").as("cont_b_ppm"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= minPpm)
  }

  /** Raw banded MinHash keys — `(id, band, key)` — the STORED form of
    * the LSH index. Unlike [[lshCandidatePairs]]' refined bands, no
    * bucket-cap refinement is applied here: refinement depends on the
    * corpus-wide bucket census at query time, while a persisted index
    * must be computable per document (a new doc's keys cannot depend
    * on how many neighbours it will meet). */
  def bandKeys(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 4,
      shingler: Column => Column = normWordSet): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide into bands ($bands)")
    val r = numHashes / bands
    val sigs = minHashSignatures(df, idCol, textCol, numHashes, shingler)
    val bandCols = (0 until bands).map { j =>
      concat_ws("|", (j * r until (j + 1) * r).map(i => col(s"sig$i")): _*)
    }
    sigs.select(col("id"),
        posexplode(array(bandCols: _*)).as(Seq("band", "key")))
      .withColumn("band", col("band").cast("long"))
  }

  /** Incremental LSH index maintenance: the `(op, id, band, key)`
    * delta that brings a persisted band-key index (the [[bandKeys]]
    * form) from the OLD corpus snapshot to the NEW one — deletes for
    * removed docs and for the stale keys of changed docs (computed
    * from the OLD text), inserts for added docs and the fresh keys of
    * changed docs (from the NEW text). Unchanged docs never reach the
    * signature stage: the snapshot diff runs first on digests alone,
    * and only the delta ids join back to their text — so nightly
    * index upkeep costs O(changed docs), not O(corpus), which is the
    * entire point of keeping the index persistent. Composes
    * [[graft.operators.Curation.snapshotDiff]] with [[bandKeys]]. */
  def lshIndexDelta(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 4): DataFrame = {
    val diff = Curation.snapshotDiff(oldSnap, newSnap, idCol, textCol)
    def side(snap: DataFrame, statuses: Seq[String], op: String) = {
      val ids = diff.filter(col("status").isin(statuses: _*))
        .select(col(idCol))
      bandKeys(snap.join(ids, Seq(idCol)), idCol, textCol, numHashes, bands)
        .select(lit(op).as("op"), col("id"), col("band"), col("key"))
    }
    side(oldSnap, Seq("removed", "changed"), "del")
      .unionByName(side(newSnap, Seq("added", "changed"), "ins"))
  }

  /** [[nearDupDedup]] with a QUALITY-ARGMAX keeper: per near-dup
    * cluster, keep the highest-`quality` document (ties break to the
    * lowest id) instead of the lowest-id one. This is the policy real
    * curation runs — when a page and its boilerplate-stripped mirror
    * collide, you want the longer/cleaner copy, not whichever crawled
    * first. `quality` is any integer column expression over the doc's
    * columns (token count, a K52 score, …).
    *
    * Same five stages and scale shapes as [[nearDupDedup]]; only the
    * keeper rule differs. The exact-dedup pre-stage still keeps the
    * min-id copy of byte-identical groups — when `quality` is a pure
    * function of the text (the normal case), identical bytes score
    * identically, so min-id IS the quality-argmax there. The argmax
    * itself is one row_number window partitioned by component label —
    * components are bucket-capped small while numbering in the
    * millions at corpus scale, so the label partitioning is the
    * parallelism and no global sort exists. */
  def nearDupDedupKeepBest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      quality: Column,
      minJaccard: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100): DataFrame =
    nearDupDedupKeepBest(df, idCol, textCol, quality,
      nearDupLabels(df, idCol, textCol, minJaccard, numHashes, bands,
        bucketCap))

  /** Label-reuse form of [[nearDupDedupKeepBest]]: `labels` is a
    * precomputed `(id, label)` near-dup component relation — the
    * [[nearDupLabels]] / q34 output — so a pipeline that already ran
    * the LSH cascade (for dedup, or for [[leakageSafeSplit]]) pays
    * only the quality argmax here, not a full re-derivation of
    * candidates + verification + components. */
  def nearDupDedupKeepBest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      quality: Column,
      labels: DataFrame): DataFrame = {
    val survivors = exactDedup(df, textCol, idCol)
    val qual = survivors.select(col(idCol).as("id"),
      quality.cast(LongType).as("_q"))
    val byComp = Window.partitionBy(col("label"))
      .orderBy(col("_q").desc, col("id"))
    val losers = labels
      .join(qual, Seq("id"))
      .withColumn("_rn", row_number().over(byComp))
      .filter(col("_rn") > 1)
      .select(col("id").as(idCol))
    survivors.join(losers, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/val/test split — near-dup-AWARE partitioning:
    * every member of a near-duplicate cluster (and every
    * byte-identical copy) lands in the SAME split, so evaluation rows
    * can never be near-copies of training rows. A plain per-doc hash
    * split leaks by construction: at web scale a few percent of docs
    * have a near-copy, and an independent coin per doc strands half
    * of each pair across the train/eval boundary.
    *
    * Root chain: doc → its exact-dup group keeper (min id per
    * normalized text, [[exactDedup]]'s keeper rule) → that keeper's
    * near-dup component label (the q34 machinery: banded LSH
    * candidates, exact-Jaccard gate, pointer-jumping CC) → split =
    * salted 52-bit hash of the ROOT thresholded in ppm. Deterministic
    * end to end — the same corpus splits identically across engines,
    * runs, and restarts, and adding docs never moves an existing
    * cluster between splits unless the clusters themselves merge.
    *
    * Shape at 100 TB: the cluster stages are [[nearDupDedup]]'s
    * verbatim (its adjudications carry over); the additions are two
    * id-to-id joins on 8-byte keys and a map-side hash — nothing new
    * shuffles. */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      valPpm: Long = 100000L,
      testPpm: Long = 100000L,
      minJaccard: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 4,
      bucketCap: Int = 100): DataFrame =
    leakageSafeSplit(df, idCol, textCol, valPpm, testPpm,
      nearDupLabels(df, idCol, textCol, minJaccard, numHashes, bands,
        bucketCap))

  /** Label-reuse form of [[leakageSafeSplit]]: `labels` is a
    * precomputed `(id, label)` near-dup component relation (the
    * [[nearDupLabels]] / q34 output over THIS corpus), so the
    * realistic dedup-then-split pipeline runs the LSH cascade once
    * and this form adds only two id-to-id joins on 8-byte keys and a
    * map-side hash — nothing new shuffles. */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      valPpm: Long,
      testPpm: Long,
      labels: DataFrame): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm <= 1000000L,
      s"split fractions must satisfy 0 <= val + test <= 1e6 ppm, " +
        s"got val=$valPpm test=$testPpm")
    // doc → exact-group keeper (min id per normalized-text hash; the
    // same rule exactDedup applies, so keepers == its survivors)
    val hashed = df.select(col(idCol).as("id"),
      md5Hash60(norm(col(textCol))).as("_h"))
    val withKeeper = hashed
      .join(hashed.groupBy(col("_h")).agg(min(col("id")).as("_keeper")),
        Seq("_h"))
      .select(col("id"), col("_keeper"))
    val rooted = withKeeper
      .join(labels.select(col("id").as("_keeper"), col("label")),
        Seq("_keeper"), "left")
      .select(col("id"), coalesce(col("label"), col("_keeper")).as("root"))
    val bucket = pmod(
      md5Hash52(concat(lit("split:"), col("root").cast("string"))),
      lit(1000000L))
    rooted.select(col("id").as(idCol), col("root"),
      when(bucket < testPpm, lit("test"))
        .when(bucket < testPpm + valPpm, lit("val"))
        .otherwise(lit("train")).as("split"))
  }

  /** Contamination SPAN audit: per corpus document, the longest
    * CONTIGUOUS run of word n-grams shared with the eval set — the
    * quantity decontamination policies actually threshold on ("any
    * contiguous 13-gram match", "overlap span ≥ 50 tokens"), which
    * q47's shared-shingle COUNT cannot distinguish from scattered
    * coincidental overlap. A run of `r` consecutive shared n-grams is
    * a contiguous block of `r + n − 1` shared tokens (`span_tokens`).
    *
    * Shape: positional n-grams on the corpus side; the eval side
    * collapses to a DISTINCT gram-hash set (positions irrelevant) that
    * broadcasts — eval sets are benchmark-sized, the corpus is not.
    * Matched positions are grouped into maximal runs by the
    * gaps-and-islands identity (`pos − row_number()` is constant
    * within a run); the window runs ONLY over matched rows — rare by
    * construction — partitioned by doc, so no corpus-wide window or
    * sort exists. Docs shorter than `n` words carry no grams and are
    * absent, same contract as [[dupNgramStats]]. */
  def contaminationSpans(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(d: DataFrame): DataFrame = {
      val ws = words(col(textCol))
      // spread before the positional-gram transform (interpreted HOF
      // md5 per gram — the expensive narrow phase; see util.Spread)
      graft.util.Spread.byKey(
          d.select(col(idCol).as("doc_id"), ws.as("_ws"), size(ws).as("_nw"))
            .filter(col("_nw") >= n), col("doc_id"))
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), col("_nw") - n),
            i => md5Hash60(array_join(slice(col("_ws"), i + 1, lit(n)), " "))))
            .as(Seq("pos", "gh")))
    }
    val ev = grams(evalDocs).select(col("gh")).distinct()
    val cg = grams(corpus)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = cg.join(broadcast(ev), Seq("gh"))
      .select(col("doc_id"), col("pos"))
      .withColumn("_grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(count(lit(1)).as("_run"))
      .groupBy(col("doc_id"))
      .agg(max(col("_run")).as("_maxrun"), sum(col("_run")).as("_nhit"))
    cg.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("_nhit"), lit(0L)).as("n_hit"),
        coalesce(col("_maxrun"), lit(0L)).as("max_run"),
        coalesce(col("_maxrun") + lit(n - 1).cast(LongType), lit(0L))
          .as("span_tokens"))
  }

  /** Rare-token scrub — k-anonymity-style redaction: any token whose
    * corpus DOCUMENT frequency is below `minDocs` is replaced by
    * `unk`, docs reassembled in order. A token appearing in fewer than
    * k documents is a quasi-identifier (usernames, ticket ids, long
    * serials survive PII regexes; corpus-frequency thresholds don't
    * care what shape the secret has) and doubles as vocabulary-tail
    * noise removal before tokenizer training.
    *
    * The inverse polarity of [[lineDedup]] — that drops what is TOO
    * COMMON, this masks what is TOO RARE — with one structural
    * consequence: the rare set is the Zipf TAIL, typically most of the
    * distinct vocabulary, so it must NEVER broadcast. Token instances
    * join the rare relation on 8-byte token hashes (one hash-partition
    * shuffle each side); reassembly is the [[lineDedup]]
    * collect-sort-join rollup keyed by doc. Token strings cross the
    * wire once, inside the per-doc rollup. */
  /** Duplicated-span scrub — exact-substring deduplication in the
    * style of Lee et al. 2021 (arXiv:2107.06499, "Deduplicating
    * Training Data Makes Language Models Better"): every token
    * position covered by a word n-gram occurring in at least
    * `minDocs` DISTINCT documents is REMOVED (the whole duplicated
    * run disappears, not just its first token), and documents are
    * reassembled from the surviving tokens in order.
    * [[dupNgramStats]] measures this duplication; this operator acts
    * on it. Granularity/polarity neighbors: [[lineDedup]] drops
    * too-common LAYOUT LINES, [[rareTokenScrub]] masks too-RARE
    * tokens, this drops too-common token RUNS regardless of layout.
    *
    * Coverage law: position p of an nw-token doc is removed iff some
    * duplicated gram starts in [max(0, p−n+1), min(p, nw−n)]. Docs
    * with fewer than n tokens have no grams and pass unchanged; a
    * fully-covered doc survives as an empty text with the removal
    * fully accounted (n_removed = n_tokens).
    *
    * Shape at 100 TB: grams shuffle as 8-byte hashes (one groupBy
    * builds the dup set); the dup relation is corpus-duplication-
    * sized, so it joins the gram stream on hash and is NEVER
    * broadcast. Covered positions fan out ≤ n per duplicated gram
    * occurrence (map-side explode) and collapse in the per-(doc, pos)
    * distinct; reassembly is the [[rareTokenScrub]] collect-sort
    * rollup keyed by doc — text crosses the wire once, as its own
    * tokens. */
  def dupSpanScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = graft.util.Spread.byKey(
      docs.select(col(idCol).as("doc_id"), words(col(textCol)).as("_ws")),
      col("doc_id"))
    val toks = base
      .select(col("doc_id"), posexplode(col("_ws")).as(Seq("pos", "tok")))
    val grams = base
      .select(col("doc_id"), col("_ws"), size(col("_ws")).as("_nw"))
      .filter(col("_nw") >= n)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("_nw") - n),
          i => md5Hash60(array_join(slice(col("_ws"), i + 1, lit(n)), " "))))
          .as(Seq("s", "gh")))
    val dup = grams
      .groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("gh"))
    val covered = grams
      .join(dup, Seq("gh"))
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + lit(n - 1))).as("pos"))
      .distinct()
      .withColumn("_cov", lit(true))
    toks
      .join(covered, Seq("doc_id", "pos"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("_cov"), 1)).as("n_removed"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"),
                when(col("_cov"), lit(1)).otherwise(lit(0)).as("cov"),
                col("tok")))),
              e => e.getField("cov") === 0),
            e => e.getField("tok")),
          " ").as("text"))
  }

  def rareTokenScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int = 2,
      unk: String = "<unk>"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // spread before the token explode + per-token md5 (see util.Spread)
    val toks = graft.util.Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        posexplode(words(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("_th", md5Hash60(col("tok")))
    val rare = toks
      .groupBy(col("_th"))
      .agg(countDistinct(col("doc_id")).as("_nd"))
      .filter(col("_nd") < minDocs)
      .select(col("_th"), lit(true).as("_rare"))
    toks
      .join(rare, Seq("_th"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("_rare"), 1)).as("n_scrubbed"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"),
              when(col("_rare"), lit(unk)).otherwise(col("tok")).as("tok")))),
            e => e.getField("tok")),
          " ").as("text"))
  }

  /** Edit-distance similarity JOIN at threshold 1 — the fuzzy
    * key-match every entity-resolution pass needs (misspelled names,
    * fat-fingered codes), via DELETION NEIGHBORHOODS (the symmetric-
    * delete dictionary trick; deletion-only variant families go back
    * to Mor & Fraenkel, CACM 1982): two strings within edit distance
    * 1 (substitute/insert/delete one char) necessarily share a member
    * of {s} ∪ {s minus one char}, so candidates come from a banded
    * equi-join on the ≤ len+1 variant HASHES per string — never an
    * all-pairs product, the LSH-for-edit-distance analog. Candidates
    * then verify with the exact `levenshtein` (identical classic DP
    * in both engines) — the K4 band-then-verify discipline.
    *
    * Variants carry their length so the band key prunes cross-length
    * collisions cheaply (|len(a) − len(b)| ≤ 1 is implied by sharing
    * a variant, but hashing (variant) alone would merge unrelated
    * bands of very different strings only at hash-collision rate;
    * the exact verify keeps false positives harmless either way).
    *
    * Shape at 100 TB: fan-out ≤ maxLen+1 8-byte hashes per row
    * (strings past maxLen are excluded — stated, filtered: fuzzy
    * KEY matching is a short-string problem), one shuffle on the
    * variant hash, per-bucket pairs bounded by bucket size, exact
    * verify on the pair relation.
    *
    * Pair budget, DEFAULT-ON (round-12: the raw API previously
    * shipped unguarded while the gated entry passed a df-cap — the
    * inconsistency a direct caller would pay for on an adversarially
    * dense key space): the exact candidate estimate
    * Σ_key |left postings| · |right postings| is computed BEFORE the
    * band join and a corpus over `pairBudget` fails immediately with
    * the estimate in the error (the [[guardPairBudget]] discipline
    * for a two-sided join). EAGER-AT-CONSTRUCTION contract: building
    * this DataFrame runs the estimate job and pins both variant
    * relations as DISK_ONLY localCheckpoints (estimate and join share
    * one variant computation; the input snapshots freeze here). Pass
    * `pairBudget = Long.MaxValue` to opt out. `variantDfCap` remains
    * the recall-trading REPAIR once the budget fires —
    * [[editDistanceCapAudit]] prices what it drops.
    *
    * Output: (left id, right id, left string, right string,
    * distance), distance ≤ 1, self-pairs excluded by id. */
  def editDistanceJoin(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 64,
      variantDfCap: Int = Int.MaxValue,
      pairBudget: Long = DefaultLshPairBudget): DataFrame = {
    require(variantDfCap >= 1, s"variantDfCap must be >= 1: $variantDfCap")
    val lv0 = capVariants(
      editVariants(left, idCol, strCol, maxLen, "left_id", "left_str"),
      variantDfCap)
    val rv0 = capVariants(
      editVariants(right, idCol, strCol, maxLen, "right_id", "right_str"),
      variantDfCap)
    if (pairBudget != Long.MaxValue) {
      // Estimate in ONE job over a tagged union of the variant-HASH
      // columns only (no ids/strings shuffled), and let the join
      // recompute the variants: unlike the LSH guard — whose banded
      // relation costs a full signature aggregation and so earns its
      // DISK_ONLY checkpoint — deletion variants are a stateless
      // projection, and at bench scale a checkpoint round-trip costs
      // MORE than the recompute (measured at sf0.1: four-job
      // checkpointed guard q183 4.76→7.99 s, one-job recompute form
      // → ~5.5 s). At 100× the double variant pass is one extra scan
      // of a string column against a shuffle-bound join.
      val est = lv0.select(col("_h"), lit(true).as("_l"))
        .unionByName(rv0.select(col("_h"), lit(false).as("_l")))
        .groupBy(col("_h"))
        .agg(count(when(col("_l"), 1)).as("nl"),
          count(when(!col("_l"), 1)).as("nr"))
        .agg(coalesce(sum(col("nl") * col("nr")), lit(0L)).as("est"))
        .head().getLong(0)
      require(est <= pairBudget,
        s"editDistanceJoin: the variant postings imply $est candidate " +
          s"pairs, over the $pairBudget pair budget — the key space is " +
          "adversarially dense (hot deletion variants shared by " +
          "thousands of strings). Set variantDfCap to drop the hot " +
          "variants (editDistanceCapAudit prices the loss) or raise " +
          "pairBudget deliberately.")
    }
    val (lv, rv) = (lv0, rv0)
    lv.join(rv, Seq("_h"))
      .filter(col("left_id") =!= col("right_id"))
      .select(col("left_id"), col("right_id"),
        col("left_str"), col("right_str"))
      .distinct()
      .withColumn("distance",
        levenshtein(col("left_str"), col("right_str")).cast("long"))
      .filter(col("distance") <= 1)
  }

  /** Deletion-neighborhood variant postings for [[editDistanceJoin]]:
    * (id, str, variant hash), one DISTINCT row per (string, variant)
    * — at most len+1 per string. */
  private def editVariants(
      side: DataFrame, idCol: String, strCol: String, maxLen: Int,
      ip: String, sp: String): DataFrame = {
    val s = col(strCol)
    graft.util.Spread.byKey(
        side.filter(length(s) <= maxLen && length(s) >= 1), col(idCol))
      .select(col(idCol).as(ip), s.as(sp),
        explode(array_distinct(concat(array(s),
          transform(sequence(lit(1), length(s)), i =>
            concat(call_function("substring", s, lit(1), i - 1),
              call_function("substring", s, i + 1, length(s)))))))
          .as("_v"))
      // band key = hash of (variant length, variant): the length
      // component prunes cross-length hash-collision merges, as the
      // scaladoc promises (exact verify keeps any residue harmless)
      .select(col(ip), col(sp),
        md5Hash60(concat(length(col("_v")).cast("string"),
          lit("\u0001"), col("_v"))).as("_h"))
      .distinct()
  }

  /** The df-cap (the K70/K97 postings-cap discipline applied to
    * deletion variants): a variant hash carried by more than
    * `variantDfCap` strings on this side is a STOP-VARIANT — on an
    * adversarially dense key space (sequential zero-padded codes,
    * where every string has dozens of genuine distance-1 partners)
    * the hot variants drive the candidate relation super-linear, so
    * their postings are dropped wholesale before the band join. The
    * join then UNDER-reports pairs whose every shared variant is hot
    * — stated, and never silent: [[editDistanceCapAudit]] reports
    * the capped keys and the dropped postings mass. The count window
    * partitions on the key the band join shuffles on anyway, so the
    * cap adds no extra exchange. */
  private def capVariants(v: DataFrame, variantDfCap: Int): DataFrame =
    if (variantDfCap == Int.MaxValue) v
    else v
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("_h"))))
      .filter(col("_n") <= variantDfCap)
      .drop("_n")

  /** Under-join audit for [[editDistanceJoin]]'s df-cap — one row
    * per side (`side` in 'left'/'right'): variant-key count, keys
    * over the cap, the largest postings list, and the postings mass
    * the cap drops. A zero `n_capped_keys` row is this corpus's
    * cap-did-not-bind certificate. */
  def editDistanceCapAudit(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      strCol: String,
      maxLen: Int = 64,
      variantDfCap: Int = Int.MaxValue): DataFrame = {
    require(variantDfCap >= 1, s"variantDfCap must be >= 1: $variantDfCap")
    def sideAudit(side: DataFrame, ip: String, sp: String, tag: String) =
      editVariants(side, idCol, strCol, maxLen, ip, sp)
        .groupBy(col("_h")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_variant_keys"),
          count(when(col("n") > variantDfCap, 1)).as("n_capped_keys"),
          coalesce(max(col("n")), lit(0L)).as("max_postings"),
          coalesce(sum(when(col("n") > variantDfCap, col("n"))), lit(0L))
            .as("dropped_postings"))
        .select(lit(tag).as("side"), col("n_variant_keys"),
          col("n_capped_keys"), col("max_postings"),
          col("dropped_postings"))
    sideAudit(left, "left_id", "left_str", "left")
      .unionByName(sideAudit(right, "right_id", "right_str", "right"))
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** Shared DuckDB-oracle SQL fragments and generators — the
  * literal-driven both-sides helpers (one Scala constant drives the
  * Spark plan AND the unrolled oracle SQL).
  *
  * Part of the [[SparkEntry]] registry split (round 10).
  */
private[graft] trait EntryOracleFragments extends EntryAnalyticsStatsDefs {

  /** SQL VALUES list of the MinHash coefficients — generated from the
    * same Scala constants the operators use. */
  private[graft] def minHashCoeffsSql(numHashes: Int): String =
    graft.operators.TextDedup.minHashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** Shared q158/q159 oracle fragment: the BPE merge chain unrolled
    * from the SAME literal table the Spark plan folds (the
    * minHashCoeffsSql pattern — one constant list drives both sides).
    * DuckDB's `replace` shares Java's left-to-right non-overlap scan,
    * and the double-separator wrapping makes that exactly BPE's
    * leftmost pair pass (see TextAnalysis.bpeEncode). `inner` is the
    * text expression to encode. */
  private[graft] def bpeChainSql(inner: String): String = {
    def w(t: String) = s"chr(1) || '$t' || chr(1)"
    graft.operators.TextAnalysis.defaultBpeMerges.foldLeft(
      s"regexp_replace($inner, '([^ ])', chr(1) || '\\1' || chr(1), 'g')") {
      case (acc, (x, y)) => s"replace($acc, ${w(x)} || ${w(y)}, ${w(x + y)})"
    }
  }

  /** q160/q161 oracle fragment: the BPE TRAINING rounds unrolled
    * mechanically (the kmeansCtesSql pattern). Round i CTEs: `tk$i`
    * segments the frequency-weighted vocab under the merges so far,
    * `pr$i` counts adjacent pairs weighted by word frequency, `m$i`
    * is the (count DESC, l, r) argmax, `r$i` applies it. The learned
    * table lives in m1..m$rounds. */
  private[graft] def bpeTrainCtesSql(
      rounds: Int, docs: String = "documents"): String = {
    def round(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""tk$i AS (SELECT string_split(trim(enc, chr(1)), chr(1) || chr(1)) AS tk, n
                   FROM $prev),
         pr$i AS (SELECT tk[j] AS l, tk[j + 1] AS r, CAST(sum(n) AS BIGINT) AS np
                  FROM tk$i, UNNEST(range(1, len(tk))) AS u(j) GROUP BY 1, 2),
         m$i AS MATERIALIZED (
                 SELECT CAST($i AS BIGINT) AS mrank, l, r, np
                 FROM pr$i ORDER BY np DESC, l, r LIMIT 1),
         r$i AS MATERIALIZED (
                 SELECT replace(enc, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                                chr(1) || m.l || m.r || chr(1)) AS enc, n
                 FROM $prev, m$i m)"""
    }
    s"""v AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
               SELECT unnest(string_split(text, ' ')) AS word FROM $docs) z
             WHERE word <> '' GROUP BY word),
       r0 AS (SELECT regexp_replace(word, '(.)', chr(1) || '\\1' || chr(1), 'g') AS enc, n
              FROM v),
       ${(1 to rounds).map(round).mkString(",\n       ")}"""
  }

  /** Encode-under-learned-merges chain + per-lang fertility rollup —
    * the q242/q157 'tok' relation: merges trained (via
    * [[bpeTrainCtesSql]] CTEs m1..m`rounds`, already in scope) are
    * applied to `docs`, then the q178 card shape per language. CTE
    * names are ta0..ta`rounds`/tokj/tokf (collision-free with the
    * kmeans a$$i chain q157 also embeds). */
  private[graft] def bpeFertilityCtesSql(
      rounds: Int, docs: String): String =
    s"""ta0 AS (SELECT doc_id,
                regexp_replace(text, '([^ ])', chr(1) || '\\1' || chr(1), 'g') AS enc
              FROM $docs),
       ${(1 to rounds).map(i =>
          s"""ta$i AS (SELECT doc_id,
                 replace(enc, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                         chr(1) || m.l || m.r || chr(1)) AS enc
               FROM ta${i - 1}, m$i m)""").mkString(",\n       ")},
       tokj AS (SELECT d.lang, CAST(length(d.text) AS BIGINT) AS nch,
                       CAST(len(list_filter(string_split(d.text, ' '),
                         x -> x <> '')) AS BIGINT) AS nws,
                       CAST(len(list_filter(string_split(
                         replace(replace(t.enc, chr(1) || chr(1), ' '), chr(1), ''),
                         ' '), x -> x <> '')) AS BIGINT) AS ntk
                FROM $docs d JOIN ta$rounds t USING (doc_id)),
       tokf AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(nch) AS BIGINT) AS n_chars,
                       CAST(sum(nws) AS BIGINT) AS n_ws_tokens,
                       CAST(sum(ntk) AS BIGINT) AS n_tokens,
                       CASE WHEN sum(ntk) > 0
                            THEN CAST(sum(nch) * 1000000 // sum(ntk) AS BIGINT)
                            ELSE 0 END AS chars_per_token_ppm,
                       CASE WHEN sum(nws) > 0
                            THEN CAST(sum(ntk) * 1000000 // sum(nws) AS BIGINT)
                            ELSE 0 END AS fertility_ppm
                FROM tokj GROUP BY lang)"""

  /** q158/q159 shared token-list CTE body over `documents`. */
  private[graft] def bpeToksSql: String =
    s"""e AS (SELECT doc_id, ${bpeChainSql("text")} AS enc FROM documents),
        tk AS (SELECT doc_id,
                      list_filter(string_split(
                        replace(replace(enc, chr(1) || chr(1), ' '), chr(1), ''),
                        ' '), x -> x <> '') AS toks
               FROM e)"""

  /** Shared oracle fragment: MinHash + banded LSH candidate pairs with
    * the bucket-size guard — mirrors TextDedup.lshCandidatePairs over
    * any `w(doc_id, word)` shingle CTE. Buckets over 100 docs are
    * refined by the exact shingle-set hash, exactly like the Spark
    * side. */
  private[graft] def lshPairsSqlOverShingles(
      wCte: String, numHashes: Int = 64, rowsPerBand: Int = 16,
      pairPred: String = "a.doc_id < b.doc_id"): String =
    s"""${lshBandsSqlOverShingles(wCte, numHashes, rowsPerBand)},
       pairs AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                 FROM rb a JOIN rb b
                   ON a.band = b.band AND a.key = b.key AND $pairPred)"""

  /** The banding core through the refined `rb(doc_id, band, key)`
    * relation — shared by the uncapped pair join above and the
    * degree-capped rank-successor join below. */
  private[graft] def lshBandsSqlOverShingles(
      wCte: String, numHashes: Int = 64, rowsPerBand: Int = 16): String =
    s"""w AS ($wCte),
       hb AS MATERIALIZED (SELECT doc_id,
                     ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
              FROM w),
       hs AS (SELECT doc_id, c.i AS i,
                     MIN((h * c.a + c.b) % 2147483647) AS sig
              FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(numHashes)}) AS c(i, a, b)
              GROUP BY doc_id, c.i),
       sk AS (SELECT doc_id, md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS setkey
              FROM (SELECT DISTINCT doc_id, h FROM hb) GROUP BY doc_id),
       bands AS MATERIALIZED (SELECT doc_id, i // $rowsPerBand AS band,
                        string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                 FROM hs GROUP BY doc_id, (i // $rowsPerBand)),
       bsz AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
       rb AS MATERIALIZED (SELECT b.doc_id, b.band,
                     CASE WHEN s.n <= 100 THEN b.key
                          ELSE b.key || '!' || k.setkey END AS key
              FROM bands b JOIN bsz s USING (band, key) JOIN sk k USING (doc_id))"""

  /** Degree-capped candidate pairs — mirrors
    * `TextDedup.lshCandidatePairsCapped`: rank within each refined
    * bucket by doc id, pair each member with its `degreeCap` nearest
    * rank successors. */
  private[graft] def lshCappedPairsSqlOverShingles(
      wCte: String, numHashes: Int = 64, rowsPerBand: Int = 16,
      degreeCap: Int = 100): String =
    s"""${lshBandsSqlOverShingles(wCte, numHashes, rowsPerBand)},
       rrk AS MATERIALIZED (SELECT doc_id, band, key,
                      row_number() OVER (PARTITION BY band, key
                                         ORDER BY doc_id) AS r
               FROM rb),
       pairs AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                 FROM rrk a JOIN rrk b
                   ON a.band = b.band AND a.key = b.key
                  AND b.r > a.r AND b.r <= a.r + $degreeCap)"""

  /** Cap audit over the refined buckets — mirrors
    * `TextDedup.lshCapAudit`'s one-row rollup. */
  private[graft] def lshCapAuditSqlOverShingles(
      wCte: String, degreeCap: Int, numHashes: Int = 64,
      rowsPerBand: Int = 16): String =
    s"""${lshBandsSqlOverShingles(wCte, numHashes, rowsPerBand)},
       bn AS (SELECT band, key, CAST(count(*) AS BIGINT) AS n
              FROM rb GROUP BY 1, 2),
       audit AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                        CAST(count(*) FILTER (WHERE n - 1 > $degreeCap)
                          AS BIGINT) AS n_capped_buckets,
                        CAST(coalesce(max(n), 0) AS BIGINT) AS max_bucket,
                        CAST(coalesce(sum(n * (n - 1) // 2), 0)
                          AS BIGINT) AS pairs_full,
                        CAST(coalesce(sum(CASE WHEN n - 1 <= $degreeCap
                                 THEN n * (n - 1) // 2
                                 ELSE (n - $degreeCap) * $degreeCap
                                      + $degreeCap * ($degreeCap - 1) // 2
                               END), 0) AS BIGINT) AS pairs_capped
                 FROM bn)"""

  /** Word-set shingles over a docs relation (the default shingler). */
  private[graft] def minHashPairsSqlOver(docs: String): String =
    lshPairsSqlOverShingles(docShinglesSql(docs))

  private[graft] def docShinglesSql(docs: String): String =
    s"""SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
          FROM $docs"""

  /** Degree-capped twin of [[minHashPairsSqlOver]] (q225's base). */
  private[graft] def minHashCappedPairsSqlOver(
      docs: String, degreeCap: Int = 100): String =
    lshCappedPairsSqlOverShingles(docShinglesSql(docs), degreeCap = degreeCap)

  /** q183/q243 shared fragment: the two fuzzy-match sides (customers
    * vs the every-7th-mutated copy) through their deletion-variant
    * postings `lv(lid, ls, h)` / `rv(rid, rs, h)`. */
  private[graft] val editJoinSidesSql: String =
    """l AS (SELECT c_custkey AS lid, c_name AS ls FROM customer),
         r AS (SELECT c_custkey AS rid,
                      CASE WHEN c_custkey % 7 = 3 THEN c_name || 'x'
                           ELSE c_name END AS rs
               FROM customer),
         lv1 AS (SELECT lid, ls, list_prepend(ls,
                   [substr(ls, 1, i - 1) || substr(ls, i + 1)
                    FOR i IN generate_series(1, length(ls))]) AS vs
                 FROM l),
         lv2 AS (SELECT lid, ls, unnest(vs) AS v FROM lv1),
         lv AS MATERIALIZED (SELECT DISTINCT lid, ls,
                       ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
                FROM lv2),
         rv1 AS (SELECT rid, rs, list_prepend(rs,
                   [substr(rs, 1, i - 1) || substr(rs, i + 1)
                    FOR i IN generate_series(1, length(rs))]) AS vs
                 FROM r),
         rv2 AS (SELECT rid, rs, unnest(vs) AS v FROM rv1),
         rv AS MATERIALIZED (SELECT DISTINCT rid, rs,
                       ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
                FROM rv2)"""

  /** The q131/q135 URL-variant derivation (4 variants per page id). */
  private[graft] val urlVariantSql: String =
    """CASE doc_id % 4
             WHEN 0 THEN 'https://www.example.com/d/' || CAST(doc_id // 4 AS VARCHAR) || '?b=2&a=1'
             WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443/d/' || CAST(doc_id // 4 AS VARCHAR) || '/?a=1&b=2'
             WHEN 2 THEN 'https://example.com/d/' || CAST(doc_id // 4 AS VARCHAR) || '?utm_source=feed&b=2&fbclid=x&a=1'
             ELSE 'https://www.example.com:443/d/' || CAST(doc_id // 4 AS VARCHAR) || '/?a=1&utm_campaign=z&b=2#frag'
           END"""

  /** URL canonicalization CTE block — expects a CTE `u(doc_id, url)`,
    * yields `canon(doc_id, url)`; mirrors TextDedup.normalizeUrl. */
  private[graft] val urlCanonSqlCtes: String =
    """n AS (SELECT doc_id,
                 lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 1)) AS scheme,
                 regexp_replace(lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 2)), '^www\.', '') AS auth0,
                 regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 3), '/+$', '') AS path,
                 regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 4), '^\?', '') AS q
               FROM u),
         n2 AS (SELECT doc_id, scheme,
                  CASE WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
                       WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
                       ELSE auth0 END AS auth,
                  path,
                  list_sort(list_filter(string_split(q, '&'),
                    x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)=')
                         AND x <> '')) AS ps
                FROM n),
         canon AS (SELECT doc_id,
                     scheme || '://' || auth || path ||
                     CASE WHEN len(ps) > 0
                          THEN '?' || array_to_string(ps, '&')
                          ELSE '' END AS url
                   FROM n2)"""

  /** The q134/q135 HTML page shell around (source, text). */
  private[graft] val htmlShellSql: String =
    """'<html><head><title>T</title><style type="text/css">p{x:1}</style>'
           || '<script>if (a &amp;&amp; b) { f(); }</script></head><body><h1>'
           || source || '</h1><!-- hidden --><p class="main">' || text
           || '</p><p>Q &amp; A &lt;tag&gt; &quot;x&quot; &#39;y&#39;&nbsp;z &amp;lt;esc&gt;</p></body></html>'"""

  /** TextAnalysis.stripHtml mirrored as one SQL expression over `x`. */
  private[graft] def stripHtmlSql(x: String): String = {
    val tags =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($x,
             '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g'),
             '(?s)<[^>]+>', ' ', 'g')"""
    val ent =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace($tags,
             '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
             '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')"""
    s"""trim(regexp_replace($ent, '\\s+', ' ', 'g'))"""
  }

  /** Shared CTE block for the near-dup component pipeline over the
    * documents table (exact-dedup survivors → LSH candidates → exact
    * Jaccard gate ≥ 0.5 → connected components) — the q34/q57 stages
    * that q105, q116 and q130 all build on; ends with
    * `comp(d, label)`. Callers embed inside `WITH RECURSIVE …`. */
  private[graft] def nearDupComponentsSql: String =
    s"""kmin AS (SELECT MIN(doc_id) AS doc_id FROM documents
                                  GROUP BY lower(trim(text))),
         sdocs AS MATERIALIZED (SELECT d.* FROM documents d JOIN kmin USING (doc_id)),
         ${minHashPairsSqlOver("sdocs")},
         hws AS MATERIALIZED (SELECT doc_id,
                        list_distinct(list_transform(
                          list_distinct(string_split(lower(trim(text)), ' ')),
                          w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS ws
                 FROM sdocs),
         gp AS MATERIALIZED (SELECT p.a, p.b FROM pairs p
                JOIN hws wa ON wa.doc_id = p.a
                JOIN hws wb ON wb.doc_id = p.b
                WHERE round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                            CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6)
                      >= 0.5),
         ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM gp UNION SELECT b, a FROM gp),
         reach(d, r) AS (
           SELECT src AS d, src AS r FROM ed
           UNION
           SELECT ed.src AS d, reach.r FROM ed JOIN reach ON ed.dst = reach.d),
         comp AS (SELECT d, MIN(r) AS label FROM reach GROUP BY d)"""

  private[graft] lazy val minHashPairsSql: String = minHashPairsSqlOver("documents")

  /** Ordered double dot product over the first n dims — mirrors
    * graft_array_dot's left-to-right summation. */
  /** Shared oracle fragment: the q142 JL sign projection — md5-parity
    * ±1 per (j, d), one double dot per output coordinate cast to
    * FLOAT, mirroring Similarity.jlProject bit-for-bit. */
  private[graft] def jlProjSql(vecExpr: String, outDims: Int, dims: Int): String =
    s"""list_transform(range($outDims), j ->
          CAST(list_sum(list_transform(range($dims), d ->
            (CASE WHEN ('0x' || substr(md5('jl-' || j || '-' || d), 1, 15))::BIGINT % 2 = 1
                  THEN 1.0 ELSE -1.0 END)
            * $vecExpr[CAST(d + 1 AS INTEGER)]::DOUBLE)) AS FLOAT))"""

  private[graft] def dotSqlN(va: String, vb: String, n: Int): String =
    s"""list_sum(list_transform(range($n), d ->
         $va[CAST(d + 1 AS INTEGER)]::DOUBLE * $vb[CAST(d + 1 AS INTEGER)]::DOUBLE))"""

  /** Shared oracle fragment: rounded cosine between two 64-dim FLOAT[]
    * columns — same double math and summation order as Similarity. */
  private[graft] def cosSql(va: String, vb: String): String =
    s"""round(
         list_sum(list_transform(range(64), d ->
           $va[CAST(d + 1 AS INTEGER)]::DOUBLE * $vb[CAST(d + 1 AS INTEGER)]::DOUBLE)) /
         (sqrt(list_sum(list_transform($va, x -> x::DOUBLE * x::DOUBLE))) *
          sqrt(list_sum(list_transform($vb, x -> x::DOUBLE * x::DOUBLE)))), 6)"""


  /** Shared q166/q168 oracle: the batch windowed funnel and its
    * streaming stateful replay must produce the SAME per-step rows
    * (the q120/q148 twin contract under per-step deadlines). */
  private[graft] val windowedFunnelOracleSql: String =
    """WITH e AS MATERIALIZED (SELECT user_id AS u,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                         event_type AS typ
                  FROM events),
       c0 AS MATERIALIZED (SELECT u, min(sec) AS m0 FROM e WHERE typ = 'signup' GROUP BY u),
       c1 AS (SELECT e.u, min(sec) AS m1 FROM e JOIN c0 USING (u)
              WHERE typ = 'view' AND sec > m0 AND sec <= m0 + 172800
              GROUP BY e.u),
       c2 AS (SELECT e.u, min(sec) AS m2 FROM e JOIN c1 USING (u)
              WHERE typ = 'click' AND sec > m1 AND sec <= m1 + 172800
              GROUP BY e.u),
       c3 AS (SELECT e.u, min(sec) AS m3 FROM e JOIN c2 USING (u)
              WHERE typ = 'purchase' AND sec > m2 AND sec <= m2 + 172800
              GROUP BY e.u),
       n AS (SELECT (SELECT count(*) FROM c0) AS n0,
                    (SELECT count(*) FROM c1) AS n1,
                    (SELECT count(*) FROM c2) AS n2,
                    (SELECT count(*) FROM c3) AS n3)
       SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
              CAST(CASE WHEN n0 > 0 THEN n_users * 1000000 // n0 END
                   AS BIGINT) AS conversion_ppm
       FROM (SELECT 0 AS step_idx, 'signup' AS step, n0 AS n_users, n0 FROM n
             UNION ALL SELECT 1, 'view', n1, n0 FROM n
             UNION ALL SELECT 2, 'click', n2, n0 FROM n
             UNION ALL SELECT 3, 'purchase', n3, n0 FROM n)
       ORDER BY step_idx"""

  /** Shared q120/q148 oracle: the batch funnel and the streaming
    * stateful replay must produce the SAME per-step rows. */
  private[graft] val funnelOracleSql: String =
    """WITH m AS (SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'signup') AS m0,
               min(ts) FILTER (WHERE event_type = 'view') AS m1,
               min(ts) FILTER (WHERE event_type = 'click') AS m2,
               min(ts) FILTER (WHERE event_type = 'purchase') AS m3
             FROM events GROUP BY user_id),
         c AS (SELECT
               count(*) FILTER (WHERE m0 IS NOT NULL) AS c0,
               count(*) FILTER (WHERE m0 IS NOT NULL AND m0 < m1) AS c1,
               count(*) FILTER (WHERE m0 IS NOT NULL AND m0 < m1
                                  AND m1 < m2) AS c2,
               count(*) FILTER (WHERE m0 IS NOT NULL AND m0 < m1
                                  AND m1 < m2 AND m2 < m3) AS c3
             FROM m),
         s(step_idx, step) AS (VALUES (1, 'signup'), (2, 'view'),
                                      (3, 'click'), (4, 'purchase')),
         l AS (SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
                      CAST(CASE step_idx WHEN 1 THEN c0 WHEN 2 THEN c1
                           WHEN 3 THEN c2 ELSE c3 END AS BIGINT) AS n_users,
                      CAST(c0 AS BIGINT) AS base
               FROM c CROSS JOIN s)
         SELECT step_idx, step, n_users,
                CASE WHEN base > 0 THEN n_users * 1000000 // base END
                  AS conversion_ppm
         FROM l ORDER BY step_idx"""


  /** The q235 vocab as a DuckDB list literal — generated from the SAME
    * Scala constant [[ScaleFixture.vocab]] the writer builds text from. */
  private[graft] lazy val fixtureVocabSql: String =
    ScaleFixture.vocab.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Shared q209/q212 oracle: the batch EWMA fold and its streaming
    * type-keyed replay must produce the SAME per-day rows — the
    * identical integer recurrence walked as a recursive CTE. */
  private[graft] val ewmaOracleSql: String = """
         WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS MATERIALIZED (SELECT typ, day, v,
                        CAST(row_number() OVER (PARTITION BY typ
                          ORDER BY day) AS BIGINT) AS i
                 FROM daily),
         rec AS (
           SELECT typ, day, v, i,
                  v * 1000000 AS s, CAST(0 AS BIGINT) AS dev
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.typ, o.day, o.v, o.i,
                  300000 * o.v + (1000000 - 300000) * r.s // 1000000,
                  o.v * 1000000 - r.s
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1)
         SELECT typ AS event_type, CAST(day AS VARCHAR) AS day, v,
                CAST(s AS BIGINT) AS ewma_micro,
                CAST(dev AS BIGINT) AS dev_micro
         FROM rec ORDER BY event_type, day"""

  /** Shared q174/q180 oracle: the batch gap histogram and its
    * streaming stateful replay must produce the SAME bucket rows. */
  private[graft] val eventGapsOracleSql: String =
    """WITH e AS (SELECT user_id AS u,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                         event_type AS typ
                  FROM events),
       g AS (SELECT sec - lag(sec) OVER (PARTITION BY u
               ORDER BY sec, typ) AS gap
             FROM e)
       SELECT CASE WHEN gap = 0 THEN 0
                   ELSE CAST(length(bin(gap)) AS BIGINT) END AS bucket,
              CAST(count(*) AS BIGINT) AS n_gaps,
              CAST(min(gap) AS BIGINT) AS min_gap_secs,
              CAST(max(gap) AS BIGINT) AS max_gap_secs
       FROM g WHERE gap IS NOT NULL
       GROUP BY 1 ORDER BY 1"""

  /** q176 oracle fragment: the power-iteration CTEs p0…p<iters>,
    * unrolled mechanically from the same iteration count the Spark
    * loop uses. Mirrors stationaryDistribution exactly: uniform start
    * with the remainder pinned to the smallest state, per-edge
    * `π·c div r` contributions, absorbing states hold their mass. */
  private[graft] def stationaryCtesSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""in$i AS (SELECT tr.tt AS typ,
                      CAST(sum(p.pi * tr.c // rs.r) AS BIGINT) AS v
               FROM $prev p JOIN tr ON p.typ = tr.ft
                    JOIN rs ON tr.ft = rs.ft
               GROUP BY 1),
         ab$i AS (SELECT p.typ, p.pi FROM $prev p
                  WHERE NOT EXISTS (SELECT 1 FROM rs WHERE rs.ft = p.typ)),
         p$i AS MATERIALIZED (
                 SELECT st.typ,
                        CAST(coalesce(i.v, 0) + coalesce(a.pi, 0)
                          AS BIGINT) AS pi
                 FROM st LEFT JOIN in$i i ON st.typ = i.typ
                         LEFT JOIN ab$i a ON st.typ = a.typ)"""
    }.mkString(",\n         ")
    s"""WITH e AS (SELECT user_id AS u, ts, event_id AS eid,
                          event_type AS typ
                   FROM events),
         pr AS (SELECT typ AS ft, lead(typ) OVER (PARTITION BY u
                  ORDER BY ts, eid) AS tt FROM e),
         tr AS MATERIALIZED (SELECT ft, tt, CAST(count(*) AS BIGINT) AS c
                FROM pr WHERE tt IS NOT NULL GROUP BY 1, 2),
         rs AS MATERIALIZED (SELECT ft, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
         st AS MATERIALIZED (SELECT DISTINCT typ FROM e),
         sm AS (SELECT CAST(count(*) AS BIGINT) AS s, min(typ) AS m FROM st),
         p0 AS (SELECT st.typ,
                       CAST(1000000 // s + CASE WHEN st.typ = m
                         THEN 1000000 - s * (1000000 // s)
                         ELSE 0 END AS BIGINT) AS pi
                FROM st CROSS JOIN sm),
         $iterCtes
         SELECT st.typ AS event_type,
                CAST(coalesce(rs.r, 0) AS BIGINT) AS n_out,
                p.pi AS pi_ppm
         FROM st LEFT JOIN rs ON st.typ = rs.ft
                 JOIN p$iters p ON st.typ = p.typ
         ORDER BY event_type"""
  }

  /** q254 oracle: the q205 verified-pair CTEs, then `iters` unrolled
    * integer-micro PageRank rounds mirroring Analytics.pageRank —
    * 10⁶ start mass, `85·r // (100·d)` per-neighbor sends, 150000
    * base reset, floor/dangling mass dropped. */
  private[graft] def pageRankOracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""in$i AS (SELECT u.dst AS id,
                      CAST(sum(85 * p.r // (100 * d.d)) AS BIGINT) AS inflow
               FROM und u JOIN $prev p ON u.src = p.id
                    JOIN deg d ON u.src = d.src
               GROUP BY 1),
         r$i AS (SELECT n.id,
                        CAST(150000 + coalesce(i.inflow, 0) AS BIGINT) AS r
                 FROM nodes n LEFT JOIN in$i i ON n.id = i.id)"""
    }.mkString(",\n         ")
    s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents),
         vp AS (SELECT p.a, p.b
                FROM pairs p
                JOIN ws wa ON wa.doc_id = p.a
                JOIN ws wb ON wb.doc_id = p.b
                WHERE len(list_distinct(wa.ws || wb.ws)) > 0
                  AND CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT)
                        * 1000000
                        // CAST(len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
                        >= 500000),
         e AS MATERIALIZED (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
               FROM vp WHERE a <> b),
         und AS MATERIALIZED (SELECT x AS src, y AS dst FROM e
                 UNION ALL SELECT y, x FROM e),
         deg AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS d
                 FROM und GROUP BY 1),
         nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
         r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         $iterCtes
         SELECT n.id AS doc_id, CAST(coalesce(d.d, 0) AS BIGINT) AS degree,
                p.r AS rank_micro
         FROM nodes n LEFT JOIN deg d ON n.id = d.src
              JOIN r$iters p ON n.id = p.id
         ORDER BY rank_micro DESC, doc_id LIMIT 100"""
  }

  /** q268 oracle: the q254 verified-pair graph CTEs, then `iters`
    * unrolled majority-label rounds mirroring
    * Analytics.labelPropagation — clamped seeds, (count DESC, label
    * ASC) ties, keep-previous when no labeled neighbor. */
  private[graft] def labelPropOracleSql(iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      val prev = s"l${i - 1}"
      s"""nb$i AS (SELECT u.src AS id, p.label, CAST(count(*) AS BIGINT) AS c
               FROM und u JOIN $prev p ON u.dst = p.id
               WHERE p.label IS NOT NULL GROUP BY 1, 2),
         mj$i AS (SELECT id, label FROM (
                  SELECT id, label,
                         row_number() OVER (PARTITION BY id
                           ORDER BY c DESC, label) AS rn
                  FROM nb$i) WHERE rn = 1),
         l$i AS MATERIALIZED (
                 SELECT n.id,
                        coalesce(sd.label, m.label, p.label) AS label
                 FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id
                      LEFT JOIN mj$i m ON n.id = m.id
                      LEFT JOIN $prev p ON n.id = p.id)"""
    }.mkString(",\n         ")
    s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents),
         vp AS (SELECT p.a, p.b
                FROM pairs p
                JOIN ws wa ON wa.doc_id = p.a
                JOIN ws wb ON wb.doc_id = p.b
                WHERE len(list_distinct(wa.ws || wb.ws)) > 0
                  AND CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT)
                        * 1000000
                        // CAST(len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
                        >= 500000),
         e AS MATERIALIZED (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
               FROM vp WHERE a <> b),
         und AS MATERIALIZED (SELECT x AS src, y AS dst FROM e
                 UNION ALL SELECT y, x FROM e),
         nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
         seeds AS MATERIALIZED (SELECT doc_id AS id, lang AS label FROM documents
                   WHERE doc_id % 7 = 0),
         l0 AS (SELECT n.id, sd.label
                FROM nodes n LEFT JOIN seeds sd ON n.id = sd.id),
         $iterCtes
         SELECT n.id AS doc_id, l.label,
                (sd.id IS NOT NULL) AS is_seed
         FROM nodes n JOIN l$iters l ON n.id = l.id
              LEFT JOIN seeds sd ON n.id = sd.id
         ORDER BY doc_id"""
  }

  /** q256 oracle: Holt–Winters additive weekly — the q226 recursive
    * CTE carrying SEVEN seasonal slot columns, every ppm division
    * truncating toward zero (tdiv). Generated from the same
    * (α, β, γ) constants the Spark call uses. */
  private[graft] def holtWintersOracleSql(
      alphaPpm: Long, betaPpm: Long, gammaPpm: Long): String = {
    def tdiv(x: String): String =
      s"(CASE WHEN ($x) >= 0 THEN ($x) // 1000000" +
        s" ELSE -((-($x)) // 1000000) END)"
    val slots = 0 until 7
    val sPrev = "(CASE o.w " +
      slots.map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END)"
    val lNew = s"(${tdiv(s"$alphaPpm * (o.v * 1000000 - $sPrev)")}" +
      s" + ${tdiv(s"(1000000 - $alphaPpm) * (r.l + r.b)")})"
    val sNew = slots.map { k =>
      s"""CAST(CASE WHEN o.w = $k
              THEN ${tdiv(s"$gammaPpm * (o.v * 1000000 - $lNew)")}
                   + ${tdiv(s"(1000000 - $gammaPpm) * r.s$k")}
              ELSE r.s$k END AS BIGINT) AS s$k"""
    }.mkString(",\n                  ")
    val sBase = slots.map(k => s"CAST(0 AS BIGINT) AS s$k").mkString(", ")
    val sOut = "(CASE w " +
      slots.map(k => s"WHEN $k THEN s$k").mkString(" ") + " END)"
    val sNext = "(CASE (w + 1) % 7 " +
      slots.map(k => s"WHEN $k THEN s$k").mkString(" ") + " END)"
    s"""WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS MATERIALIZED (SELECT typ, day, v,
                        CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS w,
                        CAST(row_number() OVER (PARTITION BY typ
                          ORDER BY day) AS BIGINT) AS i
                 FROM daily),
         rec AS (
           SELECT typ, day, v, w, i,
                  CAST(v * 1000000 AS BIGINT) AS l,
                  CAST(0 AS BIGINT) AS b,
                  $sBase
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.typ, o.day, o.v, o.w, o.i,
                  CAST($lNew AS BIGINT),
                  CAST(${tdiv(s"$betaPpm * ($lNew - r.l)")}
                    + ${tdiv(s"(1000000 - $betaPpm) * r.b")} AS BIGINT),
                  $sNew
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1)
         SELECT typ AS event_type, CAST(day AS VARCHAR) AS day, v,
                CAST(l AS BIGINT) AS level_micro,
                CAST(b AS BIGINT) AS trend_micro,
                CAST($sOut AS BIGINT) AS season_micro,
                CAST(l + b + $sNext AS BIGINT) AS forecast_micro
         FROM rec ORDER BY event_type, day"""
  }

  /** q138/q146 shared oracle fragment: the exact-integer Lloyd
    * iteration CTEs, unrolled mechanically from the same (k, iters)
    * the Spark calls use (the minHashCoeffsSql pattern: one set of
    * constants drives both sides). Mirrors kmeansFit exactly:
    * offset-micro quantization, bottom-k-by-md5 seeding, exact-integer
    * argmin with smaller-cell ties, `sum // n` centroid update with
    * empty-cell carry. Final trained centroids live in CTE
    * `c<iters>`. */
  private[graft] def kmeansCtesSql(k: Int, iters: Int, dims: Int,
      source: String = "embeddings"): String = {
    def iterCtes(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""d$i AS (SELECT q.id, c.cell,
                sum((q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)
                    * (q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)) AS d2
              FROM q CROSS JOIN $prev c GROUP BY q.id, c.cell),
         a$i AS (SELECT id, cell FROM (
                  SELECT id, cell,
                         row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
                  FROM d$i) WHERE rn = 1),
         s$i AS (SELECT a.cell, dd.d,
                        sum(q.qv[CAST(dd.d + 1 AS INTEGER)]) AS s, count(*) AS n
              FROM q JOIN a$i a USING (id)
              CROSS JOIN (SELECT CAST(unnest(range($dims)) AS BIGINT) AS d) dd
              GROUP BY a.cell, dd.d),
         c$i AS MATERIALIZED (
              SELECT p.cell, p.d, CAST(coalesce(s.s // s.n, p.c) AS BIGINT) AS c
              FROM $prev p LEFT JOIN s$i s ON p.cell = s.cell AND p.d = s.d)"""
    }
    s"""q AS MATERIALIZED (SELECT vec_id AS id,
              list_transform(range($dims), d ->
                CAST(round((embedding[CAST(d + 1 AS INTEGER)]::DOUBLE + 1.0) * 1e6) AS BIGINT)) AS qv
            FROM $source),
       sd AS (SELECT id, qv,
                row_number() OVER (ORDER BY
                  ('0x' || substr(md5('kmseed:' || CAST(id AS VARCHAR)), 1, 15))::BIGINT,
                  id) - 1 AS cell
              FROM q),
       c0 AS MATERIALIZED (SELECT CAST(sd.cell AS BIGINT) AS cell, CAST(dd.d AS BIGINT) AS d,
                     qv[CAST(dd.d + 1 AS INTEGER)] AS c
              FROM sd CROSS JOIN (SELECT unnest(range($dims)) AS d) dd
              WHERE sd.cell < $k),
       ${(1 to iters).map(iterCtes).mkString(",\n       ")}"""
  }

  /** q138 oracle generator — kmeans CTEs + final assignment stats. */
  private[graft] def kmeansOracleSql(k: Int, iters: Int, dims: Int): String = {
    s"""WITH ${kmeansCtesSql(k, iters, dims)},
       dF AS (SELECT q.id, c.cell,
                sum((q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)
                    * (q.qv[CAST(c.d + 1 AS INTEGER)] - c.c)) AS d2
              FROM q CROSS JOIN c$iters c GROUP BY q.id, c.cell),
       aF AS (SELECT id, cell, d2 FROM (
                SELECT id, cell, d2,
                       row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
                FROM dF) WHERE rn = 1),
       st AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
                     CAST(sum(d2) AS BIGINT) AS sum_d2
              FROM aF GROUP BY cell)
       SELECT c.cell, c.d, c.c,
              coalesce(st.n_vectors, 0) AS n_vectors,
              coalesce(st.sum_d2, 0) AS sum_d2
       FROM c$iters c LEFT JOIN st USING (cell)
       ORDER BY c.cell, c.d"""
  }

  /** Shared q153/q238 oracle: the batch last-touch attribution and
    * its stream-stream interval-join replay must produce the SAME
    * channel shares (the q120/q148 twin contract for joins). */
  private[graft] val attributionOracleSql: String =
    """WITH t AS (SELECT user_id, ts, event_type,
                max(CASE WHEN event_type IN ('signup', 'view', 'click')
                         THEN lpad(CAST(epoch_ms(ts) AS VARCHAR), 20, '0')
                              || '#' || event_type END)
                  OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS touch
              FROM events),
         conv AS (SELECT CASE WHEN touch IS NULL THEN 'none'
                              ELSE split_part(touch, '#', 2) END AS channel
                  FROM t WHERE event_type = 'purchase'),
         c AS MATERIALIZED (SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions
               FROM conv GROUP BY channel),
         tot AS (SELECT CAST(sum(n_conversions) AS BIGINT) AS t FROM c)
         SELECT channel, n_conversions,
                CAST(n_conversions * 1000000 // tot.t AS BIGINT) AS share_ppm
         FROM c, tot ORDER BY channel"""

  /** Unigram-LM oracle machinery (q236/q237) — generated from the SAME
    * constants [[graft.operators.UnigramLm]] plans with (MaxPieceLen,
    * SeedMulti, EmRounds, the miss costs): the minHashCoeffsSql /
    * bpeTrainCtesSql discipline applied to a Viterbi lattice. The DP
    * is a recursive CTE carrying the whole dp array per word (one row
    * per word per position), candidates pre-joined against the piece
    * table and sorted (cost ASC, predecessor ASC) — the exact
    * tie-break the Spark `aggregate` fold uses. */
  private[graft] def unigramDpCtes(x: String, piecesCte: String,
      wordsCte: String = "dw"): String = {
    val k = graft.operators.UnigramLm.MaxPieceLen
    val ms = graft.operators.UnigramLm.MissSingle
    val mm = graft.operators.UnigramLm.MissMulti
    s"""pos$x AS MATERIALIZED (SELECT word, unnest(range(1, length(word)+1)) AS i FROM $wordsCte),
       cj$x AS MATERIALIZED (SELECT word, i, unnest(range(greatest(0, i - $k), i)) AS j
                FROM pos$x),
       cand$x AS MATERIALIZED (SELECT c.word, c.i, c.j,
                    coalesce(p.cost,
                      CASE WHEN c.i - c.j = 1 THEN $ms ELSE $mm END) AS pc
                  FROM cj$x c LEFT JOIN $piecesCte p
                    ON p.piece = substr(c.word, c.j+1, c.i-c.j)),
       sl$x AS MATERIALIZED (SELECT word, i, list({'c': pc, 'bp': j} ORDER BY j) AS cands
                FROM cand$x GROUP BY word, i),
       rec$x AS (
         SELECT word, 0 AS i, [{'c': CAST(0 AS BIGINT), 'bp': 0}] AS dparr
         FROM $wordsCte
         UNION ALL
         SELECT r.word, r.i + 1,
                list_append(r.dparr,
                  (list_sort(list_transform(s.cands,
                     x -> {'c': struct_extract(r.dparr[x.bp + 1], 'c') + x.c,
                           'bp': x.bp})))[1])
         FROM rec$x r JOIN sl$x s ON s.word = r.word AND s.i = r.i + 1
         WHERE r.i < length(r.word)),
       dpfin$x AS MATERIALIZED (SELECT word, dparr FROM rec$x WHERE i = length(word)),
       bt$x AS (
         SELECT word, CAST(length(word) AS INTEGER) AS p,
                CAST([] AS VARCHAR[]) AS ts
         FROM $wordsCte
         UNION ALL
         SELECT b.word,
                CAST(struct_extract(d.dparr[b.p + 1], 'bp') AS INTEGER) AS p,
                list_prepend(
                  substr(b.word, struct_extract(d.dparr[b.p+1],'bp') + 1,
                         b.p - struct_extract(d.dparr[b.p+1],'bp')), b.ts) AS ts
         FROM bt$x b JOIN dpfin$x d USING (word)
         WHERE b.p > 0),
       seg$x AS MATERIALIZED (SELECT word, ts FROM bt$x WHERE p = 0)"""
  }

  /** The unigram TRAINING rounds unrolled: seed substring counts c0,
    * then per round r costs p\$r from c\${r-1}, Viterbi counts e\$r over
    * the vocab (dp machinery suffix r), surviving pieces c\$r (alphabet
    * persists, zero-count multi-char pieces drop). Ends at c\$rounds. */
  private[graft] def unigramTrainCtes(rounds: Int,
      docs: String = "documents"): String = {
    val k = graft.operators.UnigramLm.MaxPieceLen
    val sm = graft.operators.UnigramLm.SeedMulti
    val head = s"""
       toks0 AS MATERIALIZED (SELECT t AS word FROM (
                   SELECT unnest(string_split(text, ' ')) AS t
                   FROM $docs) WHERE t <> ''),
       vocab AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n
                 FROM toks0 GROUP BY 1),
       dw AS MATERIALIZED (SELECT word FROM vocab),
       sub1 AS MATERIALIZED (SELECT word, n, unnest(range(0, length(word))) AS j
                FROM vocab),
       sub2 AS MATERIALIZED (SELECT word, n, j,
                  unnest(range(1, least($k, length(word) - j) + 1)) AS kk
                FROM sub1),
       subs AS MATERIALIZED (SELECT substr(word, j+1, kk) AS piece,
                       CAST(sum(n) AS BIGINT) AS cnt
                FROM sub2 GROUP BY 1),
       sing AS MATERIALIZED (SELECT piece, cnt FROM subs WHERE length(piece) = 1),
       mult AS MATERIALIZED (SELECT piece, cnt FROM subs WHERE length(piece) >= 2
                ORDER BY cnt DESC, piece LIMIT $sm),
       c0 AS MATERIALIZED (SELECT * FROM sing UNION ALL SELECT * FROM mult)"""
    val roundsSql = (1 to rounds).map { r =>
      val prev = s"c${r - 1}"
      s"""t$r AS MATERIALIZED (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS total
                  FROM $prev),
         p$r AS MATERIALIZED (SELECT piece,
                   CAST(round(-ln(greatest(cnt, 1)::DOUBLE / total::DOUBLE)
                     * 1e6) AS BIGINT) AS cost
                 FROM $prev, t$r),
         ${unigramDpCtes(r.toString, s"p$r")},
         e$r AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
                   SELECT v.n AS n, unnest(s.ts) AS piece
                   FROM vocab v JOIN seg$r s USING (word))
                 GROUP BY 1),
         c$r AS MATERIALIZED (SELECT c.piece, coalesce(e.cnt, 0) AS cnt
                 FROM $prev c LEFT JOIN e$r e USING (piece)
                 WHERE length(c.piece) = 1 OR coalesce(e.cnt, 0) > 0)"""
    }.mkString(",\n")
    head + ",\n" + roundsSql
  }

  /** Guard-health oracle (q247/q248) — mirrors
    * `TextDedup.guardHealth` + `TextDedup.editGuardHealth` over the
    * documents table and the q183 fuzzy-match sides: one row per
    * guard that BINDS at the given settings, zero rows = the
    * nothing-binds certificate. Same audits as q243/q244 (cap
    * rollups) plus the K207/K211 pair-budget estimates. */
  private[graft] def guardHealthSql(
      degreeCap: Int, pairBudget: Long, editCap: Int): String =
    s"""WITH ${lshCapAuditSqlOverShingles(docShinglesSql("documents"), degreeCap)},
       sw AS (SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
              FROM documents),
       sh1 AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM sw),
       sv1 AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
               FROM sh1 CROSS JOIN (SELECT unnest(range(60)) AS j) GROUP BY doc_id, j),
       ssh AS (SELECT doc_id,
                      CAST(SUM(CASE WHEN vote > 0 THEN 1::BIGINT << CAST(j AS INTEGER)
                                    ELSE 0 END) AS BIGINT) AS simhash
               FROM sv1 GROUP BY doc_id),
       sch AS (SELECT doc_id, k, (simhash >> CAST(k * 15 AS INTEGER)) & 32767 AS key
               FROM ssh CROSS JOIN (SELECT unnest(range(4)) AS k)),
       ssb AS (SELECT k, key, CAST(count(*) AS BIGINT) AS n FROM sch GROUP BY 1, 2),
       ssa AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                      CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS pairs_est
               FROM ssb),
       $editJoinSidesSql,
       lc AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM lv GROUP BY 1),
       rc AS (SELECT h, CAST(count(*) AS BIGINT) AS n FROM rv GROUP BY 1),
       la AS (SELECT CAST(count(*) FILTER (WHERE n > $editCap) AS BIGINT)
                       AS n_capped_keys,
                     CAST(coalesce(sum(n) FILTER (WHERE n > $editCap), 0)
                       AS BIGINT) AS dropped
              FROM lc),
       ra AS (SELECT CAST(count(*) FILTER (WHERE n > $editCap) AS BIGINT)
                       AS n_capped_keys,
                     CAST(coalesce(sum(n) FILTER (WHERE n > $editCap), 0)
                       AS BIGINT) AS dropped
              FROM rc),
       eb AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(coalesce(sum(l.n * r.n), 0) AS BIGINT) AS est
              FROM (SELECT h, n FROM lc WHERE n <= $editCap) l
              JOIN (SELECT h, n FROM rc WHERE n <= $editCap) r USING (h)),
       grows AS (
         SELECT 'lsh_degree_cap' AS guard, n_capped_buckets AS n_affected,
                pairs_full - pairs_capped AS magnitude
         FROM audit WHERE n_capped_buckets > 0
         UNION ALL
         SELECT 'lsh_pair_budget', n_buckets, pairs_full - $pairBudget
         FROM audit WHERE pairs_full > $pairBudget
         UNION ALL
         SELECT 'simhash_pair_budget', n_buckets, pairs_est - $pairBudget
         FROM ssa WHERE pairs_est > $pairBudget
         UNION ALL
         SELECT 'edit_df_cap_left', n_capped_keys, dropped
         FROM la WHERE n_capped_keys > 0
         UNION ALL
         SELECT 'edit_df_cap_right', n_capped_keys, dropped
         FROM ra WHERE n_capped_keys > 0
         UNION ALL
         SELECT 'edit_pair_budget', n_keys, est - $pairBudget
         FROM eb WHERE est > $pairBudget)
       SELECT guard, CAST(n_affected AS BIGINT) AS n_affected,
              CAST(magnitude AS BIGINT) AS magnitude
       FROM grows ORDER BY guard"""
}

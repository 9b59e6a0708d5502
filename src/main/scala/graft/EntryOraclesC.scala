package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** DuckDB oracle SQL, part C — see [[SparkEntry.oracleSql]].
  * Part of the registry split (round 10). */
private[graft] trait EntryOraclesC extends EntryOraclesB {
  private[graft] def oraclesPartC: Map[String, String] = Map(
    // Centroid outliers: q111's micro-unit integer sum vector per
    // label; cos(v, sum) left-to-right in double, round 6; outlier =
    // cos < 0.0, degenerate rows flag with null cosine.
    "q117_centroid_outliers" ->
      """WITH q AS (SELECT label, d,
                           CAST(sum(CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
                    FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS d)
                    GROUP BY label, d),
         a AS (SELECT label, list(s ORDER BY d) AS sv FROM q GROUP BY label),
         c AS (SELECT vec_id AS id, e.label AS grp,
                      CASE WHEN list_sum(list_transform(range(64), i ->
                                  embedding[CAST(i + 1 AS INTEGER)]::DOUBLE * embedding[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                            AND list_sum(list_transform(range(64), i ->
                                  sv[CAST(i + 1 AS INTEGER)]::DOUBLE * sv[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                           THEN round(
                             list_sum(list_transform(range(64), i ->
                               embedding[CAST(i + 1 AS INTEGER)]::DOUBLE * sv[CAST(i + 1 AS INTEGER)]::DOUBLE)) /
                             (sqrt(list_sum(list_transform(range(64), i ->
                                embedding[CAST(i + 1 AS INTEGER)]::DOUBLE * embedding[CAST(i + 1 AS INTEGER)]::DOUBLE))) *
                              sqrt(list_sum(list_transform(range(64), i ->
                                sv[CAST(i + 1 AS INTEGER)]::DOUBLE * sv[CAST(i + 1 AS INTEGER)]::DOUBLE)))), 6)
                           ELSE NULL END AS cos_centroid
               FROM embeddings e JOIN a USING (label))
         SELECT id, grp, cos_centroid,
                coalesce(cos_centroid < 0.0, TRUE) AS outlier
         FROM c ORDER BY id""",
    // Char-class signals over customer addresses: regexp length deltas
    // (DuckDB needs the 'g' flag; Spark replaces all by default).
    "q118_char_class_signals" ->
      """WITH t AS (SELECT event_id AS doc_id, props AS a FROM events
                    WHERE length(props) > 0),
         c AS (SELECT doc_id, CAST(length(a) AS BIGINT) AS n_chars,
                      CAST(length(a) - length(regexp_replace(a, '[A-Za-z]', '', 'g')) AS BIGINT) AS l,
                      CAST(length(a) - length(regexp_replace(a, '[0-9]', '', 'g')) AS BIGINT) AS d,
                      CAST(length(a) - length(regexp_replace(a, '\s', '', 'g')) AS BIGINT) AS w,
                      CAST(length(a) - length(regexp_replace(a, '[\[\]{}()<>;]', '', 'g')) AS BIGINT) AS b
               FROM t)
         SELECT doc_id, n_chars,
                l * 1000000 // n_chars AS letter_ppm,
                d * 1000000 // n_chars AS digit_ppm,
                w * 1000000 // n_chars AS space_ppm,
                (n_chars - l - d - w) * 1000000 // n_chars AS symbol_ppm,
                b * 1000000 // n_chars AS bracket_ppm,
                (b * 1000000 // n_chars >= 20000 OR
                 (n_chars - l - d - w) * 1000000 // n_chars >= 150000) AS codey
         FROM c ORDER BY doc_id""",
    // Template grams: per-source word-3-gram counts, top-3 by
    // (count desc, gram asc), ppm share of the source's gram total.
    "q119_template_grams" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT source,
                      array_to_string(ws[CAST(s + 1 AS BIGINT):CAST(s + 3 AS BIGINT)], ' ') AS gram
               FROM (SELECT source, ws, unnest(range(len(ws) - 2)) AS s
                     FROM w WHERE len(ws) >= 3)),
         c AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS n_occ
               FROM g GROUP BY source, gram),
         t AS (SELECT source, CAST(sum(n_occ) AS BIGINT) AS tot
               FROM c GROUP BY source),
         r AS (SELECT source, gram, n_occ,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY n_occ DESC, gram) AS BIGINT) AS rank
               FROM c)
         SELECT r.source, r.rank, r.gram, r.n_occ,
                r.n_occ * 1000000 // t.tot AS share_ppm
         FROM r JOIN t USING (source)
         WHERE r.rank <= 3 ORDER BY r.source, r.rank""",
    // Funnel: strict order of first touches (m0 < m1 < ... all
    // present); exact integer ppm vs step 1.
    "q120_funnel" -> funnelOracleSql,
    // Cohort retention triangle: first-activity day x offset 0..14.
    "q121_cohort_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events),
         c AS (SELECT u, min(d) AS cd FROM ud GROUP BY u)
         SELECT CAST(cd AS VARCHAR) AS cohort_day,
                CAST(d - cd AS BIGINT) AS offset_days,
                count(*) AS n_users
         FROM ud JOIN c USING (u)
         WHERE d - cd <= 14
         GROUP BY cd, d - cd ORDER BY 1, 2""",
    // Markov transitions: per-user (ts, event_id)-ordered bigrams,
    // exact integer row-conditional ppm.
    "q122_transition_matrix" ->
      """WITH p AS (SELECT event_type AS from_type,
                lead(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_type
             FROM events),
         c AS (SELECT from_type, to_type, count(*) AS n_trans
               FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
                CAST(n_trans * 1000000 //
                     sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
                  AS prob_ppm
         FROM c ORDER BY from_type, to_type""",
    // Trailing z-score: stats over the previous 7 PRESENT days
    // (rows-based); variance from exact integer sums; the double
    // expression mirrors the Spark operand order op-for-op.
    "q123_trailing_zscore" ->
      """WITH daily AS (SELECT event_type AS key, ts::DATE AS d,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
         w AS (SELECT key, d, n,
                      count(n) OVER win AS cnt,
                      CAST(sum(n) OVER win AS BIGINT) AS s,
                      CAST(sum(n * n) OVER win AS BIGINT) AS ss
               FROM daily
               WINDOW win AS (PARTITION BY key ORDER BY d
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT key, CAST(d AS VARCHAR) AS day, n,
                      CASE WHEN cnt = 7 AND ss * 7 - s * s > 0
                           THEN round((CAST(n AS DOUBLE)
                                       - CAST(s AS DOUBLE) / 7.0)
                                      / (sqrt(CAST(ss * 7 - s * s AS DOUBLE))
                                         / 7.0), 6)
                      END AS z
               FROM w)
         SELECT key, day, n, z,
                coalesce(abs(z) >= 3.0, FALSE) AS anomaly
         FROM z ORDER BY key, day""",
    // Co-occurrence: distinct (order, part) baskets, mega-baskets
    // (>8 items) dropped whole, global top-20 by (n_both, pair).
    "q124_cooccurrence_topk" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
         sized AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 8),
         kept AS (SELECT bi.b, bi.i FROM bi JOIN sized USING (b)),
         itemn AS (SELECT i, CAST(count(*) AS BIGINT) AS n_item
                   FROM kept GROUP BY i),
         pairn AS (SELECT a.i AS item_a, c.i AS item_b,
                          CAST(count(*) AS BIGINT) AS n_both
                   FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
                   GROUP BY 1, 2)
         SELECT item_a, item_b, n_both, na.n_item AS n_a, nb.n_item AS n_b,
                round(CAST(n_both AS DOUBLE)
                      / sqrt(CAST(na.n_item * nb.n_item AS DOUBLE)), 6)
                  AS cosine
         FROM pairn
         JOIN itemn na ON pairn.item_a = na.i
         JOIN itemn nb ON pairn.item_b = nb.i
         ORDER BY n_both DESC, item_a, item_b LIMIT 20""",
    // Data profile over documents (all BIGINT/VARCHAR — no float or
    // timestamp string-cast hazards across engines). Branches are
    // GENERATED from documentsProfileCols — the same Seq the q125
    // Spark side projects — so the two sides cannot silently diverge
    // on schema drift.
    "q125_data_profile" -> {
      val branches = documentsProfileCols.map { c =>
        s"""SELECT '$c' AS col, count(*) AS n_rows,
                  count(*) FILTER (WHERE $c IS NULL) AS n_null,
                  count(DISTINCT $c) AS n_distinct,
                  CAST(min($c) AS VARCHAR) AS min_str,
                  CAST(max($c) AS VARCHAR) AS max_str FROM documents"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH p AS (
           $branches)
         SELECT col AS "column", n_rows, n_null, n_distinct, min_str, max_str
         FROM p ORDER BY col"""
    },
    // Cap-guarded SemDeDup: the q73 CTEs plus a per-cell split factor
    // nsub = ceil(n / 12); pairs join on (cell, id % nsub) so no task
    // ever sees more than ~cap rows per side. Output is the per-cell
    // audit + survivor count.
    "q126_semdedup_capped" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         sizes AS (SELECT cell, COUNT(*) AS n,
                          GREATEST(1, CAST(ceil(COUNT(*) / 12.0) AS BIGINT)) AS nsub
                   FROM asg GROUP BY cell),
         sub AS (SELECT asg.id, asg.vec, asg.cell, sizes.nsub,
                        asg.id % sizes.nsub AS sub
                 FROM asg JOIN sizes USING (cell)),
         losers AS (SELECT DISTINCT b.id
                    FROM sub a JOIN sub b
                      ON a.cell = b.cell AND a.sub = b.sub AND a.id < b.id
                    WHERE ${cosSql("a.vec", "b.vec")} >= 0.4),
         kept AS (SELECT id, cell FROM asg
                  WHERE id NOT IN (SELECT id FROM losers))
         SELECT s.cell, s.n, s.nsub, (s.nsub > 1) AS capped,
                COUNT(k.id) AS n_kept
         FROM sizes s LEFT JOIN kept k USING (cell)
         GROUP BY s.cell, s.n, s.nsub ORDER BY cell""",
    // Nightly band-index maintenance: the Spark side delta-maintains
    // the index built on the OLD snapshot; the oracle REBUILDS from
    // the NEW snapshot (q103's band-key CTEs, no delta) — equality of
    // the relations is the delta≡rebuild gate, enforced cross-engine
    // by the driver's hash compare.
    "q127_band_index_nightly" ->
      s"""WITH nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7),
         w AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
               FROM nw),
         hb AS (SELECT doc_id,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
                FROM w),
         hs AS (SELECT doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY doc_id, c.i),
         bands AS (SELECT doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY doc_id, (i // 16))
         SELECT doc_id AS id, CAST(band AS BIGINT) AS band, key
         FROM bands ORDER BY id, band""",
    // Nightly hash-index maintenance: maintained (h, cnt)
    // multiplicities must equal a direct GROUP BY over the new
    // snapshot's normalized-content hashes.
    "q128_hash_index_nightly" ->
      """WITH nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7)
         SELECT ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT AS h,
                count(*) AS cnt
         FROM nw GROUP BY 1 ORDER BY h""",
    // Df-weighted MinHash: integer rarity weights wt = clamp(N // df,
    // 1, 8), token replicated wt times (t#1..t#wt), then the exact
    // q21 signature/band/bucket-cap machinery over elements; exact
    // weighted Jaccard = shared/(sa+sb-shared) scores the candidates.
    "q129_weighted_neardup" ->
      s"""WITH toks AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS tok
               FROM documents),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         wts AS (SELECT tok,
                        GREATEST(1, LEAST(8, (SELECT n_docs FROM nd) // count(*))) AS wt
                 FROM toks GROUP BY tok),
         tw AS (SELECT toks.doc_id, toks.tok, wts.wt
                FROM toks JOIN wts USING (tok)),
         ex AS (SELECT doc_id,
                       tok || '#' || CAST(unnest(range(1, wt + 1)) AS VARCHAR) AS e
                FROM tw),
         hb AS (SELECT doc_id,
                       ('0x' || substr(md5(e), 1, 15))::BIGINT % 2147483647 AS h
                FROM ex),
         hs AS (SELECT doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY doc_id, c.i),
         sk AS (SELECT doc_id,
                       md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h)) AS setkey
                FROM (SELECT DISTINCT doc_id, h FROM hb) d GROUP BY doc_id),
         bands AS (SELECT doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY doc_id, (i // 16)),
         sized AS (SELECT b.doc_id, b.band, b.key, sk.setkey,
                          COUNT(*) OVER (PARTITION BY b.band, b.key) AS n
                   FROM bands b JOIN sk USING (doc_id)),
         rb AS (SELECT doc_id, band,
                       CASE WHEN n <= 100 THEN key
                            ELSE key || '!' || setkey END AS key
                FROM sized),
         cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                  FROM rb a JOIN rb b
                    ON a.band = b.band AND a.key = b.key
                       AND a.doc_id < b.doc_id),
         tot AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS s
                 FROM tw GROUP BY doc_id),
         sh AS (SELECT c.a, c.b, CAST(SUM(ta.wt) AS BIGINT) AS shared
                FROM cand c
                JOIN tw ta ON ta.doc_id = c.a
                JOIN tw tb ON tb.doc_id = c.b AND tb.tok = ta.tok
                GROUP BY c.a, c.b)
         SELECT c.a AS a, c.b AS b,
                round(CAST(COALESCE(sh.shared, 0) AS DOUBLE) /
                      CAST(sa.s + sb.s - COALESCE(sh.shared, 0) AS DOUBLE), 6)
                  AS wjac
         FROM cand c
         LEFT JOIN sh ON sh.a = c.a AND sh.b = c.b
         JOIN tot sa ON sa.doc_id = c.a
         JOIN tot sb ON sb.doc_id = c.b
         ORDER BY c.a, c.b""",
    // Composed curation pass: ONE near-dup component pipeline feeds
    // both the q105 keep-best rule and the q116 split rule; per-split
    // doc + keep-best-survivor counts.
    "q130_curation_composed" ->
      s"""WITH RECURSIVE groups AS (SELECT lower(trim(text)) AS k,
                                           MIN(doc_id) AS keeper
                                    FROM documents GROUP BY 1),
         wk AS (SELECT d.doc_id, g.keeper FROM documents d
                JOIN groups g ON lower(trim(d.text)) = g.k),
         ${nearDupComponentsSql},
         q AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS qual
               FROM sdocs),
         losers AS (SELECT d AS doc_id FROM (
             SELECT comp.d,
                    row_number() OVER (PARTITION BY comp.label
                      ORDER BY q.qual DESC, comp.d) AS rn
             FROM comp JOIN q ON q.doc_id = comp.d) t
           WHERE rn > 1),
         kept AS (SELECT doc_id FROM sdocs
                  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         rooted AS (SELECT wk.doc_id,
                           coalesce(comp.label, wk.keeper) AS root
                    FROM wk LEFT JOIN comp ON comp.d = wk.keeper),
         sp AS (SELECT doc_id,
                       ('0x' || substr(md5('split:' || CAST(root AS VARCHAR)), 1, 13))::BIGINT % 1000000 AS b
                FROM rooted),
         spl AS (SELECT doc_id,
                        CASE WHEN b < 100000 THEN 'test'
                             WHEN b < 200000 THEN 'val'
                             ELSE 'train' END AS split
                 FROM sp)
         SELECT spl.split, count(*) AS n_docs,
                CAST(sum(CASE WHEN kept.doc_id IS NULL THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_kept_best
         FROM spl LEFT JOIN kept USING (doc_id)
         GROUP BY spl.split ORDER BY split""",
    // URL dedup: same four deterministic variants, same normalization
    // steps (lowercase scheme/authority, strip www./default port/
    // trailing slash/tracking params/fragment, sort surviving params).
    "q131_url_dedup" ->
      s"""WITH u AS (SELECT doc_id, $urlVariantSql AS url FROM documents),
         $urlCanonSqlCtes
         SELECT url, MIN(doc_id) AS keeper, count(*) AS n_variants
         FROM canon GROUP BY url ORDER BY url""",
    // Streaming Bloom gate: the batch-equivalent membership anti-join
    // (per-arrival semantics: batch-internal dups NOT collapsed).
    "q132_streaming_bloom_gate" ->
      """SELECT doc_id FROM documents
         WHERE doc_id >= 400 AND lower(trim(text)) NOT IN
           (SELECT lower(trim(text)) FROM documents WHERE doc_id < 400)
         ORDER BY doc_id""",
    // Vector-index nightly upkeep: the oracle REBUILDS the IVF×SQ8
    // postings from the new snapshot with the pinned model (seed
    // centroids; scales = per-dim max|v| over the OLD snapshot) — the
    // Spark side delta-maintains and must hash-match.
    "q133_vector_index_nightly" ->
      s"""WITH dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         o AS (SELECT vec_id AS id, embedding AS vec
               FROM embeddings WHERE vec_id % 10 <> 3),
         nw AS (SELECT vec_id AS id,
                       CASE WHEN vec_id % 10 = 5
                            THEN list_concat([-embedding[1]], embedding[2:64])
                            ELSE embedding END AS vec
                FROM embeddings WHERE vec_id % 10 <> 7),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM o, dims GROUP BY i),
         cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         asg AS (SELECT id, cell FROM (
             SELECT nw.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY nw.id
                      ORDER BY ${cosSql("nw.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM nw CROSS JOIN cen) t WHERE rn = 1),
         codes AS (SELECT id, sc.i,
                          CASE WHEN s <= 0 THEN 0
                               ELSE CAST(greatest(-127, least(127,
                                 floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5)))
                                 AS BIGINT)
                          END AS code
                   FROM nw, sc),
         cs AS (SELECT id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                         AS code_str
                FROM codes GROUP BY id)
         SELECT asg.id, asg.cell, cs.code_str
         FROM asg JOIN cs USING (id) ORDER BY asg.id""",
    // HTML extraction: the same regexp ladder (RE2 and Java regex
    // agree on (?is) inline flags, \b, and non-greedy .*?); entities
    // unescape with &amp; LAST for correct single-level unescaping.
    "q134_html_extract" ->
      s"""WITH h AS (SELECT doc_id, $htmlShellSql AS html FROM documents),
         c AS (SELECT doc_id, ${stripHtmlSql("html")} AS clean FROM h)
         SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_chars
         FROM c ORDER BY doc_id""",
    // End-to-end web ingest: canonical-URL keepers -> HTML extraction
    // -> >= 25-token gate -> exact dedup -> per-source stage audit.
    "q135_web_ingest" ->
      s"""WITH u AS (SELECT doc_id, $urlVariantSql AS url FROM documents),
         $urlCanonSqlCtes,
         k AS (SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY url),
         h AS (SELECT d.doc_id, d.source, $htmlShellSql AS html
               FROM documents d JOIN k USING (doc_id)),
         c AS (SELECT doc_id, source, ${stripHtmlSql("html")} AS clean FROM h),
         gt AS (SELECT * FROM c WHERE len(string_split(clean, ' ')) >= 25),
         dd AS (SELECT MIN(doc_id) AS doc_id FROM gt
                GROUP BY lower(trim(clean))),
         uq AS (SELECT gt.* FROM gt JOIN dd USING (doc_id)),
         a1 AS (SELECT source, count(*) AS n_pages FROM c GROUP BY source),
         a2 AS (SELECT source, count(*) AS n_gated FROM gt GROUP BY source),
         a3 AS (SELECT source, count(*) AS n_unique,
                       CAST(SUM(len(string_split(clean, ' '))) AS BIGINT)
                         AS n_tokens
                FROM uq GROUP BY source)
         SELECT a1.source, a1.n_pages,
                coalesce(a2.n_gated, 0) AS n_gated,
                coalesce(a3.n_unique, 0) AS n_unique,
                coalesce(a3.n_tokens, 0) AS n_tokens
         FROM a1 LEFT JOIN a2 USING (source) LEFT JOIN a3 USING (source)
         ORDER BY source""",
    // Export manifest: q84's shard rule, XOR content digest (order-
    // independent, overflow-free), dense-position audit as count-1.
    "q136_export_manifest" ->
      """WITH a AS (SELECT doc_id, text,
           ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 16
             AS shard,
           ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT AS ch
         FROM documents)
         SELECT shard, count(*) AS n_docs,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                bit_xor(ch) AS content_digest,
                count(*) - 1 AS max_pos
         FROM a GROUP BY shard ORDER BY shard""",
    // Integer equi-width histogram: same clamp((v-mn)*12 // span)
    // bin rule; empty bins absent on both sides.
    "q137_histogram" ->
      """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
         mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM s)
         SELECT CASE WHEN mx = mn THEN 0
                     ELSE LEAST(11, (v - mn) * 12 // (mx - mn + 1)) END AS bin,
                count(*) AS n_rows, mn, mx
         FROM s, mm GROUP BY 1, mn, mx ORDER BY bin""",
    "q138_kmeans_fit" -> kmeansOracleSql(k = 8, iters = 3, dims = 64),
    // Covariance sufficient stats: kilo-unit integer sums per dim pair
    // (i <= j) — the graft_gram buffer, re-derived relationally.
    "q139_covariance_stats" ->
      """WITH q AS (SELECT list_transform(range(64), d ->
                      CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e3) AS BIGINT)) AS qv
                    FROM embeddings),
         p AS (SELECT CAST(d1.d AS BIGINT) AS d1, CAST(d2.d AS BIGINT) AS d2,
                      qv[CAST(d1.d + 1 AS INTEGER)] AS x1,
                      qv[CAST(d2.d + 1 AS INTEGER)] AS x2
               FROM q
               CROSS JOIN (SELECT unnest(range(64)) AS d) d1
               CROSS JOIN (SELECT unnest(range(64)) AS d) d2
               WHERE d1.d <= d2.d)
         SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x1) AS BIGINT) AS s1,
                CAST(sum(x2) AS BIGINT) AS s2,
                CAST(sum(x1 * x2) AS BIGINT) AS s12
         FROM p GROUP BY d1, d2 ORDER BY d1, d2""",
    // Key-skew audit: exact order statistics over the per-key count
    // relation; p99 = bucket size at ascending position ceil(0.99 * K).
    "q140_key_skew_audit" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                           CAST(count(*) AS BIGINT) AS n_rows
                    FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(max(n_rows) AS BIGINT) AS max_n FROM c),
         p AS (SELECT n_rows AS p99_n FROM (
                 SELECT n_rows,
                        row_number() OVER (ORDER BY n_rows ASC, key ASC) AS pos,
                        count(*) OVER () AS nk
                 FROM c)
               WHERE pos = CAST(ceil(0.99 * nk) AS BIGINT)),
         r AS (SELECT key, n_rows,
                      row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rnk
               FROM c)
         SELECT CAST(r.rnk AS BIGINT) AS "rank", r.key, r.n_rows,
                CAST(r.n_rows * 1000000 // t.n_total AS BIGINT) AS share_ppm,
                t.n_total, t.n_keys, t.max_n, p.p99_n,
                (r.n_rows > 4 * (t.n_total // t.n_keys)) AS hot
         FROM r, t, p WHERE r.rnk <= 15 ORDER BY "rank"""",
    // Delta-maintained card: oracle = the q97 card computed DIRECTLY
    // over the new snapshot (text+source edits on %10==5, membership
    // churn as q98) — equality proves the maintained state.
    "q141_card_nightly" ->
      """WITH nsnap AS (SELECT doc_id,
                CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text,
                lang,
                CASE WHEN doc_id % 10 = 5 THEN 'patched' ELSE source END AS source
              FROM documents WHERE doc_id % 10 <> 7),
         df AS (SELECT lang, count(*) AS n_docs,
                       count(DISTINCT lower(trim(text))) AS n_distinct_texts,
                       count(DISTINCT source) AS n_sources,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                FROM nsnap GROUP BY lang),
         tf AS (SELECT lang, count(DISTINCT t) AS distinct_words
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM nsnap) x
                WHERE t <> '' GROUP BY lang)
         SELECT df.lang, n_docs,
                n_docs - n_distinct_texts AS n_exact_dups,
                n_sources, total_tokens,
                total_tokens * 1000 // n_docs AS mean_tokens_milli,
                distinct_words
         FROM df JOIN tf USING (lang) ORDER BY df.lang""",
    // JL ANN: 16-dim md5-parity sign projection (same ±1 formula as
    // the Spark plan literals), cosine rank in the reduced space,
    // full-64-dim top-5 as the audit flag — the q99 contract.
    "q142_jl_ann" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec,
                           ${jlProjSql("embedding", 16, 64)} AS pq
                    FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec,
                      ${jlProjSql("embedding", 16, 64)} AS pv
               FROM embeddings WHERE vec_id >= 20),
         ts AS (SELECT qid, id,
                       round(${dotSqlN("pq", "pv", 16)} /
                         (sqrt(${dotSqlN("pq", "pq", 16)}) *
                          sqrt(${dotSqlN("pv", "pv", 16)})), 6) AS cos
                FROM q JOIN c ON qid <> id),
         tr AS (SELECT qid, id, cos,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, id) AS rank
                FROM ts),
         fs AS (SELECT qid, id FROM (
                  SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
                  FROM q JOIN c ON qid <> id) x WHERE r <= 5)
         SELECT t.qid, CAST(t.rank AS BIGINT) AS rank, t.id,
                t.cos AS cos_jl,
                CAST(CASE WHEN f.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_full_topk
         FROM tr t LEFT JOIN fs f ON t.qid = f.qid AND t.id = f.id
         WHERE t.rank <= 5 ORDER BY t.qid, t.rank""",
    // Vocab coverage: direct ordered cumsum over the vocabulary (the
    // count-class formula the Spark side uses is order-equivalent
    // within a class, so rank-V cum matches exactly).
    "q143_vocab_coverage" ->
      """WITH tk AS (SELECT t FROM (SELECT unnest(string_split(text, ' ')) AS t
                                    FROM documents) x WHERE t <> ''),
         vb AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY t),
         r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rnk,
                      sum(c) OVER (ORDER BY c DESC, t
                        ROWS UNBOUNDED PRECEDING) AS cum
               FROM vb),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS vocab_total,
                        CAST(sum(c) AS BIGINT) AS token_total FROM vb),
         cp AS (SELECT CAST(unnest([16, 64, 256, 1024, 4096, 16384]) AS BIGINT) AS v)
         SELECT cp.v, CAST(r.cum AS BIGINT) AS cov_tokens,
                CAST(r.cum * 1000000 // t.token_total AS BIGINT) AS coverage_ppm,
                r.c AS floor_count, t.vocab_total, t.token_total
         FROM cp CROSS JOIN tot t
         JOIN r ON r.rnk = least(cp.v, t.vocab_total)
         ORDER BY cp.v""",
    // Delta-maintained covariance: oracle = the q139 stats computed
    // DIRECTLY over the new snapshot (membership churn + sign-flipped
    // %10==5 vectors) — equality proves the maintained Gram state.
    "q144_covariance_nightly" ->
      """WITH ns AS (SELECT vec_id,
                CASE WHEN vec_id % 10 = 5
                     THEN list_transform(embedding, x -> -x)
                     ELSE embedding END AS embedding
              FROM embeddings WHERE vec_id % 10 <> 7),
         q AS (SELECT list_transform(range(64), d ->
                 CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e3) AS BIGINT)) AS qv
               FROM ns),
         p AS (SELECT CAST(d1.d AS BIGINT) AS d1, CAST(d2.d AS BIGINT) AS d2,
                      qv[CAST(d1.d + 1 AS INTEGER)] AS x1,
                      qv[CAST(d2.d + 1 AS INTEGER)] AS x2
               FROM q
               CROSS JOIN (SELECT unnest(range(64)) AS d) d1
               CROSS JOIN (SELECT unnest(range(64)) AS d) d2
               WHERE d1.d <= d2.d)
         SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x1) AS BIGINT) AS s1,
                CAST(sum(x2) AS BIGINT) AS s2,
                CAST(sum(x1 * x2) AS BIGINT) AS s12
         FROM p GROUP BY d1, d2 ORDER BY d1, d2""",
    // Cluster-size histogram: the q34 component fragment rolled to
    // sizes, binned with the q137 integer-histogram formula.
    "q145_cluster_size_histogram" ->
      s"""WITH RECURSIVE ${nearDupComponentsSql},
         sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS csize
                   FROM comp GROUP BY label),
         mm AS (SELECT MIN(csize) AS mn, MAX(csize) AS mx FROM sizes)
         SELECT CASE WHEN mx = mn THEN 0
                     ELSE LEAST(7, (csize - mn) * 8 // (mx - mn + 1)) END AS bin,
                count(*) AS n_rows, mn, mx
         FROM sizes, mm GROUP BY 1, mn, mx ORDER BY bin""",
    // Retrained index: the SAME kmeans CTE chain as q138 (k=8,
    // iters=2) trains centroids in-oracle; trained offset-micro
    // integers convert to FLOAT vectors, cells assign by the q133
    // rounded-cosine rule, codes by the q79 SQ8 formula.
    "q146_retrained_index" ->
      s"""WITH ${kmeansCtesSql(8, 2, 64)},
         cf AS (SELECT cell,
                       list(CAST(CAST(c AS DOUBLE) / 1000000.0 - 1.0 AS FLOAT)
                            ORDER BY d) AS cvec
                FROM c2 GROUP BY cell),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         co AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM co, dims GROUP BY i),
         asg AS (SELECT id, cell FROM (
             SELECT co.id, cf.cell,
                    row_number() OVER (PARTITION BY co.id
                      ORDER BY ${cosSql("co.vec", "cf.cvec")} DESC, cf.cell) AS rn
             FROM co CROSS JOIN cf) t WHERE rn = 1),
         codes AS (SELECT id, sc.i,
                          CASE WHEN s <= 0 THEN 0
                               ELSE CAST(greatest(-127, least(127,
                                 floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5)))
                                 AS BIGINT)
                          END AS code
                   FROM co, sc),
         cs AS (SELECT id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                         AS code_str
                FROM codes GROUP BY id)
         SELECT asg.id, asg.cell, cs.code_str
         FROM asg JOIN cs USING (id) ORDER BY asg.id""",
    // SAX words: integer PAA (win = idx*6 // n, sum // count) + q137
    // equi-width symbol bins over each type's own PAA range.
    "q147_sax_words" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         ix AS (SELECT typ, v,
                       CAST(row_number() OVER (PARTITION BY typ ORDER BY day) - 1
                            AS BIGINT) AS idx,
                       CAST(count(*) OVER (PARTITION BY typ) AS BIGINT) AS n
                FROM daily),
         paa AS (SELECT typ, idx * 6 // n AS win,
                        CAST(sum(v) // count(*) AS BIGINT) AS p,
                        CAST(max(n) AS BIGINT) AS n_days
                 FROM ix GROUP BY typ, idx * 6 // n),
         sym AS (SELECT typ, win, n_days,
                        CASE WHEN max(p) OVER (PARTITION BY typ)
                                  = min(p) OVER (PARTITION BY typ) THEN 0
                             ELSE (p - min(p) OVER (PARTITION BY typ)) * 4
                                  // (max(p) OVER (PARTITION BY typ)
                                      - min(p) OVER (PARTITION BY typ) + 1)
                        END AS s
                 FROM paa)
         SELECT typ AS event_type, CAST(max(n_days) AS BIGINT) AS n_days,
                CAST(count(*) AS BIGINT) AS n_windows,
                string_agg(CAST(s AS VARCHAR), '' ORDER BY win) AS sax_word
         FROM sym GROUP BY typ ORDER BY event_type""",
    // Streaming funnel: SAME oracle as the batch q120 — the stateful
    // replay must reproduce the batch per-step rows exactly.
    "q148_streaming_funnel" -> funnelOracleSql,
    // CUSUM: scaled-integer deviations (v*n - total), running sum,
    // peak by |S| with earliest-day tie.
    "q149_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         t AS (SELECT typ, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(v) AS BIGINT) AS total
               FROM daily GROUP BY typ),
         c AS (SELECT d.typ, d.day, t.n, t.total,
                      CAST(sum(d.v * t.n - t.total) OVER (
                        PARTITION BY d.typ ORDER BY d.day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
               FROM daily d JOIN t USING (typ)),
         p AS (SELECT typ, day, n, total, s,
                      row_number() OVER (PARTITION BY typ
                        ORDER BY abs(s) DESC, day ASC) AS r
               FROM c)
         SELECT typ AS event_type, n AS n_days,
                CAST(day AS VARCHAR) AS change_day,
                s AS peak_cusum, total,
                CAST(abs(s) * 1000000 // (total * n) AS BIGINT) AS peak_share_ppm
         FROM p WHERE r = 1 ORDER BY event_type""",
    // Theil-Sen: lower median of pairwise slopes; order by the exact
    // IEEE-double ratio then (dv, dd, i, j); no negative integer div.
    "q150_theil_sen_trend" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         ix AS (SELECT typ, v,
                       CAST(row_number() OVER (PARTITION BY typ ORDER BY day) - 1
                            AS BIGINT) AS idx,
                       CAST(count(*) OVER (PARTITION BY typ) AS BIGINT) AS n
                FROM daily),
         pr AS (SELECT a.typ, a.n,
                       b.v - a.v AS dv, b.idx - a.idx AS dd,
                       a.idx AS i, b.idx AS j
                FROM ix a JOIN ix b
                  ON a.typ = b.typ AND a.idx < b.idx),
         rk AS (SELECT typ, n, dv, dd, i, j,
                       row_number() OVER (PARTITION BY typ
                         ORDER BY CAST(dv AS DOUBLE) / dd ASC, dv ASC,
                                  dd ASC, i ASC, j ASC) AS r,
                       count(*) OVER (PARTITION BY typ) AS m
                FROM pr)
         SELECT typ AS event_type, n AS n_days, CAST(m AS BIGINT) AS n_pairs,
                dv, dd, round(CAST(dv AS DOUBLE) / dd, 6) AS slope
         FROM rk WHERE r = CAST(ceil(m / 2.0) AS BIGINT)
         ORDER BY event_type""",
    // Autocorrelation: scaled-integer deviations, exact num/den sums,
    // one rounded division at the end.
    "q151_autocorrelation" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         t AS (SELECT typ, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(v) AS BIGINT) AS total
               FROM daily GROUP BY typ),
         dv AS (SELECT d.typ, t.n,
                       d.v * t.n - t.total AS dd,
                       lead(d.v * t.n - t.total, 7) OVER (
                         PARTITION BY d.typ ORDER BY d.day) AS dl
                FROM daily d JOIN t USING (typ))
         SELECT typ AS event_type, CAST(7 AS BIGINT) AS lag,
                CAST(max(n) AS BIGINT) AS n_days,
                CAST(coalesce(sum(dd * dl), 0) AS BIGINT) AS num,
                CAST(sum(dd * dd) AS BIGINT) AS den,
                CASE WHEN sum(dd * dd) > 0
                     THEN round(CAST(coalesce(sum(dd * dl), 0) AS DOUBLE) /
                                CAST(sum(dd * dd) AS DOUBLE), 6)
                END AS r
         FROM dv GROUP BY typ ORDER BY event_type""",
    // Multi-probe SRP: per-bit md5-parity sign dots (the q26 bucket
    // formula), flip the two lowest-|dot| bits, rank candidates from
    // the three buckets by exact cosine, audit vs brute top-5.
    "q152_multiprobe_ann" ->
      s"""WITH bits AS (SELECT CAST(unnest(range(6)) AS BIGINT) AS b),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         qd AS (SELECT qid, b,
                       list_sum(list_transform(range(64), d ->
                         (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                               THEN 1.0 ELSE -1.0 END)
                         * qvec[CAST(d + 1 AS INTEGER)]::DOUBLE)) AS dt
                FROM q CROSS JOIN bits),
         qb AS (SELECT qid,
                       CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS base
                FROM qd GROUP BY qid),
         fl AS (SELECT qid, b FROM (
                  SELECT qid, b,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY abs(dt) ASC, b ASC) AS r
                  FROM qd) WHERE r <= 2),
         pr AS (SELECT qid, base AS probe FROM qb
                UNION ALL
                SELECT fl.qid, xor(qb.base, CAST(1 AS BIGINT) << CAST(fl.b AS INTEGER))
                FROM fl JOIN qb USING (qid)),
         cb AS (SELECT id, vec,
                       CAST(sum(CASE WHEN dt > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
                FROM (SELECT id, vec, b,
                        list_sum(list_transform(range(64), d ->
                          (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                                THEN 1.0 ELSE -1.0 END)
                          * vec[CAST(d + 1 AS INTEGER)]::DOUBLE)) AS dt
                      FROM c CROSS JOIN bits) x
                GROUP BY id, vec),
         cand AS (SELECT DISTINCT pr.qid, cb.id FROM pr JOIN cb ON cb.bucket = pr.probe
                  WHERE pr.qid <> cb.id),
         sc AS (SELECT cand.qid, cand.id,
                       round(${cosSql("q.qvec", "cb.vec")}, 6) AS cos
                FROM cand JOIN q ON q.qid = cand.qid
                JOIN cb ON cb.id = cand.id),
         mp AS (SELECT qid, id, cos,
                       row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, id) AS rank
                FROM sc),
         fs AS (SELECT qid, id FROM (
                  SELECT q.qid, c.id,
                         row_number() OVER (PARTITION BY q.qid
                           ORDER BY ${cosSql("q.qvec", "c.vec")} DESC, c.id) AS r
                  FROM q JOIN c ON q.qid <> c.id) x WHERE r <= 5)
         SELECT m.qid, CAST(m.rank AS BIGINT) AS rank, m.id,
                m.cos AS cos_mp,
                CAST(CASE WHEN f.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_full_topk
         FROM mp m LEFT JOIN fs f ON f.qid = m.qid AND f.id = m.id
         WHERE m.rank <= 5 ORDER BY m.qid, m.rank""",
    // Attribution: strictly-earlier range frame + order-independent
    // max of the padded epoch#channel string; no-touch -> 'none'.
    "q153_attribution" -> attributionOracleSql,
    // MAD: two exact lower-median selections ((value, day) order,
    // position ceil(n/2)), then the 3*MAD outlier count.
    "q154_mad_outliers" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         m1 AS (SELECT typ, v AS median_v FROM (
                  SELECT typ, v,
                         row_number() OVER (PARTITION BY typ
                           ORDER BY v ASC, day ASC) AS r,
                         count(*) OVER (PARTITION BY typ) AS n
                  FROM daily) WHERE r = CAST(ceil(n / 2.0) AS BIGINT)),
         dev AS (SELECT d.typ, d.day, d.v, m1.median_v,
                        abs(d.v - m1.median_v) AS ad
                 FROM daily d JOIN m1 USING (typ)),
         m2 AS (SELECT typ, ad AS mad FROM (
                  SELECT typ, ad,
                         row_number() OVER (PARTITION BY typ
                           ORDER BY ad ASC, day ASC) AS r,
                         count(*) OVER (PARTITION BY typ) AS n
                  FROM dev) WHERE r = CAST(ceil(n / 2.0) AS BIGINT))
         SELECT dev.typ AS event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(max(dev.median_v) AS BIGINT) AS median_v,
                CAST(max(m2.mad) AS BIGINT) AS mad,
                CAST(count(CASE WHEN dev.ad > 3 * m2.mad THEN 1 END) AS BIGINT)
                  AS n_outliers
         FROM dev JOIN m2 USING (typ)
         GROUP BY dev.typ ORDER BY event_type""",
    // Conversion latency: strict first-signup < first-purchase,
    // integer seconds, lower-median by (secs, user).
    "q155_conversion_latency" ->
      """WITH m AS (SELECT user_id AS u,
               min(CAST(floor(epoch(ts)) AS BIGINT))
                 FILTER (WHERE event_type = 'signup') AS m0,
               min(CAST(floor(epoch(ts)) AS BIGINT))
                 FILTER (WHERE event_type = 'purchase') AS m1
             FROM events GROUP BY user_id),
         s AS (SELECT u, m1 - m0 AS secs FROM m
               WHERE m0 IS NOT NULL AND m1 IS NOT NULL AND m0 < m1),
         md AS (SELECT secs AS median_s FROM (
                  SELECT secs, row_number() OVER (ORDER BY secs ASC, u ASC) AS r,
                         count(*) OVER () AS n
                  FROM s) WHERE r = CAST(ceil(n / 2.0) AS BIGINT))
         SELECT CAST(count(*) AS BIGINT) AS n_converted,
                CAST(min(secs) AS BIGINT) AS min_s,
                CAST(max(md.median_s) AS BIGINT) AS median_s,
                CAST(max(secs) AS BIGINT) AS max_s
         FROM s, md""",
    // BPE encode: the merge chain unrolled over the same literal
    // table; segmented = the full token stream, so the hash checks
    // the exact tokenization, not just counts.
    "q158_bpe_encode" ->
      s"""WITH $bpeToksSql
         SELECT d.doc_id,
                CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
                  AS BIGINT) AS n_ws_tokens,
                CAST(len(tk.toks) AS BIGINT) AS n_tokens,
                array_to_string(tk.toks, ' ') AS segmented
         FROM documents d JOIN tk USING (doc_id) ORDER BY doc_id""",
    // BPE-budgeted greedy-prefix selection: q115's score CTEs with the
    // token column swapped to real BPE counts.
    "q159_bpe_budget_select" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id),
         $bpeToksSql,
         j AS (SELECT s.doc_id, s.score,
                      CAST(len(tk.toks) AS BIGINT) AS n_tokens
               FROM s JOIN tk USING (doc_id)),
         r AS (SELECT doc_id, score, n_tokens,
                      CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM j)
         SELECT doc_id, score, n_tokens, cum_tokens
         FROM r WHERE cum_tokens <= 60000 ORDER BY doc_id""",
    // Skew-join equivalence: salt and bucketing are execution-strategy
    // choices only — the oracle is the PLAIN join, once per label.
    "q156_skew_join" ->
      """WITH dim AS (SELECT event_type, CAST(count(*) AS BIGINT) AS type_n
                      FROM events GROUP BY 1),
         j AS (SELECT e.event_id, e.event_type, d.type_n
               FROM events e JOIN dim d USING (event_type))
         SELECT 'salted' AS op, event_id, event_type, type_n FROM j
         UNION ALL
         SELECT 'bucketed' AS op, event_id, event_type, type_n FROM j
         ORDER BY op, event_id""",
    // Composed nightly tick: FULL REBUILDS of all four maintained
    // relations from the new snapshots — band/hash index (q127/q128),
    // data card (q141), vector postings under the old-snapshot-TRAINED
    // model (q146's kmeans CTEs scoped to the old vec snapshot +
    // q133's rebuild convention), covariance state (q144) — stacked
    // under a rel tag with stringified payload columns.
    "q157_nightly_tick" ->
      s"""WITH ${kmeansCtesSql(8, 2, 64,
            "(SELECT * FROM embeddings WHERE vec_id % 10 <> 3) emb")},
         cf AS (SELECT cell,
                       list(CAST(CAST(c AS DOUBLE) / 1000000.0 - 1.0 AS FLOAT)
                            ORDER BY d) AS cvec
                FROM c2 GROUP BY cell),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         o AS (SELECT vec_id AS id, embedding AS vec
               FROM embeddings WHERE vec_id % 10 <> 3),
         nv AS (SELECT vec_id AS id,
                       CASE WHEN vec_id % 10 = 5
                            THEN list_transform(embedding, x -> -x)
                            ELSE embedding END AS vec
                FROM embeddings WHERE vec_id % 10 <> 7),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM o, dims GROUP BY i),
         asg AS (SELECT id, cell FROM (
             SELECT nv.id, cf.cell,
                    row_number() OVER (PARTITION BY nv.id
                      ORDER BY ${cosSql("nv.vec", "cf.cvec")} DESC, cf.cell) AS rn
             FROM nv CROSS JOIN cf) t WHERE rn = 1),
         codes AS (SELECT id, sc.i,
                          CASE WHEN s <= 0 THEN 0
                               ELSE CAST(greatest(-127, least(127,
                                 floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5)))
                                 AS BIGINT)
                          END AS code
                   FROM nv, sc),
         cspost AS (SELECT id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                           AS code_str
                    FROM codes GROUP BY id),
         nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END AS text,
                       lang,
                       CASE WHEN doc_id % 10 = 5 THEN 'patched' ELSE source END AS source
                FROM documents WHERE doc_id % 10 <> 7),
         w AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
               FROM nw),
         hb AS (SELECT doc_id,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
                FROM w),
         hs AS (SELECT doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY doc_id, c.i),
         bands AS (SELECT doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY doc_id, (i // 16)),
         hidx AS (SELECT ('0x' || substr(md5(lower(trim(text))), 1, 15))::BIGINT AS h,
                         count(*) AS cnt
                  FROM nw GROUP BY 1),
         cdf AS (SELECT lang, count(*) AS n_docs,
                        count(DISTINCT lower(trim(text))) AS n_distinct_texts,
                        count(DISTINCT source) AS n_sources,
                        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                 FROM nw GROUP BY lang),
         ctf AS (SELECT lang, count(DISTINCT t) AS distinct_words
                 FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM nw) x
                 WHERE t <> '' GROUP BY lang),
         qc AS (SELECT list_transform(range(64), d ->
                  CAST(round(vec[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e3) AS BIGINT)) AS qv
                FROM nv),
         cp AS (SELECT CAST(e1.d AS BIGINT) AS d1, CAST(e2.d AS BIGINT) AS d2,
                       qv[CAST(e1.d + 1 AS INTEGER)] AS x1,
                       qv[CAST(e2.d + 1 AS INTEGER)] AS x2
                FROM qc
                CROSS JOIN (SELECT unnest(range(64)) AS d) e1
                CROSS JOIN (SELECT unnest(range(64)) AS d) e2
                WHERE e1.d <= e2.d),
         covrel AS (SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(x1) AS BIGINT) AS s1,
                           CAST(sum(x2) AS BIGINT) AS s2,
                           CAST(sum(x1 * x2) AS BIGINT) AS s12
                    FROM cp GROUP BY d1, d2),
         olds AS (SELECT doc_id, text, lang FROM documents
                  WHERE doc_id % 10 <> 3),
         ${bpeTrainCtesSql(10, "olds")},
         ${bpeFertilityCtesSql(10, "nw")}
         SELECT 'band' AS rel, CAST(doc_id AS VARCHAR) AS c1,
                CAST(band AS VARCHAR) AS c2, key AS c3,
                NULL AS c4, NULL AS c5, NULL AS c6, NULL AS c7 FROM bands
         UNION ALL
         SELECT 'hash', CAST(h AS VARCHAR), CAST(cnt AS VARCHAR),
                NULL, NULL, NULL, NULL, NULL FROM hidx
         UNION ALL
         SELECT 'card', cdf.lang, CAST(n_docs AS VARCHAR),
                CAST(n_docs - n_distinct_texts AS VARCHAR),
                CAST(n_sources AS VARCHAR), CAST(total_tokens AS VARCHAR),
                CAST(total_tokens * 1000 // n_docs AS VARCHAR),
                CAST(distinct_words AS VARCHAR)
         FROM cdf JOIN ctf USING (lang)
         UNION ALL
         SELECT 'vecpost', CAST(asg.id AS VARCHAR), CAST(asg.cell AS VARCHAR),
                cspost.code_str, NULL, NULL, NULL, NULL
         FROM asg JOIN cspost USING (id)
         UNION ALL
         SELECT 'cov', CAST(d1 AS VARCHAR), CAST(d2 AS VARCHAR),
                CAST(n AS VARCHAR), CAST(s1 AS VARCHAR), CAST(s2 AS VARCHAR),
                CAST(s12 AS VARCHAR), NULL FROM covrel
         UNION ALL
         SELECT 'tok', lang, CAST(n_docs AS VARCHAR),
                CAST(n_chars AS VARCHAR), CAST(n_ws_tokens AS VARCHAR),
                CAST(n_tokens AS VARCHAR),
                CAST(chars_per_token_ppm AS VARCHAR),
                CAST(fertility_ppm AS VARCHAR) FROM tokf
         ORDER BY rel, c1, c2""",
    // BPE trainer: each round's argmax merge, unrolled.
    "q160_bpe_train" ->
      s"""WITH ${bpeTrainCtesSql(10)}
         SELECT mrank, l, r, np AS n_pairs FROM (
           ${(1 to 10).map(i => s"SELECT * FROM m$i").mkString("\n           UNION ALL ")})
         ORDER BY mrank""",
    // Train-then-encode: the training rounds re-derived, the learned
    // merges applied to the documents, segmentation as q158.
    "q161_bpe_trained_encode" ->
      s"""WITH ${bpeTrainCtesSql(10)},
         a0 AS (SELECT doc_id,
                       regexp_replace(text, '([^ ])', chr(1) || '\\1' || chr(1), 'g') AS enc
                FROM documents),
         ${(1 to 10).map(i =>
            s"""a$i AS (SELECT doc_id,
                   replace(enc, chr(1) || m.l || chr(1) || chr(1) || m.r || chr(1),
                           chr(1) || m.l || m.r || chr(1)) AS enc
                 FROM a${i - 1}, m$i m)""").mkString(",\n         ")},
         tka AS (SELECT doc_id,
                        list_filter(string_split(
                          replace(replace(enc, chr(1) || chr(1), ' '), chr(1), ''),
                          ' '), x -> x <> '') AS toks
                 FROM a10)
         SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                array_to_string(toks, ' ') AS segmented
         FROM tka ORDER BY doc_id""",
    // Salted two-stage aggregation: must equal the plain GROUP BY.
    "q162_salted_agg" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    // Join-cardinality audit: exact sum-of-products over the two
    // key-count relations, worst key by (contribution DESC, key DESC).
    "q163_join_cardinality" ->
      """WITH ca AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                            CAST(count(*) AS BIGINT) AS na
                     FROM lineitem GROUP BY 1),
         cb AS (SELECT CAST(o_orderkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS nb
                FROM orders GROUP BY 1),
         sh AS (SELECT key, na * nb AS prod FROM ca JOIN cb USING (key)),
         sa AS (SELECT CAST(sum(na) AS BIGINT) AS n_rows_a,
                       CAST(count(*) AS BIGINT) AS n_keys_a FROM ca),
         sb AS (SELECT CAST(sum(nb) AS BIGINT) AS n_rows_b,
                       CAST(count(*) AS BIGINT) AS n_keys_b FROM cb),
         js AS (SELECT CAST(count(*) AS BIGINT) AS n_shared_keys,
                       CAST(coalesce(sum(prod), 0) AS BIGINT) AS join_rows
                FROM sh),
         t AS (SELECT key AS top_key, CAST(prod AS BIGINT) AS top_rows
               FROM sh ORDER BY prod DESC, key DESC LIMIT 1)
         SELECT sa.n_rows_a, sa.n_keys_a, sb.n_rows_b, sb.n_keys_b,
                js.n_shared_keys, js.join_rows, t.top_key, t.top_rows
         FROM js CROSS JOIN sa CROSS JOIN sb LEFT JOIN t ON TRUE""",
    // Top user paths: first-5-event journeys ranked by user count,
    // ties (n DESC, path) — rn ties among identical (ts, type) rows
    // cannot change the path string.
    "q164_top_paths" ->
      """WITH f AS (SELECT user_id AS u, event_type AS typ,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_type) AS rn
                    FROM events),
         p AS (SELECT u, string_agg(typ, '>' ORDER BY rn) AS path
               FROM f WHERE rn <= 5 GROUP BY u)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users
         FROM p GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""",
    // SCD2 merge: the five cases re-derived relationally — full outer
    // current×collapsed-updates, branch per outcome, history unioned.
    "q165_scd2_merge" ->
      """WITH cur AS (SELECT c_custkey, c_name,
                             CAST(c_nationkey AS BIGINT) AS c_nationkey,
                             CAST(1000 AS BIGINT) AS valid_from
                      FROM customer),
         hist AS (SELECT c_custkey, c_name,
                         CAST(c_nationkey + 100 AS BIGINT) AS c_nationkey,
                         CAST(500 AS BIGINT) AS valid_from,
                         CAST(1000 AS BIGINT) AS valid_to
                  FROM customer WHERE c_custkey % 10 = 0),
         ua AS (SELECT c_custkey, c_name,
                       CAST(c_nationkey + 1 AS BIGINT) AS c_nationkey,
                       CAST(2000 AS BIGINT) AS ts
                FROM customer WHERE c_custkey % 10 = 3
                UNION ALL
                SELECT c_custkey, c_name, CAST(c_nationkey + 50 AS BIGINT),
                       CAST(1500 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 3
                UNION ALL
                SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT),
                       CAST(2000 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 6
                UNION ALL
                SELECT c_custkey, c_name, CAST(c_nationkey + 7 AS BIGINT),
                       CAST(900 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 4
                UNION ALL
                SELECT c_custkey + 100000, c_name, CAST(c_nationkey AS BIGINT),
                       CAST(2000 AS BIGINT)
                FROM customer WHERE c_custkey % 10 = 9),
         upd AS (SELECT c_custkey, c_name, c_nationkey, ts FROM (
                   SELECT *, row_number() OVER (PARTITION BY c_custkey
                     ORDER BY ts DESC, c_name DESC, c_nationkey DESC) AS rn
                   FROM ua) WHERE rn = 1),
         j AS (SELECT cur.c_custkey AS ck, cur.c_name AS cn,
                      cur.c_nationkey AS cnk, cur.valid_from AS vf,
                      u.c_custkey AS uk, u.c_name AS un,
                      u.c_nationkey AS unk, u.ts AS uts
               FROM cur FULL OUTER JOIN upd u ON cur.c_custkey = u.c_custkey),
         chg AS (SELECT *,
                        (un IS DISTINCT FROM cn OR unk IS DISTINCT FROM cnk)
                          AS changed,
                        (uts IS NOT NULL AND uts > vf) AS applies
                 FROM j)
         SELECT c_custkey, c_name, c_nationkey, valid_from, valid_to FROM (
           SELECT ck AS c_custkey, cn AS c_name, cnk AS c_nationkey,
                  vf AS valid_from, CAST(NULL AS BIGINT) AS valid_to
           FROM chg WHERE ck IS NOT NULL AND NOT (applies AND changed)
           UNION ALL
           SELECT ck, cn, cnk, vf, uts
           FROM chg WHERE ck IS NOT NULL AND applies AND changed
           UNION ALL
           SELECT ck, un, unk, uts, NULL
           FROM chg WHERE ck IS NOT NULL AND applies AND changed
           UNION ALL
           SELECT uk, un, unk, uts, NULL FROM chg WHERE ck IS NULL
           UNION ALL
           SELECT c_custkey, c_name, c_nationkey, valid_from, valid_to
           FROM hist)
         ORDER BY c_custkey, valid_from""",
    // Windowed funnel: per-step 48 h deadline, each stage's minimum
    // conditional on the previous stage's resolved time. SHARED by the
    // batch q166 and the streaming q168 (the q120/q148 twin contract).
    "q166_windowed_funnel" -> windowedFunnelOracleSql,
    "q168_streaming_windowed_funnel" -> windowedFunnelOracleSql,
    // Video frame sampling: every sampled frame's raster is the doc's
    // bytes rotated by the frame index — the checksum re-derives from
    // text, pixel by pixel.
    "q167_video_frame_sample" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h,
                           strlen(text) % 5 + 2 AS nf
                    FROM documents),
         fr AS (SELECT doc_id, text, len, w, h, unnest(range(nf)) AS f FROM m),
         sm AS (SELECT * FROM fr WHERE f % 2 = 0),
         px AS (SELECT doc_id, f, w, h, len, text,
                       unnest(range(w * h * 3)) AS i
                FROM sm),
         ck AS (SELECT doc_id, f, w, h,
                       CAST(sum(ord(substr(text,
                         CAST((i + f) % len AS INTEGER) + 1, 1))) AS BIGINT)
                         AS px_checksum
                FROM px GROUP BY 1, 2, 3, 4)
         SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                px_checksum
         FROM ck ORDER BY doc_id, frame_idx""",
    // Exact percentile bands: per-key value histogram + per-key
    // exclusive prefix, position (p*n + 99) // 100 — integer ceil.
    "q169_exact_percentiles" ->
      """WITH q AS (SELECT CAST(event_type AS VARCHAR) AS k,
                           CAST(round(value * 100) AS BIGINT) AS v
                    FROM events),
         h AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
         w AS (SELECT k, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY k),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct)
         SELECT w.k AS event_type, p.pct, w.v AS value_cents
         FROM w JOIN t USING (k) CROSS JOIN p
         WHERE below < (pct * n + 99) // 100
           AND (pct * n + 99) // 100 <= below + c
         ORDER BY event_type, pct""",
    // Key entropy: micro-nat Shannon entropy of the key distribution
    // vs its ln(K) maximum — per-key terms quantized before the sum.
    "q170_key_entropy" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1),
         a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                        AS BIGINT) AS t
               FROM c)
         SELECT n_rows, n_keys,
                CAST(round(ln(n_rows) * 1e6) AS BIGINT) - t // n_rows
                  AS entropy_micro,
                CAST(round(ln(n_keys) * 1e6) AS BIGINT) AS max_entropy_micro,
                CASE WHEN CAST(round(ln(n_keys) * 1e6) AS BIGINT) > 0
                     THEN (CAST(round(ln(n_rows) * 1e6) AS BIGINT) - t // n_rows)
                          * 1000000 // CAST(round(ln(n_keys) * 1e6) AS BIGINT)
                     ELSE 1000000 END AS balance_ppm
         FROM a""",
    // FK integrity: per-relation orphan audit re-derived with
    // NOT EXISTS anti-joins over the key-count relations; NULL FKs
    // counted separately, never as orphans.
    "q171_fk_integrity" ->
      """WITH
         c1 AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         p1 AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
                FROM orders WHERE o_orderkey IS NOT NULL),
         n1 AS (SELECT CAST(count(*) AS BIGINT) AS n_null_rows
                FROM lineitem WHERE l_orderkey IS NULL),
         o1 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
                       CAST(count(*) AS BIGINT) AS n_orphan_keys
                FROM c1 WHERE NOT EXISTS
                  (SELECT 1 FROM p1 WHERE p1.key = c1.key)),
         b1 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys FROM c1),
         r1 AS (SELECT 'lineitem->orders' AS relation, b1.*, n1.*, o1.*
                FROM b1 CROSS JOIN n1 CROSS JOIN o1),
         e2 AS (SELECT CASE WHEN o_orderkey % 13 = 5 THEN NULL
                            ELSE o_custkey END AS fk FROM orders),
         c2 AS (SELECT CAST(fk AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM e2 WHERE fk IS NOT NULL GROUP BY 1),
         p2 AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS key
                FROM customer WHERE c_custkey % 7 <> 3),
         n2 AS (SELECT CAST(count(*) AS BIGINT) AS n_null_rows
                FROM e2 WHERE fk IS NULL),
         o2 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
                       CAST(count(*) AS BIGINT) AS n_orphan_keys
                FROM c2 WHERE NOT EXISTS
                  (SELECT 1 FROM p2 WHERE p2.key = c2.key)),
         b2 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys FROM c2),
         r2 AS (SELECT 'orders->customer' AS relation, b2.*, n2.*, o2.*
                FROM b2 CROSS JOIN n2 CROSS JOIN o2),
         c3 AS (SELECT CAST(c_nationkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM customer WHERE c_nationkey IS NOT NULL GROUP BY 1),
         p3 AS (SELECT DISTINCT CAST(n_nationkey AS VARCHAR) AS key
                FROM nation WHERE n_nationkey < 20),
         n3 AS (SELECT CAST(count(*) AS BIGINT) AS n_null_rows
                FROM customer WHERE c_nationkey IS NULL),
         o3 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_orphan_rows,
                       CAST(count(*) AS BIGINT) AS n_orphan_keys
                FROM c3 WHERE NOT EXISTS
                  (SELECT 1 FROM p3 WHERE p3.key = c3.key)),
         b3 AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys FROM c3),
         r3 AS (SELECT 'customer->nation' AS relation, b3.*, n3.*, o3.*
                FROM b3 CROSS JOIN n3 CROSS JOIN o3),
         u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
               UNION ALL SELECT * FROM r3)
         SELECT relation, n_child_rows, n_child_keys, n_null_rows,
                n_orphan_rows, n_orphan_keys,
                CASE WHEN n_child_rows > 0
                     THEN n_orphan_rows * 1000000 // n_child_rows
                     ELSE 0 END AS orphan_ppm
         FROM u ORDER BY relation""",
    // Key Gini: rank-weighted sum via counts-of-counts classes —
    // contiguous rank runs collapse to c*(m*r0 + m*(m+1)/2); the
    // numerator 2S-(n+1)T is provably >= 0 so // == div here.
    "q172_key_gini" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                           CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1),
         cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
         w AS (SELECT c, m,
                      CAST(coalesce(sum(m) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS r0
               FROM cc),
         a AS (SELECT CAST(sum(c * m) AS BIGINT) AS n_rows,
                      CAST(sum(m) AS BIGINT) AS n_keys,
                      CAST(sum(c * (m * r0 + m * (m + 1) // 2))
                        AS BIGINT) AS s
               FROM w)
         SELECT n_rows, n_keys,
                CASE WHEN n_rows <= 0 OR n_keys <= 1 THEN 0
                     ELSE (2 * s - (n_keys + 1) * n_rows) * 1000000
                          // (n_keys * n_rows) END AS gini_ppm
         FROM a""",
    // Weekday seasonality: one-way ANOVA between-group share with
    // cusum-scaled integer deviations (d = v*n - total, sum d = 0);
    // DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday -> +1.
    // dg*dg // ng and ssb*1e6 // sst: numerators nonnegative so
    // // == div.
    "q173_weekday_seasonality" ->
      """WITH daily AS (SELECT event_type AS typ, ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         st AS (SELECT typ, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(v) AS BIGINT) AS total
                FROM daily GROUP BY typ),
         dev AS (SELECT d.typ, d.v * t.n - t.total AS dd,
                        CAST(dayofweek(d.day) + 1 AS BIGINT) AS g, t.n
                 FROM daily d JOIN st t USING (typ)),
         bg AS (SELECT typ, g, CAST(sum(dd) AS BIGINT) AS dg,
                       CAST(count(*) AS BIGINT) AS ng,
                       CAST(sum(dd * dd) AS BIGINT) AS sstp,
                       CAST(max(n) AS BIGINT) AS n_days
                FROM dev GROUP BY 1, 2),
         agg AS (SELECT typ AS event_type,
                        CAST(max(n_days) AS BIGINT) AS n_days,
                        CAST(sum(sstp) AS BIGINT) AS sst,
                        CAST(sum(dg * dg // ng) AS BIGINT) AS ssb
                 FROM bg GROUP BY 1),
         pk AS (SELECT typ AS event_type, g AS peak_weekday FROM (
                  SELECT typ, g, row_number() OVER (PARTITION BY typ
                    ORDER BY dg DESC, g ASC) AS rn FROM bg) WHERE rn = 1)
         SELECT a.event_type, a.n_days,
                CASE WHEN sst > 0 THEN ssb * 1000000 // sst
                     ELSE 0 END AS seasonality_ppm,
                p.peak_weekday
         FROM agg a JOIN pk p USING (event_type) ORDER BY a.event_type""",
    // Inter-event gaps: consecutive order (second, type) per user;
    // bucket = length of the binary string = floor(log2)+1, an
    // integer log2 with no float boundary hazard.
    "q174_event_gaps" -> eventGapsOracleSql,
    // The streaming twin must reproduce the batch histogram exactly
    // (the q120/q148 and q166/q168 twin contract).
    "q180_streaming_gaps" -> eventGapsOracleSql)
}

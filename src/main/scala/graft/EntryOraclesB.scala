package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** DuckDB oracle SQL, part B — see [[SparkEntry.oracleSql]].
  * Part of the registry split (round 10). */
private[graft] trait EntryOraclesB extends EntryOraclesA {
  private[graft] def oraclesPartB: Map[String, String] = Map(
    // Exact mirror of the streaming per-type daily counts; the HLL DAU
    // column is asserted Spark-side as a tolerance flag (q42 technique).
    "q58_streaming_rollups" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, event_type,
                COUNT(*) AS n_events, true AS dau_ok
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q59_ivf_lloyd_recall" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         asg0 AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         nv AS (SELECT id, cell,
                  list_transform(vec, x -> x::DOUBLE /
                    sqrt(list_sum(list_transform(vec, y -> y::DOUBLE * y::DOUBLE)))) AS nvec
                FROM asg0),
         ms AS (SELECT cell, list(nvec ORDER BY id) AS vs FROM nv GROUP BY cell),
         ref AS (SELECT cell AS cid,
                   list_transform(range(64), d ->
                     CAST(list_reduce(
                       list_transform(vs, v -> v[CAST(d + 1 AS INTEGER)]),
                       (a, b) -> a + b) AS REAL)) AS cvec
                 FROM ms),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, ref.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "ref.cvec")} DESC, ref.cid) AS rn
             FROM c CROSS JOIN ref) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         pr AS (SELECT qid, qvec, cell FROM (
             SELECT q.qid, q.qvec, ref.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "ref.cvec")} DESC, ref.cid) AS rn
             FROM q CROSS JOIN ref) t WHERE rn <= 4),
         scored AS (SELECT pr.qid, a.id, ${cosSql("pr.qvec", "a.vec")} AS cos
                    FROM pr JOIN asg a USING (cell) WHERE pr.qid <> a.id),
         ivf AS (SELECT qid, id FROM (
             SELECT qid, id,
                    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
             FROM scored) t WHERE rank <= 5),
         ex AS (SELECT qid, id FROM (
             SELECT q.qid, c.id,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "c.vec")} DESC, c.id) AS rank
             FROM q CROSS JOIN c WHERE q.qid <> c.id) t WHERE rank <= 5)
         SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits
         FROM q LEFT JOIN (SELECT qid, COUNT(*) AS n_hits
                           FROM ivf JOIN ex USING (qid, id) GROUP BY qid) h USING (qid)
         ORDER BY q.qid""",
    // The Bloom prefilter changes the PLAN, never the answer (no false
    // negatives + exact verify of maybe-seen rows), so the oracle is
    // the sketch-free set-semantics form: dedupe the new batch by
    // normalized text (min-id keeper), drop texts already in the index.
    "q60_bloom_incremental_dedup" ->
      """WITH newb AS (SELECT * FROM documents WHERE doc_id % 10 >= 8),
         idx AS (SELECT DISTINCT lower(trim(text)) AS t FROM documents
                 WHERE doc_id % 10 < 8),
         k AS (SELECT MIN(doc_id) AS doc_id FROM newb GROUP BY lower(trim(text)))
         SELECT d.doc_id, d.lang, d.source
         FROM newb d JOIN k USING (doc_id)
         WHERE lower(trim(d.text)) NOT IN (SELECT t FROM idx)
         ORDER BY doc_id""",
    // 16-token windows every 8 tokens; window count covers every token
    // (1 + ceil(max(0, n-16)/8)); DuckDB's inclusive 1-based list slice
    // toks[a:b] mirrors Spark's slice(toks, a, 16) with b = a+15.
    "q61_doc_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         s AS (SELECT doc_id, toks, len(toks) AS n,
                      1 + (greatest(len(toks) - 16, 0) + 7) // 8 AS nc
               FROM t),
         e AS (SELECT doc_id, toks, n, unnest(range(nc)) AS i FROM s)
         SELECT doc_id, i AS chunk_idx,
                least(16, n - i * 8) AS n_tokens,
                array_to_string(toks[(i * 8 + 1):(i * 8 + 16)], ' ') AS chunk
         FROM e ORDER BY doc_id, chunk_idx""",
    // Corpus → vocab (word, count) → per-word character pairs weighted
    // by word count → top-50 by (total DESC, pair). Same tie-break both
    // sides, so the row SET is deterministic.
    "q62_bpe_pair_counts" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         wc AS (SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY word),
         pe AS (SELECT n, unnest(list_transform(range(1, length(word)),
                         i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
                FROM wc),
         agg AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pairs FROM pe GROUP BY pair)
         SELECT pair, n_pairs FROM agg
         ORDER BY n_pairs DESC, pair LIMIT 50""",
    // Exact mirror of PQ encode + ADC: same subspace slices, the same
    // argmax form (dot - |c|²/2, round 6, lowest-cid tie), and the ADC
    // sum walks subspaces in ascending order (list(dd ORDER BY sub))
    // to match Spark's zip_with/aggregate left fold.
    "q63_pq_ann" ->
      s"""WITH sp AS (SELECT unnest(range(8)) AS sub),
         cb AS (SELECT vec_id - 20 AS cid, sub,
                       embedding[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS cv
                FROM embeddings, sp WHERE vec_id BETWEEN 20 AND 35),
         cb2 AS (SELECT cid, sub, cv,
                        list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE)) AS c2
                 FROM cb),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         sv AS (SELECT id, sub,
                       vec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS sv
                FROM c, sp),
         enc AS (SELECT id, sub, cid AS code FROM (
             SELECT sv.id, sv.sub, cb2.cid,
                    row_number() OVER (PARTITION BY sv.id, sv.sub
                      ORDER BY round(${dotSqlN("sv.sv", "cb2.cv", 8)} - c2 / 2, 6) DESC,
                               cb2.cid) AS rn
             FROM sv JOIN cb2 ON cb2.sub = sv.sub) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         qs AS (SELECT qid, sub,
                       qvec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS qsv
                FROM q, sp),
         qt AS (SELECT qid, cb2.sub, cid,
                       ${dotSqlN("qs.qsv", "qs.qsv", 8)}
                         - 2 * ${dotSqlN("qs.qsv", "cb2.cv", 8)} + c2 AS dd
                FROM qs JOIN cb2 ON cb2.sub = qs.sub),
         ad AS (SELECT qt.qid, e.id,
                       round(list_sum(list(dd ORDER BY e.sub)), 6) AS adist
                FROM enc e JOIN qt ON qt.sub = e.sub AND qt.cid = e.code
                WHERE qt.qid <> e.id
                GROUP BY qt.qid, e.id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, adist FROM (
           SELECT qid, id, adist,
                  row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rank
           FROM ad) t WHERE rank <= 5
         ORDER BY qid, rank""",
    // Same clean-derivation aggregate as q10: every injected junk line
    // must be dropped by the JSON MAXERROR accounting, every over-width
    // browser truncated, every empty service kept as '' (never null).
    "q64_json_ingest" ->
      s"""WITH staging AS ($activityStagingSql)
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT uid) AS n_users,
                COUNT(CASE WHEN service = '' THEN 1 END) AS n_empty_service,
                COUNT(CASE WHEN length(substr(ua_browser, 1, 40)) = 40 THEN 1 END) AS n_truncated
         FROM staging GROUP BY type ORDER BY type""",
    // Single-batch replay → global suppression → the emitted key set is
    // exactly batch DISTINCT.
    "q65_streaming_dedup" ->
      """SELECT DISTINCT event_id % 500 AS did FROM events ORDER BY did""",
    // Composes the q53 repetition CTE, the q28 quality predicate, and
    // the q54 regex mirrors into one verdict row per document;
    // concat_ws skips NULL reason slots on both engines.
    "q66_curation_gate" ->
      """WITH wstats AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
                                MAX(n) AS max_word_n
                         FROM (SELECT doc_id, t, COUNT(*) AS n
                               FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                                     FROM documents) u
                               GROUP BY doc_id, t) g
                         GROUP BY doc_id),
         rep AS (SELECT doc_id,
                        max_word_n >= 2 AND max_word_n * 10 >= n_words AS repetitive
                 FROM wstats),
         qual AS (SELECT doc_id,
                         len(string_split(text, ' ')) >= 50
                         AND len(list_filter(string_split(text, ' '),
                           w -> list_contains(['the','a','of','and','to'], w))) * 10
                             >= len(string_split(text, ' ')) AS hq
                  FROM documents)
         SELECT d.doc_id,
                (NOT r.repetitive AND q.hq) AS keep,
                concat_ws(',',
                  CASE WHEN r.repetitive THEN 'repetitive' END,
                  CASE WHEN NOT q.hq THEN 'low_quality' END) AS reasons,
                len(regexp_extract_all(d.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  + len(regexp_extract_all(d.text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_pii,
                length(regexp_replace(
                  regexp_replace(d.text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_len
         FROM documents d JOIN rep r USING (doc_id) JOIN qual q USING (doc_id)
         ORDER BY d.doc_id""",
    // Per-token micro-nat quantization BEFORE the per-doc sum: integer
    // addition commutes, so both engines agree regardless of
    // aggregation order; `div`/`//` keeps the mean integral too.
    "q67_unigram_surprisal" ->
      """WITH toks AS (SELECT doc_id, t
                       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                             FROM documents) u
                       WHERE t <> ''),
         vocab AS (SELECT t, COUNT(*) AS n_w FROM toks GROUP BY t),
         tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM vocab),
         sc AS (SELECT doc_id,
                       CAST(round(-ln(CAST(n_w AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1e6)
                            AS BIGINT) AS s_micro
                FROM toks JOIN vocab USING (t) CROSS JOIN tot)
         SELECT doc_id, COUNT(*) AS n_tokens,
                CAST(SUM(s_micro) AS BIGINT) AS surprisal_micro,
                CAST(SUM(s_micro) AS BIGINT) // COUNT(*) AS mean_micro
         FROM sc GROUP BY doc_id ORDER BY doc_id""",
    // Integer RRF: 1000000 // (60 + rank) per retriever, summed —
    // no floats in the fusion, so the oracle matches exactly. Lexical
    // jaccard and cosine ranks mirror the q56/q25 oracle forms.
    "q68_hybrid_search" ->
      s"""WITH qw AS (SELECT doc_id AS qid,
                             list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                      FROM documents WHERE doc_id < 20),
         cw AS (SELECT doc_id AS id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id >= 20),
         -- ov > 0 mirrors the inverted-index feeder's retrieval
         -- contract: a doc sharing no token is not a result (identical
         -- output on the fixture, where every query has hundreds of
         -- positive matches; divergence-proof off-fixture)
         lex AS (SELECT qid, id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY jac DESC, id) AS r
                 FROM (SELECT q.qid, c.id,
                              len(list_intersect(q.ws, c.ws)) AS ov,
                              round(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
                                    CAST(len(list_distinct(q.ws || c.ws)) AS DOUBLE), 6) AS jac
                       FROM qw q CROSS JOIN cw c) t
                 WHERE ov > 0),
         lexp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM lex WHERE r <= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         vec AS (SELECT qid, id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY cos DESC, id) AS r
                 FROM (SELECT q.qid, c.id, ${cosSql("q.qvec", "c.vec")} AS cos
                       FROM q CROSS JOIN c WHERE q.qid <> c.id) t),
         vecp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM vec WHERE r <= 20),
         fused AS (SELECT qid, id, CAST(SUM(pts) AS BIGINT) AS rrf_micro
                   FROM (SELECT * FROM lexp UNION ALL SELECT * FROM vecp) u
                   GROUP BY qid, id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, rrf_micro FROM (
           SELECT qid, id, rrf_micro,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_micro DESC, id) AS rank
           FROM fused) t
         WHERE rank <= 10 ORDER BY qid, rank""",
    // q47's CTEs with the flag applied: anti-join the contaminated ids.
    "q69_decontaminate" ->
      """WITH sh AS (
           SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(length(lower(trim(text))) - 7, 1) + 1),
                   i -> substr(lower(trim(text)), CAST(i AS INTEGER), 8)))) AS word
                 FROM documents) t),
         ev AS (SELECT DISTINCT h FROM sh WHERE doc_id < 20),
         c AS (SELECT doc_id, h FROM sh WHERE doc_id >= 20),
         tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM c GROUP BY doc_id),
         shared AS (SELECT c.doc_id, COUNT(*) AS n_shared
                    FROM c JOIN ev USING (h) GROUP BY c.doc_id),
         bad AS (SELECT s.doc_id FROM shared s JOIN tot t USING (doc_id)
                 WHERE s.n_shared >= 3 AND s.n_shared * 2 >= t.n_shingles)
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM bad)
         ORDER BY doc_id""",
    // IVF×PQ: q50's assignment/probe CTEs gate WHICH (qid, id) pairs
    // the q63 ADC CTEs score; a 20-deep shortlist per query is then
    // exactly re-ranked by true squared-L2 (same left-to-right double
    // sums as graft_array_dot, same (a−b)+c association).
    "q70_ivf_pq_ann" ->
      s"""WITH sp AS (SELECT unnest(range(8)) AS sub),
         cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         cb AS (SELECT vec_id - 20 AS cid, sub,
                       embedding[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS cv
                FROM embeddings, sp WHERE vec_id BETWEEN 20 AND 35),
         cb2 AS (SELECT cid, sub, cv,
                        list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE)) AS c2
                 FROM cb),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         asg AS (SELECT id, cell FROM (
             SELECT c.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         sv AS (SELECT id, sub,
                       vec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS sv
                FROM c, sp),
         enc AS (SELECT id, sub, cid AS code FROM (
             SELECT sv.id, sv.sub, cb2.cid,
                    row_number() OVER (PARTITION BY sv.id, sv.sub
                      ORDER BY round(${dotSqlN("sv.sv", "cb2.cv", 8)} - c2 / 2, 6) DESC,
                               cb2.cid) AS rn
             FROM sv JOIN cb2 ON cb2.sub = sv.sub) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         pr AS (SELECT qid, cell FROM (
             SELECT q.qid, cen.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM q CROSS JOIN cen) t WHERE rn <= 4),
         qs AS (SELECT qid, sub,
                       qvec[(CAST(sub AS INTEGER) * 8 + 1):(CAST(sub AS INTEGER) * 8 + 8)] AS qsv
                FROM q, sp),
         qt AS (SELECT qid, cb2.sub, cid,
                       ${dotSqlN("qs.qsv", "qs.qsv", 8)}
                         - 2 * ${dotSqlN("qs.qsv", "cb2.cv", 8)} + c2 AS dd
                FROM qs JOIN cb2 ON cb2.sub = qs.sub),
         ad AS (SELECT qt.qid, e.id,
                       round(list_sum(list(dd ORDER BY e.sub)), 6) AS adist
                FROM enc e
                JOIN asg a ON a.id = e.id
                JOIN pr ON pr.cell = a.cell
                JOIN qt ON qt.sub = e.sub AND qt.cid = e.code AND qt.qid = pr.qid
                WHERE pr.qid <> e.id
                GROUP BY qt.qid, e.id),
         sl AS (SELECT qid, id FROM (
             SELECT qid, id,
                    row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rn
             FROM ad) t WHERE rn <= 20),
         rr AS (SELECT sl.qid, sl.id,
                       round(${dotSqlN("q.qvec", "q.qvec", 64)}
                             - 2 * ${dotSqlN("q.qvec", "c.vec", 64)}
                             + ${dotSqlN("c.vec", "c.vec", 64)}, 6) AS d2
                FROM sl JOIN q ON q.qid = sl.qid JOIN c ON c.id = sl.id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, d2 FROM (
           SELECT qid, id, d2,
                  row_number() OVER (PARTITION BY qid ORDER BY d2, id) AS rank
           FROM rr) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // Sharded Bloom prefilter: exact contract — identical oracle to
    // q60 (the sketch sharding changes the plan, never the answer).
    "q71_bloom_sharded_dedup" ->
      """WITH newb AS (SELECT * FROM documents WHERE doc_id % 10 >= 8),
         idx AS (SELECT DISTINCT lower(trim(text)) AS t FROM documents
                 WHERE doc_id % 10 < 8),
         k AS (SELECT MIN(doc_id) AS doc_id FROM newb GROUP BY lower(trim(text)))
         SELECT d.doc_id, d.lang, d.source
         FROM newb d JOIN k USING (doc_id)
         WHERE lower(trim(d.text)) NOT IN (SELECT t FROM idx)
         ORDER BY doc_id""",
    // BM25 over inverted-index postings. Arithmetic parity notes:
    // (1.2 + 1.0) is written as an ADDITION so both engines perform the
    // same IEEE add (the literal 2.2 could differ by 1 ulp from the
    // sum); 1 − 0.75 = 0.25 is exact so it may be a literal; per-term
    // contributions quantize to micro-points (BIGINT) before the
    // order-insensitive integer SUM; avgdl is exact because integer-
    // valued doubles sum exactly below 2^53.
    "q72_bm25_topk" ->
      """WITH qd AS (SELECT doc_id AS qid,
                            list_filter(string_split(lower(trim(text)), ' '),
                                        t -> t <> '') AS toks
                     FROM documents WHERE doc_id < 20),
         cd AS (SELECT doc_id AS id,
                       list_filter(string_split(lower(trim(text)), ' '),
                                   t -> t <> '') AS toks
                FROM documents WHERE doc_id >= 20),
         post AS (SELECT id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
                    SELECT id, len(toks) AS dl, unnest(toks) AS tok FROM cd) u
                  GROUP BY id, tok),
         dfreq AS (SELECT tok, COUNT(*) AS df FROM post GROUP BY tok),
         st AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM cd),
         qt AS (SELECT qid, unnest(list_distinct(toks)) AS tok FROM qd),
         sc AS (SELECT qt.qid, p.id,
                       CAST(round(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                            * (p.tf * (1.2 + 1.0) /
                               (p.tf + 1.2 * (0.25 + 0.75 * p.dl / st.avgdl)))
                            * 1e6) AS BIGINT) AS c_micro
                FROM post p
                JOIN qt ON qt.tok = p.tok
                JOIN dfreq d ON d.tok = p.tok
                CROSS JOIN st),
         agg AS (SELECT qid, id, CAST(SUM(c_micro) AS BIGINT) AS bm25_micro
                 FROM sc GROUP BY qid, id)
         SELECT qid, id, CAST(r AS BIGINT) AS r, bm25_micro FROM (
           SELECT qid, id, bm25_micro,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY bm25_micro DESC, id) AS r
           FROM agg) t
         WHERE r <= 20 ORDER BY qid, r""",
    // SemDeDup: q50's cell-assignment CTE over the full vector set,
    // pairwise cosine within cells only, drop any id with a lower-id
    // cell-mate at >= 0.4.
    "q73_semantic_dedup" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         losers AS (SELECT DISTINCT b.id
                    FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
                    WHERE ${cosSql("a.vec", "b.vec")} >= 0.4)
         SELECT id AS vec_id FROM c
         WHERE id NOT IN (SELECT id FROM losers)
         ORDER BY vec_id""",
    // Bottom-100-by-hash = exact-size uniform sample (13 hex chars =
    // 52 bits, exactly representable in the heap's DOUBLE score; an
    // ORDER/LIMIT oracle — the engine side uses the bounded heap).
    "q74_exact_sample" ->
      """WITH h AS (SELECT doc_id,
                           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hh
                    FROM documents),
         p AS (SELECT doc_id FROM h ORDER BY hh, doc_id LIMIT 100)
         SELECT d.doc_id, d.lang, d.source
         FROM documents d JOIN p USING (doc_id) ORDER BY d.doc_id""",
    // Stream packing: bin = tokens_before // budget per (lang) shard in
    // doc_id order — pure integer window math on both engines.
    "q75_sequence_packing" ->
      """WITH t AS (SELECT lang, doc_id,
                           len(string_split(text, ' ')) AS n_tokens
                    FROM documents),
         c AS (SELECT lang, doc_id, n_tokens,
                      SUM(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id) AS cum
               FROM t)
         SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
                CAST((cum - n_tokens) % 512 AS BIGINT) AS bin_offset
         FROM c ORDER BY lang, doc_id""",
    // Three-retriever RRF: the q72 BM25 CTEs, the q19 inverted-index
    // Jaccard CTEs, and the q68 cosine CTE feed the q68 fusion tail.
    "q76_hybrid_search_3way" ->
      s"""WITH qd AS (SELECT doc_id AS qid,
                             list_filter(string_split(lower(trim(text)), ' '),
                                         t -> t <> '') AS toks
                      FROM documents WHERE doc_id < 20),
         cd AS (SELECT doc_id AS id,
                       list_filter(string_split(lower(trim(text)), ' '),
                                   t -> t <> '') AS toks
                FROM documents WHERE doc_id >= 20),
         post AS (SELECT id, tok, COUNT(*) AS tf, MAX(dl) AS dl FROM (
                    SELECT id, len(toks) AS dl, unnest(toks) AS tok FROM cd) u
                  GROUP BY id, tok),
         dfreq AS (SELECT tok, COUNT(*) AS df FROM post GROUP BY tok),
         st AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM cd),
         qtk AS (SELECT qid, unnest(list_distinct(toks)) AS tok FROM qd),
         bsc AS (SELECT qtk.qid, p.id,
                        CAST(round(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                             * (p.tf * (1.2 + 1.0) /
                                (p.tf + 1.2 * (0.25 + 0.75 * p.dl / st.avgdl)))
                             * 1e6) AS BIGINT) AS c_micro
                 FROM post p
                 JOIN qtk ON qtk.tok = p.tok
                 JOIN dfreq d ON d.tok = p.tok
                 CROSS JOIN st),
         bagg AS (SELECT qid, id, CAST(SUM(c_micro) AS BIGINT) AS bm25_micro
                  FROM bsc GROUP BY qid, id),
         bmr AS (SELECT qid, id,
                        row_number() OVER (PARTITION BY qid
                          ORDER BY bm25_micro DESC, id) AS r
                 FROM bagg),
         bmp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM bmr WHERE r <= 20),
         qw AS (SELECT doc_id AS qid,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id < 20),
         cw AS (SELECT doc_id AS id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id >= 20),
         lsc AS (SELECT q.qid, c.id,
                        len(list_intersect(q.ws, c.ws)) AS ov,
                        round(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
                              CAST(len(q.ws) + len(c.ws)
                                   - len(list_intersect(q.ws, c.ws)) AS DOUBLE), 6) AS jac
                 FROM qw q CROSS JOIN cw c),
         lexr AS (SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY jac DESC, id) AS r
                  FROM lsc WHERE ov > 0),
         lexp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM lexr WHERE r <= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         vecr AS (SELECT qid, id,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY cos DESC, id) AS r
                  FROM (SELECT q.qid, c.id, ${cosSql("q.qvec", "c.vec")} AS cos
                        FROM q CROSS JOIN c WHERE q.qid <> c.id) t),
         vecp AS (SELECT qid, id, 1000000 // (60 + r) AS pts FROM vecr WHERE r <= 20),
         fused AS (SELECT qid, id, CAST(SUM(pts) AS BIGINT) AS rrf_micro
                   FROM (SELECT * FROM bmp UNION ALL
                         SELECT * FROM lexp UNION ALL
                         SELECT * FROM vecp) u
                   GROUP BY qid, id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, rrf_micro FROM (
           SELECT qid, id, rrf_micro,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY rrf_micro DESC, id) AS rank
           FROM fused) t
         WHERE rank <= 10 ORDER BY qid, rank""",
    // Audio modality: the oracle recomputes the deterministic encoder's
    // output from strlen/ord, exactly like q31's PPM mirror — sample i
    // is (byte(i mod len) − 128)·128, so Σ|sample| is pure integer math.
    "q77_multimodal_audio" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 50 + 10 AS n
                    FROM documents)
         SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
                CAST(n AS BIGINT) AS n_samples,
                CAST(44 + 2 * n AS BIGINT) AS byte_len,
                CAST(list_sum(list_transform(range(n),
                     i -> abs((CASE WHEN len = 0 THEN 0
                               ELSE ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))
                               END - 128) * 128)))
                     AS BIGINT) AS amp_checksum
         FROM m ORDER BY doc_id""",
    // Bottom-k sketch Jaccard: |U_k ∩ A ∩ B| / |U_k| over per-lang KMV
    // sketches (q44's bottom-k form), exact Jaccard alongside.
    "q78_corpus_overlap" ->
      """WITH w AS (SELECT DISTINCT lang,
                           ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
                    FROM (SELECT lang,
                                 unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
                          FROM documents) t),
         r AS (SELECT lang, h,
                      row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
               FROM w),
         sk AS (SELECT lang, list(h ORDER BY h) AS kmv FROM r
                WHERE rn <= 128 GROUP BY lang),
         sz AS (SELECT lang, COUNT(*) AS n FROM w GROUP BY lang),
         pr AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
                       a.kmv AS ka, b.kmv AS kb
                FROM sk a JOIN sk b ON a.lang < b.lang),
         ex AS (SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS ni
                FROM w a JOIN w b ON a.h = b.h AND a.lang < b.lang
                GROUP BY 1, 2),
         est AS (SELECT lang_a, lang_b,
                        list_sort(list_distinct(ka || kb))[1:128] AS u, ka, kb
                 FROM pr)
         SELECT e.lang_a, e.lang_b,
                round(CAST(len(list_intersect(list_intersect(e.u, e.ka), e.kb)) AS DOUBLE) /
                      CAST(len(e.u) AS DOUBLE), 6) AS sketch_jaccard,
                round(CAST(COALESCE(x.ni, 0) AS DOUBLE) /
                      CAST(sa.n + sb.n - COALESCE(x.ni, 0) AS DOUBLE), 6) AS exact_jaccard
         FROM est e
         JOIN sz sa ON sa.lang = e.lang_a
         JOIN sz sb ON sb.lang = e.lang_b
         LEFT JOIN ex x ON x.lang_a = e.lang_a AND x.lang_b = e.lang_b
         ORDER BY e.lang_a, e.lang_b""",
    // SQ8: per-dim max-|v| scales from the corpus side, symmetric int8
    // encode with floor(x+0.5) (round() halves differ across engines;
    // floor is IEEE-identical), then EXACT integer dot ranking — no
    // rounding tolerance anywhere in this oracle.
    "q79_sq_ann" ->
      """WITH dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM c, dims GROUP BY i),
         ce AS (SELECT id, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM c, sc),
         qe AS (SELECT qid, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(qvec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM q, sc),
         d AS (SELECT qid, id, CAST(SUM(qe.code * ce.code) AS BIGINT) AS idot
               FROM qe JOIN ce ON qe.i = ce.i AND qe.qid <> ce.id
               GROUP BY qid, id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, idot FROM (
           SELECT qid, id, idot,
                  row_number() OVER (PARTITION BY qid ORDER BY idot DESC, id) AS rank
           FROM d) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // C4 line dedup: the same deterministic 3-word lining transform,
    // boilerplate = line in >= 3 distinct docs, reassembly by pos.
    // string_agg skips the NULLs the CASE leaves for dropped lines.
    "q80_line_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         l AS (SELECT doc_id,
                      unnest(range(CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS pos,
                      unnest(list_transform(range(CAST(ceil(len(ws) / 3.0) AS BIGINT)),
                             i -> array_to_string(ws[CAST(i * 3 + 1 AS BIGINT):CAST(i * 3 + 3 AS BIGINT)], ' '))) AS line
               FROM w),
         b AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 3)
         SELECT l.doc_id,
                count(*) AS n_lines,
                count(*) FILTER (WHERE b.line IS NULL) AS n_kept,
                coalesce(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
                                    chr(10) ORDER BY l.pos), '') AS text
         FROM l LEFT JOIN b ON l.line = b.line
         GROUP BY l.doc_id ORDER BY l.doc_id""",
    // Duplicated 5-gram stats: gram in >= 2 distinct docs is "dup";
    // integer ppm via floor division (operands non-negative, so
    // DuckDB // == Spark div).
    "q81_dup_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id,
                      unnest(list_transform(range(len(ws) - 4),
                             i -> array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 5 AS BIGINT)], ' '))) AS gram
               FROM w WHERE len(ws) >= 5),
         d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
         SELECT g.doc_id, count(*) AS n_grams, count(d.gram) AS n_dup,
                count(d.gram) * 1000000 // count(*) AS dup_ppm
         FROM g LEFT JOIN d USING (gram)
         GROUP BY g.doc_id ORDER BY g.doc_id""",
    // Char entropy: same micro-nat contract as q67 — per distinct char
    // round(-ln(p)*1e6) quantizes BEFORE the weighted sum; floor
    // division on non-negative integers matches Spark's div.
    "q82_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
                            unnest(list_transform(range(length(text)),
                                   i -> substr(text, CAST(i AS INTEGER) + 1, 1))) AS c
                     FROM documents WHERE length(text) > 0),
         cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
         nn AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM cc GROUP BY doc_id),
         t AS (SELECT cc.doc_id, cnt, n,
                      CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS term
               FROM cc JOIN nn USING (doc_id))
         SELECT doc_id, max(n) AS n_chars, count(*) AS n_distinct,
                CAST(sum(cnt * term) AS BIGINT) // max(n) AS entropy_micro
         FROM t GROUP BY doc_id ORDER BY doc_id""",
    // Hashed linear scorer: same 60-bit md5 bucket, same Knuth
    // multiplicative weight, all-integer. score may be negative, and
    // both engines' integer division (Spark div, DuckDB //) TRUNCATES
    // toward zero, so mean_milli agrees exactly.
    "q83_hashed_quality" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id)
         SELECT doc_id, n_tokens, score,
                (score * 1000) // n_tokens AS mean_milli,
                score >= 0 AS keep
         FROM s ORDER BY doc_id""",
    // Deterministic shuffle: salted 52-bit hash, shard = h % 8, pos =
    // rank of (h, id) within the shard.
    "q84_shuffle_assign" ->
      """WITH h AS (SELECT doc_id,
                           ('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hh
                    FROM documents)
         SELECT doc_id, hh % 8 AS shard,
                CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
         FROM h ORDER BY shard, pos""",
    // Audio frames: rebuild the generator's samples from the text
    // (the q77 contract), then 8-sample frames at hop 4 — ceil(n/4)
    // frames, ragged tail kept; list_position gives the FIRST index of
    // the max (ties -> lowest frame, matching the Scala fold).
    "q85_audio_frames" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 50 + 10 AS n
                    FROM documents),
         e AS (SELECT doc_id, n,
                      list_transform(range((n + 3) // 4),
                        f -> list_sum(list_transform(range(least(8, n - f * 4)),
                               j -> CAST((CASE WHEN len = 0 THEN 0
                                          ELSE ord(substr(text, CAST((f * 4 + j) % len AS INTEGER) + 1, 1))
                                          END - 128) * 128 AS BIGINT)
                                    * CAST((CASE WHEN len = 0 THEN 0
                                            ELSE ord(substr(text, CAST((f * 4 + j) % len AS INTEGER) + 1, 1))
                                            END - 128) * 128 AS BIGINT)))) AS en,
                      list_sum(list_transform(range(n),
                        i -> CAST((CASE WHEN len = 0 THEN 0
                                   ELSE ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))
                                   END - 128) * 128 AS BIGINT)
                             * CAST((CASE WHEN len = 0 THEN 0
                                     ELSE ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))
                                     END - 128) * 128 AS BIGINT))) AS tot
               FROM m)
         SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
                CAST((n + 3) // 4 AS BIGINT) AS n_frames,
                CAST(list_max(en) AS BIGINT) AS max_frame_energy,
                CAST(list_position(en, list_max(en)) - 1 AS BIGINT) AS max_frame_idx,
                CAST(tot AS BIGINT) AS total_energy
         FROM e ORDER BY doc_id""",
    // Stratified exact sample: bottom-20-by-salted-hash per language
    // (the q74 convention, per stratum).
    "q86_stratified_sample" ->
      """WITH h AS (SELECT doc_id, lang,
                           ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS hh
                    FROM documents),
         p AS (SELECT doc_id, lang FROM (
                 SELECT doc_id, lang,
                        row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
                 FROM h) t WHERE rn <= 20)
         SELECT doc_id, lang FROM p ORDER BY doc_id""",
    // Bigram surprisal: MLE P(w2|w1) with context counts summed over
    // the bigram vocabulary; q67's micro-nat quantization.
    "q87_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         b AS (SELECT doc_id,
                      unnest(list_transform(range(len(ws) - 1), i -> ws[CAST(i + 1 AS BIGINT)])) AS w1,
                      unnest(list_transform(range(len(ws) - 1), i -> ws[CAST(i + 2 AS BIGINT)])) AS w2
               FROM w WHERE len(ws) >= 2),
         cnt AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
         ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM cnt GROUP BY w1),
         model AS (SELECT cnt.w1, cnt.w2,
                          CAST(round(-ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1e6) AS BIGINT) AS s
                   FROM cnt JOIN ctx USING (w1))
         SELECT b.doc_id, count(*) AS n_bigrams,
                CAST(sum(s) AS BIGINT) AS surprisal_micro,
                CAST(sum(s) AS BIGINT) // count(*) AS mean_micro
         FROM b JOIN model USING (w1, w2)
         GROUP BY b.doc_id ORDER BY b.doc_id""",
    // Filtered ANN: the corpus PRE-filters on the doc predicate
    // (exact recall over the allowed set), then q25's cosine ranking.
    "q88_filtered_ann" ->
      s"""WITH a AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
               JOIN a ON vec_id = doc_id WHERE vec_id >= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // IVF×SQ8: q70's cell assignment + probes, q79's scales + int8
    // codes + exact integer dot for the shortlist, q70's exact-L2
    // re-rank on the survivors.
    "q89_ivf_sq_ann" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM c, dims GROUP BY i),
         ce AS (SELECT id, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(vec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM c, sc),
         qe AS (SELECT qid, sc.i,
                       CASE WHEN s <= 0 THEN 0
                            ELSE CAST(greatest(-127, least(127,
                              floor(CAST(qvec[sc.i + 1] AS DOUBLE) / s * 127 + 0.5))) AS BIGINT)
                       END AS code
                FROM q, sc),
         asg AS (SELECT id, cell FROM (
             SELECT c.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         pr AS (SELECT qid, cell FROM (
             SELECT q.qid, cen.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM q CROSS JOIN cen) t WHERE rn <= 4),
         idot AS (SELECT qe.qid, ce.id, CAST(SUM(qe.code * ce.code) AS BIGINT) AS idot
                  FROM qe JOIN ce ON qe.i = ce.i
                  JOIN asg ON asg.id = ce.id
                  JOIN pr ON pr.qid = qe.qid AND pr.cell = asg.cell
                  WHERE qe.qid <> ce.id
                  GROUP BY qe.qid, ce.id),
         sl AS (SELECT qid, id FROM (
             SELECT qid, id,
                    row_number() OVER (PARTITION BY qid ORDER BY idot DESC, id) AS rn
             FROM idot) t WHERE rn <= 20),
         rr AS (SELECT sl.qid, sl.id,
                       round(${dotSqlN("q.qvec", "q.qvec", 64)}
                             - 2 * ${dotSqlN("q.qvec", "c.vec", 64)}
                             + ${dotSqlN("c.vec", "c.vec", 64)}, 6) AS d2
                FROM sl JOIN q ON q.qid = sl.qid JOIN c ON c.id = sl.id)
         SELECT qid, CAST(rank AS BIGINT) AS rank, id, d2 FROM (
           SELECT qid, id, d2,
                  row_number() OVER (PARTITION BY qid ORDER BY d2, id) AS rank
           FROM rr) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    // Mixture plan: closed-form per-source targets, ceiling keep-rate,
    // salted hash gate — all-integer, truncating division on both
    // engines (operands non-negative here).
    "q90_mixture_plan" ->
      """WITH t AS (SELECT DISTINCT source AS src,
                           5 + ('0x' || substr(md5(source), 1, 15))::BIGINT % 16 AS target_n
                    FROM documents),
         c AS (SELECT source AS src, count(*) AS n_docs FROM documents GROUP BY source),
         r AS (SELECT c.src, n_docs,
                      coalesce(target_n, CAST(0 AS BIGINT)) AS target_n,
                      least(CAST(1000 AS BIGINT),
                            (coalesce(target_n, CAST(0 AS BIGINT)) * 1000 + n_docs - 1) // n_docs) AS rate_permille
               FROM c LEFT JOIN t USING (src)),
         s AS (SELECT source AS src, count(*) AS n_sampled
               FROM documents d JOIN r ON r.src = d.source
               WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < rate_permille
               GROUP BY source)
         SELECT r.src, n_docs, target_n, rate_permille,
                coalesce(n_sampled, CAST(0 AS BIGINT)) AS n_sampled
         FROM r LEFT JOIN s USING (src) ORDER BY r.src""",
    // IVF audit: q89's cosine cell assignment; per-row squared-L2 to
    // the assigned centroid quantized to integer micro units BEFORE
    // the per-cell sum (the q67 commuting contract).
    "q91_ivf_audit" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         asg AS (SELECT id, cell FROM (
             SELECT c.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         d AS (SELECT asg.cell,
                      CAST(round((${dotSqlN("c.vec", "c.vec", 64)}
                                  - 2 * ${dotSqlN("c.vec", "cen.cvec", 64)}
                                  + ${dotSqlN("cen.cvec", "cen.cvec", 64)}) * 1e6) AS BIGINT) AS d2u
               FROM asg JOIN c ON c.id = asg.id JOIN cen ON cen.cid = asg.cell),
         g AS (SELECT cell, count(*) AS n_vectors,
                      CAST(sum(d2u) AS BIGINT) AS sum_d2_micro,
                      CAST(sum(d2u) AS BIGINT) // count(*) AS mean_d2_micro
               FROM d GROUP BY cell)
         SELECT cen.cid AS cell,
                coalesce(n_vectors, CAST(0 AS BIGINT)) AS n_vectors,
                coalesce(sum_d2_micro, CAST(0 AS BIGINT)) AS sum_d2_micro,
                coalesce(mean_d2_micro, CAST(0 AS BIGINT)) AS mean_d2_micro
         FROM cen LEFT JOIN g ON g.cell = cen.cid ORDER BY cell""",
    // Streaming quality gate: the stateless map-only scorer must emit
    // exactly the batch scorer's rows — q83's oracle minus its mean.
    "q92_streaming_quality" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id)
         SELECT doc_id, n_tokens, score, score >= 0 AS keep
         FROM s ORDER BY doc_id""",
    // Winnowing: word 4-gram hashes, min per 4-hash window, distinct
    // set per doc; shared = fingerprint in >= 2 distinct docs.
    "q93_winnowing" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id, len(ws) - 3 AS m,
                      list_transform(range(len(ws) - 3),
                        i -> ('0x' || substr(md5(array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 4 AS BIGINT)], ' ')), 1, 15))::BIGINT) AS gh
               FROM w WHERE len(ws) >= 4),
         f AS (SELECT doc_id, m, greatest(m - 3, 1) AS nw,
                      list_distinct(list_transform(range(greatest(m - 3, 1)),
                        j -> list_min(gh[CAST(j + 1 AS BIGINT):CAST(j + 4 AS BIGINT)]))) AS fps
               FROM g),
         e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
         sh AS (SELECT fp FROM e GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
         sc AS (SELECT e.doc_id, count(*) AS cnt
                FROM e JOIN sh USING (fp) GROUP BY e.doc_id)
         SELECT f.doc_id, CAST(m AS BIGINT) AS n_grams,
                CAST(nw AS BIGINT) AS n_windows,
                CAST(len(fps) AS BIGINT) AS n_fp,
                CAST(coalesce(cnt, 0) AS BIGINT) AS n_shared_fp
         FROM f LEFT JOIN sc USING (doc_id)
         ORDER BY f.doc_id""",
    // Packing split: the q75 window plus head/tail integer math
    // (head = min(n, budget - offset); tail spills into bin+1).
    "q94_packing_split" ->
      """WITH t AS (SELECT lang, doc_id,
                           len(string_split(text, ' ')) AS n_tokens
                    FROM documents
                    WHERE len(string_split(text, ' ')) <= 512),
         c AS (SELECT lang, doc_id, n_tokens,
                      SUM(n_tokens) OVER (PARTITION BY lang
                        ORDER BY doc_id) AS cum
               FROM t),
         p AS (SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                      CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
                      CAST((cum - n_tokens) % 512 AS BIGINT) AS bin_offset
               FROM c)
         SELECT lang, doc_id, n_tokens, bin, bin_offset,
                least(n_tokens, 512 - bin_offset) AS head_tokens,
                n_tokens - least(n_tokens, 512 - bin_offset) AS tail_tokens
         FROM p ORDER BY lang, doc_id""",
    // Training manifest: q83's gate, q20's min-id dedup over the kept
    // set, q61's chunk-count formula (32/32), q75's packing window at
    // budget 64 plus the q94 split — one composed oracle.
    "q95_training_manifest" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         fw AS (SELECT doc_id,
                       (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
                FROM tk WHERE tok <> ''),
         kept AS (SELECT doc_id FROM fw GROUP BY doc_id HAVING CAST(sum(w) AS BIGINT) >= 0),
         surv AS (SELECT MIN(doc_id) AS doc_id FROM documents
                  WHERE doc_id IN (SELECT doc_id FROM kept)
                  GROUP BY lower(trim(text))),
         d AS (SELECT dd.doc_id, dd.lang,
                      len(string_split(dd.text, ' ')) AS n
               FROM documents dd JOIN surv USING (doc_id)),
         ch AS (SELECT doc_id, lang, n,
                       unnest(range(1 + CAST(ceil(greatest(n - 32, 0) / 32.0) AS BIGINT))) AS chunk_idx
                FROM d),
         cc AS (SELECT lang, doc_id * 100000 + chunk_idx AS chunk_id, doc_id, chunk_idx,
                       least(32, n - chunk_idx * 32) AS n_tokens
                FROM ch),
         cm AS (SELECT lang, chunk_id, doc_id, chunk_idx, n_tokens,
                       SUM(n_tokens) OVER (PARTITION BY lang ORDER BY chunk_id) AS cum
                FROM cc),
         p AS (SELECT lang, chunk_id, doc_id, chunk_idx,
                      CAST(n_tokens AS BIGINT) AS n_tokens,
                      CAST((cum - n_tokens) // 64 AS BIGINT) AS bin,
                      CAST((cum - n_tokens) % 64 AS BIGINT) AS bin_offset
               FROM cm)
         SELECT lang, chunk_id, doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                n_tokens, bin, bin_offset,
                least(n_tokens, 64 - bin_offset) AS head_tokens,
                n_tokens - least(n_tokens, 64 - bin_offset) AS tail_tokens
         FROM p ORDER BY lang, chunk_id""",
    // Semantic contamination: q25's exact cosine ranking at k=1 with
    // the q24 near-dup flag.
    "q96_semantic_contamination" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, id AS nearest_id, cos, cos >= 0.4 AS contaminated FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank = 1 ORDER BY qid""",
    // Data card: doc facts + exploded-token facts per lang, integer
    // milli-mean (non-negative, so // == div).
    "q97_data_card" ->
      """WITH df AS (SELECT lang, count(*) AS n_docs,
                            count(DISTINCT lower(trim(text))) AS n_distinct_texts,
                            count(DISTINCT source) AS n_sources,
                            CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
                     FROM documents GROUP BY lang),
         tf AS (SELECT lang, count(DISTINCT t) AS distinct_words
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents) x
                WHERE t <> '' GROUP BY lang)
         SELECT df.lang, n_docs,
                n_docs - n_distinct_texts AS n_exact_dups,
                n_sources, total_tokens,
                total_tokens * 1000 // n_docs AS mean_tokens_milli,
                distinct_words
         FROM df JOIN tf USING (lang) ORDER BY df.lang""",
    // Snapshot diff: digest-compare full-outer join over the two
    // deterministically derived snapshots; non-unchanged rows only.
    "q98_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h_old
                    FROM documents WHERE doc_id % 10 <> 3),
         n AS (SELECT doc_id,
                      md5(CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                               ELSE text END) AS h_new
               FROM documents WHERE doc_id % 10 <> 7),
         d AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                      CASE WHEN h_old IS NULL THEN 'added'
                           WHEN h_new IS NULL THEN 'removed'
                           WHEN h_old <> h_new THEN 'changed'
                           ELSE 'unchanged' END AS status
               FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         SELECT doc_id, status FROM d
         WHERE status <> 'unchanged' ORDER BY doc_id""",
    // Matryoshka: cosine in the first 16 dims (slice is 1-based
    // inclusive in both engines; norms over the SLICED arrays), each
    // truncated hit flagged against the full-64-dim top-5.
    "q99_matryoshka_ann" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         ts AS (SELECT qid, id,
                       round(${dotSqlN("qvec", "vec", 16)} /
                         (sqrt(${dotSqlN("qvec", "qvec", 16)}) *
                          sqrt(${dotSqlN("vec", "vec", 16)})), 6) AS cos
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
                t.cos AS cos_trunc,
                CAST(CASE WHEN f.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                  AS in_full_topk
         FROM tr t LEFT JOIN fs f ON t.qid = f.qid AND t.id = f.id
         WHERE t.rank <= 5 ORDER BY t.qid, t.rank""",
    // Length buckets: pow-2 CASE chain, salted-52-bit shard, in-shard
    // row_number packing — all integer, both engines identical.
    "q100_length_buckets" ->
      """WITH t AS (SELECT doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                           ('0x' || substr(md5('lb:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 4 AS shard
                    FROM documents),
         b AS (SELECT doc_id, n_tokens, shard,
                      CASE WHEN n_tokens <= 16 THEN 16
                           WHEN n_tokens <= 32 THEN 32
                           WHEN n_tokens <= 64 THEN 64
                           WHEN n_tokens <= 128 THEN 128
                           WHEN n_tokens <= 256 THEN 256
                           ELSE 512 END AS bucket_len
               FROM t)
         SELECT doc_id, n_tokens, CAST(bucket_len AS BIGINT) AS bucket_len,
                CAST(shard AS BIGINT) AS shard,
                CAST((row_number() OVER (PARTITION BY bucket_len, shard
                       ORDER BY doc_id) - 1) // 8 AS BIGINT) AS batch,
                CAST(bucket_len - least(n_tokens, bucket_len) AS BIGINT) AS pad_tokens
         FROM b ORDER BY doc_id""",
    // Containment: distinct word-3-gram sets, df-capped postings
    // self-join, integer-ppm containment both directions; gram
    // identity (string here ≡ 60-bit md5 on the Spark side, the q81
    // convention).
    "q101_containment_pairs" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT DISTINCT doc_id, gram FROM (
                 SELECT doc_id,
                        unnest(list_transform(range(len(ws) - 2),
                          i -> array_to_string(ws[CAST(i + 1 AS BIGINT):CAST(i + 3 AS BIGINT)], ' '))) AS gram
                 FROM w WHERE len(ws) >= 3) x),
         sz AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
         dfc AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 100),
         r AS (SELECT g.doc_id, g.gram FROM g JOIN dfc USING (gram)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      count(*) AS n_shared
               FROM r a JOIN r b ON a.gram = b.gram AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
         SELECT id_a, id_b, n_shared, sa.ng AS na, sb.ng AS nb,
                n_shared * 1000000 // sa.ng AS cont_a_ppm,
                n_shared * 1000000 // sb.ng AS cont_b_ppm
         FROM p JOIN sz sa ON p.id_a = sa.doc_id
                JOIN sz sb ON p.id_b = sb.doc_id
         WHERE greatest(n_shared * 1000000 // sa.ng,
                        n_shared * 1000000 // sb.ng) >= 300000
         ORDER BY id_a, id_b""",
    // Score calibration: within-source integer-ppm percentile with
    // (score, doc_id) tie-break; single-member sources -> 0.
    "q102_score_calibration" ->
      """WITH t AS (SELECT doc_id, source,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS score
                    FROM documents),
         r AS (SELECT doc_id, source, score,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY score, doc_id) AS BIGINT) AS rk,
                      CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
               FROM t)
         SELECT doc_id, source, score,
                CASE WHEN n = 1 THEN 0
                     ELSE (rk - 1) * 1000000 // (n - 1) END AS pct_ppm
         FROM r ORDER BY doc_id""",
    // LSH index delta: q98's digest diff picks the delta docs, then
    // raw (uncapped) 64-hash/4-band MinHash keys — del from OLD text,
    // ins from NEW text. Same signature algebra as the q21 fragment.
    "q103_lsh_index_delta" ->
      s"""WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3),
         nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7),
         st AS (SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
                       CASE WHEN o.doc_id IS NULL THEN 'added'
                            WHEN nw.doc_id IS NULL THEN 'removed'
                            WHEN md5(o.text) <> md5(nw.text) THEN 'changed'
                            ELSE 'unchanged' END AS status
                FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id),
         dd AS (SELECT 'del' AS op, o.doc_id, o.text
                FROM o JOIN st USING (doc_id)
                WHERE status IN ('removed', 'changed')
                UNION ALL
                SELECT 'ins' AS op, nw.doc_id, nw.text
                FROM nw JOIN st USING (doc_id)
                WHERE status IN ('added', 'changed')),
         w AS (SELECT op, doc_id,
                      unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
               FROM dd),
         hb AS (SELECT op, doc_id,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT % 2147483647 AS h
                FROM w),
         hs AS (SELECT op, doc_id, c.i AS i,
                       MIN((h * c.a + c.b) % 2147483647) AS sig
                FROM hb CROSS JOIN (VALUES ${minHashCoeffsSql(64)}) AS c(i, a, b)
                GROUP BY op, doc_id, c.i),
         bands AS (SELECT op, doc_id, i // 16 AS band,
                          string_agg(CAST(sig AS VARCHAR), '|' ORDER BY i) AS key
                   FROM hs GROUP BY op, doc_id, (i // 16))
         SELECT op, doc_id AS id, CAST(band AS BIGINT) AS band, key
         FROM bands ORDER BY op, id, band""",
    // Signal correlations: exact integer sums, closed-form Pearson in
    // double with the SAME expression shape as the Scala side;
    // zero-variance guard -> NULL.
    "q104_signal_correlations" ->
      """WITH t AS (SELECT CAST(n_chars AS BIGINT) AS a,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS b,
                           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS c
                    FROM documents),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(a) AS DOUBLE) AS sa, CAST(sum(a*a) AS DOUBLE) AS ssa,
                      CAST(sum(b) AS DOUBLE) AS sb, CAST(sum(b*b) AS DOUBLE) AS ssb,
                      CAST(sum(c) AS DOUBLE) AS sc, CAST(sum(c*c) AS DOUBLE) AS ssc,
                      CAST(sum(a*b) AS DOUBLE) AS sab,
                      CAST(sum(a*c) AS DOUBLE) AS sac,
                      CAST(sum(b*c) AS DOUBLE) AS sbc
               FROM t)
         SELECT sig_a, sig_b, corr FROM (
           SELECT 'n_chars' AS sig_a, 'n_tokens' AS sig_b,
                  CASE WHEN (n*ssa - sa*sa) * (n*ssb - sb*sb) > 0
                       THEN round((n*sab - sa*sb) /
                              sqrt((n*ssa - sa*sa) * (n*ssb - sb*sb)), 6)
                       ELSE NULL END AS corr
           FROM s
           UNION ALL
           SELECT 'n_chars', 'n_distinct',
                  CASE WHEN (n*ssa - sa*sa) * (n*ssc - sc*sc) > 0
                       THEN round((n*sac - sa*sc) /
                              sqrt((n*ssa - sa*sa) * (n*ssc - sc*sc)), 6)
                       ELSE NULL END
           FROM s
           UNION ALL
           SELECT 'n_tokens', 'n_distinct',
                  CASE WHEN (n*ssb - sb*sb) * (n*ssc - sc*sc) > 0
                       THEN round((n*sbc - sb*sc) /
                              sqrt((n*ssb - sb*sb) * (n*ssc - sc*sc)), 6)
                       ELSE NULL END
           FROM s) x
         ORDER BY sig_a, sig_b""",
    // Keep-best near-dup dedup: q57's recursive-CTE closure, but the
    // per-component keeper is argmax(token count) with min-id tiebreak.
    "q105_neardup_keep_best" ->
      s"""WITH RECURSIVE ${nearDupComponentsSql},
         q AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS qual
               FROM sdocs),
         losers AS (SELECT d AS doc_id FROM (
             SELECT comp.d,
                    row_number() OVER (PARTITION BY comp.label
                      ORDER BY q.qual DESC, comp.d) AS rn
             FROM comp JOIN q ON q.doc_id = comp.d) t
           WHERE rn > 1)
         SELECT doc_id, lang, source FROM sdocs
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         ORDER BY doc_id""",
    // Contamination spans: positional word 3-grams, eval = doc_id<20;
    // maximal runs via the gaps-and-islands identity; a run of r grams
    // spans r + 2 tokens. Only contaminated docs (n_hit > 0) emit.
    "q106_contamination_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                      ('0x' || substr(md5(array_to_string(
                        ws[CAST(pos + 1 AS BIGINT):CAST(pos + 3 AS BIGINT)], ' ')),
                        1, 15))::BIGINT AS gh
               FROM (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS pos
                     FROM w WHERE len(ws) >= 3)),
         ev AS (SELECT DISTINCT gh FROM g WHERE doc_id < 20),
         cg AS (SELECT doc_id, pos, gh FROM g WHERE doc_id >= 20),
         hit AS (SELECT cg.doc_id, cg.pos FROM cg JOIN ev USING (gh)),
         isl AS (SELECT doc_id,
                        pos - row_number() OVER (PARTITION BY doc_id
                          ORDER BY pos) AS grp
                 FROM hit),
         runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run
                  FROM isl GROUP BY doc_id, grp),
         agg AS (SELECT doc_id, max(run) AS max_run,
                        CAST(sum(run) AS BIGINT) AS n_hit
                 FROM runs GROUP BY doc_id),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
                 FROM cg GROUP BY doc_id)
         SELECT t.doc_id, t.n_grams, a.n_hit, a.max_run,
                a.max_run + 2 AS span_tokens
         FROM tot t JOIN agg a USING (doc_id)
         ORDER BY t.doc_id""",
    // Fractional upsampling: ceil-ppm rate per source; each doc emits
    // rate//1e6 whole copies + 1 iff its 'up:'-salted hash bucket is
    // under rate%1e6. range(n) unnest mirrors Spark's sequence explode.
    "q107_upsample" ->
      """WITH c AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS n
                    FROM documents GROUP BY source),
         t AS (SELECT src,
                      (n * (2 * (('0x' || substr(md5(src), 1, 15))::BIGINT % 3) + 1)) // 2 AS target_n
               FROM c),
         r AS (SELECT c.src,
                      (coalesce(t.target_n, 0) * 1000000 + n - 1) // n AS rate_ppm
               FROM c LEFT JOIN t USING (src)),
         d AS (SELECT doc_id, source,
                      ('0x' || substr(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS b
               FROM documents),
         nc AS (SELECT doc_id, d.source,
                       rate_ppm // 1000000 +
                         CASE WHEN b < rate_ppm % 1000000 THEN 1 ELSE 0 END AS n_copies
                FROM d JOIN r ON r.src = d.source)
         SELECT doc_id, source, CAST(unnest(range(n_copies)) AS BIGINT) AS copy
         FROM nc WHERE n_copies >= 1
         ORDER BY doc_id, copy""",
    // Zipf audit: top-100 vocab by (freq DESC, token ASC); ln(rank)/
    // ln(freq) quantized to integer micro-nats before the regression
    // sums; closed-form slope/intercept/r2 in double, round 6.
    "q108_zipf_audit" ->
      """WITH v AS (SELECT t, CAST(count(*) AS BIGINT) AS n_w
                    FROM (SELECT unnest(string_split(text, ' ')) AS t
                          FROM documents) x
                    WHERE t <> '' GROUP BY t
                    ORDER BY n_w DESC, t LIMIT 100),
         q AS (SELECT CAST(round(ln(CAST(row_number() OVER
                        (ORDER BY n_w DESC, t) AS DOUBLE)) * 1e6) AS BIGINT) AS x,
                      CAST(round(ln(CAST(n_w AS DOUBLE)) * 1e6) AS BIGINT) AS y
               FROM v),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x*x) AS BIGINT) AS sxx,
                      CAST(sum(y*y) AS BIGINT) AS syy,
                      CAST(sum(x*y) AS BIGINT) AS sxy
               FROM q)
         SELECT n AS n_terms,
                CASE WHEN CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                     THEN round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
                            (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx), 6)
                     ELSE NULL END AS slope,
                CASE WHEN CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                     THEN round((CAST(sy AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sxy) /
                            (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) / 1e6, 6)
                     ELSE NULL END AS intercept,
                CASE WHEN CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                      AND CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy > 0
                     THEN round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) *
                                (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) /
                            ((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) *
                             (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)), 6)
                     ELSE NULL END AS r2
         FROM s""",
    // Ranking metrics: q26's SRP bucketing and retriever pair at k=10;
    // recall@10 in ppm, reciprocal rank of the first relevant hit in
    // micro units — all integer division.
    "q109_ranking_metrics" ->
      s"""WITH vb AS (SELECT vec_id, b,
                list_sum(list_transform(range(64), d ->
                  embedding[CAST(d + 1 AS INTEGER)]::DOUBLE *
                  (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                        THEN 1.0 ELSE -1.0 END))) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(6)) AS b)),
         bk AS (SELECT vec_id,
                       CAST(SUM(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(b AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM vb GROUP BY vec_id),
         q AS (SELECT e.vec_id AS qid, e.embedding AS qvec, bk.bucket AS qbucket
               FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 20),
         c AS (SELECT e.vec_id AS id, e.embedding AS vec, bk.bucket
               FROM embeddings e JOIN bk ON e.vec_id = bk.vec_id),
         exact AS (SELECT qid, id FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id) t WHERE r <= 10),
         lsh AS (SELECT qid, id, r FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id AND qbucket = bucket) t WHERE r <= 10),
         hits AS (SELECT l.qid, CAST(count(*) AS BIGINT) AS n_hits,
                         CAST(min(l.r) AS BIGINT) AS first_r
                  FROM lsh l JOIN exact x ON l.qid = x.qid AND l.id = x.id
                  GROUP BY l.qid)
         SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits,
                COALESCE(h.n_hits, 0) * 1000000 // 10 AS recall_ppm,
                COALESCE(1000000 // h.first_r, 0) AS rr_micro
         FROM q LEFT JOIN hits h ON q.qid = h.qid
         ORDER BY q.qid""",
    // Rare-token scrub: document frequency per token; df < 2 masks to
    // <unk>; string_agg ORDER BY pos mirrors the collect-sort-join
    // reassembly.
    "q110_rare_token_scrub" ->
      """WITH tk AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                            ws[CAST(pos + 1 AS BIGINT)] AS tok
                     FROM (SELECT doc_id, string_split(text, ' ') AS ws,
                                  unnest(range(len(ws))) AS pos
                           FROM documents)),
         r AS (SELECT tok FROM tk GROUP BY tok
               HAVING count(DISTINCT doc_id) < 2),
         o AS (SELECT tk.doc_id, tk.pos,
                      CASE WHEN r.tok IS NOT NULL THEN '<unk>' ELSE tk.tok END AS tok2,
                      CASE WHEN r.tok IS NOT NULL THEN 1 ELSE 0 END AS sc
               FROM tk LEFT JOIN r USING (tok))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(sc) AS BIGINT) AS n_scrubbed,
                string_agg(tok2, ' ' ORDER BY pos) AS text
         FROM o GROUP BY doc_id ORDER BY doc_id""",
    // Centroid drift: micro-unit quantized per-(label, dim) integer
    // sums; cos(sum) = cos(mean); dims summed left-to-right in double.
    "q111_centroid_drift" ->
      """WITH o AS (SELECT label, embedding FROM embeddings WHERE vec_id % 10 <> 3),
         nw AS (SELECT label, embedding FROM embeddings WHERE vec_id % 10 <> 7),
         oq AS (SELECT label, d,
                       CAST(sum(CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
                FROM o CROSS JOIN (SELECT unnest(range(64)) AS d)
                GROUP BY label, d),
         nq AS (SELECT label, d,
                       CAST(sum(CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE * 1e6) AS BIGINT)) AS BIGINT) AS s
                FROM nw CROSS JOIN (SELECT unnest(range(64)) AS d)
                GROUP BY label, d),
         oa AS (SELECT label, list(s ORDER BY d) AS so FROM oq GROUP BY label),
         na AS (SELECT label, list(s ORDER BY d) AS sn FROM nq GROUP BY label),
         oc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_old FROM o GROUP BY label),
         nc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_new FROM nw GROUP BY label)
         SELECT oc.label AS grp, n_old, n_new,
                CASE WHEN list_sum(list_transform(range(64), i ->
                            so[CAST(i + 1 AS INTEGER)]::DOUBLE * so[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                      AND list_sum(list_transform(range(64), i ->
                            sn[CAST(i + 1 AS INTEGER)]::DOUBLE * sn[CAST(i + 1 AS INTEGER)]::DOUBLE)) > 0
                     THEN round(
                       list_sum(list_transform(range(64), i ->
                         so[CAST(i + 1 AS INTEGER)]::DOUBLE * sn[CAST(i + 1 AS INTEGER)]::DOUBLE)) /
                       (sqrt(list_sum(list_transform(range(64), i ->
                          so[CAST(i + 1 AS INTEGER)]::DOUBLE * so[CAST(i + 1 AS INTEGER)]::DOUBLE))) *
                        sqrt(list_sum(list_transform(range(64), i ->
                          sn[CAST(i + 1 AS INTEGER)]::DOUBLE * sn[CAST(i + 1 AS INTEGER)]::DOUBLE)))), 6)
                     ELSE NULL END AS centroid_cos
         FROM oc JOIN oa USING (label) JOIN na USING (label) JOIN nc USING (label)
         ORDER BY grp""",
    // Dup-span scrub: positions covered by a >=2-distinct-doc 5-gram
    // are removed; docs reassembled from survivors (gram compared by
    // STRING here vs 60-bit md5 hash in Spark — same classification,
    // the q81 adjudication).
    "q112_dup_span_scrub" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         tk AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                       ws[CAST(pos + 1 AS BIGINT)] AS tok
                FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS pos FROM w)),
         g AS (SELECT doc_id, CAST(s AS BIGINT) AS s,
                      array_to_string(ws[CAST(s + 1 AS BIGINT):CAST(s + 5 AS BIGINT)], ' ') AS gram
               FROM (SELECT doc_id, ws, unnest(range(len(ws) - 4)) AS s
                     FROM w WHERE len(ws) >= 5)),
         d AS (SELECT gram FROM g GROUP BY gram
               HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT g.doc_id, g.s + u.i AS pos
                 FROM g JOIN d USING (gram)
                 CROSS JOIN (SELECT CAST(unnest(range(5)) AS BIGINT) AS i) u),
         o AS (SELECT tk.doc_id, tk.pos, tk.tok,
                      (cov.pos IS NOT NULL) AS cv
               FROM tk LEFT JOIN cov
                 ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(count(CASE WHEN cv THEN 1 END) AS BIGINT) AS n_removed,
                coalesce(string_agg(CASE WHEN NOT cv THEN tok END,
                                    ' ' ORDER BY pos), '') AS text
         FROM o GROUP BY doc_id ORDER BY doc_id""",
    // DSIR weights: per-bucket micro-nat log ratios quantize BEFORE
    // the per-doc integer sum; keep is a sign test (no negative
    // integer division — Spark div truncates, DuckDB // floors).
    "q113_dsir_weights" ->
      """WITH tk AS (SELECT doc_id,
                            ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
                     FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     WHERE tok <> ''),
         tt AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
                FROM (SELECT unnest(string_split(text, ' ')) AS tok
                      FROM documents WHERE lang = 'en')
                WHERE tok <> ''),
         rc AS (SELECT b, count(*) AS n_raw FROM tk GROUP BY b),
         tc AS (SELECT b, count(*) AS n_tgt FROM tt GROUP BY b),
         j AS (SELECT coalesce(rc.b, tc.b) AS b,
                      coalesce(n_raw, 0) AS n_raw, coalesce(n_tgt, 0) AS n_tgt
               FROM rc FULL JOIN tc ON rc.b = tc.b),
         tot AS (SELECT CAST(sum(n_raw) AS BIGINT) AS t_raw,
                        CAST(sum(n_tgt) AS BIGINT) AS t_tgt FROM j),
         wt AS (SELECT b,
                       CAST(round(ln(
                         (CAST(n_tgt + 1 AS DOUBLE) / CAST(t_tgt + 1024 AS DOUBLE)) /
                         (CAST(n_raw + 1 AS DOUBLE) / CAST(t_raw + 1024 AS DOUBLE))) * 1e6)
                         AS BIGINT) AS w
                FROM j CROSS JOIN tot)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(w) AS BIGINT) AS logratio_micro,
                (sum(w) >= 0) AS keep
         FROM tk JOIN wt USING (b) GROUP BY doc_id ORDER BY doc_id""",
    // CCNet buckets: q67's surprisal mean -> q102's per-group ppm
    // percentile (group = lang) -> integer third cuts; head = lowest.
    "q114_ccnet_buckets" ->
      """WITH toks AS (SELECT doc_id, t
                       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                             FROM documents) u
                       WHERE t <> ''),
         vocab AS (SELECT t, COUNT(*) AS n_w FROM toks GROUP BY t),
         tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_total FROM vocab),
         sc AS (SELECT doc_id,
                       CAST(round(-ln(CAST(n_w AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1e6)
                            AS BIGINT) AS s_micro
                FROM toks JOIN vocab USING (t) CROSS JOIN tot),
         m AS (SELECT doc_id, CAST(SUM(s_micro) AS BIGINT) // COUNT(*) AS score
               FROM sc GROUP BY doc_id),
         l AS (SELECT m.doc_id, lang, score FROM m JOIN documents USING (doc_id)),
         r AS (SELECT doc_id, lang, score,
                      CAST(row_number() OVER (PARTITION BY lang
                        ORDER BY score, doc_id) AS BIGINT) AS rk,
                      CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
               FROM l),
         p AS (SELECT doc_id, lang, score,
                      CASE WHEN n = 1 THEN 0
                           ELSE (rk - 1) * 1000000 // (n - 1) END AS pct_ppm
               FROM r)
         SELECT doc_id, lang, score, pct_ppm,
                CASE WHEN pct_ppm * 3 < 1000000 THEN 'head'
                     WHEN pct_ppm * 3 < 2000000 THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM p ORDER BY doc_id""",
    // Budget select: the q83 scorer, then one running sum over
    // (score DESC, doc_id) <= 15000 — the oracle affords the global
    // sort the Spark side decomposes away.
    "q115_budget_select" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024) * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                      CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id),
         r AS (SELECT doc_id, score, n_tokens,
                      CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM s)
         SELECT doc_id, score, n_tokens, cum_tokens
         FROM r WHERE cum_tokens <= 15000 ORDER BY doc_id""",
    // Leakage-safe split: doc -> exact-group keeper -> near-dup
    // component label (the q34/q105 recursive machinery) -> salted
    // 52-bit hash of the root, ppm-thresholded 10/10/80.
    "q116_leakage_split" ->
      s"""WITH RECURSIVE groups AS (SELECT lower(trim(text)) AS k,
                                           MIN(doc_id) AS keeper
                                    FROM documents GROUP BY 1),
         wk AS (SELECT d.doc_id, g.keeper FROM documents d
                JOIN groups g ON lower(trim(d.text)) = g.k),
         ${nearDupComponentsSql},
         rooted AS (SELECT wk.doc_id,
                           coalesce(comp.label, wk.keeper) AS root
                    FROM wk LEFT JOIN comp ON comp.d = wk.keeper),
         sp AS (SELECT doc_id, root,
                       ('0x' || substr(md5('split:' || CAST(root AS VARCHAR)), 1, 13))::BIGINT % 1000000 AS b
                FROM rooted)
         SELECT doc_id, root,
                CASE WHEN b < 100000 THEN 'test'
                     WHEN b < 200000 THEN 'val'
                     ELSE 'train' END AS split
         FROM sp ORDER BY doc_id""")
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** DuckDB oracle SQL, part A — see [[SparkEntry.oracleSql]].
  * Part of the registry split (round 10). */
private[graft] trait EntryOraclesA extends EntryOracleFragments {
  private[graft] def oraclesPartA: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_daily_active_users" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, COUNT(DISTINCT user_id) AS dau, COUNT(*) AS n_events
         FROM events GROUP BY 1 ORDER BY 1""",
    "q03_sampling_tiers" ->
      """WITH c AS (SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 100 AS cohort
           FROM events)
         SELECT COUNT(CASE WHEN cohort < 10 THEN 1 END) AS events_t10,
                COUNT(CASE WHEN cohort < 50 THEN 1 END) AS events_t50,
                COUNT(*) AS events_t100,
                COUNT(DISTINCT CASE WHEN cohort < 10 THEN user_id END) AS users_t10,
                COUNT(DISTINCT CASE WHEN cohort < 50 THEN user_id END) AS users_t50,
                COUNT(DISTINCT user_id) AS users_t100
         FROM c""",
    "q04_multi_device_7d" ->
      """WITH activity AS (SELECT DISTINCT ts::DATE AS day, user_id, event_type FROM events),
         pairs AS (
           SELECT DISTINCT present.day, present.user_id,
                  present.event_type AS type_now, past.event_type AS type_prev
           FROM activity present JOIN activity past
             ON present.user_id = past.user_id
            AND present.event_type <> past.event_type
            AND past.day <= present.day
            AND past.day >= present.day - INTERVAL 7 DAY)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_pairs, COUNT(DISTINCT user_id) AS n_users
         FROM pairs GROUP BY 1 ORDER BY 1""",
    "q05_session_metadata" ->
      """WITH meta AS (
           SELECT user_id, MIN(ts) AS began_at FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
         folded AS (
           SELECT e.user_id, COUNT(*) AS n_events, MAX(e.ts) AS last_ts,
                  MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
           FROM events e JOIN meta m ON e.user_id = m.user_id
           WHERE e.ts::DATE BETWEEN m.began_at::DATE AND m.began_at::DATE + INTERVAL 1 DAY
             AND e.ts >= m.began_at
           GROUP BY e.user_id)
         SELECT m.user_id, m.began_at,
                date_diff('millisecond', m.began_at, f.last_ts) AS duration_ms,
                f.n_events, f.has_purchase = 1 AS completed
         FROM meta m LEFT JOIN folded f ON m.user_id = f.user_id
         ORDER BY m.user_id""",
    "q06_revenue_by_nation" ->
      """SELECT n_name AS nation,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(15,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name ORDER BY nation""",
    "q07_customers_without_orders" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
         FROM customer WHERE NOT EXISTS (
           SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         GROUP BY 1 ORDER BY 1""",
    "q08_exact_dedup" ->
      """SELECT COUNT(*) AS n_docs, COUNT(DISTINCT lower(trim(text))) AS n_unique,
                COUNT(*) - COUNT(DISTINCT lower(trim(text))) AS n_dupes
         FROM documents""",
    "q09_day_store_lifecycle" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, COUNT(*) AS n_events,
                COUNT(DISTINCT user_id) AS n_users
         FROM events
         WHERE ts::DATE >= (SELECT MAX(ts::DATE) - INTERVAL 20 DAY FROM events)
         GROUP BY 1 ORDER BY 1""",
    "q10_csv_ingest_sanitize" ->
      s"""WITH staging AS ($activityStagingSql)
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT uid) AS n_users,
                COUNT(CASE WHEN service = '' THEN 1 END) AS n_empty_service,
                COUNT(CASE WHEN length(substr(ua_browser, 1, 40)) = 40 THEN 1 END) AS n_truncated
         FROM staging GROUP BY type ORDER BY type""",
    "q11_activity_import_tiers" ->
      s"""WITH staging AS ($activityStagingSql),
         c AS (SELECT *, ('0x' || substr(uid, 1, 7))::BIGINT % 100 AS cohort,
                      (SELECT MAX(ts::DATE) FROM events) AS max_day
               FROM staging)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_rows,
                COUNT(DISTINCT uid) AS n_users, 10 AS tier_pct
         FROM c WHERE cohort < 10 AND day >= max_day - INTERVAL 36 DAY GROUP BY day
         UNION ALL
         SELECT CAST(day AS VARCHAR), COUNT(*), COUNT(DISTINCT uid), 50
         FROM c WHERE cohort < 50 AND day >= max_day - INTERVAL 24 DAY GROUP BY day
         UNION ALL
         SELECT CAST(day AS VARCHAR), COUNT(*), COUNT(DISTINCT uid), 100
         FROM c WHERE cohort < 100 AND day >= max_day - INTERVAL 18 DAY GROUP BY day
         ORDER BY tier_pct, day""",
    "q12_flow_metadata_cascade" ->
      s"""WITH S AS ($flowStagingSql),
         P AS (SELECT MAX(day) AS max_day, MIN(day) AS min_day FROM S),
         X AS (SELECT s.* FROM S s CROSS JOIN P
               WHERE s.day >= P.max_day - INTERVAL 18 DAY AND s.type <> 'flow.begin'),
         E AS (SELECT * FROM X
               WHERE type NOT LIKE 'flow.continued.%' AND type NOT LIKE 'flow.experiment.%'),
         mx AS (SELECT flow_id, MIN(day) AS mx_day FROM X GROUP BY flow_id),
         me AS (SELECT flow_id, MIN(day) AS me_day FROM E GROUP BY flow_id),
         dsel AS (SELECT mx.flow_id,
                    GREATEST(P.min_day,
                      LEAST(mx.mx_day, COALESCE(me.me_day - 1, mx.mx_day))) AS d
                  FROM mx LEFT JOIN me USING (flow_id) CROSS JOIN P),
         counted AS (
           SELECT x.flow_id, x.flow_time, x.locale, x.uid
           FROM X x JOIN dsel USING (flow_id) WHERE x.day = dsel.d
           UNION ALL
           SELECT e.flow_id, e.flow_time, e.locale, e.uid
           FROM E e JOIN dsel USING (flow_id) WHERE e.day = dsel.d + 1),
         fold AS (SELECT flow_id, MAX(flow_time) AS f_time, MAX(locale) AS f_locale,
                         MAX(uid) AS f_uid
                  FROM counted GROUP BY flow_id),
         compl AS (SELECT DISTINCT flow_id FROM E WHERE type = 'flow.complete'),
         acct AS (SELECT DISTINCT flow_id FROM E WHERE type = 'account.created'),
         contd AS (SELECT flow_id, MIN(day) AS cmin, substr(MAX(type), 16, 64) AS cont
                   FROM X WHERE type LIKE 'flow.continued.%' GROUP BY flow_id),
         base AS (SELECT flow_id, make_timestamp("timestamp" * 1000000) AS begin_time,
                         context, utm_campaign, day AS export_date
                  FROM S WHERE type = 'flow.begin'),
         -- a metadata row inserted on begin-day b only receives updates
         -- from processings at days <= b (newest-first: older days run
         -- later); the backfill likewise only sees staging days <= b
         mcxrow AS (SELECT b2.flow_id, b2.export_date,
                           MAX(s.context) AS mx_context,
                           MAX(s.utm_campaign) AS mx_camp
                    FROM (SELECT DISTINCT flow_id, export_date FROM base) b2
                    JOIN S s ON s.flow_id = b2.flow_id AND s.day <= b2.export_date
                    GROUP BY b2.flow_id, b2.export_date)
         SELECT b.flow_id, b.begin_time,
           CASE WHEN ds.d IS NOT NULL AND ds.d <= b.export_date
                THEN f.f_time ELSE 0 END AS duration,
           (c.flow_id IS NOT NULL) AS completed,
           (a.flow_id IS NOT NULL) AS new_account,
           CASE WHEN b.context <> '' THEN b.context ELSE m.mx_context END AS context,
           CASE WHEN b.utm_campaign <> '' THEN b.utm_campaign ELSE m.mx_camp END AS utm_campaign,
           CASE WHEN ds.d IS NOT NULL AND ds.d <= b.export_date
                THEN f.f_locale END AS locale,
           CASE WHEN ds.d IS NOT NULL AND ds.d <= b.export_date
                THEN f.f_uid END AS uid,
           CASE WHEN d.cmin IS NOT NULL AND d.cmin <= b.export_date
                THEN d.cont END AS continued_from,
           CAST(b.export_date AS VARCHAR) AS export_date
         FROM base b
         LEFT JOIN dsel ds USING (flow_id)
         LEFT JOIN fold f USING (flow_id)
         LEFT JOIN compl c USING (flow_id)
         LEFT JOIN acct a USING (flow_id)
         LEFT JOIN contd d USING (flow_id)
         LEFT JOIN mcxrow m ON m.flow_id = b.flow_id AND m.export_date = b.export_date
         CROSS JOIN P
         WHERE b.export_date >= P.max_day - INTERVAL 18 DAY
         ORDER BY b.flow_id, b.begin_time""",
    "q13_flow_experiments" ->
      s"""WITH S AS ($flowStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM S)
         SELECT split_part(type, '.', 3) AS experiment,
                split_part(type, '.', 4) AS cohort,
                make_timestamp("timestamp" * 1000000) AS timestamp,
                flow_id, uid, CAST(day AS VARCHAR) AS export_date
         FROM S CROSS JOIN P
         WHERE type LIKE 'flow.experiment.%'
           AND day >= P.max_day - INTERVAL 18 DAY
         ORDER BY flow_id, timestamp, experiment""",
    "q14_flow_events_absorbed" ->
      s"""WITH S AS ($flowStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM S),
         C AS (SELECT s.*, ('0x' || substr(flow_id, 1, 7))::BIGINT % 100 AS cohort_pct
               FROM S s
               WHERE s.type <> 'flow.begin'
                 AND s.type NOT LIKE 'flow.continued.%'
                 AND s.type NOT LIKE 'flow.experiment.%')
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT flow_id) AS n_flows, 10 AS tier_pct
         FROM C CROSS JOIN P
         WHERE cohort_pct < 10 AND day >= P.max_day - INTERVAL 36 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id), 50
         FROM C CROSS JOIN P
         WHERE cohort_pct < 50 AND day >= P.max_day - INTERVAL 24 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id), 100
         FROM C CROSS JOIN P
         WHERE cohort_pct < 100 AND day >= P.max_day - INTERVAL 18 DAY GROUP BY type
         ORDER BY tier_pct, type""",
    "q15_daily_devices_rollup" ->
      s"""WITH staging AS ($activityStagingSql),
         P AS (SELECT MAX(day) AS max_day FROM staging)
         SELECT DISTINCT CAST(day AS VARCHAR) AS day, uid, device_id, service,
                substr(ua_browser, 1, 40) AS ua_browser, ua_version, ua_os
         FROM staging CROSS JOIN P
         WHERE device_id <> '' AND day >= P.max_day - INTERVAL 18 DAY
         ORDER BY day, uid, device_id, service""",
    "q16_multi_device_incremental" ->
      s"""WITH staging AS ($activityStagingSql),
         dev AS (SELECT DISTINCT day, uid, device_id FROM staging WHERE device_id <> ''),
         pairs AS (
           SELECT DISTINCT p.day, p.uid, p.device_id AS device_now, q.device_id AS device_prev
           FROM dev p JOIN dev q
             ON p.uid = q.uid AND p.device_id <> q.device_id
            AND q.day <= p.day AND q.day >= p.day - INTERVAL 7 DAY)
         SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_pairs,
                COUNT(DISTINCT uid) AS n_users
         FROM pairs GROUP BY 1 ORDER BY 1""",
    "q17_counts_import" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day,
                COUNT(DISTINCT user_id) AS accounts, COUNT(*) AS verified_accounts
         FROM events WHERE ts::DATE >= DATE '2024-01-10'
         GROUP BY 1 ORDER BY 1""",
    "q18_email_import_tiers" ->
      s"""WITH staging AS ($emailStagingSql),
         c AS (SELECT *,
                 CASE WHEN flow_id = '' THEN NULL
                      ELSE ('0x' || substr(flow_id, 1, 7))::BIGINT % 100 END AS cohort,
                 (SELECT MAX(ts::DATE) FROM events) AS max_day
               FROM staging)
         SELECT type, COUNT(*) AS n_rows, COUNT(DISTINCT flow_id) AS n_flows,
                COUNT(CASE WHEN bounced = 'true' THEN 1 END) AS n_bounced, 10 AS tier_pct
         FROM c WHERE cohort < 10 AND day >= max_day - INTERVAL 36 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id),
                COUNT(CASE WHEN bounced = 'true' THEN 1 END), 50
         FROM c WHERE cohort < 50 AND day >= max_day - INTERVAL 24 DAY GROUP BY type
         UNION ALL
         SELECT type, COUNT(*), COUNT(DISTINCT flow_id),
                COUNT(CASE WHEN bounced = 'true' THEN 1 END), 100
         FROM c WHERE cohort < 100 AND day >= max_day - INTERVAL 18 DAY GROUP BY type
         ORDER BY tier_pct, type""",
    // Inverted-index lexical retrieval: the oracle scores pairs by the
    // same overlap arithmetic (|A∩B| / (|A|+|B|−|A∩B|)) and keeps only
    // positive-overlap docs — the operator's retrieval contract (a doc
    // sharing no token is not a result, so the index never scores it).
    "q19_lexical_inverted_topk" ->
      """WITH qw AS (SELECT doc_id AS qid,
                            list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                     FROM documents WHERE doc_id < 20),
         cw AS (SELECT doc_id AS id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents WHERE doc_id >= 20),
         sc AS (SELECT q.qid, c.id,
                       len(list_intersect(q.ws, c.ws)) AS ov,
                       round(CAST(len(list_intersect(q.ws, c.ws)) AS DOUBLE) /
                             CAST(len(q.ws) + len(c.ws)
                                  - len(list_intersect(q.ws, c.ws)) AS DOUBLE), 6) AS jac
                FROM qw q CROSS JOIN cw c)
         SELECT qid, id, CAST(r AS BIGINT) AS r, jac FROM (
           SELECT qid, id, jac,
                  row_number() OVER (PARTITION BY qid
                    ORDER BY jac DESC, id) AS r
           FROM sc WHERE ov > 0) t
         WHERE r <= 20 ORDER BY qid, r""",
    "q20_exact_dedup_rows" ->
      """WITH k AS (SELECT MIN(doc_id) AS doc_id FROM documents
                    GROUP BY lower(trim(text)))
         SELECT d.lang, d.source, COUNT(*) AS n_docs
         FROM documents d JOIN k USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q21_minhash_lsh_pairs" ->
      s"""WITH $minHashPairsSql,
         e AS (SELECT a AS d FROM pairs UNION ALL SELECT b FROM pairs)
         SELECT (SELECT COUNT(*) FROM pairs) AS n_pairs,
                (SELECT COUNT(DISTINCT d) FROM e) AS n_docs""",
    "q22_simhash_pairs" ->
      """WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
                    FROM documents),
         h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w),
         v AS (SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
               FROM h CROSS JOIN (SELECT unnest(range(60)) AS j) GROUP BY doc_id, j),
         sh AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN vote > 0 THEN 1::BIGINT << CAST(j AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS simhash
                FROM v GROUP BY doc_id),
         ch AS (SELECT doc_id, k, (simhash >> CAST(k * 15 AS INTEGER)) & 32767 AS key
                FROM sh CROSS JOIN (SELECT unnest(range(4)) AS k)),
         p AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
               FROM ch a JOIN ch b
                 ON a.k = b.k AND a.key = b.key AND a.doc_id < b.doc_id),
         e AS (SELECT a AS d FROM p UNION ALL SELECT b FROM p)
         SELECT (SELECT COUNT(*) FROM p) AS n_pairs,
                (SELECT COUNT(DISTINCT d) FROM e) AS n_docs,
                (SELECT COUNT(DISTINCT simhash) FROM sh) AS n_distinct_hashes""",
    "q23_ngram_jaccard_topk" ->
      s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS ws FROM documents)
         SELECT p.a, p.b,
                round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                      CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6) AS jac
         FROM pairs p
         JOIN ws wa ON wa.doc_id = p.a
         JOIN ws wb ON wb.doc_id = p.b
         ORDER BY jac DESC, p.a, p.b LIMIT 100""",
    "q24_embedding_neardup" ->
      s"""SELECT a.vec_id AS a, b.vec_id AS b,
                ${cosSql("a.embedding", "b.embedding")} AS cos
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4
         ORDER BY a, b""",
    "q25_ann_bruteforce_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q26_ann_lsh_recall" ->
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
             FROM q JOIN c ON qid <> id) t WHERE r <= 5),
         lsh AS (SELECT qid, id FROM (
             SELECT qid, id, row_number() OVER (PARTITION BY qid
               ORDER BY ${cosSql("qvec", "vec")} DESC, id) AS r
             FROM q JOIN c ON qid <> id AND qbucket = bucket) t WHERE r <= 5),
         mates AS (SELECT qid, COUNT(*) AS n_mates
                   FROM q JOIN c ON qbucket = bucket AND qid <> id GROUP BY qid),
         hits AS (SELECT l.qid, COUNT(*) AS n_hits
                  FROM lsh l JOIN exact x ON l.qid = x.qid AND l.id = x.id GROUP BY l.qid)
         SELECT q.qid, COALESCE(m.n_mates, 0) AS n_mates, COALESCE(h.n_hits, 0) AS n_hits
         FROM q LEFT JOIN mates m ON q.qid = m.qid LEFT JOIN hits h ON q.qid = h.qid
         ORDER BY q.qid""",
    "q27_lang_id" ->
      """WITH s AS (SELECT lang, list_distinct(string_split(text, ' ')) AS ws FROM documents),
         sc AS (SELECT lang,
             len(list_intersect(ws, ['the','a','of','and','to'])) AS s_en,
             len(list_intersect(ws, ['der','die','das','und','ist'])) AS s_de,
             len(list_intersect(ws, ['el','la','los','y','es'])) AS s_es,
             len(list_intersect(ws, ['le','la','les','et','est'])) AS s_fr,
             len(list_intersect(ws, ['de','shi','zhe','he','bu'])) AS s_zh
           FROM s),
         p AS (SELECT lang, CASE
             WHEN s_en = g AND g > 0 THEN 'en'
             WHEN s_de = g AND g > 0 THEN 'de'
             WHEN s_es = g AND g > 0 THEN 'es'
             WHEN s_fr = g AND g > 0 THEN 'fr'
             WHEN s_zh = g AND g > 0 THEN 'zh'
             ELSE 'und' END AS predicted
           FROM (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS g FROM sc) t)
         SELECT lang, predicted, COUNT(*) AS n_docs
         FROM p GROUP BY 1, 2 ORDER BY 1, 2""",
    "q28_quality_scores" ->
      """SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
           CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
           CAST(SUM(len(list_filter(string_split(text, ' '),
             w -> list_contains(['the','a','of','and','to'], w)))) AS BIGINT) AS sum_stop,
           COUNT(CASE WHEN len(string_split(text, ' ')) >= 50
                       AND len(list_filter(string_split(text, ' '),
                         w -> list_contains(['the','a','of','and','to'], w))) * 10
                           >= len(string_split(text, ' '))
                 THEN 1 END) AS n_highq
         FROM documents GROUP BY source ORDER BY source""",
    "q29_token_stats" ->
      """WITH d AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
         a1 AS (SELECT lang,
             CAST(SUM(len(w)) AS BIGINT) AS total_words,
             CAST(SUM(list_sum(list_transform(w, x -> (length(x) + 3) // 4))) AS BIGINT)
               AS total_subwords,
             CAST(MAX(list_max(list_transform(w, x -> length(x)))) AS BIGINT) AS max_wlen
           FROM d GROUP BY lang),
         a2 AS (SELECT lang, COUNT(DISTINCT word) AS n_distinct_words
                FROM (SELECT lang, unnest(w) AS word FROM d) t GROUP BY lang)
         SELECT a1.lang, a1.total_words, a1.total_subwords, a1.max_wlen,
                a2.n_distinct_words
         FROM a1 JOIN a2 USING (lang) ORDER BY a1.lang""",
    "q30_fingerprints" ->
      """SELECT doc_id,
           list_min(list_transform(list_distinct(string_split(text, ' ')),
             w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS fp_min,
           CAST(list_sum(list_transform(list_distinct(string_split(text, ' ')),
             w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1048576)) AS BIGINT) AS fp_sum,
           list_reduce(list_prepend(0::BIGINT,
             list_transform((string_split(text, ' '))[1:8],
               w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1000000007)),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    // Recomputes what the PPM decoder extracts: dimensions from the
    // byte length (the encoder's derivation), total media size =
    // header + raster, and the raster checksum = byte sum of the
    // doc's leading min(strlen, w*h*3) bytes (the zero padding adds 0).
    "q31_multimodal_features" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
             strlen(text) AS len,
             strlen(text) % 13 + 2 AS w,
             strlen(text) % 7 + 2 AS h
           FROM documents)
         SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(strlen('P6' || chr(10) || CAST(w AS VARCHAR) || ' ' ||
                       CAST(h AS VARCHAR) || chr(10) || '255' || chr(10))
                + w * h * 3 AS BIGINT) AS byte_len,
           CAST(COALESCE(list_sum(list_transform(
                  range(1, LEAST(w * h * 3, len) + 1),
                  i -> ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER),
                                       2))::BIGINT)), 0)
                AS BIGINT) AS px_checksum
         FROM m ORDER BY doc_id""",
    "q32_minhash_char_shingles" ->
      s"""WITH ${lshPairsSqlOverShingles(
             """SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, greatest(length(lower(trim(text))) - 7, 1) + 1),
                  i -> substr(lower(trim(text)), CAST(i AS INTEGER), 8)))) AS word
                FROM documents""", numHashes = 32, rowsPerBand = 8)},
         e AS (SELECT a AS d FROM pairs UNION ALL SELECT b FROM pairs)
         SELECT (SELECT COUNT(*) FROM pairs) AS n_pairs,
                (SELECT COUNT(DISTINCT d) FROM e) AS n_docs""",
    "q33_embedding_neardup_bucketed" ->
      s"""WITH vb AS (SELECT vec_id, b,
                list_sum(list_transform(range(64), d ->
                  embedding[CAST(d + 1 AS INTEGER)]::DOUBLE *
                  (CASE WHEN ('0x' || substr(md5('hp-' || b || '-' || d), 1, 15))::BIGINT % 2 = 1
                        THEN 1.0 ELSE -1.0 END))) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(4)) AS b)),
         bk AS (SELECT vec_id,
                       CAST(SUM(CASE WHEN proj > 0 THEN 1::BIGINT << CAST(b AS INTEGER)
                                     ELSE 0 END) AS BIGINT) AS bucket
                FROM vb GROUP BY vec_id),
         e AS (SELECT emb.vec_id, emb.embedding, bk.bucket
               FROM embeddings emb JOIN bk ON emb.vec_id = bk.vec_id),
         bp AS (SELECT COUNT(*) AS n_pairs_bucketed
                FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.bucket = b.bucket
                WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
         ep AS (SELECT COUNT(*) AS n_pairs_exact
                FROM e a JOIN e b ON a.vec_id < b.vec_id
                WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4)
         SELECT bp.n_pairs_bucketed, ep.n_pairs_exact FROM bp CROSS JOIN ep""",
    "q34_neardup_components" ->
      s"""WITH RECURSIVE kmin AS (SELECT MIN(doc_id) AS doc_id FROM documents
                                  GROUP BY lower(trim(text))),
         sdocs AS (SELECT d.* FROM documents d JOIN kmin USING (doc_id)),
         ${minHashPairsSqlOver("sdocs")},
         ed AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         reach(d, r) AS (
           SELECT src AS d, src AS r FROM ed
           UNION
           SELECT ed.src AS d, reach.r FROM ed JOIN reach ON ed.dst = reach.d),
         comp AS (SELECT d, MIN(r) AS label FROM reach GROUP BY d),
         sizes AS (SELECT label, COUNT(*) AS csize FROM comp GROUP BY label)
         SELECT COUNT(*) AS n_components, MAX(csize) AS max_component,
                CAST(SUM(csize) AS BIGINT) AS n_docs_in_pairs FROM sizes""",
    "q35_session_windows" ->
      """WITH m AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         g AS (SELECT user_id,
                      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM m),
         sess AS (SELECT user_id, sid, COUNT(*) AS n_events FROM g GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
                CAST(SUM(n_events) AS BIGINT) AS n_events
         FROM sess GROUP BY 1 ORDER BY 1""",
    "q36_sql_api_norms" ->
      """SELECT vec_id, label,
                round(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), 6) AS sqnorm
         FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""",
    "q37_value_percentiles" ->
      """SELECT event_type,
                quantile_cont(value, 0.5) AS p50,
                quantile_cont(value, 0.9) AS p90,
                quantile_cont(value, 0.99) AS p99
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q38_doc_rollup" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY ROLLUP (lang, source)
         ORDER BY lang, source""",
    "q39_pad_policy_ingest" ->
      s"""WITH staging AS ($activityStagingSql),
         base AS (
           SELECT type, COUNT(*) AS n_rows,
                  COUNT(CASE WHEN uid = '' THEN 1 END) AS n_empty_uid,
                  COUNT(CASE WHEN device_id = '' THEN 1 END) AS n_empty_device
           FROM staging GROUP BY type),
         -- the three appended lines after padding to 8 fields:
         -- 2-field  -> type '', uid '',      device_id ''
         -- 5-field  -> type '', uid paduid,  device_id ''
         -- 8-field  -> type padtype, uid paduid, device_id paddev
         pads AS (SELECT * FROM (VALUES
           ('', 2, 1, 2), ('padtype', 1, 0, 0))
           AS t(type, n_rows, n_empty_uid, n_empty_device))
         SELECT type, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
                CAST(SUM(n_empty_uid) AS BIGINT) AS n_empty_uid,
                CAST(SUM(n_empty_device) AS BIGINT) AS n_empty_device
         FROM (SELECT * FROM base UNION ALL SELECT * FROM pads)
         GROUP BY type ORDER BY type""",
    "q40_compaction_lifecycle" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day,
                CAST(6 AS BIGINT) AS files_before,
                CAST(2 AS BIGINT) AS files_after,
                COUNT(*) AS n_events,
                COUNT(DISTINCT user_id) AS n_users,
                CAST(SUM(event_id) AS BIGINT) AS sum_event_id
         FROM events WHERE ts::DATE = DATE '2024-01-15'
         GROUP BY 1 ORDER BY 1""",
    "q41_run_import_e2e" -> runImportOracleSql,
    "q234_run_import_json" -> runImportOracleSql,
    "q42_value_percentiles_approx" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50_exact,
                true AS approx_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q43_asof_prev_view" ->
      """WITH u AS (
           SELECT user_id, ts, event_id, 1 AS side,
                  NULL::BIGINT AS r_event_id, NULL::TIMESTAMP AS r_ts
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, event_id, 0, event_id, ts
           FROM events WHERE event_type = 'view'),
         w AS (
           SELECT *,
             last_value(r_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_event_id,
             last_value(r_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts
           FROM u)
         SELECT user_id, event_id, ts, view_event_id,
                epoch_ms(ts) // 1000 - epoch_ms(view_ts) // 1000 AS gap_sec
         FROM w WHERE side = 1 AND user_id < 30 ORDER BY event_id""",
    "q44_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM events),
         r AS (SELECT event_type, h,
                      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                      COUNT(*) OVER (PARTITION BY event_type) AS nd
               FROM h),
         k AS (SELECT event_type, MIN(nd) AS nd,
                      MAX(CASE WHEN rn = 64 THEN h END) AS kth
               FROM r GROUP BY event_type),
         x AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
               FROM events GROUP BY event_type)
         SELECT k.event_type,
                CAST(LEAST(k.nd, 64) AS BIGINT) AS sketch_size,
                k.kth AS kth_min,
                CASE WHEN k.nd < 64 THEN CAST(k.nd AS DOUBLE)
                     ELSE round(63.0 * 1152921504606846976.0 / CAST(k.kth AS DOUBLE), 4)
                END AS est_distinct,
                x.n_exact
         FROM k JOIN x USING (event_type) ORDER BY k.event_type""",
    "q45_tfidf_top_terms" ->
      """WITH tokens AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
                         FROM documents),
         tf AS (SELECT lang, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
         dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (SELECT tf.lang, tf.term, tf.tf, dfc.df,
                           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf
                    FROM tf JOIN dfc USING (term) CROSS JOIN n),
         ranked AS (SELECT *, row_number() OVER (
                      PARTITION BY lang ORDER BY tfidf DESC, term) AS rank
                    FROM scored)
         SELECT lang, rank, term, tf, df, tfidf
         FROM ranked WHERE rank <= 10 ORDER BY lang, rank""",
    "q46_streaming_sessions" ->
      """WITH fe AS (
           SELECT ts,
                  CASE event_type WHEN 'signup' THEN 'flow.begin'
                                  WHEN 'purchase' THEN 'flow.complete'
                                  WHEN 'error' THEN 'account.created'
                                  ELSE 'flow.event' END AS type,
                  md5(user_id || '#' || CAST(ts::DATE AS VARCHAR)) AS flow_id,
                  epoch_ms(ts) % 100000000 AS flow_time,
                  'loc' || (user_id % 7) AS locale,
                  md5(CAST(user_id AS VARCHAR)) AS uid
           FROM events),
         b AS (SELECT flow_id,
                      make_timestamp(CAST(epoch_ms(MIN(ts)) AS BIGINT) * 1000) AS begin_time
               FROM fe WHERE type = 'flow.begin' GROUP BY flow_id),
         f AS (SELECT flow_id,
                      COALESCE(MAX(CASE WHEN type <> 'flow.begin' THEN flow_time END), 0)
                        AS duration,
                      BOOL_OR(type = 'flow.complete') AS completed,
                      BOOL_OR(type = 'account.created') AS new_account,
                      MAX(CASE WHEN type <> 'flow.begin' THEN locale END) AS locale,
                      MAX(CASE WHEN type <> 'flow.begin' THEN uid END) AS uid
               FROM fe GROUP BY flow_id)
         SELECT b.flow_id, b.begin_time, f.duration, f.completed, f.new_account,
                f.locale, f.uid
         FROM b JOIN f USING (flow_id) ORDER BY b.flow_id""",
    "q47_contamination_scan" ->
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
                    FROM c JOIN ev USING (h) GROUP BY c.doc_id)
         SELECT s.doc_id, s.n_shared, t.n_shingles,
                s.n_shared * 2 >= t.n_shingles AS contaminated
         FROM shared s JOIN tot t USING (doc_id)
         WHERE s.n_shared >= 3 ORDER BY s.doc_id""",
    "q48_quality_percentile_filter" ->
      """WITH thr AS (SELECT lang, quantile_cont(n_chars, 0.75) AS thr
                      FROM documents GROUP BY lang)
         SELECT d.lang, d.source, COUNT(*) AS n_docs,
                COUNT(CASE WHEN d.n_chars >= t.thr THEN 1 END) AS n_kept
         FROM documents d JOIN thr t USING (lang)
         GROUP BY d.lang, d.source ORDER BY d.lang, d.source""",
    "q49_ann_topk_agg" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         scored AS (SELECT qid, id, ${cosSql("qvec", "vec")} AS cos
                    FROM q JOIN c ON qid <> id)
         SELECT qid, rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q50_ivf_ann" ->
      s"""WITH cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                       WHERE vec_id BETWEEN 20 AND 35),
         c AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= 20),
         asg AS (SELECT id, vec, cell FROM (
             SELECT c.id, c.vec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY c.id
                      ORDER BY ${cosSql("c.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM c CROSS JOIN cen) t WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         pr AS (SELECT qid, qvec, cell FROM (
             SELECT q.qid, q.qvec, cen.cid AS cell,
                    row_number() OVER (PARTITION BY q.qid
                      ORDER BY ${cosSql("q.qvec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM q CROSS JOIN cen) t WHERE rn <= 4),
         scored AS (SELECT pr.qid, asg.id, ${cosSql("pr.qvec", "asg.vec")} AS cos
                    FROM pr JOIN asg USING (cell) WHERE pr.qid <> asg.id)
         SELECT qid, rank, id, cos FROM (
           SELECT qid, id, cos,
                  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rank
           FROM scored) t
         WHERE rank <= 5 ORDER BY qid, rank""",
    "q51_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 < 200
         ORDER BY doc_id""",
    "q52_domain_cap" ->
      """SELECT source, rank, doc_id, score FROM (
           SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS score,
                  row_number() OVER (PARTITION BY source
                    ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS rank
           FROM documents) t
         WHERE rank <= 15 ORDER BY source, rank""",
    "q53_repetition_signals" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         wstats AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
                           COUNT(*) AS n_distinct, MAX(n) AS max_word_n
                    FROM (SELECT doc_id, t, COUNT(*) AS n
                          FROM (SELECT doc_id, unnest(l) AS t FROM ws) u
                          GROUP BY doc_id, t) g
                    GROUP BY doc_id),
         bstats AS (SELECT doc_id, MAX(n) AS max_bigram_n
                    FROM (SELECT doc_id, g, COUNT(*) AS n
                          FROM (SELECT doc_id,
                                  unnest(CASE WHEN len(l) >= 2
                                    THEN list_transform(range(1, len(l)),
                                      i -> l[CAST(i AS INTEGER)] || ' ' || l[CAST(i AS INTEGER) + 1])
                                    ELSE []::VARCHAR[] END) AS g
                                FROM ws) u
                          GROUP BY doc_id, g) g2
                    GROUP BY doc_id)
         SELECT w.doc_id, w.n_words, w.n_distinct, w.max_word_n,
                COALESCE(b.max_bigram_n, 0) AS max_bigram_n,
                w.max_word_n >= 2 AND w.max_word_n * 10 >= w.n_words AS repetitive
         FROM wstats w LEFT JOIN bstats b USING (doc_id)
         ORDER BY w.doc_id""",
    "q54_pii_redact" ->
      """WITH t AS (SELECT source,
             text || CASE WHEN doc_id % 5 = 0
               THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com at 10.0.'
                    || CAST(doc_id % 200 AS VARCHAR) || '.77'
               ELSE '' END AS text2
           FROM documents),
         r AS (SELECT source,
             len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS em,
             len(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ip,
             ('0x' || substr(md5(
               regexp_replace(
                 regexp_replace(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')), 1, 15))::BIGINT % 1048576 AS ck
           FROM t)
         SELECT source, COUNT(*) AS n_docs, CAST(SUM(em) AS BIGINT) AS n_emails,
                CAST(SUM(ip) AS BIGINT) AS n_ips,
                CAST(SUM(ck) AS BIGINT) AS redacted_checksum
         FROM r GROUP BY source ORDER BY source""",
    "q55_range_join_windows" ->
      """WITH hours AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
                        FROM events GROUP BY 1),
         top AS (SELECT h FROM (
             SELECT h, row_number() OVER (ORDER BY n DESC, h) AS r FROM hours) t
           WHERE r <= 10)
         SELECT strftime(t.h, '%Y-%m-%d %H:%M:%S') AS window_start,
                COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users
         FROM events e JOIN top t
           ON e.ts >= t.h AND e.ts < t.h + INTERVAL 90 MINUTE
         GROUP BY t.h ORDER BY window_start""",
    "q56_lsh_incremental" ->
      s"""WITH ${lshPairsSqlOverShingles(
             s"""SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
                 FROM documents""",
             pairPred = "a.doc_id % 10 >= 8 AND b.doc_id % 10 < 8")},
         ws AS (SELECT doc_id, list_distinct(string_split(lower(trim(text)), ' ')) AS ws FROM documents)
         SELECT new_id, dup_of, jac FROM (
           SELECT p.a AS new_id, p.b AS dup_of,
                  round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                        CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6) AS jac
           FROM pairs p
           JOIN ws wa ON wa.doc_id = p.a
           JOIN ws wb ON wb.doc_id = p.b) t
         WHERE jac >= 0.5
         ORDER BY new_id, dup_of""",
    // Mirrors TextDedup.nearDupDedup stage for stage: exact dedup
    // (min-id per normalized text) → banded LSH candidates over the
    // survivors → exact-Jaccard gate on the 60-bit-hashed word sets →
    // recursive-CTE min-label closure (the q34 pattern) → drop every
    // non-label member of a component.
    "q57_neardup_dedup_dataset" ->
      s"""WITH RECURSIVE kmin AS (SELECT MIN(doc_id) AS doc_id FROM documents
                                  GROUP BY lower(trim(text))),
         sdocs AS (SELECT d.* FROM documents d JOIN kmin USING (doc_id)),
         ${minHashPairsSqlOver("sdocs")},
         hws AS (SELECT doc_id,
                        list_distinct(list_transform(
                          list_distinct(string_split(lower(trim(text)), ' ')),
                          w -> ('0x' || substr(md5(w), 1, 15))::BIGINT)) AS ws
                 FROM sdocs),
         gp AS (SELECT p.a, p.b FROM pairs p
                JOIN hws wa ON wa.doc_id = p.a
                JOIN hws wb ON wb.doc_id = p.b
                WHERE round(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE) /
                            CAST(len(list_distinct(wa.ws || wb.ws)) AS DOUBLE), 6)
                      >= 0.5),
         ed AS (SELECT a AS src, b AS dst FROM gp UNION SELECT b, a FROM gp),
         reach(d, r) AS (
           SELECT src AS d, src AS r FROM ed
           UNION
           SELECT ed.src AS d, reach.r FROM ed JOIN reach ON ed.dst = reach.d),
         comp AS (SELECT d, MIN(r) AS label FROM reach GROUP BY d),
         losers AS (SELECT d AS doc_id FROM comp WHERE d <> label)
         SELECT doc_id, lang, source FROM sdocs
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         ORDER BY doc_id""")
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
/** DuckDB oracle SQL, part D — see [[SparkEntry.oracleSql]].
  * Part of the registry split (round 10). */
private[graft] trait EntryOraclesD extends EntryOraclesC {
  private[graft] def oraclesPartD: Map[String, String] = Map(
    // Linear attribution: per-conversion per-channel touch counts via
    // FILTERed windows (the frame excludes same-ms rows, the q153
    // convention), credit = n_c * (1e6 // nt) with the remainder to
    // the last touch, unpivoted through literal UNION arms.
    "q175_linear_attribution" ->
      """WITH t AS (SELECT user_id AS u, event_type AS typ,
                count(*) FILTER (WHERE event_type = 'signup') OVER pw AS n0,
                count(*) FILTER (WHERE event_type = 'view') OVER pw AS n1,
                count(*) FILTER (WHERE event_type = 'click') OVER pw AS n2,
                max(CASE WHEN event_type IN ('signup', 'view', 'click')
                         THEN lpad(CAST(epoch_ms(ts) AS VARCHAR), 20, '0')
                              || '#' || event_type END) OVER pw AS lastt
              FROM events
              WINDOW pw AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         c AS (SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
                      CAST(n2 AS BIGINT) AS n2,
                      CAST(n0 + n1 + n2 AS BIGINT) AS nt,
                      split_part(lastt, '#', 2) AS lastch
               FROM t WHERE typ = 'purchase'),
         arms AS (
           SELECT 'signup' AS channel, n0 AS touches,
                  CASE WHEN nt = 0 THEN 0
                       ELSE n0 * (1000000 // nt) +
                            CASE WHEN lastch = 'signup'
                                 THEN 1000000 - nt * (1000000 // nt)
                                 ELSE 0 END END AS credit FROM c
           UNION ALL
           SELECT 'view', n1,
                  CASE WHEN nt = 0 THEN 0
                       ELSE n1 * (1000000 // nt) +
                            CASE WHEN lastch = 'view'
                                 THEN 1000000 - nt * (1000000 // nt)
                                 ELSE 0 END END FROM c
           UNION ALL
           SELECT 'click', n2,
                  CASE WHEN nt = 0 THEN 0
                       ELSE n2 * (1000000 // nt) +
                            CASE WHEN lastch = 'click'
                                 THEN 1000000 - nt * (1000000 // nt)
                                 ELSE 0 END END FROM c
           UNION ALL
           SELECT 'none', CAST(0 AS BIGINT),
                  CASE WHEN nt = 0 THEN 1000000 ELSE 0 END FROM c),
         g AS (SELECT channel,
                      CAST(count(*) FILTER (WHERE credit > 0) AS BIGINT)
                        AS n_conversions,
                      CAST(sum(touches) AS BIGINT) AS touches,
                      CAST(sum(credit) AS BIGINT) AS credit_ppm
               FROM arms GROUP BY 1),
         tot AS (SELECT CAST(sum(credit) // 1000000 AS BIGINT) AS t
                 FROM arms)
         SELECT channel, n_conversions, touches, credit_ppm,
                CASE WHEN t > 0 THEN credit_ppm // t ELSE 0 END AS share_ppm
         FROM g CROSS JOIN tot
         WHERE touches > 0 OR credit_ppm > 0
         ORDER BY channel""",
    // Stationary distribution: the power iteration unrolled to the
    // same `stationaryIters` the Spark loop uses; per-edge
    // pi*c // r truncation (nonnegative, so // == div), absorbing
    // states hold their mass via the NOT EXISTS arm.
    "q176_stationary_distribution" -> stationaryCtesSql(stationaryIters),
    // Weighted sample: A-ES in log space; the negated cost keeps the
    // numerator nonnegative so // == div; same salted 60-bit hash,
    // same single-ln libm caveat as q67/q170.
    "q177_weighted_sample" ->
      """WITH s AS (SELECT doc_id, n_chars,
                ('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)),
                  1, 15))::BIGINT % 1000000 + 1 AS u
              FROM documents WHERE n_chars > 0),
         c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
                      (-CAST(round(ln(u / 1000000.0) * 1e6) AS BIGINT))
                        * 1000 // n_chars AS cost_nano
               FROM s)
         SELECT doc_id, weight, CAST(cost_nano AS BIGINT) AS cost_nano
         FROM c ORDER BY cost_nano, doc_id LIMIT 100""",
    // Tokenizer fertility: the q161 trained-encode chain joined back
    // to language, rolled up with exact-integer ppm ratios.
    "q178_bpe_fertility" ->
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
                 FROM a10),
         j AS (SELECT d.lang, CAST(length(d.text) AS BIGINT) AS nch,
                      CAST(len(list_filter(string_split(d.text, ' '),
                        x -> x <> '')) AS BIGINT) AS nws,
                      CAST(len(t.toks) AS BIGINT) AS ntk
               FROM documents d JOIN tka t USING (doc_id))
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nch) AS BIGINT) AS n_chars,
                CAST(sum(nws) AS BIGINT) AS n_ws_tokens,
                CAST(sum(ntk) AS BIGINT) AS n_tokens,
                CASE WHEN sum(ntk) > 0
                     THEN CAST(sum(nch) * 1000000 // sum(ntk) AS BIGINT)
                     ELSE 0 END AS chars_per_token_ppm,
                CASE WHEN sum(nws) > 0
                     THEN CAST(sum(ntk) * 1000000 // sum(nws) AS BIGINT)
                     ELSE 0 END AS fertility_ppm
         FROM j GROUP BY lang ORDER BY lang""",
    // k-anonymity: quasi-tuple class sizes, the violating mass and
    // the smallest class; NULL quasi-values group together in both
    // engines.
    "q179_k_anonymity" ->
      """WITH q AS (SELECT lang, source, n_chars // 100 AS len_bucket
                    FROM documents),
         g AS (SELECT lang, source, len_bucket,
                      CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2, 3),
         a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_groups,
                      CAST(coalesce(sum(c) FILTER (WHERE c < 5), 0)
                        AS BIGINT) AS n_violating_rows,
                      CAST(count(*) FILTER (WHERE c < 5) AS BIGINT)
                        AS n_violating_groups,
                      CAST(min(c) AS BIGINT) AS min_group
               FROM g)
         SELECT n_rows, n_groups, CAST(5 AS BIGINT) AS k,
                n_violating_groups, n_violating_rows, min_group,
                CASE WHEN n_rows > 0
                     THEN n_violating_rows * 1000000 // n_rows
                     ELSE 0 END AS violating_ppm
         FROM a""",
    // Equi-depth histogram: position p -> bucket (p-1)*b // n; a
    // value class spans buckets via generate_series, per-bucket count
    // = exact interval overlap; all numerators nonnegative.
    "q181_equi_depth_histogram" ->
      """WITH q AS (SELECT CAST(round(value * 100) AS BIGINT) AS v
                    FROM events WHERE value IS NOT NULL),
         h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1),
         w AS (SELECT v, c,
                      CAST(coalesce(sum(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
         x0 AS (SELECT v, c, below, n,
                       generate_series(below * 8 // n,
                         (below + c - 1) * 8 // n) AS bs
                FROM w CROSS JOIN t),
         x AS (SELECT v, c, below, n, unnest(bs) AS bucket FROM x0),
         y AS (SELECT v, bucket,
                      least(below + c, (bucket * n + n + 7) // 8) -
                      greatest(below + 1, (bucket * n + 7) // 8 + 1) + 1 AS k
               FROM x)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(sum(k) AS BIGINT) AS n_rows,
                CAST(min(v) AS BIGINT) AS min_value,
                CAST(max(v) AS BIGINT) AS max_value
         FROM y WHERE k > 0 GROUP BY 1 ORDER BY 1""",
    // Maintained key stats: the oracle computes entropy + Gini
    // DIRECTLY over the new snapshot — the hash compare is the
    // delta≡rebuild gate for the maintained diagnostics state.
    "q182_key_stats_nightly" ->
      """WITH nsnap AS (SELECT CASE WHEN event_id % 10 = 5
                               THEN user_id + 1000000
                               ELSE user_id END AS user_id
                        FROM events WHERE event_id % 10 <> 7),
         c AS (SELECT CAST(user_id AS VARCHAR) AS key,
                      CAST(count(*) AS BIGINT) AS c
               FROM nsnap GROUP BY 1),
         a AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                        AS BIGINT) AS t
               FROM c),
         cc AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c GROUP BY 1),
         w AS (SELECT c, m,
                      CAST(coalesce(sum(m) OVER (ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS r0
               FROM cc),
         g AS (SELECT CAST(sum(c * (m * r0 + m * (m + 1) // 2))
                        AS BIGINT) AS s
               FROM w)
         SELECT a.n_rows, a.n_keys,
                CAST(round(ln(a.n_rows) * 1e6) AS BIGINT) - a.t // a.n_rows
                  AS entropy_micro,
                CAST(round(ln(a.n_keys) * 1e6) AS BIGINT)
                  AS max_entropy_micro,
                CASE WHEN CAST(round(ln(a.n_keys) * 1e6) AS BIGINT) > 0
                     THEN (CAST(round(ln(a.n_rows) * 1e6) AS BIGINT)
                           - a.t // a.n_rows) * 1000000
                          // CAST(round(ln(a.n_keys) * 1e6) AS BIGINT)
                     ELSE 1000000 END AS balance_ppm,
                CASE WHEN a.n_rows <= 0 OR a.n_keys <= 1 THEN 0
                     ELSE (2 * g.s - (a.n_keys + 1) * a.n_rows) * 1000000
                          // (a.n_keys * a.n_rows) END AS gini_ppm
         FROM a CROSS JOIN g""",
    // Edit-distance join: deletion-neighborhood candidates (a string
    // plus its delete-one variants, hashed 60-bit) equi-joined, then
    // the exact levenshtein verify — identical classic DP in both
    // engines. unnest stands on its own level (the q181 binder note).
    // Round 11: the per-side variant df-cap (48) mirrored — it does
    // not bind at sf0.01 (max postings 29, measured) but the oracle
    // carries the same contract as the operator.
    "q183_edit_distance_join" ->
      s"""WITH $editJoinSidesSql,
         lvc AS (SELECT * FROM (SELECT lid, ls, h,
                        count(*) OVER (PARTITION BY h) AS n FROM lv)
                 WHERE n <= 48),
         rvc AS (SELECT * FROM (SELECT rid, rs, h,
                        count(*) OVER (PARTITION BY h) AS n FROM rv)
                 WHERE n <= 48),
         cand AS (SELECT DISTINCT lid, rid, ls, rs
                  FROM lvc JOIN rvc USING (h) WHERE lid <> rid)
         SELECT lid AS left_id, rid AS right_id,
                ls AS left_str, rs AS right_str,
                CAST(levenshtein(ls, rs) AS BIGINT) AS distance
         FROM cand WHERE levenshtein(ls, rs) <= 1
         ORDER BY left_id, right_id""",
    // Stickiness: sliding distinct via the user-day rollup spread to
    // its 28 target days; week/month split read off the offset.
    "q184_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS day
                     FROM events),
         dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                 FROM ud GROUP BY 1),
         os AS (SELECT CAST(unnest(generate_series(0, 27)) AS INTEGER) AS o),
         t AS (SELECT u, o, day + o AS d FROM ud CROSS JOIN os),
         w AS (SELECT d AS day,
                      CAST(count(DISTINCT CASE WHEN o <= 6 THEN u END)
                        AS BIGINT) AS wau,
                      CAST(count(DISTINCT u) AS BIGINT) AS mau
               FROM t GROUP BY 1)
         SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, w.wau, w.mau,
                dau.dau * 1000000 // w.wau AS stickiness_ppm
         FROM dau JOIN w USING (day) ORDER BY day""",
    // Center crop: the synthesized raster byte i is text byte i
    // (zero-filled past the text), so the crop checksum mirrors as
    // index arithmetic — the q31/q167 blob-mirroring convention.
    "q185_image_crop" ->
      """WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h
                    FROM documents),
         c AS (SELECT doc_id, text, len, w, h,
                      least(4, w) AS cw, least(4, h) AS ch,
                      (w - least(4, w)) // 2 AS x0,
                      (h - least(4, h)) // 2 AS y0
               FROM m),
         ys AS (SELECT doc_id, text, len, w, h, cw, ch, x0, y0,
                       unnest(range(ch)) AS dy
                FROM c),
         js AS (SELECT doc_id, text, len, w, h, cw, ch,
                       ((y0 + dy) * w + x0) * 3 AS base,
                       unnest(range(cw * 3)) AS j
                FROM ys),
         px AS (SELECT doc_id, w, h, cw, ch,
                       CASE WHEN base + j < len
                            THEN ord(substr(text,
                              CAST(base + j AS INTEGER) + 1, 1))
                            ELSE 0 END AS v
                FROM js)
         SELECT doc_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(cw AS BIGINT) AS crop_w, CAST(ch AS BIGINT) AS crop_h,
                CAST(sum(v) AS BIGINT) AS px_checksum
         FROM px GROUP BY doc_id, w, h, cw, ch ORDER BY doc_id""",
    // Weekday-adjusted z: per-(key, weekday) group stats, exact
    // integer numerator, one sqrt + one divide rounded to 6 (the
    // q123 bit-identical-IEEE convention); DuckDB dayofweek + 1.
    "q186_weekday_zscore" ->
      """WITH daily AS (SELECT event_type AS key, ts::DATE AS d,
                               CAST(count(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
         gd AS (SELECT key, d, n,
                       CAST(dayofweek(d) + 1 AS BIGINT) AS g
                FROM daily),
         st AS (SELECT key, d, g, n,
                       CAST(count(*) OVER pw AS BIGINT) AS ng,
                       CAST(sum(n) OVER pw AS BIGINT) AS s,
                       CAST(sum(n * n) OVER pw AS BIGINT) AS ss
                FROM gd
                WINDOW pw AS (PARTITION BY key, g)),
         z AS (SELECT key, CAST(d AS VARCHAR) AS day, g AS weekday, n,
                      CASE WHEN ng >= 2 AND ss * ng - s * s > 0
                           THEN round((n * ng - s) / sqrt(ss * ng - s * s), 6)
                           END AS z
               FROM st)
         SELECT key, day, weekday, n, z,
                coalesce(abs(z) >= 3.0, false) AS anomaly
         FROM z ORDER BY key, day""",
    // Benford: the same Scala constants unroll to the VALUES list;
    // first digit off the decimal string, never a float log10.
    "q187_benford_audit" -> s"""
         WITH exp AS (SELECT * FROM (VALUES ${
           graft.operators.Analytics.benfordExpectedPpm
             .map { case (d, p) => s"($d, $p)" }.mkString(", ")
         }) AS t(digit, expected_ppm)),
         q AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS a
               FROM lineitem),
         dg AS (SELECT CAST(substr(CAST(a AS VARCHAR), 1, 1) AS BIGINT)
                  AS digit
                FROM q WHERE a > 0),
         c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
               FROM dg GROUP BY 1),
         t AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tt FROM c),
         j AS (SELECT e.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
                      CASE WHEN t.tt > 0
                           THEN coalesce(c.n, 0) * 1000000 // t.tt
                           ELSE 0 END AS observed_ppm,
                      CAST(e.expected_ppm AS BIGINT) AS expected_ppm
               FROM exp e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t)
         SELECT CAST(digit AS BIGINT) AS digit, n, observed_ppm,
                expected_ppm,
                abs(observed_ppm - expected_ppm) AS deviation_ppm
         FROM j ORDER BY digit""",
    // Funnel step latency: the q166 resolved-times chain, gaps per
    // consecutive pair, then the q169 histogram-prefix percentile
    // lookup per pair.
    "q188_funnel_latency" ->
      """WITH e AS (SELECT user_id AS u,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                           event_type AS typ
                    FROM events),
         c0 AS (SELECT u, min(sec) AS m0 FROM e WHERE typ = 'signup'
                GROUP BY u),
         c1 AS (SELECT e.u, min(sec) AS m1 FROM e JOIN c0 USING (u)
                WHERE typ = 'view' AND sec > m0 AND sec <= m0 + 172800
                GROUP BY e.u),
         c2 AS (SELECT e.u, min(sec) AS m2 FROM e JOIN c1 USING (u)
                WHERE typ = 'click' AND sec > m1 AND sec <= m1 + 172800
                GROUP BY e.u),
         c3 AS (SELECT e.u, min(sec) AS m3 FROM e JOIN c2 USING (u)
                WHERE typ = 'purchase' AND sec > m2 AND sec <= m2 + 172800
                GROUP BY e.u),
         g AS (SELECT 'signup->view' AS pair, m1 - m0 AS gap
               FROM c1 JOIN c0 USING (u)
               UNION ALL
               SELECT 'view->click', m2 - m1 FROM c2 JOIN c1 USING (u)
               UNION ALL
               SELECT 'click->purchase', m3 - m2 FROM c3 JOIN c2 USING (u)),
         h AS (SELECT pair, gap, CAST(count(*) AS BIGINT) AS c
               FROM g GROUP BY 1, 2),
         w AS (SELECT pair, gap, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY pair
                        ORDER BY gap
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT pair, CAST(sum(c) AS BIGINT) AS n
               FROM h GROUP BY pair),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct)
         SELECT w.pair, p.pct, w.gap AS gap_secs
         FROM w JOIN t USING (pair) CROSS JOIN p
         WHERE below < (pct * n + 99) // 100
           AND (pct * n + 99) // 100 <= below + c
         ORDER BY pair, pct""",
    // Weekly retention: ISO Monday weeks in both engines; date
    // subtraction yields days, always a multiple of 7 here.
    "q189_weekly_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
                            CAST(date_trunc('week', ts) AS DATE) AS wk
                     FROM events),
         ch AS (SELECT u, min(wk) AS cw FROM uw GROUP BY u),
         sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_size
                FROM ch GROUP BY cw),
         act AS (SELECT ch.cw, CAST((uw.wk - ch.cw) // 7 AS BIGINT)
                        AS week_offset,
                        CAST(count(*) AS BIGINT) AS n_active
                 FROM uw JOIN ch USING (u) GROUP BY 1, 2)
         SELECT CAST(act.cw AS VARCHAR) AS cohort_week, act.week_offset,
                act.n_active, sz.cohort_size,
                act.n_active * 1000000 // sz.cohort_size AS retention_ppm
         FROM act JOIN sz USING (cw)
         ORDER BY cohort_week, week_offset""",
    // Fulfillment latency: order->ship day gaps per priority through
    // the q169 per-key percentile machinery; DATE minus DATE is days.
    "q190_fulfillment_latency" ->
      """WITH g AS (SELECT o.o_orderpriority AS k,
                           CAST(l.l_shipdate::DATE - o.o_orderdate::DATE
                             AS BIGINT) AS v
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey),
         h AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
               FROM g GROUP BY 1, 2),
         w AS (SELECT k, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY k),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct)
         SELECT w.k AS o_orderpriority, p.pct, w.v AS days
         FROM w JOIN t USING (k) CROSS JOIN p
         WHERE below < (pct * n + 99) // 100
           AND (pct * n + 99) // 100 <= below + c
         ORDER BY o_orderpriority, pct""",
    // CUBE: all four grouping combinations, grouping_id = bit order
    // (returnflag, linestatus) in both engines.
    "q191_cube" ->
      """SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                  AS BIGINT) AS gid,
                coalesce(l_returnflag, 'ALL') AS l_returnflag,
                coalesce(l_linestatus, 'ALL') AS l_linestatus,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    // Session depth: the q35 gap-islands derivation, rolled into
    // integer-log2 event-count buckets with span extremes.
    "q192_session_depth" ->
      """WITH m AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         g AS (SELECT user_id, ts,
                      SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM m),
         sess AS (SELECT user_id, sid,
                         CAST(count(*) AS BIGINT) AS n_events,
                         CAST(floor(epoch(max(ts))) AS BIGINT) -
                           CAST(floor(epoch(min(ts))) AS BIGINT) AS span
                  FROM g GROUP BY 1, 2)
         SELECT CAST(length(bin(n_events)) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(min(n_events) AS BIGINT) AS min_events,
                CAST(max(n_events) AS BIGINT) AS max_events,
                CAST(max(span) AS BIGINT) AS max_span_secs
         FROM sess GROUP BY 1 ORDER BY 1""",
    // WoW: weekly counts + lag delta in exact ppm; delta may be
    // negative, but DuckDB // floors while Spark div truncates —
    // (n - prev) and prev are both handled via the same // on a
    // nonneg... see note: deltas CAN be negative, so mirror Spark's
    // truncate-toward-zero with a sign split.
    "q193_wow_metrics" ->
      """WITH w AS (SELECT event_type,
                           CAST(date_trunc('week', ts) AS DATE) AS wk,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, wk, n,
                      lag(n) OVER (PARTITION BY event_type ORDER BY wk)
                        AS prev
               FROM w)
         SELECT event_type, CAST(wk AS VARCHAR) AS week, n, prev,
                CASE WHEN prev IS NULL OR prev <= 0 THEN NULL
                     WHEN n >= prev THEN (n - prev) * 1000000 // prev
                     ELSE -((prev - n) * 1000000 // prev) END
                  AS wow_delta_ppm
         FROM l ORDER BY event_type, week""",
    // Cohort funnel: the q166 resolved chain bucketed by a PURE
    // integer Monday-aligned week of m0 (no engine timezone in play).
    "q194_cohort_funnel" ->
      """WITH e AS (SELECT user_id AS u,
                           CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                           event_type AS typ
                    FROM events),
         c0 AS (SELECT u, min(sec) AS m0 FROM e WHERE typ = 'signup'
                GROUP BY u),
         c1 AS (SELECT e.u, min(sec) AS m1 FROM e JOIN c0 USING (u)
                WHERE typ = 'view' AND sec > m0 AND sec <= m0 + 172800
                GROUP BY e.u),
         c2 AS (SELECT e.u, min(sec) AS m2 FROM e JOIN c1 USING (u)
                WHERE typ = 'click' AND sec > m1 AND sec <= m1 + 172800
                GROUP BY e.u),
         c3 AS (SELECT e.u, min(sec) AS m3 FROM e JOIN c2 USING (u)
                WHERE typ = 'purchase' AND sec > m2 AND sec <= m2 + 172800
                GROUP BY e.u),
         r AS (SELECT c0.u, c0.m0, c1.m1, c2.m2, c3.m3,
                      DATE '1970-01-01' + CAST(4 + 7 *
                        ((m0 // 86400 - 4) // 7) AS INTEGER) AS cw
               FROM c0 LEFT JOIN c1 USING (u) LEFT JOIN c2 USING (u)
                       LEFT JOIN c3 USING (u)),
         g AS (SELECT cw, CAST(count(m0) AS BIGINT) AS n0,
                      CAST(count(m1) AS BIGINT) AS n1,
                      CAST(count(m2) AS BIGINT) AS n2,
                      CAST(count(m3) AS BIGINT) AS n3
               FROM r GROUP BY cw)
         SELECT CAST(cw AS VARCHAR) AS cohort_week, step_idx, step,
                n_users, n_users * 1000000 // n0 AS conversion_ppm
         FROM (SELECT cw, 0 AS step_idx, 'signup' AS step,
                      n0 AS n_users, n0 FROM g
               UNION ALL SELECT cw, 1, 'view', n1, n0 FROM g
               UNION ALL SELECT cw, 2, 'click', n2, n0 FROM g
               UNION ALL SELECT cw, 3, 'purchase', n3, n0 FROM g)
         ORDER BY cohort_week, step_idx""",
    // A/B harness: same salted hash split, exact counts; z evaluates
    // in the SAME left-assoc IEEE op order as the Spark chain
    // ((X/N)*(N-X))*n_a)*n_b then sqrt then divide, round 6.
    "q195_ab_test" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS u,
                     CASE WHEN max(CASE WHEN event_type = 'purchase'
                                        THEN 1 END) IS NULL THEN 0
                          ELSE 1 END AS conv
               FROM events GROUP BY 1),
         a AS (SELECT ('0x' || substr(md5('ab:exp1:' || u), 1, 15))::BIGINT
                        % 2 AS arm, conv
               FROM pu),
         arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(conv) AS BIGINT) AS x
                  FROM a GROUP BY 1),
         w AS (SELECT
                 CAST(coalesce(sum(CASE WHEN arm = 0 THEN n END), 0)
                   AS BIGINT) AS n_a,
                 CAST(coalesce(sum(CASE WHEN arm = 0 THEN x END), 0)
                   AS BIGINT) AS x_a,
                 CAST(coalesce(sum(CASE WHEN arm = 1 THEN n END), 0)
                   AS BIGINT) AS n_b,
                 CAST(coalesce(sum(CASE WHEN arm = 1 THEN x END), 0)
                   AS BIGINT) AS x_b
               FROM arms),
         z AS (SELECT n_a, x_a, n_b, x_b,
                      x_a * 1000000 // n_a AS rate_a_ppm,
                      x_b * 1000000 // n_b AS rate_b_ppm,
                      CASE WHEN n_a > 0 AND n_b > 0
                             AND x_a + x_b > 0
                             AND x_a + x_b < n_a + n_b
                           THEN round(
                             CAST(x_a * n_b - x_b * n_a AS DOUBLE) /
                             sqrt(CAST(x_a + x_b AS DOUBLE) /
                                  CAST(n_a + n_b AS DOUBLE) *
                                  CAST(n_a + n_b - x_a - x_b AS DOUBLE) *
                                  CAST(n_a AS DOUBLE) *
                                  CAST(n_b AS DOUBLE)), 6)
                           END AS z
               FROM w)
         SELECT n_a, x_a, n_b, x_b, rate_a_ppm, rate_b_ppm, z,
                coalesce(abs(z) >= 1.96, false) AS significant
         FROM z""",
    // Lorenz: the q181 bucket machinery with value mass v*overlap
    // and a cumulative share; unnest on its own level (q181 note).
    "q196_revenue_pareto" ->
      """WITH rev AS (SELECT o.o_custkey,
                             CAST(sum(CAST(round(l.l_extendedprice * 100)
                               AS BIGINT)) AS BIGINT) AS v
                      FROM orders o
                      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                      GROUP BY 1),
         h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM rev GROUP BY 1),
         w AS (SELECT v, c,
                      CAST(coalesce(sum(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS below
               FROM h),
         t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                      CAST(sum(v * c) AS BIGINT) AS tv FROM h),
         x0 AS (SELECT v, c, below, n, tv,
                       generate_series(below * 10 // n,
                         (below + c - 1) * 10 // n) AS bs
                FROM w CROSS JOIN t),
         x AS (SELECT v, c, below, n, tv, unnest(bs) AS bucket FROM x0),
         y AS (SELECT v, tv, bucket,
                      least(below + c, (bucket * n + n + 9) // 10) -
                      greatest(below + 1, (bucket * n + 9) // 10 + 1) + 1 AS k
               FROM x),
         pb AS (SELECT CAST(bucket AS BIGINT) AS bucket,
                       CAST(sum(k) AS BIGINT) AS n_rows,
                       CAST(sum(v * k) AS BIGINT) AS value_sum,
                       CAST(max(tv) AS BIGINT) AS tv
                FROM y WHERE k > 0 GROUP BY 1),
         cu AS (SELECT bucket, n_rows, value_sum,
                       CAST(sum(value_sum) OVER (ORDER BY bucket
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, tv
                FROM pb)
         SELECT bucket, n_rows, value_sum,
                CASE WHEN tv > 0 THEN cum * 1000000 // tv
                     ELSE 0 END AS cum_value_ppm
         FROM cu ORDER BY bucket""",
    // Schema drift: the fixture's generation rules re-derived as null
    // predicates; statuses/types are literal (the fixture IS the
    // schema change).
    "q197_schema_drift" ->
      """WITH o AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN event_id IS NULL THEN 1 END)
                 AS BIGINT) AS eid,
               CAST(count(CASE WHEN user_id IS NULL THEN 1 END)
                 AS BIGINT) AS uid,
               CAST(count(CASE WHEN event_type IS NULL THEN 1 END)
                 AS BIGINT) AS typ,
               CAST(count(CASE WHEN event_id % 7 = 0 OR value IS NULL
                 THEN 1 END) AS BIGINT) AS val,
               CAST(count(CASE WHEN props IS NULL THEN 1 END)
                 AS BIGINT) AS pr
             FROM events),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(CASE WHEN event_id IS NULL THEN 1 END)
                 AS BIGINT) AS eid,
               CAST(count(CASE WHEN event_id % 5 = 0 OR user_id IS NULL
                 THEN 1 END) AS BIGINT) AS uid,
               CAST(count(CASE WHEN event_type IS NULL THEN 1 END)
                 AS BIGINT) AS typ,
               CAST(count(CASE WHEN value IS NULL THEN 1 END)
                 AS BIGINT) AS val,
               CAST(count(CASE WHEN props IS NULL THEN 1 END)
                 AS BIGINT) AS pr
             FROM events)
         SELECT * FROM (
           SELECT 'event_id' AS "column", 'kept' AS status,
                  'bigint' AS old_type, 'bigint' AS new_type,
                  o.eid * 1000000 // o.n AS old_null_ppm,
                  nn.eid * 1000000 // nn.n AS new_null_ppm
           FROM o, nn
           UNION ALL SELECT 'event_type', 'kept', 'string', 'string',
                  o.typ * 1000000 // o.n, nn.typ * 1000000 // nn.n
           FROM o, nn
           UNION ALL SELECT 'extra', 'added', NULL, 'string',
                  NULL, nn.pr * 1000000 // nn.n
           FROM o, nn
           UNION ALL SELECT 'legacy', 'removed', 'string', NULL,
                  o.pr * 1000000 // o.n, NULL
           FROM o, nn
           UNION ALL SELECT 'user_id', 'kept', 'bigint', 'bigint',
                  o.uid * 1000000 // o.n, nn.uid * 1000000 // nn.n
           FROM o, nn
           UNION ALL SELECT 'value', 'type_changed', 'double', 'string',
                  o.val * 1000000 // o.n, nn.val * 1000000 // nn.n
           FROM o, nn)
         ORDER BY "column"""",
    // Threshold sweep: the q23 candidate CTEs verified once in
    // integer ppm; every threshold reads the same pair relation.
    "q198_dedup_threshold_sweep" ->
      s"""WITH $minHashPairsSql,
         ws AS (SELECT doc_id,
                       list_distinct(string_split(lower(trim(text)), ' ')) AS ws
                FROM documents),
         j AS (SELECT CAST(len(list_intersect(wa.ws, wb.ws)) AS BIGINT)
                        * 1000000
                        // CAST(len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
                        AS jppm
               FROM pairs p
               JOIN ws wa ON wa.doc_id = p.a
               JOIN ws wb ON wb.doc_id = p.b
               WHERE len(list_distinct(wa.ws || wb.ws)) > 0),
         th AS (SELECT CAST(unnest([500000, 700000, 800000, 900000])
                  AS BIGINT) AS threshold_ppm)
         SELECT th.threshold_ppm,
                CAST(count(CASE WHEN j.jppm >= th.threshold_ppm THEN 1 END)
                  AS BIGINT) AS n_pairs
         FROM th CROSS JOIN j GROUP BY 1 ORDER BY 1""",
    // KS: both CDFs advance on ONE shared value histogram, the
    // scaled gap |cumA*nB - cumB*nA| exact, smallest-v supremum.
    "q199_ks_drift" ->
      """WITH q AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                    FROM documents
                    WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
         h AS (SELECT v,
                      CAST(count(CASE WHEN g = 'en' THEN 1 END)
                        AS BIGINT) AS ca,
                      CAST(count(CASE WHEN g = 'de' THEN 1 END)
                        AS BIGINT) AS cb
               FROM q GROUP BY 1),
         c AS (SELECT v,
                      CAST(sum(ca) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                      CAST(sum(cb) OVER (ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
               FROM h),
         t AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                      CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb
               FROM h),
         d AS (SELECT na, nb, abs(cuma * nb - cumb * na) AS d, v
               FROM c CROSS JOIN t),
         m AS (SELECT na, nb, d, v,
                      row_number() OVER (ORDER BY d DESC, v ASC) AS rn
               FROM d)
         SELECT na AS n_a, nb AS n_b,
                CASE WHEN na = 0 OR nb = 0 THEN 0
                     ELSE d * 1000000 // (na * nb) END AS ks_ppm,
                CAST(v AS BIGINT) AS at_value
         FROM m WHERE rn = 1""",
    // Health report: every fragment is the corresponding gated
    // oracle reduced to its scalar, unioned long-format.
    "q200_health_report" -> s"""
         WITH c1 AS (SELECT CAST(user_id AS VARCHAR) AS key,
                            CAST(count(*) AS BIGINT) AS c
                     FROM events GROUP BY 1),
         a1 AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                       CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                         AS BIGINT) AS t
                FROM c1),
         cc2 AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM c1 GROUP BY 1),
         w2 AS (SELECT c, m,
                       CAST(coalesce(sum(m) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS BIGINT) AS r0
                FROM cc2),
         a2 AS (SELECT CAST(sum(c * m) AS BIGINT) AS n_rows,
                       CAST(sum(m) AS BIGINT) AS n_keys,
                       CAST(sum(c * (m * r0 + m * (m + 1) // 2))
                         AS BIGINT) AS s2
                FROM w2),
         cf AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                       CAST(count(*) AS BIGINT) AS c
                FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         pf AS MATERIALIZED (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS key
                FROM orders WHERE o_orderkey IS NOT NULL),
         ofk AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS orows
                 FROM cf WHERE NOT EXISTS
                   (SELECT 1 FROM pf WHERE pf.key = cf.key)),
         bfk AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS crows
                 FROM cf),
         expb AS (SELECT * FROM (VALUES ${
           graft.operators.Analytics.benfordExpectedPpm
             .map { case (d, p) => s"($d, $p)" }.mkString(", ")
         }) AS t(digit, expected_ppm)),
         qb AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS a
                FROM lineitem),
         dgb AS (SELECT CAST(substr(CAST(a AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
                 FROM qb WHERE a > 0),
         cb AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
                FROM dgb GROUP BY 1),
         tb AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tt FROM cb),
         jb AS (SELECT CASE WHEN tb.tt > 0
                            THEN coalesce(cb.n, 0) * 1000000 // tb.tt
                            ELSE 0 END AS observed_ppm,
                       CAST(e.expected_ppm AS BIGINT) AS expected_ppm
                FROM expb e LEFT JOIN cb ON e.digit = cb.digit
                     CROSS JOIN tb),
         qk AS (SELECT lang, source, n_chars // 100 AS len_bucket
                FROM documents),
         gk AS (SELECT lang, source, len_bucket,
                       CAST(count(*) AS BIGINT) AS c
                FROM qk GROUP BY 1, 2, 3),
         ak AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                       CAST(coalesce(sum(c) FILTER (WHERE c < 5), 0)
                         AS BIGINT) AS vrows
                FROM gk),
         qs AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                FROM documents
                WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
         hs AS (SELECT v,
                       CAST(count(CASE WHEN g = 'en' THEN 1 END)
                         AS BIGINT) AS ca,
                       CAST(count(CASE WHEN g = 'de' THEN 1 END)
                         AS BIGINT) AS cb2
                FROM qs GROUP BY 1),
         cs AS (SELECT v,
                       CAST(sum(ca) OVER (ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
                       CAST(sum(cb2) OVER (ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
                FROM hs),
         ts AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                       CAST(coalesce(sum(cb2), 0) AS BIGINT) AS nb
                FROM hs),
         ds AS (SELECT na, nb, abs(cuma * nb - cumb * na) AS d
                FROM cs CROSS JOIN ts),
         mks AS (SELECT CASE WHEN max(na) = 0 OR max(nb) = 0 THEN 0
                             ELSE max(d) * 1000000 // (max(na) * max(nb))
                        END AS ksv
                 FROM ds),
         dup AS (SELECT (count(*) - count(DISTINCT md5(text)))
                          * 1000000 // count(*) AS dv
                 FROM documents)
         SELECT metric, CAST(value AS BIGINT) AS value FROM (
           SELECT 'key_balance_ppm' AS metric,
                  CASE WHEN CAST(round(ln(n_keys) * 1e6) AS BIGINT) > 0
                       THEN (CAST(round(ln(n_rows) * 1e6) AS BIGINT)
                             - t // n_rows) * 1000000
                            // CAST(round(ln(n_keys) * 1e6) AS BIGINT)
                       ELSE 1000000 END AS value
           FROM a1
           UNION ALL
           SELECT 'key_gini_ppm',
                  CASE WHEN n_rows <= 0 OR n_keys <= 1 THEN 0
                       ELSE (2 * s2 - (n_keys + 1) * n_rows) * 1000000
                            // (n_keys * n_rows) END
           FROM a2
           UNION ALL
           SELECT 'fk_orphan_ppm',
                  CASE WHEN crows > 0 THEN orows * 1000000 // crows
                       ELSE 0 END
           FROM bfk CROSS JOIN ofk
           UNION ALL
           SELECT 'benford_deviation_ppm',
                  CAST(sum(abs(observed_ppm - expected_ppm)) AS BIGINT)
           FROM jb
           UNION ALL
           SELECT 'k_anonymity_violating_ppm',
                  CASE WHEN n_rows > 0 THEN vrows * 1000000 // n_rows
                       ELSE 0 END
           FROM ak
           UNION ALL
           SELECT 'ks_en_de_ppm', ksv FROM mks
           UNION ALL
           SELECT 'exact_dup_ppm', dv FROM dup)
         ORDER BY metric""",
    // Heavy hitters: the same Count-Min candidate pass + exact verify,
    // re-derived over the same salted md5 buckets.
    "q201_heavy_hitters" -> """
         WITH r AS (SELECT CAST(event_type AS VARCHAR) AS key FROM events
                    WHERE event_type IS NOT NULL),
         t AS (SELECT greatest(1, count(*) * 50000 // 1000000) AS thr FROM r),
         s0 AS (SELECT ('0x' || substr(md5('cm0:' || key), 1, 15))::BIGINT
                         % 1024 AS b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1),
         s1 AS (SELECT ('0x' || substr(md5('cm1:' || key), 1, 15))::BIGINT
                         % 1024 AS b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1),
         s2 AS (SELECT ('0x' || substr(md5('cm2:' || key), 1, 15))::BIGINT
                         % 1024 AS b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1),
         surv AS (SELECT r.key FROM r
                  JOIN s0 ON ('0x' || substr(md5('cm0:' || r.key), 1, 15))
                               ::BIGINT % 1024 = s0.b
                  JOIN s1 ON ('0x' || substr(md5('cm1:' || r.key), 1, 15))
                               ::BIGINT % 1024 = s1.b
                  JOIN s2 ON ('0x' || substr(md5('cm2:' || r.key), 1, 15))
                               ::BIGINT % 1024 = s2.b
                  CROSS JOIN t
                  WHERE s0.c >= t.thr AND s1.c >= t.thr AND s2.c >= t.thr),
         ex AS (SELECT key, CAST(count(*) AS BIGINT) AS n_rows
                FROM surv GROUP BY 1)
         SELECT key, n_rows FROM ex CROSS JOIN t
         WHERE n_rows >= thr
         ORDER BY n_rows DESC, key""",
    // Nearest-neighbor resize: the q185 index-arithmetic mirror with
    // the floor source mapping (dx*w//8, dy*h//8) instead of the crop
    // window.
    "q202_image_resize" -> """
         WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h
                    FROM documents),
         ys AS (SELECT doc_id, text, len, w, h, unnest(range(8)) AS dy
                FROM m),
         xs AS (SELECT doc_id, text, len, w, h, (dy * h) // 8 AS sy,
                       unnest(range(8)) AS dx
                FROM ys),
         js AS (SELECT doc_id, text, len, w, h,
                       (sy * w + (dx * w) // 8) * 3 AS base,
                       unnest(range(3)) AS j
                FROM xs),
         px AS (SELECT doc_id, w, h,
                       CASE WHEN base + j < len
                            THEN ord(substr(text,
                              CAST(base + j AS INTEGER) + 1, 1))
                            ELSE 0 END AS v
                FROM js)
         SELECT doc_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
                CAST(sum(v) AS BIGINT) AS px_checksum
         FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",
    // Contribution analysis: same floor-share + winner-absorbs-the-
    // remainder arithmetic; the winner picked by ORDER BY ... LIMIT 1
    // mirrors the struct-min (largest |delta|, then smallest name).
    "q203_contribution" -> """
         WITH e AS (SELECT event_type AS segment,
                           (ts::DATE - DATE '1970-01-01') % 2 AS par
                    FROM events),
         seg AS (SELECT CAST(segment AS VARCHAR) AS segment,
                        CAST(count(*) FILTER (WHERE par = 0) AS BIGINT)
                          AS n_a,
                        CAST(count(*) FILTER (WHERE par = 1) AS BIGINT)
                          AS n_b
                 FROM e GROUP BY 1),
         d AS (SELECT segment, n_a, n_b, n_b - n_a AS delta FROM seg),
         t AS (SELECT CAST(coalesce(sum(abs(delta)), 0) AS BIGINT) AS s
               FROM d),
         w AS (SELECT segment AS wseg FROM d
               ORDER BY abs(delta) DESC, segment LIMIT 1),
         b AS (SELECT segment, n_a, n_b, delta,
                      CASE WHEN t.s > 0
                           THEN abs(delta) * 1000000 // t.s
                           ELSE 0 END AS base
               FROM d CROSS JOIN t),
         fs AS (SELECT CAST(coalesce(sum(base), 0) AS BIGINT) AS f FROM b)
         SELECT segment, n_a, n_b, CAST(delta AS BIGINT) AS delta,
                CAST(base + CASE WHEN t.s > 0 AND segment = w.wseg
                                 THEN 1000000 - fs.f
                                 ELSE 0 END AS BIGINT) AS share_ppm
         FROM b CROSS JOIN t CROSS JOIN w CROSS JOIN fs
         ORDER BY segment""",
    // Chi-square: the same full-grid construction; each cell's micro
    // term is the identical stated IEEE chain (long-exact d, cast,
    // d*d / ((r*c)::DOUBLE * n::DOUBLE) * 1e6, round), then an exact
    // integer sum. DuckDB dayofweek is 0-based (q186 convention).
    "q204_chi_square" -> """
         WITH e AS (SELECT CAST(event_type AS VARCHAR) AS a,
                           CAST(dayofweek(ts::DATE) + 1 AS VARCHAR) AS b
                    FROM events
                    WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
                   FROM e GROUP BY 1, 2),
         rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
         ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
         t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                      CAST(count(DISTINCT a) AS BIGINT) AS n_a,
                      CAST(count(DISTINCT b) AS BIGINT) AS n_b
               FROM cells),
         grid AS (SELECT rt.a, ct.b, rt.r, ct.c,
                         CAST(coalesce(cells.o, 0) AS BIGINT) AS o
                  FROM rt CROSS JOIN ct
                  LEFT JOIN cells ON rt.a = cells.a AND ct.b = cells.b),
         dd AS (SELECT r, c, o, n, n_a, n_b,
                       CAST(o * n - r * c AS BIGINT) AS d
                FROM grid CROSS JOIN t),
         terms AS (SELECT n, n_a, n_b,
                          CAST(round(d::DOUBLE * d::DOUBLE
                            / ((r * c)::DOUBLE * n::DOUBLE) * 1000000)
                            AS BIGINT) AS term
                   FROM dd)
         SELECT n AS n_rows, n_a, n_b,
                CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
                CAST(sum(term) AS BIGINT) AS chi2_micro
         FROM terms GROUP BY n, n_a, n_b""",
    // Triangle census: the q198 verified-pair relation at >= 0.5
    // Jaccard, canonicalized, wedges via degrees, each triangle
    // counted once through its middle vertex.
    "q205_dup_triangles" ->
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
         e AS (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
               FROM vp WHERE a <> b),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT x AS v FROM e UNION ALL SELECT y FROM e) u
                 GROUP BY 1),
         shape AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                          CAST(coalesce(sum(d * (d - 1) // 2), 0)
                            AS BIGINT) AS n_wedges
                   FROM deg),
         ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                FROM e e1 JOIN e e2 ON e1.y = e2.x
                WHERE EXISTS (SELECT 1 FROM e e3
                              WHERE e3.x = e1.x AND e3.y = e2.y))
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
                CASE WHEN n_wedges > 0
                     THEN 3 * n_triangles * 1000000 // n_wedges
                     ELSE 0 END AS clustering_ppm
         FROM shape CROSS JOIN ne CROSS JOIN tr""",
    // Silence trim: the q85 cyclic-sample synthesis mirrored; the
    // loud-index list gives lead/trail, the 1-based inclusive slice
    // sums the kept span.
    "q206_audio_trim" -> """
         WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 50 + 10 AS n
                    FROM documents),
         s AS (SELECT doc_id, n,
                      list_transform(range(n),
                        i -> abs(CAST((CASE WHEN len = 0 THEN 0
                               ELSE ord(substr(text,
                                 CAST(i % len AS INTEGER) + 1, 1))
                               END - 128) * 128 AS BIGINT))) AS a
               FROM m),
         idx AS (SELECT doc_id, n, a,
                        list_filter(range(n),
                          i -> a[CAST(i AS INTEGER) + 1] >= 2048) AS loud
                 FROM s),
         t AS (SELECT doc_id, n,
                      CASE WHEN len(loud) = 0 THEN n
                           ELSE loud[1] END AS lead,
                      CASE WHEN len(loud) = 0 THEN 0
                           ELSE n - 1 - loud[len(loud)] END AS trail,
                      CASE WHEN len(loud) = 0 THEN 0
                           ELSE list_sum(a[CAST(loud[1] AS INTEGER) + 1
                                           : CAST(loud[len(loud)]
                                               AS INTEGER) + 1])
                      END AS kept
               FROM idx)
         SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
                CAST(lead AS BIGINT) AS n_leading,
                CAST(trail AS BIGINT) AS n_trailing,
                CAST(n - lead - trail AS BIGINT) AS n_kept,
                CAST(kept AS BIGINT) AS kept_abs_sum
         FROM t ORDER BY doc_id""",
    // Cross-correlation: the q151 exact-centering scheme on the
    // shared day axis; the IEEE tail (two sqrts, multiply, divide,
    // round 6) mirrors the Spark chain op for op.
    "q207_cross_correlation" -> """
         WITH daily AS (SELECT ts::DATE AS day,
                               CAST(count(*) FILTER (WHERE event_type
                                 = 'signup') AS BIGINT) AS x,
                               CAST(count(*) FILTER (WHERE event_type
                                 = 'purchase') AS BIGINT) AS y
                        FROM events
                        WHERE event_type IN ('signup', 'purchase')
                        GROUP BY 1),
         w AS (SELECT day, x, y,
                      CAST(count(*) OVER () AS BIGINT) AS n,
                      CAST(sum(x) OVER () AS BIGINT) AS tx,
                      CAST(sum(y) OVER () AS BIGINT) AS ty
               FROM daily),
         d AS (SELECT day, n, x * n - tx AS dx, y * n - ty AS dy FROM w),
         l AS (SELECT n, dx, dy,
                      lead(dy, 7) OVER (ORDER BY day) AS dyl
               FROM d),
         a AS (SELECT CAST(max(n) AS BIGINT) AS n_days,
                      CAST(coalesce(sum(dx * dyl), 0) AS BIGINT) AS num,
                      CAST(sum(dx * dx) AS BIGINT) AS den_x,
                      CAST(sum(dy * dy) AS BIGINT) AS den_y
               FROM l)
         SELECT 'signup' AS type_x, 'purchase' AS type_y,
                CAST(7 AS BIGINT) AS lag, n_days, num, den_x, den_y,
                CASE WHEN den_x > 0 AND den_y > 0
                     THEN round(num::DOUBLE
                       / (sqrt(den_x::DOUBLE) * sqrt(den_y::DOUBLE)), 6)
                     ELSE NULL END AS r
         FROM a""",
    // Audience overlap: the same distinct (user, type) relation
    // self-joined, grid zero-filled, exact ppm Jaccard.
    "q208_audience_overlap" -> """
         WITH ut AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS u,
                            CAST(event_type AS VARCHAR) AS t
                     FROM events
                     WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         tot AS (SELECT t, CAST(count(*) AS BIGINT) AS n
                 FROM ut GROUP BY 1),
         b AS (SELECT a.t AS type_a, c.t AS type_b,
                      CAST(count(*) AS BIGINT) AS n_both
               FROM ut a JOIN ut c ON a.u = c.u AND a.t < c.t
               GROUP BY 1, 2),
         grid AS (SELECT ta.t AS type_a, tb.t AS type_b,
                         ta.n AS n_a, tb.n AS n_b,
                         CAST(coalesce(b.n_both, 0) AS BIGINT) AS n_both
                  FROM tot ta CROSS JOIN tot tb
                  LEFT JOIN b ON b.type_a = ta.t AND b.type_b = tb.t
                  WHERE ta.t < tb.t)
         SELECT type_a, type_b, n_a, n_b, n_both,
                CAST(n_both * 1000000 // (n_a + n_b - n_both) AS BIGINT)
                  AS jaccard_ppm
         FROM grid ORDER BY type_a, type_b""",
    // EWMA: the identical integer recurrence as a recursive CTE —
    // the oracle engine walks day i from day i-1 exactly as the
    // driver fold does. SHARED by the batch q209 and the streaming
    // q212 (the gate: replay-to-completion must equal the batch).
    "q209_ewma_baseline" -> ewmaOracleSql,
    "q212_streaming_ewma" -> ewmaOracleSql,
    // Mann-Whitney: doubled midranks off the q199 shared histogram;
    // 2R_A = sum ca*(2*r0 + m + 1) with the exclusive prefix.
    "q210_mann_whitney" -> """
         WITH q AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v
                    FROM documents
                    WHERE lang IN ('en', 'de') AND n_chars IS NOT NULL),
         h AS (SELECT v,
                      CAST(count(CASE WHEN g = 'en' THEN 1 END)
                        AS BIGINT) AS ca,
                      CAST(count(CASE WHEN g = 'de' THEN 1 END)
                        AS BIGINT) AS cb
               FROM q GROUP BY 1),
         c AS (SELECT v, ca, cb, ca + cb AS m,
                      CAST(coalesce(sum(ca + cb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS r0
               FROM h),
         t AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                      CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb,
                      CAST(coalesce(sum(ca * (2 * r0 + m + 1)), 0)
                        AS BIGINT) AS r2a
               FROM c)
         SELECT na AS n_a, nb AS n_b,
                CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
                CAST(2 * na * nb - (r2a - na * (na + 1)) AS BIGINT)
                  AS u2_b,
                CASE WHEN na = 0 OR nb = 0 THEN 0
                     ELSE (r2a - na * (na + 1)) * 1000000
                          // (2 * na * nb) END AS auc_ppm
         FROM t""",
    // KL: per-category micro terms via the identical stated chain
    // (exact-long ratios through one ln), summed exactly; weekday =
    // Spark dayofweek 2..6 = DuckDB dayofweek+1 in 2..6.
    "q211_kl_divergence" -> """
         WITH e AS (SELECT CAST(event_type AS VARCHAR) AS cat,
                           CASE WHEN dayofweek(ts::DATE) + 1 BETWEEN 2
                                  AND 6
                                THEN 'weekday' ELSE 'weekend' END AS g
                    FROM events WHERE event_type IS NOT NULL),
         cells AS (SELECT cat,
                          CAST(count(CASE WHEN g = 'weekday' THEN 1 END)
                            AS BIGINT) AS a,
                          CAST(count(CASE WHEN g = 'weekend' THEN 1 END)
                            AS BIGINT) AS b
                   FROM e GROUP BY 1),
         t AS (SELECT CAST(coalesce(sum(a), 0) AS BIGINT) AS ta,
                      CAST(coalesce(sum(b), 0) AS BIGINT) AS tb
               FROM cells),
         terms AS (SELECT a, b, ta, tb,
                          CASE WHEN a = 0 THEN 0
                               WHEN b = 0 THEN NULL
                               ELSE CAST(round(a::DOUBLE / ta::DOUBLE
                                 * ln((a * tb)::DOUBLE / (b * ta)::DOUBLE)
                                 * 1000000) AS BIGINT)
                          END AS term
                   FROM cells CROSS JOIN t),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
                        CAST(count(CASE WHEN a > 0 AND b = 0 THEN 1 END)
                          AS BIGINT) AS n_a_only,
                        CAST(coalesce(max(ta), 0) AS BIGINT) AS n_rows_a,
                        CAST(coalesce(max(tb), 0) AS BIGINT) AS n_rows_b,
                        CAST(sum(term) AS BIGINT) AS kl
                 FROM terms)
         SELECT n_categories, n_a_only, n_rows_a, n_rows_b,
                CASE WHEN n_a_only > 0 OR n_rows_a = 0 OR n_rows_b = 0
                     THEN NULL ELSE kl END AS kl_micro
         FROM agg""",
    // Spearman: both columns' doubled midranks joined back on the
    // value, centered by the exact integer mean rank n+1, Pearson
    // tail in the stated IEEE chain.
    "q213_spearman" -> """
         WITH q AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                           CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS y
                    FROM lineitem
                    WHERE l_quantity IS NOT NULL
                      AND l_extendedprice IS NOT NULL),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
         hx AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM q GROUP BY 1),
         rx AS (SELECT x,
                       2 * CAST(coalesce(sum(m) OVER (ORDER BY x
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) + m + 1 AS r2x
                FROM hx),
         hy AS (SELECT y, CAST(count(*) AS BIGINT) AS m FROM q GROUP BY 1),
         ry AS (SELECT y,
                       2 * CAST(coalesce(sum(m) OVER (ORDER BY y
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) + m + 1 AS r2y
                FROM hy),
         c AS (SELECT r2x - (n + 1) AS cx, r2y - (n + 1) AS cy, n
               FROM q JOIN rx USING (x) JOIN ry USING (y) CROSS JOIN t),
         a AS (SELECT n,
                      CAST(coalesce(sum(cx * cy), 0) AS BIGINT) AS sxy,
                      CAST(coalesce(sum(cx * cx), 0) AS BIGINT) AS sxx,
                      CAST(coalesce(sum(cy * cy), 0) AS BIGINT) AS syy
               FROM c GROUP BY n)
         SELECT n, sxy, sxx, syy,
                CASE WHEN sxx > 0 AND syy > 0
                     THEN round(sxy::DOUBLE
                       / (sqrt(sxx::DOUBLE) * sqrt(syy::DOUBLE)), 6)
                     ELSE NULL END AS rho
         FROM a""",
    // Q-Q: the q169 per-group position selection, en joined to de on
    // the decile.
    "q214_qq_table" -> """
         WITH q AS (SELECT lang AS k, CAST(n_chars AS BIGINT) AS v
                    FROM documents WHERE lang IN ('en', 'de')),
         h AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2),
         w AS (SELECT k, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY k ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS below
               FROM h),
         t AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY k),
         p AS (SELECT CAST(unnest([10, 20, 30, 40, 50, 60, 70, 80, 90])
                 AS BIGINT) AS pct),
         sel AS (SELECT w.k, p.pct, w.v
                 FROM w JOIN t USING (k) CROSS JOIN p
                 WHERE below < (pct * n + 99) // 100
                   AND (pct * n + 99) // 100 <= below + c)
         SELECT e.pct, e.v AS v_en, d.v AS v_de,
                CASE WHEN d.v <> 0 THEN e.v * 1000000 // d.v
                     ELSE NULL END AS ratio_ppm
         FROM sel e JOIN sel d ON e.pct = d.pct
         WHERE e.k = 'en' AND d.k = 'de'
         ORDER BY e.pct""",
    // Peak concurrency: the same +1/-1 sweep per day; the first
    // second attaining the peak mirrors the struct-max.
    "q215_peak_concurrency" -> """
         WITH sess AS (SELECT user_id, ts::DATE AS d,
                              CAST(floor(epoch(min(ts))) AS BIGINT) AS s,
                              CAST(floor(epoch(max(ts))) AS BIGINT) AS e
                       FROM events GROUP BY 1, 2),
         del AS (SELECT d AS day, s AS sec, 1 AS delta FROM sess
                 UNION ALL
                 SELECT d, e + 1, -1 FROM sess),
         h AS (SELECT day, sec, CAST(sum(delta) AS BIGINT) AS dl,
                      CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS ns
               FROM del GROUP BY 1, 2),
         c AS (SELECT day, sec, ns,
                      CAST(sum(dl) OVER (PARTITION BY day ORDER BY sec
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM h),
         t AS (SELECT day, CAST(sum(ns) AS BIGINT) AS n_intervals
               FROM c GROUP BY 1),
         r AS (SELECT day, cum, sec,
                      row_number() OVER (PARTITION BY day
                        ORDER BY cum DESC, sec ASC) AS rn
               FROM c)
         SELECT CAST(r.day AS VARCHAR) AS day, t.n_intervals,
                r.cum AS peak_concurrent, r.sec AS at_second
         FROM r JOIN t USING (day)
         WHERE rn = 1 ORDER BY day""",
    // Winsorize: the q169 position selection pivoted to per-group
    // (lo, hi), clamped row-level.
    "q216_winsorize" -> """
         WITH q AS (SELECT doc_id, CAST(lang AS VARCHAR) AS key,
                           CAST(n_chars AS BIGINT) AS v
                    FROM documents WHERE n_chars IS NOT NULL),
         h AS (SELECT key, v, CAST(count(*) AS BIGINT) AS c
               FROM q GROUP BY 1, 2),
         w AS (SELECT key, v, c,
                      CAST(coalesce(sum(c) OVER (PARTITION BY key
                        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS below
               FROM h),
         t AS (SELECT key, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
         p AS (SELECT CAST(unnest([10, 90]) AS BIGINT) AS pct),
         sel AS (SELECT w.key, p.pct, w.v
                 FROM w JOIN t USING (key) CROSS JOIN p
                 WHERE below < (pct * n + 99) // 100
                   AND (pct * n + 99) // 100 <= below + c),
         lim AS (SELECT key,
                        max(CASE WHEN pct = 10 THEN v END) AS lo,
                        max(CASE WHEN pct = 90 THEN v END) AS hi
                 FROM sel GROUP BY 1)
         SELECT q.doc_id, q.key, q.v,
                greatest(lim.lo, least(lim.hi, q.v)) AS v_clipped,
                lim.lo, lim.hi
         FROM q JOIN lim USING (key) ORDER BY q.doc_id""",
    // Scene changes: q167's frame checksums (every frame, no
    // sampling) + per-doc lag; a cut moves >= 10% of the previous
    // frame's mass.
    "q217_scene_changes" -> """
         WITH m AS (SELECT doc_id, text, strlen(text) AS len,
                           strlen(text) % 13 + 2 AS w,
                           strlen(text) % 7 + 2 AS h,
                           strlen(text) % 5 + 2 AS nf
                    FROM documents),
         fr AS (SELECT doc_id, text, len, w, h, unnest(range(nf)) AS f
                FROM m),
         px AS (SELECT doc_id, f, w, h, len, text,
                       unnest(range(w * h * 3)) AS i
                FROM fr),
         ck AS (SELECT doc_id, f,
                       CAST(sum(ord(substr(text,
                         CAST((i + f) % len AS INTEGER) + 1, 1)))
                         AS BIGINT) AS px_checksum
                FROM px GROUP BY 1, 2),
         d AS (SELECT doc_id, f, px_checksum,
                      lag(px_checksum) OVER (PARTITION BY doc_id
                        ORDER BY f) AS prev
               FROM ck)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
                CAST(count(CASE WHEN prev IS NOT NULL
                           AND abs(px_checksum - prev)
                               >= greatest(1, prev // 10)
                           THEN 1 END) AS BIGINT) AS n_cuts,
                CAST(coalesce(max(abs(px_checksum - prev)), 0) AS BIGINT)
                  AS max_delta
         FROM d GROUP BY doc_id ORDER BY doc_id""",
    // Pettitt: U_t = cum(2R) - t*(n+1) over per-type doubled
    // midranks; the first day maximizing |U| is the split.
    "q218_pettitt" -> """
         WITH daily AS (SELECT CAST(event_type AS VARCHAR) AS typ,
                               ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         h AS (SELECT typ, v, CAST(count(*) AS BIGINT) AS m
               FROM daily GROUP BY 1, 2),
         r AS (SELECT typ, v,
                      2 * CAST(coalesce(sum(m) OVER (PARTITION BY typ
                        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) + m + 1 AS r2
               FROM h),
         j AS (SELECT d.typ, d.day,
                      CAST(count(*) OVER (PARTITION BY d.typ) AS BIGINT)
                        AS n,
                      CAST(row_number() OVER (PARTITION BY d.typ
                        ORDER BY d.day) AS BIGINT) AS t,
                      CAST(sum(r.r2) OVER (PARTITION BY d.typ
                        ORDER BY d.day ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum
               FROM daily d JOIN r ON d.typ = r.typ AND d.v = r.v),
         u AS (SELECT typ, day, n, abs(cum - t * (n + 1)) AS a
               FROM j WHERE t < n),
         mx AS (SELECT typ, day, n, a,
                       row_number() OVER (PARTITION BY typ
                         ORDER BY a DESC, day ASC) AS rn
                FROM u)
         SELECT typ AS event_type, n AS n_days, a AS k2,
                CAST(day AS VARCHAR) AS at_day
         FROM mx WHERE rn = 1
         UNION ALL
         SELECT typ, CAST(count(*) AS BIGINT), CAST(0 AS BIGINT), NULL
         FROM daily GROUP BY typ HAVING count(*) < 2
         ORDER BY event_type""",
    // FD audit: the pair list is generated from the SAME Scala
    // literal as the Spark plan (the minHashCoeffsSql discipline).
    "q219_fd_audit" -> {
      val fdCols =
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val parts = for { a <- fdCols; b <- fdCols if a != b } yield
        s"""SELECT '$a' AS determinant, '$b' AS dependent,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(count(CASE WHEN d > 1 THEN 1 END) AS BIGINT)
                     AS n_violating,
                   CASE WHEN count(*) > 0
                        THEN count(CASE WHEN d > 1 THEN 1 END)
                             * 1000000 // count(*)
                        ELSE 0 END AS violating_ppm
            FROM (SELECT _a, CAST(count(DISTINCT _b) AS BIGINT) AS d
                  FROM (SELECT CAST($a AS VARCHAR) AS _a,
                               CAST($b AS VARCHAR) AS _b
                        FROM orders
                        WHERE $a IS NOT NULL AND $b IS NOT NULL) z
                  GROUP BY _a) g"""
      s"""SELECT * FROM (${parts.mkString(" UNION ALL ")}) u
          ORDER BY determinant, dependent"""
    },
    // Readability: the identical marker-collapse runs counting and
    // the identical IEEE chain (DuckDB regexp_replace needs 'g').
    "q220_readability" -> """
         WITH m AS (SELECT doc_id, text,
                           regexp_replace(lower(text), '[aeiouy]+', 'V',
                             'g') AS r1,
                           regexp_replace(lower(text), '[.!?]+', 'S',
                             'g') AS r2
                    FROM documents WHERE strlen(text) > 0),
         x AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT)
                        AS n_words,
                      greatest(1, CAST(strlen(r2)
                        - strlen(regexp_replace(r2, 'S', '', 'g'))
                        AS BIGINT)) AS n_sentences,
                      CAST(strlen(r1)
                        - strlen(regexp_replace(r1, 'V', '', 'g'))
                        AS BIGINT) AS n_vowel_runs
               FROM m)
         SELECT doc_id, n_words, n_sentences, n_vowel_runs,
                CAST(round((206.835
                  - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                  - 84.6 * (n_vowel_runs::DOUBLE / n_words::DOUBLE))
                  * 1000000) AS BIGINT) AS flesch_micro
         FROM x ORDER BY doc_id""",
    // Behavioral diversity: the q170 entropy arithmetic per user,
    // bucketed quarter-nat; h_micro stays in the min/max columns so
    // the hash is sensitive to the exact per-user values.
    "q221_behavioral_diversity" -> """
         WITH ut AS (SELECT CAST(user_id AS VARCHAR) AS u,
                            CAST(event_type AS VARCHAR) AS t,
                            CAST(count(*) AS BIGINT) AS c
                     FROM events
                     WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                     GROUP BY 1, 2),
         per AS (SELECT u,
                        CAST(sum(c) AS BIGINT) AS n,
                        CAST(count(*) AS BIGINT) AS n_types,
                        CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT))
                          AS BIGINT) AS t
                 FROM ut GROUP BY 1),
         h AS (SELECT u, n_types,
                      CAST(round(ln(n) * 1e6) AS BIGINT) - t // n
                        AS h_micro
               FROM per)
         SELECT greatest(h_micro, 0) // 250000 AS bucket,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(min(h_micro) AS BIGINT) AS min_h_micro,
                CAST(max(h_micro) AS BIGINT) AS max_h_micro,
                CAST(max(n_types) AS BIGINT) AS max_types
         FROM h GROUP BY 1 ORDER BY 1""",
    // Frequency response: strict-before touch counts, cap+1 buckets,
    // exact conversion ppm.
    "q222_frequency_response" -> """
         WITH e AS (SELECT CAST(user_id AS VARCHAR) AS u, ts,
                           CAST(event_type AS VARCHAR) AS t
                    FROM events WHERE user_id IS NOT NULL),
         per AS (SELECT u,
                        min(CASE WHEN t = 'purchase' THEN ts END)
                          AS conv_ts,
                        CAST(count(CASE WHEN t = 'view' THEN 1 END)
                          AS BIGINT) AS all_touches
                 FROM e GROUP BY 1),
         pre AS (SELECT e.u, CAST(count(*) AS BIGINT) AS pre_touches
                 FROM e JOIN per ON e.u = per.u
                 WHERE e.t = 'view' AND per.conv_ts IS NOT NULL
                   AND e.ts < per.conv_ts
                 GROUP BY 1),
         j AS (SELECT per.u,
                      per.conv_ts IS NOT NULL AS converted,
                      CASE WHEN per.conv_ts IS NOT NULL
                           THEN coalesce(pre.pre_touches, 0)
                           ELSE per.all_touches END AS touches
               FROM per LEFT JOIN pre ON per.u = pre.u)
         SELECT least(touches, 10) AS touch_bucket,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(count(CASE WHEN converted THEN 1 END) AS BIGINT)
                  AS n_converted,
                CAST(count(CASE WHEN converted THEN 1 END) * 1000000
                  // count(*) AS BIGINT) AS conversion_ppm
         FROM j GROUP BY 1 ORDER BY 1""",
    // Aggregate consistency: cent-quantized parent total vs child
    // rollup, relative gap in exact ppm, childless split out.
    "q223_agg_consistency" -> """
         WITH p AS (SELECT CAST(o_orderkey AS VARCHAR) AS key,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                             AS pv
                    FROM orders
                    WHERE o_orderkey IS NOT NULL
                      AND o_totalprice IS NOT NULL),
         c AS (SELECT CAST(l_orderkey AS VARCHAR) AS key,
                      CAST(sum(CAST(round(l_extendedprice * 100)
                        AS BIGINT)) AS BIGINT) AS cs
               FROM lineitem
               WHERE l_orderkey IS NOT NULL
                 AND l_extendedprice IS NOT NULL
               GROUP BY 1),
         j AS (SELECT p.key, c.cs IS NULL AS childless,
                      CASE WHEN c.cs IS NULL THEN 0
                           ELSE abs(p.pv - c.cs) * 1000000
                                // greatest(1, abs(p.pv)) END
                        AS rel_gap_ppm
               FROM p LEFT JOIN c ON p.key = c.key),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_parents,
                      CAST(count(CASE WHEN childless THEN 1 END)
                        AS BIGINT) AS n_childless,
                      CAST(count(CASE WHEN NOT childless
                                 AND rel_gap_ppm > 50000 THEN 1 END)
                        AS BIGINT) AS n_violating,
                      CAST(coalesce(max(CASE WHEN NOT childless
                                        THEN rel_gap_ppm END), 0)
                        AS BIGINT) AS max_rel_gap_ppm
               FROM j)
         SELECT n_parents, n_childless, n_violating,
                CASE WHEN n_parents > 0
                     THEN n_violating * 1000000 // n_parents
                     ELSE 0 END AS violating_ppm,
                max_rel_gap_ppm
         FROM a""",
    // Densify: generate_series over each type's span, left join,
    // explicit zero days.
    "q224_densify_days" -> """
         WITH daily AS (SELECT CAST(event_type AS VARCHAR) AS typ,
                               ts::DATE AS day,
                               CAST(count(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         span AS (SELECT typ, min(day) AS d0, max(day) AS d1
                  FROM daily GROUP BY 1),
         axis AS (SELECT typ,
                         CAST(unnest(generate_series(d0, d1,
                           INTERVAL 1 DAY)) AS DATE) AS day
                  FROM span)
         SELECT axis.typ AS event_type, CAST(axis.day AS VARCHAR) AS day,
                CAST(coalesce(daily.v, 0) AS BIGINT) AS v,
                daily.v IS NULL AS is_gap
         FROM axis LEFT JOIN daily
           ON axis.typ = daily.typ AND axis.day = daily.day
         ORDER BY event_type, day""",
    // Capped census: candidates rank-chain capped at degreeCap=100
    // UPSTREAM (the round-11 fix — refined mega-buckets never emit
    // their quadratic pair set), then the q205 verify and the
    // both-endpoint degree-2 cap before the same census arithmetic.
    "q225_triangles_capped" ->
      s"""WITH ${minHashCappedPairsSqlOver("documents")},
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
         e0 AS (SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
                FROM vp WHERE a <> b),
         half AS (SELECT x AS v, y AS w FROM e0
                  UNION ALL SELECT y, x FROM e0),
         rk AS (SELECT v, w,
                       row_number() OVER (PARTITION BY v ORDER BY w) AS r
                FROM half),
         e AS (SELECT x, y FROM (
                 SELECT least(v, w) AS x, greatest(v, w) AS y,
                        count(*) AS k
                 FROM rk WHERE r <= 2 GROUP BY 1, 2) z
               WHERE k = 2),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT x AS v FROM e UNION ALL SELECT y FROM e) u
                 GROUP BY 1),
         shape AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                          CAST(coalesce(sum(d * (d - 1) // 2), 0)
                            AS BIGINT) AS n_wedges
                   FROM deg),
         ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                FROM e e1 JOIN e e2 ON e1.y = e2.x
                WHERE EXISTS (SELECT 1 FROM e e3
                              WHERE e3.x = e1.x AND e3.y = e2.y))
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
                CASE WHEN n_wedges > 0
                     THEN 3 * n_triangles * 1000000 // n_wedges
                     ELSE 0 END AS clustering_ppm
         FROM shape CROSS JOIN ne CROSS JOIN tr""",
    // Holt: the identical two-state recurrence as a recursive CTE;
    // every micro division truncates TOWARD ZERO (sign-split) to
    // mirror the driver fold's Long division on the signed trend.
    "q226_holt" -> {
      def tdiv(x: String): String =
        s"(CASE WHEN ($x) >= 0 THEN ($x) // 1000000" +
          s" ELSE -((-($x)) // 1000000) END)"
      val l2 = s"(300000 * o.v + ${tdiv("(1000000 - 300000) * (r.l + r.b)")})"
      s"""WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS (SELECT typ, day, v,
                        CAST(row_number() OVER (PARTITION BY typ
                          ORDER BY day) AS BIGINT) AS i
                 FROM daily),
         rec AS (
           SELECT typ, day, v, i,
                  CAST(v * 1000000 AS BIGINT) AS l,
                  CAST(0 AS BIGINT) AS b
           FROM ord WHERE i = 1
           UNION ALL
           SELECT o.typ, o.day, o.v, o.i,
                  CAST($l2 AS BIGINT),
                  CAST(${tdiv(s"200000 * ($l2 - r.l)")}
                    + ${tdiv("(1000000 - 200000) * r.b")} AS BIGINT)
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1)
         SELECT typ AS event_type, CAST(day AS VARCHAR) AS day, v,
                CAST(l AS BIGINT) AS level_micro,
                CAST(b AS BIGINT) AS trend_micro,
                CAST(l + b AS BIGINT) AS forecast_micro
         FROM rec ORDER BY event_type, day"""
    },
    // Top PC: the q139 sufficient-stats mirror feeding an unrolled
    // power-iteration CTE chain generated from PcaPowerIters; every
    // signed division truncates toward zero (the q226 convention).
    "q227_top_pc" -> {
      def tz(x: String, d: String): String =
        s"(CASE WHEN ($x) >= 0 THEN ($x) // ($d)" +
          s" ELSE -((-($x)) // ($d)) END)"
      val chain = (1 to PcaPowerIters).map { k =>
        val p = k - 1
        s"""y$k AS MATERIALIZED (SELECT cs.i AS d,
                     CAST(sum(cs.cv * x$p.x) AS BIGINT) AS y
              FROM cs JOIN x$p ON cs.j = x$p.d GROUP BY cs.i),
         m$k AS MATERIALIZED (SELECT greatest(1, max(abs(y)) // 1000000) AS dv,
                        CAST(max(abs(y)) AS BIGINT) AS my FROM y$k),
         mp$k AS MATERIALIZED (SELECT greatest(1, max(abs(x))) AS m FROM x$p),
         x$k AS MATERIALIZED (SELECT d, ${tz("y", "dv")} AS x
                 FROM y$k CROSS JOIN m$k)"""
      }.mkString(",\n         ")
      val n = PcaPowerIters
      s"""WITH q AS MATERIALIZED (SELECT list_transform(range(64), d ->
                      CAST(round(embedding[CAST(d + 1 AS INTEGER)]::DOUBLE
                        * 1e3) AS BIGINT)) AS qv
                    FROM embeddings),
         pp AS MATERIALIZED (SELECT CAST(d1.d AS BIGINT) AS d1,
                       CAST(d2.d AS BIGINT) AS d2,
                       qv[CAST(d1.d + 1 AS INTEGER)] AS x1,
                       qv[CAST(d2.d + 1 AS INTEGER)] AS x2
                FROM q
                CROSS JOIN (SELECT unnest(range(64)) AS d) d1
                CROSS JOIN (SELECT unnest(range(64)) AS d) d2
                WHERE d1.d <= d2.d),
         st AS MATERIALIZED (SELECT d1, d2, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x1) AS BIGINT) AS s1,
                       CAST(sum(x2) AS BIGINT) AS s2,
                       CAST(sum(x1 * x2) AS BIGINT) AS s12
                FROM pp GROUP BY d1, d2),
         cf AS MATERIALIZED (SELECT d1 AS i, d2 AS j, n * s12 - s1 * s2 AS cv FROM st
                UNION ALL
                SELECT d2, d1, n * s12 - s1 * s2 FROM st WHERE d1 <> d2),
         sc AS MATERIALIZED (SELECT greatest(1, max(abs(cv)) // 1000000) AS s FROM cf),
         cs AS MATERIALIZED (SELECT i, j, ${tz("cv", "s")} AS cv
                FROM cf CROSS JOIN sc),
         x0 AS MATERIALIZED (SELECT CAST(unnest(range(64)) AS BIGINT) AS d,
                       CAST(1000000 AS BIGINT) AS x),
         $chain,
         lam AS MATERIALIZED (SELECT m$n.my // greatest(1, mp$n.m // 1000000)
                   AS lambda
                 FROM m$n CROSS JOIN mp$n),
         tr AS MATERIALIZED (SELECT CAST(sum(cv) AS BIGINT) AS t FROM cs WHERE i = j),
         mxf AS MATERIALIZED (SELECT max(abs(x)) AS m FROM x$n),
         ld AS MATERIALIZED (SELECT min(d) AS d FROM x$n CROSS JOIN mxf
                WHERE abs(x) = m),
         sg AS MATERIALIZED (SELECT CASE WHEN xf.x < 0 THEN -1 ELSE 1 END AS s
                FROM x$n xf JOIN ld ON xf.d = ld.d),
         ex AS MATERIALIZED (SELECT CASE WHEN tr.t > 0
                            THEN lam.lambda // greatest(1, tr.t)
                            ELSE 0 END AS e
                FROM lam CROSS JOIN tr)
         SELECT xf.d AS dim, CAST(xf.x * sg.s AS BIGINT) AS component_ppm,
                CAST(lam.lambda AS BIGINT) AS lambda_scaled,
                CAST(tr.t AS BIGINT) AS trace_scaled,
                CAST(ex.e AS BIGINT) AS explained_ppm
         FROM x$n xf CROSS JOIN lam CROSS JOIN tr CROSS JOIN sg
              CROSS JOIN ex
         ORDER BY dim"""
    },
    // Cohort LTV: the q194 integer-week arithmetic; epoch days via
    // the date-difference form (both engines agree on DATE - DATE).
    "q228_cohort_ltv" -> """
         WITH q AS (SELECT CAST(o_custkey AS VARCHAR) AS e,
                           (o_orderdate::DATE - DATE '1970-01-01') AS ed,
                           CAST(round(o_totalprice * 100) AS BIGINT) AS v
                    FROM orders
                    WHERE o_custkey IS NOT NULL
                      AND o_orderdate IS NOT NULL
                      AND o_totalprice IS NOT NULL),
         qw AS (SELECT e, (ed - 4) // 7 AS w, v FROM q),
         first AS (SELECT e, CAST(min(w) AS BIGINT) AS w0
                   FROM qw GROUP BY 1),
         sizes AS (SELECT w0, CAST(count(*) AS BIGINT) AS n_entities
                   FROM first GROUP BY 1),
         rev AS (SELECT f.w0, CAST(qw.w - f.w0 AS BIGINT)
                          AS offset_weeks,
                        CAST(sum(qw.v) AS BIGINT) AS revenue
                 FROM qw JOIN first f ON qw.e = f.e
                 GROUP BY 1, 2),
         cum AS (SELECT w0, offset_weeks, revenue,
                        CAST(sum(revenue) OVER (PARTITION BY w0
                          ORDER BY offset_weeks
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                          AS cum_revenue
                 FROM rev)
         SELECT CAST(DATE '1970-01-01' + CAST(4 + 7 * cum.w0 AS INTEGER)
                  AS VARCHAR) AS cohort_week,
                cum.offset_weeks, sizes.n_entities, cum.revenue,
                cum.cum_revenue,
                CAST(cum.cum_revenue // sizes.n_entities AS BIGINT)
                  AS cum_per_entity
         FROM cum JOIN sizes ON cum.w0 = sizes.w0
         ORDER BY cohort_week, offset_weeks""",
    // Time-decay attribution: the same decay VALUES, floor shares,
    // and most-recent-touch remainder pinning (micros precision,
    // ties to the smallest channel name).
    "q229_time_decay_attribution" -> {
      val vals = DecayWeightsPpm.zipWithIndex
        .map { case (w, g) => s"($g, $w)" }.mkString(", ")
      s"""WITH w(g, wt) AS (SELECT * FROM (VALUES $vals)),
         e AS (SELECT CAST(user_id AS VARCHAR) AS u, ts,
                      CAST(event_type AS VARCHAR) AS t,
                      (ts::DATE - DATE '1970-01-01') AS d
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         conv AS (SELECT DISTINCT u, epoch_us(ts) AS cus, d AS cd
                  FROM e WHERE t = 'purchase'),
         touch AS (SELECT u, epoch_us(ts) AS tus, d AS td,
                          t AS channel
                   FROM e WHERE t IN ('signup', 'view', 'click')),
         j AS (SELECT c.u, c.cus, tch.channel, tch.tus,
                      CAST(w.wt AS BIGINT) AS wv
               FROM conv c
               JOIN touch tch ON c.u = tch.u AND tch.tus < c.cus
                 AND c.cd - tch.td BETWEEN 0 AND 30
               JOIN w ON w.g = c.cd - tch.td),
         perchan AS (SELECT u, cus, channel,
                            CAST(sum(wv) AS BIGINT) AS ws,
                            max(tus) AS lastT
                     FROM j GROUP BY 1, 2, 3),
         perconv AS (SELECT u, cus, CAST(sum(ws) AS BIGINT) AS wtot
                     FROM perchan GROUP BY 1, 2),
         win AS (SELECT u, cus, channel AS winner FROM (
                   SELECT u, cus, channel,
                          row_number() OVER (PARTITION BY u, cus
                            ORDER BY lastT DESC, channel ASC) AS rn
                   FROM perchan) z
                 WHERE rn = 1),
         based AS (SELECT pc.u, pc.cus, pc.channel, pc.ws, p.wtot,
                          wn.winner,
                          CASE WHEN p.wtot > 0
                               THEN pc.ws * 1000000 // p.wtot
                               ELSE 0 END AS base
                   FROM perchan pc
                   JOIN perconv p ON pc.u = p.u AND pc.cus = p.cus
                   JOIN win wn ON pc.u = wn.u AND pc.cus = wn.cus),
         fs AS (SELECT u, cus, CAST(sum(base) AS BIGINT) AS f
                FROM based GROUP BY 1, 2),
         cr AS (SELECT b.channel,
                       b.base + CASE WHEN b.wtot > 0
                                     AND b.channel = b.winner
                                THEN 1000000 - fs.f ELSE 0 END AS credit
                FROM based b
                JOIN fs ON b.u = fs.u AND b.cus = fs.cus),
         nt AS (SELECT 'none' AS channel,
                       CAST(1000000 AS BIGINT) AS credit
                FROM conv c
                WHERE NOT EXISTS (SELECT 1 FROM j
                                  WHERE j.u = c.u AND j.cus = c.cus)),
         al AS (SELECT channel, credit FROM cr
                UNION ALL SELECT channel, credit FROM nt)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
                CAST(sum(credit) AS BIGINT) AS credit_ppm_total
         FROM al GROUP BY 1 ORDER BY channel"""
    },
    // Next-event accuracy: the q122 pair extraction, argmax by
    // (n desc, name asc), scored against actual successors.
    "q230_next_event_accuracy" -> """
         WITH pairs AS (SELECT event_type AS from_type,
                               lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS to_type
                        FROM events),
         p2 AS (SELECT from_type, to_type FROM pairs
                WHERE to_type IS NOT NULL),
         counts AS (SELECT from_type, to_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM p2 GROUP BY 1, 2),
         pred AS (SELECT from_type, to_type AS predicted FROM (
                    SELECT from_type, to_type,
                           row_number() OVER (PARTITION BY from_type
                             ORDER BY n DESC, to_type ASC) AS rn
                    FROM counts) z
                  WHERE rn = 1),
         scored AS (SELECT p2.from_type, pred.predicted,
                           CAST(count(*) AS BIGINT) AS n_transitions,
                           CAST(count(CASE WHEN p2.to_type
                                      = pred.predicted THEN 1 END)
                             AS BIGINT) AS n_correct
                    FROM p2 JOIN pred ON p2.from_type = pred.from_type
                    GROUP BY 1, 2),
         al AS (SELECT from_type, predicted, n_transitions, n_correct
                FROM scored
                UNION ALL
                SELECT '__overall__', NULL,
                       CAST(coalesce(sum(n_transitions), 0) AS BIGINT),
                       CAST(coalesce(sum(n_correct), 0) AS BIGINT)
                FROM scored)
         SELECT from_type, predicted, n_transitions, n_correct,
                CASE WHEN n_transitions > 0
                     THEN n_correct * 1000000 // n_transitions
                     ELSE 0 END AS accuracy_ppm
         FROM al ORDER BY from_type""",
    // Classification report: the q27 prediction CTEs feeding exact
    // ppm P/R/F1 per class plus the floor-mean macro row.
    "q231_classification_report" -> """
         WITH s AS (SELECT lang,
                           list_distinct(string_split(text, ' ')) AS ws
                    FROM documents),
         sc AS (SELECT lang,
             len(list_intersect(ws, ['the','a','of','and','to'])) AS s_en,
             len(list_intersect(ws, ['der','die','das','und','ist'])) AS s_de,
             len(list_intersect(ws, ['el','la','los','y','es'])) AS s_es,
             len(list_intersect(ws, ['le','la','les','et','est'])) AS s_fr,
             len(list_intersect(ws, ['de','shi','zhe','he','bu'])) AS s_zh
           FROM s),
         pr AS (SELECT lang AS a, CASE
             WHEN s_en = g AND g > 0 THEN 'en'
             WHEN s_de = g AND g > 0 THEN 'de'
             WHEN s_es = g AND g > 0 THEN 'es'
             WHEN s_fr = g AND g > 0 THEN 'fr'
             WHEN s_zh = g AND g > 0 THEN 'zh'
             ELSE 'und' END AS pdt
           FROM (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS g
                 FROM sc) t),
         cells AS (SELECT a, pdt, CAST(count(*) AS BIGINT) AS n
                   FROM pr GROUP BY 1, 2),
         classes AS (SELECT a AS cls FROM cells
                     UNION SELECT pdt FROM cells),
         act AS (SELECT a AS cls, CAST(sum(n) AS BIGINT) AS n_actual
                 FROM cells GROUP BY 1),
         prd AS (SELECT pdt AS cls, CAST(sum(n) AS BIGINT) AS n_predicted
                 FROM cells GROUP BY 1),
         tp AS (SELECT a AS cls, n AS n_correct FROM cells WHERE a = pdt),
         per AS (SELECT classes.cls,
                        CAST(coalesce(act.n_actual, 0) AS BIGINT)
                          AS n_actual,
                        CAST(coalesce(prd.n_predicted, 0) AS BIGINT)
                          AS n_predicted,
                        CAST(coalesce(tp.n_correct, 0) AS BIGINT)
                          AS n_correct
                 FROM classes
                 LEFT JOIN act USING (cls)
                 LEFT JOIN prd USING (cls)
                 LEFT JOIN tp USING (cls)),
         m AS (SELECT cls, n_actual, n_predicted, n_correct,
                      CASE WHEN n_predicted > 0
                           THEN n_correct * 1000000 // n_predicted
                           ELSE 0 END AS precision_ppm,
                      CASE WHEN n_actual > 0
                           THEN n_correct * 1000000 // n_actual
                           ELSE 0 END AS recall_ppm
               FROM per),
         f AS (SELECT *, CASE WHEN precision_ppm + recall_ppm > 0
                              THEN 2 * precision_ppm * recall_ppm
                                   // (precision_ppm + recall_ppm)
                              ELSE 0 END AS f1_ppm
               FROM m),
         mac AS (SELECT '__macro__' AS cls,
                        CAST(sum(n_actual) AS BIGINT) AS n_actual,
                        CAST(sum(n_predicted) AS BIGINT) AS n_predicted,
                        CAST(sum(n_correct) AS BIGINT) AS n_correct,
                        CAST(sum(precision_ppm) // count(*) AS BIGINT)
                          AS precision_ppm,
                        CAST(sum(recall_ppm) // count(*) AS BIGINT)
                          AS recall_ppm,
                        CAST(sum(f1_ppm) // count(*) AS BIGINT) AS f1_ppm
                 FROM f)
         SELECT cls, n_actual, n_predicted, n_correct, precision_ppm,
                recall_ppm, f1_ppm
         FROM (SELECT * FROM f UNION ALL SELECT * FROM mac) u
         ORDER BY cls""",
    // Forecast backtest: the q209 recurrence + the MAE tail over
    // days >= 2 (the EWMA's dev IS its standing one-step error).
    "q232_forecast_backtest" -> """
         WITH RECURSIVE daily AS (
           SELECT CAST(event_type AS VARCHAR) AS typ, ts::DATE AS day,
                  CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         ord AS (SELECT typ, day, v,
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
           FROM ord o JOIN rec r ON o.typ = r.typ AND o.i = r.i + 1),
         l AS (SELECT typ, day, v, dev,
                      lag(v) OVER (PARTITION BY typ ORDER BY day)
                        AS vprev
               FROM rec),
         a AS (SELECT typ AS event_type,
                      CAST(count(*) AS BIGINT) AS n_days,
                      CAST(sum(abs(dev)) // count(*) AS BIGINT)
                        AS mae_ewma_micro,
                      CAST(sum(abs(v - vprev) * 1000000) // count(*)
                        AS BIGINT) AS mae_naive_micro
               FROM l WHERE vprev IS NOT NULL GROUP BY 1)
         SELECT event_type, n_days, mae_ewma_micro, mae_naive_micro,
                mae_ewma_micro < mae_naive_micro AS ewma_wins
         FROM a ORDER BY event_type""",
    // Kaplan-Meier: risk set by suffix sum over the lifetimes
    // histogram, the survival product as the q209-style recursive
    // recurrence with per-step ppm truncation.
    "q233_kaplan_meier" -> """
         WITH RECURSIVE e AS (SELECT CAST(user_id AS VARCHAR) AS u,
                                     (ts::DATE - DATE '1970-01-01') AS d
                              FROM events
                              WHERE user_id IS NOT NULL
                                AND ts IS NOT NULL),
         mx AS (SELECT max(d) AS md FROM e),
         per AS (SELECT u, min(d) AS f, max(d) AS l FROM e GROUP BY 1),
         du AS (SELECT CAST(l - f AS BIGINT) AS t,
                       (l > md - 14) AS cen
                FROM per CROSS JOIN mx),
         h AS (SELECT t,
                      CAST(count(CASE WHEN NOT cen THEN 1 END)
                        AS BIGINT) AS d,
                      CAST(count(CASE WHEN cen THEN 1 END) AS BIGINT)
                        AS c
               FROM du GROUP BY 1),
         r AS (SELECT t, d, c,
                      CAST(sum(d + c) OVER (ORDER BY t DESC
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                        AS n_at_risk
               FROM h),
         o AS (SELECT t, d, c, n_at_risk,
                      CAST(row_number() OVER (ORDER BY t) AS BIGINT)
                        AS i
               FROM r),
         s AS (SELECT i, t, d, c, n_at_risk,
                      CAST((1000000 * (CASE WHEN n_at_risk > 0
                             THEN (n_at_risk - d) * 1000000 // n_at_risk
                             ELSE 1000000 END)) // 1000000 AS BIGINT)
                        AS surv
               FROM o WHERE i = 1
               UNION ALL
               SELECT o.i, o.t, o.d, o.c, o.n_at_risk,
                      (s.surv * (CASE WHEN o.n_at_risk > 0
                         THEN (o.n_at_risk - o.d) * 1000000
                              // o.n_at_risk
                         ELSE 1000000 END)) // 1000000
               FROM o JOIN s ON o.i = s.i + 1)
         SELECT t AS offset_days, n_at_risk, d AS n_events,
                c AS n_censored, CAST(surv AS BIGINT) AS survival_ppm
         FROM s ORDER BY offset_days""",

    // Fixture stats: re-derive the K129 writer's hash-defined corpus
    // from nothing but range(n) — the vocab literal and every md5
    // tag below are generated from the SAME Scala constants the
    // writer uses (literal-driven both-sides).
    "q235_fixture_stats" -> s"""
         WITH ids AS (SELECT range AS doc_id FROM range(5000)),
         e AS (SELECT doc_id,
                      CASE WHEN doc_id % 625 = 624 THEN doc_id - 1
                           ELSE doc_id END AS eid
               FROM ids),
         b AS (SELECT doc_id, eid,
                      (('0x' || substr(md5('len:' || eid), 1, 15))::BIGINT
                        % 91) + 10 AS len,
                      ('0x' || substr(md5('lang:' || doc_id), 1, 15))::BIGINT
                        % 1000 AS lh,
                      'src' || (('0x' || substr(md5('src:' || doc_id), 1, 15))::BIGINT
                        % 20) AS source
               FROM e),
         d AS (SELECT doc_id, eid, len, source,
                      CASE WHEN lh < 412 THEN 'en' WHEN lh < 559 THEN 'de'
                           WHEN lh < 706 THEN 'es' WHEN lh < 853 THEN 'fr'
                           ELSE 'zh' END AS lang
               FROM b),
         wi AS (SELECT doc_id, eid, unnest(generate_series(1, len)) AS i
                FROM d),
         w AS (SELECT doc_id, i,
                      ($fixtureVocabSql)[
                        CAST((('0x' || substr(md5('w:' || eid || '_' || i),
                          1, 15))::BIGINT % 31) + 1 AS INT)] AS word
               FROM wi),
         txt AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text
                 FROM w GROUP BY doc_id),
         dj AS (SELECT d.lang, txt.text FROM d JOIN txt USING (doc_id)),
         dup AS (SELECT lang FROM dj
                 QUALIFY count(*) OVER (PARTITION BY text) >= 2),
         vl AS (SELECT range AS vec_id,
                       ('0x' || substr(md5('lbl:' || range), 1, 15))::BIGINT
                         % 10 AS label
                FROM range(2000))
         SELECT rel, key, CAST(n AS BIGINT) AS n FROM (
           SELECT 'lang' AS rel, lang AS key, count(*) AS n FROM d GROUP BY 2
           UNION ALL
           SELECT 'words', lang, sum(len) FROM d GROUP BY 2
           UNION ALL
           SELECT 'dup', lang, count(*) FROM dup GROUP BY 2
           UNION ALL
           SELECT 'src', source, count(*) FROM d GROUP BY 2
           UNION ALL
           SELECT 'len', CAST(len AS VARCHAR), count(*) FROM d GROUP BY 2
           UNION ALL
           SELECT 'label', CAST(label AS VARCHAR), count(*) FROM vl GROUP BY 2)
         ORDER BY rel, key""",

    // 10th streaming gate: same expected relation as the batch q153.
    "q238_streaming_attribution" -> attributionOracleSql,

    "q239_pivot_daily" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'view') AS view,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'error') AS error
         FROM events GROUP BY 1 ORDER BY 1""",

    "q240_unpivot_daily" ->
      """SELECT CAST(ts::DATE AS VARCHAR) AS day, event_type,
                CAST(count(*) AS BIGINT) AS n
         FROM events
         WHERE event_type IN ('signup','view','click','purchase','error')
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q241_hll_distinct" ->
      """SELECT event_type,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
                true AS approx_ok
         FROM events GROUP BY 1 ORDER BY 1""",

    // Unigram-LM tokenizer: the EM rounds and the Viterbi lattices are
    // generated from the SAME constants the Spark plans fold
    // (unigramTrainCtes / unigramDpCtes in EntryOracleFragments).
    "q236_unigram_train" -> s"""
         WITH RECURSIVE ${unigramTrainCtes(graft.operators.UnigramLm.EmRounds)},
         tf AS MATERIALIZED (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS total
                FROM c${graft.operators.UnigramLm.EmRounds})
         SELECT piece, CAST(cnt AS BIGINT) AS weighted_count,
                CAST(round(-ln(greatest(cnt, 1)::DOUBLE / total::DOUBLE)
                  * 1e6) AS BIGINT) AS cost_micro
         FROM c${graft.operators.UnigramLm.EmRounds}, tf
         ORDER BY weighted_count DESC, piece""",

    "q237_unigram_encode" -> s"""
         WITH RECURSIVE ${unigramTrainCtes(graft.operators.UnigramLm.EmRounds)},
         tf AS MATERIALIZED (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS total
                FROM c${graft.operators.UnigramLm.EmRounds}),
         pf AS MATERIALIZED (SELECT piece,
                  CAST(round(-ln(greatest(cnt, 1)::DOUBLE / total::DOUBLE)
                    * 1e6) AS BIGINT) AS cost
                FROM c${graft.operators.UnigramLm.EmRounds}, tf),
         ${unigramDpCtes("f", "pf")},
         dwords AS MATERIALIZED (SELECT doc_id, wi, word FROM (
                      SELECT doc_id,
                             generate_subscripts(string_split(text, ' '), 1) AS wi,
                             unnest(string_split(text, ' ')) AS word
                      FROM documents) WHERE word <> ''),
         enc AS MATERIALIZED (SELECT w.doc_id, flatten(list(s.ts ORDER BY w.wi)) AS toks
                 FROM dwords w JOIN segf s USING (word) GROUP BY 1),
         tok AS MATERIALIZED (SELECT doc_id, unnest(toks) AS piece FROM enc),
         cst AS MATERIALIZED (SELECT t.doc_id,
                   CAST(sum(coalesce(p.cost,
                     CASE WHEN length(t.piece) = 1
                          THEN ${graft.operators.UnigramLm.MissSingle}
                          ELSE ${graft.operators.UnigramLm.MissMulti} END))
                     AS BIGINT) AS cost_micro
                 FROM tok t LEFT JOIN pf p USING (piece) GROUP BY 1),
         nws AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ws
                 FROM dwords GROUP BY 1)
         SELECT d.doc_id, coalesce(n.n_ws, 0) AS n_ws_tokens,
                CAST(coalesce(len(e.toks), 0) AS BIGINT) AS n_tokens,
                coalesce(array_to_string(e.toks, '|'), '') AS tokens,
                coalesce(c.cost_micro, 0) AS cost_micro
         FROM documents d LEFT JOIN enc e USING (doc_id)
           LEFT JOIN nws n USING (doc_id) LEFT JOIN cst c USING (doc_id)
         ORDER BY doc_id""",

    // Tokenizer card maintenance: the FULL REBUILD under the pinned
    // model — 10 merges trained on the OLD snapshot, the NEW snapshot
    // encoded under them, per-lang fertility rollup. Hash-equality
    // against the Spark side's maintained counters IS the
    // tick≡rebuild-under-pinned-tokenizer gate.
    "q242_tokenizer_card_nightly" ->
      s"""WITH olds AS MATERIALIZED (
                  SELECT doc_id, text, lang FROM documents
                  WHERE doc_id % 10 <> 3),
         news AS MATERIALIZED (
                  SELECT doc_id,
                         CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                              ELSE text END AS text,
                         lang
                  FROM documents WHERE doc_id % 10 <> 7),
         ${bpeTrainCtesSql(10, "olds")},
         ${bpeFertilityCtesSql(10, "news")}
         SELECT lang, n_docs, n_chars, n_ws_tokens, n_tokens,
                chars_per_token_ppm, fertility_ppm
         FROM tokf ORDER BY lang""",

    // Edit-join cap audit: per-side postings rollup at a cap (16)
    // that BINDS on the real corpus — dropped mass oracle-exercised.
    "q243_edit_join_cap_audit" ->
      s"""WITH $editJoinSidesSql,
         la AS (SELECT 'left' AS side,
                       CAST(count(*) AS BIGINT) AS n_variant_keys,
                       CAST(count(*) FILTER (WHERE n > 16) AS BIGINT)
                         AS n_capped_keys,
                       CAST(coalesce(max(n), 0) AS BIGINT) AS max_postings,
                       CAST(coalesce(sum(n) FILTER (WHERE n > 16), 0)
                         AS BIGINT) AS dropped_postings
                FROM (SELECT h, count(*) AS n FROM lv GROUP BY 1)),
         ra AS (SELECT 'right' AS side,
                       CAST(count(*) AS BIGINT) AS n_variant_keys,
                       CAST(count(*) FILTER (WHERE n > 16) AS BIGINT)
                         AS n_capped_keys,
                       CAST(coalesce(max(n), 0) AS BIGINT) AS max_postings,
                       CAST(coalesce(sum(n) FILTER (WHERE n > 16), 0)
                         AS BIGINT) AS dropped_postings
                FROM (SELECT h, count(*) AS n FROM rv GROUP BY 1))
         SELECT * FROM la UNION ALL SELECT * FROM ra ORDER BY side""",

    // LSH cap audit: refined-bucket rollup at degreeCap 16 (binds on
    // the planted dup families), mirroring TextDedup.lshCapAudit.
    "q244_lsh_cap_audit" ->
      s"""WITH ${lshCapAuditSqlOverShingles(docShinglesSql("documents"), 16)}
         SELECT n_buckets, n_capped_buckets, max_bucket, pairs_full,
                pairs_capped
         FROM audit""",

    // SimHash pair audit: the chunk-bucket census + exact pair
    // estimate behind the K211 budget guard (q22's simhash CTEs,
    // rolled up instead of joined).
    "q245_simhash_pair_audit" ->
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
         b AS (SELECT k, key, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2)
         SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                CAST(coalesce(max(n), 0) AS BIGINT) AS max_bucket,
                CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT) AS pairs_est
         FROM b""",

    // Unigram card maintenance: the q242 tick≡rebuild gate for the
    // probability-carrying tokenizer — pieces trained on the OLD
    // snapshot (the q236 EM CTEs over `olds`), the full NEW snapshot
    // Viterbi-encoded under them, per-lang fertility rollup.
    "q246_unigram_card_nightly" -> s"""
         WITH RECURSIVE olds AS (SELECT doc_id, text, lang FROM documents
                  WHERE doc_id % 10 <> 3),
         news AS (SELECT doc_id,
                         CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                              ELSE text END AS text,
                         lang
                  FROM documents WHERE doc_id % 10 <> 7),
         ${unigramTrainCtes(graft.operators.UnigramLm.EmRounds, "olds")},
         tf AS MATERIALIZED (SELECT CAST(sum(greatest(cnt, 1)) AS BIGINT) AS total
                FROM c${graft.operators.UnigramLm.EmRounds}),
         pf AS MATERIALIZED (SELECT piece,
                  CAST(round(-ln(greatest(cnt, 1)::DOUBLE / total::DOUBLE)
                    * 1e6) AS BIGINT) AS cost
                FROM c${graft.operators.UnigramLm.EmRounds}, tf),
         dwords AS MATERIALIZED (SELECT doc_id, wi, word FROM (
                      SELECT doc_id,
                             generate_subscripts(string_split(text, ' '), 1) AS wi,
                             unnest(string_split(text, ' ')) AS word
                      FROM news) WHERE word <> ''),
         dwn AS MATERIALIZED (SELECT DISTINCT word FROM dwords),
         ${unigramDpCtes("f", "pf", "dwn")},
         enc AS MATERIALIZED (SELECT w.doc_id, flatten(list(s.ts ORDER BY w.wi)) AS toks
                 FROM dwords w JOIN segf s USING (word) GROUP BY 1),
         nws AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ws
                 FROM dwords GROUP BY 1),
         tokj AS (SELECT d.lang, CAST(length(d.text) AS BIGINT) AS nch,
                         coalesce(n.n_ws, 0) AS nws,
                         CAST(coalesce(len(e.toks), 0) AS BIGINT) AS ntk
                  FROM news d LEFT JOIN enc e USING (doc_id)
                       LEFT JOIN nws n USING (doc_id)),
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
                  FROM tokj GROUP BY lang)
         SELECT lang, n_docs, n_chars, n_ws_tokens, n_tokens,
                chars_per_token_ppm, fertility_ppm
         FROM tokf ORDER BY lang""",

    // Degree-capped SimHash candidates at a BINDING cap 16: the
    // rank-successor pairing + full/capped accounting, mirroring
    // TextDedup.simHashCandidatePairsCapped / capAuditOverBands.
    "q249_simhash_capped_pairs" ->
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
         rk AS (SELECT doc_id, k, key,
                       row_number() OVER (PARTITION BY k, key
                                          ORDER BY doc_id) AS r
                FROM ch),
         p AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
               FROM rk a JOIN rk b
                 ON a.k = b.k AND a.key = b.key
                AND b.r > a.r AND b.r <= a.r + 16),
         e AS (SELECT a AS d FROM p UNION ALL SELECT b FROM p),
         st AS (SELECT (SELECT COUNT(*) FROM p) AS n_pairs,
                       (SELECT COUNT(DISTINCT d) FROM e) AS n_docs),
         bn AS (SELECT k, key, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2),
         au AS (SELECT CAST(count(*) FILTER (WHERE n - 1 > 16) AS BIGINT)
                         AS n_capped_buckets,
                       CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
                         AS pairs_full,
                       CAST(coalesce(sum(CASE WHEN n - 1 <= 16
                                THEN n * (n - 1) // 2
                                ELSE (n - 16) * 16 + 120 END), 0) AS BIGINT)
                         AS pairs_capped
                FROM bn)
         SELECT n_pairs, n_docs, n_capped_buckets, pairs_full, pairs_capped
         FROM st CROSS JOIN au""",

    // Guard health at BINDING settings: every dedup-family cap/budget
    // audited tight enough to bind (caps 16, budget 100).
    "q247_guard_health" -> guardHealthSql(16, 100L, 16),

    // Guard health at PRODUCTION settings: zero rows — the
    // nothing-binds certificate, re-derived by the oracle.
    "q248_guard_health_clear" ->
      guardHealthSql(100, graft.operators.TextDedup.DefaultLshPairBudget, 48),

    "q250_association_rules" ->
      """WITH b0 AS MATERIALIZED (
                     SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                     FROM lineitem
                     WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
              keep AS (SELECT bk FROM b0 GROUP BY bk HAVING count(*) <= 100),
              b AS MATERIALIZED (
                     SELECT b0.bk, b0.it FROM b0 JOIN keep USING (bk)),
              nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets
                     FROM b),
              s AS (SELECT it, CAST(count(*) AS BIGINT) AS sup
                    FROM b GROUP BY it),
              p AS (SELECT x.it AS item_a, y.it AS item_b,
                           CAST(count(*) AS BIGINT) AS n_ab
                    FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
                    GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT item_a, item_b, n_ab, sa.sup AS n_a, sb.sup AS n_b,
                n_baskets,
                n_ab * n_baskets * 1000000 // (sa.sup * sb.sup) AS lift_ppm,
                n_ab * 1000000 // sa.sup AS conf_ab_ppm,
                n_ab * 1000000 // sb.sup AS conf_ba_ppm
         FROM p JOIN s sa ON p.item_a = sa.it
                JOIN s sb ON p.item_b = sb.it
              CROSS JOIN nb
         ORDER BY lift_ppm DESC, item_a, item_b LIMIT 100""",

    "q251_rfm_segments" ->
      """WITH pc AS (SELECT o_custkey AS cust,
                            max(o_orderdate::DATE) AS last_d,
                            CAST(count(*) AS BIGINT) AS frequency,
                            CAST(sum(CAST(round(o_totalprice * 100)
                              AS BIGINT)) AS BIGINT) AS cents
                     FROM orders
                     WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
                     GROUP BY 1),
              an AS (SELECT max(last_d) AS anchor FROM pc),
              m AS (SELECT cust, frequency, cents,
                           CAST(anchor - last_d AS BIGINT) AS recency_days,
                           cents // 100 AS dollars
                    FROM pc CROSS JOIN an),
              qr AS (SELECT v AS recency_days, below * 5 // n AS q FROM (
                       SELECT v, coalesce(sum(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS below, sum(c) OVER () AS n
                       FROM (SELECT recency_days AS v,
                                    CAST(count(*) AS BIGINT) AS c
                             FROM m GROUP BY 1))),
              qf AS (SELECT v AS frequency, below * 5 // n AS q FROM (
                       SELECT v, coalesce(sum(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS below, sum(c) OVER () AS n
                       FROM (SELECT frequency AS v,
                                    CAST(count(*) AS BIGINT) AS c
                             FROM m GROUP BY 1))),
              qm AS (SELECT v AS dollars, below * 5 // n AS q FROM (
                       SELECT v, coalesce(sum(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS below, sum(c) OVER () AS n
                       FROM (SELECT dollars AS v,
                                    CAST(count(*) AS BIGINT) AS c
                             FROM m GROUP BY 1)))
         SELECT CAST(5 - qr.q AS BIGINT) AS r_score,
                CAST(qf.q + 1 AS BIGINT) AS f_score,
                CAST(qm.q + 1 AS BIGINT) AS m_score,
                CAST(count(*) AS BIGINT) AS n_customers,
                CAST(sum(cents) AS BIGINT) AS total_cents,
                CAST(sum(cents) // count(*) AS BIGINT) AS avg_cents
         FROM m JOIN qr USING (recency_days)
                JOIN qf USING (frequency)
                JOIN qm USING (dollars)
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q252_bootstrap_ci" ->
      """WITH base AS (SELECT event_type AS g,
                              CAST(event_id AS VARCHAR) AS id,
                              CAST(round(value * 1000000) AS BIGINT) AS v
                       FROM events
                       WHERE event_type IS NOT NULL
                         AND event_id IS NOT NULL AND value IS NOT NULL),
              pt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
                            CAST(CASE WHEN sum(v) >= 0
                                 THEN sum(v) // count(*)
                                 ELSE -((-sum(v)) // count(*)) END
                              AS BIGINT) AS mean_micro
                     FROM base GROUP BY 1),
              reps AS (SELECT unnest(range(32)) AS b),
              draws AS (SELECT g, b, v,
                               ('0x' || substr(md5('boot:' || b || ':' || id),
                                 1, 15))::BIGINT % 1000000 AS u
                        FROM base CROSS JOIN reps),
              wts AS (SELECT g, b, v,
                             CASE WHEN u < 367879 THEN 0
                                  WHEN u < 735759 THEN 1
                                  WHEN u < 919699 THEN 2
                                  WHEN u < 981012 THEN 3
                                  WHEN u < 996340 THEN 4
                                  WHEN u < 999406 THEN 5
                                  WHEN u < 999917 THEN 6
                                  WHEN u < 999990 THEN 7
                                  WHEN u < 999999 THEN 8
                                  ELSE 9 END AS w
                      FROM draws),
              -- sign-split: Spark's div truncates toward zero, DuckDB's //
              -- floors — they differ on any negative mean (the q226/q256
              -- tdiv convention; bootstrapCi accepts arbitrary signed v)
              m AS (SELECT g, b,
                           CASE WHEN sum(w * v) >= 0
                                THEN sum(w * v) // sum(w)
                                ELSE -((-sum(w * v)) // sum(w)) END AS m
                    FROM wts GROUP BY 1, 2 HAVING sum(w) > 0),
              r AS (SELECT g, b, m,
                           row_number() OVER (PARTITION BY g
                                              ORDER BY m, b) AS rn,
                           count(*) OVER (PARTITION BY g) AS bt
                    FROM m),
              s AS (SELECT g, CAST(max(bt) AS BIGINT) AS n_reps,
                           CAST(max(CASE WHEN rn = 1 THEN m END)
                             AS BIGINT) AS boot_min,
                           CAST(max(CASE WHEN rn = (bt - 1) // 4 + 1
                             THEN m END) AS BIGINT) AS boot_q1,
                           CAST(max(CASE WHEN rn = (bt - 1) * 2 // 4 + 1
                             THEN m END) AS BIGINT) AS boot_med,
                           CAST(max(CASE WHEN rn = (bt - 1) * 3 // 4 + 1
                             THEN m END) AS BIGINT) AS boot_q3,
                           CAST(max(CASE WHEN rn = bt THEN m END)
                             AS BIGINT) AS boot_max
                    FROM r GROUP BY 1)
         SELECT pt.g AS event_type, n_rows, mean_micro, n_reps,
                boot_min, boot_q1, boot_med, boot_q3, boot_max
         FROM pt JOIN s USING (g) ORDER BY 1""",

    // AMS F2 sketch vs the exact chunk-bucket census on the same
    // relation: the q245 simhash CTE chain, plus 24 signed counters
    // whose median-of-means estimate the oracle re-derives bit-exact.
    "q253_pair_sketch" ->
      s"""WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' '))) AS word
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
         b AS (SELECT k, key, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2),
         ex AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
                       CAST(coalesce(sum(n * (n - 1) // 2), 0) AS BIGINT)
                         AS pairs_exact
                FROM b),
         hh AS (SELECT ('0x' || substr(md5(CAST(k AS VARCHAR) || chr(1)
                         || CAST(key AS VARCHAR)), 1, 15))::BIGINT
                       % 2147483647 AS h
                FROM ch),
         cf(j, a, b) AS (VALUES ${minHashCoeffsSql(24)}),
         sg AS (SELECT cf.j,
                       sum(CASE WHEN ((hh.h * cf.a + cf.b) % 2147483647)
                               % 2 = 1 THEN 1 ELSE -1 END) AS x
                FROM hh CROSS JOIN cf GROUP BY cf.j),
         gm AS (SELECT j // 4 AS grp, sum(x * x) // 4 AS mean
                FROM sg GROUP BY 1),
         rk AS (SELECT mean, row_number() OVER (ORDER BY mean) AS rn
                FROM gm),
         md AS (SELECT (max(CASE WHEN rn = 3 THEN mean END) +
                        max(CASE WHEN rn = 4 THEN mean END)) // 2 AS f2
                FROM rk)
         SELECT n_rows, CAST(f2 AS BIGINT) AS f2_est,
                CAST(greatest(0, (f2 - n_rows) // 2) AS BIGINT) AS pairs_est,
                pairs_exact,
                CAST(abs(greatest(0, (f2 - n_rows) // 2) - pairs_exact)
                  * 1000000 // greatest(pairs_exact, 1) AS BIGINT) AS err_ppm
         FROM ex CROSS JOIN md""",

    // Dup-graph PageRank: the q205 verified-pair CTEs, then 10
    // unrolled integer-micro power iterations (85/100 damping,
    // floor/dangling mass dropped — the operator's stated contract).
    "q254_dup_pagerank" -> pageRankOracleSql(10),

    // Retrieval training pairs: q19's lexical ranking re-derived,
    // then pos/hard/random roles with the bounded 256-doc hash pool
    // (pool and per-query draws both 52-bit md5 order).
    "q255_training_pairs" ->
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
                FROM qw q CROSS JOIN cw c),
         rt AS (SELECT qid, id, r FROM (
                  SELECT qid, id, jac,
                         row_number() OVER (PARTITION BY qid
                           ORDER BY jac DESC, id) AS r
                  FROM sc WHERE ov > 0) t
                WHERE r <= 20),
         pos AS (SELECT qid, id, 'pos' AS role, CAST(1 AS BIGINT) AS pair_rank
                 FROM rt WHERE r = 1),
         hard AS (SELECT qid, id, 'hard_neg' AS role,
                         CAST(r - 1 AS BIGINT) AS pair_rank
                  FROM rt WHERE r BETWEEN 2 AND 6),
         pool AS (SELECT id FROM (
                    SELECT id, row_number() OVER (ORDER BY
                      ('0x' || substr(md5('pool:' || CAST(id AS VARCHAR)),
                        1, 13))::BIGINT, id) AS pr
                    FROM cw) WHERE pr <= 256),
         qs AS (SELECT DISTINCT qid FROM rt),
         seen AS (SELECT qid, id FROM rt WHERE r <= 6),
         cand AS (SELECT q.qid, p.id FROM qs q CROSS JOIN pool p
                  WHERE NOT EXISTS (SELECT 1 FROM seen s
                                    WHERE s.qid = q.qid AND s.id = p.id)),
         rneg AS (SELECT qid, id, 'rand_neg' AS role,
                         CAST(rr AS BIGINT) AS pair_rank FROM (
                    SELECT qid, id, row_number() OVER (PARTITION BY qid
                      ORDER BY ('0x' || substr(md5('neg:'
                        || CAST(qid AS VARCHAR) || ':'
                        || CAST(id AS VARCHAR)), 1, 13))::BIGINT, id) AS rr
                    FROM cand) WHERE rr <= 5)
         SELECT qid, id, role, pair_rank FROM (
           SELECT * FROM pos UNION ALL SELECT * FROM hard
           UNION ALL SELECT * FROM rneg)
         ORDER BY qid, role, pair_rank""",

    // Holt–Winters additive weekly: the q226 recursion with 7
    // seasonal slot columns, constants shared with the Spark call.
    "q256_holt_winters" -> holtWintersOracleSql(300000L, 200000L, 300000L),

    // ORC interchange: the roundtrip must reproduce the parquet-direct
    // rollup exactly (nulls, partition-column round-trip included).
    "q257_orc_interchange" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "q258_temporal_split" ->
      """WITH base AS (SELECT ts::DATE AS d, CAST(user_id AS VARCHAR) AS e
                       FROM events
                       WHERE ts IS NOT NULL AND user_id IS NOT NULL),
              an AS (SELECT min(d) AS mind FROM base),
              tagged AS (SELECT d, e,
                                CASE WHEN d - mind <= 14 THEN 'train'
                                     WHEN d - mind <= 17 THEN 'embargo'
                                     ELSE 'test' END AS split
                         FROM base CROSS JOIN an),
              ps AS (SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
                            CAST(count(DISTINCT e) AS BIGINT) AS n_entities,
                            CAST(min(d) AS VARCHAR) AS min_day,
                            CAST(max(d) AS VARCHAR) AS max_day
                     FROM tagged GROUP BY 1),
              sh AS (SELECT CAST(coalesce(sum(CASE WHEN tr = 1 AND te = 1
                              THEN 1 END), 0) AS BIGINT) AS shared_entities
                     FROM (SELECT e,
                                  max(CASE WHEN split = 'train' THEN 1
                                      ELSE 0 END) AS tr,
                                  max(CASE WHEN split = 'test' THEN 1
                                      ELSE 0 END) AS te
                           FROM tagged GROUP BY e))
         SELECT split, n_rows, n_entities, min_day, max_day,
                shared_entities
         FROM ps CROSS JOIN sh ORDER BY split""",

    // 11th streaming gate: the exact heavy-hitter relation (the q201
    // CMS output equals the exact-threshold relation — its final
    // filter is exact; the streaming counter reproduces it directly).
    "q259_streaming_heavy_hitters" ->
      """WITH r AS (SELECT CAST(event_type AS VARCHAR) AS key FROM events
                    WHERE event_type IS NOT NULL),
              t AS (SELECT greatest(1, count(*) * 50000 // 1000000) AS thr
                    FROM r)
         SELECT key, CAST(count(*) AS BIGINT) AS n_rows
         FROM r CROSS JOIN t
         GROUP BY key, thr HAVING count(*) >= thr ORDER BY key""",

    // Bloom-prefiltered join: output-identical to the PLAIN join —
    // the oracle runs the join with no bloom at all.
    "q260_bloom_join" ->
      """SELECT CAST(o_orderdate::DATE AS VARCHAR) AS day,
                CAST(count(*) AS BIGINT) AS n_items,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS price_cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY 1""",

    // Z-order locality audit: bit-interleave mirrored as a list_sum,
    // both layouts' mean per-bucket extents in exact integers.
    "q261_zorder_audit" ->
      """WITH base AS (SELECT l_partkey & 65535 AS a, l_suppkey & 65535 AS b
                       FROM lineitem
                       WHERE l_partkey IS NOT NULL
                         AND l_suppkey IS NOT NULL),
              z AS (SELECT a, b,
                           CAST(list_sum([(((a >> CAST(i AS INTEGER)) & 1)
                                   << CAST(2 * i AS INTEGER))
                                 + (((b >> CAST(i AS INTEGER)) & 1)
                                   << CAST(2 * i + 1 AS INTEGER))
                                 FOR i IN range(16)]) AS BIGINT) AS zv
                    FROM base),
              za AS (SELECT 'zorder' AS layout,
                            CAST(count(*) AS BIGINT) AS n_buckets,
                            CAST(sum(ea) // count(*) AS BIGINT)
                              AS avg_extent_a,
                            CAST(sum(eb) // count(*) AS BIGINT)
                              AS avg_extent_b
                     FROM (SELECT zv >> 26 AS bk, max(a) - min(a) AS ea,
                                  max(b) - min(b) AS eb
                           FROM z GROUP BY 1)),
              sa AS (SELECT 'sort_a' AS layout,
                            CAST(count(*) AS BIGINT) AS n_buckets,
                            CAST(sum(ea) // count(*) AS BIGINT)
                              AS avg_extent_a,
                            CAST(sum(eb) // count(*) AS BIGINT)
                              AS avg_extent_b
                     FROM (SELECT a >> 10 AS bk, max(a) - min(a) AS ea,
                                  max(b) - min(b) AS eb
                           FROM base GROUP BY 1))
         SELECT * FROM sa UNION ALL SELECT * FROM za ORDER BY layout""",

    "q262_churn_dataset" ->
      """WITH base AS (SELECT user_id, ts::DATE AS d, event_type AS t
                       FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL),
              an AS (SELECT min(d) AS mind FROM base),
              tagged AS (SELECT user_id, d, t, d - mind AS off
                         FROM base CROSS JOIN an
                         WHERE d - mind <= 24)
         SELECT user_id,
                CAST(count(*) FILTER (WHERE off <= 14) AS BIGINT) AS n_events,
                CAST(count(DISTINCT d) FILTER (WHERE off <= 14) AS BIGINT)
                  AS n_active_days,
                CAST(count(*) FILTER (WHERE off <= 14 AND t = 'purchase')
                  AS BIGINT) AS n_purchases,
                CAST(14 - max(off) FILTER (WHERE off <= 14) AS BIGINT)
                  AS recency_days,
                CAST(coalesce(max(CASE WHEN off > 14 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS label_active
         FROM tagged GROUP BY user_id
         HAVING count(*) FILTER (WHERE off <= 14) > 0
         ORDER BY user_id""",

    "q263_frequent_triples" ->
      """WITH b0 AS MATERIALIZED (
                     SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                     FROM lineitem
                     WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
              keep AS (SELECT bk FROM b0 GROUP BY bk HAVING count(*) <= 100),
              b AS MATERIALIZED (
                     SELECT b0.bk, b0.it FROM b0 JOIN keep USING (bk))
         SELECT x.it AS item_a, y.it AS item_b, z.it AS item_c,
                CAST(count(*) AS BIGINT) AS n_abc
         FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
                  JOIN b z ON x.bk = z.bk AND y.it < z.it
         GROUP BY 1, 2, 3 HAVING count(*) >= 2
         ORDER BY n_abc DESC, item_a, item_b, item_c LIMIT 100""",

    "q264_activity_heatmap" ->
      """WITH c AS (SELECT CAST((ts::DATE - DATE '1970-01-01') % 7
                      AS BIGINT) AS weekday,
                           CAST(extract(hour FROM ts) AS BIGINT) AS hour,
                           CAST(count(*) AS BIGINT) AS n_rows
                    FROM events WHERE ts IS NOT NULL
                    GROUP BY 1, 2),
              t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n FROM c),
              w AS (SELECT weekday, CAST(sum(n_rows) AS BIGINT) AS wn
                    FROM c GROUP BY 1)
         SELECT weekday, hour, n_rows,
                CAST(n_rows * 1000000 // n AS BIGINT) AS share_ppm,
                CAST(n_rows * 1000000 // wn AS BIGINT)
                  AS weekday_share_ppm
         FROM c JOIN w USING (weekday) CROSS JOIN t
         ORDER BY weekday, hour""",

    // PNG decode (q265): the oracle mirrors the SYNTHESIZED raster —
    // the q31 blob convention: dims derive from strlen, the raw raster
    // is the text's leading bytes zero-padded, so every decoded feature
    // (dims, filter-byte sum, inflated length, unfiltered checksum) is
    // recomputable from the text without a DuckDB zlib. The codec work
    // (CRC walk, multi-IDAT reassembly, Inflater, five-filter
    // reconstruction) is exactly what the hash compare certifies: any
    // mis-decode lands in px_checksum.
    "q265_png_features" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
             strlen(text) AS len,
             strlen(text) % 11 + 2 AS w,
             strlen(text) % 5 + 2 AS h
           FROM documents)
         SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(2 AS BIGINT) AS n_idat,
           CAST(list_sum(list_transform(range(h), r -> r % 5))
                AS BIGINT) AS filter_sum,
           CAST(h * (1 + 3 * w) AS BIGINT) AS n_filtered,
           CAST(COALESCE(list_sum(list_transform(
                  range(1, LEAST(w * h * 3, len) + 1),
                  i -> ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER),
                                       2))::BIGINT)), 0)
                AS BIGINT) AS px_checksum
         FROM m ORDER BY doc_id""",

    // Adaptive index tick, STABLE branch: the q133 maintained index +
    // the global audit mean under the pinned seeds (q91's d2u math,
    // summed corpus-wide) + the decision literal the Spark tick must
    // reproduce at the shared ceiling.
    "q266_adaptive_index_stable" ->
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
         du AS (SELECT CAST(round((${dotSqlN("nw.vec", "nw.vec", 64)}
                                  - 2 * ${dotSqlN("nw.vec", "cen.cvec", 64)}
                                  + ${dotSqlN("cen.cvec", "cen.cvec", 64)}) * 1e6)
                         AS BIGINT) AS d2u
               FROM asg JOIN nw ON nw.id = asg.id JOIN cen ON cen.cid = asg.cell),
         mm AS (SELECT CAST(sum(d2u) AS BIGINT) // count(*) AS md FROM du),
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
         SELECT 'maintained' AS decision,
                (SELECT md FROM mm) AS mean_d2_micro,
                asg.id, asg.cell, cs.code_str
         FROM asg JOIN cs USING (id) ORDER BY asg.id""",

    // Adaptive index tick, DRIFTED branch: audit mean under the OLD
    // seeds on the 3x-rescaled corpus trips the ceiling, so the
    // oracle re-derives the FULL retrain — exact-integer Lloyd (q146
    // CTEs over the drifted source, k = 16 pinned cells), fresh
    // max-abs scales, re-encoded postings under the trained model.
    "q267_adaptive_index_drifted" ->
      s"""WITH ${kmeansCtesSql(16, 2, 64,
            """(SELECT vec_id,
                       list_transform(embedding, x -> CAST(3.0 * x AS FLOAT)) AS embedding
                FROM embeddings WHERE vec_id % 10 <> 7) emb""")},
         cf AS (SELECT cell,
                       list(CAST(CAST(c AS DOUBLE) / 1000000.0 - 1.0 AS FLOAT)
                            ORDER BY d) AS cvec
                FROM c2 GROUP BY cell),
         dims AS (SELECT CAST(unnest(range(64)) AS INTEGER) AS i),
         nw AS (SELECT vec_id AS id,
                       list_transform(embedding, x -> CAST(3.0 * x AS FLOAT)) AS vec
                FROM embeddings WHERE vec_id % 10 <> 7),
         cen AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                 WHERE vec_id BETWEEN 20 AND 35),
         asgO AS (SELECT id, cell FROM (
             SELECT nw.id, cen.cid AS cell,
                    row_number() OVER (PARTITION BY nw.id
                      ORDER BY ${cosSql("nw.vec", "cen.cvec")} DESC, cen.cid) AS rn
             FROM nw CROSS JOIN cen) t WHERE rn = 1),
         du AS (SELECT CAST(round((${dotSqlN("nw.vec", "nw.vec", 64)}
                                  - 2 * ${dotSqlN("nw.vec", "cen.cvec", 64)}
                                  + ${dotSqlN("cen.cvec", "cen.cvec", 64)}) * 1e6)
                         AS BIGINT) AS d2u
               FROM asgO JOIN nw ON nw.id = asgO.id JOIN cen ON cen.cid = asgO.cell),
         mm AS (SELECT CAST(sum(d2u) AS BIGINT) // count(*) AS md FROM du),
         sc AS (SELECT i, max(abs(CAST(vec[i + 1] AS DOUBLE))) AS s
                FROM nw, dims GROUP BY i),
         asg AS (SELECT id, cell FROM (
             SELECT nw.id, cf.cell,
                    row_number() OVER (PARTITION BY nw.id
                      ORDER BY ${cosSql("nw.vec", "cf.cvec")} DESC, cf.cell) AS rn
             FROM nw CROSS JOIN cf) t WHERE rn = 1),
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
         SELECT 'rebuilt' AS decision,
                (SELECT md FROM mm) AS mean_d2_micro,
                asg.id, asg.cell, cs.code_str
         FROM asg JOIN cs USING (id) ORDER BY asg.id""",

    "q268_label_propagation" -> labelPropOracleSql(3),

    // Blocklist gate: whitespace tokens of lower(trim(text)), exact
    // hit density ppm, gate at 80000 ppm.
    "q269_blocklist_gate" ->
      """WITH t AS (SELECT doc_id,
                           list_filter(string_split(lower(trim(text)), ' '),
                                       x -> x <> '') AS toks
                    FROM documents)
         SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(len(list_filter(toks,
                  x -> list_contains(['slow', 'dup', 'merge'], x)))
                  AS BIGINT) AS n_hits,
                CAST(CASE WHEN len(toks) > 0
                     THEN len(list_filter(toks,
                       x -> list_contains(['slow', 'dup', 'merge'], x)))
                       * 1000000 // len(toks)
                     ELSE 0 END AS BIGINT) AS hit_ppm,
                (CASE WHEN len(toks) > 0
                 THEN len(list_filter(toks,
                   x -> list_contains(['slow', 'dup', 'merge'], x)))
                   * 1000000 // len(toks)
                 ELSE 0 END) > 80000 AS blocked
         FROM t ORDER BY doc_id""",

    // Reliability diagram: the q83 hashed score per doc (n_tokens>0
    // docs only, the scorer's contract), lang='en' label, 10
    // equal-width bins over [min,max] (the q137 binning).
    "q270_reliability_diagram" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024)
                        * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY doc_id),
         j AS (SELECT s.score, d.lang = 'en' AS y
               FROM s JOIN documents d USING (doc_id)),
         mm AS (SELECT CAST(min(score) AS BIGINT) AS mn,
                       CAST(max(score) AS BIGINT) AS mx FROM j),
         b AS (SELECT CASE WHEN mx = mn THEN 0
                           ELSE least(9, (score - mn) * 10 // (mx - mn + 1))
                      END AS bin, score, y
               FROM j CROSS JOIN mm)
         SELECT CAST(bin AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(CASE WHEN sum(score) >= 0
                     THEN sum(score) // count(*)
                     ELSE -((-sum(score)) // count(*)) END AS BIGINT)
                  AS mean_score,
                CAST(count(*) FILTER (WHERE y) * 1000000 // count(*)
                  AS BIGINT) AS pos_ppm
         FROM b GROUP BY bin ORDER BY bin""",

    // U-shaped 40/20/40 attribution: first/last via the q153 string
    // trick, middle share 200000//(k-2) with the remainder pinned to
    // the FIRST touch.
    "q271_position_attribution" ->
      """WITH t AS (SELECT user_id AS u, event_type AS typ,
                count(*) FILTER (WHERE event_type = 'signup') OVER pw AS n0,
                count(*) FILTER (WHERE event_type = 'view') OVER pw AS n1,
                count(*) FILTER (WHERE event_type = 'click') OVER pw AS n2,
                min(CASE WHEN event_type IN ('signup', 'view', 'click')
                         THEN lpad(CAST(epoch_ms(ts) AS VARCHAR), 20, '0')
                              || '#' || event_type END) OVER pw AS firstt,
                max(CASE WHEN event_type IN ('signup', 'view', 'click')
                         THEN lpad(CAST(epoch_ms(ts) AS VARCHAR), 20, '0')
                              || '#' || event_type END) OVER pw AS lastt
              FROM events
              WINDOW pw AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         c AS (SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
                      CAST(n2 AS BIGINT) AS n2,
                      CAST(n0 + n1 + n2 AS BIGINT) AS k,
                      split_part(firstt, '#', 2) AS fc,
                      split_part(lastt, '#', 2) AS lc
               FROM t WHERE typ = 'purchase'),
         c2 AS (SELECT *,
                       CASE WHEN k >= 3 THEN 200000 // (k - 2) ELSE 0 END AS m,
                       CASE WHEN k >= 3
                            THEN 200000 - (k - 2) * (200000 // (k - 2))
                            ELSE 0 END AS rem
                FROM c),
         arms AS (
           SELECT 'signup' AS channel, n0 AS touches,
                  CASE WHEN k = 0 THEN 0
                       WHEN k = 1 THEN CASE WHEN fc = 'signup' THEN 1000000 ELSE 0 END
                       WHEN k = 2 THEN (CASE WHEN fc = 'signup' THEN 500000 ELSE 0 END)
                                     + (CASE WHEN lc = 'signup' THEN 500000 ELSE 0 END)
                       ELSE (CASE WHEN fc = 'signup' THEN 400000 + rem ELSE 0 END)
                          + (CASE WHEN lc = 'signup' THEN 400000 ELSE 0 END)
                          + (n0 - (CASE WHEN fc = 'signup' THEN 1 ELSE 0 END)
                                - (CASE WHEN lc = 'signup' THEN 1 ELSE 0 END)) * m
                  END AS credit FROM c2
           UNION ALL
           SELECT 'view', n1,
                  CASE WHEN k = 0 THEN 0
                       WHEN k = 1 THEN CASE WHEN fc = 'view' THEN 1000000 ELSE 0 END
                       WHEN k = 2 THEN (CASE WHEN fc = 'view' THEN 500000 ELSE 0 END)
                                     + (CASE WHEN lc = 'view' THEN 500000 ELSE 0 END)
                       ELSE (CASE WHEN fc = 'view' THEN 400000 + rem ELSE 0 END)
                          + (CASE WHEN lc = 'view' THEN 400000 ELSE 0 END)
                          + (n1 - (CASE WHEN fc = 'view' THEN 1 ELSE 0 END)
                                - (CASE WHEN lc = 'view' THEN 1 ELSE 0 END)) * m
                  END FROM c2
           UNION ALL
           SELECT 'click', n2,
                  CASE WHEN k = 0 THEN 0
                       WHEN k = 1 THEN CASE WHEN fc = 'click' THEN 1000000 ELSE 0 END
                       WHEN k = 2 THEN (CASE WHEN fc = 'click' THEN 500000 ELSE 0 END)
                                     + (CASE WHEN lc = 'click' THEN 500000 ELSE 0 END)
                       ELSE (CASE WHEN fc = 'click' THEN 400000 + rem ELSE 0 END)
                          + (CASE WHEN lc = 'click' THEN 400000 ELSE 0 END)
                          + (n2 - (CASE WHEN fc = 'click' THEN 1 ELSE 0 END)
                                - (CASE WHEN lc = 'click' THEN 1 ELSE 0 END)) * m
                  END FROM c2
           UNION ALL
           SELECT 'none', CAST(0 AS BIGINT),
                  CASE WHEN k = 0 THEN 1000000 ELSE 0 END FROM c2)
         SELECT channel,
                CAST(count(*) FILTER (WHERE credit > 0) AS BIGINT)
                  AS n_conversions,
                CAST(sum(touches) AS BIGINT) AS touches,
                CAST(sum(credit) AS BIGINT) AS credit_ppm
         FROM arms GROUP BY 1
         HAVING sum(touches) > 0 OR sum(credit) > 0
         ORDER BY channel""",

    // Conformal threshold: md5 calibration split, k-th largest
    // calibration score per language (ties by doc_id), eval coverage.
    "q272_conformal_threshold" ->
      """WITH base AS (SELECT lang AS g, doc_id AS id,
                              CAST(n_chars AS BIGINT) AS s,
                              ('0x' || substr(md5('conf:' || CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT % 2 = 0 AS calib
                       FROM documents
                       WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         r AS (SELECT g, s,
                      row_number() OVER (PARTITION BY g
                        ORDER BY s DESC, id) AS rn,
                      count(*) OVER (PARTITION BY g) AS n
               FROM base WHERE calib),
         th AS (SELECT g, CAST(max(n) AS BIGINT) AS n_calib,
                       CAST(max(CASE WHEN rn = greatest(1, n * 300000 // 1000000)
                         THEN s END) AS BIGINT) AS threshold
                FROM r GROUP BY g),
         ev AS (SELECT b.g, CAST(count(*) AS BIGINT) AS n_eval,
                       CAST(count(*) FILTER (WHERE b.s >= th.threshold)
                         AS BIGINT) AS n_kept
                FROM base b JOIN th ON b.g = th.g
                WHERE NOT b.calib GROUP BY b.g)
         SELECT th.g AS lang, th.n_calib, th.threshold,
                ev.n_eval, ev.n_kept,
                CAST(ev.n_kept * 1000000 // greatest(ev.n_eval, 1)
                  AS BIGINT) AS kept_ppm
         FROM th JOIN ev ON th.g = ev.g ORDER BY lang""",

    // Snapshot table: after v2 overwrites the trailing 10 days with
    // evens-only, the survivors are (old days: everything) UNION
    // (late days: even event_ids) — recomputed directly.
    "q273_snapshot_table" ->
      """WITH e AS (SELECT ts::DATE AS day, event_id FROM events),
         mx AS (SELECT MAX(day) AS m FROM e)
         SELECT CAST(day AS VARCHAR) AS day,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(event_id) AS BIGINT) AS sum_ids
         FROM e CROSS JOIN mx
         WHERE day <= m - INTERVAL 9 DAY OR event_id % 2 = 0
         GROUP BY 1 ORDER BY 1""",

    // PSI: q83 hashed scores over both snapshots, baseline-fixed
    // 10-bin grid with edge clamps, add-one smoothing, one-ln
    // micro-nat terms. The sign-matched (diff x ln) product is >= 0,
    // so // and div agree on every term.
    "q274_psi_drift" ->
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3),
         nw AS (SELECT doc_id,
                       CASE WHEN doc_id % 10 = 5 THEN text || ' v2'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 7),
         so AS (SELECT 'base' AS snap, doc_id,
                       unnest(string_split(text, ' ')) AS tok FROM o
                UNION ALL
                SELECT 'cur', doc_id, unnest(string_split(text, ' ')) FROM nw),
         f AS (SELECT snap, doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024)
                        * 2654435761 % 2001 - 1000 AS w
               FROM so WHERE tok <> ''),
         sc AS (SELECT snap, doc_id, CAST(sum(w) AS BIGINT) AS s
                FROM f GROUP BY 1, 2),
         mm AS (SELECT CAST(min(s) AS BIGINT) AS mn,
                       CAST(max(s) AS BIGINT) AS mx
                FROM sc WHERE snap = 'base'),
         b AS (SELECT snap,
                      CASE WHEN mx = mn THEN 0
                           ELSE greatest(0, least(9,
                             (s - mn) * 10 // (mx - mn + 1))) END AS bin
               FROM sc CROSS JOIN mm),
         c0 AS (SELECT bin,
                       count(*) FILTER (WHERE snap = 'base') AS nb,
                       count(*) FILTER (WHERE snap = 'cur') AS nc
                FROM b GROUP BY 1),
         c AS (SELECT g.range AS bin, coalesce(nb, 0) AS nb,
                      coalesce(nc, 0) AS nc
               FROM range(0, 10) g LEFT JOIN c0 ON c0.bin = g.range),
         t AS (SELECT CAST(sum(nb) AS BIGINT) AS tb,
                      CAST(sum(nc) AS BIGINT) AS tc FROM c),
         r AS (SELECT bin, nb, nc,
                      CAST((nb + 1) * 1000000 // (tb + 10) AS BIGINT) AS pb,
                      CAST((nc + 1) * 1000000 // (tc + 10) AS BIGINT) AS pc,
                      CAST(round(ln(CAST((nc + 1) * (tb + 10) AS DOUBLE)
                                  / CAST((nb + 1) * (tc + 10) AS DOUBLE))
                                 * 1e6) AS BIGINT) AS lr
               FROM c CROSS JOIN t)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(nb AS BIGINT) AS n_base,
                CAST(nc AS BIGINT) AS n_cur,
                pb AS p_base_ppm, pc AS p_cur_ppm,
                CAST((pc - pb) * lr // 1000000 AS BIGINT) AS term_micro
         FROM r ORDER BY bin""",

    // Trimmed mean: per-(flag, cents) histogram, ascending/descending
    // cumulative cut masses with a partial boundary-class take; all
    // values nonnegative so // and div agree.
    "q275_trimmed_mean" ->
      """WITH q AS (SELECT l_returnflag AS g,
                           CAST(round(l_extendedprice * 100) AS BIGINT) AS v
                    FROM lineitem),
         h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
         e AS (SELECT g, v, c,
                      sum(c) OVER (PARTITION BY g ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                      sum(c) OVER (PARTITION BY g) AS n,
                      sum(c * v) OVER (PARTITION BY g) AS sv
               FROM h),
         e2 AS (SELECT *, n * 50000 // 1000000 AS k FROM e),
         e3 AS (SELECT g, n, sv, k, v,
                       least(c, greatest(0, k - (cum - c))) AS lo,
                       least(c, greatest(0, k - (n - cum))) AS hi
                FROM e2),
         a AS (SELECT g, CAST(max(n) AS BIGINT) AS n_rows,
                      CAST(max(k) AS BIGINT) AS n_trimmed_each,
                      CAST(max(sv) AS BIGINT) AS svm,
                      CAST(sum(lo * v) AS BIGINT) AS losum,
                      CAST(sum(hi * v) AS BIGINT) AS hisum
               FROM e3 GROUP BY g)
         SELECT g AS l_returnflag, n_rows, n_trimmed_each,
                CAST((svm - losum - hisum)
                     // (n_rows - 2 * n_trimmed_each) AS BIGINT)
                  AS trimmed_mean,
                CAST(svm // n_rows AS BIGINT) AS plain_mean
         FROM a ORDER BY 1""",

    // Cohen's kappa: the q83 hashed score in 3 classes vs a length
    // tercile rule; po/pe exact ppm, kappa with the tdiv sign-split
    // (po - pe can be negative; Spark div truncates, // floors).
    "q276_cohen_kappa" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024)
                        * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY 1),
         r AS (SELECT d.doc_id,
                      CASE WHEN s.score < 0 THEN 'low'
                           WHEN s.score < 2000 THEN 'mid'
                           ELSE 'high' END AS a,
                      CASE WHEN length(d.text) < 200 THEN 'low'
                           WHEN length(d.text) < 400 THEN 'mid'
                           ELSE 'high' END AS b
               FROM documents d JOIN s ON s.doc_id = d.doc_id),
         cells AS (SELECT a, b, count(*) AS c FROM r GROUP BY 1, 2),
         core AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                         CAST(coalesce(sum(c) FILTER (WHERE a = b), 0)
                              AS BIGINT) AS n_agree
                  FROM cells),
         ra AS (SELECT a AS k, sum(c) AS na FROM cells GROUP BY 1),
         rb AS (SELECT b AS k, sum(c) AS nb FROM cells GROUP BY 1),
         marg AS (SELECT coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
                  FROM ra FULL OUTER JOIN rb ON ra.k = rb.k),
         ch AS (SELECT CAST(count(*) AS BIGINT) AS n_classes,
                       CAST(sum(na * nb) AS BIGINT) AS pe_num
                FROM marg),
         p AS (SELECT n, n_agree, n_classes,
                      n_agree * 1000000 // n AS po_ppm,
                      pe_num * 1000000 // (n * n) AS pe_ppm
               FROM core CROSS JOIN ch)
         SELECT n, n_agree, n_classes, po_ppm, pe_ppm,
                CASE WHEN pe_ppm = 1000000 THEN NULL
                     WHEN po_ppm >= pe_ppm
                       THEN (po_ppm - pe_ppm) * 1000000
                              // (1000000 - pe_ppm)
                     ELSE -((pe_ppm - po_ppm) * 1000000
                              // (1000000 - pe_ppm)) END AS kappa_ppm
         FROM p""",

    "q277_bradley_terry" -> bradleyTerryOracleSql,

    // Win-rate matrix: exact ppm rate + the Wilson bounds as the SAME
    // stated IEEE chain (adds/multiplies/one sqrt, all
    // correctly-rounded, then round-to-ppm) the Spark side runs.
    "q278_win_rate_matrix" ->
      s"""WITH $preferenceMatchesSql,
         g AS (SELECT least(w, l) AS item_a, greatest(w, l) AS item_b,
                      CAST(count(*) AS BIGINT) AS n_matches,
                      CAST(coalesce(sum(CASE WHEN w < l THEN 1 ELSE 0 END),
                                    0) AS BIGINT) AS wins_a
               FROM mt GROUP BY 1, 2)
         SELECT item_a, item_b, n_matches, wins_a,
                wins_a * 1000000 // n_matches AS win_rate_ppm,
                CAST(round(((wins_a + 3.8416 / 2) / (n_matches + 3.8416)
                  - 1.96 * sqrt(wins_a * (n_matches - wins_a) / n_matches
                      + 3.8416 / 4) / (n_matches + 3.8416)) * 1e6)
                  AS BIGINT) AS wilson_lo_ppm,
                CAST(round(((wins_a + 3.8416 / 2) / (n_matches + 3.8416)
                  + 1.96 * sqrt(wins_a * (n_matches - wins_a) / n_matches
                      + 3.8416 / 4) / (n_matches + 3.8416)) * 1e6)
                  AS BIGINT) AS wilson_hi_ppm
         FROM g ORDER BY item_a, item_b""",

    // Preference pairs: per 25-doc prompt group, best/worst by score
    // with smallest-id ties (row_number mirrors the struct extrema),
    // margin >= 500.
    "q279_preference_pairs" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
         f AS (SELECT doc_id,
                      (('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024)
                        * 2654435761 % 2001 - 1000 AS w
               FROM t WHERE tok <> ''),
         s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
               FROM f GROUP BY 1),
         p AS (SELECT doc_id // 25 AS prompt, doc_id, score FROM s),
         w1 AS (SELECT prompt, doc_id, score,
                       row_number() OVER (PARTITION BY prompt
                         ORDER BY score DESC, doc_id ASC) AS rc,
                       row_number() OVER (PARTITION BY prompt
                         ORDER BY score ASC, doc_id ASC) AS rr,
                       CAST(count(*) OVER (PARTITION BY prompt)
                            AS BIGINT) AS n_candidates
                FROM p),
         ch AS (SELECT prompt, n_candidates, doc_id AS chosen_id,
                       score AS chosen_score
                FROM w1 WHERE rc = 1),
         rj AS (SELECT prompt, doc_id AS rejected_id,
                       score AS rejected_score
                FROM w1 WHERE rr = 1)
         SELECT ch.prompt, n_candidates, chosen_id, rejected_id,
                chosen_score, rejected_score,
                chosen_score - rejected_score AS margin
         FROM ch JOIN rj USING (prompt)
         WHERE chosen_id <> rejected_id
           AND chosen_score - rejected_score >= 500
         ORDER BY prompt""",

    // Quantile-sketch audit: the oracle pins within_eps true (the
    // q241 convention — the sketch element itself is not
    // oracle-reproducible) and re-derives group row counts exactly.
    "q280_quantile_sketch_audit" ->
      """WITH n AS (SELECT l_returnflag AS g,
                         CAST(count(*) AS BIGINT) AS n_rows
                  FROM lineitem GROUP BY 1),
         p(pct) AS (VALUES (10000), (250000), (500000), (750000),
                           (990000))
         SELECT g AS l_returnflag, CAST(pct AS BIGINT) AS pctile_ppm,
                n_rows, true AS within_eps
         FROM n CROSS JOIN p ORDER BY 1, 2""",

    // Brier decomposition: the calibrated-synthetic fixture re-derived
    // from the same md5 chains; squares computed BEFORE any division
    // so // and div agree everywhere.
    "q281_brier_decomposition" ->
      """WITH c AS (SELECT
                (('0x' || substr(md5('cal:' || CAST(doc_id AS VARCHAR)),
                   1, 15))::BIGINT % 1001) * 1000 AS p,
                CASE WHEN ('0x' || substr(md5('out:' ||
                            CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                           % 1000000
                        < (('0x' || substr(md5('cal:' ||
                            CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                           % 1001) * 1000
                     THEN 1 ELSE 0 END AS ob
              FROM documents),
         b AS (SELECT least(9, p * 10 // 1000001) AS bin,
                      CAST(count(*) AS BIGINT) AS nk,
                      CAST(sum(p) AS BIGINT) AS sp,
                      CAST(sum(ob) AS BIGINT) AS so,
                      CAST(sum((p - ob * 1000000) * (p - ob * 1000000))
                        AS BIGINT) AS sq
               FROM c GROUP BY 1),
         t AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
                      CAST(sum(so) AS BIGINT) AS son,
                      CAST(sum(sq) AS BIGINT) AS sqn FROM b),
         k AS (SELECT t.n, son * 1000000 // t.n AS obar, sqn, nk,
                      sp // nk AS pbar, so * 1000000 // nk AS okbar
               FROM b CROSS JOIN t),
         r AS (SELECT n, obar, sqn,
                      CAST(sum(nk * ((pbar - okbar) * (pbar - okbar)))
                        AS BIGINT) AS reln,
                      CAST(sum(nk * ((okbar - obar) * (okbar - obar)))
                        AS BIGINT) AS resn
               FROM k GROUP BY 1, 2, 3)
         SELECT n, sqn // (n * 1000000) AS brier_micro,
                reln // (n * 1000000) AS reliability_micro,
                resn // (n * 1000000) AS resolution_micro,
                obar * (1000000 - obar) // 1000000 AS uncertainty_micro
         FROM r""",

    // Rolling-origin folds: expanding train windows, fixed 5-day test
    // horizon, ceil fold cuts over the day span.
    "q282_rolling_folds" ->
      """WITH days AS (SELECT CAST(ts AS DATE) AS d,
                            CAST(count(*) AS BIGINT) AS c
                     FROM events GROUP BY 1),
         sp AS (SELECT min(d) AS d0,
                       CAST(max(d) - min(d) + 1 AS BIGINT) AS span
                FROM days),
         f AS (SELECT CAST(fold AS BIGINT) AS fold, d0,
                      (span * fold + 4) // 5 AS cut
               FROM sp CROSS JOIN
                    (SELECT unnest(range(1, 5)) AS fold)),
         b AS (SELECT fold, d0 AS train_from,
                      d0 + CAST(cut AS INTEGER) AS test_from,
                      d0 + CAST(cut + 5 AS INTEGER) AS test_until
               FROM f)
         SELECT b.fold, CAST(b.train_from AS VARCHAR) AS train_from,
                CAST(b.test_from AS VARCHAR) AS test_from,
                CAST(b.test_until AS VARCHAR) AS test_until,
                CAST(coalesce(sum(CASE WHEN d.d < b.test_from
                                       THEN d.c END), 0) AS BIGINT)
                  AS n_train,
                CAST(coalesce(sum(CASE WHEN d.d >= b.test_from
                                       THEN d.c END), 0) AS BIGINT)
                  AS n_test
         FROM b LEFT JOIN days d ON d.d < b.test_until
         GROUP BY 1, 2, 3, 4 ORDER BY fold""",

    // Propensity-matched ATT: nearest control score class (ties to the
    // lower side), exact class-mean control outcome, signed ATT with
    // the tdiv sign-split.
    "q283_propensity_att" ->
      s"""WITH $causalUnitsSql,
         reps AS MATERIALIZED (
                 SELECT score AS cs,
                        CAST(sum(post) * 1000000 // count(*) AS BIGINT)
                          AS cy
                 FROM un WHERE NOT t GROUP BY 1),
         cls AS MATERIALIZED (
                 SELECT score AS s, post AS y,
                        CAST(count(*) AS BIGINT) AS n
                 FROM un WHERE t GROUP BY 1, 2),
         cand AS (SELECT c.s, c.y, c.n, r.cs, r.cy
                  FROM cls c JOIN reps r ON abs(r.cs - c.s) <= 25000),
         best AS (SELECT s, y, n, cy FROM (
                   SELECT s, y, n, cy,
                          row_number() OVER (PARTITION BY s, y
                            ORDER BY abs(cs - s), cs) AS rn
                   FROM cand) WHERE rn = 1),
         m AS (SELECT c.s, c.y, c.n, b.cy
               FROM cls c LEFT JOIN best b USING (s, y, n)),
         a AS (SELECT CAST(sum(n) AS BIGINT) AS n_treated,
                      CAST(coalesce(sum(n) FILTER (WHERE cy IS NOT NULL),
                                    0) AS BIGINT) AS n_matched,
                      CAST(coalesce(sum((y * 1000000 - cy) * n)
                                      FILTER (WHERE cy IS NOT NULL), 0)
                        AS BIGINT) AS sd
               FROM m)
         SELECT n_treated, n_matched,
                n_matched * 1000000 // greatest(n_treated, 1)
                  AS match_rate_ppm,
                CASE WHEN n_matched = 0 THEN NULL
                     WHEN sd >= 0 THEN sd // n_matched
                     ELSE -((-sd) // n_matched) END AS att_micro
         FROM a""",

    // Difference-in-differences: the 2x2 cell means (all divisions on
    // nonnegative sums) and the subtraction-only estimate.
    "q284_diff_in_diff" ->
      s"""WITH $causalUnitsSql,
         lg AS (SELECT t, false AS p, pre AS v FROM un
                UNION ALL SELECT t, true, post FROM un),
         cm AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(v) * 1000000 // count(*) AS BIGINT) AS m
                FROM lg GROUP BY 1, 2)
         SELECT max(CASE WHEN t AND NOT p THEN n END) AS n_t_pre,
                max(CASE WHEN t AND p THEN n END) AS n_t_post,
                max(CASE WHEN NOT t AND NOT p THEN n END) AS n_c_pre,
                max(CASE WHEN NOT t AND p THEN n END) AS n_c_post,
                max(CASE WHEN t AND NOT p THEN m END) AS m_t_pre,
                max(CASE WHEN t AND p THEN m END) AS m_t_post,
                max(CASE WHEN NOT t AND NOT p THEN m END) AS m_c_pre,
                max(CASE WHEN NOT t AND p THEN m END) AS m_c_post,
                (max(CASE WHEN t AND p THEN m END)
                   - max(CASE WHEN t AND NOT p THEN m END))
                - (max(CASE WHEN NOT t AND p THEN m END)
                   - max(CASE WHEN NOT t AND NOT p THEN m END))
                  AS did_micro
         FROM cm""",

    // CUPED: theta and the adjustment product carry signs — both get
    // the tdiv sign-split; rho2 is the same stated IEEE chain
    // (multiplies, one divide, round) as the Spark side.
    "q285_cuped" ->
      s"""WITH $causalUnitsSql,
         mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(pre) AS BIGINT) AS sx,
                        CAST(count(*) * sum(pre * pre)
                             - sum(pre) * sum(pre) AS BIGINT) AS varn,
                        CAST(count(*) * sum(pre * post)
                             - sum(pre) * sum(post) AS BIGINT) AS covn,
                        CAST(count(*) * sum(post * post)
                             - sum(post) * sum(post) AS BIGINT) AS varny
                 FROM un),
         th AS (SELECT n, sx, varn,
                       CASE WHEN covn >= 0 THEN covn * 1000000 // varn
                            ELSE -((-covn) * 1000000 // varn)
                       END AS theta_ppm,
                       CAST(round(covn::DOUBLE * covn::DOUBLE
                              / (varn::DOUBLE * varny::DOUBLE) * 1e6)
                         AS BIGINT) AS rho2_ppm
                FROM mom),
         g AS (SELECT CAST(t AS VARCHAR) AS treated,
                      CAST(count(*) AS BIGINT) AS n_g,
                      CAST(sum(pre) AS BIGINT) AS sxg,
                      CAST(sum(post) AS BIGINT) AS syg
               FROM un GROUP BY 1),
         j AS (SELECT treated, n_g,
                      syg * 1000000 // n_g AS mean_micro,
                      theta_ppm
                        * (sxg * 1000000 // n_g - sx * 1000000 // n)
                        AS prod,
                      theta_ppm, rho2_ppm
               FROM g CROSS JOIN th)
         SELECT treated, n_g, mean_micro,
                mean_micro - (CASE WHEN prod >= 0 THEN prod // 1000000
                                   ELSE -((-prod) // 1000000) END)
                  AS adjusted_micro,
                theta_ppm, rho2_ppm
         FROM j ORDER BY treated""",

    "q286_mcnemar" -> mcnemarOracleSql,
    "q287_mde" -> mdeOracleSql,
    "q288_temperature_mixture" -> temperatureMixtureOracleSql,

    // GIF decode: dims and both checksums re-derived from the
    // synthesized text (the q265 blob convention) — the LZW path
    // (variable-width codes, CLEAR reset, KwKwK, LSB bit packing,
    // sub-block reassembly) is exactly what the hash compare
    // certifies; padding indices are 0 and the palette maps 0 -> 0.
    // The Spark encoder consumes UTF-8 BYTES, so the oracle indexes
    // OCTETS via hex(encode(text)) (2 hex chars per byte) rather than
    // character code points — non-ASCII text agrees byte-for-byte.
    "q289_gif_features" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
             strlen(text) AS len,
             strlen(text) % 13 + 2 AS w,
             strlen(text) % 7 + 2 AS h
           FROM documents),
         b AS (SELECT doc_id, w, h,
                      list_transform(range(1, LEAST(w * h, len) + 1),
                        i -> ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER),
                                             2))::BIGINT) AS oct
               FROM m)
         SELECT doc_id, CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(COALESCE(list_sum(oct), 0) AS BIGINT) AS idx_checksum,
           CAST(COALESCE(list_sum(list_transform(oct,
                  v -> v + (2 * v) % 256 + (7 * v) % 256)), 0)
                AS BIGINT) AS px_checksum
         FROM b ORDER BY doc_id""",

    // JPEG decode (q290): dims/blocks/restarts and the pixel checksum
    // re-derived from the text. The fixture's 8x8 blocks are CONSTANT
    // at the document's i-th byte (DC-only, quant 1), so every
    // conforming IDCT reconstructs the block value exactly — the
    // whole decode pipeline (marker walk, carried-DHT canonical
    // Huffman build, entropy decode + 0xFF00 unstuffing, RSTn cycle
    // at interval 4, dequant, de-zigzag, IDCT) lands in px_checksum.
    // Octet-indexed via hex(encode(text)) — byte-true for any UTF-8.
    "q290_jpeg_features" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS hx,
             strlen(text) AS len,
             strlen(text) % 5 + 1 AS wb,
             strlen(text) % 3 + 1 AS hb
           FROM documents)
         SELECT doc_id, CAST(8 * wb AS BIGINT) AS width,
           CAST(8 * hb AS BIGINT) AS height,
           CAST(wb * hb AS BIGINT) AS n_blocks,
           CAST((wb * hb - 1) // 4 AS BIGINT) AS n_restarts,
           CAST(64 * COALESCE(list_sum(list_transform(
                  range(1, LEAST(wb * hb, len) + 1),
                  i -> ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER),
                                       2))::BIGINT)), 0)
                AS BIGINT) AS px_checksum
         FROM m ORDER BY doc_id""",

    // mSPRT sequential monitor: the q195 experiment replayed by
    // enrollment day. Cumulative counts are exact-long windows; each
    // day's mixture log-LR is the SAME stated IEEE chain the Spark
    // side runs (pooled v, tau2 = 10000/1e6, ln + one division
    // ladder), quantized to micro BEFORE the running max so the
    // extremum is over exact longs; p = exp(-max/1e6) off that long.
    "q292_msprt_monitor" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS u,
                     ts::DATE AS unit_day,
                     CASE WHEN max(CASE WHEN event_type = 'purchase'
                                        THEN 1 END) IS NULL THEN 0
                          ELSE 1 END AS conv
               FROM events GROUP BY 1, 2),
         a AS (SELECT unit_day,
                      ('0x' || substr(md5('ab:exp1:' || u), 1, 15))::BIGINT
                        % 2 AS arm, conv
               FROM pu),
         d AS (SELECT unit_day AS day,
                      CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS d_na,
                      CAST(coalesce(sum(conv) FILTER (WHERE arm = 0), 0)
                        AS BIGINT) AS d_xa,
                      CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS d_nb,
                      CAST(coalesce(sum(conv) FILTER (WHERE arm = 1), 0)
                        AS BIGINT) AS d_xb
               FROM a GROUP BY 1),
         c AS (SELECT day,
                      CAST(sum(d_na) OVER w AS BIGINT) AS n_a,
                      CAST(sum(d_xa) OVER w AS BIGINT) AS x_a,
                      CAST(sum(d_nb) OVER w AS BIGINT) AS n_b,
                      CAST(sum(d_xb) OVER w AS BIGINT) AS x_b
               FROM d
               WINDOW w AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         l AS (SELECT day, n_a, x_a, n_b, x_b,
                      CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                                AND x_a + x_b < n_a + n_b
                           THEN (CAST(x_a + x_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE)) *
                             (1.0 - CAST(x_a + x_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE)) *
                             (1.0 / CAST(n_a AS DOUBLE)
                               + 1.0 / CAST(n_b AS DOUBLE))
                      END AS v,
                      CAST(10000 AS DOUBLE) / 1000000.0 AS t2
               FROM c),
         e AS (SELECT day, n_a, x_a, n_b, x_b,
                      CASE WHEN v IS NOT NULL
                           THEN CAST(round((0.5 * ln(v / (v + t2)) +
                             (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
                              CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) *
                             (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
                              CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) *
                             t2 / (2.0 * v * (v + t2))) * 1000000.0)
                             AS BIGINT)
                      END AS log_lr_micro
               FROM l),
         f AS (SELECT day, n_a, x_a, n_b, x_b, log_lr_micro,
                      max(log_lr_micro) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS max_log_lr_micro
               FROM e),
         g AS (SELECT *,
                      CAST(CASE WHEN max_log_lr_micro IS NULL THEN 1000000
                                ELSE LEAST(1000000, CAST(round(
                                  exp(-max_log_lr_micro / 1000000.0)
                                  * 1000000.0) AS BIGINT))
                           END AS BIGINT) AS always_valid_p_ppm
               FROM f)
         SELECT CAST(day AS VARCHAR) AS day, n_a, x_a, n_b, x_b,
                log_lr_micro, max_log_lr_micro, always_valid_p_ppm,
                always_valid_p_ppm <= 50000 AS reject_at_5pct
         FROM g ORDER BY day""",

    // Ratio-metric delta-method CI: exact per-arm moments over the
    // per-user (views, purchases) units; ratio exact ppm; se/CI the
    // SAME stated IEEE chain the Spark side runs (n-scaled sample
    // covariances, delta-method variance, one sqrt, round-to-micro).
    "q293_ratio_metric_ci" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS u,
                     CAST(count(*) FILTER (WHERE event_type = 'view')
                       AS BIGINT) AS x,
                     CAST(count(*) FILTER (WHERE event_type = 'purchase')
                       AS BIGINT) AS y
               FROM events GROUP BY 1),
         a AS (SELECT CAST(('0x' || substr(md5('ab:exp1:' || u), 1, 15))
                        ::BIGINT % 2 AS VARCHAR) AS arm, x, y
               FROM pu),
         m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx,
                      CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x * x) AS BIGINT) AS sxx,
                      CAST(sum(x * y) AS BIGINT) AS sxy,
                      CAST(sum(y * y) AS BIGINT) AS syy
               FROM a GROUP BY 1),
         r AS (SELECT arm, n, sx AS sum_x, sy AS sum_y,
                      sy * 1000000 // sx AS ratio_ppm,
                      CAST(round(sqrt(greatest(0.0,
                        ((CAST(n * syy - sy * sy AS DOUBLE)
                          - 2.0 * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                            * CAST(n * sxy - sx * sy AS DOUBLE)
                          + (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                            * (CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))
                            * CAST(n * sxx - sx * sx AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                        / (CAST(n AS DOUBLE)
                           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))))
                        * 1000000.0) AS BIGINT) AS se_micro
               FROM m)
         SELECT arm, n, sum_x, sum_y, ratio_ppm, se_micro,
                CAST(round(CAST(ratio_ppm AS DOUBLE)
                  - 1.96 * CAST(se_micro AS DOUBLE)) AS BIGINT) AS ci_lo_ppm,
                CAST(round(CAST(ratio_ppm AS DOUBLE)
                  + 1.96 * CAST(se_micro AS DOUBLE)) AS BIGINT) AS ci_hi_ppm
         FROM r ORDER BY arm""",

    // SRM audit: exact arm counts; the one-df chi-square against the
    // configured 50/50 split as the SAME stated IEEE chain, quantized
    // to micro; the flag at the 3.841459 critical value.
    "q294_srm_audit" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events
               GROUP BY 1),
         a AS (SELECT ('0x' || substr(md5('ab:exp1:' || u), 1, 15))::BIGINT
                        % 2 AS arm
               FROM pu),
         c AS (SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
                      CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b
               FROM a),
         s AS (SELECT n_a, n_b, CAST(500000 AS BIGINT) AS expected_a_ppm,
                      n_a * 1000000 // (n_a + n_b) AS observed_a_ppm,
                      CAST(round(
                        ((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE)
                          * (500000 / 1000000.0)) *
                         (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE)
                          * (500000 / 1000000.0)))
                        / (CAST(n_a + n_b AS DOUBLE) * (500000 / 1000000.0)
                           * (1.0 - 500000 / 1000000.0))
                        * 1000000.0) AS BIGINT) AS chi2_micro
               FROM c)
         SELECT n_a, n_b, expected_a_ppm, observed_a_ppm, chi2_micro,
                chi2_micro > 3841459 AS srm_detected
         FROM s""")

  /** q291 experiment readout: the sheet is PURE COMPOSITION — each
    * section's numbers are lifted from the source query's own oracle
    * (nested as MATERIALIZED CTEs), so the sheet can never drift
    * from what q195/q285/q287/q276/q286 individually certify. */
  private[graft] def experimentReadoutOracle(
      base: Map[String, String]): String =
    s"""WITH cup AS MATERIALIZED (${base("q285_cuped")}),
       mde AS MATERIALIZED (${base("q287_mde")}),
       ab AS MATERIALIZED (${base("q195_ab_test")}),
       kap AS MATERIALIZED (${base("q276_cohen_kappa")}),
       mcn AS MATERIALIZED (${base("q286_mcnemar")})
       SELECT metric, value FROM (
         SELECT 'cuped_n_treated' AS metric,
                CAST(max(CASE WHEN treated = 'true' THEN n_g END)
                  AS BIGINT) AS value FROM cup
         UNION ALL SELECT 'cuped_n_control',
           CAST(max(CASE WHEN treated = 'false' THEN n_g END) AS BIGINT)
           FROM cup
         UNION ALL SELECT 'cuped_mean_treated_micro',
           CAST(max(CASE WHEN treated = 'true' THEN mean_micro END)
             AS BIGINT) FROM cup
         UNION ALL SELECT 'cuped_mean_control_micro',
           CAST(max(CASE WHEN treated = 'false' THEN mean_micro END)
             AS BIGINT) FROM cup
         UNION ALL SELECT 'cuped_adj_treated_micro',
           CAST(max(CASE WHEN treated = 'true' THEN adjusted_micro END)
             AS BIGINT) FROM cup
         UNION ALL SELECT 'cuped_adj_control_micro',
           CAST(max(CASE WHEN treated = 'false' THEN adjusted_micro END)
             AS BIGINT) FROM cup
         UNION ALL SELECT 'cuped_theta_ppm',
           CAST(max(theta_ppm) AS BIGINT) FROM cup
         UNION ALL SELECT 'cuped_rho2_ppm',
           CAST(max(rho2_ppm) AS BIGINT) FROM cup
         UNION ALL SELECT 'mde_abs_micro',
           CAST(mde_abs_micro AS BIGINT) FROM mde
         UNION ALL SELECT 'mde_rel_ppm', CAST(mde_rel_ppm AS BIGINT) FROM mde
         UNION ALL SELECT 'ab_n_a', CAST(n_a AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_x_a', CAST(x_a AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_n_b', CAST(n_b AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_x_b', CAST(x_b AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_rate_a_ppm', CAST(rate_a_ppm AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_rate_b_ppm', CAST(rate_b_ppm AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_z_micro',
           CAST(round(z * 1000000.0) AS BIGINT) FROM ab
         UNION ALL SELECT 'ab_significant',
           CAST(CASE WHEN significant THEN 1 ELSE 0 END AS BIGINT) FROM ab
         UNION ALL SELECT 'label_kappa_ppm', CAST(kappa_ppm AS BIGINT) FROM kap
         UNION ALL SELECT 'label_po_ppm', CAST(po_ppm AS BIGINT) FROM kap
         UNION ALL SELECT 'label_pe_ppm', CAST(pe_ppm AS BIGINT) FROM kap
         UNION ALL SELECT 'label_mcnemar_chi2_micro',
           CAST(chi2_micro AS BIGINT) FROM mcn
         UNION ALL SELECT 'label_mcnemar_a_only',
           CAST(n_a_only AS BIGINT) FROM mcn
         UNION ALL SELECT 'label_mcnemar_b_only',
           CAST(n_b_only AS BIGINT) FROM mcn
       ) ORDER BY metric"""

  /** q286 McNemar: the same hash models re-derived; only the
    * discordant counts enter the statistic. */
  private def mcnemarOracleSql: String =
    """WITH d AS (SELECT doc_id % 3 AS truth,
                CASE WHEN ('0x' || substr(md5('ma:' ||
                       CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 7
                     THEN doc_id % 3 ELSE (doc_id % 3 + 1) % 3 END AS a,
                CASE WHEN ('0x' || substr(md5('mb:' ||
                       CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 6
                     THEN doc_id % 3 ELSE (doc_id % 3 + 2) % 3 END AS b
              FROM documents),
       c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(coalesce(sum(CASE WHEN a = truth AND b = truth
                      THEN 1 END), 0) AS BIGINT) AS n_both_correct,
                    CAST(coalesce(sum(CASE WHEN a = truth AND b <> truth
                      THEN 1 END), 0) AS BIGINT) AS n_a_only,
                    CAST(coalesce(sum(CASE WHEN a <> truth AND b = truth
                      THEN 1 END), 0) AS BIGINT) AS n_b_only,
                    CAST(coalesce(sum(CASE WHEN a <> truth AND b <> truth
                      THEN 1 END), 0) AS BIGINT) AS n_both_wrong
             FROM d)
       SELECT n, n_both_correct, n_a_only, n_b_only, n_both_wrong,
              CASE WHEN n_a_only + n_b_only = 0 THEN NULL
                   ELSE (abs(n_a_only - n_b_only) - 1)
                        * (abs(n_a_only - n_b_only) - 1)
                        * 1000000 // (n_a_only + n_b_only)
              END AS chi2_micro
       FROM c"""

  /** q287 MDE: exact arm moments, then the SAME 2.8016·sqrt chain. */
  private def mdeOracleSql: String =
    s"""WITH $causalUnitsSql,
       arms AS (SELECT CAST(t AS VARCHAR) AS g,
                       CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(post) AS BIGINT) AS sv,
                       CAST(sum(post * post) AS BIGINT) AS svv
                FROM un GROUP BY 1),
       m AS (SELECT a.g AS arm_a, b.g AS arm_b, a.n AS n_a, b.n AS n_b,
                    a.sv AS sva, b.sv AS svb,
                    a.svv AS svva, b.svv AS svvb
             FROM arms a JOIN arms b ON a.g < b.g),
       e AS (SELECT arm_a, arm_b, n_a, n_b,
                    sva * 1000000 // n_a AS mean_a_micro,
                    svb * 1000000 // n_b AS mean_b_micro,
                    CAST(n_a * svva - sva * sva AS DOUBLE)
                      / CAST(n_a * (n_a - 1) AS DOUBLE) AS s2a,
                    CAST(n_b * svvb - svb * svb AS DOUBLE)
                      / CAST(n_b * (n_b - 1) AS DOUBLE) AS s2b
             FROM m),
       f AS (SELECT arm_a, arm_b, n_a, n_b, mean_a_micro, mean_b_micro,
                    CAST(round(2.8016 * sqrt(s2a / n_a + s2b / n_b)
                      * 1e6) AS BIGINT) AS mde_abs_micro
             FROM e)
       SELECT arm_a, arm_b, n_a, n_b, mean_a_micro, mean_b_micro,
              mde_abs_micro,
              CASE WHEN mean_a_micro <= 0 THEN NULL
                   ELSE mde_abs_micro * 1000000 // mean_a_micro
              END AS mde_rel_ppm
       FROM f"""

  /** q288 temperature mixture: one IEEE sqrt per source on the
    * ppm-quantized share, everything else exact integers with the
    * same wrap-free cap split. */
  private def temperatureMixtureOracleSql: String =
    """WITH counts AS MATERIALIZED (
                SELECT source AS src, CAST(count(*) AS BIGINT) AS n_rows
                FROM documents GROUP BY 1),
       tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS nn FROM counts),
       raw AS MATERIALIZED (
               SELECT src, n_rows, nn,
                      CAST(round(sqrt(CAST((n_rows * 1000000 // nn)
                        * 1000000 AS DOUBLE))) AS BIGINT) AS raw
               FROM counts CROSS JOIN tot),
       rt AS (SELECT CAST(sum(raw) AS BIGINT) AS rt FROM raw),
       tg AS MATERIALIZED (
              SELECT src, n_rows, nn,
                     raw * 1000000 // rt.rt AS target_ppm
              FROM raw CROSS JOIN rt),
       cp AS (SELECT CAST(min(n_rows * 1000000
                         // greatest(target_ppm, 1)) AS BIGINT) AS cap
              FROM tg),
       k AS (SELECT src, n_rows, nn, target_ppm,
                    least(n_rows,
                      target_ppm * (cap // 1000000)
                      + (target_ppm * (cap % 1000000) + 500000) // 1000000)
                      AS n_keep_expected
             FROM tg CROSS JOIN cp)
       SELECT src AS source, n_rows,
              n_rows * 1000000 // nn AS share_ppm, target_ppm,
              least(1000000, n_keep_expected * 1000000 // n_rows)
                AS keep_rate_ppm,
              n_keep_expected
       FROM k ORDER BY source"""

  /** Shared q283/q284/q285 fixture SQL (the Scala twin is
    * [[EntryAnalyticsStatsDefs.causalUnits]]): per-user pre/post
    * counts at the derived midpoint cut, hash treatment correlated
    * with pre-period activity, pre-derived propensity score. */
  private def causalUnitsSql: String =
    """cu AS MATERIALIZED (
              SELECT user_id AS u,
                     CAST(count(*) FILTER (WHERE CAST(ts AS DATE) <= cut)
                       AS BIGINT) AS pre,
                     CAST(count(*) FILTER (WHERE CAST(ts AS DATE) > cut)
                       AS BIGINT) AS post
              FROM events CROSS JOIN
                   (SELECT min(CAST(ts AS DATE)) + 14 AS cut FROM events)
              GROUP BY 1),
       un AS MATERIALIZED (
              SELECT u, pre, post,
                     least(1000000, pre * 50000) AS score,
                     (('0x' || substr(md5('trt:' || CAST(u AS VARCHAR)),
                        1, 15))::BIGINT % 1000000)
                       < 200000 + least(600000, pre * 30000) AS t
              FROM cu)"""

  /** Shared q277/q278 match-derivation SQL (the Scala twin is
    * [[EntryAnalyticsStatsDefs.eventPreferenceMatches]]): per
    * (user, day), unordered event-type pairs with unequal counts,
    * winner = the more frequent type. */
  private def preferenceMatchesSql: String =
    """cnt AS MATERIALIZED (
              SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                     count(*) AS c
              FROM events GROUP BY 1, 2, 3),
       mt AS MATERIALIZED (
              SELECT CASE WHEN x.c > y.c THEN x.event_type
                          ELSE y.event_type END AS w,
                     CASE WHEN x.c > y.c THEN y.event_type
                          ELSE x.event_type END AS l
              FROM cnt x JOIN cnt y
                ON x.user_id = y.user_id AND x.day = y.day
               AND x.event_type < y.event_type AND x.c <> y.c)"""

  /** q277: Hunter's MM rounds unrolled — one (terms, D, update,
    * renormalize) CTE quartet per round, every quantity a nonnegative
    * exact long so `//` and `div` agree. */
  private def bradleyTerryOracleSql: String = {
    // MATERIALIZED everywhere a CTE is read more than once: DuckDB
    // inlines plain CTEs, so 4 unrolled rounds each reading the
    // previous round TWICE would otherwise expand exponentially.
    def mmRound(k: Int): String = {
      val prev = if (k == 1) "it0" else s"it${k - 1}"
      s"""t$k AS MATERIALIZED (
                SELECT i AS item, n * 1000000000000 // (a.r + b.r) AS t
                FROM g JOIN $prev a ON a.item = g.i
                       JOIN $prev b ON b.item = g.j
                UNION ALL
                SELECT j, n * 1000000000000 // (a.r + b.r)
                FROM g JOIN $prev a ON a.item = g.i
                       JOIN $prev b ON b.item = g.j),
         d$k AS (SELECT item, CAST(sum(t) AS BIGINT) AS dsum
                 FROM t$k GROUP BY 1),
         r$k AS MATERIALIZED (
                 SELECT st.item,
                        CASE WHEN d$k.dsum IS NULL OR st.n_wins = 0 THEN 0
                             ELSE st.n_wins * 1000000000000 // d$k.dsum
                        END AS r1
                 FROM st LEFT JOIN d$k USING (item)),
         it$k AS MATERIALIZED (
                  SELECT item,
                         r1 * ((SELECT count(*) FROM st) * 1000000)
                           // (SELECT CAST(sum(r1) AS BIGINT) FROM r$k)
                           AS r
                  FROM r$k)"""
    }
    s"""WITH $preferenceMatchesSql,
       g AS MATERIALIZED (
             SELECT least(w, l) AS i, greatest(w, l) AS j,
                    CAST(count(*) AS BIGINT) AS n
             FROM mt GROUP BY 1, 2),
       wn AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS n_wins
              FROM mt GROUP BY 1),
       items AS (SELECT DISTINCT item FROM
                  (SELECT w AS item FROM mt
                   UNION ALL SELECT l FROM mt)),
       st AS MATERIALIZED (
              SELECT items.item, coalesce(n_wins, 0) AS n_wins
              FROM items LEFT JOIN wn USING (item)),
       it0 AS MATERIALIZED (
               SELECT item, CAST(1000000 AS BIGINT) AS r FROM st),
       ${(1 to 4).map(mmRound).mkString(",\n       ")},
       nm AS (SELECT item, CAST(sum(n) AS BIGINT) AS n_matches
              FROM (SELECT i AS item, n FROM g
                    UNION ALL SELECT j, n FROM g)
              GROUP BY 1)
       SELECT st.item, st.n_wins,
              coalesce(nm.n_matches, 0) AS n_matches,
              it4.r AS strength_micro
       FROM st LEFT JOIN nm USING (item) JOIN it4 USING (item)
       ORDER BY item"""
  }
}

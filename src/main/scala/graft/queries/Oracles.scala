package graft.queries

/** DuckDB oracle SQL — one entry per [[Queries]] member, column names and
  * rounding matched exactly to the Spark side (the driver hash-compares
  * values under sorted column names; integer sums are CAST to BIGINT because
  * DuckDB's SUM over integers returns HUGEINT while Spark returns long). */
object Oracles {

  val q1Agg: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val partitionCounts: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val recordsPerPartition: String =
    """SELECT concat_ws('/', l_returnflag, l_linestatus) AS partition_key,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val skewnessMetrics: String =
    """WITH counts AS (
      |  SELECT o_orderpriority, count(*) AS c FROM orders GROUP BY 1),
      |s AS (
      |  SELECT count(*) AS partition_cnt, max(c) AS mx, min(c) AS mn,
      |         avg(c) AS mean_c
      |  FROM counts),
      |mad AS (
      |  SELECT avg(abs(c - (SELECT mean_c FROM s))) AS m FROM counts)
      |SELECT partition_cnt,
      |  round(CASE WHEN partition_cnt <= 1 OR mx = 0 THEN 0.0
      |             ELSE CAST(mx - mn AS DOUBLE) / mx END, 9) AS skewness_max,
      |  round(CASE WHEN partition_cnt <= 1 OR mean_c = 0 THEN 0.0
      |             ELSE (SELECT m FROM mad) / mean_c END, 9) AS skewness_average
      |FROM s""".stripMargin

  val opCounts: String =
    """SELECT
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  count(*) AS n_total
      |FROM events""".stripMargin

  val healthScoreSql: String =
    """WITH ops AS (
      |  SELECT
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS writes,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS optimizes
      |  FROM events),
      |counts AS (SELECT o_orderpriority, count(*) AS c FROM orders GROUP BY 1),
      |sk AS (
      |  SELECT CASE WHEN count(*) <= 1 OR max(c) = 0 THEN 0.0
      |              ELSE CAST(max(c) - min(c) AS DOUBLE) / max(c) END AS skew
      |  FROM counts),
      |sf AS (
      |  SELECT CAST(sum(CASE WHEN p_size < 10 THEN 1 ELSE 0 END) AS BIGINT) AS small_files
      |  FROM part),
      |orph AS (
      |  SELECT count(*) AS n_orphan FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
      |base AS (
      |  SELECT writes, optimizes, small_files, n_orphan,
      |    least(CAST(writes AS DOUBLE) / 10 * 25, CAST(25 AS DOUBLE)) AS freshness,
      |    least(CAST(optimizes AS DOUBLE) / greatest(writes, 1) * 10 * 12.5,
      |          CAST(12.5 AS DOUBLE))
      |      + (CASE WHEN n_orphan > 0 THEN 0.0 ELSE 12.5 END) AS maintenance,
      |    25 - least(skew * 100, CAST(25 AS DOUBLE)) AS balance,
      |    25 - least(CAST(small_files AS DOUBLE) / greatest(writes * 2, 1) * 12.5,
      |               CAST(12.5 AS DOUBLE))
      |       - (CASE WHEN n_orphan > 0 THEN 12.5 ELSE 0.0 END) AS storage
      |  FROM ops, sk, sf, orph)
      |SELECT writes, optimizes, small_files, n_orphan,
      |  round(freshness, 6) AS freshness,
      |  round(maintenance, 6) AS maintenance,
      |  round(balance, 6) AS balance,
      |  round(storage, 6) AS storage,
      |  round(freshness + maintenance + balance + storage, 6) AS health_score,
      |  CASE WHEN freshness + maintenance + balance + storage >= 80 THEN 'healthy'
      |       WHEN freshness + maintenance + balance + storage >= 50 THEN 'unhealthy'
      |       ELSE 'very_unhealthy' END AS health_status
      |FROM base""".stripMargin

  val topnOthers: String =
    """WITH counts AS (
      |  SELECT p_brand AS brand, count(*) AS cnt FROM part GROUP BY 1),
      |ranked AS (
      |  SELECT brand, cnt,
      |    row_number() OVER (ORDER BY cnt DESC, brand ASC) AS rn
      |  FROM counts)
      |SELECT brand, cnt FROM (
      |  SELECT brand, cnt, rn FROM ranked WHERE rn <= 10
      |  UNION ALL
      |  SELECT 'Others' AS brand, CAST(sum(cnt) AS BIGINT) AS cnt,
      |         CAST(11 AS BIGINT) AS rn
      |  FROM ranked WHERE rn > 10 HAVING count(*) > 0
      |) t ORDER BY rn""".stripMargin

  val sizeHistogram: String =
    """SELECT CAST(floor(l_extendedprice / CAST(5000 AS DOUBLE)) AS BIGINT) AS bin,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val antiJoinOrphans: String =
    """SELECT c_custkey FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  val distributionStats: String =
    """WITH counts AS (
      |  SELECT l_returnflag, count(*) AS c FROM lineitem GROUP BY 1)
      |SELECT max(c) AS max_count, min(c) AS min_count,
      |  round(avg(c), 6) AS mean_count,
      |  round(CAST(stddev_pop(c) AS DOUBLE), 6) AS stddev_count
      |FROM counts""".stripMargin

  val joinRevenueByNation: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val windowTopOrders: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val tokenStats: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_text,
      |  CASE WHEN length(trim(text)) = 0 THEN 0
      |       ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                            t -> length(t) > 0)) END AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords,
      |  length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The CDC chunk table recomputed in SQL: cuts where the 8-gram md5 at
    * position i (i ≥ 2) opens with hex '0', segments by lead() per doc,
    * chunk hash = md5 of the chunk substring. substr/length are
    * character-based in DuckDB exactly as the kernel counts code points,
    * and md5 hashes the UTF-8 bytes both sides. m = len−7; cuts live in
    * [2, m] (range end exclusive, greatest() floors the empty case). */
  private val cdcChunksCte: String =
    """base AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
      |cuts AS (
      |  SELECT doc_id, i FROM (
      |    SELECT doc_id, text,
      |      unnest(range(2, greatest(length(text) - 6, 2))) AS i
      |    FROM base)
      |  WHERE substr(md5(substr(text, i, 8)), 1, 1) = '0'),
      |starts AS (
      |  SELECT doc_id, 1 AS s FROM base
      |  UNION ALL SELECT doc_id, CAST(i AS INTEGER) AS s FROM cuts),
      |seg AS (
      |  SELECT st.doc_id, st.s,
      |    CAST(row_number() OVER (PARTITION BY st.doc_id ORDER BY st.s)
      |      AS INTEGER) AS chunk_idx,
      |    CAST(COALESCE(lead(st.s) OVER (PARTITION BY st.doc_id ORDER BY st.s),
      |      length(b.text) + 1) - st.s AS INTEGER) AS len,
      |    b.text AS text
      |  FROM starts st JOIN base b ON st.doc_id = b.doc_id),
      |chunks AS (
      |  SELECT doc_id, chunk_idx, s AS start, len,
      |    md5(substr(text, s, len)) AS hash
      |  FROM seg)""".stripMargin

  val cdcChunks: String =
    s"""WITH $cdcChunksCte
      |SELECT doc_id, chunk_idx, start, len, hash
      |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  val chunkDedup: String =
    s"""WITH $cdcChunksCte
      |SELECT hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
      |  CAST(count(*) AS BIGINT) AS occurrences,
      |  CAST(max(len) AS BIGINT) AS len
      |FROM chunks GROUP BY hash
      |HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY hash""".stripMargin

  /** lm_score: the full self-trained add-0.5-smoothed bigram LM recomputed
    * value-for-value — same normalized tokenization as vocab_topk, bigram
    * formation via list_transform over 1-based positions (range end is
    * exclusive, so a 1-token doc yields none, mirroring the kernel's empty
    * result), per-bigram ln P rounded to 9 BEFORE the weighted sum (ln's
    * last-ulp engine disagreement), all integer sums cast off HUGEINT. */
  private val lmScoreCte: String =
    """base AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
      |  FROM base),
      |doc_bg AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
      |model_big AS (
      |  SELECT bigram, CAST(sum(n) AS BIGINT) AS c12 FROM doc_bg GROUP BY 1),
      |model_uni AS (
      |  SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c12) AS BIGINT) AS c1
      |  FROM model_big GROUP BY 1),
      |vocab AS (
      |  SELECT count(DISTINCT string_split(bigram, ' ')[2]) AS v FROM model_big),
      |scored AS (
      |  SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS nb,
      |    CAST(sum(d.n * CAST(round(round(ln((b.c12 + 0.5)
      |      / (u.c1 + 0.5 * v.v)), 9) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
      |      AS slp
      |  FROM doc_bg d
      |  JOIN model_big b USING (bigram)
      |  JOIN model_uni u ON string_split(d.bigram, ' ')[1] = u.w1
      |  CROSS JOIN vocab v
      |  GROUP BY 1),
      |lmfinal AS (
      |  SELECT doc.doc_id,
      |    COALESCE(s.nb, 0) AS n_bigrams,
      |    CASE WHEN COALESCE(s.nb, 0) = 0 THEN 0.0
      |         ELSE round(s.slp / s.nb, 6) END AS avg_logprob,
      |    CASE WHEN COALESCE(s.nb, 0) = 0 THEN 1.0
      |         ELSE round(exp(-s.slp / s.nb), 6) END AS ppl
      |  FROM documents doc LEFT JOIN scored s ON doc.doc_id = s.doc_id)""".stripMargin

  val lmScore: String =
    s"""WITH $lmScoreCte
      |SELECT doc_id, n_bigrams, avg_logprob, ppl
      |FROM lmfinal ORDER BY doc_id""".stripMargin

  /** lm_heldout: the bigram LM retrained on the md5-bucket TRAIN partition
    * (< 204) only, validation docs (204..229) scored under it — model
    * joins become LEFT joins with zero-coalesced counts so unseen grams
    * take the ln((0+α)/(0+α·V)) smoothing path. */
  val lmHeldout: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |trl AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM b WHERE bucket < 204),
      |vl AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM b WHERE bucket >= 204 AND bucket < 230),
      |trbg AS (
      |  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
      |  FROM trl),
      |model_big AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c12 FROM trbg GROUP BY 1),
      |model_uni AS (
      |  SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c12) AS BIGINT) AS c1
      |  FROM model_big GROUP BY 1),
      |vocab AS (
      |  SELECT count(DISTINCT string_split(bigram, ' ')[2]) AS v FROM model_big),
      |vbg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
      |  FROM vl),
      |doc_bg AS (SELECT doc_id, bigram, count(*) AS n FROM vbg GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS nb,
      |    CAST(sum(d.n * CAST(round(round(ln((COALESCE(m.c12, 0) + 0.5)
      |      / (COALESCE(u.c1, 0) + 0.5 * v.v)), 9) * 1e9) AS BIGINT))
      |      AS DOUBLE) / 1e9 AS slp
      |  FROM doc_bg d
      |  LEFT JOIN model_big m USING (bigram)
      |  LEFT JOIN model_uni u ON string_split(d.bigram, ' ')[1] = u.w1
      |  CROSS JOIN vocab v
      |  GROUP BY 1)
      |SELECT vd.doc_id,
      |  COALESCE(s.nb, 0) AS n_bigrams,
      |  CASE WHEN COALESCE(s.nb, 0) = 0 THEN 0.0
      |       ELSE round(s.slp / s.nb, 6) END AS avg_logprob,
      |  CASE WHEN COALESCE(s.nb, 0) = 0 THEN 1.0
      |       ELSE round(exp(-s.slp / s.nb), 6) END AS ppl
      |FROM vl vd LEFT JOIN scored s ON vd.doc_id = s.doc_id
      |ORDER BY vd.doc_id""".stripMargin

  /** domain_weights: the DoReMi-lite softmax reweighting replayed — the
    * full lm_heldout chain with `lang` carried through, per-language NLL
    * recombined from 1e-6-grid integers, round-6 excess over the MAX
    * (overflow-safe: exponents ≤ 0, softmax shift-invariant),
    * round-9 exp, 1e-9-quantized softmax denominator, and the
    * (1−s)·softmax + s/|D| mix with the identical expression tree. */
  val domainWeights: String =
    """WITH b AS (
      |  SELECT doc_id, lang, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |trl AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM b WHERE bucket < 204),
      |vl AS (
      |  SELECT doc_id, lang, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM b WHERE bucket >= 204 AND bucket < 230),
      |trbg AS (
      |  SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
      |  FROM trl),
      |model_big AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c12 FROM trbg GROUP BY 1),
      |model_uni AS (
      |  SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c12) AS BIGINT) AS c1
      |  FROM model_big GROUP BY 1),
      |vocab AS (
      |  SELECT count(DISTINCT string_split(bigram, ' ')[2]) AS v FROM model_big),
      |vbg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
      |  FROM vl),
      |doc_bg AS (SELECT doc_id, bigram, count(*) AS n FROM vbg GROUP BY 1, 2),
      |scored AS (
      |  SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS nb,
      |    CAST(sum(d.n * CAST(round(round(ln((COALESCE(m.c12, 0) + 0.5)
      |      / (COALESCE(u.c1, 0) + 0.5 * v.v)), 9) * 1e9) AS BIGINT))
      |      AS DOUBLE) / 1e9 AS slp
      |  FROM doc_bg d
      |  LEFT JOIN model_big m USING (bigram)
      |  LEFT JOIN model_uni u ON string_split(d.bigram, ' ')[1] = u.w1
      |  CROSS JOIN vocab v
      |  GROUP BY 1),
      |docs2 AS (
      |  SELECT vd.doc_id, vd.lang,
      |    COALESCE(s.nb, 0) AS nb,
      |    CASE WHEN COALESCE(s.nb, 0) = 0 THEN 0.0
      |         ELSE round(s.slp / s.nb, 6) END AS alp
      |  FROM vl vd LEFT JOIN scored s ON vd.doc_id = s.doc_id),
      |per AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(nb) AS BIGINT) AS nbs,
      |    CAST(sum(nb * CAST(round(alp * 1e6) AS BIGINT)) AS BIGINT) AS sq
      |  FROM docs2 GROUP BY 1),
      |per2 AS (
      |  SELECT lang, n_docs,
      |    CASE WHEN nbs = 0 THEN 0.0
      |         ELSE round((-(CAST(sq AS DOUBLE) / 1e6)) / nbs, 6) END AS avg_nll
      |  FROM per),
      |mnw AS (SELECT max(avg_nll) AS mn FROM per2),
      |ndw AS (SELECT CAST(count(*) AS DOUBLE) AS ndom FROM per2),
      |wew AS (
      |  SELECT lang, n_docs, avg_nll,
      |    round(exp(10.0 * round(avg_nll - mnw.mn, 6)), 9) AS e
      |  FROM per2 CROSS JOIN mnw),
      |sew AS (SELECT CAST(sum(CAST(round(e * 1e9) AS BIGINT)) AS BIGINT) AS se FROM wew)
      |SELECT lang, n_docs, avg_nll,
      |  round((1.0 - 0.2) * (e / (CAST(sew.se AS DOUBLE) / 1e9))
      |    + 0.2 / ndw.ndom, 9) AS weight
      |FROM wew CROSS JOIN sew CROSS JOIN ndw ORDER BY lang""".stripMargin

  /** lm_backoff: the Brants '07 stupid-backoff trigram scorer retrained in
    * SQL — trigram/bigram/unigram count tables off the md5-bucket TRAIN
    * partition, val-doc trigram occurrences routed through the same 3-way
    * CASE (seen trigram → relative frequency against its context bigram;
    * unseen → 0.4 · suffix-bigram relative frequency; fully unseen →
    * 0.16 · add-0.5-smoothed unigram base), ln rounded to 9 before the
    * 1e-9-quantized exact integer sum. The λ/λ² literals are the decimal
    * forms the Spark side derives via BigDecimal (0.4 / 0.16). */
  val lmBackoff: String =
    """WITH b AS (
      |  SELECT doc_id, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |trl AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM b WHERE bucket < 204),
      |vl AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM b WHERE bucket >= 204 AND bucket < 230),
      |model_tri AS (
      |  SELECT tri, CAST(count(*) AS BIGINT) AS c123 FROM (
      |    SELECT unnest(list_transform(range(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS tri
      |    FROM trl)
      |  GROUP BY 1),
      |model_big AS (
      |  SELECT big, CAST(count(*) AS BIGINT) AS c12 FROM (
      |    SELECT unnest(list_transform(range(1, len(l)),
      |      i -> l[i] || ' ' || l[i+1])) AS big
      |    FROM trl)
      |  GROUP BY 1),
      |model_uni AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM (
      |    SELECT unnest(l) AS tok FROM trl)
      |  GROUP BY 1),
      |totals AS (SELECT CAST(sum(c1) AS BIGINT) AS ntot,
      |  CAST(count(*) AS BIGINT) AS v FROM model_uni),
      |doc_tg AS (
      |  SELECT doc_id, tri, count(*) AS n FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS tri
      |    FROM vl)
      |  GROUP BY 1, 2),
      |keyed AS (
      |  SELECT doc_id, tri, n,
      |    string_split(tri, ' ')[1] || ' ' || string_split(tri, ' ')[2] AS ctx,
      |    string_split(tri, ' ')[2] || ' ' || string_split(tri, ' ')[3] AS suf,
      |    string_split(tri, ' ')[2] AS w2,
      |    string_split(tri, ' ')[3] AS w3
      |  FROM doc_tg),
      |scored AS (
      |  SELECT k.doc_id, CAST(sum(k.n) AS BIGINT) AS ng,
      |    CAST(sum(k.n * CAST(round(
      |      CASE WHEN t.c123 IS NOT NULL
      |             THEN round(ln(CAST(t.c123 AS DOUBLE) / cb.c12), 9)
      |           WHEN sb.c12 IS NOT NULL
      |             THEN round(ln(0.4 * CAST(sb.c12 AS DOUBLE) / u2.c1), 9)
      |           ELSE round(ln(0.16 * (COALESCE(u3.c1, 0) + 0.5)
      |             / (tt.ntot + 0.5 * tt.v)), 9) END * 1e9) AS BIGINT))
      |      AS DOUBLE) / 1e9 AS slp
      |  FROM keyed k
      |  LEFT JOIN model_tri t ON t.tri = k.tri
      |  LEFT JOIN model_big cb ON cb.big = k.ctx
      |  LEFT JOIN model_big sb ON sb.big = k.suf
      |  LEFT JOIN model_uni u2 ON u2.tok = k.w2
      |  LEFT JOIN model_uni u3 ON u3.tok = k.w3
      |  CROSS JOIN totals tt
      |  GROUP BY 1)
      |SELECT vd.doc_id,
      |  COALESCE(s.ng, 0) AS n_trigrams,
      |  CASE WHEN COALESCE(s.ng, 0) = 0 THEN 0.0
      |       ELSE round(s.slp / s.ng, 6) END AS avg_logscore,
      |  CASE WHEN COALESCE(s.ng, 0) = 0 THEN 1.0
      |       ELSE round(exp(-s.slp / s.ng), 6) END AS score_ppl
      |FROM vl vd LEFT JOIN scored s ON vd.doc_id = s.doc_id
      |ORDER BY vd.doc_id""".stripMargin

  /** nb_classify: the multinomial Naive Bayes retrained in SQL — md5-bucket
    * train/val split, per-(class,token) add-0.5-smoothed likelihoods over
    * the train vocabulary (val OOV tokens dropped, unseen (w,c) pairs
    * through the smoothed zero), ln rounded to 9 before every weighted
    * sum, per-(doc,class) scores rounded to 6, argmax as the same
    * max-then-min-label two-step the Spark side uses. */
  val nbClassify: String =
    """WITH b AS (
      |  SELECT doc_id, lang, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |tr AS (SELECT doc_id, lang, text FROM b WHERE bucket < 204),
      |vd AS (SELECT doc_id, text FROM b WHERE bucket >= 204 AND bucket < 230),
      |trtok AS (
      |  SELECT lang, unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0)) AS tok
      |  FROM tr),
      |cls_tok AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      |  FROM trtok GROUP BY 1, 2),
      |cls_tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot
      |  FROM cls_tok GROUP BY 1),
      |vocab AS (SELECT count(DISTINCT tok) AS vsz FROM cls_tok),
      |train_vocab AS (SELECT DISTINCT tok FROM cls_tok),
      |nd AS (SELECT lang, count(*) AS ndc FROM tr GROUP BY 1),
      |ndt AS (SELECT count(*) AS ndtot FROM tr),
      |classes AS (
      |  SELECT lang, round(ln(CAST(ndc AS DOUBLE) / ndtot), 9) AS lpr
      |  FROM nd CROSS JOIN ndt),
      |doc_tok AS (
      |  SELECT doc_id, tok, count(*) AS n FROM (
      |    SELECT doc_id, unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0)) AS tok
      |    FROM vd)
      |  GROUP BY 1, 2),
      |doc_tok_v AS (SELECT d.* FROM doc_tok d JOIN train_vocab USING (tok)),
      |tok_sums AS (
      |  SELECT d.doc_id, c.lang,
      |    CAST(sum(d.n * CAST(round(round(ln((COALESCE(ct.c, 0) + 0.5)
      |      / (tt.tot + 0.5 * vz.vsz)), 9) * 1e9) AS BIGINT))
      |      AS DOUBLE) / 1e9 AS tl
      |  FROM doc_tok_v d
      |  CROSS JOIN (SELECT lang FROM classes) c
      |  LEFT JOIN cls_tok ct ON ct.lang = c.lang AND ct.tok = d.tok
      |  JOIN cls_tot tt ON tt.lang = c.lang
      |  CROSS JOIN vocab vz
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT v2.doc_id, cl.lang, round(cl.lpr + COALESCE(ts.tl, 0.0), 6) AS score
      |  FROM (SELECT doc_id FROM vd) v2
      |  CROSS JOIN classes cl
      |  LEFT JOIN tok_sums ts ON ts.doc_id = v2.doc_id AND ts.lang = cl.lang),
      |best AS (SELECT doc_id, max(score) AS best FROM pairs GROUP BY 1)
      |SELECT p.doc_id, min(p.lang) AS label_pred, max(p.score) AS score
      |FROM pairs p JOIN best b2 ON p.doc_id = b2.doc_id AND p.score = b2.best
      |GROUP BY p.doc_id
      |ORDER BY p.doc_id""".stripMargin

  /** zipf_fit: the tie-grouped weighted log-log OLS replayed — frequency
    * histogram, midpoint ranks via the offsets triangle join, x/y round-9,
    * per-group x·y and x² on the 1e-6 grid, HUGEINT exact weighted sums
    * (≡ Spark's decimal(38,0)), and the identical fixed-order closed-form
    * slope/intercept doubles. */
  val zipfFit: String = {
    val sx = "(CAST(sxq AS DOUBLE) / 1e6)"
    val sy = "(CAST(syq AS DOUBLE) / 1e6)"
    val sxy = "(CAST(sxyq AS DOUBLE) / 1e6)"
    val sxx = "(CAST(sxxq AS DOUBLE) / 1e6)"
    val w = "CAST(n AS DOUBLE)"
    val slope = s"($w * $sxy - $sx * $sy) / ($w * $sxx - $sx * $sx)"
    s"""WITH tok AS (
      |  SELECT unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0)) AS t
      |  FROM documents),
      |freq AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
      |fd AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM freq GROUP BY 1),
      |offs AS (
      |  SELECT a.c AS c, a.cnt AS cnt,
      |    CAST(COALESCE(sum(b.cnt), 0) AS BIGINT) AS o
      |  FROM fd a LEFT JOIN fd b ON b.c > a.c
      |  GROUP BY 1, 2),
      |terms AS (
      |  SELECT cnt, c,
      |    round(ln(o + (cnt + 1) / 2.0), 9) AS x,
      |    round(ln(CAST(c AS DOUBLE)), 9) AS y
      |  FROM offs),
      |q AS (
      |  SELECT cnt, c,
      |    CAST(round(x * 1e6) AS BIGINT) AS xq,
      |    CAST(round(y * 1e6) AS BIGINT) AS yq,
      |    CAST(round(x * y * 1e6) AS BIGINT) AS xyq,
      |    CAST(round(x * x * 1e6) AS BIGINT) AS xxq
      |  FROM terms),
      |sums AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |    CAST(sum(cnt * c) AS BIGINT) AS tot,
      |    sum(CAST(cnt AS HUGEINT) * xq) AS sxq,
      |    sum(CAST(cnt AS HUGEINT) * yq) AS syq,
      |    sum(CAST(cnt AS HUGEINT) * xyq) AS sxyq,
      |    sum(CAST(cnt AS HUGEINT) * xxq) AS sxxq,
      |    CAST(count(*) AS BIGINT) AS ngroups
      |  FROM q)
      |SELECT COALESCE(n, 0) AS n_terms, COALESCE(tot, 0) AS total_tokens,
      |  CASE WHEN ngroups <= 1 THEN 0.0
      |       ELSE round($slope, 6) END AS slope,
      |  CASE WHEN ngroups <= 1 THEN 0.0
      |       ELSE round(($sy - $slope * $sx) / $w, 6) END AS intercept
      |FROM sums""".stripMargin
  }

  /** gram_novelty: the min-id first-owner attribution replayed — distinct
    * (doc, trigram) pairs, gram-keyed min, per-doc novel fraction. */
  val gramNovelty: String =
    """WITH base AS (
      |  SELECT doc_id, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM documents),
      |tg AS (
      |  SELECT DISTINCT doc_id, tri FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS tri
      |    FROM base)),
      |firsts AS (SELECT tri, min(doc_id) AS fd FROM tg GROUP BY 1),
      |per AS (
      |  SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS ng,
      |    CAST(sum(CASE WHEN f.fd = tg.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS nn
      |  FROM tg JOIN firsts f USING (tri)
      |  GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(p.ng, 0) AS n_grams,
      |  COALESCE(p.nn, 0) AS n_novel,
      |  CASE WHEN COALESCE(p.ng, 0) = 0 THEN 0.0
      |       ELSE round(CAST(p.nn AS DOUBLE) / p.ng, 6) END AS novelty
      |FROM documents d LEFT JOIN per p USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** train_shuffle: the seeded md5 (shard, pos) assignment replayed — the
    * 4-hex-digit shard bucket via the strpos digit formula (≡ Spark's
    * conv(hex[0:4], 16, 10)), pos as the per-shard row_number over the
    * same (hex, id) order. */
  val trainShuffle: String =
    """WITH h AS (
      |  SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS hx
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, hx,
      |    CAST((((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) * 16
      |      + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)) * 16
      |      + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS BIGINT)
      |      % 8 AS shard
      |  FROM h)
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
      |    AS BIGINT) AS pos
      |FROM s ORDER BY doc_id""".stripMargin

  /** lr_classify: the 3-iteration full-batch GD logistic regression
    * replayed in SQL — the same 4 round-6 text features, sigma rounded to
    * 9 before the residual, per-doc gradient contributions quantized to
    * the 1e-9 grid and summed as exact BIGINTs, weights rounded to 9 after
    * each unrolled update CTE, final probs rounded to 6 and thresholded at
    * 0.5. Every arithmetic expression mirrors the Spark side's tree shape
    * (left-assoc dot product, (g/1e9)/n gradient average). */
  private def lrScoredCte: String = {
    val feats = (src: String) =>
      s"""SELECT doc_id,${if (src == "tr") " y," else ""}
        |    round(least(len(l), 100) / 100.0, 6) AS f1,
        |    CASE WHEN len(l) = 0 THEN 0.0
        |         ELSE round(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 6) END AS f2,
        |    CASE WHEN len(l) = 0 THEN 0.0
        |         ELSE round(least(CAST(list_sum(list_transform(l, x -> len(x))) AS DOUBLE)
        |           / len(l), 20.0) / 20.0, 6) END AS f3
        |  FROM (SELECT doc_id,${if (src == "tr") " y," else ""} list_filter(
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    x -> len(x) > 0) AS l FROM $src)""".stripMargin
    val grad = (wsrc: String, gname: String) =>
      s"""$gname AS (
        |  SELECT
        |    sum(CAST(round((round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))), 9) - y) * 1.0 * 1e9) AS BIGINT)) AS g0,
        |    sum(CAST(round((round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))), 9) - y) * f1 * 1e9) AS BIGINT)) AS g1,
        |    sum(CAST(round((round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))), 9) - y) * f2 * 1e9) AS BIGINT)) AS g2,
        |    sum(CAST(round((round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))), 9) - y) * f3 * 1e9) AS BIGINT)) AS g3
        |  FROM trf CROSS JOIN $wsrc w)""".stripMargin
    val step = (gsrc: String, wname: String, wprev: String) =>
      s"""$wname AS (
        |  SELECT
        |    round(w.w0 - 1.0 * (CAST(g.g0 AS DOUBLE) / 1e9 / n.n), 9) AS w0,
        |    round(w.w1 - 1.0 * (CAST(g.g1 AS DOUBLE) / 1e9 / n.n), 9) AS w1,
        |    round(w.w2 - 1.0 * (CAST(g.g2 AS DOUBLE) / 1e9 / n.n), 9) AS w2,
        |    round(w.w3 - 1.0 * (CAST(g.g3 AS DOUBLE) / 1e9 / n.n), 9) AS w3
        |  FROM $gsrc g CROSS JOIN $wprev w CROSS JOIN n)""".stripMargin
    s"""WITH b AS (
      |  SELECT doc_id, lang, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |tr AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, text
      |  FROM b WHERE bucket < 204),
      |vd AS (SELECT doc_id, text FROM b WHERE bucket >= 204 AND bucket < 230),
      |trf AS (
      |  ${feats("tr")}),
      |n AS (SELECT count(*) AS n FROM trf),
      |w0t AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
      |${grad("w0t", "g1t")},
      |${step("g1t", "w1t", "w0t")},
      |${grad("w1t", "g2t")},
      |${step("g2t", "w2t", "w1t")},
      |${grad("w2t", "g3t")},
      |${step("g3t", "w3t", "w2t")},
      |vf AS (
      |  ${feats("vd")}),
      |scored AS (
      |  SELECT doc_id,
      |    round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f1 + w.w2 * f2 + w.w3 * f3))), 6) AS prob
      |  FROM vf CROSS JOIN w3t w)""".stripMargin
  }

  /** lr_classify: the 3-iteration GD chain above finished with the
    * prob/threshold projection. */
  val lrClassify: String =
    s"""$lrScoredCte
      |SELECT doc_id, prob, CAST(prob >= 0.5 AS BIGINT) AS label_pred
      |FROM scored ORDER BY doc_id""".stripMargin

  /** lr_calibration: the same scored val frame folded into 1000
    * reliability bins — round(prob·1e6) is an exact integer (prob is
    * round-6), the bin is integer division with the top edge folded into
    * bin 999, and every output is a BIGINT sum (order-free; the lm_score
    * convention). The val-split labels rejoin by doc_id. */
  val lrCalibration: String =
    s"""$lrScoredCte,
      |lab AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM b WHERE bucket >= 204 AND bucket < 230),
      |binned AS (
      |  SELECT least(CAST(floor(CAST(round(prob * 1e6) AS BIGINT) / 1000.0)
      |      AS BIGINT), 999) AS bin,
      |    CAST(round(prob * 1e6) AS BIGINT) AS m, lab.y
      |  FROM scored JOIN lab USING (doc_id))
      |SELECT bin, count(*) AS n,
      |  CAST(sum(m) AS BIGINT) AS sum_prob_micro,
      |  CAST(sum(y) AS BIGINT) AS n_pos,
      |  abs(CAST(sum(m) AS BIGINT) - CAST(sum(y) AS BIGINT) * 1000000) AS abs_gap_micro
      |FROM binned GROUP BY bin ORDER BY bin""".stripMargin

  /** Horner-chain hex-digit decode of the first `digits` chars of an md5
    * hex expression — ≡ Spark's conv(substring(md5(x), 1, digits), 16, 10)
    * (the [[trainShuffle]] idiom, generalized). */
  private def md5Chain(hx: String, digits: Int): String =
    (1 to digits).map(i =>
      s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1)")
      .reduceLeft((acc, d) => s"($acc * 16 + $d)")

  /** rp_project: the 64→16 JL ±1 projection replayed — the sign of
    * element (i, j) is the parity of md5("42:i:j")'s first hex digit
    * (i, j 0-based), per-element signed contributions quantized to the
    * 1e-9 grid and summed as exact BIGINTs, output = that integer / 1e9 /
    * IEEE sqrt(16) with NO final decimal round (quarter values sit exactly
    * on decimal midpoints where the engines' round() disagree; identical
    * IEEE ops on identical integers are bit-identical without it). */
  val rpProject: String =
    """WITH el AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    unnest(embedding) AS x
      |  FROM embeddings),
      |signs AS (
      |  SELECT i.i, j.j,
      |    CASE WHEN (strpos('0123456789abcdef', substr(
      |        md5('42:' || CAST(i.i - 1 AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)),
      |        1, 1)) - 1) % 2 = 0
      |      THEN 1 ELSE -1 END AS s
      |  FROM (SELECT unnest(range(1, 65)) AS i) i,
      |       (SELECT unnest(range(0, 16)) AS j) j)
      |SELECT e.vec_id, sg.j AS dim,
      |  CAST(sum(CAST(round(CAST(e.x AS DOUBLE) * sg.s * 1e9) AS BIGINT)) AS DOUBLE)
      |    / 1e9 / sqrt(16.0) AS value
      |FROM el e JOIN signs sg ON sg.i = e.i
      |GROUP BY 1, 2 ORDER BY vec_id, dim""".stripMargin

  /** embed_standardize: the per-dimension z-scoring replayed — Σx on the
    * 1e-9 grid and Σx² on the 1e-6 grid as exact BIGINTs, μ/σ round-9
    * with the identical expression trees, z round-6, zero-variance dims
    * standardize to 0. */
  val embedStandardize: String =
    """WITH el AS (
      |  SELECT vec_id,
      |    CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |mo AS (
      |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS BIGINT) AS sq,
      |    CAST(sum(CAST(round(x * x * 1e6) AS BIGINT)) AS BIGINT) AS sq2
      |  FROM el GROUP BY 1),
      |ms AS (
      |  SELECT dim,
      |    round((CAST(sq AS DOUBLE) / 1e9) / n, 9) AS mu,
      |    round(sqrt(greatest((CAST(sq2 AS DOUBLE) / 1e6) / n
      |      - round((CAST(sq AS DOUBLE) / 1e9) / n, 9)
      |        * round((CAST(sq AS DOUBLE) / 1e9) / n, 9), 0.0)), 9) AS sigma
      |  FROM mo)
      |SELECT e.vec_id, e.dim,
      |  CASE WHEN m.sigma = 0.0 THEN 0.0
      |       ELSE round((e.x - m.mu) / m.sigma, 6) END AS z
      |FROM el e JOIN ms m USING (dim)
      |ORDER BY e.vec_id, e.dim""".stripMargin

  /** pagerank: the 5-iteration damped PageRank replayed — consecutive-doc
    * source edges (parallel edges weight a link via the row-count
    * out-degree), per-edge rank/deg contributions and the dangling mass
    * quantized to the 1e-9 grid and summed as exact BIGINTs, ranks round-9
    * per unrolled update CTE with the identical (1−d)/N + d·(contrib +
    * dangling/N) expression tree; output stays on the round-9 grid (a
    * round-6 output would zero the tail of a ≥10M-node graph). */
  val pageRank: String = {
    val iter = (prev: String, c: String, d: String, next: String) =>
      s"""$c AS (
        |  SELECT e.dst AS node, sum(CAST(round(r.r / dg.deg * 1e9) AS BIGINT)) AS cq
        |  FROM e JOIN $prev r ON r.node = e.src JOIN deg dg ON dg.src = e.src
        |  GROUP BY 1),
        |$d AS (
        |  SELECT COALESCE(sum(CAST(round(r.r * 1e9) AS BIGINT)), 0) AS dq
        |  FROM $prev r LEFT JOIN deg dg ON dg.src = r.node
        |  WHERE dg.src IS NULL),
        |$next AS (
        |  SELECT nd.node,
        |    round((1.0 - 0.85) / n.n + 0.85 * (CAST(COALESCE(c.cq, 0) AS DOUBLE) / 1e9
        |      + CAST(d.dq AS DOUBLE) / 1e9 / n.n), 9) AS r
        |  FROM nodes nd LEFT JOIN $c c USING (node)
        |  CROSS JOIN $d d CROSS JOIN n)""".stripMargin
    s"""WITH e AS (
      |  SELECT a.source AS src, b.source AS dst
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |pr0 AS (SELECT node, round(1.0 / n.n, 9) AS r FROM nodes CROSS JOIN n),
      |${iter("pr0", "c1p", "d1p", "pr1")},
      |${iter("pr1", "c2p", "d2p", "pr2")},
      |${iter("pr2", "c3p", "d3p", "pr3")},
      |${iter("pr3", "c4p", "d4p", "pr4")},
      |${iter("pr4", "c5p", "d5p", "pr5")}
      |SELECT node, r AS rank FROM pr5 ORDER BY node""".stripMargin
  }

  /** lr_hashed: the 2-iteration hashed-feature sparse LR replayed — the
    * same md5[0:8] % 64 bucket hash (8-digit Horner chain), bias rows at
    * bucket −1, per-(doc,bucket) dot-product and gradient contributions
    * quantized to the 1e-9 grid and summed as exact BIGINTs, σ round-9
    * before the residual, weights round-9 per unrolled update CTE (weight
    * frames as CTEs — iteration 1 left-joins an EMPTY w0, the all-zero
    * initial model), final probs round-6. */
  val lrHashed: String = {
    val bucket = s"CAST(${md5Chain("hx", 8)} AS BIGINT) % 64"
    val feats = (src: String, name: String, withY: String) =>
      s"""$name AS (
        |  SELECT doc_id,$withY fb, CAST(count(*) AS BIGINT) AS x FROM (
        |    SELECT doc_id,$withY $bucket AS fb FROM (
        |      SELECT doc_id,$withY md5(unnest(list_filter(
        |        string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |        t -> len(t) > 0))) AS hx
        |      FROM $src))
        |  GROUP BY 1, 2${if (withY.nonEmpty) ", 3" else ""}
        |  UNION ALL
        |  SELECT doc_id,$withY CAST(-1 AS BIGINT) AS fb, CAST(1 AS BIGINT) AS x
        |  FROM $src)""".stripMargin
    val resid = (wsrc: String, name: String) =>
      s"""$name AS (
        |  SELECT f.doc_id,
        |    round(1.0 / (1.0 + exp(-(CAST(sum(CAST(round(f.x * COALESCE(w.w, 0.0) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9))), 9) - f.y AS r
        |  FROM trf f LEFT JOIN $wsrc w USING (fb)
        |  GROUP BY f.doc_id, f.y)""".stripMargin
    val grad = (rsrc: String, name: String) =>
      s"""$name AS (
        |  SELECT f.fb, sum(CAST(round(r.r * f.x * 1e9) AS BIGINT)) AS g
        |  FROM trf f JOIN $rsrc r USING (doc_id)
        |  GROUP BY 1)""".stripMargin
    val step = (gsrc: String, name: String, wprev: String) =>
      s"""$name AS (
        |  SELECT g.fb,
        |    round(COALESCE(w.w, 0.0) - 1.0 * (CAST(g.g AS DOUBLE) / 1e9 / n.n), 9) AS w
        |  FROM $gsrc g LEFT JOIN $wprev w USING (fb) CROSS JOIN n)""".stripMargin
    s"""WITH b AS (
      |  SELECT doc_id, lang, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |tr AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, text
      |  FROM b WHERE bucket < 204),
      |vd AS (SELECT doc_id, text FROM b WHERE bucket >= 204 AND bucket < 230),
      |${feats("tr", "trf", " y,")},
      |n AS (SELECT count(*) AS n FROM tr),
      |w0h AS (SELECT CAST(NULL AS BIGINT) AS fb, 0.0 AS w WHERE FALSE),
      |${resid("w0h", "r1h")},
      |${grad("r1h", "g1h")},
      |${step("g1h", "w1h", "w0h")},
      |${resid("w1h", "r2h")},
      |${grad("r2h", "g2h")},
      |${step("g2h", "w2h", "w1h")},
      |${feats("vd", "vf", "")},
      |scored AS (
      |  SELECT f.doc_id,
      |    round(1.0 / (1.0 + exp(-(CAST(sum(CAST(round(f.x * COALESCE(w.w, 0.0) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9))), 6) AS prob
      |  FROM vf f LEFT JOIN w2h w USING (fb)
      |  GROUP BY f.doc_id)
      |SELECT doc_id, prob, CAST(prob >= 0.5 AS BIGINT) AS label_pred
      |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** dsir_select: both unigram models retrained in SQL — target = the
    * train split's English docs, source = the whole train split — and the
    * per-token log-likelihood ratio + exact interpolated 75th-percentile
    * selection cut replayed value-for-value (quantile_cont ≡ Spark
    * `percentile`, the price_percentiles convention; round-6 both sides of
    * the cut comparison). OOV tokens keep the smoothed zero count and stay
    * in the denominator (unlike NB's drop-OOV). */
  val dsirSelect: String =
    """WITH b AS (
      |  SELECT doc_id, lang, text,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents),
      |tr AS (SELECT doc_id, lang, text FROM b WHERE bucket < 204),
      |vd AS (SELECT doc_id, text FROM b WHERE bucket >= 204 AND bucket < 230),
      |tgt_model AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0)) AS tok
      |    FROM tr WHERE lang = 'en')
      |  GROUP BY 1),
      |tgt_tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot,
      |  CAST(count(*) AS BIGINT) AS v FROM tgt_model),
      |src_model AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0)) AS tok
      |    FROM tr)
      |  GROUP BY 1),
      |src_tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot,
      |  CAST(count(*) AS BIGINT) AS v FROM src_model),
      |doc_tok AS (
      |  SELECT doc_id, tok, count(*) AS n FROM (
      |    SELECT doc_id, unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0)) AS tok
      |    FROM vd)
      |  GROUP BY 1, 2),
      |tgt_scored AS (
      |  SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS nt,
      |    CAST(sum(d.n * CAST(round(round(ln((COALESCE(m.c, 0) + 0.5)
      |      / (t.tot + 0.5 * t.v)), 9) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
      |      AS sl
      |  FROM doc_tok d LEFT JOIN tgt_model m USING (tok) CROSS JOIN tgt_tot t
      |  GROUP BY 1),
      |src_scored AS (
      |  SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS nt,
      |    CAST(sum(d.n * CAST(round(round(ln((COALESCE(m.c, 0) + 0.5)
      |      / (t.tot + 0.5 * t.v)), 9) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
      |      AS sl
      |  FROM doc_tok d LEFT JOIN src_model m USING (tok) CROSS JOIN src_tot t
      |  GROUP BY 1),
      |weights AS (
      |  SELECT v2.doc_id,
      |    COALESCE(ts.nt, 0) AS n_tokens,
      |    CASE WHEN COALESCE(ts.nt, 0) = 0 THEN 0.0
      |         ELSE round(ts.sl / ts.nt, 6) END AS ll_target,
      |    CASE WHEN COALESCE(ss.nt, 0) = 0 THEN 0.0
      |         ELSE round(ss.sl / ss.nt, 6) END AS ll_source,
      |    round(CASE WHEN COALESCE(ts.nt, 0) = 0 THEN 0.0
      |               ELSE round(ts.sl / ts.nt, 6) END
      |        - CASE WHEN COALESCE(ss.nt, 0) = 0 THEN 0.0
      |               ELSE round(ss.sl / ss.nt, 6) END, 6) AS weight
      |  FROM vd v2
      |  LEFT JOIN tgt_scored ts ON ts.doc_id = v2.doc_id
      |  LEFT JOIN src_scored ss ON ss.doc_id = v2.doc_id),
      |th AS (SELECT round(quantile_cont(weight, 0.75), 6) AS t FROM weights)
      |SELECT doc_id, n_tokens, ll_target, ll_source, weight,
      |  CAST(weight >= t AS BIGINT) AS selected
      |FROM weights, th ORDER BY doc_id""".stripMargin

  /** ppl_buckets: CCNet's head/middle/tail corpus split by LM perplexity —
    * thresholds are exact interpolated percentiles (Spark `percentile` ≡
    * DuckDB `quantile_cont`, the price_percentiles convention) over docs
    * WITH bigrams, round-6 on both sides so the round-6 ppl comparison is
    * boundary-stable. */
  val pplBuckets: String =
    s"""WITH $lmScoreCte,
      |th AS (
      |  SELECT round(quantile_cont(ppl, 0.3333333333), 6) AS p33,
      |         round(quantile_cont(ppl, 0.6666666667), 6) AS p66
      |  FROM lmfinal WHERE n_bigrams > 0)
      |SELECT doc_id, ppl,
      |  CASE WHEN ppl <= p33 THEN 'head'
      |       WHEN ppl <= p66 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM lmfinal, th ORDER BY doc_id""".stripMargin

  /** bpe_merges: the BPE induction fully unrolled — one CTE pair per merge
    * rank. w0 is the (word, freq, " c h a r s </w> ") vocabulary; each
    * iteration counts adjacent symbol pairs (weighted by word freq), picks
    * argmax (count desc, pair asc), and applies the literal " a b "→" ab "
    * replace TWICE — a single left-to-right pass skips every second
    * occurrence in a run (shared boundary space), and the survivors are
    * isolated, so the second identical pass is the merge-everywhere
    * fixpoint. DuckDB's `replace` has identical left-to-right
    * non-overlapping semantics, so the double pass agrees with the engine
    * ([[graft.operators.CorpusOps.bpeMerges]]) pass-for-pass. */
  val bpeMerges: String = {
    val n = 8
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (
      |  SELECT CAST(count(*) AS BIGINT) AS freq,
      |    ' ' || array_to_string(
      |      list_transform(range(1, length(w) + 1), i -> w[i]), ' ')
      |    || ' </w> ' AS sym
      |  FROM (SELECT unnest(list_filter(regexp_split_to_array(
      |      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
      |      '\s+'), t -> length(t) > 0)) AS w FROM documents)
      |  GROUP BY w)""".stripMargin
    for (i <- 1 to n) {
      sb ++= s""",
      |p$i AS (
      |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(list_transform(range(1, len(syms)),
      |      j -> syms[j] || ' ' || syms[j + 1])) AS pr
      |    FROM (SELECT freq, list_filter(
      |      regexp_split_to_array(trim(sym), ' '),
      |      s -> length(s) > 0) AS syms FROM w${i - 1}))
      |  GROUP BY pr),
      |b$i AS (SELECT pr, cnt FROM p$i ORDER BY cnt DESC, pr ASC LIMIT 1),
      |w$i AS (
      |  SELECT freq, replace(replace(sym, ' ' || pr || ' ',
      |    ' ' || replace(pr, ' ', '') || ' '), ' ' || pr || ' ',
      |    ' ' || replace(pr, ' ', '') || ' ') AS sym
      |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }
    sb ++= s""",
      |merges AS (${(1 to n).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, split_part(pr, ' ', 1) AS left_sym, " +
          s"split_part(pr, ' ', 2) AS right_sym, cnt AS pair_count FROM b$i")
        .mkString(" UNION ALL ")})
      |SELECT rank, left_sym, right_sym, pair_count FROM merges
      |ORDER BY rank""".stripMargin
    sb.toString
  }

  /** Shared CTE chain for bpe_encode-family oracles: the unrolled 8-merge
    * induction (word column kept through the iterations) carried to `agg`
    * = per-document BPE token counts. */
  private def bpeEncodeChain: String = {
    val n = 8
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (
      |  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
      |    ' ' || array_to_string(
      |      list_transform(range(1, length(w) + 1), i -> w[i]), ' ')
      |    || ' </w> ' AS sym
      |  FROM (SELECT unnest(list_filter(regexp_split_to_array(
      |      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
      |      '\s+'), t -> length(t) > 0)) AS w FROM documents)
      |  GROUP BY w)""".stripMargin
    for (i <- 1 to n) {
      sb ++= s""",
      |p$i AS (
      |  SELECT pr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(list_transform(range(1, len(syms)),
      |      j -> syms[j] || ' ' || syms[j + 1])) AS pr
      |    FROM (SELECT freq, list_filter(
      |      regexp_split_to_array(trim(sym), ' '),
      |      s -> length(s) > 0) AS syms FROM w${i - 1}))
      |  GROUP BY pr),
      |b$i AS (SELECT pr, cnt FROM p$i ORDER BY cnt DESC, pr ASC LIMIT 1),
      |w$i AS (
      |  SELECT word, freq, replace(replace(sym, ' ' || pr || ' ',
      |    ' ' || replace(pr, ' ', '') || ' '), ' ' || pr || ' ',
      |    ' ' || replace(pr, ' ', '') || ' ') AS sym
      |  FROM w${i - 1} CROSS JOIN b$i)""".stripMargin
    }
    sb ++= s""",
      |v AS (
      |  SELECT word, CAST(len(list_filter(
      |    regexp_split_to_array(trim(sym), ' '),
      |    s -> length(s) > 0)) AS BIGINT) AS nsym FROM w$n),
      |dw AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT doc_id, unnest(list_filter(regexp_split_to_array(
      |      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
      |      '\\s+'), t -> length(t) > 0)) AS w FROM documents)
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT dw.doc_id, CAST(sum(dw.n * v.nsym) AS BIGINT) AS t
      |  FROM dw JOIN v ON dw.w = v.word GROUP BY 1)""".stripMargin
    sb.toString
  }

  /** bpe_encode: the shared induction chain, then per-document token
    * counts = Σ occurrences × final symbol count per word, 0 for
    * token-empty docs. */
  val bpeEncode: String = bpeEncodeChain + "\n" +
    // the chain is interpolated AFTER its own stripMargin — stripping the
    // combined string again would eat the '||' concatenations at its line
    // starts, so only the tail is margin-stripped
    """SELECT doc_id, COALESCE(t, CAST(0 AS BIGINT)) AS bpe_tokens
      |FROM documents LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** token_fertility: the shared BPE-encode chain rolled up per language —
    * word/char volumes from the same normalized tokenization, exact
    * integer sums, round-6 tokens_per_word and chars_per_token. */
  val tokenFertility: String = bpeEncodeChain + ",\n" +
    """ds AS (
      |  SELECT doc_id, lang,
      |    CAST(len(l) AS BIGINT) AS w,
      |    CAST(COALESCE(list_sum(list_transform(l, x -> len(x))), 0) AS BIGINT) AS ch
      |  FROM (SELECT doc_id, lang, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l FROM documents)),
      |per AS (
      |  SELECT ds.lang,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(ds.w) AS BIGINT) AS words,
      |    CAST(sum(ds.ch) AS BIGINT) AS chars,
      |    CAST(sum(COALESCE(a.t, 0)) AS BIGINT) AS toks
      |  FROM ds LEFT JOIN agg a USING (doc_id)
      |  GROUP BY 1)
      |SELECT lang, n_docs, words, chars, toks AS bpe_tokens,
      |  CASE WHEN words = 0 THEN 0.0
      |       ELSE round(CAST(toks AS DOUBLE) / words, 6) END AS tokens_per_word,
      |  CASE WHEN toks = 0 THEN 0.0
      |       ELSE round(CAST(chars AS DOUBLE) / toks, 6) END AS chars_per_token
      |FROM per ORDER BY lang""".stripMargin

  /** bm25_search: the whole Okapi BM25 computation replayed — tf, df,
    * doc lengths, avgdl, the Lucene ln(1 + (N−df+0.5)/(df+0.5)) idf
    * rounded to 9, per-term contributions quantized to 1e-9 integers and
    * summed as BIGINTs (order-free), rank = (score desc, doc_id asc).
    * Every decimal literal is mixed into a DOUBLE before arithmetic so
    * DuckDB's decimal types never enter the computation. */
  val bm25Search: String =
    """WITH q(query_id, qtext) AS (VALUES
      |  (1, 'spark window merge'), (2, 'fast hash join table'),
      |  (3, 'stream batch query data'), (4, 'vector column filter')),
      |terms AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
      |    '\s+'), t -> length(t) > 0)) AS t
      |  FROM documents),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      |  FROM terms GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
      |  FROM tf GROUP BY 1),
      |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df
      |  FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(dl) AS BIGINT) AS tot FROM dl),
      |qt AS (
      |  SELECT query_id, unnest(list_distinct(list_filter(
      |    regexp_split_to_array(
      |      trim(regexp_replace(lower(qtext), '[^a-z0-9]+', ' ', 'g')),
      |      '\s+'), t -> length(t) > 0))) AS t
      |  FROM q),
      |contrib AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(round(
      |      round(ln(1.0 + (CAST(stats.n - dfreq.df AS DOUBLE) + 0.5)
      |                     / (CAST(dfreq.df AS DOUBLE) + 0.5)), 9)
      |      * tf.tf * (1.2 + 1.0)
      |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75
      |         * (CAST(dl.dl AS DOUBLE)
      |            / (CAST(stats.tot AS DOUBLE) / stats.n))))
      |      * 1e9) AS BIGINT) AS c
      |  FROM qt JOIN tf USING (t) JOIN dfreq USING (t)
      |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
      |scored AS (
      |  SELECT query_id, doc_id,
      |    round(CAST(sum(c) AS DOUBLE) / 1e9, 6) AS score
      |  FROM contrib GROUP BY 1, 2),
      |ranked AS (
      |  SELECT CAST(query_id AS BIGINT) AS query_id,
      |    CAST(doc_id AS BIGINT) AS doc_id, score,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT query_id, doc_id, score, rank FROM ranked
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** hybrid_search: BM25 (same CTEs as bm25_search, query docs 0–3 as
    * their own lexical queries, top-20) + brute-force cosine (same CTEs
    * as knn_bruteforce, top-20) fused by reciprocal rank — contributions
    * 1e9/(60+rank) as exact BIGINTs, so the fusion is integer arithmetic
    * end to end. */
  val hybridSearch: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
      |    '\s+'), t -> length(t) > 0)) AS t
      |  FROM documents),
      |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
      |  FROM terms GROUP BY 1, 2),
      |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
      |  FROM tf GROUP BY 1),
      |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df
      |  FROM tf GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(dl) AS BIGINT) AS tot FROM dl),
      |qt AS (
      |  SELECT doc_id AS query_id, unnest(list_distinct(list_filter(
      |    regexp_split_to_array(
      |      trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
      |      '\s+'), t -> length(t) > 0))) AS t
      |  FROM documents WHERE doc_id < 4),
      |contrib AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(round(
      |      round(ln(1.0 + (CAST(stats.n - dfreq.df AS DOUBLE) + 0.5)
      |                     / (CAST(dfreq.df AS DOUBLE) + 0.5)), 9)
      |      * tf.tf * (1.2 + 1.0)
      |      / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75
      |         * (CAST(dl.dl AS DOUBLE)
      |            / (CAST(stats.tot AS DOUBLE) / stats.n))))
      |      * 1e9) AS BIGINT) AS c
      |  FROM qt JOIN tf USING (t) JOIN dfreq USING (t)
      |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
      |lexscored AS (
      |  SELECT query_id, doc_id,
      |    round(CAST(sum(c) AS DOUBLE) / 1e9, 6) AS score
      |  FROM contrib GROUP BY 1, 2),
      |lexranked AS (
      |  SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM lexscored),
      |vq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      |  WHERE vec_id < 4),
      |vscored AS (
      |  SELECT vq.query_id, e.vec_id AS doc_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS ne
      |  FROM vq, embeddings e WHERE vq.query_id <> e.vec_id),
      |vsim AS (
      |  SELECT query_id, doc_id,
      |    CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |         ELSE dot / (sqrt(nq) * sqrt(ne)) END AS raw_cosine
      |  FROM vscored),
      |vranked AS (
      |  SELECT query_id, doc_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY raw_cosine DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM vsim),
      |unioned AS (
      |  SELECT query_id, doc_id, rank FROM lexranked WHERE rank <= 20
      |  UNION ALL
      |  SELECT query_id, doc_id, rank FROM vranked WHERE rank <= 20),
      |rrf AS (
      |  SELECT query_id, doc_id,
      |    round(CAST(sum(CAST(round(1e9 / (60 + rank)) AS BIGINT))
      |      AS DOUBLE) / 1e9, 6) AS rrf
      |  FROM unioned GROUP BY 1, 2),
      |fr AS (
      |  SELECT CAST(query_id AS BIGINT) AS query_id,
      |    CAST(doc_id AS BIGINT) AS doc_id, rrf,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
      |  FROM rrf)
      |SELECT query_id, doc_id, rrf, rank FROM fr
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** strip_markup: identical RE2-safe pattern chain (script/style/comment
    * blocks, tags, entity decode with &amp; last, whitespace collapse)
    * over the same constructed HTML shell. */
  val stripMarkup: String =
    """SELECT doc_id, trim(regexp_replace(
      |  replace(replace(replace(replace(replace(
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |        '(?s)<!--.*?-->', ' ', 'g'),
      |      '<[^>]+>', ' ', 'g'),
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |    '&amp;', '&'),
      |  '\s+', ' ', 'g')) AS stripped
      |FROM (
      |  SELECT doc_id,
      |    '<html><head><style>p { color: red }</style>'
      |    || '<script type="text/js">var x = 1 < 2;</script></head>'
      |    || '<body><!-- doc ' || CAST(doc_id AS VARCHAR)
      |    || ' --><h1>Q&amp;A &lt;' || lang || '&gt;</h1><p>'
      |    || text || '</p></body></html>' AS html
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** corpus_card: per-lang volumes + exact-dup rate + quantized-mean
    * quality (same formula as quality_scores, 1e-6 integer sum) +
    * quantile_disc median length (≡ the KLL exact regime). */
  val corpusCard: String =
    """WITH base AS (
      |  SELECT lang, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct,
      |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |  FROM documents),
      |c AS (
      |  SELECT lang, fp, CAST(len(toks) AS BIGINT) AS nt,
      |    round(
      |      least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) * 0.3
      |      + (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0
      |           ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |                / len(toks) END) >= 3
      |          AND (CASE WHEN len(toks) = 0 THEN 0.0
      |           ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |                / len(toks) END) <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + (CASE WHEN length(text) = 0 THEN 0.0
      |          ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                         CAST(1 AS DOUBLE)) END) * 0.25
      |      + least((CASE WHEN len(ltoks) = 0 THEN 0.0
      |          ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |            ['the','a','an','and','or','but','of','to','in','on','at','is',
      |             'are','was','were','be','been','it','this','that','with','for',
      |             'as','by','from','not','no','so','if','then','than','too'], t)))
      |          AS DOUBLE) / len(ltoks) END) * 4, CAST(1 AS DOUBLE)) * 0.25,
      |      6) AS q
      |  FROM base)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nt) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS distinct_texts,
      |  round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6) AS dup_rate,
      |  round(CAST(sum(CAST(round(q * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
      |    / count(*), 6) AS avg_quality,
      |  CAST(quantile_disc(nt, 0.5) AS BIGINT) AS p50_tokens
      |FROM c GROUP BY lang ORDER BY lang""".stripMargin

  /** gopher_rules: every signal recomputed with DuckDB list/regex
    * primitives — same whitespace tokens, trimmed non-blank lines,
    * non-overlapping '#'/'...' counts, rule thresholds on the identically
    * rounded ratios. */
  val gopherRules: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    list_filter(list_transform(regexp_split_to_array(text, '\n'),
      |                l -> trim(l)), l -> length(l) > 0) AS lines
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS word_count,
      |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
      |      CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |        / len(toks), 6) END AS mean_word_len,
      |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
      |      CAST(len(regexp_extract_all(text, '#'))
      |         + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
      |        / len(toks), 6) END AS symbol_ratio,
      |    CASE WHEN len(lines) = 0 THEN 0.0 ELSE round(
      |      CAST(len(list_filter(lines, l -> starts_with(l, '- ')
      |         OR starts_with(l, '* ') OR starts_with(l, '• '))) AS DOUBLE)
      |        / len(lines), 6) END AS bullet_ratio,
      |    CASE WHEN len(lines) = 0 THEN 0.0 ELSE round(
      |      CAST(len(list_filter(lines, l -> ends_with(l, '...')
      |         OR ends_with(l, '…'))) AS DOUBLE)
      |        / len(lines), 6) END AS ellipsis_ratio,
      |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
      |      CAST(len(list_filter(toks,
      |        t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
      |        / len(toks), 6) END AS alpha_frac,
      |    CAST(len(list_filter(
      |      ['the','be','to','of','and','that','have','with'],
      |      w -> list_contains(ltoks, w))) AS BIGINT) AS stop_hits
      |  FROM base)
      |SELECT doc_id, word_count, mean_word_len, symbol_ratio, bullet_ratio,
      |  ellipsis_ratio, alpha_frac, stop_hits,
      |  (word_count >= 50 AND word_count <= 100000
      |   AND mean_word_len >= 3 AND mean_word_len <= 10
      |   AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
      |   AND ellipsis_ratio <= 0.3 AND alpha_frac >= 0.8
      |   AND stop_hits >= 2) AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  val qualityScores: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio
      |  FROM base)
      |SELECT doc_id,
      |  round(len_score * 0.3
      |    + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |    + punct_score * 0.25
      |    + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) AS quality
      |FROM c ORDER BY doc_id""".stripMargin

  val fingerprintMd5: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** quality_floor: the qualityScores composite (same CTE arithmetic,
    * source carried) + per-source quantile_disc(0.25) cutoff (≡ the KLL
    * exact regime — the quantile_sketch / embedding_outliers convention)
    * + the >= filter. Round-6 scores both sides, so the comparison is on
    * identical decimals and the cutoff is an actual element of the
    * multiset (no cross-engine interpolation). */
  val qualityFloor: String =
    """WITH base AS (
      |  SELECT doc_id, source, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio
      |  FROM base),
      |scored AS (
      |  SELECT doc_id, source,
      |    round(len_score * 0.3
      |      + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + punct_score * 0.25
      |      + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) AS quality
      |  FROM c),
      |cuts AS (
      |  SELECT source, quantile_disc(quality, 0.25) AS cutoff
      |  FROM scored GROUP BY source)
      |SELECT s.doc_id, s.source, s.quality, c.cutoff
      |FROM scored s JOIN cuts c USING (source)
      |WHERE s.quality >= c.cutoff
      |ORDER BY s.doc_id""".stripMargin

  val dedupExact: String =
    """SELECT lang, source, CAST(min(doc_id) AS BIGINT) AS keeper_id,
      |  count(*) AS dup_cnt
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val jaccardPlanted: String =
    """WITH norm AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+'),
      |      t -> length(t) > 0)) AS toks
      |  FROM documents WHERE doc_id < 20),
      |planted AS (
      |  SELECT doc_id,
      |    list_distinct(list_filter(
      |      regexp_split_to_array(trim(regexp_replace(lower(
      |        text || ' graft planted near duplicate suffix'), '[^a-z0-9]+', ' ', 'g')), '\s+'),
      |      t -> length(t) > 0)) AS toks
      |  FROM documents WHERE doc_id < 20)
      |SELECT n.doc_id,
      |  round(CASE WHEN len(n.toks) + len(p.toks) - len(list_intersect(n.toks, p.toks)) = 0
      |             THEN 0.0
      |             ELSE CAST(len(list_intersect(n.toks, p.toks)) AS DOUBLE)
      |                  / (len(n.toks) + len(p.toks) - len(list_intersect(n.toks, p.toks)))
      |        END, 6) AS jaccard
      |FROM norm n JOIN planted p USING (doc_id)
      |ORDER BY n.doc_id""".stripMargin

  val embeddingNorms: String =
    """SELECT vec_id,
      |  round(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** The same md5-bucket split arithmetic as Sampling.hashSplit — the split
    * being auditable from plain SQL is the point of that design. */
  val hashSplit: String =
    """SELECT doc_id,
      |  CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
      |    AS BIGINT) AS bucket,
      |  CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204
      |       THEN 'train'
      |       WHEN (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |          + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 230
      |       THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Distinct word-3-shingle intersection counts between originals and
    * their planted near-copies (the "benchmark" side), >= 5 shared. */
  val decontamination: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' graft planted near duplicate suffix'
      |  FROM documents WHERE doc_id < 20),
      |toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM docs),
      |sh AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+2], ' ')))
      |    END AS s
      |  FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS sh FROM sh)
      |SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
      |FROM ex c JOIN ex b USING (sh)
      |WHERE c.doc_id < 1000000 AND b.doc_id >= 1000000
      |GROUP BY 1, 2 HAVING count(*) >= 5
      |ORDER BY 1, 2""".stripMargin

  val vocabTopK: String =
    """SELECT token, count(*) AS cnt FROM (
      |  SELECT unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0)) AS token
      |  FROM documents)
      |GROUP BY 1 ORDER BY cnt DESC, token ASC LIMIT 50""".stripMargin

  /** Per-source quota: same md5-bucket priority arithmetic as
    * Sampling.quotaPerGroup — row_number per source over (bucket, id). */
  val sourceQuota: String =
    """SELECT doc_id, source, priority FROM (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY
      |      (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) ASC,
      |      doc_id ASC) AS BIGINT) AS priority
      |  FROM documents)
      |WHERE priority <= 8 ORDER BY doc_id""".stripMargin

  /** unimax_sample: the UniMax water-filling allocation replayed in SQL —
    * per-lang counts, caps sorted ascending with prefix sums, the
    * r_i = (B − cum_{i−1})/(L−i+1) ladder, water level t = max(r) over
    * uncapped rows, alloc = least(cap, coalesce(t, cap)) — every step is
    * integer counts + IEEE division, bit-identical across engines — then
    * the per-lang floor(alloc) quota applied in the same md5-priority
    * order as source_quota. Budget 400, maxEpochs 1.0. */
  val unimaxSample: String =
    """WITH counts AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
      |ranked AS (
      |  SELECT lang, n, CAST(n AS DOUBLE) * 1.0 AS cap,
      |    CAST(row_number() OVER
      |      (ORDER BY n ASC, lang ASC) AS BIGINT) AS i,
      |    CAST(sum(n) OVER (ORDER BY n ASC, lang ASC
      |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn,
      |    (SELECT count(*) FROM counts) AS L
      |  FROM counts),
      |laddered AS (
      |  SELECT lang, n, cap,
      |    (400.0 - CAST(cumn - n AS DOUBLE) * 1.0) / (L - i + 1) AS r
      |  FROM ranked),
      |lev AS (SELECT max(CASE WHEN NOT (cap <= r) THEN r END) AS t
      |  FROM laddered),
      |q AS (
      |  SELECT lang, n,
      |    CAST(floor(least(cap, COALESCE(t, cap))) AS BIGINT) AS quota
      |  FROM laddered CROSS JOIN lev),
      |sel AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY
      |      (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) ASC,
      |      doc_id ASC) AS BIGINT) AS priority
      |  FROM documents)
      |SELECT s.doc_id, s.lang, s.priority
      |FROM sel s JOIN q USING (lang)
      |WHERE s.priority <= least(q.quota, q.n)
      |ORDER BY s.doc_id""".stripMargin

  /** source_overlap: distinct (source, token) pairs under the cm_freq
    * token identity, token-keyed self-join for pairwise intersections,
    * per-source vocabulary sizes, exact Jaccard. Sizes LEFT JOIN from the
    * group set (token-empty groups keep their pairs at n=0, jaccard 0) —
    * the same semantics as CorpusOps.sourceOverlap after the r12 ADVICE
    * fix; on the contract corpus no group is token-empty so rows are
    * unchanged, but the engines now agree on degenerate inputs too. */
  val sourceOverlap: String =
    """WITH gt AS (
      |  SELECT DISTINCT source AS g,
      |    unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      t -> len(t) > 0)) AS tok
      |  FROM documents),
      |grp AS (SELECT DISTINCT source AS g FROM documents),
      |sizes AS (
      |  SELECT grp.g, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      |  FROM grp LEFT JOIN
      |    (SELECT g, count(*) AS n FROM gt GROUP BY g) c USING (g)),
      |inter AS (
      |  SELECT a.g AS group_a, b.g AS group_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.g AS group_a, b.g AS group_b
      |  FROM grp a, grp b
      |  WHERE a.g < b.g)
      |SELECT p.group_a, p.group_b, sa.n AS n_a, sb.n AS n_b,
      |  COALESCE(i.n_shared, 0) AS n_shared,
      |  CASE WHEN sa.n + sb.n - COALESCE(i.n_shared, 0) = 0 THEN 0.0
      |       ELSE round(CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
      |         / (sa.n + sb.n - COALESCE(i.n_shared, 0)), 6) END AS jaccard
      |FROM pairs p
      |LEFT JOIN inter i USING (group_a, group_b)
      |JOIN sizes sa ON sa.g = p.group_a
      |JOIN sizes sb ON sb.g = p.group_b
      |ORDER BY group_a, group_b""".stripMargin

  /** corpus_diff: the re-crawl mutation + full-outer fingerprint diff
    * replayed (USING coalesces doc_id in both engines). */
  val corpusDiff: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fb
      |  FROM documents),
      |a0 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' corpus diff edit'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id < 15),
      |a AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fa
      |  FROM a0)
      |SELECT doc_id,
      |  CASE WHEN fb IS NULL THEN 'added'
      |       WHEN fa IS NULL THEN 'removed'
      |       WHEN fa = fb THEN 'unchanged'
      |       ELSE 'modified' END AS status
      |FROM b FULL OUTER JOIN a USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** snapshot_novelty: cross-snapshot trigram novelty per source — the
    * gram_novelty trigram replay, novelty measured as LEFT ANTI against
    * the whole before corpus's distinct trigrams. */
  val snapshotNovelty: String =
    """WITH a0 AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' corpus diff edit'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 3
      |  UNION ALL
      |  SELECT source, text FROM documents WHERE doc_id < 15),
      |bl AS (
      |  SELECT list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM documents),
      |bg AS (
      |  SELECT DISTINCT tri FROM (
      |    SELECT unnest(list_transform(range(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS tri
      |    FROM bl)),
      |al AS (
      |  SELECT source, list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0) AS l
      |  FROM a0),
      |ag AS (
      |  SELECT DISTINCT source, tri FROM (
      |    SELECT source, unnest(list_transform(range(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS tri
      |    FROM al)),
      |novel AS (
      |  SELECT ag.source, CAST(count(*) AS BIGINT) AS nn
      |  FROM ag LEFT JOIN bg USING (tri)
      |  WHERE bg.tri IS NULL
      |  GROUP BY 1),
      |per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS ng FROM ag GROUP BY 1)
      |SELECT g.source,
      |  COALESCE(p.ng, 0) AS n_grams,
      |  COALESCE(nv.nn, 0) AS n_novel,
      |  CASE WHEN COALESCE(p.ng, 0) = 0 THEN 0.0
      |       ELSE round(CAST(COALESCE(nv.nn, 0) AS DOUBLE) / p.ng, 6) END AS novelty
      |FROM (SELECT DISTINCT source FROM a0) g
      |LEFT JOIN per p USING (source)
      |LEFT JOIN novel nv USING (source)
      |ORDER BY g.source""".stripMargin

  /** source_overlap_kmv: the sketch path in its exact regime — vocab ≪ k,
    * so the KMV finishers equal the exact distinct counts and Jaccard;
    * this replay IS the exact arithmetic (the knn_ivf full-probe trick). */
  val sourceOverlapKmv: String =
    """WITH gt AS (
      |  SELECT DISTINCT source AS g,
      |    unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      t -> len(t) > 0)) AS tok
      |  FROM documents),
      |grp AS (SELECT DISTINCT source AS g FROM documents),
      |sizes AS (
      |  SELECT grp.g, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
      |  FROM grp LEFT JOIN
      |    (SELECT g, count(*) AS n FROM gt GROUP BY g) c USING (g)),
      |inter AS (
      |  SELECT a.g AS group_a, b.g AS group_b,
      |    CAST(count(*) AS BIGINT) AS n_shared
      |  FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.g AS group_a, b.g AS group_b
      |  FROM grp a, grp b
      |  WHERE a.g < b.g)
      |SELECT p.group_a, p.group_b,
      |  round(CAST(sa.n AS DOUBLE), 6) AS est_a,
      |  round(CAST(sb.n AS DOUBLE), 6) AS est_b,
      |  CASE WHEN sa.n + sb.n - COALESCE(i.n_shared, 0) = 0 THEN 0.0
      |       ELSE round(CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
      |         / (sa.n + sb.n - COALESCE(i.n_shared, 0)), 6) END AS jaccard_est
      |FROM pairs p
      |LEFT JOIN inter i USING (group_a, group_b)
      |JOIN sizes sa ON sa.g = p.group_a
      |JOIN sizes sb ON sb.g = p.group_b
      |ORDER BY group_a, group_b""".stripMargin

  /** corpus_drift: per-source unigram-distribution JS divergence + L1
    * under the corpus_diff mutation (sources kept on re-added docs) —
    * the full arithmetic replayed: occurrence counts, per-source totals,
    * the cleared-denominator ln ratio rounded to 1e-9, per-term 1e-9-grid
    * integer quantization, order-free long sums (the lm_score
    * convention). Count products go through DOUBLE before multiplying,
    * same as the Spark side. */
  val corpusDrift: String =
    """WITH a0 AS (
      |  SELECT source,
      |    CASE WHEN doc_id % 5 = 0 THEN text || ' corpus diff edit'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 3
      |  UNION ALL
      |  SELECT source, text FROM documents WHERE doc_id < 15),
      |bt AS (
      |  SELECT source,
      |    unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      t -> len(t) > 0)) AS tok
      |  FROM documents),
      |at AS (
      |  SELECT source,
      |    unnest(list_filter(
      |      string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      t -> len(t) > 0)) AS tok
      |  FROM a0),
      |cb AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cb FROM bt GROUP BY 1, 2),
      |ca AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS ca FROM at GROUP BY 1, 2),
      |tb AS (SELECT source, CAST(count(*) AS BIGINT) AS tb FROM bt GROUP BY 1),
      |ta AS (SELECT source, CAST(count(*) AS BIGINT) AS ta FROM at GROUP BY 1),
      |j AS (
      |  SELECT COALESCE(cb.source, ca.source) AS source,
      |    COALESCE(cb.cb, 0) AS cb, COALESCE(ca.ca, 0) AS ca
      |  FROM cb FULL OUTER JOIN ca
      |    ON cb.source = ca.source AND cb.tok = ca.tok),
      |j2 AS (
      |  SELECT j.source, j.cb, j.ca,
      |    COALESCE(tb.tb, 0) AS tb, COALESCE(ta.ta, 0) AS ta
      |  FROM j LEFT JOIN tb ON tb.source = j.source
      |         LEFT JOIN ta ON ta.source = j.source),
      |terms AS (
      |  SELECT source, cb, ca,
      |    CASE WHEN tb = 0 THEN 0.0 ELSE CAST(cb AS DOUBLE) / tb END AS p,
      |    CASE WHEN ta = 0 THEN 0.0 ELSE CAST(ca AS DOUBLE) / ta END AS q,
      |    CASE WHEN cb = 0 THEN 0.0
      |         WHEN ta = 0 THEN round(ln(2.0), 9)
      |         ELSE round(ln(2.0 * CAST(cb AS DOUBLE) * CAST(ta AS DOUBLE)
      |           / (CAST(cb AS DOUBLE) * CAST(ta AS DOUBLE)
      |              + CAST(ca AS DOUBLE) * CAST(tb AS DOUBLE))), 9) END AS lnp,
      |    CASE WHEN ca = 0 THEN 0.0
      |         WHEN tb = 0 THEN round(ln(2.0), 9)
      |         ELSE round(ln(2.0 * CAST(ca AS DOUBLE) * CAST(tb AS DOUBLE)
      |           / (CAST(cb AS DOUBLE) * CAST(ta AS DOUBLE)
      |              + CAST(ca AS DOUBLE) * CAST(tb AS DOUBLE))), 9) END AS lnq
      |  FROM j2)
      |SELECT source,
      |  CAST(sum(cb) AS BIGINT) AS n_before,
      |  CAST(sum(ca) AS BIGINT) AS n_after,
      |  round(CAST(sum(CAST(round(p * lnp * 1e9) AS BIGINT))
      |    + sum(CAST(round(q * lnq * 1e9) AS BIGINT)) AS DOUBLE) / 2e9, 6) AS js_div,
      |  round(CAST(sum(CAST(round(abs(p - q) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS l1_dist
      |FROM terms GROUP BY source
      |ORDER BY source""".stripMargin

  /** drift_monitor: [[corpusDrift]]'s arithmetic restricted to sources
    * that actually appear in the after snapshot — the streaming monitor
    * emits one row per STREAMED group, so a source whose docs all vanish
    * from the stream must not get an oracle row (the batch operator, by
    * contrast, reports before-only sources with n_after = 0). The
    * restriction is on the token CTE (`at`), not the doc CTE (`a0`): the
    * monitor groups by source only after tokenization, so a source whose
    * after-docs all normalize to EMPTY token lists streams zero tokens and
    * gets no engine row either — restricting on docs would re-plant that
    * fixture dependence one level down. On the contract fixture every
    * source streams ≥1 token, so both oracles agree — this variant removes
    * the dependence rather than pinning it. */
  val driftMonitor: String = {
    val anchor = "FROM terms GROUP BY source"
    require(corpusDrift.contains(anchor),
      "corpusDrift's final aggregation moved — update driftMonitor's " +
        "after-snapshot restriction with it (a silent no-op replace would " +
        "quietly reintroduce the every-source-streams fixture dependence)")
    require(corpusDrift.indexOf(anchor) == corpusDrift.lastIndexOf(anchor),
      "corpusDrift now contains the anchor twice — String.replace would " +
        "rewrite both occurrences with no guard tripping; give the final " +
        "aggregation a unique anchor before regenerating driftMonitor")
    corpusDrift.replace(anchor,
      "FROM terms WHERE source IN (SELECT DISTINCT source FROM at) " +
        "GROUP BY source")
  }

  /** keep_best: the quality-ranked keep-list replayed — the full quality
    * composite (the qualityScores CTE) over originals + nudged plants,
    * then per-pair argmax on (round-6 quality desc, id asc); singletons
    * all kept. */
  val keepBest: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN text || ' the and of to in is are'
      |         ELSE text || ' !!! ;;; ??? %%% @@@' END AS text
      |  FROM documents WHERE doc_id < 20),
      |base AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM uni),
      |c AS (
      |  SELECT doc_id,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio
      |  FROM base),
      |q AS (
      |  SELECT doc_id,
      |    round(len_score * 0.3
      |      + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + punct_score * 0.25
      |      + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) AS quality
      |  FROM c),
      |losers AS (
      |  SELECT CASE
      |      WHEN qp.quality > qo.quality THEN o.doc_id
      |      WHEN qp.quality < qo.quality THEN o.doc_id + 1000000
      |      ELSE o.doc_id + 1000000 END AS doc_id
      |  FROM (SELECT doc_id FROM documents WHERE doc_id < 20) o
      |  JOIN q qo ON qo.doc_id = o.doc_id
      |  JOIN q qp ON qp.doc_id = o.doc_id + 1000000)
      |SELECT q.doc_id, q.quality
      |FROM q LEFT JOIN losers l ON l.doc_id = q.doc_id
      |WHERE l.doc_id IS NULL
      |ORDER BY q.doc_id""".stripMargin

  /** leak_safe_split: the cluster-keyed hash split replayed — fingerprint
    * = md5(normalized text), bucket = 2-hex md5 of the FINGERPRINT string
    * (not the doc id — that is the whole point), 205/26-bucket cuts.
    * Planted exact copies share the cluster, so equal splits for every
    * duplicate pair are value-checked, not assumed. */
  val leakSafeSplit: String =
    """WITH uni AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id < 20),
      |fp AS (
      |  SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS cluster
      |  FROM uni),
      |b AS (
      |  SELECT doc_id, cluster,
      |    CAST((strpos('0123456789abcdef', substr(md5(cluster), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(cluster), 2, 1)) - 1)
      |      AS BIGINT) AS bucket
      |  FROM fp)
      |SELECT doc_id, cluster, bucket,
      |  CASE WHEN bucket < 204 THEN 'train'
      |       WHEN bucket < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin

  /** epoch_manifest: the unimax_sample allocation chain at maxEpochs=3 /
    * budget=900, expanded into repetition rows — q // n full epochs of
    * every doc, plus epoch q//n for the q % n top-md5-priority docs. */
  val epochManifest: String =
    """WITH counts AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
      |ranked AS (
      |  SELECT lang, n, CAST(n AS DOUBLE) * 3.0 AS cap,
      |    CAST(row_number() OVER
      |      (ORDER BY n ASC, lang ASC) AS BIGINT) AS i,
      |    CAST(sum(n) OVER (ORDER BY n ASC, lang ASC
      |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn,
      |    (SELECT count(*) FROM counts) AS L
      |  FROM counts),
      |laddered AS (
      |  SELECT lang, n, cap,
      |    (900.0 - CAST(cumn - n AS DOUBLE) * 3.0) / (L - i + 1) AS r
      |  FROM ranked),
      |lev AS (SELECT max(CASE WHEN NOT (cap <= r) THEN r END) AS t
      |  FROM laddered),
      |q AS (
      |  SELECT lang, n,
      |    CAST(floor(least(cap, COALESCE(t, cap))) AS BIGINT) AS quota
      |  FROM laddered CROSS JOIN lev),
      |q2 AS (
      |  SELECT lang, n, quota // n AS fullE, quota % n AS rem FROM q),
      |sel AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY
      |      (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) ASC,
      |      doc_id ASC) AS BIGINT) AS priority
      |  FROM documents),
      |man AS (
      |  SELECT s.doc_id, s.lang,
      |    unnest(range(0, q2.fullE +
      |      CASE WHEN s.priority <= q2.rem THEN 1 ELSE 0 END)) AS epoch
      |  FROM sel s JOIN q2 USING (lang))
      |SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch
      |FROM man ORDER BY doc_id, epoch""".stripMargin

  /** Stratified language mix: en keeps buckets < 76 (~30%), zh < 192
    * (~75%), everything else all 256. */
  val stratifiedSample: String =
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |    + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents)
      |WHERE bucket < CASE lang WHEN 'en' THEN 76 WHEN 'zh' THEN 192 ELSE 256 END
      |ORDER BY doc_id""".stripMargin

  /** Context-window chunking: same whitespace tokens as token_stats, chunk
    * indices via unnest(range(...)) (DuckDB 1.0 rejects a lateral
    * generate_series over a column), text re-joined with single spaces. */
  val chunkPlan: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> length(t) > 0) AS toks
      |  FROM documents),
      |sized AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
      |  FROM base WHERE len(toks) > 0),
      |ex AS (
      |  SELECT doc_id, toks, n_tokens,
      |    unnest(range(0, (n_tokens - 1) // 32 + 1)) AS chunk_idx
      |  FROM sized)
      |SELECT doc_id, chunk_idx,
      |  least(32, n_tokens - chunk_idx*32) AS chunk_tokens,
      |  array_to_string(toks[(chunk_idx*32+1):least((chunk_idx+1)*32, n_tokens)], ' ') AS chunk_text
      |FROM ex ORDER BY doc_id, chunk_idx""".stripMargin

  /** Code-point entropy: DuckDB's per-character unnest vs the engine's
    * one-pass kernel — same -sum(p ln p), rounded to 6 so the engines'
    * different summation orders cannot surface (double addition is
    * order-sensitive at the last ulp). Docs with no characters fall out of
    * the unnest and are re-attached with entropy 0 (the kernel's empty-text
    * value). */
  val charEntropy: String =
    """WITH chars AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
      |freq AS (SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c FROM chars GROUP BY 1, 2),
      |tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY 1),
      |ent AS (SELECT freq.doc_id, round(-sum((c/n)*ln(c/n)), 6) AS char_entropy
      |        FROM freq JOIN tot USING (doc_id) GROUP BY 1)
      |SELECT d.doc_id, coalesce(e.char_entropy, 0.0) AS char_entropy
      |FROM documents d LEFT JOIN ent e USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Sequence packing: the same md5-group + id-order next-fit recursion as
    * CorpusOps.packSequences, expressed as a recursive CTE — each step
    * advances every group's frontier one row, carrying the running token
    * total and the pack counter. */
  val packPlan: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                              x -> length(x) > 0)) END AS BIGINT) AS n_tokens,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 16 AS grp
      |  FROM documents),
      |r AS (SELECT doc_id, n_tokens, grp,
      |        CAST(row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS BIGINT) AS rn
      |      FROM t),
      |s AS (
      |  SELECT doc_id, n_tokens, grp, rn, n_tokens AS acc, CAST(0 AS BIGINT) AS pack_id
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.doc_id, r.n_tokens, r.grp, r.rn,
      |    CASE WHEN s.acc + r.n_tokens > 256 THEN r.n_tokens ELSE s.acc + r.n_tokens END,
      |    CASE WHEN s.acc + r.n_tokens > 256 THEN s.pack_id + 1 ELSE s.pack_id END
      |  FROM s JOIN r ON r.grp = s.grp AND r.rn = s.rn + 1)
      |SELECT doc_id, n_tokens, CAST(grp AS BIGINT) AS grp, pack_id
      |FROM s ORDER BY doc_id""".stripMargin

  /** pack_stats: the pack_plan recursion rolled up per (grp, pack_id) —
    * doc counts, token totals (HUGEINT cast), fill = round-6 of
    * tokens/256 (exact 2^-8-grid values, decimal-terminating, so the
    * round is boundary-stable). */
  val packStats: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id,
      |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                              x -> length(x) > 0)) END AS BIGINT) AS n_tokens,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 16 AS grp
      |  FROM documents),
      |r AS (SELECT doc_id, n_tokens, grp,
      |        CAST(row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS BIGINT) AS rn
      |      FROM t),
      |s AS (
      |  SELECT doc_id, n_tokens, grp, rn, n_tokens AS acc, CAST(0 AS BIGINT) AS pack_id
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.doc_id, r.n_tokens, r.grp, r.rn,
      |    CASE WHEN s.acc + r.n_tokens > 256 THEN r.n_tokens ELSE s.acc + r.n_tokens END,
      |    CASE WHEN s.acc + r.n_tokens > 256 THEN s.pack_id + 1 ELSE s.pack_id END
      |  FROM s JOIN r ON r.grp = s.grp AND r.rn = s.rn + 1)
      |SELECT CAST(grp AS BIGINT) AS grp, pack_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
      |  round(CAST(sum(n_tokens) AS DOUBLE) / 256.0, 6) AS fill
      |FROM s GROUP BY 1, 2 ORDER BY grp, pack_id""".stripMargin

  /** TF-IDF top-3: same normalized tokens as vocab_topk, smoothed idf
    * ln((N+1)/(df+1))+1, ranked on the ROUNDED score (ln is not
    * correctly-rounded per IEEE — ranking on raw doubles could disagree
    * across engines in the last ulp), term-ascending ties. */
  val tfidfTopTerms: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0)) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, round(tf.tf * (ln((n.n + 1) / (dfreq.df + 1)) + 1), 6) AS tfidf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, term, tfidf,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Temperature mix α = 0.5: per-language keep rate sqrt(c_min/c_s),
    * cut = floor(256·rate) (Scala `(256*rate).toInt` truncation), kept iff
    * md5 bucket < cut — identical arithmetic end-to-end. */
  val temperatureMix: String =
    """WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
      |mn AS (SELECT min(c) AS cmin FROM cnt),
      |cut AS (
      |  SELECT lang,
      |    CAST(floor(256 * sqrt(CAST(cmin AS DOUBLE) / c)) AS INT) AS cut
      |  FROM cnt, mn),
      |b AS (
      |  SELECT doc_id, lang,
      |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
      |  FROM documents)
      |SELECT doc_id, lang FROM b JOIN cut USING (lang)
      |WHERE bucket < cut ORDER BY doc_id""".stripMargin

  /** Token-budget prefix in md5(id) order — the same two-phase cumulative
    * sum the engine computes, as ONE global window here (fine at oracle
    * scale). Inclusive running total, budget-crossing doc dropped whole. */
  val tokenBudgetSample: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                              x -> length(x) > 0)) END AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR)) AS pr
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |    CAST(sum(n_tokens) OVER (ORDER BY pr, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM t)
      |SELECT doc_id, n_tokens, cum_tokens FROM c
      |WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin

  /** Line-level (paragraph) dedup over docs with injected boilerplate:
    * first corpus occurrence of each non-empty line wins (ordered by
    * (doc_id, line_no)), documents reassembled; docs left with no lines
    * come back as empty strings. Mirrors Dedup.dedupLines exactly. */
  val lineDedup: String =
    """WITH docs AS (
      |  SELECT doc_id, text || chr(10) || 'subscribe to our newsletter for updates'
      |         || chr(10) || 'copyright 2026 ' || source AS text
      |  FROM documents),
      |split AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
      |lined AS (
      |  SELECT doc_id, unnest(range(0, len(ls))) AS line_no, ls FROM split),
      |lines AS (
      |  SELECT doc_id, CAST(line_no AS BIGINT) AS line_no,
      |    ls[line_no + 1] AS line
      |  FROM lined WHERE length(trim(ls[line_no + 1])) > 0),
      |kept AS (
      |  SELECT doc_id, line_no, line,
      |    row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      |  FROM lines),
      |agg AS (
      |  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS clean_text,
      |    CAST(count(*) AS BIGINT) AS n_lines_kept
      |  FROM kept WHERE rn = 1 GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
      |  coalesce(a.n_lines_kept, CAST(0 AS BIGINT)) AS n_lines_kept
      |FROM docs d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Shared CTE chain: planted corpus -> normalized word tokens -> distinct
    * word-3-shingle sets (w = min(3, ntok), exactly MinHashKernel's rule) ->
    * all pairs with exact set Jaccard >= 0.7. This is the exact ground
    * truth the MinHash-LSH pipeline approximates; the banding parameters
    * (16 bands x 4 rows) give recall 1 on this corpus, so the LSH output
    * must equal it row-for-row and value-for-value.
    *
    * EXACT set semantics, equi-join cost (r13 verdict items 3+4): the
    * original all-pairs `a JOIN b ON a.doc_id < b.doc_id` with per-pair
    * list_intersect was O(n²) — 560-1,324 s at sf0.1 (it dominated the
    * ~55-min gate) and infeasible at sf1 (1.25e9 pairs, the gate's last
    * oracle-cost exclusions). A pair at Jaccard ≥ 0.7 > 0 shares ≥ 1
    * shingle, so intersections are computed by EXPLODING the distinct
    * shingle sets and equi-joining on the shingle: |A∩B| = the pair's
    * group count (sets are distinct-exploded), cost Σ_shingle df² —
    * measured 2.8M rows at sf0.1 / 98M at sf1, seconds in DuckDB. Zero-
    * intersection pairs (jaccard 0 or 0-denominator empty pairs) were
    * already excluded by the >= 0.7 and > 0 predicates, so the output is
    * IDENTICAL row-for-row. */
  private val minhashPairsCte: String =
    """docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' graft planted near duplicate suffix'
      |  FROM documents WHERE doc_id < 20),
      |toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM docs),
      |shingle AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) = 0 THEN []
      |         ELSE list_distinct(list_transform(range(1, len(t) - least(len(t), 3) + 2),
      |                i -> array_to_string(t[i:i + least(len(t), 3) - 1], ' ')))
      |    END AS s
      |  FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS sh FROM shingle),
      |sz AS (SELECT doc_id, len(s) AS n FROM shingle),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(count(*) AS BIGINT) AS i
      |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b,
      |    round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
      |  FROM inter
      |  JOIN sz sa ON sa.doc_id = id_a
      |  JOIN sz sb ON sb.doc_id = id_b
      |  WHERE sa.n + sb.n - i > 0
      |    AND i::DOUBLE / (sa.n + sb.n - i) >= 0.7)""".stripMargin

  val dedupMinhash: String =
    s"""WITH $minhashPairsCte
      |SELECT id_a, id_b, jaccard FROM pairs ORDER BY 1, 2""".stripMargin

  /** incremental_dedup: the brute-force CROSS truth set — every
    * (corpus doc, increment doc) pair's exact shingle Jaccard ≥ 0.7.
    * |corpus| × 20 pairs, cheap; the index's banded path must reproduce
    * it verbatim (the dedup_minhash recall premise on this corpus). */
  val incrementalDedup: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM documents),
      |shingle AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) = 0 THEN []
      |         ELSE list_distinct(list_transform(range(1, len(t) - least(len(t), 3) + 2),
      |                i -> array_to_string(t[i:i + least(len(t), 3) - 1], ' ')))
      |    END AS s
      |  FROM toks),
      |inc0 AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |    text || ' graft planted near duplicate suffix' AS text
      |  FROM documents WHERE doc_id < 20),
      |itoks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM inc0),
      |ishingle AS (
      |  SELECT doc_id,
      |    CASE WHEN len(t) = 0 THEN []
      |         ELSE list_distinct(list_transform(range(1, len(t) - least(len(t), 3) + 2),
      |                i -> array_to_string(t[i:i + least(len(t), 3) - 1], ' ')))
      |    END AS s
      |  FROM itoks)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(len(list_intersect(a.s, b.s))::DOUBLE /
      |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
      |FROM shingle a JOIN ishingle b ON TRUE
      |WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
      |  AND len(list_intersect(a.s, b.s))::DOUBLE /
      |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
      |ORDER BY 1, 2""".stripMargin

  /** int8 round-trip — same affine code arithmetic, floor(x+0.5) rounding
    * (engine-portable, unlike round()'s half-even/half-up split). */
  val embeddingQuant: String =
    """WITH st AS (
      |  SELECT vec_id, embedding AS v,
      |    list_min(embedding)::DOUBLE AS mn,
      |    (list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE) / 255.0 AS sc
      |  FROM embeddings),
      |rec AS (
      |  SELECT vec_id, v, mn, sc,
      |    list_transform(v, x -> CASE WHEN sc = 0 THEN mn
      |      ELSE mn + least(greatest(floor((x::DOUBLE - mn) / sc + 0.5), 0), 255) * sc
      |      END) AS r
      |  FROM st),
      |err AS (
      |  SELECT vec_id,
      |    list_transform(range(1, len(v) + 1), i -> abs(v[i]::DOUBLE - r[i])) AS e
      |  FROM rec)
      |SELECT vec_id,
      |  round(list_sum(e) / len(e), 9) AS mae,
      |  round(list_max(e), 9) AS max_err
      |FROM err ORDER BY 1""".stripMargin

  /** Repetition profile — gram STRINGS here vs gram hashes Spark-side;
    * same normalization as the minhash CTE (the kernel's tokenizer), same
    * n-1 bigram definition with the <2-token zero rule. */
  val repetitionStats: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS g FROM toks),
      |tc AS (SELECT doc_id, g, count(*) AS c FROM tok GROUP BY 1, 2),
      |ta AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS n_distinct, max(c) AS top_c
      |  FROM tc GROUP BY 1),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1])) AS g
      |  FROM toks WHERE len(t) >= 2),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_big, max(c) AS top_b
      |  FROM bc GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(ta.n_tokens, 0) AS n_tokens,
      |  CASE WHEN coalesce(ta.n_tokens, 0) <= 0 THEN 0.0
      |       ELSE round(ta.n_distinct::DOUBLE / ta.n_tokens, 6) END AS ttr,
      |  CASE WHEN coalesce(ta.n_tokens, 0) <= 0 THEN 0.0
      |       ELSE round(ta.top_c::DOUBLE / ta.n_tokens, 6) END AS top_token_frac,
      |  CASE WHEN coalesce(ta.n_tokens, 0) < 2 THEN 0.0
      |       ELSE round(ba.top_b::DOUBLE / (ta.n_tokens - 1), 6) END AS top_bigram_frac
      |FROM documents d
      |LEFT JOIN ta USING (doc_id)
      |LEFT JOIN ba USING (doc_id)
      |ORDER BY 1""".stripMargin

  /** PII redaction — identical RE2 patterns and replacement order as
    * TextFunctions.redactPii over identically planted contact lines. */
  val piiRedaction: String =
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(
      |        text || ' contact user' || doc_id || '@example.com ip 10.0.' ||
      |          (doc_id % 256) || '.7 call +1-555-' || (doc_id + 1000),
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
      |    '\+?\d[\d-]{7,}\d', '[PHONE]', 'g') AS redacted
      |FROM documents WHERE doc_id < 100 ORDER BY 1""".stripMargin

  /** Brute-force char-trigram Jaccard over doc_id < 150 — mirrors
    * MinHashKernel's char mode exactly: ASCII lowercase, non-alnum runs →
    * one space, trim; window k = min(3, len) so short strings yield the
    * whole-string gram; DISTINCT trigram set. String-set Jaccard equals the
    * kernel's 64-bit-hash-set Jaccard barring a hash collision. */
  val ngramExact: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
      |norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
      |  FROM docs),
      |grams AS (
      |  SELECT doc_id,
      |    CASE WHEN len(s) = 0 THEN []
      |         WHEN len(s) <= 3 THEN [s]
      |         ELSE list_distinct(list_transform(range(1, len(s) - 1),
      |                i -> s[i:i + 2]))
      |    END AS g
      |  FROM norm),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.g, b.g)) AS inter,
      |    len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS unn
      |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(inter::DOUBLE / unn, 6) AS jaccard
      |FROM pairs
      |WHERE unn > 0 AND inter::DOUBLE / unn >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** dedup_ngram: BRUTE-FORCE trigram-Jaccard truth set over the PLANTED
    * corpus at threshold 0.6. The engine side runs the prefix-filtered
    * all-pairs join (Dedup.ngramJaccardJoin), whose candidate generation is
    * provably complete — so its output must equal this all-pairs
    * computation row-for-row, value-checking the canonical-order prefix
    * guarantee, the length filter, and the sorted-merge verification at
    * once. Same trigram semantics as ngram_exact (ASCII normalization,
    * whole-string gram for short texts, distinct set). */
  private val ngramPairsCte: String =
    """docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 500
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' graft planted near duplicate suffix'
      |  FROM documents WHERE doc_id < 20),
      |norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
      |  FROM docs),
      |grams AS (
      |  SELECT doc_id,
      |    CASE WHEN len(s) = 0 THEN []
      |         WHEN len(s) <= 3 THEN [s]
      |         ELSE list_distinct(list_transform(range(1, len(s) - 1),
      |                i -> s[i:i + 2]))
      |    END AS g
      |  FROM norm),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.g, b.g)) AS inter,
      |    len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS unn
      |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id),
      |npairs AS (
      |  SELECT id_a, id_b, round(inter::DOUBLE / unn, 6) AS jaccard
      |  FROM cand WHERE unn > 0 AND inter::DOUBLE / unn >= 0.6)""".stripMargin

  val dedupNgram: String =
    s"""WITH $ngramPairsCte
      |SELECT id_a, id_b, jaccard FROM npairs
      |ORDER BY 1, 2""".stripMargin

  /** dedup_ngram_clusters: connected components over the brute-force
    * J >= 0.6 trigram pair set via the recursive min-label closure (the
    * dedupKeeplist trick) — EVERY doc in the slice labeled, singletons
    * with themselves; cluster_id = component min id. The engine side's
    * auto facade routes to the exact prefix-filtered join at this
    * measured size, so its label frame equals this closure row-for-row. */
  val dedupNgramClusters: String =
    s"""WITH RECURSIVE $ngramPairsCte,
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM npairs
      |  UNION
      |  SELECT id_b AS src, id_a AS dst FROM npairs),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS lbl FROM docs
      |  UNION
      |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |labels AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
      |SELECT id AS doc_id, cluster_id FROM labels ORDER BY 1""".stripMargin

  /** BRUTE-FORCE portable-simhash truth set — reproduces every stage of
    * Dedup.simhashPairsPortable in SQL: per-token 60-bit hash = first 15 hex
    * chars of md5(token) (hex folded to BIGINT by position arithmetic, the
    * hashBucket trick), simhash bit p = 1 iff strictly more tokens (WITH
    * multiplicity) have hash bit p set than clear, pairs = Hamming ≤ 3 over
    * ALL (520×519/2) pairs. The Spark side's 4×16-bit chunk blocking is
    * pigeonhole-exact at this radius and its bucket cap cannot trigger at
    * oracle scale (max possible bucket = 520 docs < 1000 cap), so the
    * blocked output must equal this brute force row-for-row. */
  val dedupSimhash: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' graft planted near duplicate suffix'
      |  FROM documents WHERE doc_id < 20),
      |toks AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0)) AS tok
      |  FROM docs),
      |hashed AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(15), i ->
      |      CAST(strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT) + 1, 1)) - 1 AS BIGINT)
      |        * (CAST(1 AS BIGINT) << CAST(4 * (14 - i) AS INT)))) AS BIGINT) AS h
      |  FROM toks),
      |bits AS (
      |  SELECT doc_id, p, sum(CASE WHEN (h >> CAST(p AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM hashed CROSS JOIN (SELECT unnest(range(60)) AS p) ps
      |  GROUP BY 1, 2),
      |sim AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS sh
      |  FROM bits GROUP BY 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** Connected components over the brute-force pair set via a recursive
    * min-label closure; kept = each component's minimum id — the same
    * keep-one-representative semantics as Dedup.keepList. */
  val dedupKeeplist: String =
    s"""WITH RECURSIVE $minhashPairsCte,
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION
      |  SELECT id_b AS src, id_a AS dst FROM pairs),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS lbl FROM docs
      |  UNION
      |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |labels AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id)
      |SELECT id AS doc_id FROM labels WHERE id = cluster_id ORDER BY 1""".stripMargin

  /** Planted-jitter corpus: the jittered copy of vec v (id v + 1000000) is
    * x_i + sin(i + v + 1000000) * 0.02 per dimension, cast to float — the
    * exact construction PipelineQueries.embeddingsWithPlants performs. */
  private def plantedCosineCte(maxId: Int): String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $maxId),
      |jit AS (
      |  SELECT vec_id,
      |    list_transform(range(1, 65), i ->
      |      CAST(CAST(embedding[i] AS DOUBLE)
      |           + sin(CAST(i - 1 AS DOUBLE) + vec_id + 1000000) * 0.02 AS FLOAT)) AS je
      |  FROM e),
      |pc AS (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(jit.je[i] AS DOUBLE))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS nq,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(jit.je[i] AS DOUBLE) * CAST(jit.je[i] AS DOUBLE))) AS ne
      |  FROM e JOIN jit USING (vec_id))""".stripMargin

  /** Every planted embedding pair with its exact cosine: the organic corpus
    * has no pair above 0.98 (max ~0.51), and multi-probe recall over the
    * plants is 1, so the LSH pair output equals this set exactly. */
  val dedupEmbedding: String =
    s"""WITH ${plantedCosineCte(20)}
      |SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
      |  round(CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |             ELSE dot / (sqrt(nq) * sqrt(ne)) END, 6) AS cosine
      |FROM pc ORDER BY 1""".stripMargin

  /** Rank-1 LSH hit per query over the planted corpus: the plant (cosine
    * ~0.994) dominates every organic neighbor (<= ~0.51) and shares the
    * query's bucket or a 1-bit probe neighbor, so it must be the top hit. */
  val knnLsh: String =
    s"""WITH ${plantedCosineCte(10)}
      |SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
      |  round(CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |             ELSE dot / (sqrt(nq) * sqrt(ne)) END, 6) AS cosine,
      |  CAST(1 AS BIGINT) AS rank
      |FROM pc ORDER BY 1""".stripMargin

  val langId: String =
    """WITH base AS (
      |  SELECT doc_id, lang, text,
      |    list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                              t -> length(t) > 0)) AS toks
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(toks, t -> list_contains(
      |      ['the','a','an','and','or','but','of','to','in','on','at','is','are',
      |       'was','were','be','been','it','this','that','with','for','as','by',
      |       'from','not','no','so','if','then','than','too'], t))) AS s_en,
      |    len(list_filter(toks, t -> list_contains(
      |      ['der','die','das','und','oder','aber','von','zu','im','in','auf','ist',
      |       'sind','war','waren','sein','es','mit','für','als','aus','nicht','kein',
      |       'so','wenn','dann','ein','eine','den','dem'], t))) AS s_de,
      |    len(list_filter(toks, t -> list_contains(
      |      ['el','la','los','las','y','o','pero','de','a','en','es','son','era',
      |       'ser','con','para','por','como','no','si','un','una','del','al','que',
      |       'su','se','lo','más','este'], t))) AS s_es,
      |    len(list_filter(toks, t -> list_contains(
      |      ['le','la','les','et','ou','mais','de','à','en','est','sont','était',
      |       'être','avec','pour','par','comme','ne','pas','si','un','une','du',
      |       'au','que','qui','se','ce','plus','dans'], t))) AS s_fr,
      |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS s_zh
      |  FROM base)
      |SELECT doc_id, lang,
      |  CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) <= 0 THEN 'und'
      |       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'zh'
      |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
      |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
      |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
      |       ELSE 'de' END AS lang_pred
      |FROM scored ORDER BY doc_id""".stripMargin

  /** Works because the Spark cosine kernel and DuckDB's list_sum both
    * accumulate doubles sequentially left-to-right — bit-identical IEEE
    * results, so even the ranks agree. */
  val knnBruteforce: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      |  WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS ne
      |  FROM q, embeddings e WHERE q.query_id <> e.vec_id),
      |sim AS (
      |  SELECT query_id, neighbor_id,
      |    CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |         ELSE dot / (sqrt(nq) * sqrt(ne)) END AS raw_cosine
      |  FROM scored),
      |ranked AS (
      |  SELECT query_id, neighbor_id, raw_cosine,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY raw_cosine DESC, neighbor_id ASC) AS rank
      |  FROM sim)
      |SELECT query_id, neighbor_id, round(raw_cosine, 6) AS cosine, rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** One full Lloyd round of k-means in SQL, parameterized by a `corpus`
    * CTE exposing (id, v): id-ordered prefix init, round-9 squared-L2
    * argmin with lower-cell tie-break, per-(cell, dimension) means over
    * 1e-6-quantized components with EXACT integer sums (summation-order
    * independent — a plain double avg can cross a round-9 boundary
    * between engines; an empty cell keeps its centroid), reassignment.
    * Mirrors `Clustering.kmeansFit/kmeansAssign` step for step. */
  private def kmeansCte(k: Int): String =
    s"""init AS (
      |  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INTEGER) AS cell,
      |         list_transform(v, x -> CAST(x AS DOUBLE)) AS cvec
      |  FROM (SELECT id, v FROM corpus ORDER BY id LIMIT $k)),
      |d0 AS (
      |  SELECT c.id, i.cell,
      |    round(list_sum(list_transform(range(1, 65),
      |      j -> (CAST(c.v[j] AS DOUBLE) - i.cvec[j])
      |         * (CAST(c.v[j] AS DOUBLE) - i.cvec[j]))), 9) AS d
      |  FROM corpus c CROSS JOIN init i),
      |a0 AS (
      |  SELECT id, cell FROM (
      |    SELECT id, cell,
      |      row_number() OVER (PARTITION BY id ORDER BY d, cell) AS rn
      |    FROM d0) WHERE rn = 1),
      |mem AS (
      |  SELECT a0.cell, unnest(range(1, 65)) AS pos,
      |         unnest(list_transform(c.v, x -> CAST(x AS DOUBLE))) AS x
      |  FROM a0 JOIN corpus c USING (id)),
      |means AS (
      |  SELECT cell, pos,
      |    round(CAST(CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
      |        AS BIGINT) AS DOUBLE) / (count(*) * 1000000.0), 9) AS m
      |  FROM mem GROUP BY 1, 2),
      |newc AS (
      |  SELECT i.cell,
      |    CASE WHEN count(m.m) = 0 THEN any_value(i.cvec)
      |         ELSE list(m.m ORDER BY m.pos) END AS cvec
      |  FROM init i LEFT JOIN means m ON i.cell = m.cell
      |  GROUP BY i.cell),
      |d1 AS (
      |  SELECT c.id, n.cell,
      |    round(list_sum(list_transform(range(1, 65),
      |      j -> (CAST(c.v[j] AS DOUBLE) - n.cvec[j])
      |         * (CAST(c.v[j] AS DOUBLE) - n.cvec[j]))), 9) AS d
      |  FROM corpus c CROSS JOIN newc n),
      |a1 AS (
      |  SELECT id, cell, d FROM (
      |    SELECT id, cell, d,
      |      row_number() OVER (PARTITION BY id ORDER BY d, cell) AS rn
      |    FROM d1) WHERE rn = 1)""".stripMargin

  val kmeansAssign: String =
    s"""WITH corpus AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
      |${kmeansCte(8)}
      |SELECT id AS vec_id, cell, round(d, 6) AS dist2
      |FROM a1 ORDER BY vec_id""".stripMargin

  /** embedding_outliers: the kmeans chain over the planted corpus (×30
    * copies + one ×1000 extreme), then the two-rule flag — tiny cells
    * (< 8 members) wholesale, plus the robust per-cell far cutoff
    * (median + 3×(p90−median) of round-6 dist2; quantile_disc ≡ the KLL
    * aggregate's exact regime — discrete, no interpolation, strict >). */
  val embeddingOutliers: String =
    s"""WITH corpus AS (
      |  SELECT vec_id AS id, embedding AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 2000000 AS id,
      |    list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE) * 30.0 AS FLOAT)) AS v
      |  FROM embeddings WHERE vec_id < 5
      |  UNION ALL
      |  SELECT vec_id + 3000000 AS id,
      |    list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE) * 1000.0 AS FLOAT)) AS v
      |  FROM embeddings WHERE vec_id < 1),
      |${kmeansCte(8)},
      |assign AS (SELECT id, cell, round(d, 6) AS dist2 FROM a1),
      |th AS (
      |  SELECT cell, quantile_disc(dist2, 0.5) AS p50,
      |         quantile_disc(dist2, 0.9) AS p90,
      |         count(*) AS n_cell
      |  FROM assign GROUP BY cell),
      |flagged AS (
      |  SELECT a.id AS vec_id, a.cell, a.dist2,
      |    round(t.p50 + 3.0 * (t.p90 - t.p50), 6) AS cutoff,
      |    CASE WHEN t.n_cell < 8 THEN 'tiny_cell'
      |         WHEN a.dist2 > round(t.p50 + 3.0 * (t.p90 - t.p50), 6)
      |           THEN 'far' END AS reason
      |  FROM assign a JOIN th t ON a.cell = t.cell)
      |SELECT vec_id, cell, dist2, cutoff, reason
      |FROM flagged WHERE reason IS NOT NULL
      |ORDER BY vec_id""".stripMargin

  /** c4_rules: the C4 line/page filter replayed over the same constructed
    * shell — trimmed non-blank lines, kept = terminal punctuation AND ≥ 5
    * regex-split words AND no 'javascript'; page rules lorem/brace/
    * min-kept; clean_text re-joins kept lines for kept pages. */
  val c4Rules: String =
    """WITH shell AS (
      |  SELECT doc_id,
      |    text || '.' || chr(10) || 'short line' || chr(10)
      |    || 'Enable javascript to view doc ' || CAST(doc_id AS VARCHAR) || '.'
      |    || chr(10) || 'This page has plenty of good words in it.'
      |    || (CASE WHEN doc_id % 7 = 0
      |             THEN chr(10) || 'more filler lorem ipsum text sits here.'
      |             ELSE '' END)
      |    || (CASE WHEN doc_id % 11 = 0
      |             THEN chr(10) || 'if (x) { call(); }'
      |             ELSE '' END) AS page
      |  FROM documents),
      |l AS (
      |  SELECT doc_id, page,
      |    list_filter(list_transform(string_split(page, chr(10)),
      |                             x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
      |                x -> len(x) > 0) AS lines
      |  FROM shell),
      |k AS (
      |  SELECT doc_id, page, lines,
      |    list_filter(lines, x -> regexp_matches(x, '[.!?"]$')
      |      AND len(regexp_split_to_array(x, '\s+')) >= 5
      |      AND NOT contains(lower(x), 'javascript')) AS kept
      |  FROM l)
      |SELECT doc_id,
      |  CAST(len(lines) AS BIGINT) AS n_lines,
      |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
      |  contains(lower(page), 'lorem ipsum') AS has_lorem,
      |  contains(page, '{') AS has_brace,
      |  (NOT contains(lower(page), 'lorem ipsum')) AND (NOT contains(page, '{'))
      |    AND len(kept) >= 2 AS keep,
      |  CASE WHEN (NOT contains(lower(page), 'lorem ipsum'))
      |         AND (NOT contains(page, '{')) AND len(kept) >= 2
      |       THEN array_to_string(kept, chr(10)) ELSE '' END AS clean_text
      |FROM k ORDER BY doc_id""".stripMargin

  /** corpus_pipeline_v2: the round-11 curation chain replayed as ONE CTE
    * pipeline — the c4_rules shell + line/page filter, keep-min dedup on
    * the normalized clean_text md5, the quality/token expressions over the
    * SURVIVING clean_text, the single-window 3000-token budget fill, and
    * the seed-7 4-shard training order over the kept set. */
  val corpusPipelineV2: String =
    """WITH shell AS (
      |  SELECT doc_id,
      |    text || '.' || chr(10) || 'short line' || chr(10)
      |    || 'Enable javascript to view doc ' || CAST(doc_id AS VARCHAR) || '.'
      |    || chr(10) || 'This page has plenty of good words in it.'
      |    || (CASE WHEN doc_id % 7 = 0
      |             THEN chr(10) || 'more filler lorem ipsum text sits here.'
      |             ELSE '' END)
      |    || (CASE WHEN doc_id % 11 = 0
      |             THEN chr(10) || 'if (x) { call(); }'
      |             ELSE '' END) AS page
      |  FROM documents),
      |lv AS (
      |  SELECT doc_id, page,
      |    list_filter(list_transform(string_split(page, chr(10)),
      |                             x -> regexp_replace(x, '^\s+|\s+$', '', 'g')),
      |                x -> len(x) > 0) AS lines
      |  FROM shell),
      |kv AS (
      |  SELECT doc_id, page,
      |    list_filter(lines, x -> regexp_matches(x, '[.!?"]$')
      |      AND len(regexp_split_to_array(x, '\s+')) >= 5
      |      AND NOT contains(lower(x), 'javascript')) AS kept
      |  FROM lv),
      |cleaned AS (
      |  SELECT doc_id, array_to_string(kept, chr(10)) AS ct
      |  FROM kv
      |  WHERE (NOT contains(lower(page), 'lorem ipsum'))
      |    AND (NOT contains(page, '{')) AND len(kept) >= 2),
      |keepers AS (
      |  SELECT min(doc_id) AS doc_id FROM (
      |    SELECT doc_id,
      |      md5(trim(regexp_replace(lower(ct), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |    FROM cleaned)
      |  GROUP BY fp),
      |base2 AS (
      |  SELECT c.doc_id, c.ct AS text,
      |    list_filter(regexp_split_to_array(trim(c.ct), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(c.ct)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(c.ct) - length(regexp_replace(c.ct, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM cleaned c JOIN keepers USING (doc_id)),
      |c2 AS (
      |  SELECT doc_id,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(toks) END AS n_tokens
      |  FROM base2),
      |q2 AS (
      |  SELECT doc_id,
      |    round(len_score * 0.3
      |      + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + punct_score * 0.25
      |      + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) AS quality,
      |    n_tokens
      |  FROM c2),
      |winv AS (
      |  SELECT doc_id, quality, n_tokens,
      |    sum(CAST(n_tokens AS BIGINT)) OVER (
      |      ORDER BY quality DESC, md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM q2),
      |filled AS (
      |  SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      |  FROM winv WHERE cum_tokens <= 3000),
      |hv AS (
      |  SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS hx FROM filled),
      |sv AS (
      |  SELECT doc_id, hx,
      |    CAST((((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) * 16
      |      + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)) * 16
      |      + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) AS BIGINT)
      |      % 4 AS shard
      |  FROM hv),
      |ordered AS (
      |  SELECT doc_id, shard,
      |    CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
      |      AS BIGINT) AS pos
      |  FROM sv)
      |SELECT f.doc_id, f.quality, f.n_tokens, f.cum_tokens, o.shard, o.pos
      |FROM filled f JOIN ordered o USING (doc_id)
      |ORDER BY f.doc_id""".stripMargin

  /** quality_budget: the quality-ranked budget fill replayed as the
    * SINGLE-window formulation — the engine's relational two-phase offsets
    * (per-(score, md5-bucket) totals + distinct-score window) must equal
    * this exactly; order (quality DESC, md5(id) ASC, id ASC), running sum
    * capped at 2000 tokens. Quality/token expressions shared with the
    * quality_scores / token_stats oracles. */
  val qualityBudget: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(toks) END AS n_tokens
      |  FROM base),
      |q AS (
      |  SELECT doc_id,
      |    round(len_score * 0.3
      |      + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + punct_score * 0.25
      |      + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) AS quality,
      |    n_tokens
      |  FROM c),
      |win AS (
      |  SELECT doc_id, quality, n_tokens,
      |    sum(CAST(n_tokens AS BIGINT)) OVER (
      |      ORDER BY quality DESC, md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |  FROM q)
      |SELECT doc_id, quality, n_tokens,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM win WHERE cum_tokens <= 2000 ORDER BY doc_id""".stripMargin

  /** cm_freq: the Count-Min build + point estimates replayed — slot =
    * md5('42:row:token')[0:8] mod 64 via the 8-digit Horner chain, counts
    * per (row, slot), est = min over rows with absent slots zero, beside
    * the exact counts. */
  val cmFreq: String = {
    val slot = (tokExpr: String) =>
      s"CAST(${md5Chain(s"md5('42:' || CAST(r.r AS VARCHAR) || ':' || $tokExpr)", 8)} AS BIGINT) % 64"
    s"""WITH toks AS (
      |  SELECT unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    t -> len(t) > 0)) AS t
      |  FROM documents),
      |exact AS (
      |  SELECT t AS token, CAST(count(*) AS BIGINT) AS true_count
      |  FROM toks GROUP BY 1),
      |cells AS (
      |  SELECT r.r AS row, ${slot("t")} AS slot
      |  FROM toks, (SELECT unnest(range(0, 3)) AS r) r),
      |sk AS (
      |  SELECT row, slot, CAST(count(*) AS BIGINT) AS cnt
      |  FROM cells GROUP BY 1, 2),
      |probes AS (
      |  SELECT e.token, r.r AS row, ${slot("e.token")} AS slot
      |  FROM exact e, (SELECT unnest(range(0, 3)) AS r) r),
      |est AS (
      |  SELECT p.token, min(COALESCE(s.cnt, 0)) AS est
      |  FROM probes p LEFT JOIN sk s ON s.row = p.row AND s.slot = p.slot
      |  GROUP BY 1)
      |SELECT e2.token, est.est, e2.true_count
      |FROM est JOIN exact e2 USING (token) ORDER BY token""".stripMargin
  }

  /** weighted_sample: the A-ES draw replayed — u from the 8-digit md5
    * Horner chain over '42:doc_id', skey = round(ln(u)/weight, 9), top-100
    * by (skey DESC, doc_id ASC). */
  val weightedSample: String =
    s"""WITH wdraw AS (
      |  SELECT doc_id, CAST(n_chars + 1 AS DOUBLE) AS weight,
      |    round(ln((CAST(${md5Chain("md5('42:' || CAST(doc_id AS VARCHAR))", 8)} AS DOUBLE) + 0.5)
      |      / 4294967296.0) / CAST(n_chars + 1 AS DOUBLE), 9) AS skey
      |  FROM documents)
      |SELECT doc_id, weight, skey FROM wdraw
      |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin

  /** diverse_sample: the kmeans chain over the raw embeddings, then every
    * cell capped at 25 rows in the same 2-hex-digit md5-priority order as
    * source_quota. */
  val diverseSample: String =
    s"""WITH corpus AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
      |${kmeansCte(8)},
      |assign AS (SELECT id AS vec_id, cell, round(d, 6) AS dist2 FROM a1),
      |ranked AS (
      |  SELECT vec_id, cell, dist2,
      |    CAST(row_number() OVER (PARTITION BY cell ORDER BY
      |      (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1) ASC,
      |      vec_id ASC) AS BIGINT) AS priority
      |  FROM assign)
      |SELECT vec_id, cell, dist2, priority FROM ranked
      |WHERE priority <= 25 ORDER BY vec_id""".stripMargin

  /** semantic_dedup: the same Lloyd round over the planted corpus, then
    * all within-cell pairs with round-6 cosine >= 0.95, lower id kept. */
  val semanticDedup: String =
    s"""WITH jit2 AS (
      |  SELECT vec_id,
      |    list_transform(range(1, 65), i ->
      |      CAST(CAST(embedding[i] AS DOUBLE)
      |           + sin(CAST(i - 1 AS DOUBLE) + vec_id + 1000000) * 0.02 AS FLOAT)) AS je
      |  FROM embeddings WHERE vec_id < 20),
      |corpus AS (
      |  -- bounded contract slice (vec_id < 2000 = the full corpus at every
      |  -- oracle-gate SF; clamps the by-design-quadratic fixed-k pin at
      |  -- sf1/sf10) — mirrors the Spark side's predicate exactly
      |  SELECT vec_id AS id, embedding AS v FROM embeddings
      |  WHERE vec_id < 2000
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS id, je AS v FROM jit2),
      |${kmeansCte(8)},
      |wc AS (
      |  SELECT c.id, c.v, a1.cell FROM corpus c JOIN a1 ON c.id = a1.id),
      |joined AS (
      |  SELECT l.cell, l.id AS kept_id, r.id AS dropped_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(l.v[i] AS DOUBLE) * CAST(r.v[i] AS DOUBLE))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(l.v[i] AS DOUBLE) * CAST(l.v[i] AS DOUBLE))) AS nq,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(r.v[i] AS DOUBLE) * CAST(r.v[i] AS DOUBLE))) AS ne
      |  FROM wc l JOIN wc r ON l.cell = r.cell AND l.id < r.id),
      |sim AS (
      |  SELECT cell, kept_id, dropped_id,
      |    round(CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |               ELSE dot / (sqrt(nq) * sqrt(ne)) END, 6) AS cosine
      |  FROM joined)
      |SELECT cell, kept_id, dropped_id, cosine
      |FROM sim WHERE cosine >= 0.95
      |ORDER BY kept_id, dropped_id""".stripMargin

  /** knn_filtered: knn_bruteforce's oracle with the label-equality filter
    * applied at candidate generation (same slice the equi-join scores). */
  val knnFiltered: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qe, label FROM embeddings
      |  WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS ne
      |  FROM q, embeddings e
      |  WHERE q.query_id <> e.vec_id AND q.label = e.label),
      |sim AS (
      |  SELECT query_id, neighbor_id,
      |    CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |         ELSE dot / (sqrt(nq) * sqrt(ne)) END AS raw_cosine
      |  FROM scored),
      |ranked AS (
      |  SELECT query_id, neighbor_id, raw_cosine,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY raw_cosine DESC, neighbor_id ASC) AS rank
      |  FROM sim)
      |SELECT query_id, neighbor_id, round(raw_cosine, 6) AS cosine, rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val eventsJson: String =
    """SELECT
      |  CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0)
      |    AS BIGINT) AS k_bucket,
      |  count(*) AS cnt,
      |  round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Native DuckDB ASOF LEFT JOIN verifies AsOfJoin.asofBackward's whole
    * contract: backward-inclusive match, per-(user, ts) deterministic
    * tie-break via the same max/arg_max pre-reduction. */
  val asofJoin: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, max(event_id) AS evt,
      |    arg_max(value, event_id) AS val
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT event_id, ts, user_id FROM events
      |      WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, c.evt AS asof_event_id,
      |  round(c.val, 6) AS asof_value
      |FROM p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  val leftJoinAgg: String =
    """SELECT c_custkey,
      |  count(o_orderkey) AS n_orders,
      |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val rollupAgg: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  val distinctCounts: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val pricePercentiles: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val userSessions: String =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
      |  count(*) AS n_events,
      |  round(sum(value), 4) AS value_sum
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start_epoch""".stripMargin

  val eventsHourly: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
      |  event_type, count(*) AS cnt,
      |  round(sum(value), 4) AS value_sum
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** heavy_hitters runs Misra–Gries in its exact regime (vocab ≤ k), where
    * the summary provably equals plain token counts — same tokenizer and
    * ranking as vocab_topk, top 10. */
  val heavyHitters: String =
    """SELECT token, count(*) AS cnt FROM (
      |  SELECT unnest(list_filter(
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    x -> len(x) > 0)) AS token
      |  FROM documents)
      |GROUP BY 1 ORDER BY cnt DESC, token ASC LIMIT 10""".stripMargin

  /** range_join_events: DuckDB derives the same min-anchored staggered
    * windows and joins with a plain BETWEEN — the bucketized operator must
    * value-match the naive formulation. Spark's timestamp→long cast
    * truncates, so floor(epoch(ts)) on this side. */
  val rangeJoinEvents: String =
    """WITH pts AS (
      |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
      |base AS (SELECT min(ep) AS b FROM pts),
      |wins AS (
      |  SELECT i AS window_id, b + i * 7919 AS w_lo, b + i * 7919 + 12347 AS w_hi
      |  FROM base, range(0, 20) t(i))
      |SELECT window_id, count(*) AS n_events,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum
      |FROM pts JOIN wins ON pts.ep BETWEEN w_lo AND w_hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** quantile_sketch runs the KLL sketch in its exact regime (k above every
    * group's row count ⇒ no compaction ⇒ provably ≡ `quantile_disc`), so
    * the oracle needs no sketch arithmetic — same split as distinct_sketch
    * and heavy_hitters. */
  val quantileSketch: String =
    """SELECT lang,
      |  CAST(quantile_disc(CAST(n_chars AS DOUBLE), 0.25) AS DOUBLE) AS q25,
      |  CAST(quantile_disc(CAST(n_chars AS DOUBLE), 0.50) AS DOUBLE) AS q50,
      |  CAST(quantile_disc(CAST(n_chars AS DOUBLE), 0.75) AS DOUBLE) AS q75,
      |  count(*) AS n_rows
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** interval_overlap_events: DuckDB derives the same per-user daily spans
    * and maintenance windows and joins with the plain overlap predicate —
    * the bucketized+meet-bucket-deduped operator must value-match it.
    * Integer `//` matches Spark's floor() here because ep ≥ b. The SUM is
    * cast (DuckDB types integer sums HUGEINT, which the driver's
    * arrow/pandas lowering hashes differently — the range_join_events r7
    * lesson, now also machine-checked by tools/oracle_check.py). */
  val intervalOverlapEvents: String =
    """WITH pts AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
      |base AS (SELECT min(ep) AS b FROM pts),
      |spans AS (
      |  SELECT user_id, (ep - b) // 86400 AS day,
      |         min(ep) AS s_lo, max(ep) AS s_hi
      |  FROM pts, base GROUP BY 1, 2),
      |wins AS (
      |  SELECT i AS window_id, b + i * 131071 AS w_lo,
      |         b + i * 131071 + 65537 AS w_hi
      |  FROM base, range(0, 20) t(i))
      |SELECT window_id, count(*) AS n_spans,
      |  CAST(sum(user_id) AS BIGINT) AS uid_sum
      |FROM spans JOIN wins ON s_lo <= w_hi AND w_lo <= s_hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** repeated_spans: DuckDB recomputes the full winnowing scheme (k=8
    * char shingles via a range-table explode — this DuckDB build lacks
    * lateral column args to generate_series — md5 hashes, min over each
    * w=4 window as a frame window function, distinct per doc, df ≥ 2).
    * md5-hex minima are byte-identical across engines, so the whole
    * fingerprint pipeline is value-checked, not just counted. The
    * `m < 4` UNION arm covers texts with fewer shingles than one window
    * (absent at both sfs — min doc length 44 — but the operator handles
    * it, so the oracle must too). The range table caps shingle start
    * positions at 5000 (`range` rejects subquery bounds in this DuckDB
    * build); any doc longer than 5007 chars would silently lose tail
    * fingerprints on the oracle side only, so a guard arm emits a loud
    * sentinel row the moment the fixture outgrows the cap — a named
    * hash-mismatch beats a quiet divergence that reads as an engine bug. */
  /** Per-doc DISTINCT winnowing fingerprints (k=8, w=4) as a reusable CTE
    * chain ending in `fps(doc_id, fp)` — shared by repeated_spans and
    * span_similarity. Same 5000-position cap as always; consumers must
    * carry the sentinel guard. */
  private val winnowFpsCte: String =
    """s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i, md5(substr(d.text, s.i, 8)) AS h,
      |         length(d.text) - 7 AS m
      |  FROM documents d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id,
      |         min(h) OVER (PARTITION BY doc_id ORDER BY i
      |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
      |         i, m
      |  FROM g),
      |fps AS (
      |  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, min(h) AS fp FROM g WHERE m < 4 GROUP BY doc_id)""".stripMargin

  val repeatedSpans: String =
    s"""WITH $winnowFpsCte
      |SELECT * FROM (
      |  SELECT fp, CAST(count(*) AS BIGINT) AS df, min(doc_id) AS first_doc
      |  FROM fps GROUP BY fp HAVING count(*) >= 2
      |  UNION ALL
      |  SELECT 'ORACLE_SHINGLE_CAP_EXCEEDED', CAST(-1 AS BIGINT),
      |         CAST(-1 AS BIGINT)
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY fp""".stripMargin

  /** span_similarity: exact shared-winnow-fingerprint containment — fps
    * with df > 50 dropped as boilerplate from BOTH sides of the ratio,
    * pairs need >= 3 shared, sim = shared / min(|A|, |B|) over surviving
    * sets, round-6 (identical docs score exactly 1.0). Same cap sentinel
    * as repeated_spans (impossible ids flag a truncated fp set). */
  val spanSimilarity: String =
    s"""WITH $winnowFpsCte,
      |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
      |sel AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep USING (fp)),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
      |          FROM sel GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         CAST(count(*) AS BIGINT) AS shared
      |  FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT * FROM (
      |  SELECT p.id_a, p.id_b, p.shared,
      |    round(CAST(p.shared AS DOUBLE) / least(sa.nfp, sb.nfp), 6) AS sim
      |  FROM pairs p
      |  JOIN sizes sa ON p.id_a = sa.doc_id
      |  JOIN sizes sb ON p.id_b = sb.doc_id
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
      |         -1.0
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY id_a, id_b""".stripMargin

  /** boilerplate_spans: full recomputation of winnow-position span
    * reconstruction. Window-minimum SELECTION WITH POSITION uses the
    * fixed-width string-min trick: `md5hex || '|' || lpad(pos, 10, '0')`
    * compares hex first (32 chars, fixed width) then position — exactly
    * the kernel's earliest-position-on-tie deque rule. Then distinct-doc
    * df >= 25 filters shared fingerprints, and a gaps-and-islands pass
    * unions each doc's [pos, pos+8) marks into maximal intervals (k >= w
    * makes in-run marks overlap, so plain union suffices). Sentinel row
    * fires if any doc outgrows the 5000-position shingle cap (same guard
    * as repeated_spans). */
  val boilerplateSpans: String =
    """WITH s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i,
      |         md5(substr(d.text, s.i, 8)) || '|' ||
      |           lpad(CAST(s.i AS VARCHAR), 10, '0') AS hk,
      |         length(d.text) - 7 AS m
      |  FROM documents d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id, i, m,
      |         min(hk) OVER (PARTITION BY doc_id ORDER BY i
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
      |  FROM g),
      |selected AS (
      |  SELECT DISTINCT doc_id, substr(key, 1, 32) AS fp,
      |         CAST(substr(key, 34) AS BIGINT) AS pos
      |  FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, substr(min(hk), 1, 32) AS fp,
      |         CAST(substr(min(hk), 34) AS BIGINT) AS pos
      |  FROM g WHERE m < 4 GROUP BY doc_id),
      |shared AS (
      |  SELECT fp FROM (
      |    SELECT fp, count(DISTINCT doc_id) AS df FROM selected GROUP BY fp)
      |  WHERE df >= 25),
      |sel AS (
      |  SELECT DISTINCT t.doc_id, t.pos
      |  FROM selected t JOIN shared USING (fp)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        CAST(-1 AS BIGINT))
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sel),
      |isl2 AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl)
      |SELECT * FROM (
      |  SELECT doc_id, min(pos) AS span_start,
      |         CAST(max(pos) + 8 AS BIGINT) AS span_end
      |  FROM isl2 GROUP BY doc_id, island
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY doc_id, span_start""".stripMargin

  /** strip_boilerplate: [[boilerplateSpans]]' span-detection CTE chain
    * extended with the interval-fold strip — kept segments are the
    * complement intervals of each doc's merged spans (`lag(span_end)` to
    * previous-span-end, plus a tail segment from the last span to EOT),
    * reassembled in position order by an ordered `string_agg`. Docs with
    * no shared spans pass through on the left join, mirroring the Spark
    * side's left-join passthrough. Same cap sentinel as the spans oracle
    * (the strip arm would silently truncate past position 5007 too). */
  val stripBoilerplate: String =
    """WITH s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i,
      |         md5(substr(d.text, s.i, 8)) || '|' ||
      |           lpad(CAST(s.i AS VARCHAR), 10, '0') AS hk,
      |         length(d.text) - 7 AS m
      |  FROM documents d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id, i, m,
      |         min(hk) OVER (PARTITION BY doc_id ORDER BY i
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
      |  FROM g),
      |selected AS (
      |  SELECT DISTINCT doc_id, substr(key, 1, 32) AS fp,
      |         CAST(substr(key, 34) AS BIGINT) AS pos
      |  FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, substr(min(hk), 1, 32) AS fp,
      |         CAST(substr(min(hk), 34) AS BIGINT) AS pos
      |  FROM g WHERE m < 4 GROUP BY doc_id),
      |shared AS (
      |  SELECT fp FROM (
      |    SELECT fp, count(DISTINCT doc_id) AS df FROM selected GROUP BY fp)
      |  WHERE df >= 25),
      |sel AS (
      |  SELECT DISTINCT t.doc_id, t.pos
      |  FROM selected t JOIN shared USING (fp)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        CAST(-1 AS BIGINT))
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sel),
      |isl2 AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, min(pos) AS span_start,
      |         CAST(max(pos) + 8 AS BIGINT) AS span_end
      |  FROM isl2 GROUP BY doc_id, island),
      |segs AS (
      |  SELECT doc_id,
      |         coalesce(lag(span_end) OVER (PARTITION BY doc_id
      |                                      ORDER BY span_start),
      |                  CAST(1 AS BIGINT)) AS a,
      |         span_start AS b
      |  FROM spans
      |  UNION ALL
      |  SELECT doc_id, max(span_end) AS a, NULL AS b FROM spans GROUP BY doc_id),
      |stripped AS (
      |  SELECT sg.doc_id,
      |         string_agg(substr(d.text, sg.a,
      |                           coalesce(sg.b, length(d.text) + 1) - sg.a),
      |                    '' ORDER BY sg.a) AS text
      |  FROM segs sg JOIN documents d USING (doc_id)
      |  GROUP BY sg.doc_id)
      |SELECT * FROM (
      |  SELECT d.doc_id, coalesce(st.text, d.text) AS text
      |  FROM documents d LEFT JOIN stripped st USING (doc_id)
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), 'ORACLE_SHINGLE_CAP_EXCEEDED'
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY doc_id""".stripMargin

  /** duplicate_spans: the [[boilerplateSpans]] winnow-selection CTE chain
    * with the dedup keeper rule in place of the df >= minDocs filter — a
    * fingerprint duplicated across >= 2 distinct docs assigns keeper =
    * min(doc_id), and only NON-keeper positions mark spans (the keeper
    * retains its copy). Value-checks span bounds AND keeper assignment.
    * Same 5000-position cap sentinel as the spans oracle. */
  val duplicateSpans: String =
    """WITH s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i,
      |         md5(substr(d.text, s.i, 8)) || '|' ||
      |           lpad(CAST(s.i AS VARCHAR), 10, '0') AS hk,
      |         length(d.text) - 7 AS m
      |  FROM documents d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id, i, m,
      |         min(hk) OVER (PARTITION BY doc_id ORDER BY i
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
      |  FROM g),
      |selected AS (
      |  SELECT DISTINCT doc_id, substr(key, 1, 32) AS fp,
      |         CAST(substr(key, 34) AS BIGINT) AS pos
      |  FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, substr(min(hk), 1, 32) AS fp,
      |         CAST(substr(min(hk), 34) AS BIGINT) AS pos
      |  FROM g WHERE m < 4 GROUP BY doc_id),
      |keepers AS (
      |  SELECT fp, min(doc_id) AS keeper
      |  FROM selected GROUP BY fp
      |  HAVING count(DISTINCT doc_id) >= 2),
      |sel AS (
      |  SELECT DISTINCT t.doc_id, t.pos
      |  FROM selected t JOIN keepers kp USING (fp)
      |  WHERE t.doc_id <> kp.keeper),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        CAST(-1 AS BIGINT))
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sel),
      |isl2 AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl)
      |SELECT * FROM (
      |  SELECT doc_id, min(pos) AS span_start,
      |         CAST(max(pos) + 8 AS BIGINT) AS span_end
      |  FROM isl2 GROUP BY doc_id, island
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY doc_id, span_start""".stripMargin

  /** dedup_substring: [[duplicateSpans]]' keeper-ruled span chain extended
    * with the complement-interval fold of [[stripBoilerplate]] — the
    * deduplicated text bytes of every doc, keeper copies intact. */
  val dedupSubstring: String =
    """WITH s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i,
      |         md5(substr(d.text, s.i, 8)) || '|' ||
      |           lpad(CAST(s.i AS VARCHAR), 10, '0') AS hk,
      |         length(d.text) - 7 AS m
      |  FROM documents d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id, i, m,
      |         min(hk) OVER (PARTITION BY doc_id ORDER BY i
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
      |  FROM g),
      |selected AS (
      |  SELECT DISTINCT doc_id, substr(key, 1, 32) AS fp,
      |         CAST(substr(key, 34) AS BIGINT) AS pos
      |  FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, substr(min(hk), 1, 32) AS fp,
      |         CAST(substr(min(hk), 34) AS BIGINT) AS pos
      |  FROM g WHERE m < 4 GROUP BY doc_id),
      |keepers AS (
      |  SELECT fp, min(doc_id) AS keeper
      |  FROM selected GROUP BY fp
      |  HAVING count(DISTINCT doc_id) >= 2),
      |sel AS (
      |  SELECT DISTINCT t.doc_id, t.pos
      |  FROM selected t JOIN keepers kp USING (fp)
      |  WHERE t.doc_id <> kp.keeper),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        CAST(-1 AS BIGINT))
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sel),
      |isl2 AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, min(pos) AS span_start,
      |         CAST(max(pos) + 8 AS BIGINT) AS span_end
      |  FROM isl2 GROUP BY doc_id, island),
      |segs AS (
      |  SELECT doc_id,
      |         coalesce(lag(span_end) OVER (PARTITION BY doc_id
      |                                      ORDER BY span_start),
      |                  CAST(1 AS BIGINT)) AS a,
      |         span_start AS b
      |  FROM spans
      |  UNION ALL
      |  SELECT doc_id, max(span_end) AS a, NULL AS b FROM spans GROUP BY doc_id),
      |stripped AS (
      |  SELECT sg.doc_id,
      |         string_agg(substr(d.text, sg.a,
      |                           coalesce(sg.b, length(d.text) + 1) - sg.a),
      |                    '' ORDER BY sg.a) AS text
      |  FROM segs sg JOIN documents d USING (doc_id)
      |  GROUP BY sg.doc_id)
      |SELECT * FROM (
      |  SELECT d.doc_id, coalesce(st.text, d.text) AS text
      |  FROM documents d LEFT JOIN stripped st USING (doc_id)
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), 'ORACLE_SHINGLE_CAP_EXCEEDED'
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY doc_id""".stripMargin

  /** corpus_pipeline: the five stage CTE chains composed end-to-end —
    * (1) NFC normalize, (2) the [[stripBoilerplate]] winnow-span strip on
    * the normalized text, (3) exact dedup keeping min doc_id per
    * normalized-text md5 fingerprint (the [[dedupExact]]/fingerprint_md5
    * math), (4) the [[qualityScores]] composite >= 0.3, (5) the
    * [[chunkPlan]] context-window split at window=64. Every stage is
    * already value-oracled on its own contract entry; this oracle proves
    * the COMPOSITION — each stage consuming the previous stage's output,
    * not the base table — matches the Spark side's chained lazy plan. */
  val corpusPipeline: String =
    """WITH docs AS (
      |  SELECT doc_id, nfc_normalize(text) AS text FROM documents),
      |s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i,
      |         md5(substr(d.text, s.i, 8)) || '|' ||
      |           lpad(CAST(s.i AS VARCHAR), 10, '0') AS hk,
      |         length(d.text) - 7 AS m
      |  FROM docs d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id, i, m,
      |         min(hk) OVER (PARTITION BY doc_id ORDER BY i
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
      |  FROM g),
      |selected AS (
      |  SELECT DISTINCT doc_id, substr(key, 1, 32) AS fp,
      |         CAST(substr(key, 34) AS BIGINT) AS pos
      |  FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, substr(min(hk), 1, 32) AS fp,
      |         CAST(substr(min(hk), 34) AS BIGINT) AS pos
      |  FROM g WHERE m < 4 GROUP BY doc_id),
      |shared AS (
      |  SELECT fp FROM (
      |    SELECT fp, count(DISTINCT doc_id) AS df FROM selected GROUP BY fp)
      |  WHERE df >= 25),
      |sel AS (
      |  SELECT DISTINCT t.doc_id, t.pos
      |  FROM selected t JOIN shared USING (fp)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        CAST(-1 AS BIGINT))
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sel),
      |isl2 AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, min(pos) AS span_start,
      |         CAST(max(pos) + 8 AS BIGINT) AS span_end
      |  FROM isl2 GROUP BY doc_id, island),
      |segs AS (
      |  SELECT doc_id,
      |         coalesce(lag(span_end) OVER (PARTITION BY doc_id
      |                                      ORDER BY span_start),
      |                  CAST(1 AS BIGINT)) AS a,
      |         span_start AS b
      |  FROM spans
      |  UNION ALL
      |  SELECT doc_id, max(span_end) AS a, NULL AS b FROM spans GROUP BY doc_id),
      |stripped AS (
      |  SELECT sg.doc_id,
      |         string_agg(substr(d.text, sg.a,
      |                           coalesce(sg.b, length(d.text) + 1) - sg.a),
      |                    '' ORDER BY sg.a) AS text
      |  FROM segs sg JOIN docs d USING (doc_id)
      |  GROUP BY sg.doc_id),
      |clean AS (
      |  SELECT d.doc_id, coalesce(st.text, d.text) AS text
      |  FROM docs d LEFT JOIN stripped st USING (doc_id)),
      |keep AS (
      |  SELECT min(doc_id) AS doc_id FROM (
      |    SELECT doc_id,
      |           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |    FROM clean)
      |  GROUP BY fp),
      |surv AS (SELECT c.doc_id, c.text FROM clean c JOIN keep USING (doc_id)),
      |q AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM surv),
      |q2 AS (
      |  SELECT doc_id, toks,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio
      |  FROM q),
      |qf AS (
      |  SELECT doc_id, toks FROM q2
      |  WHERE round(len_score * 0.3
      |      + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + punct_score * 0.25
      |      + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) >= 0.3),
      |sized AS (
      |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
      |  FROM qf WHERE len(toks) > 0),
      |ex AS (
      |  SELECT doc_id, toks, n_tokens,
      |    unnest(range(0, (n_tokens - 1) // 64 + 1)) AS chunk_idx
      |  FROM sized)
      |SELECT * FROM (
      |  SELECT doc_id, chunk_idx,
      |    least(64, n_tokens - chunk_idx*64) AS chunk_tokens,
      |    array_to_string(toks[(chunk_idx*64+1):least((chunk_idx+1)*64, n_tokens)], ' ') AS chunk_text
      |  FROM ex
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
      |         'ORACLE_SHINGLE_CAP_EXCEEDED'
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY doc_id, chunk_idx""".stripMargin

  /** corpus_pipeline_full: the full curation recipe as one CTE chain —
    * NFC normalize → decontaminate against the planted benchmark set
    * (word-3-gram overlap ≥ 5 on the NORMALIZED text, the
    * [[decontamination]] math, before cleaning can strip the shared
    * n-grams) → winnow boilerplate strip over the decontaminated corpus
    * (df ≥ 25 counted there) → exact dedup keep-min → quality ≥ 0.3 →
    * the 2000-token md5-hash-ordered budget prefix ([[tokenBudgetSample]]
    * math) → next-fit packing into ≤256-token sequences within 16
    * md5-bucket groups ([[packPlan]] math). Each stage consumes the
    * previous stage's output; the recursive pack CTE runs over the budget
    * survivors only. */
  val corpusPipelineFull: String =
    """WITH RECURSIVE docs AS (
      |  SELECT doc_id, nfc_normalize(text) AS text FROM documents),
      |bench AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |         text || ' graft planted near duplicate suffix' AS text
      |  FROM documents WHERE doc_id < 20),
      |ctoks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM docs),
      |btoks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |      x -> len(x) > 0) AS t
      |  FROM bench),
      |csh AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+2], ' ')))
      |    END) AS sh
      |  FROM ctoks),
      |bsh AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
      |                i -> array_to_string(t[i:i+2], ' ')))
      |    END) AS sh
      |  FROM btoks),
      |cont AS (
      |  SELECT c.doc_id FROM csh c JOIN bsh b USING (sh)
      |  GROUP BY c.doc_id, b.doc_id HAVING count(*) >= 5),
      |contam AS (SELECT DISTINCT doc_id FROM cont),
      |docs2 AS (
      |  SELECT doc_id, text FROM docs
      |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      |s AS (SELECT CAST(range AS BIGINT) AS i FROM range(1, 5001)),
      |g AS (
      |  SELECT d.doc_id, s.i,
      |         md5(substr(d.text, s.i, 8)) || '|' ||
      |           lpad(CAST(s.i AS VARCHAR), 10, '0') AS hk,
      |         length(d.text) - 7 AS m
      |  FROM docs2 d JOIN s ON s.i <= length(d.text) - 7),
      |wins AS (
      |  SELECT doc_id, i, m,
      |         min(hk) OVER (PARTITION BY doc_id ORDER BY i
      |                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS key
      |  FROM g),
      |selected AS (
      |  SELECT DISTINCT doc_id, substr(key, 1, 32) AS fp,
      |         CAST(substr(key, 34) AS BIGINT) AS pos
      |  FROM wins WHERE i <= m - 3
      |  UNION
      |  SELECT doc_id, substr(min(hk), 1, 32) AS fp,
      |         CAST(substr(min(hk), 34) AS BIGINT) AS pos
      |  FROM g WHERE m < 4 GROUP BY doc_id),
      |shared AS (
      |  SELECT fp FROM (
      |    SELECT fp, count(DISTINCT doc_id) AS df FROM selected GROUP BY fp)
      |  WHERE df >= 25),
      |sel AS (
      |  SELECT DISTINCT t.doc_id, t.pos
      |  FROM selected t JOIN shared USING (fp)),
      |isl AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN pos > coalesce(
      |        max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |        CAST(-1 AS BIGINT))
      |      THEN 1 ELSE 0 END AS brk
      |  FROM sel),
      |isl2 AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, min(pos) AS span_start,
      |         CAST(max(pos) + 8 AS BIGINT) AS span_end
      |  FROM isl2 GROUP BY doc_id, island),
      |segs AS (
      |  SELECT doc_id,
      |         coalesce(lag(span_end) OVER (PARTITION BY doc_id
      |                                      ORDER BY span_start),
      |                  CAST(1 AS BIGINT)) AS a,
      |         span_start AS b
      |  FROM spans
      |  UNION ALL
      |  SELECT doc_id, max(span_end) AS a, NULL AS b FROM spans GROUP BY doc_id),
      |stripped AS (
      |  SELECT sg.doc_id,
      |         string_agg(substr(d.text, sg.a,
      |                           coalesce(sg.b, length(d.text) + 1) - sg.a),
      |                    '' ORDER BY sg.a) AS text
      |  FROM segs sg JOIN docs2 d USING (doc_id)
      |  GROUP BY sg.doc_id),
      |clean AS (
      |  SELECT d.doc_id, coalesce(st.text, d.text) AS text
      |  FROM docs2 d LEFT JOIN stripped st USING (doc_id)),
      |keep AS (
      |  SELECT min(doc_id) AS doc_id FROM (
      |    SELECT doc_id,
      |           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      |    FROM clean)
      |  GROUP BY fp),
      |surv AS (SELECT c.doc_id, c.text FROM clean c JOIN keep USING (doc_id)),
      |q AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(trim(text), '\s+'),
      |                t -> length(t) > 0) AS toks,
      |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |                t -> length(t) > 0) AS ltoks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct
      |  FROM surv),
      |q2 AS (
      |  SELECT doc_id, toks,
      |    least(CAST(len(toks) AS DOUBLE) / 50, CAST(1 AS DOUBLE)) AS len_score,
      |    CASE WHEN len(toks) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
      |              / len(toks) END AS word_len,
      |    CASE WHEN length(text) = 0 THEN 0.0
      |         ELSE 1 - least(CAST(punct AS DOUBLE) / greatest(length(text), 1) * 5,
      |                        CAST(1 AS DOUBLE)) END AS punct_score,
      |    CASE WHEN len(ltoks) = 0 THEN 0.0
      |         ELSE CAST(len(list_filter(ltoks, t -> list_contains(
      |                ['the','a','an','and','or','but','of','to','in','on','at','is',
      |                 'are','was','were','be','been','it','this','that','with','for',
      |                 'as','by','from','not','no','so','if','then','than','too'], t)))
      |              AS DOUBLE) / len(ltoks) END AS stop_ratio
      |  FROM q),
      |qf AS (
      |  SELECT doc_id, toks FROM q2
      |  WHERE round(len_score * 0.3
      |      + (CASE WHEN word_len >= 3 AND word_len <= 10 THEN 1.0 ELSE 0.5 END) * 0.2
      |      + punct_score * 0.25
      |      + least(stop_ratio * 4, CAST(1 AS DOUBLE)) * 0.25, 6) >= 0.3),
      |sized AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |         md5(CAST(doc_id AS VARCHAR)) AS pr
      |  FROM qf),
      |cum AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(sum(n_tokens) OVER (ORDER BY pr, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM sized),
      |samp AS MATERIALIZED (
      |  SELECT doc_id, n_tokens, cum_tokens,
      |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 16 AS grp
      |  FROM cum WHERE cum_tokens <= 2000),
      |r AS MATERIALIZED (
      |      SELECT doc_id, n_tokens, cum_tokens, grp,
      |        CAST(row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS BIGINT) AS rn
      |      FROM samp),
      |p AS (
      |  SELECT doc_id, n_tokens, cum_tokens, grp, rn, n_tokens AS acc,
      |         CAST(0 AS BIGINT) AS pack_id
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.doc_id, r.n_tokens, r.cum_tokens, r.grp, r.rn,
      |    CASE WHEN p.acc + r.n_tokens > 256 THEN r.n_tokens ELSE p.acc + r.n_tokens END,
      |    CASE WHEN p.acc + r.n_tokens > 256 THEN p.pack_id + 1 ELSE p.pack_id END
      |  FROM p JOIN r ON r.grp = p.grp AND r.rn = p.rn + 1)
      |SELECT * FROM (
      |  SELECT doc_id, n_tokens, cum_tokens, CAST(grp AS BIGINT) AS grp, pack_id
      |  FROM p
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
      |         CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
      |  WHERE (SELECT max(length(text)) FROM documents) > 5007
      |) ORDER BY doc_id""".stripMargin

  /** unicode_normalize: the planted suffixes are DECOMPOSED sequences
    * (base letter + combining mark, plus the U+212B angstrom singleton)
    * written as raw UTF-8 in both this SQL literal and the Spark lit() —
    * DuckDB's utf8proc and the JDK's Normalizer both implement UAX#15
    * canonical composition, so the NFC outputs must be byte-identical.
    * The ASCII doc prefix rides along to prove the fast path changes
    * nothing. */
  val unicodeNormalize: String =
    """SELECT doc_id,
      |  nfc_normalize(substr(text, 1, 40) ||
      |    CASE CAST(doc_id % 3 AS INTEGER)
      |      WHEN 0 THEN ' café naïve'
      |      WHEN 1 THEN ' Àngström Å'
      |      ELSE ' ågström élève'
      |    END) AS norm
      |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin

  /** distinct_sketch runs the KMV sketch in its exact regime (k far above
    * the true distinct count), where the estimate provably equals plain
    * COUNT(DISTINCT) — so the oracle needs no hash arithmetic at all. */
  val distinctSketch: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** knn_graph: the exact k-NN graph over the bounded vec_id < 500 slice —
    * knn_bruteforce's oracle with the node set as its own query side
    * (identical cosine/rank arithmetic, both sides sliced). */
  val knnGraph: String =
    """WITH n AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500),
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) AS nq,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS ne
      |  FROM n q, n e WHERE q.vec_id <> e.vec_id),
      |sim AS (
      |  SELECT query_id, neighbor_id,
      |    CASE WHEN nq = 0 OR ne = 0 THEN 0.0
      |         ELSE dot / (sqrt(nq) * sqrt(ne)) END AS raw_cosine
      |  FROM scored),
      |ranked AS (
      |  SELECT query_id, neighbor_id, raw_cosine,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY raw_cosine DESC, neighbor_id ASC) AS rank
      |  FROM sim)
      |SELECT query_id, neighbor_id, round(raw_cosine, 6) AS cosine, rank
      |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** media_hash_pairs: the banded-Hamming pair finder value-checked
    * EXACTLY — for maxBits ≤ 3 the engine's 4×16-bit banding is
    * recall-lossless (pigeonhole: ≤ 3 differing bits cannot touch all 4
    * bands), so the all-pairs popcount output EQUALS the banded
    * candidate set's popcount filter — which is what this SQL computes,
    * replaying the same 4×16 banding: candidate volume is Σ_band-value
    * df² ≈ n²·4/65536 (md5-uniform bands), ~150k rows at sf1 vs the
    * 1.25e9 all-pairs form that kept this entry sf1-excluded (r13
    * verdict item 3). The synthetic 60-bit hash replays the
    * engine's conv(substr(md5(id),1,15),16,10) as a 15-nibble big-endian
    * sum (exact: v·16^14 ≤ 15·2^56, summed as HUGEINT, cast back); plant
    * masks and the band1-flip reject plant replay the engine arithmetic
    * with table-alias-prefixed ids (DuckDB lateral aliasing would
    * otherwise bind the CASE to the just-shifted id). */
  val mediaHashPairs: String =
    """WITH nib AS (
      |  SELECT doc_id, CAST(i AS INT) AS i,
      |    strpos('0123456789abcdef',
      |           substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS v
      |  FROM documents, range(1, 16) t(i)),
      |base AS (
      |  SELECT doc_id AS media_id,
      |    CAST(sum(v * (1::BIGINT << ((15 - i) * 4))) AS BIGINT) AS ahash
      |  FROM nib GROUP BY doc_id),
      |near AS (
      |  SELECT b.media_id + 1000000 AS media_id,
      |    xor(b.ahash, CASE WHEN b.media_id % 3 = 0 THEN 1::BIGINT
      |                      WHEN b.media_id % 3 = 1 THEN 131073::BIGINT
      |                      ELSE 17180000257::BIGINT END) AS ahash
      |  FROM base b WHERE b.media_id < 20),
      |far AS (
      |  SELECT b.media_id + 2000000 AS media_id,
      |    xor(b.ahash, 4294901760::BIGINT) AS ahash
      |  FROM base b WHERE b.media_id < 10),
      |allh AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM near
      |  UNION ALL SELECT * FROM far),
      |bands AS (
      |  SELECT media_id, ahash, CAST(b AS INT) AS b,
      |    (ahash >> (CAST(b AS INT) * 16)) & 65535 AS bv
      |  FROM allh, range(0, 4) t(b)),
      |cand AS (
      |  SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b,
      |    l.ahash AS ha, r.ahash AS hb
      |  FROM bands l JOIN bands r
      |    ON l.b = r.b AND l.bv = r.bv AND l.media_id < r.media_id)
      |SELECT id_a, id_b,
      |  CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      |FROM cand
      |WHERE bit_count(xor(ha, hb)) <= 3
      |ORDER BY id_a, id_b""".stripMargin
}

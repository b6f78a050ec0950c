package graft.operators

import graft.text.TextFns

/** DuckDB oracles for the LLM-data-pipeline operators that are
  * SQL-expressible (d01, d04, d05, s01, t01–t04). Hash-seeded ops
  * (d02 MinHash, d03 SimHash, s02 LSH) and the decode stub (m01) are
  * rows-only, verified by specs.
  *
  * Cross-engine parity relies on: identical normalization regexes,
  * integer-ratio Jaccard, and cosine as a sequential left-fold
  * (list_reduce ≡ Spark aggregate) over doubles.
  */
object LlmOracle {

  private val Norm = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

  val d01: String =
    s"""SELECT md5($Norm) AS norm_hash, min(doc_id) AS keep_doc_id,
       |  count(*) AS n_copies
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val d04: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), alltok AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(range(len(ws) - 1),
       |        i -> ws[i + 1] || ' ' || ws[i + 2])
       |      ELSE [array_to_string(ws, ' ')] END) AS tok
       |  FROM w
       |), hot AS (
       |  SELECT tok FROM alltok GROUP BY tok HAVING count(*) > 100
       |), tok AS (
       |  SELECT a.doc_id, a.tok FROM alltok a
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = a.tok)
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, inter, sa.n_tok AS n_a, sb.n_tok AS n_b,
       |  CAST(inter AS DOUBLE) / (sa.n_tok + sb.n_tok - inter) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(inter AS DOUBLE) / (sa.n_tok + sb.n_tok - inter) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d10: directional containment over the same df-capped bigram
    * sets — both directions of each unordered intersection, kept when
    * |A∩B| / |A| ≥ 0.9.
    */
  val d10: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), alltok AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(range(len(ws) - 1),
       |        i -> ws[i + 1] || ' ' || ws[i + 2])
       |      ELSE [array_to_string(ws, ' ')] END) AS tok
       |  FROM w
       |), hot AS (
       |  SELECT tok FROM alltok GROUP BY tok HAVING count(*) > 100
       |), tok AS (
       |  SELECT a.doc_id, a.tok FROM alltok a
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = a.tok)
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT i.doc_a AS doc_contained, i.doc_b AS doc_container,
       |    i.inter, sa.n_tok AS n_contained, sb.n_tok AS n_container
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  UNION ALL
       |  SELECT i.doc_b, i.doc_a, i.inter, sb.n_tok, sa.n_tok
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |)
       |SELECT doc_contained, doc_container, inter, n_contained, n_container,
       |  CAST(inter AS DOUBLE) / n_contained AS containment
       |FROM pairs
       |WHERE CAST(inter AS DOUBLE) / n_contained >= 0.9
       |ORDER BY doc_contained, doc_container""".stripMargin

  /** d17: the same df-capped shared-bigram candidate rule (prefix
    * filtering is exact, so the oracle skips it), length band ≤ 64,
    * then DuckDB's exact levenshtein over the normalized texts.
    */
  val d17: String =
    s"""WITH w AS (
       |  SELECT doc_id, $Norm AS nt, string_split($Norm, ' ') AS ws
       |  FROM documents
       |), base AS (
       |  SELECT doc_id, nt, CAST(length(nt) AS INT) AS len
       |  FROM w WHERE length(nt) > 0
       |), alltok AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(range(len(ws) - 1),
       |        i -> ws[i + 1] || ' ' || ws[i + 2])
       |      ELSE [array_to_string(ws, ' ')] END) AS tok
       |  FROM w WHERE length(nt) > 0
       |), hot AS (
       |  SELECT tok FROM alltok GROUP BY tok HAVING count(*) > 100
       |), tok AS (
       |  SELECT a.doc_id, a.tok FROM alltok a
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = a.tok)
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |), scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(levenshtein(x.nt, y.nt) AS INT) AS dist,
       |    x.len AS len_a, y.len AS len_b
       |  FROM cand c
       |  JOIN base x ON x.doc_id = c.doc_a
       |  JOIN base y ON y.doc_id = c.doc_b
       |  WHERE abs(x.len - y.len) <= 64
       |)
       |SELECT doc_a, doc_b, dist, len_a, len_b,
       |  floor((1.0 - CAST(dist AS DOUBLE) / greatest(len_a, len_b))
       |    * 1000000.0 + 0.5) / 1000000.0 AS sim6
       |FROM scored WHERE dist <= 64
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d11: cross-document repeated-substring spans — the same
    * repeated-k-gram-position construction as the Spark side (k = 5):
    * positions whose k-gram occurs in ≥ 2 distinct docs, merged into
    * maximal spans by the lag-gap rule, exact integer coverage sums.
    */
  val d11: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT doc_id, ws, len(ws) AS n_tokens,
       |    unnest(range(len(ws) - 4)) AS p
       |  FROM w WHERE len(ws) >= 5
       |), grams AS (
       |  SELECT doc_id, n_tokens, p,
       |    array_to_string(ws[p + 1 : p + 5], ' ') AS gram
       |  FROM g
       |), rep AS (
       |  SELECT gram FROM grams GROUP BY gram
       |  HAVING count(DISTINCT doc_id) >= 2
       |), hits AS (
       |  SELECT doc_id, n_tokens, p FROM grams JOIN rep USING (gram)
       |), lagged AS (
       |  SELECT doc_id, n_tokens, p,
       |    lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp
       |  FROM hits
       |), agg AS (
       |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |    count(*) AS n_rep_pos,
       |    CAST(sum(CASE WHEN pp IS NULL OR p - pp > 5 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_spans,
       |    CAST(sum(CASE WHEN pp IS NULL THEN 5 ELSE least(p - pp, 5) END)
       |      AS BIGINT) AS covered_tokens
       |  FROM lagged GROUP BY doc_id, n_tokens
       |)
       |SELECT doc_id, n_tokens, n_rep_pos, n_spans, covered_tokens,
       |  floor(CAST(covered_tokens AS DOUBLE) / n_tokens * 1000000.0 + 0.5)
       |    / 1000000.0 AS dup_frac6
       |FROM agg ORDER BY doc_id""".stripMargin

  /** d11 clean(): the repeated-span positions replayed, k-token cover
    * exploded, surviving tokens re-joined in order (NORMALIZED space).
    */
  val d11Clean: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT doc_id, ws, unnest(range(len(ws) - 4)) AS p
       |  FROM w WHERE len(ws) >= 5
       |), grams AS (
       |  SELECT doc_id, p, array_to_string(ws[p + 1 : p + 5], ' ') AS gram
       |  FROM g
       |), rep AS (
       |  SELECT gram FROM grams GROUP BY gram
       |  HAVING count(DISTINCT doc_id) >= 2
       |), hits AS (
       |  SELECT doc_id, p FROM grams JOIN rep USING (gram)
       |), cov AS (
       |  SELECT DISTINCT doc_id, p + uu.u AS t
       |  FROM hits CROSS JOIN (SELECT unnest(range(5)) AS u) uu
       |), posi AS (
       |  SELECT doc_id, ws, unnest(range(len(ws))) AS t FROM w
       |), kept AS (
       |  SELECT p.doc_id, p.t, p.ws[p.t + 1] AS tok
       |  FROM posi p
       |  WHERE NOT EXISTS (SELECT 1 FROM cov c
       |    WHERE c.doc_id = p.doc_id AND c.t = p.t)
       |), agg AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(tok, ' ' ORDER BY t) AS cleaned_text
       |  FROM kept GROUP BY 1
       |), base AS (
       |  SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens FROM w
       |)
       |SELECT b.doc_id, b.n_tokens,
       |  CAST(b.n_tokens - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       |  coalesce(a.cleaned_text, '') AS cleaned_text
       |FROM base b LEFT JOIN agg a USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  /** d22: d11's repeated-position mining, runs via the lag-gap +
    * running-sum islands, span text sliced from the token list,
    * grouped by exact text.
    */
  val d22: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT doc_id, ws, unnest(range(len(ws) - 4)) AS p
       |  FROM w WHERE len(ws) >= 5
       |), grams AS (
       |  SELECT doc_id, p, array_to_string(ws[p + 1 : p + 5], ' ') AS gram
       |  FROM g
       |), rep AS (
       |  SELECT gram FROM grams GROUP BY gram
       |  HAVING count(DISTINCT doc_id) >= 2
       |), hits AS (
       |  SELECT doc_id, p FROM grams JOIN rep USING (gram)
       |), lagged AS (
       |  SELECT doc_id, p,
       |    lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp
       |  FROM hits
       |), brk AS (
       |  SELECT *, CASE WHEN pp IS NULL OR p - pp > 5 THEN 1 ELSE 0 END
       |    AS b
       |  FROM lagged
       |), rn AS (
       |  SELECT *, sum(b) OVER (PARTITION BY doc_id ORDER BY p
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
       |  FROM brk
       |), runs AS (
       |  SELECT doc_id, run_id, min(p) AS sp, max(p) + 5 AS ep
       |  FROM rn GROUP BY 1, 2
       |), spans AS (
       |  SELECT r.doc_id, CAST(r.ep - r.sp AS INT) AS span_tokens,
       |    array_to_string(w.ws[r.sp + 1 : r.ep], ' ') AS span_text
       |  FROM runs r JOIN w USING (doc_id)
       |), cat AS (
       |  SELECT span_text, max(span_tokens) AS span_tokens,
       |    count(*) AS n_occurrences,
       |    count(DISTINCT doc_id) AS n_docs,
       |    min(doc_id) AS first_doc_id
       |  FROM spans GROUP BY 1
       |)
       |SELECT md5(span_text) AS span_fp, span_tokens, n_occurrences,
       |  n_docs, first_doc_id,
       |  CAST(CASE WHEN n_occurrences >= 2 THEN 1 ELSE 0 END AS INT)
       |    AS dup_verbatim,
       |  span_text
       |FROM cat ORDER BY span_text""".stripMargin

  /** d15: incremental dedup of the doc_id % 10 == 7 "arrivals" slice
    * against the rest of the corpus — exact digest tier (index
    * membership + within-batch first-id-wins) then, for survivors,
    * the same df-capped bigram Jaccard as d04 with df/stoplist
    * measured on the INDEX side; all-pairs here where the Spark side
    * prefix-filters (exactness of the filter is what's under test).
    */
  /** d21: the split-hash Bloom filter replayed in ANSI SQL — identical
    * mod-(2³¹−1) position arithmetic, so even the false positives
    * hash-match the Spark side.
    */
  val d21: String =
    s"""WITH docs AS (
       |  SELECT doc_id, md5($Norm) AS h FROM documents
       |), idx AS (
       |  SELECT doc_id, h,
       |    CAST(concat('0x', substring(h, 1, 15)) AS BIGINT)
       |      % 2147483647 AS x
       |  FROM docs WHERE doc_id % 10 <> 7
       |), bat AS (
       |  SELECT doc_id, h,
       |    CAST(concat('0x', substring(h, 1, 15)) AS BIGINT)
       |      % 2147483647 AS x
       |  FROM docs WHERE doc_id % 10 = 7
       |), fb AS (
       |  SELECT DISTINCT unnest([
       |    ((1103515245 * x + 12345) % 2147483647) % 1048576,
       |    ((69069 * x + 1) % 2147483647) % 1048576,
       |    ((1664525 * x + 1013904223) % 2147483647) % 1048576,
       |    ((22695477 * x + 54321) % 2147483647) % 1048576]) AS pos
       |  FROM idx
       |), pr AS (
       |  SELECT doc_id, h, unnest([
       |    ((1103515245 * x + 12345) % 2147483647) % 1048576,
       |    ((69069 * x + 1) % 2147483647) % 1048576,
       |    ((1664525 * x + 1013904223) % 2147483647) % 1048576,
       |    ((22695477 * x + 54321) % 2147483647) % 1048576]) AS pos
       |  FROM bat
       |), hits AS (
       |  SELECT pr.doc_id, pr.h,
       |    sum(CASE WHEN fb.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
       |  FROM pr LEFT JOIN fb ON pr.pos = fb.pos
       |  GROUP BY 1, 2
       |), ex AS (
       |  SELECT DISTINCT h FROM idx
       |)
       |SELECT hits.doc_id,
       |  CAST(n_hits AS INT) AS n_hits,
       |  CAST(CASE WHEN n_hits = 4 THEN 1 ELSE 0 END AS INT) AS bloom_hit,
       |  CAST(CASE WHEN ex.h IS NOT NULL THEN 1 ELSE 0 END AS INT)
       |    AS exact_dup,
       |  CAST(CASE WHEN n_hits = 4 AND ex.h IS NULL THEN 1 ELSE 0 END
       |    AS INT) AS false_positive,
       |  CAST(CASE WHEN n_hits < 4 THEN 1 ELSE 0 END AS INT) AS admitted
       |FROM hits LEFT JOIN ex ON hits.h = ex.h
       |ORDER BY hits.doc_id""".stripMargin

  /** d02: the full MinHash+LSH chain replayed in SQL — the 64 LCG
    * (a, b) pairs are interpolated from MinHashLSH.coeffs verbatim,
    * the per-shingle integer is d21's digest₆₀ arithmetic, banding is
    * equality of the 8-component band slice (string_agg key), and the
    * estimate is the exact agreeing-component count over 64.
    */
  val d02: String = {
    val coeffRows = graft.dedup.MinHashLSH.coeffA
      .zip(graft.dedup.MinHashLSH.coeffB).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(",\n       |    ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), shg AS (
       |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(ws) <= 3
       |    THEN [array_to_string(ws, ' ')]
       |    ELSE list_transform(range(len(ws) - 2),
       |      i -> array_to_string(ws[i + 1:i + 3], ' ')) END) AS g
       |  FROM w
       |), hx AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substring(md5(g), 1, 15)) AS BIGINT)
       |      % 2147483647 AS x
       |  FROM shg
       |), cf AS (
       |  SELECT * FROM (VALUES $coeffRows) AS t(i, a, b)
       |), sig AS (
       |  SELECT hx.doc_id, cf.i,
       |    min((cf.a * hx.x + cf.b) % 2147483647) AS m
       |  FROM hx CROSS JOIN cf
       |  GROUP BY 1, 2
       |), bandkey AS (
       |  SELECT doc_id, i // 8 AS band,
       |    string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS bk
       |  FROM sig GROUP BY doc_id, i // 8
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandkey a JOIN bandkey b
       |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
       |), est AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) AS BIGINT)
       |      AS neq
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, CAST(neq AS DOUBLE) / 64 AS est_jaccard
       |FROM est WHERE CAST(neq AS DOUBLE) / 64 >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** d03: the md5 digest₆₀ per distinct token, ±1 votes per bit over
    * an unnested 60-bit spine, sign-packed signature, the pigeonhole
    * chunk join and exact Hamming — the same arithmetic as the Spark
    * side's simhash_pack over conv(md5) hashes.
    */
  val d03: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), tok AS (
       |  SELECT DISTINCT doc_id, unnest(ws) AS t FROM w
       |), hx AS (
       |  SELECT doc_id,
       |    CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) AS h
       |  FROM tok
       |), votes AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hx CROSS JOIN (SELECT unnest(range(60)) AS b) bits
       |  GROUP BY 1, 2
       |), sig AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN v > 0
       |      THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS sh
       |  FROM votes GROUP BY 1
       |), chunks AS (
       |  SELECT doc_id, sh, c, (sh >> (c * 15)) & 32767 AS cv
       |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c) cs
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, x.sh AS sig_a,
       |    y.doc_id AS doc_b, y.sh AS sig_b
       |  FROM chunks x JOIN chunks y
       |    ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
       |FROM cand
       |WHERE bit_count(xor(sig_a, sig_b)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  val d15: String =
    s"""WITH batch AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7
       |), idx AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7
       |), bdig AS (
       |  SELECT doc_id, md5($Norm) AS dig FROM batch
       |), idig AS (
       |  SELECT DISTINCT md5($Norm) AS dig FROM idx
       |), exact AS (
       |  SELECT b.doc_id,
       |    CASE WHEN i.dig IS NOT NULL THEN 1 ELSE 0 END AS exact_index,
       |    CASE WHEN b.doc_id > min(b.doc_id) OVER (PARTITION BY b.dig)
       |      THEN 1 ELSE 0 END AS exact_batch
       |  FROM bdig b LEFT JOIN idig i ON b.dig = i.dig
       |), surv AS (
       |  SELECT doc_id FROM exact WHERE exact_index = 0 AND exact_batch = 0
       |), iw AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM idx
       |), ialltok AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(range(len(ws) - 1),
       |        i -> ws[i + 1] || ' ' || ws[i + 2])
       |      ELSE [array_to_string(ws, ' ')] END) AS tok
       |  FROM iw
       |), hot AS (
       |  SELECT tok FROM ialltok GROUP BY tok HAVING count(*) > 100
       |), itok AS (
       |  SELECT a.doc_id, a.tok FROM ialltok a
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = a.tok)
       |), isize AS (
       |  SELECT doc_id, count(*) AS n_tok FROM itok GROUP BY doc_id
       |), bw AS (
       |  SELECT b.doc_id, string_split($Norm, ' ') AS ws
       |  FROM batch b JOIN surv s ON s.doc_id = b.doc_id
       |), balltok AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(ws) >= 2
       |      THEN list_transform(range(len(ws) - 1),
       |        i -> ws[i + 1] || ' ' || ws[i + 2])
       |      ELSE [array_to_string(ws, ' ')] END) AS tok
       |  FROM bw
       |), btok AS (
       |  SELECT a.doc_id, a.tok FROM balltok a
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.tok = a.tok)
       |), bsize AS (
       |  SELECT doc_id, count(*) AS n_tok FROM btok GROUP BY doc_id
       |), inter AS (
       |  SELECT b.doc_id AS bid, i.doc_id AS iid, count(*) AS inter
       |  FROM btok b JOIN itok i ON b.tok = i.tok GROUP BY 1, 2
       |), pairs AS (
       |  SELECT bid,
       |    CAST(inter AS DOUBLE) / (bs.n_tok + isz.n_tok - inter) AS j
       |  FROM inter
       |  JOIN bsize bs ON bs.doc_id = bid
       |  JOIN isize isz ON isz.doc_id = iid
       |  WHERE CAST(inter AS DOUBLE) / (bs.n_tok + isz.n_tok - inter) >= 0.8
       |), near AS (
       |  SELECT bid, count(*) AS n_near, max(j) AS max_jaccard
       |  FROM pairs GROUP BY 1
       |)
       |SELECT e.doc_id, e.exact_index, e.exact_batch,
       |  CASE WHEN n.bid IS NOT NULL THEN 1 ELSE 0 END AS near_dup,
       |  coalesce(n.n_near, 0) AS n_near, n.max_jaccard,
       |  CASE WHEN e.exact_index = 0 AND e.exact_batch = 0 AND n.bid IS NULL
       |    THEN 1 ELSE 0 END AS kept
       |FROM exact e LEFT JOIN near n ON n.bid = e.doc_id
       |ORDER BY e.doc_id""".stripMargin

  /** d16: temperature-rebalanced mixture — integer sqrt weights
    * (float floor ±1-corrected, bit-identical to the Spark side),
    * rational 2/5 target, floor-div quotas capped at n_s, d12's
    * salted-hash priority within source.
    */
  val d16: String =
    s"""WITH c AS (
       |  SELECT source, count(*) AS n FROM documents GROUP BY 1
       |), w AS (
       |  SELECT source, n,
       |    CASE WHEN s0 * s0 > n THEN s0 - 1
       |         WHEN (s0 + 1) * (s0 + 1) <= n THEN s0 + 1
       |         ELSE s0 END AS w
       |  FROM (SELECT source, n,
       |    CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM c)
       |), tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS total,
       |    CAST(sum(w) AS BIGINT) AS sw
       |  FROM w
       |), q AS (
       |  SELECT w.source, w.n,
       |    least(w.n, (((tot.total * 2) // 5) * w.w) // tot.sw) AS quota
       |  FROM w, tot
       |), r AS (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || 'd16'), doc_id) AS rn
       |  FROM documents
       |)
       |SELECT r.source, r.doc_id, CAST(r.rn AS INT) AS rk,
       |  q.n AS n_source, q.quota
       |FROM r JOIN q ON q.source = r.source
       |WHERE r.rn <= q.quota
       |ORDER BY r.source, rk""".stripMargin

  /** p02: the curation pipeline replayed stage by stage — the same
    * filter ingredients (t10/t11 formulas), min-per-digest dedup,
    * d12's salted-hash cap rank, d13's shard cumsum packing.
    */
  val p02: String =
    s"""WITH w AS (
       |  SELECT doc_id, source, text, string_split($Norm, ' ') AS ws
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, source,
       |    len(ws) AS n_words,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]'))
       |      AS INT) AS n_tok,
       |    floor(CAST(len(regexp_extract_all($Norm, '[^ ]*[a-z][^ ]*'))
       |      AS DOUBLE) / len(ws) * 1000000.0 + 0.5) / 1000000.0
       |      AS alpha_frac,
       |    floor(CAST((length(text) - length(replace(text, '#', '')))
       |      + (length(text) - length(replace(text, '...', ''))) // 3
       |      AS DOUBLE) / len(ws) * 1000000.0 + 0.5) / 1000000.0
       |      AS symbol_ratio,
       |    ${dupFracSql(ngListSql(2))} AS dup2,
       |    md5($Norm) AS norm_hash
       |  FROM w
       |), flt AS (
       |  SELECT * FROM f
       |  WHERE n_words >= 20 AND alpha_frac > 0.8
       |    AND symbol_ratio < 0.1 AND dup2 < 0.2
       |), ddp AS (
       |  SELECT * FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY norm_hash) AS mn
       |    FROM flt)
       |  WHERE doc_id = mn
       |), cap AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || 'p02'), doc_id) AS rk
       |    FROM ddp)
       |  WHERE rk <= 50
       |), pk AS (
       |  SELECT doc_id, source, n_tok, doc_id % 8 AS shard,
       |    CAST(sum(n_tok) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM cap
       |)
       |SELECT doc_id, source, n_tok, shard,
       |  cum - n_tok AS start_off,
       |  (cum - n_tok) // 512 AS first_seq,
       |  greatest(cum - 1, cum - n_tok) // 512 AS last_seq
       |FROM pk ORDER BY doc_id""".stripMargin

  /** p03: the incremental-ingest chain replayed — batch-slice quality
    * gate, digest admission (anti join + first-id window over the
    * survivors), then the one packing rule's cumsum/chunk arithmetic.
    */
  val p03: String =
    s"""WITH w AS (
       |  SELECT doc_id, source, text, string_split($Norm, ' ') AS ws
       |  FROM documents WHERE doc_id % 10 = 7
       |), f AS (
       |  SELECT doc_id, source,
       |    len(ws) AS n_words,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]'))
       |      AS INT) AS n_tok,
       |    floor(CAST(len(regexp_extract_all($Norm, '[^ ]*[a-z][^ ]*'))
       |      AS DOUBLE) / len(ws) * 1000000.0 + 0.5) / 1000000.0
       |      AS alpha_frac,
       |    md5($Norm) AS norm_hash
       |  FROM w
       |), flt AS (
       |  SELECT * FROM f WHERE n_words >= 20 AND alpha_frac > 0.8
       |), i AS (
       |  SELECT DISTINCT md5($Norm) AS norm_hash
       |  FROM documents WHERE doc_id % 10 <> 7
       |), adm AS (
       |  SELECT * FROM (
       |    SELECT ff.*, min(ff.doc_id) OVER (PARTITION BY ff.norm_hash)
       |      AS mn
       |    FROM flt ff
       |    WHERE NOT EXISTS (SELECT 1 FROM i WHERE i.norm_hash = ff.norm_hash))
       |  WHERE doc_id = mn
       |), pk AS (
       |  SELECT doc_id, source, n_tok, doc_id % 8 AS shard,
       |    CAST(sum(n_tok) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM adm
       |)
       |SELECT doc_id, source, n_tok, shard,
       |  cum - n_tok AS start_off,
       |  (cum - n_tok) // 512 AS first_seq,
       |  greatest(cum - 1, cum - n_tok) // 512 AS last_seq
       |FROM pk ORDER BY doc_id""".stripMargin

  /** p04: the per-source data card — exact integer-rank deciles
    * ((j·n+9)//10), top language by (count desc, lang), duplicate
    * rate from the (source, digest) distinct count, 1e-4 rounding.
    */
  val p04: String =
    s"""WITH base AS (
       |  SELECT doc_id, source, lang,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+')) AS BIGINT)
       |      AS n_tok,
       |    CAST(length(text) AS BIGINT) AS n_char,
       |    md5($Norm) AS digest
       |  FROM documents
       |), vol AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |    CAST(sum(n_char) AS BIGINT) AS n_chars
       |  FROM base GROUP BY 1
       |), ranked AS (
       |  SELECT source, n_tok,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY n_tok, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM base
       |), deciles AS (
       |  SELECT source,
       |    max(CASE WHEN rn = (1 * n + 9) // 10 THEN n_tok END) AS p10_tok,
       |    max(CASE WHEN rn = (5 * n + 9) // 10 THEN n_tok END) AS p50_tok,
       |    max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_tok END) AS p90_tok
       |  FROM ranked
       |  WHERE rn = (1 * n + 9) // 10 OR rn = (5 * n + 9) // 10
       |     OR rn = (9 * n + 9) // 10
       |  GROUP BY 1
       |), lc AS (
       |  SELECT source, lang, count(*) AS c FROM base GROUP BY 1, 2
       |), toplang AS (
       |  SELECT source, lang AS top_lang, c AS top_c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source
       |      ORDER BY c DESC, lang) AS r FROM lc) WHERE r = 1
       |), dd AS (
       |  SELECT source, count(*) AS n_distinct FROM (
       |    SELECT source, digest FROM base GROUP BY 1, 2) GROUP BY 1
       |)
       |SELECT v.source, v.n_docs, v.n_tokens, v.n_chars,
       |  floor(CAST(v.n_tokens AS DOUBLE) / v.n_docs * 10000.0 + 0.5)
       |    / 10000.0 AS avg_tokens4,
       |  d.p10_tok, d.p50_tok, d.p90_tok,
       |  t.top_lang,
       |  floor(CAST(t.top_c AS DOUBLE) / v.n_docs * 10000.0 + 0.5)
       |    / 10000.0 AS top_lang_share4,
       |  floor(CAST(v.n_docs - dd.n_distinct AS DOUBLE) / v.n_docs
       |    * 10000.0 + 0.5) / 10000.0 AS dup_frac4
       |FROM vol v JOIN deciles d USING (source) JOIN toplang t USING (source)
       |  JOIN dd USING (source)
       |ORDER BY source""".stripMargin

  /** d13: the same concat-and-chunk packing — t03's regex tokens,
    * shard = doc_id % 8, per-shard running sum (cast from DuckDB's
    * HUGEINT to BIGINT for schema parity), chunk = floor-div by the
    * 512-token sequence length.
    */
  val d13: String =
    s"""WITH tok AS (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]'))
       |      AS INT) AS n_tok
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, n_tok,
       |    CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM tok
       |)
       |SELECT doc_id, shard, n_tok, cum - n_tok AS start_off,
       |  (cum - n_tok) // 512 AS first_seq,
       |  greatest(cum - 1, cum - n_tok) // 512 AS last_seq,
       |  greatest(cum - 1, cum - n_tok) // 512
       |    - (cum - n_tok) // 512 + 1 AS n_seqs
       |FROM c ORDER BY doc_id""".stripMargin

  /** d06: connected components of the d04 pair graph by transitive
    * closure (recursive CTE) — component id = min reachable doc.
    */
  val d06: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM ($d04)
       |), edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, least(a, min(b)) AS component_id,
       |  CASE WHEN least(a, min(b)) = a THEN 1 ELSE 0 END AS is_kept
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** Sequential left-fold dot product, same op order as Spark's
    * aggregate(zip_with(...)).
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       |      list_transform(list_zip($a, $b), p -> p[1] * p[2])),
       |      (acc, x) -> acc + x)""".stripMargin

  /** Shared k-means CTE chain for s03/d14 — Ann.trainCentroids
    * replayed exactly: md5-digest₆₀-ranked seeds (Ann.seedRank's 'km'
    * salt), `iters` Lloyd rounds where each assignment is the argmin
    * of the same norm2 − 2·dot + |c|² IEEE chain (ties → smaller cid)
    * and each centroid component is ONE exact DECIMAL(38,12) sum cast
    * to double then ONE division by the count; empty clusters keep
    * the previous centroid. Ends with `af(vec_id, v, norm2, cid)` —
    * the final assignment against the trained bank `c<iters>`.
    */
  private def kmeansCtes(nCentroids: Int, iters: Int): String = {
    def round(k: Int): String =
      s"""d$k AS (
         |  SELECT n.vec_id, n.v, c.cid,
         |    n.norm2 - 2.0 * ${dotSql("n.v", "c.c")}
         |      + ${dotSql("c.c", "c.c")} AS dist
         |  FROM n CROSS JOIN c${k - 1} c
         |), a$k AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cid) AS ar
         |    FROM d$k)
         |  WHERE ar = 1
         |), m$k AS (
         |  SELECT cid, pos,
         |    CAST(SUM(CAST(comp AS DECIMAL(38,12))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS m
         |  FROM (SELECT cid, unnest(v) AS comp,
         |      unnest(range(1, len(v) + 1)) AS pos FROM a$k)
         |  GROUP BY 1, 2
         |), r$k AS (
         |  SELECT cid, array_agg(m ORDER BY pos) AS c FROM m$k GROUP BY 1
         |), c$k AS MATERIALIZED (
         |  SELECT p.cid, COALESCE(r$k.c, p.c) AS c
         |  FROM c${k - 1} p LEFT JOIN r$k ON r$k.cid = p.cid
         |)""".stripMargin
    val rounds = (1 to iters).map(round).mkString(", ")
    s"""v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), sr AS (
       |  SELECT vec_id, v,
       |    CAST(concat('0x', substring(md5(concat(
       |      CAST(vec_id AS VARCHAR), 'km')), 1, 15)) AS BIGINT)
       |      % 1000003 AS h
       |  FROM n
       |), c0 AS MATERIALIZED (
       |  SELECT CAST(rn - 1 AS INT) AS cid, v AS c
       |  FROM (SELECT *, row_number() OVER (ORDER BY h, vec_id) AS rn
       |    FROM sr)
       |  WHERE rn <= $nCentroids
       |), $rounds, af AS MATERIALIZED (
       |  SELECT vec_id, v, norm2, cid FROM (
       |    SELECT n.vec_id, n.v, n.norm2, c.cid,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.norm2 - 2.0 * ${dotSql("n.v", "c.c")}
       |          + ${dotSql("c.c", "c.c")}, c.cid) AS ar
       |    FROM n CROSS JOIN c$iters c)
       |  WHERE ar = 1
       |)""".stripMargin
  }

  /** s03: the IVF index replayed end-to-end — the kmeansCtes training
    * chain, per-query centroid ranking (same dist chain, ties →
    * smaller cid, nProbe = 8), exact cosine inside the probed lists,
    * s01's (cos6 DESC, vec_id) rank.
    */
  val s03: String =
    s"""WITH ${kmeansCtes(16, 2)}, q AS (
       |  SELECT vec_id AS query_id, v AS qv, norm2 AS qn FROM n
       |  WHERE vec_id < 10
       |), pr AS (
       |  SELECT query_id, qv, qn, cid FROM (
       |    SELECT q.query_id, q.qv, q.qn, c.cid,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        q.qn - 2.0 * ${dotSql("q.qv", "c.c")}
       |          + ${dotSql("c.c", "c.c")}, c.cid) AS prk
       |    FROM q CROSS JOIN c2 c)
       |  WHERE prk <= 8
       |), scored AS (
       |  SELECT pr.query_id, l.vec_id,
       |    floor(${dotSql("pr.qv", "l.v")} / sqrt(pr.qn * l.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM af l JOIN pr ON pr.cid = l.cid
       |  WHERE l.vec_id <> pr.query_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, vec_id) AS rk
       |  FROM scored
       |)
       |SELECT query_id, rk, vec_id, cos6 FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin

  /** s05: the PQ index replayed end-to-end — per-subspace codebooks
    * (md5-'pq'-ranked seeds, two Lloyd rounds with the same
    * decimal-exact means), 4-bit code assignment (same dist chain,
    * ties → smaller code), per-query ADC tables as ordered
    * list-of-lists (each cell ONE sequential fold of squared diffs —
    * the driver loop's exact order), the 8-term static-lookup adist
    * sum, the 40·k shortlist and the exact L2² re-rank.
    */
  val s05: String = {
    val m = 8
    val sub = 8
    val codes = 16
    val iters = 2
    def sq(a: String, b: String): String =
      s"""list_reduce(list_prepend(0.0,
         |      list_transform(list_zip($a, $b),
         |        p -> (p[1] - p[2]) * (p[1] - p[2]))),
         |      (acc, x) -> acc + x)""".stripMargin
    def round(k: Int): String =
      s"""pd$k AS (
         |  SELECT s.vec_id, s.m_idx, s.sv, s.sn2, c.code,
         |    s.sn2 - 2.0 * ${dotSql("s.sv", "c.c")}
         |      + ${dotSql("c.c", "c.c")} AS dist
         |  FROM svs s JOIN cb${k - 1} c ON c.m_idx = s.m_idx
         |), pa$k AS (
         |  SELECT vec_id, m_idx, sv, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m_idx
         |      ORDER BY dist, code) AS ar
         |    FROM pd$k)
         |  WHERE ar = 1
         |), pm$k AS (
         |  SELECT m_idx, code, pos,
         |    CAST(SUM(CAST(comp AS DECIMAL(38,12))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS mu
         |  FROM (SELECT m_idx, code, unnest(sv) AS comp,
         |      unnest(range(1, len(sv) + 1)) AS pos FROM pa$k)
         |  GROUP BY 1, 2, 3
         |), pr$k AS (
         |  SELECT m_idx, code, array_agg(mu ORDER BY pos) AS c
         |  FROM pm$k GROUP BY 1, 2
         |), cb$k AS MATERIALIZED (
         |  SELECT p.m_idx, p.code, COALESCE(r.c, p.c) AS c
         |  FROM cb${k - 1} p LEFT JOIN pr$k r
         |    ON r.m_idx = p.m_idx AND r.code = p.code
         |)""".stripMargin
    val rounds = (1 to iters).map(round).mkString(", ")
    val adist = (1 to m)
      .map(i => s"qd.dt[$i][enc.cv[$i] + 1]")
      .mkString("\n       |    + ")
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), svs AS MATERIALIZED (
       |  SELECT vec_id, m_idx,
       |    v[(m_idx * $sub + 1):(m_idx * $sub + $sub)] AS sv,
       |    ${dotSql(s"v[(m_idx * $sub + 1):(m_idx * $sub + $sub)]",
      s"v[(m_idx * $sub + 1):(m_idx * $sub + $sub)]")} AS sn2
       |  FROM v CROSS JOIN (SELECT unnest(range(0, $m)) AS m_idx) mi
       |), sh AS (
       |  SELECT vec_id, m_idx, sv,
       |    CAST(concat('0x', substring(md5(concat(
       |      CAST(vec_id * 131 + m_idx AS VARCHAR), 'pq')), 1, 15))
       |      AS BIGINT) % 1000003 AS h
       |  FROM svs
       |), cb0 AS MATERIALIZED (
       |  SELECT m_idx, CAST(rn - 1 AS INT) AS code, sv AS c
       |  FROM (SELECT *, row_number() OVER (PARTITION BY m_idx
       |      ORDER BY h, vec_id) AS rn
       |    FROM sh)
       |  WHERE rn <= $codes
       |), $rounds, paf AS (
       |  SELECT vec_id, m_idx, code FROM (
       |    SELECT s.vec_id, s.m_idx, c.code,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m_idx ORDER BY
       |        s.sn2 - 2.0 * ${dotSql("s.sv", "c.c")}
       |          + ${dotSql("c.c", "c.c")}, c.code) AS ar
       |    FROM svs s JOIN cb$iters c ON c.m_idx = s.m_idx)
       |  WHERE ar = 1
       |), enc AS MATERIALIZED (
       |  SELECT vec_id, array_agg(code ORDER BY m_idx) AS cv
       |  FROM paf GROUP BY 1
       |), qsub AS (
       |  SELECT vec_id AS query_id, m_idx, sv FROM svs
       |  WHERE vec_id < 10
       |), dcell AS (
       |  SELECT q.query_id, q.m_idx, c.code,
       |    ${sq("q.sv", "c.c")} AS dv
       |  FROM qsub q JOIN cb$iters c ON c.m_idx = q.m_idx
       |), drow AS (
       |  SELECT query_id, m_idx, array_agg(dv ORDER BY code) AS dl
       |  FROM dcell GROUP BY 1, 2
       |), qd AS MATERIALIZED (
       |  SELECT query_id, array_agg(dl ORDER BY m_idx) AS dt
       |  FROM drow GROUP BY 1
       |), shortl AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qd.query_id, enc.vec_id,
       |      row_number() OVER (PARTITION BY qd.query_id ORDER BY
       |        floor(($adist) * 1000000.0 + 0.5) / 1000000.0,
       |        enc.vec_id) AS ark
       |    FROM enc CROSS JOIN qd
       |    WHERE enc.vec_id <> qd.query_id)
       |  WHERE ark <= 200
       |), nv AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS n2 FROM v
       |), qx AS (
       |  SELECT vec_id AS query_id, v AS qv, ${dotSql("v", "v")} AS qn
       |  FROM v WHERE vec_id < 10
       |), rer AS (
       |  SELECT s.query_id, s.vec_id,
       |    floor((qx.qn - 2.0 * ${dotSql("qx.qv", "nv.v")} + nv.n2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS d2_6
       |  FROM shortl s
       |  JOIN nv ON nv.vec_id = s.vec_id
       |  JOIN qx ON qx.query_id = s.query_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2_6, vec_id) AS rk
       |  FROM rer
       |)
       |SELECT query_id, rk, vec_id, d2_6 FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  }

  /** s13: the composed IVF-PQ index replayed end-to-end — the SAME
    * kmeansCtes coarse chain as s03 (af + trained bank c2), residuals
    * v − c(cid) by exact elementwise subtraction, s05's per-subspace
    * Lloyd chain over the RESIDUAL subvectors ('pqr' seed salt), the
    * per-(query, probed-cell) ADC tables built from the query's own
    * residual against that cell (each cell one sequential
    * squared-diff fold — the driver loop's exact order), the 8-term
    * static-lookup adist over only the probed lists, the 80·k
    * shortlist (nProbe = 10 — the engine defaults) and the exact L2²
    * re-rank.
    */
  /** s13's training + corpus-encode CTE chain, ending at `paf` (the
    * per-(vec, subspace) code assignment) and `res` (the coarse
    * assignment + residuals): kmeansCtes' coarse chain, residual
    * subvector explode, 'pqr' seeds, `iters` residual-PQ Lloyd
    * rounds. Shared by s13's full query and st40's streaming-
    * admission replay.
    */
  private def ivfPqEncodeCtes(m: Int, sub: Int, codes: Int,
      iters: Int): String = {
    def round(k: Int): String =
      s"""pd$k AS (
         |  SELECT s.vec_id, s.m_idx, s.sv, s.sn2, c.code,
         |    s.sn2 - 2.0 * ${dotSql("s.sv", "c.c")}
         |      + ${dotSql("c.c", "c.c")} AS dist
         |  FROM svs s JOIN cb${k - 1} c ON c.m_idx = s.m_idx
         |), pa$k AS (
         |  SELECT vec_id, m_idx, sv, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m_idx
         |      ORDER BY dist, code) AS ar
         |    FROM pd$k)
         |  WHERE ar = 1
         |), pm$k AS (
         |  SELECT m_idx, code, pos,
         |    CAST(SUM(CAST(comp AS DECIMAL(38,12))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS mu
         |  FROM (SELECT m_idx, code, unnest(sv) AS comp,
         |      unnest(range(1, len(sv) + 1)) AS pos FROM pa$k)
         |  GROUP BY 1, 2, 3
         |), prr$k AS (
         |  SELECT m_idx, code, array_agg(mu ORDER BY pos) AS c
         |  FROM pm$k GROUP BY 1, 2
         |), cb$k AS MATERIALIZED (
         |  SELECT p.m_idx, p.code, COALESCE(r.c, p.c) AS c
         |  FROM cb${k - 1} p LEFT JOIN prr$k r
         |    ON r.m_idx = p.m_idx AND r.code = p.code
         |)""".stripMargin
    val rounds = (1 to iters).map(round).mkString(", ")
    s"""${kmeansCtes(16, 2)}, res AS MATERIALIZED (
       |  SELECT a.vec_id, a.cid,
       |    list_transform(list_zip(a.v, c.c), p -> p[1] - p[2]) AS rv
       |  FROM af a JOIN c$iters c ON c.cid = a.cid
       |), svs AS MATERIALIZED (
       |  SELECT vec_id, m_idx,
       |    rv[(m_idx * $sub + 1):(m_idx * $sub + $sub)] AS sv,
       |    ${dotSql(s"rv[(m_idx * $sub + 1):(m_idx * $sub + $sub)]",
      s"rv[(m_idx * $sub + 1):(m_idx * $sub + $sub)]")} AS sn2
       |  FROM res CROSS JOIN (SELECT unnest(range(0, $m)) AS m_idx) mi
       |), sh AS (
       |  SELECT vec_id, m_idx, sv,
       |    CAST(concat('0x', substring(md5(concat(
       |      CAST(vec_id * 131 + m_idx AS VARCHAR), 'pqr')), 1, 15))
       |      AS BIGINT) % 1000003 AS h
       |  FROM svs
       |), cb0 AS MATERIALIZED (
       |  SELECT m_idx, CAST(rn - 1 AS INT) AS code, sv AS c
       |  FROM (SELECT *, row_number() OVER (PARTITION BY m_idx
       |      ORDER BY h, vec_id) AS rn
       |    FROM sh)
       |  WHERE rn <= $codes
       |), $rounds, paf AS (
       |  SELECT vec_id, m_idx, code FROM (
       |    SELECT s.vec_id, s.m_idx, c.code,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m_idx ORDER BY
       |        s.sn2 - 2.0 * ${dotSql("s.sv", "c.c")}
       |          + ${dotSql("c.c", "c.c")}, c.code) AS ar
       |    FROM svs s JOIN cb$iters c ON c.m_idx = s.m_idx)
       |  WHERE ar = 1
       |)""".stripMargin
  }

  val s13: String = {
    val m = 8
    val sub = 8
    val codes = 16
    val iters = 2
    def sq(a: String, b: String): String =
      s"""list_reduce(list_prepend(0.0,
         |      list_transform(list_zip($a, $b),
         |        p -> (p[1] - p[2]) * (p[1] - p[2]))),
         |      (acc, x) -> acc + x)""".stripMargin
    val adist = (1 to m)
      .map(i => s"qd.dt[$i][ec.cv[$i] + 1]")
      .mkString("\n       |    + ")
    s"""WITH ${ivfPqEncodeCtes(m, sub, codes, iters)}, enc AS MATERIALIZED (
       |  SELECT p.vec_id, r.cid, array_agg(p.code ORDER BY p.m_idx) AS cv
       |  FROM paf p JOIN res r ON r.vec_id = p.vec_id
       |  GROUP BY 1, 2
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv, norm2 AS qn FROM n
       |  WHERE vec_id < 10
       |), prq AS (
       |  SELECT query_id, qv, cid FROM (
       |    SELECT q.query_id, q.qv, c.cid,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        q.qn - 2.0 * ${dotSql("q.qv", "c.c")}
       |          + ${dotSql("c.c", "c.c")}, c.cid) AS prk
       |    FROM q CROSS JOIN c$iters c)
       |  WHERE prk <= 10
       |), qres AS (
       |  SELECT p.query_id, p.cid,
       |    list_transform(list_zip(p.qv, c.c), x -> x[1] - x[2]) AS qrv
       |  FROM prq p JOIN c$iters c ON c.cid = p.cid
       |), qsub AS (
       |  SELECT query_id, cid, m_idx,
       |    qrv[(m_idx * $sub + 1):(m_idx * $sub + $sub)] AS sv
       |  FROM qres CROSS JOIN (SELECT unnest(range(0, $m)) AS m_idx) mi
       |), dcell AS (
       |  SELECT s.query_id, s.cid, s.m_idx, c.code,
       |    ${sq("s.sv", "c.c")} AS dv
       |  FROM qsub s JOIN cb$iters c ON c.m_idx = s.m_idx
       |), drow AS (
       |  SELECT query_id, cid, m_idx, array_agg(dv ORDER BY code) AS dl
       |  FROM dcell GROUP BY 1, 2, 3
       |), qd AS MATERIALIZED (
       |  SELECT query_id, cid, array_agg(dl ORDER BY m_idx) AS dt
       |  FROM drow GROUP BY 1, 2
       |), shortl AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT qd.query_id, ec.vec_id,
       |      row_number() OVER (PARTITION BY qd.query_id ORDER BY
       |        floor(($adist) * 1000000.0 + 0.5) / 1000000.0,
       |        ec.vec_id) AS ark
       |    FROM enc ec JOIN qd ON qd.cid = ec.cid
       |    WHERE ec.vec_id <> qd.query_id)
       |  WHERE ark <= 400
       |), nv AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS n2 FROM v
       |), qx AS (
       |  SELECT vec_id AS query_id, v AS qv, ${dotSql("v", "v")} AS qn
       |  FROM v WHERE vec_id < 10
       |), rer AS (
       |  SELECT s.query_id, s.vec_id,
       |    floor((qx.qn - 2.0 * ${dotSql("qx.qv", "nv.v")} + nv.n2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS d2_6
       |  FROM shortl s
       |  JOIN nv ON nv.vec_id = s.vec_id
       |  JOIN qx ON qx.query_id = s.query_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY d2_6, vec_id) AS rk
       |  FROM rer
       |)
       |SELECT query_id, rk, vec_id, d2_6 FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  }

  /** st40: the admission encode replayed in batch — the identical
    * training chain (the frozen banks), then the coarse cid and
    * per-subspace codes of the streamed vec_id % 10 == 7 slice.
    */
  val st40: String =
    s"""WITH ${ivfPqEncodeCtes(8, 8, 16, 2)}
       |SELECT p.vec_id, r.cid, CAST(p.m_idx AS INT) AS m_idx, p.code
       |FROM paf p JOIN res r ON r.vec_id = p.vec_id
       |WHERE p.vec_id % 10 = 7
       |ORDER BY p.vec_id, m_idx""".stripMargin


  /** d14: the same training chain and final assignment, then the
    * within-cluster i<j pair cosines at the 1e-6 grid, the ≥ τ
    * filter, and the greedy min-id dup attribution.
    */
  val d14: String =
    s"""WITH ${kmeansCtes(16, 2)}, pares AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    floor(${dotSql("a.v", "b.v")} / sqrt(a.norm2 * b.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM af a JOIN af b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |), dups AS (
       |  SELECT id_b AS vec_id, min(id_a) AS dup_of, max(cos6) AS max_cos6
       |  FROM pares WHERE cos6 >= CAST(0.4 AS DOUBLE)
       |  GROUP BY 1
       |)
       |SELECT af.vec_id, af.cid,
       |  CASE WHEN d.dup_of IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
       |  d.dup_of, d.max_cos6
       |FROM af LEFT JOIN dups d ON d.vec_id = af.vec_id
       |ORDER BY af.vec_id""".stripMargin

  val d05: String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ${dotSql("a.v", "b.v")} / sqrt(a.norm2 * b.norm2) AS cos
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id
       |)
       |SELECT id_a, id_b, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |FROM pairs WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin

  /** d19: the d06 recursive-CTE component closure over the d05
    * embedding pair SQL, plus per-component sizes.
    */
  val d19: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a AS doc_a, id_b AS doc_b FROM ($d05)
       |), edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), reach AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), comp AS (
       |  SELECT a AS vec_id, least(a, min(b)) AS component_id
       |  FROM reach GROUP BY a
       |), sz AS (
       |  SELECT component_id, count(*) AS cluster_size
       |  FROM comp GROUP BY 1
       |)
       |SELECT c.vec_id, c.component_id,
       |  CAST(CASE WHEN c.component_id = c.vec_id THEN 1 ELSE 0 END AS INT)
       |    AS is_kept,
       |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
       |FROM comp c JOIN sz USING (component_id)
       |ORDER BY c.vec_id""".stripMargin

  val s01: String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    floor(${dotSql("q.v", "c.v")} / sqrt(q.norm2 * c.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 10
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, vec_id) AS rk
       |  FROM scored
       |)
       |SELECT query_id, rk, vec_id, cos6 FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin

  /** s02: the multi-table, multi-probe hyperplane LSH replayed
    * exactly — each of the 6×5 hyperplanes is interpolated as its
    * integer numerators (Ann.planeComponentScaled) and rebuilt with
    * the same k/10⁶ − 1 chain; bucket bits via the same
    * sequential-fold dot sign; the Hamming-1 probe fan-out as the
    * same XOR flips (0 plus each single bit); then s01's cosine/rank
    * conventions over the candidate set.
    */
  val s02: String = {
    val bits = 5
    val tables = 6
    val dims = 64
    def planeList(t: Int, p: Int): String =
      (0 until dims).map { d =>
        val k = graft.similarity.Ann.planeComponentScaled(t * 64 + p, d)
        s"CAST($k AS DOUBLE) / 1000000 - 1.0"
      }.mkString("[", ", ", "]")
    val sigSelects = (0 until tables).map { t =>
      val bucketExpr = (0 until bits).map { p =>
        s"(CASE WHEN ${dotSql("v", planeList(t, p))} > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString("\n       |    + ")
      s"""SELECT vec_id, $t AS tb,
       |    $bucketExpr AS bucket
       |  FROM n"""
    }.mkString("\n       |  UNION ALL\n       |  ")
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), sig AS (
       |  $sigSelects
       |), qs AS (
       |  SELECT vec_id AS query_id, tb, bucket FROM sig WHERE vec_id < 10
       |), probes AS (
       |  SELECT query_id, tb, xor(bucket, CAST(f.flip AS BIGINT)) AS bucket
       |  FROM qs CROSS JOIN (VALUES ${
        (0L +: (0 until bits).map(p => 1L << p).toSeq)
          .map(f => s"($f)").mkString(", ")
      }) f(flip)
       |), cand AS (
       |  SELECT DISTINCT pr.query_id, sg.vec_id
       |  FROM sig sg JOIN probes pr ON sg.tb = pr.tb AND sg.bucket = pr.bucket
       |  WHERE sg.vec_id <> pr.query_id
       |), scored AS (
       |  SELECT c.query_id, c.vec_id,
       |    floor(${dotSql("q.v", "cv.v")} / sqrt(q.norm2 * cv.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM cand c
       |  JOIN n q ON q.vec_id = c.query_id
       |  JOIN n cv ON cv.vec_id = c.vec_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, vec_id) AS rk
       |  FROM scored
       |)
       |SELECT query_id, rk, vec_id, cos6 FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  }

  /** s09: s01's scored table filtered at the quantized radius
    * instead of ranked to k; count window per probe.
    */
  val s09: String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    floor(${dotSql("q.v", "c.v")} / sqrt(q.norm2 * c.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 10
       |), inr AS (
       |  SELECT * FROM scored WHERE cos6 >= 0.2
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, vec_id) AS rk,
       |    count(*) OVER (PARTITION BY query_id) AS n_in_range
       |  FROM inr
       |)
       |SELECT query_id, rk, vec_id, cos6, n_in_range FROM ranked
       |ORDER BY query_id, rk""".stripMargin

  /** s06: reciprocal-rank fusion of the s01 cosine ranking (at pool
    * depth 50) with a distinct-token Jaccard ranking; contributions
    * are exact ⌊1e9/(60+rk)⌋ BIGINTs so the fused sum is order-free.
    */
  /** s08: the full exact self-join (each unordered pair scored once,
    * both directions unpivoted), s01's (cos6 DESC, id) rank, top k.
    */
  val s08: String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), p AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    floor(${dotSql("a.v", "b.v")} / sqrt(a.norm2 * b.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n a JOIN n b ON b.vec_id > a.vec_id
       |), d AS (
       |  SELECT ia AS node_id, ib AS nbr_id, cos6 FROM p
       |  UNION ALL SELECT ib, ia, cos6 FROM p
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY node_id
       |    ORDER BY cos6 DESC, nbr_id) AS rk
       |  FROM d
       |)
       |SELECT node_id, CAST(rk AS INT) AS rk, nbr_id, cos6
       |FROM r WHERE rk <= 5 ORDER BY node_id, rk""".stripMargin

  /** s11: LOF over s08's exact graph — integer distances/kdist/reach,
    * one integer division per lrd, one IEEE chain per LOF.
    */
  val s11: String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), p AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    floor(${dotSql("a.v", "b.v")} / sqrt(a.norm2 * b.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n a JOIN n b ON b.vec_id > a.vec_id
       |), d AS (
       |  SELECT ia AS node_id, ib AS nbr_id, cos6 FROM p
       |  UNION ALL SELECT ib, ia, cos6 FROM p
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY node_id
       |    ORDER BY cos6 DESC, nbr_id) AS rk
       |  FROM d
       |), g AS (
       |  SELECT node_id, nbr_id,
       |    1000000 - CAST(floor(cos6 * 1000000.0 + 0.5) AS BIGINT) AS d6
       |  FROM r WHERE rk <= 5
       |), kd AS (
       |  SELECT node_id, max(d6) AS kdist6, count(*) AS cnt
       |  FROM g GROUP BY 1
       |), reach AS (
       |  SELECT g.node_id, greatest(kd.kdist6, g.d6) AS reach6
       |  FROM g JOIN kd ON g.nbr_id = kd.node_id
       |), lrd AS (
       |  SELECT node_id, sum(reach6) AS sreach, count(*) AS cnt,
       |    CASE WHEN sum(reach6) > 0
       |      THEN CAST((count(*) * 1000000000000000) // sum(reach6)
       |        AS BIGINT) END AS lrd9
       |  FROM reach GROUP BY 1
       |), ns AS (
       |  SELECT g.node_id, sum(l2.lrd9) AS sum_lrd9
       |  FROM g JOIN lrd l2 ON g.nbr_id = l2.node_id
       |  GROUP BY 1
       |)
       |SELECT lrd.node_id AS vec_id, lrd.cnt AS n_nbrs, lrd.lrd9,
       |  CASE WHEN lrd.lrd9 > 0 AND ns.sum_lrd9 IS NOT NULL THEN
       |    CAST(floor(CAST(ns.sum_lrd9 AS DOUBLE) / lrd.cnt / lrd.lrd9
       |      * 1000000.0 + 0.5) AS BIGINT)
       |  END AS lof6,
       |  CAST(CASE WHEN lrd.lrd9 > 0 AND ns.sum_lrd9 IS NOT NULL AND
       |    CAST(floor(CAST(ns.sum_lrd9 AS DOUBLE) / lrd.cnt / lrd.lrd9
       |      * 1000000.0 + 0.5) AS BIGINT) >= 1500000
       |    THEN 1 ELSE 0 END AS INT) AS outlier_flag
       |FROM lrd JOIN ns ON lrd.node_id = ns.node_id
       |ORDER BY vec_id""".stripMargin

  /** p15: the three component oracles (s11 LOF, s12 PageRank, d05
    * pairs) composed on the label spine — p13's nested-WITH pattern.
    */
  lazy val p15: String =
    s"""WITH lab AS (
       |  SELECT vec_id, label FROM embeddings
       |), base AS (
       |  SELECT lab.label, lab.vec_id, lofq.outlier_flag, prq.pagerank9
       |  FROM lab
       |  LEFT JOIN ($s11) lofq ON lofq.vec_id = lab.vec_id
       |  LEFT JOIN ($s12) prq ON prq.vec_id = lab.vec_id
       |), rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY label
       |    ORDER BY pagerank9 DESC, vec_id) AS rk
       |  FROM base
       |), st AS (
       |  SELECT label, count(*) AS n_vecs,
       |    CAST(SUM(coalesce(outlier_flag, 0)) AS BIGINT) AS n_outliers,
       |    MAX(CASE WHEN rk = 1 THEN vec_id END) AS top_central_vec_id,
       |    MAX(CASE WHEN rk = 1 THEN pagerank9 END) AS top_pagerank9
       |  FROM rk GROUP BY 1
       |), dp AS (
       |  SELECT la.label, count(*) AS dup_pairs
       |  FROM ($d05) d
       |  JOIN lab la ON la.vec_id = d.id_a
       |  JOIN lab lb ON lb.vec_id = d.id_b AND lb.label = la.label
       |  GROUP BY 1
       |)
       |SELECT st.label, st.n_vecs, st.n_outliers,
       |  CAST(floor(CAST(n_outliers AS DOUBLE) / CAST(n_vecs AS DOUBLE)
       |    * 1000000.0 + 0.5) AS BIGINT) AS outlier_rate6,
       |  top_central_vec_id, top_pagerank9,
       |  coalesce(dp.dup_pairs, 0) AS dup_pairs
       |FROM st LEFT JOIN dp ON dp.label = st.label
       |ORDER BY st.label""".stripMargin

  /** s12: s08's edge list, then five MATERIALIZED integer PageRank
    * iterations — r₀ = 10⁹//N, contrib = r//deg, r' = (15·r₀)//100 +
    * (85·Σ)//100, the exact ops the Spark loop runs.
    */
  val s12: String = {
    val iters = (1 to 5).map { k =>
      s"""it$k AS MATERIALIZED (
         |  SELECT nd.vec_id,
         |    (15 * (SELECT 1000000000 // nn FROM cnt)) // 100
         |      + (85 * coalesce(sm.m, 0)) // 100 AS r
         |  FROM v nd LEFT JOIN (
         |    SELECT g.nbr_id AS vec_id, SUM(p.r // od.deg) AS m
         |    FROM g JOIN it${k - 1} p ON p.vec_id = g.node_id
         |    JOIN od ON od.node_id = g.node_id
         |    GROUP BY 1) sm ON sm.vec_id = nd.vec_id
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), p AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    floor(${dotSql("a.v", "b.v")} / sqrt(a.norm2 * b.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n a JOIN n b ON b.vec_id > a.vec_id
       |), d AS (
       |  SELECT ia AS node_id, ib AS nbr_id, cos6 FROM p
       |  UNION ALL SELECT ib, ia, cos6 FROM p
       |), r AS (
       |  SELECT *, row_number() OVER (PARTITION BY node_id
       |    ORDER BY cos6 DESC, nbr_id) AS rk
       |  FROM d
       |), g AS (
       |  SELECT node_id, nbr_id FROM r WHERE rk <= 5
       |), cnt AS (
       |  SELECT count(*) AS nn FROM v
       |), od AS (
       |  SELECT node_id, count(*) AS deg FROM g GROUP BY 1
       |), it0 AS MATERIALIZED (
       |  SELECT vec_id, 1000000000 // nn AS r FROM v, cnt
       |), $iters
       |SELECT vec_id, CAST(r AS BIGINT) AS pagerank9
       |FROM it5 ORDER BY vec_id""".stripMargin
  }

  val s06: String =
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |    floor(${dotSql("q.v", "c.v")} / sqrt(q.norm2 * c.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 10
       |), dranked AS (
       |  SELECT query_id, doc_id, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos6 DESC, doc_id) AS INT)
       |    AS cos_rk
       |  FROM scored
       |), dns AS (
       |  SELECT * FROM dranked WHERE cos_rk <= 50
       |), tok AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(regexp_extract_all($Norm, '[a-z0-9]+')) AS term
       |  FROM documents
       |), sz AS (
       |  SELECT doc_id, count(*) AS n FROM tok GROUP BY 1
       |), ip AS (
       |  SELECT q.doc_id AS query_id, c.doc_id, count(*) AS i
       |  FROM tok q JOIN tok c
       |    ON q.term = c.term AND c.doc_id != q.doc_id
       |  WHERE q.doc_id < 10
       |  GROUP BY 1, 2
       |), jac AS (
       |  SELECT query_id, ip.doc_id,
       |    floor(i * 1000000.0 / (sq.n + sc.n - i) + 0.5) / 1000000.0
       |      AS jac6
       |  FROM ip JOIN sz sq ON sq.doc_id = ip.query_id
       |          JOIN sz sc ON sc.doc_id = ip.doc_id
       |), sranked AS (
       |  SELECT query_id, doc_id, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY jac6 DESC, doc_id) AS INT)
       |    AS jac_rk
       |  FROM jac
       |), spr AS (
       |  SELECT * FROM sranked WHERE jac_rk <= 50
       |), fused AS (
       |  SELECT coalesce(d.query_id, s.query_id) AS query_id,
       |    coalesce(d.doc_id, s.doc_id) AS doc_id,
       |    coalesce(CAST(floor(1000000000.0 / (60 + d.cos_rk)) AS BIGINT), 0)
       |      + coalesce(CAST(floor(1000000000.0 / (60 + s.jac_rk)) AS BIGINT),
       |        0) AS rrf9,
       |    d.cos_rk, s.jac_rk
       |  FROM dns d FULL JOIN spr s
       |    ON d.query_id = s.query_id AND d.doc_id = s.doc_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf9 DESC, doc_id) AS INT) AS rk
       |  FROM fused
       |)
       |SELECT query_id, rk, doc_id, rrf9, cos_rk, jac_rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin

  /** s07: the λ=½ MMR greedy unrolled as five MATERIALIZED selection
    * rounds — pool and pairwise sims pre-quantized to 1e-6 BIGINTs
    * (the same cosine chain as s01), each round an integer argmax with
    * the smaller-vec_id tie-break, so the SQL replays the Spark loop
    * pick-for-pick.
    */
  val s07: String = {
    def round(r: Int): String = {
      val prev = if (r == 2) "cum1" else s"cum${r - 1}"
      s"""c$r AS MATERIALIZED (
         |  SELECT p.query_id, p.vec_id,
         |    max(p.rel6) - max(s.sim6) AS score6
         |  FROM pool p
         |  JOIN pr s ON s.query_id = p.query_id AND s.a = p.vec_id
         |  JOIN $prev t ON t.query_id = s.query_id AND t.vec_id = s.b
         |  WHERE NOT EXISTS (SELECT 1 FROM $prev x
         |    WHERE x.query_id = p.query_id AND x.vec_id = p.vec_id)
         |  GROUP BY 1, 2
         |), s$r AS MATERIALIZED (
         |  SELECT query_id, vec_id, score6 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score6 DESC, vec_id) AS r FROM c$r) WHERE r = 1
         |), cum$r AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL SELECT query_id, vec_id FROM s$r
         |)""".stripMargin
    }
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id, c.v, c.norm2,
       |    CAST(floor(${dotSql("q.v", "c.v")} / sqrt(q.norm2 * c.norm2)
       |      * 1000000.0 + 0.5) AS BIGINT) AS rel6
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 10
       |), pool AS MATERIALIZED (
       |  SELECT query_id, vec_id, v, norm2, rel6 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel6 DESC, vec_id) AS rk FROM scored) WHERE rk <= 20
       |), pr AS MATERIALIZED (
       |  SELECT a.query_id, a.vec_id AS a, b.vec_id AS b,
       |    CAST(floor(${dotSql("a.v", "b.v")} / sqrt(a.norm2 * b.norm2)
       |      * 1000000.0 + 0.5) AS BIGINT) AS sim6
       |  FROM pool a JOIN pool b
       |    ON b.query_id = a.query_id AND b.vec_id != a.vec_id
       |), s1 AS MATERIALIZED (
       |  SELECT query_id, vec_id, rel6 AS score6 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel6 DESC, vec_id) AS r FROM pool) WHERE r = 1
       |), cum1 AS MATERIALIZED (
       |  SELECT query_id, vec_id FROM s1
       |), ${round(2)}, ${round(3)}, ${round(4)}, ${round(5)}
       |SELECT query_id, CAST(1 AS INT) AS sel_rank, vec_id, score6 FROM s1
       |UNION ALL SELECT query_id, CAST(2 AS INT), vec_id, score6 FROM s2
       |UNION ALL SELECT query_id, CAST(3 AS INT), vec_id, score6 FROM s3
       |UNION ALL SELECT query_id, CAST(4 AS INT), vec_id, score6 FROM s4
       |UNION ALL SELECT query_id, CAST(5 AS INT), vec_id, score6 FROM s5
       |ORDER BY query_id, sel_rank""".stripMargin
  }

  private def profileSql(l: String, stops: Seq[String]): String = {
    val set = stops.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split($Norm, ' '), w -> w IN ($set))) AS score_$l"
  }

  val t01: String = {
    val scores = TextFns.Profiles
      .map { case (l, st) => profileSql(l, st) }.mkString(",\n  ")
    val best = TextFns.Profiles.foldLeft(("'und'", "0")) {
      case ((langAcc, scoreAcc), (l, _)) =>
        (s"CASE WHEN score_$l > $scoreAcc THEN '$l' ELSE $langAcc END",
          s"greatest($scoreAcc, score_$l)")
    }._1
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $scores
       |  FROM documents
       |)
       |SELECT doc_id, lang, $best AS predicted_lang,
       |  ${TextFns.Profiles.map { case (l, _) => s"score_$l" }.mkString(", ")}
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  val t02: String = {
    val stops = TextFns.Profiles.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    length(text) AS n_char,
       |    len(string_split($Norm, ' ')) AS n_words,
       |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
       |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
       |    len(list_filter(string_split($Norm, ' '), w -> w IN ($stops))) AS n_stop,
       |    length($Norm) AS n_char_norm
       |  FROM documents
       |), r AS (
       |  SELECT *,
       |    CAST(n_char_norm - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
       |    CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       |    CAST(n_punct AS DOUBLE) / n_char AS punct_ratio
       |  FROM m
       |)
       |SELECT doc_id, n_char, n_words, n_punct, n_digit, n_stop, stop_ratio,
       |  floor((
       |    (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END) +
       |    (CASE WHEN avg_word_len BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END) +
       |    (CASE WHEN stop_ratio >= 0.01 THEN 0.2 ELSE 0.0 END) +
       |    (CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END)
       |  ) * 1000000.0 + 0.5) / 1000000.0 AS quality
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** t03 with the greedy BPE segmentation replayed as a recursive CTE:
    * the per-word walk advances `pos` by the longest matching vocab
    * entry (else 1) and counts a token per step — exactly
    * BpeCount.compute — run once per DISTINCT word and joined back to
    * the per-doc word multiset. The vocab VALUES list is generated
    * from the same Scala Seq the Spark expression embeds.
    */
  val t03: String = {
    val vocabValues = graft.functions.BpeCount.Vocab
      .map(v => s"('$v')").mkString(", ")
    s"""WITH RECURSIVE docw AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_extract_all($Norm, '[a-z0-9]+')) AS w
       |  FROM documents
       |), words AS MATERIALIZED (
       |  SELECT DISTINCT w FROM docw
       |), vocab(t) AS (
       |  SELECT * FROM (VALUES $vocabValues) v(t)
       |), seg AS (
       |  SELECT w, 1 AS pos, 0 AS n FROM words
       |  UNION ALL
       |  SELECT w,
       |    pos + coalesce((SELECT max(length(t)) FROM vocab
       |                    WHERE substr(w, pos, length(t)) = t), 1),
       |    n + 1
       |  FROM seg WHERE pos <= length(w)
       |), wcount AS MATERIALIZED (
       |  SELECT w, max(n) AS n_sub FROM seg GROUP BY w
       |), docn AS (
       |  SELECT d.doc_id, sum(wc.n_sub) AS bpe
       |  FROM docw d JOIN wcount wc ON d.w = wc.w
       |  GROUP BY d.doc_id
       |)
       |SELECT doc_id,
       |  len(string_split($Norm, ' ')) AS ws_tokens,
       |  len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]')) AS re_tokens,
       |  CAST(ceil(CAST(length(text) AS DOUBLE) / 3.6) AS BIGINT) AS subword_est,
       |  CAST(coalesce(docn.bpe, 0) AS BIGINT) AS bpe_tokens
       |FROM documents LEFT JOIN docn USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** t09: same deterministic PII planting (from doc_id), same
    * Java∩RE2-dialect regexes; DuckDB needs the 'g' flag to mirror
    * Spark's replace-all. size() is INT on the Spark side → CAST.
    */
  val t09: String = {
    val email = graft.text.TextFns.EmailRe
    val phone = graft.text.TextFns.PhoneRe
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text ||
       |    (CASE WHEN doc_id % 7 = 0
       |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |      ELSE '' END) ||
       |    (CASE WHEN doc_id % 11 = 0
       |      THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      ELSE '' END) AS planted
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(planted, '$email')) AS INT) AS n_emails,
       |    CAST(len(regexp_extract_all(planted, '$phone')) AS INT) AS n_phones,
       |    regexp_replace(regexp_replace(planted, '$email', '<EMAIL>', 'g'),
       |      '$phone', '<PHONE>', 'g') AS redacted
       |  FROM p
       |)
       |SELECT doc_id, n_emails, n_phones,
       |  CAST(n_emails + n_phones AS INT) AS n_pii, redacted
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** t10: same row-local n-gram multisets; the dup fraction mirrors
    * Spark's op order exactly (count-diff cast to double, divided,
    * scaled, floored).
    */
  private def ngListSql(n: Int): String =
    s"""CASE WHEN len(ws) >= $n
       |  THEN list_transform(range(len(ws) - ${n - 1}),
       |    i -> array_to_string(ws[i + 1:i + $n], ' '))
       |  ELSE [] END""".stripMargin
  private def dupFracSql(ng: String): String =
    s"""CASE WHEN len($ng) > 0
       |  THEN floor(CAST(len($ng) - len(list_distinct($ng)) AS DOUBLE) /
       |    len($ng) * 1000000.0 + 0.5) / 1000000.0
       |  ELSE 0.0 END""".stripMargin

  val t10: String =
    s"""WITH b AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
       |    ${ngListSql(2)} AS ng2,
       |    ${ngListSql(3)} AS ng3
       |  FROM b
       |)
       |SELECT doc_id, n_words,
       |  ${dupFracSql("ng2")} AS dup_bigram_frac,
       |  ${dupFracSql("ng3")} AS dup_trigram_frac
       |FROM g ORDER BY doc_id""".stripMargin

  /** t11: the Gopher rules replayed — every ingredient is a
    * length-delta replace count or an RE2 regexp_extract_all (both
    * leftmost non-overlapping, matching Java regex), ratios rounded
    * at 1e-6 BEFORE the threshold CASEs so engine and oracle compare
    * the same quantized values.
    */
  val t11: String = {
    val stops = TextFns.RequiredStops
      .map(w => s"CASE WHEN list_contains(ws, '$w') THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    val bulletRe = "(?m)^[ \\t]*[-*\u2022]"
    val ellLineRe = "(?m)\\.\\.\\.[ \\t]*$"
    s"""WITH c AS (
       |  SELECT doc_id, text,
       |    replace(text, chr(13), '') AS tl
       |  FROM documents
       |), m AS (
       |  SELECT doc_id,
       |    string_split($Norm, ' ') AS ws,
       |    length($Norm) AS n_char_norm,
       |    length(text) - length(replace(text, '#', '')) AS n_hash,
       |    (length(text) - length(replace(text, '...', ''))) // 3 AS n_ellipsis,
       |    length(tl) - length(replace(tl, chr(10), '')) + 1 AS n_lines,
       |    len(regexp_extract_all(tl, '$bulletRe')) AS n_bullet,
       |    len(regexp_extract_all(tl, '$ellLineRe')) AS n_ell_lines,
       |    len(regexp_extract_all($Norm, '[^ ]*[a-z][^ ]*')) AS n_alpha
       |  FROM c
       |), r AS (
       |  SELECT doc_id,
       |    CAST(len(ws) AS INT) AS n_words,
       |    floor(CAST(n_char_norm - (len(ws) - 1) AS DOUBLE) / len(ws)
       |      * 1000000.0 + 0.5) / 1000000.0 AS mean_word_len,
       |    floor(CAST(n_hash + n_ellipsis AS DOUBLE) / len(ws)
       |      * 1000000.0 + 0.5) / 1000000.0 AS symbol_word_ratio,
       |    floor(CAST(n_bullet AS DOUBLE) / n_lines
       |      * 1000000.0 + 0.5) / 1000000.0 AS bullet_line_frac,
       |    floor(CAST(n_ell_lines AS DOUBLE) / n_lines
       |      * 1000000.0 + 0.5) / 1000000.0 AS ellipsis_line_frac,
       |    floor(CAST(n_alpha AS DOUBLE) / len(ws)
       |      * 1000000.0 + 0.5) / 1000000.0 AS alpha_word_frac,
       |    $stops AS n_req_stops
       |  FROM m
       |)
       |SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
       |  n_req_stops,
       |  CASE WHEN n_words BETWEEN 50 AND 100000
       |    AND mean_word_len BETWEEN 3 AND 10
       |    AND symbol_word_ratio < 0.1
       |    AND bullet_line_frac < 0.9
       |    AND ellipsis_line_frac < 0.3
       |    AND alpha_word_frac > 0.8
       |    AND n_req_stops >= 2 THEN 1 ELSE 0 END AS gopher_pass
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** t12: per-source observed-vocabulary KL with add-one smoothing —
    * integer counts, each p_s·ln(p_s/p) term floored to a 1e-9 BIGINT
    * before the order-free per-source sum (t08/q61's posture).
    */
  /** p06: the snapshot diff replayed — era A = doc_id % 10 != 0, B =
    * the full corpus; per-source volume/dup deltas and the cross-era
    * KL with t12's exact term chain over the union vocabulary.
    */
  val p06: String =
    s"""WITH a AS (
       |  SELECT * FROM documents WHERE doc_id % 10 != 0
       |), fa AS (
       |  SELECT source, md5($Norm) AS digest,
       |    len(regexp_extract_all($Norm, '[a-z0-9]+')) AS n_tok
       |  FROM a
       |), fb AS (
       |  SELECT source, md5($Norm) AS digest,
       |    len(regexp_extract_all($Norm, '[a-z0-9]+')) AS n_tok
       |  FROM documents
       |), va AS (
       |  SELECT source, count(*) AS docs_a,
       |    CAST(sum(n_tok) AS BIGINT) AS tokens_a,
       |    CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS dups_a
       |  FROM fa GROUP BY 1
       |), vb AS (
       |  SELECT source, count(*) AS docs_b,
       |    CAST(sum(n_tok) AS BIGINT) AS tokens_b,
       |    CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS dups_b
       |  FROM fb GROUP BY 1
       |), ta AS (
       |  SELECT source, unnest(regexp_extract_all($Norm, '[a-z0-9]+'))
       |    AS term FROM a
       |), tb AS (
       |  SELECT source, unnest(regexp_extract_all($Norm, '[a-z0-9]+'))
       |    AS term FROM documents
       |), cca AS (
       |  SELECT source, term, count(*) AS ca FROM ta GROUP BY 1, 2
       |), ccb AS (
       |  SELECT source, term, count(*) AS cb FROM tb GROUP BY 1, 2
       |), un AS (
       |  SELECT coalesce(ccb.source, cca.source) AS source,
       |    coalesce(ccb.term, cca.term) AS term,
       |    coalesce(cca.ca, 0) AS ca, coalesce(ccb.cb, 0) AS cb
       |  FROM ccb FULL JOIN cca
       |    ON cca.source = ccb.source AND cca.term = ccb.term
       |), sv AS (
       |  SELECT source, CAST(sum(ca) AS BIGINT) AS na,
       |    CAST(sum(cb) AS BIGINT) AS nb, count(*) AS v
       |  FROM un GROUP BY 1
       |), kl AS (
       |  SELECT u.source,
       |    CAST(sum(CAST(floor(
       |      ((u.cb + 1) / CAST(s.nb + s.v AS DOUBLE)) *
       |      ln(((u.cb + 1) / CAST(s.nb + s.v AS DOUBLE)) /
       |         ((u.ca + 1) / CAST(s.na + s.v AS DOUBLE))) * 1.0e9 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS kl9_shift
       |  FROM un u JOIN sv s USING (source)
       |  WHERE u.cb > 0 GROUP BY 1
       |)
       |SELECT source,
       |  coalesce(va.docs_a, 0) AS docs_a,
       |  coalesce(vb.docs_b, 0) AS docs_b,
       |  coalesce(vb.docs_b, 0) - coalesce(va.docs_a, 0) AS new_docs,
       |  coalesce(va.tokens_a, 0) AS tokens_a,
       |  coalesce(vb.tokens_b, 0) AS tokens_b,
       |  coalesce(va.dups_a, 0) AS dups_a,
       |  coalesce(vb.dups_b, 0) AS dups_b,
       |  kl.kl9_shift,
       |  CAST(CASE WHEN coalesce(va.docs_a, 0) = 0 THEN 1 ELSE 0 END
       |    AS INT) AS new_source
       |FROM vb FULL JOIN va USING (source) LEFT JOIN kl USING (source)
       |ORDER BY source""".stripMargin

  /** t14: the same top-k rank table, pairwise ln-chain slopes and
    * q64's exact-rank lower median, floored to 1e-6.
    */
  val t14: String =
    s"""WITH stt AS (
       |  SELECT source, unnest(regexp_extract_all($Norm, '[a-z0-9]+'))
       |    AS term FROM documents
       |), c AS (
       |  SELECT source, term, count(*) AS c FROM stt GROUP BY 1, 2
       |), top AS (
       |  SELECT * FROM (
       |    SELECT source, c, row_number() OVER (PARTITION BY source
       |      ORDER BY c DESC, term) AS r
       |    FROM c) WHERE r <= 50
       |), n AS (
       |  SELECT source, CAST(count(*) AS INT) AS n_terms
       |  FROM top GROUP BY 1
       |), pr AS (
       |  SELECT a.source,
       |    (ln(b.c) - ln(a.c)) / (ln(b.r) - ln(a.r)) AS sl
       |  FROM top a JOIN top b
       |    ON b.source = a.source AND b.r > a.r
       |), m AS (
       |  SELECT source, sl,
       |    row_number() OVER (PARTITION BY source ORDER BY sl) AS rr,
       |    count(*) OVER (PARTITION BY source) AS mm
       |  FROM pr
       |)
       |SELECT n.source, n.n_terms,
       |  floor(m.sl * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope6
       |FROM n JOIN m ON m.source = n.source AND m.rr = (m.mm + 1) // 2
       |ORDER BY n.source""".stripMargin

  /** t15: per-(doc, term) counts, then exact integer type/token/hapax
    * counts and three 1e-6-floored ratio chains (TTR, hapax,
    * Guiraud R = types/sqrt(tokens)).
    */
  val t15: String =
    s"""WITH stt AS (
       |  SELECT doc_id, unnest(regexp_extract_all($Norm, '[a-z0-9]+'))
       |    AS term FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS c FROM stt GROUP BY 1, 2
       |), agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS n_types,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hapax
       |  FROM tf GROUP BY 1
       |)
       |SELECT doc_id, n_tokens, n_types, n_hapax,
       |  floor(CAST(n_types AS DOUBLE) / n_tokens * 1000000.0 + 0.5)
       |    / 1000000.0 AS ttr6,
       |  floor(CAST(n_hapax AS DOUBLE) / n_tokens * 1000000.0 + 0.5)
       |    / 1000000.0 AS hapax6,
       |  floor(n_types / sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0
       |    + 0.5) / 1000000.0 AS guiraud6
       |FROM agg ORDER BY doc_id""".stripMargin

  /** t16: the same conservative character-class regex counts and one
    * 1e-6-floored density chain, row-local.
    */
  val t16: String =
    s"""WITH n AS (
       |  SELECT doc_id, $Norm AS nt FROM documents
       |), c AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(nt, 'https?://[^ ]+')) AS INT)
       |      AS n_urls,
       |    CAST(len(regexp_extract_all(nt,
       |      '[a-z0-9.+_-]+@[a-z0-9-]+\\.[a-z0-9.]+')) AS INT) AS n_emails,
       |    CAST(len(regexp_extract_all(nt, '</?[a-z][^>]*>')) AS INT)
       |      AS n_tags,
       |    CAST(len(string_split(nt, ' ')) AS INT) AS n_ws_tokens
       |  FROM n
       |)
       |SELECT doc_id, n_urls, n_emails, n_tags, n_ws_tokens,
       |  floor(CAST(n_urls + n_emails + n_tags AS DOUBLE) / n_ws_tokens
       |    * 1000000.0 + 0.5) / 1000000.0 AS markup_density6
       |FROM c ORDER BY doc_id""".stripMargin

  /** t13: the same three regexp counts, one IEEE division per ratio,
    * identical constant chain, floored to 1e-6 BIGINTs.
    */
  val t13: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    len(regexp_extract_all($Norm, '[a-z]+')) AS w,
       |    len(regexp_extract_all($Norm, '[aeiouy]+')) AS sy,
       |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS se
       |  FROM documents
       |)
       |SELECT doc_id, CAST(w AS INT) AS n_words,
       |  CAST(se AS INT) AS n_sentences, CAST(sy AS INT) AS n_syllables,
       |  CAST(floor((206.835 - 1.015 * (CAST(w AS DOUBLE) / se)
       |    - 84.6 * (CAST(sy AS DOUBLE) / w)) * 1000000.0 + 0.5)
       |    AS BIGINT) AS fre6,
       |  CAST(floor((0.39 * (CAST(w AS DOUBLE) / se)
       |    + 11.8 * (CAST(sy AS DOUBLE) / w) - 15.59) * 1000000.0 + 0.5)
       |    AS BIGINT) AS fkgl6
       |FROM f WHERE w > 0
       |ORDER BY doc_id""".stripMargin

  val t12: String =
    s"""WITH st AS (
       |  SELECT source, unnest(regexp_extract_all($Norm, '[a-z0-9]+'))
       |    AS term
       |  FROM documents
       |), c AS (
       |  SELECT source, term, count(*) AS c FROM st GROUP BY 1, 2
       |), tot AS (
       |  SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY 1
       |), src AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS ns,
       |    count(*) AS n_terms
       |  FROM c GROUP BY 1
       |), gl AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS n_all, count(*) AS v FROM tot
       |), pr AS (
       |  SELECT c.source,
       |    (c.c + 1) / CAST(src.ns + gl.v AS DOUBLE) AS ps,
       |    (tot.ct + 1) / CAST(gl.n_all + gl.v AS DOUBLE) AS p
       |  FROM c JOIN tot USING (term) JOIN src USING (source)
       |  CROSS JOIN gl
       |), t9 AS (
       |  SELECT source,
       |    CAST(floor(ps * ln(ps / p) * 1.0e9 + 0.5) AS BIGINT) AS t9
       |  FROM pr
       |)
       |SELECT s.source, s.ns AS n_tokens, s.n_terms,
       |  CAST(sum(t.t9) AS BIGINT) AS kl9
       |FROM t9 t JOIN src s USING (source)
       |GROUP BY 1, 2, 3
       |ORDER BY 1""".stripMargin

  /** d08: the same benchmark slice (doc_id % 20 = 0), same word
    * 3-grams. The oracle dedups (doc, gram) before the overlap join;
    * the engine joins raw pairs and dedups the hits with
    * count_distinct — identical n_shared either way.
    */
  val d08: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT doc_id, ${ngListSql(3)} AS ngrams FROM w
       |), bench AS (
       |  SELECT DISTINCT unnest(ngrams) AS gram FROM g WHERE doc_id % 20 = 0
       |), train AS (
       |  SELECT DISTINCT doc_id, unnest(ngrams) AS gram FROM g
       |  WHERE doc_id % 20 != 0
       |)
       |SELECT t.doc_id, count(*) AS n_shared, min(t.gram) AS example_gram
       |FROM train t JOIN bench b ON t.gram = b.gram
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  /** d08 clean(): the composable artifact — the training corpus with
    * contaminated doc_ids anti-joined away.
    */
  val d08Clean: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT doc_id, ${ngListSql(3)} AS ngrams FROM w
       |), bench AS (
       |  SELECT DISTINCT unnest(ngrams) AS gram FROM g WHERE doc_id % 20 = 0
       |), train AS (
       |  SELECT DISTINCT doc_id, unnest(ngrams) AS gram FROM g
       |  WHERE doc_id % 20 != 0
       |), bad AS (
       |  SELECT DISTINCT t.doc_id FROM train t JOIN bench b ON t.gram = b.gram
       |)
       |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
       |FROM documents d
       |WHERE d.doc_id % 20 != 0
       |  AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)
       |ORDER BY d.doc_id""".stripMargin

  private def entropySql(splitExpr: String): String =
    s"""SELECT doc_id, -CAST(sum(term_s) AS DOUBLE) / 1e9 AS h FROM (
       |  SELECT doc_id,
       |    CAST(floor(p * (ln(p) / 0.6931471805599453) * 1e9 + 0.5) AS BIGINT)
       |      AS term_s
       |  FROM (
       |    SELECT doc_id, n / CAST(sum(n) OVER (PARTITION BY doc_id) AS DOUBLE) AS p
       |    FROM (
       |      SELECT doc_id, sym, count(*) AS n FROM (
       |        SELECT doc_id, unnest($splitExpr) AS sym FROM documents
       |      ) GROUP BY doc_id, sym
       |    )
       |  )
       |) GROUP BY doc_id""".stripMargin

  val t05: String =
    s"""WITH ch AS (${entropySql(s"string_split($Norm, '')")}),
       |     wd AS (${entropySql(s"string_split($Norm, ' ')")})
       |SELECT ch.doc_id,
       |  floor(ch.h * 1000000.0 + 0.5) / 1000000.0 AS char_entropy,
       |  floor(wd.h * 1000000.0 + 0.5) / 1000000.0 AS word_entropy
       |FROM ch JOIN wd ON ch.doc_id = wd.doc_id
       |ORDER BY ch.doc_id""".stripMargin

  private val RollFold =
    "(acc, x) -> (acc * 31 + x) % 1000000007"

  /** p07: one scan of row-local integer features (d13's token count,
    * t04's fingerprint fold), one shard groupBy, ⌈tokens/512⌉ chunks.
    */
  val p07: String =
    s"""WITH tok AS (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]'))
       |      AS BIGINT) AS n_tok,
       |    CASE WHEN length($Norm) = 0 THEN NULL ELSE
       |      list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split($Norm, ''),
       |          c -> CAST(unicode(c) AS BIGINT))), $RollFold) END AS fp
       |  FROM documents
       |), agg AS (
       |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(min(doc_id) AS BIGINT) AS min_doc,
       |    CAST(max(doc_id) AS BIGINT) AS max_doc,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |    CAST(sum(fp) AS BIGINT) AS checksum
       |  FROM tok GROUP BY shard
       |)
       |SELECT shard, n_docs, min_doc, max_doc, n_tokens,
       |  CAST((n_tokens + 511) // 512 AS BIGINT) AS n_seqs,
       |  CAST(((n_tokens + 511) // 512) * 512 - n_tokens AS BIGINT)
       |    AS pad_tokens,
       |  checksum
       |FROM agg ORDER BY shard""".stripMargin

  val t04: String =
    s"""WITH n AS (
       |  SELECT doc_id, $Norm AS norm FROM documents
       |), f AS (
       |  SELECT doc_id,
       |    CASE WHEN length(norm) = 0 THEN NULL ELSE
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(norm, ''),
       |        c -> CAST(unicode(c) AS BIGINT))), $RollFold) END AS fp_full,
       |    CASE WHEN length(norm) = 0 THEN NULL ELSE
       |    list_min(list_transform(
       |      generate_series(0, CAST(floor((length(norm) - 1) / 128.0) AS BIGINT)),
       |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(string_split(substr(norm, CAST(1 + i * 128 AS BIGINT), 128), ''),
       |          c -> CAST(unicode(c) AS BIGINT))), $RollFold))) END AS fp_min_block
       |  FROM n
       |)
       |SELECT doc_id, fp_full, fp_min_block FROM f ORDER BY doc_id""".stripMargin

  /** m01: the decoded-image features in closed form. The Spark side
    * synthesizes a gray PNG per doc (dims 8..32, pixel = linear
    * congruential in (x, y)) and decodes it with javax.imageio; PNG is
    * lossless, so the decoded statistics equal this exact integer
    * arithmetic over generate_series.
    */
  val m01: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(8 + doc_id % 25 AS INT) AS width,
      |    CAST(8 + (doc_id * 7) % 25 AS INT) AS height
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, width, height, unnest(range(width)) AS x FROM d
      |), xy AS (
      |  SELECT media_id, width, height, x, unnest(range(height)) AS y FROM xs
      |), px AS (
      |  SELECT media_id, width, height,
      |    SUM((media_id * 31 + x * 7 + y * 13) % 256) AS px_sum,
      |    MIN((media_id * 31 + x * 7 + y * 13) % 256) AS px_min,
      |    MAX((media_id * 31 + x * 7 + y * 13) % 256) AS px_max
      |  FROM xy GROUP BY 1, 2, 3
      |)
      |SELECT media_id, width, height,
      |  CAST(px_sum AS BIGINT) AS px_sum,
      |  CAST(px_min AS INT) AS px_min,
      |  CAST(px_max AS INT) AS px_max,
      |  CAST(floor(width * 10.0 / height) AS INT) AS aspect_bucket
      |FROM px ORDER BY media_id""".stripMargin

  /** m10: the m01 closed-form pixel grid re-aggregated into exposure
    * bins; integer floor-division mean, division-free majority flags.
    */
  val m10: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(8 + doc_id % 25 AS INT) AS width,
      |    CAST(8 + (doc_id * 7) % 25 AS INT) AS height
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, width, height, unnest(range(width)) AS x FROM d
      |), xy AS (
      |  SELECT media_id, width, height, x, unnest(range(height)) AS y FROM xs
      |), v AS (
      |  SELECT media_id, width, height,
      |    (media_id * 31 + x * 7 + y * 13) % 256 AS px
      |  FROM xy
      |), px AS (
      |  SELECT media_id, width, height,
      |    SUM(px) AS s,
      |    SUM(CASE WHEN px < 32 THEN 1 ELSE 0 END) AS nu,
      |    SUM(CASE WHEN px >= 224 THEN 1 ELSE 0 END) AS no,
      |    MIN(px) AS mn, MAX(px) AS mx
      |  FROM v GROUP BY 1, 2, 3
      |)
      |SELECT media_id, width, height,
      |  CAST(s AS BIGINT) * 1000000 // (width * height) AS mean_l6,
      |  CAST(nu AS BIGINT) AS n_under,
      |  CAST(no AS BIGINT) AS n_over,
      |  CAST(mx - mn AS INT) AS dyn_range,
      |  CAST(CASE WHEN nu * 2 > width * height THEN 1 ELSE 0 END AS INT)
      |    AS underexposed,
      |  CAST(CASE WHEN no * 2 > width * height THEN 1 ELSE 0 END AS INT)
      |    AS overexposed,
      |  CAST(CASE WHEN mx - mn < 64 THEN 1 ELSE 0 END AS INT)
      |    AS low_contrast
      |FROM px ORDER BY media_id""".stripMargin

  /** t06: TF-IDF top terms — integer tf/df, one ln() quantized at
    * 1e-6 (t05 proved ln parity at 1e-9).
    */
  /** d09: the same add-1-smoothed log-ratio scoring — integer counts
    * (HUGEINT sums cast back to BIGINT), one double division + one
    * ln() per word quantized at 1e-9, exact integer per-doc sums,
    * top-frac selection by (weight desc, doc_id).
    */
  val d09: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all($Norm, '[a-z0-9]+')) AS w
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, w, count(*) AS n FROM tok GROUP BY 1, 2
       |), vocab AS (
       |  SELECT w,
       |    CAST(sum(CASE WHEN doc_id % 20 = 0 THEN n ELSE 0 END) AS BIGINT)
       |      AS ct,
       |    CAST(sum(CASE WHEN doc_id % 20 != 0 THEN n ELSE 0 END) AS BIGINT)
       |      AS cr
       |  FROM tf GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr,
       |    count(*) AS v
       |  FROM vocab
       |), scored AS (
       |  SELECT w, CAST(floor(ln(
       |      CAST((ct + 1) * (nr + v) AS DOUBLE) /
       |      CAST((cr + 1) * (nt + v) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
       |    AS s_e9
       |  FROM vocab CROSS JOIN tot
       |), dw AS (
       |  SELECT t.doc_id, CAST(sum(t.n) AS BIGINT) AS n_tok,
       |    CAST(sum(t.n * s.s_e9) AS BIGINT) AS w_e9
       |  FROM tf t JOIN scored s USING (w)
       |  WHERE t.doc_id % 20 != 0
       |  GROUP BY 1
       |), alldocs AS (
       |  SELECT d.doc_id, coalesce(dw.n_tok, 0) AS n_tok,
       |    coalesce(dw.w_e9, 0) AS w_e9
       |  FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id
       |  WHERE d.doc_id % 20 != 0
       |), k AS (
       |  SELECT CAST(floor(count(*) * 0.1) AS BIGINT) AS k FROM alldocs
       |), ranked AS (
       |  SELECT doc_id, n_tok, w_e9,
       |    row_number() OVER (ORDER BY w_e9 DESC, doc_id) AS rk
       |  FROM alldocs
       |)
       |SELECT doc_id, n_tok, CAST(w_e9 AS DOUBLE) / 1e9 AS weight,
       |  CASE WHEN rk <= k THEN 1 ELSE 0 END AS selected
       |FROM ranked CROSS JOIN k ORDER BY doc_id""".stripMargin

  val t06: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all($Norm, '[a-z0-9]+')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), n AS (
       |  SELECT count(*) AS n_docs FROM documents
       |), scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    floor(tf.tf * (ln(CAST(n_docs + 1 AS DOUBLE) /
       |      CAST(df.df + 1 AS DOUBLE)) + 1.0) * 1000000.0 + 0.5)
       |      / 1000000.0 AS score6
       |  FROM tf JOIN df USING (term) CROSS JOIN n
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score6 DESC, term) AS rk
       |  FROM scored
       |)
       |SELECT doc_id, rk, term, tf, df, score6 FROM ranked WHERE rk <= 5
       |ORDER BY doc_id, rk""".stripMargin

  /** t07: BM25 ranking for the fixed query — per-term contributions
    * quantized to BIGINT before the per-doc sum (order-free), one
    * ln() per (doc, term).
    */
  val t07: String = {
    val terms = TextFns.Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all($Norm, '[a-z0-9]+')) AS term
       |  FROM documents
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
       |), stats AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tok
       |  WHERE term IN ($terms) GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), contrib AS (
       |  SELECT tf.doc_id,
       |    CAST(floor(ln(1.0 + (n_docs - df.df + 0.5) / (df.df + 0.5))
       |      * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
       |      * 1000000.0 + 0.5) AS BIGINT) AS c6
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stats
       |), scored AS (
       |  SELECT doc_id, sum(c6) / 1000000.0 AS score6,
       |    count(*) AS n_terms_hit
       |  FROM contrib GROUP BY 1
       |), ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY score6 DESC, doc_id) AS rk
       |  FROM scored
       |)
       |SELECT rk, doc_id, score6, n_terms_hit FROM ranked WHERE rk <= 10
       |ORDER BY rk""".stripMargin
  }

  /** t08: bigram perplexity — integer counts, one ln() per bigram
    * occurrence quantized at 1e-9, order-free per-doc BIGINT sums.
    */
  val t08: String =
    s"""WITH tk AS (
       |  SELECT doc_id, regexp_extract_all($Norm, '[a-z0-9]+') AS toks
       |  FROM documents
       |), bg AS (
       |  SELECT doc_id, b[1] AS v, b[2] AS w FROM (
       |    SELECT doc_id,
       |      unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS b
       |    FROM tk WHERE len(toks) >= 2
       |  )
       |), cvw AS (
       |  SELECT v, w, count(*) AS cvw FROM bg GROUP BY 1, 2
       |), cv AS (
       |  SELECT v, sum(cvw) AS cv FROM cvw GROUP BY 1
       |), vocab AS (
       |  SELECT count(DISTINCT t) AS vsize FROM (
       |    SELECT unnest(regexp_extract_all($Norm, '[a-z0-9]+')) AS t
       |    FROM documents
       |  )
       |), scored AS (
       |  SELECT bg.doc_id,
       |    CAST(floor(ln(CAST(cv + vsize AS DOUBLE) / CAST(cvw + 1 AS DOUBLE))
       |      * 1.0e9 + 0.5) AS BIGINT) AS nll9
       |  FROM bg JOIN cvw USING (v, w) JOIN cv USING (v) CROSS JOIN vocab
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  (CAST(sum(nll9) AS DOUBLE) / 1.0e9) / count(*) AS avg_nll
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** t22: PMI collocations — exact counts, ONE ln over the identical
    * left-assoc double chain, totally tie-broken top-K.
    */
  val t22: String =
    s"""WITH tk AS (
       |  SELECT doc_id, regexp_extract_all($Norm, '[a-z0-9]+') AS toks
       |  FROM documents
       |), uni AS (
       |  SELECT t, count(*) AS c FROM (
       |    SELECT unnest(toks) AS t FROM tk
       |  ) GROUP BY 1
       |), tot AS (
       |  SELECT sum(c) AS n1 FROM uni
       |), bg AS (
       |  SELECT b[1] AS w1, b[2] AS w2 FROM (
       |    SELECT unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)]))
       |      AS b
       |    FROM tk WHERE len(toks) >= 2
       |  )
       |), nbt AS (
       |  SELECT count(*) AS nb FROM bg
       |), c12 AS (
       |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
       |  HAVING count(*) >= 5
       |), scored AS (
       |  SELECT c12.w1, c12.w2, c12.c12, u1.c AS c1, u2.c AS c2,
       |    CAST(floor(ln(CAST(c12.c12 AS DOUBLE) * n1 / u1.c / u2.c
       |      * n1 / nb) * 1000000.0 + 0.5) AS BIGINT) AS pmi6
       |  FROM c12
       |  JOIN uni u1 ON c12.w1 = u1.t
       |  JOIN uni u2 ON c12.w2 = u2.t
       |  CROSS JOIN tot CROSS JOIN nbt
       |)
       |SELECT w1, w2, c12, CAST(c1 AS BIGINT) AS c1,
       |  CAST(c2 AS BIGINT) AS c2, pmi6
       |FROM scored
       |ORDER BY pmi6 DESC, w1, w2 LIMIT 200""".stripMargin

  /** t23: the same ordered length-filtered token stream, distinct
    * consecutive-pair edges, and s12's five MATERIALIZED integer
    * PageRank iterations over the token graph; top 20 by (rank,
    * token) with document frequency.
    */
  val t23: String = {
    val iters = (1 to 5).map { k =>
      s"""it$k AS MATERIALIZED (
         |  SELECT nd.tok,
         |    (15 * (SELECT 1000000000 // nn FROM cnt)) // 100
         |      + (85 * coalesce(sm.m, 0)) // 100 AS r
         |  FROM nodes nd LEFT JOIN (
         |    SELECT g.nbr_id AS tok, SUM(p.r // od.deg) AS m
         |    FROM g JOIN it${k - 1} p ON p.tok = g.node_id
         |    JOIN od ON od.node_id = g.node_id
         |    GROUP BY 1) sm ON sm.tok = nd.tok
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH fl AS (
       |  SELECT doc_id,
       |    list_filter(regexp_extract_all($Norm, '[a-z0-9]+'),
       |      x -> length(x) >= 4) AS fl
       |  FROM documents
       |), seq AS (
       |  SELECT doc_id, unnest(fl) AS t,
       |    unnest(range(1, len(fl) + 1)) AS pos
       |  FROM fl
       |), adj AS (
       |  SELECT doc_id, t AS a,
       |    lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS b
       |  FROM seq
       |), e0 AS (
       |  SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y
       |  FROM adj WHERE b IS NOT NULL AND a <> b
       |), g AS (
       |  SELECT x AS node_id, y AS nbr_id FROM e0
       |  UNION ALL SELECT y, x FROM e0
       |), nodes AS (
       |  SELECT DISTINCT t AS tok FROM seq
       |), cnt AS (
       |  SELECT count(*) AS nn FROM nodes
       |), od AS (
       |  SELECT node_id, count(*) AS deg FROM g GROUP BY 1
       |), it0 AS MATERIALIZED (
       |  SELECT tok, 1000000000 // nn AS r FROM nodes, cnt
       |), $iters, dfreq AS (
       |  SELECT t AS tok, count(DISTINCT doc_id) AS n_docs FROM seq
       |  GROUP BY 1
       |), ranked AS (
       |  SELECT tok, r,
       |    row_number() OVER (ORDER BY r DESC, tok) AS krk
       |  FROM it5
       |)
       |SELECT CAST(krk AS INT) AS keyword_rank, tok AS token,
       |  CAST(r AS BIGINT) AS pagerank9, dfreq.n_docs
       |FROM ranked JOIN dfreq USING (tok)
       |WHERE krk <= 20
       |ORDER BY krk""".stripMargin
  }

  /** t20: Kneser–Ney bigram perplexity — exact BIGINT type/token
    * counts, the interpolated-KN probability as the SAME IEEE operator
    * tree as the Spark side, one ln() per bigram type quantized at
    * 1e-9, order-free per-doc BIGINT sums.
    */
  val t20: String =
    s"""WITH tk AS (
       |  SELECT doc_id, regexp_extract_all($Norm, '[a-z0-9]+') AS toks
       |  FROM documents
       |), bg AS (
       |  SELECT doc_id, b[1] AS v, b[2] AS w FROM (
       |    SELECT doc_id,
       |      unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)])) AS b
       |    FROM tk WHERE len(toks) >= 2
       |  )
       |), cvw AS (
       |  SELECT v, w, count(*) AS cvw FROM bg GROUP BY 1, 2
       |), cv AS (
       |  SELECT v, sum(cvw) AS cv, count(*) AS n1v FROM cvw GROUP BY 1
       |), n1w AS (
       |  SELECT w, count(*) AS n1w FROM cvw GROUP BY 1
       |), n1tot AS (
       |  SELECT count(*) AS n1tot FROM cvw
       |), scored AS (
       |  SELECT bg.doc_id,
       |    CAST(floor(-ln(
       |      (CAST(cvw AS DOUBLE) - 0.75) / CAST(cv AS DOUBLE)
       |        + (0.75 * CAST(n1v AS DOUBLE) / CAST(cv AS DOUBLE))
       |          * (CAST(n1w AS DOUBLE) / CAST(n1tot AS DOUBLE))
       |    ) * 1.0e9 + 0.5) AS BIGINT) AS nll9
       |  FROM bg JOIN cvw USING (v, w) JOIN cv USING (v)
       |    JOIN n1w USING (w) CROSS JOIN n1tot
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  (CAST(sum(nll9) AS DOUBLE) / 1.0e9) / count(*) AS avg_nll
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** s10: filtered top-k — s01 with the label predicate INSIDE the
    * candidate join.
    */
  val s10: String =
    s"""WITH v AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), n AS (
       |  SELECT vec_id, label, v, ${dotSql("v", "v")} AS norm2 FROM v
       |), scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id, c.label,
       |    floor(${dotSql("q.v", "c.v")} / sqrt(q.norm2 * c.norm2)
       |      * 1000000.0 + 0.5) / 1000000.0 AS cos6
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id AND c.label = q.label
       |  WHERE q.vec_id < 10
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos6 DESC, vec_id) AS rk
       |  FROM scored
       |)
       |SELECT query_id, rk, vec_id, label, cos6 FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin

  /** s04: majority-vote kNN classification over the s01 top-k set —
    * tie-break (votes desc, nearest-neighbour rank, label).
    */
  val s04: String =
    s"""WITH nn AS ($s01),
       |votes AS (
       |  SELECT nn.query_id, e.label, count(*) AS votes,
       |    min(nn.rk) AS best_rk
       |  FROM nn JOIN embeddings e ON e.vec_id = nn.vec_id
       |  GROUP BY 1, 2
       |), pred AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY votes DESC, best_rk, label) AS rn
       |  FROM votes
       |)
       |SELECT p.query_id, t.label AS true_label,
       |  p.label AS predicted_label, p.votes
       |FROM pred p JOIN embeddings t ON t.vec_id = p.query_id
       |WHERE p.rn = 1 ORDER BY p.query_id""".stripMargin

  /** m02: the decoded-audio features in closed form — PCM roundtrips
    * samples exactly, so the parsed WAV statistics equal this integer
    * arithmetic over generate_series (same design as m01).
    */
  val m02: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
      |    CAST(200 + (doc_id * 11) % 300 AS BIGINT) AS n_samples
      |  FROM documents
      |), v AS (
      |  SELECT media_id, sample_rate, n_samples, i,
      |    (media_id * 31 + i * 17) % 65536 - 32768 AS smp
      |  FROM (SELECT *, unnest(range(n_samples)) AS i FROM d)
      |), agg AS (
      |  SELECT media_id, sample_rate, n_samples,
      |    SUM(CAST(smp AS HUGEINT) * smp) AS sq_sum,
      |    MAX(abs(smp)) AS peak,
      |    SUM(CASE WHEN i < n_samples - 1 AND
      |      ((smp < 0) !=
      |       (((media_id * 31 + (i + 1) * 17) % 65536 - 32768) < 0))
      |      THEN 1 ELSE 0 END) AS zero_crossings
      |  FROM v GROUP BY 1, 2, 3
      |)
      |SELECT media_id, sample_rate, n_samples,
      |  n_samples * 1000 // sample_rate AS duration_ms,
      |  CAST(peak AS INT) AS peak,
      |  CAST(sq_sum AS BIGINT) AS sq_sum,
      |  CAST(zero_crossings AS BIGINT) AS zero_crossings
      |FROM agg ORDER BY media_id""".stripMargin

  /** m07: silence/clipping triage in closed form — per-frame max |s|
    * over 25-sample frames of the m02 synthesis formula (tail partial
    * frame dropped, matching the engine's integer frame count), then
    * counts and the leading/trailing silent runs.
    */
  val m07: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(200 + (doc_id * 11) % 300 AS BIGINT) AS n_samples
      |  FROM documents
      |), v AS (
      |  SELECT media_id, i // 25 AS f,
      |    abs((media_id * 31 + i * 17) % 65536 - 32768) AS a
      |  FROM (SELECT *, unnest(range(n_samples)) AS i FROM d)
      |  WHERE i < (n_samples // 25) * 25
      |), fr AS (
      |  SELECT media_id, f, max(a) AS maxabs FROM v GROUP BY 1, 2
      |)
      |SELECT media_id,
      |  CAST(count(*) AS INT) AS n_frames,
      |  CAST(sum(CASE WHEN maxabs < 8192 THEN 1 ELSE 0 END) AS INT)
      |    AS n_silent,
      |  CAST(sum(CASE WHEN maxabs >= 32700 THEN 1 ELSE 0 END) AS INT)
      |    AS n_clipped,
      |  CAST(coalesce(min(CASE WHEN maxabs >= 8192 THEN f END), count(*))
      |    AS INT) AS lead_silent,
      |  CAST(CASE WHEN max(CASE WHEN maxabs >= 8192 THEN f END) IS NULL
      |    THEN count(*)
      |    ELSE count(*) - 1 - max(CASE WHEN maxabs >= 8192 THEN f END)
      |    END AS INT) AS tail_silent
      |FROM fr GROUP BY media_id ORDER BY media_id""".stripMargin

  /** m04: the nearest-neighbour 16×16 thumbnail statistics in closed
    * form — the NN forward map picks source pixel (x·w//16, y·h//16),
    * so the resampled grays are the m01 synthesis formula at those
    * coordinates.
    */
  val m04: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(8 + doc_id % 25 AS INT) AS src_width,
      |    CAST(8 + (doc_id * 7) % 25 AS INT) AS src_height
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, src_width, src_height, unnest(range(16)) AS x FROM d
      |), xy AS (
      |  SELECT media_id, src_width, src_height, x, unnest(range(16)) AS y
      |  FROM xs
      |), px AS (
      |  SELECT media_id, src_width, src_height,
      |    SUM((media_id * 31 + (x * src_width // 16) * 7 +
      |         (y * src_height // 16) * 13) % 256) AS px_sum,
      |    MIN((media_id * 31 + (x * src_width // 16) * 7 +
      |         (y * src_height // 16) * 13) % 256) AS px_min,
      |    MAX((media_id * 31 + (x * src_width // 16) * 7 +
      |         (y * src_height // 16) * 13) % 256) AS px_max
      |  FROM xy GROUP BY 1, 2, 3
      |)
      |SELECT media_id, src_width, src_height,
      |  CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
      |  CAST(px_sum AS BIGINT) AS px_sum,
      |  CAST(px_min AS INT) AS px_min,
      |  CAST(px_max AS INT) AS px_max
      |FROM px ORDER BY media_id""".stripMargin

  /** m03: the stride-sampled video frame features in closed form —
    * frames are lossless PNG with content deterministic in
    * (media_id, frame_idx), so the sampled-frame statistics equal
    * this integer arithmetic over generate_series (same design as
    * m01/m02; stride 3 mirrors `Video.FrameStride`).
    */
  /** m05: consecutive-frame mean absolute delta from the same
    * closed-form pixel function — pair f vs f-1, exact integer sums,
    * 1e-6 quantized mean, 30.0 threshold.
    */
  val m05: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(4 + doc_id % 9 AS INT) AS n_frames,
      |    CAST(8 + doc_id % 17 AS INT) AS width,
      |    CAST(8 + (doc_id * 5) % 17 AS INT) AS height
      |  FROM documents
      |), fr AS (
      |  SELECT media_id, width, height, unnest(range(1, n_frames)) AS f
      |  FROM d
      |), xs AS (
      |  SELECT media_id, width, height, f, unnest(range(width)) AS x
      |  FROM fr
      |), xy AS (
      |  SELECT media_id, width, height, f, x, unnest(range(height)) AS y
      |  FROM xs
      |), px AS (
      |  SELECT media_id, f, width, height,
      |    SUM(abs(((media_id * 31 + f * 17 + x * 7 + y * 13) % 256)
      |          - ((media_id * 31 + (f - 1) * 17 + x * 7 + y * 13) % 256)))
      |      AS sum_abs
      |  FROM xy GROUP BY 1, 2, 3, 4
      |)
      |SELECT media_id, CAST(f AS INT) AS frame_idx, width, height,
      |  CAST(sum_abs AS BIGINT) AS abs_delta_sum,
      |  floor(CAST(sum_abs AS DOUBLE) / (width * height) * 1e6 + 0.5) / 1e6
      |    AS mean_delta6,
      |  CASE WHEN floor(CAST(sum_abs AS DOUBLE) / (width * height) * 1e6
      |      + 0.5) / 1e6 > 30.0 THEN 1 ELSE 0 END AS scene_change
      |FROM px ORDER BY media_id, frame_idx""".stripMargin

  /** m06: the aHash fingerprints in closed form — 8×8 NN samples of
    * the deterministic pixel function, division-free threshold
    * (p·64 > Σp), bitmap packed into two 32-bit BIGINT halves, then a
    * brute-force hamming join at radius 3 (the oracle can afford
    * all-pairs at sf; the engine's band join must emit the identical
    * pair set).
    */
  val m06: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(8 + doc_id % 25 AS INT) AS w,
      |    CAST(8 + (doc_id * 7) % 25 AS INT) AS h
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(8)) AS x FROM d
      |), xy AS (
      |  SELECT media_id, w, h, x, unnest(range(8)) AS y FROM xs
      |), sam AS (
      |  SELECT media_id, x, y,
      |    (media_id * 31 + (x * w // 8) * 7 + (y * h // 8) * 13) % 256 AS p
      |  FROM xy
      |), st AS (
      |  SELECT media_id, SUM(p) AS s FROM sam GROUP BY 1
      |), bits AS (
      |  SELECT sam.media_id,
      |    CAST(SUM(CASE WHEN p * 64 > s AND y * 8 + x < 32
      |      THEN (1::BIGINT << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS h_lo,
      |    CAST(SUM(CASE WHEN p * 64 > s AND y * 8 + x >= 32
      |      THEN (1::BIGINT << (y * 8 + x - 32)) ELSE 0 END) AS BIGINT) AS h_hi
      |  FROM sam JOIN st ON sam.media_id = st.media_id
      |  GROUP BY 1
      |)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(bit_count(xor(a.h_lo, b.h_lo))
      |     + bit_count(xor(a.h_hi, b.h_hi)) AS INT) AS dist
      |FROM bits a JOIN bits b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.h_lo, b.h_lo))
      |    + bit_count(xor(a.h_hi, b.h_hi)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** m11: every dHash recomputed from the closed-form pixel function
    * (9×8 NN grid, left < right bits), brute-forced ≤3 pairs.
    */
  val m11: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(8 + doc_id % 25 AS INT) AS w,
      |    CAST(8 + (doc_id * 7) % 25 AS INT) AS h
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(9)) AS x FROM d
      |), xy AS (
      |  SELECT media_id, w, h, x, unnest(range(8)) AS y FROM xs
      |), sam AS (
      |  SELECT media_id, x, y,
      |    (media_id * 31 + (x * w // 9) * 7 + (y * h // 8) * 13) % 256 AS p
      |  FROM xy
      |), bits AS (
      |  SELECT l.media_id,
      |    CAST(SUM(CASE WHEN l.p < rr.p AND l.y * 8 + l.x < 32
      |      THEN (1::BIGINT << (l.y * 8 + l.x)) ELSE 0 END) AS BIGINT)
      |      AS h_lo,
      |    CAST(SUM(CASE WHEN l.p < rr.p AND l.y * 8 + l.x >= 32
      |      THEN (1::BIGINT << (l.y * 8 + l.x - 32)) ELSE 0 END) AS BIGINT)
      |      AS h_hi
      |  FROM sam l JOIN sam rr ON rr.media_id = l.media_id
      |    AND rr.y = l.y AND rr.x = l.x + 1
      |  WHERE l.x < 8
      |  GROUP BY 1
      |)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(bit_count(xor(a.h_lo, b.h_lo))
      |     + bit_count(xor(a.h_hi, b.h_hi)) AS INT) AS dist
      |FROM bits a JOIN bits b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.h_lo, b.h_lo))
      |    + bit_count(xor(a.h_hi, b.h_hi)) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** m08: per-sampled-frame aHash in closed form (m03's frame grid ×
    * m06's bit packing, video pixel formula), distinct hash sets per
    * video, >100-video hashes dropped, all-pairs overlap verify.
    */
  /** m09: the near-dup audio table in closed form — clips are the
    * m02 synthetics plus re-uploaded copies (media_id + 10000, 3/5
    * trim) for every 10th clip; frame fingerprints replay the
    * (acc·31 + s) mod 1e9+7 fold over the sample generator
    * (s + 32768 cancels the generator's −32768 centering), then
    * m08's stoplist/equi-join/min-denominator overlap.
    */
  val m09: String =
    """WITH ids AS (
      |  SELECT doc_id FROM documents
      |), clips AS (
      |  SELECT doc_id AS media_id, doc_id AS src,
      |    CAST(200 + (doc_id * 11) % 300 AS BIGINT) AS n
      |  FROM ids
      |  UNION ALL
      |  SELECT doc_id + 10000, doc_id,
      |    CAST(((200 + (doc_id * 11) % 300) * 3) // 5 AS BIGINT)
      |  FROM ids WHERE doc_id % 10 = 0
      |), fr AS (
      |  SELECT media_id, src, unnest(range(n // 25)) AS f FROM clips
      |), fh AS (
      |  SELECT DISTINCT media_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(0, 24),
      |        k -> (src * 31 + (f * 25 + k) * 17) % 65536)),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
      |  FROM fr
      |), hot AS (
      |  SELECT h FROM fh GROUP BY h HAVING count(*) > 100
      |), cold AS (
      |  SELECT fh.media_id, fh.h FROM fh
      |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.h = fh.h)
      |), sz AS (
      |  SELECT media_id, count(*) AS n FROM cold GROUP BY 1
      |), p AS (
      |  SELECT a.media_id AS id_a, b.media_id AS id_b,
      |    count(*) AS n_shared
      |  FROM cold a JOIN cold b ON b.h = a.h AND a.media_id < b.media_id
      |  GROUP BY 1, 2
      |)
      |SELECT p.id_a, p.id_b, p.n_shared, sa.n AS n_a, sb.n AS n_b,
      |  CAST(p.n_shared AS DOUBLE) / least(sa.n, sb.n) AS overlap
      |FROM p JOIN sz sa ON sa.media_id = p.id_a
      |       JOIN sz sb ON sb.media_id = p.id_b
      |WHERE CAST(p.n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5
      |ORDER BY p.id_a, p.id_b""".stripMargin

  val m08: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(4 + doc_id % 9 AS INT) AS n_frames,
      |    CAST(8 + doc_id % 17 AS INT) AS w,
      |    CAST(8 + (doc_id * 5) % 17 AS INT) AS h
      |  FROM documents
      |), fr AS (
      |  SELECT media_id, w, h, unnest(range(n_frames)) AS f FROM d
      |), sampled AS (
      |  SELECT * FROM fr WHERE f % 3 = 0
      |), xs AS (
      |  SELECT media_id, w, h, f, unnest(range(8)) AS x FROM sampled
      |), xy AS (
      |  SELECT media_id, w, h, f, x, unnest(range(8)) AS y FROM xs
      |), sam AS (
      |  SELECT media_id, f, x, y,
      |    (media_id * 31 + f * 17 + (x * w // 8) * 7 + (y * h // 8) * 13)
      |      % 256 AS p
      |  FROM xy
      |), st AS (
      |  SELECT media_id, f, SUM(p) AS s FROM sam GROUP BY 1, 2
      |), bits AS (
      |  SELECT sam.media_id, sam.f,
      |    CAST(SUM(CASE WHEN p * 64 > s AND y * 8 + x < 32
      |      THEN (1::BIGINT << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS h_lo,
      |    CAST(SUM(CASE WHEN p * 64 > s AND y * 8 + x >= 32
      |      THEN (1::BIGINT << (y * 8 + x - 32)) ELSE 0 END) AS BIGINT)
      |      AS h_hi
      |  FROM sam JOIN st ON sam.media_id = st.media_id AND sam.f = st.f
      |  GROUP BY 1, 2
      |), hs AS (
      |  SELECT DISTINCT media_id, h_lo, h_hi FROM bits
      |), hot AS (
      |  SELECT h_lo, h_hi FROM hs GROUP BY 1, 2 HAVING count(*) > 100
      |), cold AS (
      |  SELECT * FROM hs
      |  WHERE NOT EXISTS (SELECT 1 FROM hot
      |    WHERE hot.h_lo = hs.h_lo AND hot.h_hi = hs.h_hi)
      |), sz AS (
      |  SELECT media_id, count(*) AS n FROM cold GROUP BY 1
      |), pairs AS (
      |  SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS n_shared
      |  FROM cold a JOIN cold b ON a.h_lo = b.h_lo AND a.h_hi = b.h_hi
      |    AND a.media_id < b.media_id
      |  GROUP BY 1, 2
      |)
      |SELECT p.id_a, p.id_b, p.n_shared, sa.n AS n_a, sb.n AS n_b,
      |  CAST(p.n_shared AS DOUBLE) / least(sa.n, sb.n) AS overlap
      |FROM pairs p
      |JOIN sz sa ON sa.media_id = p.id_a
      |JOIN sz sb ON sb.media_id = p.id_b
      |WHERE CAST(p.n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  val m03: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CAST(4 + doc_id % 9 AS INT) AS n_frames,
      |    CAST(8 + doc_id % 17 AS INT) AS width,
      |    CAST(8 + (doc_id * 5) % 17 AS INT) AS height
      |  FROM documents
      |), fr AS (
      |  SELECT media_id, n_frames, width, height, unnest(range(n_frames)) AS f
      |  FROM d
      |), sampled AS (
      |  SELECT * FROM fr WHERE f % 3 = 0
      |), xs AS (
      |  SELECT media_id, n_frames, width, height, f,
      |    unnest(range(width)) AS x
      |  FROM sampled
      |), xy AS (
      |  SELECT media_id, n_frames, width, height, f, x,
      |    unnest(range(height)) AS y
      |  FROM xs
      |), px AS (
      |  SELECT media_id, f, n_frames, width, height,
      |    SUM((media_id * 31 + f * 17 + x * 7 + y * 13) % 256) AS px_sum,
      |    MIN((media_id * 31 + f * 17 + x * 7 + y * 13) % 256) AS px_min,
      |    MAX((media_id * 31 + f * 17 + x * 7 + y * 13) % 256) AS px_max
      |  FROM xy GROUP BY 1, 2, 3, 4, 5
      |)
      |SELECT media_id, CAST(f AS INT) AS frame_idx, n_frames, width, height,
      |  CAST(px_sum AS BIGINT) AS px_sum,
      |  CAST(px_min AS INT) AS px_min,
      |  CAST(px_max AS INT) AS px_max
      |FROM px ORDER BY media_id, frame_idx""".stripMargin

  /** st07: the streaming corpus-prep result set — every feature is a
    * function of the normalized text, so the watermarkless streaming
    * dedup's survivor set is exactly SELECT DISTINCT.
    */
  val st07: String = {
    val scores = TextFns.Profiles
      .map { case (l, st) => profileSql(l, st) }.mkString(",\n  ")
    val best = TextFns.Profiles.foldLeft(("'und'", "0")) {
      case ((langAcc, scoreAcc), (l, _)) =>
        (s"CASE WHEN score_$l > $scoreAcc THEN '$l' ELSE $langAcc END",
          s"greatest($scoreAcc, score_$l)")
    }._1
    s"""WITH scored AS (
       |  SELECT md5($Norm) AS norm_hash, $scores,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]')) AS INT)
       |      AS re_tokens
       |  FROM documents
       |)
       |SELECT DISTINCT norm_hash, $best AS predicted_lang, re_tokens
       |FROM scored ORDER BY norm_hash""".stripMargin
  }

  /** st12: the admitted SET is digest-functional, so plain SQL — batch
    * slice digests minus the index's, one row per distinct digest.
    */
  val st12: String =
    s"""WITH b AS (
       |  SELECT md5($Norm) AS norm_hash,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]')) AS INT)
       |      AS re_tokens
       |  FROM documents WHERE doc_id % 10 = 7
       |), i AS (
       |  SELECT DISTINCT md5($Norm) AS norm_hash
       |  FROM documents WHERE doc_id % 10 <> 7
       |)
       |SELECT DISTINCT norm_hash, re_tokens FROM b
       |WHERE NOT EXISTS (SELECT 1 FROM i WHERE i.norm_hash = b.norm_hash)
       |ORDER BY norm_hash""".stripMargin

  /** p01: the corpus-prep composition — language ID + quality +
    * token count as one scan, dedup among the survivors.
    */
  val p01: String = {
    val scores = TextFns.Profiles
      .map { case (l, st) => profileSql(l, st) }.mkString(",\n  ")
    val best = TextFns.Profiles.foldLeft(("'und'", "0")) {
      case ((langAcc, scoreAcc), (l, _)) =>
        (s"CASE WHEN score_$l > $scoreAcc THEN '$l' ELSE $langAcc END",
          s"greatest($scoreAcc, score_$l)")
    }._1
    val stops = TextFns.Profiles.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id, source, $scores,
       |    length(text) AS n_char,
       |    len(string_split($Norm, ' ')) AS n_words,
       |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
       |    len(list_filter(string_split($Norm, ' '), w -> w IN ($stops))) AS n_stop,
       |    length($Norm) AS n_char_norm,
       |    len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]')) AS re_tokens,
       |    md5($Norm) AS norm_hash
       |  FROM documents
       |), r AS (
       |  SELECT *,
       |    CAST(n_char_norm - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
       |    CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       |    CAST(n_punct AS DOUBLE) / n_char AS punct_ratio
       |  FROM m
       |), f AS (
       |  SELECT doc_id, source, re_tokens, norm_hash, $best AS predicted_lang,
       |    floor((
       |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END) +
       |      (CASE WHEN avg_word_len BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END) +
       |      (CASE WHEN stop_ratio >= 0.01 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END)
       |    ) * 1000000.0 + 0.5) / 1000000.0 AS quality
       |  FROM r
       |), filtered AS (
       |  SELECT * FROM f WHERE predicted_lang = 'en' AND quality >= 0.5
       |), keep AS (
       |  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY norm_hash
       |)
       |SELECT doc_id, predicted_lang, quality, re_tokens, source
       |FROM filtered JOIN keep USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** t17: top-K vocab by (count desc, term asc), left join back,
    * exact integer floor-division rate.
    */
  val t17: String =
    s"""WITH toks AS (
       |  SELECT doc_id, w
       |  FROM (SELECT doc_id, unnest(string_split($Norm, ' ')) AS w
       |        FROM documents)
       |  WHERE len(w) > 0
       |), vocab AS (
       |  SELECT w, 1 AS iv FROM (
       |    SELECT w, count(*) AS c FROM toks GROUP BY w
       |    ORDER BY c DESC, w ASC LIMIT 16)
       |), agg AS (
       |  SELECT t.doc_id, count(*) AS n_tokens,
       |    CAST(sum(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_oov
       |  FROM toks t LEFT JOIN vocab v ON t.w = v.w
       |  GROUP BY t.doc_id
       |)
       |SELECT doc_id, n_tokens, n_oov,
       |  n_oov * 1000000 // n_tokens AS oov_rate6,
       |  CAST(CASE WHEN n_oov * 1000000 // n_tokens > 100000
       |    THEN 1 ELSE 0 END AS INT) AS oov_flag
       |FROM agg ORDER BY doc_id""".stripMargin

  /** t18: the same t03 regex tokens, ⌈(n−C)/S⌉+1 chunk counts and
    * 1-based inclusive list slices (C=32, S=24).
    */
  val t18: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]') AS toks
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n_tok_doc
       |  FROM d WHERE len(toks) > 0
       |), c AS (
       |  SELECT doc_id, toks, n_tok_doc,
       |    CASE WHEN n_tok_doc <= 32 THEN 1
       |         ELSE (n_tok_doc - 32 + 23) // 24 + 1 END AS n_chunks
       |  FROM n
       |), e AS (
       |  SELECT doc_id, toks, n_tok_doc,
       |    unnest(range(0, n_chunks)) AS chunk_id
       |  FROM c
       |)
       |SELECT doc_id, CAST(n_tok_doc AS INT) AS n_tok_doc,
       |  CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(chunk_id * 24 AS BIGINT) AS start_tok,
       |  CAST(least(32, n_tok_doc - chunk_id * 24) AS BIGINT) AS n_tok,
       |  array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
       |    AS chunk_text
       |FROM e
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** d18: the greedy quality-prefix budget selection replayed with an
    * ordered cumulative window (the oracle may afford the global sort
    * the engine's radix boundary avoids); t02's quality as a 1e-6
    * BIGINT, t03's regex token counts, budget 20000.
    */
  val d18: String = {
    val stops = TextFns.Profiles.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |    length(text) AS n_char,
       |    len(string_split($Norm, ' ')) AS n_words,
       |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
       |      AS n_punct,
       |    len(list_filter(string_split($Norm, ' '), w -> w IN ($stops)))
       |      AS n_stop,
       |    length($Norm) AS n_char_norm,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]'))
       |      AS BIGINT) AS n_tok
       |  FROM documents
       |), r AS (
       |  SELECT *,
       |    CAST(n_char_norm - (n_words - 1) AS DOUBLE) / n_words
       |      AS avg_word_len,
       |    CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       |    CAST(n_punct AS DOUBLE) / n_char AS punct_ratio
       |  FROM m
       |), q AS (
       |  SELECT doc_id, n_tok,
       |    CAST(floor((
       |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END) +
       |      (CASE WHEN avg_word_len BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END) +
       |      (CASE WHEN stop_ratio >= 0.01 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END)
       |    ) * 1000000.0 + 0.5) AS BIGINT) AS q6
       |  FROM r
       |), c AS (
       |  SELECT *, sum(n_tok) OVER (ORDER BY q6 DESC, doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM q
       |)
       |SELECT doc_id, q6 / 1000000.0 AS quality, n_tok
       |FROM c WHERE cum <= 20000
       |ORDER BY doc_id""".stripMargin
  }

  /** p10: d18's t02-quality + t03-token feature block rolled up per
    * (source, level) with exact floor-division shares.
    */
  val p10: String = {
    val stops = TextFns.Profiles.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id, source,
       |    length(text) AS n_char,
       |    len(string_split($Norm, ' ')) AS n_words,
       |    length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))
       |      AS n_punct,
       |    len(list_filter(string_split($Norm, ' '), w -> w IN ($stops)))
       |      AS n_stop,
       |    length($Norm) AS n_char_norm,
       |    CAST(len(regexp_extract_all($Norm, '[a-z0-9]+|[^a-z0-9 ]'))
       |      AS BIGINT) AS n_tok
       |  FROM documents
       |), r AS (
       |  SELECT *,
       |    CAST(n_char_norm - (n_words - 1) AS DOUBLE) / n_words
       |      AS avg_word_len,
       |    CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
       |    CAST(n_punct AS DOUBLE) / n_char AS punct_ratio
       |  FROM m
       |), q AS (
       |  SELECT source, n_tok,
       |    CAST(floor((
       |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 0.4 ELSE 0.0 END) +
       |      (CASE WHEN avg_word_len BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END) +
       |      (CASE WHEN stop_ratio >= 0.01 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN punct_ratio <= 0.2 THEN 0.1 ELSE 0.0 END)
       |    ) * 1000000.0 + 0.5) AS BIGINT) AS q6
       |  FROM r
       |), cells AS (
       |  SELECT source, q6, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM q GROUP BY 1, 2
       |), src AS (
       |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
       |  FROM cells GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS all_tokens FROM cells
       |)
       |SELECT c.source, c.q6 / 1000000.0 AS quality, c.n_docs, c.n_tokens,
       |  CASE WHEN s.src_tokens > 0
       |    THEN c.n_tokens * 1000000 // s.src_tokens END AS src_share6,
       |  CASE WHEN t.all_tokens > 0
       |    THEN c.n_tokens * 1000000 // t.all_tokens END AS corpus_share6
       |FROM cells c JOIN src s USING (source) CROSS JOIN tot t
       |ORDER BY c.source, quality""".stripMargin
  }

  /** t19: the same row-local distinct trigram sets, df over the
    * (doc, gram) pair table, exact integer floor-division rate.
    */
  val t19: String =
    s"""WITH b AS (
       |  SELECT doc_id, string_split($Norm, ' ') AS ws FROM documents
       |), pg AS (
       |  SELECT doc_id, unnest(list_distinct(${ngListSql(3)})) AS g
       |  FROM b
       |), dfq AS (
       |  SELECT g, count(*) AS df FROM pg GROUP BY g
       |), per AS (
       |  SELECT p.doc_id, count(*) AS n_grams,
       |    CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_shared
       |  FROM pg p JOIN dfq d USING (g) GROUP BY p.doc_id
       |)
       |SELECT doc_id, n_grams, n_shared,
       |  n_shared * 1000000 // n_grams AS shared_rate6,
       |  CAST(CASE WHEN n_shared * 1000000 // n_grams > 500000
       |    THEN 1 ELSE 0 END AS INT) AS boilerplate_flag
       |FROM per ORDER BY doc_id""".stripMargin

  /** d20: cross-source contamination matrix — distinct word 8-grams
    * per source, shared counts over the full pair spine, BIGINT rate
    * divisions.
    */
  val d20: String =
    s"""WITH w AS (
       |  SELECT source, string_split($Norm, ' ') AS ws FROM documents
       |), g AS (
       |  SELECT DISTINCT source, unnest(list_transform(range(len(ws) - 7),
       |    i -> array_to_string(ws[i + 1:i + 8], ' '))) AS g
       |  FROM w
       |), sizes AS (
       |  SELECT cat.source, COALESCE(gs.ng, 0) AS n_grams
       |  FROM (SELECT DISTINCT source FROM documents) cat
       |  LEFT JOIN (SELECT source, count(*) AS ng FROM g GROUP BY 1) gs
       |    ON gs.source = cat.source
       |), sh AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    count(*) AS n_shared
       |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT sa.source AS source_a, sb.source AS source_b,
       |  sa.n_grams AS n_grams_a, sb.n_grams AS n_grams_b,
       |  COALESCE(sh.n_shared, 0) AS n_shared,
       |  CASE WHEN sa.n_grams + sb.n_grams - COALESCE(sh.n_shared, 0) > 0
       |    THEN COALESCE(sh.n_shared, 0) * 1000000
       |      // (sa.n_grams + sb.n_grams - COALESCE(sh.n_shared, 0))
       |    ELSE 0 END AS jaccard6,
       |  CASE WHEN least(sa.n_grams, sb.n_grams) > 0
       |    THEN COALESCE(sh.n_shared, 0) * 1000000
       |      // least(sa.n_grams, sb.n_grams)
       |    ELSE 0 END AS containment6
       |FROM sizes sa
       |CROSS JOIN sizes sb
       |LEFT JOIN sh ON sh.source_a = sa.source AND sh.source_b = sb.source
       |WHERE sa.source < sb.source
       |ORDER BY source_a, source_b""".stripMargin

  /** t21: blocklist screening — t09's planted-term pattern, the same
    * RE2∩Java word-boundary lexicons, integer counts and verdict.
    */
  val t21: String = {
    val spam = graft.text.TextFns.SpamRe
    val boiler = graft.text.TextFns.BoilerRe
    val adult = graft.text.TextFns.AdultRe
    s"""WITH pl AS (
       |  SELECT doc_id,
       |    text ||
       |    (CASE WHEN doc_id % 4 = 0 THEN ' please buy now winner'
       |      ELSE '' END) ||
       |    (CASE WHEN doc_id % 6 = 0 THEN ' all rights reserved click here'
       |      ELSE '' END) ||
       |    (CASE WHEN doc_id % 9 = 0 THEN ' nsfw' ELSE '' END) AS planted
       |  FROM documents
       |), nr AS (
       |  SELECT doc_id,
       |    lower(regexp_replace(trim(planted), '\\s+', ' ', 'g')) AS p
       |  FROM pl
       |), c AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(p, '$spam')) AS INT) AS n_spam,
       |    CAST(len(regexp_extract_all(p, '$boiler')) AS INT) AS n_boiler,
       |    CAST(len(regexp_extract_all(p, '$adult')) AS INT) AS n_adult
       |  FROM nr
       |)
       |SELECT doc_id, n_spam, n_boiler, n_adult,
       |  CAST(n_spam + n_boiler + n_adult AS INT) AS n_blocked,
       |  CAST(CASE WHEN n_adult > 0 OR n_spam + n_boiler >= 2
       |    THEN 1 ELSE 0 END AS INT) AS blocked_flag
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** p12: the media corpus card — the decoded-output oracles composed
    * verbatim, ten 1-row aggregates in long format.
    */
  lazy val p12: String =
    s"""WITH img AS (SELECT * FROM ($m01)),
       |au AS (SELECT * FROM ($m02)),
       |seg AS (SELECT * FROM ($m07))
       |SELECT * FROM (
       |  SELECT 'image' AS modality, 'n_assets' AS metric,
       |    CAST(count(*) AS BIGINT) AS value FROM img
       |  UNION ALL SELECT 'image', 'total_px',
       |    CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) FROM img
       |  UNION ALL SELECT 'image', 'px_sum_total',
       |    CAST(sum(px_sum) AS BIGINT) FROM img
       |  UNION ALL SELECT 'image', 'max_width',
       |    CAST(max(width) AS BIGINT) FROM img
       |  UNION ALL SELECT 'image', 'max_height',
       |    CAST(max(height) AS BIGINT) FROM img
       |  UNION ALL SELECT 'audio', 'n_assets',
       |    CAST(count(*) AS BIGINT) FROM au
       |  UNION ALL SELECT 'audio', 'total_samples',
       |    CAST(sum(n_samples) AS BIGINT) FROM au
       |  UNION ALL SELECT 'audio', 'total_duration_ms',
       |    CAST(sum(duration_ms) AS BIGINT) FROM au
       |  UNION ALL SELECT 'audio', 'clipped_assets',
       |    CAST(sum(CASE WHEN n_clipped > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    FROM seg
       |  UNION ALL SELECT 'audio', 'total_silent_frames',
       |    CAST(sum(n_silent) AS BIGINT) FROM seg
       |)
       |ORDER BY modality, metric""".stripMargin

  /** p11: the dedup funnel — the three flag-set oracles composed
    * verbatim (p05's pattern), then pure doc_id-set algebra over a
    * 3-row spine.
    */
  val p11: String =
    s"""WITH f1 AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      min(doc_id) OVER (PARTITION BY md5($Norm)) AS keep
       |    FROM documents
       |  ) WHERE doc_id <> keep
       |), f2 AS (
       |  SELECT DISTINCT doc_contained AS doc_id FROM ($d10)
       |), f3 AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM ($d04)
       |), fl AS (
       |  SELECT 1 AS stage, doc_id FROM f1
       |  UNION ALL SELECT 2 AS stage, doc_id FROM f2
       |  UNION ALL SELECT 3 AS stage, doc_id FROM f3
       |), nf AS (
       |  SELECT stage, count(*) AS n_flagged FROM fl GROUP BY 1
       |), fs AS (
       |  SELECT doc_id, min(stage) AS stage FROM fl GROUP BY 1
       |), nn AS (
       |  SELECT stage, count(*) AS n_new FROM fs GROUP BY 1
       |), tot AS (
       |  SELECT count(*) AS n_docs FROM documents
       |), st AS (
       |  SELECT s.stage, s.stage_name,
       |    COALESCE(nf.n_flagged, 0) AS n_flagged,
       |    COALESCE(nn.n_new, 0) AS n_new
       |  FROM (VALUES (1, 'exact'), (2, 'containment'), (3, 'jaccard'))
       |    s(stage, stage_name)
       |  LEFT JOIN nf ON nf.stage = s.stage
       |  LEFT JOIN nn ON nn.stage = s.stage
       |), cum AS (
       |  SELECT *, CAST(sum(n_new) OVER (ORDER BY stage
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_removed
       |  FROM st
       |)
       |SELECT stage, stage_name, n_flagged, n_new, cum_removed,
       |  n_docs - cum_removed AS survivors
       |FROM cum CROSS JOIN tot ORDER BY stage""".stripMargin
}

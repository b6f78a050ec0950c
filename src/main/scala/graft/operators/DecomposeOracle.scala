package graft.operators

/** DuckDB oracles for the decomposition detectors (q11–q15).
  * q14 (seasonal ESD) is iterative; its oracle unrolls the ESD rounds
  * as chained CTEs — sound because k = max(1, round(0.02·n)) and n is
  * bounded by the rows-per-ticker ceiling (29 at sf0.1 → k = 1 ≤ the
  * 4 unrolled rounds; the data would need 175+ rows per ticker to
  * outgrow the unroll).
  */
object DecomposeOracle {

  // Fixed-point mirror of Decompose.decomposeFrom: aggregates run over
  // 10^4-scaled BIGINTs (exact, order-independent), one double division
  // at the end — bit-identical to the Spark side.
  private val chain: String =
    """WITH base AS (
      |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS value_s
      |  FROM events
      |), seqd AS (
      |  SELECT *, value_s / 10000.0 AS value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) - 1 AS seq
      |  FROM base
      |), trended AS (
      |  SELECT *,
      |    floor(
      |      CAST(sum(value_s) OVER w AS DOUBLE) / count(value_s) OVER w
      |      + 0.5) / 10000.0 AS trend
      |  FROM seqd
      |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |), detr AS (
      |  SELECT *,
      |    CAST(floor((value - trend) * 10000.0 + 0.5) AS BIGINT) AS detrended_s,
      |    seq % 7 AS phase
      |  FROM trended
      |), seas AS (
      |  SELECT *,
      |    CAST(floor(
      |      CAST(sum(detrended_s) OVER wp AS DOUBLE) / count(detrended_s) OVER wp
      |      + 0.5) AS BIGINT) AS seasonal_raw_s
      |  FROM detr
      |  WINDOW wp AS (PARTITION BY user_id, event_type, phase)
      |), seas2 AS (
      |  SELECT *,
      |    floor(seasonal_raw_s -
      |      CAST(sum(seasonal_raw_s) OVER wk AS DOUBLE) / count(seasonal_raw_s) OVER wk
      |      + 0.5) / 10000.0 AS seasonal
      |  FROM seas
      |  WINDOW wk AS (PARTITION BY user_id, event_type)
      |), dec AS (
      |  SELECT *,
      |    CAST(floor((value - trend - seasonal) * 10000.0 + 0.5) AS BIGINT) AS remainder_s,
      |    floor((value - trend - seasonal) * 10000.0 + 0.5) / 10000.0 AS remainder
      |  FROM seas2
      |), q AS (
      |  SELECT user_id, event_type,
      |    floor(quantile_cont(remainder_s, 0.25) + 0.5) / 10000.0 AS q25,
      |    floor(quantile_cont(remainder_s, 0.75) + 0.5) / 10000.0 AS q75
      |  FROM dec GROUP BY user_id, event_type
      |), anom AS (
      |  SELECT d.*, q.q25, q.q75, floor((q.q75 - q.q25) * 10000.0 + 0.5) / 10000.0 AS iqr
      |  FROM dec d JOIN q USING (user_id, event_type)
      |), anom2 AS (
      |  SELECT *,
      |    floor((q25 - 3.0 * iqr) * 10000.0 + 0.5) / 10000.0 AS remainder_l1,
      |    floor((q75 + 3.0 * iqr) * 10000.0 + 0.5) / 10000.0 AS remainder_l2
      |  FROM anom
      |), anom3 AS (
      |  SELECT *, floor(((remainder_l1 + remainder_l2) / 2) * 10000.0 + 0.5) / 10000.0 AS buffer_zero
      |  FROM anom2
      |), anom4 AS (
      |  SELECT *, floor((remainder_l2 - buffer_zero) * 10000.0 + 0.5) / 10000.0 AS buffer_radius
      |  FROM anom3
      |), anom5 AS (
      |  SELECT *,
      |    CASE WHEN buffer_radius != 0
      |      THEN floor((abs(remainder - buffer_zero) / buffer_radius) * 10000.0 + 0.5) / 10000.0
      |      ELSE 0 END AS score
      |  FROM anom4
      |), anom6 AS (
      |  SELECT *, CASE WHEN score > 1 THEN 1 ELSE 0 END AS is_anomaly
      |  FROM anom5
      |)""".stripMargin

  val q11: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, ts, seq, value, trend, seasonal,
       |  remainder
       |FROM dec ORDER BY user_id, event_type, seq""".stripMargin

  val q12: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, ts, seq, remainder, remainder_l1,
       |  remainder_l2, score, is_anomaly
       |FROM anom6 ORDER BY user_id, event_type, seq""".stripMargin

  /** q83: moment sums over the chain's own fixed-point components;
    * seasonal_s recovered exactly from the quantized double, one IEEE
    * chain per strength, clamped at 0.
    */
  val q83: String =
    s"""$chain, dec2 AS (
       |  SELECT *,
       |    value_s - CAST(floor(seasonal * 10000.0 + 0.5) AS BIGINT)
       |      AS deseason_s
       |  FROM dec
       |), mom AS (
       |  SELECT user_id, event_type, count(*) AS n,
       |    sum(remainder_s) AS sr,
       |    sum(CAST(remainder_s AS HUGEINT) * remainder_s) AS qr,
       |    sum(detrended_s) AS sdt,
       |    sum(CAST(detrended_s AS HUGEINT) * detrended_s) AS qdt,
       |    sum(deseason_s) AS sds,
       |    sum(CAST(deseason_s AS HUGEINT) * deseason_s) AS qds
       |  FROM dec2 GROUP BY 1, 2 HAVING count(*) >= 8
       |), f AS (
       |  SELECT *,
       |    n * qr - CAST(sr AS HUGEINT) * sr AS vr,
       |    n * qdt - CAST(sdt AS HUGEINT) * sdt AS vdt,
       |    n * qds - CAST(sds AS HUGEINT) * sds AS vds
       |  FROM mom
       |), g AS (
       |  SELECT *,
       |    CASE WHEN vdt > 0 THEN
       |      greatest(CAST(0 AS BIGINT),
       |        CAST(floor((1.0 - CAST(vr AS DOUBLE) / CAST(vdt AS DOUBLE))
       |          * 1000000.0 + 0.5) AS BIGINT)) END AS seasonal_strength6,
       |    CASE WHEN vds > 0 THEN
       |      greatest(CAST(0 AS BIGINT),
       |        CAST(floor((1.0 - CAST(vr AS DOUBLE) / CAST(vds AS DOUBLE))
       |          * 1000000.0 + 0.5) AS BIGINT)) END AS trend_strength6
       |  FROM f
       |)
       |SELECT user_id, event_type, n AS n_obs,
       |  seasonal_strength6, trend_strength6,
       |  CAST(CASE WHEN seasonal_strength6 >= 600000 THEN 1 ELSE 0 END
       |    AS INT) AS strongly_seasonal,
       |  CAST(CASE WHEN trend_strength6 >= 600000 THEN 1 ELSE 0 END
       |    AS INT) AS trending
       |FROM g
       |ORDER BY user_id, event_type""".stripMargin

  val q13: String =
    s"""$chain, summ AS (
       |  SELECT *,
       |    floor(
       |      CAST(sum(value_s) OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts, event_id
       |        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE) /
       |      count(value_s) OVER (PARTITION BY user_id, event_type
       |        ORDER BY ts, event_id
       |        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
       |      + 0.5) / 10000.0 AS seven_day_avg,
       |    (${(1 to 8).map(i =>
             s"CASE WHEN lag(value, $i) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = value THEN 1 ELSE 0 END")
             .mkString(" + ")}) AS repetitions,
       |    floor((epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
       |      PARTITION BY user_id, event_type ORDER BY ts, event_id))) / 86400e6
       |      * 1000000.0 + 0.5) / 1000000.0 AS frequency_days,
       |    max(seq) OVER (PARTITION BY user_id, event_type) AS max_seq
       |  FROM anom6
       |)
       |SELECT user_id || '_' || event_type AS ticker_index,
       |  ts AS date, value, seven_day_avg, score, is_anomaly, repetitions,
       |  frequency_days,
       |  CAST(c_custkey % 3 + 1 AS INT) AS alleged_frequency_days,
       |  user_id, event_type
       |FROM summ LEFT JOIN customer ON user_id = c_custkey
       |WHERE seq = max_seq
       |ORDER BY user_id, event_type""".stripMargin

  /** q14: unrolled seasonal ESD (direction = 'both', max_anoms = 0.02
    * — the reference's dev2.R:7 defaults). All medians land on exact
    * integers by the ×8 scaling argument in Decompose.seasonalEsd,
    * every aggregate is an exact BIGINT sum, and the double formulas
    * (scale, z) use the identical op sequence as the Scala loop —
    * bit-for-bit parity.
    */
  val q14: String = {
    val rounds = 4
    val iter = (1 to rounds).map { r =>
      val prev = s"rem${r - 1}"
      // rem_r keeps only keys that emitted in round r (ESD stops at the
      // first non-emission), minus the emitted point itself
      s"""m$r AS (
         |  SELECT user_id, event_type,
         |    CAST(quantile_cont(resid8, 0.5) AS BIGINT) AS med8,
         |    count(*) AS nr,
         |    CAST(sum(resid8) AS DOUBLE) AS sumd,
         |    CAST(sum(resid8 * resid8) AS DOUBLE) AS sumsq
         |  FROM $prev GROUP BY 1, 2
         |), d$r AS MATERIALIZED (
         |  SELECT r.*, m.med8, m.nr, m.sumd, m.sumsq,
         |    abs(r.resid8 - m.med8) AS dev8
         |  FROM $prev r JOIN m$r m USING (user_id, event_type)
         |), s$r AS (
         |  SELECT user_id, event_type,
         |    CAST(quantile_cont(dev8, 0.5) AS BIGINT) AS mad8
         |  FROM d$r GROUP BY 1, 2
         |), w$r AS (
         |  SELECT d.*, s.mad8,
         |    CASE WHEN s.mad8 > 0 THEN s.mad8 / 8.0 * 1.4826
         |         WHEN d.nr >= 2 THEN
         |           sqrt((d.sumsq - d.sumd * d.sumd / d.nr) / (d.nr - 1) / 64.0)
         |         ELSE 0.0 END AS scale,
         |    row_number() OVER (PARTITION BY d.user_id, d.event_type
         |      ORDER BY d.dev8 DESC, d.event_id DESC) AS rk
         |  FROM d$r d JOIN s$r s USING (user_id, event_type)
         |), e$r AS (
         |  SELECT user_id, event_type, event_id, seq,
         |    dev8 / 8.0 / scale AS esd_z, $r AS esd_round
         |  FROM w$r
         |  WHERE rk = 1 AND scale > 0 AND dev8 / 8.0 / scale > 3.0 AND k >= $r
         |), rem$r AS MATERIALIZED (
         |  SELECT r.* FROM $prev r
         |  WHERE EXISTS (SELECT 1 FROM e$r e
         |          WHERE e.user_id = r.user_id AND e.event_type = r.event_type)
         |    AND NOT EXISTS (SELECT 1 FROM e$r e
         |          WHERE e.user_id = r.user_id AND e.event_type = r.event_type
         |            AND e.event_id = r.event_id)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH base AS (
       |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS value_s
       |  FROM events
       |), seqd AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts, event_id) - 1 AS seq
       |  FROM base
       |), eb AS (
       |  SELECT user_id, event_type, event_id, CAST(seq AS INT) AS seq,
       |    seq % 7 AS phase, value_s * 8 AS v8
       |  FROM seqd
       |), km AS (
       |  SELECT user_id, event_type,
       |    CAST(quantile_cont(v8, 0.5) AS BIGINT) AS key_med8, count(*) AS n0
       |  FROM eb GROUP BY 1, 2
       |), pm AS (
       |  SELECT user_id, event_type, phase,
       |    CAST(quantile_cont(v8, 0.5) AS BIGINT) AS phase_med8
       |  FROM eb GROUP BY 1, 2, 3
       |), rem0 AS MATERIALIZED (
       |  SELECT b.user_id, b.event_type, b.event_id, b.seq,
       |    b.v8 - pm.phase_med8 - km.key_med8 AS resid8,
       |    greatest(1, CAST(floor(0.02 * km.n0 + 0.5) AS INT)) AS k
       |  FROM eb b
       |  JOIN km ON km.user_id = b.user_id AND km.event_type = b.event_type
       |  JOIN pm ON pm.user_id = b.user_id AND pm.event_type = b.event_type
       |    AND pm.phase = b.phase
       |), $iter
       |SELECT user_id, event_type, event_id, seq, esd_z, esd_round FROM (
       |  ${(1 to rounds).map(r => s"SELECT * FROM e$r").mkString(" UNION ALL ")}
       |) ORDER BY user_id, event_type, esd_round""".stripMargin
  }

  /** q16 / q18: auto-frequency + auto-span loess-trend decompose.
    * Mirrors Decompose.loessDecompose op for op: same left-fold
    * weighted sums (list_reduce ≡ aggregate), tricube/bisquare expanded
    * as multiplications, span enforced by zero weight beyond hw, exact
    * scaled-integer assembly of the remainder. `robustIters` unrolls
    * that many bisquare reweighting passes, each over the rounded
    * previous fit (q14's ESD-unroll precedent). Per-pass CTEs are
    * MATERIALIZED: DuckDB inlines CTEs by default and the rw/trend
    * expressions are referenced 5-7× each downstream, so an inlined
    * N-pass chain re-evaluates the fit ~35^N times.
    */
  private def loessChain(robustIters: Int): String = {
    def term(arr: String, extra: String): String = {
      val d = "abs(e.x - xi)"
      val r = s"(CASE WHEN h = 0 THEN 0.0 ELSE $d / h END)"
      val c = s"(1.0 - $r * $r * $r)"
      val w = s"(CASE WHEN $d > hw THEN 0.0 ELSE $c * $c * $c END)"
      s"list_reduce(list_prepend(0.0, list_transform($arr, " +
        s"e -> $w$extra)), (a, b) -> a + b)"
    }
    def fitSql(src: String, arr: String, rwFactor: String,
        outPrefix: String, trendName: String,
        fallback: Option[String] = None): String = {
      val trendExpr = fallback match {
        case Some(fb) =>
          s"CASE WHEN sw = 0 THEN $fb ELSE CAST(floor(b0 + b1 * xi + 0.5) AS BIGINT) END"
        case None => "CAST(floor(b0 + b1 * xi + 0.5) AS BIGINT)"
      }
      s"""${outPrefix}sums AS MATERIALIZED (
         |  SELECT *,
         |    ${term(arr, rwFactor)} AS sw,
         |    ${term(arr, s"$rwFactor * e.x")} AS swx,
         |    ${term(arr, s"$rwFactor * e.y")} AS swy,
         |    ${term(arr, s"$rwFactor * e.x * e.x")} AS swxx,
         |    ${term(arr, s"$rwFactor * e.x * e.y")} AS swxy
         |  FROM $src
         |), ${outPrefix}fit AS (
         |  SELECT *, swxx * sw - swx * swx AS den FROM ${outPrefix}sums
         |), ${outPrefix}fit2 AS (
         |  SELECT *,
         |    CASE WHEN den != 0 THEN (swxy * sw - swx * swy) / den
         |         ELSE 0.0 END AS b1
         |  FROM ${outPrefix}fit
         |), ${outPrefix}fit3 AS (
         |  SELECT *,
         |    CASE WHEN sw != 0 THEN (swy - b1 * swx) / sw ELSE 0.0 END AS b0
         |  FROM ${outPrefix}fit2
         |), ${outPrefix}done AS MATERIALIZED (
         |  SELECT * EXCLUDE (sw, swx, swy, swxx, swxy, den, b1, b0),
         |    $trendExpr AS $trendName
         |  FROM ${outPrefix}fit3
         |)""".stripMargin
    }
    val firstTrend = if (robustIters == 0) "trend_s" else "trend1_s"
    val robustCtes = (1 to robustIters).map { i =>
      val src = if (i == 1) "fdone" else s"s${i - 1}done"
      val prevTrend = s"trend${i}_s"
      val outTrend = if (i == robustIters) "trend_s" else s"trend${i + 1}_s"
      s""", rb${i}a AS MATERIALIZED (
         |  SELECT *, value_s - $prevTrend AS resid${i}_s FROM $src
         |), rb${i}b AS MATERIALIZED (
         |  SELECT *,
         |    quantile_cont(abs(resid${i}_s) * 2, 0.5)
         |      OVER (PARTITION BY user_id, event_type) AS m2_$i
         |  FROM rb${i}a
         |), rb${i}c AS MATERIALIZED (
         |  SELECT *,
         |    CASE WHEN m2_$i = 0
         |      THEN (CASE WHEN resid${i}_s = 0 THEN 1.0 ELSE 0.0 END)
         |      ELSE (CASE WHEN CAST(abs(resid${i}_s) AS DOUBLE) / (3.0 * m2_$i) < 1
         |        THEN (1.0 - (CAST(abs(resid${i}_s) AS DOUBLE) / (3.0 * m2_$i))
         |                  * (CAST(abs(resid${i}_s) AS DOUBLE) / (3.0 * m2_$i)))
         |           * (1.0 - (CAST(abs(resid${i}_s) AS DOUBLE) / (3.0 * m2_$i))
         |                  * (CAST(abs(resid${i}_s) AS DOUBLE) / (3.0 * m2_$i)))
         |        ELSE 0.0 END)
         |    END AS rw_$i
         |  FROM rb${i}b
         |), rb${i}d AS MATERIALIZED (
         |  SELECT *, list(struct_pack(x := CAST(seq AS DOUBLE),
         |        y := CAST(value_s AS DOUBLE), rw := rw_$i))
         |      OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
         |            ROWS BETWEEN 23 PRECEDING AND 23 FOLLOWING) AS arrb_$i
         |  FROM rb${i}c
         |), ${fitSql(s"rb${i}d", s"arrb_$i", " * e.rw", s"s$i", outTrend,
               fallback = Some(prevTrend))}""".stripMargin
    }.mkString
    val lastDone = if (robustIters == 0) "fdone" else s"s${robustIters}done"
    s"""WITH base AS (
       |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS value_s
       |  FROM events
       |), seqd AS (
       |  SELECT *, value_s / 10000.0 AS value,
       |    row_number() OVER w - 1 AS seq,
       |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
       |  FROM base
       |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
       |), per AS (
       |  SELECT *,
       |    quantile_cont(gap_us, 0.5)
       |      OVER (PARTITION BY user_id, event_type) AS med_gap,
       |    list(struct_pack(x := CAST(seq AS DOUBLE), y := CAST(value_s AS DOUBLE)))
       |      OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
       |            ROWS BETWEEN 23 PRECEDING AND 23 FOLLOWING) AS arr
       |  FROM seqd
       |), p2 AS (
       |  SELECT *,
       |    CAST(CASE WHEN med_gap IS NULL OR med_gap <= 0 THEN 7
       |         ELSE greatest(2, least(30,
       |           CAST(floor(604800000000.0 / med_gap + 0.5) AS INT)))
       |    END AS INT) AS period,
       |    CAST(seq AS DOUBLE) AS xi
       |  FROM per
       |), p3 AS (
       |  SELECT *,
       |    CAST(greatest(2, least(23, CAST(ceil(0.75 * period) AS BIGINT)))
       |      AS INT) AS hw
       |  FROM p2
       |), p4 AS (
       |  SELECT *,
       |    list_max(list_transform(arr,
       |      e -> CASE WHEN abs(e.x - xi) <= hw THEN abs(e.x - xi)
       |           ELSE 0.0 END)) AS h
       |  FROM p3
       |), ${fitSql("p4", "arr", "", "f", firstTrend)}$robustCtes, ph AS (
       |  SELECT *, trend_s / 10000.0 AS trend, seq % period AS phase
       |  FROM $lastDone
       |), sea AS (
       |  SELECT *,
       |    quantile_cont((value_s - trend_s) * 2, 0.5)
       |      OVER (PARTITION BY user_id, event_type, period, phase) AS pm2
       |  FROM ph
       |)
       |SELECT user_id, event_type, event_id, CAST(seq AS INT) AS seq, period,
       |  value, trend,
       |  pm2 / 2.0 / 10000.0 AS seasonal,
       |  (value_s * 2 - trend_s * 2 - pm2) / 2.0 / 10000.0 AS remainder
       |FROM sea
       |ORDER BY user_id, event_type, seq""".stripMargin
  }

  val q16: String = loessChain(robustIters = 0)

  val q18: String = loessChain(robustIters = 2)

  /** q17: Twitter/median decompose — two independent medians over the
    * scaled-integer values, exact in doubles on both engines.
    */
  val q17: String =
    s"""WITH base AS (
       |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS value_s
       |  FROM events
       |), seqd AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts, event_id) - 1 AS seq
       |  FROM base
       |), ph AS (
       |  SELECT *, seq % 7 AS phase FROM seqd
       |), med AS (
       |  SELECT *,
       |    quantile_cont(value_s, 0.5)
       |      OVER (PARTITION BY user_id, event_type, phase) AS phase_med_s,
       |    quantile_cont(value_s, 0.5)
       |      OVER (PARTITION BY user_id, event_type) AS key_med_s
       |  FROM ph
       |)
       |SELECT user_id, event_type, event_id, CAST(seq AS INT) AS seq,
       |  value_s / 10000.0 AS value,
       |  key_med_s / 10000.0 AS trend,
       |  phase_med_s / 10000.0 AS seasonal,
       |  (value_s - phase_med_s - key_med_s) / 10000.0 AS remainder
       |FROM med
       |ORDER BY user_id, event_type, seq""".stripMargin

  val q15: String = {
    val injected = AnomalyOracle.chainWith(
      "CASE WHEN event_id % 97 = 0 THEN 0.0 ELSE value END")
    s"""$injected
       |SELECT user_id, event_type, event_id, date_recorded,
       |  standard_deviation_flag, data_repetitions_flag,
       |  days_since_last_update_flag, absolute_standard_deviations_from_avg
       |FROM flags2 WHERE anomaly = 1
       |ORDER BY user_id, event_type, date_recorded, event_id""".stripMargin
  }
}

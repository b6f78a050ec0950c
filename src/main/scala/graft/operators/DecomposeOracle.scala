package graft.operators

/** DuckDB oracles for the decomposition detectors (q11–q13, q15).
  * q14 (seasonal ESD) is iterative and has no single-SQL oracle —
  * it is spec-tested instead.
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
       |  frequency_days, user_id, event_type
       |FROM summ WHERE seq = max_seq
       |ORDER BY user_id, event_type""".stripMargin

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

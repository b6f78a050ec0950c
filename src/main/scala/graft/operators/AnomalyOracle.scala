package graft.operators

/** DuckDB oracle SQL for the TickerAnomaly stages — one shared CTE
  * chain (mirroring anomaly_proj_query.sql's structure on our schema),
  * with a per-query final SELECT. Timestamps are cast to µs up front so
  * both engines do arithmetic on identical values.
  */
object AnomalyOracle {

  private val EvalTs = "TIMESTAMP '2024-02-01 00:00:00'"

  /** Same chain with a substitutable base value expression — q15's
    * fault injection replays the whole pipeline over perturbed values.
    */
  def chainWith(valueExpr: String): String =
    s"""WITH base AS (
       |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    $valueExpr AS value
       |  FROM events WHERE ts <= $EvalTs
       |), row_data AS (
       |  SELECT user_id, event_type, event_id,
       |    ts AS date_recorded,
       |    lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS last_date,
       |    $EvalTs AS run_date,
       |    max(ts) OVER (PARTITION BY user_id, event_type) AS most_recent_date,
       |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS row_num,
       |    round(value, 4) AS value,
       |    round(lag(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id), 4) AS previous_value,
       |    round(avg(value) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
       |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS previous_seven_period_avg
       |  FROM base
       |), row_data2 AS (
       |  SELECT *, max(row_num) OVER (PARTITION BY user_id, event_type) AS max_row_num
       |  FROM row_data
       |), detrended AS (
       |  SELECT *,
       |    abs(round(value - previous_value, 4)) AS absolute_one_period_difference,
       |    epoch_us(date_recorded) - epoch_us(last_date) AS time_diff_us
       |  FROM row_data2
       |  WHERE row_num <= 10 AND max_row_num >= 10
       |), stats AS (
       |  SELECT *,
       |    round(avg(absolute_one_period_difference) OVER (PARTITION BY user_id, event_type), 4) AS average,
       |    round(stddev_samp(absolute_one_period_difference) OVER (PARTITION BY user_id, event_type), 4) AS standard_deviation,
       |    avg(time_diff_us) OVER (PARTITION BY user_id, event_type) AS avg_gap_us,
       |    CASE WHEN absolute_one_period_difference = 0 THEN 1 ELSE 0 END AS repeated_values,
       |    CASE WHEN absolute_one_period_difference = 0 THEN 0 ELSE 1 END AS reset_count
       |  FROM detrended
       |), zs AS (
       |  SELECT *,
       |    avg_gap_us / 86400e6 AS avg_days_bw_data,
       |    (epoch_us($EvalTs) - epoch_us(date_recorded)) / 86400e6 AS days_since_last_update,
       |    CASE WHEN standard_deviation != 0
       |      THEN round(abs(absolute_one_period_difference - average) / standard_deviation, 4)
       |      ELSE 0 END AS absolute_standard_deviations_from_avg,
       |    CAST(sum(reset_count) OVER (PARTITION BY user_id, event_type
       |      ORDER BY date_recorded, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS reset_reps_sum
       |  FROM stats
       |), reps AS (
       |  SELECT *,
       |    CAST(sum(CASE WHEN reset_count = 1 THEN 1 ELSE repeated_values END) OVER (
       |      PARTITION BY user_id, event_type, reset_reps_sum
       |      ORDER BY date_recorded, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS data_repetitions
       |  FROM zs
       |), flags AS (
       |  SELECT *,
       |    CASE WHEN absolute_standard_deviations_from_avg >= 4.5 THEN 1 ELSE 0 END AS standard_deviation_flag,
       |    CASE WHEN data_repetitions >= 3 THEN 1 ELSE 0 END AS data_repetitions_flag,
       |    CASE WHEN days_since_last_update > 1.0 * avg_days_bw_data THEN 1 ELSE 0 END AS days_since_last_update_flag
       |  FROM reps
       |), flags2 AS (
       |  SELECT *,
       |    CASE WHEN standard_deviation_flag = 1 OR data_repetitions_flag = 1
       |              OR days_since_last_update_flag = 1
       |         THEN 1 ELSE 0 END AS anomaly
       |  FROM flags
       |)""".stripMargin

  private val chain: String = chainWith("value")

  private val keyOrder = "user_id, event_type, date_recorded, event_id"

  val q01: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded, last_date, value,
       |  previous_value,
       |  abs(round(value - previous_value, 4)) AS abs_one_period_diff
       |FROM row_data ORDER BY $keyOrder""".stripMargin

  val q02: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded, value,
       |  previous_seven_period_avg
       |FROM row_data ORDER BY $keyOrder""".stripMargin

  val q03: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded, row_num, value
       |FROM row_data WHERE row_num <= 5 ORDER BY $keyOrder""".stripMargin

  val q04: String =
    s"""$chain
       |SELECT user_id, event_type, max(row_num) AS n_obs,
       |  max(date_recorded) AS latest
       |FROM row_data GROUP BY user_id, event_type
       |HAVING max(row_num) >= 10 ORDER BY user_id, event_type""".stripMargin

  val q05: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded,
       |  absolute_one_period_difference, average, standard_deviation
       |FROM stats ORDER BY $keyOrder""".stripMargin

  val q06: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded,
       |  absolute_one_period_difference, average, standard_deviation,
       |  absolute_standard_deviations_from_avg
       |FROM zs ORDER BY $keyOrder""".stripMargin

  val q07: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded,
       |  repeated_values, reset_count, reset_reps_sum, data_repetitions
       |FROM reps ORDER BY $keyOrder""".stripMargin

  val q08: String =
    s"""$chain
       |SELECT user_id, event_type, date_recorded, avg_days_bw_data,
       |  days_since_last_update
       |FROM zs WHERE date_recorded = most_recent_date
       |ORDER BY user_id, event_type""".stripMargin

  val q09: String =
    s"""$chain
       |SELECT user_id, event_type, event_id, date_recorded,
       |  standard_deviation_flag, data_repetitions_flag,
       |  days_since_last_update_flag, anomaly
       |FROM flags2 ORDER BY $keyOrder""".stripMargin

  val q10: String =
    s"""$chain
       |SELECT anomaly, standard_deviation_flag, data_repetitions_flag,
       |  days_since_last_update_flag, value, previous_value,
       |  previous_seven_period_avg, absolute_one_period_difference, average,
       |  standard_deviation, absolute_standard_deviations_from_avg,
       |  CASE WHEN value - previous_value < 0
       |       THEN -absolute_standard_deviations_from_avg
       |       ELSE absolute_standard_deviations_from_avg
       |  END AS standard_deviations_from_avg,
       |  data_repetitions, date_recorded, run_date,
       |  c_name AS ticker, event_type AS granularity,
       |  c_mktsegment AS ticker_segment, avg_days_bw_data,
       |  days_since_last_update,
       |  CAST(c_custkey % 3 + 1 AS INT) AS alleged_frequency_days,
       |  CASE WHEN days_since_last_update > 1.0 * (c_custkey % 3 + 1)
       |       THEN 1 ELSE 0 END AS alleged_staleness_flag,
       |  user_id, event_type
       |FROM flags2
       |JOIN customer ON user_id = c_custkey
       |WHERE date_recorded = most_recent_date
       |ORDER BY absolute_standard_deviations_from_avg DESC NULLS LAST,
       |  date_recorded DESC, user_id, event_type""".stripMargin

  /** q103: flags2 rolled into contiguous anomaly islands — exact
    * aggregates over already-matched columns, integer µs duration.
    */
  val q103: String =
    s"""$chain,
       |anom AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
       |    ORDER BY date_recorded, event_id) AS rn_all
       |  FROM flags2
       |), isl AS (
       |  SELECT *, rn_all - row_number() OVER (PARTITION BY user_id,
       |    event_type ORDER BY date_recorded, event_id) AS grp
       |  FROM anom WHERE anomaly = 1
       |), agg AS (
       |  SELECT user_id, event_type, grp,
       |    min(date_recorded) AS start_ts,
       |    max(date_recorded) AS end_ts,
       |    count(*) AS n_events,
       |    max(absolute_standard_deviations_from_avg) AS peak_z,
       |    CAST(sum(standard_deviation_flag) AS BIGINT) AS n_sd,
       |    CAST(sum(data_repetitions_flag) AS BIGINT) AS n_rep,
       |    CAST(sum(days_since_last_update_flag) AS BIGINT) AS n_stale
       |  FROM isl GROUP BY 1, 2, 3
       |)
       |SELECT user_id, event_type,
       |  CAST(row_number() OVER (PARTITION BY user_id, event_type
       |    ORDER BY start_ts, grp) AS INT) AS incident_id,
       |  start_ts, end_ts,
       |  epoch_us(end_ts) - epoch_us(start_ts) AS duration_us,
       |  n_events, peak_z, n_sd, n_rep, n_stale
       |FROM agg
       |ORDER BY user_id, event_type, incident_id""".stripMargin

  /** q126: verdict transitions over the chain's order, one rate
    * division, the 0.3-and-6-flips flap rule.
    */
  val q126: String =
    s"""$chain
       |, fl AS (
       |  SELECT *, lag(anomaly) OVER w AS prev,
       |    row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY date_recorded DESC, event_id DESC) AS lrk
       |  FROM flags2
       |  WINDOW w AS (PARTITION BY user_id, event_type
       |    ORDER BY date_recorded, event_id)
       |), fl2 AS (
       |  SELECT *, CASE WHEN prev IS NOT NULL AND anomaly <> prev
       |    THEN 1 ELSE 0 END AS flip
       |  FROM fl
       |), agg2 AS (
       |  SELECT user_id, event_type, count(*) AS n_obs,
       |    CAST(SUM(anomaly) AS BIGINT) AS n_alerts,
       |    CAST(SUM(flip) AS BIGINT) AS n_flips,
       |    MAX(CASE WHEN lrk = 1 THEN anomaly END) AS last_state
       |  FROM fl2 GROUP BY 1, 2
       |), fin AS (
       |  SELECT *, CASE WHEN n_obs > 1 THEN
       |    CAST(floor(CAST(n_flips AS DOUBLE) / CAST(n_obs - 1 AS DOUBLE)
       |      * 1000000.0 + 0.5) AS BIGINT) END AS flip_rate6
       |  FROM agg2
       |)
       |SELECT user_id, event_type, n_obs, n_alerts, n_flips, last_state,
       |  flip_rate6,
       |  CAST(CASE WHEN flip_rate6 > 300000 AND n_flips >= 6
       |    THEN 1 ELSE 0 END AS INT) AS flapping_flag
       |FROM fin
       |ORDER BY user_id, event_type""".stripMargin
}

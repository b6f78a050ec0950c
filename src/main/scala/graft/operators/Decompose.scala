package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series decomposition + decomposition-based detectors — the
  * Spark-native rendering of the reference's R path (func.R:92-126:
  * `time_decompose` → `anomalize(remainder)` → `time_recompose` →
  * score; model.R drives it per ticker).
  *
  * The reference runs single-node STL per ticker in a driver loop
  * (`apply` over tickers, func.R:150). Here the same decomposition is
  * ONE declarative plan over all tickers at once: trend = centered
  * rolling mean, seasonal = phase-mean of the detrended series
  * (period = 7), remainder = value − trend − seasonal. Everything
  * windows on the ticker key, so the whole thing shares the anomaly
  * pipeline's single-shuffle property and scales horizontally.
  *
  * Every derived column is rounded to 4 decimals at each stage — the
  * same rounding the DuckDB oracle applies — so cross-engine float
  * drift cannot accumulate.
  */
object Decompose {

  /** Cross-engine-stable rounding: floor(x·10^k + 0.5)/10^k is the same
    * IEEE-754 op sequence in Spark and DuckDB, unlike round(), which
    * Spark applies to the double's shortest decimal representation and
    * DuckDB to its binary expansion — they disagree on .xxxx5
    * boundaries, which decompose arithmetic hits constantly.
    */
  private def r4(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
  private def r6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  private val keyCols = Seq(col("user_id"), col("event_type"))
  private def wAsc =
    Window.partitionBy(keyCols: _*).orderBy(col("ts"), col("event_id"))
  private def wKey = Window.partitionBy(keyCols: _*)

  val Period   = 7
  val HalfWin  = 3
  /** Tukey-fence multiplier ≈ anomalize's IQR method at default alpha. */
  val IqrMult  = 3.0

  /** q11: observed = trend + seasonal + remainder, per ticker. */
  def decompose(s: SparkSession, dir: String): DataFrame =
    decomposeFrom(Tables.events(s, dir))

  /** Decomposition arithmetic runs in FIXED POINT (values scaled by
    * 10^4 into longs) wherever an aggregate is involved: long sums are
    * exact and order-independent, so Spark and DuckDB produce
    * bit-identical results no matter how each engine orders its window
    * accumulation — a plain double `avg()` differs in the last ulp
    * between engines and flips the 4-decimal rounding.
    */
  def decomposeFrom(events: DataFrame): DataFrame = {
    val wTrend = wAsc.rowsBetween(-HalfWin, HalfWin)
    val wPhase = Window.partitionBy((keyCols :+ col("phase")): _*)
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"),
        floor(col("value") * lit(10000.0) + lit(0.5)).as("value_s"))
      .withColumn("value", col("value_s") / lit(10000.0))
      .withColumn("seq", row_number().over(wAsc) - 1)
      .withColumn("trend",
        floor(sum(col("value_s")).over(wTrend) /
          count(col("value_s")).over(wTrend) + lit(0.5)) / lit(10000.0))
      .withColumn("detrended_s",
        floor((col("value") - col("trend")) * lit(10000.0) + lit(0.5)))
      .withColumn("detrended", col("detrended_s") / lit(10000.0))
      .withColumn("phase", col("seq") % Period)
      .withColumn("seasonal_raw_s",
        floor(sum(col("detrended_s")).over(wPhase) /
          count(col("detrended_s")).over(wPhase) + lit(0.5)))
      .withColumn("seasonal_s",
        floor(col("seasonal_raw_s") -
          sum(col("seasonal_raw_s")).over(wKey) /
            count(col("seasonal_raw_s")).over(wKey) + lit(0.5)))
      .withColumn("seasonal", col("seasonal_s") / lit(10000.0))
      .withColumn("remainder_s",
        floor((col("value") - col("trend") - col("seasonal")) * lit(10000.0) + lit(0.5)))
      .withColumn("remainder", col("remainder_s") / lit(10000.0))
  }

  /** q12: IQR limits on the remainder (anomalize's `iqr` method),
    * recomposed bands, and the reference's buffer score
    * (func.R:106-110): score = |remainder − mid(l1,l2)| / radius.
    */
  def anomalize(s: SparkSession, dir: String): DataFrame =
    anomalizeFrom(decompose(s, dir))

  def anomalizeFrom(decomposed: DataFrame): DataFrame = {
    val q = decomposed
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        (floor(percentile(col("remainder_s"), lit(0.25)) + lit(0.5)) / lit(10000.0)).as("q25"),
        (floor(percentile(col("remainder_s"), lit(0.75)) + lit(0.5)) / lit(10000.0)).as("q75"))
    decomposed
      .join(q, Seq("user_id", "event_type"))
      .withColumn("iqr", r4(col("q75") - col("q25")))
      .withColumn("remainder_l1", r4(col("q25") - lit(IqrMult) * col("iqr")))
      .withColumn("remainder_l2", r4(col("q75") + lit(IqrMult) * col("iqr")))
      .withColumn("buffer_zero",
        r4((col("remainder_l1") + col("remainder_l2")) / 2))
      .withColumn("buffer_radius",
        r4(col("remainder_l2") - col("buffer_zero")))
      .withColumn("score",
        when(col("buffer_radius") =!= 0,
          r4(abs(col("remainder") - col("buffer_zero")) / col("buffer_radius")))
          .otherwise(0))
      .withColumn("is_anomaly", when(col("score") > 1, 1).otherwise(0))
  }

  /** q13: per-ticker last-row verdict (func.R:112-121): value, mean of
    * the last 8 observations, score, repetitions of the current value
    * among the prior 8, last inter-arrival gap in days — PLUS the
    * dim-declared cadence beside the measured one, mirroring
    * master_anomaly_detector's left-join of the index-definition dim
    * and its `frequency` / `alleged_freq` pair (func.R:158-166; the
    * declared value is the same deterministic c_custkey % 3 + 1 the
    * q10 report uses, since TPC-H customer carries no frequency
    * attribute).
    */
  def summary(s: SparkSession, dir: String): DataFrame = {
    val w8 = wAsc.rowsBetween(-7, 0)
    val eightAvg =
      floor(sum(col("value_s")).over(w8) / count(col("value_s")).over(w8) +
        lit(0.5)) / lit(10000.0)
    val reps = (1 to 8)
      .map(i => when(lag(col("value"), i).over(wAsc) === col("value"), 1).otherwise(0))
      .reduce(_ + _)
    val freqDays = r6(
      (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wAsc))) / lit(86400e6))
    val alleged = graft.Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_custkey") % 3 + 1).cast("int").as("alleged_frequency_days"))
    anomalize(s, dir)
      .withColumn("seven_day_avg", eightAvg)
      .withColumn("repetitions", reps)
      .withColumn("frequency_days", freqDays)
      .withColumn("max_seq", max(col("seq")).over(wKey))
      .filter(col("seq") === col("max_seq"))
      .join(broadcast(alleged), col("user_id") === col("c_custkey"), "left")
      .select(
        concat(col("user_id"), lit("_"), col("event_type")).as("ticker_index"),
        col("ts").as("date"),
        col("value"),
        col("seven_day_avg"),
        col("score"),
        col("is_anomaly"),
        col("repetitions"),
        col("frequency_days"),
        col("alleged_frequency_days"),
        col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** q14: seasonal-ESD-style detector (archive/dev2.R's
    * AnomalyDetectionTs): residual = value − phase median − key median,
    * then iterative ESD with robust location/scale (median / MAD),
    * k = maxAnoms·n rounds. Per-key iterative → typed `mapGroups`
    * (bounded per-key state; keys process in parallel).
    *
    * Parameter parity with the reference call
    * (dev2.R:7: `AnomalyDetectionTs(..., max_anoms = 0.02,
    * direction = 'both')`): `maxAnomFrac` defaults to 0.02 and
    * `direction` selects which tail counts — "pos" tests only
    * residuals above the round's median, "neg" only below, "both" the
    * absolute deviation. The scale estimate (MAD, stddev fallback)
    * stays two-sided in all modes, as in the reference.
    *
    * ENGINE-EXACT arithmetic: everything up to the final z runs on
    * scaled LONGS (value·10⁴·8). The ×8 headroom keeps every one of
    * the three median levels integral — v8 is a multiple of 8, so
    * phase/key medians are multiples of 4, residuals multiples of 4,
    * their median a multiple of 2, deviations multiples of 2, and the
    * MAD integral — and long sums are order-independent, so the DuckDB
    * oracle (DecomposeOracle.q14, unrolled iteration CTEs) reproduces
    * every value bit-for-bit. The stddev fallback likewise derives
    * from exact integer Σd and Σd².
    */
  def seasonalEsd(s: SparkSession, dir: String,
      maxAnomFrac: Double = 0.02, lambda: Double = 3.0,
      direction: String = "both"): DataFrame =
    seasonalEsdFrom(decompose(s, dir), maxAnomFrac, lambda, direction)

  def seasonalEsdFrom(decomposed: DataFrame,
      maxAnomFrac: Double = 0.02, lambda: Double = 3.0,
      direction: String = "both"): DataFrame = {
    val s = decomposed.sparkSession
    import s.implicits._
    require(Set("pos", "neg", "both")(direction),
      s"direction must be pos|neg|both, got $direction")
    val base = decomposed
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("seq"), col("phase"), (col("value_s") * 8).cast("long").as("v8"))
      .as[(Long, String, Long, Int, Int, Long)]

    // exact integer median: inputs at any use site are even-sum pairs
    // (see scaling argument above), so (a + b) / 2 loses nothing
    def medianL(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      val n = sorted.size
      if (n == 0) 0L
      else if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2
    }

    base
      .groupByKey { case (u, e, _, _, _, _) => (u, e) }
      .flatMapGroups { (key: (Long, String),
          it: Iterator[(Long, String, Long, Int, Int, Long)]) =>
        val (u, e) = key
        val rows = it.toVector.sortBy(_._4) // by seq
        val keyMed8 = medianL(rows.map(_._6))
        val phaseMed8: Map[Int, Long] =
          rows.groupBy(_._5).map { case (p, rs) => p -> medianL(rs.map(_._6)) }
        // residuals, exact multiples of 4 in 1/80000 units
        var rem = rows.map(r => (r._3, r._4, r._6 - phaseMed8(r._5) - keyMed8))
        val k = math.max(1, math.round(maxAnomFrac * rows.size).toInt)
        val out = Vector.newBuilder[(Long, String, Long, Int, Double, Int)]
        var round_ = 1
        var continue = true
        while (round_ <= k && continue) {
          val med8 = medianL(rem.map(_._3))
          val absDevs = rem.map(r => (r, math.abs(r._3 - med8)))
          val mad8 = medianL(absDevs.map(_._2))
          // candidate ranking honours the direction; the scale estimate
          // below stays two-sided (abs deviations) in every mode
          val devs = direction match {
            case "pos" => rem.map(r => (r, r._3 - med8))
            case "neg" => rem.map(r => (r, med8 - r._3))
            case _     => absDevs
          }
          // MAD degenerates to 0 when >50% of residuals are identical
          // (e.g. perfectly seasonal series) — fall back to stddev,
          // computed from exact integer sums (order-independent).
          val scale =
            if (mad8 > 0) mad8 / 8.0 * 1.4826
            else {
              val n = rem.size
              if (n < 2) 0.0
              else {
                val sumd = rem.map(_._3).sum.toDouble
                val sumsq = rem.map(r => r._3 * r._3).sum.toDouble
                math.sqrt((sumsq - sumd * sumd / n) / (n - 1) / 64.0)
              }
            }
          if (scale == 0) { continue = false }
          else {
            // max z ⇔ max integer deviation — ties break on event_id
            val (worst, dev8) = devs.maxBy { case (r, d) => (d, r._1) }
            val z = dev8 / 8.0 / scale
            if (z > lambda) {
              out += ((u, e, worst._1, worst._2, z, round_))
              rem = rem.filterNot(_._1 == worst._1)
              round_ += 1
            } else continue = false
          }
        }
        out.result()
      }
      .toDF("user_id", "event_type", "event_id", "seq", "esd_z", "esd_round")
      .orderBy(col("user_id"), col("event_type"), col("esd_round"))
  }

  /** Max loess half-window: covers the largest auto period
    * (⌈0.75·30⌉ = 23), so one collect_list frame serves every key and
    * the per-row span is enforced by zero weights beyond `hw`.
    */
  val MaxHw = 23

  /** q16 / q18: decomposition with AUTO frequency + loess-style trend —
    * the reference's `frequency = "auto"` (archive/dev3.R:12) and loess
    * `decompose_stl` trend (dev3.R:46-78), which q11 approximates with
    * a fixed period and a centered rolling mean.
    *
    * Auto period: per key, the median inter-arrival gap maps one week
    * onto a row count (the reference's "weekly" template), clamped to
    * [2, 30]. Auto trend span (dev3.R:13 `trend = "auto"`): the loess
    * half-window derives from the detected period, hw =
    * clamp(⌈0.75·period⌉, 2, 23), instead of a fixed ±3. Trend:
    * degree-1 LOCAL LINEAR regression with tricube weights over the
    * ±hw centered window — points beyond hw get weight 0, h = the
    * furthest included distance (so the boundary point gets tricube(1)
    * = 0, as in R's loess). Seasonal: phase-median of the detrended
    * series at the auto period.
    *
    * `robustIters ≥ 1` (q18 uses 2) adds the `stl(..., robust = TRUE)`
    * outer loop (dev3.R:68): residuals from the LATEST fit give
    * per-point bisquare weights rw = (1 − u²)² for u = |r|/(6·med|r|),
    * and the local regression re-runs with weight tricube·rw — gross
    * outliers stop dragging the trend. R iterates this outer loop to
    * convergence (typically a few passes); each pass here is one more
    * collect_list window + fold over the SAME ticker-key exchange, and
    * the oracle unrolls the identical number of passes.
    *
    * Engine parity: x/y enter as exact integers (seq, 10⁴-scaled
    * value), every weighted sum is a left fold in frame order (Spark
    * `aggregate` ≡ DuckDB `list_reduce`), the tricube/bisquare are
    * expanded as multiplications (no pow), the first-pass fit is
    * ROUNDED to an integer before residuals (so med|r| is exact
    * integer arithmetic), and the final remainder is assembled from
    * exact scaled integers — bit-identical to the SQL oracle.
    */
  def loessDecompose(s: SparkSession, dir: String,
      robustIters: Int = 0): DataFrame = {
    import org.apache.spark.sql.Column
    require(robustIters >= 0 && robustIters <= 3,
      "robustIters must be 0..3 (the oracle unrolls the same passes)")
    val events = Tables.events(s, dir)
    val wTrend = wAsc.rowsBetween(-MaxHw, MaxHw)

    val base = events
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long").as("value_s"))
      .withColumn("value", col("value_s") / lit(10000.0))
      .withColumn("seq", row_number().over(wAsc) - 1)
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wAsc)))
      .withColumn("med_gap", percentile(col("gap_us"), lit(0.5)).over(wKey))
      .withColumn("period",
        when(col("med_gap").isNull || col("med_gap") <= 0, lit(7))
          .otherwise(greatest(lit(2), least(lit(30),
            floor(lit(604800e6) / col("med_gap") + lit(0.5)).cast("int")))))
      .withColumn("hw",
        greatest(lit(2), least(lit(MaxHw),
          ceil(lit(0.75) * col("period")))).cast("int"))
      .withColumn("arr", collect_list(
        struct(col("seq").cast("double").as("x"),
          col("value_s").cast("double").as("y"))).over(wTrend))

    val xi = col("seq").cast("double")
    def fx(e: Column): Column = e.getField("x")
    def fy(e: Column): Column = e.getField("y")
    def dist(e: Column): Column = abs(fx(e) - xi)
    // h = furthest INCLUDED distance (≤ hw; smaller at series edges)
    val h = array_max(transform(col("arr"),
      e => when(dist(e) <= col("hw"), dist(e)).otherwise(lit(0.0))))
    // tricube weight, expanded as multiplications; 0 beyond the span,
    // h = 0 (single-row window) degrades to uniform weights
    def wt(e: Column): Column = {
      val r = when(col("h") === 0, lit(0.0)).otherwise(dist(e) / col("h"))
      val c = lit(1.0) - r * r * r
      when(dist(e) > col("hw"), lit(0.0)).otherwise(c * c * c)
    }
    def foldOver(arrCol: Column)(term: Column => Column): Column =
      aggregate(arrCol, lit(0.0), (acc, e) => acc + term(e))

    // one local-linear fit: weight(e) · {1, x, y, x², xy} sums → b0, b1.
    // sw = 0 (every window point robustness-weighted to zero) falls
    // back to `fallback` — only reachable in the second, rw-weighted
    // pass; the plain tricube always gives the own point weight 1.
    def fit(df: DataFrame, arrCol: String, weight: Column => Column,
        out: String, fallback: Option[Column] = None): DataFrame = {
      def fold(term: Column => Column) = foldOver(col(arrCol))(term)
      val fitted = df.withColumn("sw", fold(e => weight(e)))
        .withColumn("swx", fold(e => weight(e) * fx(e)))
        .withColumn("swy", fold(e => weight(e) * fy(e)))
        .withColumn("swxx", fold(e => weight(e) * fx(e) * fx(e)))
        .withColumn("swxy", fold(e => weight(e) * fx(e) * fy(e)))
        .withColumn("den", col("swxx") * col("sw") - col("swx") * col("swx"))
        .withColumn("b1",
          when(col("den") =!= 0,
            (col("swxy") * col("sw") - col("swx") * col("swy")) / col("den"))
            .otherwise(lit(0.0)))
        .withColumn("b0",
          when(col("sw") =!= 0,
            (col("swy") - col("b1") * col("swx")) / col("sw"))
            .otherwise(lit(0.0)))
      val trend = floor(col("b0") + col("b1") * xi + lit(0.5)).cast("long")
      fitted
        .withColumn(out, fallback match {
          case Some(fb) => when(col("sw") === 0, fb).otherwise(trend)
          case None     => trend
        })
        .drop("sw", "swx", "swy", "swxx", "swxy", "den", "b1", "b0")
    }

    val first = fit(base.withColumn("h", h), "arr", wt, "trend_s")

    // robust outer loop: each pass derives bisquare weights from the
    // ROUNDED latest fit (resid_s is an exact integer, m2 =
    // median(2·|resid_s|) is an exact integer, u = |resid_s|/(3·m2) is
    // one double division) and refits with weight tricube·rw
    val fitted = (1 to robustIters).foldLeft(first) { case (cur, _) =>
      val withRw = cur
        .withColumnRenamed("trend_s", "trend_prev_s")
        .withColumn("resid_s", col("value_s") - col("trend_prev_s"))
        .withColumn("m2",
          percentile(abs(col("resid_s")) * 2, lit(0.5)).over(wKey))
        .withColumn("rw", {
          val u = abs(col("resid_s")).cast("double") / (lit(3.0) * col("m2"))
          val c = lit(1.0) - u * u
          when(col("m2") === 0,
            when(col("resid_s") === 0, lit(1.0)).otherwise(lit(0.0)))
            .otherwise(when(u < 1, c * c).otherwise(lit(0.0)))
        })
        .withColumn("arrb", collect_list(
          struct(col("seq").cast("double").as("x"),
            col("value_s").cast("double").as("y"),
            col("rw").as("rw"))).over(wTrend))
      fit(withRw, "arrb", e => wt(e) * e.getField("rw"), "trend_s",
          fallback = Some(col("trend_prev_s")))
        .drop("trend_prev_s", "resid_s", "m2", "rw", "arrb")
    }

    val wPhase = Window.partitionBy(col("user_id"), col("event_type"),
      col("period"), col("phase"))
    fitted
      .withColumn("trend", col("trend_s") / lit(10000.0))
      .withColumn("phase", col("seq") % col("period"))
      // ×2 scaling keeps the phase median exact (see q14's argument)
      .withColumn("pm2",
        percentile((col("value_s") - col("trend_s")) * 2, lit(0.5)).over(wPhase))
      .withColumn("seasonal", col("pm2") / lit(2.0) / lit(10000.0))
      .withColumn("remainder",
        (col("value_s") * 2 - col("trend_s") * 2 - col("pm2")) / lit(2.0) /
          lit(10000.0))
      .select(col("user_id"), col("event_type"), col("event_id"), col("seq"),
        col("period"), col("value"), col("trend"), col("seasonal"),
        col("remainder"))
      .orderBy(col("user_id"), col("event_type"), col("seq"))
  }

  def q16LoessDecompose(s: SparkSession, dir: String): DataFrame =
    loessDecompose(s, dir, robustIters = 0)

  /** q18: q16 with the bisquare robustness outer loop iterated twice
    * (`stl(..., robust = TRUE)`, dev3.R:68 — R runs the outer loop
    * several passes; two passes capture the re-weighting of points the
    * first pass only partially downweighted on heavily contaminated
    * series).
    */
  def q18RobustLoess(s: SparkSession, dir: String): DataFrame =
    loessDecompose(s, dir, robustIters = 2)

  /** q17: Twitter-style (S-H-ESD) decomposition — the reference's
    * `decompose_twitter` variant (archive/dev3.R:22-24): seasonal =
    * phase median of the raw series, trend = the per-key MEDIAN
    * (Twitter AnomalyDetection replaces the STL trend with the series
    * median for robustness), remainder = value − seasonal − trend.
    * This is q14's residual base exposed as its own decompose method.
    *
    * Engine parity: both medians act directly on the 10⁴-scaled
    * integer values, and an interpolated median of two ≤2⁵²-magnitude
    * integers is exact in doubles — no scaling tricks needed; every
    * output is a deterministic dyadic divided by 10⁴.
    */
  def q17TwitterDecompose(s: SparkSession, dir: String): DataFrame = {
    val wPhase = Window.partitionBy((keyCols :+ col("phase")): _*)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long").as("value_s"))
      .withColumn("seq", row_number().over(wAsc) - 1)
      .withColumn("phase", col("seq") % Period)
      .withColumn("phase_med_s", percentile(col("value_s"), lit(0.5)).over(wPhase))
      .withColumn("key_med_s", percentile(col("value_s"), lit(0.5)).over(wKey))
      .select(col("user_id"), col("event_type"), col("event_id"), col("seq"),
        (col("value_s") / lit(10000.0)).as("value"),
        (col("key_med_s") / lit(10000.0)).as("trend"),
        (col("phase_med_s") / lit(10000.0)).as("seasonal"),
        ((col("value_s") - col("phase_med_s") - col("key_med_s")) / lit(10000.0))
          .as("remainder"))
      .orderBy(col("user_id"), col("event_type"), col("seq"))
  }

  /** q15: fault injection (func.R:81-88 impute_fakes + model.R:15-20):
    * zero out a deterministic subset of values, rerun the flag chain,
    * return the flagged rows.
    */
  def injectFaults(events: DataFrame): DataFrame =
    events.withColumn("value",
      when(col("event_id") % 97 === 0, lit(0.0)).otherwise(col("value")))

  def faultInjectedFlags(s: SparkSession, dir: String): DataFrame =
    TickerAnomaly
      .flagsFromEvents(injectFaults(Tables.events(s, dir)))
      .filter(col("anomaly") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("date_recorded"),
        col("standard_deviation_flag"), col("data_repetitions_flag"),
        col("days_since_last_update_flag"),
        col("absolute_standard_deviations_from_avg"))
      .orderBy(col("user_id"), col("event_type"), col("date_recorded"),
        col("event_id"))

  // ---- driver-facing wrappers ----

  def q11StlDecompose(s: SparkSession, dir: String): DataFrame =
    decompose(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        col("seq"), col("value"), col("trend"), col("seasonal"),
        col("remainder"))
      .orderBy(col("user_id"), col("event_type"), col("seq"))

  def q12IqrAnomalize(s: SparkSession, dir: String): DataFrame =
    anomalize(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        col("seq"), col("remainder"), col("remainder_l1"), col("remainder_l2"),
        col("score"), col("is_anomaly"))
      .orderBy(col("user_id"), col("event_type"), col("seq"))

  def q13AnomalySummary(s: SparkSession, dir: String): DataFrame =
    summary(s, dir)

  def q14SeasonalEsd(s: SparkSession, dir: String): DataFrame =
    seasonalEsd(s, dir)

  def q15FaultInject(s: SparkSession, dir: String): DataFrame =
    faultInjectedFlags(s, dir)

  /** q83: seasonal/trend STRENGTH features (Wang, Smith & Hyndman
    * 2006 — the tsfeatures/feasts "strength" pair): how much of the
    * detrended variance the seasonal component explains,
    * F_s = max(0, 1 − Var(remainder)/Var(detrended)), and how much
    * of the deseasonalized variance the trend explains,
    * F_t = max(0, 1 − Var(remainder)/Var(value − seasonal)). The
    * ONE-NUMBER summary of q11's decomposition a monitoring system
    * needs before trusting it: the reference hard-codes frequency=7
    * into `ts()`/`stl()` (func.R:101) — F_s says whether that weekly
    * cycle is even real for this ticker (the q60/q13
    * measured-vs-declared axis, answered from the decomposition
    * itself), and a low-F_t, low-F_s ticker is pure noise no
    * trend/seasonal detector should be believed on.
    *
    * Exactness: both variances share n, so each ratio needs only the
    * n·Σx² − (Σx)² combinations — exact decimal(38,0)/HUGEINT sums
    * over the decomposition's own fixed-point longs; ONE IEEE chain
    * per strength, clamped at 0, 1e-6-floored. Degenerate (zero
    * denominator) tickers report NULL and flag 0.
    *
    * Scale shape: the decomposition's single ticker exchange plus a
    * map-side-combined moment groupBy on the same key — nothing new
    * moves.
    */
  def q83SeasonalStrength(s: SparkSession, dir: String,
      minObs: Int = 8): DataFrame = {
    val dec38 = (c: Column) => c.cast("decimal(38,0)")
    val d19 = (c: Column) => c.cast("decimal(19,0)")
    def sq(c: Column) = (d19(c) * d19(c)).cast("decimal(38,0)")
    def strength(v: Column, d: Column): Column =
      when(d > 0,
        greatest(lit(0L),
          floor((lit(1.0) - v.cast("double") / d.cast("double")) *
            lit(1000000.0) + lit(0.5)).cast("long")))
    decompose(s, dir)
      .withColumn("deseason_s", col("value_s") - col("seasonal_s"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("remainder_s")).as("sr"),
        sum(sq(col("remainder_s"))).as("qr"),
        sum(col("detrended_s")).as("sdt"),
        sum(sq(col("detrended_s"))).as("qdt"),
        sum(col("deseason_s")).as("sds"),
        sum(sq(col("deseason_s"))).as("qds"))
      .filter(col("n") >= minObs)
      .withColumn("vr",
        (dec38(col("n")) * col("qr") - dec38(col("sr")) * dec38(col("sr")))
          .cast("decimal(38,0)"))
      .withColumn("vdt",
        (dec38(col("n")) * col("qdt") -
          dec38(col("sdt")) * dec38(col("sdt"))).cast("decimal(38,0)"))
      .withColumn("vds",
        (dec38(col("n")) * col("qds") -
          dec38(col("sds")) * dec38(col("sds"))).cast("decimal(38,0)"))
      .withColumn("seasonal_strength6", strength(col("vr"), col("vdt")))
      .withColumn("trend_strength6", strength(col("vr"), col("vds")))
      .select(col("user_id"), col("event_type"), col("n").as("n_obs"),
        col("seasonal_strength6"), col("trend_strength6"),
        when(col("seasonal_strength6") >= lit(600000L), 1).otherwise(0)
          .as("strongly_seasonal"),
        when(col("trend_strength6") >= lit(600000L), 1).otherwise(0)
          .as("trending"))
      .orderBy(col("user_id"), col("event_type"))
  }
}

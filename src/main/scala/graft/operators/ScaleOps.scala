package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-pattern operators (SURVEY.md §2B extension): the join /
  * aggregation shapes that keep a 100 TB pipeline off the shuffle
  * cliff — as-of joins for time-series enrichment, salted two-phase
  * aggregation for skewed keys, approximate sketches for cheap
  * cardinality.
  */
object ScaleOps {

  private val dec = "decimal(28,6)"

  /** q33: AS-OF JOIN — each event enriched with the user's most recent
    * order at-or-before the event timestamp.
    *
    * Spark has no asof-join operator; the scalable composition is the
    * union-and-carry trick: tag both streams, sort per user by
    * (time, tag), and carry the latest order attributes forward with
    * `last_value(ignoreNulls)`. ONE shuffle on the join key, no range
    * explosion, no per-row probing — at 100 TB this is a single
    * sort-merge pass. Ties on order date are pre-collapsed to the max
    * order key so semantics are deterministic (and match DuckDB's
    * ASOF JOIN oracle).
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val dedupW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").as("ts"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"),
        col("o_orderkey"), col("o_totalprice"), lit(0).as("tag"))
    val events = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), lit(1).as("tag"))
    val carryW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionAll(events)
      .withColumn("last_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(carryW))
      .withColumn("last_totalprice",
        last(col("o_totalprice"), ignoreNulls = true).over(carryW))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("last_orderkey").as("o_orderkey"),
        col("last_totalprice").as("o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** q34: salted two-phase aggregation — the skew guard: partial
    * aggregate on (key, salt) spreads a hot key over `salts`
    * reducers, the final aggregate collapses the partials. DECIMAL
    * partials make the result identical to the direct groupBy.
    */
  def saltedAgg(s: SparkSession, dir: String, salts: Int = 16): DataFrame =
    Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("user_id"), col("salt"))
      .agg(sum(col("value").cast(dec)).as("partial_sum"),
        count(lit(1)).as("partial_n"))
      .groupBy(col("user_id"))
      .agg(sum(col("partial_sum")).cast("double").as("total_value"),
        sum(col("partial_n")).as("n_events"))
      .orderBy(col("user_id"))

  /** q36: partitioned write + partition-pruned scan — stage events
    * partitioned by event_type, read back one partition. The spec
    * asserts the scan shows PartitionFilters (directory pruning), the
    * oracle checks the rows.
    */
  private def stagePartitioned(s: SparkSession, dir: String): String = {
    val staged = s"/tmp/graft_partitioned/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    if (!new java.io.File(staged, "_SUCCESS").exists()) {
      Tables.events(s, dir)
        .write.mode("overwrite").partitionBy("event_type").parquet(staged)
    }
    staged
  }

  private def stageBucketed(s: SparkSession, dir: String): (String, String) = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val ordersT = s"orders_b_$tag"
    val custT = s"customer_b_$tag"
    if (!s.catalog.tableExists(ordersT)) {
      Tables.orders(s, dir).write
        .option("path", s"/tmp/graft_bucketed/$ordersT")
        .mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ordersT)
      Tables.customer(s, dir).write
        .option("path", s"/tmp/graft_bucketed/$custT")
        .mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(custT)
    }
    (ordersT, custT)
  }

  /** Pre-stage the partitioned and bucketed copies — bench warm-up
    * calls this so per-query timings measure the pruned scan / zero-
    * exchange join, not the one-time staging writes.
    */
  def ensureStaged(s: SparkSession, dir: String): Unit = {
    stagePartitioned(s, dir)
    stageBucketed(s, dir)
  }

  def partitionedScan(s: SparkSession, dir: String): DataFrame = {
    val staged = stagePartitioned(s, dir)
    s.read.parquet(staged)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("event_type"))
      .orderBy(col("event_id"))
  }

  /** q37: sketch aggregation — an EXPLICIT HyperLogLog (Flajolet et
    * al. 2007) approximate distinct users per event type next to the
    * exact count. At 100 TB the sketch is the only affordable
    * distinct: the register table is FIXED-SIZE (m = 2^p rows per
    * key), partial maxes merge map-side, and nothing user-cardinality-
    * sized ever shuffles — where countDistinct must exchange every
    * distinct (key, user) pair.
    *
    * Fully oracle-backed (the d03/d21 split-hash graduation): the
    * 60-bit hash is the md5 digest₆₀ both engines compute identically
    * (first 15 hex chars as an integer), the register index/offset are
    * exact integer div/mod, rho = rhoCap − bitlength(w) via the
    * shared bin()-string length, the register bank reduces to ONE
    * exact integer S = Σ 2^(rhoCap−Mj), and the final estimate is one
    * mirrored IEEE chain (αm² · 2^rhoCap / S, with Flajolet's linear-
    * counting branch m·ln(m/V) when E ≤ 2.5m and empty registers
    * remain). p = 9 (512 registers, rsd ≈ 4.6%): deterministic error
    * on the test corpus is 6.7%/2.0%/0.8% at sf0.001/0.01/0.1 — the
    * sf0.001 figure is ±1 at n = 15. Oracle parity holds at the
    * default p (the SQL hardcodes α·m² = 188686.82445861166).
    */
  def approxDistinct(s: SparkSession, dir: String, p: Int = 9): DataFrame = {
    val m = 1 << p
    val rhoCap = 61 - p // digest60 minus p index bits, plus one
    // alpha_m = 0.7213/(1 + 1.079/m) for m >= 128 (Flajolet et al.
    // 2007, fig. 3; 0.709/0.697/0.673 for m = 64/32/16) — the same
    // IEEE chain the oracle's hardcoded literal came from
    val alphaM2 = (if (m >= 128) 0.7213 / (1 + 1.079 / m)
      else if (m == 64) 0.709 else if (m == 32) 0.697 else 0.673) * m * m
    val pow = 1L << rhoCap
    val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    val regs = ev
      .withColumn("h",
        conv(substring(md5(concat(col("user_id").cast("string"),
          lit("q37"))), 1, 15), 16, 10).cast("long"))
      .select(col("event_type"),
        pmod(col("h"), lit(m.toLong)).as("j"),
        expr(s"h div $m").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(rhoCap))
          .otherwise(lit(rhoCap) - length(bin(col("w")))))
      .groupBy(col("event_type"), col("j"))
      .agg(max(col("rho")).as("mj"))
    // S over ALL m registers: absent registers carry Mj = 0
    // (2^rhoCap); a present register has rho >= 1, so V (empty
    // registers) is exactly m - n_regs
    val est = regs.groupBy(col("event_type"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rhoCap - mj)"))
        .as("s_present"),
        count(lit(1)).as("n_regs"))
      .withColumn("s_all",
        col("s_present") + (lit(m.toLong) - col("n_regs")) * lit(pow))
      .withColumn("v", lit(m.toLong) - col("n_regs"))
      .withColumn("e_raw",
        lit(alphaM2) * lit(pow).cast("double") / col("s_all").cast("double"))
      .withColumn("approx_users",
        floor(when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
          .otherwise(col("e_raw")) + lit(0.5)).cast("long"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
    est.select(col("event_type"), col("approx_users"))
      .join(exact, Seq("event_type"))
      .orderBy(col("event_type"))
  }

  /** q40: top-k per key via the bounded-heap TypedImperativeAggregate
    * (graft.functions.TopKByAggregate) — same rows as q26's
    * window-rank formulation, but the shuffle carries at most k tuples
    * per key per map task instead of a full per-partition sort.
    */
  def topkAggregate(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopKAggregate
        .top_k_by(col("o_totalprice"), col("o_orderkey"), k).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).as("rk"),
        col("col.tie").as("o_orderkey"),
        col("col.sort_val").as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))

  /** q48: time-interval join — click→purchase attribution, the batch
    * twin of st04's stream-stream interval join: every purchase joined
    * to the same user's clicks in the preceding 6 hours.
    *
    * A naive `BETWEEN` range join plans as a nested loop (O(n·m) at
    * 100 TB). The scale shape is BIN BUCKETING: quantize time into
    * interval-width bins, explode the purchase side into the exactly
    * TWO bins its lookback window can cover, and equi-join on
    * (user_id, bin) before applying the exact range predicate. Each
    * matching pair lands in exactly one bin — the click's own — so no
    * dedup pass is needed, and the range join becomes an ordinary
    * hash-shuffle join whose probe fan-out is bounded by 2x.
    */
  def intervalJoin(s: SparkSession, dir: String): DataFrame = {
    val winUs = 6L * 3600 * 1000000L // 6-hour attribution window
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withColumn("bin", floor(unix_micros(col("click_ts")) / winUs))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withColumn("bin0", floor(unix_micros(col("purchase_ts")) / winUs))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"))))
    purchases
      .join(clicks,
        col("c_user") === col("user_id") &&
          clicks("bin") === purchases("bin") &&
          unix_micros(col("click_ts")) >=
            unix_micros(col("purchase_ts")) - winUs &&
          unix_micros(col("click_ts")) <= unix_micros(col("purchase_ts")))
      .groupBy(col("purchase_id"), col("user_id"), col("purchase_ts"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("click_value").cast(dec)).cast("double").as("click_value"),
        max(col("click_ts")).as("last_click_ts"))
      .orderBy(col("purchase_id"))
  }

  /** q35: bucketed co-located join — both sides written bucketed on
    * the join key, so the sort-merge join needs NO exchange (spec
    * asserts the plan). This is the pre-partitioning strategy for
    * repeatedly-joined 100 TB fact tables.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (ordersT, custT) = stageBucketed(s, dir)
    // hint forces sort-merge so the spec can prove bucketing removed
    // the exchanges (a broadcast would hide it at this scale)
    s.table(ordersT).hint("merge")
      .join(s.table(custT), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** q56: exact per-group quantile summary — min / p50 / p90 / p99 /
    * max of `value` per event_type, tail quantiles being what q42's
    * median alone can't answer (the p99 latency / quality-threshold
    * question every 100 TB pipeline asks). Rank SELECTION, not
    * interpolation (q42/q55's discipline): each reported quantile is
    * an input value, bit-exact across engines. The rank of the p-th
    * quantile is ceil(p·n), computed in INTEGER arithmetic —
    * `(num·n + den−1) div den` — because `ceil(0.99·n)` in doubles
    * rounds differently from exact rationals when 0.99·n is a whole
    * number (0.99·100 = 99.0000…14 in IEEE, ceil → 100, wrong).
    *
    * Scale shape: ONE hash exchange on event_type serves the single
    * rank window; the filter keeps ≤5 rows per group before the final
    * (trivial) groupBy, so nothing group-sized flows past the window.
    * Groups sort independently; for one monster group the
    * radix-select path (Sampling.kthSmallestLong, d09) is the
    * per-group fallback — selection quantiles need the k-th element,
    * never a full materialized sort order.
    */
  def groupQuantiles(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    // ceil(num·n/den) = (num·n + den−1) div den, exact in longs
    def rk(num: Int, den: Int): Column =
      expr(s"($num * n + ${den - 1}) div $den")
    def pick(at: Column, out: String): Column =
      (max(when(col("rn") === at, col("v4l"))) / lit(10000.0)).as(out)
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long").as("v4l"))
      .withColumn("rn",
        row_number().over(byType.orderBy(col("v4l"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
      .filter(col("rn") === 1 || col("rn") === col("n") ||
        col("rn") === rk(1, 2) || col("rn") === rk(9, 10) ||
        col("rn") === rk(99, 100))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_rows"),
        pick(lit(1), "min_v"), pick(rk(1, 2), "p50"),
        pick(rk(9, 10), "p90"), pick(rk(99, 100), "p99"),
        pick(col("n"), "max_v"))
      .orderBy(col("event_type"))
  }

  /** q58: per-group winsorization — clip every value into its
    * group's exact [p05, p95] band (the standard outlier-taming
    * transform before any mean/σ statistic a pipeline computes
    * downstream; q53's Hampel is the per-point DETECTOR, this is the
    * per-distribution REPAIR). Thresholds are q56's integer-rank
    * selection — ceil(p·n) as `(num·n + den−1) div den`, the chosen
    * bound an actual input value — so both engines clip against
    * bit-identical bands.
    *
    * Scale shape: ONE event_type exchange serves the rank window;
    * the 2-rows-per-group bounds table is checkpointed (breaks the
    * window-chain replay for its second consumer) and BROADCAST back
    * onto the ranked rows, so the clip pass reuses the same
    * partitions — no second corpus exchange, no group-sized data
    * past the window.
    */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    def rk(num: Int, den: Int): Column =
      expr(s"($num * n + ${den - 1}) div $den")
    val ranked = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("user_id"),
        floor(col("value") * lit(10000.0) + lit(0.5)).cast("long").as("v4l"))
      .withColumn("rn",
        row_number().over(byType.orderBy(col("v4l"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
    val bounds = ranked
      .filter(col("rn") === rk(1, 20) || col("rn") === rk(19, 20))
      .groupBy(col("event_type"))
      .agg(max(when(col("rn") === rk(1, 20), col("v4l"))).as("lo4"),
        max(when(col("rn") === rk(19, 20), col("v4l"))).as("hi4"))
      .localCheckpoint()
    ranked.drop("rn", "n")
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("v4l") / lit(10000.0)).as("value"),
        (col("lo4") / lit(10000.0)).as("lo"),
        (col("hi4") / lit(10000.0)).as("hi"),
        (least(greatest(col("v4l"), col("lo4")), col("hi4")) /
          lit(10000.0)).as("value_w"),
        (col("v4l") < col("lo4")).cast("int").as("clip_lo"),
        (col("v4l") > col("hi4")).cast("int").as("clip_hi"))
      .orderBy(col("event_id"))
  }
}

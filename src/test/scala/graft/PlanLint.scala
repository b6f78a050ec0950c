package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec,
  LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** Plan lint: no unpartitioned Window may survive optimization over an
  * unbounded input anywhere in a registered plan — the t23 defect
  * class (round-14 verdict). A `Window.orderBy` with no partitionBy
  * single-partitions its entire input (WindowExec's "No Partition
  * Defined" warning); at 100 TB that is billions of rows through one
  * task. The allowed shape is t07's posture — `orderBy(...).limit(k)`
  * (TakeOrderedAndProject, per-partition heaps) BELOW the window so
  * the rank runs over k rows — or any input provably k-bounded by
  * construction: a limit, a driver-local literal relation
  * (parameter-sized codebook/seed banks), a global one-row aggregate,
  * or a composition of those.
  *
  * The check runs on the OPTIMIZED logical plan (including
  * subqueries): a logical Window with empty partitionSpec is exactly
  * what becomes a single-partition WindowExec, and checking after
  * optimization proves no rewrite re-introduces the shape. AQE never
  * repartitions a window, so the logical check is the physical
  * guarantee.
  *
  * Second check (round-15 verdict item 5), on the PHYSICAL plan: no
  * CartesianProductExec / BroadcastNestedLoopJoinExec may join two
  * UNBOUNDED sides — the M×N scale-killer class. A nested-loop join
  * with one statically-bounded side (the `broadcast(one-row
  * aggregate)` scalar joins, limit-k build sides, literal banks) is
  * the intended shape and passes.
  */
object PlanLint {
  /** Query names permitted to carry an unpartitioned Window over a
    * NOT statically-bounded input. Empty by design — any addition
    * needs a justification comment proving the input is small by
    * semantics (e.g. a distinct over an enum column), and should be
    * rare: prefer fixing the plan.
    */
  val Allowed: Set[String] = Set.empty

  /** Query names permitted an unbounded-by-unbounded nested-loop or
    * cartesian join. Empty by design, same bar as [[Allowed]].
    */
  val AllowedNestedLoop: Set[String] = Set.empty

  def unpartitionedWindows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
    }

  def assertNoUnpartitionedWindow(name: String, df: DataFrame): Unit = {
    if (Allowed(name)) return
    val bad = unpartitionedWindows(df)
    if (bad.nonEmpty)
      throw new AssertionError(
        s"$name: unpartitioned Window over unbounded input " +
          "(single-partitions the whole frame — t23 class; use " +
          "orderBy+limit below the window, t07's posture):\n" +
          bad.map(_.simpleString(120)).mkString("\n"))
  }

  /** Output cardinality is bounded by construction: a limit node, a
    * driver-local relation, a one-row relation, a global (no-key)
    * aggregate — or every input of a multi-child node bounded (a join
    * or union of k-bounded inputs stays k-bounded). A Generate
    * (explode/posexplode) UNDOES a collect_list collapse — a global
    * aggregate's one row can carry the full input as an array, so
    * under a Generate the aggregate shortcut is void and boundedness
    * must come from a limit (or literal relation) in the chain
    * (round-15 ADVICE: the t07/t23 collapse is bounded only because
    * a TakeOrderedAndProject sits BELOW the collect).
    */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit       => true
    case _: LocalRelation                     => true
    case _: OneRowRelation                    => true
    case g: Generate                          => boundedUnderExplode(g.child)
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: LeafNode                          => false
    case other if other.children.nonEmpty     => other.children.forall(bounded)
    case _                                    => false
  }

  /** [[bounded]] without the global-aggregate shortcut: row counts
    * below an explode must be bounded by an actual limit/literal,
    * because aggregates (global or grouped) only FOLD cardinality
    * into arrays that the explode unfolds again.
    */
  private def boundedUnderExplode(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit   => true
    case _: LocalRelation                 => true
    case _: OneRowRelation                => true
    case _: LeafNode                      => false
    case other if other.children.nonEmpty =>
      other.children.forall(boundedUnderExplode)
    case _                                => false
  }

  /** All physical nodes, descending through AQE wrappers, reused
    * query stages and planned subqueries.
    */
  private def physNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: physNodes(a.executedPlan)
      case q: QueryStageExec        => q +: physNodes(q.plan)
      case n                        => Seq(n)
    }

  /** Physical boundedness — the shapes the planner produces for the
    * logical bounded class: local/limit/top-k leaves, global (no-key)
    * aggregates (partial or final), and compositions.
    */
  private def boundedPhys(p: SparkPlan): Boolean = p match {
    case _: LocalTableScanExec                         => true
    case _: GlobalLimitExec | _: LocalLimitExec        => true
    case _: TakeOrderedAndProjectExec                  => true
    case a: BaseAggregateExec if a.groupingExpressions.isEmpty => true
    case a: AdaptiveSparkPlanExec => boundedPhys(a.executedPlan)
    case q: QueryStageExec        => boundedPhys(q.plan)
    case other if other.children.nonEmpty =>
      other.children.forall(boundedPhys)
    case _ => false
  }

  def unboundedNestedLoops(df: DataFrame): Seq[SparkPlan] =
    physNodes(df.queryExecution.executedPlan).collect {
      case j: CartesianProductExec
          if !boundedPhys(j.left) && !boundedPhys(j.right) => j
      case j: BroadcastNestedLoopJoinExec
          if !boundedPhys(j.left) && !boundedPhys(j.right) => j
    }

  def assertNoUnboundedNestedLoop(name: String, df: DataFrame): Unit = {
    if (AllowedNestedLoop(name)) return
    val bad = unboundedNestedLoops(df)
    if (bad.nonEmpty)
      throw new AssertionError(
        s"$name: cartesian/broadcast-nested-loop join with BOTH sides " +
          "unbounded (M x N scale-killer; bound one side or use an " +
          "equi/range key):\n" +
          bad.map(_.simpleString(120)).mkString("\n"))
  }
}

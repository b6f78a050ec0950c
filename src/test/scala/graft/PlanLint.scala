package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

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
  */
object PlanLint {
  /** Query names permitted to carry an unpartitioned Window over a
    * NOT statically-bounded input. Empty by design — any addition
    * needs a justification comment proving the input is small by
    * semantics (e.g. a distinct over an enum column), and should be
    * rare: prefer fixing the plan.
    */
  val Allowed: Set[String] = Set.empty

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
    * or union of k-bounded inputs stays k-bounded).
    */
  private def bounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit       => true
    case _: LocalRelation                     => true
    case _: OneRowRelation                    => true
    case a: Aggregate if a.groupingExpressions.isEmpty => true
    case _: LeafNode                          => false
    case other if other.children.nonEmpty     => other.children.forall(bounded)
    case _                                    => false
  }
}

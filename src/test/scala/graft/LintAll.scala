package graft

/** Plan-only lint sweep over every registered query — no execution,
  * just analysis/optimization/planning, so the full 262-entry pass
  * takes seconds instead of the RelationalSpec's minutes. Prints one
  * line per offender (or ALL CLEAN) and exits nonzero on any hit.
  * Iteration tool behind the RelationalSpec gate, not a replacement.
  */
object LintAll {
  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.get("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val w = PlanLint.unpartitionedWindows(df)
        val j = PlanLint.unboundedNestedLoops(df)
        w.foreach(x => { bad += 1
          println(s"LINT window $name: ${x.simpleString(100)}") })
        j.foreach(x => { bad += 1
          println(s"LINT nljoin $name: ${x.simpleString(100)}") })
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"LINT error $name: ${e.getClass.getName} ${e.getMessage}")
      }
    }
    println(if (bad == 0) "LINT ALL CLEAN" else s"LINT $bad offenders")
    spark.stop()
    if (bad > 0) sys.exit(3)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-tier staging contracts round 15 added: pairwise-distinct
  * copy transforms up to the documented axis caps, and the probe
  * filter that keeps an argless high-copy run inside what is actually
  * staged (ADVICE r14: it used to crash mid-probe).
  */
class BenchScaleSpec extends AnyFunSuite {

  test("letter maps are valid permutations, pairwise distinct to the " +
      "text cap, and rotation-compatible below 26") {
    val az = "abcdefghijklmnopqrstuvwxyz"
    val maps = (0 until 312).map(BenchScale.letterMap)
    maps.foreach { m =>
      assert(m.length == 26 && m.toSet.size == 26, s"not a permutation: $m")
    }
    assert(maps.distinct.size == maps.size, "colliding letter maps")
    // i < 26 must stay bit-identical to the pre-round-15 rotation so
    // existing ≤26-copy /tmp stages remain valid
    for (i <- 0 until 26)
      assert(BenchScale.letterMap(i) == az.substring(i) + az.substring(0, i))
  }

  test("stageableAt filters probes to the staged axes per copy count") {
    val all = BenchScale.ProbeQueries
    // at the sf1 tier everything is staged
    assert(all.forall(BenchScale.stageableAt(10)))
    // past the media cap the m* payload probes drop, text/embedding stay
    val at100 = all.filter(BenchScale.stageableAt(100))
    assert(at100.exists(_.startsWith("t")) && at100.exists(_.startsWith("d")))
    assert(at100.contains("s13_ann_ivfpq") &&
      at100.contains("st40_stream_vector_admit"))
    assert(!at100.exists(_.startsWith("m")))
    // past the non-events cap only the events axis survives
    val at200 = all.filter(BenchScale.stageableAt(200))
    assert(at200.nonEmpty && at200.forall(q =>
      q.startsWith("q") || q.startsWith("st") || q == "s14_factor_residual" ||
        q == "p05_monitor_report" || q == "p09_drift_panel"))
    assert(!at200.contains("st40_stream_vector_admit"))
  }
}

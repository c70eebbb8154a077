package graft

import graft.ops.Profiler

/** Regression pin for the r18 ADVICE high finding: the small-corpus gate
  * computed `rowsHint * cols.length` which overflows Long at the default
  * rowsHint = Long.MaxValue (MaxValue*2 = -2, *4 = -4), silently routing
  * unknown/huge inputs down the driver-collect path — an unbounded
  * collect(). The decision is now division-based ([[Profiler.smallStacked]])
  * and the default hint must take the two-phase branch at ANY column count. */
class ProfilerGateSpec extends SparkSpec {

  test("default rows hint never takes the collect branch (overflow pin)") {
    // the exact widths that wrapped negative before the fix
    for (nCols <- Seq(1, 2, 3, 4, 7)) {
      assert(!Profiler.smallStacked(Long.MaxValue, nCols),
        s"default hint with $nCols cols must be two-phase")
    }
  }

  test("gate boundary: stacked values vs SmallStackedGate, exact") {
    val g = Profiler.SmallStackedGate
    assert(Profiler.smallStacked(g, 1)) // exactly at the gate: small
    assert(!Profiler.smallStacked(g + 1, 1))
    assert(Profiler.smallStacked(g / 4, 4))
    assert(!Profiler.smallStacked(g / 4 + 1, 4))
    assert(!Profiler.smallStacked(10, 0)) // degenerate: no columns, no collect
  }

  test("quantileProfile with default hint on 2 and 4 columns stays correct") {
    import spark.implicits._
    // before the fix a 2- or 4-column default-hint call silently ran the
    // collect path; values must be identical through the two-phase branch
    val df = Seq((1.0, 10.0, 100.0, 1000.0), (2.0, 20.0, 200.0, 2000.0),
      (3.0, 30.0, 300.0, 3000.0), (4.0, 40.0, 400.0, 4000.0),
      (5.0, 50.0, 500.0, 5000.0)).toDF("a", "b", "c", "d")
    val two = Profiler.quantileProfile(df, Seq("a", "b"))
      .orderBy("column").collect()
    assert(two.map(_.getAs[Double]("p50")).toSeq == Seq(3.0, 30.0))
    val four = Profiler.quantileProfile(df, Seq("a", "b", "c", "d"))
      .orderBy("column").collect()
    assert(four.map(_.getAs[Double]("p50")).toSeq ==
      Seq(3.0, 30.0, 300.0, 3000.0))
  }
}

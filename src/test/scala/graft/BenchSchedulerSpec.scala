package graft

import org.scalatest.funsuite.AnyFunSuite

/** The adaptive min-of-runs scheduler is pure (runner + clock injected), so
  * the host-stall scenarios that motivated it — which can't be reproduced on
  * demand — are simulated here. The r4 failure mode under test: a
  * stall-contaminated pass 1 consumed the wall budget, the all-or-nothing
  * pass 2 was skipped, and the contaminated numbers shipped as the official
  * record. The fix must recover the true times via outlier re-runs that fit
  * the remaining budget. */
class BenchSchedulerSpec extends AnyFunSuite {

  /** Simulated host: `run` returns the scripted duration for the i-th
    * invocation of each query (last entry repeats) and advances the clock
    * by exactly that much; failures (-1) cost `failCost` wall. */
  private class Sim(script: Map[String, Seq[Double]], default: Double = 0.5,
                    failCost: Double = 0.1) {
    var clock = 0.0
    private val calls = scala.collection.mutable.HashMap[String, Int]()
    def run(name: String): Double = {
      val i = calls.getOrElse(name, 0); calls(name) = i + 1
      val times = script.getOrElse(name, Seq(default))
      val t = times(math.min(i, times.size - 1))
      clock += (if (t < 0) failCost else t)
      t
    }
    def elapsed(): Double = clock
    def callCount(name: String): Int = calls.getOrElse(name, 0)
  }

  private val names = (1 to 5).map(i => f"a$i%02d_q") ++ (1 to 5).map(i => f"b$i%02d_q")

  test("stall in pass 1 + tight budget: pass 2 skipped, outlier re-run recovers the true time") {
    // a03 stalls to 60 s in pass 1 (true cost 0.5 s). After pass 1 the
    // budget can't fit a full pass 2 (64.5 + 1.3*64.5 + 30 > 175) but CAN
    // fit re-timing the one outlier (64.5 + 1.3*60 + 30 = 172.5 < 175).
    val sim = new Sim(Map("a03_q" -> Seq(60.0, 0.5)))
    val out = Bench.adaptiveMin(names, sim.run, sim.elapsed _, budgetSec = 175.0)
    assert(out.runs == 1) // full pass 2 was correctly skipped
    assert(out.retimed == Seq("a03_q"))
    val best = out.best.toMap
    assert(best("a03_q") == 0.5) // the recovered time, not the stall
    assert(names.forall(n => best(n) == 0.5))
  }

  test("calm host, ample budget: two full passes, nothing re-timed") {
    val sim = new Sim(Map.empty)
    val out = Bench.adaptiveMin(names, sim.run, sim.elapsed _, budgetSec = 900.0)
    assert(out.runs == 2)
    assert(out.retimed.isEmpty)
    assert(out.passSums.size == 2 && out.passEnds.size == 2)
    assert(out.best.forall(_._2 == 0.5))
  }

  test("re-time that itself stalls is retried by the second round") {
    // a03 stalls in pass 1 AND in its first re-run; budget 178 skips the
    // full pass 2 (64.5 + 1.3*64.5 + 30 > 178) but both outlier rounds fit.
    val sim = new Sim(Map("a03_q" -> Seq(60.0, 10.0, 0.5)))
    val out = Bench.adaptiveMin(names, sim.run, sim.elapsed _, budgetSec = 178.0)
    assert(out.runs == 1)
    assert(out.retimed == Seq("a03_q", "a03_q"))
    assert(out.best.toMap.apply("a03_q") == 0.5)
  }

  test("genuinely expensive query wastes at most maxRetimeRounds extra runs") {
    // c-free family: a03 really costs 30 s every run — it stays an outlier
    // but the rounds are bounded, so it runs 1 (pass) + 2 (rounds) times.
    val sim = new Sim(Map("a03_q" -> Seq(30.0)))
    val out = Bench.adaptiveMin(names, sim.run, sim.elapsed _, budgetSec = 10000.0)
    assert(out.best.toMap.apply("a03_q") == 30.0)
    assert(sim.callCount("a03_q") <= out.runs + 2)
  }

  test("failures are sticky and excluded from outlier selection") {
    val sim = new Sim(Map("b02_q" -> Seq(-1.0, 0.5)))
    val out = Bench.adaptiveMin(names, sim.run, sim.elapsed _, budgetSec = 900.0)
    val best = out.best.toMap
    assert(best("b02_q") == -1.0) // failed in pass 1 => reported failed
    assert(!out.retimed.contains("b02_q"))
  }

  test("out-of-budget mid-round stops re-timing without losing earlier results") {
    // two stalls; budget admits re-timing only the cheaper one
    // (after pass 1: elapsed = 4+20+40 = 64; retime q20: 64+1.3*20+30=120
    // < 125 ok -> +0.5; retime q40: 64.5+1.3*40+30 = 146.5 > 125 -> stop)
    val sim = new Sim(Map("a02_q" -> Seq(20.0, 0.5), "b04_q" -> Seq(40.0, 0.5)))
    val out = Bench.adaptiveMin(names, sim.run, sim.elapsed _, budgetSec = 125.0)
    val best = out.best.toMap
    assert(out.retimed == Seq("a02_q"))
    assert(best("a02_q") == 0.5 && best("b04_q") == 40.0)
  }
}

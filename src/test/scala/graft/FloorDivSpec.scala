package graft

import org.apache.spark.sql.functions._

/** Cross-engine integer floor-division discipline (r12 ADVICE, high).
  *
  * b121's lift_bp is a cleared-fraction ratio-of-ratios: Spark computes it
  * with `div` over DECIMAL(38,0) (exact floor on non-negative operands);
  * the DuckDB oracle must use HUGEINT `//` (exact integer floor) — DuckDB's
  * `//` on DECIMAL operands is plain double division + round-half-even,
  * which diverges by 1 bp the moment a lift fraction reaches .5 and loses
  * precision past 2^53. The original fixture was degenerate (equal arm
  * counts at every stage, lift exactly 10000), so the gate never exercised
  * the distinction. This spec pins the Spark side to FLOOR on a handcrafted
  * non-degenerate funnel whose stage-2 lift fraction is exactly .5
  * (270000/32 = 8437.5): floor = 8437, round-half-even = 8438. The DuckDB
  * side of the same fixture was verified once via Verify + tools/compare.py
  * against /tmp-style scratch events (r13 open, ledgered in BASELINE.md).
  *
  * Arm assignment is the md5 tokenHash convention — user_ids below were
  * chosen so ctrl = {1,2,5,6,11,13,15,17,19} (arm 0) and trt = {3,4,7,8}
  * (arm 1); the spec re-asserts the split rather than trusting it.
  */
class FloorDivSpec extends SparkSpec {

  test("b121 lift_bp floors (never rounds) on a .5-fraction non-degenerate funnel") {
    val s = spark
    import s.implicits._
    val full = Seq("view", "click", "signup", "purchase")
    // ctrl: 9 view, 8 click (all but 19), 2 signup (1,2), 1 purchase (1)
    // trt : 4 view, 3 click (3,4,7),     2 signup (3,4), 1 purchase (3)
    val depth = Map(1 -> 4, 2 -> 3, 5 -> 2, 6 -> 2, 11 -> 2, 13 -> 2,
      15 -> 2, 17 -> 2, 19 -> 1, 3 -> 4, 4 -> 3, 7 -> 2, 8 -> 1)
    val rows = for {
      (uid, k) <- depth.toSeq
      i <- 0 until k
    } yield (uid.toLong, s"2024-01-01 0$i:30:00", full(i), 1.0, "{}")
    val dir = tempDir("graft_floordiv").toString
    rows.toDF("user_id", "tss", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
      .withColumn("event_id", monotonically_increasing_id())
      .write.parquet(s"$dir/events.parquet")

    // Re-assert the md5-arm split the fixture was designed around.
    val arms = rows.map(_._1).distinct.map { uid =>
      uid -> spark.range(1).select(pmod(graft.functions.Text.tokenHash(
        lit(uid.toString)), lit(2L))).as[Long].head
    }.toMap
    assert(Seq(1L, 2L, 5L, 6L, 11L, 13L, 15L, 17L, 19L).forall(arms(_) == 0L))
    assert(Seq(3L, 4L, 7L, 8L).forall(arms(_) == 1L))

    val out = SparkEntry.queries("b121_funnel_ab")(spark, dir)
      .select("stage", "ctrl_users", "trt_users", "lift_bp")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._2, r._3)).toSeq ==
      Seq((9L, 4L), (8L, 3L), (2L, 2L), (1L, 1L)))
    // stage 2: trt_2*c1*10000 / (ctrl_2*t1) = 3*9*10000/(8*4) = 8437.5 —
    // the load-bearing assert: floor, not round-half-even.
    assert(out.map(_._4).toSeq == Seq(10000L, 8437L, 22500L, 22500L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivm, Scale, Series}

/** r8 additions: incremental aggregate maintenance ([[Ivm.mergeStates]]),
  * linear-interpolation gap fill ([[Series.interpolateHourlyCents]]), and
  * the sort-free equi-depth histogram ([[Scale.equiDepthHistogram]]).
  * Hand-computed fixtures + the operators' stated invariants.
  */
class IvmSeriesHistogramSpec extends SparkSpec {

  test("Ivm.mergeStates over a split equals the direct aggregate over the union") {
    val s = spark; import s.implicits._
    val rows = Seq((1L, 10L), (1L, 20L), (2L, 5L), (2L, 7L), (3L, 100L))
    def state(xs: Seq[(Long, Long)]) = xs.toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
    val specs = Map("n" -> "sum", "s" -> "sum", "lo" -> "min", "hi" -> "max")
    // split so key 3 exists only in one state and key 1 spans both
    val merged = Ivm.mergeStates(
        Seq(state(rows.take(2)), state(rows.drop(2))), Seq("k"), specs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val direct = state(rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("Ivm.mergeStates validates schemas and monoids") {
    val s = spark; import s.implicits._
    val st = Seq((1L, 2L)).toDF("k", "n")
    intercept[IllegalArgumentException] {
      Ivm.mergeStates(Seq(st), Seq("k"), Map("n" -> "sum"))
    }
    intercept[IllegalArgumentException] {
      Ivm.mergeStates(Seq(st, Seq((1L, 2L)).toDF("k", "m")), Seq("k"), Map("n" -> "sum"))
    }
    intercept[IllegalArgumentException] {
      Ivm.mergeStates(Seq(st, st), Seq("k"), Map("n" -> "avg"))
    }
  }

  test("interpolateHourlyCents fills gaps with the exact weighted mean and tags sources") {
    val s = spark; import s.implicits._
    // user 1: obs at hour 0 (1.00) and hour 3 (4.00) → hours 1,2 interpolated
    // 200, 300; user 2: single obs → single grid point; within-hour ties:
    // the LAST event of hour 0 (by ts, then event_id) wins
    val ev = Seq(
      (1L, "2024-01-01 00:05:00", 10L, 9.99),
      (1L, "2024-01-01 00:55:00", 11L, 1.00),
      (1L, "2024-01-01 03:10:00", 12L, 4.00),
      (2L, "2024-01-01 07:00:00", 13L, 5.55)
    ).toDF("user_id", "tss", "event_id", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val got = Series.interpolateHourlyCents(ev, "user_id", "ts", "event_id", "value")
      .orderBy(col("user_id"), col("hour_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val base = got.head._2 // 2024-01-01T00 in epoch-hours; offsets below are relative
    assert(got.map { case (u, h, v, src) => (u, h - base, v, src) }.toSeq == Seq(
      (1L, 0L, 100L, "obs"),
      (1L, 1L, 200L, "interp"),
      (1L, 2L, 300L, "interp"),
      (1L, 3L, 400L, "obs"),
      (2L, 7L, 555L, "obs")), got.mkString(","))
  }

  test("interpolateHourlyCents floor-division exactness on a non-divisible span") {
    val s = spark; import s.implicits._
    // obs 0 cents at hour 0, 5 cents at hour 2 → hour 1 = (0*1 + 5*1) div 2 = 2
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 0.00),
      (1L, "2024-01-01 02:00:00", 2L, 0.05)
    ).toDF("user_id", "tss", "event_id", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val mid = Series.interpolateHourlyCents(ev, "user_id", "ts", "event_id", "value")
      .where(col("src") === "interp").collect()
    assert(mid.length == 1 && mid(0).getLong(2) == 2L, mid.mkString(","))
  }

  test("twapCents integrates LOCF areas; bursts don't over-weight; single-obs keys drop") {
    val s = spark; import s.implicits._
    // user 1: 1.00 held for 3h, then 4.00 for 1h → twap = (100·3 + 400·1)/4 = 175
    // a burst of equal-ts readings at the 3h mark contributes zero area
    // except its last row (the (ts, tie) order); user 2: single obs → excluded
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.00),
      (1L, "2024-01-01 03:00:00", 2L, 9.99), // burst, same ts as next
      (1L, "2024-01-01 03:00:00", 3L, 4.00),
      (1L, "2024-01-01 04:00:00", 4L, 7.77), // last obs: no area
      (2L, "2024-01-01 05:00:00", 5L, 3.00)
    ).toDF("user_id", "tss", "event_id", "value")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
    val got = Series.twapCents(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 4L, 4L * 3600000000L, 175L)), got.toString)
  }

  test("equiDepthHistogram splits a uniform range into equal bins and respects ties") {
    val s = spark; import s.implicits._
    val uniform = (1L to 100L).toDF("v")
    val bins = Scale.equiDepthHistogram(uniform, col("v"), 4)
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.toSeq == Seq(
      (0L, 1L, 25L, 25L), (1L, 26L, 50L, 25L),
      (2L, 51L, 75L, 25L), (3L, 76L, 100L, 25L)), bins.mkString(","))
    // a value occurring more often than a bin's depth stays in ONE bin
    val skewed = (Seq.fill(90)(7L) ++ Seq(1L, 2L, 3L, 4L, 5L, 8L, 9L, 10L, 11L, 12L)).toDF("v")
    val sk = Scale.equiDepthHistogram(skewed, col("v"), 4)
      .orderBy(col("bin")).collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(sk.map(_._2).sum == 100L, sk.mkString(","))
    assert(sk.exists(_._2 >= 90L), s"hot value split across bins: ${sk.mkString(",")}")
  }

  test("equiDepthHistogram is invariant to input partitioning") {
    val s = spark; import s.implicits._
    val vals = (1L to 997L).map(i => (i * 7919L) % 1000L).toDF("v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Scale.equiDepthHistogram(df, col("v"), 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(run(vals.repartition(1)) == run(vals.repartition(13)))
  }

  test("two-level cumsum: bucketWidth never changes results (r18 kernel law)") {
    // The r18 valueCumSums kernel replaces the global single-partition
    // window with a bucket-two-level cumsum; the bucket width is a pure
    // physical knob. Force MANY buckets (widths smaller than the domain,
    // including width 1 = one bucket per value and widths that put
    // values exactly on bucket boundaries) and compare against the
    // single-bucket path (width >> domain) on both operators.
    val s = spark; import s.implicits._
    val vals = (1L to 500L).map(i => (i * 7919L) % 256L).toDF("v")
    def hist(w: Long) = Scale.equiDepthHistogram(vals, col("v"), 8, bucketWidth = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val ref = hist(1L << 40)
    for (w <- Seq(1L, 2L, 7L, 64L, 255L, 256L)) {
      val got = hist(w) // bind BEFORE assert: an eager clue would re-run the pipeline
      assert(got == ref, s"bucketWidth=$w diverged: $got vs $ref")
    }
    val wdf = (1L to 300L).map(i => ((i * 31L) % 97L, 1L + i % 5L)).toDF("v", "w")
    def pct(w: Long) = Scale.weightedPercentiles(
        wdf, col("v"), col("w"), Seq(25, 50, 90, 100), bucketWidth = w)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val pref = pct(1L << 40)
    for (w <- Seq(1L, 3L, 32L, 97L)) {
      val got = pct(w)
      assert(got == pref, s"bucketWidth=$w diverged: $got vs $pref")
    }
  }
}

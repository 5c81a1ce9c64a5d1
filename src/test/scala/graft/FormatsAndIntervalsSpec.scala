package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.operators.Intervals
import graft.sources.Formats
import graft.functions.Text

/** Round-3 additions: binned interval join, ORC/CSV roundtrips, PII scrub. */
class FormatsAndIntervalsSpec extends SparkSpec {

  import spark.implicits._

  // (key, ts) fixture spanning bin boundaries, duplicates, and a key with
  // no matches; window [ts-10, ts) with bin width 10 exercises both the
  // same-bin and previous-bin candidate paths.
  private lazy val lefts = Seq(
    (1L, 100L, 20L), (2L, 100L, 25L), (3L, 200L, 30L), (4L, 999L, 7L))
    .toDF("id", "k", "ts")
  private lazy val rights = Seq(
    (100L, 10L), (100L, 15L), (100L, 19L), (100L, 20L), (100L, 24L),
    (200L, 20L), (200L, 29L), (200L, 30L), (999L, 50L))
    .toDF("k", "ts")

  test("binnedRangeJoin matches the naive theta join, with half-open window semantics") {
    val binned = Intervals.binnedRangeJoin(lefts, rights, "k", "ts", "ts",
        lo = -10L, hi = 0L)
      .select(col("id"), col("r_ts")).as[(Long, Long)].collect().toSet
    val naive = lefts.as("l").join(rights.as("r"),
        col("l.k") === col("r.k") &&
          col("r.ts") >= col("l.ts") - 10 && col("r.ts") < col("l.ts"))
      .select(col("l.id"), col("r.ts")).as[(Long, Long)].collect().toSet
    assert(binned == naive)
    // edges: for id=1 (ts=20) the window is [10, 20): 10 in, 20 out
    assert(binned.contains((1L, 10L)) && !binned.contains((1L, 20L)))
    // id=3 (ts=30): 20 and 29 in (29 crosses the bin boundary path), 30 out
    assert(binned.contains((3L, 29L)) && binned.contains((3L, 20L)) && !binned.contains((3L, 30L)))
  }

  test("binnedRangeJoin is exact for negative timestamps (floor-div bins)") {
    val l = Seq((1L, 5L, -3L)).toDF("id", "k", "ts")
    val r = Seq((5L, -13L), (5L, -12L), (5L, -4L), (5L, -3L)).toDF("k", "ts")
    val got = Intervals.binnedRangeJoin(l, r, "k", "ts", "ts", -10L, 0L)
      .select(col("r_ts")).as[Long].collect().toSet
    assert(got == Set(-13L, -12L, -4L).filter(t => t >= -13 && t < -3)) // [-13, -3)
  }

  test("countInWindow keeps zero-count left rows") {
    val got = Intervals.countInWindow(lefts, rights, "k", "id", "ts", "ts",
        lo = -10L, hi = 0L)
      .select(col("id"), col("n_in_window")).as[(Long, Long)].collect().toMap
    assert(got(4L) == 0L) // right side has (999, 50) but window is [(7-10), 7)
    // id=1 (ts=20): [10,20) matches 10,15,19; id=2 (ts=25): [15,25) matches
    // 15,19,20,24
    assert(got(1L) == 3L && got(2L) == 4L)
  }

  test("ORC roundtrip preserves values and schema") {
    val df = Seq((1L, "x", 1.25), (2L, "y", -3.50)).toDF("id", "s", "v")
    val dir = Formats.scratchDir(spark, "test_orc", "spec")
    Formats.writeOrc(df, dir)
    val back = Formats.readOrc(spark, dir)
    // names+types roundtrip; nullability widens to true on file read (no
    // not-null metadata in ORC), which is the standard Spark contract
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("CSV roundtrip with declared schema is value-exact incl. decimal money") {
    val df = Seq((1L, "a,b", BigDecimal("12.34")), (2L, "c\"d", BigDecimal("-0.05")))
      .toDF("id", "s", "m")
      .select(col("id"), col("s"), col("m").cast("decimal(18,2)").as("m"))
    val dir = Formats.scratchDir(spark, "test_csv", "spec")
    Formats.writeCsv(df, dir)
    val back = Formats.readCsv(spark, dir,
      StructType.fromDDL("id LONG, s STRING, m DECIMAL(18,2)"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("CSV roundtrip keeps null and empty string distinct") {
    val df = Seq((1L, Some("x")), (2L, None), (3L, Some("")))
      .toDF("id", "s")
    val dir = Formats.scratchDir(spark, "test_csv_null", "spec")
    Formats.writeCsv(df, dir)
    val back = Formats.readCsv(spark, dir, StructType.fromDDL("id LONG, s STRING"))
      .orderBy("id").select("s").as[Option[String]].collect().toSeq
    assert(back == Seq(Some("x"), None, Some("")),
      s"null/empty collapsed through CSV: $back")
  }

  test("JSON-lines roundtrip is value-exact and keeps explicit nulls and arrays") {
    val df = Seq(
      (1L, Some("x"), Some(BigDecimal("12.34")), Seq(1, 2)),
      (2L, None, None, Seq.empty[Int]),
      (3L, Some(""), Some(BigDecimal("-0.05")), Seq(7)))
      .toDF("id", "s", "m", "xs")
      .select(col("id"), col("s"), col("m").cast("decimal(18,2)").as("m"), col("xs"))
    val dir = Formats.scratchDir(spark, "test_json", "spec")
    Formats.writeJsonLines(df, dir)
    val back = Formats.readJsonLines(spark, dir,
      StructType.fromDDL("id LONG, s STRING, m DECIMAL(18,2), xs ARRAY<INT>"))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq,
      "JSON roundtrip drifted (null dropped, decimal reparsed, or array reshaped)")
  }

  test("scratchDir distinguishes inputs by basename and runs by app id") {
    val a = Formats.scratchDir(spark, "p", "/data/sf0.001")
    val b = Formats.scratchDir(spark, "p", "/data/sf0.1")
    assert(a != b && a.contains("sf0.001") && b.contains("sf0.1"))
    assert(a.contains(spark.sparkContext.applicationId))
  }

  test("redact masks emails before digit runs") {
    val got = Seq("reach bob.smith+1@ex-ample.co.uk or 555123456, room 7")
      .toDF("t").select(Text.redact(col("t"))).as[String].head()
    assert(got == "reach <EMAIL> or <NUM>, room <NUM>")
  }

  test("redact is a no-op on clean text") {
    val got = Seq("only words here").toDF("t")
      .select(Text.redact(col("t"))).as[String].head()
    assert(got == "only words here")
  }

  test("mergeApply: update/insert/carry/delete branches, NULL-safe payloads") {
    val base = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None), (4L, Some(40.0)))
      .toDF("k", "v")
    val changes = Seq(
      (1L, Some(11.0), "U"),  // matched update
      (3L, None, "U"),        // matched update carrying a NULL payload — must WIN over base
      (4L, None, "D"),        // matched delete
      (5L, Some(50.0), "U"),  // unmatched insert
      (6L, None, "D"))        // delete of an absent key — no-op
      .toDF("k", "v", "op")
    val out = graft.operators.Merge.mergeApply(base, changes, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, Some(11.0), "update"),
      (2L, Some(20.0), "carry"),
      (3L, None, "update"),
      (5L, Some(50.0), "insert")))
  }

  test("mergeApply: an op code outside U/D fails the job loudly, never a silent insert") {
    // an unmatched malformed row used to survive as a null-payload
    // "insert" (the base side of the full outer join is all NULL and
    // 'X' is neither the D-filter nor the U-payload branch); the
    // in-plan raise_error guard must fail the job instead
    val base = Seq((1L, Some(10.0))).toDF("k", "v")
    val bad = Seq((9L, Some(90.0), "X")).toDF("k", "v", "op")
    val e = intercept[Exception] {
      graft.operators.Merge.mergeApply(base, bad, "k").collect()
    }
    val msg = String.valueOf(
      org.apache.commons.lang3.exception.ExceptionUtils.getRootCause(e).getMessage)
    assert(msg.contains("unknown op code 'X'"), s"wrong failure: $msg")
    // null op in the CHANGES frame is malformed too (distinct from the
    // legitimately-null __op of unmatched base rows after the join)
    val nullOp = Seq((9L, Some(90.0), null.asInstanceOf[String])).toDF("k", "v", "op")
    val e2 = intercept[Exception] {
      graft.operators.Merge.mergeApply(base, nullOp, "k").collect()
    }
    val msg2 = String.valueOf(
      org.apache.commons.lang3.exception.ExceptionUtils.getRootCause(e2).getMessage)
    assert(msg2.contains("unknown op code 'NULL'"), s"wrong failure: $msg2")
  }

  test("ensureWritten: concurrent callers produce exactly one write") {
    // the write-once guard is check-then-act on _SUCCESS; the per-dir
    // monitor must serialize the first build so racing queries on a
    // multi-tenant driver can never double-write (losers re-check the
    // marker the winner created)
    val dir = tempDir("graft-ensure-race").toString
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        start.await()
        graft.sources.Formats.ensureWritten(spark, dir) {
          writes.incrementAndGet()
          Thread.sleep(50) // widen the race window
          java.nio.file.Files.createFile(
            java.nio.file.Paths.get(dir, "_SUCCESS")): Unit
        }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(writes.get() == 1, s"write ran ${writes.get()} times")
  }

  test("snapshotDiff: added/removed/changed/unchanged with NULL-safe payload equality") {
    val s = spark; import s.implicits._
    val old = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None), (4L, None), (5L, Some(50.0)))
      .toDF("k", "v")
    val neu = Seq((1L, Some(10.0)),  // identical -> unchanged
      (2L, Some(21.0)),              // value moved -> changed
      (3L, None),                    // NULL -> NULL must read unchanged, not changed
      (4L, Some(44.0)),              // NULL -> value -> changed
      (6L, Some(60.0)))              // new key -> added; key 5 gone -> removed
      .toDF("k", "v")
    val got = graft.operators.Merge.snapshotDiff(old, neu, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "unchanged"), (2L, "changed"), (3L, "unchanged"),
      (4L, "changed"), (5L, "removed"), (6L, "added")))
  }
}

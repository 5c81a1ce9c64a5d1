package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY.md §2B last row).
  *
  * Batch-first design: the same transformations run unchanged on a static
  * DataFrame (`spark.read`) and on a stream (`spark.readStream`) — Spark's
  * unified API. Streaming specifics (watermarks, stateful dedup) appear only
  * in the `stream*` variants; `StreamingSpec` exercises them with a
  * MemoryStream source.
  *
  * Scale: windowed aggregation shuffles on (window, key); watermarks bound
  * state size so a 1000-executor streaming job does not accumulate
  * unbounded per-key state.
  */
object Streams extends Serializable {
  // Serializable: the funnel machines' flatMapGroupsWithState closures call
  // the shared object-level helpers (stageTimesOf / armHorizonTimeout),
  // which makes the closure capture this module; Scala modules serialize
  // as a readResolve back to MODULE$, so the marker costs nothing.

  /** Tumbling event-time window aggregation (batch or stream). */
  def tumblingCounts(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding window aggregation. */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows (gap-based). Works in batch and streaming. */
  def sessionCounts(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n"))

  /** Streaming variant with watermark — late data beyond `delay` dropped,
    * state pruned. */
  def streamTumblingCounts(events: DataFrame, width: String, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Tumbling-window approximate distinct users in a STREAM:
    * approx_count_distinct (HLL++) inside a watermarked streaming
    * aggregation. The HLL buffer is a mergeable sketch (per-register
    * max), so partial states merged in any arrival order produce the
    * SAME registers as one batch pass — the drained stream's append
    * output equals the batch aggregation bit-for-bit on closed windows
    * (asserted in StreamingSpec; batch parity oracle = b78). Per-window
    * state is one fixed-size sketch regardless of cardinality — the
    * reason this scales where streaming countDistinct (unbounded state)
    * is not even allowed. */
  def streamTumblingDistinct(events: DataFrame, width: String, delay: String,
                             rsd: Double = 0.05): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))

  /** SLIDING-window approximate distinct users in a STREAM — the b78
    * tumbling parity's harder sibling: `window(ts, width, slide)` assigns
    * every event to width/slide overlapping windows, and each window's
    * HLL registers still merge by per-register max, so arrival order and
    * micro-batch boundaries cannot change a closed window's estimate —
    * the drained stream's append output equals the batch sliding
    * aggregation bit-for-bit on closed windows (asserted in
    * StreamingSpec; batch parity oracle = b91). Determinism needs no
    * audit-boolean trick after all: the overlap only multiplies HOW MANY
    * windows an event feeds (a deterministic assignment), not the merge
    * algebra inside each window. State is width/slide sketches per
    * active window span — still fixed-size per window, pruned at the
    * watermark like the tumbling case. */
  def streamSlidingDistinct(events: DataFrame, width: String, slide: String,
                            delay: String, rsd: Double = 0.05): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), width, slide))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("window.start").as("window_start"), col("approx_users"))

  /** Count-min sketch maintained BY A STREAM: the CMS cell grid
    * (r, bucket) → cnt is a pure counting monoid, so it is just a
    * complete-mode streaming aggregation of [[graft.functions.CountMin]]'s
    * cell expansion — no custom state machine, and because cell addition
    * commutes, the drained stream's table equals the batch-built sketch
    * CELL-FOR-CELL in any arrival order (asserted in StreamingSpec;
    * batch parity oracle = c78). State is the fixed d·width grid — a few
    * KB regardless of stream length, the whole point of sketching a
    * stream. */
  def streamCountMinCells(events: DataFrame, keyCol: String,
                          d: Int = 4, width: Int = 64): DataFrame =
    graft.functions.CountMin.build(
      events.select(col(keyCol).cast("string").as("tok")), "tok", d, width)

  /** Per-window count-min cells maintained BY A STREAM over SLIDING
    * windows — the windowed+overlapping composition of [[
    * streamCountMinCells]] (global grid) and [[streamSlidingDistinct]]
    * (sliding assignment): each event feeds width/slide windows, and
    * within every window the (r, bucket) cell counts are a pure counting
    * monoid, so micro-batch boundaries and arrival order cannot change a
    * closed window's grid — the drained stream's append output equals
    * the batch sliding aggregation cell-for-cell (StreamingSpec; batch
    * parity oracle = c98). The bucket rule is shared with the batch
    * builder ([[graft.functions.CountMin.bucketOf]]) so the grids cannot
    * drift. State is one fixed d·width grid per active window span,
    * pruned at the watermark. */
  def streamSlidingCmsCells(events: DataFrame, width: String, slide: String,
                            delay: String, d: Int = 4, w: Int = 64): DataFrame =
    events.withWatermark("ts", delay)
      .select(col("ts"), col("user_id").cast("string").as("tok"))
      .select(col("ts"), col("tok"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(window(col("ts"), width, slide), col("r"),
        graft.functions.CountMin.bucketOf(col("r"), col("tok"), w).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("r"), col("bucket"), col("cnt"))

  /** Per-window Misra–Gries heavy-hitter summaries over SLIDING windows
    * in a STREAM — the third member of the sliding sketch family (HLL
    * [[streamSlidingDistinct]], CMS [[streamSlidingCmsCells]]). Raw MG
    * estimates are merge-order-dependent, so what is guaranteed — and
    * what StreamingSpec asserts against batch — is the mergeable-summary
    * AUDIT per closed window: every tok with cnt·(k+1) > n is captured,
    * and every estimate is within n/(k+1) of exact (the b80 discipline
    * applied per window). State is O(k) per active window span, pruned
    * at the watermark. Batch parity oracle = c99 (audit booleans +
    * exact counts). */
  def streamSlidingHeavyHitters(events: DataFrame, width: String, slide: String,
                                delay: String, k: Int = 2): DataFrame = {
    val mg = udaf(new graft.functions.Folds.MisraGries(k))
    events.withWatermark("ts", delay)
      .select(col("ts"), coalesce(col("event_type").cast("string"), lit("")).as("tok"))
      .groupBy(window(col("ts"), width, slide))
      .agg(mg(col("tok")).as("mg"))
      .select(col("window.start").as("window_start"), col("mg"))
  }

  /** Misra–Gries heavy-hitter summary maintained BY A STREAM: a
    * complete-mode aggregation of the [[graft.functions.Folds.MisraGries]]
    * udaf — micro-batch boundaries are just extra `merge` points, and the
    * mergeable-summaries guarantee (capture of every key with
    * f > n/(k+1), error ≤ n/(k+1), ≤ k entries) holds at ANY merge
    * order, so the drained stream's AUDIT equals the batch audit even
    * though raw estimates may differ (asserted in StreamingSpec). State
    * is O(k) regardless of stream length — with b78 (distinct), c78
    * (frequency) and this (top-k), the whole streaming sketch family
    * holds a few KB against an unbounded stream. */
  def streamHeavyHitterSummary(rows: DataFrame, keyCol: String, k: Int): DataFrame = {
    val mg = udaf(new graft.functions.Folds.MisraGries(k))
    rows.select(coalesce(col(keyCol).cast("string"), lit("")).as("tok"))
      .agg(mg(col("tok")).as("mg"))
  }

  /** Streaming dedup within the watermark horizon. */
  def streamDedup(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming session windows via the NATIVE `session_window` operator
    * with a watermark — the built-in counterpart to
    * [[sessionizeWithState]]'s hand-rolled state machine, and the
    * streaming side of [[sessionCounts]] (same expression, same output
    * schema; StreamingSpec asserts stream≡batch on the same data). In
    * append mode a session emits exactly once, when the watermark passes
    * its end; merged state is pruned at the same moment, so per-key state
    * is one (start, end, count) per OPEN session — bounded by active
    * users within the watermark horizon, not by history. Prefer this over
    * the custom state machine whenever plain gap semantics suffice; keep
    * sessionizeWithState for semantics session_window can't express
    * (per-event emission, custom close predicates). */
  def streamSessionCounts(events: DataFrame, gap: String, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n"))

  /** A closed user session: contiguous events with < gap between them. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n: Long)

  /** Internal running-session state: O(1) per user (times in µs).
    *
    * CHECKPOINT COMPATIBILITY: the three longs stored epoch-MILLIseconds
    * before r16 (b57cb59) and epoch-MICROseconds since, with an unchanged
    * physical schema — a query resumed from a pre-r16 checkpoint would
    * silently reinterpret ms values as µs (gap comparisons ~1000× off)
    * rather than fail loudly. Pre-r16 sessionize checkpoints are
    * INCOMPATIBLE and must be discarded (fresh checkpoint dir); Spark's
    * state store cannot version-detect a semantic change under an
    * identical schema, so this contract lives here. */
  case class SessionState(start: Long, last: Long, n: Long)

  /** java.sql.Timestamp ↔ epoch MICROSECONDS — the events table's
    * physical precision; session-gap comparisons at ms (getTime) would
    * split µs-resolution boundary pairs differently from the
    * session_window batch twin. floorDiv/floorMod keep pre-1970 times
    * exact too. */
  private def tsToUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Running per-key event count via transformWithState — Spark 4's
    * successor to [map|flatMap]GroupsWithState: named state variables on a
    * StatefulProcessor handle, RocksDB-backed, TTL-capable. Emits the
    * updated total for a key whenever it receives rows.
    */
  class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, (Long, Long)] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Long],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
      val c = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(c)
      Iterator.single((key, c))
    }
  }

  /** Stream of (user_id, running event count) updates. */
  def runningCountsWithState(events: DataFrame):
      org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming near-duplicate detection — the in-flight counterpart of
    * the batch minhash-LSH pass (`Dedup.minhashPairs` / c02). Keyed by LSH
    * band signature; state is the bucket's recent (doc, full-signature)
    * list. An incoming doc emits a candidate match when its minhash
    * signature agrees with a stored one on ≥ `threshold` of the
    * permutations (the standard minhash jaccard estimate) — so the
    * verify step happens in-state, no second pass. A doc is a near-dup
    * iff any of its bands emits a match.
    *
    * Scale: state per bucket is capped at `maxBucket` entries (the same
    * degenerate-tower guard as the batch pass); production adds a
    * processing-time TTLConfig so buckets age out. Shuffle key is the
    * band signature — uniform. Note: two near-dups arriving in the SAME
    * micro-batch may emit their match in either direction (row order
    * within a batch's key group is not defined); across batches the
    * earlier doc is always the `dup_of` side.
    */
  class NearDupProcessor(threshold: Double, maxBucket: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long, Seq[Long]), (Long, Long, Double)] {
    @transient private var recent:
      org.apache.spark.sql.streaming.ListState[(Long, Seq[Long])] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      recent = getHandle.getListState[(Long, Seq[Long])]("recent",
        org.apache.spark.sql.Encoders.product[(Long, Seq[Long])],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long, Seq[Long])],
        timerValues: org.apache.spark.sql.streaming.TimerValues):
        Iterator[(Long, Long, Double)] = {
      val out = Seq.newBuilder[(Long, Long, Double)]
      rows.foreach { case (_, docId, sig) =>
        var n = 0
        var seen = false
        recent.get().foreach { case (prevId, prevSig) =>
          n += 1
          if (prevId == docId) seen = true
          else {
            val est = sig.iterator.zip(prevSig.iterator)
              .count { case (a, b) => a == b }.toDouble / sig.size
            if (est >= threshold) out += ((docId, prevId, est))
          }
        }
        // never store the same doc twice: an at-least-once source that
        // re-delivers a doc across micro-batches must not inflate the
        // bucket toward maxBucket or multiply later candidates (the
        // re-delivery may RE-EMIT matches — at-least-once output, which
        // the documented DISTINCT consumer step absorbs)
        if (!seen && n < maxBucket) recent.appendValue((docId, sig))
      }
      out.result().iterator
    }
  }

  /** Stream of near-dup candidate matches `(doc_id, earlier_doc_id,
    * estimated_jaccard)` over a (id, text) document stream. Docs shorter
    * than one shingle are skipped (no signature to compare). A pair is
    * emitted once PER AGREEING BAND (the processor is band-local and
    * cannot see other buckets); consumers needing exactly-once candidates
    * aggregate downstream — `dropDuplicatesWithinWatermark` on
    * (doc_id, dup_of), or a DISTINCT in batch parity checks. */
  def streamNearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, numPerm: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000):
      org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val r = numPerm / bands
    val hs = array_distinct(graft.functions.Text.shingleHashes(col(textCol), 3))
    val sigd = docs
      .where(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.operators.Dedup.minhashSignature(hs, numPerm).as("sig"))
    val bandKeys = array((0 until bands).map(b =>
      concat(lit(s"$b:"), array_join(
        transform(slice(col("sig"), b * r + 1, r), _.cast("string")), "_"))): _*)
    sigd.select(explode(bandKeys).as("bkey"), col("doc_id"), col("sig"))
      .as[(String, Long, Seq[Long])]
      .groupByKey(_._1)
      .transformWithState(new NearDupProcessor(threshold, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * arbitrary-stateful-processing path for stream logic that windowed
    * aggregation can't express (here: emit a session only when it closes,
    * carrying its event count).
    *
    * State per user is O(1) (start/last/count), bounded by the event-time
    * timeout: idle users' state is evicted when the watermark passes
    * last + gap, so a 1000-executor job holds |active users| tiny records.
    * In batch mode Spark runs the same function with one group pass and a
    * final NoTimeout call — used by the spec to check batch/stream parity.
    *
    * O(1)-state CONTRACT (the trade vs the gated session_window path,
    * which keeps full per-session state and revises): within a
    * micro-batch, events sort before scanning, so intra-batch disorder
    * is exact; across micro-batches, the single open-session slot means
    * an admitted straggler EARLIER than the open session's start merges
    * into it (extending start backward) even when it is gap-separated —
    * a full revision would re-split, which O(1) state cannot represent.
    * Per-user in-order arrival across batches (the common
    * partitioned-source case) is exact; feeds needing straggler
    * re-splitting use [[streamSessionCounts]]. Gap comparisons run in µs
    * (the events table's physical precision) so boundary pairs split
    * identically to the batch twin.
    */
  def sessionizeWithState(events: DataFrame, gapMs: Long, delay: String):
      org.apache.spark.sql.Dataset[Session] = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMs * 1000L

    def close(userId: Long, st: SessionState): Session =
      Session(userId, usToTs(st.start), usToTs(st.last + gapUs), st.n)

    events.withWatermark("ts", delay)
      // keep the watermarked ts column itself — projecting it away would
      // hide the watermark from the stateful operator
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            val ts = rows.map(r => tsToUs(r._2)).toArray.sorted
            var st = state.getOption.getOrElse(SessionState(ts.head, ts.head, 0))
            val closed = Seq.newBuilder[Session]
            ts.foreach { t =>
              if (st.n > 0 && t - st.last >= gapUs) {
                closed += close(userId, st)
                st = SessionState(t, t, 1)
              } else {
                st = SessionState(math.min(st.start, t), math.max(st.last, t), st.n + 1)
              }
            }
            state.update(st)
            armHorizonTimeout(state, st.last, gapMs)
            closed.result().iterator
          }
      }
  }

  /** A user's closed funnel: earliest stage times (µs since epoch; null =
    * stage never reached), emitted once when the user's horizon closes.
    * `dropped_events` counts stage events that arrived beyond the
    * `maxBuffer` cap and were NOT buffered — when > 0, the stage times
    * for this user may diverge from the batch twin (answers, not just
    * cost, were truncated); downstream consumers and parity checks must
    * treat such rows as flagged. */
  case class FunnelUser(user_id: Long, s1_us: Option[Long],
                        s2_us: Option[Long], s3_us: Option[Long],
                        dropped_events: Long)

  /** N-stage generalization of [[FunnelUser]]: `stage_us(k)` is the
    * earliest qualifying time of stage k (null = never reached);
    * `dropped_events` as in [[FunnelUser]]. */
  case class FunnelStages(user_id: Long, stage_us: Seq[Option[Long]],
                          dropped_events: Long)

  /** The buffered-sort strictly-after stage machine — ONE implementation
    * shared by [[funnelStagesWithState]] and [[funnelRevenueWithState]]
    * so the b99- and b126-family close semantics can never fork: scan the
    * user's buffered (ts µs, stageIdx) pairs in ascending (ts, stage)
    * order (the stage tiebreak is cosmetic — strict inequalities make
    * same-ts order irrelevant — but keeps the scan deterministic for a
    * given buffer); stage k's time is the earliest event of stage k
    * strictly after stage k−1's time. */
  private def stageTimesOf(evs: Seq[(Long, Int)], nStages: Int): Array[Option[Long]] = {
    val s = Array.fill(nStages)(Option.empty[Long])
    evs.sortBy(identity).foreach { case (ts, st) =>
      if (s(st).isEmpty && (st == 0 || s(st - 1).exists(ts > _))) s(st) = Some(ts)
    }
    s
  }

  /** Horizon-clock arm shared by both funnel machines. Never set
    * at-or-before the current watermark (Spark rejects it, and a swallowed
    * rejection would leave the state timeout-less = a silent leak): if a
    * very late event computed a target the watermark already passed, clamp
    * to watermark + 1 ms — "close at the next watermark advance", the
    * correct semantics for an already-expired horizon. The only swallowed
    * case is batch execution (no watermark clock exists; closing is then
    * the caller's horizon cut, and timeouts never fire anyway). */
  private def armHorizonTimeout(state: org.apache.spark.sql.streaming.GroupState[_],
                                lastUs: Long, gapMs: Long): Unit = {
    val target = lastUs / 1000L + gapMs
    try {
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(target, wm + 1L))
    } catch {
      case _: UnsupportedOperationException => // batch: no watermark clock
    }
  }

  /** Internal funnel buffer: the user's stage-relevant events (ts µs,
    * stageIdx) within the horizon, the latest event time (µs), and the
    * count of events dropped by the `maxBuffer` cap. */
  case class FunnelBuf(evs: Seq[(Long, Int)], last: Long, dropped: Long)

  /** Ordered-funnel conversion ON A STREAM — b94's stage machine as a
    * stateful streaming operator (flatMapGroupsWithState, the
    * sessionizeWithState pattern): per user, buffer the stage-relevant
    * events; when the EVENT-TIME TIMEOUT fires (watermark passes the
    * user's last stage event + `gapMs` — the funnel horizon), sort the
    * buffer once and run the chained strictly-after machine
    * (s1 = min view; s2 = min click > s1; s3 = min purchase > s2), emit
    * ONE (user, s1, s2, s3) row, and drop the state.
    *
    * Buffer-until-close is what makes the result EXACT under
    * out-of-order arrival: a late-arriving earlier view can lower s1 and
    * thereby change which click qualifies as s2 — an incremental
    * stage-pointer state machine cannot revise its past, the buffered
    * sort can. The single ascending-ts scan reproduces the batch
    * window algebra exactly: once s1 is fixed (first stage-1 event in
    * time order), the first stage-2 event with ts strictly greater is
    * the minimum qualifying one, and so on — strict inequalities make
    * same-timestamp ties order-independent (a stage-2 event at ts == s1
    * never qualifies, in either engine). [[
    * graft.operators.Series.funnelStageTimes]] is the batch twin;
    * StreamingSpec asserts the drained stream equals it on the same
    * data, and the b99 oracle query replicates the watermark-cut output
    * shape in batch.
    *
    * State-format compatibility: the r11 observability work ADDED a
    * field to the state encoding (`FunnelBuf.dropped`) and to the
    * output (`dropped_events`) — a state-schema BREAK for
    * flatMapGroupsWithState. A streaming query restarted from a
    * checkpoint written by the pre-r11 operator will fail to decode (or
    * misdecode) its state; restarting across this change requires a
    * FRESH checkpoint directory (replay the source from a chosen
    * offset), the same migration contract Spark documents for its own
    * stateful-operator format changes.
    *
    * Scale: state per user is their stage-relevant events inside the
    * horizon — the stage rows of ONE user within `gapMs`, tiny at any
    * corpus size — capped at `maxBuffer` (beyond it new events extend
    * the horizon clock but are not buffered; the cap is a degenerate-key
    * guard, same discipline as NearDupProcessor's maxBucket). Unlike a
    * cost cap, this one can change ANSWERS for the capped user, so the
    * emitted row carries `dropped_events` — the count of unbuffered
    * events — and consumers must treat `dropped_events > 0` rows as
    * truncated. Shuffle key is user_id — the same single user shuffle
    * the batch funnel pays. */
  def funnelStagesWithState(events: DataFrame, stages: Seq[String], gapMs: Long,
                            delay: String, maxBuffer: Int = 10000):
      org.apache.spark.sql.Dataset[FunnelStages] = {
    require(stages.size >= 2, s"a funnel needs at least 2 stages, got $stages")
    require(stages.distinct.size == stages.size, s"duplicate stage in $stages")
    require(gapMs > 0, s"gapMs must be positive, got $gapMs — a non-positive " +
      "horizon would compute timeout timestamps at-or-before every event")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val nStages = stages.size
    def close(userId: Long, buf: FunnelBuf): FunnelStages =
      FunnelStages(userId, stageTimesOf(buf.evs, nStages).toSeq, buf.dropped)

    val stageIdx = stages.zipWithIndex.toMap
    val idxCol = stages.foldLeft(lit(-1)) { (acc, st) =>
      when(col("event_type") === st, lit(stageIdx(st))).otherwise(acc)
    }
    events.withWatermark("ts", delay)
      .where(col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"), idxCol.as("stage"), col("ts"))
      .as[(Long, Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, FunnelStages](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            val incoming = rows.map(r => (r._2, r._3)).toArray
            val prev = state.getOption.getOrElse(FunnelBuf(Seq.empty, Long.MinValue, 0L))
            val room = math.max(0, maxBuffer - prev.evs.size)
            val st = FunnelBuf(prev.evs ++ incoming.take(room),
              math.max(prev.last, incoming.iterator.map(_._1).max),
              prev.dropped + math.max(0, incoming.length - room))
            state.update(st)
            armHorizonTimeout(state, st.last, gapMs)
            Iterator.empty
          }
      }
  }

  /** 3-stage funnel with named s1/s2/s3 columns — a thin typed view over
    * [[funnelStagesWithState]] (the N-stage machine). Kept as the b99
    * oracle shape. */
  def funnelWithState(events: DataFrame, stages: Seq[String], gapMs: Long,
                      delay: String, maxBuffer: Int = 10000):
      org.apache.spark.sql.Dataset[FunnelUser] = {
    require(stages.size == 3, s"funnelWithState is the 3-stage view, got $stages")
    val spark = events.sparkSession
    import spark.implicits._
    funnelStagesWithState(events, stages, gapMs, delay, maxBuffer)
      .map(f => FunnelUser(f.user_id, f.stage_us(0), f.stage_us(1), f.stage_us(2),
        f.dropped_events))
  }

  /** Run `body` with a session on which Spark's stateful-operator static
    * checker is disabled — for query shapes PROVEN safe despite the
    * checker's conservative rejection (see [[streamFunnelAbConversion]]'s
    * scaladoc for the proof obligation).
    *
    * The body receives a `Sessions.isolated` CLONE of `spark` (same
    * SparkContext, caller's modifiable conf copied over, plus
    * `statefulOperator.checkCorrectness.enabled=false`) and must BUILD the
    * stream and call `.start()` on that clone: Spark reads the flag from
    * the DataFrame's own session at start-time analysis, so a stream built
    * on the original session would still be checked — and, symmetrically,
    * nothing this wrapper does can ever affect the original session. That
    * is the r14 ADVICE fix: the previous implementation set/restored the
    * flag on the CALLER's session under a lock, which was scoped but still
    * a shared-conf mutation — a query started concurrently outside the
    * wrapper during the window silently skipped the checker. With the
    * clone built internally there is no shared state, hence no lock and no
    * restore; unrelated queries on the caller's session keep the checker
    * unconditionally. Memory-sink tables the started query registers live
    * in the CLONE's catalog (temp views are per-session) — readers must go
    * through the clone, so bodies typically return it alongside the query
    * handle. */
  def withCheckerDisabled[T](spark: SparkSession)(body: SparkSession => T): T =
    body(graft.operators.Sessions.isolated(spark,
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled" -> "false"))

  /** Per-arm A/B funnel conversion MAINTAINED ON THE LIVE STREAM — the
    * streaming counterpart of the batch b121 readout and the next
    * consumer of [[funnelStagesWithState]] (state machine unchanged):
    * each user's closed funnel is assigned its experiment arm by the same
    * md5 tokenHash split the batch query uses (deterministic — stream and
    * batch agree on every user, which is what makes parity checkable),
    * then a downstream streaming aggregate keeps per-arm counts of users
    * who reached each stage, plus the summed `dropped_events` truncation
    * signal (a nonzero value flags that some per-user answers were capped
    * — the b99 discipline of surfacing truncation instead of hiding it).
    *
    * Emission semantics: a user enters the counts ONCE, when their funnel
    * horizon closes (funnel state machine append-output) — so the
    * aggregate is over an append stream of immutable per-user rows and
    * never needs to retract. Late events inside the allowed lateness
    * revise the user's stage times BEFORE the close (buffer-until-close),
    * exactly like batch; StreamingSpec includes that revision case.
    *
    * Scale: the funnel machine's one user_id shuffle + per-user horizon
    * state (unchanged); this adds a 2-row-state global aggregate (arm ∈
    * {0,1}) with map-side partial counts — the readout itself holds O(1)
    * state at any corpus size. Sink runs in Complete mode (2 rows).
    *
    * Static-checker note: Spark's UnsupportedOperationChecker rejects ANY
    * stateful operator downstream of flatMapGroupsWithState (the machine
    * can emit rows "older than watermark + delay", which a downstream
    * EVENT-TIME-stateful operator would discard as late). The aggregate
    * here is GLOBAL — no event-time column survives into it (stage times
    * are plain longs), so nothing is ever late-filtered and the flagged
    * correctness risk cannot occur on this shape. Callers must therefore
    * start the query with
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
    * (Spark's own documented escape hatch for exactly this understood-risk
    * case) — build AND `start()` the stream inside [[withCheckerDisabled]],
    * which hands the body a conf-isolated session clone carrying the flag,
    * so the caller's session is never touched and every other query keeps
    * the checker unconditionally (r13+r14 ADVICE); StreamingSpec uses the
    * wrapper. */
  def streamFunnelAbConversion(events: DataFrame, stages: Seq[String],
                               gapMs: Long, delay: String,
                               maxBuffer: Int = 10000): DataFrame = {
    val closed = funnelStagesWithState(events, stages, gapMs, delay, maxBuffer).toDF()
    val armed = closed.withColumn("arm",
      pmod(graft.functions.Text.tokenHash(col("user_id").cast("string")), lit(2L)))
    // count(col) skips nulls: stage_us(k) is null when stage k+1 was
    // never reached inside the horizon
    val stageCounts = stages.indices.map(k =>
      count(col("stage_us").getItem(k)).as(s"u${k + 1}"))
    armed.groupBy(col("arm"))
      .agg(stageCounts.head,
        (stageCounts.tail :+ sum(col("dropped_events")).as("dropped_events")): _*)
  }

  /** [[funnelRevenueWithState]] output: stage times as in [[FunnelStages]],
    * plus the user's ATTRIBUTED purchase cents (last-stage events with
    * event time strictly after the anchor stage and within the attribution
    * window — b123's window semantics) and the buffer-cap truncation
    * signal. */
  case class FunnelRevenue(user_id: Long, stage_us: Seq[Option[Long]],
                           attr_cents: Long, dropped_events: Long)

  /** Internal revenue-funnel buffer: (ts µs, stageIdx, cents) — cents is
    * nonzero only on last-stage (purchase) rows; `last`/`dropped` as in
    * [[FunnelBuf]]. */
  case class FunnelRevBuf(evs: Seq[(Long, Int, Long)], last: Long, dropped: Long)

  /** Revenue-attributing sibling of [[funnelStagesWithState]] — the state
    * machine behind the STREAMING A/B revenue readout (b126): per user,
    * buffer the stage-relevant events (purchase rows carry their cents),
    * and at horizon close run the same buffered-sort stage machine, then
    * sum the cents of purchase events with event time strictly after the
    * user's anchor-stage time (default: stage 2, the click — b114/b123's
    * attribution anchor) and at most `attrWindowMs` later.
    *
    * HONESTY CONTRACT (why this is not a stream-stream self-join): the
    * purchase leg of the revenue readout is the SAME event stream, and the
    * per-user keyed state ALREADY holds every stage-relevant event until
    * the horizon closes — attribution is a pure function of that buffer.
    * The one obligation is that every attributable purchase reaches the
    * buffer before the close fires, which `attrWindowMs <= gapMs`
    * guarantees under the watermark contract: the close fires when the
    * watermark passes last + gap; an attributable purchase has event time
    * ts <= anchor + attrWindow <= last + gap (anchor <= last), so a
    * non-late arrival (watermark has not passed ts) always lands before
    * the timeout — and the purchase row itself extends `last`, pushing the
    * close further out. The require below enforces the inequality rather
    * than silently under-attributing. (A 30-day attribution window would
    * need a 30-day horizon — state cost grows with the window, which is
    * the honest price of exact attribution on one stream; callers wanting
    * b123's 30-day window at lower state cost should run it in batch.)
    *
    * State format: a NEW encoding (cents in the tuple) — never restart
    * this operator from a [[funnelStagesWithState]] checkpoint (the same
    * fresh-checkpoint migration contract documented there).
    *
    * Scale: identical to [[funnelStagesWithState]] — one user_id shuffle,
    * per-user state bounded by the horizon's stage rows and `maxBuffer`
    * (answers for capped users may be truncated; `dropped_events`
    * surfaces it). */
  def funnelRevenueWithState(events: DataFrame, stages: Seq[String], gapMs: Long,
                             delay: String, attrWindowMs: Long,
                             anchorIdx: Int = 1, maxBuffer: Int = 10000):
      org.apache.spark.sql.Dataset[FunnelRevenue] = {
    require(stages.size >= 2, s"a funnel needs at least 2 stages, got $stages")
    require(stages.distinct.size == stages.size, s"duplicate stage in $stages")
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    require(attrWindowMs > 0 && attrWindowMs <= gapMs,
      s"attribution window ($attrWindowMs ms) must be positive and <= the " +
        s"horizon gap ($gapMs ms) — a wider window could attribute purchases " +
        "that arrive after the user's state closed (see scaladoc)")
    require(anchorIdx >= 0 && anchorIdx < stages.size - 1,
      s"anchorIdx $anchorIdx must name a stage before the revenue stage")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val nStages = stages.size
    val attrUs = attrWindowMs * 1000L
    def close(userId: Long, buf: FunnelRevBuf): FunnelRevenue = {
      val s = stageTimesOf(buf.evs.map(e => (e._1, e._2)), nStages)
      // every buffered purchase row inside (anchor, anchor + window]
      // counts (not only the stage-qualifying one) — b123's batch
      // semantics, where the attribution join scans ALL purchase events
      val attr = s(anchorIdx).fold(0L) { a =>
        buf.evs.iterator
          .filter { case (ts, st, _) => st == nStages - 1 && ts > a && ts <= a + attrUs }
          .map(_._3).sum
      }
      FunnelRevenue(userId, s.toSeq, attr, buf.dropped)
    }

    val stageIdx = stages.zipWithIndex.toMap
    val idxCol = stages.foldLeft(lit(-1)) { (acc, st) =>
      when(col("event_type") === st, lit(stageIdx(st))).otherwise(acc)
    }
    // coalesce: a purchase row with NULL value must enter the buffer as 0
    // cents, not crash the non-nullable tuple encoder — the batch twin's
    // attribution sum is null-tolerant, so the stream must be too
    val centsCol = coalesce(when(col("event_type") === stages.last,
      floor(col("value") * 100 + 0.5).cast("long")), lit(0L))
    events.withWatermark("ts", delay)
      .where(col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("us"), idxCol.as("stage"),
        centsCol.as("cents"), col("ts"))
      .as[(Long, Long, Int, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelRevBuf, FunnelRevenue](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, Long, Int, Long, java.sql.Timestamp)],
         state: GroupState[FunnelRevBuf]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _))
            state.remove()
            out.iterator
          } else {
            val incoming = rows.map(r => (r._2, r._3, r._4)).toArray
            val prev = state.getOption.getOrElse(FunnelRevBuf(Seq.empty, Long.MinValue, 0L))
            val room = math.max(0, maxBuffer - prev.evs.size)
            val st = FunnelRevBuf(prev.evs ++ incoming.take(room),
              math.max(prev.last, incoming.iterator.map(_._1).max),
              prev.dropped + math.max(0, incoming.length - room))
            state.update(st)
            armHorizonTimeout(state, st.last, gapMs)
            Iterator.empty
          }
      }
  }

  /** Per-arm A/B REVENUE readout MAINTAINED ON THE LIVE STREAM — the
    * streaming twin of the batch b123/b126 readout (r14 VERDICT #4,
    * resolved with the honest shape): [[funnelRevenueWithState]] closes
    * each user's funnel with their attributed purchase cents already
    * computed inside the per-user state, then a downstream GLOBAL
    * aggregate pivots both arms' starters / purchasers / attributed
    * revenue into ONE row with the exact-integer per-user rates and the
    * DECIMAL(38,0)-floored revenue lift — column-for-column the b126
    * batch key, plus the summed `dropped_events` truncation signal.
    *
    * Emission semantics as [[streamFunnelAbConversion]]: a user enters the
    * counts once, at horizon close, so the aggregate never retracts; the
    * md5 tokenHash arm split is deterministic, which is what makes
    * stream ≡ batch parity checkable (StreamingSpec asserts it live).
    *
    * Scale: the state machine's one user_id shuffle; the readout is a
    * global aggregate with map-side partial counts — O(1) state. Sink
    * runs in Complete mode (1 row).
    *
    * Static-checker note: same shape as [[streamFunnelAbConversion]] (a
    * global, non-event-time aggregate downstream of
    * flatMapGroupsWithState — provably never late-filtered) — build AND
    * start inside [[withCheckerDisabled]]. */
  def streamFunnelAbRevenue(events: DataFrame, stages: Seq[String],
                            gapMs: Long, delay: String, attrWindowMs: Long,
                            anchorIdx: Int = 1, maxBuffer: Int = 10000): DataFrame = {
    // forward the attribution anchor instead of hard-coding the inner
    // machine's default: a legal 2-stage funnel (stages.size >= 2, which
    // funnelRevenueWithState admits) needs anchorIdx 0 and was otherwise
    // unreachable from this readout
    val closed = funnelRevenueWithState(events, stages, gapMs, delay,
      attrWindowMs, anchorIdx = anchorIdx, maxBuffer = maxBuffer).toDF()
    val n = stages.size
    val armed = closed.withColumn("arm",
      pmod(graft.functions.Text.tokenHash(col("user_id").cast("string")), lit(2L)))
    val s1c = col("stage_us").getItem(0)
    val s4c = col("stage_us").getItem(n - 1)
    // rev-per-user + lift tail single-sourced with the batch keys
    // (Series.revPerUserLiftCols — the lift rule cannot fork between
    // stream and batch; StreamingSpec additionally pins live parity)
    graft.operators.Series.revPerUserLiftCols(
      armed.agg(
        count(when(col("arm") === 0, s1c)).as("ctrl_users"),
        count(when(col("arm") === 1, s1c)).as("trt_users"),
        count(when(col("arm") === 0, s4c)).as("ctrl_purchasers"),
        count(when(col("arm") === 1, s4c)).as("trt_purchasers"),
        coalesce(sum(when(col("arm") === 0, col("attr_cents"))), lit(0L)).as("ctrl_rev_c"),
        coalesce(sum(when(col("arm") === 1, col("attr_cents"))), lit(0L)).as("trt_rev_c"),
        coalesce(sum(col("dropped_events")), lit(0L)).as("dropped_events")))
  }

  /** Streaming calibration DRIFT monitor — the b122 graduation pattern
    * applied to the c114/c117 calibration family (r15 roadmap 4a): score
    * the live document stream, bucket every doc into the REFERENCE
    * calibration table's score ranges, and maintain per-reference-decile
    * live keep rates with drift verdicts against the reference's rates.
    * This is the LIVE half of the drift story: c117 answers "did the
    * corpus drift between two nightly generations"; this answers "is the
    * traffic arriving right now keeping at the rates the reference table
    * promises" — same 10-row readout shape, same ppm threshold device.
    *
    * Bucketing rule (deterministic, total): reference decile d owns
    * scores in [lo_d, lo_{d+1}), with the LOWEST reference bucket open
    * below (the min-lo row — not literal decile 1, which the reference
    * may lack under heavy score ties) and the last open above — every
    * live score lands in exactly one bucket,
    * including scores outside the reference's observed range. The rule is
    * derived from the reference table's lo_score column alone (one lead()
    * over the static 10-row frame), so live and reference can never
    * disagree on boundaries.
    *
    * Emitted per OBSERVED bucket: ref_kept_ppm, live doc/kept counts,
    * live ppm (exact BIGINT floor), ppm_delta, drifted (|delta| >
    * driftPpm), drifted_total. A reference decile with NO live docs emits
    * no row (stream-static joins cannot preserve the static side; absence
    * = "no traffic in this score band", which a monitor reads as a
    * different signal than drift). Docs whose text yields zero classifier
    * features carry no score and are outside the monitored population,
    * exactly as in the batch scored frame.
    *
    * Scale: per-doc scores are produced by the EMIT-ONCE
    * flatMapGroupsWithState scorer ([[emitOnceDocScores]] — a plain
    * aggregate double-counts across triggers in complete mode; the
    * multi-trigger StreamingSpec case proves both directions), which retains ZERO
    * per-doc state; the bucket join broadcasts the 10-row reference
    * (stateless); the readout aggregate holds O(10) durable state.
    * Complete-mode sink.
    *
    * Static-checker note: a stateful aggregate downstream of
    * flatMapGroupsWithState — the streamFunnelAbConversion case (the
    * fMGWS output is append-once per doc with no event-time column, so
    * nothing can be late-filtered or re-merged); build AND start inside
    * [[withCheckerDisabled]].
    *
    * The table-wide `drifted_total` audit count (the c116 discipline) is
    * NOT emitted here — a window over a streaming aggregate is
    * unsupported, and a third stateful layer buys nothing over the
    * consumer summing the 10-row `drifted` column at read time; the
    * batch twin (b127) carries it. */
  /** The reference-decile bucket frame — (decile, lo_score, ref_kept_ppm,
    * next_lo, is_first) — and its membership predicate, defined ONCE for
    * the streaming monitor and its batch key (b127) so the two can never
    * disagree on boundaries: decile d owns [lo_d, lo_{d+1}); the open-
    * below anchor is the MIN-lo row (is_first), NOT literal decile 1,
    * which the reference may lack when its lowest distinct score holds
    * >10% of the mass (the last-row decile rule; r15 review). */
  def calibrationBuckets(refTable: DataFrame): DataFrame = {
    val wLead = org.apache.spark.sql.expressions.Window.orderBy(col("lo_score"))
    refTable
      .select(col("decile"), col("lo_score"), col("kept_h_ppm").as("ref_kept_ppm"))
      .withColumn("next_lo", lead(col("lo_score"), 1).over(wLead))
      .withColumn("is_first", lag(col("lo_score"), 1).over(wLead).isNull)
  }

  /** Membership predicate over [[calibrationBuckets]] columns vs a
    * `score` column. */
  val calibrationBucketCond: Column =
    (col("is_first") || col("score") >= col("lo_score")) &&
      (col("next_lo").isNull || col("score") < col("next_lo"))

  /** The drift readout columns over a per-decile (n_docs_live,
    * kept_h_docs_live, ref_kept_ppm) aggregate — exact BIGINT ppm floor,
    * delta, and the |delta| > driftPpm verdict; ONE definition for the
    * stream and the batch key. */
  def calibrationDriftCols(agg: DataFrame, driftPpm: Long): DataFrame =
    agg
      .withColumn("kept_h_ppm_live",
        expr("(kept_h_docs_live * 1000000) div n_docs_live"))
      .withColumn("ppm_delta", col("kept_h_ppm_live") - col("ref_kept_ppm"))
      .withColumn("drifted", abs(col("ppm_delta")) > driftPpm)

  /** EMIT-ONCE per-doc classifier scoring for the streaming monitors —
    * (id, carry, score), one output row per doc per query lifetime
    * (r15 review, empirically forced): a plain per-doc AGGREGATE here
    * double-counts across micro-batches — in complete mode the upstream
    * aggregate re-emits its entire state every trigger and a downstream
    * stateful aggregate merges the re-emission additively (the
    * multi-trigger StreamingSpec cases measured 5 of 3).
    * flatMapGroupsWithState emits each doc's summed score exactly once
    * instead (the streamFunnelAbConversion append-once posture), so a
    * downstream aggregate only ever sees new docs. Correctness leans on
    * the ingest contract the batch side already assumes: doc_id arrives
    * in exactly ONE source row (a doc's exploded features then never
    * span triggers; re-delivery would re-emit). No state is ever
    * stored — the group is consumed and forgotten, durable state stays
    * bounded by the downstream readout for the whole query. Cost
    * disposition: fMGWS has no map-side combine, so the doc_id exchange
    * carries one slim (id, carry, w) row per FEATURE rather than a
    * partial-sum row per doc — the price of multi-trigger correctness;
    * raw text still never shuffles.
    *
    * `carry` is one per-doc Long constant riding alongside id (b127's
    * kept_h bit; pass lit(0L) and drop when unused) — a second text pass
    * on a STREAM would be a stream-stream self-join. */
  def emitOnceDocScores(docs: DataFrame, idCol: String, textCol: String,
                        weights: DataFrame, buckets: Int,
                        carry: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val feats = graft.operators.Pipeline.classifierFeatures(
      docs.withColumn("__carry", carry), idCol, textCol, buckets,
      carryCols = Seq("__carry"))
    feats
      .join(broadcast(weights.select(col("bucket"), col("w"))), "bucket")
      .select(col("id"), col("__carry"), col("w"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, Long, Long)],
         _: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          var carried = 0L; var score = 0L
          rows.foreach { r => carried = r._2; score += r._3 }
          Iterator((id, carried, score))
      }
      .toDF("id", "carry", "score")
  }

  def streamCalibrationMonitor(docs: DataFrame, refTable: DataFrame,
                               weights: DataFrame, buckets: Int,
                               keptNano: Long, driftPpm: Long): DataFrame = {
    val scored = emitOnceDocScores(docs, "doc_id", "text", weights, buckets,
        carry = (graft.functions.Text.qualityScoreNano(
          coalesce(col("text"), lit(""))) >= keptNano).cast("long"))
      .withColumnRenamed("carry", "kept_h")
    calibrationDriftCols(
      scored.join(broadcast(calibrationBuckets(refTable)), calibrationBucketCond)
        .groupBy(col("decile"), col("ref_kept_ppm"))
        .agg(count(lit(1)).as("n_docs_live"),
          sum(col("kept_h")).as("kept_h_docs_live")),
      driftPpm)
  }

  /** Streaming per-SOURCE classifier gate monitor — the live half of the
    * b122 batch key: score the document stream with the emit-once scorer,
    * stream-static join the slim (doc_id, source, n_chars) dims (stateless
    * — the static side re-reads per micro-batch), keep per-source totals,
    * gate passes, kept chars, and the exact-ppm keep rate. Drained-stream
    * ≡ batch parity and a multi-trigger no-double-count case live in
    * StreamingSpec.
    *
    * Migrated from the chained-aggregate shape (r16 roadmap item 4): the
    * original inline test stream used linearClassifierScore (a per-doc
    * AGGREGATE) feeding the per-source aggregate — correct when all data
    * arrives in one trigger, but across triggers the complete-mode re-
    * emission double-counts (the defect the b127 multi-trigger case
    * measured as 5 of 3). [[emitOnceDocScores]] emits each doc once, so
    * the per-source aggregate's durable state stays O(|sources|) AND
    * correct under any trigger schedule.
    *
    * Static-checker note: a stateful aggregate downstream of
    * flatMapGroupsWithState with no event-time column anywhere (nothing
    * can be late-filtered or re-merged) — build AND start inside
    * [[withCheckerDisabled]]. Complete-mode sink. */
  def streamClassifierGateMonitor(docs: DataFrame, dims: DataFrame,
                                  weights: DataFrame, buckets: Int): DataFrame =
    emitOnceDocScores(docs, "doc_id", "text", weights, buckets,
        carry = lit(0L))
      .select(col("id").as("doc_id"), col("score"))
      .join(dims, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_docs"),
        sum(when(col("score") >= 0L, 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("score") >= 0L, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .withColumn("kept_ppm", expr("(kept_docs * 1000000) div total_docs"))

  /** Stream-stream event-time interval join — the impressions ⋈ clicks
    * shape (SURVEY.md §8 roadmap item 5): every (left, right) pair with
    * equal `keyCol` and `rightTs ∈ [leftTs, leftTs + window)`. Both sides
    * carry watermarks, and that plus the time-range predicate is what lets
    * Spark BOUND the join state: from the condition it derives per-side
    * state watermarks — a buffered left row is evictable once the global
    * watermark passes `leftTs + window`, a right row once it passes
    * `rightTs` — so a 1000-executor job holds only the in-flight window of
    * both streams, not their history. (Without the range predicate,
    * stream-stream inner-join state grows forever; the watermark alone
    * does not bound it.) StreamingSpec asserts the eviction actually
    * happens: state rows drop once the watermark passes the buffered pairs.
    *
    * Unified API: on static frames `withWatermark` is a no-op and the plan
    * is a plain equi-join on `keyCol` with the range as a post-filter (the
    * selective-equality-key shape `Intervals` documents as safe; b42's
    * batch-parity oracle runs exactly this, plan-asserted no-BNLJ). The
    * two ts columns must be distinctly named; `keyCol` may be same-named
    * on both sides (resolved by frame reference, right copy dropped).
    *
    * `joinType = "left_outer"` is the views-without-clicks shape: an
    * unmatched left row is emitted (right columns null) only once the
    * watermark passes `leftTs + window` — the same eviction clock that
    * bounds the state proves no match can still arrive, so outer results
    * are exact, just watermark-delayed (StreamingSpec asserts this). */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                         leftTs: String, rightTs: String,
                         window: String, delay: String,
                         joinType: String = "inner"): DataFrame = {
    require(leftTs != rightTs,
      s"ts columns must be distinctly named, both are '$leftTs'")
    val l = left.withWatermark(leftTs, delay)
    // rename the right key BEFORE joining: with drop(r(keyCol)) a
    // self-joined source can resolve both references to one attribute and
    // drop the LEFT copy — harmless on inner joins (equal values), but on
    // left_outer the surviving right copy is null for unmatched rows
    val rk = s"__${keyCol}_r"
    val r = right.withWatermark(rightTs, delay).withColumnRenamed(keyCol, rk)
    l.join(r, col(keyCol) === col(rk) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) < col(leftTs) + expr(s"INTERVAL $window"),
      joinType)
      .drop(rk)
  }

  /** Stream decontamination against a STATIC Bloom bitmap: drop every
    * stream row whose `hashCol` probes positive in `bits` (built batch-side
    * over the eval corpus with [[graft.functions.Bloom.build]] and embedded
    * as a literal — m/8 bytes shipped once per executor with the plan, no
    * stream-static join, no state store). Stateless, so no watermark is
    * needed and the codegen'd probe rides inside the stream's narrow
    * pipeline. Bloom semantics on a stream: false negatives never happen —
    * no contaminated row passes; false positives drop a few clean rows
    * (tunable via m and k), the safe direction for decontamination. */
  def streamBloomDrop(stream: DataFrame, hashCol: Column,
                      bits: Array[Long], k: Int): DataFrame =
    // a NULL key carries no membership evidence and must be KEPT: the
    // probe null-propagates, and a bare where(!null) would silently drop
    // every null-keyed row — the one direction bloom decontamination
    // promises never to err in (only false POSITIVES may drop clean rows)
    stream.where(hashCol.isNull ||
      !graft.plans.BloomExpressions.mightContain(typedlit(bits), hashCol, k))

  // ---------------------------------------------------------------------
  // Continuous IVM: a streaming materialized aggregate via foreachBatch
  // ---------------------------------------------------------------------

  private def genPath(stateDir: String, gen: Long): String =
    s"$stateDir/gen=$gen"

  /** Committed generations via the HADOOP filesystem of `stateDir` — not
    * java.io.File, which silently sees nothing on hdfs://, s3a://, or a
    * non-local default FS: the writes (spark.write.parquet) would land
    * remotely while a local-FS listing returned empty, so every merge
    * would quietly restart from scratch and the final state would be one
    * batch's partials — the worst failure mode is the silent one. */
  private def committedGens(spark: org.apache.spark.sql.SparkSession,
                            stateDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
  }

  /** The current materialized IVM state (latest committed generation), or
    * None before the first batch lands. */
  def ivmState(spark: org.apache.spark.sql.SparkSession,
               stateDir: String): Option[DataFrame] = {
    val gens = committedGens(spark, stateDir)
    if (gens.isEmpty) None else Some(spark.read.parquet(genPath(stateDir, gens.max)))
  }

  /** `foreachBatch` body for a continuously-maintained aggregate — the
    * streaming face of [[graft.operators.Ivm]]: each micro-batch reduces
    * to its per-key PARTIAL STATE (`state`, e.g. count/sum/min/max per
    * key) and merges with the previous materialization, writing a new
    * at-rest generation `stateDir/gen=<batchId>`.
    *
    * Exactly-once without a transactional sink: generations are keyed by
    * the micro-batch id, and a retried batch merges from the latest
    * generation STRICTLY BELOW its own id — so a re-run overwrites
    * `gen=b` with the identical merge instead of double-counting (the
    * standard idempotent-foreachBatch discipline). The immediately
    * preceding generation is kept for exactly that retry; older ones are
    * vacuumed best-effort.
    *
    * Scale: per batch, cost is O(|batch| + |affected keys|) — the batch
    * aggregate shuffles on the key, the merge unions two key-partitioned
    * frames through one partial+final aggregate (Ivm.mergeStates), and
    * the previous state is READ, never recomputed. This is the "streaming
    * materialized view" shape a 100 TB/day rollup runs on; at that scale
    * `stateDir` is a table format with compaction, and this
    * generation-swap is the minimal file-based equivalent (the
    * Formats.ensureWritten at-rest discipline applied to mutable state).
    * StreamingSpec asserts the drained stream's final state equals the
    * b72 batch recompute row-for-row.
    */
  def ivmMergeBatch(stateDir: String, keys: Seq[String],
                    specs: Map[String, String],
                    state: DataFrame => DataFrame): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      val agg = state(batch)
      val prior = committedGens(spark, stateDir).filter(_ < batchId)
      val merged =
        if (prior.isEmpty) agg
        else graft.operators.Ivm.mergeStates(
          Seq(spark.read.parquet(genPath(stateDir, prior.max)), agg), keys, specs)
      merged.write.mode("overwrite").parquet(genPath(stateDir, batchId))
      // vacuum everything below the retry parent (best-effort, same
      // Hadoop FS as the listing — works on any filesystem the state
      // itself lives on)
      val fs = new org.apache.hadoop.fs.Path(stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      prior.filter(_ < prior.max).foreach { g =>
        fs.delete(new org.apache.hadoop.fs.Path(genPath(stateDir, g)), true): Unit
      }
    }
}

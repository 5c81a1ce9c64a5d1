package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r10 VERDICT #6): measure the PER-TASK consequence of b47's
  * salted join on a deliberately skewed key — the missing
  * measured-consequence end of the skew story (b81 profiles skew, c83
  * decides broadcast/salt/SMJ, this tool shows what the salt actually
  * buys). Broadcast joins are disabled (100 TB regime: neither side fits
  * on one executor) and AQE is off — AQE's runtime skew-split is the
  * dynamic alternative to static salting, so it must not silently fix the
  * plain plan we are measuring.
  *
  * Setup: lineitem's join key is remapped so ~90 % of rows pile onto ONE
  * hot supplier key (`l_orderkey % 10 != 0 → key 1`, else the real
  * l_suppkey — deterministic, no rand()); the dim side is supplier. The
  * PLAIN merge join shuffles every hot row to the single reducer that
  * owns key 1; [[graft.operators.Scale.saltedJoin]] with salts=8 spreads
  * them over 8 reducers at the cost of replicating the dim side 8×.
  *
  * What is printed per variant: the reduce-task skew profile — max /
  * p50 shuffle-read bytes AND records per task, with each max's share of
  * the stage total. The decision number is the max-task RECORD share:
  * at sf0.1 shuffle BYTES are compression-dominated (a constant hot key
  * RLE/dictionary-compresses to almost nothing, so the hot reducer's
  * bytes understate its row load ~100×), while records measure exactly
  * the work and memory one reducer must absorb — at 100 TB with
  * realistic payload widths, bytes track records. Expectation to
  * validate: the max-task record share collapses from ~hot-fraction to
  * ~hot-fraction × ceil(salts/partition-spread)/salts — i.e. ÷salts up
  * to hash-collision granularity: `salts` (key, salt) combos hash into
  * `shuffle.partitions` reducers, so a few combos can land on one
  * reducer; salts ≈ the reducer count gives the fullest spread. Results
  * land in docs/PLANS.md (salted-join payoff row). Wall is captured
  * before the listener quiesce (the JoinOrderDelta timing rule).
  *
  * Usage: runMain graft.SaltDelta [sfDir]
  */
object SaltDelta {
  /** Per-task shuffle-read recorder: (bytes, records) per task-end since
    * the last mark, driver-side tooling only. */
  final class TaskReadAcc extends org.apache.spark.scheduler.SparkListener {
    private val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)]
    private val started = new java.util.concurrent.atomic.AtomicLong
    private val ended = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) buf.synchronized {
        buf += ((m.shuffleReadMetrics.totalBytesRead,
          m.shuffleReadMetrics.recordsRead))
      }
    }
    override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      started.incrementAndGet()
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      ended.incrementAndGet()
    private def quiesce(maxMs: Long = 2000): Unit = {
      val t0 = System.nanoTime()
      while (started.get != ended.get && (System.nanoTime() - t0) / 1e6 < maxMs)
        Thread.sleep(10)
    }
    def mark(): Unit = { quiesce(); buf.synchronized(buf.clear()) }
    /** Snapshot of per-task (readBytes, readRecords) since mark. */
    def tasks(): Seq[(Long, Long)] = { quiesce(); buf.synchronized(buf.toSeq) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    val spark = graft.operators.Sessions.isolated(base,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val acc = new TaskReadAcc
    spark.sparkContext.addSparkListener(acc)
    import graft.sources.Tables.t

    // ~90 % of lineitem rows remapped onto hot key 1; the rest keep their
    // real supplier key so the dim join stays total
    def big = t(spark, sfDir, "lineitem")
      .select(when(col("l_orderkey") % 10 =!= 0, lit(1L))
        .otherwise(col("l_suppkey")).as("k"), col("l_extendedprice"))
    def small = t(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_nationkey"))

    def profile(label: String, df: => DataFrame): Long = {
      df.count() // warm IO/page cache
      acc.mark()
      val t0 = System.nanoTime()
      val n = df.count()
      val wallS = (System.nanoTime() - t0) / 1e9
      val ts = acc.tasks().filter(_._1 > 0).sortBy(-_._1)
      val totB = ts.map(_._1).sum
      val maxB = ts.headOption.map(_._1).getOrElse(0L)
      val p50B = if (ts.isEmpty) 0L else ts(ts.size / 2)._1
      val totRec = ts.map(_._2).sum
      val maxRec = ts.map(_._2).maxOption.getOrElse(0L)
      println(f"[saltdelta] $label%-14s rows=$n%9d read_tasks=${ts.size}%3d " +
        f"total_read_kb=${totB / 1024}%7d max_task_kb=${maxB / 1024}%7d " +
        f"p50_task_kb=${p50B / 1024}%6d " +
        f"max_task_records=$maxRec%8d max_record_share=${
          if (totRec == 0) 0.0 else maxRec.toDouble / totRec}%5.3f " +
        f"wall_s=$wallS%5.2f")
      n
    }

    println(s"[saltdelta] sfDir=$sfDir broadcast=off aqe=off " +
      "(hot key = ~90% of lineitem; 32 shuffle partitions)")
    val nPlain = profile("plain_smj",
      big.hint("merge").join(small, Seq("k")))
    val nSalted8 = profile("salted_smj_8",
      graft.operators.Scale.saltedJoin(big, small, "k", salts = 8))
    val nSalted32 = profile("salted_smj_32",
      graft.operators.Scale.saltedJoin(big, small, "k", salts = 32))
    require(nPlain == nSalted8 && nPlain == nSalted32,
      s"salting changed the result: plain=$nPlain salted8=$nSalted8 salted32=$nSalted32")
    println(s"[saltdelta] results identical: $nPlain rows in all variants")
    spark.stop()
  }
}

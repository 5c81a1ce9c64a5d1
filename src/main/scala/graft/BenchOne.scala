package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: time a subset of SparkEntry.queries (args = query names),
  * same session config and count()-mode timing as [[Bench]]. Each query
  * is timed twice — cold (first build+run in this session: includes JIT,
  * file-index, and any memoized-intermediate builds) and warm (repeat:
  * the steady-state cost the suite's min-of-two approximates) — because
  * attribution disputes are usually exactly this split (e.g. c95's 16
  * BPE rounds: ~0.55 s/round cold, 3.5 s suite-min with warm checkpoint
  * reuse). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Same shuffle/spill attribution as Bench: per-run byte deltas are the
    // host-noise-immune signal (wall on this host has stall windows), and
    // the jobs delta makes per-round action counts observable for the
    // iterative class (c95/c75).
    val acc = new Bench.TaskMetricsAcc
    spark.sparkContext.addSparkListener(acc)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    args.foreach { name =>
      acc.mark(); val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val (cr, cw, _, _) = acc.delta(); val cj = jobs.get() - j0
      acc.mark(); val j1 = jobs.get()
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(name)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      val (wr, ww, _, _) = acc.delta(); val wj = jobs.get() - j1
      require(n == n2, s"$name row count changed between runs: $n vs $n2")
      println(f"[benchone] $name cold=$cold%.3f s warm=$warm%.3f s ($n rows) " +
        f"cold_kb_rw=${cr >> 10},${cw >> 10} warm_kb_rw=${wr >> 10},${ww >> 10} jobs=$cj%d/$wj%d")
    }
    spark.stop()
  }
}

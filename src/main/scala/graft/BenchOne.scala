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
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(name)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      require(n == n2, s"$name row count changed between runs: $n vs $n2")
      println(f"[benchone] $name cold=$cold%.3f s warm=$warm%.3f s ($n rows)")
    }
    spark.stop()
  }
}

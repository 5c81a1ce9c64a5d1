package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: materialize the b64 (Morton) and b93 (Hilbert) 2-D skipping
  * layouts for a scale factor and report each one's file-level skip rate
  * on the SAME 2-D box predicate — the same envelope-intersection
  * measurement ScaleSpec asserts at the test scale, runnable at any sf
  * for the docs/PLANS.md layout-quality ledger. A file is touched iff its
  * (custkey, day) min/max envelope intersects the box [0,80)×[-inf,730);
  * with upper-bound-only predicates that reduces to min(col) < bound.
  * Everything else is skipped on footer stats alone.
  * Usage: runMain graft.SkipRate <sfDir>
  */
object SkipRate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def measure(query: String, scratch: String, label: String): Unit = {
      // run the query once: writes the layout (write-once per app)
      SparkEntry.queries(query)(spark, sfDir).count()
      val dir = graft.sources.Formats.scratchDir(spark, scratch, sfDir)
      val env = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("o_custkey")).as("c0"), min(col("o_day")).as("d0"))
        .collect()
      val total = env.length
      val touched = env.count(r => r.getAs[Long]("c0") < 80L && r.getAs[Int]("d0") < 730)
      println(f"[skiprate] $label $sfDir files=$total touched=$touched " +
        f"skipped=${total - touched} skip_pct=${100.0 * (total - touched) / total}%.1f")
    }
    measure("b64_zorder_prune", "orders_zorder", "morton ")
    measure("b93_hilbert_prune", "orders_hilbert", "hilbert")
    spark.stop()
  }
}

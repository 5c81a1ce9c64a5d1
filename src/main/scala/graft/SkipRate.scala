package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: materialize the b64 z-order layout for a scale factor and
  * report the file-level skip rate its 2-D box predicate earns — the same
  * envelope-intersection measurement ScaleSpec asserts at the test scale,
  * runnable at any sf for the docs/PLANS.md layout-quality ledger. A file
  * is touched iff its (custkey, day) min/max envelope intersects the b64
  * box [0,80)×[-inf,730); everything else is skipped on footer stats
  * alone. Usage: runMain graft.SkipRate <sfDir>
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
    // run b64 once: writes the z-ordered layout (write-once per app)
    SparkEntry.queries("b64_zorder_prune")(spark, sfDir).count()
    val dir = graft.sources.Formats.scratchDir(spark, "orders_zorder", sfDir)
    val env = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_custkey")).as("c0"), min(col("o_day")).as("d0"))
      .collect()
    val total = env.length
    val touched = env.count(r => r.getAs[Long]("c0") < 80L && r.getAs[Int]("d0") < 730)
    println(f"[skiprate] $sfDir files=$total touched=$touched " +
      f"skipped=${total - touched} skip_pct=${100.0 * (total - touched) / total}%.1f")
    spark.stop()
  }
}

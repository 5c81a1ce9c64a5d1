package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure how much work the c67 prefix filter removes vs the
  * c04 full inverted index on real data — indexed postings and generated
  * candidate pairs (Σ_h df·(df−1)/2 over each index's posting lists),
  * before verification. The exactness proof is in
  * [[graft.operators.Dedup.prefixJaccardPairsOf]]; this quantifies the
  * constant-factor win for the docs/PLANS.md ledger.
  * Usage: runMain graft.PrefixStats <sfDir>
  */
object PrefixStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sets = graft.operators.Dedup.shingleSets(
        graft.sources.Tables.t(spark, sfDir, "documents"), "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = sets.select(col("id"), size(col("hs")).as("sz"),
      explode(col("hs")).as("h"))
    val dfTab = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val ranked = postings.join(dfTab, Seq("h"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("df"), col("h"))))
    val prefix = ranked.where(col("sz") * 4 <= (col("sz") - col("rn") + 1) * 5)
    def pairsOf(p: org.apache.spark.sql.DataFrame): Long =
      p.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .agg(sum(col("df") * (col("df") - 1) / 2).cast("long")).head().getLong(0)
    val fullPostings = postings.count()
    val prefixPostings = prefix.count()
    val fullPairs = pairsOf(postings)
    val prefixPairs = pairsOf(prefix.select(col("h")))
    println(f"[prefixstats] $sfDir postings full=$fullPostings prefix=$prefixPostings " +
      f"(${100.0 * prefixPostings / fullPostings}%.1f%%) candidate_pairs " +
      f"full=$fullPairs prefix=$prefixPairs (${100.0 * prefixPairs / fullPairs}%.1f%%)")
    spark.stop()
  }
}

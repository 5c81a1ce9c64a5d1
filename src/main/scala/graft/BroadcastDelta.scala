package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r12 VERDICT #6): measure the consequence of the c83 plan
  * advisor's BROADCAST branch — the one decision of its three
  * (broadcast / salted / plain SMJ) without a recorded payoff
  * (JoinOrderDelta covers the order decision, SaltDelta the salt one).
  *
  * Shape = exactly the join c83 advises on: events ⋈ customer on
  * user_id = c_custkey. At sf0.1 the advisor's inputs are nb = 15k
  * customer rows ≤ the 1M-row broadcast bar → `broadcast_build_right`.
  * This runs the ADVISED plan (broadcast hint on customer) against the
  * NAIVE plan (broadcast disabled → shuffled sort-merge join) with AQE
  * off in both sessions (the written plan is the executed plan), and
  * prints rows / shuffle bytes / peak / wall for each. The expected
  * 100 TB story being validated at measurement scale: the broadcast
  * plan never shuffles the FACT side (shuffle bytes ≈ the dim
  * broadcast, constant in the fact size), while SMJ shuffles BOTH
  * sides (bytes ∝ fact) — the decision's payoff grows linearly with
  * the fact table.
  *
  * Results land in docs/PLANS.md (c83 broadcast-decision payoff row).
  * Usage: runMain graft.BroadcastDelta [sfDir]
  */
object BroadcastDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    val acc = new Bench.TaskMetricsAcc
    base.sparkContext.addSparkListener(acc)
    import graft.sources.Tables.t

    def measure(spark: SparkSession, label: String)(df: => DataFrame): Unit = {
      val frame = df
      require(frame.sparkSession eq spark,
        s"$label: frame bound to a different session than the labeled one")
      frame.count() // warm IO/page cache so plans, not cold reads, differ
      acc.mark()
      val t0 = System.nanoTime()
      val n = frame.count()
      val wallS = (System.nanoTime() - t0) / 1e9 // before delta(): quiesce sleeps
      val (r, w, _, peak) = acc.delta()
      println(f"[broadcast] $label%-24s rows=$n%9d shuffle_read_kb=${r / 1024}%8d " +
        f"shuffle_write_kb=${w / 1024}%8d peak_mb=${peak / 1024 / 1024}%5d " +
        f"wall_s=$wallS%6.2f")
    }

    println(s"[broadcast] sfDir=$sfDir aqe=off (both variants)")
    // advised: broadcast hint (what c83's broadcast_build_right means)
    val sAdv = graft.operators.Sessions.isolated(base,
      "spark.sql.adaptive.enabled" -> "false")
    measure(sAdv, "advised broadcast(cust)")(
      t(sAdv, sfDir, "events").select(col("user_id"), col("event_type"))
        .join(broadcast(t(sAdv, sfDir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("user_id") === col("c_custkey")))
    // naive: the same join with broadcasting impossible → shuffled SMJ
    val sNaive = graft.operators.Sessions.isolated(base,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    measure(sNaive, "naive SMJ (no broadcast)")(
      t(sNaive, sfDir, "events").select(col("user_id"), col("event_type"))
        .join(t(sNaive, sfDir, "customer")
          .select(col("c_custkey"), col("c_name")),
          col("user_id") === col("c_custkey")))
    // the advisor's decision inputs, for the PLANS.md row
    SparkEntry.queries("c83_plan_advisor")(base, sfDir).collect()
      .foreach(r => println(s"[broadcast] advisor row: $r"))
    base.stop()
  }
}

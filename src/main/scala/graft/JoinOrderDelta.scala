package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r9 VERDICT #5): measure the SHUFFLE-BYTE consequence of the
  * c100 join-order advisor's greedy first-pair choice, chosen order vs the
  * worst order, with broadcast joins disabled (the 100 TB regime — no side
  * fits on one executor) and AQE off (so the written plan IS the executed
  * plan). Two chains are measured:
  *
  *  1. The c100 shape itself — events ⋈ orders ⋈ customer, every edge on
  *     the SHARED customer key. Expectation to validate: Spark's
  *     partitioning reuse makes this chain shuffle-byte-NEUTRAL to order
  *     (the first join's output is already hash-partitioned on the key, so
  *     the second join inserts no exchange); the advisor's payoff here is
  *     intermediate ROWS through the second merge (and thus wall/memory),
  *     not bytes. Both rows-through-second-join and bytes are printed.
  *
  *  2. The two-key chain lineitem ⋈ orders (orderkey) ⋈ customer (custkey),
  *     where the intermediate's join key CHANGES between steps, so the
  *     intermediate itself re-shuffles and the order moves real bytes:
  *     dim-first shuffles the 150k-row orders intermediate; fact-first
  *     re-shuffles the 600k-row lineitem⋈orders intermediate. This is the
  *     shape cost-based reordering exists for; the same CMS inner-product
  *     estimate (one sketch per table PER JOIN KEY) ranks it correctly.
  *
  * Results land in docs/PLANS.md (join-order advisor payoff row).
  * Usage: runMain graft.JoinOrderDelta [sfDir]
  */
object JoinOrderDelta {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("ERROR")
    // the 100 TB regime: nothing broadcasts, no runtime re-plan
    val spark = graft.operators.Sessions.isolated(base,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val acc = new Bench.TaskMetricsAcc
    spark.sparkContext.addSparkListener(acc)
    import graft.sources.Tables.t

    def ev = t(spark, sfDir, "events").select(col("user_id"), col("event_type"))
    def ord = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    def cust = t(spark, sfDir, "customer").select(col("c_custkey"), col("c_name"))
    def li = t(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_quantity"))

    def measure(label: String, df: => DataFrame): Long = {
      df.count() // warm IO/page cache so bytes, not cold reads, differ
      acc.mark()
      val t0 = System.nanoTime()
      val n = df.count()
      // capture wall BEFORE acc.delta(): its quiesce() sleep-polls up to
      // ~2 s and would inflate the recorded wall (r10 ADVICE)
      val wallS = (System.nanoTime() - t0) / 1e9
      val (r, w, _, peak) = acc.delta()
      println(f"[joinorder] $label%-28s rows=$n%10d shuffle_read_kb=${r / 1024}%8d " +
        f"shuffle_write_kb=${w / 1024}%8d peak_mb=${peak / 1024 / 1024}%5d " +
        f"wall_s=$wallS%6.2f")
      w
    }

    println(s"[joinorder] sfDir=$sfDir broadcast=off aqe=off")
    // --- chain 1: shared-key (the c100 triple) ---------------------------
    // advisor said: events⋈customer is the smallest first pair (join_first)
    measure("shared-key chosen (e*c)*o",
      ev.join(cust, col("user_id") === col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey")))
    measure("shared-key worst  (e*o)*c",
      ev.join(ord, col("user_id") === col("o_custkey"))
        .join(cust, col("o_custkey") === col("c_custkey")))
    // rows through the second merge = size of each first-pair intermediate
    val ec = ev.join(cust, col("user_id") === col("c_custkey")).count()
    val eo = ev.join(ord, col("user_id") === col("o_custkey")).count()
    println(s"[joinorder] shared-key intermediates: events*customer=$ec events*orders=$eo")

    // --- chain 2: two-key (order moves real bytes) -----------------------
    val wChosen = measure("two-key chosen (o*c)*l",
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey")))
    val wWorst = measure("two-key worst  (l*o)*c",
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey")))
    println(f"[joinorder] two-key write delta: worst/chosen = ${wWorst.toDouble / wChosen}%.2fx")

    // the advisor ranks chain 2 correctly from sketches alone: one grid per
    // (table, join key), compare est(o⋈c on custkey) vs est(l⋈o on orderkey)
    val est = graft.functions.CountMin.joinOrderAdvisor(Seq(
        "orders_ck" -> ord.select(col("o_custkey").cast("string").as("tok")),
        "customer_ck" -> cust.select(col("c_custkey").cast("string").as("tok"))),
        "tok", d = 4, width = 64).unionAll(
      graft.functions.CountMin.joinOrderAdvisor(Seq(
        "lineitem_ok" -> li.select(col("l_orderkey").cast("string").as("tok")),
        "orders_ok" -> ord.select(col("o_orderkey").cast("string").as("tok"))),
        "tok", d = 4, width = 64))
    est.select(col("left_table"), col("right_table"), col("est_join")).collect()
      .foreach(r => println(s"[joinorder] est ${r.getString(0)}*${r.getString(1)} = ${r.getLong(2)}"))
    base.stop()
  }
}

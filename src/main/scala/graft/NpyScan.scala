package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{Formats, Npy, Tables}

/** Dev diagnostic (prints collected numbers by design — not a query
  * path): measures the npy pair layout's scan economics the way
  * `SkipRate` measures at-rest file-skip — the layout's two claims are
  * **tasks ∝ pairs** (one read task per part pair, no driver funnel)
  * and **bytes ∝ selected columns** (one array per file, so an
  * ids-only consumer opens none of the `.vec.npy` payloads and reads
  * 8/(8+4·d) of the layout). Run at two sfs; measured rows ledgered in
  * docs/PLANS.md next to the b64/b93 skip-rate rows.
  *
  * Usage: `runMain graft.NpyScan [sfDir]`
  */
object NpyScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def measure(label: String, purpose: String, writerParts: Option[Int]): Unit = {
      val dir = Formats.scratchDir(spark, purpose, sfDir)
      Formats.ensureWritten(spark, dir) {
        val in = Tables.t(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        Npy.writeVectors(writerParts.fold(in)(in.repartition(_)),
          "vec_id", "embedding", dir)
      }
      val files = new java.io.File(dir).listFiles()
      val idFiles = files.filter(_.getName.endsWith(".ids.npy"))
      val vecFiles = files.filter(_.getName.endsWith(".vec.npy"))
      val idBytes = idFiles.map(_.length).sum
      val vecBytes = vecFiles.map(_.length).sum

      def timed[T](body: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = body
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // warm each path once (JIT + listing), then time one pass
      val full = Npy.readVectors(spark, dir)
      val ids = Npy.readIds(spark, dir)
      val slice = Npy.readVectorsSlice(spark, dir, 0, 8)
      full.count(); ids.count(); slice.count()
      val (fullRows, fullSec) = timed(full.count())
      val (idRows, idSec) = timed(ids.count())
      val (slRows, slSec) = timed(slice.count())
      // slice economics (r17): HEAP materialized per task = n_task·8·4
      // slice bytes (+ the bounded 4 MiB window + the ids file); PHYSICAL
      // file bytes touched stay = vec_bytes while the 4·d row stride is
      // below a 4 KiB page — report both so the ledger carries the honest
      // negative result alongside the heap/width win. d is read from the
      // layout itself (never hardcoded: a regenerated fixture at d≠64
      // must not print silently-wrong percentages), and the per-task heap
      // divides by the ACTUAL task count (one task per pair), so the
      // writer-8 row reports a single task's buffer, not the sum.
      val d = full.select(size(col("vec"))).first().getInt(0)
      val sliceTasks = slice.rdd.getNumPartitions
      val sliceHeapPerTask = fullRows * 8L * 4 / math.max(sliceTasks, 1)
      val pageSkip = if (4L * d >= 4096) "stride>=page: prunable" else s"100% at d=$d"

      println(f"[npyscan] $label $sfDir pairs=${idFiles.length} " +
        f"tasks_full=${full.rdd.getNumPartitions} tasks_ids=${ids.rdd.getNumPartitions} " +
        f"tasks_slice=$sliceTasks " +
        f"rows=$fullRows/$idRows/$slRows id_bytes=$idBytes vec_bytes=$vecBytes " +
        f"ids_read_pct=${100.0 * idBytes / (idBytes + vecBytes)}%.2f " +
        f"slice8_heap_bytes_per_task=$sliceHeapPerTask " +
        f"(slice total ${100.0 * (fullRows * 8L * 4) / (fullRows * 4L * d)}%.2f%% of payload; " +
        f"file pages touched: $pageSkip) " +
        f"warm_full_s=$fullSec%.3f warm_ids_s=$idSec%.3f warm_slice8_s=$slSec%.3f")
    }
    // as-written (testdata parquet is single-file → 1 writer partition →
    // 1 pair) and an 8-way writer: read tasks must track pair count
    measure("as-written", "npy_embeddings", None)
    measure("writer-8  ", "npy_embeddings_scan8", Some(8))
    spark.stop()
  }
}

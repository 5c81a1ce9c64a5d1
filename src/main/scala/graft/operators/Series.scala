package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series regularization: resample an irregular event stream onto a
  * fixed grid and fill the gaps by LINEAR INTERPOLATION — the step beyond
  * carry-forward (b57 LOCF) that sensor/metrics pipelines need before
  * feature extraction.
  *
  * Exactness contract: values are non-negative integer cents and the
  * interpolated point is the cleared-denominator weighted mean
  *
  *   v(h) = (pv·(nh−h) + nv·(h−ph)) div (nh−ph)
  *
  * — both products non-negative BIGINTs, one integral division, so the
  * result is bit-identical at any parallelism and in any engine (DuckDB
  * `//` and Spark `div` agree on non-negative operands; non-negativity is
  * structural: cents ≥ 0 and grid points lie strictly between their
  * bracketing observations). No float arithmetic anywhere.
  *
  * Scale (100 TB of events): one groupBy (user, bucket) compacts the raw
  * stream map-side; the grid explodes from each key's OWN [min, max] span
  * (the b53 spine rule — never a keys × calendar cartesian); the four
  * bracketing lookups are two window passes (forward + backward) over the
  * same (user) partitioning and sort — Spark plans them as one sort, two
  * window operators, no self-join, no range join. Work and state are
  * O(grid points per user), and the grid is bounded by the key's observed
  * lifetime, not the global calendar.
  */
object Series {

  /** Per-`keyCol` hourly grid over the key's observed span; each hour
    * carries the last observation in that hour (if any) and otherwise the
    * linear interpolation between the bracketing observed hours.
    * Output: (keyCol, hour_id, val_cents, src = 'obs' | 'interp').
    */
  def interpolateHourlyCents(events: DataFrame, keyCol: String, tsCol: String,
                             tieCol: String, valueCol: String): DataFrame = {
    val hourMicros = 3600000000L
    val cents: Column = floor(col(valueCol) * 100 + 0.5).cast("long")
    // last observation wins within an hour, by (ts, tie) — the b58 max_by
    // compaction shape, partial-aggregated map-side
    val obs = events
      .select(col(keyCol).as("k"),
        call_function("div", unix_micros(col(tsCol)), lit(hourMicros)).as("h"),
        col(tsCol).as("ts"), col(tieCol).as("tie"), cents.as("cents"))
      .groupBy(col("k"), col("h"))
      .agg(max_by(col("cents"), struct(col("ts"), col("tie"))).as("cents"))
    val spine = obs.groupBy(col("k"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("k"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val g = spine.join(obs, Seq("k", "h"), "left")
    val back = Window.partitionBy(col("k")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("k")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val hImg = when(col("cents").isNotNull, col("h"))
    val filled = g
      .withColumn("pv", last(col("cents"), ignoreNulls = true).over(back))
      .withColumn("ph", last(hImg, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("cents"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(hImg, ignoreNulls = true).over(fwd))
    filled.select(col("k").as(keyCol), col("h").as("hour_id"),
      when(col("cents").isNotNull, col("cents"))
        .otherwise(expr("(pv * (nh - h) + nv * (h - ph)) div (nh - ph)"))
        .as("val_cents"),
      when(col("cents").isNotNull, lit("obs")).otherwise(lit("interp")).as("src"))
  }
}

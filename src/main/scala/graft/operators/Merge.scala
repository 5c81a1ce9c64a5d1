package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style changeset application — the lakehouse upsert shape
  * (Delta/Iceberg `MERGE INTO`) expressed relationally: a base snapshot
  * keyed by `key` and a changeset carrying the same payload columns plus
  * an op column (`'U'` upsert / `'D'` delete tombstone) combine into the
  * next snapshot:
  *
  *   - matched + `'U'`  → the change's payload (update)
  *   - unmatched + `'U'` → the change's payload (insert)
  *   - `'D'`            → the key disappears (delete; a tombstone for an
  *                        absent key is a no-op)
  *   - no change        → the base row carries forward
  *
  * Payload values pass through untouched (no arithmetic on doubles —
  * hash-oracle-safe).
  *
  * Scale: one full-outer equi-join on `key`. Both inputs are typically
  * the output of a per-key compaction aggregate (the b58 `max_by` shape),
  * so they arrive hash-partitioned on `key` and the join adds no extra
  * exchange; no window, no sort, no driver state. At 100 TB this is the
  * nightly snapshot⊕changelog merge: work ∝ |base| + |changes|, one
  * shuffle each side at most.
  */
object Merge {

  def mergeApply(base: DataFrame, changes: DataFrame, key: String,
                 opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    require(payload.nonEmpty, "base must carry payload columns besides the key")
    require(changes.columns.toSet == payload.toSet + key + opCol,
      s"changes must carry ($key, $opCol, ${payload.mkString(", ")}); " +
        s"got ${changes.columns.mkString(", ")}")
    // explicit presence marker: a NULL payload value must not read as "row
    // absent" after the full outer join
    val b = base.select(col(key) +: lit(true).as("__b_present") +:
      payload.map(p => col(p).as(s"__b_$p")): _*)
    val c = changes.select(
      col(key) +: col(opCol).as("__op") +: payload.map(p => col(p).as(s"__c_$p")): _*)
    b.join(c, Seq(key), "full_outer")
      // matched or unmatched, a delete tombstone removes the key
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +:
        payload.map(p =>
          when(col("__op") === "U", col(s"__c_$p"))
            .otherwise(col(s"__b_$p")).as(p)) :+
        when(col("__op").isNull, lit("carry"))
          .when(col("__b_present").isNull, lit("insert"))
          .otherwise(lit("update")).as("src"): _*)
  }
}

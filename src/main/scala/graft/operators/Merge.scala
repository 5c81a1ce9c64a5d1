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

  /** Snapshot diff — the data-versioning complement of [[mergeApply]]:
    * classify every key across two table versions as added / removed /
    * changed / unchanged. Payload comparison is null-safe equality per
    * column (`<=>`; `IS NOT DISTINCT FROM` in the oracle), no arithmetic
    * — identical stored values compare identically on any engine. One
    * full-outer equi-join on `key`, work ∝ |old| + |new|: the "what did
    * last night's pipeline change" audit at 100 TB, and run against
    * [[mergeApply]]'s output it recovers the changelog's op
    * classification (update→changed, insert→added, delete→removed).
    *
    * PRECONDITION: `key` must be unique within each version (snapshots
    * are keyed by definition). Duplicate keys would fan out through the
    * full-outer join into multiple, pairing-arbitrary rows per key —
    * compact first (the b58 `max_by` shape, as b87 does) if a version
    * may carry duplicates. Not guarded here: a distributed uniqueness
    * check costs a full extra aggregate on both inputs per call. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: String): DataFrame = {
    val payload = old.columns.filterNot(_ == key).toSeq
    require(payload.nonEmpty, "old must carry payload columns besides the key")
    require(neu.columns.toSet == old.columns.toSet,
      s"version schemas must match; got ${neu.columns.mkString(", ")}")
    val o = old.select(col(key) +: lit(true).as("__o") +:
      payload.map(p => col(p).as(s"__o_$p")): _*)
    val n = neu.select(col(key) +: lit(true).as("__n") +:
      payload.map(p => col(p).as(s"__n_$p")): _*)
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("__o").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(payload.map(p => col(s"__o_$p") <=> col(s"__n_$p"))
            .reduce(_ && _), lit("unchanged"))
          .otherwise(lit("changed")).as("change_type"))
  }

  /** PRECONDITION (same as [[snapshotDiff]]'s, for the same full-outer
    * fan-out reason): `key` must be unique within `base` AND within
    * `changes` — compact the changelog first (the b58 `max_by` shape,
    * as b66 does) if a key may carry several ops. Op codes outside
    * {'U','D'} fail the job loudly IN-PLAN (`raise_error`, codegen'd,
    * zero cost on valid rows): silently carrying an unknown op would
    * otherwise inject a null-payload "insert" for every unmatched
    * malformed row — a corruption that surfaces days later. */
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
    val opChecked = when(col(opCol).isin("U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"mergeApply: unknown $opCol code '"),
        coalesce(col(opCol).cast("string"), lit("NULL")),
        lit("' (expected 'U' or 'D') at key "),
        coalesce(col(key).cast("string"), lit("NULL")))))
    val c = changes.select(
      col(key) +: opChecked.as("__op") +: payload.map(p => col(p).as(s"__c_$p")): _*)
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

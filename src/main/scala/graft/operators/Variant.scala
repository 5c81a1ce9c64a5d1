package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Union (sum type) and Pointer encodings — SURVEY.md §1.2 / §4.2.
  *
  * oamap's `Union(possibilities)` owns `tags`/`offsets` arrays and
  * `Pointer(target)` owns a `positions` array (`oamap/schema.py`, public
  * repo — mount empty this round, SURVEY.md provenance notice). Spark has no
  * sum types and no row addressing, so:
  *
  *  - Union  → tagged struct `{tag: int, p0: T0 nullable, p1: T1 nullable}`;
  *    exactly one possibility is non-null per value. Dense per-branch
  *    `offsets` are a physical trick we do not replicate (§4.3).
  *  - Pointer → an ordinary integer key column + an explicit `gather`
  *    (equi-join) against the target table. At 100 TB a gather is a shuffle
  *    join on the key — or a broadcast join when the target is a dim table,
  *    which callers opt into with `broadcastTarget = true`.
  */
object Variant {

  /** Build a 2-way tagged union value. */
  def union2(tag: Column, p0: Column, p1: Column): Column =
    struct(
      tag.cast("int").as("tag"),
      when(tag === 0, p0).as("p0"),
      when(tag === 1, p1).as("p1"))

  /** `Schema.case` — runtime type test on a union value. */
  def isCase(u: Column, i: Int): Column = u.getField("tag") === i

  /** `Schema.cast` — downcast: the possibility's value when the tag
    * matches, else null (oamap raises; null is the relational analogue). */
  def castCase(u: Column, i: Int): Column = u.getField(s"p$i")

  /** Pointer dereference (`oamap/proxy.py` PointerGenerator behavior):
    * follow `positions[i]` into the target's value space. Expressed as an
    * equi-join; broadcast when the target is small.
    */
  def gather(df: DataFrame, pointerCol: String, target: DataFrame, targetKey: String,
             broadcastTarget: Boolean = false): DataFrame = {
    val t = if (broadcastTarget) broadcast(target) else target
    df.join(t, col(pointerCol) === t(targetKey), "left")
  }
}

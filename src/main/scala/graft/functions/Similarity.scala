package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity primitives (SURVEY.md §2C).
  *
  * All pure Column expressions over `array<float>` / `array<double>`:
  * `zip_with` + `aggregate` fold sequentially in element order, in double,
  * which is bit-reproducible across engines (the DuckDB oracle casts to
  * DOUBLE[] for the same reason). No UDFs → whole-stage codegen applies.
  * A codegen'd custom Expression is the planned upgrade if the HOF path
  * misses bench (SURVEY.md §4.2) — measure first.
  */
object Similarity {

  /** Sequential-order dot product in double precision (HOF form — kept as
    * the reference implementation; [[cosine]] uses the codegen expression
    * with identical numerics). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double — codegen'd single-pass loop
    * ([[graft.plans.VectorExpressions.CosineSim]]), bit-identical to
    * `dot(a,b)/(norm(a)*norm(b))` in HOF form. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  /** HOF cosine, kept for equivalence testing against the expression. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded for stable cross-engine threshold/rank comparisons. */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** L2-normalize once up front so pairwise cosine reduces to a dot
    * product — at 100 TB you normalize at ingest, not per-pair. */
  def l2normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }
}

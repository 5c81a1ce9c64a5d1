package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** graft's port of the oamap structural + functional operator surface.
  *
  * Reference behavior: `oamap/operations.py` in the public diana-hep/oamap
  * repo (mount at /root/reference was empty this round — see SURVEY.md
  * "PROVENANCE NOTICE"; symbols recalled, to be re-cited `file:line` once the
  * mount is populated). Each operator there manipulates a (Schema, arrays)
  * pair by metadata/pointer tricks; here each is a `select`-level rewrite on
  * a DataFrame whose nested data lives in `ArrayType(StructType)` columns,
  * so Catalyst/Tungsten provide the columnar, object-free execution that
  * oamap got from its Numba compiler (`oamap/compiler.py`).
  *
  * Scale notes (100 TB discipline): every operator here is a narrow,
  * per-row transformation — no shuffle, no driver-side state, no collect.
  * They compose with scans such that nested-schema pruning and predicate
  * pushdown still apply (all are Column-expression rewrites, never UDFs).
  */
object Nested {

  // ---------------------------------------------------------------- A1
  /** `oamap/operations.py::fieldname` — rename a record field.
    * Top-level: plain rename. Inside an array-of-struct column: rewrite each
    * element with `withField` + `dropFields` (no data movement; pure
    * projection).
    */
  def fieldname(df: DataFrame, at: String, old: String, newName: String): DataFrame =
    if (at.isEmpty) df.withColumnRenamed(old, newName)
    else df.withColumn(at,
      transform(col(at), x => x.withField(newName, x.getField(old)).dropFields(old)))

  // ---------------------------------------------------------------- A2
  /** `oamap/operations.py::recordname` — rename a record *type*. Spark
    * structs are anonymous; the logical name is carried as column metadata
    * so it survives round-trips but has no runtime effect.
    */
  def recordname(df: DataFrame, at: String, newName: String): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.recordname", newName).build()
    df.withColumn(at, col(at).as(at, meta))
  }

  // ---------------------------------------------------------------- A3
  /** `oamap/operations.py::project` — drill into one field, preserving the
    * list structure above it: `List(Rec{x,y})` → `List(x)`. Spark projects
    * a field through an array of structs natively (`arr.field`).
    */
  def project(arr: Column, field: String): Column = arr.getField(field)

  // ---------------------------------------------------------------- A4/A5
  /** `oamap/operations.py::keep` / `drop` — prune fields. Top-level columns
    * use select/drop; fields inside an array-of-struct element are pruned
    * with `dropFields` under `transform`.
    */
  def keep(df: DataFrame, cols: String*): DataFrame = df.select(cols.map(col): _*)

  def drop(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  def dropInElements(arr: Column, fields: String*): Column =
    transform(arr, x => x.dropFields(fields: _*))

  // ---------------------------------------------------------------- A6
  /** `oamap/operations.py::split` — AoS→SoA: `List(Rec{a,b})` becomes
    * parallel lists `a: List, b: List`. Pure projection; zero copies beyond
    * the projected arrays themselves.
    */
  def split(df: DataFrame, arrCol: String, fields: String*): DataFrame =
    fields.foldLeft(df)((d, f) => d.withColumn(f, col(arrCol).getField(f)))
      .drop(arrCol)

  // ---------------------------------------------------------------- A7
  /** `oamap/operations.py::merge` — inverse of split: zip parallel lists
    * back into a `List(Rec)`. `arrays_zip` aligns by position.
    */
  def merge(df: DataFrame, out: String, fields: String*): DataFrame =
    df.withColumn(out, arrays_zip(fields.map(col): _*)).drop(fields: _*)

  // ---------------------------------------------------------------- A8
  /** `oamap/operations.py::parent` — give each list element a reference to
    * its containing record. oamap adds a `Pointer`; here the parent keys are
    * value-copied into each element (SURVEY.md §7.3: value-equal, not
    * pointer-equal). Lambda capture of the outer row column does it without
    * any join.
    */
  def parent(df: DataFrame, arrCol: String, parentField: String, parentCol: Column): DataFrame =
    df.withColumn(arrCol, transform(col(arrCol), x => x.withField(parentField, parentCol)))

  // ---------------------------------------------------------------- A9
  /** `oamap/operations.py::index` — each element's position within its list
    * as a new field. */
  def index(df: DataFrame, arrCol: String, idxField: String): DataFrame =
    df.withColumn(arrCol, transform(col(arrCol), (x, i) => x.withField(idxField, i)))

  // ---------------------------------------------------------------- A10
  /** `oamap/operations.py::tomask` — turn a sentinel value / range into
    * nulls (oamap materializes a mask array; Spark nullability is the mask).
    */
  def tomask(c: Column, low: Column, high: Column): Column =
    when(c.between(low, high), lit(null)).otherwise(c)

  /** Single-sentinel form: exactly `value` becomes null. */
  def tomask(c: Column, value: Column): Column =
    when(c === value, lit(null)).otherwise(c)

  def tomaskElements(arr: Column, low: Column, high: Column): Column =
    transform(arr, x => when(x.between(low, high), lit(null)).otherwise(x))

  // ---------------------------------------------------------------- A11
  /** `oamap/operations.py::flatten` — `List(List(X))` → `List(X)`.
    * Array form is `flatten`; the relational unnest is `explode`. */
  def flattenList(arr: Column): Column = flatten(arr)

  // ---------------------------------------------------------------- A12
  /** `oamap/operations.py::filter` — keep elements where fn holds. oamap
    * returns `List(Pointer(content))` (selection with no copy); Spark's
    * equivalents: `Dataset.filter` at table level (pushdown + late
    * materialization subsume the pointer trick, SURVEY.md §4.3) and the
    * `filter` higher-order function inside lists.
    */
  def filterElements(arr: Column, f: Column => Column): Column = filter(arr, f)

  // ---------------------------------------------------------------- A13
  /** `oamap/operations.py::define` — computed column appended as a new
    * field (oamap materializes exactly one new array; same here: one new
    * projected expression). */
  def define(df: DataFrame, name: String, e: Column): DataFrame = df.withColumn(name, e)

  def defineElements(arr: Column, name: String, f: Column => Column): Column =
    transform(arr, x => x.withField(name, f(x)))

  // ---------------------------------------------------------------- A14
  /** `oamap/operations.py::map` — apply fn to each element, emit flat
    * arrays. Table level: `select` of expressions; list level: `transform`.
    */
  def mapElements(arr: Column, f: Column => Column): Column = transform(arr, f)

  // ---------------------------------------------------------------- A15
  /** `oamap/operations.py::reduce` — fold elements into a scalar tally.
    * List level: the `aggregate` higher-order function (sequential fold in
    * element order, codegen'd); table level: `groupBy().agg` whose
    * partial/final split is Spark's map-side combine.
    */
  def reduceElements(arr: Column, zero: Column, mergeFn: (Column, Column) => Column): Column =
    aggregate(arr, zero, mergeFn)

  // ---------------------------------------------------------------- A17
  /** `oamap/proxy.py::ListProxy.__getitem__` — slice / element access with
    * python-sequence semantics, copy-free (starts/stops arithmetic there,
    * offset arithmetic here). */
  def sliceList(arr: Column, start: Int, length: Int): Column = slice(arr, start, length)

  def at(arr: Column, i: Int): Column = element_at(arr, i)

  // ------------------------------------------------------- Primitive(dims)
  /** oamap `Primitive(dtype, dims)` — fixed-size tensor leaves (SURVEY.md
    * §1.2). Spark arrays are variable-length, so the fixed shape is a
    * declared-schema *constraint*: this passes the value through when every
    * level matches `dims` and raises (fails the job, like a schema
    * violation at ingest) on any ragged row. Pure column expression — no
    * shuffle, stays in codegen; apply at ingest so everything downstream
    * can assume the shape.
    */
  def fixedDims(c: Column, dims: Seq[Int]): Column = dims match {
    case Seq() => c
    case d +: rest =>
      val checked = when(size(c) === d, c).otherwise(raise_error(concat(
        lit(s"fixedDims: expected dim $d, got "), size(c).cast("string"))))
      if (rest.isEmpty) checked
      else transform(checked, x => fixedDims(x, rest))
  }
}

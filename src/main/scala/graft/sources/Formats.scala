package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/text source+sink roundtrips beyond parquet (SURVEY.md §1.6:
  * oamap's pluggable backends — here each format is a Spark datasource, so
  * partitioned parallel read/write, predicate pushdown (ORC) and schema
  * enforcement come from the datasource API, not bespoke backend code).
  *
  * Roundtrips write with `mode=overwrite` into a caller-scoped directory and
  * read back through the same session — the correctness contract is
  * value-exactness, proven by the oracle queries aggregating the *reread*
  * data against DuckDB over the original parquet.
  *
  * Scale notes: both writers emit one file per partition (parallel, no
  * driver funnel); ORC is splittable + column-pruned on read. CSV is the
  * interchange path, not the analytics path — schema must be re-declared on
  * read (header names only, no types), which is exactly why the read goes
  * through an explicit `StructType`, never `inferSchema` (an extra full pass
  * and double-ambiguity at 100 TB).
  */
object Formats {

  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)

  /** CSV with header; `schema` declared on read (no inference pass). */
  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(dir)

  /** A scratch dir unique to (purpose, input dir) — concurrent sf runs don't
    * collide, repeat runs overwrite. */
  def scratchDir(purpose: String, inDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${purpose}_${Integer.toHexString(inDir.hashCode)}"
}

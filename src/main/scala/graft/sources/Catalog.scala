package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog layer — the Spark-native analogue of oamap's database/namespace
  * mapping (`oamap/database.py::InMemoryDatabase`, public repo; datasets
  * addressed as `db.data.<name>`). Here datasets are temp views in the
  * session catalog, addressed from SQL — which also supplies the SQL entry
  * point the reference lacks.
  *
  * Scale: a view is pure metadata; queries against it plan exactly like the
  * underlying parquet scan (pushdown/pruning unchanged).
  */
object Catalog {

  /** Register every testdata table under its plain name (idempotent). */
  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.all.foreach { name =>
      Tables.t(spark, sfDir, name).createOrReplaceTempView(name)
    }

  /** SQL over the registered views. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }
}

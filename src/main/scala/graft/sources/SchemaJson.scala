package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema serialization — the analogue of oamap's `Schema.tojson/fromjson`
  * (`oamap/schema.py`, public repo; see SURVEY.md provenance notice): a
  * dataset's full nested type (structs, arrays, nullability, metadata)
  * round-trips through a JSON string, so schemas can be declared in config,
  * versioned, and applied to schemaless sources.
  *
  * Spark's `DataType.json`/`fromJson` carries the entire §1.2 type mapping:
  * Primitive → atomic types, List → ArrayType, Record/Tuple → StructType,
  * nullable → containsNull/nullable flags, `recordname` → column metadata.
  */
object SchemaJson {

  def toJson(df: DataFrame): String = df.schema.json

  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Read JSON-lines data with a declared (serialized) schema instead of
    * inference — the declared-schema ingest path of SURVEY.md §1.4. */
  def readJsonWithSchema(spark: SparkSession, schemaJson: String, path: String): DataFrame =
    spark.read.schema(fromJson(schemaJson)).json(path)
}

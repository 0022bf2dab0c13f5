package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced JSON-lines ingest with corrupt-record capture — the
  * [[CsvIngest]] contract (reference:
  * fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:61-100)
  * applied to the other bronze feed format every lake takes. PERMISSIVE
  * mode sinks both unparseable lines AND type-mismatched documents into
  * the corrupt column, so the quarantine split downstream
  * ([[CsvIngest.wellFormed]]/[[CsvIngest.malformed]], shared — the
  * corrupt-column name is the contract) works unchanged.
  *
  * Scale: JSON-lines scans split by file like CSV; schema enforcement
  * (no inference pass) keeps ingest single-read — `spark.read.json`
  * without a schema costs an extra full scan to infer one, which at
  * 100 TB is the difference between one pass and two.
  */
object JsonIngest {
  val CorruptCol: String = CsvIngest.CorruptCol

  /** `schema` must NOT include the corrupt column; it is appended. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val full = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced CSV ingest with corrupt-record capture.
  *
  * Re-expresses the reference's bronze ingest
  * (fabric/claims/bronze/NBclaims_bronze.Notebook/notebook-content.py:61-100):
  * a declared StructType whose last field is the corrupt-record sink,
  * PERMISSIVE mode, then ingest-audit columns (timestamp, source file,
  * batch id).
  *
  * Scale: the CSV scan parallelizes by file split; audit columns are
  * narrow expressions. Malformed rows are split downstream by
  * `CorruptRecord IS NOT NULL`, exactly as the reference does.
  */
object CsvIngest {
  val CorruptCol = "CorruptRecord"

  /** `schema` must NOT include the corrupt column; it is appended. */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, sep: String = ","): DataFrame = {
    val full = StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(full)
      .option("header", header.toString)
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)
  }

  /** Ingest audit columns (NBclaims_bronze.py:96-100). Nondeterministic
    * by design — excluded from oracle-checked outputs. */
  def withIngestAudit(df: DataFrame): DataFrame =
    df.withColumn("IngestedAt", current_timestamp())
      .withColumn("SourceFile", input_file_name())
      .withColumn("ProcessBatchID", expr("uuid()"))

  def malformed(df: DataFrame, retentionDays: Int = 90): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
      .withColumn("RetentionDate", date_add(current_date(), retentionDays))

  def wellFormed(df: DataFrame): DataFrame = df.filter(col(CorruptCol).isNull)
}

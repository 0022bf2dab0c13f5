package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the testdata parquet layout (TESTDATA.md): one parquet
  * file per table under a scale-factor directory. At cluster scale the
  * same API points at a lake root; readers stay declarative so Catalyst
  * pushes filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table is written with parquet TIMESTAMP(NANOS), which
    * Spark's reader rejects; read nanos as long (legacy conf) and
    * convert to a microsecond timestamp (integer division — exact). */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // read-path conf also consulted at execution time — set, don't reset
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}

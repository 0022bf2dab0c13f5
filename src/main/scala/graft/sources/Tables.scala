package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}

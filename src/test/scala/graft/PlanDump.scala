package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector for shipped queries (local iteration only):
  * `sbt "Test/runMain graft.PlanDump <sfDir> <name> [name...]"` prints
  * each query's formatted physical plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-drift audit — the feed-onboarding check in front of
  * [[CsvIngest]]/[[JsonIngest]]'s enforced schemas (reference analog:
  * NBclaims_bronze's hand-declared ingest schema silently breaks the
  * day upstream adds, drops, or retypes a column; this is the diff a
  * bronze gate runs BEFORE trusting the new batch against the declared
  * contract). Compares two schemas field by field (case-insensitive
  * names, Spark's resolver default) and reports one row per drifted
  * column: `added` (new in `after`), `removed` (gone from `after`),
  * `type_changed` (same name, different data type), or
  * `nullability_changed` (type intact, nullable flag flipped — the
  * quiet one that breaks MERGE keys and NOT-NULL DQ rules).
  * Unchanged columns are absent; an empty result IS the green light.
  *
  * Control-plane only: schemas are metadata (tens of fields), so this
  * is a driver-side diff materialized as a one-partition frame —
  * nothing here touches data at any corpus size. Rows order by column
  * name for deterministic output. */
object SchemaDrift {

  case class Drift(col_name: String, status: String,
                   before_type: Option[String], after_type: Option[String])

  def audit(spark: SparkSession, before: StructType,
            after: StructType): DataFrame = {
    import spark.implicits._
    val b = before.fields.map(f => f.name.toLowerCase -> f).toMap
    val a = after.fields.map(f => f.name.toLowerCase -> f).toMap
    val drifts =
      a.filterNot { case (k, _) => b.contains(k) }.values.map(f =>
        Drift(f.name, "added", None, Some(f.dataType.sql))).toSeq ++
      b.filterNot { case (k, _) => a.contains(k) }.values.map(f =>
        Drift(f.name, "removed", Some(f.dataType.sql), None)).toSeq ++
      b.keySet.intersect(a.keySet).toSeq.flatMap { k =>
        val (fb, fa) = (b(k), a(k))
        if (fb.dataType != fa.dataType)
          Some(Drift(fa.name, "type_changed",
            Some(fb.dataType.sql), Some(fa.dataType.sql)))
        else if (fb.nullable != fa.nullable)
          Some(Drift(fa.name, "nullability_changed",
            Some(s"${fb.dataType.sql} ${if (fb.nullable) "NULL" else "NOT NULL"}"),
            Some(s"${fa.dataType.sql} ${if (fa.nullable) "NULL" else "NOT NULL"}")))
        else None
      }
    drifts.sortBy(d => (d.col_name, d.status)).toDF()
  }

  /** Convenience: diff a declared contract against what a parquet/CSV
    * batch actually carries. */
  def audit(spark: SparkSession, declared: StructType,
            batch: DataFrame): DataFrame =
    audit(spark, declared, batch.schema)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned bucketed metastore tables behind ONE atomic view pointer
  * — the shared persistence protocol of graft's probe-every-batch
  * indexes ([[graft.dedup.TextDedup]]'s bucketed dedup index,
  * [[graft.ann.AnnIndex]]'s IVF-PQ index). One protocol, two
  * consumers: the parquet-file analogue for whole snapshots is
  * [[SnapshotStore]].
  *
  * Layout per store `name` with member suffixes t1..tn:
  *  - data: `<name>_<t>_v<N>` managed tables; members with bucket
  *    columns are repartitioned to one file per bucket and written
  *    `bucketBy(buckets, cols).sortBy(cols)`, so a consumer join on
  *    those columns plans NO exchange on this side (views are logical
  *    aliases — the bucketed scan's output partitioning survives
  *    them); members without bucket columns are small broadcast-side
  *    tables.
  *  - pointer: `<name>_ptr`, a literal `SELECT N AS version` view
  *    swapped by a single CREATE OR REPLACE — the ONLY consistency
  *    mechanism. Readers resolve it once and read `_<t>_v<N>`
  *    directly, so a reader planned mid-commit sees a complete
  *    version, never a torn mix of member tables.
  *  - convenience: `<name>_<t>` per-member views for ad-hoc SQL,
  *    repointed AFTER the ptr, sequentially — NOT safe for queries
  *    joining across members.
  *
  * Single-writer, like every log-less table format; exactly one prior
  * version is retained for in-flight readers, older versions drop at
  * commit.
  */
object BucketedStore {

  /** One member table of a store version. Empty `bucketCols` = plain
    * (tiny, broadcast-side) table. */
  final case class Member(suffix: String, df: DataFrame,
                          bucketCols: Seq[String] = Nil)

  /** The committed current version, resolved through the single
    * atomic `<name>_ptr` view (a one-row control-plane read). */
  def currentVersion(spark: SparkSession, name: String): Option[Int] =
    if (spark.catalog.tableExists(s"${name}_ptr"))
      Some(spark.table(s"${name}_ptr").head().getInt(0))
    else None

  /** Member `suffix` at pinned `version` — how every consistent
    * reader must address member tables. */
  def table(spark: SparkSession, name: String, suffix: String,
            version: Int): DataFrame =
    spark.table(s"${name}_${suffix}_v$version")

  /** Write all `members` as the next version, swap the ptr, refresh
    * the convenience views, drop versions behind the retained window.
    * Returns the committed version. */
  def commit(spark: SparkSession, name: String, members: Seq[Member],
             buckets: Int): Int = {
    val v = currentVersion(spark, name).getOrElse(-1) + 1
    members.foreach { m =>
      val w = m.bucketCols match {
        case Nil => m.df.write.mode("overwrite")
        case cols =>
          // one file per bucket (repartition on the bucket key first)
          // so the scan keeps per-bucket sort order as well as the
          // partitioning
          m.df.repartition(buckets, cols.map(col): _*)
            .write.mode("overwrite")
            .bucketBy(buckets, cols.head, cols.tail: _*)
            .sortBy(cols.head, cols.tail: _*)
      }
      w.saveAsTable(s"${name}_${m.suffix}_v$v")
    }
    spark.sql(s"CREATE OR REPLACE VIEW ${name}_ptr AS SELECT $v AS version")
    members.foreach { m =>
      spark.sql(s"CREATE OR REPLACE VIEW ${name}_${m.suffix} AS " +
        s"SELECT * FROM ${name}_${m.suffix}_v$v")
    }
    // retain exactly one prior version for in-flight readers
    (0 to v - 2).foreach { old =>
      members.foreach(m =>
        spark.sql(s"DROP TABLE IF EXISTS ${name}_${m.suffix}_v$old"))
    }
    v
  }

  /** The local warehouse directory, derived from
    * `spark.sql.warehouse.dir` (file-scheme or plain path only —
    * remote warehouses have no local leftovers to clean). */
  private def localWarehouseDir(spark: SparkSession): Option[java.io.File] = {
    val raw = spark.conf.get("spark.sql.warehouse.dir")
    val uri = new java.net.URI(raw)
    uri.getScheme match {
      case null => Some(new java.io.File(raw))
      case "file" => Some(java.nio.file.Paths.get(uri).toFile)
      case _ => None
    }
  }

  /** Drop every catalog object and on-disk remnant of store `name`
    * with member `suffixes`: ptr + convenience views, all versioned
    * tables, and orphaned managed-table directories under the
    * session's warehouse (a crashed prior JVM leaves directories with
    * no catalog entry — the in-memory catalog forgets them — and the
    * next `saveAsTable` then fails with LOCATION_ALREADY_EXISTS). */
  def drop(spark: SparkSession, name: String, suffixes: Seq[String]): Unit = {
    spark.sql(s"DROP VIEW IF EXISTS ${name}_ptr")
    suffixes.foreach(t => spark.sql(s"DROP VIEW IF EXISTS ${name}_$t"))
    val pat = (java.util.regex.Pattern.quote(name) +
      "_(?:" + suffixes.mkString("|") + ")_v\\d+").r
    spark.catalog.listTables().collect().map(_.name)
      .filter(pat.matches(_))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    localWarehouseDir(spark).foreach { wh =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      Option(wh.listFiles())
        .foreach(_.filter(f => pat.matches(f.getName)).foreach(rm))
    }
  }
}

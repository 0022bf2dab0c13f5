package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-based incremental ingest protocol.
  *
  * Re-expresses the reference's watermark notebook + pipeline lookup
  * (fabric/claims/bronze/NBclaims_bronze_watermark.Notebook/
  * notebook-content.py and PLclaims_bronze's LookupWatermark step): a
  * JSON file `{"lastModified": "<ISO-8601 UTC>"}` read before ingest,
  * used to filter to new data, advanced after a successful run.
  *
  * The lakehouse `Files/watermarks/Watermark.json` becomes a plain
  * filesystem path here; on a cluster this is object-store state and
  * the filter below prunes partitions when the data is date-partitioned.
  */
object Watermark {
  private val Key = "\"lastModified\""

  def read(path: String): Instant = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Instant.EPOCH
    else {
      val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      // minimal JSON field extraction; format is fixed by the protocol
      val i = txt.indexOf(Key)
      val q1 = txt.indexOf('"', i + Key.length + 1)
      val q2 = txt.indexOf('"', q1 + 1)
      Instant.parse(txt.substring(q1 + 1, q2))
    }
  }

  def write(path: String, ts: Instant): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, s"""{ "lastModified": "$ts" }""".getBytes(StandardCharsets.UTF_8))
  }

  /** Rows strictly newer than the watermark. */
  def newerThan(df: DataFrame, tsCol: Column, wm: Instant): DataFrame =
    df.filter(tsCol > lit(java.sql.Timestamp.from(wm)))
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache policy knob for operators whose returned (lazy) frame reads
  * an intermediate several times — pair generators, k-means corpora.
  *
  * Those operators cannot unpersist what they cache (the consumer
  * hasn't run yet), so a long-lived multi-tenant session needs a way
  * to opt out instead of churning the block manager: pass
  * `StorageLevel.NONE` to skip caching entirely (plans recompute
  * shared branches), or any explicit level (e.g. `DISK_ONLY`) to
  * bound memory. The default matches `Dataset.cache()`. Streaming
  * frames are never persisted (unsupported by Spark).
  */
object Caching {
  /** Same level `Dataset.cache()` uses. */
  val Default: StorageLevel = StorageLevel.MEMORY_AND_DISK

  def persisted(df: DataFrame, level: StorageLevel): DataFrame =
    if (level == StorageLevel.NONE || df.isStreaming) df else df.persist(level)
}

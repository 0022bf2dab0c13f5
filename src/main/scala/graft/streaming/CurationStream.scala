package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup

/** Streaming curation: flag documents arriving on a stream that are
  * near-dup candidates of an EXISTING corpus — the streaming leg of
  * the incremental-batch `d8` shape ([[TextDedup.minHashLshPairsBetween]]).
  *
  * The corpus side is a static [[TextDedup.bandIndex]] frame (persist
  * it bucketed by (band, bsig) and the join co-locates without a
  * corpus shuffle). The stream side is map-only per micro-batch:
  * shingle → signature → explode bands; the stream-static inner join
  * is stateless, so no watermark is needed and state never grows —
  * at 100 TB of corpus the only per-batch cost is O(batch × bands)
  * probes of the index.
  *
  * Output: one row per (band, bsig) hit — a doc similar to several
  * corpus docs (or matching on several bands) appears several times.
  * Exact-verify and dedup belong to the batch that CONSUMES the flags
  * (candidate flagging is the streaming-time decision; fetching corpus
  * text for jaccard verification inside the stream would turn a probe
  * into a scan).
  */
object CurationStream {

  /** Contamination hits of `stream` docs against a static eval corpus:
    * (doc_id, s) per shared word n-gram — the streaming leg of
    * [[graft.dedup.Decontaminate]]. The eval shingle set broadcasts
    * (benchmarks are tiny); the stream side is a map-only explode +
    * broadcast join per micro-batch, stateless like the near-dup
    * probe. Aggregation to per-doc counts belongs to the consumer
    * (streaming groupBy would need a watermark the flags don't). */
  def contamFlagStream(stream: DataFrame, id: Column, text: Column,
                       evalCorpus: DataFrame, evalText: Column,
                       n: Int = 5): DataFrame = {
    val evalShingles = broadcast(
      evalCorpus.select(explode(TextDedup.shingles(evalText, n)).as("s")).distinct())
    stream.select(id.as("doc_id"), explode(TextDedup.shingles(text, n)).as("s"))
      .join(evalShingles, "s")
  }

  /** Candidate near-dup hits of `stream` docs against the corpus band
    * index: (doc_id, band, bsig, corpus_doc_id). */
  def nearDupFlagStream(stream: DataFrame, id: Column, text: Column,
                        corpusIndex: DataFrame): DataFrame =
    TextDedup.bandIndex(stream, id, text)
      .join(
        corpusIndex.select(col("doc_id").as("corpus_doc_id"),
          col("band"), col("bsig")),
        Seq("band", "bsig"))
      .select(col("doc_id"), col("band"), col("bsig"), col("corpus_doc_id"))
}

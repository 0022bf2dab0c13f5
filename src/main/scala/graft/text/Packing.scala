package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Sequence packing: assign documents to token-budget bins for training
  * shard construction (each bin ≈ one packed training sequence batch).
  *
  * Distributed and deterministic: documents are hashed into `buckets`
  * independent streams ([[Sampling.hashBucket]] — stable under
  * re-partitioning and appends-at-the-end never reshuffle earlier
  * buckets' relative order), and within a bucket docs are taken in id
  * order with a running token total; a doc's bin is
  * `floor(tokens_before_it / budget)` — contiguous greedy fill, so the
  * cumulative fill through any non-final bin is ≥ `(bin+1)·budget`
  * (bins average ≥ `budget` tokens; an individual interior bin can fall
  * short only when a jumbo doc in the previous bin overshot its
  * boundary).
  *
  * Scale: the only wide op is one window partitioned BY BUCKET — each
  * partition sorts only its own bucket's rows, never a global sort.
  * Size `buckets` ≈ shuffle parallelism at deploy (32 here); the
  * per-bucket sort is the same work a shard writer must do anyway to
  * emit deterministic shard files.
  */
object Packing {

  /** Adds (bucket, bin) to each (id, tokens) row. */
  def packIntoBins(docs: DataFrame, id: Column, tokens: Column,
                   budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(id.as("doc_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("bucket", Sampling.hashBucket(col("doc_id"), buckets))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget))
  }

  /** Deterministic shard manifest — the reproducible-handoff artifact
    * a training run records next to its shard files (and the thing a
    * re-run diffs to PROVE it will read byte-identical data): docs
    * shard by the [[Sampling.hashBucket]] key, order within a shard
    * by the per-epoch key ([[Sampling.epochOrderKey]], doc_id
    * tiebreak — the shard writer's own sort), and each shard reports
    * doc count, whitespace-token mass, and a CONTENT hash = md5 of
    * the in-order concatenation of per-doc text md5s. Any change —
    * a doc added, dropped, edited, or reordered — changes exactly
    * that shard's hash; retries / repartitioning / cluster layout
    * change nothing.
    *
    * Scale shape: one map-only pass (shard + order key + doc hash),
    * one keyed shuffle on shard; the in-shard collect+sort is bounded
    * by the shard's own size — sizing shards IS the caller's existing
    * job (t7's argument), and nShards grows with the corpus. */
  def shardManifest(docs: DataFrame, id: Column, text: Column,
                    nShards: Int, epoch: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs
      .select(id.as("doc_id"), text.as("text"))
      .withColumn("shard", Sampling.hashBucket(col("doc_id"), nShards))
      .withColumn("ok", Sampling.epochOrderKey(col("doc_id"), epoch))
      .withColumn("h", md5(col("text")))
      .withColumn("n_tok", size(TextAnalysis.tokens(col("text"))).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("ok"), col("doc_id"), col("h")))),
          x => x.getField("h")), "")).as("content_hash"))
  }

  /** Per-bin packing stats: how full each (bucket, bin) ended up. */
  def binStats(packed: DataFrame): DataFrame =
    packed.groupBy("bucket", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))

  /** Corpus-level packing-efficiency report — the number a training
    * pipeline checks BEFORE committing a budget (fill rate IS training
    * throughput: a 60%-full bin wastes 40% of every forward pass it
    * feeds): one row of n_bins, n_docs, total_tokens, mean docs/bin,
    * mean/min/max fill and the padding-waste fraction
    * `1 − total_tokens/(n_bins·budget)` clamped at 0. A bin's fill can
    * EXCEED 1.0 — [[packIntoBins]] assigns the boundary-straddling doc
    * to the bin of its prefix — so fill > 1 flags budget-crossing
    * jumbo docs, not an error; chunk those docs first (t9) if strict
    * caps are needed.
    *
    * Determinism: every reported ratio is ONE IEEE division of exact
    * integer sums, rounded 6 dp (per-bin fills are rounded BEFORE the
    * min/max so engines agree). Scale: [[packIntoBins]]'s per-bucket
    * windows, then a bins-sized partial-aggregating rollup and a
    * one-row reduce. */
  def packReport(docs: DataFrame, id: Column, tokens: Column,
                 budget: Long, buckets: Int = 32): DataFrame = {
    val bins = binStats(packIntoBins(docs, id, tokens, budget, buckets))
      // §6 quantizer on every report quotient (Quantize scaladoc):
      // engine-identical at the half boundary
      .withColumn("fill",
        graft.functions.Quantize.qdp(
          col("bin_tokens").cast("double") / lit(budget.toDouble), 6))
    bins.agg(
        count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("total_tokens"),
        min(col("fill")).as("min_fill"),
        max(col("fill")).as("max_fill"))
      .select(col("n_bins"), col("n_docs"), col("total_tokens"),
        graft.functions.Quantize.qdp(
          col("n_docs").cast("double") / col("n_bins").cast("double"), 6)
          .as("mean_docs_per_bin"),
        graft.functions.Quantize.qdp(col("total_tokens").cast("double") /
          (col("n_bins").cast("double") * lit(budget.toDouble)), 6)
          .as("mean_fill"),
        col("min_fill"), col("max_fill"),
        graft.functions.Quantize.qdp(greatest(lit(0.0),
          lit(1.0) - col("total_tokens").cast("double") /
            (col("n_bins").cast("double") * lit(budget.toDouble))), 6)
          .as("waste_frac"))
  }

  /** Split each document into fixed-size token chunks with overlap —
    * the context-window chunking step of a pretraining/RAG pipeline.
    * Chunk c covers whitespace tokens [c·stride, c·stride + chunkSize)
    * where stride = chunkSize − overlap; the final chunk may be short;
    * empty docs produce no chunks. Tokens keep their original case
    * (chunking must not alter content); chunk text re-joins them with
    * single spaces, so runs of whitespace collapse.
    *
    * Map-only (tokenize → compute starts → posexplode): fan-out is
    * ~n_tokens/stride rows per doc with no shuffle anywhere — at
    * 100 TB this runs at scan speed and the output partitioning
    * follows the input's. */
  def chunk(docs: DataFrame, id: Column, text: Column,
            chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = filter(split(text, "\\s+"), t => t =!= "")
    val n = size(toks)
    // sequence() rejects an empty range, so guard the n == 0 case
    val starts = when(n >= 1, sequence(lit(0), n - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    docs.select(id.as("doc_id"), toks.as("tk"), explode(starts).as("st"))
      .withColumn("chunk_id", (col("st") / stride).cast("long"))
      .select(
        col("doc_id"), col("chunk_id"),
        size(slice(col("tk"), col("st") + 1, lit(chunkSize))).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("tk"), col("st") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }
}

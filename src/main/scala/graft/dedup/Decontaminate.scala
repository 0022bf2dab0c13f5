package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with a held-out evaluation corpus (the overlap rule used
  * to scrub eval leakage from web-scale training sets — n-gram overlap
  * in the C4/GPT-3 style, Raffel et al. 2020 §2.3; Brown et al. 2020
  * appendix C).
  *
  * Scale: the eval side is benchmarks — tiny versus the corpus — so its
  * distinct shingle set is broadcast; the training side is then a
  * map-only explode + broadcast-hash-join + one per-doc aggregation.
  * The corpus is never shuffled by shingle against itself (that's the
  * dedup family's job); cost is O(corpus tokens) + O(eval shingles).
  */
object Decontaminate {

  /** One (doc_id, s) row per shared shingle — the stateless probe
    * shared by the batch aggregation below and the streaming leg
    * ([[graft.streaming.CurationStream.contamFlagStream]]): the eval
    * side broadcasts, the doc side is a map-only explode + join. */
  def shingleHits(docs: DataFrame, eval: DataFrame,
                  id: Column, text: Column, evalText: Column,
                  n: Int = 5): DataFrame = {
    val evalShingles = broadcast(
      eval.select(explode(TextDedup.shingles(evalText, n)).as("s")).distinct())
    docs.select(id.as("doc_id"), explode(TextDedup.shingles(text, n)).as("s"))
      .join(evalShingles, "s")
  }

  /** (doc_id, n_shared) for every training doc sharing ≥1 n-gram with
    * the eval corpus; clean docs don't appear. `n_shared` counts
    * distinct shared shingles (shingle sets are distinct per doc). */
  def contaminatedDocs(train: DataFrame, eval: DataFrame,
                       id: Column, text: Column, n: Int = 5): DataFrame =
    shingleHits(train, eval, id, text, text, n)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))

  /** The decontaminated corpus: training docs minus contaminated ones
    * (one left_anti on the flagged id set; `idName` is the train-side
    * id column). */
  def applyFilter(train: DataFrame, eval: DataFrame,
                  idName: String, text: Column, n: Int = 5): DataFrame =
    train.join(
      contaminatedDocs(train, eval, col(idName), text, n)
        .select(col("doc_id").as(idName)),
      Seq(idName), "left_anti")
}

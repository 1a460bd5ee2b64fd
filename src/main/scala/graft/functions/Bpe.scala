package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding trainer as a loop of DataFrame aggregations — the
  * classic tokenizer-training step of an LLM data pipeline, run on the
  * engine itself instead of a single-node tool.
  *
  * Each round is: count adjacent symbol pairs across the corpus (explode
  * + hash agg, map-side partial), pick the global argmax (orderBy.limit(1)
  * = TakeOrderedAndProject, collects ONE row), apply the merge to every
  * sequence with a codegen'd fold (no shuffle), repeat. Driver traffic is
  * one (pair, freq) row per round; everything else stays distributed, so
  * the same loop trains on a 100 TB corpus — wall-clock per round is one
  * scan + one small shuffle. localCheckpoint truncates the per-round
  * lineage (10 rounds of nested HOFs would otherwise stack analysis cost).
  */
object Bpe {

  /** Adjacent (left, right) symbol pairs of a sequence. Empty/singleton
    * sequences yield no pairs (a bare slice would throw on length -1).
    */
  def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(slice(syms, lit(1), size(syms) - 1),
        (x, i) => struct(x.as("l"), element_at(syms, i + 2).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** One greedy left-to-right, non-overlapping merge pass: every adjacent
    * (a, b) becomes the single symbol a+b ("aaa" + merge(a,a) → [aa, a]).
    * A just-merged symbol never re-merges within the pass (its text is
    * a+b, not a), which is exactly BPE's scan rule.
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** ENCODE with a learned merge table: apply the merges to a symbol
    * sequence in rank order (BPE's encode rule — greedy application in
    * training order, not longest-match). Ten merges = ten chained fold
    * projections in ONE codegen'd stage, no shuffle, no state; a
    * production-sized table (32k merges) would swap this for a
    * per-partition trie encoder behind the same column-in/column-out
    * signature. Concatenating the output symbols always reproduces the
    * input exactly (round-trip property, pinned in tests).
    */
  def encode(syms: Column, merges: Seq[(Int, String, String, Long)]): Column =
    merges.sortBy(_._1).foldLeft(syms) { case (c, (_, a, b, _)) => applyMerge(c, a, b) }

  /** Learn up to `nMerges` merges from a corpus of symbol sequences
    * (column `syms: array<string>`). Stops early when no pair occurs at
    * least `minFreq` times. Ties break on (freq desc, left asc, right
    * asc) — fully deterministic. Returns (rank, left, right, freq).
    *
    * Trains on weighted DISTINCT sequences (Sennrich et al. 2016's
    * word-count form): the corpus collapses once to (syms, w=count)
    * — identical pair totals, identical merges — and every subsequent
    * round scans only the type table (vocabulary-sized, ~1000× smaller
    * than the token stream on natural text; on a 100 TB corpus the
    * type table is the only thing the loop ever re-materializes).
    * Post-merge re-aggregation folds newly-colliding types (["a","b"]
    * merging into an existing ["ab"]) so weights stay exact.
    */
  def train(corpus: DataFrame, nMerges: Int, minFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var types = corpus.select(col("syms"))
      .groupBy("syms").agg(count(lit(1)).as("w"))
      .localCheckpoint()
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = types.select(explode(adjacentPairs(col("syms"))).as("p"), col("w"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("w").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (a, b, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, f))
        types = types.select(applyMerge(col("syms"), a, b).as("syms"), col("w"))
          .groupBy("syms").agg(sum("w").as("w"))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }
}

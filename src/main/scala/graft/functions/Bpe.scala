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
    * projections in ONE codegen'd stage, no shuffle, no state. This is
    * the SPEC form: exact for ANY merge table, but its plan grows one
    * projection per merge — structurally impossible at a production
    * 32k-merge table. [[encodeFast]] is the production path behind the
    * same column-in/column-out signature. Concatenating the output
    * symbols always reproduces the input exactly (round-trip property,
    * pinned in tests).
    */
  def encode(syms: Column, merges: Seq[(Int, String, String, Long)]): Column =
    merges.sortBy(_._1).foldLeft(syms) { case (c, (_, a, b, _)) => applyMerge(c, a, b) }

  /** Production BPE encode for arbitrarily large merge tables (the
    * q_text_20 promise, r12): ONE projection regardless of table size.
    * Per executor the merge table builds once into interned-integer
    * structures — symbol→id table, (leftId, rightId)→(rank, mergedId)
    * pair map — and each row runs the standard min-rank merge loop
    * (find the lowest-ranked pair present, merge all its occurrences
    * left-to-right non-overlapping, repeat): O(L²) worst case per
    * L-token row and INDEPENDENT of the merge count, vs the fold form's
    * O(M·L) work and O(M) plan nodes.
    *
    * Semantics note (why NOT a longest-match trie, which the r11
    * docstring loosely promised): greedy longest-match segmentation
    * over the final vocabulary is a DIFFERENT function from BPE encode
    * — e.g. vocab {ab, bc, abc} learned as (a,b),(b,c),(ab,c): input
    * "abc" BPE-encodes via rank 1 then rank 3 to [abc], but on input
    * "abcc" longest-match and merge order can diverge. The min-rank
    * loop is instead PROVABLY equal to the rank-order fold whenever no
    * pair's component string is the product of a same-or-later-ranked
    * merge (CHECKED at build time, loud failure otherwise): under that
    * condition merging rank k creates only adjacencies involving
    * symbols that participate in no pair ranked <= k, so no pass ever
    * re-enables an earlier rank and per-rank one-pass order collapses
    * to min-rank order. Property-tested equal to [[encode]] on trained
    * tables and random corpora (BpeSpec); BpeBench measures the 32k
    * point. Tokens absent from the merge alphabet pass through
    * untouched (they can never be a merge component).
    */
  def encodeFast(syms: Column, merges: Seq[(Int, String, String, Long)]): Column = {
    val codec = new BpeCodec(merges.sortBy(_._1).toArray)
    val f = org.apache.spark.sql.functions.udf(
      (ts: scala.collection.immutable.Seq[String]) =>
        if (ts == null) null else codec.encodeTokens(ts))
    f(syms)
  }

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

/** Interned-integer BPE codec behind [[Bpe.encodeFast]]. Serializable
  * (ships the raw merge rows with the task); the derived structures are
  * @transient lazy — rebuilt once per deserialized copy (~ms for 32k
  * merges), immutable afterwards, so concurrent tasks sharing one copy
  * (local mode) are safe behind the lazy-val init lock.
  */
private[functions] final class BpeCodec(
    orderedMerges: Array[(Int, String, String, Long)]) extends Serializable {

  // (symbol -> id, id -> symbol, (l,r) packed -> [rank, mergedId],
  //  rank -> (l, r, mergedId))
  @transient private lazy val built: (java.util.HashMap[String, Integer],
      Array[String], java.util.HashMap[java.lang.Long, Array[Int]],
      java.util.HashMap[Integer, Array[Int]]) = {
    val symId = new java.util.HashMap[String, Integer]()
    def intern(s: String): Int = {
      val e = symId.get(s)
      if (e != null) e.intValue()
      else { val id = symId.size; symId.put(s, id); id }
    }
    // Soundness precondition (checked, not assumed): the min-rank loop
    // equals the rank-order fold iff no pair's component is the PRODUCT
    // of a same-or-later-ranked merge — otherwise a later merge could
    // re-create a component string and re-enable an earlier rank that
    // the fold (one pass per rank, in order) has already retired. A
    // trained table can only violate this when two merges' products
    // collide as strings AND the collision interleaves a use (e.g.
    // (a,bc) and (ab,c) both producing "abc" around a pair that uses
    // it) — loud failure here beats silent divergence; such a table
    // must use the fold form.
    // Ranks must be DISTINCT (orderedMerges is already rank-sorted, so
    // strictly increasing ⟺ distinct): with a duplicate rank, rankInfo
    // keeps only the last pair per rank while pairInfo can report the
    // other pair as bestRank — the merge pass then matches nothing and
    // encodeTokens spins forever (an executor hang, not the loud
    // failure this codec promises). Unreachable via Bpe.train, but
    // encodeFast is a public API taking arbitrary tables (r12 ADVICE).
    for (k <- 1 until orderedMerges.length) {
      require(orderedMerges(k)._1 > orderedMerges(k - 1)._1,
        s"merge table has duplicate rank ${orderedMerges(k)._1}: pairs " +
          s"('${orderedMerges(k - 1)._2}','${orderedMerges(k - 1)._3}') and " +
          s"('${orderedMerges(k)._2}','${orderedMerges(k)._3}') — ranks must be unique")
    }
    val productRanks = new java.util.HashMap[String, Integer]() // product -> max rank
    for ((rank, a, b, _) <- orderedMerges) {
      require(a.nonEmpty && b.nonEmpty, s"empty merge component at rank $rank")
      val prev = productRanks.get(a + b)
      if (prev == null || prev < rank) productRanks.put(a + b, rank)
    }
    for ((rank, a, b, _) <- orderedMerges; c <- Seq(a, b)) {
      val pr = productRanks.get(c)
      require(pr == null || pr < rank,
        s"merge table is order-ambiguous: component '$c' of rank-$rank pair " +
          s"is also the product of rank-${pr} — encodeFast would diverge from " +
          "the fold form on such a table; use Bpe.encode instead")
    }

    val pairInfo = new java.util.HashMap[java.lang.Long, Array[Int]]()
    val rankInfo = new java.util.HashMap[Integer, Array[Int]]()
    for ((rank, a, b, _) <- orderedMerges) {
      val ai = intern(a); val bi = intern(b); val mi = intern(a + b)
      val key = java.lang.Long.valueOf((ai.toLong << 32) | (bi.toLong & 0xffffffffL))
      // duplicate (l,r) pairs keep the LOWEST rank — identical to the
      // fold form, where the first pass already consumed every occurrence
      if (!pairInfo.containsKey(key)) pairInfo.put(key, Array(rank, mi))
      rankInfo.put(rank, Array(ai, bi, mi))
    }
    val names = new Array[String](symId.size)
    symId.forEach((s, i) => names(i) = s)
    (symId, names, pairInfo, rankInfo)
  }

  def encodeTokens(tokens: scala.collection.Seq[String]): Seq[String] = {
    val (symId, names, pairInfo, rankInfo) = built
    var n = tokens.length
    if (n == 0) return Nil
    // ids(i) >= 0: interned merge-alphabet symbol; < 0: pass-through
    // token, -(origIndex+1) (never participates in a pair)
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) {
      val e = symId.get(tokens(i))
      ids(i) = if (e == null) -(i + 1) else e.intValue()
      i += 1
    }
    var done = false
    while (!done) {
      var bestRank = Int.MaxValue
      i = 0
      while (i < n - 1) {
        if (ids(i) >= 0 && ids(i + 1) >= 0) {
          val pr = pairInfo.get(java.lang.Long.valueOf(
            (ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL)))
          if (pr != null && pr(0) < bestRank) bestRank = pr(0)
        }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val info = rankInfo.get(bestRank)
        val l = info(0); val r = info(1); val m = info(2)
        // one greedy left-to-right non-overlapping pass, in place
        var w = 0; var p = 0
        while (p < n) {
          if (p < n - 1 && ids(p) == l && ids(p + 1) == r) {
            ids(w) = m; p += 2
          } else {
            ids(w) = ids(p); p += 1
          }
          w += 1
        }
        n = w
      }
    }
    val out = new Array[String](n)
    i = 0
    while (i < n) {
      out(i) = if (ids(i) >= 0) names(ids(i)) else tokens(-ids(i) - 1)
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}

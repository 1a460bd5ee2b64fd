package graft.api

import graft.functions.{KMeans, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The library's user-facing, column-parameterized API: the same
  * training-data pipeline operators the declared queries pin against the
  * DuckDB oracle, generalized to ANY DataFrame and column names. The
  * declared queries in `graft.operators` remain the oracle-verified
  * ground truth; `PipelinesSpec` asserts these generic forms reproduce
  * them exactly on the fixtures.
  *
  * Everything here is lazy DataFrame composition over built-in functions
  * — no UDFs, no collect (the connected-components loop drives O(1-row)
  * convergence actions, documented there) — so each operator inherits
  * the scaling notes of its underlying formulation.
  */
object Pipelines {

  /** Exact dedup: keep the lowest-id row per normalized text. One
    * shuffle keyed by the text digest.
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = lower(trim(col(textCol)))
    df.withColumn("__norm", norm)
      .groupBy(col("__norm"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("__norm")
  }

  /** MinHash+LSH candidate near-dup pairs: (id_a, id_b, n_shared_bands).
    * Shuffles O(n·bands) band keys, never the O(n²) pair space.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sigs = df.select(col(idCol).as("__id"),
      TextFunctions.minhashSignature(col(textCol), k).as("__sig"))
    val banded = sigs
      .select(col("__id"), explode(sequence(lit(0L), lit(bands - 1L))).as("__j"), col("__sig"))
      .select(col("__id"), col("__j"),
        md5(concat_ws("-", transform(
          slice(col("__sig"), (col("__j") * rows + 1).cast("int"), lit(rows)),
          _.cast("string")))).as("__bk"))
    val a = banded.select(col("__id").as("id_a"), col("__j"), col("__bk"))
    val b = banded.select(col("__id").as("id_b"), col("__j").as("__j2"), col("__bk").as("__bk2"))
    a.join(b, col("__j") === col("__j2") && col("__bk") === col("__bk2") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Connected components over an undirected edge list: (id, component)
    * where component = min id reachable.
    *
    * Large-star / small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round rewires
    * every node's strictly-larger neighbors (large-star) then its
    * smaller-or-equal neighbors (small-star) to the minimum of its
    * closed neighborhood. Chains contract exponentially, so rounds are
    * O(log n) — NOT O(diameter) like one-hop min-label propagation —
    * and the edge set collapses monotonically toward one star per
    * component rooted at the component minimum. Per round: two
    * groupBy(node)+join min-label exchanges (map-side combinable and
    * AQE-skew-splittable, unlike the window form they replaced — r11)
    * + two dedup shuffles over the
    * CURRENT edge set (which shrinks as stars form), one localCheckpoint
    * materialization to truncate lineage, and one O(1-row) stats action
    * (count + order-independent hash-sum) on the just-checkpointed
    * blocks for the fixpoint test. State is edge-sized, never node²;
    * at 100 TB the window key is the node id, so skew = max degree —
    * star-contraction itself is what keeps hub degrees from compounding
    * across rounds.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String, maxIters: Int = 25): DataFrame = {
    // canonical orientation: u = larger endpoint, v = smaller; drop
    // self-loops and duplicates so round cost tracks the TRUE edge count
    var e = edges
      .select(greatest(col(srcCol), col(dstCol)).as("u"),
        least(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint()
    // checkpoint the node list too: the final label join must read
    // materialized rows, not re-derive the (possibly join-heavy) node
    // lineage at action time — the round-2 PageRank lesson
    val nodeIds = nodes.select(col(idCol)).localCheckpoint()
    // Per-round neighborhood minimum as groupBy(u).agg(min) + re-join,
    // NOT min().over(Window.partitionBy(u)) (r11, VERDICT r10 item 3):
    // the window form sorts each node's whole adjacency in one task and
    // gets no AQE skew handling, so a real-graph hub (degree 10⁴⁺) puts
    // its entire neighbor list through a single task EVERY round. The
    // aggregate form partial-min()s map-side — the hub's per-task input
    // collapses to one row per map partition before the shuffle — and
    // the edge⋈min join is AQE-skew-splittable. Output is the identical
    // edge set (min is deterministic), so goldens are unchanged.
    // large-star: for every node n, connect each strictly-larger
    // neighbor to min(Γ(n) ∪ {n}); emitted (v, m) keeps v > m
    // SHUFFLE_HASH on the edges⋈mins join: both sides arrive
    // partitioned on u (the groupBy's exchange is reused), the mins
    // side is node-sized ≤ the edge side, and a sort-merge join would
    // re-sort BOTH relations every round for nothing; AQE's skew
    // splitter handles shuffled-hash joins the same as sort-merge.
    // largeStar emits WITHOUT a distinct: its consumer is always
    // smallStar, whose min-aggregate is duplicate-insensitive (the
    // map-side combine collapses repeats before the wire) and whose
    // own final distinct dedups the round's output — the intermediate
    // dedup exchange bought nothing but a stage per round (r11; the
    // fixpoint stats only ever read smallStar's deduped output, so
    // convergence and results are byte-identical).
    def largeStar(es: DataFrame): DataFrame = {
      val nbrs = es.union(es.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(least(min("v"), col("u")).as("m"))
      nbrs.join(mins.hint("shuffle_hash"), "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }
    // small-star (input already oriented u > v): connect every smaller
    // neighbor AND the node itself to min(Γ(n)); orientation preserved
    def smallStar(es: DataFrame): DataFrame = {
      val mins = es.groupBy("u").agg(min("v").as("m"))
      val withM = es.join(mins.hint("shuffle_hash"), "u")
      withM.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(withM.select(col("u"), col("m").as("v")))
        .distinct()
    }
    def stats(es: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent AND overflow-free (a long
      // sum of 2⁶³-scale hashes throws under Spark 4's default ANSI)
      val r = es.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = stats(e)
    var converged = prev._1 == 0L // no edges → every node is its own root
    var pass = 0
    while (!converged && pass < maxIters) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val cur = stats(e)
      // fixpoint ⇔ identical edge SET; count + xor-of-hashes is an
      // O(1-row) proxy (collision odds ~2⁻⁶⁴)
      converged = cur == prev
      prev = cur
      pass += 1
    }
    // silent non-convergence would return plausible-but-wrong components
    // (a half-contracted chain reads as several fake stars); fail loudly
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds " +
        s"(${prev._1} edges still rewiring) — raise maxIters")
    nodeIds
      .join(e.select(col("u"), col("v")), col(idCol) === col("u"), "left")
      .select(col(idCol), coalesce(col("v"), col(idCol)).as("component"))
  }

  /** BFS hop distances from `source` over an undirected edge list.
    * Returns (idCol, dist) for REACHABLE nodes only. Reachability is
    * defined over `edges` ALONE: ids appearing in `edges` but not in
    * `nodes` are returned if reached, and the source row (dist 0) is
    * emitted unconditionally — `nodes` only sizes the partitioner
    * (r10 doc fix: the earlier DataFrame version anchored the result
    * to `nodes`; all in-tree callers derive nodes from edges, so the
    * two contracts coincide — callers that need the old semantics
    * semi-join the result with their node table). Level-synchronous:
    * each hop expands ONLY the current frontier (nodes discovered last
    * hop) — unweighted BFS settles a node the first time it is seen,
    * so settled distances never need re-relaxing and total work is
    * O(E) across all hops, not O(E · eccentricity).
    *
    * The loop runs on CO-PARTITIONED RDDs, not DataFrames (r9, the
    * q_graph_25 budget fix — measured on the 829-node sampled graph:
    * the DataFrame form cost ~4–6 s per BFS pass in pure per-stage
    * overhead — AQE replanning, broadcast builds, and fresh per-hop
    * codegen from the `dist === h` literals — regardless of hop
    * chunking or partition sizing; this form runs the same pass in
    * well under a second). One HashPartitioner sized to the node count
    * (~500k nodes per partition, so real tasks at any scale) keeps the
    * adjacency, frontier, and visited sets co-located: per hop the
    * adjacency⋈frontier join and the visited subtract are NARROW, and
    * the only shuffle is the reduceByKey that dedups newly reached
    * nodes — strictly fewer stages than the Catalyst plan, with none
    * of its per-stage fixed cost. This is the documented RDD exception
    * (genuine per-partition iterative state), the same machinery class
    * as exactRankPick.
    *
    * Hops run in chunks of `chunk` (default 4) between checkpoint
    * truncations, with ONE convergence count per chunk; hops past a
    * dead frontier are no-ops (empty frontier joins to nothing), so
    * overshooting inside a chunk cannot alter any distance.
    * Non-convergence within maxIters hops still throws rather than
    * returning truncated distances.
    */
  def bfsDistances(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      source: Long, maxIters: Int = 25, chunk: Int = 4): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.rdd.RDD
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(chunk >= 1, "bfsDistances: chunk must be >= 1")
    val sess = nodes.sparkSession
    val sc = sess.sparkContext
    val nNodes = nodes.count()
    val defaultP = sess.conf.get("spark.sql.shuffle.partitions")
    val p = math.max(1L, math.min(defaultP.toLong, nNodes / 500000L + 1L)).toInt
    val part = new HashPartitioner(p)
    // adjacency pairs (node -> neighbor), both directions, materialized
    // once and kept partitioned for the whole walk
    val adj: RDD[(Long, Long)] = edges
      .select(col(srcCol).cast("long"), col(dstCol).cast("long")).rdd
      .flatMap { r => val s = r.getLong(0); val d0 = r.getLong(1)
        Iterator((s, d0), (d0, s)) }
      .partitionBy(part)
    adj.localCheckpoint()
    adj.count()
    val init: RDD[(Long, Long)] =
      sc.parallelize(Seq((source, 0L)), 1).partitionBy(part)
    // visited = the union of the per-chunk frontier pieces, each one a
    // checkpointed co-partitioned RDD — a flat partitioner-aware union
    // (narrow), so lineage never deepens across chunks
    var visitedParts: List[RDD[(Long, Long)]] = List(init)
    var frontier = init
    var discovered = 1L
    var pass = 0
    while (discovered > 0 && pass < maxIters) {
      val hops = math.min(chunk, maxIters - pass)
      var fr = frontier
      var newParts: List[RDD[(Long, Long)]] = Nil
      for (_ <- 0 until hops) {
        // fr is always the last element of visitedParts, so the union
        // IS the full visited set
        val vis = sc.union(visitedParts)
        // adj⋈fr narrow (co-partitioned); the reduceByKey is the hop's
        // single shuffle (dedups multi-parent discoveries — the dist is
        // uniform across a hop, so keeping either copy is exact);
        // subtract of the visited set is narrow again
        fr = adj.join(fr)
          .map { case (_, (nb, dd)) => (nb, dd + 1L) }
          .reduceByKey(part, (a, _) => a)
          .subtractByKey(vis, part)
        visitedParts = visitedParts :+ fr
        newParts = newParts :+ fr
      }
      // the chunk's hops share one lineage: mark only this chunk's new
      // pieces (re-marking a checkpointed RDD is not allowed), then one
      // materializing action checkpoints them all and reads the count
      newParts.foreach(_.localCheckpoint())
      discovered = fr.count()
      frontier = fr
      pass += hops
    }
    if (discovered > 0) throw new IllegalStateException(
      s"bfsDistances did not converge in $maxIters passes " +
        s"(frontier still expanding) — raise maxIters")
    val visAll = sc.union(visitedParts)
    sess.createDataFrame(
      visAll.map { case (id, dd) => Row(id, dd) },
      StructType(Seq(StructField(idCol, LongType, nullable = false),
        StructField("dist", LongType, nullable = false))))
  }

  /** PageRank with dangling-node mass redistribution over a directed
    * edge list. Returns (node, rank) with ranks summing to 1.
    *
    * Each iteration is the declarative Pregel round: edges ⋈ ranks ⋈
    * outdeg → groupBy(dst) sum, plus the dangling correction — nodes
    * with no out-edges would leak their mass, so their summed rank is
    * redistributed uniformly:
    *   rank'(v) = (1-d)/n + d·(Σ_{u→v} rank(u)/outdeg(u) + D/n),
    * D = Σ rank over dangling u. This keeps Σ rank = 1 every iteration
    * (the property `GraphSpec` pins).
    *
    * Iteration-invariant inputs (edges, nodes, outdeg) are materialized
    * once via localCheckpoint — without it each unrolled iteration
    * re-derives the edge list (re-scanning + re-shuffling the fact
    * table per round: the round-2 plan had the edge-derivation subtree
    * 4× in a 368-node plan). Ranks are checkpointed per round to
    * truncate the otherwise-exponential lineage, same as
    * [[connectedComponents]].
    *
    * `tol <= 0` runs exactly `maxIters` rounds fully declaratively (no
    * per-round driver action) — the form the declared query pins
    * against its unrolled DuckDB oracle. `tol > 0` adds one O(1-row)
    * convergence action per round and stops when the L1 rank delta
    * drops below tol; throws if maxIters rounds don't get there
    * (silent non-convergence would return plausible-but-wrong ranks).
    *
    * At 100 TB: edges shuffle once at checkpoint time; ranks/outdeg are
    * node-sized (≪ edges) but NOT force-broadcast — at 10⁸–10⁹ nodes a
    * forced broadcast is a hard failure (8 GB cap / driver OOM), so the
    * joins carry no hint and AQE picks broadcast vs shuffle from the
    * measured post-checkpoint sizes; only the provably 1-row totals
    * (node count, dangling mass) are hinted. Each round is one shuffle
    * on dst. The checkpoint is the difference between O(iters) and
    * O(iters²) fact-table scans.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, maxIters: Int = 20, tol: Double = 0.0): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst"))).distinct().localCheckpoint()
    val outdeg = e.groupBy("__src")
      .agg(count(lit(1)).cast("double").as("__outdeg")).localCheckpoint()
    val nn = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var rank = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank")).localCheckpoint()
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIters && delta >= tol) {
      val prev = rank
      // dangling mass: one broadcastable row, computed declaratively so
      // the tol<=0 path stays action-free
      val dm = prev.join(outdeg, prev("node") === outdeg("__src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
      val contrib = e.join(prev, col("__src") === col("node"))
        .join(outdeg, Seq("__src"))
        .groupBy(col("__dst")).agg(sum(col("rank") / col("__outdeg")).as("__inr"))
      rank = nodes.crossJoin(broadcast(nn)).crossJoin(broadcast(dm))
        .join(contrib, col("node") === col("__dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") + lit(damping) *
            (coalesce(col("__inr"), lit(0.0)) + col("__dm") / col("__n"))).as("rank"))
        .localCheckpoint()
      if (tol > 0) {
        delta = rank.join(prev.withColumnRenamed("rank", "__pr"), Seq("node"))
          .agg(sum(abs(col("rank") - col("__pr")))).first().getDouble(0)
      }
      iter += 1
    }
    if (tol > 0 && delta >= tol) throw new IllegalStateException(
      s"pageRank did not converge in $maxIters iterations (L1 delta $delta >= $tol); raise maxIters")
    rank
  }

  /** Declarative data-quality expectations (the Deequ/Great-Expectations
    * shape): evaluate a rule list over a DataFrame in ONE aggregate
    * pass and return (rule, n_checked, n_failed, pass) per rule. A rule
    * fails on rows where its predicate is not TRUE — NULL predicate
    * results count as failures (a null-tolerant rule must say so with
    * coalesce/isNull itself), so missing data can't silently pass.
    *
    * Scale: all rules ride one HashAggregate over one scan (conditional
    * counts), never one job per rule; the stack() to rows is driver-free
    * and runs on the single aggregate output row.
    */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"), s"rule name '$name' must be [A-Za-z0-9_]+") }
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map { case ((_, pred), i) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(s"__f$i") }
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val stackArgs = rules.indices.map(i => s"'${rules(i)._1}', __f$i").mkString(", ")
    one.selectExpr(s"stack(${rules.size}, $stackArgs) AS (rule, n_failed)", "__n AS n_checked")
      .select(col("rule"), col("n_checked"), col("n_failed"),
        (col("n_failed") === 0).cast("long").as("pass"))
  }

  /** Near-dup clusters straight from text: LSH candidates → connected
    * components → (id, component, csize).
    */
  def nearDupComponents(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4): DataFrame = {
    val comp = connectedComponents(df, idCol,
      minhashCandidates(df, idCol, textCol, k, bands), "id_a", "id_b")
    comp.join(comp.groupBy("component").agg(count(lit(1)).as("csize")), "component")
      .select(col(idCol), col("component"), col("csize"))
  }

  /** Brute-force cosine top-k against one probe vector (broadcast the
    * probe; the corpus streams — the exact-search baseline).
    */
  def cosineKnn(corpus: DataFrame, idCol: String, vecCol: String,
      probe: DataFrame, probeVecCol: String, topK: Int): DataFrame = {
    // a multi-row probe would silently interleave top-k across probes
    // (no probe id in the output) — reject it loudly; probes are tiny,
    // the count is cheap
    val nProbe = probe.limit(2).count()
    require(nProbe == 1, s"cosineKnn expects exactly one probe row, got $nProbe" +
      (if (nProbe > 1) "+" else ""))
    val cos = graft.functions.VectorFunctions.cosine(col(vecCol), col("__pv"))
    corpus.crossJoin(broadcast(probe.select(col(probeVecCol).as("__pv"))))
      .select(col(idCol), cos.as("cosine"))
      .orderBy(col("cosine").desc, col(idCol)).limit(topK)
  }

  /** IVF index: k-means-trained cells (one Lloyd round from the first k
    * vectors by id) + per-vector cell assignment. Returns (id, cell).
    */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String, cells: Int): DataFrame = {
    val e = df.select(col(idCol).as("vec_id"), transform(col(vecCol), _.cast("double")).as("v"))
    val initIds = e.select(col("vec_id")).orderBy("vec_id").limit(cells)
    val init = e.join(initIds, "vec_id")
      .select(col("vec_id").as("cid"), col("v").as("cvec"))
    val cents = KMeans.update(KMeans.assign(e, init))
    KMeans.assign(e, cents)
      .select(col("vec_id").as(idCol), col("cid").as("cell"))
  }

  /** Deterministic train/valid/test split by multiplicative hash of the
    * id — reproducible across runs, engines, partitionings; membership
    * computable from the id alone.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    // numeric ids only — a silent cast-to-null would classify every row
    // 'test'; fail loudly instead
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"deterministicSplit needs a numeric id column, got ${df.schema(idCol).dataType}")
    // (id mod P)·A mod P mod 100: the mod-P before the multiply keeps the
    // product inside Long at any id magnitude (a bare id·A wraps negative
    // past ~3.47e9 and lands 100% 'train'); the mod-P AFTER the multiply
    // makes the bucket depend on the whole product, not its low bits — a
    // bare `· A mod 100` collapses any id stride divisible by 100 into
    // one split
    val bucket = (pmod(col(idCol).cast("long"), lit(1000000007L)) * 2654435761L) % 1000000007L % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Inverse-frequency class weights: total / (k · class_count). */
  def classWeights(df: DataFrame, labelCol: String): DataFrame = {
    val totals = df.agg(count(lit(1)).cast("double").as("__total"),
      countDistinct(col(labelCol)).cast("double").as("__k"))
    df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(totals))
      .select(col(labelCol), col("n"), (col("__total") / (col("__k") * col("n"))).as("weight"))
  }

  /** Context-window chunking: one row per (id, chunk) of `window` tokens
    * with stride `stride` (overlap = window − stride). Pure map stage —
    * generalizes q_text_14_chunk.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      window: Int = 32, stride: Int = 24): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0L), floor((size(toks) - 1) / lit(stride)))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window)).as("chunk_tokens"))
      .withColumn("n_toks", size(col("chunk_tokens")).cast("long"))
  }

  /** Deterministic sequence packing: assigns each row a `pack_id` such
    * that rows stream into `capacity`-token packs in stable
    * (group, id) order — generalizes q_text_15_pack's bucketing.
    */
  def pack(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, capacity: Int = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__n_tok", size(TextFunctions.tokens(col(textCol))).cast("long"))
      .withColumn("__cum", sum("__n_tok").over(w))
      .withColumn("pack_id", floor((col("__cum") - col("__n_tok")) / lit(capacity)))
      .drop("__cum")
      .withColumnRenamed("__n_tok", "n_tok")
  }

  /** Exact heavy hitters: tokens whose corpus share exceeds
    * `minShare` — generalizes q_agg_18_heavyhitters.
    */
  def heavyHitters(df: DataFrame, textCol: String, minShare: Double = 0.005): DataFrame = {
    val t = df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
    val tot = t.agg(count(lit(1)).cast("double").as("__n"))
    t.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") > col("__n") * minShare)
      .select(col("token"), col("cnt"), (col("cnt") / col("__n")).as("share"))
  }

  /** Benchmark-contamination screen: fraction of each row's token
    * n-gram shingles found in `benchmark`'s shingle set (broadcast).
    * Returns (id, n_sh, n_hit, overlap). Documents with fewer than `n`
    * tokens have no shingles and are kept with (n_sh=0, n_hit=0,
    * overlap=0.0) — explode_outer + non-null counts — so corpus-wide
    * contamination rates computed downstream see every input row.
    */
  def contaminationScreen(train: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val bench = benchmark
      .select(explode(TextFunctions.tokenShingles(col(benchTextCol), n)).as("__sh"))
      .distinct().withColumn("__hit", lit(1))
    train.select(col(idCol), explode_outer(TextFunctions.tokenShingles(col(textCol), n)).as("__sh"))
      .join(broadcast(bench), Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__sh")).as("n_sh"), count(col("__hit")).as("n_hit"))
      .select(col(idCol), col("n_sh"), col("n_hit"),
        when(col("n_sh") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_sh")).as("overlap"))
  }

  /** Per-row (id, w1, w2) token-bigram stream — the shared explode under
    * the repetition/novelty screens.
    */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol),
        explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1).as("w1"),
          slice(toks, lit(2), size(toks) - 1).as("w2"))).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
  }

  /** Gopher-style repetition screens: duplicate-token fraction and
    * top-bigram share per row, with a flag at the given thresholds —
    * generalizes q_text_17_repetition. Two per-row aggregates (map-side
    * combinable) joined agg↔agg; no corpus self-join.
    */
  def repetitionScores(df: DataFrame, idCol: String, textCol: String,
      dupFracThresh: Double = 0.2, topBigramThresh: Double = 0.18): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val ts = df.select(col(idCol), size(toks).cast("long").as("n_tok"),
      size(array_distinct(toks)).cast("long").as("__n_uniq"))
    val bt = bigrams(df, idCol, textCol)
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max("__c").as("__top_c"), sum("__c").as("__n_big"))
    val dupF = (col("n_tok") - col("__n_uniq")).cast("double") / col("n_tok")
    val topF = col("__top_c").cast("double") / col("__n_big")
    ts.join(bt, idCol)
      .select(col(idCol), col("n_tok"),
        dupF.as("dup_token_frac"), topF.as("top_bigram_frac"),
        when(dupF > dupFracThresh || topF > topBigramThresh, 1L).otherwise(0L).as("flagged"))
  }

  /** N-gram novelty: the share of a row's distinct bigrams with corpus
    * document-frequency 1 (template/mirror detector) — generalizes
    * q_text_18_novelty. The document-frequency table is bigram-vocab-
    * sized and carries no broadcast hint (AQE sizes it).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val b = bigrams(df, idCol, textCol).distinct()
    val dfreq = b.groupBy("w1", "w2").agg(count(lit(1)).as("__nd"))
    b.join(dfreq, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("__nd") === 1, 1L).otherwise(0L)).cast("long").as("n_novel"),
        (sum(when(col("__nd") === 1, 1L).otherwise(0L)).cast("double") / count(lit(1)))
          .as("novel_frac"))
  }

  /** SemDeDup: coarse-cluster rows to the nearest of the first `cells`
    * vectors (by id), compare pairs ONLY within a cluster, and emit the
    * keep-lowest-id drop list for pairs with cosine ≥ `tau` —
    * generalizes q_sim_13_semdedup. Candidate pairs go from O(n²) to
    * O(Σ cell²); assignment is one `argmin_sqdist` projection against a
    * single broadcast packed-centroid row (the corpus never shuffles
    * for assignment; the pair join shuffles on cell id only). Returns
    * (drop_id, keep_id, cell, n_dups).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      cells: Int, tau: Double): DataFrame = {
    val s = df.sparkSession
    graft.expressions.VectorExpressions.register(s)
    val e = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val firstIds = e.select(col("__id")).orderBy("__id").limit(cells)
    val packed = e.join(firstIds, "__id")
      .select(col("__id").as("__cid"), col("__v").as("__cvec"))
      .agg(array_sort(collect_list(struct(col("__cid"), col("__cvec")))).as("__cs"))
      .select(transform(col("__cs"), _.getField("__cid")).as("__cids"),
        transform(col("__cs"), _.getField("__cvec")).as("__cvecs"))
    val withCell = e.crossJoin(broadcast(packed))
      .withColumn("__cell", element_at(col("__cids"), expr("argmin_sqdist(__v, __cvecs)") + 1))
      .select(col("__id"), col("__v"), col("__cell"))
    val a = withCell.select(col("__cell"), col("__id").as("__ia"), col("__v").as("__va"))
    val b = withCell.select(col("__cell").as("__cellb"), col("__id").as("__ib"), col("__v").as("__vb"))
    a.join(b, col("__cell") === col("__cellb") && col("__ia") < col("__ib"))
      .filter(expr("cosine_similarity(__va, __vb)") >= tau)
      .groupBy(col("__ib").as("drop_id"))
      .agg(min("__ia").as("keep_id"), min("__cell").as("cell"), count(lit(1)).as("n_dups"))
  }

  /** Temperature-flattened corpus mixture (generalizes
    * q_text_19_mixture): per-group quota = min(n, ceil(√n · multiplier))
    * — sampling rate ∝ n^(−1/2), i.e. the T=2 temperature reweighting a
    * multilingual pretraining mix applies — filled with the
    * deterministic bottom-quota-by-hash rows. The multiplier should be
    * a power of two so the quota arithmetic is FP-exact across engines
    * (sqrt is IEEE-correctly-rounded; ×2^k is exact). Returns the kept
    * rows as (idCol, groupCol, rn, quota). One group-keyed aggregate +
    * one window shuffle; the quota table broadcasts.
    */
  def temperatureMixture(df: DataFrame, idCol: String, groupCol: String,
      multiplier: Int = 8): DataFrame = {
    val quotas = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        least(col("__n"),
          ceil(sqrt(col("__n").cast("double")) * multiplier).cast("long")).as("quota"))
    val prio = (pmod(col(idCol), lit(1000000007L)) * 2654435761L) % 1000000007L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(prio, col(idCol))
    df.select(col(idCol), col(groupCol), row_number().over(w).cast("long").as("rn"))
      .join(broadcast(quotas), groupCol)
      .filter(col("rn") <= col("quota"))
      .select(col(idCol), col(groupCol), col("rn"), col("quota"))
  }

  /** Group-wise top-k through the native mergeable aggregate
    * (generalizes q_agg_23_topk_native): ranks the top `k` rows per
    * group under (ordCol DESC, tie1 ASC, tie2 ASC) without ever sorting
    * the corpus — map-side combine caps shuffle volume at O(groups·k).
    * Returns (groupCols..., rnk, ord, tie1, tie2). The tie columns must
    * uniquely identify rows (SURVEY §2.12 rule 1).
    */
  def topKBy(df: DataFrame, groupCols: Seq[String], ordCol: String,
      tie1: String, tie2: String, k: Int): DataFrame = {
    graft.expressions.TopKByAgg.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"topk_by($ordCol, $tie1, $tie2, $k)").as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__r")): _*)
      .select(groupCols.map(col) ++ Seq((col("__pos") + 1).cast("long").as("rnk"),
        col("__r.ord").as(ordCol), col("__r.tie1").as(tie1), col("__r.tie2").as(tie2)): _*)
  }

  /** Per-dimension z-score standardization of a vector column
    * (generalizes q_sim_14_standardize): values quantize to 10^-6 units,
    * per-dim sufficient statistics are exact integer sums (dim-bounded,
    * broadcast back), z is one double division of exact integers —
    * bit-identical under any partitioning. Returns the exploded
    * (idCol, dim, z); dims with zero variance yield NULL z.
    */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val el = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .select(col(idCol), (col("__pos") + 1).cast("long").as("dim"),
        floor(col("__v").cast("double") * 1000000 + 0.5).cast("long").as("__vi"))
    val st = el.groupBy("dim").agg(
      count(lit(1)).as("__n"), sum("__vi").as("__s1"),
      sum(col("__vi") * col("__vi")).as("__s2"))
    val dvar = col("__n") * col("__s2") - col("__s1") * col("__s1")
    el.join(broadcast(st), "dim")
      .select(col(idCol), col("dim"),
        when(dvar > 0,
          (col("__n") * col("__vi") - col("__s1")).cast("double")
            / sqrt(dvar.cast("double"))).as("z"))
  }

  /** Join-key skew profile (generalizes q_dq_15_skew_profile): the topN
    * heaviest keys with row share and skew ratio (count ÷ mean rows per
    * key) — run this BEFORE a big shuffle join to choose between plain,
    * salted, and AQE skew-split plans. One map-side-combinable aggregate
    * + a 1-row totals broadcast.
    */
  def skewProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val f = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val t = f.agg(sum("n").as("__total"), count(lit(1)).as("__keys"))
    f.crossJoin(broadcast(t))
      .select(col(keyCol), col("n"),
        (col("n").cast("double") / col("__total").cast("double")).as("share"),
        ((col("n") * col("__keys")).cast("double") / col("__total").cast("double")).as("skew_x"))
      .orderBy(col("n").desc, col(keyCol)).limit(topN)
  }

  /** Two-sample Kolmogorov–Smirnov test (generalizes q_stat_3_ks): D
    * between the `valueCol` distributions of rows where `groupCol` ==
    * groupA vs groupB. Returns one row (n1, n2, d_num, d_stat) with the
    * integer core D·n1·n2 exact in BIGINT — bit-identical under any
    * partitioning. The ECDF cumsum runs on the merged DISTINCT-value
    * grid (bounded by measurement resolution, not corpus size).
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val src = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(valueCol).as("__v"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("__ia"))
    val pts = src.groupBy("__v")
      .agg(sum("__ia").as("__c1"), (count(lit(1)) - sum("__ia")).as("__c2"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("__v").rowsBetween(Long.MinValue, 0)
    val cum = pts.select(sum("__c1").over(w).as("__cum1"), sum("__c2").over(w).as("__cum2"))
    val n = pts.agg(sum("__c1").as("n1"), sum("__c2").as("n2"))
    cum.crossJoin(broadcast(n))
      .groupBy("n1", "n2")
      .agg(max(abs(col("n2") * col("__cum1") - col("n1") * col("__cum2"))).as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        (col("d_num").cast("double")
          / (col("n1").cast("double") * col("n2").cast("double"))).as("d_stat"))
  }

  /** BM25 ranking (generalizes q_text_22_bm25): top `k` documents for a
    * bag-of-terms query under Lucene-style idf. Per-(doc,term) scores
    * quantize to 1e-6 integers BEFORE the per-doc sum, so the multi-term
    * reduction has no float-addition-order hazard. df/corpus stats are
    * broadcast; the postings side is term-filtered before the
    * doc-length join. Returns (idCol, score, rnk).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = df.select(col(idCol), explode(split(col(textCol), " ")).as("__t"))
    val dl = tok.groupBy(idCol).agg(count(lit(1)).as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__nd"), sum("__dl").as("__tot"))
    val tf = tok.filter(col("__t").isin(terms: _*))
      .groupBy(idCol, "__t").agg(count(lit(1)).as("__tf"))
    // df from the tf table (one row per (doc, term)) — not a fourth
    // corpus scan+explode pass
    val dfq = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val avgdl = col("__tot").cast("double") / col("__nd").cast("double")
    val idf = log(lit(1.0) + (col("__nd").cast("double") - col("__df").cast("double") + 0.5)
      / (col("__df").cast("double") + 0.5))
    val s6 = floor((idf
      * (col("__tf").cast("double") * (k1 + 1.0))
      / (col("__tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl)))
      * 1000000 + 0.5).cast("long")
    val total = tf.join(broadcast(dfq), "__t")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), s6.as("__s6"))
      .groupBy(idCol).agg(sum("__s6").as("__s6"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s6").desc, col(idCol).asc)
    total.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), (col("__s6").cast("double") / 1000000).as("score"), col("rnk"))
  }

  /** Population Stability Index (generalizes q_dq_18_psi): `buckets`
    * quantile bins from the REFERENCE group's distribution, per-bucket
    * (p_ref − p_cur)·ln(p_ref/p_cur). Returns one row per populated
    * bucket — threshold the parts (or their sum, driver-side) in an
    * alerting rule; counts stay BIGINT, each part is one fixed IEEE
    * expression. Boundaries are a 1-row broadcast; assignment is a
    * per-row array scan (swap to width_bucket + approx boundaries at
    * 100 TB).
    */
  def psi(df: DataFrame, valueCol: String, groupCol: String,
      refGroup: String, curGroup: String, buckets: Int = 10): DataFrame = {
    val a = df.filter(col(groupCol) === refGroup).select(col(valueCol).as("__v"))
    val b = df.filter(col(groupCol) === curGroup).select(col(valueCol).as("__v"))
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = a.agg(
      expr(s"percentile(__v, array(${qs.mkString(", ")}))").as("__bounds"))
    val ab = a.withColumn("__ia", lit(1L)).unionAll(b.withColumn("__ia", lit(0L)))
    val g = ab.crossJoin(broadcast(bounds))
      .select((lit(1L) + size(filter(col("__bounds"), bv => col("__v") > bv)).cast("long")).as("bucket"),
        col("__ia"))
      .groupBy("bucket")
      .agg(sum("__ia").as("n_a"), (count(lit(1)) - sum("__ia")).as("n_b"))
    // totals via an unpartitioned window over g's ≤buckets rows —
    // re-aggregating g (or rescanning the source) would replay the
    // quantile + bucket-assign subtree (see q_dq_18_psi)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val pa = col("n_a").cast("double") / col("__ta").cast("double")
    val pb = col("n_b").cast("double") / col("__tb").cast("double")
    g.withColumn("__ta", sum("n_a").over(wAll))
      .withColumn("__tb", sum("n_b").over(wAll))
      .select(col("bucket"), col("n_a"), col("n_b"),
        ((pa - pb) * log(pa / pb)).as("psi_part"))
  }

  /** First-order Markov transition matrix (generalizes
    * q_stream_13_markov): P(next = b | current = a) over each key's
    * `stateCol` sequence ordered by `orderCols` (include a unique
    * tiebreaker column — without one, equal order keys make the
    * sequence, and thus the counts, nondeterministic). Row totals ride
    * the |states|²-bounded transition table as a window.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val tr = df
      .select(col(stateCol).as("a"), lead(col(stateCol), 1).over(w).as("b"))
      .filter(col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val wA = org.apache.spark.sql.expressions.Window.partitionBy("a")
    tr.withColumn("c_a", sum("c").over(wA))
      .select(col("a"), col("b"), col("c"), col("c_a"),
        (col("c").cast("double") / col("c_a").cast("double")).as("p"))
  }

  /** Weighted sampling without replacement (generalizes
    * q_scan_16_weighted_sample; Efraimidis–Spirakis A-ES): the `n` rows
    * with the largest key = ln(u)/w, where u ∈ (0,1] derives from the
    * deterministic multiplicative hash of `idCol` — reproducible across
    * runs, engines, and partitionings, unlike rand()-keyed sampling.
    * P(row selected) ∝ `weightCol`; rows with weight ≤ 0 (or null) are
    * excluded — a zero/negative A-ES weight has no sampling meaning and
    * would otherwise silently dominate or vanish. Ids are folded
    * through `pmod`, so negative ids hash correctly; note ids that
    * collide mod 1e9+7 share u (same limitation as q_text_13's split
    * hash) — pre-hash ids into [0, P) if the id space exceeds P. At
    * 100 TB swap the rank for the mergeable top-k aggregate (q_agg_23).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    val hv = pmod(pmod(col(idCol), lit(1000000007L)) * 2654435761L, lit(1000000007L))
    val key = log((hv + 1).cast("double") / 1000000008.0) / col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__key").desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__key", key)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__key", "__rn")
  }

  /** Welch's unequal-variance t-test (generalizes q_stat_8_welch):
    * t-statistic and Welch–Satterthwaite df between `groupA` and
    * `groupB`'s `valueCol` samples. Sufficient statistics are summed as
    * DOUBLE here (the generic form can't assume a quantization for
    * arbitrary value columns — the declared query shows the exact-cents
    * discipline); one map-side-combinable aggregate, t/df as a 1-row
    * projection.
    */
  def welchTTest(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val st = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n"), sum("__v").as("sv"), sum(col("__v") * col("__v")).as("sv2"))
    val p = st.agg(
      max(when(col("__g") === groupA, col("n"))).as("n1"),
      max(when(col("__g") === groupA, col("sv"))).as("sv1"),
      max(when(col("__g") === groupA, col("sv2"))).as("sq1"),
      max(when(col("__g") === groupB, col("n"))).as("n2"),
      max(when(col("__g") === groupB, col("sv"))).as("svb"),
      max(when(col("__g") === groupB, col("sv2"))).as("sq2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val e1 = (n1 * col("sq1") - col("sv1") * col("sv1")) / (n1 * (n1 - 1) * n1)
    val e2 = (n2 * col("sq2") - col("svb") * col("svb")) / (n2 * (n2 - 1) * n2)
    p.withColumn("__e1", e1).withColumn("__e2", e2)
      .select(col("n1"), col("n2"),
        ((col("sv1") / n1 - col("svb") / n2) / sqrt(col("__e1") + col("__e2"))).as("t"),
        ((col("__e1") + col("__e2")) * (col("__e1") + col("__e2"))
          / (col("__e1") * col("__e1") / (n1 - 1) + col("__e2") * col("__e2") / (n2 - 1))).as("df"))
  }

  /** Engine-exact Welch t-test: pre-quantizes `valueCol` to integer
    * units (`floor(v * scale + 0.5)`, scale=100 = cents) so the six
    * sufficient statistics are exact BIGINT sums on ANY engine or
    * partitioning, and t/df are emitted quantized to 1e-6 — the
    * deterministic path of the declared q_stat_8_welch, exposed as the
    * API default discipline. Use [[welchTTest]] only when no
    * quantization of the value domain is acceptable.
    * Σv² must stay within int64: |v·scale| up to ~3e9 rows at cents
    * scale (the declared query's bound analysis).
    */
  def welchTTestQuantized(df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, scale: Long = 100L): DataFrame = {
    val st = df.filter(col(groupCol).isin(groupA, groupB))
      .select(col(groupCol).as("__g"),
        floor(col(valueCol) * scale + 0.5).cast("long").as("__v"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n"), sum("__v").as("sv"), sum(col("__v") * col("__v")).as("sv2"))
    val p = st.agg(
      max(when(col("__g") === groupA, col("n"))).as("n1"),
      max(when(col("__g") === groupA, col("sv"))).as("sv1"),
      max(when(col("__g") === groupA, col("sv2"))).as("sq1"),
      max(when(col("__g") === groupB, col("n"))).as("n2"),
      max(when(col("__g") === groupB, col("sv"))).as("svb"),
      max(when(col("__g") === groupB, col("sv2"))).as("sq2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val e1 = (n1 * col("sq1").cast("double") - col("sv1").cast("double") * col("sv1").cast("double")) / (n1 * (n1 - 1) * n1)
    val e2 = (n2 * col("sq2").cast("double") - col("svb").cast("double") * col("svb").cast("double")) / (n2 * (n2 - 1) * n2)
    p.withColumn("__e1", e1).withColumn("__e2", e2)
      .select(col("n1"), col("n2"),
        (floor((col("sv1").cast("double") / n1 - col("svb").cast("double") / n2)
          / sqrt(col("__e1") + col("__e2")) * 1000000 + 0.5) / 1000000).as("t"),
        (floor((col("__e1") + col("__e2")) * (col("__e1") + col("__e2"))
          / (col("__e1") * col("__e1") / (n1 - 1) + col("__e2") * col("__e2") / (n2 - 1)) * 1000000 + 0.5) / 1000000).as("df"))
  }

  /** Engine-exact winsorized mean: clamp values are pre-quantized to
    * integer units (`scale`=100 = cents) BEFORE summation, so the group
    * sum is an exact BIGINT and the emitted mean (rounded to 2 dp of
    * the original unit) is deterministic under any partitioning — the
    * declared q_agg_32_winsorize discipline as the API default. The
    * exact-percentile pass is the only wide exchange; its per-group
    * boundary table broadcasts back. Use [[winsorizedMean]] only when
    * the value domain has no natural quantization.
    */
  def winsorizedMeanQuantized(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95, scale: Long = 100L): DataFrame = {
    val p = df.groupBy(groupCol).agg(
      expr(s"percentile($valueCol, $lo)").as("__plo"),
      expr(s"percentile($valueCol, $hi)").as("__phi"))
    val q = when(col(valueCol) < col("__plo"), floor(col("__plo") * scale + 0.5).cast("long"))
      .when(col(valueCol) > col("__phi"), floor(col("__phi") * scale + 0.5).cast("long"))
      .otherwise(floor(col(valueCol) * scale + 0.5).cast("long"))
    df.join(broadcast(p), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        round(sum(q).cast("double") / (count(lit(1)).cast("double") * scale), 2)
          .as("winsor_mean"))
  }

  /** nDCG@k per query group (generalizes q_ret_1_ndcg): rank by
    * `scoreCol` DESC with `idCol` tiebreak, binary relevance from
    * `relCol` (boolean). Discount weights 1/log₂(r+1) are quantized at
    * plan-build time (no runtime transcendental — the declared query's
    * cross-engine-determinism trick, kept here for replayability).
    * Groups with no relevant rows report ndcg 0.
    */
  def ndcgAtK(df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
      relCol: String, k: Int = 10): DataFrame = {
    val w = (1 to k).map(r => math.floor(1e6 * math.log(2) / math.log(r + 1.0) + 0.5).toLong)
    val wArr = array(w.map(lit): _*)
    val byRank = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol).desc, col(idCol))
    val byIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__rel").desc, col("__rn"))
    df.select(col(groupCol), when(col(relCol), 1).otherwise(0).as("__rel"),
        row_number().over(byRank).cast("long").as("__rn"))
      .withColumn("__irn", row_number().over(byIdeal).cast("long"))
      .groupBy(groupCol)
      .agg(
        sum(when(col("__rel") === 1 && col("__rn") <= k,
          element_at(wArr, col("__rn").cast("int"))).otherwise(0L)).as("__dcgq"),
        sum(when(col("__rel") === 1 && col("__irn") <= k,
          element_at(wArr, col("__irn").cast("int"))).otherwise(0L)).as("__idcgq"),
        count(lit(1)).as("n"), sum("__rel").cast("long").as("n_rel"))
      .select(col(groupCol), col("n"), col("n_rel"),
        when(col("__idcgq") > 0,
          graft.functions.Num.round(
            col("__dcgq").cast("double") / col("__idcgq").cast("double"), 6))
          .otherwise(0.0).as("ndcg"))
  }

  /** Deterministic k-fold assignment (generalizes q_ml_1_kfold):
    * appends `fold` ∈ [0, k) as a pure function of the stable id —
    * the q_text_13/deterministicSplit hash chain, so membership is
    * engine/partitioning/run-independent and stable under corpus growth.
    */
  def kfold(df: DataFrame, idCol: String, k: Int = 5): DataFrame =
    df.withColumn("fold",
      (pmod(col(idCol), lit(1000000007L)) * 2654435761L) % 1000000007L % k)

  /** Per-group document cap (generalizes q_text_29_source_caps): keep
    * the top `cap` rows per `groupCol` by (`qualityCol` DESC, `idCol`)
    * — the "max N pages per domain" rule. Returns the kept rows; the
    * rank filter sits directly on the window so WindowGroupLimit prunes
    * past the cap inside each partition.
    */
  def capPerGroup(df: DataFrame, groupCol: String, qualityCol: String,
      idCol: String, cap: Int): DataFrame = {
    val byRank = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(qualityCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(byRank))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Last-touch attribution (generalizes q_stream_17_attribution):
    * credit each `convType` event to the actor's most recent preceding
    * event of a different type via one `last(..., ignoreNulls)`
    * carry-forward window — no predecessor self-join. Returns
    * (channel, n, share, mean_gap_min) with an explicit 'none' bucket.
    * Gap sums ride as exact BIGINT microseconds.
    */
  def lastTouchAttribution(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = df.select(col(userCol), col(tsCol), col(typeCol), col(idCol),
      last(when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true)
        .over(w).as("__src_type"),
      last(when(col(typeCol) =!= convType, unix_micros(col(tsCol))), ignoreNulls = true)
        .over(w).as("__src_us"))
    val p = e.filter(col(typeCol) === convType)
      .select(coalesce(col("__src_type"), lit("none")).as("channel"),
        when(col("__src_us").isNotNull, unix_micros(col(tsCol)) - col("__src_us")).as("__gap_us"))
    val g = p.groupBy("channel").agg(count(lit(1)).as("n"),
      sum("__gap_us").cast("long").as("__gsum"), count("__gap_us").as("__gn"))
    g.withColumn("__tot", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("channel"), col("n"),
        graft.functions.Num.round(col("n").cast("double") / col("__tot"), 6).as("share"),
        when(col("__gn") > 0,
          graft.functions.Num.round(col("__gsum").cast("double") / col("__gn") / 60000000L, 2))
          .otherwise(0.0).as("mean_gap_min"))
  }

  /** DAU / trailing-7-day WAU / stickiness per day (generalizes
    * q_stream_20_dau_wau). WAU uses the contribution-explode reshape:
    * each (user, day) feeds the 7 days it keeps the user weekly-active
    * — O(7·|user-days|) linear, no windowed COUNT DISTINCT and no
    * days×users join. Warm-up days (first 6) are excluded.
    */
  def dauWau(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ud = df.select(col(userCol).as("__u"),
      expr(s"unix_micros($tsCol) div 86400000000").as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud.select(col("__u"), explode(sequence(col("day"), col("day") + 6)).as("__wday"))
      .distinct()
      .groupBy(col("__wday").as("day")).agg(count(lit(1)).as("wau"))
    val d0 = ud.agg(min("day").as("__d0"))
    dau.join(wau, "day").crossJoin(broadcast(d0))
      .filter(col("day") >= col("__d0") + 6)
      .select(col("day").cast("long").as("day"), col("dau"), col("wau"),
        graft.functions.Num.round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** Bollinger bands over a per-period integer series (generalizes
    * q_win_12_bollinger): rolling mean ± k·(rolling sample std) with an
    * outside flag, from exact BIGINT window sums of `valueCol` and its
    * square. `unitDiv` converts the integer unit to the emitted scale
    * (100 for cents→dollars). Warm-up rows (fewer than `window`
    * periods) are excluded.
    */
  def bollingerBands(daily: DataFrame, dayCol: String, valueCol: String,
      window: Int = 7, k: Double = 2.0, unitDiv: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.orderBy(dayCol).rowsBetween(-(window - 1), 0)
    val w = daily.select(col(dayCol), col(valueCol),
      count(lit(1)).over(win).as("__k"),
      sum(valueCol).over(win).as("__s"),
      sum(col(valueCol) * col(valueCol)).over(win).as("__ss"))
    val mean = col("__s").cast("double") / col("__k")
    val band = lit(k) * sqrt((col("__k").cast("double") * col("__ss")
      - col("__s").cast("double") * col("__s"))
      / (col("__k").cast("double") * col("__k") * (col("__k") - 1)))
    w.filter(col("__k") === window)
      .select(col(dayCol).cast("long").as(dayCol),
        graft.functions.Num.round(col(valueCol).cast("double") / unitDiv, 2).as("daily_value"),
        graft.functions.Num.round(mean / unitDiv, 2).as("mid"),
        graft.functions.Num.round((mean - band) / unitDiv, 2).as("lower_band"),
        graft.functions.Num.round((mean + band) / unitDiv, 2).as("upper_band"),
        when(col(valueCol).cast("double") < mean - band
          || col(valueCol).cast("double") > mean + band, 1L).otherwise(0L).as("outside"))
  }

  /** Maximum drawdown of a per-period integer net series (generalizes
    * q_win_13_drawdown): cumulative sum, running peak (two stacked
    * exact-BIGINT prefix windows), and the deepest peak-minus-current
    * with earliest-period tiebreak. One-row result.
    */
  def maxDrawdown(daily: DataFrame, dayCol: String, netCol: String,
      unitDiv: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prefix = Window.orderBy(dayCol).rowsBetween(Window.unboundedPreceding, 0)
    val r = daily
      .withColumn("__cum", sum(netCol).over(prefix))
      .withColumn("__peak", max("__cum").over(prefix))
    val x = r.withColumn("__dd", col("__peak") - col("__cum"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__dd").desc, col(dayCol))))
      .withColumn("__nd", count(lit(1)).over(Window.partitionBy()))
    x.filter(col("__rn") === 1)
      .select(col(dayCol).cast("long").as("trough_day"), col("__nd").as("n_days"),
        graft.functions.Num.round(col("__cum").cast("double") / unitDiv, 2).as("cum_at_trough"),
        graft.functions.Num.round(col("__peak").cast("double") / unitDiv, 2).as("peak_before"),
        graft.functions.Num.round(col("__dd").cast("double") / unitDiv, 2).as("max_drawdown"),
        graft.functions.Num.round(col("__dd").cast("double") / col("__peak"), 6).as("dd_frac"))
  }

  /** Herfindahl–Hirschman concentration of `valueCol` over `keyCol`
    * within each `groupCol` (generalizes q_agg_34_hhi): HHI = Σ(sᵢ/S)²
    * plus the top-key share. Pure rational off exact integer values;
    * per-key squares accumulate in DECIMAL(38,0). Returns
    * (group, n_keys, total, hhi, top_share).
    */
  def hhi(df: DataFrame, groupCol: String, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val su = df.groupBy(col(groupCol), col(keyCol)).agg(sum(valueCol).as("__s"))
    su.groupBy(groupCol).agg(count(lit(1)).as("n_keys"), sum("__s").as("total"),
        sum(col("__s").cast(DecimalType(38, 0)) * col("__s")).as("__sumsq"),
        max("__s").as("__mx"))
      .select(col(groupCol), col("n_keys"), col("total"),
        graft.functions.Num.round(col("__sumsq").cast("double")
          / (col("total").cast("double") * col("total").cast("double")), 6).as("hhi"),
        graft.functions.Num.round(col("__mx").cast("double") / col("total"), 6).as("top_share"))
  }

  /** Lorenz curve of `valueCol` by `buckets` quantile buckets
    * (generalizes q_agg_35_lorenz): per-bucket share and cumulative
    * share, engine-deterministic ntile over the total (value, id)
    * order. The curve whose area deficit is the Gini coefficient.
    */
  def lorenzCurve(df: DataFrame, idCol: String, valueCol: String,
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ntile via the range-partitioned exact rank — identical bucket
    // assignment to the builtin, no single-partition window; the total
    // row count comes free off the rank helper's histogram pass (no
    // separate df.count() scan)
    val (n, ranked) = exactGlobalRankByN(df.select(col(valueCol), col(idCol)),
      Seq(col(valueCol), col(idCol)), "__rk")
    val b = ranked.select(col(valueCol), ntileOfRank(col("__rk"), n, buckets).as("decile"))
    val g = b.groupBy("decile").agg(count(lit(1)).as("n"), sum(valueCol).as("__s"))
    g.withColumn("__cum", sum("__s").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum("__s").over(Window.partitionBy()))
      .select(col("decile"), col("n"),
        graft.functions.Num.round(col("__s").cast("double") / col("__tot"), 6).as("share"),
        graft.functions.Num.round(col("__cum").cast("double") / col("__tot"), 6).as("cum_share"))
  }

  /** Cohen's d + Hedges' g between two groups of an integer value
    * column (generalizes q_stat_19_cohen_d): pooled-std effect size
    * from one-scan exact (n, Σ, Σ²) per group; `unitDiv` scales the
    * emitted means. Returns (n1, n0, mean_1, mean_0, cohen_d, hedges_g).
    */
  def effectSize(df: DataFrame, valueCol: String, groupCol: String,
      g1: String, g0: String, unitDiv: Double = 100.0): DataFrame = {
    val e = df.filter(col(groupCol).isin(g1, g0))
      .select(col(groupCol), col(valueCol).as("__x"))
    val g = e.groupBy(groupCol).agg(count(lit(1)).as("__n"), sum("__x").as("__s"),
      sum(col("__x") * col("__x")).as("__ss"))
    val p = g.agg(
      max(when(col(groupCol) === g1, col("__n"))).as("n1"),
      max(when(col(groupCol) === g1, col("__s"))).as("s1"),
      max(when(col(groupCol) === g1, col("__ss"))).as("ss1"),
      max(when(col(groupCol) === g0, col("__n"))).as("n0"),
      max(when(col(groupCol) === g0, col("__s"))).as("s0"),
      max(when(col(groupCol) === g0, col("__ss"))).as("ss0"))
    val m1 = col("s1").cast("double") / col("n1")
    val m0 = col("s0").cast("double") / col("n0")
    val pooled = sqrt(((col("ss1").cast("double") - col("s1").cast("double") * col("s1") / col("n1"))
      + (col("ss0").cast("double") - col("s0").cast("double") * col("s0") / col("n0")))
      / (col("n1") + col("n0") - 2))
    val dEff = (m1 - m0) / pooled
    p.select(col("n1"), col("n0"),
      graft.functions.Num.round(m1 / unitDiv, 2).as("mean_1"),
      graft.functions.Num.round(m0 / unitDiv, 2).as("mean_0"),
      graft.functions.Num.round(dEff, 6).as("cohen_d"),
      graft.functions.Num.round(dEff * (lit(1) - lit(3.0)
        / (lit(4.0) * (col("n1") + col("n0")) - 9)), 6).as("hedges_g"))
  }

  /** Per-label cosine between the centroids of two deterministic halves
    * of a vector set (generalizes q_sim_20_centroid_shift) — the
    * batch-over-batch embedding-drift check. The per-half mean
    * normalizations cancel in the cosine, so it is computed entirely
    * from exact integer sums of 1e-6-quantized components (products in
    * DECIMAL(38,0)). Returns (label, n_a, n_b, centroid_cosine).
    */
  def centroidShift(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val h = df.select(col(idCol), col(labelCol).as("label"), col(vecCol).as("__v"),
      (col(idCol) % 1000000007L * 2654435761L % 1000000007L % 2).as("__half"))
    val x = h.select(col("label"), col("__half"),
        posexplode(col("__v")).as(Seq("__dim", "__c")))
      .select(col("label"), col("__half"), col("__dim"),
        floor(col("__c").cast("double") * 1000000L + 0.5).cast("long").as("__q"))
    val c = x.groupBy("label", "__dim").agg(
      sum(when(col("__half") === 0, col("__q")).otherwise(0L)).as("__sa"),
      sum(when(col("__half") === 1, col("__q")).otherwise(0L)).as("__sb"))
    val n = h.groupBy("label").agg(
      sum(when(col("__half") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__half") === 1, 1L).otherwise(0L)).as("n_b"))
    val dd = c.groupBy("label").agg(
      sum(col("__sa").cast(DecimalType(38, 0)) * col("__sb")).as("__dot"),
      sum(col("__sa").cast(DecimalType(38, 0)) * col("__sa")).as("__qa"),
      sum(col("__sb").cast(DecimalType(38, 0)) * col("__sb")).as("__qb"))
    dd.join(n, "label")
      .select(col("label").cast("long").as("label"), col("n_a"), col("n_b"),
        graft.functions.Num.round(col("__dot").cast("double")
          / (sqrt(col("__qa").cast("double")) * sqrt(col("__qb").cast("double"))), 6)
          .as("centroid_cosine"))
  }

  /** Winsorized mean per group (generalizes q_agg_32_winsorize): clamp
    * `valueCol` into [p_lo, p_hi] exact percentiles and average. Keeps
    * tail rows at the boundary (contrast a trimmed mean, which drops
    * them); the percentile pass is the only wide exchange and its
    * per-group boundary table broadcasts back.
    *
    * Precision contract (like [[welchTTest]], unlike the declared
    * query): this generic form averages raw doubles, an IEEE sum whose
    * low bits depend on partition/merge order — NOT engine-exact.
    * q_agg_32 itself pre-quantizes to cents and can differ from this
    * convenience by up to one cent; pre-quantize `valueCol` yourself
    * if you need deterministic output.
    */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val p = df.groupBy(groupCol).agg(
      expr(s"percentile($valueCol, $lo)").as("__plo"),
      expr(s"percentile($valueCol, $hi)").as("__phi"))
    df.join(broadcast(p), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        avg(when(col(valueCol) < col("__plo"), col("__plo"))
          .when(col(valueCol) > col("__phi"), col("__phi"))
          .otherwise(col(valueCol))).as("winsor_mean"))
  }

  /** RFM quintile segmentation (generalizes q_stream_27_rfm): per-id
    * recency/frequency/monetary scores by exact ntile over exact
    * integers (`tsCol` in micros, `valueCol` pre-quantized) with the id
    * as tie-break, then segment populations. Score 1 = best.
    *
    * Stays distributed at any id cardinality: each score is a
    * range-partitioned sort + per-partition zipWithIndex (global rank =
    * partition offset + local index — the partition-count prefix sum is
    * the only driver-side state), then the ntile bucket is computed
    * arithmetically from the 0-based rank. Identical output to
    * `ntile(q) OVER (ORDER BY key DESC, id)` without funnelling every
    * distinct id through one window partition.
    */
  def rfmSegments(df: DataFrame, idCol: String, tsCol: String, valueCol: String,
      quantiles: Int = 5): DataFrame = {
    val u = df.groupBy(idCol).agg(max(tsCol).as("__last"),
      count(lit(1)).as("__freq"), sum(valueCol).as("__mon"))
      .localCheckpoint()
    // exact ntile(q) per axis off the shared range-partitioned rank
    // machinery (exactGlobalRankByN — n rides the count pass, ranks
    // never cross one task); ntileOfRank is the builtin-identical
    // bucket assignment
    val (n, lastRank) = exactGlobalRankByN(u.select(col(idCol), col("__last")),
      Seq(col("__last").desc, col(idCol)), "__rk")
    def score(ranked: DataFrame, out: String): DataFrame =
      ranked.select(col(idCol), ntileOfRank(col("__rk"), n, quantiles).as(out))
    def rankOf(keyCol: String): DataFrame =
      exactGlobalRankBy(u.select(col(idCol), col(keyCol)),
        Seq(col(keyCol).desc, col(idCol)), "__rk")
    score(lastRank, "r")
      .join(score(rankOf("__freq"), "f"), idCol)
      .join(score(rankOf("__mon"), "m"), idCol)
      .groupBy(col("r").cast("long").as("r"), col("f").cast("long").as("f"),
        col("m").cast("long").as("m"))
      .agg(count(lit(1)).as("n"))
      .orderBy("r", "f", "m")
  }

  /** HITS hubs/authorities (generalizes q_graph_13_hits) with a
    * CONFIGURABLE iteration count — the declared query unrolls 2. Each
    * half-step L1-normalizes through an exact integer-sum ratio
    * quantized to 1e-6 (so every iteration consumes exact integers);
    * iteration-invariant edges localCheckpoint once. Returns
    * (node, authority, hub) for every node with an authority score.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct().localCheckpoint()
    def l1(df: DataFrame): DataFrame = {
      val tot = df.agg(sum("__v").as("__tot"))
      df.crossJoin(broadcast(tot))
        .select(col("__n"),
          floor(col("__v").cast("double") / col("__tot") * 1000000 + 0.5).cast("long").as("__v"))
    }
    // Score tables are node-scaled — never force-broadcast them (hard
    // failure at 10⁸⁺ nodes); AQE picks broadcast vs shuffle per join.
    var hub = l1(e.groupBy(col("__src").as("__n")).agg(count(lit(1)).as("__v")))
    var auth = l1(e.join(hub, col("__src") === col("__n"))
      .groupBy(col("__dst").as("__n2")).agg(sum("__v").as("__v"))
      .withColumnRenamed("__n2", "__n"))
    for (_ <- 2 to iters) {
      hub = l1(e.join(auth, col("__dst") === col("__n"))
        .groupBy(col("__src").as("__n2")).agg(sum("__v").as("__v"))
        .withColumnRenamed("__n2", "__n")).localCheckpoint()
      auth = l1(e.join(hub, col("__src") === col("__n"))
        .groupBy(col("__dst").as("__n2")).agg(sum("__v").as("__v"))
        .withColumnRenamed("__n2", "__n")).localCheckpoint()
    }
    auth.select(col("__n").as("node"), (col("__v") / 1000000.0).as("authority"))
      .join(hub.select(col("__n").as("__hn"), (col("__v") / 1000000.0).as("hub")),
        col("node") === col("__hn"), "left_outer")
      .select(col("node"), col("authority"), coalesce(col("hub"), lit(0.0)).as("hub"))
  }

  /** k-core: the maximal subgraph where every node has degree >= k
    * (generalizes q_graph_12_kcore, which reports a fixed 3-round peel
    * trajectory — this peels to the FIXPOINT). Pure integer set
    * algebra: degree-filter -> semi-join both endpoints per round, the
    * surviving edge list localCheckpointed between rounds. Throws if
    * the peel hasn't converged within `maxIters` (degeneracy peels
    * remove >= 1 node per round, so |V| rounds always suffice).
    * Returns the surviving undirected edge list (both directions).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100): DataFrame = {
    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct()
    var cur = e0.union(e0.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct().localCheckpoint()
    var n = cur.count()
    var it = 0
    var converged = false
    while (!converged) {
      it += 1
      if (it > maxIters)
        throw new IllegalStateException(s"kCore($k) did not converge in $maxIters peels")
      val keep = cur.groupBy(col("__src").as("__node")).agg(count(lit(1)).as("__dg"))
        .filter(col("__dg") >= k).select("__node")
      // keep is node-scaled — no broadcast hint (AQE sizes the semi-joins)
      val next = cur
        .join(keep, col("__src") === col("__node"), "left_semi")
        .join(keep.withColumnRenamed("__node", "__node2"),
          col("__dst") === col("__node2"), "left_semi")
        .localCheckpoint()
      val n2 = next.count()
      if (n2 == n) converged = true
      cur = next
      n = n2
    }
    cur.select(col("__src").as(srcCol), col("__dst").as(dstCol))
  }

  /** Deterministic half-sample bootstrap CI for the mean of an exact
    * integer column (generalizes q_stat_28_bootstrap_ci): `replicates`
    * resample means, membership by the overflow-safe multiplicative
    * hash salted with the replicate id (no RNG — reproducible on any
    * partitioning), CI = the (lo, hi) order statistics of the replicate
    * means. Returns one row (mean, ci_lo, ci_hi) in integer units.
    */
  def bootstrapMeanCI(df: DataFrame, idCol: String, valueCol: String,
      replicates: Int = 32, loRank: Int = 2, hiRank: Int = 31): DataFrame = {
    require(loRank >= 1 && hiRank <= replicates && loRank < hiRank,
      s"ranks ($loRank, $hiRank) must sit inside 1..$replicates")
    val P = 1000000007L
    val o = df.select(col(idCol).as("__id"), col(valueCol).as("__v")).localCheckpoint()
    val reps = o.withColumn("__b", explode(expr(s"sequence(1, $replicates)")))
      .filter(((col("__id") + col("__b") * 131) % P) * 2654435761L % P < P / 2)
      .groupBy("__b").agg(count(lit(1)).as("__n"), sum("__v").as("__s"))
    val means = reps.select(floor(col("__s").cast("double") / col("__n") + 0.5)
      .cast("long").as("__m"))
    val srt = means.agg(sort_array(collect_list("__m")).as("__ms"))
    val pt = o.agg((sum("__v").cast("double") / count(lit(1))).as("mean"))
    pt.crossJoin(broadcast(srt))
      // loud-failure contract: a replicate that selects zero rows
      // produces no group, so the means array shrinks and element_at
      // would yield a silent null ci bound (or throw under ANSI).
      // assert_true inside the filter can't be pruned by the optimizer.
      .filter(assert_true(size(col("__ms")) === replicates,
        concat(lit(s"bootstrapMeanCI: expected $replicates replicate means, got "),
          size(col("__ms")),
          lit(" — at least one replicate selected zero rows"))).isNull)
      .select(col("mean"),
        element_at(col("__ms"), loRank).cast("double").as("ci_lo"),
        element_at(col("__ms"), hiRank).cast("double").as("ci_hi"))
  }

  /** MACD over a per-period integer series (generalizes q_win_19_macd):
    * fast/slow EMAs fold the same materialized prefix list in frame
    * order; the MACD series re-quantizes to 1e-6 of the emitted unit
    * BEFORE the signal fold so the second recursion is deterministic.
    * Returns (period, macd, signal, histogram) for ALL periods.
    */
  def macd(daily: DataFrame, dayCol: String, valueCol: String,
      fast: Int = 12, slow: Int = 26, signalSpan: Int = 9,
      unitDiv: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(dayCol).rowsBetween(Window.unboundedPreceding, 0)
    def ema(vals: org.apache.spark.sql.Column, alpha: org.apache.spark.sql.Column) =
      aggregate(slice(vals, lit(2), size(vals) - 1), element_at(vals, 1),
        (a, x) => (lit(1) - alpha) * a + alpha * x)
    val m = daily
      .select(col(dayCol), collect_list(col(valueCol).cast("double")).over(w).as("__vals"))
      .select(col(dayCol),
        floor((ema(col("__vals"), lit(2.0) / (fast + 1)) - ema(col("__vals"), lit(2.0) / (slow + 1)))
          / unitDiv * 1000000 + 0.5).cast("long").as("__macd6"))
    val sig = m.select(col(dayCol), col("__macd6"),
      collect_list(col("__macd6").cast("double") / 1000000).over(w).as("__ms"))
    sig.select(col(dayCol).cast("long").as(dayCol),
      (col("__macd6") / 1000000.0).as("macd"),
      (floor(aggregate(slice(col("__ms"), lit(2), size(col("__ms")) - 1),
        element_at(col("__ms"), 1),
        (a, x) => (lit(1) - lit(2.0) / (signalSpan + 1)) * a + lit(2.0) / (signalSpan + 1) * x)
        * 10000 + 0.5).cast("long") / 10000.0).as("signal"))
      .withColumn("histogram",
        graft.functions.Num.round(col("macd") - col("signal"), 4))
  }

  /** Benjamini–Hochberg step-up over ANY p-value table (generalizes
    * q_stat_25_bh_fdr): ranks ascending p (id tie-break), rejects the
    * prefix up to the largest k with p_(k) <= k·alpha/m — evaluated as
    * the exact integer comparison p6·denom <= k·1e6·num where
    * alpha = num/denom. Returns (id, p, k, rejected).
    */
  def benjaminiHochberg(df: DataFrame, idCol: String, pCol: String,
      alphaNum: Int = 1, alphaDenom: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = df.count()
    // ascending-p rank via the range-partitioned exact rank — no
    // single-partition window even when the p-value table is large
    val rk = exactGlobalRank(
      df.select(col(idCol), col(pCol),
        floor(col(pCol) * 1000000 + 0.5).cast("long").as("__p6")),
      Seq("__p6", idCol), "__k")
    val km = rk.agg(max(when(
      col("__p6") * m * alphaDenom <= col("__k").cast("long") * 1000000L * alphaNum,
      col("__k")).otherwise(0)).as("__kmax"))
    rk.crossJoin(broadcast(km))
      .select(col(idCol), col(pCol), col("__k").cast("long").as("k"),
        when(col("__k") <= col("__kmax"), 1L).otherwise(0L).as("rejected"))
      .orderBy("k")
  }

  /** Frequency-weighted mean/variance of `valueCol` with integer
    * weights (generalizes q_agg_38_weighted_var): three exact BIGINT
    * weighted power sums, single IEEE expressions out.
    */
  def weightedVariance(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    val m = df.groupBy(groupCol)
      .agg(sum(weightCol).as("__ws"),
        sum(col(weightCol) * col(valueCol)).as("__swx"),
        sum(col(weightCol) * col(valueCol) * col(valueCol)).as("__swxx"))
    val mean = col("__swx").cast("double") / col("__ws")
    m.select(col(groupCol),
      graft.functions.Num.round(mean, 4).as("w_mean"),
      graft.functions.Num.round(col("__swxx").cast("double") / col("__ws") - mean * mean, 4)
        .as("w_var"))
  }

  /** Duplicate-downweighting (generalizes q_dedup_20_soft_weight):
    * every row keeps weight floor(1e6/k) where k = its exact-dup
    * cluster size on `textCol`'s digest — the training-mix alternative
    * to dropping duplicates. Returns the input plus (w6, cluster_size);
    * Σ w6/1e6 is the effective corpus size.
    */
  def softDedupWeights(df: DataFrame, textCol: String): DataFrame = {
    val withDigest = df.withColumn("__dg", md5(col(textCol)))
    val k = withDigest.groupBy("__dg").agg(count(lit(1)).as("cluster_size"))
    withDigest.join(k, Seq("__dg"))
      .withColumn("w6", (lit(1000000L) / col("cluster_size")).cast("long"))
      .drop("__dg")
  }

  /** FK containment (generalizes one row of q_dq_28_inclusion): the
    * share of `fact`'s distinct `fkCol` values present in `dim`'s
    * `keyCol`. Distinct-count + left_semi against the broadcast
    * dimension key; one row (n_distinct, n_contained, containment).
    */
  def containment(fact: DataFrame, fkCol: String, dim: DataFrame, keyCol: String): DataFrame = {
    val f = fact.select(col(fkCol)).distinct().localCheckpoint()
    val c = f.join(broadcast(dim.select(col(keyCol))), col(fkCol) === col(keyCol), "left_semi")
    f.agg(count(lit(1)).as("n_distinct"))
      .crossJoin(c.agg(count(lit(1)).as("n_contained")))
      .select(col("n_distinct"), col("n_contained"),
        graft.functions.Num.round(
          col("n_contained").cast("double") / col("n_distinct"), 6).as("containment"))
  }

  /** Pareto concentration (generalizes q_win_25_pareto): per group, the
    * smallest number of ids covering `num/denom` of the total integer
    * `valueCol` — the crossing decided by the exact integer comparison
    * denom·cum >= num·tot. Returns (group, n_ids, top_n, id_share).
    */
  def pareto(df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      num: Int = 4, denom: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(num > 0 && denom > 0 && num < denom, s"fraction $num/$denom must sit in (0, 1)")
    val per = df.groupBy(col(groupCol), col(idCol)).agg(sum(valueCol).as("__v"))
    val wOrd = Window.partitionBy(groupCol).orderBy(col("__v").desc, col(idCol))
    val wAll = Window.partitionBy(groupCol)
    val rk = per.select(col(groupCol),
      sum("__v").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)).as("__cum"),
      sum("__v").over(wAll).as("__tot"),
      row_number().over(wOrd).as("__rn"),
      count(lit(1)).over(wAll).as("__n"))
    rk.groupBy(groupCol)
      .agg(min("__n").as("n_ids"),
        min(when(lit(denom) * col("__cum") >= lit(num) * col("__tot"), col("__rn")))
          .cast("long").as("top_n"),
        graft.functions.Num.round(
          min(when(lit(denom) * col("__cum") >= lit(num) * col("__tot"), col("__rn")))
            .cast("double") / min("__n"), 6).as("id_share"))
  }

  /** Ratio-to-parent (generalizes q_agg_40_share_of_parent): per
    * (parent, child), the integer `valueCol` total plus its share of
    * the parent and of the grand total — both derived from the
    * aggregate via window sums, never re-scanning the input.
    */
  def shareOfParent(df: DataFrame, parentCol: String, childCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = df.groupBy(col(parentCol), col(childCol)).agg(sum(valueCol).as("__v"))
    agg.select(col(parentCol), col(childCol), col("__v").as("total"),
      graft.functions.Num.round(col("__v").cast("double")
        / sum("__v").over(Window.partitionBy(parentCol)), 6).as("share_of_parent"),
      graft.functions.Num.round(col("__v").cast("double")
        / sum("__v").over(Window.partitionBy()), 6).as("share_of_total"))
  }

  /** Moving-average crossovers (generalizes q_time_18_sma_cross): days
    * where SMA(fast) crosses SMA(slow) on an integer series, the sign
    * decided by the exact integer slow·sFast − fast·sSlow (the LCM
    * form). direction +1 = golden cross (fast moves above slow).
    */
  def smaCrossovers(daily: DataFrame, dayCol: String, valueCol: String,
      fast: Int = 5, slow: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fast < slow, s"fast ($fast) must be shorter than slow ($slow)")
    val wf = Window.orderBy(dayCol).rowsBetween(-(fast - 1), 0)
    val ws = Window.orderBy(dayCol).rowsBetween(-(slow - 1), 0)
    val w = daily.select(col(dayCol),
      sum(valueCol).over(wf).as("__sf"), count(lit(1)).over(wf).as("__kf"),
      sum(valueCol).over(ws).as("__ss"), count(lit(1)).over(ws).as("__ks"))
    val sig = w.filter(col("__kf") === fast && col("__ks") === slow)
      .select(col(dayCol),
        (lit(slow) * col("__sf") - lit(fast) * col("__ss")).as("__diff"))
      .withColumn("__prev", lag("__diff", 1).over(Window.orderBy(dayCol)))
    sig.filter((col("__prev") <= 0 && col("__diff") > 0)
        || (col("__prev") > 0 && col("__diff") <= 0))
      .select(col(dayCol).cast("long").as(dayCol),
        when(col("__prev") <= 0 && col("__diff") > 0, 1L).otherwise(-1L).as("direction"))
  }

  /** Day-offset retention (generalizes q_stream_32_retention_curve):
    * for each offset k, the count of ids active exactly k days after
    * their first day. Activity dedups once; each probe is one semi
    * join. Returns (offset, n_ids, n_retained, rate).
    */
  def retentionCurve(df: DataFrame, idCol: String, tsCol: String,
      offsets: Seq[Int] = Seq(1, 7, 30)): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0), "offsets must be positive")
    val ud = df.select(col(idCol), (col(tsCol) / 86400000000L).cast("long").as("__day"))
      .distinct().localCheckpoint()
    val f = ud.groupBy(idCol).agg(min("__day").as("__d0")).localCheckpoint()
    val base = f.count()
    offsets.map { k =>
      val probe = ud.select(col(idCol).as("__pid"), col("__day").as("__pday"))
      val retained = f.join(probe, col(idCol) === col("__pid")
          && col("__pday") === col("__d0") + k, "left_semi")
        .count()
      (k.toLong, base, retained,
        math.floor(retained.toDouble / base * 1e6 + 0.5) / 1e6)
    }.foldLeft(Option.empty[DataFrame]) { (acc, row) =>
      val one = df.sparkSession.createDataFrame(Seq(row))
        .toDF("offset", "n_ids", "n_retained", "rate")
      Some(acc.map(_.union(one)).getOrElse(one))
    }.get
  }

  /** Exact distinct via fixed-width bitmaps (generalizes
    * q_agg_42_bitmap_distinct): non-negative integer `idCol` values
    * pack into 63-bit words keyed (group, id div 63), OR-aggregated
    * and popcount-summed. Per-group state is |domain|/63 words
    * regardless of row count and fully map-side combinable — use when
    * the id domain is bounded (count(DISTINCT) shuffles every value).
    */
  def bitmapDistinct(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.select(col(groupCol),
        expr(s"$idCol div 63").as("__wd"),
        expr(s"shiftleft(cast(1 as bigint), cast($idCol % 63 as int))").as("__mask"))
      .groupBy(groupCol, "__wd")
      .agg(expr("bit_or(__mask)").as("__bits"))
      .groupBy(groupCol)
      .agg(sum(bit_count(col("__bits")).cast("long")).as("n_distinct"))

  /** Durbin–Watson statistic of the OLS residual walk over an integer
    * series (generalizes q_stat_31): fits y ~ a + b·x from five exact
    * integer sums, quantizes residuals to 1e-3 and differences them
    * under one lag window. Returns (n, slope, dw); dw << 2 means the
    * series' trend residuals are positively autocorrelated.
    */
  def durbinWatson(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dly = df.select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .localCheckpoint()
    val m = dly.agg(count(lit(1)).as("__k"), sum("__x").as("__sx"), sum("__y").as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"), sum(col("__x") * col("__y")).as("__sxy"))
    def D(c0: String) = col(c0).cast("double")
    val ab = m.select(col("__k"),
        ((D("__k") * col("__sxy") - D("__sx") * col("__sy"))
          / (D("__k") * col("__sxx") - D("__sx") * col("__sx"))).as("__b"),
        col("__sx"), col("__sy"))
      .select(col("__k"), col("__b"),
        (D("__sy") / col("__k") - col("__b") * (D("__sx") / col("__k"))).as("__a"))
    val e3 = floor((D("__y") - col("__a") - col("__b") * col("__x")) * 1000 + 0.5).cast("long")
    val e = dly.crossJoin(broadcast(ab))
      .select(col("__x"), col("__b"), e3.as("__e3"))
      .withColumn("__p3", lag("__e3", 1).over(Window.orderBy("__x")))
    e.groupBy("__b")
      .agg(sum(when(col("__p3").isNotNull,
          (col("__e3") - col("__p3")) * (col("__e3") - col("__p3"))).otherwise(0L)).as("__sd"),
        sum(col("__e3") * col("__e3")).as("__se"), count(lit(1)).as("n"))
      .select(col("n"),
        graft.functions.Num.round(col("__b"), 6).as("slope"),
        graft.functions.Num.round(col("__sd").cast("double") / col("__se"), 6).as("dw"))
  }

  /** Stochastic oscillator %K/%D (generalizes q_win_27): trailing
    * `lookback`-row high-low range position of an integer series,
    * smoothed over `smooth` rows. %K quantizes to 1e-6 BEFORE the %D
    * average so the second window folds exact integers. Warm-up rows
    * of both windows are excluded.
    */
  def stochasticOscillator(daily: DataFrame, dayCol: String, valueCol: String,
      lookback: Int = 14, smooth: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(lookback >= 2 && smooth >= 1, s"bad params ($lookback, $smooth)")
    val win = Window.orderBy(dayCol).rowsBetween(-(lookback - 1), 0)
    val w = daily.select(col(dayCol), col(valueCol).as("__v"),
      count(lit(1)).over(win).as("__k"),
      min(valueCol).over(win).as("__ll"), max(valueCol).over(win).as("__hh"))
    val pk = w.filter(col("__k") === lookback)
      .select(col(dayCol),
        when(col("__hh") === col("__ll"), lit(500000L))
          .otherwise(floor((col("__v") - col("__ll")).cast("double") * 1000000
            / (col("__hh") - col("__ll")) + 0.5).cast("long")).as("__k6"))
    val ws = Window.orderBy(dayCol).rowsBetween(-(smooth - 1), 0)
    pk.select(col(dayCol), col("__k6"),
        count(lit(1)).over(ws).as("__m"), sum("__k6").over(ws).as("__s"))
      .filter(col("__m") === smooth)
      .select(col(dayCol),
        (floor(col("__k6").cast("double") / 10000 * 100 + 0.5) / 100).as("pct_k"),
        (floor(floor(col("__s").cast("double") / smooth + 0.5) / 10000 * 100 + 0.5) / 100)
          .as("pct_d"))
  }

  /** Consecutive-index set similarity (generalizes q_set_8): Jaccard
    * between the member sets at index i and i+1 for every i. The
    * (index, member) relation dedups once; intersections are one
    * (i+1, member)-keyed self-join.
    */
  def adjacentSetJaccard(df: DataFrame, indexCol: String, memberCol: String): DataFrame = {
    val ms = df.select(col(indexCol).cast("long").as("__i"), col(memberCol).as("__m"))
      .distinct().localCheckpoint()
    val sz = ms.groupBy("__i").agg(count(lit(1)).as("__n"))
    val ix = ms.as("a")
      .join(ms.as("b"), col("b.__i") === col("a.__i") + 1 && col("b.__m") === col("a.__m"))
      .groupBy(col("a.__i").as("__i")).agg(count(lit(1)).as("__both"))
    sz.as("p")
      .join(sz.as("nx"), col("nx.__i") === col("p.__i") + 1)
      .join(ix.as("ix"), col("ix.__i") === col("p.__i"), "left_outer")
      .select(col("p.__i").as(indexCol), col("p.__n").as("n_prev"),
        col("nx.__n").as("n_next"), coalesce(col("__both"), lit(0L)).as("n_common"),
        graft.functions.Num.round(coalesce(col("__both"), lit(0L)).cast("double")
          / (col("p.__n") + col("nx.__n") - coalesce(col("__both"), lit(0L))), 6)
          .as("jaccard"))
  }

  /** Character-class quality profile (generalizes q_text_49):
    * upper/digit/space shares per group via exact length-difference
    * counting — three codegen'd regex replaces in one scan.
    */
  def charClassProfile(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    def cnt(cls: String) =
      (length(col(textCol)) - length(regexp_replace(col(textCol), cls, ""))).cast("long")
    df.select(col(groupCol), length(col(textCol)).cast("long").as("__n"),
        cnt("[A-Z]").as("__up"), cnt("[0-9]").as("__dg"), cnt(" ").as("__sp"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_chars"),
        graft.functions.Num.round(sum("__up").cast("double") / sum("__n"), 6).as("upper_ratio"),
        graft.functions.Num.round(sum("__dg").cast("double") / sum("__n"), 6).as("digit_ratio"),
        graft.functions.Num.round(sum("__sp").cast("double") / sum("__n"), 6).as("space_ratio"))
  }

  /** Cross-document boilerplate share (generalizes q_text_50):
    * sentences (split on ". ", trimmed, length >= minLen) occurring in
    * 2+ distinct documents, counted per group. At corpus scale key the
    * frequency join on xxhash64(sentence) instead of the raw string.
    */
  def boilerplateShare(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, minLen: Int = 20): DataFrame = {
    val sen = df.select(col(idCol).as("__id"), col(groupCol),
        explode(split(col(textCol), "\\. ")).as("__s0"))
      .select(col("__id"), col(groupCol), trim(col("__s0")).as("__s"))
      .filter(length(col("__s")) >= minLen)
      .localCheckpoint()
    val freq = sen.groupBy("__s").agg(countDistinct("__id").as("__nd"))
    sen.join(freq, "__s")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_sentences"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("n_boiler"),
        graft.functions.Num.round(sum(when(col("__nd") >= 2, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("boiler_ratio"))
  }

  /** Prefix-fingerprint dup summary (generalizes q_dedup_26): cluster
    * by the first `prefixLen` characters, report the corpus-level dup
    * profile in one row.
    */
  def prefixClusters(df: DataFrame, textCol: String, prefixLen: Int = 40): DataFrame =
    df.groupBy(substring(col(textCol), 1, prefixLen).as("__pfx"))
      .agg(count(lit(1)).as("__n"))
      .agg(sum("__n").as("n_docs"), count(lit(1)).as("n_groups"),
        sum(when(col("__n") >= 2, 1L).otherwise(0L)).as("n_multi_groups"),
        sum(when(col("__n") >= 2, col("__n") - 1).otherwise(0L)).as("n_dup_docs"),
        graft.functions.Num.round(
          sum(when(col("__n") >= 2, col("__n") - 1).otherwise(0L)).cast("double")
            / sum("__n"), 6).as("dup_ratio"))

  /** Ridge shrinkage path (generalizes q_ml_10): two-regressor ridge
    * coefficients at each λ, solved in closed form on the centered
    * normal equations from nine exact integer power sums (`xCol`,
    * `zCol`, `yCol` must already be integer-quantized). One scan for
    * any number of λs.
    */
  def ridgePath(df: DataFrame, xCol: String, zCol: String, yCol: String,
      lambdas: Seq[Long]): DataFrame = {
    require(lambdas.nonEmpty, "need at least one lambda")
    val m = df.select(col(xCol).cast("long").as("__x"), col(zCol).cast("long").as("__z"),
        col(yCol).cast("long").as("__y"))
      .agg(count(lit(1)).as("__n"), sum("__x").as("__sx"), sum("__z").as("__sz"),
        sum("__y").as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"), sum(col("__x") * col("__z")).as("__sxz"),
        sum(col("__z") * col("__z")).as("__szz"), sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__z") * col("__y")).as("__szy"))
    def D(c0: String) = col(c0).cast("double")
    val c = m.select(
      (D("__sxx") - D("__sx") * col("__sx") / col("__n")).as("__cxx"),
      (D("__sxz") - D("__sx") * col("__sz") / col("__n")).as("__cxz"),
      (D("__szz") - D("__sz") * col("__sz") / col("__n")).as("__czz"),
      (D("__sxy") - D("__sx") * col("__sy") / col("__n")).as("__cxy"),
      (D("__szy") - D("__sz") * col("__sy") / col("__n")).as("__czy"))
    val withLam = c.withColumn("lambda", explode(array(lambdas.map(lit): _*)))
    val det = ((col("__cxx") + col("lambda")) * (col("__czz") + col("lambda"))
      - col("__cxz") * col("__cxz"))
    withLam.select(col("lambda"),
      graft.functions.Num.round((col("__cxy") * (col("__czz") + col("lambda"))
        - col("__cxz") * col("__czy")) / det, 6).as("b_x"),
      graft.functions.Num.round(((col("__cxx") + col("lambda")) * col("__czy")
        - col("__cxz") * col("__cxy")) / det, 6).as("b_z"))
  }

  /** Token-budget water-filling (generalizes q_pipe_4): allocate
    * `budgetNum/budgetDen` of the total integer weight across groups —
    * equal shares first, then one redistribution of the slack left by
    * groups below the fair share. Pure integer division end to end.
    * Returns (group, available, alloc1, alloc_final, exhausted).
    */
  def waterfillBudget(df: DataFrame, groupCol: String, weightCol: String,
      budgetNum: Long = 1L, budgetDen: Long = 2L): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"budget fraction $budgetNum/$budgetDen must sit in (0, 1]")
    val src = df.groupBy(groupCol).agg(sum(col(weightCol).cast("long")).as("__t"))
      .localCheckpoint()
    val tot = src.agg(expr(s"sum(__t) * $budgetNum div $budgetDen").as("__budget"),
      count(lit(1)).as("__ng"))
    val r1 = src.crossJoin(broadcast(tot))
      .select(col(groupCol), col("__t"), col("__budget"),
        expr("__budget div __ng").as("__fair"),
        least(col("__t"), expr("__budget div __ng")).as("__a1"))
      .localCheckpoint()
    val slack = r1.agg((min("__budget") - sum("__a1")).as("__left"),
      sum(when(col("__t") > col("__fair"), 1L).otherwise(0L)).as("__m"))
    r1.crossJoin(broadcast(slack))
      .select(col(groupCol), col("__t").as("available"), col("__a1").as("alloc1"),
        when(col("__t") > col("__fair"),
          least(col("__t"), col("__fair")
            + when(col("__m") > 0, expr("__left div __m")).otherwise(lit(0L))))
          .otherwise(col("__a1")).cast("long").as("alloc_final"),
        when(col("__t") <= col("__fair"), 1L).otherwise(0L).as("exhausted"))
  }

  /** Retrieval exposure share (generalizes q_ret_9): per item-label
    * share of the 1e6-quantized DCG mass across every query group's
    * top-`k` ranking (rank by `scoreCol` DESC, `idCol` tie-break).
    */
  def exposureShare(df: DataFrame, queryCol: String, labelCol: String,
      scoreCol: String, idCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 1000, s"k=$k out of range")
    val wts = (1 to k).map(r => math.floor(1e6 * math.log(2) / math.log(r + 1.0) + 0.5).toLong)
    val wArr = array(wts.map(lit): _*)
    val w = Window.partitionBy(queryCol).orderBy(col(scoreCol).desc, col(idCol))
    val mass = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(labelCol)
      .agg(count(lit(1)).as("n_slots"),
        sum(element_at(wArr, col("__rn").cast("int"))).as("__w6"))
    mass.withColumn("__tot", sum("__w6").over(Window.partitionBy()))
      .select(col(labelCol), col("n_slots"),
        graft.functions.Num.round(col("__w6").cast("double") / col("__tot"), 6)
          .as("exposure_share"))
  }

  /** k-truss fixpoint (generalizes q_graph_16's two-round trajectory):
    * repeatedly drop edges in fewer than `k − 2` triangles until the
    * edge set stabilizes. Support is one canonical-orientation wedge
    * join per round; edge lists localCheckpoint between rounds.
    * Returns the surviving canonical (src < dst) edge list.
    */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 100): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val e0 = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d")).distinct()
    val b0 = e0.union(e0.select(col("__d").as("__s"), col("__s").as("__d")))
      .distinct().localCheckpoint()
    var canon = b0.filter(col("__s") < col("__d"))
      .select(col("__s").as("__u"), col("__d").as("__v")).localCheckpoint()
    var n = canon.count()
    var it = 0
    var converged = n == 0
    while (!converged) {
      it += 1
      if (it > maxIters)
        throw new IllegalStateException(s"kTruss($k) did not converge in $maxIters peels")
      val bi = canon.select(col("__u").as("__s"), col("__v").as("__d"))
        .union(canon.select(col("__v").as("__s"), col("__u").as("__d")))
        .localCheckpoint()
      val next = canon
        .join(bi.select(col("__s").as("__u"), col("__d").as("__w")), Seq("__u"))
        .join(bi.select(col("__s").as("__v"), col("__d").as("__w")), Seq("__v", "__w"))
        .groupBy("__u", "__v").agg(count(lit(1)).as("__sup"))
        .filter(col("__sup") >= k - 2)
        .select("__u", "__v").localCheckpoint()
      val n2 = next.count()
      if (n2 == n || n2 == 0) converged = true
      canon = next
      n = n2
    }
    canon.select(col("__u").as(srcCol), col("__v").as(dstCol))
  }

  /** Top event-type n-gram paths (generalizes q_stream_34's trigrams):
    * the most common `n`-step sequences per id stream, ranked. One
    * window pass with `n − 1` leads; the aggregate is |types|ⁿ-bounded.
    */
  def pathNgrams(df: DataFrame, idCol: String, tsCol: String, typeCol: String,
      tieCol: String, n: Int = 3, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2 && n <= 6, s"n=$n out of range")
    val w = Window.partitionBy(idCol).orderBy(tsCol, tieCol)
    val withLeads = (1 until n).foldLeft(
      df.select(col(idCol), col(tsCol), col(tieCol), col(typeCol).as("__e0"))) {
      (acc, i) => acc.withColumn(s"__e$i", lead(col("__e0"), i).over(w))
    }
    val parts = (0 until n).map(i => col(s"__e$i"))
    withLeads.filter(parts.drop(1).map(_.isNotNull).reduce(_ && _))
      .groupBy(concat_ws(">", parts: _*).as("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(topK)
  }

  /** Churn counts at inactivity horizons (generalizes q_stream_35):
    * ids whose last activity is `h`+ days before the corpus's last
    * day, for each horizon. Returns (horizon, n_ids, n_churned, rate).
    */
  def churnHorizons(df: DataFrame, idCol: String, tsCol: String,
      horizons: Seq[Int] = Seq(3, 7, 14)): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 0), "horizons must be >= 0")
    val u = df.groupBy(idCol)
      .agg(max((col(tsCol) / 86400000000L).cast("long")).as("__last"))
      .localCheckpoint()
    val mx = u.agg(max("__last").as("__maxd"))
    // all horizons fold into ONE aggregation pass / ONE driver action
    // (per-horizon conditional sums) instead of one collect per horizon
    val aggCols = count(lit(1)).as("__n") +: horizons.map(h =>
      sum(when(col("__last") <= col("__maxd") - h, 1L).otherwise(0L)).as(s"__c$h"))
    val row = u.crossJoin(broadcast(mx))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect().head
    val n = row.getLong(0)
    val rows = horizons.zipWithIndex.map { case (h, i) =>
      val c = row.getLong(i + 1)
      (h.toLong, n, c, math.floor(c.toDouble / n * 1e6 + 0.5) / 1e6)
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("horizon", "n_ids", "n_churned", "rate")
  }

  /** Pairwise label-centroid cosine matrix (generalizes q_sim_33):
    * components quantize to 1e8 integers, centroids to rounded integer
    * means, the pair dots/norms are exact BIGINT sums — the corpus is
    * touched once, the |labels|² join runs over broadcast-sized rows.
    */
  def centroidMatrix(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(labelCol).as("__l"), posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .select(col("__l"), col("__p"),
        floor(col("__v").cast("double") * 100000000L + 0.5).cast("long").as("__vi"))
    val cl = e.groupBy("__l", "__p")
      .agg(floor(sum("__vi").cast("double") / count(lit(1)) + 0.5).cast("long").as("__c"))
      .localCheckpoint()
    val a = cl.select(col("__l").as("__la"), col("__p"), col("__c").as("__ca"))
    val b = cl.select(col("__l").as("__lb"), col("__p"), col("__c").as("__cb"))
    a.join(b, Seq("__p")).filter(col("__la") < col("__lb"))
      .groupBy(col("__la").as("label_a"), col("__lb").as("label_b"))
      .agg(sum(col("__ca") * col("__cb")).as("__dot"),
        sum(col("__ca") * col("__ca")).as("__qa"),
        sum(col("__cb") * col("__cb")).as("__qb"))
      .select(col("label_a"), col("label_b"),
        graft.functions.Num.round(col("__dot").cast("double")
          / (sqrt(col("__qa").cast("double")) * sqrt(col("__qb").cast("double"))), 6)
          .as("cos_ab"))
  }

  /** Directed k-NN cosine graph (generalizes the q_sim_35/36 base):
    * (src, dst, rank, cos) for each row's k nearest neighbors, ranked
    * (cos DESC, dst ASC) with the bit-exact float-fold cosine. Brute
    * force — bound the input or feed LSH/IVF candidates at corpus
    * scale; the per-src rank window is the only shuffle.
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val pairs = v.as("a").join(broadcast(v.as("b")), col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").as("src"), col("b.__id").as("dst"),
        graft.functions.VectorFunctions.cosine(col("a.__v"), col("b.__v")).as("cos"))
    pairs.withColumn("rank",
        row_number().over(Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** In-degree histogram of a directed edge list (the hubness readout
    * of q_sim_35 over any kNN graph): (indeg, n_nodes), zero bin
    * included via the node universe. O(E) aggregate.
    */
  def hubnessHistogram(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val nodes = edges.select(col(srcCol).as("__n")).distinct()
    val ind = edges.groupBy(col(dstCol).as("__n")).agg(count(lit(1)).as("__indeg"))
    nodes.join(ind, Seq("__n"), "left")
      .select(coalesce(col("__indeg"), lit(0L)).as("indeg"))
      .groupBy("indeg").agg(count(lit(1)).as("n_nodes"))
  }

  /** Mean pairwise cosine per group + global (-1 key) WITHOUT the pair
    * space, via the centroid-sum identity (‖Σu‖²−Σ‖uᵢ‖²)/(n(n−1)) on
    * 1e-3-quantized unit vectors (generalizes q_sim_38). One O(n·dim)
    * pass; all cross-row arithmetic is exact BIGINT keyed (group, dim).
    */
  def anisotropy(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("long").as("__g"), col(vecCol).as("__v"))
      .withColumn("__nrm", graft.functions.VectorFunctions.l2norm(col("__v")))
      .filter(col("__nrm") > 0)
    val ex = u.select(col("__g"), col("__nrm"), posexplode(col("__v")).as(Seq("__d", "__x")))
      .select(col("__g"), col("__d"),
        floor(col("__x").cast("double") / col("__nrm") * 1000 + 0.5).cast("long").as("__uq"))
    val grp = ex.groupBy("__g", "__d")
      .agg(sum("__uq").as("__sd"), sum(col("__uq") * col("__uq")).as("__ssq"),
        count(lit(1)).as("__n"))
      .localCheckpoint()
    val lab = grp.groupBy("__g")
      .agg(sum(col("__sd") * col("__sd")).as("__num"), sum("__ssq").as("__selfsum"),
        max("__n").as("__n"))
    val gl = grp.groupBy("__d").agg(sum("__sd").as("__sd"), sum("__ssq").as("__ssq"))
    val glr = gl.agg(sum(col("__sd") * col("__sd")).as("__num"), sum("__ssq").as("__selfsum"))
      .crossJoin(u.agg(count(lit(1)).as("__n")))
      .select(lit(-1L).as("__g"), col("__num"), col("__selfsum"), col("__n"))
    lab.select(col("__g"), col("__num"), col("__selfsum"), col("__n")).union(glr)
      .select(col("__g").as(groupCol), col("__n").as("n"),
        (floor((col("__num") - col("__selfsum")).cast("double")
          / (lit(1000000.0) * col("__n") * (col("__n") - 1)) * 1000000 + 0.5) / 1000000)
          .as("mean_cos"))
  }

  /** Synchronous label propagation (generalizes q_graph_18): `rounds`
    * supersteps of "adopt the most frequent neighbor label, ties →
    * smallest", from label = node id, over the symmetrized edge list.
    * Returns (node, label). Each superstep is one join + one window;
    * labels localCheckpoint per round so lineage stays O(1).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct()
    val b = e0.union(e0.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct().localCheckpoint()
    var labels = b.select(col("__src").as("__node")).distinct()
      .withColumn("__lab", col("__node")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val cnt = b.join(labels.withColumnRenamed("__node", "__nbr"), col("__dst") === col("__nbr"))
        .groupBy(col("__src").as("__node"), col("__lab")).agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy("__node").orderBy(col("__c").desc, col("__lab"))
      labels = cnt.withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
        .select("__node", "__lab").localCheckpoint()
    }
    labels.select(col("__node").as("node"), col("__lab").as("label"))
  }

  /** Adamic–Adar link prediction (generalizes q_graph_19): non-adjacent
    * pairs sharing ≥1 neighbor scored Σ 1/ln(deg(z)), weights quantized
    * to 1e-6 ints per neighbor BEFORE the pair sum. Candidates come
    * from the wedge join (O(Σ deg²), never all-pairs). Returns
    * (a, b, n_common, score).
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct()
    val b = e0.union(e0.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct().localCheckpoint()
    val w = b.groupBy(col("__src").as("__node")).agg(count(lit(1)).as("__dg"))
      .filter(col("__dg") >= 2)
      .select(col("__node"),
        floor(lit(1000000) / log(col("__dg").cast("double")) + 0.5).cast("long").as("__wz"))
    b.as("x").join(b.as("y"), col("x.__dst") === col("y.__dst") && col("x.__src") < col("y.__src"))
      .select(col("x.__src").as("a"), col("y.__src").as("b"), col("x.__dst").as("__z"))
      .join(b.select(col("__src").as("__ea"), col("__dst").as("__eb")),
        col("a") === col("__ea") && col("b") === col("__eb"), "left_anti")
      .join(broadcast(w), col("__z") === col("__node"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_common"), sum("__wz").as("__s6"))
      .select(col("a"), col("b"), col("n_common"),
        (col("__s6").cast("double") / 1000000).as("score"))
  }

  /** Per-community modularity contribution (generalizes q_graph_20):
    * (m2·dir_within − deg_sum²)/m2² for a node→community assignment —
    * the halving-free exact-BIGINT form. Returns (community,
    * dir_within, deg_sum, contribution); Σ contribution = modularity Q.
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      communities: DataFrame, nodeCol: String, comCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct()
    val b = e0.union(e0.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct().localCheckpoint()
    val com = communities.select(col(nodeCol).as("__node"), col(comCol).as("__c"))
    val m2 = b.agg(count(lit(1)).as("__m2"))
    val within = b
      .join(broadcast(com.select(col("__node").as("__na"), col("__c").as("__ca"))),
        col("__src") === col("__na"))
      .join(broadcast(com.select(col("__node").as("__nb"), col("__c").as("__cb"))),
        col("__dst") === col("__nb"))
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c")).agg(count(lit(1)).as("__dw"))
    val degsum = b.join(broadcast(com), col("__src") === col("__node"))
      .groupBy("__c").agg(count(lit(1)).as("__ds"))
    degsum.join(within, Seq("__c"), "left").crossJoin(broadcast(m2))
      .select(col("__c").as("community"),
        coalesce(col("__dw"), lit(0L)).as("dir_within"), col("__ds").as("deg_sum"),
        (floor((col("__m2") * coalesce(col("__dw"), lit(0L)) - col("__ds") * col("__ds"))
          .cast("double") / (col("__m2") * col("__m2")).cast("double") * 1000000000 + 0.5)
          / 1000000000).as("contribution"))
  }

  /** Train/test near-dup leakage audit (generalizes q_pipe_7): split by
    * the overflow-safe multiplicative id hash (`trainPct` of 100 goes
    * to train), then per-group count of test rows whose `keyCol` value
    * also appears in train. Only key digests shuffle.
    */
  def splitLeakage(df: DataFrame, idCol: String, keyCol: String, groupCol: String,
      trainPct: Int = 90): DataFrame = {
    val bucket = (pmod(col(idCol), lit(1000000007L)) * 2654435761L) % 1000000007L % 100
    val keyed = df.select(col(groupCol).as("__g"), col(keyCol).as("__k"),
      when(bucket < trainPct, lit("train")).otherwise(lit("test")).as("__split"))
      .localCheckpoint()
    val tr = keyed.filter(col("__split") === "train").select(col("__k").as("__trk")).distinct()
    keyed.filter(col("__split") === "test")
      .join(tr, col("__k") === col("__trk"), "left")
      .groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__trk").isNotNull, 1).otherwise(0)).cast("long").as("n_leaked"))
      .select(col(groupCol), col("n_test"), col("n_leaked"),
        (floor(col("n_leaked").cast("double") / col("n_test") * 1000000 + 0.5) / 1000000)
          .as("leak_share"))
  }

  /** Concat-and-split packing audit (generalizes q_pipe_8): for each
    * context size, sequences cut, documents straddling a cut, split
    * share, and tail pad — off ONE windowed cumulative token sum. The
    * global-order window range-partitions at scale.
    */
  def ctxBoundarySweep(df: DataFrame, orderCol: String, tokCol: String,
      ctxs: Seq[Long]): DataFrame = {
    require(ctxs.nonEmpty, "ctxBoundarySweep needs at least one context size")
    val spark = df.sparkSession
    import spark.implicits._
    // the global cumulative token sum runs through prefixSum — exact
    // integer running sum off range partitions, no one-task window
    val cum = prefixSum(df.select(col(orderCol), col(tokCol).cast("long").as("__tok")),
      Seq(orderCol), "__tok", "__c")
    cum.crossJoin(broadcast(ctxs.toDF("ctx")))
      .select(col("ctx"), col("__tok"), col("__c"),
        when(expr("(__c - 1) div ctx") > expr("(__c - __tok) div ctx"), 1).otherwise(0)
          .as("__crossed"))
      .groupBy("ctx")
      .agg(max("__c").as("__total"), sum("__crossed").cast("long").as("n_docs_split"),
        count(lit(1)).as("__n"))
      .select(col("ctx"), expr("(__total + ctx - 1) div ctx").as("n_seqs"),
        col("n_docs_split"),
        (floor(col("n_docs_split").cast("double") / col("__n") * 1000000 + 0.5) / 1000000)
          .as("split_share"),
        (expr("(__total + ctx - 1) div ctx") * col("ctx") - col("__total")).as("tail_pad"))
  }

  /** Truncation pricing (generalizes q_text_52): tokens lost and docs
    * touched when every row's `tokCol` is capped at each max length.
    * Map-only + one aggregate.
    */
  def truncationLoss(df: DataFrame, tokCol: String, caps: Seq[Long]): DataFrame = {
    require(caps.nonEmpty, "truncationLoss needs at least one cap")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(tokCol).cast("long").as("__tok"))
      .crossJoin(broadcast(caps.toDF("cap")))
      .select(col("cap"), col("__tok"),
        when(col("__tok") > col("cap"), col("__tok") - col("cap")).otherwise(0L).as("__lost"))
      .groupBy("cap")
      .agg(sum("__tok").as("total_tokens"), sum("__lost").as("tokens_lost"),
        sum(when(col("__tok") > col("cap"), 1).otherwise(0)).cast("long").as("docs_truncated"))
      .select(col("cap"), col("total_tokens"), col("tokens_lost"), col("docs_truncated"),
        (floor(col("tokens_lost").cast("double") / col("total_tokens") * 1000000 + 0.5) / 1000000)
          .as("loss_share"))
  }
  // ─── Round-7 wrappers ──────────────────────────────────────────────

  /** k-anonymity summary of `df` under the given quasi-identifier
    * columns (generalizes q_priv_1): group count, k, max group, rows in
    * groups under `riskK` and their share. One QI-bounded groupBy.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], riskK: Int = 5): DataFrame =
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("n_groups"), min("__n").as("k_anonymity"),
        max("__n").as("max_group"), sum("__n").as("n_rows"),
        sum(when(col("__n") < riskK, col("__n")).otherwise(0L)).as("n_at_risk"),
        graft.functions.Num.round(
          sum(when(col("__n") < riskK, col("__n")).otherwise(0L)).cast("double")
            / sum("__n"), 6).as("risk_share"))

  /** l-diversity of the QI groups against a sensitive column
    * (generalizes q_priv_2). `sensitive` may be any expression column
    * (e.g. a pre-bucketed band).
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String],
      sensitive: org.apache.spark.sql.Column, minL: Int = 3): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), countDistinct(sensitive).as("__l"))
      .agg(count(lit(1)).as("n_groups"), min("__l").as("min_l"),
        graft.functions.Num.round(sum("__l").cast("double") / count(lit(1)), 6)
          .as("mean_l"),
        sum(when(col("__l") < minL, 1L).otherwise(0L)).as("n_low_div_groups"),
        sum(when(col("__l") < minL, col("__n")).otherwise(0L)).as("n_exposed"))

  /** Intra-document duplicate n-gram share per group (generalizes
    * q_text_55): positions − distinct as two array sizes, no explode.
    */
  def dupNgramShare(df: DataFrame, groupCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val tk = split(col(textCol), " ")
    val pos = greatest(size(tk) - (n - 1), lit(0)).cast("long")
    val dst = size(when(size(tk) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", slice(tk, i, lit(n))))))).cast("long")
    df.select(col(groupCol), pos.as("__n"), dst.as("__d"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_ngrams"),
        sum(col("__n") - col("__d")).as("n_dup_ngrams"),
        graft.functions.Num.round(sum(col("__n") - col("__d")).cast("double")
          / greatest(sum("__n"), lit(1L)), 6).as("dup_share"))
  }

  /** Gopher-style rule incidence matrix per group (generalizes
    * q_text_57): all four rules as exact integer predicates.
    */
  def qualityRuleMatrix(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tk = split(col(textCol), " ")
    val m = df.select(col(groupCol),
      size(tk).cast("long").as("__nt"),
      size(array_distinct(tk)).cast("long").as("__nu"),
      length(col(textCol)).cast("long").as("__nc"),
      (length(col(textCol)) - length(regexp_replace(col(textCol), "[0-9]", "")))
        .cast("long").as("__dg"))
    val f = m.select(col(groupCol),
      when(col("__nt") < 15, 1L).otherwise(0L).as("__r1"),
      when(col("__nc") - col("__nt") + 1 < col("__nt") * 3
        || col("__nc") - col("__nt") + 1 > col("__nt") * 10, 1L).otherwise(0L).as("__r2"),
      when(col("__dg") * 5 > col("__nc"), 1L).otherwise(0L).as("__r3"),
      when(col("__nu") * 5 < col("__nt") * 2, 1L).otherwise(0L).as("__r4"))
    val fails = col("__r1") + col("__r2") + col("__r3") + col("__r4")
    f.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("__r1").as("n_short"), sum("__r2").as("n_wordlen"),
        sum("__r3").as("n_digit"), sum("__r4").as("n_repeat"),
        sum(when(fails >= 2, 1L).otherwise(0L)).as("n_multi_fail"),
        graft.functions.Num.round(sum(when(fails === 0, 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("clean_share"))
  }

  /** Cohen's kappa between two binary rater columns (0/1 longs)
    * (generalizes q_stat_33). Returns the 2×2 plus p_observed and κ.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val m = df.agg(count(lit(1)).as("n"),
      sum(when(col(aCol) === 1 && col(bCol) === 1, 1L).otherwise(0L)).as("n11"),
      sum(when(col(aCol) === 1 && col(bCol) === 0, 1L).otherwise(0L)).as("n10"),
      sum(when(col(aCol) === 0 && col(bCol) === 1, 1L).otherwise(0L)).as("n01"),
      sum(when(col(aCol) === 0 && col(bCol) === 0, 1L).otherwise(0L)).as("n00"))
    def D(c: org.apache.spark.sql.Column) = c.cast("double")
    val pe = (D(col("n11") + col("n10")) * (col("n11") + col("n01"))
      + D(col("n01") + col("n00")) * (col("n10") + col("n00"))) / col("n") / col("n")
    val po = D(col("n11") + col("n00")) / col("n")
    m.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      graft.functions.Num.round(po, 6).as("p_observed"),
      graft.functions.Num.round((po - pe) / (lit(1) - pe), 6).as("kappa"))
  }

  /** Fano overdispersion factor per group from a pre-bucketed event
    * frame (generalizes q_stream_38): var/mean of per-bucket counts.
    */
  def fanoFactor(df: DataFrame, groupCol: String, bucketCol: String): DataFrame =
    df.groupBy(col(groupCol), col(bucketCol)).agg(count(lit(1)).as("__c"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_buckets"), sum("__c").as("n_events"),
        sum(col("__c") * col("__c")).as("__scc"))
      .select(col(groupCol), col("n_buckets"), col("n_events"),
        graft.functions.Num.round((col("n_buckets").cast("double") * col("__scc")
          - col("n_events").cast("double") * col("n_events"))
          / (col("n_buckets").cast("double") * col("n_events")), 6).as("fano"))

  /** Degree-sequence Gini of an undirected edge list (generalizes
    * q_graph_23). Edges must already be symmetrized+distinct.
    */
  def degreeGini(bidirEdges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = bidirEdges.groupBy(col(srcCol).as("__node")).agg(count(lit(1)).as("__deg"))
    deg.select(col("__deg"),
        row_number().over(Window.orderBy(col("__deg"), col("__node")))
          .cast("long").as("__i"))
      .agg(count(lit(1)).as("n_nodes"), sum("__deg").as("total_degree"),
        sum(col("__i") * col("__deg")).as("__sid"), max("__deg").as("max_degree"))
      .select(col("n_nodes"), col("total_degree"), col("max_degree"),
        graft.functions.Num.round((col("__sid").cast("double") * 2
          - (col("n_nodes") + 1).cast("double") * col("total_degree"))
          / (col("n_nodes").cast("double") * col("total_degree")), 6).as("gini"))
  }

  /** Deterministic token-balanced shard summary (generalizes q_pipe_9):
    * portable multiplicative hash of `idCol` into `nShards` shards.
    */
  def shardBalance(df: DataFrame, idCol: String, tokCol: String,
      nShards: Int = 16): DataFrame = {
    val P = 1000000007L
    df.select((((col(idCol) % P) * 2654435761L % P) % nShards).as("__shard"),
        col(tokCol).cast("long").as("__tok"))
      .groupBy("__shard")
      .agg(count(lit(1)).as("__nd"), sum("__tok").as("__toks"))
      .agg(count(lit(1)).as("n_shards"), sum("__nd").as("n_rows"),
        min("__toks").as("min_tokens"), max("__toks").as("max_tokens"),
        graft.functions.Num.round(sum("__toks").cast("double") / count(lit(1)), 2)
          .as("mean_tokens"),
        graft.functions.Num.round((max("__toks").cast("double") - min("__toks"))
          / (sum("__toks").cast("double") / count(lit(1))), 6).as("imbalance"))
  }

  /** One Newton step of logistic regression from β=0 for a binary
    * 0/1 label vs one regressor (generalizes q_ml_12): closed form
    * 4·(XᵀX)⁻¹Xᵀ(y−½) over five exact sums.
    */
  def logitStep(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val m = df.agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sxx"),
      sum(y).as("sy"), sum(when(y === 1, x).otherwise(0L)).as("sxy"))
    def D(c: org.apache.spark.sql.Column) = c.cast("double")
    val den = D(col("n")) * col("sxx") - D(col("sx")) * col("sx")
    val gy = D(col("sy")) - D(col("n")) / 2
    val gxy = D(col("sxy")) - D(col("sx")) / 2
    m.select(col("n"), col("sy").as("n_positive"),
      graft.functions.Num.round(D(col("sy")) / col("n"), 6).as("base_rate"),
      graft.functions.Num.round(lit(4.0) * (D(col("sxx")) * gy - D(col("sx")) * gxy) / den, 6)
        .as("beta0"),
      graft.functions.Num.round(lit(4.0) * (D(col("n")) * gxy - D(col("sx")) * gy) / den, 6)
        .as("beta1"))
  }

  /** Quantization bit-width error sweep over a float-array column
    * (generalizes q_sim_40): RMSE + max abs error per width.
    */
  def bitwidthSweep(df: DataFrame, vecCol: String,
      bits: Seq[Long] = Seq(2L, 4L, 8L)): DataFrame = {
    val e = df.select(col(vecCol).as("__v"),
        explode(array(bits.map(lit): _*)).as("bits"))
      .withColumn("__s", (pow(lit(2.0), col("bits") - 1) - 1).cast("double"))
    def err(x: org.apache.spark.sql.Column, sc: org.apache.spark.sql.Column) = {
      val xd = x.cast("double"); xd - floor(xd * sc + 0.5) / sc
    }
    e.select(col("bits"),
        floor(aggregate(transform(col("__v"), x => {
          val ev = err(x, col("__s")); ev * ev
        }), lit(0.0), (acc, v) => acc + v) * 1000000000L + 0.5)
          .cast("long").as("__sq9"),
        floor(array_max(transform(col("__v"), x => abs(err(x, col("__s")))))
          * 1000000 + 0.5).cast("long").as("__mx6"),
        size(col("__v")).cast("long").as("__dim"))
      .groupBy("bits")
      .agg(sum("__dim").as("n_values"),
        graft.functions.Num.round(
          sqrt(sum("__sq9").cast("double") / 1e9 / sum("__dim")), 6).as("rmse"),
        graft.functions.Num.round(max("__mx6").cast("double") / 1000000, 6)
          .as("max_abs_err"))
  }

  /** TwoNN intrinsic-dimension estimate over a sampled vector frame
    * (generalizes q_sim_39). The sample should be broadcast-sized; at
    * corpus scale feed IVF/LSH candidate pairs instead.
    */
  def twoNNDimension(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = df.select(col(idCol).as("__i"), col(vecCol).as("__ea"))
    val b = df.select(col(idCol).as("__j"), col(vecCol).as("__eb"))
    val w = Window.partitionBy("__i").orderBy(col("__d2"), col("__j"))
    a.join(broadcast(b), col("__i") =!= col("__j"))
      .select(col("__i"), col("__j"),
        graft.functions.VectorFunctions.sqDist(col("__ea"), col("__eb")).as("__d2"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 2)
      .groupBy("__i")
      .agg(max(when(col("__rn") === 1, col("__d2"))).as("__d1"),
        max(when(col("__rn") === 2, col("__d2"))).as("__d2nd"))
      .filter(col("__d1") > 0)
      .select(floor(log(col("__d2nd") / col("__d1")) * 0.5 * 1000000 + 0.5)
        .cast("long").as("__ln6"))
      .agg(count(lit(1)).as("n_points"), sum("__ln6").as("sum_ln_mu6"))
      .select(col("n_points"), col("sum_ln_mu6"),
        graft.functions.Num.round(
          col("n_points").cast("double") * 1000000 / col("sum_ln_mu6"), 4).as("dim_est"))
  }
  /** Rich-club coefficient of an undirected (symmetrized+distinct)
    * edge list (generalizes q_graph_21): density among the top-decile
    * (min 2) degree nodes vs global density.
    */
  def richClub(bidirEdges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = bidirEdges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint()
    val deg = b.groupBy(col("__src").as("__node")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    val n = deg.count()
    val nHubs = math.max(n / 10, 2L)
    val hubs = deg.select(col("__node"), row_number()
        .over(Window.orderBy(col("__deg").desc, col("__node"))).as("__rn"))
      .filter(col("__rn") <= nHubs).select("__node").localCheckpoint()
    val e2 = b.count()
    val eh2 = b.join(broadcast(hubs), b("__src") === hubs("__node"), "left_semi")
      .join(broadcast(hubs.withColumnRenamed("__node", "__node2")),
        col("__dst") === col("__node2"), "left_semi")
      .count()
    val hubDen = eh2.toDouble / (nHubs * (nHubs - 1))
    val den = e2.toDouble / (n * (n - 1))
    val spark = bidirEdges.sparkSession
    import spark.implicits._
    Seq((n, nHubs, e2 / 2, eh2 / 2,
      math.floor(hubDen * 1000000 + 0.5) / 1000000,
      math.floor(den * 1000000 + 0.5) / 1000000,
      math.floor(hubDen / den * 10000 + 0.5) / 10000))
      .toDF("n_nodes", "n_hubs", "n_edges", "n_hub_edges",
        "hub_density", "density", "rich_club_ratio")
  }

  /** Year-over-year growth of a (yyyymm, long value) series
    * (generalizes q_time_23): calendar self-join on ym−100, robust to
    * missing months.
    */
  def yoyGrowth(df: DataFrame, ymCol: String, valueCol: String): DataFrame = {
    val m = df.select(col(ymCol).cast("long").as("ym"),
      col(valueCol).cast("long").as("__v")).localCheckpoint()
    val b = m.select((col("ym") + 100).as("__ym2"), col("__v").as("__pv"))
    m.join(b, col("ym") === col("__ym2"))
      .select(col("ym"),
        graft.functions.Num.round(col("__v").cast("double") / 100, 2).as("revenue"),
        graft.functions.Num.round(col("__pv").cast("double") / 100, 2).as("prev_revenue"),
        graft.functions.Num.round((col("__v").cast("double") - col("__pv")) / col("__pv"), 6)
          .as("yoy_growth"))
  }

  /** Ulcer index + max drawdown per group over an ordered integer
    * value series (generalizes q_win_28): RMS of 1e-8-quantized
    * relative drawdowns against the running peak.
    */
  def ulcerIndex(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(orderCol), col(valueCol).cast("long").as("__v"))
      .withColumn("__peak", max("__v").over(w))
      .select(col(groupCol),
        floor((col("__peak") - col("__v")).cast("double") / col("__peak")
          * 100000000L + 0.5).cast("long").as("__d8"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Num.round(sqrt(sum(col("__d8") * col("__d8")).cast("double")
          / 1e16 / count(lit(1))) * 100, 4).as("ulcer_pct"),
        graft.functions.Num.round(max("__d8").cast("double") / 1e8 * 100, 4)
          .as("max_dd_pct"))
  }

  /** Decontamination cost (generalizes q_pipe_10): per group, rows and
    * token mass lost when dropping rows whose distinct token-n-gram
    * overlap with `bench`'s shingle set exceeds `threshold`.
    */
  def decontaminationCost(train: DataFrame, idCol: String, groupCol: String,
      textCol: String, tokCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 3, threshold: Double = 0.05): DataFrame = {
    val bsh = bench.select(explode(
        TextFunctions.tokenShingles(col(benchTextCol), n)).as("__sh")).distinct()
    val dsh = train.select(col(idCol).as("__id"),
      explode(TextFunctions.tokenShingles(col(textCol), n)).as("__sh"))
    val tot = dsh.groupBy("__id").agg(count(lit(1)).as("__n_sh"))
    val hit = dsh.join(broadcast(bsh), "__sh")
      .groupBy("__id").agg(count(lit(1)).as("__n_hit"))
    val fl = tot.join(hit, Seq("__id"), "left_outer")
      .select(col("__id"),
        when(coalesce(col("__n_hit"), lit(0L)).cast("double") / col("__n_sh") > threshold,
          1L).otherwise(0L).as("__bad"))
    train.select(col(idCol).as("__id"), col(groupCol), col(tokCol).cast("long").as("__tok"))
      .join(fl, "__id")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), sum("__bad").as("n_flagged"),
        sum("__tok").as("tokens_total"),
        sum(when(col("__bad") === 1, col("__tok")).otherwise(0L)).as("tokens_lost"),
        graft.functions.Num.round(
          sum(when(col("__bad") === 1, col("__tok")).otherwise(0L)).cast("double")
            / sum("__tok"), 6).as("loss_share"))
  }

  /** k-suppression cost curve (generalizes q_priv_5): rows/groups lost
    * publishing only QI groups of size ≥ k, for each k.
    */
  def suppressionCost(df: DataFrame, qiCols: Seq[String],
      ks: Seq[Long] = Seq(2L, 5L, 10L, 20L)): DataFrame = {
    val g = df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    g.withColumn("k", explode(array(ks.map(lit): _*)))
      .groupBy("k")
      .agg(sum(when(col("__n") >= col("k"), col("__n")).otherwise(0L)).as("n_published"),
        sum(when(col("__n") < col("k"), col("__n")).otherwise(0L)).as("n_suppressed"),
        sum(when(col("__n") < col("k"), 1L).otherwise(0L)).as("groups_suppressed"),
        graft.functions.Num.round(
          sum(when(col("__n") < col("k"), col("__n")).otherwise(0L)).cast("double")
            / sum("__n"), 6).as("suppression_cost"))
  }

  /** Per-group token-accounting ledger (generalizes q_pipe_11): raw →
    * quality gate (≥ minTokens) → multiset-digest dedup (first id wins)
    * → truncation cap. One scan; the md5 digest is the only wide
    * shuffle key.
    */
  def tokenLedger(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minTokens: Long = 20L, cap: Long = 96L): DataFrame = {
    val t = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
      size(split(col(textCol), " ")).cast("long").as("__ntok"),
      md5(concat_ws(" ", sort_array(split(col(textCol), " ")))).as("__dg"))
    val s0 = t.groupBy("__g")
      .agg(count(lit(1)).as("docs_raw"), sum("__ntok").as("toks_raw"))
    val q = t.filter(col("__ntok") >= minTokens)
    val s1 = q.groupBy("__g")
      .agg(count(lit(1)).as("docs_quality"), sum("__ntok").as("toks_quality"))
      .withColumnRenamed("__g", "__g1")
    val k = q.withColumn("__rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("__dg")).orderBy(col("__id"))))
    val s2 = k.filter(col("__rk") === 1).groupBy("__g")
      .agg(count(lit(1)).as("docs_dedup"), sum("__ntok").as("toks_dedup"),
        sum(least(col("__ntok"), lit(cap))).as("toks_packed"))
      .withColumnRenamed("__g", "__g2")
    s0.join(s1, col("__g") === col("__g1"), "left")
      .join(s2, col("__g") === col("__g2"), "left")
      .select(col("__g").as(groupCol), col("docs_raw"), col("toks_raw"),
        coalesce(col("docs_quality"), lit(0L)).as("docs_quality"),
        coalesce(col("toks_quality"), lit(0L)).as("toks_quality"),
        coalesce(col("docs_dedup"), lit(0L)).as("docs_dedup"),
        coalesce(col("toks_dedup"), lit(0L)).as("toks_dedup"),
        coalesce(col("toks_packed"), lit(0L)).as("toks_packed"))
  }

  /** Prosecutor re-identification risk of a QI release, reported per
    * `byCol` (generalizes q_priv_8). Risk rationals are integer
    * divisions so the fold is exact.
    */
  def reidRisk(df: DataFrame, qiCols: Seq[String], byCol: String): DataFrame =
    df.groupBy(qiCols.map(col): _*).agg(count(lit(1)).as("__k"))
      .groupBy(col(byCol).cast("long").as(byCol))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__k") === 1, 1L).otherwise(0L)).as("n_singletons"),
        (floor(sum(expr("1000000000 div __k")).cast("double") / 1000 + 0.5) / 1000000)
          .as("exp_reid"),
        (expr("1000000 div min(__k)").cast("double") / 1000000).as("max_risk"))

  /** Rank-biased precision per query group (generalizes q_ret_11):
    * ranking = ORDER BY rankCol DESC, idCol; relevance = relCol ≠ 0.
    * Discounts (1-p)·p^(r-1) for ranks 1..depth are quantized to 1e8
    * BIGINTs at plan time so the fold is exact for ANY p.
    */
  def rbp(df: DataFrame, queryCol: String, rankCol: String, idCol: String,
      rel: org.apache.spark.sql.Column, p: Double = 0.8, depth: Int = 20): DataFrame = {
    val w = (1 to depth).map(r =>
      math.floor(1e8 * (1 - p) * math.pow(p, r - 1) + 0.5).toLong)
    val wArr = array(w.map(lit): _*)
    val byRank = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col(rankCol).desc, col(idCol))
    df.select(col(queryCol), when(rel, 1).otherwise(0).as("__rel"),
        row_number().over(byRank).cast("long").as("__rn"))
      .groupBy(queryCol)
      .agg(sum(when(col("__rel") === 1 && col("__rn") <= depth, 1L).otherwise(0L))
          .as(s"n_rel_top$depth"),
        sum(when(col("__rel") === 1 && col("__rn") <= depth,
          element_at(wArr, col("__rn").cast("int"))).otherwise(0L)).as("__w"))
      .select(col(queryCol), col(s"n_rel_top$depth"),
        (floor(col("__w").cast("double") / 100 + 0.5) / 1000000).as("rbp"))
  }

  /** Signed business-day (weekday) distance between two date/timestamp
    * columns as closed-form epoch-day algebra (generalizes
    * q_time_23). Antisymmetric: negative when `end` precedes `start`.
    */
  def weekdaysBetween(start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def wk(e: org.apache.spark.sql.Column) =
      lit(5L) * floor((e + 3) / 7).cast("long") + least(pmod(e + 3, lit(7)), lit(5L))
    wk(datediff(end, lit("1970-01-01")).cast("long")) -
      wk(datediff(start, lit("1970-01-01")).cast("long"))
  }

  /** Token-vocabulary drift between two groups via map HOFs
    * (generalizes q_map_6): shared keys, asymmetric key counts, L1
    * distance over shared counts.
    */
  def vocabDrift(df: DataFrame, groupCol: String, textCol: String,
      a: String, b: String): DataFrame = {
    def vmap(v: String, out: String) =
      df.filter(col(groupCol) === v)
        .select(explode(split(col(textCol), " ")).as("__t"))
        .groupBy("__t").agg(count(lit(1)).as("__n"))
        .agg(map_from_entries(sort_array(collect_list(struct(col("__t"), col("__n")))))
          .as(out))
    val m = vmap(a, "__m0").crossJoin(broadcast(vmap(b, "__m1")))
    val shared0 = map_filter(col("__m0"), (k, _) => map_contains_key(col("__m1"), k))
    val zip = map_zip_with(shared0, col("__m1"), (_, x, y) =>
      when(x.isNotNull && y.isNotNull, abs(x - y)).otherwise(0L))
    m.select(
      size(shared0).cast("long").as("n_shared"),
      (size(col("__m0")) - size(shared0)).cast("long").as("n_only_a"),
      (size(col("__m1")) - size(map_filter(col("__m1"),
        (k, _) => map_contains_key(col("__m0"), k)))).cast("long").as("n_only_b"),
      aggregate(map_values(zip), lit(0L), (acc, x) => acc + x).as("l1_shared"))
  }

  /** Pinball-loss quantile-forecast evaluation (generalizes q_ml_13):
    * portable-hash split (3 train shards : 1 test), per-group exact
    * type-1 q50/q90 on train, τ∈{.5,.9} losses on test. `centsCol`
    * must already be an exact integer unit.
    */
  def pinballEval(df: DataFrame, groupCol: String, centsCol: String,
      keyCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    def DD(c: org.apache.spark.sql.Column) = c.cast("double")
    val h = (pmod(col(keyCol), lit(1000000007L)) * 2654435761L) % 1000000007L % 4
    val j = df.select(col(groupCol).as("__g"), col(centsCol).as("__t2"),
      col(keyCol).as("__k"), h.as("__h"))
    val wOrd = W.partitionBy(col("__g")).orderBy(col("__t2"), col("__k"))
    val wAll = W.partitionBy(col("__g"))
    val tr = j.filter(col("__h") < 3)
      .select(col("__g"), col("__t2"),
        row_number().over(wOrd).as("__rn"), count(lit(1)).over(wAll).as("__n"))
    val qq = tr.groupBy("__g")
      .agg(max(when(col("__rn") === expr("(__n + 1) div 2"), col("__t2"))).as("q50"),
        max(when(col("__rn") === expr("(9 * __n + 9) div 10"), col("__t2"))).as("q90"))
    val te = j.filter(col("__h") === 3).select(col("__g").as("__tg"), col("__t2"))
    te.join(qq, col("__tg") === col("__g"))
      .groupBy(col("__g"), col("q50"), col("q90"))
      .agg(count(lit(1)).as("n_test"),
        sum(greatest(lit(5) * (col("__t2") - col("q50")),
          lit(-5) * (col("__t2") - col("q50")))).as("__l50"),
        sum(greatest(lit(9) * (col("__t2") - col("q90")),
          -(col("__t2") - col("q90")))).as("__l90"))
      .select(col("__g").as(groupCol), col("n_test"),
        (DD(col("q50")) / 100).as("q50"), (DD(col("q90")) / 100).as("q90"),
        graft.functions.Num.round(DD(col("__l50")) / 1000 / col("n_test"), 6).as("pinball50"),
        graft.functions.Num.round(DD(col("__l90")) / 1000 / col("n_test"), 6).as("pinball90"))
  }

  /** MASE of a w-step moving-average forecast vs the one-step naive
    * baseline over an ordered series (generalizes q_ml_14, w=3).
    * Integer values stay exact: errors are ×w-scaled.
    */
  def mase(series: DataFrame, tCol: String, xCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window.orderBy(col(tCol))
    val l = series.select(col(xCol).as("__x"),
      lag(col(xCol), 1).over(W).as("__x1"), lag(col(xCol), 2).over(W).as("__x2"),
      lag(col(xCol), 3).over(W).as("__x3"))
    l.filter(col("__x3").isNotNull)
      .select(abs(lit(3) * col("__x") - (col("__x1") + col("__x2") + col("__x3"))).as("__e3"),
        abs(lit(3) * col("__x") - lit(3) * col("__x1")).as("__e1"))
      .agg(count(lit(1)).as("n_scored"),
        sum("__e3").as("sum_err3x"), sum("__e1").as("sum_naive3x"))
      .select(col("n_scored"), col("sum_err3x"), col("sum_naive3x"),
        graft.functions.Num.round(
          col("sum_err3x").cast("double") / col("sum_naive3x"), 6).as("mase"))
  }

  /** Hodges–Lehmann pseudo-median per group over an ordered series
    * (generalizes q_stat_44): median of Walsh averages (x_i+x_j)/2,
    * i ≤ j. For an EVEN Walsh count the two middle Walsh sums are
    * averaged (the standard HL pseudo-median, not the lower median).
    * `tCol` must be UNIQUE within each group — the i ≤ j pairing keys
    * on it, so duplicate t values would double-count pairs.
    */
  def hodgesLehmann(series: DataFrame, groupCol: String, tCol: String,
      xCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val a = series.select(col(groupCol).as("__g"), col(tCol).as("__t1"), col(xCol).as("__x1"))
    val b = series.select(col(groupCol).as("__g2"), col(tCol).as("__t2"), col(xCol).as("__x2"))
    val w = a.join(b, col("__g") === col("__g2") && col("__t1") <= col("__t2"))
      .select(col("__g"), col("__t1"), col("__t2"), (col("__x1") + col("__x2")).as("__s"))
    val wRn = W.partitionBy(col("__g")).orderBy(col("__s"), col("__t1"), col("__t2"))
    val wAll = W.partitionBy(col("__g"))
    w.select(col("__g"), col("__s"),
        row_number().over(wRn).as("__rn"), count(lit(1)).over(wAll).as("__nw"))
      .groupBy("__g")
      .agg(((max(when(col("__rn") === expr("(__nw + 1) div 2"), col("__s")))
          + max(when(col("__rn") === expr("(__nw + 2) div 2"), col("__s"))))
          .cast("double") / 4).as("hl_estimate"),
        max(col("__nw")).cast("long").as("n_walsh"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Kendall τ-b with tie corrections over an ordered series
    * (generalizes q_stat_46). x/y must be exact integers so tie
    * detection is never a float comparison. Tie counts follow the
    * canonical (scipy/R) convention: `tx` counts ALL x-tied pairs and
    * `ty` ALL y-tied pairs — a pair tied in BOTH x and y counts in
    * both — so τ-b = (nc − nd)/√((n0 − tx)(n0 − ty)) matches the
    * standard statistic even with duplicate (x, y) pairs.
    */
  def kendallTauB(series: DataFrame, tCol: String, xCol: String,
      yCol: String): DataFrame = {
    def DD(c: org.apache.spark.sql.Column) = c.cast("double")
    val a = series.select(col(tCol).as("__t1"), col(xCol).as("__x1"), col(yCol).as("__y1"))
    val b = series.select(col(tCol).as("__t2"), col(xCol).as("__x2"), col(yCol).as("__y2"))
    val p = a.join(b, col("__t1") < col("__t2"))
    p.agg(
        sum(when((col("__x1") < col("__x2") && col("__y1") < col("__y2")) ||
          (col("__x1") > col("__x2") && col("__y1") > col("__y2")), 1L).otherwise(0L)).as("nc"),
        sum(when((col("__x1") < col("__x2") && col("__y1") > col("__y2")) ||
          (col("__x1") > col("__x2") && col("__y1") < col("__y2")), 1L).otherwise(0L)).as("nd"),
        sum(when(col("__x1") === col("__x2"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("__y1") === col("__y2"), 1L).otherwise(0L)).as("ty"),
        count(lit(1)).as("n0"))
      .select(col("nc"), col("nd"), col("tx"), col("ty"), col("n0"),
        graft.functions.Num.round(DD(col("nc") - col("nd"))
          / sqrt(DD(col("n0") - col("tx")) * (col("n0") - col("ty"))), 6).as("tau_b"))
  }

  /** Brier score with the Murphy decomposition (generalizes q_ml_15):
    * `pmCol` = integral milli-unit forecasts 0..999, `yCol` = 0/1
    * outcomes; 10 equal bins. `brier` is the TRUE mean (p − y)²
    * (computed from the exact integer Σ(pm − 1000y)², NOT the binned
    * identity — with many distinct forecasts per bin rel − res + unc
    * is only an approximation); `resid` reports the decomposition gap
    * the binning leaves.
    */
  def brierDecomposition(df: DataFrame, pmCol: String, yCol: String): DataFrame = {
    def DD(c: org.apache.spark.sql.Column) = c.cast("double")
    val f = df.select(col(pmCol).as("__pm"), col(yCol).as("__y"))
    val b = f.groupBy(expr("__pm div 100").as("__bin"))
      .agg(count(lit(1)).as("__n"), sum("__pm").as("__sp"), sum("__y").as("__sy"))
    val t = f.agg(count(lit(1)).as("__nn"), sum("__y").as("__syy"),
      sum((col("__pm") - lit(1000L) * col("__y"))
        * (col("__pm") - lit(1000L) * col("__y"))).as("__bq"))
    val pbar = DD(col("__sp")) / col("__n") / 1000
    val ybar = DD(col("__sy")) / col("__n")
    val gbar = DD(col("__syy")) / col("__nn")
    b.crossJoin(broadcast(t))
      .agg(
        (sum(DD(col("__n")) * (pbar - ybar) * (pbar - ybar)) / max(col("__nn"))).as("__rel"),
        (sum(DD(col("__n")) * (ybar - gbar) * (ybar - gbar)) / max(col("__nn"))).as("__res"),
        max(gbar * (lit(1) - gbar)).as("__unc"),
        max(DD(col("__bq")) / 1000000 / col("__nn")).as("__bt"),
        max(col("__nn")).as("__nn2"))
      .select(col("__nn2").as("n_scored"),
        graft.functions.Num.round(col("__rel"), 6).as("reliability"),
        graft.functions.Num.round(col("__res"), 6).as("resolution"),
        graft.functions.Num.round(col("__unc"), 6).as("uncertainty"),
        graft.functions.Num.round(col("__bt"), 6).as("brier"),
        graft.functions.Num.round(col("__bt")
          - (col("__rel") - col("__res") + col("__unc")), 6).as("resid"))
  }

  /** √-scaled mixture quotas to an EXACT total via largest-remainder
    * rounding (generalizes q_pipe_12).
    */
  def sqrtQuota(df: DataFrame, groupCol: String, total: Long = 100L): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val l = df.groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("__n"))
    val w = l.select(col("__g"), col("__n"),
      floor(sqrt(col("__n").cast("double")) * 1000000).cast("long").as("__w6"))
    val wAll = W.partitionBy()
    val t = w.select(col("__g"), col("__n"), col("__w6"),
        (lit(total) * col("__w6")).as("__p"), sum(col("__w6")).over(wAll).as("__tw"))
      .select(col("__g"), col("__n"), col("__w6"),
        expr("__p div __tw").as("__q0"), (col("__p") % col("__tw")).as("__rem"))
    t.select(col("__g"), col("__n"), col("__w6"), col("__q0"), col("__rem"),
        row_number().over(W.orderBy(col("__rem").desc, col("__g"))).as("__rk"),
        (lit(total) - sum(col("__q0")).over(wAll)).as("__left"))
      .select(col("__g").as(groupCol), col("__n").as("n_docs"),
        col("__w6").as("weight6"),
        (col("__q0") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .cast("long").as("quota"))
  }

  /** Keyed pseudonymization Column: sha2-256 of salt ‖ key — the same
    * token on every engine/run, referentially consistent across tables
    * (generalizes q_priv_10).
    */
  def pseudonymize(key: org.apache.spark.sql.Column,
      salt: String): org.apache.spark.sql.Column =
    sha2(concat(lit(salt), lit("|"), key.cast("string")), 256)

  /** Canonicalize a URL Column: scheme-preserving (http stays http —
    * the prefix length is derived from the scheme, not hard-coded),
    * lowercase host, strip www., drop EVERY utm_* query param wherever
    * it sits (leading `?`, middle `&`, or trailing — no dangling
    * separators left behind), trim the trailing slash (generalizes
    * q_dedup_31_url_canonical's cleanup).
    */
  def canonicalizeUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scheme = lower(substring_index(url, "://", 1))
    val host = split_part(url, lit("/"), lit(3))
    val rest = url.substr(length(scheme) + length(host) + 4, lit(100000))
    // pass 1 drops utm params followed by another param (lookbehind
    // anchors the name to its ? or & separator so a non-utm param
    // whose name merely ends in "utm_..." is untouched; keeps the
    // leading separator for what follows); pass 2 drops a trailing utm
    // param together with its own leading ? or &, whether it ends the
    // string or abuts a #fragment
    val noUtm = regexp_replace(
      regexp_replace(rest, "(?<=[?&])utm_[A-Za-z_]+=[^&#]*&", ""),
      "[?&]utm_[A-Za-z_]+=[^&#]*(?=#|$)", "")
    concat(scheme, lit("://"),
      regexp_replace(lower(host), "^www\\.", ""),
      rtrim(noUtm, "/"))
  }

  /** The same K rows from every group on any cluster size or engine:
    * bottom-k by the portable multiplicative hash, as a typed
    * Aggregator whose K-bounded buffer partial-aggregates map-side
    * (generalizes q_udaf_4). Output: (group, rn 1..k, key).
    */
  def bottomKSample(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 5): DataFrame = {
    val agg = udaf(new graft.operators.Round7nOps.BottomKAgg(k))
    df.groupBy(groupCol)
      .agg(agg(col(keyCol)).as("__bk"))
      .select(col(groupCol), posexplode(col("__bk.ks")).as(Seq("__pos", keyCol)))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rn"), col(keyCol))
  }

  /** Exact order statistics of a LONG column WITHOUT a single-partition
    * global sort — the scale form that replaces the
    * `row_number().over(Window.orderBy(v))` rank-pick pattern on
    * fact-sized input (where the no-partition window funnels the whole
    * table through one task).
    *
    * Shape: range-partition + per-partition sort on the value (ONE
    * shuffle; each partition owns a contiguous, locally-sorted value
    * range), count rows per partition (a P-row driver exchange),
    * prefix-sum the histogram, then scan only the partitions that own
    * a requested rank for their local indices — each task ~N/P rows,
    * bounded by cluster parallelism, not data size. Both jobs share
    * one RDD lineage, so the shuffle map output is computed once and
    * reused — no cache or checkpoint, nothing pinned in the block
    * manager. The value at global rank r does not depend on where
    * Spark draws the range boundaries: equal values always land in the
    * same range partition, so the histogram offsets identify the
    * owning partition and local index deterministically, and the
    * picked VALUE is unique even when ranks tie.
    *
    * `ranksOf` receives the total row count n and returns the 1-based
    * ranks wanted (ascending value order). Returns (n, rank -> value).
    * The collect is O(P + #ranks) — the same bounded-driver-action
    * class as a 1-row aggregate. `valueCol` must be non-null.
    */
  def exactRankPick(df: DataFrame, valueCol: String,
      ranksOf: Long => Seq[Long], partitions: Int = 0): (Long, Map[Long, Long]) = {
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // range-partition + local sort ONCE; the count job and the pick job
    // share the same RDD lineage, so the shuffle map output is computed
    // once and reused — no cache, no checkpoint, nothing to evict
    val sorted = df.select(col(valueCol).cast("long").as("__v"))
      .repartitionByRange(parts, col("__v"))
      .sortWithinPartitions("__v")
      .rdd.map(_.getLong(0))
    val hist = sorted
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
      .collect().sortBy(_._1)
    val n = hist.map(_._2).sum
    // empty input: no order statistics exist — return (0, empty) and
    // let callers decide (the window form this replaces yielded a
    // null-valued row; throwing here would be a behavior change)
    if (n == 0L) return (0L, Map.empty)
    val ranks = ranksOf(n).distinct
    require(ranks.nonEmpty && ranks.forall(r => r >= 1 && r <= n),
      s"exactRankPick: ranks $ranks outside [1, $n]")
    var off = 0L
    val spans = hist.map { case (pid, cnt) => val lo = off; off += cnt; (pid, lo, off) }
    // global rank r lives in the partition whose span (lo, hi] contains
    // it, at local 0-based index r - lo - 1
    val wanted: Map[Int, Seq[(Long, Long)]] = ranks
      .map { r =>
        val (pid, lo, _) = spans.find { case (_, lo2, hi) => r > lo2 && r <= hi }.get
        (pid, r, r - lo - 1)
      }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(x => (x._2, x._3)) }
    val picked = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        wanted.get(pid) match {
          case None => Iterator.empty
          case Some(rs) =>
            val want = rs.map(_._2).toSet
            // manual Long counter, NOT zipWithIndex: its Int index
            // wraps negative past 2^31 rows per partition — exactly
            // the at-scale regime this helper exists for
            var idx = -1L
            it.flatMap { v =>
              idx += 1
              if (want(idx)) Iterator.single((pid, idx, v)) else Iterator.empty
            }
        }
      }
      .collect().map { case (pid, i, v) => (pid, i) -> v }.toMap
    (n, wanted.toSeq.flatMap { case (pid, rs) =>
      rs.map { case (g, l) => g -> picked((pid, l)) }
    }.toMap)
  }

  /** Exact global 1-based rank over a TOTAL order (the `orderCols`
    * must be a unique key, so ties cannot reorder across engines)
    * WITHOUT a single-partition sort: range-partition on the order
    * key, count rows per partition, broadcast the P-row prefix-sum
    * offsets back, and add each partition's local `row_number` to its
    * offset. Two fact shuffles (range + the pid-keyed window) replace
    * the one-task global sort; every stage is ~N/P per task.
    *
    * Returns the input columns plus `rankCol`. The driver action is
    * the P-row histogram collect — bounded by parallelism.
    */
  def exactGlobalRank(df: DataFrame, orderCols: Seq[String],
      rankCol: String, partitions: Int = 0): DataFrame =
    exactGlobalRankBy(df, orderCols.map(col), rankCol, partitions)

  /** Column-expression form of [[exactGlobalRank]] — use for mixed
    * asc/desc orders, e.g. `Seq(col("cnt").desc, col("token"))`. The
    * order must still be a total (unique) one.
    */
  def exactGlobalRankBy(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      rankCol: String, partitions: Int = 0): DataFrame =
    exactGlobalRankByN(df, orderCols, rankCol, partitions)._2

  /** [[exactGlobalRankBy]] that ALSO returns the total row count n —
    * free off the per-partition count pass, so ntile-style callers
    * need no separate `df.count()` scan. The machinery is the
    * rfmSegments shape (range-partition + local sort + per-partition
    * offsets): the count job and the rank job share one RDD lineage,
    * so the range shuffle is computed once and its map output reused —
    * no cache/checkpoint, nothing pinned in the block manager.
    */
  def exactGlobalRankByN(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      rankCol: String, partitions: Int = 0): (Long, DataFrame) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val rdd = sorted.rdd
    val hist = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)))
      .collect().sortBy(_._1)
    var off = 0L
    val offsets = hist.map { case (pid, cnt) => val lo = off; off += cnt; (pid, lo) }.toMap
    val n = off
    val ranked = df.sparkSession.createDataFrame(
      rdd.mapPartitionsWithIndex { (pid, it) =>
        // manual Long counter, NOT zipWithIndex (Int index wraps past
        // 2^31 rows per partition — the at-scale regime this is for)
        var rank = offsets(pid)
        it.map { r => rank += 1; Row.fromSeq(r.toSeq :+ rank) }
      },
      StructType(sorted.schema.fields :+ StructField(rankCol, LongType, nullable = false)))
    (n, ranked)
  }

  /** Per-GROUP exact 1-based rank + per-group row count WITHOUT a
    * constant-width window sort — the grouped sibling of
    * [[exactGlobalRankByN]] (r12 verdict item 1). The window form
    * `row_number().over(Window.partitionBy(g).orderBy(o))` creates ONE
    * task per distinct g; when g has 2-25 values over a row-scaled
    * input that is a straggler pair each sorting a corpus-sized slice.
    * Here the data is range-partitioned by (groupCols, orderCols) —
    * every task ~N/P rows regardless of the group cardinality — then a
    * per-(partition, group) histogram (P×G rows, driver-bounded: G is
    * constant-cardinality by the caller's contract) supplies each
    * partition's starting rank within its groups, and a second pass
    * over the SAME shuffle output adds local row numbers to those
    * offsets. The count/rank jobs share one RDD lineage, so the range
    * shuffle computes once — no cache, nothing pinned.
    *
    * Returns the input columns plus `rankCol` (1-based rank within the
    * group, ordered by orderCols) and `nCol` (the group's row count) —
    * the exact pair the window form produced. Ties in (groupCols,
    * orderCols) land in one range partition and take consecutive
    * arbitrary ranks, so either make the order total (unique key) or
    * pick only VALUES at ranks (a rank-pick of a tied value is the
    * same value whichever tie holds the rank — exactRankPick's
    * argument).
    */
  def exactGroupRankCount(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], rankCol: String,
      nCol: String, partitions: Int = 0): DataFrame =
    groupRankPrefix(df, groupCols, orderCols, rankCol, nCol, Nil, partitions)

  /** The general per-group order machinery behind
    * [[exactGroupRankCount]]: one range shuffle on (groupCols,
    * orderCols) carries the per-group 1-based rank (`rankCol`), the
    * group's row count (`nCol`), and — per `valueOutCols` entry
    * (value, runningOut, totalOut) — the inclusive per-group running
    * sum of an integral column plus (when totalOut is non-empty) the
    * group's total. This is the grouped sibling of both
    * [[exactGlobalRankByN]] and [[prefixSumN]] in a single pass: the
    * per-(partition, group) histogram (counts AND sums — P×G rows,
    * driver-bounded when G is constant-cardinality) supplies each
    * partition's starting rank/sums within its groups, and the second
    * pass over the SAME shuffle output adds local row numbers and
    * running sums to those offsets. Integer sums are order-insensitive,
    * so running sums are bit-identical to the window form under any
    * tie order (the ranks need a total order, or value-only picks —
    * see exactGroupRankCount's doc).
    */
  def groupRankPrefix(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], rankCol: String,
      nCol: String, valueOutCols: Seq[(String, String, String)],
      partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(groupCols.nonEmpty, "groupRankPrefix needs group columns")
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = groupCols.map(col) ++ orderCols
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val gIdx = groupCols.map(sorted.schema.fieldIndex).toList
    val vIdx = valueOutCols.map { case (v, _, _) => sorted.schema.fieldIndex(v) }
    val nV = vIdx.size
    def longAt(r: Row, i: Int): Long = r.get(i) match {
      case l: Long => l
      case x: Int => x.toLong
      case x: Short => x.toLong
      case x: Byte => x.toLong
      case other => throw new IllegalArgumentException(
        s"groupRankPrefix: non-integral value $other")
    }
    val rdd = sorted.rdd
    // pass 1: per-(partition, group) count + value sums. Groups are
    // contiguous within a partition (sorted by group first), so this is
    // a streaming run-length fold, and the collect is P×G rows —
    // bounded by parallelism times the (constant) group cardinality,
    // the same driver-action class as exactGlobalRankByN's histogram.
    val hist: Array[(Int, Seq[(List[Any], Array[Long])])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val runs = scala.collection.mutable.ArrayBuffer.empty[(List[Any], Array[Long])]
        var cur: List[Any] = null
        var agg: Array[Long] = null // [count, sum_0, ..., sum_{nV-1}]
        it.foreach { r =>
          val g = gIdx.map(r.get)
          if (cur == null || g != cur) {
            if (cur != null) runs += ((cur, agg))
            cur = g; agg = new Array[Long](1 + nV)
          }
          agg(0) += 1
          var i = 0
          while (i < nV) { agg(1 + i) += longAt(r, vIdx(i)); i += 1 }
        }
        if (cur != null) runs += ((cur, agg))
        Iterator.single((pid, runs.toSeq))
      }.collect().sortBy(_._1)
    // each (partition, group)'s starting rank/sums = that group's
    // totals over earlier partitions; group totals fall out of the fold
    val acc = scala.collection.mutable.Map.empty[List[Any], Array[Long]]
    val starts: Map[Int, Map[List[Any], Array[Long]]] = hist.map { case (pid, gs) =>
      pid -> gs.map { case (g, a) =>
        val lo = acc.getOrElseUpdate(g, new Array[Long](1 + nV)).clone()
        val cum = acc(g)
        var i = 0
        while (i <= nV) { cum(i) += a(i); i += 1 }
        (g, lo)
      }.toMap
    }.toMap
    val totals: Map[List[Any], Array[Long]] = acc.toMap
    // pass 2: local row number + running sums on top of the group's
    // partition offsets; group totals ride along as constants per run
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      val offs = starts.getOrElse(pid, Map.empty)
      var cur: List[Any] = null
      var run: Array[Long] = null
      var tot: Array[Long] = null
      it.map { r =>
        val g = gIdx.map(r.get)
        if (cur == null || g != cur) {
          cur = g; run = offs(g).clone(); tot = totals(g)
        }
        run(0) += 1
        var i = 0
        while (i < nV) { run(1 + i) += longAt(r, vIdx(i)); i += 1 }
        val extra = scala.collection.mutable.ArrayBuffer[Any](run(0), tot(0))
        i = 0
        while (i < nV) {
          extra += run(1 + i)
          if (valueOutCols(i)._3.nonEmpty) extra += tot(1 + i)
          i += 1
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }
    val extraFields = Seq(StructField(rankCol, LongType, nullable = false),
      StructField(nCol, LongType, nullable = false)) ++
      valueOutCols.flatMap { case (_, runOut, totOut) =>
        Seq(StructField(runOut, LongType, nullable = false)) ++
          (if (totOut.nonEmpty) Seq(StructField(totOut, LongType, nullable = false)) else Nil)
      }
    df.sparkSession.createDataFrame(ranked,
      StructType(sorted.schema.fields ++ extraFields))
  }

  /** Per-group `lead` of an integral column WITHOUT a constant-width
    * window sort — the grouped sibling of [[adjacentPairs]]: range-
    * partition on (groupCols, orderCols), per-partition lookahead for
    * intra-partition leads, and a P-row driver exchange of each
    * partition's FIRST (group, value) to stitch partition boundaries
    * (a partition's last row leads into the next non-empty partition's
    * first row iff the group matches). Returns the input plus `outCol`
    * (nullable: the last row of each group has no lead — exactly the
    * window form's null).
    */
  def groupLeadLong(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column], valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(groupCols.nonEmpty, "groupLeadLong needs group columns")
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = groupCols.map(col) ++ orderCols
    val sorted = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val gIdx = groupCols.map(sorted.schema.fieldIndex).toList
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def longAt(r: Row): Long = r.get(vIdx) match {
      case l: Long => l
      case x: Int => x.toLong
      case other => throw new IllegalArgumentException(
        s"groupLeadLong: non-integral value $other")
    }
    val rdd = sorted.rdd
    // pass 1: each non-empty partition's first (group, value) — the
    // P-row boundary exchange (shuffle map output reused by pass 2)
    val heads: Array[(Int, List[Any], Long)] = rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val r = it.next()
        Iterator.single((pid, gIdx.map(r.get), longAt(r)))
      } else Iterator.empty
    }.collect().sortBy(_._1)
    // partition p's successor head = the first head with pid > p
    val nextHead: Map[Int, (List[Any], Long)] = {
      val pids = heads.map(_._1)
      (0 until parts).flatMap { p =>
        pids.find(_ > p).map { np =>
          val h = heads.find(_._1 == np).get
          p -> (h._2, h._3)
        }
      }.toMap
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val succ = nextHead.get(pid)
      new Iterator[Row] {
        private var prev: Row = if (it.hasNext) it.next() else null
        def hasNext: Boolean = prev != null
        def next(): Row = {
          val r = prev
          val g = gIdx.map(r.get)
          val lead: Any =
            if (it.hasNext) {
              prev = it.next()
              if (gIdx.map(prev.get) == g) longAt(prev) else null
            } else {
              prev = null
              succ match {
                case Some((hg, hv)) if hg == g => hv
                case _ => null
              }
            }
          Row.fromSeq(r.toSeq :+ lead)
        }
      }
    }
    df.sparkSession.createDataFrame(out,
      StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = true)))
  }

  /** Column-count form of [[ntileOfRank]] for PER-GROUP ntile: `nCol`
    * is the group's row count (e.g. exactGroupRankCount's nCol) instead
    * of a driver-side constant. Same exact builtin semantics: the first
    * n%k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋.
    */
  def ntileOfRankN(rankCol: org.apache.spark.sql.Column,
      nCol: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("long")
    val base = idiv(nCol, lit(k.toLong))
    val rem = pmod(nCol, lit(k.toLong))
    val cut = rem * (base + 1)
    when(rankCol <= cut, idiv(rankCol - 1, base + 1) + 1)
      .otherwise(rem + idiv(rankCol - cut - 1, greatest(base, lit(1L))) + 1)
      .cast("long")
  }

  /** Shared tail of q_stream_30_funnel_time and its streaming twin
    * (r12 verdict item 3 — the two copies could drift): per-hop user
    * count plus exact order-statistic median/p90 of the integer gaps,
    * truncated to minutes. Input: (hop, gap_us). The ranks come from
    * [[exactGroupRankCount]] — scale-safe under the 2-value hop key
    * (the window form was a 2-task corpus sort) — and the picks are
    * value-only, so gap_us ties cannot move the answer.
    */
  def funnelGapStats(hops: DataFrame): DataFrame = {
    val r = exactGroupRankCount(hops, Seq("hop"), Seq(col("gap_us")), "rn", "n")
    r.groupBy("hop")
      .agg(max("n").as("n_users"),
        (max(when(col("rn") === floor((col("n") + 1) / lit(2.0)).cast("long"), col("gap_us")))
          / 60000000L).cast("long").as("median_minutes"),
        (max(when(col("rn") === floor((lit(9) * col("n") + 9) / lit(10.0)).cast("long"),
          col("gap_us"))) / 60000000L).cast("long").as("p90_minutes"))
      .orderBy("hop")
  }

  /** Exact running sum of a LONG column over a TOTAL order WITHOUT a
    * single-partition window: range-partition on the order key, sum
    * each partition (P-row aggregate), prefix-sum the per-partition
    * totals on the driver, and add each partition's offset to its
    * local cumulative sum. Integer sums are order-insensitive, so the
    * result is bit-identical to the one-task
    * `sum(v).over(Window.orderBy(...))` form it replaces. Returns the
    * input plus `outCol` (the inclusive running sum).
    */
  def prefixSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame =
    prefixSumN(df, orderCols, Seq(valueCol -> outCol), partitions)

  /** Multi-column form of [[prefixSum]]: all running sums share ONE
    * range shuffle and one P-row offset exchange.
    */
  def prefixSumN(df: DataFrame, orderCols: Seq[String],
      valueOutCols: Seq[(String, String)], partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(valueOutCols.nonEmpty, "prefixSumN needs at least one value column")
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val vIdx = valueOutCols.map { case (v, _) => sorted.schema.fieldIndex(v) }
    def longAt(r: Row, i: Int): Long = r.get(i) match {
      case l: Long => l
      case x: Int => x.toLong
      case x: Short => x.toLong
      case x: Byte => x.toLong
      case other => throw new IllegalArgumentException(
        s"prefixSumN: non-integral value $other")
    }
    val rdd = sorted.rdd
    // pass 1: per-partition totals (the count/sum job and the cumsum
    // job share one RDD lineage → the range shuffle computes once)
    val hist = rdd.mapPartitionsWithIndex { (pid, it) =>
      val sums = Array.fill(vIdx.size)(0L)
      it.foreach(r => vIdx.indices.foreach(i => sums(i) += longAt(r, vIdx(i))))
      Iterator((pid, sums.toSeq))
    }.collect().sortBy(_._1)
    val offs = Array.fill(vIdx.size)(0L)
    val offsets: Map[Int, Seq[Long]] = hist.map { case (pid, sums) =>
      val lo = offs.toSeq
      sums.indices.foreach(i => offs(i) += sums(i))
      pid -> lo
    }.toMap
    // pass 2: local running sums + the exact integer partition offsets
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = offsets(pid).toArray
      it.map { r =>
        vIdx.indices.foreach(i => run(i) += longAt(r, vIdx(i)))
        Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    df.sparkSession.createDataFrame(out,
      StructType(sorted.schema.fields ++
        valueOutCols.map { case (_, o) => StructField(o, LongType, nullable = false) }))
  }

  /** Every adjacent pair of a totally-ordered LONG id column WITHOUT a
    * single-partition `lead` window: range-partition on the id,
    * per-partition `lead` (intra-partition pairs), then stitch each
    * partition's last id to the next non-empty partition's first id —
    * a P-row driver-side boundary exchange. Returns (idCol, `nxtCol`)
    * for every consecutive pair, exactly the rows the global
    * `lead(id, 1).over(Window.orderBy(id))` form emits (minus the
    * final null-next row).
    */
  def adjacentPairs(df: DataFrame, idCol: String, nxtCol: String,
      partitions: Int = 0): DataFrame = {
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.select(col(idCol).cast("long").as(idCol))
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
      .rdd.map(_.getLong(0))
    // pass 1: non-empty partitions' (first, last); the boundary pairs
    // stitch partition p's last id to the next non-empty partition's
    // first id — a P-row driver exchange (shuffle reused by pass 2)
    val bounds = sorted.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val first = it.next(); var last = first
        it.foreach(last = _)
        Iterator((pid, first, last))
      } else Iterator.empty
    }.collect().sortBy(_._1)
    val cross = bounds.sliding(2).collect {
      case Array((_, _, last), (_, first, _)) => (last, first)
    }.toSeq
    import df.sparkSession.implicits._
    val intra = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        var prev = it.next()
        it.map { v => val p = (prev, v); prev = v; p }
      }
    }.toDF(idCol, nxtCol)
    if (cross.isEmpty) intra
    else intra.union(df.sparkSession.createDataFrame(cross).toDF(idCol, nxtCol))
  }

  /** Spark/DuckDB `ntile(k)` bucket for a row at global 1-based rank
    * `rankCol` out of `n` total: the first n%k buckets take ⌈n/k⌉
    * rows, the rest ⌊n/k⌋ — the exact builtin semantics, expressed on
    * a distributed rank so no single-partition window is needed.
    */
  def ntileOfRank(rankCol: org.apache.spark.sql.Column, n: Long,
      k: Int): org.apache.spark.sql.Column = {
    // exact integer division (Spark's `/` is double division; the
    // subtract-mod form keeps the quotient an exactly-representable
    // integer for any rank < 2^53)
    def idiv(a: org.apache.spark.sql.Column, b: Long) =
      ((a - pmod(a, lit(b))) / b).cast("long")
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1)
    when(rankCol <= cut, idiv(rankCol - 1, base + 1) + 1)
      .otherwise(lit(rem) + idiv(rankCol - cut - 1, math.max(base, 1L)) + 1)
      .cast("long")
  }
}


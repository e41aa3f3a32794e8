package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Anchor.AnchorOps

/** Sequence/graph analytics over the event log: Markov transition
  * structure and PageRank-style node importance — the behavioral-model
  * layer (next-event prediction features, funnel diagnostics, node
  * importance for sampling priorities) that sits on top of the edge
  * construction in [[CoOccurrence]].
  *
  * Determinism discipline: PageRank is computed in FIXED-POINT integer
  * arithmetic (scale 10⁹, floor divisions) so every iteration is exact
  * and order-free — a float PageRank would accumulate in shuffle order
  * and drift across engines/partitionings. Transition probabilities are
  * one double division of exact longs.
  */
object Graph {

  /** Per-user consecutive event-type transitions with row-normalized
    * probabilities — the first-order Markov model of the event stream.
    *
    * One lag window keyed by user (linear, full parallelism), one
    * (src, dst) count shuffle (map-side combined), then the src-keyed
    * totals re-join — transition-matrix-sized frames throughout. */
  def transitionCounts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val steps = events
      .select(col("user_id"), col("event_type").as("dst"),
        lag(col("event_type"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
    val counts = steps.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("n_src"))
    counts.join(totals, "src")
      .select(col("src"), col("dst"), col("n"), col("n_src"),
        (col("n").cast("double") / col("n_src").cast("double")).as("p"))
      .orderBy(col("src"), col("dst"))
  }

  /** Two-hop path composition: the count of length-2 paths a → mid → b
    * for every (a, b) — the integer-exact matrix square of the
    * transition-count graph (path counts multiply and sum exactly;
    * composing PROBABILITIES would float-drift with shuffle order).
    * The share column normalizes per source with one double division.
    *
    * This is the building block of multi-hop reachability and
    * friends-of-friends scoring: the self-join keys on the
    * intermediate node (shuffle by mid — or co-partitioned/bucketed by
    * node at scale), and the output stays |nodes|²-bounded. */
  def twoStepPaths(events: DataFrame): DataFrame = {
    val c = transitionCounts(events).select(col("src"), col("dst"),
      col("n"))
    val paths = c.as("a")
      .join(c.as("b"), col("a.dst") === col("b.src"))
      .groupBy(col("a.src").as("src"), col("b.dst").as("dst"))
      .agg(sum(col("a.n") * col("b.n")).as("n_paths"))
    val totals = paths.groupBy(col("src"))
      .agg(sum(col("n_paths")).as("n_src"))
    paths.join(totals, "src")
      .select(col("src"), col("dst"), col("n_paths"),
        (col("n_paths").cast("double") / col("n_src").cast("double"))
          .as("share"))
      .orderBy(col("src"), col("dst"))
  }

  /** Weighted PageRank over a directed edge list, `iters` synchronous
    * iterations in fixed-point arithmetic (scale 10⁹):
    *
    *   contrib(j→i) = (r(j) · w_ji) div W_j
    *   r'(i)        = (15·S) div 100 + (85 · Σ contrib) div 100
    *
    * Every operation is an exact integer product/floor-division, so the
    * result is bit-identical across engines, partitionings, and reruns
    * — the property a float PageRank cannot give (shuffle-order sums).
    * Headroom: Σ rank mass ≤ N·S, so N up to ~10⁸ nodes fits int64
    * through the ·85 product.
    *
    * Plan shape per iteration: ranks join edges on src (shuffle keyed
    * by src — or co-partitioned/bucketed by src at scale, making every
    * iteration exchange-free on the edge side), contribution agg keyed
    * by dst (map-side combined), left join back to the node set so
    * sinks keep receiving the teleport mass. Classic distributed
    * PageRank; iterations are a driver loop over lazy plans, data
    * never collects. */
  def pagerank(edges: DataFrame, iters: Int = 3): DataFrame = {
    val S = 1000000000L
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    var ranks = nodes.select(col("node"), lit(S).as("r"))
    for (_ <- 1 to iters) {
      val contribs = edges.join(outW, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r * w div w_out").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodes.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(15L * S / 100L) +
            expr("85 * coalesce(sc, 0L) div 100")).as("r"))
    }
    ranks
      .select(col("node"), col("r").as("rank_fp"),
        (col("r").cast("double") / lit(S.toDouble)).as("rank"))
      .orderBy(col("rank_fp").desc, col("node"))
  }

  /** PageRank of the event-type transition graph — node importance of
    * the behavioral Markov chain. The edge table materializes once
    * (`Anchor.cut` — reliable checkpoint when a dir is set) before the
    * iteration loop: every iteration's
    * plan references edges, out-weights, AND the node set, so without
    * truncation the event scan + lag window would re-execute ~3× per
    * iteration — the standard checkpoint-between-iterations discipline
    * of distributed PageRank (at cluster scale, a reliable checkpoint
    * or a persisted table between supersteps). */
  def eventTypePagerank(events: DataFrame, iters: Int = 3): DataFrame =
    pagerank(transitionCounts(events)
      .select(col("src"), col("dst"), col("n").as("w"))
      .anchored, iters)

  /** g06: per-node triangle count + local clustering coefficient over
    * the symmetrized kNN graph ([[Similarity.knnGraph]]) — the
    * community-structure audit of the neighbor graph the curation
    * passes consume: a node whose neighbors are also neighbors of each
    * other (coefficient → 1) sits inside a tight duplicate/template
    * community; coefficient → 0 marks hub-like boilerplate bridges.
    * The standard follow-on to SemDeDup-style pruning (d15): triangles
    * are the smallest unit of "my neighbors agree with each other".
    *
    * Plan shape: the kNN edge list (already cell-blocked, so
    * |edges| ≤ k·|V|) symmetrizes into an undirected a<b edge set via
    * least/greatest + DISTINCT (one shuffle on the edge key). Wedges
    * enumerate per lowest-id endpoint: edges(a,b) ⋈ edges(a,c), b<c —
    * an equi-join on `a` whose output is Σ_a d(a)², bounded because a
    * kNN graph's degree is ≤ 2k before hub in-links; the closing edge
    * (b,c) resolves with a semi-equi-join back against the edge set
    * (each triangle counted exactly once, at its smallest vertex).
    * Per-node counts then explode each triangle to its 3 corners — 3
    * rows per triangle, never corpus-scale. At 100 TB the refinement
    * is degree-ordering instead of id-ordering (direct each edge
    * toward the higher-degree endpoint, bounding wedge work by
    * arboricity) — same plan shape, one extra degree join; id-order
    * keeps the oracle deterministic here.
    *
    * Coefficient = 2·T / (d·(d−1)) — ONE double division of exact
    * longs per node (< 2⁵³), bit-identical across engines; d ≤ 1
    * nodes report 0.0 by the CASE guard. */
  def knnTriangles(embeddings: DataFrame, k: Int = 5,
      nCells: Int = 32): DataFrame =
    trianglesOnEdges(Similarity.knnGraphShared(embeddings, k, nCells)
      .select(col("vec_id"), col("neighbor_id")))

  /** The edge-level core of [[knnTriangles]]: takes any directed
    * (vec_id, neighbor_id) pair list, symmetrizes, and runs the
    * id-ordered wedge-join triangle census. */
  private[operators] def trianglesOnEdges(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(least(col("vec_id"), col("neighbor_id")).as("ea"),
        greatest(col("vec_id"), col("neighbor_id")).as("eb"))
      .distinct()
      .anchored // referenced 4×: wedge (×2), close, degree
    val wedges = edges.as("x")
      .join(edges.as("y"),
        col("x.ea") === col("y.ea") && col("x.eb") < col("y.eb"))
      .select(col("x.ea").as("ta"), col("x.eb").as("tb"),
        col("y.eb").as("tc"))
    val triangles = wedges.join(edges,
      col("tb") === col("ea") && col("tc") === col("eb"), "left_semi")
    val perNode = triangles
      .select(explode(array(col("ta"), col("tb"), col("tc")))
        .as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_triangles"))
    val degrees = edges
      .select(explode(array(col("ea"), col("eb"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("degree"))
    degrees.join(perNode, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") <= 1, lit(0.0))
          .otherwise((coalesce(col("n_triangles"), lit(0L)) * 2L)
            .cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .as("clustering_coeff"))
      .orderBy(col("vec_id"))
  }

  /** g07: shared-neighbor link prediction over the s21 kNN graph —
    * for every node pair citing ≥ `minShared` common out-neighbors,
    * the common-neighbor count and the Jaccard of their neighbor
    * lists (Liben-Nowell & Kleinberg 2003's common-neighbors /
    * Jaccard predictors). On an embedding kNN graph this is the
    * NN-Descent neighborhood-agreement signal: pairs with high
    * neighborhood overlap are near-duplicates or missing edges —
    * the graph-side confirmation the d06 distance-side near-dup
    * sweep wants before merging clusters.
    *
    * Plan shape: inverted index on the SHARED neighbor (the d02/d04
    * posting-list shape — never an all-pairs product): the kNN edge
    * list self-joins on neighbor_id, so work is Σ indeg², bounded by
    * hub in-degree, not |V|². A kNN graph's out-degree is fixed at k
    * but in-degree is hubness-skewed; at 100 TB the production form
    * caps postings (DefaultMaxDocFreq-style: a neighbor cited by
    * thousands of nodes separates none of them) and relies on AQE
    * skew splitting — the fixture's hubness is mild, so the exact
    * uncapped form stays the oracle. Degree joins are |V|-keyed;
    * jaccard is ONE double division of exact longs. */
  def sharedNeighborLinks(embeddings: DataFrame, k: Int = 5,
      minShared: Long = 2L, nCells: Int = 32): DataFrame =
    sharedNeighborsOnEdges(Similarity.knnGraphShared(embeddings, k, nCells)
      .select(col("vec_id"), col("neighbor_id")), minShared)

  /** The edge-level core of [[sharedNeighborLinks]]: takes any directed
    * (vec_id, neighbor_id) edge list and computes common-out-neighbor
    * counts + neighbor-list Jaccard for every id-ordered source pair. */
  private[operators] def sharedNeighborsOnEdges(edges: DataFrame,
      minShared: Long): DataFrame = {
    val knn = edges
      .anchored // referenced 3×: posting self-join, degree
    val pairs = knn.as("x")
      .join(knn.as("y"),
        col("x.neighbor_id") === col("y.neighbor_id") &&
          col("x.vec_id") < col("y.vec_id"))
      .groupBy(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
    val deg = knn.groupBy(col("vec_id")).agg(count(lit(1)).as("deg"))
    pairs
      .join(deg.select(col("vec_id").as("a"), col("deg").as("deg_a")),
        "a")
      .join(deg.select(col("vec_id").as("b"), col("deg").as("deg_b")),
        "b")
      .filter(col("n_shared") >= minShared)
      .select(col("a"), col("b"), col("n_shared"), col("deg_a"),
        col("deg_b"),
        (col("n_shared").cast("double") /
          (col("deg_a") + col("deg_b") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  /** g08: DETERMINISTIC random walks over the s21 kNN graph — the
    * DeepWalk/node2vec corpus generator (Perozzi et al. 2014): per
    * start node, `nWalks` walks of `walkLen` steps whose "random"
    * neighbor choice is the argmin of md5(start, walk, step, node,
    * candidate) — a seeded PRNG both engines reproduce bit-for-bit,
    * so the walk corpus (the thing a skip-gram embedding trains on)
    * is hash-verifiable, re-runnable, and append-stable where a real
    * RNG would be none of those. Different (walk_no, step) contexts
    * decorrelate choices exactly like per-walk seeds.
    *
    * Plan shape: the edge list is the SHARED materialized s21 graph
    * artifact ([[Similarity.knnGraphShared]] — referenced every step); each of the walkLen steps is ONE
    * frontier ⋈ edges equi-join on the current node plus a
    * (start, walk)-keyed min_by argmin — map-side partial, k
    * candidate rows per walk per split. Frontier size is constant
    * (starts × nWalks) across steps, so total work is walkLen
    * bounded joins — the k-medians/PageRank loop discipline, NOT a
    * data-dependent recursion. Walks from dead-end nodes simply stop
    * (the kNN graph has out-degree k everywhere, so only filtered
    * subgraphs hit this). */
  def deterministicWalks(embeddings: DataFrame, k: Int = 5,
      nWalks: Int = 2, walkLen: Int = 3, nCells: Int = 32): DataFrame = {
    val edges = Similarity.knnGraphShared(embeddings, k, nCells)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val starts = edges.select(col("src").as("start_id")).distinct()
      .select(col("start_id"),
        explode(sequence(lit(0L), lit(nWalks - 1L))).as("walk_no"))
    var frontier = starts
      .select(col("start_id"), col("walk_no"),
        col("start_id").as("node"))
    var walks = frontier.select(col("start_id"), col("walk_no"),
      lit(0L).as("step"), col("node"))
    for (s <- 1 to walkLen) {
      val stepped = frontier
        .join(edges, frontier("node") === edges("src"))
        .withColumn("h", md5(concat_ws(":", col("start_id"),
          col("walk_no"), lit(s.toLong), col("node"), col("dst"))))
        .groupBy(col("start_id"), col("walk_no"))
        .agg(min_by(col("dst"), struct(col("h"), col("dst")))
          .as("node"))
      frontier = stepped.anchored
      walks = walks.unionByName(frontier.select(col("start_id"),
        col("walk_no"), lit(s.toLong).as("step"), col("node")))
    }
    walks.orderBy(col("start_id"), col("walk_no"), col("step"))
  }

  /** g10: PERSONALIZED PAGERANK SEED EXPANSION over the s21 kNN graph —
    * the seed-and-expand data-selection move (Andersen et al. 2006
    * local graph clustering; the "start from a curated high-quality
    * seed set, walk the similarity graph outward" selection pattern
    * behind graph-based corpus curation): teleport mass is pinned to
    * the SEED nodes (here the fixture's `vec_id % 50 = 0` curated
    * slice) instead of spread uniformly, so rank flows outward from the
    * seeds and a node's PPR score measures how reachable it is from
    * quality — the expansion set is every node with nonzero mass after
    * `iters` rounds, ranked.
    *
    * Fixed-point discipline (the g04 contract verbatim): ranks live at
    * scale 10⁹, every step is an exact integer product/floor-division
    * — r'(i) = 15·S·[i∈seeds] div 100 + 85·Σ_j r(j) div outdeg(j)
    * div 100 — so the whole iteration is order-free and bit-identical
    * across engines/partitionings; a float PPR would accumulate in
    * shuffle order. Headroom: total mass ≤ |seeds|·S through every
    * round, so the ·85 product stays far inside int64 for any corpus.
    *
    * Plan shape: the kNN edge list is the SHARED materialized s21
    * graph artifact ([[Similarity.knnGraphShared]] — referenced by
    * every round plus the degree/node frames); each round
    * is ONE ranks ⋈ edges equi-join on the current node + a dst-keyed
    * partial agg (map-side combined) + the left join back to the node
    * set — the distributed-PageRank loop, iterations a driver loop over
    * lazy plans, data never collects. Frontier sparsity is free: nodes
    * at rank 0 contribute 0-mass rows that the partial agg collapses. */
  def pprSeedExpansion(embeddings: DataFrame, k: Int = 5,
      nCells: Int = 32, iters: Int = 3): DataFrame = {
    val S = 1000000000L
    val seedPred = (n: org.apache.spark.sql.Column) => n % 50 === 0
    val edges = Similarity.knnGraphShared(embeddings, k, nCells)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("node"),
      when(seedPred(col("node")), lit(S)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contribs = edges.join(outDeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = nodes.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (when(seedPred(col("node")), lit(15L * S / 100L))
            .otherwise(lit(0L)) +
            expr("85 * coalesce(sc, 0L) div 100")).as("r"))
    }
    ranks.filter(col("r") > 0L)
      .select(col("node"), seedPred(col("node")).as("is_seed"),
        col("r").as("rank_fp"),
        (col("r").cast("double") / lit(S.toDouble)).as("ppr"))
      .orderBy(col("rank_fp").desc, col("node"))
  }

  /** g09: MODULARITY of the trained IVF cells over the kNN graph
    * (Newman–Girvan Q, per community and overall) — the graph-side
    * answer to k05's silhouette: silhouette asks whether points sit
    * near their own centroid, modularity asks whether the quantizer's
    * CELLS respect the corpus's neighborhood structure — the property
    * every cell-blocked pass (s21's graph itself, d15's semantic
    * dedup, s08+'s probes) silently assumes. Q_c = e_c/m −
    * (deg_c/2m)²; an inter-cell kNN edge is exactly a neighbor a
    * 1-probe query would MISS (s14's recall cliff), so low Q here
    * predicts the s14 curve before any query runs.
    *
    * Exactness: every term is an exact BIGINT until the final
    * divisions — q_num = 4·m·e_c − deg_c² (headroom: both products
    * ≤ 4m², exact in Long to m ≈ 1.5·10⁹ edges; past that the counts
    * go DECIMAL(38,0), the k04 escape), q_term and the overall
    * modularity are single double divisions of exact longs. The
    * overall Q sums the per-cell q_num LONGS (order-free) — never the
    * per-cell doubles.
    *
    * Plan shape: the s21 edge list symmetrizes to the a<b distinct
    * set (one shuffle); two id-keyed joins attach endpoint cells; one
    * UNION-ALL degree aggregate and one intra filter+aggregate, both
    * (cell)-keyed partial aggs → K rows; the edge total and q_num
    * total are 1-row aggregates broadcast-crossed back (the k04
    * metrics pattern). Construction trains the coarse quantizer —
    * the same artifact the graph build trains; production shares the
    * materialized cell map, and here determinism makes both trainings
    * land on identical centroids. */
  def cellModularity(embeddings: DataFrame, k: Int = 5,
      nCells: Int = 32): DataFrame = {
    val edges = Similarity.knnGraphShared(embeddings, k, nCells)
      .select(least(col("vec_id"), col("neighbor_id")).as("ea"),
        greatest(col("vec_id"), col("neighbor_id")).as("eb"))
      .distinct()
    val centroids = Clustering.cachedCentroids(embeddings, nCells)
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2", Dedup.dotExpr("emb", "emb"))
    val cells = Clustering.assignAuto(vectors, centroids, nCells)
      .select(col("vec_id"), col("cluster_id").as("cell"))
    val ec = edges
      .join(cells.select(col("vec_id").as("ea"), col("cell").as("cell_a")),
        "ea")
      .join(cells.select(col("vec_id").as("eb"), col("cell").as("cell_b")),
        "eb")
    val tot = edges.agg(count(lit(1)).as("m_edges"))
    val deg = ec.select(col("cell_a").as("cell"))
      .unionAll(ec.select(col("cell_b").as("cell")))
      .groupBy(col("cell")).agg(count(lit(1)).as("deg_sum"))
    val intra = ec.filter(col("cell_a") === col("cell_b"))
      .select(col("cell_a").as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("e_intra"))
    val per = cells.groupBy(col("cell")).agg(count(lit(1)).as("n_nodes"))
      .join(deg, Seq("cell"), "left")
      .join(intra, Seq("cell"), "left")
      .select(col("cell"), col("n_nodes"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"),
        coalesce(col("deg_sum"), lit(0L)).as("deg_sum"))
      .crossJoin(broadcast(tot))
      .withColumn("q_num",
        col("e_intra") * lit(4L) * col("m_edges") -
          col("deg_sum") * col("deg_sum"))
    val qTotal = per.agg(sum(col("q_num")).as("q_total"))
    val denom = lit(4.0) * col("m_edges").cast("double") *
      col("m_edges").cast("double")
    per.crossJoin(broadcast(qTotal))
      .select(col("cell"), col("n_nodes"), col("e_intra"),
        col("deg_sum"), col("q_num"),
        (col("q_num").cast("double") / denom).as("q_term"),
        (col("q_total").cast("double") / denom).as("modularity"))
      .orderBy(col("cell"))
  }

  /** g11: HITS hubs & authorities (Kleinberg 1999) over a weighted
    * directed edge list — the OTHER classic link-analysis paradigm
    * next to [[pagerank]]: instead of a random-walk stationary
    * distribution, MUTUAL REINFORCEMENT between two roles — a good
    * authority is pointed to by good hubs, a good hub points to good
    * authorities. Per iteration: a(i) ← Σ_{j→i} h(j)·w_ji then
    * h(j) ← Σ_{j→i} a(i)·w_ji, each half-step normalized. On the
    * behavioral transition graph the roles read as "types sessions
    * converge INTO" (authorities) vs "types sessions fan OUT of"
    * (hubs) — a directional split g04's single importance score
    * cannot express.
    *
    * Fixed-point integer discipline (the g04 law, different
    * normalizer): scores are int64 at scale 2³⁰; published HITS
    * L2-normalizes (libm sqrt of a shuffle-ordered float sum), here
    * each half-step instead RIGHT-SHIFTS every score by
    * max(0, floor(log2 max) − 30), parking the max in [2³⁰, 2³¹) —
    * floor(log2 x) = length(bin(x))−1, the t50 identity, so every
    * operation is an exact integer product/sum/shift and the result is
    * bit-identical across engines, partitionings, and reruns. Shift
    * normalization preserves HITS' ranking structure exactly: it is a
    * positive per-half-step scalar scale (up to the shared floor),
    * which is all normalization contributes to HITS. Overflow
    * headroom: a raw score is ≤ 2³¹·Σw, safe while total edge mass
    * < 2³² (fixtures and the ×8 stress by orders of magnitude; a
    * 100-TB graph pre-aggregates edge weights or drops scale to 2²⁰).
    *
    * Plan shape per half-step: scores join edges on the role key (the
    * g04 shuffle — co-partition/bucket by src at scale), one map-side-
    * combined weighted-sum agg, a left join back to the node set, and
    * the 1-row max broadcast-crossed in (intended BNLJ); each
    * half-step is anchored through a per-role [[Anchor.Loop]] so the
    * alternation never re-executes the other role's chain AND each
    * superseded half-step's storage (cache entry + checkpoint files on
    * the reliable path) is RELEASED the moment the next same-role
    * half-step materializes — without the Loops, a long Verify sweep
    * pinned 2·iters dead half-step anchors for the whole session (the
    * r18 advice finding). The loop-invariant node-set anchor is
    * released after the final half-step (the result plan references
    * only the two live anchors). Node-set and edge frames should
    * arrive anchored ([[eventTypeHits]]). */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    val S = 1L << 30
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct()
      .anchored // referenced 2× per iteration; released after the loop
    def normalized(raw: DataFrame): DataFrame = {
      val m = raw.agg(max(col("x")).as("m"))
      raw.crossJoin(broadcast(m))
        .select(col("node"), expr(
          "shiftright(x, cast(greatest(0, length(bin(m)) - 31) as int))")
          .as("x"))
    }
    def halfStep(scores: DataFrame, from: String, to: String): DataFrame = {
      val raw = edges
        .join(scores.withColumnRenamed("node", from), from)
        .select(col(to), (col("x") * col("w")).as("c"))
        .groupBy(col(to)).agg(sum(col("c")).as("xr"))
      normalized(
        nodes.join(raw, col("node") === col(to), "left")
          .select(col("node"), coalesce(col("xr"), lit(0L)).as("x")))
    }
    val authLoop = new Anchor.Loop
    val hubLoop = new Anchor.Loop
    var auth = nodes.select(col("node"), lit(S).as("x"))
    var hub = nodes.select(col("node"), lit(S).as("x"))
    for (_ <- 1 to iters) {
      auth = authLoop.cut(halfStep(hub, "src", "dst"))
      hub = hubLoop.cut(halfStep(auth, "dst", "src"))
    }
    // the final auth/hub anchors are materialized supersets of every
    // nodes read — the invariant anchor is dead from here
    Anchor.release(nodes)
    auth.withColumnRenamed("x", "auth_fp")
      .join(hub.withColumnRenamed("x", "hub_fp"), Seq("node"))
      .select(col("node"), col("auth_fp"), col("hub_fp"),
        (col("auth_fp").cast("double") / lit(S.toDouble)).as("auth"),
        (col("hub_fp").cast("double") / lit(S.toDouble)).as("hub"))
      .orderBy(col("auth_fp").desc, col("node"))
  }

  /** g11 on the event-type transition graph — g04's edge construction
    * ([[transitionCounts]], anchored for the same reuse reason). */
  def eventTypeHits(events: DataFrame, iters: Int = 2): DataFrame =
    hits(transitionCounts(events)
      .select(col("src"), col("dst"), col("n").as("w"))
      .anchored, iters)
}

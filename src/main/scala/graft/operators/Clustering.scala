package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed centroid clustering over the embedding column — the
  * training step behind s02's IVF index (coarse cells need centroids
  * from somewhere; production ANN systems run exactly this Lloyd-style
  * loop over a corpus sample).
  *
  * This is the k-MEDIANS variant: the centroid update takes the
  * component-wise MEDIAN of the cluster's vectors instead of the mean.
  * Two reasons, both load-bearing:
  *  - determinism: a float mean is a SUM whose accumulation order the
  *    engine picks, so Spark and the DuckDB oracle would drift in the
  *    last bits; a median is pure SELECTION (order by value, pick the
  *    ceil(n/2)-th) — bitwise identical everywhere, which makes the
  *    whole iteration oracle-checkable;
  *  - robustness: component-wise medians resist outlier vectors, a
  *    known production win for web-scale embedding corpora.
  *
  * Scale shape per iteration: assignment is broadcast(K centroids) ×
  * corpus (narrow scan, no shuffle — the same intentional tiny-side
  * BNLJ as s01), argmin is a map-side-partial `min_by` aggregate; the
  * update explodes to (cluster, dim) — K·D groups — so the median
  * funnel shuffles by (cluster, dim) and each group holds only that
  * cluster's values of ONE dimension. No driver-side collect anywhere;
  * centroids stay a K-row DataFrame end to end. */
object Clustering {

  /** Nearest-centroid assignment: squared L2 via the norm expansion
    * |v|² + |c|² − 2·v·c (reuses the codegen'd graft_dot; same fixed
    * fold order as the s01 oracle idiom). Ties break toward the lower
    * cluster id.
    *
    * The argmin is `min_by` over the (dist2, cluster_id) struct — a
    * declarative aggregate that PARTIAL-aggregates map-side (each split
    * reduces its K candidate rows per vector to one before the
    * shuffle), where a row_number window would shuffle all K·|corpus|
    * scored rows first and sort them per vector. The ordering struct
    * includes cluster_id, so ties are deterministic, not
    * first-encountered. */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val joined = vectors.crossJoin(broadcast(centroids))
      .withColumn("dist2",
        col("vnorm2") + col("cnorm2") -
          lit(2.0) * graft.functions.VectorOps.dot(col("emb"), col("cemb")))
    joined
      .groupBy(col("vec_id"))
      .agg(min_by(
        struct(col("cluster_id"), col("dist2"), col("emb"), col("vnorm2")),
        struct(col("dist2"), col("cluster_id"))).as("best"))
      .select(col("vec_id"), col("best.emb").as("emb"),
        col("best.vnorm2").as("vnorm2"),
        col("best.cluster_id").as("cluster_id"),
        col("best.dist2").as("dist2"))
  }

  /** K-threshold at which [[assignAuto]] switches from the brute
    * broadcast×corpus [[assign]] to the two-level [[assignPruned]]. At
    * small K the brute crossJoin is a tight codegen'd loop the pruning
    * machinery can't beat (and every base-ledger plan stays bitwise
    * untouched); past this K the O(N·K) dot-product term dominates and
    * the triangle-inequality prune wins. */
  val PrunedAssignK: Int = 64

  /** [[assign]] when K is small, [[assignPruned]] when K is large —
    * same output either way (the pruned form is EXACT, spec-proven
    * equal row-for-row); only the plan changes. Call sites whose cell
    * count scales with the corpus (the IVF stance: K ∝ N keeps mean
    * cell size constant) use this so the assignment term stays
    * O(N·√K·D) instead of the superlinear O(N·K·D) that made
    * s21_knn_graph the one above-linear ×64 stress reading (r19
    * verdict: 70.3 at K = 32→2048). */
  def assignAuto(vectors: DataFrame, centroids: DataFrame,
      k: Int): DataFrame =
    if (k >= PrunedAssignK) assignPruned(vectors, centroids)
    else assign(vectors, centroids)

  /** One coarse group of the two-level quantizer: a centroid-of-
    * centroids (float, the exact values the plan's literals carry), its
    * self-dot, its covering radius over member centroids, and the
    * member count (driver-side diagnostics). */
  private case class CoarseGroup(gid: Int, center: Array[Float],
      gnorm2: Double, r: Double)

  /** EXACT two-level nearest-centroid assignment — the hierarchical
    * ("coarse-over-centroids") form of [[assign]], the standard IVF
    * scale lever (FAISS's `IndexIVF` + coarse `quantizer` stance;
    * two-level k-means assignment per Jégou et al. 2011 §A). Brute
    * assignment is O(N·K) vector dots; with K ∝ N (the trained-cell
    * scaling every graph/kNN query uses) that term is superlinear in
    * the corpus. Here the K centroids are grouped driver-side under
    * k′ = ⌈√K⌉ coarse centers (centroids are a driver-local model
    * artifact already — [[trainedCentroidsLocal]]'s adjudication), and
    * each corpus vector
    *  1. scores the k′ coarse centers (a literal array column; one
    *     narrow map, no join),
    *  2. takes U = min over groups of (d(x,g) + r_g) — an upper bound
    *     on its true nearest-centroid distance, since every member c
    *     of g has d(x,c) ≤ d(x,g) + r_g,
    *  3. admits exactly the groups whose lower bound d(x,g) − r_g can
    *     still beat U (triangle inequality: members of a group with
    *     d(x,g) − r_g > U can never win), and
    *  4. scores ONLY the admitted groups' member centroids (broadcast
    *     hash join on gid) through the IDENTICAL dist2 expression and
    *     (dist2, cluster_id) min_by as [[assign]].
    *
    * Exactness, not approximation: the admitted set provably contains
    * every centroid that could attain the minimum (ties included), so
    * the final min_by selects the same (dist2, cluster_id) winner
    * bitwise as the brute form — HierarchicalAssignSpec holds
    * row-for-row equality against [[assign]] across K values, corpora
    * (including a 1000×-norm variant), and the training pass, so every
    * downstream oracle (the s21 CTE chain and its g06–g11/s43–s46
    * consumers) is untouched. The float-slack analysis lives on
    * [[prunedCandidates]].
    *
    * Scale shape: per-vector work is k′·D (coarse scoring, interpreted
    * HOF over √K literal structs) + |admitted members|·D (codegen'd
    * dots after a broadcast hash join) ≈ O(√K·D) for healthy trained
    * quantizers, vs the brute K·D; the one shuffle is the same
    * map-side-partial min_by keyed on vec_id. Driver work is the
    * k′-means grouping over K rows — model-artifact scale (K ≤ a few
    * thousand), sequential double arithmetic, fully deterministic. */
  def assignPruned(vectors: DataFrame, centroids: DataFrame): DataFrame =
    prunedCandidates(vectors, centroids, 1)
      .groupBy(col("vec_id"))
      .agg(min_by(
        struct(col("cluster_id"), col("dist2"), col("emb"), col("vnorm2")),
        struct(col("dist2"), col("cluster_id"))).as("best"))
      .select(col("vec_id"), col("best.emb").as("emb"),
        col("best.vnorm2").as("vnorm2"),
        col("best.cluster_id").as("cluster_id"),
        col("best.dist2").as("dist2"))

  /** The shared candidate stage of [[assignPruned]] (m=1) and
    * [[assignTopMPruned]] (m>1): collect the K centroids, group them
    * driver-side ([[coarseGroups]]), and emit the scored (vec_id, emb,
    * vnorm2, cluster_id, dist2) rows of exactly the centroids that
    * could appear in the vector's top-m — the two forms differ only in
    * the argselect they run on these rows, so the admission reasoning
    * (and its slack constants) cannot desynchronize between them.
    *
    * Admission bound: every member c of group g has d(x,c) ≤ d(x,g) +
    * r_g, so a group with |g| members witnesses min(|g|, m) candidates
    * at or under its bound; U = the m-th smallest element of the
    * multiset {(d(x,g)+r_g) × min(|g|,m) copies} upper-bounds the m-th
    * best distance, and a centroid whose group lower bound d(x,g) −
    * r_g exceeds U is strictly worse than m others. (At m=1 the
    * multiset form reduces to min over groups of d+r.) The multiset
    * has ≥ m elements whenever K ≥ m: any group with |g| ≥ m alone
    * contributes m copies, else all terms are |g_i| and sum to K.
    *
    * Float slack: the plan computes d(x,g) by norm expansion in
    * double over float32 inputs — worst case (full cancellation, x ≈
    * g) the absolute error in d is ≈ √(D·ε)·max(‖x‖,‖g‖) ≈
    * 1.2e-7·max(‖x‖,‖g‖) at D=64, and U inherits the same order from
    * its witness group. The admission margin
    * 1e-4 + 1e-6·U + 1e-5·(‖x‖ + max_g‖g‖) therefore dominates the
    * rounding by ≥ 50× FOR ANY INPUT MAGNITUDE (the ‖x‖ term rides the
    * exact per-row vnorm2; the max_g‖g‖ term folds into a driver
    * constant) — not just unit-norm corpora. Admitting extra groups
    * never changes a selection over a superset, so the slack only
    * costs pruning efficiency. Spec-pinned by the 1000×-norm equality
    * case in HierarchicalAssignSpec.
    *
    * At-scale carriers: the coarse tier rides a LITERAL array column
    * for k′ ≤ spark.graft.coarseLiteralMax (default 2048 — right
    * through K ~ 10⁶ cells, k′ ≈ 10³ structs of D floats); beyond
    * that the SAME array ships as a one-row broadcast table crossed
    * into the corpus (constant plan size, the r20 verdict's named
    * next rung), with the admission algebra untouched — equality
    * across both carriers is spec-held. One decade further still
    * (k′ ~ 10⁵) the remaining rung is the bound composed recursively
    * (a third level / HNSW-over-centroids, the FAISS large-K
    * quantizer stance). */
  private def prunedCandidates(vectors: DataFrame, centroids: DataFrame,
      m: Int): DataFrame = {
    val spark = centroids.sparkSession
    val centSchema = centroids.select(
      col("cluster_id"), col("cemb"), col("cnorm2")).schema
    val rows = centroids.select(
        col("cluster_id"), col("cemb"), col("cnorm2"))
      .collect().sortBy(_.getLong(0))
    require(rows.length >= m,
      s"prunedCandidates: m=$m exceeds K=${rows.length}")
    val embs: Array[Array[Float]] =
      rows.map(_.getSeq[Float](1).toArray)
    val (groups, memberGid) = coarseGroups(embs)
    val sizeByGid = memberGid.groupBy(identity).map { case (g, a) =>
      g -> a.length
    }
    // ‖x‖-independent half of the slack: base + the max coarse-center
    // norm (the ‖g‖ term of the rounding bound), folded driver-side
    val slackConst = 1e-4 + 1e-5 * math.sqrt(groups.map(_.gnorm2).max)

    // member side of the broadcast join: the ORIGINAL centroid rows
    // (bit-identical cemb/cnorm2 — dist2 must match assign()'s) + gid
    val memberRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(rows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ memberGid(i))
      }: _*)
    val members = spark.createDataFrame(memberRows,
      centSchema.add("_gid", org.apache.spark.sql.types.IntegerType,
        nullable = false))

    // coarse centers as one array<struct> column of k' entries, scored
    // per corpus row with the codegen'd graft_dot (interpreted inside
    // the higher-order lambda — k' ≈ √K terms, not K). Two carriers
    // for the SAME array (the admission algebra never changes):
    //  - k' ≤ coarseLiteralMax: a plan LITERAL — zero joins, the
    //    default, right through K ~ 10⁶ (k' ~ 10³);
    //  - beyond: the array ships as a one-row BROADCAST table crossed
    //    in (the dq10 1-row-frame pattern) so the plan stays
    //    constant-size while the coarse tier rides the broadcast —
    //    the r20 verdict's named next rung for K past ~10⁶. The
    //    threshold is conf-tunable (spark.graft.coarseLiteralMax) so
    //    the spec can force the broadcast path; equality across both
    //    carriers is spec-held (HierarchicalAssignSpec).
    val coarseLiteralMax = spark.conf
      .getOption("spark.graft.coarseLiteralMax").map(_.toInt)
      .getOrElse(2048)
    val mkStruct: CoarseGroup => Column = g =>
      struct(lit(g.gid).as("gid"), lit(g.r).as("r"),
        lit(g.gnorm2).as("gn"),
        lit(math.min(sizeByGid(g.gid), m)).as("nm"),
        typedlit[Seq[Float]](g.center.toSeq).as("ge"))
    val base =
      if (groups.length <= coarseLiteralMax)
        vectors.withColumn("_gs0", array(groups.map(mkStruct): _*))
      else {
        import org.apache.spark.sql.types._
        val gSchema = StructType(Seq(StructField("_gs0", ArrayType(
          StructType(Seq(
            StructField("gid", IntegerType, nullable = false),
            StructField("r", DoubleType, nullable = false),
            StructField("gn", DoubleType, nullable = false),
            StructField("nm", IntegerType, nullable = false),
            StructField("ge", ArrayType(FloatType, containsNull = false),
              nullable = false))), containsNull = false),
          nullable = false)))
        val gRow: java.util.List[org.apache.spark.sql.Row] =
          java.util.Arrays.asList(org.apache.spark.sql.Row(
            groups.map(g => org.apache.spark.sql.Row(g.gid, g.r,
              g.gnorm2, math.min(sizeByGid(g.gid), m),
              g.center.toSeq))))
        vectors.crossJoin(broadcast(spark.createDataFrame(gRow, gSchema)))
      }
    val scoredGroups = transform(col("_gs0"), s => struct(
      s.getField("gid").as("gid"),
      sqrt(greatest(lit(0d),
        col("vnorm2") + s.getField("gn") - lit(2.0) *
          graft.functions.VectorOps.dot(col("emb"), s.getField("ge"))))
        .as("d"),
      s.getField("r").as("r"),
      s.getField("nm").as("nm")))

    val admitted = base
      .withColumn("_gs", scoredGroups)
      // m-th smallest of the repetition multiset of upper bounds
      .withColumn("_u", element_at(array_sort(flatten(
        transform(col("_gs"), s => array_repeat(
          s.getField("d") + s.getField("r"), s.getField("nm"))))),
        m))
      .withColumn("_gid", explode(transform(
        filter(col("_gs"), s =>
          s.getField("d") - s.getField("r") <=
            col("_u") + lit(slackConst) + lit(1e-6) * col("_u") +
              lit(1e-5) * sqrt(col("vnorm2"))),
        s => s.getField("gid"))))
      .drop("_gs0", "_gs", "_u")

    admitted.join(broadcast(members), Seq("_gid"))
      .withColumn("dist2",
        col("vnorm2") + col("cnorm2") -
          lit(2.0) * graft.functions.VectorOps.dot(col("emb"),
            col("cemb")))
  }

  /** Brute TOP-M nearest-centroid assignment (FAISS multi-assignment /
    * nprobe-on-the-index-build): each vector keeps its `m` nearest
    * centroids by (dist2 asc, cluster_id asc) — the boundary-recall
    * buy-back every cell-blocked operator's scaladoc names (a vector
    * near a cell boundary joins BOTH sides' blocks, so
    * boundary-straddling near-neighbors stop being structural misses).
    * Output: (vec_id, emb, vnorm2, cluster_id, dist2, crk) with crk =
    * 1..m, m rows per vector. The argselect is the bounded
    * [[graft.functions.TopKByScore]] partial agg on score = −dist2
    * (IEEE negation is exact; ties at equal dist2 fall to the
    * ascending-id tie-break, matching the oracle's `ORDER BY dist2
    * ASC, cluster_id ASC`), carrying emb/vnorm2 through `first` —
    * no corpus-side re-join. */
  def assignTopM(vectors: DataFrame, centroids: DataFrame,
      m: Int): DataFrame =
    topMSelect(vectors.crossJoin(broadcast(centroids))
      .withColumn("dist2",
        col("vnorm2") + col("cnorm2") -
          lit(2.0) * graft.functions.VectorOps.dot(col("emb"),
            col("cemb"))), m)

  /** The shared top-m argselect tail of [[assignTopM]] /
    * [[assignTopMPruned]]: scored rows (vec_id, emb, vnorm2,
    * cluster_id, dist2) → m best per vector. */
  private def topMSelect(scored: DataFrame, m: Int): DataFrame =
    scored.groupBy(col("vec_id"))
      .agg(graft.functions.TopKByScore.topK(m)(
          (-col("dist2")).cast("double"), col("cluster_id")).as("top"),
        first(col("emb")).as("emb"),
        first(col("vnorm2")).as("vnorm2"))
      .select(col("vec_id"), col("emb"), col("vnorm2"),
        posexplode(col("top")).as(Seq("pos", "cand")))
      .select(col("vec_id"), col("emb"), col("vnorm2"),
        col("cand.id").as("cluster_id"),
        (-col("cand.score")).as("dist2"),
        (col("pos") + 1).cast("long").as("crk"))

  /** [[assignTopM]] when K is small, [[assignTopMPruned]] when K is
    * large — same output either way (spec-proven). Requires m ≤ k so
    * the dispatch threshold can never change observable behavior (the
    * brute form would silently truncate at m > K while the pruned form
    * rejects). CONTRACT: `k` must equal the ACTUAL centroid row count
    * (every caller passes the K it trained with) — with sparse ids
    * where the real count < m ≤ declared k, the brute path would
    * silently emit fewer than m rows per vector while the pruned path
    * throws; the m ≤ k guard is sound only under that equality (r20
    * ADVICE, documented rather than paying a count() per call). */
  def assignTopMAuto(vectors: DataFrame, centroids: DataFrame,
      k: Int, m: Int): DataFrame = {
    require(m <= k, s"assignTopMAuto: m=$m exceeds K=$k")
    if (k >= PrunedAssignK) assignTopMPruned(vectors, centroids, m)
    else assignTopM(vectors, centroids, m)
  }

  /** EXACT two-level TOP-M assignment — [[assignPruned]] generalized
    * from the argmin to the m-best set. The admission bound
    * generalizes via a MULTISET of per-group upper bounds: every
    * member c of group g has d(x,c) ≤ d(x,g) + r_g, so a group with
    * |g| members witnesses min(|g|, m) candidates at or under its
    * bound; U = the m-th smallest element of the multiset
    * {(d(x,g)+r_g) × min(|g|,m) copies} therefore upper-bounds the
    * m-th best distance (m distinct witnesses ≤ U), and any centroid
    * whose group lower bound d(x,g) − r_g exceeds U can appear in
    * no top-m (strictly worse than m others). Shares
    * [[prunedCandidates]]'s scaffold and slack with [[assignPruned]]
    * — the two cannot desynchronize; admitted members run through the
    * identical dist2 and the same bounded top-m argselect as the
    * brute form, so the output is bitwise-equal (ties included —
    * equal-dist2 boundary centroids are all admitted and resolved by
    * the shared id tie-break). Requires m ≤ K (the multiset then has
    * ≥ m elements). */
  def assignTopMPruned(vectors: DataFrame, centroids: DataFrame,
      m: Int): DataFrame =
    topMSelect(prunedCandidates(vectors, centroids, m), m)

  /** Driver-side k′-means over the K centroids (k′ = ⌈√K⌉, seeds = the
    * first k′ in cluster-id order, 3 Lloyd rounds with mean updates,
    * ties toward the lower gid) → non-empty [[CoarseGroup]]s with
    * covering radii, plus each centroid's gid. Grouping QUALITY only
    * affects pruning efficiency, never correctness — the bounds hold
    * for any grouping — so plain sequential double arithmetic (fully
    * deterministic) is all this needs. Radii and self-dots are computed
    * against the FLOAT-cast centers, i.e. the exact values the plan's
    * literals carry, so the triangle bounds reason about the numbers
    * the executors actually see. */
  private def coarseGroups(
      embs: Array[Array[Float]]): (Seq[CoarseGroup], Array[Int]) = {
    val k = embs.length
    val kp = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val dim = embs.map(_.length).max
    // ZERO-PADDED Euclidean — the metric the plan's norm expansion
    // (vnorm2 + gn − 2·prefix-dot) actually computes for ragged
    // inputs: a length-truncated fold would understate d(g, c) for a
    // member shorter than the coarse center, shrinking the covering
    // radius below the truth and voiding the admission bound
    def d2(a: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.max(a.length, c.length)
      while (i < n) {
        val av = if (i < a.length) a(i).toDouble else 0.0
        val cv = if (i < c.length) c(i) else 0.0
        val t = av - cv; s += t * t; i += 1
      }
      s
    }
    var centers: Array[Array[Double]] =
      embs.take(kp).map(_.map(_.toDouble).padTo(dim, 0.0))
    val assignIdx = new Array[Int](k)
    def assignAll(): Unit = {
      var i = 0
      while (i < k) {
        var best = 0; var bestD = d2(embs(i), centers(0)); var g = 1
        while (g < centers.length) {
          val d = d2(embs(i), centers(g))
          if (d < bestD) { best = g; bestD = d }
          g += 1
        }
        assignIdx(i) = best; i += 1
      }
    }
    var iter = 0
    while (iter < 3) {
      assignAll()
      val sums = Array.fill(centers.length, dim)(0.0)
      val counts = new Array[Int](centers.length)
      var i = 0
      while (i < k) {
        val g = assignIdx(i); counts(g) += 1
        var j = 0
        while (j < embs(i).length) { sums(g)(j) += embs(i)(j); j += 1 }
        i += 1
      }
      centers = centers.indices.map { g =>
        if (counts(g) == 0) centers(g)
        else sums(g).map(_ / counts(g))
      }.toArray
      iter += 1
    }
    // final: float-cast centers, one more exact assignment against the
    // cast values, radii over the resulting membership
    val fcenters = centers.map(_.map(_.toFloat))
    val fAsD = fcenters.map(_.map(_.toDouble))
    var i = 0
    while (i < k) {
      var best = 0; var bestD = d2(embs(i), fAsD(0)); var g = 1
      while (g < fcenters.length) {
        val d = d2(embs(i), fAsD(g))
        if (d < bestD) { best = g; bestD = d }
        g += 1
      }
      assignIdx(i) = best; i += 1
    }
    val radii = new Array[Double](fcenters.length)
    i = 0
    while (i < k) {
      val g = assignIdx(i)
      val d = math.sqrt(d2(embs(i), fAsD(g)))
      if (d > radii(g)) radii(g) = d
      i += 1
    }
    def selfDot(c: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j).toDouble * c(j).toDouble; j += 1 }
      s
    }
    // occupied-gid membership in O(1) (an assignIdx.contains per group
    // index was an O(K·√K) driver scan — r20 ADVICE)
    val occupied = assignIdx.toSet
    val nonEmpty = fcenters.indices
      .filter(occupied.contains)
      .map(g => CoarseGroup(g, fcenters(g), selfDot(fcenters(g)), radii(g)))
    (nonEmpty, assignIdx)
  }

  /** Component-wise median centroid update. Lower median: the element
    * at rank ceil(n/2) ordered by (value, vec_id) — selection of an
    * actual input float, no float arithmetic at all. */
  def medianCentroids(assigned: DataFrame): DataFrame = {
    val ex = assigned.select(col("cluster_id"), col("vec_id"),
      posexplode(col("emb")).as(Seq("dim", "val")))
    val ordW = Window.partitionBy(col("cluster_id"), col("dim"))
      .orderBy(col("val").asc, col("vec_id").asc)
    val cntW = Window.partitionBy(col("cluster_id"), col("dim"))
    val medians = ex
      .withColumn("rn", row_number().over(ordW))
      .withColumn("n", count(lit(1)).over(cntW))
      .where(col("rn") === expr("(n + 1) div 2"))
      .select(col("cluster_id"), col("dim"), col("val"))
    medians
      .groupBy(col("cluster_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("val")))),
        s => s.getField("val")).as("cemb"))
      .withColumn("cnorm2",
        graft.functions.VectorOps.dot(col("cemb"), col("cemb")))
  }

  /** Two Lloyd rounds from a deterministic seed (the first K vectors by
    * vec_id), final assignment with the vectors RETAINED — (vec_id,
    * emb, vnorm2, cluster_id, dist2). This is the trained quantizer's
    * cell map; s08's IVF probe consumes it directly (in production the
    * map is materialized once and the corpus is partitioned by
    * cluster_id, so probes prune to one cell's files). */
  def kmediansAssignFull(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val init = embeddings.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster_id"),
        col("embedding").as("cemb"))
      .withColumn("cnorm2",
        graft.functions.VectorOps.dot(col("cemb"), col("cemb")))
    val round1 = assign(vectors, init)
    assign(vectors, medianCentroids(round1))
  }

  /** k08: the two-level pruned assignment's LEDGER face — the k01
    * pipeline (one median-update training round, final assignment) at
    * K=64, the tier where [[assignAuto]] switches to [[assignPruned]]
    * for BOTH the training and final passes. The oracle mirrors the
    * BRUTE form (the k01 CTE chain at K=64): assignPruned is
    * spec-proven bitwise-equal to it, so the hash match here is the
    * oracle-level proof that the scale path changes plans, never
    * results. Output: (vec_id, cluster_id, dist2), one row per
    * vector. */
  def prunedAssign(embeddings: DataFrame, k: Int = 64): DataFrame = {
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    assignPruned(vectors, trainedCentroidsLocal(embeddings, k))
      .select(col("vec_id"), col("cluster_id"), col("dist2"))
      .orderBy(col("vec_id"))
  }

  /** k01: [[kmediansAssignFull]] projected to one row per vector —
    * (vec_id, cluster_id, dist2). */
  def kmediansAssign(embeddings: DataFrame, k: Int = 8): DataFrame =
    kmediansAssignFull(embeddings, k)
      .select(col("vec_id"), col("cluster_id"), col("dist2"))
      .orderBy(col("vec_id"))

  /** k02: clustering-quality evaluation — per-cluster size and inertia
    * (sum of squared distances to the assigned centroid), the metric
    * that drives the "is K right / did training converge" loop, just
    * as s05 closes the ANN loop. The per-vector dist2 doubles are
    * bitwise cross-engine (k01 hash-matches), so quantizing each to
    * integer micros BEFORE the sum makes the per-cluster total an
    * order-free exact long — a raw double SUM would depend on shuffle
    * order. One K-row output; the cost is k01's assignment itself. */
  def clusterInertia(embeddings: DataFrame, k: Int = 8): DataFrame =
    kmediansAssign(embeddings, k)
      .select(col("cluster_id"),
        floor(col("dist2") * lit(1000000.0)).cast("long").as("d_fp"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d_fp")).as("inertia_fp"))
      .select(col("cluster_id"), col("n_vectors"), col("inertia_fp"),
        ((col("inertia_fp").cast("double") / lit(1000000.0)) /
          col("n_vectors").cast("double")).as("mean_dist2"))
      .orderBy(col("cluster_id"))

  /** k03: the ELBOW curve — total inertia of the trained quantizer at
    * a sweep of K values, the model-selection eval that decides the
    * cell count every serving tier (s08/s12/s15/s19/s21) then lives
    * with: too few cells and probes scan huge fractions of the corpus,
    * too many and cell-boundary recall loss dominates (s14's curve).
    * k02 answers "how good is THIS K per cluster"; this answers
    * "which K".
    *
    * Determinism: each K's pipeline is exactly k01's (median-selection
    * training, bitwise dist2), and per-vector distances quantize to
    * integer micros BEFORE the total (the k02 recipe) — order-free
    * exact longs.
    *
    * Scale: the sweep is |ks| independent two-round Lloyd runs — at
    * 100 TB each trains on the same corpus sample the production
    * quantizer would, and the runs are embarrassingly parallel
    * (driver composes a union; nothing is iterated in-plan). Output
    * is |ks| rows. */
  def elbowCurve(embeddings: DataFrame,
      ks: Seq[Int] = Seq(2, 4, 8, 16)): DataFrame =
    ks.map { k =>
      kmediansAssign(embeddings, k)
        .select(floor(col("dist2") * lit(1000000.0)).cast("long")
          .as("d_fp"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(col("d_fp")).as("inertia_fp"))
        .select(lit(k.toLong).as("k"), col("n_vectors"),
          col("inertia_fp"))
    }.reduce(_.unionByName(_))
      .select(col("k"), col("n_vectors"), col("inertia_fp"),
        ((col("inertia_fp").cast("double") / lit(1000000.0)) /
          col("n_vectors").cast("double")).as("mean_dist2"))
      .orderBy(col("k"))

  /** The trained centroids MATERIALIZED as a local K-row DataFrame — a
    * model artifact, driver-metadata-scale by definition (K ≤ a few
    * thousand for any real IVF index; production stores it beside the
    * index). Without this, every plan subtree that references the
    * centroids re-runs the full training lineage: s08's probe joins the
    * cell map on both the corpus and query sides, and the lazy form
    * trained TWICE (verified in the physical plan — no exchange reuse,
    * the query-side filter pushes below the aggregate and breaks
    * subtree identity). Collecting K rows is the broadcast-prep
    * pattern, not a driver-side data loop. */
  def trainedCentroidsLocal(embeddings: DataFrame, k: Int = 8): DataFrame =
    trainedCentroidsSeeded(embeddings, k, 0L)

  /** [[trainedCentroidsLocal]] with the seed window shifted: initial
    * centroids are the vectors with `seedFrom <= vec_id < seedFrom+k`
    * (cluster ids = the seed vec_ids). Two seedings of the same
    * trainer are what [[clusterAgreement]] compares. */
  def trainedCentroidsSeeded(embeddings: DataFrame, k: Int,
      seedFrom: Long): DataFrame = {
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val init = embeddings
      .filter(col("vec_id") >= seedFrom && col("vec_id") < seedFrom + k)
      .select(col("vec_id").as("cluster_id"),
        col("embedding").as("cemb"))
      .withColumn("cnorm2",
        graft.functions.VectorOps.dot(col("cemb"), col("cemb")))
    // at scaled cell counts (K ∝ N) the TRAINING assignment is itself
    // the superlinear term — same pruned path as the final assignment
    val trained = medianCentroids(assignAuto(vectors, init, k))
    val spark = embeddings.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
  }

  /** [[trainedCentroidsSeeded]] through the session [[ModelArtifacts]]
    * cache — the serving/eval artifact stance (the d15/s15 pattern,
    * extended per the r21 measurement pass): a deployment trains the
    * coarse quantizer ONCE per (corpus, K, seed) and every serving or
    * eval query LOADS the stored K-row artifact, so re-paying the
    * training lineage (assign + the (cluster, dim) median funnel +
    * collect — ~10 scheduled jobs at any scale) per query prices the
    * same model repeatedly for no information. Results are identical
    * by construction (the trainer is deterministic — median selection,
    * fixed seeds); only the plan changes. The params string matches
    * the pre-existing "ivf-centroids"/"k=8" cache keys bit-for-bit so
    * d15/servingContext entries share. End-to-end TRAINING forms
    * (k01–k03, k08, s12, s30, s40) deliberately do NOT route through
    * this — their in-query training is the measured subject. */
  def cachedCentroids(embeddings: DataFrame, k: Int = 8,
      seedFrom: Long = 0L): DataFrame =
    ModelArtifacts.cached("ivf-centroids", embeddings,
      if (seedFrom == 0L) s"k=$k" else s"k=$k,seed=$seedFrom")(
      trainedCentroidsSeeded(embeddings, k, seedFrom))

  /** k04: clustering STABILITY — the Rand index between two runs of
    * the same trainer seeded differently (seeds 0..k-1 vs k..2k-1),
    * over the full K×K contingency table. The model-selection eval
    * k02/k03 don't cover: inertia says how tight the clusters are,
    * agreement says whether they are REAL (seed-invariant structure)
    * or seeding artifacts — the check that gates trusting the coarse
    * quantizer's cells as dedup/serving blocks (d15, s08+). Rand =
    * (agreeing pairs)/(all pairs) with agree = C(n,2) + 2·Σ C(n_ij,2)
    * − Σ C(n_i·,2) − Σ C(n_·j,2) — every term an exact long (pair
    * counts < 2⁵³ up to ~10⁸ rows; beyond that the counts go
    * DECIMAL(38,0)), ONE double division at the end.
    *
    * Plan shape: two broadcast-assign passes over the corpus (each
    * k01's audited shape), a vec-keyed join, a (cluster_a, cluster_b)
    * aggregate to the K² contingency, and model-scale marginal sums;
    * the metrics frame is ONE row, broadcast-crossed back onto the
    * contingency rows. */
  def clusterAgreement(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val ca = assign(vectors, cachedCentroids(embeddings, k))
      .select(col("vec_id"), col("cluster_id").as("cluster_a"))
    val cb = assign(vectors,
      cachedCentroids(embeddings, k, k.toLong))
      .select(col("vec_id"), col("cluster_id").as("cluster_b"))
    val cont = ca.join(cb, "vec_id")
      .groupBy(col("cluster_a"), col("cluster_b"))
      .agg(count(lit(1)).as("n_ab"))
    val sameBoth = cont
      .agg(sum(expr("n_ab * (n_ab - 1) div 2")).as("same_both"))
    val sameA = ca.groupBy(col("cluster_a")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("same_a"))
    val sameB = cb.groupBy(col("cluster_b")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("same_b"))
    val total = ca.agg(count(lit(1)).as("n"))
      .select(expr("n * (n - 1) div 2").as("pairs"))
    val metrics = total.crossJoin(broadcast(sameBoth))
      .crossJoin(broadcast(sameA)).crossJoin(broadcast(sameB))
      .select(((col("pairs") + lit(2L) * col("same_both") -
        col("same_a") - col("same_b")).cast("double") /
        col("pairs").cast("double")).as("rand_index"))
    cont.crossJoin(broadcast(metrics))
      .select(col("cluster_a"), col("cluster_b"), col("n_ab"),
        col("rand_index"))
      .orderBy(col("cluster_a"), col("cluster_b"))
  }

  /** k05: SIMPLIFIED SILHOUETTE (Hruschka et al. 2004 — the
    * centroid-distance silhouette, the form that survives scale) —
    * per point, a = distance to its OWN trained centroid, b = distance
    * to the nearest OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1];
    * rolled up per cluster. This is the per-point eval the k-suite
    * lacked: k02's inertia measures COHESION only (how tight each
    * cluster is), silhouette weighs cohesion against SEPARATION — a
    * tight cluster sitting on top of another scores near 0 where
    * inertia calls it perfect, and s < 0 flags points the assignment
    * itself put on the wrong side of a boundary. The classic
    * silhouette's all-pairs a(i)/b(i) is O(n²) and dead at corpus
    * scale; the centroid form is the standard production substitute
    * (one broadcast cross, K distances per point).
    *
    * Determinism: distances reuse k01's exact expression tree
    * (√ of the norm expansion, clamped at 0 before the sqrt so FP
    * cancellation on a centroid-coincident point can't produce NaN);
    * ordering by (d, cluster_id) is exactly assign()'s tie-break
    * (sqrt is monotone), so cluster_id here IS a2's assignment.
    * Per-point s quantizes to integer MICROS before the cluster sum
    * (the k02 recipe) — order-free exact longs (|s_fp| ≤ 10⁶, exact
    * past 10¹² points per cluster), ONE double division per output
    * row at the end.
    *
    * Plan shape: one broadcast(K centroids) cross over the corpus
    * scan, one vec-keyed partial agg whose state is the SORTED K-row
    * struct list (bounded by K — the argmin-and-runner-up need the
    * two smallest, and K ≤ a few thousand for any real quantizer),
    * one cluster-keyed partial agg → K rows. */
  def simplifiedSilhouette(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val centroids = cachedCentroids(embeddings, k)
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("d", sqrt(greatest(
        col("vnorm2") + col("cnorm2") - lit(2.0) *
          graft.functions.VectorOps.dot(col("emb"), col("cemb")),
        lit(0.0))))
    val per = scored
      .select(col("vec_id"),
        struct(col("d"), col("cluster_id").as("c")).as("dc"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(col("dc"))).as("ds"))
      .select(col("vec_id"),
        col("ds").getItem(0).getField("c").as("cluster_id"),
        col("ds").getItem(0).getField("d").as("a_d"),
        col("ds").getItem(1).getField("d").as("b_d"))
      .withColumn("sil",
        when(greatest(col("a_d"), col("b_d")) === 0.0, lit(0.0))
          .otherwise((col("b_d") - col("a_d")) /
            greatest(col("a_d"), col("b_d"))))
    per.select(col("cluster_id"),
        floor(col("sil") * lit(1000000.0)).cast("long").as("s_fp"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("s_fp")).as("sil_fp_sum"))
      .select(col("cluster_id"), col("n_vectors"), col("sil_fp_sum"),
        ((col("sil_fp_sum").cast("double") / lit(1000000.0)) /
          col("n_vectors").cast("double")).as("mean_sil"))
      .orderBy(col("cluster_id"))
  }

  /** k06: DAVIES–BOULDIN INDEX (Davies & Bouldin 1979) — the third leg
    * of the clustering-quality stool: k02's inertia is cohesion-only,
    * k05's silhouette is per-POINT cohesion-vs-separation; DB judges
    * per-CLUSTER worst-case confusability — R_i = max_{j≠i}
    * (s_i + s_j)/d(c_i, c_j), the index their mean — so a pair of tight
    * clusters sitting on top of each other (exactly what makes two IVF
    * cells interchangeable and a probe schedule wasteful) dominates the
    * score even when every other pair is clean. Lower is better; the
    * reported worst_other names WHICH neighbor confuses each cluster —
    * the direct input to s40's split/merge maintenance decisions.
    *
    * Determinism (the k02/k05 recipe end to end): per-point distances
    * reuse k01's exact expression tree (√ of the clamped norm
    * expansion); each quantizes to integer MICROS before the
    * per-cluster scatter sum — order-free exact longs — and the
    * scatter mean, the K² centroid distances, and each ratio are
    * single IEEE ops on those exact values; the per-cluster max is
    * selection with (r DESC, j ASC) ties via min_by-on-struct; the
    * final mean folds R_i in CLUSTER order (the b03 fold contract).
    *
    * Plan shape: one broadcast(K centroids) × corpus assign (k01's
    * audited shape) + one cluster-keyed partial agg → K scatter rows;
    * everything else is K²-row model arithmetic on the LOCAL centroid
    * frame (K ≤ thousands for any real quantizer). One corpus scan
    * total. */
  def daviesBouldin(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val centroids = cachedCentroids(embeddings, k)
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val scat = assign(vectors, centroids)
      .select(col("cluster_id"),
        floor(sqrt(greatest(col("dist2"), lit(0.0))) * lit(1000000.0))
          .cast("long").as("d_fp"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d_fp")).as("s_fp"))
      .select(col("cluster_id"), col("n_vectors"),
        ((col("s_fp").cast("double") / lit(1000000.0)) /
          col("n_vectors").cast("double")).as("scatter"))
    val ci = centroids.select(col("cluster_id").as("ci"),
      col("cemb").as("ei"), col("cnorm2").as("ni"))
    val cj = centroids.select(col("cluster_id").as("cj"),
      col("cemb").as("ej"), col("cnorm2").as("nj"))
    val cd = ci.join(cj, col("ci") =!= col("cj"))
      .select(col("ci"), col("cj"),
        sqrt(greatest(col("ni") + col("nj") - lit(2.0) *
          graft.functions.VectorOps.dot(col("ei"), col("ej")),
          lit(0.0))).as("dij"))
    val rr = cd
      .join(scat.select(col("cluster_id").as("ci"),
        col("scatter").as("si")), "ci")
      .join(scat.select(col("cluster_id").as("cj"),
        col("scatter").as("sj")), "cj")
      .select(col("ci").as("cluster_id"), col("cj"),
        ((col("si") + col("sj")) / col("dij")).as("r"))
    val top = rr.groupBy(col("cluster_id"))
      .agg(max(col("r")).as("r_max"),
        min_by(col("cj"), struct((lit(0.0) - col("r")).as("negr"),
          col("cj").as("j"))).as("worst_other"))
    val db = top.agg((aggregate(sort_array(collect_list(struct(
      col("cluster_id"), col("r_max")))), lit(0.0),
      (acc, x) => acc + x.getField("r_max")) /
      count(lit(1)).cast("double")).as("db_index"))
    scat.join(top, "cluster_id")
      .crossJoin(broadcast(db))
      .select(col("cluster_id"), col("n_vectors"), col("scatter"),
        col("worst_other"), col("r_max"), col("db_index"))
      .orderBy(col("cluster_id"))
  }

  /** k07: CALINSKI–HARABASZ variance-ratio index (Calinski & Harabasz
    * 1974) — the third classic internal-validity score, closing the
    * trio with k05's (simplified) silhouette and k06's Davies–Bouldin:
    * CH = (BGSS/(K−1)) / (WGSS/(N−K)), the ANOVA F-statistic of the
    * clustering (between-cluster variance per degree of freedom over
    * within-cluster variance per degree of freedom — higher is
    * better, the opposite polarity of k06, which is why a real eval
    * reports both).
    *
    * Float discipline: WGSS is the micros-quantized within-cluster
    * Σdist² (the k02/k06 recipe — per-point longs, exact sums at
    * every level). BGSS never touches the global-mean vector: by the
    * weighted-pairwise identity Σ_k n_k·‖c_k−c̄‖² =
    * Σ_{i≠j} n_i·n_j·‖c_i−c_j‖² / (2N), it is a fold over the K²
    * centroid pairs in (ci, cj) order — the corpus-scale float sum a
    * textbook BGSS would need (computing c̄ over all points) is
    * exactly the shuffle-order hazard this identity removes. The
    * n_i·n_j weights are exact longs; each pair term is one multiply;
    * the CH division tree is fixed. Overflow headroom: per-cluster
    * micros WGSS sums stay in a long past 10¹² points at unit-scale
    * distances; n_i·n_j < N² needs N < 3·10⁹ before the weight moves
    * to DOUBLE (ranking-neutral).
    *
    * Plan shape: one k01 centroid-assign pass (broadcast K centroids —
    * the whitelisted cross) + a K-row scatter agg; everything after is
    * K- and K²-row local arithmetic with two sorted-array folds; the
    * 1-row totals and index frames broadcast-cross back (k06's
    * pattern). */
  def calinskiHarabasz(embeddings: DataFrame, k: Int = 8): DataFrame = {
    val centroids = cachedCentroids(embeddings, k)
    val vectors = embeddings
      .select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val sc = assign(vectors, centroids)
      .select(col("cluster_id"),
        floor(greatest(col("dist2"), lit(0.0)) * lit(1000000.0))
          .cast("long").as("d2_fp"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d2_fp")).as("w_fp"))
    val ci = centroids.select(col("cluster_id").as("ci"),
      col("cemb").as("ei"), col("cnorm2").as("ni"))
    val cj = centroids.select(col("cluster_id").as("cj"),
      col("cemb").as("ej"), col("cnorm2").as("nj"))
    val pairs = ci.join(cj, col("ci") =!= col("cj"))
      .join(sc.select(col("cluster_id").as("ci"),
        col("n_vectors").as("na")), "ci")
      .join(sc.select(col("cluster_id").as("cj"),
        col("n_vectors").as("nb")), "cj")
      .select(col("ci"), col("cj"),
        ((col("na") * col("nb")).cast("double") *
          greatest(col("ni") + col("nj") - lit(2.0) *
            graft.functions.VectorOps.dot(col("ei"), col("ej")),
            lit(0.0))).as("term"))
    val tot = sc.agg(sum(col("n_vectors")).as("n_total"),
      count(lit(1)).as("k_cells"), sum(col("w_fp")).as("w_fp_total"))
    val bg = pairs.groupBy()
      .agg(aggregate(sort_array(collect_list(struct(col("ci"),
        col("cj"), col("term")))), lit(0.0),
        (acc, x) => acc + x.getField("term")).as("bgss_num"))
    val idx = bg.crossJoin(tot)
      .select(
        (col("bgss_num") /
          (lit(2.0) * col("n_total").cast("double"))).as("bgss"),
        (col("w_fp_total").cast("double") / lit(1000000.0)).as("wgss"),
        col("n_total"), col("k_cells"))
      .select(col("bgss"), col("wgss"), col("n_total"), col("k_cells"),
        when(col("k_cells") > 1L && col("n_total") > col("k_cells"),
          (col("bgss") / (col("k_cells") - 1L).cast("double")) /
            (col("wgss") / (col("n_total") - col("k_cells"))
              .cast("double")))
          .otherwise(lit(0.0)).as("ch_index"))
    sc.crossJoin(broadcast(idx))
      .select(col("cluster_id"), col("n_vectors"),
        (col("w_fp").cast("double") / lit(1000000.0)).as("wgss_k"),
        col("bgss"), col("wgss"), col("ch_index"))
      .orderBy(col("cluster_id"))
  }

  /** s40: HOT-CELL SPLIT — the index-MAINTENANCE verb the s36
    * lifecycle (train → append → tombstone → serve) still lacked:
    * appends concentrate, cell sizes skew, and a hot cell is a probe
    * whose scan cost quietly became a multiple of the design point —
    * the reason FAISS deployments periodically re-shard. A cell is
    * hot when its size exceeds `hotFactor`× the mean (exact
    * cross-multiplied: n·K > total·hotFactor — no float mean); each
    * hot cell splits in two by SEEDED nearest-of-two assignment (the
    * two lowest-id members as sub-seeds, ties to the lower sub) —
    * deterministic, one pass, no retraining. The output is the
    * REBALANCE PLAN: every final cell (cold cells as-is, hot halves)
    * with its size, plus the max/mean skew ×100 before and after (the
    * dq02 metric — exact integer division) attached to every row so
    * the plan carries its own justification. Production follow-up is
    * k01's median update over the split map — this operator decides
    * WHAT to split and proves the size effect; the refinement is the
    * trainer's existing job.
    *
    * Scale: sizes/hot are K-row aggregates; seeds are parallel
    * per-cell windows truncated at 2 rows (2·|hot| rows, broadcast);
    * the re-assignment is a broadcast join over hot-cell members only
    * with a map-side `min_by` argmin — cold cells are never touched;
    * skew stats are 1-row aggregates broadcast-crossed back (the k04
    * pattern). Headroom: max·100·K exact in Long past 10¹⁴ vectors. */
  def hotCellSplit(embeddings: DataFrame, k: Int = 8,
      hotFactor: Int = 2): DataFrame = {
    val assigned = kmediansAssignFull(embeddings, k)
    val sizes = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_before"))
    val tot = assigned.agg(count(lit(1)).as("n_total"))
    val hot = sizes.crossJoin(broadcast(tot))
      .filter(col("n_before") * lit(k.toLong) >
        col("n_total") * lit(hotFactor.toLong))
      .select(col("cluster_id"))
    val members = assigned.join(broadcast(hot), Seq("cluster_id"))
    val w = Window.partitionBy(col("cluster_id")).orderBy(col("vec_id"))
    val seeds = members
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("cluster_id"), col("rn").cast("long").as("sub_id"),
        col("emb").as("semb"), col("vnorm2").as("snorm2"))
    val splitCells = members
      .join(broadcast(seeds), Seq("cluster_id"))
      .withColumn("d2", col("vnorm2") + col("snorm2") - lit(2.0) *
        graft.functions.VectorOps.dot(col("emb"), col("semb")))
      .groupBy(col("cluster_id"), col("vec_id"))
      .agg(min_by(col("sub_id"), struct(col("d2"), col("sub_id")))
        .as("sub_id"))
      .groupBy(col("cluster_id"), col("sub_id"))
      .agg(count(lit(1)).as("n_vectors"))
      .select(col("cluster_id"), col("sub_id"), col("n_vectors"),
        lit(true).as("was_hot"))
    val coldCells = sizes.join(hot, Seq("cluster_id"), "left_anti")
      .select(col("cluster_id"), lit(0L).as("sub_id"),
        col("n_before").as("n_vectors"), lit(false).as("was_hot"))
    val after = coldCells.unionByName(splitCells)
    val before = sizes.agg(max(col("n_before")).as("max_before"),
      count(lit(1)).as("k_before"))
    val afterStats = after.agg(max(col("n_vectors")).as("max_after"),
      count(lit(1)).as("k_after"))
    after.crossJoin(broadcast(before)).crossJoin(broadcast(afterStats))
      .crossJoin(broadcast(tot))
      .select(col("cluster_id"), col("sub_id"), col("n_vectors"),
        col("was_hot"),
        expr("max_before * 100 * k_before div n_total")
          .as("skew_before_x100"),
        expr("max_after * 100 * k_after div n_total")
          .as("skew_after_x100"))
      .orderBy(col("cluster_id"), col("sub_id"))
  }
}

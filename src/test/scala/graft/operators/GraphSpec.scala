package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph/sequence layer: Markov transitions, fixed-point PageRank
  * invariants, item-neighbor symmetry, split assignment hygiene. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, e, t) =>
      (u, e, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${e % 60}%02d"), t)
    }.toDF("user_id", "event_id", "ts", "event_type")

  test("transition counts model per-user consecutive steps") {
    val events = ev((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 4L, "b"), (2L, 5L, "b"))
    val got = Graph.transitionCounts(events).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 1.0)),
      ("b", "a") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 0.5))))
  }

  test("pagerank fixed point: a symmetric 2-cycle keeps uniform rank") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val ranks = Graph.pagerank(edges, iters = 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    // contrib = full mass each step: r' = 0.15S + 0.85S = S exactly
    assert(ranks == Map("a" -> 1000000000L, "b" -> 1000000000L))
  }

  test("pagerank converges to the hand-computed fixed-point longs") {
    // a -> b only: a has no in-edges (teleport floor), b absorbs
    // 0.85 * r(a); all arithmetic exact integers
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val ranks = Graph.pagerank(edges, iters = 3).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    assert(ranks("a") == 150000000L)
    assert(ranks("b") == 150000000L + 85L * 150000000L / 100L)
  }

  test("item neighbors are symmetric with identical lift both ways") {
    val events = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "c")).toDF("user_id", "event_type")
    val rows = CoOccurrence.itemNeighbors(events, k = 3).collect()
    val byPair = rows.map(r => (r.getAs[String]("item"),
      r.getAs[String]("neighbor")) -> r.getAs[Double]("lift")).toMap
    assert(byPair(("a", "b")) == byPair(("b", "a")),
      "lift must be direction-independent")
    assert(byPair.contains(("c", "a")) && byPair.contains(("a", "c")))
    // ranks start at 1 per item and are dense
    val ranks = rows.groupBy(_.getAs[String]("item"))
      .view.mapValues(_.map(_.getAs[Long]("rank")).sorted.toSeq).toMap
    assert(ranks.values.forall(rs => rs == (1L to rs.length).toSeq))
  }

  test("two-step paths are the integer matrix square of transitions") {
    // user 1: a->b->c; user 2: a->b->c (so a->b n=2, b->c n=2);
    // user 3: b->c (b->c n=3 total). paths a->c = n(a,b)*n(b,c) = 2*3
    val events = ev((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 4L, "a"), (2L, 5L, "b"), (2L, 6L, "c"),
      (3L, 7L, "b"), (3L, 8L, "c"))
    val got = Graph.twoStepPaths(events).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        r.getAs[Long]("n_paths")).toMap
    assert(got == Map(("a", "c") -> 6L))
  }

  test("safe split quarantines contaminated docs and labels benchmarks") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = col("doc_id") % 100 === 0
    val got = Sampling.safeSplit(docs, bench).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(got.size == docs.count(), "every doc gets exactly one label")
    val benchIds = docs.filter(bench).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(benchIds.forall(got(_) == "benchmark"))
    val contaminated = TextAnalysis.contaminationScores(docs, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(contaminated.nonEmpty, "fixture should exhibit contamination")
    assert(contaminated.forall(got(_) == "quarantine"))
    // everyone else got a plain t21 split
    val rest = got.keySet -- benchIds -- contaminated
    assert(rest.forall(id => Set("train", "val", "test")(got(id))))
  }

  test("split assignment is disjoint, exhaustive, and ~80/10/10") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val got = Sampling.splitAssign(docs)
    assert(got.count() == n, "every document gets exactly one split")
    val counts = got.groupBy(col("split")).count().collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("count")).toMap
    assert(counts.values.sum == n)
    assert(counts("train") > n * 7 / 10 && counts("train") < n * 9 / 10)
    assert(counts("val") > 0 && counts("test") > 0)
    // leakage-proofness: reruns never migrate a document
    assert(got.collect().toSeq == Sampling.splitAssign(docs).collect().toSeq)
  }

  test("triangle census: 4-clique gives coeff 1.0 everywhere") {
    // directed pairs with duplicates/reversals — symmetrization dedupes
    val pairs = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 3L)).toDF("vec_id", "neighbor_id")
    val got = Graph.trianglesOnEdges(pairs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering_coeff")))).toMap
    // K4: every node degree 3, sits in C(3,2)=3 triangles, coeff 1
    assert(got == (1L to 4L).map(_ -> ((3L, 3L, 1.0))).toMap)
  }

  test("triangle census: path graph has zero triangles, coeff 0") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("vec_id", "neighbor_id")
    val got = Graph.trianglesOnEdges(pairs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering_coeff")))).toMap
    assert(got == Map(1L -> ((1L, 0L, 0.0)), 2L -> ((2L, 0L, 0.0)),
      3L -> ((2L, 0L, 0.0)), 4L -> ((1L, 0L, 0.0))))
  }

  test("triangle census: triangle + pendant mixes coefficients") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("vec_id", "neighbor_id")
    val got = Graph.trianglesOnEdges(pairs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering_coeff")))).toMap
    // node 3 bridges: degree 3, 1 triangle of 3 possible pairs
    assert(got == Map(1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((3L, 1L, 1.0 / 3.0)), 4L -> ((1L, 0L, 0.0))))
  }

  test("q40 recursive paths match local matrix-power path counts") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q40_recursive_paths")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        ((r.getAs[Long]("min_hops"), r.getAs[Long]("n_paths")))).toMap
    // reference: adjacency matrix powers over the distinct edge set —
    // n_paths = sum of A^L entries for L=1..4, min_hops = first L>0
    val edges = Graph.transitionCounts(
        graft.Tables.events(spark, sf)).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.size
    val a = Array.ofDim[Long](n, n)
    for ((s, d) <- edges) a(idx(s))(idx(d)) = 1L
    def mul(x: Array[Array[Long]], y: Array[Array[Long]]) = {
      val z = Array.ofDim[Long](n, n)
      for (i <- 0 until n; k <- 0 until n if x(i)(k) != 0;
           j <- 0 until n) z(i)(j) += x(i)(k) * y(k)(j)
      z
    }
    val expect = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    var p = a
    for (hop <- 1 to 4) {
      for (i <- 0 until n; j <- 0 until n if p(i)(j) > 0) {
        val key = (nodes(i), nodes(j))
        val (mh, np) = expect.getOrElse(key, (hop.toLong, 0L))
        expect(key) = (mh, np + p(i)(j))
      }
      if (hop < 4) p = mul(p, a)
    }
    assert(got == expect.toMap,
      s"missing=${(expect.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expect.keySet).take(3)}")
    // the recursion genuinely multiplies: path counts exceed edge counts
    assert(got.values.exists(_._2 > 1L), "no multi-path pair — vacuous")
  }

  test("g06 over the fixture kNN graph: counts match a local census") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val knn = Similarity.knnGraph(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
    val und = knn.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSet
    val nbrs = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val localTri = nbrs.map { case (n, ns) =>
      n -> ns.toSeq.combinations(2).count {
        case Seq(x, y) => nbrs(x).contains(y); case _ => false }
    }
    val got = Graph.knnTriangles(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles")))).toMap
    assert(got.keySet == nbrs.keySet)
    nbrs.foreach { case (n, ns) =>
      assert(got(n) == ((ns.size.toLong, localTri(n).toLong)),
        s"node $n census mismatch")
    }
    assert(got.values.map(_._2).sum > 0, "fixture kNN graph has triangles")
  }

  test("shared-neighbor links: hand-computed Jaccard on a crafted graph") {
    // out-neighbor lists: 1→{10,11,12}, 2→{10,11,13}, 3→{13,14}
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 13L),
      (3L, 13L), (3L, 14L)).toDF("vec_id", "neighbor_id")
    val got = Graph.sharedNeighborsOnEdges(edges, minShared = 1L)
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard")))).toMap
    // (1,2): share {10,11} → J = 2/(3+3-2) = 0.5
    // (2,3): share {13}    → J = 1/(3+2-1) = 0.25
    // (1,3): share nothing → absent
    assert(got == Map((1L, 2L) -> ((2L, 0.5)), (2L, 3L) -> ((1L, 0.25))))
  }

  test("deterministic walks: valid edges, constant fan-out, rerun-stable") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val edges = graft.operators.Similarity.knnGraph(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val nodes = edges.map(_._1)
    def runOnce() = Graph.deterministicWalks(emb).collect()
      .map(r => (r.getAs[Long]("start_id"), r.getAs[Long]("walk_no"),
        r.getAs[Long]("step"), r.getAs[Long]("node")))
    val w1 = runOnce()
    // every start × walk emits exactly walkLen+1 = 4 steps (out-degree
    // is k everywhere, so no walk dies early)
    assert(w1.length == nodes.size * 2 * 4)
    // step-0 node is the start; every later hop is a real kNN edge
    val byWalk = w1.groupBy(t => (t._1, t._2))
    byWalk.foreach { case ((start, _), steps) =>
      val path = steps.sortBy(_._3).map(_._4)
      assert(path.head == start)
      path.sliding(2).foreach {
        case Array(a, b) =>
          assert(edges((a, b)), s"walk used non-edge $a->$b")
        case _ => ()
      }
    }
    // seeded PRNG: a second run is bit-identical
    assert(runOnce().toSeq.sorted == w1.toSeq.sorted)
    // and the two walks from one start genuinely diverge somewhere
    assert(byWalk.exists { case ((s, w), steps) =>
      w == 1L && byWalk((s, 0L)).sortBy(_._3).map(_._4).toSeq !=
        steps.sortBy(_._3).map(_._4).toSeq
    }, "all walk pairs identical — the per-walk seed is not decorrelating")
  }

  test("shared-neighbor links honor the minShared floor and a<b order") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Graph.sharedNeighborLinks(emb).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (ns, da, db) = (r.getAs[Long]("n_shared"),
        r.getAs[Long]("deg_a"), r.getAs[Long]("deg_b"))
      assert(a < b && ns >= 2L)
      assert(r.getAs[Double]("jaccard") ==
        ns.toDouble / (da + db - ns).toDouble)
      assert(ns <= math.min(da, db))
    }
  }
  test("g09 modularity: two clean blobs at k=2 score exactly 0.5") {
    // two tight 4-point blobs; nCells=2 seeds {0,1} land one per blob;
    // k=3 within-cell kNN makes each blob a complete K4: e_c=6, m=12,
    // deg_c=12 -> Q = 2*(6/12 - (12/24)^2) = 0.5, exact in doubles
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.02f, 0.98f)),
      (4L, Array(0.99f, 0.01f)), (5L, Array(0.01f, 0.99f)),
      (6L, Array(0.97f, 0.03f)), (7L, Array(0.03f, 0.97f))
    ).toDF("vec_id", "embedding")
    val rows = Graph.cellModularity(emb, k = 3, nCells = 2).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 4L)
      assert(r.getAs[Long]("e_intra") == 6L)
      assert(r.getAs[Long]("deg_sum") == 12L)
      assert(r.getAs[Long]("q_num") == 144L)
      assert(r.getAs[Double]("q_term") == 0.25)
      assert(r.getAs[Double]("modularity") == 0.5)
    }
  }

  test("g09 on the fixture: exact invariants and determinism") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Graph.cellModularity(emb).collect()
    assert(rows.nonEmpty && rows.length <= 32)
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == emb.count())
    // recompute m from the symmetrized edge list and check identities:
    // sum(deg) = 2m, sum(e_intra) <= m, Q = sum(q_num)/(4m^2)
    val und = Similarity.knnGraph(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val m = und.size.toLong
    assert(rows.map(_.getAs[Long]("deg_sum")).sum == 2L * m)
    assert(rows.map(_.getAs[Long]("e_intra")).sum <= m)
    val q = rows.map(_.getAs[Long]("q_num")).sum.toDouble /
      (4.0 * m.toDouble * m.toDouble)
    val rep = rows.head.getAs[Double]("modularity")
    assert(rep == q, s"reported $rep vs recomputed $q")
    assert(rep > 0.0 && rep <= 1.0, s"modularity out of band: $rep")
    val again = Graph.cellModularity(emb).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("pprSeedExpansion (g10): bit-identical to an independent " +
      "replay of the fixed-point loop over the collected edge list") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Graph.pprSeedExpansion(emb).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Boolean]("is_seed"), r.getAs[Long]("rank_fp"))))
      .toMap
    // replay: same integer ops, same order-free sums
    val edges = Similarity.knnGraph(emb).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
    val nodes = edges.map(_._1).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rk = nodes.map(n =>
      n -> (if (n % 50 == 0) 1000000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s0, d0) => contrib(d0) += rk(s0) / deg(s0) }
      rk = nodes.map(n => n -> ((if (n % 50 == 0) 150000000L else 0L) +
        85L * contrib(n) / 100L)).toMap
    }
    val expected = rk.filter(_._2 > 0L)
      .map { case (n, r) => n -> ((n % 50 == 0, r)) }
    assert(got == expected)
    // the teleport floor holds for every seed; expansion reached
    // non-seed nodes
    assert(got.collect { case (n, (true, r)) => r }
      .forall(_ >= 150000000L))
    assert(got.exists { case (_, (seed, _)) => !seed })
  }

  test("hits (g11): hand-computed two-iteration fixed point with the " +
      "shift normalizer; hubs and authorities split cleanly") {
    import spark.implicits._
    // h1 -> {a1, a2}, h2 -> {a1}: a1 is the stronger authority, h1
    // the stronger hub; pure hubs have auth 0 and vice versa
    val edges = Seq(("h1", "a1", 1L), ("h2", "a1", 1L),
      ("h1", "a2", 1L)).toDF("src", "dst", "w")
    val out = Graph.hits(edges, iters = 2).collect()
      .map(r => (r.getString(0), r.getAs[Long]("auth_fp"),
        r.getAs[Long]("hub_fp"), r.getAs[Double]("auth"),
        r.getAs[Double]("hub")))
    // iter 1: araw = (2S, S) -> shift 1 -> (S, S/2); hraw =
    // (3·2^29, 2^30) -> shift 0. iter 2: araw = (5·2^29, 3·2^29) ->
    // shift 1 -> (5·2^28, 3·2^28); hraw = (2^31, 5·2^28) -> shift 1
    assert(out.toSeq == Seq(
      ("a1", 5L << 28, 0L, 1.25, 0.0),
      ("a2", 3L << 28, 0L, 0.75, 0.0),
      ("h1", 0L, 1L << 30, 0.0, 1.0),
      ("h2", 0L, 5L << 27, 0.0, 0.625)))
  }

  test("eventTypeHits on the fixture: bit-identical reruns, max parked " +
      "in [2^30, 2^31), roles anti-correlated with pagerank's single " +
      "score") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val a = Graph.eventTypeHits(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = Graph.eventTypeHits(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq) // integer law: no float drift anywhere
    assert(a.nonEmpty)
    val maxA = a.map(_._2).max
    assert(maxA >= (1L << 30) && maxA < (1L << 31))
    val maxH = a.map(_._3).max
    assert(maxH >= (1L << 30) && maxH < (1L << 31))
    assert(a.forall(r => r._2 >= 0L && r._3 >= 0L))
  }
}

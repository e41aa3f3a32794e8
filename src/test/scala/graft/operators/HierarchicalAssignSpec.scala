package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Clustering.assignPruned]] is a PLAN-ONLY change: the two-level
  * triangle-inequality prune must select, row for row, the identical
  * (cluster_id, dist2) winners as the brute broadcast×corpus
  * [[Clustering.assign]] — that equality is what keeps every oracle of
  * the s21 kNN-graph family (g06–g11, s43–s46) untouched while the
  * assignment cost drops from O(N·K) to ~O(N·√K). */
class HierarchicalAssignSpec extends SparkSpec {

  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def vectorsOf(e: DataFrame): DataFrame = e
    .select(col("vec_id"), col("embedding").as("emb"))
    .withColumn("vnorm2",
      graft.functions.VectorOps.dot(col("emb"), col("emb")))

  private def dump(df: DataFrame): Seq[String] =
    df.orderBy("vec_id").collect().map(_.toString).toSeq

  test("pruned == brute bitwise across K on the fixture corpus") {
    for (k <- Seq(4, 8, 23, 64, 100)) {
      val vectors = vectorsOf(emb)
      val centroids = Clustering.trainedCentroidsLocal(emb, k)
      val brute = dump(Clustering.assign(vectors, centroids))
      val pruned = dump(Clustering.assignPruned(vectors, centroids))
      assert(pruned == brute, s"pruned assignment diverges at K=$k")
    }
  }

  test("pruned == brute on a scaled corpus with co-scaled K (s21 shape)") {
    val factor = 8
    val scaled = graft.ScaledTables.scaled(emb, factor,
      idCols = Seq("vec_id"), vecCols = Seq("embedding"))
    val k = 32 * factor
    val vectors = vectorsOf(scaled)
    val centroids = Clustering.trainedCentroidsLocal(scaled, k)
    assert(dump(Clustering.assignPruned(vectors, centroids)) ==
      dump(Clustering.assign(vectors, centroids)))
  }

  test("tie-break parity: duplicate centroids resolve to the lower id") {
    // v0 sits exactly between c10/c20; c30 duplicates c10's position —
    // three global minima, brute's (dist2, cluster_id) min_by keeps 10
    val vectors = Seq(
      (0L, Array(5.0f, 0.0f)),
      (1L, Array(0.1f, 0.0f)),
      (2L, Array(9.9f, 0.0f))
    ).toDF("vec_id", "emb")
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val centroids = Seq(
      (10L, Array(0.0f, 0.0f)),
      (20L, Array(10.0f, 0.0f)),
      (30L, Array(0.0f, 0.0f))
    ).toDF("cluster_id", "cemb")
      .withColumn("cnorm2",
        graft.functions.VectorOps.dot(col("cemb"), col("cemb")))
    val brute = dump(Clustering.assign(vectors, centroids))
    val pruned = dump(Clustering.assignPruned(vectors, centroids))
    assert(pruned == brute)
    val byVec = Clustering.assignPruned(vectors, centroids)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(byVec(0L) == 10L && byVec(1L) == 10L && byVec(2L) == 20L)
  }

  test("training parity: assignAuto-trained centroids match brute training") {
    val k = 64 // >= PrunedAssignK, so trainedCentroidsSeeded prunes
    val vectors = vectorsOf(emb)
    val init = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster_id"),
        col("embedding").as("cemb"))
      .withColumn("cnorm2",
        graft.functions.VectorOps.dot(col("cemb"), col("cemb")))
    val bruteTrained = Clustering.medianCentroids(
      Clustering.assign(vectors, init))
      .orderBy("cluster_id").collect().map(_.toString).toSeq
    val viaAuto = Clustering.trainedCentroidsLocal(emb, k)
      .orderBy("cluster_id").collect().map(_.toString).toSeq
    assert(viaAuto == bruteTrained)
  }

  test("pruned plan shape: hash join on the group id, no cartesian") {
    val vectors = vectorsOf(emb)
    val centroids = Clustering.trainedCentroidsLocal(emb, 64)
    val plan = Clustering.assignPruned(vectors, centroids)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "member lookup should be a broadcast HASH join keyed on _gid")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "pruned path must not fall back to the brute crossJoin shape")
  }

  test("pruned == brute on a 1000x-norm corpus (slack scales with the norm)") {
    // the admission slack carries a 1e-5·(‖x‖ + max‖g‖) term precisely
    // so large-magnitude corpora stay exact — at ‖x‖ ~ 4000 the
    // norm-expansion rounding (~1e-7·‖x‖ ≈ 5e-4) would exceed a fixed
    // 1e-4 margin and could prune a true winner
    val big = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => (x * lit(1000.0f)).cast("float")).as("embedding"))
    val vectors = vectorsOf(big)
    val centroids = Clustering.trainedCentroidsLocal(big, 64)
    assert(dump(Clustering.assignPruned(vectors, centroids)) ==
      dump(Clustering.assign(vectors, centroids)))
  }

  test("pruned == brute with ragged (mixed-length) vectors") {
    // graft_dot folds over the common prefix with full-vector norms —
    // zero-padded Euclidean semantics; the driver-side radii must use
    // the same metric or a short member under a long coarse center
    // gets an understated covering radius and the bound breaks
    val data = (0L until 80L).map { i =>
      val len = if (i % 3 == 0) 2 else 4
      (i, Array.tabulate(len)(j => (i % 7 + j).toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val vectors = vectorsOf(df)
    val centroids = Clustering.trainedCentroidsLocal(df, 64)
    assert(dump(Clustering.assignPruned(vectors, centroids)) ==
      dump(Clustering.assign(vectors, centroids)))
    def dumpM(d2: DataFrame): Seq[String] =
      d2.orderBy("vec_id", "crk").collect().map(_.toString).toSeq
    assert(dumpM(Clustering.assignTopMPruned(vectors, centroids, 3)) ==
      dumpM(Clustering.assignTopM(vectors, centroids, 3)))
  }

  test("top-m pruned == top-m brute bitwise across K and m") {
    for ((k, m) <- Seq((8, 2), (23, 3), (64, 2), (100, 5))) {
      val vectors = vectorsOf(emb)
      val centroids = Clustering.trainedCentroidsLocal(emb, k)
      def dumpM(df: DataFrame): Seq[String] =
        df.orderBy("vec_id", "crk").collect().map(_.toString).toSeq
      val brute = dumpM(Clustering.assignTopM(vectors, centroids, m))
      val pruned = dumpM(
        Clustering.assignTopMPruned(vectors, centroids, m))
      assert(pruned == brute, s"top-$m pruned diverges at K=$k")
    }
  }

  test("top-1 of assignTopM matches assign's winner") {
    val vectors = vectorsOf(emb)
    val centroids = Clustering.trainedCentroidsLocal(emb, 16)
    val viaTopM = Clustering.assignTopM(vectors, centroids, 1)
      .select("vec_id", "cluster_id", "dist2")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val viaMin = Clustering.assign(vectors, centroids)
      .select("vec_id", "cluster_id", "dist2")
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(viaTopM == viaMin)
  }

  test("broadcast-coarse carrier == literal carrier == brute (forced)") {
    // beyond spark.graft.coarseLiteralMax the coarse tier ships as a
    // one-row broadcast table instead of a plan literal; forcing the
    // threshold to 0 exercises that carrier on the fixture — the
    // admission algebra is shared, so outputs must stay bitwise equal
    val vectors = vectorsOf(emb)
    val centroids = Clustering.trainedCentroidsLocal(emb, 64)
    val bruteArg = dump(Clustering.assign(vectors, centroids))
    val bruteTop = Clustering.assignTopM(vectors, centroids, 3)
      .orderBy("vec_id", "crk").collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.coarseLiteralMax", "0")
    try {
      val viaBcast = dump(Clustering.assignPruned(vectors, centroids))
      assert(viaBcast == bruteArg)
      val topBcast = Clustering.assignTopMPruned(vectors, centroids, 3)
        .orderBy("vec_id", "crk").collect().map(_.toString).toSeq
      assert(topBcast == bruteTop)
      val plan = Clustering.assignPruned(vectors, centroids)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"),
        "forced path should carry the coarse tier via broadcast")
    } finally spark.conf.unset("spark.graft.coarseLiteralMax")
    // back on the literal carrier the plan must carry no 1-row cross
    val litPlan = Clustering.assignPruned(vectors, centroids)
      .queryExecution.executedPlan.toString
    assert(!litPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("s47 multi-assign recall dominates s21 per vector (fixture)") {
    // truth: exact top-5 over ALL pairs (500² at the fixture)
    val vectors = vectorsOf(emb)
    val truth = vectors
      .join(vectors.select(col("vec_id").as("nbr_id"),
        col("emb").as("nemb"), col("vnorm2").as("nnorm2")),
        col("vec_id") =!= col("nbr_id"))
      .withColumn("cosine",
        graft.functions.VectorOps.dot(col("emb"), col("nemb")) /
          (sqrt(col("vnorm2")) * sqrt(col("nnorm2"))))
      .select(col("vec_id").as("q"), col("nbr_id").as("n"),
        col("cosine"))
    def hits(graph: DataFrame): Map[Long, Long] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q"))
        .orderBy(col("cosine").desc, col("n").asc)
      val top = truth.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5).select(col("q"), col("n"))
      top.join(graph.select(col("vec_id").as("q"),
          col("neighbor_id").as("n")), Seq("q", "n"))
        .groupBy("q").count()
        .as[(Long, Long)].collect().toMap
    }
    val single = hits(Similarity.knnGraph(emb))
    val multi = hits(Similarity.knnGraphMulti(emb))
    val vecs = emb.select("vec_id").as[Long].collect()
    vecs.foreach { v =>
      assert(multi.getOrElse(v, 0L) >= single.getOrElse(v, 0L),
        s"multi-assign lost recall at vec $v")
    }
    val (sTot, mTot) = (single.values.sum, multi.values.sum)
    info(s"recall@5 hits: single=$sTot multi=$mTot of ${vecs.length * 5}")
    assert(mTot >= sTot)
  }

  test("knnGraph at a pruning-tier cell count stays deterministic") {
    val g1 = Similarity.knnGraph(emb, k = 3, nCells = 64)
      .collect().map(_.toString).toSeq
    val g2 = Similarity.knnGraph(emb, k = 3, nCells = 64)
      .collect().map(_.toString).toSeq
    assert(g1 == g2 && g1.nonEmpty)
  }
}

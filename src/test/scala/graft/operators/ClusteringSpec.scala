package graft.operators

import graft.SparkSpec

/** k-medians: hand-checkable two-cluster fixture plus determinism and
  * coverage properties on the driver fixture. */
class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  test("two well-separated clusters converge to their medians") {
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), // seed cluster 0
      (1L, Array(10.0f, 10.0f)), // seed cluster 1
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(9.0f, 10.0f)),
      (5L, Array(10.0f, 9.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmediansAssign(vecs, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(Seq(0L, 2L, 3L).forall(v => out(v)._1 == 0L))
    assert(Seq(1L, 4L, 5L).forall(v => out(v)._1 == 1L))
    // round-2 medians are [0,0] and [10,10]; v0 and v1 sit exactly on them
    assert(out(0L)._2 == 0.0 && out(1L)._2 == 0.0)
    // v2 = [1,0] → dist² to [0,0] is 1
    assert(out(2L)._2 == 1.0)
  }

  test("every vector is assigned exactly once on the fixture") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Clustering.kmediansAssign(emb, k = 8)
    assert(out.count() == emb.count())
    assert(out.select("cluster_id").distinct().count() <= 8)
    // deterministic: second run bitwise-equal
    val a = out.collect().map(_.toString).toSeq
    val b = Clustering.kmediansAssign(emb, k = 8)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("elbow curve: every K covers the corpus, inertia falls with K") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val rows = Clustering.elbowCurve(emb).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_vectors"),
        r.getAs[Long]("inertia_fp"), r.getAs[Double]("mean_dist2")))
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    assert(rows.forall(_._2 == n), "every sweep point assigns all vectors")
    // seeded k-medians on this fixture: more cells = closer centroids;
    // the endpoints must improve substantially, the sweep overall
    // monotonically (the property the elbow read depends on)
    val inertias = rows.map(_._3)
    assert(inertias.zip(inertias.tail).forall { case (a, b) => b <= a },
      s"inertia not non-increasing: ${inertias.toSeq}")
    assert(inertias.last < inertias.head)
    assert(rows.forall(_._4 > 0.0))
  }

  test("clusterAgreement: separated clusters agree across seedings") {
    import spark.implicits._
    // two tight, well-separated blobs; k=2 with seeds {0,1} vs {2,3}
    // lands one seed in each blob both times → identical partition,
    // Rand index exactly 1.0
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.98f, 0.02f)), (3L, Array(0.02f, 0.98f)),
      (4L, Array(0.99f, 0.01f)), (5L, Array(0.01f, 0.99f)),
      (6L, Array(0.97f, 0.03f)), (7L, Array(0.03f, 0.97f))
    ).map { case (i, v) => (i, v, 0) }
      .toDF("vec_id", "embedding", "label")
    val out = Clustering.clusterAgreement(emb, k = 2).collect()
    assert(out.forall(_.getAs[Double]("rand_index") == 1.0))
    // contingency: every A-cluster maps to exactly one B-cluster
    val byA = out.groupBy(_.getAs[Long]("cluster_a"))
    assert(byA.values.forall(_.length == 1))
    assert(out.map(_.getAs[Long]("n_ab")).sum == 8L)
  }

  test("clusterAgreement on the fixture: sane bounds, full coverage") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Clustering.clusterAgreement(emb).collect()
    val rand = out.head.getAs[Double]("rand_index")
    assert(rand > 0.5 && rand <= 1.0, s"rand=$rand")
    assert(out.map(_.getAs[Long]("n_ab")).sum == emb.count())
  }

  test("simplifiedSilhouette: hand-checked two-cluster values") {
    import spark.implicits._
    // same two-blob fixture as the k-medians test: trained centroids
    // land exactly on [0,0] and [10,10]
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)),
      (4L, Array(9.0f, 10.0f)), (5L, Array(10.0f, 9.0f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.simplifiedSilhouette(vecs, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // seeds sit ON their centroid: a=0 -> s=1 (s_fp 1,000,000); the
    // four satellites: a=1, b=sqrt(181) (e.g. [1,0] to [10,10]:
    // 1+200-2*10), s=(b-1)/b — the same double tree as the plan's
    val b = math.sqrt(181.0)
    val sat = math.floor((b - 1.0) / b * 1000000.0).toLong
    val expectSum = 1000000L + 2L * sat
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L)._1 == 3L && out(1L)._1 == 3L)
    assert(out(0L)._2 == expectSum && out(1L)._2 == expectSum)
    assert(out.values.forall(v => v._3 > 0.9 && v._3 < 1.0))
  }

  test("simplifiedSilhouette on the fixture: full coverage, bounded, " +
      "deterministic") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Clustering.simplifiedSilhouette(emb).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    assert(rows.length <= 8)
    assert(rows.forall { r =>
      val m = r.getAs[Double]("mean_sil"); m >= -1.0 && m <= 1.0 })
    val again = Clustering.simplifiedSilhouette(emb).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
  test("hotCellSplit: a 6-vs-2 skew splits the hot cell on its two " +
      "lowest-id seeds; skew metric drops") {
    import spark.implicits._
    // cell A (trained id 0): sub-blob P {0,3,5} near (1,0) and
    // sub-blob Q {2,4,6} near (0.7,0.3); cell B (trained id 1): {1,7}.
    // k=2, hotFactor=1: A (6 of 8) is hot; seeds are vec 0 (P) and
    // vec 2 (Q), so the nearest-of-two halves ARE the sub-blobs.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.7f, 0.3f)), (3L, Array(0.98f, 0.02f)),
      (4L, Array(0.68f, 0.32f)), (5L, Array(0.96f, 0.04f)),
      (6L, Array(0.66f, 0.34f)), (7L, Array(0.02f, 0.98f))
    ).toDF("vec_id", "embedding")
    val rows = Clustering.hotCellSplit(emb, k = 2, hotFactor = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows.keySet == Set((0L, 1L), (0L, 2L), (1L, 0L)))
    assert(rows((0L, 1L)) == ((3L, true, 150L, 112L)))
    assert(rows((0L, 2L)) == ((3L, true, 150L, 112L)))
    assert(rows((1L, 0L)) == ((2L, false, 150L, 112L)))
  }

  test("hotCellSplit on the fixture: coverage, skew non-increasing, " +
      "deterministic") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Clustering.hotCellSplit(emb).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    val (sb, sa) = (rows.head.getAs[Long]("skew_before_x100"),
      rows.head.getAs[Long]("skew_after_x100"))
    assert(sa <= sb, s"skew went up: $sb -> $sa")
    rows.foreach { r =>
      if (r.getAs[Boolean]("was_hot"))
        assert(Set(1L, 2L).contains(r.getAs[Long]("sub_id")))
      else assert(r.getAs[Long]("sub_id") == 0L)
    }
    val again = Clustering.hotCellSplit(emb).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("daviesBouldin (k06): separated hand clusters score tiny, " +
      "worst_other is mutual, index = cluster-ordered mean of r_max") {
    import spark.implicits._
    // two tight groups 10 apart; k=2 seeds (vec 0, 1) converge to
    // centroids (0,0) and (10,0) after the median round
    val vecs = Seq(
      (0L, 0, Array(0.0f, 0.0f)),
      (1L, 0, Array(0.2f, 0.0f)),
      (2L, 0, Array(10.0f, 0.0f)),
      (3L, 0, Array(10.2f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val rows = Clustering.daviesBouldin(vecs, k = 2).collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getAs[Long]("cluster_id") -> r).toMap
    assert(byId(0L).getAs[Long]("worst_other") == 1L)
    assert(byId(1L).getAs[Long]("worst_other") == 0L)
    val dbv = rows.map(_.getAs[Double]("db_index")).distinct
    assert(dbv.length == 1 && dbv.head < 0.05 && dbv.head > 0.0)
    // the published index IS the cluster-ordered fold of r_max / K
    val folded = rows.sortBy(_.getAs[Long]("cluster_id"))
      .map(_.getAs[Double]("r_max"))
      .foldLeft(0.0)(_ + _) / rows.length.toDouble
    assert(dbv.head == folded)
    // fixture: K rows, one shared index value, deterministic
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val fix = Clustering.daviesBouldin(emb).collect()
    assert(fix.length == 8)
    assert(fix.map(_.getAs[Double]("db_index")).distinct.length == 1)
    fix.foreach { r =>
      assert(r.getAs[Long]("worst_other") != r.getAs[Long]("cluster_id"))
      assert(r.getAs[Double]("r_max") > 0.0)
      assert(r.getAs[Double]("scatter") >= 0.0)
    }
    val again = Clustering.daviesBouldin(emb).collect()
    assert(fix.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("calinskiHarabasz (k07): separated blobs score high where k06 " +
      "scores tiny; the published index recomputes from its own parts") {
    import spark.implicits._
    val apart = Seq(
      (0L, 0, Array(0.0f, 0.0f)),
      (1L, 0, Array(0.2f, 0.0f)),
      (2L, 0, Array(10.0f, 0.0f)),
      (3L, 0, Array(10.2f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val rows = Clustering.calinskiHarabasz(apart, k = 2).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Double]("ch_index")).distinct.length == 1)
    val ch = rows.head.getAs[Double]("ch_index")
    val bgss = rows.head.getAs[Double]("bgss")
    val wgss = rows.head.getAs[Double]("wgss")
    // 10-apart blobs of width 0.2: between-variance dwarfs within
    assert(ch > 100.0)
    // the division tree is the published law, bit for bit
    val n = rows.map(_.getAs[Long]("n_vectors")).sum
    val k = rows.length.toLong
    assert(ch == (bgss / (k - 1).toDouble) / (wgss / (n - k).toDouble))
    // per-cluster wgss_k parts sum to the total (micros quantization:
    // both sides are sums of the same exact longs / 1e6)
    val partsFp = rows.map(r =>
      math.rint(r.getAs[Double]("wgss_k") * 1000000.0).toLong).sum
    assert(math.rint(wgss * 1000000.0).toLong == partsFp)
    // polarity: the same data k06 scores near 0, k07 scores high
    val db = Clustering.daviesBouldin(apart, k = 2).collect()
      .head.getAs[Double]("db_index")
    assert(db < 0.05 && ch > 100.0)
    // a single smeared blob forced into k=2 scores far lower
    val smear = Seq(
      (0L, 0, Array(0.0f, 0.0f)),
      (1L, 0, Array(0.2f, 0.1f)),
      (2L, 0, Array(0.4f, 0.0f)),
      (3L, 0, Array(0.6f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
    val chSmear = Clustering.calinskiHarabasz(smear, k = 2).collect()
      .head.getAs[Double]("ch_index")
    assert(chSmear < ch / 10.0)
  }

  test("calinskiHarabasz on the fixture: K rows, one shared positive " +
      "index, bit-identical reruns") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val fix = Clustering.calinskiHarabasz(emb).collect()
    assert(fix.length == 8)
    assert(fix.map(_.getAs[Double]("ch_index")).distinct.length == 1)
    assert(fix.head.getAs[Double]("ch_index") > 0.0)
    fix.foreach { r =>
      assert(r.getAs[Long]("n_vectors") > 0L)
      assert(r.getAs[Double]("wgss_k") >= 0.0)
    }
    val again = Clustering.calinskiHarabasz(emb).collect()
    assert(fix.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}

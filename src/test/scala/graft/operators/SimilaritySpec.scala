package graft.operators

import graft.SparkSpec

/** Known-geometry checks of the similarity-search layer. */
class SimilaritySpec extends SparkSpec {

  // query 0 in bucket 0; neighbors engineered at known cosines
  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, 0, Array(1.0f, 0.0f)),
      (1L, 0, Array(1.0f, 0.1f)), // cos ~ 0.995
      (2L, 0, Array(1.0f, 1.0f)), // cos ~ 0.707
      (3L, 1, Array(1.0f, 0.01f)), // closer, but bucket 1
      (4L, 0, Array(0.0f, 1.0f)) // cos 0
    ).toDF("vec_id", "label", "embedding")
  }

  test("bruteForceTopK ranks by cosine across all buckets") {
    val out = Similarity.bruteForceTopK(vecs, nQueries = 1, k = 3)
      .collect().map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank")))
    // 3 is nearest (cos~0.99995), then 1, then 2
    assert(out.toSeq == Seq((3L, 1L), (1L, 2L), (2L, 3L)))
  }

  test("ivfTopK only probes the query's own bucket") {
    val out = Similarity.ivfTopK(vecs, nQueries = 1, k = 3)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(out.toSeq == Seq(1L, 2L, 4L)) // 3 excluded: bucket 1
  }

  test("self-match is excluded and cosine is in [-1, 1]") {
    val out = Similarity.bruteForceTopK(vecs, nQueries = 1, k = 10).collect()
    assert(!out.exists(_.getAs[Long]("neighbor_id") == 0L))
    assert(out.forall { r =>
      val c = r.getAs[Double]("cosine"); c >= -1.0001 && c <= 1.0001
    })
  }
}

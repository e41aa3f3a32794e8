package graft.operators

import graft.SparkSpec

/** The serving tier's model-artifact store stand-in: train once per
  * (kind, params, input plan) per session, load thereafter. */
class ModelArtifactsSpec extends SparkSpec {

  test("cached trains exactly once per key and keys on plan + params") {
    import spark.implicits._
    ModelArtifacts.clear()
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    var trains = 0
    def train(df: org.apache.spark.sql.DataFrame) = { trains += 1; df }
    ModelArtifacts.cached("t", a, "p=1")(train(a))
    ModelArtifacts.cached("t", a, "p=1")(train(a))
    assert(trains == 1, "second call must LOAD, not retrain")
    // a different input plan or different hyperparameters is a new model
    ModelArtifacts.cached("t", b, "p=1")(train(b))
    ModelArtifacts.cached("t", a, "p=2")(train(a))
    assert(trains == 3)
    // deliberate retrain path
    ModelArtifacts.clear()
    ModelArtifacts.cached("t", a, "p=1")(train(a))
    assert(trains == 4)
  }

  test("file corpora with identical schemas never share a model") {
    // regression: a parquet relation canonicalizes to
    // `Relation [none#..] parquet` — NO path — so without the explicit
    // inputFiles component two file corpora of the same schema would
    // collide on one key and the wrong trained model would serve
    ModelArtifacts.clear()
    val a = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    var trains = 0
    def t(df: org.apache.spark.sql.DataFrame) = { trains += 1; df }
    ModelArtifacts.cached("t", a, "p")(t(a))
    ModelArtifacts.cached("t", b, "p")(t(b))
    assert(trains == 2, "two different parquet corpora shared a cache key")
    // same path re-read: a fresh FileIndex must still HIT
    val a2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ModelArtifacts.cached("t", a2, "p")(t(a2))
    assert(trains == 2, "re-reading the same path missed the cache")
  }

  test("the store is a capped LRU: sweeps evict, hot keys survive") {
    import spark.implicits._
    ModelArtifacts.clear()
    val df = Seq((1L, "x")).toDF("id", "v")
    var trains = 0
    def t() = { trains += 1; df }
    ModelArtifacts.cached("t", df, "hot")(t())
    // sweep well past the cap with distinct hyperparameters, touching
    // the hot key between batches so access-order keeps it resident
    (0 until 100).foreach { i =>
      ModelArtifacts.cached("t", df, s"sweep=$i")(t())
      if (i % 10 == 0) ModelArtifacts.cached("t", df, "hot")(t())
    }
    assert(ModelArtifacts.size <= 64,
      s"cache grew past the cap: ${ModelArtifacts.size}")
    val before = trains
    ModelArtifacts.cached("t", df, "hot")(t())
    assert(trains == before, "the repeatedly-touched key was evicted")
    // the oldest untouched sweep keys are the ones recycled
    ModelArtifacts.cached("t", df, "sweep=0")(t())
    assert(trains == before + 1, "an LRU-evicted key must retrain")
    ModelArtifacts.clear()
  }

  test("the serve form answers identically from the cache-warm path") {
    ModelArtifacts.clear()
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cold = Similarity.ivfPqTopKServe(emb).collect().toSeq
    val warm = Similarity.ivfPqTopKServe(emb).collect().toSeq
    assert(cold.nonEmpty && warm == cold)
  }

  test("stored-codes serve: builds once per key, answers match s15") {
    ModelArtifacts.clear(); IndexStore.clear()
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // identical results: codes survive the parquet round trip losslessly
    // and the ADC arithmetic is shared — one oracle pins all the forms
    val stored = Similarity.ivfPqStoredServe(emb).collect().toSeq
    val inQuery = Similarity.ivfPqTopKServe(emb).collect().toSeq
    assert(stored.nonEmpty && stored == inQuery)
    // the second invocation re-reads the stored table, no second write
    val n = IndexStore.size
    val again = Similarity.ivfPqStoredServe(emb).collect().toSeq
    assert(again == stored)
    assert(IndexStore.size == n, "second serve rebuilt the code table")
    // a different corpus plan is a different stored table, never shared
    val base = emb.filter(org.apache.spark.sql.functions.col("vec_id") % 5 =!= 0)
    Similarity.ivfPqStoredServe(base).collect()
    assert(IndexStore.size == n + 1, "distinct corpora shared a code table")
    ModelArtifacts.clear(); IndexStore.clear()
  }
}

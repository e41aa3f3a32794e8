package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`) — the similarity-search face of an LLM data pipeline.
  *
  * Two tiers, mirroring production ANN architecture:
  *  - [[bruteForceTopK]]: exact flat search. The query set is broadcast
  *    (it is small by construction), the corpus is streamed — one scan,
  *    no corpus shuffle until the per-query top-k reduction.
  *  - [[ivfTopK]]: IVF-style bucketed search — each query probes only its
  *    own coarse cell (here the fixture's `label` column stands in for a
  *    quantizer assignment). At 100 TB this turns a full-corpus scan into
  *    |corpus|/|cells| per query; with the corpus bucketed/partitioned by
  *    cell id, partition pruning skips the rest at the file level.
  *
  * Cosine is computed in double precision with a fixed left-to-right fold
  * ([[Dedup.dotExpr]]) so results match the DuckDB oracle bitwise.
  */
object Similarity {

  /** The fixture query workload: the first `n` vectors by id. */
  def queryVectors(embeddings: DataFrame, n: Int = 5): DataFrame =
    embeddings.filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        col("embedding").as("query_emb"))

  private def normed(df: DataFrame): DataFrame =
    df.withColumn("norm2", Dedup.dotExpr("embedding", "embedding"))

  private def qnormed(df: DataFrame): DataFrame =
    df.withColumn("qnorm2", Dedup.dotExpr("query_emb", "query_emb"))

  /** Exact top-k cosine neighbors per query vector over the whole corpus.
    * Plan shape: broadcast(queries) ⨯ corpus scan → cosine → shuffle by
    * query_id → per-query rank. Ties break on neighbor id so the result
    * is engine-deterministic. Self-matches are excluded. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val corpus = normed(embeddings)
    val queries = qnormed(queryVectors(embeddings, nQueries))
    val scored = corpus.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dotExpr("embedding", "query_emb") /
          (sqrt(col("norm2")) * sqrt(col("qnorm2"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style top-k: each query probes only its own coarse cell (label).
    * Equi-join on the cell id replaces the cross product — the 100 TB
    * scale path, where cells are storage partitions and Catalyst prunes
    * unprobed cells from the scan entirely. */
  def ivfTopK(embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val corpus = normed(embeddings)
    val queries = qnormed(queryVectors(embeddings, nQueries))
    val scored = corpus.join(broadcast(queries),
        col("label") === col("query_label") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dotExpr("embedding", "query_emb") /
          (sqrt(col("norm2")) * sqrt(col("qnorm2"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .select(col("query_id"), col("label"),
        col("vec_id").as("neighbor_id"), col("cosine"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic ±1 random-hyperplane matrix: s(i,j) from the parity of
    * md5("i:j") — no RNG, reproducible across engines and runs. Covers
    * embedding dimensionality up to `maxDims` (CONTRACT: vectors wider
    * than maxDims would silently project on their first maxDims
    * components — raise maxDims for wider models); tiny, always
    * broadcast. */
  def hyperplanes(spark: SparkSession, nBits: Int,
      maxDims: Int = 4096): DataFrame =
    spark.range(maxDims.toLong * nBits)
      .select((col("id") / nBits).cast("int").as("i"),
        (col("id") % nBits).cast("int").as("j"))
      .select(col("i"), col("j"), when(expr(
        """(locate(substr(md5(concat(cast(i as string), ':',
          |  cast(j as string))), 1, 1), '0123456789abcdef') - 1) % 2 = 1"""
          .stripMargin), 1L).otherwise(-1L).as("s"))

  /** Sign-random-projection LSH bucket per vector: project onto `nBits`
    * deterministic hyperplanes, bucket = the sign bit string.
    *
    * Scale + determinism notes: components explode to rows and join the
    * broadcast plane matrix — work distributes by row count. Components
    * are quantized to integers (`floor(v·1e6)`) BEFORE summation so the
    * per-projection sum is exact and order-independent — a double sum
    * would make near-zero projections flip sign across partitionings and
    * engines. Production ANN layers multi-table/multi-probe LSH on top;
    * the bucket string is also the storage partition key there. */
  def signLshBuckets(embeddings: DataFrame, nBits: Int = 8): DataFrame = {
    val comps = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
    comps.join(broadcast(hyperplanes(embeddings.sparkSession, nBits)), "i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(floor(col("v").cast("double") * 1000000).cast("long") *
        col("s")).as("p"))
      .groupBy(col("vec_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("j"), col("p")))),
        x => when(x.getField("p") > 0, "1").otherwise("0")), "")
        .as("bucket"))
  }

  /** Complete LSH-ANN pipeline: hash → same-bucket probe → exact-cosine
    * refine → per-query top-k. Few bits here (coarse buckets) keep
    * single-table recall meaningful; production trades bits vs probes
    * with multiple tables. */
  def lshAnnTopK(embeddings: DataFrame, nBits: Int = 4, nQueries: Int = 5,
      k: Int = 5): DataFrame = {
    val withBucket = normed(embeddings)
      .join(signLshBuckets(embeddings, nBits), "vec_id")
    val queries = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("bucket").as("query_bucket"),
        col("embedding").as("query_emb"), col("norm2").as("qnorm2"))
    val scored = withBucket.join(broadcast(queries),
        col("bucket") === col("query_bucket") &&
          col("vec_id") =!= col("query_id"))
      .withColumn("cosine",
        Dedup.dotExpr("embedding", "query_emb") /
          (sqrt(col("norm2")) * sqrt(col("qnorm2"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored
      .select(col("query_id"), col("bucket"),
        col("vec_id").as("neighbor_id"), col("cosine"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Recall@k of the LSH ANN tier against exact search — the evaluation
    * loop every production ANN deployment needs: you cannot tune nBits /
    * probe width without measuring what the buckets lose. Both sides are
    * deterministic pipelines, so recall itself is deterministic and
    * oracle-checkable.
    *
    * Scale: the exact side is the expensive one, but recall is measured
    * on a SAMPLE of queries by construction (nQueries), so the cost is
    * nQueries × corpus — a fixed evaluation budget, not a per-query
    * production cost. */
  def annRecall(embeddings: DataFrame, nQueries: Int = 5, k: Int = 5,
      nBits: Int = 4): DataFrame = {
    val exact = bruteForceTopK(embeddings, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = lshAnnTopK(embeddings, nBits, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("hit")).as("n_hits"))
      .select(col("query_id"), col("n_hits"),
        (col("n_hits").cast("double") / lit(k).cast("double")).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Scalar-quantize an `array<float>` to integer codes: `floor(64·x)`.
    * The scale is a power of two, so the multiply is EXACT in IEEE
    * arithmetic and the codes are bit-reproducible across engines —
    * quantization without a float-rounding oracle hazard. Unit-ish
    * embedding components land in int8 range. */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 64).cast("long"))

  /** Memory-tier ANN: top-k by INTEGER dot product over scalar-quantized
    * codes. At 100 TB the float32 corpus does not fit the scan budget;
    * int8-range codes are 4× smaller (8× against float64 pipelines),
    * SIMD-friendly, and — because the scores are exact integers — the
    * ranking is fully deterministic and oracle-checkable, unlike
    * float-accumulation ANN. Production re-ranks the winner set with
    * full-precision cosine ([[bruteForceTopK]] shape) over k rows/query,
    * a driver-free broadcast-sized refinement. */
  def quantizedTopK(embeddings: DataFrame, nQueries: Int = 5,
      k: Int = 10): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), quantize(col("embedding")).as("qemb"))
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        quantize(col("embedding")).as("q_qemb"))
    val scored = corpus.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("qdot",
        aggregate(zip_with(col("qemb"), col("q_qemb"), _ * _),
          lit(0L), _ + _))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
    scored
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qdot"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}

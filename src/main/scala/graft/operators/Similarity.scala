package graft.operators

import org.apache.spark.sql.DataFrame
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
}

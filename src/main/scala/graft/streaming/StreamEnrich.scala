package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: join a stream against a static dimension
  * table. The static side is broadcast — each micro-batch joins against
  * the executor-resident copy with NO stream-side shuffle and no join
  * state (unlike stream-stream joins, a static row can always match, so
  * nothing is watermark-evicted). The standard shape for decorating an
  * event stream with slowly-changing reference data; with Spark's
  * broadcast-hash join the dimension is re-resolvable per batch, so a
  * refreshed dimension snapshot is picked up on restart. */
object StreamEnrich {

  /** Attach per-user attributes to an event stream. `users` is static
    * (user_id, attrs...); inner join drops events for unknown users —
    * use leftOuter to keep them with null attrs. */
  def enrichEvents(events: DataFrame, users: DataFrame,
      joinType: String = "inner"): DataFrame =
    events.join(broadcast(users), Seq("user_id"), joinType)

  /** Streaming IVF cell assignment: route an embedding STREAM through
    * the trained quantizer — the online half of the ANN index (batch
    * training via Clustering, s08's probe over the result): every
    * arriving vector gets its nearest trained centroid per micro-batch,
    * which is both the index-insert path (append to the cell's
    * partition) and the online-query routing step.
    *
    * STATELESS by construction: a groupBy/min_by argmin would be a
    * stateful streaming aggregation (state keyed by vec_id, growing
    * forever), so the K centroids — a model artifact — are packed into
    * ONE array row, equi-broadcast-joined into each micro-batch, and
    * the argmin is a per-row `array_min` over a transformed struct
    * array (dist2, cluster_id — same arithmetic and tie-break as
    * [[graft.operators.Clustering.assign]], batch/stream parity
    * spec'd). The per-element lambda is interpreted, but over K
    * elements per row (K ≤ a few thousand by definition), a deliberate
    * trade for zero state and zero stream-side shuffle.
    * (`centroids` columns: cluster_id, cemb, cnorm2.) */
  def assignCellsStream(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val packed = centroids
      .agg(collect_list(struct(col("cluster_id"), col("cemb"),
        col("cnorm2"))).as("cents"))
      .withColumn("jk", lit(1))
    vectors
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
      .withColumn("jk", lit(1))
      .join(broadcast(packed), "jk")
      .withColumn("best", array_min(transform(col("cents"), c =>
        struct((col("vnorm2") + c.getField("cnorm2") - lit(2.0) *
          graft.functions.VectorOps.dot(col("emb"), c.getField("cemb")))
          .as("dist2"),
          c.getField("cluster_id").as("cluster_id")))))
      .select(col("vec_id"), col("best.cluster_id").as("cluster_id"),
        col("best.dist2").as("dist2"))
  }
}

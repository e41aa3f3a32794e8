package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ANN serving: a stream of query vectors gets exact-arithmetic
  * IVF-PQ top-k against a FROZEN index — the streaming face of the batch
  * serving tiers ([[graft.operators.Similarity.ivfPqTopKServe]]), turning
  * the "index" into a "service".
  *
  * Shape, per micro-batch:
  *   1. cell routing — the trained coarse centroids (a model artifact,
  *      [[graft.operators.Similarity.servingArtifacts]]) are packed into
  *      ONE broadcast row and the query's nProbe nearest cells are a
  *      per-row sort-and-take (nProbe=1 is the argmin), exactly
  *      [[StreamEnrich.assignCellsStream]]'s stateless trade (no
  *      streaming aggregation, no state);
  *   2. LUT build — the PQ codebook (same artifact pair) rides the same
  *      broadcast row; each query computes its ADC lookup table as a
  *      per-row map keyed by sub·k+code. Keyed, not positional: a
  *      k-means codebook can lose a code whose cell empties during
  *      refinement, so positions are not guaranteed dense. m·k entries
  *      per row — model-sized, the [[StreamEnrich]] K-bounded-lambda
  *      precedent, not a corpus-sized interpreted loop;
  *   3. candidate scan — stream ⋈ STATIC packed index
  *      ([[graft.operators.Similarity.packedIndex]]) on `cell`: the
  *      stream-static join a deployment points at the cell-partitioned
  *      stored-codes table (s19's layout), where the join key is the
  *      partition column and each batch reads only probed cells' files.
  *      The ADC score is then m keyed LUT lookups per candidate row —
  *      integer micro fixed-point, bitwise the batch tier's arithmetic;
  *   4. top-k — ONE watermarked windowed aggregation with the same
  *      mergeable bounded [[graft.functions.TopKByScore]] aggregate the
  *      batch tiers use: state is ≤ topK rows per (window, query), the
  *      watermark evicts closed windows, and append mode emits each
  *      query's final ranking exactly once. No chained stateful
  *      operators; the per-candidate ADC sum is per-row arithmetic, not
  *      a first aggregation.
  *
  * Batch/stream parity is bitwise and spec-enforced: same trained
  * artifacts (same [[graft.operators.ModelArtifacts]] cache keys), same
  * argmin tie-breaks, same fixed-point LUT arithmetic, same top-k
  * ordering contract. */
object StreamingAnnServe {

  /** Scores a streaming frame of queries `(query_id, ts, emb)` against
    * the frozen index; emits `(query_id, neighbor_id, adc_fp, rank)`
    * per closed window, matching [[graft.operators.Similarity
    * .ivfPqTopKServe]] (nProbe = 1) bitwise for the same vectors.
    *
    * `centroids`/`codebook` are the local model artifacts
    * ([[graft.operators.Similarity.servingArtifacts]]); `index` is the
    * static packed-codes corpus frame
    * ([[graft.operators.Similarity.packedIndex]]). */
  def ivfPqTopKStream(queries: DataFrame, centroids: DataFrame,
      codebook: DataFrame, index: DataFrame, m: Int = 4, k: Int = 8,
      subDim: Int = 16, topK: Int = 10, nProbe: Int = 1,
      windowDur: String = "1 minute",
      watermarkDelay: String = "0 seconds"): DataFrame = {
    // both model artifacts packed into one broadcast row: the stream
    // joins the model exactly once per micro-batch, no shuffle
    val packedModel = centroids
      .agg(collect_list(struct(col("cluster_id"), col("cemb"),
        col("cnorm2"))).as("cents"))
      .crossJoin(codebook
        .agg(collect_list(struct(col("sub"), col("code"), col("cemb")))
          .as("cb")))
      .withColumn("jk", lit(1))

    val vdot = graft.functions.VectorOps.dot _
    def subSlice(s: Column): Column =
      slice(col("emb"), s * subDim + lit(1), lit(subDim))

    val routed = queries
      .withColumn("vnorm2", vdot(col("emb"), col("emb")))
      .withColumn("jk", lit(1))
      .join(broadcast(packedModel), "jk")
      // per-row probe schedule over the K packed centroids:
      // assignCellsStream's arithmetic, probeCells's (dist2,
      // cluster_id) order — sort + take-nProbe generalizes the argmin
      // (nProbe=1 IS the argmin), then one row per probed cell.
      // Probed cells are disjoint, so candidates stay unique.
      // per-row ADC LUT: sub·k+code → floor(dot(q_sub, cemb)·1e6), the
      // batch tier's pqLut fixed-point verbatim — BEFORE the probe
      // explode, so it is built once per query, not once per probed cell
      .withColumn("lut", map_from_entries(transform(col("cb"), e =>
        struct((e.getField("sub") * lit(k) + e.getField("code"))
          .cast("int").as("key"),
          floor(vdot(subSlice(e.getField("sub").cast("int")),
            e.getField("cemb")) * lit(1000000.0)).cast("long")
            .as("pdot_fp")))))
      .withColumn("probe", explode(slice(array_sort(
        transform(col("cents"), c =>
          struct((col("vnorm2") + c.getField("cnorm2") - lit(2.0) *
            vdot(col("emb"), c.getField("cemb"))).as("dist2"),
            c.getField("cluster_id").as("cluster_id")))),
        1, nProbe)))
      .select(col("query_id"), col("ts"),
        col("probe.cluster_id").as("cell"), col("lut"))

    val scored = routed
      .join(index, Seq("cell")) // stream-static; `cell` is the partition
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_fp", aggregate(sequence(lit(0), lit(m - 1)),
        lit(0L), (acc, s) => acc + element_at(col("lut"),
          (s * lit(k) + element_at(col("codes"), s + lit(1)))
            .cast("int"))))

    val topAgg = graft.functions.TopKByScore.topK(topK)(
      col("adc_fp").cast("double"), col("vec_id"))
    scored
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("query_id"))
      .agg(topAgg.as("top"))
      .select(col("query_id"),
        posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.id").as("neighbor_id"),
        col("nb.score").cast("long").as("adc_fp"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-only synthetic scale-up: every row becomes `factor` rows with
  * perturbed identity so the DATA grows ×factor but its structure does
  * not degenerate (replicated ids would collapse dedup into giant
  * all-duplicate groups and measure that artifact, not the operator). */
object ScaledTables {

  /** Explode-based ×factor with id re-keying (`id*factor + rep` keeps
    * re-keyed spaces disjoint and FK pairs scaled in lockstep when both
    * sides use the same formula) and optional text/vector perturbation. */
  def scaled(df: DataFrame, factor: Int, idCols: Seq[String],
      textCols: Seq[String] = Nil, vecCols: Seq[String] = Nil): DataFrame = {
    val rep = df.withColumn("_rep",
      explode(sequence(lit(0L), lit(factor - 1L))))
    val withIds = idCols.foldLeft(rep)((d, c) =>
      d.withColumn(c, col(c) * factor + col("_rep")))
    // distinct suffix per replica: shingle/minhash structure stays
    // near-duplicate-ish without becoming bitwise-identical
    val withText = textCols.foldLeft(withIds)((d, c) =>
      d.withColumn(c, concat(col(c), lit(" zz"), col("_rep"))))
    // shove dimension 0 per replica: replicas land in different LSH/IVF
    // cells and stop being mutual near-dups, keeping pair density linear
    val withVec = vecCols.foldLeft(withText)((d, c) =>
      d.withColumn(c, expr(
        s"transform($c, (x, i) -> IF(i = 0, CAST(x + _rep * 7.5 AS FLOAT), x))")))
    withVec.drop("_rep")
  }
}

/** The local answer to "would this survive 100×": run the five most
  * expensive ledger operators on the fixture and on a ×8 synthetic
  * scale-up, assert wall time grows at most ~linearly (generous bound —
  * a quadratic shape would show ~64×) and that the scaled plans pick up
  * no cartesian/nested-loop shapes. Runs in-rig against sf0.001 by
  * default; point GRAFT_STRESS_SF at /root/testdata/sf0.1 for the full
  * heavyweight variant (the FS-test env pattern).
  *
  * Literal plan equality is deliberately NOT asserted: a join that
  * broadcasts at fixture size and sort-merges at ×8 is the optimizer
  * doing its job, not a regression — the invariants that must hold at
  * any size are the absence of unbounded shapes and ≲linear growth. */
class ScaleStressSpec extends SparkSpec {

  private val sf = sys.env.getOrElse("GRAFT_STRESS_SF",
    "/root/testdata/sf0.001")
  private val factor = 8

  import graft.operators.{Dedup => D, Similarity => S, DataQuality => DQ}

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)
  private def docsX = ScaledTables.scaled(docs, factor,
    idCols = Seq("doc_id"), textCols = Seq("text"))
  private def embX = ScaledTables.scaled(emb, factor,
    idCols = Seq("vec_id"), vecCols = Seq("embedding"))

  private def time(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  private val heavyFive: Seq[(String, DataFrame, DataFrame, Boolean)] = Seq(
    // (name, baseline, scaled, nested-loop intended)
    ("d07_dedup_clusters",
      D.dedupClusters(D.embeddingNearDups(emb)),
      D.dedupClusters(D.embeddingNearDups(embX)), false),
    ("d10_canonical_keep",
      D.canonicalKeepList(docs, D.dedupClusters(D.embeddingNearDups(emb))),
      D.canonicalKeepList(docsX, D.dedupClusters(D.embeddingNearDups(embX))),
      false),
    ("s08_ivf_trained_topk",
      S.ivfTrainedTopK(emb), S.ivfTrainedTopK(embX), true),
    ("d11_minhash_eval",
      D.minhashJaccardEval(docs), D.minhashJaccardEval(docsX), false),
    ("dq01_constraint_audit",
      DQ.constraintAudit(Tables.orders(spark, sf),
        Tables.lineitem(spark, sf)),
      DQ.constraintAudit(
        ScaledTables.scaled(Tables.orders(spark, sf), factor,
          idCols = Seq("o_orderkey")),
        ScaledTables.scaled(Tables.lineitem(spark, sf), factor,
          idCols = Seq("l_orderkey"))), false))

  test(s"heavy five grow ≲linearly at ×$factor and keep sane plans ($sf)") {
    for ((name, baseline, scaledDf, bnljIntended) <- heavyFive) {
      val plan = scaledDf.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name goes cartesian at ×$factor")
      if (!bnljIntended) assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name picks up a nested-loop join at ×$factor")

      val t1 = time(baseline)
      val tN = time(scaledDf)
      // generous ~linear bound: ×12 headroom on ×8 data plus a fixed
      // allowance for job overhead/GC jitter at fixture scale — a
      // quadratic operator (~×64) still fails by a wide margin
      assert(tN <= 12 * t1 + 8.0,
        f"$name: ${t1}%.2fs -> ${tN}%.2fs at x$factor — superlinear")
      info(f"$name: ${t1}%.2fs -> ${tN}%.2fs (x${tN / t1}%.1f)")
    }
  }
}

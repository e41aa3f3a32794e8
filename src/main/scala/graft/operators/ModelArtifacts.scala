package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-lifetime cache of TINY trained model artifacts — coarse IVF
  * centroids, PQ codebooks — keyed by the canonicalized plan of the
  * training input plus the hyperparameters.
  *
  * This is the local stand-in for the model/artifact store every real
  * ANN deployment has: at 100 TB the quantizers are trained once,
  * written beside the index, and every serving query LOADS them.
  * Without it a stateless harness (bench sweeps, repeated API calls)
  * re-runs the training lineage on every invocation of the serving
  * form, and the measured "serve cost" is mostly training — the exact
  * conflation the serving tier exists to remove.
  *
  * Bounded by construction: each entry is a K- or m·k-row local
  * DataFrame (a few KB), and the key space is the handful of
  * (corpus plan, hyperparameters) pairs a session touches.
  *
  * Staleness contract: the key is the INPUT PLAN (for file sources it
  * embeds the concrete file listing), not a data snapshot — the same
  * contract as any model store keyed by training-set identity. A
  * corpus rewritten in place mid-session re-derives only when its
  * resolved plan changes; retraining on a live session is `clear()`.
  *
  * Scoped to the JVM's active session use: entries hold DataFrames of
  * collected LOCAL rows, so they carry no executor-side state beyond
  * the owning session. Test rigs and the driver's Verify/Bench mains
  * run one session per JVM. */
object ModelArtifacts {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The cached artifact for (kind, params, input-plan), training it via
    * `train` exactly once per key per session. `train` must produce a
    * LOCAL (already-materialized) model frame — see
    * [[Clustering.trainedCentroidsLocal]] / [[Similarity.pqCodebookLocal]].
    *
    * Key construction: the canonicalized plan STRING is stable across
    * re-reads of the same path (object equality would not be — each
    * `spark.read` builds a fresh FileIndex, and a cache that missed on
    * every sweep would be no cache at all) but it is NOT sufficient
    * alone: a parquet relation canonicalizes to just
    * `Relation [none#..] parquet` — NO path — so two same-typed file
    * corpora would collide, and LocalRelation leaves print WITHOUT
    * their rows. Both identity sources enter the key explicitly: the
    * sorted resolved file listing (`inputFiles`) distinguishes file
    * corpora, the per-leaf row-data hash distinguishes in-memory ones. */
  def cached(kind: String, input: DataFrame, params: String)(
      train: => DataFrame): DataFrame = {
    val analyzed = input.queryExecution.analyzed
    val leafData = analyzed.collectLeaves().map {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.hashCode.toString
      case _ => "-"
    }.mkString(",")
    val files = input.inputFiles.sorted.mkString(";")
    val key = kind + "|" + params + "|" + leafData + "|" + files + "|" +
      analyzed.canonicalized.toString
    cache.computeIfAbsent(key, _ => train)
  }

  /** Drop every cached artifact (tests; deliberate retrain). */
  def clear(): Unit = cache.clear()
}

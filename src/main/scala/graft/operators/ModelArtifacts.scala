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
  * Bounded two ways: each entry is a K- or m·k-row local DataFrame (a
  * few KB), and the store itself is a [[MaxEntries]]-capped
  * access-order LRU — a session sweeping an unbounded hyperparameter
  * grid recycles the least-recently-served artifact instead of growing
  * monotonically.
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

  /** Upper bound on resident artifacts. Each entry is a K- or m·k-row
    * local frame (a few KB), so the cap bounds the cache at well under a
    * megabyte while still covering any realistic hyperparameter sweep; a
    * long-lived multi-tenant session sweeping past it evicts
    * least-recently-USED entries (access-order LRU), which for a sweep
    * is the config least likely to be served again. */
  private val MaxEntries = 64

  private val cache =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f,
      /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean =
        this.size() > MaxEntries
    }

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
  /** The full identity key for (kind, params, input plan) — shared with
    * [[IndexStore]], which caches DERIVED STORED TABLES (PQ code
    * columns) under the same training-set-identity contract as the
    * in-memory model artifacts. */
  private[graft] def planKey(kind: String, input: DataFrame,
      params: String): String = {
    val analyzed = input.queryExecution.analyzed
    val leafData = analyzed.collectLeaves().map {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.hashCode.toString
      case _ => "-"
    }.mkString(",")
    val files = input.inputFiles.sorted.mkString(";")
    kind + "|" + params + "|" + leafData + "|" + files + "|" +
      analyzed.canonicalized.toString
  }

  def cached(kind: String, input: DataFrame, params: String)(
      train: => DataFrame): DataFrame = {
    val key = planKey(kind, input, params)
    // LinkedHashMap's access-order bookkeeping mutates on get(), so every
    // touch synchronizes; artifact trains are seconds, lookups are a map
    // probe — the lock is not a contention point. Training happens under
    // the lock deliberately: two concurrent misses on one key must not
    // train twice (same computeIfAbsent contract as before the LRU).
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else { val v = train; cache.put(key, v); v }
    }
  }

  /** Number of resident artifacts (spec hook for the eviction bound). */
  def size: Int = cache.synchronized(cache.size())

  /** Drop every cached artifact (tests; deliberate retrain). */
  def clear(): Unit = cache.synchronized(cache.clear())
}

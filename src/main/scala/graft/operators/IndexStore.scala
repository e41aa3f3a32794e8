package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Session-lifetime store of PRECOMPUTED derived index tables — PQ code
  * columns and coarse-cell assignments written as real cell-partitioned
  * parquet tables and READ by the serving tier, instead of re-derived
  * from the float corpus on every query.
  *
  * This closes the last conflation in the serving-cost story: s15/s18
  * load their trained MODEL artifacts from [[ModelArtifacts]] but still
  * re-encode the corpus per invocation, so their measured cost includes
  * an encode pass a deployment never pays — at 100 TB the codes are
  * columns beside the lake, maintained by ingest (s18's append form
  * proves per-vector encode makes that maintenance incremental). A
  * stored-codes serve query is purely: probed-cell partition scan →
  * LUT join → ADC partial-agg top-k.
  *
  * The table is PARTITIONED BY the coarse cell, which is the entire
  * point of IVF at rest: a probe for a handful of cells becomes a
  * partition-pruned scan that never lists, opens, or reads any other
  * cell's files. The fixture store is a temp directory; the layout and
  * the pruned plan are exactly what an object-store lake path gets.
  *
  * Identity/staleness contract is [[ModelArtifacts.planKey]]'s: keyed
  * by (kind, hyperparameters, corpus identity), built once per key per
  * session. Entries are temp-dir parquet, reclaimed by the OS after the
  * session; a real deployment writes them beside the index and owns
  * their lifecycle with the lake's snapshot machinery. */
object IndexStore {

  private val stored =
    new java.util.concurrent.ConcurrentHashMap[String, (String, StructType)]()

  /** The stored table for (kind, params, corpus), building + writing it
    * via `build` once per key per session, READING it thereafter. The
    * read re-applies the build frame's schema so partition columns keep
    * their original types (directory-name inference would narrow a long
    * cell id to int, and a cast on the partition attribute is one more
    * thing between the probe filter and the pruner). `build` runs under
    * the store lock — two concurrent misses on one key must not write
    * twice. */
  def storedTable(kind: String, input: DataFrame, params: String,
      partitionCols: Seq[String])(build: => DataFrame): DataFrame = {
    val key = ModelArtifacts.planKey(kind, input, params) +
      "|pby=" + partitionCols.mkString(",")
    val (path, schema) = stored.computeIfAbsent(key, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-index-$kind-").toString
      val df = build
      df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(dir)
      (dir, df.schema)
    })
    input.sparkSession.read.schema(schema).parquet(path)
  }

  /** Number of resident stored tables (spec hook). */
  def size: Int = stored.size()

  /** Forget every stored table (tests; deliberate rebuild). The parquet
    * itself is temp-dir data the OS reclaims. */
  def clear(): Unit = stored.clear()
}

package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage anchor for iterative loops and multiply-referenced
  * intermediates — the one place that decides HOW lineage is cut, so
  * the strategy is injectable per deployment instead of hard-coded at
  * every loop site (d13 label propagation, d17 postings, g04 PageRank,
  * g08 walks, s23 MMR, t38 BPE merges).
  *
  * Strategy:
  *   - If the session has a checkpoint directory configured
  *     (`SparkContext.setCheckpointDir`), use RELIABLE `checkpoint()`:
  *     blocks are written to that (typically fault-tolerant) storage,
  *     so an executor loss mid-loop recomputes nothing — the posture a
  *     1000-executor cluster needs, where losing one executor during a
  *     20-round label-propagation loop would otherwise invalidate the
  *     very lineage truncation the anchor exists to provide.
  *   - Otherwise fall back to eager `localCheckpoint`: blocks live in
  *     EXECUTOR memory/disk. Correct and fast in local mode (this
  *     rig), but on a real cluster an executor loss invalidates those
  *     blocks AND the truncated lineage needed to rebuild them — the
  *     caveat is the whole reason this fallback is opt-out via a
  *     checkpoint dir, not the only behavior.
  *
  * Both paths are EAGER (materialize now): loop callers depend on the
  * anchor being a barrier so each round's shuffle happens once.
  */
object Anchor {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** `.anchored` chains like the `.localCheckpoint(true)` it replaces. */
  implicit class AnchorOps(private val df: DataFrame) extends AnyVal {
    def anchored: DataFrame = cut(df)
  }
}

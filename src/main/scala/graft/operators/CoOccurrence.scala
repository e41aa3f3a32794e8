package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Co-occurrence (co-visitation) edge construction — the graph-building
  * primitive behind item-item recommenders, query-expansion tables, and
  * node2vec-style embedding corpora: "users who touched A also touched
  * B", with association strength.
  *
  * The scale hazard is the self-join: a user who touched n distinct
  * items emits n·(n−1)/2 pairs, so one whale user with 10⁵ items would
  * emit 5·10⁹ rows. Production systems ALWAYS cap the per-user
  * contribution first (a user's 10⁵th item carries no signal anyway);
  * here each user contributes only their `cap` most-frequent items
  * (deterministic tie-break on item id), bounding the per-user blowup at
  * cap·(cap−1)/2 regardless of skew. The cap window partitions by user —
  * full parallelism, no funnel.
  *
  * Edge strength is reported two ways: raw `n_users` support, and
  * `lift` = P(a,b)/(P(a)·P(b)) — support normalized by item popularity,
  * so ubiquitous items don't dominate the edge list. Lift arithmetic is
  * one double division of exact long products (< 2⁵³), bit-identical
  * across engines.
  */
object CoOccurrence {

  /** Undirected co-occurrence edges (item_a < item_b) over a
    * (user, item) interaction log, per-user contribution capped.
    *
    * Plan shape: per-user item counts (one shuffle, map-side combined)
    * → cap window keyed by user → self-join on user_id (shuffle keyed
    * by user; output bounded by cap²/2 per user) → pair count
    * (map-side combined) → tiny per-item frames broadcast back for the
    * lift. The pair table is |items|²-bounded — model-artifact sized,
    * never corpus sized. */
  def covisitationEdges(events: DataFrame, cap: Int = 4): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val perUser = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("event_type"))
    val capped = perUser
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("user_id"), col("event_type"))
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("item_a"),
        col("b.event_type").as("item_b"))
      .agg(count(lit(1)).as("n_users"))
    // capped is distinct (user, item), so per-item user counts are plain
    // counts; both frames are |items|-sized — broadcast, no extra shuffle
    val itemUsers = capped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nu"))
    val total = capped.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("u"))
    pairs
      .join(broadcast(itemUsers.select(col("event_type").as("item_a"),
        col("nu").as("n_a"))), "item_a")
      .join(broadcast(itemUsers.select(col("event_type").as("item_b"),
        col("nu").as("n_b"))), "item_b")
      .join(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_users"),
        col("n_a"), col("n_b"),
        ((col("n_users") * col("u")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** The recommender artifact itself: each item's `k` strongest
    * neighbors by lift (support tie-break, then neighbor id) — the
    * "users who touched X also touched" table served online.
    *
    * Edges symmetrize by unioning the canonical (a < b) edge list with
    * its swap — no second self-join. The rank window partitions by
    * item: per-partition size is the item's co-occurrence breadth
    * (bounded by the per-user cap times the item's user count, and in
    * practice by catalog diversity), and items spread across tasks, so
    * no funnel. Output is ≤ k rows per item. */
  def itemNeighbors(events: DataFrame, k: Int = 3,
      cap: Int = 4): DataFrame = {
    val edges = covisitationEdges(events, cap)
    val sym = edges.select(col("item_a").as("item"),
        col("item_b").as("neighbor"), col("n_users"), col("lift"))
      .unionAll(edges.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_users"), col("lift")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("lift").desc, col("n_users").desc, col("neighbor"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("item"), col("rank"))
  }
}

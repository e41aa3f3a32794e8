package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply / MERGE-INTO emulation over plain-parquet lakes.
  *
  * The reference adapter overwrites whole objects per book id
  * (/root/reference S3DatalakeStorage.java:33-47 — PutObject is the only
  * mutation). A table-format lake needs the general form: a change feed of
  * inserts / updates / deletes folded into a snapshot. With no Delta/Iceberg
  * connector on this rig's classpath (documented in README), these operators
  * express the MERGE semantics relationally; a real deployment swaps the
  * final `write` for a transactional commit, the plans stay identical.
  *
  * Scale posture: every operator here is a key-partitioned shuffle —
  * no driver-side state, no per-key loops. At 100 TB, bucket both the
  * snapshot and the (much smaller) compacted change feed by the merge key
  * and the anti-join/window below become exchange-free.
  */
object Merge {

  /** Compact a change feed to the latest change per key (CDC compaction).
    * `version` orders changes within a key; ties MUST be impossible by
    * contract (a real feed has a monotone LSN) — callers on fixture data
    * pass a unique column. One window shuffle on the key. */
  def latestByKey(changes: DataFrame, keys: Seq[String],
      version: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Latest-wins upsert: rows of `updates` replace same-key rows of `base`;
    * unmatched update rows insert. `updates` must be key-unique (run
    * [[latestByKey]] first on a raw feed). Plan: one anti-join shuffle on
    * the key + a union — no per-column coalesce, no full-outer join. */
  def upsert(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame =
    updates.unionByName(
      base.join(updates.select(keys.map(col): _*), keys, "left_anti"))

  /** Full CDC apply: a compacted change feed with an op column
    * (`'U'`/`'I'` upsert, `'D'` delete) folded into the snapshot.
    * Delete keys leave; upsert rows replace-or-insert. The single
    * anti-join uses ALL change keys (deletes and upserts alike), so the
    * base scan is filtered once.
    *
    * `evolveSchema = true` is the table-format schema-evolution mode
    * (Delta's `mergeSchema`): a feed carrying columns the snapshot lacks
    * widens the result schema, with the untouched base rows null-filled
    * on the new columns — additive evolution only, nothing is dropped or
    * retyped, so readers of the previous version stay valid. With the
    * default `false`, a column mismatch is an analysis error (the safe
    * default: an unexpected feed schema should fail loudly, not silently
    * widen the table). */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
      op: String = "op", evolveSchema: Boolean = false): DataFrame = {
    val upserts = changes.filter(col(op) =!= "D").drop(op)
    upserts.unionByName(
      base.join(changes.select(keys.map(col): _*), keys, "left_anti"),
      allowMissingColumns = evolveSchema)
  }

  /** Oracle demo (l12): the l04 merge with a schema-evolving feed — the
    * updates carry a NEW `o_channel` column the base snapshot lacks;
    * [[applyChanges]] in `evolveSchema` mode widens the table, and every
    * surviving base row reads null on the new column. The same feed
    * against the default mode would fail analysis — evolution is opt-in. */
  def schemaEvolutionDemo(orders: DataFrame): DataFrame = {
    val base = demoBase(orders)
    val k = col("o_orderkey")
    val ups = base.filter(k % 7 === 0 && k % 13 =!= 0)
      .select(k, lit("U").as("o_orderstatus"),
        (col("o_totalprice") + lit(1.0)).as("o_totalprice"),
        lit("web").as("o_channel"), lit("U").as("op"))
    val dels = base.filter(k % 13 === 0)
      .select(k, lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("string").as("o_channel"), lit("D").as("op"))
    applyChanges(base, ups.unionByName(dels), Seq("o_orderkey"),
      evolveSchema = true)
      .orderBy("o_orderkey")
  }

  /** SCD-2 dimension history from a change stream: each change row becomes
    * a version valid from its own timestamp until the key's next change
    * (`valid_to` null = current). `tiebreak` makes same-timestamp changes
    * deterministically ordered. One window shuffle on the key. */
  def scd2History(changes: DataFrame, keys: Seq[String], ts: Column,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts, tiebreak)
    changes.withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The l04/l07 fixture snapshot: the merge-relevant slice of `orders`. */
  def demoBase(orders: DataFrame): DataFrame =
    orders.select("o_orderkey", "o_orderstatus", "o_totalprice")

  /** A deterministic change feed derived from the snapshot itself: keys
    * ≡0 (mod 7, not mod 13) get an update (+1.0 price, status 'U'), keys
    * ≡0 (mod 13) a delete. The two change sets are disjoint by
    * construction, so the feed is key-unique without compaction. */
  def demoChangeFeed(base: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val ups = base.filter(k % 7 === 0 && k % 13 =!= 0)
      .select(k, lit("U").as("o_orderstatus"),
        (col("o_totalprice") + lit(1.0)).as("o_totalprice"),
        lit("U").as("op"))
    val dels = base.filter(k % 13 === 0)
      .select(k, lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"), lit("D").as("op"))
    ups.unionByName(dels)
  }

  /** Oracle demo (l04): the demo change feed applied onto the snapshot. */
  def applyChangesDemo(orders: DataFrame): DataFrame = {
    val base = demoBase(orders)
    applyChanges(base, demoChangeFeed(base), Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** Oracle demo (l05): the `events` stream read as a change feed on the
    * `user_id` dimension — each event versions its user's `value`. */
  def scd2Demo(events: DataFrame): DataFrame =
    scd2History(events.select("user_id", "event_id", "value", "ts"),
      Seq("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("user_id", "valid_from", "event_id")
}

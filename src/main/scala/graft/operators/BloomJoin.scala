package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter technique that
  * makes selective joins affordable at 100 TB (Spark's own AQE injects
  * the same shape via `spark.sql.optimizer.runtime.bloomFilter.*`; this
  * is the explicit, plan-visible form a pipeline can apply BEFORE the
  * shuffle boundary it wants to protect).
  *
  * Why it matters at scale: an inner join between a 100 TB fact side and
  * a selective dimension subset shuffles the ENTIRE fact side — every
  * row pays the network+spill cost, then almost all of them are dropped
  * by the join. A bloom filter built from the small side is a few KB,
  * broadcasts for free, and eliminates non-matching fact rows at the
  * scan, so the shuffle carries only (matches + false positives). With
  * m = 2^16 bits and k = 3 hashes the false-positive rate at 10k build
  * keys is < 0.4% — the shuffle shrinks by the join's true selectivity.
  *
  * Correctness: a bloom filter has NO false negatives, so pre-filtering
  * the probe side can never drop a matching row, and the join result is
  * bitwise identical to the unfiltered join — which is exactly what the
  * oracle checks (j01's oracle is the plain join, with no bloom at all).
  *
  * Everything is a DataFrame op: the bitmap is built by a map-side
  * partial `bit_or` aggregate (one row per bitmap word crosses the
  * shuffle per input split), assembled into a single array<long> row,
  * and broadcast. No driver-side state, no UDF — membership tests are
  * codegen'd hash + shift + array index expressions.
  */
object BloomJoin {

  /** Bitmap geometry: 2^16 bits = 1024 longs = 8 KB broadcast. */
  val NumBits = 65536
  val NumWords: Int = NumBits / 64
  val NumHashes = 3

  /** The k probe positions of `key` in the bitmap: xxhash64 seeded by the
    * probe index (the extra literal column varies the hash), folded to
    * [0, NumBits). Deterministic — xxhash64 is a fixed algorithm, so the
    * same key always lights the same bits on both build and probe side. */
  private def positions(key: Column): Seq[Column] =
    (0 until NumHashes).map(h => pmod(xxhash64(key, lit(h)), lit(NumBits)))

  /** Variable-amount shiftleft: the SQL form takes a column shift amount
    * (the Scala `shiftleft` overload only takes a literal int). */
  private def shiftleft_var(base: Column, amount: Column): Column =
    call_function("shiftleft", base, amount)

  /** Build the bloom bitmap from the build side's `keyCol`: one row,
    * `bf: array<long>` of [[NumWords]] words. Plan shape: explode k
    * positions per key → partial `bit_or` per word map-side → final
    * `bit_or` over ≤ [[NumWords]] rows → dense array (absent words are
    * zero words). The build side is small by contract (it is the side
    * you would broadcast); the bitmap is smaller still. */
  def buildBitmap(build: DataFrame, keyCol: String): DataFrame = {
    val pos = explode(array(positions(col(keyCol)): _*)).as("pm")
    build
      .select(pos)
      .select((col("pm") / 64).cast("int").as("w"),
        shiftleft_var(lit(1L), pmod(col("pm"), lit(64)).cast("int"))
          .as("mask"))
      .groupBy(col("w"))
      .agg(bit_or(col("mask")).as("bits"))
      // dense array: aggregate the sparse (w, bits) rows into a full
      // NumWords-long vector; map_from_entries + element_at fills gaps
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits"))))
        .as("wm"))
      .select(transform(sequence(lit(0), lit(NumWords - 1)),
        i => coalesce(element_at(col("wm"), i), lit(0L))).as("bf"))
  }

  /** Membership predicate: every one of the k bits for `key` is set in
    * the broadcast bitmap `bf`. Codegen-friendly conjunction of array
    * reads — no UDF, no per-row allocation. */
  def mightContain(key: Column, bf: Column): Column =
    positions(key)
      .map { p =>
        val word = element_at(bf, (p / 64).cast("int") + 1)
        word.bitwiseAND(shiftleft_var(lit(1L), pmod(p, lit(64)).cast("int"))) =!= 0L
      }
      .reduce(_ && _)

  /** Pre-filter `probe` to rows whose `keyCol` might be in `build`'s key
    * set: build the bitmap, broadcast it (a one-row cross join Catalyst
    * plans as BroadcastNestedLoopJoin over 8 KB), keep possible members.
    * At scale this runs BEFORE the probe side's shuffle, so the shuffle
    * carries matches + <0.4% false positives instead of the whole side. */
  def bloomPrune(probe: DataFrame, probeKey: String, build: DataFrame,
      buildKey: String): DataFrame = {
    val bf = buildBitmap(build, buildKey)
    probe.join(broadcast(bf))
      .filter(mightContain(col(probeKey), col("bf")))
      .drop("bf")
  }

  /** j01: revenue per order priority over a selective order subset, with
    * the lineitem (fact) side bloom-pruned before the join. The bloom is
    * a pure no-false-negative reduction, so the result equals the plain
    * join the oracle runs; BloomJoinSpec asserts the prune actually
    * removed fact rows on the fixture (the scale win is that removal
    * happening before the shuffle). */
  def bloomJoinRevenue(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dims = orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val pruned = bloomPrune(lineitem, "l_orderkey", dims, "o_orderkey")
    pruned.join(dims, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }
}

package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A time-partitioned lake (LakeStorage's `pdate=/phour=`) prunes on ONE
  * dimension. Queries that filter on two independent columns (e.g.
  * part AND supplier) get no help from a single-column sort: sorting by
  * the first column scatters the second across every file. Interleaving
  * the bits of both columns into one Z-value and range-partitioning on it
  * bounds BOTH columns' min/max per file, so parquet row-group statistics
  * prune either predicate — the technique Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort orders apply, expressed here directly on the engine.
  *
  * The bit-interleave is a pure codegen'd integer expression (shift/mask/
  * add — bits are disjoint so `+` is `|`), no UDF; at 100 TB the z-sort is
  * one `repartitionByRange` (sampled range exchange) + within-partition
  * sort, exactly the cost of any global sort, paid once at write time.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of n non-negative integer
    * columns: bit i of column j lands at position n·i + j. Real layout
    * tuning regularly clusters on 3-4 dimensions (Delta's ZORDER BY
    * takes a column list); the interleave stays a pure codegen'd
    * shift/mask/add chain for any n, bounded by the 63 usable bits of
    * one long. Callers bound the domain first (e.g. `col % 1024` or a
    * width-scaled cast) — values wider than `bits` alias, never error. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"${cols.size} cols x $bits bits exceeds one long")
    val n = cols.size
    // Widen to long before shifting: for IntegerType inputs Spark's
    // shiftleft uses Java int shifts (amount masked mod 32), so a bit
    // position n*i+j >= 32 would silently wrap instead of interleaving.
    val longs = cols.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      longs.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(1), n * i + j)
      }
    }.reduce(_ + _)
  }

  /** Two-column form (bit i of `a` at 2i, of `b` at 2i+1 ≡ [[zValueN]]
    * column order (a, b)). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits <= 31, s"bits must be in [1,31], got $bits")
    zValueN(Seq(a, b), bits)
  }

  /** The DuckDB-dialect twin of [[zValueN]] for oracle SQL, built from
    * the same shift/mask/add terms so both engines compute identical
    * values. */
  def zValueSqlN(names: Seq[String], bits: Int): String = {
    val n = names.size
    (0 until bits).flatMap { i =>
      names.zipWithIndex.map { case (name, j) =>
        s"((($name >> $i) & 1) << ${n * i + j})"
      }
    }.mkString("(", " + ", ")")
  }

  /** Two-column oracle twin of [[zValue]]. */
  def zValueSql(a: String, b: String, bits: Int): String =
    zValueSqlN(Seq(a, b), bits)

  /** Cluster `df` into `numPartitions` Z-ordered slices: range-partition on
    * the z-value, then sort within partitions so every written file covers
    * a tight z-range (→ tight min/max on BOTH source columns). Write the
    * result with any sink; the layout is what matters. */
  def zorderRepartition(df: DataFrame, z: Column,
      numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)

  /** Oracle demo (l06): Z-values over (l_partkey, l_suppkey) mod 1024,
    * rolled up by the top 6 z-bits. Each bucket is a 128×128 tile of the
    * key plane — the per-bucket min/max of BOTH dimensions stay tile-bound,
    * which is precisely the file-statistics property z-ordered writes give
    * parquet pruning (a single-column sort bounds only its own column). */
  /** l09: the [[zorderStatsDemo]] property in THREE dimensions —
    * z-values over (l_partkey, l_suppkey, l_orderkey) mod 256 (8 bits
    * each, 24-bit z), rolled up by the top 6 z-bits: 64 buckets, each a
    * 64×64×64 tile of the key cube whose per-bucket min/max stay
    * tile-bound on ALL THREE columns — the file-statistics property a
    * 3-column ZORDER BY write gives parquet pruning. */
  def zorder3StatsDemo(lineitem: DataFrame): DataFrame = {
    val a = col("l_partkey") % 256
    val b = col("l_suppkey") % 256
    val c = col("l_orderkey") % 256
    lineitem
      .withColumn("z", zValueN(Seq(a, b, c), 8))
      .groupBy(shiftright(col("z"), 18).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(a).as("min_part"), max(a).as("max_part"),
        min(b).as("min_supp"), max(b).as("max_supp"),
        min(c).as("min_ord"), max(c).as("max_ord"))
      .orderBy("zbucket")
  }

  def zorderStatsDemo(lineitem: DataFrame): DataFrame = {
    val a = col("l_partkey") % 1024
    val b = col("l_suppkey") % 1024
    lineitem
      .withColumn("z", zValue(a, b, 10))
      .groupBy(shiftright(col("z"), 14).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(a).as("min_part"), max(a).as("max_part"),
        min(b).as("min_supp"), max(b).as("max_supp"))
      .orderBy("zbucket")
  }
}

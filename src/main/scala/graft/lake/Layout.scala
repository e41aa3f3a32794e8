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

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Callers bound the domain first (e.g. `col % 1024` or a width-scaled
    * cast) — values wider than `bits` alias, they never error. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    // Widen to long before shifting: for IntegerType inputs Spark's
    // shiftleft uses Java int shifts (amount masked mod 32), so a bit
    // position 2i+1 >= 32 would silently wrap instead of interleaving.
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The DuckDB-dialect twin of [[zValue]] for oracle SQL, built from the
    * same shift/mask/add terms so both engines compute identical values. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

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

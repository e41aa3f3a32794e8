package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities — the co-located-join scale path.
  *
  * At 100 TB the dominant cost of a big-big equi-join is the shuffle of
  * both sides. Writing the fact tables bucketed by the join key (same
  * bucket count both sides) makes the join map-side: Spark reads matching
  * buckets pairwise and sort-merge-joins them with NO exchange — verified
  * in BucketingSpec by asserting the physical plan is exchange-free.
  *
  * This generalizes the lake layout (LakeStorage partitions by time;
  * bucketing adds hash layout on the entity key within partitions).
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (sorted within buckets so
    * sort-merge join skips the sort). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int = 8): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir

  /** Join two pre-bucketed tables on their bucket key — shuffle-free when
    * bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    // bind each table ONCE: the join condition must reference the same
    // Dataset instances as the join children (separate spark.table()
    // calls only line up while the catalog's relation cache is warm)
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}

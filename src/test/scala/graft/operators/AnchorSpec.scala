package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Anchor]]'s two strategies. The reliable path needs a
  * checkpoint dir on the JVM-shared SparkContext; each test restores
  * the prior value (reflection — `checkpointDir` is private[spark],
  * which is public at bytecode level) so the rest of the suite keeps
  * the fast localCheckpoint fallback. */
class AnchorSpec extends SparkSpec {

  private def setCheckpointDir(v: Option[String]): Unit = {
    val m = classOf[SparkContext].getMethod("checkpointDir_$eq",
      classOf[Option[String]])
    m.invoke(spark.sparkContext, v): Unit
  }

  private def withCheckpointDir[A](body: java.io.File => A): A = {
    val prev = spark.sparkContext.getCheckpointDir
    val dir = java.nio.file.Files.createTempDirectory("anchor-spec")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try body(dir.toFile)
    finally {
      setCheckpointDir(prev)
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rec)); f.delete(): Unit
      }
      rec(dir.toFile)
    }
  }

  test("without a checkpoint dir, cut takes the localCheckpoint path") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = spark.range(100).toDF("n")
      .withColumn("sq", col("n") * col("n"))
    val cut = Anchor.cut(df)
    assert(cut.count() == 100)
    // local checkpoint: materialized, but no reliable checkpoint file
    assert(cut.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    Anchor.release(cut)
  }

  test("with a checkpoint dir, cut writes a RELIABLE checkpoint and " +
      "release deletes its files") {
    withCheckpointDir { dir =>
      val df = spark.range(50).toDF("n")
        .groupBy(col("n") % 5).agg(sum("n").as("s"))
      val cut = Anchor.cut(df)
      assert(cut.count() == 5)
      // the anchor survives as files under the checkpoint dir
      def files(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles).toSeq.flatten
          .flatMap(c => if (c.isDirectory) files(c) else Seq(c))
      assert(files(dir).nonEmpty)
      // the cut frame is NOT left pinned in the block-manager cache
      // (the persist around the write is scratch, not a leak)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty ||
        !spark.sparkContext.getPersistentRDDs.values
          .exists(_.name == cut.queryExecution.toString))
      // result is correct through the checkpoint files
      assert(cut.agg(sum("s")).head.getLong(0) == (0 until 50).sum)
      Anchor.release(cut)
      assert(files(dir).isEmpty)
    }
  }

  test("reliable cut computes its input exactly ONCE (the persist " +
      "around the checkpoint write makes it recompute-free)") {
    withCheckpointDir { _ =>
      // a per-partition compute counter: the eager count populates the
      // cache (8 bumps), the checkpoint write job must read those
      // blocks — a second round of bumps would mean the write
      // recomputed the plan (the exact failure the persist+blocking-
      // unpersist pairing exists to prevent)
      val acc = spark.sparkContext.longAccumulator("anchor-computes")
      import spark.implicits._
      val base = spark.range(0, 64, 1, 8).as[Long]
        .mapPartitions { it => acc.add(1); it }.toDF("n")
      val cut = Anchor.cut(base)
      assert(acc.value == 8,
        s"plan computed ${acc.value}/8 partition passes — the " +
          "checkpoint write recomputed instead of reading the cache")
      // downstream actions serve from the anchor, never the lineage
      assert(cut.count() == 64)
      assert(acc.value == 8)
      Anchor.release(cut)
    }
  }

  test("Loop keeps exactly one live reliable anchor as rounds advance") {
    withCheckpointDir { dir =>
      def rddDirs(): Set[String] = {
        def rec(f: java.io.File): Seq[java.io.File] =
          Option(f.listFiles).toSeq.flatten.flatMap(c =>
            if (c.isDirectory) c +: rec(c) else Seq(c))
        rec(dir).filter(_.getName.startsWith("rdd-"))
          .map(_.getAbsolutePath).toSet
      }
      val loop = new Anchor.Loop
      var state = spark.range(10).toDF("n")
      for (_ <- 1 to 3) {
        state = loop.cut(state.withColumn("n", col("n") + 1))
        // after each round at most one rdd-N dir is live
        assert(rddDirs().size <= 1)
      }
      assert(state.agg(sum("n")).head.getLong(0) == (3 to 12).sum)
      loop.close()
      assert(rddDirs().isEmpty)
    }
  }
}

package graft.lake

import java.nio.file.Files
import java.time.LocalDateTime

import graft.SparkSpec

/** Compaction: collapses a partition's small files without changing its
  * data or touching sibling partitions. */
class LakeMaintenanceSpec extends SparkSpec {

  test("compactPartition merges files, preserves rows, isolates partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact-").toFile.getAbsolutePath
    val storage = new SparkLakeStorage(spark, root)
    val ts1 = LocalDateTime.of(2026, 4, 1, 6, 0)
    val ts2 = LocalDateTime.of(2026, 4, 1, 7, 0) // sibling hour

    // three appends into hour 06 -> several small files
    (1 to 3).foreach { i =>
      storage.saveBooks(
        Seq((i.toLong, s"h$i", s"b$i")).toDF("book_id", "header", "body"), ts1)
    }
    storage.saveBooks(
      Seq((9L, "h9", "b9")).toDF("book_id", "header", "body"), ts2)

    def files(hour: String) =
      new java.io.File(s"$root/datalake/pdate=20260401/phour=$hour")
        .listFiles().count(_.getName.endsWith(".parquet"))
    val before = files("06")
    assert(before >= 3)
    val siblingBefore = files("07")
    val lakeBefore = storage.lake.orderBy("book_id", "kind")
      .collect().map(_.toSeq).toSeq

    val rows = LakeMaintenance.compactPartition(spark, root, "20260401", "06")
    assert(rows == 6) // 3 books x header+body

    assert(files("06") == 1)
    assert(files("07") == siblingBefore) // untouched
    val lakeAfter = storage.lake.orderBy("book_id", "kind")
      .collect().map(_.toSeq).toSeq
    assert(lakeAfter == lakeBefore)
    assert(storage.listBooks() == Seq(1L, 2L, 3L, 9L))
  }

  test("compactPartition and rebuildManifest release their reliable " +
      "snapshot anchors after the overwrite commits") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-compact-rel-")
      .toFile.getAbsolutePath
    val storage = new SparkLakeStorage(spark, root)
    val ts = LocalDateTime.of(2026, 4, 2, 6, 0)
    (1 to 2).foreach { i =>
      storage.saveBooks(
        Seq((i.toLong, s"h$i", s"b$i")).toDF("book_id", "header", "body"), ts)
    }
    val ckpt = Files.createTempDirectory("graft-ckpt-lake")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    def rddDirs: Seq[String] = {
      import scala.jdk.CollectionConverters._
      Files.walk(ckpt).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .map(_.toString).toSeq
    }
    try {
      // without release, each maintenance run would permanently leak a
      // full partition copy into the checkpoint store
      // (cleanCheckpoints is off by default)
      assert(LakeMaintenance.compactPartition(
        spark, root, "20260402", "06") == 4)
      assert(rddDirs.isEmpty, s"compaction leaked anchors: $rddDirs")
      storage.rebuildManifest()
      assert(rddDirs.isEmpty, s"manifest rebuild leaked anchors: $rddDirs")
      assert(storage.listBooks() == Seq(1L, 2L))
    } finally {
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}

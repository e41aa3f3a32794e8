package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.lake.{DocumentFetcher, GutenbergFetcher, MarkerSplit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 document source — the reference's HTTP ingest (SURVEY S1,
  * IngestionService.java:43-53) as a first-class Spark table:
  *
  * {{{
  *   spark.read.format("graft.sources.GutenbergSource")
  *     .option("ids", "1342,84,2701")
  *     .option("numPartitions", "8")
  *     .option("fetcher", "http")    // or "fixture" for hermetic tests
  *     .load()                       // => (book_id long, text string)
  * }}}
  *
  * The id list splits round-robin into `numPartitions` input partitions;
  * each partition's reader fetches its ids executor-side, so a cluster
  * fans the ingest out exactly like the task parallelism the reference
  * approximates with its servlet thread pool (Main.java:39). Failed
  * fetches yield a null `text` (the caller routes them, mirroring
  * IngestService's status report). Fixture mode generates marker-wrapped
  * deterministic texts — no network, for tests and offline rigs.
  */
class GutenbergSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GutenbergSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GutenbergTable(new CaseInsensitiveStringMap(properties))
}

object GutenbergSource {
  val Schema: StructType = StructType(Seq(
    StructField("book_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** Deterministic offline stand-in for gutenberg.org. */
  object FixtureFetcher extends DocumentFetcher {
    override def fetch(id: Long): Option[String] =
      if (id <= 0) None
      else Some(s"Fixture Book $id\n${MarkerSplit.StartMarkers(0)} " +
        s"Book $id ***\nfixture body of book $id\n" +
        s"${MarkerSplit.EndMarkers(0)} Book $id ***\nend")
  }

  def fetcherFor(name: String): DocumentFetcher = name match {
    case "http" => GutenbergFetcher
    case "fixture" => FixtureFetcher
    case other => throw new IllegalArgumentException(
      s"unknown fetcher '$other' (expected http|fixture)")
  }
}

private class GutenbergTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = "gutenberg"
  override def schema(): StructType = GutenbergSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // read per-SCAN options (falling back to table properties for the
    // catalog path, where read options may be absent)
    def opt(key: String): Option[String] =
      Option(caseInsensitiveOptions.get(key)).orElse(Option(options.get(key)))
    val ids = opt("ids") match {
      case None => throw new IllegalArgumentException(
        "option 'ids' is required (comma-separated book ids)")
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    }
    val nPart = math.max(1, math.min(
      opt("numPartitions").map(_.toInt).getOrElse(8), ids.length))
    val fetcher = opt("fetcher").getOrElse("http")
    // fail fast DRIVER-side on a bad fetcher name — executor-side it
    // would burn task retries before aborting the job
    GutenbergSource.fetcherFor(fetcher)
    new GutenbergScanBuilder(ids.toSeq, nPart, fetcher)
  }
}

private class GutenbergScanBuilder(ids: Seq[Long], nPart: Int,
    fetcher: String) extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = GutenbergSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (0 until nPart).map(p =>
      GutenbergPartition(ids.zipWithIndex.collect {
        case (id, i) if i % nPart == p => id
      }.toArray): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GutenbergReaderFactory(fetcher)
}

private case class GutenbergPartition(ids: Array[Long])
  extends InputPartition

private class GutenbergReaderFactory(fetcherName: String)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val ids = partition.asInstanceOf[GutenbergPartition].ids
    val fetcher = GutenbergSource.fetcherFor(fetcherName)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < ids.length }
      override def get(): InternalRow = {
        val id = ids(i)
        val text = fetcher.fetch(id)
          .map(UTF8String.fromString).orNull
        new GenericInternalRow(Array[Any](id, text))
      }
      override def close(): Unit = ()
    }
  }
}

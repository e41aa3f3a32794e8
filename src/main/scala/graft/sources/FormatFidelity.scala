package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** l19/l20: TEXT-FORMAT ROUND-TRIP FIDELITY — the interchange-format
  * coverage the parquet-native lake otherwise never exercises. Real
  * corpora arrive and leave as JSONL and CSV (every public web-corpus
  * release ships one of the two), and the failure mode is silent:
  * an unescaped newline splits one document into two records, a bare
  * quote swallows its neighbor's field, a backslash doubles — and the
  * corpus "loads fine" with corrupted documents. These queries prove
  * the configured write/read option sets are LOSSLESS by construction:
  * every document's text is first extended with [[HardSuffix]] — a
  * deterministic worst-case tail carrying a record separator
  * (newline), the CSV delimiter (comma), the quote character, a
  * backslash, a tab, and a non-ASCII code point — then written to the
  * format under test, read back with an explicit schema, and published
  * as (per-doc char count, md5). The DuckDB oracle computes the same
  * two values from the PARQUET ground truth with the identical
  * injection (rendered from the same Scala value, the t41
  * shared-injection contract) — so a hash match is a proof that the
  * format round trip preserved every byte of every column, and any
  * escaping defect in the option set fails loudly at the gate.
  *
  * Write-once discipline: the formatted copy is a session-lifetime
  * artifact keyed by (format, corpus identity) — the IndexStore
  * stance; repeat invocations (the bench's passes) only read.
  *
  * Scale: the write is one narrow corpus pass, partitioned like any
  * lake write; the read is a distributed text-source scan with an
  * explicit schema (no inference pass — inference at 100 TB is a
  * second full read). CSV reads with `multiLine` parse quoted
  * newlines correctly, at the documented cost that multi-line CSV
  * files are not arbitrarily splittable — which is the operational
  * argument for JSONL over CSV at scale, and having both queries side
  * by side makes that trade measurable. */
object FormatFidelity {

  /** The worst-case tail injected into every document before the
    * round trip: newline (record separator), comma (CSV delimiter),
    * double quote, backslash, tab, and a non-ASCII code point. */
  val HardSuffix: String = "\nend,\"quoted\"\\tail\t\u00fc"

  private val stored =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The documents frame with the fidelity tail appended — the frame
    * whose identity the round trip must preserve. */
  private def hardened(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("lang"), col("source"),
      concat(col("text"), lit(HardSuffix)).as("text"))

  private def roundTrip(documents: DataFrame, format: String,
      writeOpts: Map[String, String],
      readOpts: Map[String, String]): DataFrame = {
    val hard = hardened(documents)
    val key = graft.operators.ModelArtifacts
      .planKey(s"fidelity-$format", documents, "")
    val dir = stored.computeIfAbsent(key, _ => {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-fidelity-$format-").toString
      hard.write.options(writeOpts).mode("overwrite").format(format)
        .save(d)
      d
    })
    documents.sparkSession.read.schema(hard.schema).options(readOpts)
      .format(format).load(dir)
  }

  private def fidelity(back: DataFrame): DataFrame =
    back.select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("long").as("rt_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))

  /** l19: JSONL round trip — one JSON object per line, the
    * interchange format web-corpus releases actually use. JSON's own
    * escaping carries the newline/quote/backslash tail; the explicit
    * schema keeps the read a single pass. */
  def jsonlRoundTrip(documents: DataFrame): DataFrame =
    fidelity(roundTrip(documents, "json",
      writeOpts = Map.empty, readOpts = Map.empty))

  /** l20: CSV round trip in RFC-4180 posture — quote doubling
    * (`escape` = the quote character, not the default backslash,
    * which is NOT what other CSV consumers parse) and `multiLine`
    * reads so quoted embedded newlines stay inside their record. */
  def csvRoundTrip(documents: DataFrame): DataFrame = {
    val opts = Map("quote" -> "\"", "escape" -> "\"")
    fidelity(roundTrip(documents, "csv",
      writeOpts = opts,
      readOpts = opts + ("multiLine" -> "true")))
  }
}

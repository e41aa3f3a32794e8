package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling + token-budget mix: determinism, budget respect, and the
  * scale posture of the sharded form (the per-language running sum must
  * split into parallel per-shard sums under a dominant language). */
class SamplingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)

  test("hexThreshold constants match the t08 oracle SQL") {
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.75) == "c0000000")
    assert(Sampling.hexThreshold(1.0) == "g")
    assert(Sampling.hexThreshold(0.1) == "19999999")
    assert(Sampling.hexThreshold(0.0) == "00000000")
  }

  test("stratified sample is deterministic and keeps rate-1.0 strata whole") {
    val rates = Map("en" -> 0.5, "fr" -> 1.0)
    val a = Sampling.stratifiedSample(docs, rates, 0.1).collect().toSeq
    val b = Sampling.stratifiedSample(docs, rates, 0.1).collect().toSeq
    assert(a == b, "hash-threshold sampling must be reproducible")
    val frTotal = docs.filter(col("lang") === "fr").count()
    val frKept = a.count(_.getAs[String]("lang") == "fr")
    assert(frKept == frTotal, "rate 1.0 must keep every row of the stratum")
  }

  test("samples nest: a lower rate selects a subset of a higher rate") {
    // the operational property of hash-threshold sampling: growing the
    // rate only ADDS documents, so pipeline reruns with a bigger budget
    // keep every previously selected doc (monotone thresholds)
    assert(Sampling.hexThreshold(0.1) < Sampling.hexThreshold(0.3))
    assert(Sampling.hexThreshold(0.3) < Sampling.hexThreshold(1.0))
    val lo = Sampling.stratifiedSample(docs, Map.empty, 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.stratifiedSample(docs, Map.empty, 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size)
  }

  test("token-budget mix stays within the per-language budget") {
    val budget = 3000L
    val over = Sampling.tokenBudgetMix(docs, budget)
      .groupBy(col("lang")).agg(sum(col("n_tokens")).as("tot"))
      .filter(col("tot") > budget).count()
    assert(over == 0, "no language may exceed its token budget")
  }

  test("sharded mix with one shard is the exact mix") {
    val exact = Sampling.tokenBudgetMix(docs, 3000L)
      .collect().map(_.toSeq).toSet
    val sharded = Sampling.tokenBudgetMixSharded(docs, 3000L, numShards = 1)
      .drop("shard").select(col("lang"), col("doc_id"), col("n_tokens"),
        col("quality"), col("cum_tokens"))
      .collect().map(_.toSeq).toSet
    assert(sharded == exact)
  }

  test("sharded mix splits a dominant language across shards") {
    // skewed fixture: the whole corpus is one language — the exact form
    // would funnel it through a single running-sum task
    val skewed = docs.withColumn("lang", lit("en"))
    val n = 8
    val out = Sampling.tokenBudgetMixSharded(skewed, 8000L, numShards = n)
    // lang is a foldable literal in this fixture, so Catalyst drops it
    // from the hash keys — the load-bearing fact is that shard IS a
    // partition key of the window exchange
    val planStr = out.queryExecution.executedPlan.toString
    assert("hashpartitioning\\([^)]*shard#\\d+".r
      .findFirstIn(planStr).isDefined,
      s"window must hash-partition on shard, got:\n$planStr")
    val rows = out.collect()
    val shards = rows.map(_.getAs[Long]("shard")).distinct
    assert(shards.length > 1,
      "a dominant language must spread across >1 shard partition")
    val perShard = 8000L / n
    val worst = rows.groupBy(r => (r.getAs[String]("lang"),
      r.getAs[Long]("shard")))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_tokens")).sum }.max
    assert(worst <= perShard, "each shard must respect its split budget")
  }

  test("packSequences: reproducible shuffle order, first-token bin rule") {
    val a = Sampling.packSequences(docs, 512).collect()
    val b = Sampling.packSequences(docs, 512).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "packing must be bit-reproducible across runs")
    assert(a.nonEmpty)
    a.groupBy(_.getAs[String]("shard")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("cum_before"))
      // cum_before is the exclusive prefix sum in shuffle order
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("cum_before") == cum)
        // bin = the sequence holding the document's first token
        assert(r.getAs[Long]("seq_id") == cum / 512)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("temperature mix flattens the language distribution") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val langs = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureMix(docs, targetDocs = 250L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every language survives, and the mix is FLATTER than the corpus:
    // the dominant language's share must strictly shrink
    assert(kept.keySet == langs.keySet)
    val total = langs.values.sum.toDouble
    val keptTotal = kept.values.sum.toDouble
    val top = langs.maxBy(_._2)._1
    assert(kept(top) / keptTotal < langs(top) / total,
      s"dominant '$top' share did not shrink: $kept vs $langs")
    // determinism: a second run selects the identical documents
    val a = Sampling.temperatureMix(docs).collect().toSeq
    val b = Sampling.temperatureMix(docs).collect().toSeq
    assert(a == b)
  }

  test("interleave round-robins sources in full rank blocks") {
    val nSources = docs.select("source").distinct().count().toInt
    val take = nSources * 3
    val rows = Sampling.interleaveBySource(docs, take).collect()
    assert(rows.length == take)
    // with every source deeper than 3 docs, each rank block 1..3 must
    // contain every source exactly once
    val blocks = rows.groupBy(_.getAs[Long]("rk"))
    assert(blocks.keySet == Set(1L, 2L, 3L))
    assert(blocks.values.forall(
      _.map(_.getAs[String]("source")).toSet.size == nSources))
  }

  test("exact sample returns exactly N, nested across sizes, no sort funnel") {
    val s100 = Sampling.exactSample(docs, 100)
    assert(s100.count() == 100)
    val ids50 = Sampling.exactSample(docs, 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids100 = s100.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids50.subsetOf(ids100), "samples must nest as N grows")
    val plan = s100.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"exact sample should plan per-partition top-N, got:\n$plan")
  }

  test("stratified exact-N: per-stratum counts, nesting, stability") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val strata = docs.groupBy(org.apache.spark.sql.functions.col("lang"))
      .count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val s20 = Sampling.stratifiedExactN(docs, n = 20).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rank")))
    val byLang = s20.groupBy(_._1)
    assert(byLang.keySet == strata.keySet, "every stratum is sampled")
    for ((lang, rows) <- byLang) {
      assert(rows.length == math.min(20L, strata(lang)),
        s"$lang sample size")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // nesting: the N=10 sample is a per-stratum prefix of N=20
    val s10 = Sampling.stratifiedExactN(docs, n = 10).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    assert(s10.subsetOf(s20.map(r => (r._1, r._2)).toSet))
    // pure function of the data set: repartition cannot move a member
    val repart = Sampling.stratifiedExactN(docs.repartition(7), n = 20)
      .collect().map(_.toSeq).toSet
    assert(repart == Sampling.stratifiedExactN(docs, n = 20)
      .collect().map(_.toSeq).toSet)
  }

  test("eval-set build draws only from the safe test slice, exactly") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = col("doc_id") % 100 === 0
    val split = Sampling.safeSplit(docs, bench).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val got = Sampling.evalSetBuild(docs, bench).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[String]("sample_key"), r.getAs[Long]("rank")))
    assert(got.nonEmpty)
    // leakage gates: every member is a safe test doc
    assert(got.forall(r => split(r._2) == "test"),
      "eval member outside the safe test slice")
    // exact-N contract per stratum against a local recomputation
    val testDocs = docs.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
      .filter { case (_, id) => split(id) == "test" }
    val keyOf = got.map(r => r._2 -> r._3).toMap
    for ((lang, rows) <- got.groupBy(_._1)) {
      val stratum = testDocs.filter(_._1 == lang)
      assert(rows.length == math.min(10, stratum.length), s"size of $lang")
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // key-order sanity: within a stratum, members are the smallest keys
    assert(keyOf.nonEmpty)
  }
}

class DsirSelectSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("dsirSelect: target excluded, ranked cut, weight order holds") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Sampling.dsirSelect(docs, n = 50).collect()
    assert(out.length == 50)
    assert(out.forall(_.getAs[String]("source") != "src0"))
    val bits = out.map(_.getAs[Double]("mean_bits"))
    assert(bits.zip(bits.tail).forall { case (a, b) => a >= b })
    // the cut is the true top-50: nothing outside beats the floor
    val floor = bits.last
    val picked = out.map(_.getAs[Long]("doc_id")).toSet
    val better = graft.operators.TextAnalysis.dsirWeights(docs)
      .filter(col("source") =!= "src0")
      .filter(col("mean_bits") > floor)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(better.subsetOf(picked))
  }
}

class ShardManifestSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val docs = (0L until 50L)
    .map(i => (i, s"alpha bravo tok$i word${i % 7}"))
    .toDF("doc_id", "text")

  test("shardManifest (p12): counts/tokens reconcile, key ranges are " +
      "disjoint hex prefixes, markers carry the boundary keys") {
    val rows = Sampling.shardManifest(docs).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 50L)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum == 200L) // 4 each
    rows.foreach { r =>
      val shard = r.getAs[String]("shard")
      assert(shard.length == 1 && "0123456789abcdef".contains(shard))
      val (lo, hi) = (r.getAs[String]("min_key"), r.getAs[String]("max_key"))
      // every key in a shard starts with the shard's hex digit — so
      // adjacent shards' ranges cannot overlap
      assert(lo.startsWith(shard) && hi.startsWith(shard) && lo <= hi)
      assert(r.getAs[String]("first_marker").startsWith(lo + ":"))
      assert(r.getAs[String]("last_marker").startsWith(hi + ":"))
    }
    // shards are emitted sorted and at most 16
    val shards = rows.map(_.getAs[String]("shard")).toSeq
    assert(shards == shards.sorted && shards.toSet.size == shards.length)
  }

  test("shardManifest: checksum flips on a content edit in exactly the " +
      "edited doc's shard; row order and partitioning never matter") {
    val base = Sampling.shardManifest(docs).collect().toSeq
    // partition/order invariance: the checksum aggregate is order-free
    val shuffled = Sampling.shardManifest(
      docs.repartition(7).sortWithinPartitions(col("doc_id").desc))
      .collect().toSeq
    assert(base == shuffled)
    // flip ONE document's text: only that doc's shard row changes, and
    // only in content_checksum (same key set, same counts)
    val edited = docs
      .withColumn("text", when(col("doc_id") === 17L,
        lit("alpha bravo tok17 TAMPERED")).otherwise(col("text")))
    val after = Sampling.shardManifest(edited).collect().toSeq
    val changed = base.zip(after).filter { case (a, b) => a != b }
    assert(changed.size == 1)
    val (b17, a17) = changed.head
    assert(b17.getAs[String]("shard") == a17.getAs[String]("shard"))
    assert(b17.getAs[Long]("n_docs") == a17.getAs[Long]("n_docs"))
    assert(b17.getAs[String]("min_key") == a17.getAs[String]("min_key"))
    // published rendering is the fixed-width 39-char decimal string —
    // driver-stable (r15: decimal128 output hashed asymmetrically)
    val (bSum, aSum) = (b17.getAs[String]("content_checksum"),
      a17.getAs[String]("content_checksum"))
    assert(bSum != aSum)
    assert(bSum.length == 39 && aSum.length == 39)
    assert(bSum.forall(_.isDigit) && aSum.forall(_.isDigit))
  }
}

/** p17: the manifest mergeability law + its streaming maintenance. */
class IncrementalManifestSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  private def docs(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"alpha tok$i beta word${i % 5}"))
      .toDF("doc_id", "text")
  }

  test("mergeManifests: merging per-batch raw manifests equals the " +
      "from-scratch manifest bitwise, under any batching") {
    val all = docs(0 until 60)
    val whole = Sampling.shardManifest(all).collect().map(_.toString)
    // two different batchings of the same corpus
    val byThirds = Sampling.renderManifest(Sampling.mergeManifests(
      (0 to 2).map(r => Sampling.rawManifest(
        all.filter(col("doc_id") % 3 === r))): _*))
      .collect().map(_.toString)
    val lopsided = Sampling.renderManifest(Sampling.mergeManifests(
      Sampling.rawManifest(all.filter(col("doc_id") < 7)),
      Sampling.rawManifest(all.filter(col("doc_id") >= 7))))
      .collect().map(_.toString)
    assert(byThirds.toSeq == whole.toSeq)
    assert(lopsided.toSeq == whole.toSeq)
  }

  test("streaming manifest maintenance: foreachBatch folding of raw " +
      "manifests is bitwise the batch manifest") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // the stored state: one raw manifest, folded per micro-batch and
    // anchored (16 rows — model-scale state, the p17 scale story)
    var state: org.apache.spark.sql.DataFrame = null
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val raw = Sampling.rawManifest(batch)
        state = graft.operators.Anchor.cut(
          if (state == null) raw
          else Sampling.mergeManifests(state, raw))
        ()
      }
      .start()
    try {
      (0 until 60).grouped(17).foreach { g =>
        input.addData(g.map(i =>
          (i.toLong, s"alpha tok$i beta word${i % 5}")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = Sampling.renderManifest(state)
      .collect().map(_.toString).toSeq
    val batch = Sampling.shardManifest(docs(0 until 60))
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }
}

/** p16: the data-constrained epoch/repeat plan. */
class EpochPlanSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("epochPlan: sqrt-quantized weights, floor targets, capped " +
      "ceil-div epochs, deficit reported not reallocated") {
    import spark.implicits._
    // exact token counts: 900 and 100 → weights 30e6/10e6 → shares ¾/¼
    val docs = Seq(
      (1L, Seq.fill(900)("tok").mkString(" "), "big"),
      (2L, Seq.fill(100)("tok").mkString(" "), "small")
    ).toDF("doc_id", "text", "source")
    val out = Sampling.epochPlan(docs, budgetTokens = 4000L)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    // big: target 3000, ceil(3000/900)=4 (inside the cap), served 3000,
    // no deficit, repeat 2100/3000
    assert(out("big") == Seq(900L, 30000000L, 3000L, 4L, 3000L, 0L, 0.7))
    // small: target 1000 wants 10 epochs, cap 4 → served 400,
    // deficit 600 SURFACES, repeat 300/400
    assert(out("small") ==
      Seq(100L, 10000000L, 1000L, 4L, 400L, 600L, 0.75))
  }

  test("epochPlan: a source inside its budget runs one epoch with " +
      "zero repeats; budget conservation holds") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(400)("tok").mkString(" "), "a"),
      (2L, Seq.fill(400)("tok").mkString(" "), "b")
    ).toDF("doc_id", "text", "source")
    val rows = Sampling.epochPlan(docs, budgetTokens = 400L).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("epochs") == 1L)
      assert(r.getAs[Double]("repeat_frac") == 0.0)
      assert(r.getAs[Long]("deficit") == 0L)
      assert(r.getAs[Long]("served_tokens") == 200L)
    }
    // targets partition the budget up to floor rounding
    val tgt = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(tgt <= 400L && tgt >= 398L)
  }
}

/** p13: the staged-pretraining (two-stage/anneal) schedule export. */
class AnnealScheduleSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("annealSchedule (p13): phases partition the keepers into exact " +
      "terciles ordered by margin; shard laws match p12") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Sampling  // touch object init order deterministically
      .shardManifest(docs).collect()
    val sched = graft.operators.TextAnalysis.annealSchedule(docs).collect()
    val nKeep = graft.operators.TextAnalysis.learnedMargin(docs)
      .filter(col("margin") > 0.0).count()
    assert(sched.map(_.getAs[Long]("n_docs")).sum == nKeep)
    val phases = sched.map(_.getAs[String]("phase")).distinct.sorted
    assert(phases.toSeq ==
      Seq("stage1_bulk", "stage2_bulk", "stage3_anneal"))
    // tercile sizes: each phase within 1 of n/3
    val byPhase = sched.groupBy(_.getAs[String]("phase"))
      .map { case (ph, rs) => ph -> rs.map(_.getAs[Long]("n_docs")).sum }
    byPhase.values.foreach(n =>
      assert(math.abs(n - nKeep / 3.0) <= 1.0, s"$byPhase vs $nKeep"))
    // the margin ranges of successive phases are ordered (ties split
    // by doc_id can touch at the boundary, never cross)
    def mm(ph: String) = {
      val rs = sched.filter(_.getAs[String]("phase") == ph)
      (rs.map(_.getAs[Double]("min_margin")).min,
        rs.map(_.getAs[Double]("max_margin")).max)
    }
    assert(mm("stage1_bulk")._2 <= mm("stage2_bulk")._1 ||
      mm("stage1_bulk")._2 == mm("stage2_bulk")._1)
    assert(mm("stage2_bulk")._2 <= mm("stage3_anneal")._1)
    assert(mm("stage1_bulk")._1 > 0.0, "keepers all have positive margin")
    // every (phase, shard) key is a p12 shard digit; deterministic rerun
    sched.foreach(r => assert("0123456789abcdef"
      .contains(r.getAs[String]("shard"))))
    val again = graft.operators.TextAnalysis.annealSchedule(docs).collect()
    assert(sched.map(_.toString).toSeq == again.map(_.toString).toSeq)
    assert(rows.nonEmpty)
  }
}

/** p14: per-source dataset card — the datasheet rollup. */
class DatasetCardSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("datasetCard (p14): counts reconcile with the per-doc signals " +
      "it rolls up") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val card = graft.operators.TextAnalysis.datasetCard(docs).collect()
    assert(card.map(_.getAs[Long]("n_docs")).sum == docs.count())
    card.foreach { r =>
      val (nd, nk, ng, ne, np) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_keep"), r.getAs[Long]("n_drop_gopher"),
        r.getAs[Long]("n_drop_empty"), r.getAs[Long]("n_drop_ppl"))
      assert(nk + ng + ne + np == nd, s"verdicts don't partition: $r")
      assert(r.getAs[Double]("keep_frac") ==
        nk.toDouble / nd.toDouble)
      assert(r.getAs[Long]("n_dup_docs") <= nd)
    }
    // quality mass reconciles against the audited per-doc t02 signal
    val qBySrc = graft.operators.TextAnalysis.qualityScore(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"),
        floor(col("quality") * 1000000.0).cast("long").as("qfp"))
      .groupBy("source").agg(sum(col("qfp")).as("s")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("s")).toMap
    card.foreach { r =>
      assert(r.getAs[Long]("quality_fp_sum") ==
        qBySrc(r.getAs[String]("source")))
    }
  }

  test("domainReweight (p19): the MW loop reproduces the same doubles " +
      "as a hand-run of the update, and upweights the redundant source") {
    import spark.implicits._
    // a: 4 tokens 1 distinct (ttr 0.25); b: 4 tokens 4 distinct (ttr 1.0)
    val docs = Seq(("a", "x x x x"), ("b", "p q r s"))
      .toDF("source", "text").withColumn("doc_id", lit(1L))
    val got = Sampling.domainReweight(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("ttr"), r.getAs[Double]("excess"),
          r.getAs[Double]("weight")))).toMap
    val meanTtr = ((0.0 + 0.25) + 1.0) / 2.0
    assert(got("a")._1 == 0.25 && got("b")._1 == 1.0)
    assert(got("a")._2 == meanTtr - 0.25 && got("b")._2 == 0.0)
    // replicate the exact op sequence: u = w·(1 + 0.5·excess),
    // s = source-ASC fold seeded 0.0, w = u/s — 4 rounds
    var wa = 1.0 / 2.0; var wb = 1.0 / 2.0
    val ea = meanTtr - 0.25
    for (_ <- 1 to 4) {
      val ua = wa * (1.0 + 0.5 * ea); val ub = wb * (1.0 + 0.5 * 0.0)
      val s = (0.0 + ua) + ub
      wa = ua / s; wb = ub / s
    }
    assert(got("a")._3 == wa && got("b")._3 == wb)
    assert(got("a")._3 > got("b")._3) // the redundant domain moved up
  }

  test("mixtureManifest (p20): rates recompute from the p19 weights, " +
      "and the keep counts match an independent JVM md5 replay") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val B = 12000.0
    val w = Sampling.domainReweight(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("weight")))).toMap
    val got = Sampling.mixtureManifest(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet == w.keySet)
    // independent replay: md5 prefix + whitespace token counts in JVM
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String = md.synchronized {
      md.reset()
      md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
    }
    val raw = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").length.toLong))
    for ((src, row) <- got) {
      val (nTok, weight) = w(src)
      val rate = math.min(1.0, (B * weight) / nTok.toDouble)
      assert(row.getAs[Double]("rate") == rate)
      val thr =
        if (rate >= 1.0) "g"
        else "%08x".format(math.floor(rate * 4294967296.0).toLong)
      assert(row.getAs[String]("threshold") == thr)
      val mine = raw.filter(_._2 == src)
      val kept = mine.filter { case (id, _, _) => key(id) < thr }
      assert(row.getAs[Long]("n_docs") == mine.length.toLong)
      assert(row.getAs[Long]("n_docs_kept") == kept.length.toLong)
      assert(row.getAs[Long]("tokens_kept") == kept.map(_._3).sum)
      assert(row.getAs[Long]("n_tokens") == mine.map(_._3).sum)
    }
  }
}

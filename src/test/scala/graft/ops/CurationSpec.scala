package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation operators: decontamination flags exactly the docs sharing
  * eval shingles, sampling is deterministic and rate-respecting,
  * mixture weights normalize the token budget.
  */
class CurationSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      // doc 0 is the eval doc (pred: doc_id % 20 == 0)
      (0L, "alpha beta gamma delta epsilon", "en", "src0", 30L),
      // shares the trigram "beta gamma delta" with doc 0 -> contaminated
      (1L, "zz beta gamma delta yy", "en", "src1", 22L),
      // shares nothing 3-gram-sized with doc 0 -> clean
      (2L, "one two three four five six", "fr", "src2", 27L),
      // too short for a trigram overlap with doc 0 -> clean
      (3L, "alpha beta something else entirely here", "zh", "src3", 39L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("contamination flags exactly the docs sharing an eval shingle, with counts") {
    import spark.implicits._
    val pred = col("doc_id") % 20 === 0
    val dirty = Curation.contamination(corpus, pred)
      .as[(Long, Long)].collect().toMap
    assert(dirty.keySet == Set(1L), s"got $dirty")
    assert(dirty(1L) == 1L) // exactly one shared trigram
    val clean = Curation.decontaminateApply(corpus, pred)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L)) // eval doc excluded, contaminated dropped
  }

  test("bloom decontamination: no false negatives; production bitmap agrees with exact") {
    import spark.implicits._
    val pred = col("doc_id") % 20 === 0
    // production-sized bitmap: the 1-shingle eval set sets 4 of 2^20
    // bits — FP probability ~(4/2^20)^4, so bloom == exact
    val big = Curation.bloomContamination(corpus, pred, mBits = 1 << 20)
      .as[(Long, Long, Long)].collect().toSet
    assert(big == Set((1L, 1L, 1L)), s"got $big")
    // adversarially tiny bitmap (64 bits): false positives are allowed,
    // false negatives are NOT — every exactly-contaminated doc must
    // stay flagged with bloom_hits >= exact_hits
    val tiny = Curation.bloomContamination(corpus, pred, mBits = 64)
      .as[(Long, Long, Long)].collect()
    val byDoc = tiny.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byDoc.contains(1L) && byDoc(1L)._1 >= 1L && byDoc(1L)._2 == 1L)
    assert(tiny.forall { case (_, bh, eh) => bh >= eh },
      "bloom must never undercount the exact overlap")
    // determinism: the same filter flags the same docs on a rerun
    val rerun = Curation.bloomContamination(corpus, pred, mBits = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(rerun == tiny.toSet)
  }

  test("sampling quantiles: exact-size bottom-k sample, partitioning-invariant, state laws") {
    import spark.implicits._
    val docs = (0 until 3000)
      .map(i => (i.toLong, ("w " * (10 + i % 90)).trim, if (i % 3 == 0) "en" else "zh"))
      .toDF("doc_id", "text", "lang")
    val a = Curation.sampleQuantiles(docs).orderBy("lang").collect().toSeq
    val b = Curation.sampleQuantiles(docs.repartition(17, col("doc_id")))
      .orderBy("lang").collect().toSeq
    assert(a == b, "sample (and its quantiles) must be partitioning-invariant")
    // sample size is exactly min(k, stratum size)
    assert(a.forall(_.getLong(1) == Curation.QuantileSampleK.toLong))
    val tiny = (0 until 5).map(i => (i.toLong, "a b c", "en")).toDF("doc_id", "text", "lang")
    assert(Curation.sampleQuantiles(tiny).head.getLong(1) == 5L)
    // state laws: collision keeps min payload; merge order never matters
    val s1 = new graft.plans.KmvSampleState(3)
    s1.add(7L, 10L); s1.add(7L, 4L); s1.add(7L, 9L)
    assert(s1.mins.get(7L) == 4L, "hash collision must keep the min payload")
    val xs = Seq(5L -> 50L, 1L -> 10L, 9L -> 90L, 3L -> 30L, 2L -> 20L)
    def fold(order: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val st = new graft.plans.KmvSampleState(3)
      order.foreach { case (h, v) => st.add(h, v) }
      import scala.jdk.CollectionConverters._
      st.mins.entrySet().iterator().asScala
        .map(e => (e.getKey: Long, e.getValue: Long)).toSeq
    }
    assert(fold(xs) == Seq(1L -> 10L, 2L -> 20L, 3L -> 30L))
    assert(fold(xs.reverse) == fold(xs))
    // plan shape: the sample aggregation must be ObjectHashAggregate
    // (map-side-combined bounded state), never the SortAggregate fallback
    import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Curation.sampleQuantiles(docs).queryExecution.executedPlan
      assert(plan.collect { case a: ObjectHashAggregateExec => a }.nonEmpty, plan.toString)
      assert(plan.collect { case a: SortAggregateExec => a }.isEmpty, plan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("stratified sampling is deterministic, stratum-rate-driven and re-runnable") {
    import spark.implicits._
    val docs = (0 until 2000)
      .map(i => (i.toLong, if (i % 4 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val a = Curation.sampleStratified(docs).select("doc_id").as[Long].collect().toSet
    val b = Curation.sampleStratified(docs).select("doc_id").as[Long].collect().toSet
    assert(a == b, "sampling must be bit-reproducible")
    val stats = Curation.sampleStats(docs)
      .select("lang", "n_total", "n_kept").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (enTot, enKept) = stats("en")
    val (zhTot, zhKept) = stats("zh")
    // en keeps ~25%, zh ~80% (binomial, wide tolerance)
    assert(math.abs(enKept.toDouble / enTot - 0.25) < 0.08, s"en rate ${enKept}/$enTot")
    assert(math.abs(zhKept.toDouble / zhTot - 0.80) < 0.08, s"zh rate ${zhKept}/$zhTot")
    // growing the corpus never flips an earlier decision (versioned corpora)
    val grown = (0 until 4000)
      .map(i => (i.toLong, if (i % 4 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val g = Curation.sampleStratified(grown).select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(g))
  }

  test("source caps: dominant sources squeezed to ~cap, small ones untouched, samples nested") {
    import spark.implicits._
    // srcBIG = 70% of the corpus, srcMID = 20%, srcTINY = 10%; cap 15%
    val docs = ((0 until 1400).map(i => (i.toLong, "srcBIG")) ++
      (2000 until 2400).map(i => (i.toLong, "srcMID")) ++
      (3000 until 3200).map(i => (i.toLong, "srcTINY")))
      .toDF("doc_id", "source")
    val stats = Curation.sourceCapStats(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // tiny source: under the cap, rate 10000, everything kept
    assert(stats("srcTINY") == ((200L, 1000L, 10000L, 200L)))
    // dominant source: rate = floor(cap_n*10000/n) = floor(300*10000/1400)
    assert(stats("srcBIG")._3 == 2142L, stats("srcBIG").toString)
    // achieved count tracks the cap (binomial around 300, wide tolerance)
    assert(math.abs(stats("srcBIG")._4 - 300L) < 60, stats("srcBIG").toString)
    assert(stats("srcMID")._3 == 7500L) // floor(300*10000/400)
    // applied corpus = exactly the stats' kept counts
    val kept = Curation.applySourceCaps(docs)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("srcBIG") == stats("srcBIG")._4 && kept("srcMID") == stats("srcMID")._4)
    // NESTED property: a grown dominant source only sheds — the new
    // kept set is a subset of the old one for the already-present docs
    val before = Curation.applySourceCaps(docs)
      .where($"source" === "srcBIG").select("doc_id").as[Long].collect().toSet
    val grownDocs = (docs.as[(Long, String)].collect() ++
      (10000 until 11000).map(i => (i.toLong, "srcBIG"))).toSeq.toDF("doc_id", "source")
    val after = Curation.applySourceCaps(grownDocs)
      .where($"source" === "srcBIG" && $"doc_id" < 2000).select("doc_id").as[Long].collect().toSet
    assert(after.subsetOf(before), "tightening rate must shed, never churn")
  }

  test("length quantiles match a brute-force sorted-rank replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (0 until 900).map { i =>
      val lang = Seq("en", "fr", "zh")(i % 3)
      val n = 1 + rnd.nextInt(120)
      (i.toLong, Seq.fill(n)("w").mkString(" "), lang)
    }
    val got = Curation.lengthQuantiles(docs.toDF("doc_id", "text", "lang"))
      .select("lang", "n_docs", "p25", "p50", "p75", "p95")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    docs.groupBy(_._3).foreach { case (lang, rows) =>
      val lens = rows.map(_._2.trim.split("\\s+").length.toLong).sorted
      def q(p: Int) = lens(((lens.length * p + 99) / 100 - 1).toInt)
      val r = got(lang)
      assert(r._2 == lens.length, s"n_docs $lang")
      assert((r._3, r._4, r._5, r._6) == ((q(25), q(50), q(75), q(95))), s"quantiles $lang")
    }
  }

  test("mixture weights: weight * share * k == 1 per stratum, shares sum to 1") {
    import spark.implicits._
    val out = Curation.mixtureWeights(corpus)
      .select("lang", "n_docs", "total_tokens", "actual_share", "weight")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(out.length == 3) // en, fr, zh
    val k = out.length
    assert(math.abs(out.map(_._4).sum - 1.0) < 0.001)
    out.foreach { case (lang, _, _, share, weight) =>
      assert(math.abs(weight * share * k - 1.0) < 0.01, s"$lang: w=$weight s=$share")
    }
  }

  test("temperature weights: tail boosted, head damped, isqrt power exact") {
    import spark.implicits._
    // skewed corpus: en 3 docs of 6 words, fr 1 doc of 2 words
    val skew = Seq(
      (0L, "a b c d e f", "en"), (1L, "g h i j k l", "en"),
      (2L, "m n o p q r", "en"), (3L, "s t", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = Curation.temperatureWeights(skew)
      .select("lang", "n_docs", "total_tokens", "actual_share", "temp_share", "boost")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val en = out("en"); val fr = out("fr")
    assert(en._3 == 18L && fr._3 == 2L)
    // exact isqrt replay: w_en = isqrt(18*10^4) = 424, w_fr = isqrt(2*10^4) = 141
    val (wEn, wFr) = (424.0, 141.0)
    assert(en._5 == math.rint(wEn / (wEn + wFr) * 1e4) / 1e4)
    assert(fr._5 == math.rint(wFr / (wEn + wFr) * 1e4) / 1e4)
    // α=0.5 flattens: the tail's sampled share rises above its raw share
    assert(fr._5 > fr._4 && en._5 < en._4)
    assert(fr._6 > 1.0 && en._6 < 1.0)
    // shares still sum to 1
    assert(math.abs(en._5 + fr._5 - 1.0) < 0.001)
    // deeper halving flattens harder (α=0.25 closer to uniform)
    val t2 = Curation.temperatureWeights(skew, alphaHalvings = 2)
      .select("lang", "temp_share").as[(String, Double)].collect().toMap
    assert(t2("fr") > fr._5 && t2("en") < en._5)
  }

  test("curation pipeline: first-failing stage attributed, all five verdicts reachable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // eval doc 0; every other doc designed to die at a specific stage:
    //  1 too short (quality), 2/3 exact dups (3 loses to 2),
    //  4 shares doc 0's trigram (contaminated), 5..N kept-or-sampled
    val good = "the quick brown fox jumps over a lazy dog of unusual size and in fine form today"
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa the of and in to a", "en"),
      (1L, "tiny", "en"),
      (2L, good + " one", "fr"),
      (3L, good + " one", "fr"),
      (4L, "zz alpha beta gamma yy the of and in to a b c d e f g h", "en")
    ) ++ (0 until 36).map(i => (101L + 2 * i, good + s" extra$i", "fr")) // odd ids: never eval
    val df = rows.toDF("doc_id", "text", "lang")
    val out = Curation.curationPipeline(df, c("doc_id") % 20 === 0, nShards = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(!out.contains(0L), "eval doc excluded")
    assert(out(1L)._1 == "quality")
    // 2 and 3 are identical; the canonical (min id) survives dedup
    assert(out(3L)._1 == "exact_dup" && out(2L)._1 != "exact_dup")
    assert(out(4L)._1 == "contaminated")
    val verdicts = out.values.map(_._1).toSet
    assert(verdicts.contains("kept") && verdicts.contains("sampled_out"),
      s"fr docs sample at the default rate: $verdicts")
    // shard only on kept; shard id in range
    out.values.foreach { case (v, s) =>
      if (v == "kept") assert(s >= 0 && s < 4) else assert(s == -1L)
    }
    // funnel totals agree with the per-doc verdicts
    val funnel = Curation.curationFunnel(df, c("doc_id") % 20 === 0, nShards = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel == out.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
  }

  test("sharding: a partition of the corpus, contiguous positions, reproducible") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"w$i", "en", s"src${i % 4}", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Curation.shardAssign(docs, nShards = 5)
      .as[(Long, String, Long, Long)].collect()
    assert(a.length == 200 && a.map(_._1).distinct.length == 200)
    assert(a.map(_._3).toSet.subsetOf((0L until 5L).toSet))
    // per-shard positions are exactly 1..n (the rank is gap-free)
    a.groupBy(_._3).foreach { case (shard, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq, s"shard $shard")
    }
    // bit-reproducible under a different input partitioning
    val b = Curation.shardAssign(docs.repartition(13), nShards = 5)
      .as[(Long, String, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // stats agree with the assignment
    val st = Curation.shardStats(docs, nShards = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(st.map(_._2).sum == 200L)
    st.foreach { case (_, n, nSrc, maxPos) =>
      assert(maxPos == n); assert(nSrc >= 1L && nSrc <= 4L)
    }
  }

  test("DSIR weights: target-like docs score high, brute-force LM replay matches") {
    import spark.implicits._
    // target stratum = 'en'. Docs 10/11 use the en vocabulary; 20/21 a
    // disjoint one; 30 mixes. The non-target doc written in the target's
    // vocabulary (12) must still score HIGH - DSIR scores text, not labels.
    val docs = Seq(
      (10L, "cat dog cat bird", "en"),
      (11L, "dog bird dog cat cat", "en"),
      (12L, "cat cat dog bird bird", "xx"),
      (20L, "wug zorp wug blick", "de"),
      (21L, "zorp blick zorp wug wug", "de"),
      (30L, "cat wug dog zorp", "fr")
    ).toDF("doc_id", "text", "lang")
    val w = Curation.dsirWeights(docs, col("lang") === "en")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap

    // brute-force replay of the add-one-smoothed log-ratio
    val toks = Seq(10L -> "cat dog cat bird", 11L -> "dog bird dog cat cat",
      12L -> "cat cat dog bird bird", 20L -> "wug zorp wug blick",
      21L -> "zorp blick zorp wug wug", 30L -> "cat wug dog zorp")
      .map { case (id, t) => id -> t.split("\\s+").toSeq }
    val tgtIds = Set(10L, 11L)
    val all = toks.flatMap(_._2)
    val tgt = toks.filter(t => tgtIds(t._1)).flatMap(_._2)
    val vocab = all.distinct
    val (ts, tt, v) = (all.size.toDouble, tgt.size.toDouble, vocab.size.toDouble)
    def lm(word: String) =
      (math.log(tgt.count(_ == word) + 1) - math.log(tt + v)) -
        (math.log(all.count(_ == word) + 1) - math.log(ts + v))
    toks.foreach { case (id, words) =>
      val brute = BigDecimal(words.map(lm).sum / words.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(w(id) - brute) < 1e-9, s"doc $id: got ${w(id)}, brute $brute")
    }
    // ordering: en-vocabulary docs (whatever their label) above disjoint ones
    assert(Seq(10L, 11L, 12L).map(w).min > Seq(20L, 21L).map(w).max)
    assert(w(30L) > Seq(20L, 21L).map(w).max) // mixed doc sits between
    assert(w(30L) < Seq(10L, 11L, 12L).map(w).min)
  }

  test("DSIR sample: top-share threshold with ties kept; window only over the histogram") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      val txt = if (i < 8) "cat dog bird cat" // the target-looking octet
                else if (i < 20) "cat wug dog zorp"
                else "wug zorp blick wug"
      (i.toLong, txt, if (i < 4) "en" else "other")
    }.toDF("doc_id", "text", "lang")
    val kept = Curation.dsirSample(docs, col("lang") === "en", keepBp = 2500)
      .select("doc_id").as[Long].collect().toSet
    // 25% of 40 = 10 docs; the 8-doc top weight class is strictly inside,
    // and the threshold lands ON the middle class - ALL of its 12 tied
    // docs are kept (ties at the cut are never split)
    assert((0L until 8L).toSet.subsetOf(kept), s"top class must be kept: $kept")
    assert(kept == (0L until 20L).toSet, s"tied middle class must be kept whole: $kept")

    // plan shape: every window in the plan runs AFTER an aggregation over
    // the bounded histogram, never over the corpus - the sort a window
    // needs appears only above the histogram's tiny frame
    val plan = Curation.dsirSample(docs, col("lang") === "en")
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(!w.child.output.exists(_.name == "doc_id"),
        s"window must run over the (logratio, count) histogram — a doc_id " +
          s"in its input means it sorts per-document rows:\n$w")
    }
  }
}

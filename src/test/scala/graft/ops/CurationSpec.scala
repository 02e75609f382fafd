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
}

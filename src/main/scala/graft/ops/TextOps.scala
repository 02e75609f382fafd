package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language id, quality scoring, token counting, fingerprinting.
  * All pure `functions._` expressions — codegen'd, no UDFs, fully
  * whole-stage-codegen friendly, scale linearly with no shuffle except
  * where a groupBy is the semantic (langid vote).
  */
object TextOps {

  /** Portable 56-bit content hash: identical in Spark and ANSI-ish SQL
    * engines (md5 hex prefix parsed as an integer), so oracles can
    * reproduce it: Spark `conv(substr(md5(x),1,14),16,10)` ==
    * DuckDB `('0x'||substr(md5(x),1,14))::BIGINT`. Used everywhere a
    * deterministic cross-engine hash is needed (minhash, simhash,
    * fingerprints) instead of Spark's murmur3 `hash()`.
    */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** Whitespace-token split of trimmed text. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Normalized text for fingerprinting: lowercase, collapsed spaces. */
  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Document fingerprint (exact-dup key): portable hash of the
    * normalized text.
    */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
      portableHash(normalized(col(textCol))).as("fingerprint"),
      length(normalized(col(textCol))).as("norm_len"))

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
      size(words(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("re_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Corpus vocabulary statistics: document frequency and term count
    * per word — the building block of df-based quality filters and
    * stopword inference at corpus scale (two map-side-combined
    * aggregations, no skew risk: word keys hash-spread).
    */
  def vocab(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), explode(words(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("term_count"))
      .orderBy(col("word"))

  /** Vocabulary coverage / OOV rate per stratum for a top-k frequency
    * vocabulary (the tokenizer-sizing question: "how much of the corpus
    * does a k-entry vocab cover?"). Ties at the cut break on the word
    * itself, so the vocabulary — and therefore every count — is
    * deterministic in any engine.
    *
    * Scale shape: the vocabulary is a global top-k
    * (TakeOrderedAndProject: per-partition partial top-k, k rows to the
    * driver) over one map-side-combined word count; the corpus is then
    * re-scanned once against the BROADCAST k-row vocab — corpus tokens
    * are never shuffled, and the final groupBy ships #strata partials.
    */
  def vocabCoverage(df: DataFrame, k: Int = 10,
      strataCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(k > 0)
    def toks = df.select(col(strataCol), explode(words(col(textCol))).as("w"))
    val vocabTop = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(k)
      .select(col("w"), lit(1L).as("__in"))
    toks.join(broadcast(vocabTop), Seq("w"), "left")
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("total_tok"),
        sum(coalesce(col("__in"), lit(0L))).as("covered_tok"))
      .withColumn("oov_tok", col("total_tok") - col("covered_tok"))
      .withColumn("coverage",
        round(col("covered_tok").cast("double") / col("total_tok"), 4))
  }

  /** Dataloader length bucketing: every document rounds UP to the
    * smallest power-of-two window holding its token count, and each
    * bucket reports the padding wasted if its docs are batched at the
    * bucket width — the fixed-shape-batch packing tradeoff, priced
    * from doc lengths alone. The bucket cap is computed in INTEGER
    * arithmetic (1L << bitlength(n-1), via the binary-string length —
    * no log2()/pow() float drift), so any engine replays it.
    * One map-side-combined groupBy over ≤ 64 bucket keys.
    */
  def lengthBuckets(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(size(words(col(textCol))).cast("long").as("__n"))
      .where(col("__n") > 0)
      .withColumn("bucket_cap",
        when(col("__n") === 1, lit(1L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), length(bin(__n - 1)))")))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tok"),
        sum(col("bucket_cap") - col("__n")).as("pad_tok"))
      .withColumn("waste",
        round(col("pad_tok").cast("double") /
          (col("pad_tok") + col("total_tok")), 4))
      .select(col("bucket_cap"), col("n_docs"), col("total_tok"),
        col("pad_tok"), col("waste"))

  /** Per-document top-k terms by TF-IDF — the salient-term extractor
    * (keyword labels, topic features, boilerplate triage) over the
    * corpus vocabulary.
    *
    * Scale shape: term counts and document frequencies are two
    * map-side-combined aggregations on hash-spread word keys (no skew);
    * the corpus size joins in as a broadcast single row; the top-k
    * window partitions by doc_id (bounded by one doc's distinct words,
    * never the corpus). Scores are ROUNDED to 4 decimals BEFORE ranking
    * so the (score desc, word) order — and therefore the result — is
    * identical in any IEEE engine regardless of last-ulp `ln`
    * differences.
    */
  def tfidfTop(df: DataFrame, k: Int = 3, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = df.select(col("doc_id"), explode(words(col(textCol))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tc"))
    val dfreq = tc.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("__n"))
    val scored = tc.join(dfreq, Seq("word"))
      .crossJoin(broadcast(total))
      .withColumn("score",
        round(col("tc") * log((col("__n") + 1).cast("double") / (col("df") + 1)), 4))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("word"), col("score"))
  }

  private val stopwords = Seq("the", "a", "of", "and", "in", "to")

  /** Quality scoring: length/stopword/word-shape heuristics, the
    * standard pre-training filter features.
    */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w)
    val stopHits = size(filter(w, x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    val meanLen = (length(regexp_replace(trim(col(textCol)), "\\s+", "")).cast("double")
      / nWords.cast("double"))
    df.select(
      col("doc_id"),
      nWords.as("n_words"),
      round(stopHits.cast("double") / nWords.cast("double"), 4).as("stop_ratio"),
      round(meanLen, 4).as("mean_word_len"),
      round(least(lit(1.0), nWords.cast("double") / lit(100.0)) *
        (lit(1.0) - stopHits.cast("double") / nWords.cast("double")), 4).as("quality"))
  }

  /** Language-marker table: distinctive high-frequency words per
    * language (n-gram-heuristic language id in its word-unigram form).
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of",
    "es" -> "el", "es" -> "los",
    "fr" -> "le", "fr" -> "les",
    "de" -> "der", "de" -> "das")

  /** Heuristic language id: explode words, join against the marker
    * dictionary (broadcast — tiny), vote per doc, argmax with
    * deterministic tie-break (marker count desc, then lang asc);
    * docs with no marker hits -> 'und'.
    */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val markers = langMarkers.toDF("lang_cand", "marker")
    val hits = df.select(col("doc_id"), explode(words(col(textCol))).as("w"))
      .join(broadcast(markers), col("w") === col("marker"))
      .groupBy(col("doc_id"), col("lang_cand"))
      .agg(count(lit(1)).as("hits"))
    // deterministic argmax: min_by on (-hits, lang) = most hits, ties to
    // the alphabetically first language
    val argmax = hits.groupBy(col("doc_id"))
      .agg(min_by(col("lang_cand"), struct((-col("hits")).as("nh"), col("lang_cand")))
        .as("pred_lang"))
    df.select(col("doc_id")).join(argmax, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("pred_lang"), lit("und")).as("pred_lang"))
  }

  /** Language-ID quality assessment: the confusion matrix of
    * [[langId]]'s prediction against a labeled `lang` column — the
    * standard curation-QA readout when a corpus carries upstream
    * language labels (how often the heuristic disagrees, and with
    * what). Output: (lang, pred_lang, n_docs), one map-side-combined
    * groupBy over doc-level rows — O(labels × languages) result rows
    * at any corpus size.
    */
  def langIdEval(df: DataFrame, textCol: String = "text",
      labelCol: String = "lang"): DataFrame =
    langId(df, textCol)
      .join(df.select(col("doc_id"), col(labelCol)), Seq("doc_id"))
      .groupBy(col(labelCol), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Repetition signals (the Gopher-rules repetition family): fraction
    * of duplicated words, and the corpus-filter staples "most frequent
    * word share" / "most frequent bigram share" per document.
    *
    * Scale shape: ZERO shuffle. A per-document metric must never cost a
    * `groupBy(doc_id, token)` over the exploded corpus (that shuffles
    * the full token stream — many times the corpus size). Instead the
    * top-term count is computed inside the row: sort the token array,
    * then the longest run of equal adjacent elements IS the max
    * frequency (`aggregate` over the sorted array). The whole operator
    * is a projection — it pipelines with the scan at any scale.
    */
  // longest run of equal adjacent elements of a (sorted) string array =
  // the max element frequency, computed inside the row
  private def maxRun(arrSql: String): String =
    s"""aggregate(sort_array($arrSql),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run',  IF(x <=> acc.prev, acc.run + 1L, 1L),
       |    'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))),
       |  acc -> acc.best)""".stripMargin

  def repetition(df: DataFrame, textCol: String = "text"): DataFrame = {
    val bigrams =
      "zip_with(slice(__ws, 1, size(__ws) - 1), slice(__ws, 2, size(__ws) - 1)," +
        " (a, b) -> concat(a, ' ', b))"
    df.select(col("doc_id"), words(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        size(array_distinct(col("__ws"))).cast("long").as("__nd"),
        expr(maxRun("__ws")).as("__mw"),
        expr(maxRun(bigrams)).as("__mb"))
      .select(col("doc_id"), col("n_words"),
        when(col("n_words") === 0, lit(0.0)).otherwise(round(
          (col("n_words") - col("__nd")).cast("double") / col("n_words"), 4))
          .as("dup_word_frac"),
        when(col("n_words") === 0, lit(0.0)).otherwise(round(
          col("__mw").cast("double") / col("n_words"), 4)).as("top_word_frac"),
        when(col("n_words") < 2, lit(0.0)).otherwise(round(
          col("__mb").cast("double") / (col("n_words") - 1), 4))
          .as("top_bigram_frac"))
  }

  /** Gopher/C4-family rule thresholds for [[qualityFilter]] — all
    * integer-arithmetic comparisons (never a float threshold), so the
    * SQL oracles replay every verdict bit-for-bit. A rule fires =
    * the document is REJECTED by it.
    *
    *   - too_short / too_long: word-count bounds;
    *   - low_stop: stopword ratio under 2% (stop_hits * 50 < n) — the
    *     Gopher "no function words" signal;
    *   - rep_top_word: most frequent word >= 20% of the doc (mw*5 >= n);
    *   - dup_words: >= 70% of tokens are repeats ((n-nd)*10 >= 7n);
    *   - word_shape: mean non-space word length outside [2, 8] chars
    *     (nns < 2n or nns > 8n) — the symbol-soup / no-spaces signal.
    */
  val QualityMinWords = 15
  val QualityMaxWords = 90

  /** Rule-based quality filter — the C4/Gopher curation step that turns
    * the [[qualityScore]] / [[repetition]] SIGNALS into per-document
    * keep/reject VERDICTS with per-rule attribution (a production
    * pipeline tunes thresholds off exactly this breakdown).
    *
    * Scale shape: every signal and every verdict is computed inside the
    * row (array expressions over the token array — no explode, no
    * shuffle, no UDF); the operator is a pure projection that pipelines
    * with the scan, so filtering 100 TB costs one pass.
    */
  def qualityFilter(df: DataFrame, textCol: String = "text"): DataFrame = {
    val sig = df
      .select(col("doc_id"), words(col(textCol)).as("__ws"),
        length(regexp_replace(trim(col(textCol)), "\\s+", "")).cast("long").as("__nns"))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        size(array_distinct(col("__ws"))).cast("long").as("__nd"),
        size(filter(col("__ws"),
          x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*))).cast("long").as("__sh"),
        expr(maxRun("__ws")).as("__mw"),
        col("__nns"))
    sig.select(col("doc_id"), col("n_words"),
        (col("n_words") < QualityMinWords).as("too_short"),
        (col("n_words") > QualityMaxWords).as("too_long"),
        (col("__sh") * 50 < col("n_words")).as("low_stop"),
        (col("__mw") * 5 >= col("n_words")).as("rep_top_word"),
        ((col("n_words") - col("__nd")) * 10 >= col("n_words") * 7).as("dup_words"),
        (col("__nns") < col("n_words") * 2 || col("__nns") > col("n_words") * 8)
          .as("word_shape"))
      .withColumn("kept",
        !col("too_short") && !col("too_long") && !col("low_stop") &&
          !col("rep_top_word") && !col("dup_words") && !col("word_shape"))
  }

  /** Per-rule rejection report: one row per rule with its reject count,
    * plus the kept total — one map-side-combined aggregation over the
    * verdict projection (rules overlap, so the counts need not sum to
    * the rejected total).
    */
  def qualityFilterStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val v = qualityFilter(df, textCol)
    val rules = Seq("too_short", "too_long", "low_stop", "rep_top_word",
      "dup_words", "word_shape", "kept")
    val agg = v.agg(
      sum(col(rules.head).cast("long")).as(rules.head),
      rules.tail.map(r => sum(col(r).cast("long")).as(r)): _*)
    agg.select(explode(map(
      rules.flatMap(r => Seq(lit(r), col(r))): _*)).as(Seq("rule", "n_docs")))
  }

  /** Corpus-fit unigram language-model scoring — the CCNet-style LM
    * quality filter with the model trained on the corpus itself:
    * p(w) = term_count(w) / total_tokens; per-doc score = mean natural
    * log-probability over the doc's tokens (higher = more
    * corpus-typical — the perplexity filter thresholds exactly this
    * quantity, and junk/boilerplate-shuffled docs sit in the tails).
    *
    * Scale shape: two corpus passes, inherent to LM filtering (train,
    * then score) — each is ONE map-side-combined aggregation. The
    * (doc, word) counts partial-aggregate before their shuffle
    * (shuffle volume = distinct pairs, not the token stream); term
    * frequencies reduce by word (a stopword in every doc is one
    * reducer key with a combined count). The scoring join is a hash
    * equi-join on word keys — no broadcast of a corpus-scale
    * vocabulary, skew-free because each doc contributes one row per
    * DISTINCT word. The total-token count is a 1-row broadcast.
    */
  def unigramLogProb(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tok = df.select(col("doc_id"), explode(words(col(textCol))).as("word"))
    val dc = tok.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val freq = tok.groupBy(col("word")).agg(count(lit(1)).as("n"))
    // total tokens WITHOUT a third explode pass: a map-only projection
    // (size of the token array per row) + scalar partial aggregation
    val tot = df.agg(sum(size(words(col(textCol))).cast("long")).as("t"))
    dc.join(freq, Seq("word"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        round(sum(col("c").cast("double") *
            (log(col("n").cast("double")) - log(col("t").cast("double"))))
          / sum(col("c")).cast("double"), 4).as("mean_logprob"))
  }

  /** CCNet-style LM-quality BUCKETING: the head/middle/tail split over
    * the [[unigramLogProb]] score, per language — the step that routes
    * a corpus into quality tiers for sampling weights. Buckets are
    * assigned by THRESHOLD, not per-doc ntile: bucket(s) =
    * ceil(nBuckets × |{docs with score ≥ s}| / n), so ties share a
    * bucket, the rule is integer-exact, and the SQL oracle replays it
    * bit-for-bit (CCNet's own cutoffs are score thresholds too).
    *
    * Scale shape: scoring is [[unigramLogProb]]'s two map-side-combined
    * passes; bucketing then runs entirely on the (lang, rounded-score)
    * HISTOGRAM — ≤ O(10^5) rows per language at ANY corpus size, so
    * the rank window never sorts the corpus (the same bounded-domain
    * discipline as `Curation.lengthQuantiles`). Output is one row per
    * (lang, bucket).
    */
  def lmBuckets(df: DataFrame, nBuckets: Int = 3,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(df, textCol)
      .join(df.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("lang"), col("mean_logprob").as("score"))
    val hist = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("score").desc)
    val tot = hist.groupBy(col("lang")).agg(sum(col("__c")).as("__n"))
    hist.withColumn("__cum", sum(col("__c")).over(w))
      .join(tot, Seq("lang"))
      .withColumn("bucket",
        expr(s"(__cum * $nBuckets + __n - 1) div __n").cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(sum(col("__c")).as("n_docs"),
        min(col("score")).as("lo"), max(col("score")).as("hi"))
  }

  /** SEGMENT-level duplication profile — the boilerplate detector
    * (CCNet-style paragraph dedup re-expressed over token windows,
    * since the corpus's text is a single token stream): each doc is
    * chunked into NON-overlapping `segTokens`-token segments, each
    * segment carries the portable hash of its token window, and a
    * segment counts as duplicated iff its hash occurs in at least two
    * distinct documents. Output per doc: distinct segments, duplicated
    * segments, duplication ratio. Docs shorter than one full segment
    * are excluded (no complete window to judge).
    *
    * Scale shape: one row per DISTINCT (doc, segment-hash) — the
    * within-doc distinct happens before any aggregation, so the
    * frequency groupBy is a plain `count(*)` on hash keys (map-side
    * combined, no count-distinct Expand, skew-free: a boilerplate
    * segment shared by millions of docs is still one reducer key with
    * a combined count). The frequency join is hash-co-partitioned with
    * the segment rows. No corpus-wide sort, nothing quadratic.
    */
  def segmentDupStats(df: DataFrame, segTokens: Int = 16,
      textCol: String = "text"): DataFrame = {
    val segs = df.select(col("doc_id"), words(col(textCol)).as("__ws"))
      .where(size(col("__ws")) >= segTokens)
      .select(col("doc_id"),
        explode(sequence(lit(0), (size(col("__ws")) / segTokens).cast("int") - 1)).as("__i"),
        col("__ws"))
      .select(col("doc_id"),
        portableHash(concat_ws(" ",
          slice(col("__ws"), col("__i") * segTokens + 1, lit(segTokens)))).as("__sh"))
      .distinct()
    val freq = segs.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
    segs.join(freq, Seq("__sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup_segs"))
      .withColumn("dup_ratio",
        round(col("n_dup_segs").cast("double") / col("n_segs"), 4))
  }

  /** SEGMENT-level dedup APPLY — the boilerplate REMOVAL op
    * ([[segmentDupStats]] is the readout; this is the CCNet-style
    * paragraph-dedup rewrite itself, over non-overlapping
    * `segTokens`-token windows since the corpus text is a single token
    * stream): every occurrence of a segment except the globally first
    * one (smallest (doc_id, segment index)) is cut from its document,
    * and each document is re-assembled from its surviving segments in
    * order. The trailing partial window is a segment like any other —
    * it dedups by its own content hash.
    *
    * Scale shape: the dedup DECISION moves only one (hash, doc_id,
    * idx) triple per segment — the first-occurrence choice is a
    * map-side-combined `min(struct(doc_id, idx))` per hash, and the
    * verdict join is hash-co-partitioned; the document text never
    * enters that pipeline. What joins back to the corpus is the
    * REMOVED-index set per affected doc — empty for every document
    * with no duplicated window, so after upstream exact dedup it is
    * usually small enough to broadcast (AQE picks that up), and in the
    * worst case it is one doc_id-keyed join that plans exchange-free
    * over the engine's doc_id-bucketed layout (DSv2 storage-partitioned
    * join). Re-assembly is an in-row array expression over the doc's
    * own token array — the corpus is never re-sorted or re-written
    * through a shuffle.
    */
  def segmentDedupApply(df: DataFrame, segTokens: Int = 16,
      textCol: String = "text"): DataFrame = {
    val st = segTokens
    val base = df.select(col("doc_id"), words(col(textCol)).as("__ws"))
      .where(size(col("__ws")) > 0)
    val segs = base.select(col("doc_id"),
        explode(sequence(lit(0),
          ((size(col("__ws")) + (st - 1)) / st).cast("int") - 1)).as("__i"),
        col("__ws"))
      .select(col("doc_id"), col("__i"),
        portableHash(concat_ws(" ",
          slice(col("__ws"), col("__i") * st + 1, lit(st)))).as("__h"))
    val first = segs.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("__i"))).as("__f"))
    val removed = segs.join(first, Seq("__h"))
      .where(struct(col("doc_id"), col("__i")) =!= col("__f"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("__i")).as("__rm"))
    base
      .withColumn("n_segs",
        ((size(col("__ws")) + (st - 1)) / st).cast("long"))
      .join(removed, Seq("doc_id"), "left")
      .withColumn("__keep",
        filter(sequence(lit(0), col("n_segs").cast("int") - 1),
          i => coalesce(!array_contains(col("__rm"), i), lit(true))))
      .select(col("doc_id"), col("n_segs"),
        size(col("__keep")).cast("long").as("n_kept_segs"),
        concat_ws(" ", flatten(transform(col("__keep"),
          i => slice(col("__ws"), i * st + 1, lit(st))))).as("__out"))
      .select(col("doc_id"), col("n_segs"), col("n_kept_segs"),
        when(length(col("__out")) === 0, lit(0L))
          .otherwise(size(split(col("__out"), " ")).cast("long")).as("out_words"),
        when(length(col("__out")) === 0, lit(0L))
          .otherwise(portableHash(col("__out"))).as("out_fp"))
  }

  /** EXACT SUBSTRING dedup over OVERLAPPING stride-1 windows — the
    * span-removal analog of "Deduplicating Training Data Makes
    * Language Models Better" (Lee et al. 2022, suffix-array ExactSubstr
    * at 50-token granularity), re-expressed as a dataflow: every
    * `winTokens`-token window at every position carries its content
    * hash; the globally FIRST occurrence of each window content
    * (smallest (doc_id, position)) is the owner; every position covered
    * by any NON-first duplicated window occurrence is cut, and each doc
    * is rebuilt from its surviving positions in order. Unlike
    * [[segmentDedupApply]]'s fixed grid, a duplicated span is caught at
    * ANY alignment — the property the paper's suffix array buys; the
    * price is one decision row per position instead of per segment
    * (factor `winTokens` more, inherent to stride 1, and still only
    * (hash, doc, pos) triples — the text never rides the shuffle).
    * Self-overlapping repetition (e.g. an n-token run of one word)
    * dedups against its own prefix window, so within-doc boilerplate
    * collapses too. Docs shorter than one window pass through intact.
    *
    * Scale shape: the first-occurrence choice is one map-side-combined
    * `min(struct(doc_id, pos))` per hash; the verdict join is
    * hash-co-partitioned; what returns to the corpus is the per-doc
    * removed-position set (empty for clean docs, broadcastable after
    * upstream exact dedup). Span reconstruction is an in-row array
    * expression over the doc's own tokens — no corpus sort, nothing
    * quadratic.
    */
  def substringDedupApply(df: DataFrame, winTokens: Int = 16,
      textCol: String = "text"): DataFrame = {
    val L = winTokens
    val base = df.select(col("doc_id"), words(col(textCol)).as("__ws"))
      .where(size(col("__ws")) > 0)
    val wins = base.where(size(col("__ws")) >= L)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("__ws")) - L)).as("__i"),
        col("__ws"))
      .select(col("doc_id"), col("__i"),
        portableHash(concat_ws(" ",
          slice(col("__ws"), col("__i") + 1, lit(L)))).as("__h"))
    val first = wins.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("__i"))).as("__f"))
    val removed = wins.join(first, Seq("__h"))
      .where(struct(col("doc_id"), col("__i")) =!= col("__f"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("__i")).as("__rm"),
        count(lit(1)).as("__ndw"))
    base
      .join(removed, Seq("doc_id"), "left")
      .withColumn("__keep",
        filter(sequence(lit(0), size(col("__ws")) - 1),
          p => col("__rm").isNull ||
            !exists(col("__rm"), s => s <= p && p < s + L)))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_words"),
        coalesce(col("__ndw"), lit(0L)).as("n_dup_windows"),
        size(col("__keep")).cast("long").as("n_kept_words"),
        when(size(col("__keep")) === 0, lit(0L))
          .otherwise(portableHash(concat_ws(" ",
            transform(col("__keep"),
              p => element_at(col("__ws"), p + 1))))).as("out_fp"))
  }
}

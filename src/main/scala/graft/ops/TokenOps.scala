package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps.{portableHash, words}

/** Tokenizer-construction operators over token sequences: the
  * adjacent-pair statistics a BPE trainer iterates on, a single merge
  * round applied corpus-wide, and integer-exact collocation mining.
  *
  * All sequence work happens INSIDE the row (`zip_with`/`transform`
  * higher-order expressions — codegen'd, no UDFs); only (pair, count)
  * frames ever shuffle, so at 100 TB the shuffled bytes are the
  * distinct-pair vocabulary, never documents. Top-k selection is an
  * `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject (per
  * partition heap + driver merge of k rows), not a global sort.
  */
object TokenOps {

  /** Adjacent token pairs of one document, as (a, b) structs — the
    * unit of BPE merge counting. Empty for docs with < 2 tokens
    * (`slice` with length 0).
    */
  private def adjacentPairs(ws: Column): Column = {
    val m = greatest(size(ws) - 1, lit(0))
    zip_with(slice(ws, lit(1), m), slice(ws, lit(2), m),
      (x, y) => struct(x.as("a"), y.as("b")))
  }

  /** Top-k adjacent-pair frequencies — the merge-candidate table of one
    * BPE training round (reference analog: the tokenized-sequences
    * payload the CDC feed carries; here derived from `text` the same
    * way tokenCounts segments it).
    *
    * Ties break on (tok_a, tok_b) so the result is deterministic under
    * any partitioning and replays bit-for-bit in ANSI SQL.
    */
  def pairCounts(df: DataFrame, k: Int = 50, textCol: String = "text"): DataFrame = {
    val counted = df
      .select(explode(adjacentPairs(words(col(textCol)))).as("p"))
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n"))
    val top = counted.orderBy(col("n").desc, col("tok_a"), col("tok_b")).limit(k)
    // rank materialized over the k surviving rows only (single tiny task)
    val w = Window.orderBy(col("n").desc, col("tok_a"), col("tok_b"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select("rnk", "tok_a", "tok_b", "n")
  }

  /** The corpus's most frequent adjacent pair with tok_a != tok_b —
    * the pair one BPE merge round would fuse. The a != b restriction
    * makes the merge overlap-free (an (a,a) run needs left-to-right
    * greedy tie-breaking; with a != b no position can both end one
    * match and start another), so applying it is embarrassingly
    * parallel per row. One row; broadcast by the callers.
    */
  private def topMergePair(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(adjacentPairs(words(col(textCol)))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b")).limit(1)
      .select(col("a"), col("b"))

  /** One BPE merge round applied corpus-wide: every occurrence of the
    * top (a, b) pair fuses into the single token "a_b". The rewrite is
    * one indexed `transform` + `filter` inside the row — position i
    * becomes the fused token when (ws[i], ws[i+1]) = (a, b), is dropped
    * when (ws[i-1], ws[i]) = (a, b), else survives — and the 1-row pair
    * table broadcasts, so the corpus never shuffles. `out_fp` is an
    * order-sensitive fingerprint of the rewritten sequence (layout
    * equality, same discipline as pack_emit).
    *
    * `get` (0-based, null past either end) keeps boundary probes
    * null-safe under ANSI mode: a null condition falls through the
    * CASE, which is exactly the "no neighbour, no match" semantic.
    */
  /** The merge rewrite itself: fuse every (a, b) occurrence of `ws`
    * into "a_b" — one indexed `transform` + `filter`, fully inside the
    * row (see [[bpeMergeApply]] for the overlap-freedom argument).
    */
  private def mergeRewrite(ws: Column, a: Column = col("a"),
      b: Column = col("b")): Column = filter(
    transform(ws, (t, i) =>
      when(t === a && get(ws, i + 1) === b, concat(a, lit("_"), b))
        .when(get(ws, i - 1) === a && t === b,
          lit(null).cast("string"))
        .otherwise(t)),
    x => x.isNotNull)

  def bpeMergeApply(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val n = size(ws)
    val merged = mergeRewrite(ws)
    // LEFT join on true, not crossJoin: a corpus with no a != b pair at
    // all (single-token docs, pure "x x x" runs) must come back intact
    // with zero merges and null pair columns, never vanish (an inner
    // cross join against the then-empty 1-row frame would drop every
    // doc). Null a/b make both match branches null -> every token takes
    // the otherwise(t) arm, so merged == ws by the same CASE semantics
    // the SQL oracle replays.
    df.join(broadcast(topMergePair(df, textCol)), lit(true), "left")
      .select(col("doc_id"),
        col("a").as("tok_a"), col("b").as("tok_b"),
        n.cast("long").as("n_before"),
        size(merged).cast("long").as("n_after"),
        (n - size(merged)).cast("long").as("n_merges"),
        // null-text parity: concat_ws never returns null in Spark while
        // array_to_string(NULL) is NULL in ANSI engines — emit null
        // explicitly so both sides agree on token-less rows
        when(ws.isNull, lit(null).cast("long"))
          .otherwise(portableHash(concat_ws(" ", merged))).as("out_fp"))
      .orderBy("doc_id")
  }

  /** The full BPE trainer loop for `rounds` rounds: each round counts
    * adjacent pairs, picks the arg-max (a != b, ties on (a, b)), and
    * rewrites the whole corpus — then trains the NEXT round on the
    * rewritten corpus, exactly the iteration a real tokenizer trainer
    * runs. One metrics row per round: the chosen pair, total merges,
    * corpus token count after, and an order-sensitive corpus
    * fingerprint (sum of per-doc sequence hashes mod 10^12 — int64-safe
    * and ANSI-replayable, the cdc_ivm_agg discipline).
    *
    * Scale shape per round (the only sound one at 100 TB): the pair
    * count shuffles vocab²-bounded partials (map-side combined), the
    * arg-max is TakeOrdered(1), the rewrite broadcasts the 1-row pair
    * and runs inside the row, and the corpus stats are one
    * map-side-combined global aggregate. The corpus never shuffles in
    * any round; the driver-side loop is inherent to BPE (round r+1's
    * counts depend on round r's rewrite), and each iteration leaves
    * the heavy frame distributed. Each round's rewritten corpus is
    * cached (two consumers: the stats row and the next round's counts)
    * and unpersisted when its successor lands.
    */
  def bpeTrainRounds(df: DataFrame, rounds: Int = 3,
                     textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    var cur = df.select(col("doc_id"), words(col(textCol)).as("ws"))
    // caches still backing `cur` (released once the next round's frame
    // is materialized)
    var live: Seq[DataFrame] = Nil
    // rounds are EAGER: round r+1's counts depend on round r's rewrite,
    // so each stats row materializes (populating that round's cache for
    // the next round's consumers) before the loop advances — `rounds`
    // driver-side rows total, every cache released deterministically,
    // and the returned frame is a local relation (re-running the query
    // never re-trains).
    val stats = (1 to rounds).map { r =>
      // two consumers per round (pair count + rewrite) -> cache the input
      val c = cur.cache()
      val top = c.select(explode(adjacentPairs(col("ws"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .where(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(1)
        .select(col("a"), col("b"))
      // LEFT join on true (degenerate-corpus contract of bpeMergeApply)
      val next = c.join(broadcast(top), lit(true), "left")
        .select(col("doc_id"), size(col("ws")).as("n0"),
          mergeRewrite(col("ws")).as("ws"), col("a"), col("b"))
        .cache()
      val row = next.agg(
        max(col("a")).as("tok_a"), max(col("b")).as("tok_b"),
        sum((col("n0") - size(col("ws"))).cast("long")).cast("long").as("n_merges"),
        sum(size(col("ws")).cast("long")).cast("long").as("corpus_tokens"),
        sum(when(col("ws").isNull, lit(null).cast("long"))
          .otherwise(pmod(portableHash(concat_ws(" ", col("ws"))),
            lit(1000000000000L)))).cast("long").as("corpus_fp"))
        .head() // materializes `next`; its upstreams are now releasable
      (live :+ c).foreach(_.unpersist())
      live = Seq(next)
      cur = next.select(col("doc_id"), col("ws"))
      org.apache.spark.sql.Row(r.toLong, row.getString(0), row.getString(1),
        row.get(2), row.get(3), row.get(4))
    }
    live.foreach(_.unpersist())
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("round", LongType, nullable = false),
      StructField("tok_a", StringType), StructField("tok_b", StringType),
      StructField("n_merges", LongType), StructField("corpus_tokens", LongType),
      StructField("corpus_fp", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(stats, 1), schema)
      .orderBy(col("round"))
  }

  /** Tokenizer APPLY — the inference half of [[bpeTrainRounds]]: learn
    * `rounds` merges on the TRAIN corpus, then encode the held-out EVAL
    * corpus by replaying the learned merges in rank order. This is the
    * split a production tokenizer pipeline runs — train once on the
    * corpus, apply everywhere (the stage that produced the reference
    * feed's pre-tokenized `tokens` arrays upstream).
    *
    * Scale shape: training is the [[bpeTrainRounds]] loop (pair counts
    * shuffle vocab²-bounded partials, the arg-max is TakeOrdered(1),
    * the train corpus never shuffles); the learned merge list is
    * O(rounds) driver state — the k-means-centroid/broadcast-dict
    * pattern — so ENCODING compiles to a single per-row projection
    * with the merge pairs baked in as literals: ZERO exchange over the
    * eval corpus, embarrassingly parallel at any scale. Training stops
    * early when a round finds no a != b pair (every later round would
    * be an identity rewrite by the same argument as [[bpeMergeApply]]'s
    * degenerate contract).
    */
  /** The trainer loop's driver state: the learned merge pairs in rank
    * order (early-stop when no a != b pair remains — later rounds are
    * identities). O(1)-row driver collects per round (model state, the
    * k-means-centroid class); the corpus stays distributed and never
    * shuffles in any round.
    */
  def learnMerges(train: DataFrame, rounds: Int = 3,
      textCol: String = "text"): Seq[(String, String)] = {
    var cur = train.select(words(col(textCol)).as("ws"))
    var live: Seq[DataFrame] = Nil
    val learned = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    (1 to rounds).foreach { _ =>
      if (!done) {
        val c = cur.cache()
        // O(1)-row driver collect: the round's arg-max pair (model
        // state, same class as k-means centroids)
        val top = c.select(explode(adjacentPairs(col("ws"))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .where(col("a") =!= col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("a"), col("b")).limit(1)
          .collect().headOption.map(r => (r.getString(0), r.getString(1)))
        top match {
          case None =>
            done = true // no mergeable pair: all later rounds are identities
            (live :+ c).foreach(_.unpersist())
            live = Nil
          case Some((a, b)) =>
            learned += ((a, b))
            val next = c
              .select(mergeRewrite(col("ws"), lit(a), lit(b)).as("ws"))
              .cache()
            next.count() // materialize before releasing the round's input
            (live :+ c).foreach(_.unpersist())
            live = Seq(next)
            cur = next
        }
      }
    }
    live.foreach(_.unpersist())
    learned.toSeq
  }

  def bpeEncode(train: DataFrame, evalDf: DataFrame, rounds: Int = 3,
                textCol: String = "text"): DataFrame = {
    val learned = learnMerges(train, rounds, textCol)
    // encode: replay the learned merges over the eval rows in rank
    // order, entirely inside the row (literal pairs — no join, no
    // shuffle). One Project STAGE per merge, never one nested
    // expression: mergeRewrite probes its input array three times per
    // element, so nesting round r's output expression into round r+1
    // would re-evaluate the whole prior chain per element probe —
    // O(3^rounds · len²) interpreted work per row. Staged through a
    // column reference, each round evaluates once per row
    // (CollapseProject keeps the stages apart: the referenced alias is
    // non-cheap and consumed three times).
    val ws0 = words(col(textCol))
    val staged = learned.foldLeft(
      evalDf.select(col("doc_id"), ws0.as("__raw"), ws0.as("__ws"))) {
      case (df, (a, b)) =>
        df.withColumn("__ws", mergeRewrite(col("__ws"), lit(a), lit(b)))
    }
    staged.select(col("doc_id"),
      size(col("__raw")).cast("long").as("n_raw"),
      size(col("__ws")).cast("long").as("n_tok"),
      when(col("__raw").isNull, lit(null).cast("long"))
        .otherwise(portableHash(concat_ws(" ", col("__ws")))).as("out_fp"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer DECODE parity: encode the eval split with the learned
    * merges, then invert them in REVERSE rank order — each merged
    * token "a_b" expands back to [a, b] (one flatten(transform) stage
    * per merge, inside the row) — and report whether the decoded
    * sequence equals the original, with a fingerprint of the decoded
    * text so the equality is value-anchored, not just boolean. The
    * inverse is exact whenever base tokens don't collide with a
    * merge's literal spelling; a collision flips `roundtrip_ok`
    * identically in any engine (the oracle replays the same CASE), so
    * the check stays deterministic either way.
    */
  def bpeRoundtrip(train: DataFrame, evalDf: DataFrame, rounds: Int = 3,
      textCol: String = "text"): DataFrame = {
    val learned = learnMerges(train, rounds, textCol)
    val ws0 = words(col(textCol))
    val enc = learned.foldLeft(
      evalDf.select(col("doc_id"), ws0.as("__raw"), ws0.as("__ws"))) {
      case (df, (a, b)) =>
        df.withColumn("__ws", mergeRewrite(col("__ws"), lit(a), lit(b)))
    }
    val dec = learned.reverse.foldLeft(enc.withColumn("__dec", col("__ws"))) {
      case (df, (a, b)) =>
        df.withColumn("__dec", flatten(transform(col("__dec"), t =>
          when(t === lit(s"${a}_$b"), array(lit(a), lit(b)))
            .otherwise(array(t)))))
    }
    dec.select(col("doc_id"),
      size(col("__raw")).cast("long").as("n_raw"),
      size(col("__ws")).cast("long").as("n_tok"),
      size(col("__dec")).cast("long").as("n_dec"),
      (col("__dec") === col("__raw")).as("roundtrip_ok"),
      when(col("__raw").isNull, lit(null).cast("long"))
        .otherwise(portableHash(concat_ws(" ", col("__dec")))).as("dec_fp"))
      .orderBy(col("doc_id"))
  }

  /** Collocation mining: PMI-style lift per adjacent pair, computed in
    * INTEGER arithmetic so any ANSI engine replays it bit-for-bit (no
    * cross-engine `ln()` last-ulp drift):
    *
    *   lift_bp = floor(100 * n_ab * T / (n_a * n_b))
    *
    * (100 = centi-lift scale; lift 1.0 == independence == 100.)
    * Intermediates run in decimal(38,0) — `n_ab * T * 100` overflows
    * int64 past ~10^8-token corpora and this operator is sized for
    * 10^12.
    *
    * Scale shape: unigram and pair counts are two map-side-combined
    * aggregations on hash-spread token keys; the pair table joins the
    * vocab-sized unigram table twice on those same keys (plain hash
    * joins, skew-free); the corpus total is a 1-row broadcast; top-k is
    * TakeOrdered. Documents shuffle never.
    */
  def collocationLift(df: DataFrame, k: Int = 40, minPair: Long = 5,
                      textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    // vocab-bounded; cached because three frames hang off it (the total
    // and both marginal joins) — without the cache each reference
    // re-runs the corpus explode+aggregate (same discipline as the
    // shingle cache in Dedup)
    val uni = df.select(explode(ws).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt")).cache()
    val tot = uni.agg(sum(col("cnt")).cast("long").as("t"))
    val pairs = df.select(explode(adjacentPairs(ws)).as("p"))
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPair)
    val scored = pairs
      .join(uni.select(col("tok").as("tok_a"), col("cnt").as("n_a")), Seq("tok_a"))
      .join(uni.select(col("tok").as("tok_b"), col("cnt").as("n_b")), Seq("tok_b"))
      .crossJoin(broadcast(tot))
      .withColumn("lift_bp", expr(
        "CAST((CAST(n_ab AS DECIMAL(38,0)) * t * 100) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
    val top = scored.orderBy(col("lift_bp").desc, col("tok_a"), col("tok_b")).limit(k)
    val w = Window.orderBy(col("lift_bp").desc, col("tok_a"), col("tok_b"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select("rnk", "tok_a", "tok_b", "n_ab", "n_a", "n_b", "lift_bp")
  }
}

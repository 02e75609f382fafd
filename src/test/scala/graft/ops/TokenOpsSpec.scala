package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Tokenizer-construction ops: BPE pair counting, one merge round,
  * integer-exact collocation lift — semantics pinned on designed docs.
  */
class TokenOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pairCounts: adjacent pairs, deterministic tie order, k cap") {
    val d = docs(
      1L -> "x y x y z",   // (x,y)x2 (y,x) (y,z)
      2L -> "x y",          // (x,y)
      3L -> "solo")         // no pairs
    val out = TokenOps.pairCounts(d, k = 3).collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L)
    assert((out(0).getString(1), out(0).getString(2), out(0).getLong(3)) == (("x", "y", 3L)))
    // count-1 ties break on (tok_a, tok_b): (y,x) before (y,z)
    assert((out(1).getString(1), out(1).getString(2)) == (("y", "x")))
    assert((out(2).getString(1), out(2).getString(2)) == (("y", "z")))
  }

  test("bpeMergeApply: fuses the top a!=b pair, boundary- and chain-safe") {
    val d = docs(
      1L -> "a b a b",   // two merges
      2L -> "a b b",     // merge + surviving b (the b after a consumed b)
      3L -> "a a b",     // left a survives, (a,b) at the end merges
      4L -> "b a",       // reversed pair: no merge
      5L -> "a",         // single token: no pair probes past the end
      6L -> "c c c")     // a==a runs never become the merge pair
    val out = TokenOps.bpeMergeApply(d).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // top a!=b pair is (a,b) with count 4
    assert(out.forall(r => r.getString(1) == "a" && r.getString(2) == "b"))
    def stats(id: Long) = {
      val r = byId(id); (r.getLong(3), r.getLong(4), r.getLong(5))
    }
    assert(stats(1L) == ((4L, 2L, 2L)))
    assert(stats(2L) == ((3L, 2L, 1L)))
    assert(stats(3L) == ((3L, 2L, 1L)))
    assert(stats(4L) == ((2L, 2L, 0L)))
    assert(stats(5L) == ((1L, 1L, 0L)))
    assert(stats(6L) == ((3L, 3L, 0L)))
    // order-sensitive fingerprint: "a b b" -> [a_b, b] differs from [b, a_b]
    import org.apache.spark.sql.functions._
    val fp = d.sparkSession.range(1)
      .select(TextOps.portableHash(lit("a_b b")).as("h")).head().getLong(0)
    assert(byId(2L).getLong(6) == fp)
  }

  test("bpeMergeApply: a corpus with no a!=b pair survives with zero merges") {
    val d = docs(1L -> "x x x", 2L -> "solo", 3L -> "y y")
    val out = TokenOps.bpeMergeApply(d).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.getLong(5) == 0L))
    // untouched sequences keep their fingerprint
    import org.apache.spark.sql.functions._
    val fp = d.sparkSession.range(1)
      .select(TextOps.portableHash(lit("x x x")).as("h")).head().getLong(0)
    assert(out.find(_.getLong(0) == 1L).get.getLong(6) == fp)
  }

  test("bpeMergeApply: randomized model check vs a sequential reference") {
    // 80 random docs over a 3-token alphabet (seeded): the in-row
    // parallel rewrite must equal the left-to-right greedy merge the
    // BPE definition specifies (they coincide exactly when a != b)
    val rnd = new scala.util.Random(4242)
    val alpha = Vector("a", "b", "c")
    val corpus = (1L to 80L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(12))(alpha(rnd.nextInt(3))).mkString(" ")
    }
    def pairsOf(ws: Seq[String]) = ws.zip(ws.drop(1))
    val top = corpus.flatMap(d => pairsOf(d._2.split(" ").toSeq))
      .filter(p => p._1 != p._2)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
    def refMerge(ws: Seq[String]): Seq[String] = {
      val out = scala.collection.mutable.Buffer[String]()
      var i = 0
      while (i < ws.length) {
        if (i + 1 < ws.length && ws(i) == top._1 && ws(i + 1) == top._2) {
          out += s"${top._1}_${top._2}"; i += 2
        } else { out += ws(i); i += 1 }
      }
      out.toSeq
    }
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val expected = corpus.map { case (id, text) =>
      (id, refMerge(text.split(" ").toSeq).mkString(" ")) }
      .toDF("doc_id", "exp_text")
      .select(col("doc_id"),
        size(split(col("exp_text"), " ")).cast("long").as("exp_n"),
        TextOps.portableHash(col("exp_text")).as("exp_fp"))
    val got = TokenOps.bpeMergeApply(docs(corpus: _*))
    assert(got.head().getString(1) == top._1 && got.head().getString(2) == top._2)
    val bad = got.join(expected, Seq("doc_id"))
      .where(col("n_after") =!= col("exp_n") || col("out_fp") =!= col("exp_fp"))
      .count()
    assert(bad == 0L)
  }

  test("plan shapes: pair top-k is TakeOrdered, merge broadcasts the pair and never shuffles docs") {
    val d = docs(1L -> "a b a b", 2L -> "b c")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // top-k arg-max: per-partition heap + driver merge, no global sort
      val pcPlan = TokenOps.pairCounts(d, k = 5).queryExecution.executedPlan.toString
      assert(pcPlan.contains("TakeOrderedAndProject"), pcPlan)
      // merge apply: the 1-row pair rides a broadcast; the document side
      // reaches the join with ZERO exchanges (the only exchanges in the
      // whole plan are inside the pair-side aggregate, the broadcast
      // itself, and the output sort)
      val mPlan = TokenOps.bpeMergeApply(d).queryExecution.executedPlan.toString
      assert(mPlan.contains("BroadcastNestedLoopJoin"), mPlan)
      val docSide = mPlan.split("BroadcastNestedLoopJoin")(1)
        .split("BroadcastExchange")(0)
      assert(!docSide.contains("Exchange"),
        s"document side must not shuffle before the merge:\n$mPlan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bpeTrainRounds: three rounds chain on the rewritten corpus; degenerate final round") {
    import org.apache.spark.sql.functions._
    // "a b c a b c": round 1 merges (a,b) (ties (a,b)/(b,c) break on
    // pair order), round 2 merges (a_b,c), round 3 finds only the
    // (a_b_c,a_b_c) self-pair -> degenerate round, zero merges
    val d = docs((1L to 3L).map(i => i -> "a b c a b c"): _*)
    val out = TokenOps.bpeTrainRounds(d, rounds = 3).collect()
    assert(out.length == 3)
    def row(r: Int) = out(r - 1)
    assert((row(1).getString(1), row(1).getString(2)) == (("a", "b")))
    assert(row(1).getLong(3) == 6L && row(1).getLong(4) == 12L)
    assert((row(2).getString(1), row(2).getString(2)) == (("a_b", "c")))
    assert(row(2).getLong(3) == 6L && row(2).getLong(4) == 6L)
    assert(row(3).isNullAt(1) && row(3).isNullAt(2))
    assert(row(3).getLong(3) == 0L && row(3).getLong(4) == 6L)
    // order-sensitive corpus fingerprint after round 2: 3 identical docs
    val h = d.sparkSession.range(1)
      .select(pmod(TextOps.portableHash(lit("a_b_c a_b_c")),
        lit(1000000000000L)).as("h")).head().getLong(0)
    assert(row(2).getLong(5) == 3L * h && row(3).getLong(5) == 3L * h)
    // round 1 must agree with the single-round operator's aggregate view
    val one = TokenOps.bpeMergeApply(d)
      .agg(sum(col("n_merges")).as("m"), sum(col("n_after")).as("n"))
      .head()
    assert(row(1).getLong(3) == one.getLong(0) && row(1).getLong(4) == one.getLong(1))
  }

  test("bpeEncode: learned merges replay in rank order on held-out docs; early stop") {
    // train corpus: "a b c a b c" x3 -> learns (a,b) then (a_b,c), then
    // stops early (round 3 has no a!=b pair) — rounds=5 must not differ
    val train = docs((1L to 3L).map(i => i -> "a b c a b c"): _*)
    val eval = docs(
      1L -> "a b c",     // r1 -> [a_b, c], r2 -> [a_b_c]
      2L -> "b c a",     // neither learned pair is adjacent: untouched
      3L -> "x",         // unknown token: untouched
      4L -> "a b b c")   // r1 -> [a_b, b, c]; r2: (a_b, c) not adjacent
    val out = TokenOps.bpeEncode(train, eval, rounds = 5).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    def nt(id: Long) = (byId(id).getLong(1), byId(id).getLong(2))
    assert(nt(1L) == ((3L, 1L)))
    assert(nt(2L) == ((3L, 3L)))
    assert(nt(3L) == ((1L, 1L)))
    assert(nt(4L) == ((4L, 3L)))
    // order-sensitive output fingerprint of the encoded sequence
    import org.apache.spark.sql.functions._
    def fp(s: String) = train.sparkSession.range(1)
      .select(TextOps.portableHash(lit(s)).as("h")).head().getLong(0)
    assert(byId(4L).getLong(3) == fp("a_b b c"))
    assert(byId(1L).getLong(3) == fp("a_b_c"))
    // one-round encode of the train corpus agrees with bpeMergeApply
    val enc1 = TokenOps.bpeEncode(train, train, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    TokenOps.bpeMergeApply(train).collect().foreach { r =>
      assert(enc1(r.getLong(0)) == r.getLong(4))
    }
  }

  test("bpeRoundtrip: reverse-order inverse restores every sequence; collision detected") {
    val train = docs((1L to 3L).map(i => i -> "a b c a b c"): _*)
    val eval = docs(
      1L -> "a b c",      // encodes to [a_b_c], decodes back
      2L -> "b c a",      // untouched by encode, untouched by decode
      3L -> "a b b c a")  // [a_b, b, c, a] -> restored
    val out = TokenOps.bpeRoundtrip(train, eval, rounds = 5).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.values.foreach { r =>
      assert(r.getBoolean(4), s"roundtrip must restore doc ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(1), "decoded length == raw length")
    }
    assert(out(1L).getLong(2) == 1L && out(1L).getLong(1) == 3L)
    // a base token spelled like a merge ("a_b" in the RAW text) is
    // expanded by the inverse too — roundtrip_ok must flag it, and the
    // flag is deterministic (the oracle replays the same CASE)
    val collide = TokenOps.bpeRoundtrip(train, docs(9L -> "a_b c"), rounds = 5)
      .collect().head
    assert(!collide.getBoolean(4), "collision must flip roundtrip_ok")
    assert(collide.getLong(3) == 3L) // [a_b, c] -> [a, b, c]
  }

  test("collocationLift: integer-exact lift, min-pair floor") {
    // corpus: "p q" x5 and filler "r r" x5 -> T = 20 unigrams
    val d = docs((1L to 5L).map(i => i -> "p q").toSeq ++
      (6L to 10L).map(i => i -> "r r"): _*)
    val out = TokenOps.collocationLift(d, k = 10, minPair = 5).collect()
    val m = out.map(r => (r.getString(1), r.getString(2)) ->
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // lift(p,q) = floor(100 * 5 * 20 / (5*5)) = 400
    assert(m(("p", "q")) == ((5L, 5L, 5L, 400L)))
    // lift(r,r) = floor(100 * 5 * 20 / (10*10)) = 100
    assert(m(("r", "r")) == ((5L, 10L, 10L, 100L)))
    // higher lift ranks first
    assert(out.head.getString(1) == "p" && out.head.getLong(0) == 1L)
    assert(out.length == 2)
  }
}

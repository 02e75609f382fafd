package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD Type-2 history materialization ([[Scd2]]) and the keyed
  * table-diff audit ([[TableDiff]]).
  */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  // minimal assembled-event shape: (commit, change, op, before.k, after.k, after.v)
  private def ev(rows: (Long, Long, String, String, String, String)*): DataFrame =
    rows.toSeq.toDF("commit_lsn", "change_lsn", "op", "bk", "ak", "av")
      .select(col("commit_lsn"), col("change_lsn"), col("op"),
        struct(col("bk").as("k"), lit(null).cast("string").as("v")).as("before"),
        struct(col("ak").as("k"), col("av").as("v")).as("after"))

  private def hist(rows: (Long, Long, String, String, String, String)*) =
    Scd2.history(ev(rows: _*), "k")
      .select(col("k"), col("op"), col("valid_from_commit"), col("valid_from_change"),
        col("valid_to_commit"), col("valid_to_change"), col("is_current"),
        col("after.v").as("v"))
      .orderBy(col("k"), col("valid_from_commit"), col("valid_from_change"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6), r.getString(7)))

  test("versions chain: each interval closes at its successor; last is current") {
    val h = hist(
      (10L, 11L, "c", null, "a", "v1"),
      (20L, 21L, "u", "a", "a", "v2"),
      (30L, 31L, "u", "a", "a", "v3"))
    assert(h.toSeq == Seq(
      ("a", "c", 10L, 11L, Some(20L), Some(21L), false, "v1"),
      ("a", "u", 20L, 21L, Some(30L), Some(31L), false, "v2"),
      ("a", "u", 30L, 31L, None, None, true, "v3")))
  }

  test("delete closes the predecessor and emits no row; reinsertion re-opens") {
    val h = hist(
      (10L, 11L, "c", null, "a", "v1"),
      (20L, 21L, "d", "a", null, null),
      (30L, 31L, "c", null, "a", "v2"))
    assert(h.toSeq == Seq(
      ("a", "c", 10L, 11L, Some(20L), Some(21L), false, "v1"),
      ("a", "c", 30L, 31L, None, None, true, "v2")))
  }

  test("a key ending in delete has no current row") {
    val h = hist(
      (10L, 11L, "c", null, "a", "v1"),
      (20L, 21L, "d", "a", null, null))
    assert(h.toSeq == Seq(("a", "c", 10L, 11L, Some(20L), Some(21L), false, "v1")))
    assert(!h.exists(_._7))
  }

  test("same-commit versions order by change_lsn within the transaction") {
    val h = hist(
      (50L, 41L, "c", null, "a", "v1"),
      (50L, 42L, "u", "a", "a", "v2"))
    assert(h.toSeq == Seq(
      ("a", "c", 50L, 41L, Some(50L), Some(42L), false, "v1"),
      ("a", "u", 50L, 42L, None, None, true, "v2")))
  }

  test("snapshot READ rows pinned at (pin, MaxValue) open the timeline") {
    import graft.stream.IncrementalSnapshot
    val seed = Seq(("a", "s1"), ("b", "s2")).toDF("k", "v")
    val snap = IncrementalSnapshot.asChangeEvents(seed, pinLsn = 5L)
      .select(col("commit_lsn"), col("change_lsn"), col("op"), col("before"), col("after"))
    val stream = ev((10L, 11L, "u", "a", "a", "v2"))
      .select(col("commit_lsn"), col("change_lsn"), col("op"), col("before"), col("after"))
    val h = Scd2.history(snap.unionByName(stream), "k")
      .orderBy(col("k"), col("valid_from_commit"))
      .select(col("k"), col("op"), col("is_current"), col("after.v").as("v"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3)))
    // a's snapshot version is closed by the stream update; b's stays current
    assert(h.toSeq == Seq(
      ("a", "r", false, "s1"), ("a", "u", true, "v2"), ("b", "r", true, "s2")))
  }

  test("SCD2 current rows equal the replayed latest state on the engine log") {
    import graft.changelog.{ChangeLogConfig, ChangeLogGen}
    import graft.stream.{IncrementalSnapshot, ReplayOracle, TxAssembler}
    val cfg = ChangeLogConfig(nTx = 60, nDocs = 50, seed = 43)
    val log = ChangeLogGen.logRecords(spark, cfg).toDF()
    val seed = ChangeLogGen.initialTable(spark, cfg).toDF()
    val stream = TxAssembler.assemble(log).where(col("op").isin("c", "u", "d"))
    val snap = IncrementalSnapshot.asChangeEvents(seed, ChangeLogGen.snapshotLsn)
    val current = Scd2.history(snap.unionByName(stream), "doc_id")
      .where(col("is_current"))
      .select(col("doc_id"), col("after.tokens").as("tokens"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) ->
        graft.model.TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val want = ReplayOracle.replay(initial,
      (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i)),
      ChangeLogGen.snapshotLsn)
    assert(current.keySet == want.keySet,
      s"extra=${(current.keySet -- want.keySet).take(5)} missing=${(want.keySet -- current.keySet).take(5)}")
    want.foreach { case (k, w) => assert(current(k) == w.tokens.toList, s"tokens $k") }
  }

  test("table diff: all four verdicts, null-safe compare") {
    val left = Seq(("a", Some(1)), ("b", Some(2)), ("c", None), ("d", Some(4)))
      .toDF("k", "x")
    val right = Seq(("a", Some(1)), ("b", Some(9)), ("c", None), ("e", Some(5)))
      .toDF("k", "x")
    val d = TableDiff.diff(left, right, "k", Seq("x"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getString(1)))
    assert(d.toSeq == Seq(("a", "match"), ("b", "mismatch"), ("c", "match"),
      ("d", "left_only"), ("e", "right_only")))
    val s = TableDiff.diffStats(left, right, "k", Seq("x"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(s == Map("match" -> 2L, "mismatch" -> 1L, "left_only" -> 1L,
      "right_only" -> 1L))
  }
}

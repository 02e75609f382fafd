package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.icelite.{IceLite, IceLiteTable}
import graft.icelite.dsv2.IceLiteV2
import graft.util.Fs
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Join-view maintenance over TWO change feeds: the maintained
  * fact ⨝ dim view must equal a full join recompute over the sources'
  * states after every drain — through fact upserts/deletes, fk
  * re-pointing, dim updates (fan-out), dim inserts (dangling facts
  * join in), dim deletes (their facts leave), stale replays, and
  * crash-replay partial application across the three tables.
  */
class IvmJoinSpec extends SparkSpec {

  private val fk = "source"
  private val dimKey = "doc_id"

  private def buildFact(base: String, cfg: ChangeLogConfig): IceLiteTable = {
    val cdc = CdcConfig(s"$base/log", s"$base/fact", s"$base/ckptF", numBuckets = 8)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 4)
    val t = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, t, cdc, filesPerBatch = 1)
    t
  }

  /** Dim table keyed by the fact corpus's source values. */
  private def buildDim(base: String, keys: Seq[(String, Long)]): IceLiteTable = {
    import spark.implicits._
    val df = keys.map { case (k, w) =>
      (k, Seq(w.toInt, w.toInt + 1), w, "dim") }
      .toDF("doc_id", "tokens", "n_tok", "source")
    val t = IceLite.create(spark, s"$base/dim", df.schema, dimKey, numBuckets = 2)
    IceLiteV2.append(spark, t.root, df, vc = 1L, vl = 0L)
    t.refresh()
    t
  }

  private def dimRow(k: String, w: Long) = {
    import spark.implicits._
    Seq((k, Seq(w.toInt, w.toInt + 1), w, "dim"))
      .toDF("doc_id", "tokens", "n_tok", "source")
  }

  /** Oracle: the full join recompute over the SOURCES' merged states. */
  private def recompute(f: IceLiteTable, d: IceLiteTable): Map[String, Row] = {
    f.refresh(); d.refresh()
    IvmJoin.joinOf(f.read(), d.read(), fk, dimKey).collect()
      .map(r => r.getString(r.fieldIndex("doc_id")) -> r).toMap
  }

  private def viewState(view: IceLiteTable): Map[String, Row] = {
    view.refresh()
    view.read().collect().map(r => r.getString(r.fieldIndex("doc_id")) -> r).toMap
  }

  private def assertConverged(f: IceLiteTable, d: IceLiteTable,
      view: IceLiteTable): Unit = {
    val want = recompute(f, d)
    assert(want.nonEmpty)
    val got = viewState(view)
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    def lv(r: Row, c: String): Long = r.getAs[Number](c).longValue()
    want.foreach { case (k, w) =>
      assert(lv(got(k), "d_n_tok") == lv(w, "d_n_tok"), s"d_n_tok $k")
      assert(lv(got(k), "n_tok") == lv(w, "n_tok"), s"n_tok $k")
      assert(got(k).getSeq[Int](got(k).fieldIndex("d_tokens")) ==
        w.getSeq[Int](w.fieldIndex("d_tokens")), s"d_tokens $k")
    }
  }

  private def roots(base: String) =
    (s"$base/repF", s"$base/repD", s"$base/view", s"$base/ckpt")

  test("maintained join view equals the recompute; whole history through deltas; idle re-run commits nothing") {
    val base = Fs.tempDir("graft-ivmj")
    val f = buildFact(base, ChangeLogConfig(nTx = 120, nDocs = 80, seed = 353, deletePct = 12))
    val d = buildDim(base, Seq("seed" -> 10L, "cdc" -> 20L))
    val (rF, rD, cp) = (s"$base/repF", s"$base/repD", s"$base/ckpt")
    // early pins: the whole fact history replays through delta maintenance
    val (_, _, view) = IvmJoin.maintain(spark, f.root, d.root, fk,
      rF, rD, s"$base/view", cp, maxVersionsPerTrigger = 2,
      bootstrapFAt = Some(1L))
    assertConverged(f, d, view)

    val v = view.refresh().snapshotId
    IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, s"$base/view", cp)
    assert(view.refresh().snapshotId == v, "idle re-run must not commit")
    Fs.deleteRecursively(base)
  }

  test("dim update fans out to every joined fact; fk re-point to a missing dim drops the row") {
    val base = Fs.tempDir("graft-ivmj-fan")
    val f = buildFact(base, ChangeLogConfig(nTx = 80, nDocs = 60, seed = 359, deletePct = 10))
    val d = buildDim(base, Seq("seed" -> 10L, "cdc" -> 20L))
    val (rF, rD, vRoot, cp) = roots(base)
    val (_, _, view) = IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assertConverged(f, d, view)

    val hiVc = 1L << 40
    // dim UPDATE: every seed-source fact's d_ columns must change
    IceLiteV2.append(spark, d.root, dimRow("seed", 77L), vc = hiVc, vl = 0L)
    // fk re-point: 6 facts now reference a dim key that does not exist
    val moved = f.read().limit(6).select("doc_id", "tokens", "n_tok", "source")
      .withColumn(fk, lit("ghost"))
    IceLiteV2.append(spark, f.root, moved, vc = hiVc, vl = 0L)
    f.refresh(); d.refresh()
    IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assertConverged(f, d, view)
    val movedIds = moved.collect().map(_.getString(0)).toSet
    assert(movedIds.intersect(viewState(view).keySet).isEmpty,
      "facts pointing at a missing dim must leave the view")
    assert(viewState(view).values.filter(_.getAs[String](fk) == "seed")
      .forall(_.getAs[Long]("d_n_tok") == 77L), "dim update must fan out")

    // dim INSERT: the dangling facts join in
    IceLiteV2.append(spark, d.root, dimRow("ghost", 5L), vc = hiVc + 1, vl = 0L)
    d.refresh()
    IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assertConverged(f, d, view)
    assert(movedIds.subsetOf(viewState(view).keySet),
      "a dim insert must join dangling facts in")

    // dim DELETE: all its facts leave
    IceLiteV2.append(spark, d.root, dimRow("ghost", 5L), vc = hiVc + 2, vl = 0L,
      tombstone = true)
    d.refresh()
    IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assertConverged(f, d, view)
    assert(movedIds.intersect(viewState(view).keySet).isEmpty,
      "a dim delete must remove its joined facts")
    Fs.deleteRecursively(base)
  }

  test("fact deletes leave the view; stale writes on either side are inert") {
    val base = Fs.tempDir("graft-ivmj-stale")
    val f = buildFact(base, ChangeLogConfig(nTx = 60, nDocs = 50, seed = 367, deletePct = 8))
    val d = buildDim(base, Seq("seed" -> 10L, "cdc" -> 20L))
    val (rF, rD, vRoot, cp) = roots(base)
    val (_, _, view) = IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)

    val hiVc = 1L << 40
    // localCheckpoint pins ONE evaluation of the unordered limit: the
    // frame is consumed by three separate actions below, and limit(5)
    // over a distributed read may pick different rows per evaluation
    // (surfaced when the small-merged-read plan changed partition order)
    val victims = f.read().limit(5).select("doc_id", "tokens", "n_tok", "source")
      .localCheckpoint(true)
    IceLiteV2.append(spark, f.root, victims, vc = hiVc, vl = 0L, tombstone = true)
    f.refresh()
    IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assertConverged(f, d, view)
    assert(victims.collect().map(_.getString(0))
      .forall(!viewState(view).contains(_)))

    // stale fact write + stale dim write: both inert end to end. The
    // dim write TIES the stored version (1,0) — equal versions lose
    // under the strict (commit, change) rule, same as a replayed row.
    // (It was previously (1,1), which is strictly NEWER and thus a
    // legitimate update; the assertion only held because the unordered
    // limit(5) happened to tombstone every live seed-pointing fact, so
    // the fan-out had nothing to update — fixture luck, surfaced when
    // the small-merged-read plan changed which rows limit(5) picked.)
    val before = viewState(view)
    IceLiteV2.append(spark, f.root,
      victims.withColumn(fk, lit("stale")), vc = 1L, vl = 0L)
    IceLiteV2.append(spark, d.root, dimRow("seed", 999L), vc = 1L, vl = 0L)
    f.refresh(); d.refresh()
    IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assert(viewState(view) == before, "stale rows must be inert")
    Fs.deleteRecursively(base)
  }

  test("crash replay converges from any half-applied order across the three tables") {
    val base = Fs.tempDir("graft-ivmj-crash")
    val f = buildFact(base, ChangeLogConfig(nTx = 60, nDocs = 50, seed = 373, deletePct = 10))
    val d = buildDim(base, Seq("seed" -> 10L, "cdc" -> 20L))
    val (rFr, rDr, vRoot, cp) = roots(base)
    val (repF, repD, view) = IvmJoin.maintain(spark, f.root, d.root, fk,
      rFr, rDr, vRoot, cp)
    assertConverged(f, d, view)

    val hiVc = 1L << 40
    def feedOf(t: IceLiteTable, from: Long): DataFrame =
      t.changesBetween(from, t.refresh().snapshotId).drop("_change_type")

    // (a) crash AFTER the fact replica applied, BEFORE the view:
    // replay must take the rebuild fallback
    val fromF = f.refresh().snapshotId; val fromD = d.refresh().snapshotId
    IceLiteV2.append(spark, f.root,
      f.read().limit(7).select("doc_id", "tokens", "n_tok", "source")
        .withColumn(fk, lit("cdc")), vc = hiVc, vl = 0L)
    IceLiteV2.append(spark, d.root, dimRow("cdc", 44L), vc = hiVc, vl = 0L)
    f.refresh(); d.refresh()
    val (fb, db) = (feedOf(f, fromF), feedOf(d, fromD))
    val id = repF.refresh().summary.lastBatchId + 1
    Replicate.applyFeedBatch(repF, fb, id, Some(f.root))
    IvmJoin.applyIvmJoinBatch(view, repF, repD, fk, fb, db, id, f.root, d.root)
    assertConverged(f, d, view)

    // (b) crash AFTER the view applied, BEFORE the replicas (the
    // incremental order): replay applies only the replicas
    val fromF2 = f.refresh().snapshotId
    IceLiteV2.append(spark, f.root,
      f.read().limit(3).select("doc_id", "tokens", "n_tok", "source")
        .withColumn(fk, lit("seed")), vc = hiVc + 1, vl = 0L)
    f.refresh()
    val fb2 = feedOf(f, fromF2)
    val db2 = db.limit(0)
    val id2 = id + 1
    val ev = IvmJoin.deltaEvents(repF, repD, fk, fb2, db2, id2)
    MergeApply.applyBatch(view, ev, id2)
    val vVer = view.refresh().snapshotId
    IvmJoin.applyIvmJoinBatch(view, repF, repD, fk, fb2, db2, id2, f.root, d.root)
    assert(view.refresh().snapshotId == vVer, "view must not double-apply")
    assertConverged(f, d, view)

    // (c) full replay of an applied batch is a no-op on all three
    val (rfV, rdV) = (repF.refresh().snapshotId, repD.refresh().snapshotId)
    IvmJoin.applyIvmJoinBatch(view, repF, repD, fk, fb2, db2, id2, f.root, d.root)
    assert(view.refresh().snapshotId == vVer &&
      repF.refresh().snapshotId == rfV && repD.refresh().snapshotId == rdV)
    Fs.deleteRecursively(base)
  }

  test("delta plan shape: batch/dim sides broadcast, replicas never sort-merge-joined") {
    val base = Fs.tempDir("graft-ivmj-plan")
    val f = buildFact(base, ChangeLogConfig(nTx = 60, nDocs = 40, seed = 383, deletePct = 10))
    val d = buildDim(base, Seq("seed" -> 10L, "cdc" -> 20L))
    val (rF, rD, vRoot, cp) = roots(base)
    val (repF, repD, _) = IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)

    val fromF = f.refresh().snapshotId; val fromD = d.refresh().snapshotId
    IceLiteV2.append(spark, f.root,
      f.read().limit(8).select("doc_id", "tokens", "n_tok", "source"),
      vc = 1L << 40, vl = 0L)
    IceLiteV2.append(spark, d.root, dimRow("seed", 55L), vc = 1L << 40, vl = 0L)
    f.refresh(); d.refresh()
    val fb = f.changesBetween(fromF, f.refresh().snapshotId).drop("_change_type")
    val db = d.changesBetween(fromD, d.refresh().snapshotId).drop("_change_type")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = IvmJoin.deltaEventsPlan(repF, repD, fk, fb, db, 99L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"a replica probe fell back to a shuffle join:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"unexpected join strategy:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    Fs.deleteRecursively(base)
  }

  test("randomized interleaved batches: view == join recompute after EVERY batch (seeded model check)") {
    val base = Fs.tempDir("graft-ivmj-rand")
    val f = buildFact(base, ChangeLogConfig(nTx = 60, nDocs = 50, seed = 397, deletePct = 10))
    val dims0 = Seq("seed" -> 10L, "cdc" -> 20L, "g0" -> 30L, "g1" -> 40L)
    val d = buildDim(base, dims0)
    val (rF, rD, vRoot, cp) = roots(base)
    val (repF, repD, view) = IvmJoin.maintain(spark, f.root, d.root, fk, rF, rD, vRoot, cp)
    assertConverged(f, d, view)

    val rnd = new scala.util.Random(397)
    val dimKeys = dims0.map(_._1) :+ "ghost"
    val ids = f.read().select("doc_id").collect().map(_.getString(0))
    var vc = 1L << 40
    var id = repF.refresh().summary.lastBatchId
    for (_ <- 1 to 4) {
      val fromF = f.refresh().snapshotId; val fromD = d.refresh().snapshotId
      // random fact upserts (fk re-points, some to a dim that may not
      // exist), fact deletes, dim updates/deletes/re-inserts, plus
      // deliberately STALE writes on both sides — all in one batch
      val ups = rnd.shuffle(ids.toSeq).take(1 + rnd.nextInt(10))
      val upDf = f.read().where(col("doc_id").isin(ups.map(x => x: Any): _*))
        .select("doc_id", "tokens", "n_tok", "source")
        .withColumn(fk, lit(dimKeys(rnd.nextInt(dimKeys.length))))
      IceLiteV2.append(spark, f.root, upDf, vc = vc, vl = rnd.nextInt(1000).toLong)
      if (rnd.nextBoolean()) {
        val dels = rnd.shuffle(ids.toSeq).take(rnd.nextInt(4))
        val delDf = f.read().where(col("doc_id").isin(dels.map(x => x: Any): _*))
          .select("doc_id", "tokens", "n_tok", "source")
        if (!delDf.isEmpty)
          IceLiteV2.append(spark, f.root, delDf, vc = vc + 1, vl = 0L, tombstone = true)
      }
      val dk = dimKeys(rnd.nextInt(dimKeys.length))
      if (rnd.nextBoolean())
        IceLiteV2.append(spark, d.root, dimRow(dk, vc % 1000), vc = vc + 2, vl = 0L)
      else
        IceLiteV2.append(spark, d.root, dimRow(dk, 0L), vc = vc + 2, vl = 0L,
          tombstone = true)
      if (rnd.nextBoolean()) // stale on both sides: must be inert
        IceLiteV2.append(spark, f.root, upDf.withColumn(fk, lit("stale")),
          vc = vc - 5, vl = 0L)
      vc += 10
      f.refresh(); d.refresh()
      val fb = f.changesBetween(fromF, f.refresh().snapshotId).drop("_change_type")
      val db = d.changesBetween(fromD, d.refresh().snapshotId).drop("_change_type")
      id += 1
      IvmJoin.applyIvmJoinBatch(view, repF, repD, fk, fb, db, id, f.root, d.root)
      assertConverged(f, d, view)
      assert(!viewState(view).values.exists(_.getAs[String](fk) == "stale"))
    }
    Fs.deleteRecursively(base)
  }

  test("a fact-source truncate takes the rebuild path and converges") {
    val base = Fs.tempDir("graft-ivmj-trunc")
    val f = buildFact(base, ChangeLogConfig(nTx = 100, nDocs = 60, seed = 379,
      deletePct = 10, truncateAtTx = 40))
    val d = buildDim(base, Seq("seed" -> 10L, "cdc" -> 20L))
    val (rF, rD, vRoot, cp) = roots(base)
    val (repF, _, view) = IvmJoin.maintain(spark, f.root, d.root, fk,
      rF, rD, vRoot, cp, maxVersionsPerTrigger = 2, bootstrapFAt = Some(1L))
    assert(repF.refresh().summary.truncCommit >= 0,
      "the truncate floor must reach the fact replica")
    assertConverged(f, d, view)
    Fs.deleteRecursively(base)
  }
}

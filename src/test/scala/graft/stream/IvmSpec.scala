package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.icelite.{IceLite, IceLiteTable}
import graft.icelite.dsv2.IceLiteV2
import graft.ops.TextOps
import graft.util.Fs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Incremental view maintenance over the change feed: the maintained
  * aggregate must equal a full recompute over the source's state after
  * every drain — through updates that MOVE rows between groups,
  * deletes, stale replays, truncates (rebuild path), group
  * disappearance, and crash-replay partial application.
  */
class IvmSpec extends SparkSpec {

  private val vd = Ivm.ViewDef("source", Seq(
    "total_tok" -> col("n_tok").cast("long"),
    "sum_fp" -> pmod(TextOps.portableHash(
      array_join(transform(col("tokens"), _.cast("string")), ",")),
      lit(1000000000000L))))

  private def buildSource(base: String, cfg: ChangeLogConfig): IceLiteTable = {
    val cdc = CdcConfig(s"$base/log", s"$base/src", s"$base/ckptSrc", numBuckets = 8)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 4)
    val t = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, t, cdc, filesPerBatch = 1)
    t
  }

  /** Oracle: the full recompute over the SOURCE's merged state. */
  private def recompute(src: IceLiteTable): Map[String, Row] =
    Ivm.aggregateOf(src.read(), vd).collect()
      .map(r => r.getString(0) -> r).toMap

  private def viewState(view: IceLiteTable): Map[String, Row] =
    view.read().collect().map(r => r.getString(0) -> r).toMap

  private def assertConverged(src: IceLiteTable, view: IceLiteTable): Unit = {
    val want = recompute(src)
    assert(want.nonEmpty)
    assert(viewState(view) == want)
  }

  test("maintained view equals the recompute; idle re-run commits nothing") {
    val base = Fs.tempDir("graft-ivm")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 200, nDocs = 120, seed = 307, deletePct = 15))
    // early pin: the WHOLE change history replays through the deltas
    val (_, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt",
      maxVersionsPerTrigger = 2, bootstrapAtVersion = Some(1L))
    assertConverged(src, view)

    val v = view.refresh().snapshotId
    Ivm.maintain(spark, src.root, vd, s"$base/rep", s"$base/view", s"$base/ckpt")
    assert(view.refresh().snapshotId == v, "idle re-run must not commit")
    Fs.deleteRecursively(base)
  }

  test("group-moving updates retract from the old group; deletes retract; stale rows are inert") {
    val base = Fs.tempDir("graft-ivm-upd")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 120, nDocs = 80, seed = 311, deletePct = 10))
    Ivm.maintain(spark, src.root, vd, s"$base/rep", s"$base/view", s"$base/ckpt")

    val hiVc = 1L << 40
    val existing = src.read().select("doc_id", "tokens", "n_tok", "source")
    // move 10 docs into a NEW group (old groups must retract)
    IceLiteV2.append(spark, src.root,
      existing.limit(10).withColumn("source", lit("moved")), vc = hiVc, vl = 0L)
    // delete 5 docs (their group sums must retract)
    IceLiteV2.append(spark, src.root,
      existing.orderBy(col("doc_id").desc).limit(5), vc = hiVc + 1, vl = 0L,
      tombstone = true)
    src.refresh()
    val (_, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt")
    assertConverged(src, view)
    assert(viewState(view).contains("moved"))

    // a STALE write (low version) must change neither table nor view
    IceLiteV2.append(spark, src.root,
      existing.limit(3).withColumn("source", lit("stale")), vc = 1L, vl = 0L)
    src.refresh()
    val before = viewState(view)
    Ivm.maintain(spark, src.root, vd, s"$base/rep", s"$base/view", s"$base/ckpt")
    assertConverged(src, view)
    assert(viewState(view) == before, "stale rows must be inert")
    assert(!viewState(view).contains("stale"))
    Fs.deleteRecursively(base)
  }

  test("a group whose last row is deleted disappears from the view") {
    val base = Fs.tempDir("graft-ivm-gone")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 80, nDocs = 60, seed = 313, deletePct = 5))
    Ivm.maintain(spark, src.root, vd, s"$base/rep", s"$base/view", s"$base/ckpt")

    // tombstone EVERY doc of one group
    val g = src.read().select("source").orderBy("source").first().getString(0)
    val victims = src.read().where(col("source") === g)
      .select("doc_id", "tokens", "n_tok", "source")
    assert(victims.count() > 0)
    IceLiteV2.append(spark, src.root, victims, vc = 1L << 41, vl = 0L,
      tombstone = true)
    src.refresh()
    val (_, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt")
    assertConverged(src, view)
    assert(!viewState(view).contains(g), s"group $g must tombstone out of the view")
    Fs.deleteRecursively(base)
  }

  test("a source truncate takes the rebuild path and converges") {
    val base = Fs.tempDir("graft-ivm-trunc")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 150, nDocs = 90, seed = 317, deletePct = 10,
        truncateAtTx = 60))
    val (rep, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt",
      maxVersionsPerTrigger = 2, bootstrapAtVersion = Some(1L))
    assert(rep.refresh().summary.truncCommit >= 0,
      "the truncate floor must reach the replica")
    assertConverged(src, view)
    Fs.deleteRecursively(base)
  }

  test("crash replay converges from either half-applied state") {
    val base = Fs.tempDir("graft-ivm-crash")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 100, nDocs = 70, seed = 331, deletePct = 12))
    val (rep, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt")
    assertConverged(src, view)

    // new source commits the consumer has NOT streamed yet
    val from = src.refresh().snapshotId
    val hiVc = 1L << 40
    val existing = src.read().select("doc_id", "tokens", "n_tok", "source")
    IceLiteV2.append(spark, src.root,
      existing.limit(8).withColumn("source", lit("crash")), vc = hiVc, vl = 0L)
    val batch = src.changesBetween(from, src.refresh().snapshotId)
      .drop("_change_type")
    val nextId = rep.refresh().summary.lastBatchId + 1

    // (a) crash AFTER the replica applied, BEFORE the view: the replay
    // must take the rebuild fallback
    Replicate.applyFeedBatch(rep, batch, nextId, Some(src.root))
    Ivm.applyIvmBatch(view, rep, vd, batch, nextId, src.root)
    assertConverged(src, view)

    // (b) crash AFTER the view applied, BEFORE the replica (the
    // incremental order): replay applies only the replica
    IceLiteV2.append(spark, src.root,
      existing.limit(4).withColumn("source", lit("crash2")), vc = hiVc + 1, vl = 0L)
    val from2 = from // recompute the feed window over everything new
    val batch2 = src.changesBetween(from2, src.refresh().snapshotId)
      .drop("_change_type")
    val id2 = nextId + 1
    val ev = Ivm.deltaEvents(view, rep, vd, batch2, id2)
    MergeApply.applyBatch(view, ev, id2)
    val vVer = view.refresh().snapshotId
    Ivm.applyIvmBatch(view, rep, vd, batch2, id2, src.root)
    assert(view.refresh().snapshotId == vVer, "view must not double-apply")
    assertConverged(src, view)

    // (c) full replay of an applied batch is a no-op on both tables
    val rVer = rep.refresh().snapshotId
    Ivm.applyIvmBatch(view, rep, vd, batch2, id2, src.root)
    assert(view.refresh().snapshotId == vVer && rep.refresh().snapshotId == rVer)
    Fs.deleteRecursively(base)
  }

  test("randomized batches: view == recompute after EVERY batch (seeded model check)") {
    val base = Fs.tempDir("graft-ivm-rand")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 60, nDocs = 50, seed = 347, deletePct = 10))
    val (rep, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt")
    assertConverged(src, view)

    val rnd = new scala.util.Random(347)
    val groups = Array("g0", "g1", "g2", "g3")
    val ids = src.read().select("doc_id").collect().map(_.getString(0))
    var vc = (1L << 40)
    var id = rep.refresh().summary.lastBatchId
    for (_ <- 1 to 4) {
      val from = src.refresh().snapshotId
      // a random mix per batch: group-moving upserts, deletes (some of
      // keys that never existed), and deliberately STALE versions
      val ups = rnd.shuffle(ids.toSeq).take(1 + rnd.nextInt(12))
      val dels = rnd.shuffle(ids.toSeq).take(rnd.nextInt(6)) ++
        Seq(s"ghost${rnd.nextInt(100)}")
      val upDf = src.read().where(col("doc_id").isin(ups.map(x => x: Any): _*))
        .select("doc_id", "tokens", "n_tok", "source")
        .withColumn("source", lit(groups(rnd.nextInt(groups.length))))
      IceLiteV2.append(spark, src.root, upDf, vc = vc, vl = rnd.nextInt(1000).toLong)
      val delDf = src.read().where(col("doc_id").isin(dels.map(x => x: Any): _*))
        .select("doc_id", "tokens", "n_tok", "source")
      if (rnd.nextBoolean() && !delDf.isEmpty)
        IceLiteV2.append(spark, src.root, delDf, vc = vc + 1, vl = 0L, tombstone = true)
      if (rnd.nextBoolean()) {
        // stale re-delivery: the SAME keys just written at vc, at a
        // lower version (vc-5 beats no stored version of these keys:
        // snapshot rows sit at (0, MaxValue) but ups now hold vc) —
        // must be inert everywhere
        val staleDf = upDf.withColumn("source", lit("stale"))
        IceLiteV2.append(spark, src.root, staleDf, vc = vc - 5, vl = 0L)
      }
      vc += 10
      src.refresh()
      val batch = src.changesBetween(from, src.refresh().snapshotId)
        .drop("_change_type")
      id += 1
      Ivm.applyIvmBatch(view, rep, vd, batch, id, src.root)
      assertConverged(src, view)
      assert(!viewState(view).contains("stale"))
    }
    Fs.deleteRecursively(base)
  }

  test("delta plan shape: batch side broadcasts, replica never sort-merge-joined") {
    val base = Fs.tempDir("graft-ivm-plan")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 60, nDocs = 40, seed = 341, deletePct = 10))
    val (rep, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt")
    val from = src.refresh().snapshotId
    IceLiteV2.append(spark, src.root,
      src.read().select("doc_id", "tokens", "n_tok", "source").limit(8),
      vc = 1L << 40, vl = 0L)
    val batch = src.changesBetween(from, src.refresh().snapshotId)
      .drop("_change_type")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Ivm.deltaEvents(view, rep, vd, batch, 99L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"a replica/view probe fell back to a shuffle join:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"unexpected join strategy:\n$plan")
      val bhj = plan.sliding("BroadcastHashJoin".length)
        .count(_ == "BroadcastHashJoin")
      assert(bhj >= 3,
        s"expected the batch side broadcast into every probe (semi + outer + view), got $bhj:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    Fs.deleteRecursively(base)
  }

  test("a truncate landing during a crashed incremental batch still rebuilds the view") {
    val base = Fs.tempDir("graft-ivm-crash-trunc")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 80, nDocs = 60, seed = 337, deletePct = 10))
    val (rep, view) = Ivm.maintain(spark, src.root, vd,
      s"$base/rep", s"$base/view", s"$base/ckpt")
    assertConverged(src, view)

    // an un-streamed commit, half-applied (view only — the incremental
    // order), then the process "crashes"
    val from = src.refresh().snapshotId
    val hiVc = 1L << 40
    val existing = src.read().select("doc_id", "tokens", "n_tok", "source")
    IceLiteV2.append(spark, src.root,
      existing.limit(6).withColumn("source", lit("crash3")), vc = hiVc, vl = 0L)
    val head1 = src.refresh().snapshotId
    val batch = src.changesBetween(from, head1).drop("_change_type")
    val id = rep.refresh().summary.lastBatchId + 1
    MergeApply.applyBatch(view, Ivm.deltaEvents(view, rep, vd, batch, id), id)

    // a TRUNCATE commits on the source while the consumer is down:
    // wipes everything except the hiVc rows
    val afterT = src.refresh().schema
    val aType = org.apache.spark.sql.types.StructType(afterT.fields)
    val tEv = spark.range(1).select(
      lit("t").as("op"),
      lit(null).cast(aType).as("before"), lit(null).cast(aType).as("after"),
      lit(hiVc - 1).as("commit_lsn"), lit(0L).as("change_lsn"))
    assert(MergeApply.applyBatch(src, tEv,
      src.refresh().summary.lastBatchId + 1).committed)
    val head2 = src.refresh().snapshotId

    // replay of the half-applied batch: the vDone branch must finish the
    // replica WITHOUT propagating the new floor (else the rebuild below
    // would never trigger)
    Ivm.applyIvmBatch(view, rep, vd, batch, id, src.root)
    assert(!Replicate.floorAhead(rep.refresh().summary,
      IceLite.readLatest(src.root).get.summary) &&
      rep.refresh().summary.truncCommit < hiVc - 1,
      "the crash-replay branch must not advance the replica's floor")

    // the truncate's own (row-less) feed batch takes the rebuild path
    val batch2 = src.changesBetween(head1, head2).drop("_change_type")
    Ivm.applyIvmBatch(view, rep, vd, batch2, id + 1, src.root)
    assert(rep.refresh().summary.truncCommit == hiVc - 1,
      "the floor propagates on the next batch")
    assertConverged(src, view)
    assert(viewState(view).keySet == Set("crash3"),
      "only post-truncate rows survive in the view")
    Fs.deleteRecursively(base)
  }
}

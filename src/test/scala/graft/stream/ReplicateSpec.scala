package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.icelite.{IceLite, IceLiteTable}
import graft.icelite.dsv2.IceLiteV2
import graft.model.TokenDoc
import graft.util.Fs

/** Downstream replication over the table-as-topic change feed:
  * bootstrap + tail must converge a second IceLite table (different
  * bucket layout) to the source's exact state, stay idempotent across
  * re-runs and mid-catch-up restarts, and propagate truncates.
  */
class ReplicateSpec extends SparkSpec {

  private def buildSource(base: String, cfg: ChangeLogConfig): IceLiteTable = {
    val cdc = CdcConfig(s"$base/log", s"$base/src", s"$base/ckptSrc", numBuckets = 8)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 4)
    val t = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, t, cdc, filesPerBatch = 1)
    t
  }

  private def freshReplica(base: String, src: IceLiteTable, buckets: Int): IceLiteTable = {
    val s = src.refresh()
    IceLite.create(spark, s"$base/dst", s.schema, s.keyCol, buckets)
  }

  private def state(t: IceLiteTable): Map[String, TokenDoc] = {
    import spark.implicits._
    t.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
  }

  test("replica converges to the source across a different bucket layout; re-run is a no-op") {
    val base = Fs.tempDir("graft-repl")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 200, nDocs = 120, seed = 211, deletePct = 15))
    val dst = freshReplica(base, src, buckets = 4)

    Replicate.replicate(spark, src.root, dst, s"$base/ckptRepl", maxVersionsPerTrigger = 2)
    val want = state(src)
    assert(want.nonEmpty && state(dst) == want)

    // a second replicate() with nothing new leaves the replica version alone
    val v = dst.refresh().snapshotId
    Replicate.replicate(spark, src.root, dst, s"$base/ckptRepl")
    assert(dst.refresh().snapshotId == v, "idle re-run must not commit")
    Fs.deleteRecursively(base)
  }

  test("commits landing while the consumer is down arrive on the next run — exactly once") {
    val base = Fs.tempDir("graft-repl-resume")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 120, nDocs = 80, seed = 223, deletePct = 10))
    val dst = freshReplica(base, src, buckets = 4)
    Replicate.replicate(spark, src.root, dst, s"$base/ckpt")
    assert(state(dst) == state(src))

    // source keeps moving while the replica is down: upserts + tombstones
    // at versions above the CDC watermark
    import org.apache.spark.sql.functions._
    val hiVc = 1L << 40
    val existing = src.read().select("doc_id", "tokens", "n_tok", "source")
    IceLiteV2.append(spark, src.root,
      existing.limit(10).withColumn("source", lit("rewritten")), vc = hiVc, vl = 0L)
    IceLiteV2.append(spark, src.root,
      existing.orderBy(col("doc_id").desc).limit(5), vc = hiVc + 1, vl = 0L,
      tombstone = true)

    src.refresh() // the v2 appends committed through a different handle
    Replicate.replicate(spark, src.root, dst, s"$base/ckpt")
    assert(state(dst) == state(src), "replica must converge after catch-up")
    // and once more: nothing new, no commit
    val v = dst.refresh().snapshotId
    Replicate.replicate(spark, src.root, dst, s"$base/ckpt")
    assert(dst.refresh().snapshotId == v)
    Fs.deleteRecursively(base)
  }

  test("a source truncate propagates: the replica floors the same prefix") {
    val base = Fs.tempDir("graft-repl-trunc")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 150, nDocs = 90, seed = 227, deletePct = 10,
        truncateAtTx = 60))
    val dst = freshReplica(base, src, buckets = 4)
    Replicate.replicate(spark, src.root, dst, s"$base/ckpt", maxVersionsPerTrigger = 2)
    val sm = dst.refresh().summary
    assert(sm.truncCommit >= 0, "truncate floor must reach the replica")
    assert(state(dst) == state(src))
    Fs.deleteRecursively(base)
  }

  test("bootstrap-only replica equals the source's pinned state (feed excludes base commits)") {
    val base = Fs.tempDir("graft-repl-boot")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 80, nDocs = 60, seed = 229, deletePct = 10))
    val dst = freshReplica(base, src, buckets = 4)
    val pin = Replicate.bootstrap(spark, src.root, dst)
    assert(pin == src.refresh().snapshotId)
    assert(state(dst) == state(src),
      "bootstrap must carry snapshot-phase rows the feed never surfaces")
    Fs.deleteRecursively(base)
  }

  test("early-pinned bootstrap + full feed tail replays the whole history") {
    val base = Fs.tempDir("graft-repl-pin")
    val src = buildSource(base,
      ChangeLogConfig(nTx = 100, nDocs = 70, seed = 233, deletePct = 12))
    val dst = freshReplica(base, src, buckets = 4)
    // pin the snapshot-phase commit: everything else must arrive via feed
    Replicate.replicate(spark, src.root, dst, s"$base/ckpt",
      maxVersionsPerTrigger = 2, bootstrapAtVersion = Some(1L))
    assert(state(dst) == state(src))
    Fs.deleteRecursively(base)
  }
}

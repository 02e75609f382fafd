package graft

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.icelite.IceLite
import graft.stream.{CdcConfig, CdcJob, Ivm}
import graft.util.Fs
import org.apache.spark.sql.functions._

/** The spark-submit consumer entrypoint: both modes drive their
  * library lifecycles end to end from CLI args (create-if-missing,
  * drain, re-run resumes) against a real engine-built source.
  */
class ConsumerSpec extends SparkSpec {

  private def buildSource(base: String): graft.icelite.IceLiteTable = {
    val cfg = ChangeLogConfig(nTx = 100, nDocs = 70, seed = 401, deletePct = 10)
    val cdc = CdcConfig(s"$base/log", s"$base/src", s"$base/ckptSrc", numBuckets = 8)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val t = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, t, cdc, filesPerBatch = 1)
    t
  }

  test("replicate mode: creates the replica, drains, re-run is a no-op") {
    val base = Fs.tempDir("graft-consumer-repl")
    val src = buildSource(base)
    Consumer.main(Array(
      "--source-table", src.root, "--mode", "replicate",
      "--dst", s"$base/dst", "--checkpoint", s"$base/ckpt",
      "--buckets", "4"))
    val dst = IceLite.load(spark, s"$base/dst")
    assert(dst.read().count() == src.read().count())
    val v = dst.refresh().snapshotId
    Consumer.main(Array(
      "--source-table", src.root, "--mode", "replicate",
      "--dst", s"$base/dst", "--checkpoint", s"$base/ckpt"))
    assert(dst.refresh().snapshotId == v)
    Fs.deleteRecursively(base)
  }

  test("ivm mode: SQL-expr sums parse and the maintained view matches the recompute") {
    val base = Fs.tempDir("graft-consumer-ivm")
    val src = buildSource(base)
    Consumer.main(Array(
      "--source-table", src.root, "--mode", "ivm",
      "--replica", s"$base/rep", "--view", s"$base/view",
      "--checkpoint", s"$base/ckpt", "--group-col", "source",
      "--sums", "total_tok=n_tok;n_tok_sq=n_tok*n_tok"))
    val view = IceLite.load(spark, s"$base/view")
    val vd = Ivm.ViewDef("source", Seq(
      "total_tok" -> expr("n_tok"), "n_tok_sq" -> expr("n_tok*n_tok")))
    val want = Ivm.aggregateOf(src.read(), vd).collect()
      .map(r => r.getString(0) -> r).toMap
    val got = view.read().collect().map(r => r.getString(0) -> r).toMap
    assert(got == want && got.nonEmpty)
    Fs.deleteRecursively(base)
  }

  test("bad args fail fast") {
    intercept[IllegalArgumentException] {
      Consumer.main(Array("--mode", "replicate"))
    }
    intercept[IllegalArgumentException] {
      Consumer.main(Array("--source-table", "/nope", "--mode", "ivm",
        "--replica", "/r", "--view", "/v", "--checkpoint", "/c",
        "--group-col", "g", "--sums", "broken"))
    }
  }
}

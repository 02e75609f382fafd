package graft.tools

import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.LogRecord
import graft.stream._
import graft.util.Fs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiler for the apply path at a given parallelism. */
object Prof {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val nTx = sys.env.getOrElse("PROF_TX", "140000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("GRAFT_TMPDIR", "/tmp"))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Fs.tempDir("graft-prof")
    val cfg = ChangeLogConfig(seed = 42, nDocs = 150000, nTx = nTx,
      maxOpsPerTx = 32, interleave = 16, zipfAlpha = 1.5)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val nf = sys.env.getOrElse("PROF_FILES", "32").toInt
    MergeApply.debugTiming = true
    time("writeLog")(ChangeLogGen.writeLog(spark, cfg, s"$base/log", nf))
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 64)
    val table = time("snapshot")(CdcJob.snapshot(spark,
      ChangeLogGen.initialTable(spark, cfg).toDF(), cdc, 0L))
    val files = Fs.listParquet(cdc.logDir).sorted
    files.grouped(math.max(1, files.size / 4)).zipWithIndex.foreach { case (f, i) =>
      val raw = spark.read.schema(LogRecord.schema).parquet(f: _*)
      val events = time(s"assemble-$i")(TxAssembler.assemble(raw))
      // replicate applyBatch phases with timing
      val t0 = System.nanoTime()
      val stats = time(s"applyBatch-$i")(MergeApply.applyBatch(table, events, i.toLong))
      println(s"   events=${stats.events} upserts=${stats.upserts}")
    }
    time("read-merged-count")(println("rows=" + table.read().count()))
    Fs.deleteRecursively(base)
    spark.stop()
  }
}

package graft.tools
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.LogRecord
import graft.stream._
import graft.util.Fs
import org.apache.spark.sql.SparkSession

/** Full core-count throughput curve (BASELINE.md) under the same
  * conventions as graft.Bench: tmpfs scratch, broadcast assembly, AQE
  * off on the fixed apply plan, fresh session + sink per level. The
  * first 32-core pass warms JIT/codegen; 32 repeats at the end so the
  * warm number is reported.
  */
object Curve {
  def main(args: Array[String]): Unit = {
    val scratch = sys.env.getOrElse("GRAFT_TMPDIR",
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm/graft-curve"
      else System.getProperty("java.io.tmpdir"))
    val base = Fs.tempDirIn(scratch, "graft-curve")
    val cfg = ChangeLogConfig(seed = 42, nDocs = 300000, nTx = 600000,
      maxOpsPerTx = 32, interleave = 16, zipfAlpha = 1.5)
    def session(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", scratch)
        .config("spark.sql.adaptive.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    locally { val s = session(32); ChangeLogGen.writeLog(s, cfg, s"$base/log", 256); s.stop() }
    val chunksAll = Fs.listParquet(s"$base/log").sorted.grouped(64).toSeq
    for (c <- Seq(32, 16, 8, 4, 2, 1, 32)) {
      val spark = session(c)
      val cdc = CdcConfig(s"$base/log", s"$base/t$c-${System.nanoTime()}", s"$base/k$c-${System.nanoTime()}",
        numBuckets = 64, broadcastAssembly = true)
      val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
        cdc, ChangeLogGen.snapshotLsn)
      val times = chunksAll.zipWithIndex.map { case (chunk, i) =>
        val raw = spark.read.schema(LogRecord.schema).parquet(chunk: _*)
        val t0 = System.nanoTime()
        val st = CdcJob.processBatch(table, raw, i.toLong, cdc.broadcastAssembly)
        (st.events, (System.nanoTime() - t0) / 1e9)
      }
      val thr = times.map { case (e, s2) => e / s2 }
      val med = thr.sorted.apply(thr.size / 2)
      println(f"== cores=$c median=$med%.0f best=${thr.max}%.0f ev/s  " +
        f"batches=${thr.map(t => f"$t%.0f").mkString(",")}")
      spark.stop()
      Fs.deleteRecursively(cdc.tableRoot)
      Fs.deleteRecursively(cdc.checkpointDir)
      System.gc()
    }
    Fs.deleteRecursively(base)
    if (scratch.startsWith("/dev/shm")) Fs.deleteRecursively(scratch)
  }
}

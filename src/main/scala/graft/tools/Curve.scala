package graft.tools
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.LogRecord
import graft.stream._
import graft.util.Fs
import org.apache.spark.sql.SparkSession
object Curve {
  def main(args: Array[String]): Unit = {
    val base = Fs.tempDir("graft-curve")
    val cfg = ChangeLogConfig(seed = 42, nDocs = 300000, nTx = 600000,
      maxOpsPerTx = 32, interleave = 16, zipfAlpha = 1.5)
    def session(c: Int) = {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir",
          sys.env.getOrElse("GRAFT_TMPDIR", System.getProperty("java.io.tmpdir")))
        .config("spark.sql.adaptive.enabled", "true").getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    locally { val s = session(32); ChangeLogGen.writeLog(s, cfg, s"$base/log", 256); s.stop() }
    val chunksAll = Fs.listParquet(s"$base/log").sorted.grouped(64).toSeq
    for (c <- Seq(32, 16, 8, 4, 2, 32)) {
      val spark = session(c)
      val cdc = CdcConfig(s"$base/log", s"$base/t$c-${System.nanoTime()}", s"$base/k$c",
        numBuckets = 64, broadcastAssembly = false)
      val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
        cdc, ChangeLogGen.snapshotLsn)
      val times = chunksAll.zipWithIndex.map { case (chunk, i) =>
        val raw = spark.read.schema(LogRecord.schema).parquet(chunk: _*)
        val t0 = System.nanoTime()
        val st = CdcJob.processBatch(table, raw, i.toLong)
        (st.events, (System.nanoTime() - t0) / 1e9)
      }
      val best = times.map { case (e, s2) => e / s2 }.max
      println(f"== cores=$c best=${best}%.0f ev/s  batches=${times.map(t => f"${t._1 / t._2}%.0f").mkString(",")}")
      spark.stop()
    }
    Fs.deleteRecursively(base)
  }
}

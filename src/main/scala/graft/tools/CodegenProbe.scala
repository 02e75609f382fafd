package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (guide §1): how many NEW codegen units does each
  * successive engine apply batch compile? A structurally identical
  * per-batch plan should hit the codegen cache; every unit this probe
  * reports after batch 0 is a cache MISS caused by batch-varying
  * generated source (literals baked into code, unstable names, ...).
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-codegen-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def units(): Long = cg.METRIC_SOURCE_CODE_SIZE.getCount

    // per-job wall vs summed task time: separates scheduler/driver fixed
    // cost from executor work inside one tiny apply batch
    val jobLog = sys.env.contains("GRAFT_JOB_LOG")
    if (jobLog) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        private val taskNs = new java.util.concurrent.atomic.AtomicLong()
        private val tasks = new java.util.concurrent.atomic.AtomicInteger()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0.put(js.jobId, System.nanoTime()); taskNs.set(0); tasks.set(0)
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (te.taskInfo != null) {
            taskNs.addAndGet((te.taskInfo.finishTime - te.taskInfo.launchTime) * 1000000L)
            tasks.incrementAndGet(); ()
          }
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val w = (System.nanoTime() - t0.getOrDefault(je.jobId, System.nanoTime())) / 1e9
          println(f"      [job] ${je.jobId}%4d wall=$w%.3fs tasks=${tasks.get} taskSum=${taskNs.get / 1e9}%.3fs")
        }
      })
    val base = graft.util.Fs.tempDir("graft-cgprobe")
    try {
      // phase 1: the real batch-incremental path (tx assembly included),
      // one staged tx file per batch — the scd2/ivm harness shape
      import graft.changelog.ChangeLogGen
      val cfg = graft.changelog.ChangeLogConfig(nTx = 8, nDocs = 60, seed = 4242)
      val cdc = graft.stream.CdcConfig(s"$base/log", s"$base/tbl", s"$base/ckpt",
        numBuckets = 8)
      ChangeLogGen.stageBatchFiles(spark,
        (0L until cfg.nTx).map(i => ChangeLogGen.txRecords(cfg, i)), cdc.logDir)
      val table = graft.stream.CdcJob.snapshot(spark,
        ChangeLogGen.initialTable(spark, cfg).toDF(), cdc, ChangeLogGen.snapshotLsn)
      println(s"[probe] after snapshot: ${units()} units")
      val files = graft.util.Fs.listParquet(cdc.logDir).sorted
      files.zipWithIndex.foreach { case (f, j) =>
        val raw = spark.read.schema(graft.model.LogRecord.schema).parquet(f)
        val u0 = units()
        val t0 = System.nanoTime()
        graft.stream.CdcJob.processBatch(table, raw, j.toLong,
          broadcastAssembly = !sys.env.contains("GRAFT_PROBE_WINDOWED"))
        println(f"[probe] incr batch $j: ${(System.nanoTime() - t0) / 1e9}%.3f s, " +
          s"${units() - u0} new codegen units")
      }
      // phase 2: the Ivm maintainer loop driven MANUALLY (same
      // applyIvmBatch calls the SS wrapper makes) so per-trigger codegen
      // deltas are visible
      val vd = graft.stream.Ivm.ViewDef("source", Seq(
        "total_tok" -> col("n_tok").cast("long")))
      val srcT = graft.icelite.IceLite.load(spark, cdc.tableRoot)
      val head = srcT.refresh().snapshotId
      val rep = graft.icelite.IceLite.create(spark, s"$base/rep",
        srcT.refresh().schema, srcT.refresh().keyCol, numBuckets = 4)
      val pin = graft.stream.Replicate.bootstrap(spark, cdc.tableRoot, rep, Some(1L))
      val vCfg = graft.stream.CdcConfig(logDir = s"$base/view/_nolog",
        tableRoot = s"$base/view", checkpointDir = s"$base/view/_nockpt",
        keyCol = vd.groupCol, numBuckets = 2)
      val view = graft.stream.CdcJob.snapshot(spark,
        graft.stream.Ivm.aggregateOf(rep.read(), vd), vCfg, snapshotLsn = 0L)
      println(s"[probe] after ivm bootstrap: ${units()} units")
      // reflective dump of the codegen cache: (classloader-weakref, code)
      // keys — tells classloader-churn misses apart from source-text
      // misses
      def cacheKeys(): Seq[(Int, String)] = {
        val cg = Class.forName(
          "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
        val inst = cg.getField("MODULE$").get(null)
        val m = cg.getDeclaredMethod("cache")
        m.setAccessible(true)
        val cache = m.invoke(inst)
        // NonFateSharingLoadingCache exposes the shaded-guava cache via
        // loadingCache(); stay reflective (shaded package)
        val guava = cache.getClass.getMethod("loadingCache").invoke(cache)
        val asMapM = guava.getClass.getMethod("asMap")
        asMapM.setAccessible(true)
        val asMap = asMapM.invoke(guava).asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        import scala.jdk.CollectionConverters._
        asMap.keySet().asScala.toSeq.map { k =>
          val t = k.asInstanceOf[Tuple2[AnyRef, AnyRef]]
          val clRef = t._1 // HashableWeakReference -> the classloader
          val referent = clRef match {
            case wr: java.lang.ref.Reference[_] => wr.get().asInstanceOf[AnyRef]
            case other =>
              val g = other.getClass.getDeclaredField("ref")
              g.setAccessible(true)
              g.get(other) match {
                case wr2: java.lang.ref.Reference[_] => wr2.get().asInstanceOf[AnyRef]
                case x => x
              }
          }
          val code = t._2
          val bodyM = code.getClass.getMethod("body")
          val body = bodyM.invoke(code).asInstanceOf[String]
          (System.identityHashCode(referent), body.hashCode.toString + ":" + body.length)
        }
      }
      var from = pin
      var b = 0L
      var prevBodies = Set.empty[String]
      while (from < head) {
        val to = math.min(from + 2, head)
        val feed = srcT.changesBetween(from, to)
          .where(col(srcT.current.keyCol).isNotNull)
        val u0 = units()
        val t0 = System.nanoTime()
        graft.stream.Ivm.applyIvmBatch(view, rep, vd, feed, b, cdc.tableRoot)
        val keys = cacheKeys()
        val cls = keys.map(_._1).distinct
        val bodies = keys.map(_._2).toSet
        println(f"[probe] ivm trigger $b ($from->$to): ${(System.nanoTime() - t0) / 1e9}%.3f s, " +
          s"${units() - u0} new codegen units; cache=${keys.size} keys, " +
          s"${cls.size} classloaders, ${(bodies -- prevBodies).size} new bodies")
        prevBodies = bodies
        from = to; b += 1
      }
    } finally graft.util.Fs.deleteRecursively(base)
    spark.stop()
  }
}

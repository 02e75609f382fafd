package graft

import graft.icelite.IceLite
import graft.stream.{Ivm, Replicate}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Downstream-consumer entry point — the sink-connector process of the
  * reference ecosystem (a separate job tailing the connector's topic),
  * re-expressed over the engine's table-as-topic change feed:
  *
  * {{{
  * spark-submit --class graft.Consumer <jar> \
  *   --source-table /lake/docs --mode replicate \
  *   --dst /lake/docs_replica --checkpoint /ckpt/repl [--buckets 256]
  *
  * spark-submit --class graft.Consumer <jar> \
  *   --source-table /lake/docs --mode ivm \
  *   --replica /lake/docs_ivm_rep --view /lake/docs_by_source \
  *   --checkpoint /ckpt/ivm --group-col source \
  *   --sums "total_tok=n_tok;sum_chars=length(text)"
  * }}}
  *
  * Both modes are exactly-once from their own SS checkpoint and safe
  * to re-run (idempotent batch gates); `--continuous` keeps tailing
  * with a processing-time trigger instead of draining to now.
  */
object Consumer {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    def req(k: String): String =
      a.getOrElse(k, throw new IllegalArgumentException(s"missing --$k"))

    val spark = SparkSession.builder()
      .appName("graft-cdc-consumer")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srcRoot = req("source-table")
    val ckpt = req("checkpoint")
    val maxPerTrigger = a.getOrElse("max-versions-per-trigger", "64").toLong
    val bootstrapAt = a.get("bootstrap-at-version").map(_.toLong)

    a.getOrElse("mode", "replicate") match {
      case "replicate" =>
        val dstRoot = req("dst")
        // create-if-missing with the source's schema/key; an existing
        // replica resumes from its checkpoint
        val dst = IceLite.readLatest(dstRoot) match {
          case Some(_) => IceLite.load(spark, dstRoot)
          case None =>
            val s = IceLite.load(spark, srcRoot).refresh()
            IceLite.create(spark, dstRoot, s.schema, s.keyCol,
              a.getOrElse("buckets", s.numBuckets.toString).toInt)
        }
        if (a.getOrElse("continuous", "false").toBoolean) {
          val q = Replicate.stream(spark, srcRoot, dst, ckpt,
            maxVersionsPerTrigger = maxPerTrigger, availableNow = false)
          q.awaitTermination()
        } else
          Replicate.replicate(spark, srcRoot, dst, ckpt,
            maxVersionsPerTrigger = maxPerTrigger,
            bootstrapAtVersion = bootstrapAt)
        println(s"replicate: ${IceLite.load(spark, dstRoot).refresh().snapshotId}")

      case "ivm" =>
        // --sums "name=sqlExpr;name2=sqlExpr" over the source payload row
        val sums = req("sums").split(";").toSeq.map { e =>
          e.split("=", 2) match {
            case Array(n, sql) if n.trim.nonEmpty && sql.trim.nonEmpty =>
              n.trim -> expr(sql.trim)
            case _ => throw new IllegalArgumentException(
              s"--sums entry '$e' is not <name>=<sql expr>")
          }
        }
        val vd = Ivm.ViewDef(req("group-col"), sums)
        val (_, view) = Ivm.maintain(spark, srcRoot, vd,
          req("replica"), req("view"), ckpt,
          replicaBuckets = a.getOrElse("buckets", "64").toInt,
          viewBuckets = a.getOrElse("view-buckets", "4").toInt,
          maxVersionsPerTrigger = maxPerTrigger,
          bootstrapAtVersion = bootstrapAt)
        println(s"ivm view: v${view.refresh().snapshotId} " +
          s"rows=${view.read().count()}")

      case other => throw new IllegalArgumentException(
        s"unknown --mode '$other' (replicate | ivm)")
    }
  }
}

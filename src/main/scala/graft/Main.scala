package graft

import graft.stream._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Production entry point — `spark-submit --class graft.Main <jar>
  * --log-dir ... --table ... --checkpoint ... [options]`.
  *
  * Runs the reference connector's lifecycle (snapshot-then-stream,
  * `InformixConnectorTask.java:84-195`): ensure the sink table per the
  * snapshot mode, then tail the change log continuously, applying each
  * micro-batch via the merge-on-read MERGE with exactly-once commits.
  * On a cluster, parallelism comes from executors; nothing in the job
  * is local-mode specific.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    def req(k: String): String =
      a.getOrElse(k, throw new IllegalArgumentException(s"missing --$k"))

    val spark = SparkSession.builder()
      .appName("graft-cdc-ingest")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = CdcConfig(
      logDir = req("log-dir"),
      tableRoot = req("table"),
      checkpointDir = req("checkpoint"),
      keyCol = a.getOrElse("key-col", "doc_id"),
      numBuckets = a.getOrElse("buckets", "256").toInt,
      maxFilesPerTrigger = a.getOrElse("max-files-per-trigger", "32").toInt,
      snapshotMode = SnapshotMode.withName(a.getOrElse("snapshot-mode", "WhenNeeded")),
      broadcastAssembly = a.getOrElse("broadcast-assembly", "false").toBoolean,
      tableInclude = a.get("tables").map(_.split(",").toSeq),
      // regex capture filters (F1/F2 parity with the reference's
      // table.include.list / table.exclude.list / column.exclude.list)
      filters = CaptureFilters(
        tableIncludeRegex = a.get("table-include-regex").map(_.split(",").toSeq),
        tableExcludeRegex = a.get("table-exclude-regex")
          .map(_.split(",").toSeq).getOrElse(Nil),
        columnExcludeRegex = a.get("column-exclude-regex")
          .map(_.split(",").toSeq).getOrElse(Nil)),
      // --transforms "col=mask:8,col2=sha256:SALT,col3=truncate:10" (F3)
      columnTransforms = a.get("transforms").map(_.split(",").map { kv =>
        val Array(c, spec) = kv.split("=", 2); c -> spec
      }.toMap).getOrElse(Map.empty),
      // Filter-SMT analog: SQL predicate over the after image, e.g.
      // --row-filter "after.n_tok >= 32" (ingest-time quality gate)
      rowFilter = a.get("row-filter").map(org.apache.spark.sql.functions.expr),
      // snapshot.select.statement.overrides analog: WHERE clause applied
      // to the snapshot source only, e.g. --snapshot-where "n_tok >= 8"
      snapshotOverride = a.get("snapshot-where").map(sql =>
        (df: org.apache.spark.sql.DataFrame) =>
          df.where(org.apache.spark.sql.functions.expr(sql))),
      // --skipped-operations "d,t" (skipped.operations analog)
      skippedOperations = a.get("skipped-operations")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .filterNot(_ == Set("none")).getOrElse(Set.empty),
      // --message-key-columns "tableRegex:col1,col2;otherRegex:col3"
      messageKeyColumns = a.get("message-key-columns").map(_.split(";").toSeq.map { e =>
        e.split(":", 2) match {
          case Array(re, cols) if re.trim.nonEmpty =>
            // validate the PARSED list: 're:,' or 're: ' would pass a
            // raw-string check but yield empty/blank columns -> every
            // record keyed "" (or a deep AnalysisException mid-stream)
            val cs = cols.split(",").map(_.trim).toSeq
            if (cs.isEmpty || cs.exists(_.isEmpty)) throw new IllegalArgumentException(
              s"--message-key-columns entry '$e' has an empty column name")
            re.trim -> cs
          case _ => throw new IllegalArgumentException(
            s"--message-key-columns entry '$e' is not <tableRegex>:<col1>,<col2>")
        }
      }).getOrElse(Nil),
      // --topic-regex / --topic-replacement (ByLogicalTableRouter analog)
      topicRouting = for {
        re <- a.get("topic-regex"); repl <- a.get("topic-replacement")
      } yield (re, repl),
      // ContentBasedRouter analog: SQL expression over the emitted
      // record; non-null result reroutes, e.g.
      // --content-route "CASE WHEN after.n_tok > 4096 THEN 'cdc.long' END"
      contentRouting = a.get("content-route").map(org.apache.spark.sql.functions.expr),
      signalDir = a.get("signal-dir"),
      // emitted-record sink + its parity switches (E1/E2/E5)
      emitDir = a.get("emit-dir"),
      tombstonesOnDelete = a.getOrElse("tombstones-on-delete", "true").toBoolean,
      // ExtractNewRecordState in the sink chain: emitted records as flat
      // rows (delete rewrite + __deleted, tombstones dropped)
      emitFlatten = a.getOrElse("emit-flatten", "false").toBoolean,
      // Debezium Kafka wire format: (topic, key JSON, value JSON) records
      emitWire = a.getOrElse("emit-wire", "false").toBoolean,
      returnEmptyTransactions =
        a.getOrElse("return-empty-transactions", "false").toBoolean,
      // concurrent compaction (recommended on): folds run on the
      // maintenance daemon, off the batch latency path
      asyncCompaction = a.getOrElse("async-compaction", "true").toBoolean,
      // heartbeat.action.query analog: side-effect SQL per micro-batch
      heartbeatActionSql = a.get("heartbeat-action-sql"),
      // stateful-assembly poison-tx handling (used by the stateful path)
      maxTxRecords = a.getOrElse("max-tx-records",
        StatefulAssembly.DefaultMaxBufferedPerTx.toString).toInt,
      dlqDir = a.get("dlq-dir"))

    val source = a.get("source")
      .map(p => spark.read.parquet(p))
      .getOrElse(spark.emptyDataFrame)
    val snapshotLsn = a.getOrElse("snapshot-lsn", "0").toLong
    val table = CdcJob.ensureTable(spark, source, cfg, snapshotLsn)

    if (cfg.snapshotMode == SnapshotMode.InitialOnly) {
      println(s"snapshot-only run complete: v${table.current.snapshotId}")
      return
    }
    // R4 — offset validity on restart: if the checkpointed offset
    // predates the log's retained floor, recover via a reconciling
    // re-snapshot from the provided current source view (when_needed),
    // or fail fast inside CdcJob.stream otherwise.
    if (!CdcJob.validateRestartOffset(table, cfg) && a.contains("source")) {
      val did = CdcJob.validateOrResnapshot(table, cfg, source, snapshotLsn)
      if (did) println(s"R4 recovery: reconciling re-snapshot at pin $snapshotLsn")
    }
    val trigger = a.get("trigger-seconds") match {
      case Some(s) => Trigger.ProcessingTime(s.toLong * 1000L)
      case None => Trigger.AvailableNow()
    }
    // --assembly stateful: flatMapGroupsWithState transaction assembly
    // for logs with no commit-boundary alignment (state survives in the
    // SS state store; poison txs fail fast or quarantine per --dlq-dir)
    // --source-format wire: --log-dir points at a Debezium-JSON topic
    // dump (reference wire format) instead of a native change log;
    // optional --topic-include "re1;re2" scopes the subscription
    // (';'-separated — a comma is a legal regex char, e.g. {1,3})
    val q = a.getOrElse("source-format", "log") match {
      case "wire" =>
        // signals drive the NATIVE snapshot machinery; a wire consumer
        // has no snapshot source to chunk — fail fast, not silently
        require(cfg.signalDir.isEmpty,
          "--signal-dir is not supported with --source-format wire " +
            "(signals drive native snapshot chunks; a wire consumer has none)")
        WireSource.stream(spark, table, cfg, trigger,
          topicInclude = a.get("topic-include")
            .map(_.split(";").map(_.trim).filter(_.nonEmpty).toSeq))
      case _ => a.getOrElse("assembly", "batch") match {
        case "stateful" => StatefulAssembly.stream(spark, table, cfg, trigger)
        case _ => CdcJob.stream(spark, table, cfg, trigger)
      }
    }
    q.awaitTermination()
  }
}

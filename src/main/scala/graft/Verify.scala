package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_ONLY: comma-separated query subset; "NONE" = just the
    // oracle SQL dump (local oracle-iteration tool; driver runs all)
    val only = sys.env.get("GRAFT_VERIFY_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(o => o.contains(name)))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Aux oracle inputs: the engine-replay query runs the REAL engine on
    // a deterministically generated log; the same log + seed table are
    // dumped here so its DuckDB oracle replays the identical records.
    // Kept OUTSIDE outDir (fixed tmp path) so the driver's result-dir
    // scan sees only query dumps; {AUX} in the SQL resolves to it.
    val auxDir = Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_verify_aux")
      .toAbsolutePath.toString
    locally {
      import graft.changelog.ChangeLogGen
      import spark.implicits._
      val cfg = SparkEntry.EngineReplayCfg
      ChangeLogGen.writeLog(spark, cfg, s"$auxDir/engine_log", numFiles = 2)
      ChangeLogGen.initialTable(spark, cfg).toDF()
        .write.mode("overwrite").parquet(s"$auxDir/engine_seed")
      // the join-view maintainer's dim source: its log + seed, dumped so
      // the cdc_ivm_join oracle replays the dim state the same way
      SparkEntry.IvmDimLog.toDS().toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$auxDir/ivm_dim_log")
      SparkEntry.IvmDimSeed.toDS().toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$auxDir/ivm_dim_seed")
      // the incremental-SCD2 fixture's dedicated log + seed (one tx per
      // engine batch in the pipeline; the dump layout is irrelevant to
      // the oracle, which re-derives commits from the records)
      val s2 = SparkEntry.Scd2IncCfg
      ChangeLogGen.logRecords(spark, s2).toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$auxDir/scd2_log")
      ChangeLogGen.initialTable(spark, s2).toDF()
        .write.mode("overwrite").parquet(s"$auxDir/scd2_seed")
      // the E9 batching fixture's log, tagged with each record's
      // micro-batch number under the one-file-per-tx staging
      SparkEntry.e9LogDump(spark).coalesce(1)
        .write.mode("overwrite").parquet(s"$auxDir/e9_log")
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{AUX}", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

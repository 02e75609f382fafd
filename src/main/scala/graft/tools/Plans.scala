package graft.tools
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.LogRecord
import graft.stream._
import graft.util.Fs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // AQE off for the dumps: the adaptive wrapper prints the INITIAL plan
    // (exchange reuse not yet applied), which over-counts exchanges
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val base = Fs.tempDir("graft-plans")
    val cfg = ChangeLogConfig(nTx = 2000, nDocs = 1000)
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 16)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 4)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(), cdc, 0L)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 2)
    val raw = spark.read.schema(LogRecord.schema).parquet(cdc.logDir)

    println("########## PLAN 1: assemble (windowed) ##########")
    TxAssembler.assemble(raw).explain("formatted")
    println("########## PLAN 2: assemble (broadcast) ##########")
    TxAssembler.assembleBroadcast(raw).explain("formatted")
    println("########## PLAN 3: readMerged (bucket-pruned, with deltas) ##########")
    table.readMerged(Seq(0, 1)).explain("formatted")
    println("########## PLAN 4: read() user view ##########")
    table.read().explain("formatted")
    println("########## PLAN 5: a query with filter pushdown (f2) ##########")
    graft.SparkEntry.queries("f2_column_projection")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("########## PLAN 6: dedup groupBy (LWW core) ##########")
    val ev = TxAssembler.assemble(raw)
    ev.withColumn("__key", coalesce(col("after.doc_id"), col("before.doc_id")))
      .repartition(16, col("__key")).groupBy("__key")
      .agg(max_by(struct(col("op"), col("after")), struct(col("commit_lsn"), col("change_lsn"))).as("w"))
      .explain("formatted")
    println("########## PLAN 7: DSv2 merged read (KeyGroupedPartitioning, zero exchange) ##########")
    graft.icelite.dsv2.IceLiteV2.readMerged(spark, table.root).explain("formatted")
    println("########## PLAN 8: DSv2 SPJ self-join on the key (zero exchange) ##########")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val va = graft.icelite.dsv2.IceLiteV2.readRaw(spark, table.root)
      .select(col("doc_id"), col("n_tok"))
    val vb = graft.icelite.dsv2.IceLiteV2.readRaw(spark, table.root)
      .select(col("doc_id"), col("tokens"))
    va.join(vb, Seq("doc_id")).explain("formatted")
    println("########## PLAN 9: DSv2 point read (bucket pruning from key predicate) ##########")
    graft.icelite.dsv2.IceLiteV2.readRaw(spark, table.root)
      .where(col("doc_id") === ChangeLogGen.docId(0L)).explain("formatted")
    println("########## PLAN 10: decontaminate (broadcast eval shingles — corpus never shuffled by the join) ##########")
    graft.SparkEntry.queries("decontaminate")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("########## PLAN 11: stratified sample (pure codegen filter, no shuffle) ##########")
    graft.SparkEntry.queries("sample_stratified")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("########## PLAN 12: KMV distinct sketch (ObjectHashAggregate, bounded state) ##########")
    graft.SparkEntry.queries("sketch_distinct")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("########## PLAN 13: repetition signals (shuffle-free per-doc projection) ##########")
    graft.SparkEntry.queries("text_repetition")(spark, "/root/testdata/sf0.001").explain("formatted")
    println("########## PLAN 14: incremental dedup probe (bucket-pruned index read, batch broadcast) ##########")
    locally {
      val idxRoot = graft.util.Fs.tempDir("graft-plan-idx")
      val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val idx = graft.ops.DedupIndex.create(spark, s"$idxRoot/idx", corpus, numBuckets = 16)
      graft.ops.DedupIndex.probe(idx, corpus.where(col("doc_id") < 3)).explain("formatted")
      graft.util.Fs.deleteRecursively(idxRoot)
    }
    println("########## PLAN 15: unigram LM score (two map-side-combined passes, word-key join) ##########")
    graft.SparkEntry.queries("text_lm_score")(spark, "/root/testdata/sf0.001").explain("formatted")
    Fs.deleteRecursively(base)
    spark.stop()
  }
}

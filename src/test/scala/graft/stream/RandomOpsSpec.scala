package graft.stream

import graft.SparkSpec
import graft.model.{LogRecord, TokenDoc}
import graft.util.Fs
import scala.collection.mutable
import scala.util.Random

/** Generative property test: fully random op sequences (not the
  * structured generator) replayed through the engine must equal the
  * sequential ReplayOracle. Stresses edge combinations the structured
  * log rarely produces: one key updated many times inside one tx,
  * delete-then-reinsert within a tx, interleaved open transactions,
  * discards cancelling earlier ops, empty and rolled-back txs, ops on
  * never-seen keys.
  */
class RandomOpsSpec extends SparkSpec {

  private def randomLog(seed: Long, nTx: Int, nKeys: Int): Seq[LogRecord] = {
    val rnd = new Random(seed)
    var lsn = 1L << 33 // beyond the snapshot floor
    def nextLsn(): Long = { lsn += 1 + rnd.nextInt(3); lsn }
    val out = mutable.ArrayBuffer[LogRecord]()
    // up to 4 concurrently open txs, records interleaved
    val open = mutable.ArrayBuffer[(Long, mutable.ArrayBuffer[LogRecord])]()
    var txId = 0L
    var started = 0
    while (started < nTx || open.nonEmpty) {
      val act = rnd.nextInt(10)
      if ((act < 3 && started < nTx && open.size < 4) || open.isEmpty && started < nTx) {
        txId += 1; started += 1
        val buf = mutable.ArrayBuffer[LogRecord]()
        buf += LogRecord(nextLsn(), txId, "B", -1L, "t", None, None, 0L)
        open += ((txId, buf))
      } else if (act < 8 && open.nonEmpty) {
        val (tid, buf) = open(rnd.nextInt(open.size))
        val k = s"k${rnd.nextInt(nKeys)}"
        rnd.nextInt(10) match {
          case x if x < 6 =>
            val toks = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(1000))
            buf += LogRecord(nextLsn(), tid, if (rnd.nextBoolean()) "u" else "c", -1L, "t",
              Some(TokenDoc(k, Seq.empty, 0, "cdc")),
              Some(TokenDoc(k, toks, toks.size, "cdc")), 0L)
          case x if x < 8 =>
            buf += LogRecord(nextLsn(), tid, "d", -1L, "t",
              Some(TokenDoc(k, Seq.empty, 0, "cdc")), None, 0L)
          case 8 if buf.size > 2 => // savepoint discard of the last few ops
            val from = buf(1 + rnd.nextInt(buf.size - 1)).lsn
            buf += LogRecord(nextLsn(), tid, "D", from, "t", None, None, 0L)
          case _ =>
            val toks = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(1000))
            buf += LogRecord(nextLsn(), tid, "u", -1L, "t",
              Some(TokenDoc(k, Seq.empty, 0, "cdc")),
              Some(TokenDoc(k, toks, toks.size, "cdc")), 0L)
        }
      } else if (open.nonEmpty) {
        val i = rnd.nextInt(open.size)
        val (tid, buf) = open.remove(i)
        buf += LogRecord(nextLsn(), tid, if (rnd.nextInt(5) == 0) "R" else "C", -1L, "t",
          None, None, 0L)
        out ++= buf
      }
    }
    out.toSeq.sortBy(_.lsn)
  }

  test("random op sequences: engine state equals sequential oracle (5 seeds)") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val log = randomLog(seed * 1000L + 7, nTx = 120, nKeys = 25)
      val base = Fs.tempDir(s"graft-rand$seed")
      val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4)
      // write log in 3 arbitrary slices (tx boundaries respected by
      // slicing whole transactions: slice on closed-tx prefix points)
      val closedAt = log.zipWithIndex.collect {
        case (r, i) if r.op == "C" || r.op == "R" => i
      }
      val cut1 = closedAt(closedAt.size / 3)
      val cut2 = closedAt(2 * closedAt.size / 3)
      // a slice must contain whole txs: include all records of txs whose
      // CLOSE falls in the slice
      val closesInSlice = Seq(
        log.take(cut1 + 1).filter(r => r.op == "C" || r.op == "R").map(_.tx_id).toSet,
        log.slice(cut1 + 1, cut2 + 1).filter(r => r.op == "C" || r.op == "R").map(_.tx_id).toSet,
        log.drop(cut2 + 1).filter(r => r.op == "C" || r.op == "R").map(_.tx_id).toSet)
      closesInSlice.zipWithIndex.foreach { case (txs, i) =>
        log.filter(r => txs.contains(r.tx_id)).toDS().toDF()
          .coalesce(1).write.parquet(s"${cdc.logDir}/slice=$i")
      }
      val table = CdcJob.snapshot(spark,
        spark.emptyDataset[TokenDoc].toDF(), cdc, 0L)
      CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
      val want = ReplayOracle.replay(Map.empty, log, 0L)
      val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
      assert(got.keySet == want.keySet,
        s"seed=$seed extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
      want.foreach { case (k, w) =>
        assert(got(k).tokens == w.tokens, s"seed=$seed tokens mismatch $k") }
      Fs.deleteRecursively(base)
    }
  }
}

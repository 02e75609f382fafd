package graft.stream

import graft.model.{LogRecord, TokenDoc}
import scala.collection.mutable

/** The executable spec: a naive single-threaded replay of the raw log,
  * implementing exactly the reference's transaction state machine
  * (`DbzTransactionEngine.java:88-156`) and apply semantics, in
  * (commit_lsn, change_lsn) order. Tests compare the engine's final
  * table state (per-doc_id token arrays) against this — the analog of
  * the reference IT suite's consume-and-assert golden checks.
  *
  * Driver-side only; never used in a Spark plan.
  */
object ReplayOracle {

  /** Replay records (any order given) on top of `initial`, applying only
    * transactions that commit with commit_lsn > fromLsn. Returns final
    * key -> row state.
    */
  def replay(
      initial: Map[String, TokenDoc],
      records: Seq[LogRecord],
      fromLsn: Long = -1L
  ): Map[String, TokenDoc] = {
    val log = records.sortBy(_.lsn)
    // tx_id -> buffered ops (in lsn order)
    val open = mutable.Map[Long, mutable.ArrayBuffer[LogRecord]]()
    val state = mutable.Map[String, TokenDoc]() ++ initial

    def applyOp(r: LogRecord): Unit = r.op match {
      case "c" | "u" =>
        val d = r.after.get
        state(d.doc_id) = d
      case "d" =>
        state.remove(r.before.get.doc_id)
      case "t" =>
        state.clear()
      case _ => ()
    }

    log.foreach { r =>
      r.op match {
        case "B" => open(r.tx_id) = mutable.ArrayBuffer.empty
        case "c" | "u" | "d" | "t" =>
          open.getOrElseUpdate(r.tx_id, mutable.ArrayBuffer.empty) += r
        case "D" => // savepoint discard: drop buffered records with lsn >= discard_from
          open.get(r.tx_id).foreach(buf => buf.filterInPlace(_.lsn < r.discard_from))
        case "R" => open.remove(r.tx_id) // rollback: discard everything
        case "C" =>
          val ops = open.remove(r.tx_id).getOrElse(mutable.ArrayBuffer.empty)
          if (r.lsn > fromLsn) ops.foreach(applyOp) // commit-LSN replay skip
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
    }
    state.toMap
  }
}

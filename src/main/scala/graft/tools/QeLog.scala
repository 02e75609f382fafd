package graft.tools

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Diagnostic QueryExecutionListener (guide §1/§7.3): one line per
  * completed action with the wall duration and the driver's
  * QueryPlanningTracker phase breakdown (parsing / analysis /
  * optimization / planning, ms) — separates "the driver planned for
  * 300 ms" from "the tasks ran for 300 ms", which per-micro-batch
  * harness cells cannot tell apart from the outside. Attach with
  * `spark.sql.queryExecutionListeners=graft.tools.QeLog` (BenchExtra
  * does when GRAFT_QE_LOG=1; each newSession builds its own instance
  * from the static conf, so engine-harness sessions are covered).
  * Diagnostics only — never on a measured bench path.
  */
class QeLog extends QueryExecutionListener {
  private def line(funcName: String, qe: QueryExecution, durationNs: Long,
      err: String): Unit = {
    val phases = qe.tracker.phases.map { case (k, v) =>
      f"$k=${v.durationMs}ms"
    }.toSeq.sorted.mkString(" ")
    val rules = qe.tracker.topRulesByTime(3).map { case (r, s) =>
      f"${r.substring(r.lastIndexOf('.') + 1)}:${s.totalTimeNs / 1000000}ms"
    }.mkString(" ")
    println(f"      [qe] $funcName ${durationNs / 1e9}%.3fs $phases top[$rules]$err")
  }
  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    line(funcName, qe, durationNs, "")
  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    line(funcName, qe, 0L, s" FAILED: ${exception.getMessage}")
}

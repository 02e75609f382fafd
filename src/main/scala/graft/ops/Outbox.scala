package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outbox event router — the engine form of Debezium's outbox SMT
  * (behavior pinned by the reference's `OutboxEventRouterIT`): CREATE
  * events on the outbox table are re-shaped into routed records whose
  * topic derives from the route-by column (`route.topic.replacement`,
  * default `outbox.event.<routedByValue>`), key = the aggregate id
  * column, value = the payload column, with the outbox row id carried
  * as the event id header. Updates/deletes on an outbox are not routed
  * (the reference treats an outbox as append-only; deletes are the
  * cleanup of delivered rows).
  *
  * Pure projection + filter — codegen'd, shuffle-free, safe at any
  * scale (the router adds no exchange to whatever plan feeds it).
  */
object Outbox {

  val TopicToken = "{routedByValue}"

  def route(
      events: DataFrame,
      table: String = "outbox",
      routeBy: String = "aggregatetype",
      keyField: String = "aggregateid",
      payloadField: String = "payload",
      idField: String = "id",
      topicReplacement: String = s"outbox.event.$TopicToken"
  ): DataFrame = {
    val parts = topicReplacement.split(java.util.regex.Pattern.quote(TopicToken), -1)
    require(parts.length == 2,
      s"topicReplacement must contain $TopicToken exactly once: $topicReplacement")
    def af(f: String): Column = col("after").getField(f)
    events
      .where(col("op") === "c" && col("table") === table)
      .select(
        concat(lit(parts(0)), af(routeBy).cast("string"), lit(parts(1))).as("topic"),
        af(keyField).cast("string").as("key"),
        af(idField).cast("string").as("event_id"),
        af(payloadField).as("payload"),
        col("commit_lsn"),
        col("change_lsn"))
  }
}

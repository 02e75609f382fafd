package graft.stream

import graft.SparkSpec
import graft.util.Fs

/** Funnel CEP corners on a designed stream: conversion picks the FIRST
  * qualifying B, one verdict per user, B-before-A ignored, the window
  * boundary excludes, abandonment fires off the event-time timer, and
  * the pattern spans micro-batches. Window 8000 ms, delay 2003 ms.
  */
class FunnelSpec extends SparkSpec {

  test("designed corners: first-B conversion, boundary, abandonment, cross-batch, one verdict") {
    implicit val s = spark.newSession()
    import s.implicits._
    val base = Fs.tempDir("graft-funnel-spec")
    try {
      val batch0 = Seq(
        (1L, "A", 1001L), (1L, "B", 5002L),          // converts in-batch
        (2L, "A", 1001L), (2L, "B", 9002L),          // 9002 > 9001: outside -> abandoned
        (3L, "B", 1002L),                            // B before any A: no verdict
        (4L, "A", 1001L), (4L, "A", 2001L), (4L, "B", 8998L), // first A wins
        (6L, "A", 1001L), (6L, "B", 3002L), (6L, "B", 5002L), // first qualifying B wins
        (7L, "A", 19997L),                           // arms near the segment edge
        (8L, "A", 1001L), (8L, "B", 5002L)           // converts, then tries again below
      ).toDF("u", "step", "m")
      val batch1 = Seq(
        (5L, "A", 21001L), (5L, "B", 25002L),        // second-batch funnel
        (7L, "B", 21002L),                           // cross-batch conversion (<= 27997)
        (8L, "A", 30001L), (8L, "B", 32002L)         // done: must not re-emit
      ).toDF("u", "step", "m")
      Funnel.stage(s, Seq(batch0, batch1), s"$base/staged")
      val rows = Funnel.run(s, s"$base/staged", s"$base/work").collect()
      val got = rows
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      assert(got == Map(
        1L -> ((1001L, 5002L, "converted")),
        2L -> ((1001L, -1L, "abandoned")),
        4L -> ((1001L, 8998L, "converted")),
        5L -> ((21001L, 25002L, "converted")),
        6L -> ((1001L, 3002L, "converted")),
        7L -> ((19997L, 21002L, "converted")),
        8L -> ((1001L, 5002L, "converted"))), s"got $got")
      // exactly one verdict per user — no duplicate emissions anywhere
      assert(rows.length == 7, s"expected 7 verdict rows, got ${rows.length}")
    } finally Fs.deleteRecursively(base)
  }
}

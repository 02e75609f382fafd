package graft.stream

import graft.SparkSpec
import graft.util.Fs

/** MapState session-profile corners on a designed stream: in-handler
  * split when the gap arrives before the watermark, timer close with
  * reschedule-on-every-event, cross-batch session extension, top-type
  * tie broken on the name, and no double emission when the timer and
  * the splitting event land in the same micro-batch.
  */
class SessionProfileSpec extends SparkSpec {

  test("designed corners: split, tie-break, cross-batch extend, timer + input in one batch") {
    implicit val s = spark.newSession()
    import s.implicits._
    val base = Fs.tempDir("graft-sprofile-spec")
    try {
      val batch0 = Seq(
        (1L, "view", 1001L), (1L, "click", 1005L), (1L, "click", 2001L),
        (1L, "buy", 10001L), // in-handler split: gap 8000 >= 2002
        (2L, "view", 1001L), (2L, "buy", 1005L), // 1-1 tie -> 'buy' (name order)
        (3L, "view", 19997L), // extends across the batch boundary below
        (4L, "err", 15001L) // closes via TIMER in batch 1 (wm 17994 > 17003)
      ).toDF("u", "typ", "m")
      val batch1 = Seq(
        (3L, "view", 21001L), // gap 1004 < 2002: SAME session, rescheduled
        (4L, "view", 21005L) // same batch as u4's timer close: no double emit
      ).toDF("u", "typ", "m")
      SessionProfile.stage(s, Seq(batch0, batch1), s"$base/staged")
      val raw = SessionProfile.run(s, s"$base/staged", s"$base/work").collect()
      assert(raw.length == 6, s"expected 6 profile rows, got ${raw.length}")
      val rows = raw
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getString(4))).toMap
      assert(rows == Map(
        (1L, 1001L) -> ((3L, 2L, "click")),
        (1L, 10001L) -> ((1L, 1L, "buy")),
        (2L, 1001L) -> ((2L, 2L, "buy")),
        (3L, 19997L) -> ((2L, 1L, "view")),
        (4L, 15001L) -> ((1L, 1L, "err")),
        (4L, 21005L) -> ((1L, 1L, "view"))), s"got $rows")
      assert(rows.size == 6)
    } finally Fs.deleteRecursively(base)
  }
}

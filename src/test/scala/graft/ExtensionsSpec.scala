package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions plug-in: a session built with
  * GraftExtensions has the engine functions with zero registration code.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects lww_max_by, cosine_sim and kmv_sketch into a new session") {
    val orig = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions).getOrCreate()
      val cos = s2.sql(
        "SELECT cosine_sim(array(cast(0.6 as float), cast(0.8 as float)), " +
          "array(cast(0.6 as float), cast(0.8 as float))) AS c").collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      import s2.implicits._
      Seq(("a", 1L, 1L, 10), ("a", 2L, 1L, 20), ("b", 5L, 0L, 7))
        .toDF("k", "vc", "vl", "v").createOrReplaceTempView("graft_ext_t")
      val got = s2.sql(
        "SELECT k, lww_max_by(struct(v), vc, vl).v AS top FROM graft_ext_t GROUP BY k")
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == Map("a" -> 20, "b" -> 7))
      // kmv_sketch: 3 distinct values, k=8 -> exact branch
      val sk = s2.sql(
        "SELECT kmv_sketch(h, 8) AS s FROM (SELECT (id % 3) * 1000 AS h " +
          "FROM range(100))").collect()(0).getStruct(0)
      assert(sk.getLong(0) == 3 && sk.getLong(1) == 2000L)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("RangeJoinRule rewrites point-in-interval BNLJ joins to the bucketed equi-join") {
    val orig = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions).getOrCreate()
      import java.sql.Timestamp
      import s2.implicits._
      def ts(sec: Long) = new Timestamp(sec * 1000L)
      val pts = Seq((1L, ts(100)), (2L, ts(160)), (3L, ts(220)), (4L, ts(221)), (5L, ts(99)))
        .toDF("pt_id", "ts")
      val ivs = Seq((10L, ts(100), ts(220)), (11L, ts(150), ts(170)))
        .toDF("iv_id", "lo", "hi")
      val expected = Set((1L, 10L), (2L, 10L), (3L, 10L), (2L, 11L))
      def pairsOf(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
        df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // point side left AND right; both written operand orders
      val j1 = pts.join(ivs, pts("ts") >= ivs("lo") && pts("ts") <= ivs("hi"))
      val j2 = ivs.join(pts, ivs("lo") <= pts("ts") && ivs("hi") >= pts("ts"))
      Seq(j1 -> "j1", j2 -> "j2").foreach { case (j, tag) =>
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
          s"$tag planned a nested loop:\n$plan")
        assert(plan.contains("__graft_rb"), s"$tag missed the rewrite")
        assert(pairsOf(j, "pt_id", "iv_id") == expected, tag)
      }
      // column set and order preserved by the rewrite
      assert(j1.columns.toSeq == Seq("pt_id", "ts", "iv_id", "lo", "hi"))
      assert(j2.columns.toSeq == Seq("iv_id", "lo", "hi", "pt_id", "ts"))
      // inverted interval (dirty data): no rows, no runtime error
      val bad = Seq((12L, ts(500), ts(300))).toDF("iv_id", "lo", "hi")
      val jBad = pts.join(bad, pts("ts") >= bad("lo") && pts("ts") <= bad("hi"))
      assert(jBad.queryExecution.executedPlan.toString.contains("__graft_rb"))
      assert(jBad.count() == 0)
      // an equi conjunct disables the rewrite (conservative matching)
      val j3 = pts.join(ivs,
        pts("pt_id") === ivs("iv_id") && pts("ts") >= ivs("lo") && pts("ts") <= ivs("hi"))
      assert(!j3.queryExecution.executedPlan.toString.contains("__graft_rb"))
      // bucketSec=0 disables the rule entirely
      s2.conf.set("spark.graft.rangeJoin.bucketSec", "0")
      val j4 = pts.join(ivs, pts("ts") >= ivs("lo") && pts("ts") <= ivs("hi"))
      assert(!j4.queryExecution.executedPlan.toString.contains("__graft_rb"))
      assert(pairsOf(j4, "pt_id", "iv_id") == expected)
      s2.conf.unset("spark.graft.rangeJoin.bucketSec")
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}

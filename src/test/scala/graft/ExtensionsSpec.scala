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
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ExtractNewRecordState analog: envelope flattening under the three
  * delete.handling modes, tombstone dropping, and metadata add.fields.
  */
class UnwrapSpec extends SparkSpec {

  // a 4-record envelope stream: create, update, delete (+ its
  // tombstone), with distinct before/after images so the spec can tell
  // WHICH image a flattened row came from
  private def envelopes = {
    import spark.implicits._
    Seq(
      ("c", "t1", 10L, null.asInstanceOf[(String, Long)], ("v1", 1L)),
      ("u", "t1", 20L, ("v1", 1L), ("v2", 2L)),
      ("d", "t1", 30L, ("v2", 2L), null.asInstanceOf[(String, Long)]),
      ("tombstone", "t1", 30L, null.asInstanceOf[(String, Long)],
        null.asInstanceOf[(String, Long)])
    ).toDF("op", "table", "commit_lsn", "before", "after")
      .withColumn("before", when(col("before").isNotNull,
        struct(col("before._1").as("val"), col("before._2").as("ver"))))
      .withColumn("after", when(col("after").isNotNull,
        struct(col("after._1").as("val"), col("after._2").as("ver"))))
  }

  test("rewrite: deletes flatten the before image with __deleted=true; tombstones drop") {
    import spark.implicits._
    val out = Unwrap.flatten(envelopes,
        addFields = Seq("op" -> "op", "commit_lsn" -> "lsn"))
      .orderBy("__lsn")
      .as[(String, Long, String, String, Long)].collect()
    assert(out.toSeq == Seq(
      ("v1", 1L, "false", "c", 10L),
      ("v2", 2L, "false", "u", 20L),
      ("v2", 2L, "true", "d", 30L))) // before image resurrected
  }

  test("drop: deletes and tombstones vanish; no __deleted column") {
    val out = Unwrap.flatten(envelopes, deleteMode = Unwrap.DeleteDrop,
      addFields = Seq("op" -> "op"))
    assert(!out.columns.contains("__deleted"))
    assert(out.select("__op").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet == Set("c", "u"))
  }

  test("none: deletes flatten their (null) after image, no rewrite marker") {
    import spark.implicits._
    val out = Unwrap.flatten(envelopes, deleteMode = Unwrap.DeleteNone,
        addFields = Seq("op" -> "op", "commit_lsn" -> "lsn"))
      .orderBy("__lsn")
      .as[(String, Option[Long], String, Long)].collect()
    assert(!Unwrap.flatten(envelopes, deleteMode = Unwrap.DeleteNone)
      .columns.contains("__deleted"))
    assert(out.toSeq == Seq(
      ("v1", Some(1L), "c", 10L),
      ("v2", Some(2L), "u", 20L),
      (null, None, "d", 30L))) // after image stays null in none mode
  }

  test("dropTombstones=false keeps the tombstone as an all-null row") {
    val out = Unwrap.flatten(envelopes, dropTombstones = false,
      addFields = Seq("op" -> "op"))
    assert(out.where(col("__op") === "tombstone").count() == 1)
  }

  test("unknown delete.handling.mode fails loudly") {
    intercept[IllegalArgumentException] {
      Unwrap.flatten(envelopes, deleteMode = "bogus")
    }
  }
}

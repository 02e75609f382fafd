package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** F5/F8 golden tests mirroring the reference's datatype matrix
  * (`AbstractInformixDatatypesTest.java:103-209`), default-value
  * converter (`InformixDefaultValueConverter.java:93-231`,
  * `AbstractInformixDefaultValueIT`) and identifier quoter
  * (`InformixIdentifierQuoter.java:11-22`).
  */
class ValueConvSpec extends SparkSpec {

  import ValueConv._

  private def one(c: org.apache.spark.sql.Column): Row = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).head()
  }

  test("temporal precision rule: length<20 -> 0 else length-20 (InformixValueConverters.java:154-156)") {
    assert(timePrecision(10) == 0)
    assert(timePrecision(19) == 0)
    assert(timePrecision(20) == 0)
    assert(timePrecision(23) == 3)
    assert(timePrecision(25) == 5)
  }

  test("DATE -> epoch days golden: 2024-03-27 -> 19809 (test :154-156)") {
    val r = one(epochDay(lit("2024-03-27 12:34:56").cast("timestamp")))
    assert(r.getInt(0) == java.time.LocalDate.of(2024, 3, 27).toEpochDay.toInt)
    assert(r.getInt(0) == 19809)
  }

  test("DATETIME goldens: Time ms / MicroTime us / Timestamp ms / MicroTimestamp us (test :157-172)") {
    val ts = lit("2024-03-27 12:34:56.12345").cast("timestamp")
    val row = one(struct(timeMillis(ts), timeMicros(ts), tsSecondsAsMillis(ts),
      tsMillis(ts), tsMicrosF5(ts))).getStruct(0)
    val secOfDay = java.time.LocalTime.of(12, 34, 56).toSecondOfDay.toLong
    val epochSec = java.time.LocalDateTime.of(2024, 3, 27, 12, 34, 56)
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(row.getLong(0) == secOfDay * 1000L)       // Time (hour to second)
    assert(row.getLong(1) == secOfDay * 1000000L)    // MicroTime (adaptive us)
    assert(row.getLong(2) == epochSec * 1000L)       // year to second
    assert(row.getLong(3) == epochSec * 1000L + 123L) // fraction(3)
    assert(row.getLong(4) == epochSec * 1000000L + 123450L) // fraction(5)
  }

  test("decimal modes golden: 1234.567891 precise / string / double (test :116-143)") {
    // DECIMAL(10,6) value 1234.567891 -> unscaled 1234567891 scale 6
    val u = lit(1234567891L)
    assert(one(decimalUnscaled(u, 6)).getStruct(0) == Row(1234567891L, 6))
    assert(one(decimalString(u, 6)).getString(0) == "1234.567891")
    assert(math.abs(one(decimalDouble(u, 6)).getDouble(0) - 1234.567891) < 1e-9)
  }

  test("decimal string mode renders negatives, incl. (-1, 0) magnitudes") {
    // the reference's decimal.handling.mode=string has no sign restriction
    assert(one(decimalString(lit(-50L), 2)).getString(0) == "-0.50")
    assert(one(decimalString(lit(-1234567891L), 6)).getString(0) == "-1234.567891")
    assert(one(decimalString(lit(-7L), 0)).getString(0) == "-7")
    assert(one(decimalString(lit(0L), 2)).getString(0) == "0.00")
  }

  test("variable-scale decimal golden: 77.323 -> {scale 3, value 77323}; trailing zeros stripped (test :118-121)") {
    assert(one(variableScaleDecimal(lit(77323L), 3)).getStruct(0) == Row(3, 77323L))
    // 49.00 at max scale 2 -> {0, 49}; 49.10 -> {1, 491}
    assert(one(variableScaleDecimal(lit(4900L), 2)).getStruct(0) == Row(0, 49L))
    assert(one(variableScaleDecimal(lit(4910L), 2)).getStruct(0) == Row(1, 491L))
    assert(one(variableScaleDecimal(lit(0L), 2)).getStruct(0) == Row(0, 0L))
  }

  test("char padding and boolean literals (test :103-108; InformixDefaultValueConverter.java:144-154)") {
    assert(one(charPadded(lit("c"), 3)).getString(0) == "c  ")
    assert(one(parseBool(lit("t"))).getBoolean(0))
    assert(!one(parseBool(lit("f"))).getBoolean(0))
    assert(one(parseBool(lit("true"))).getBoolean(0))
  }

  test("default-value parser: numeric scale normalization (InformixDefaultValueConverter.java:156-161)") {
    assert(parseDefault("DECIMAL", 10, Some(2), optional = true, "3,14")
      .contains(new java.math.BigDecimal("3.14")))
    // no scale -> exact integer via stripTrailingZeros path
    assert(parseDefault("DECIMAL", 10, None, optional = true, "100.00")
      .contains(new java.math.BigDecimal("100.00").stripTrailingZeros()))
    assert(parseDefault("INT", 4, None, optional = true, "42").contains(42))
    assert(parseDefault("SMALLINT", 2, None, optional = true, "7").contains(7.toShort))
    assert(parseDefault("FLOAT", 8, None, optional = true, "2,5").contains(2.5d))
    assert(parseDefault("REAL", 4, None, optional = true, "1.5").contains(1.5f))
  }

  test("default-value parser: NULL, boolean, strings, padding, unquoting (:128-231)") {
    assert(parseDefault("INT", 4, None, optional = true, "NULL").isEmpty)
    assert(parseDefault("BOOLEAN", 1, None, optional = true, "t").contains(true))
    assert(parseDefault("BOOLEAN", 1, None, optional = true, "f").contains(false))
    assert(parseDefault("CHAR", 5, None, optional = true, "'ab'").contains("ab   "))
    assert(parseDefault("VARCHAR", 10, None, optional = true, "('xy')").contains("xy"))
    assert(parseDefault("VARCHAR", 10, None, optional = true, "'xy'").contains("xy"))
    assert(parseDefault("VARCHAR", 10, None, optional = true, "xy").contains("xy"))
  }

  test("default-value parser: TODAY/CURRENT epoch fallbacks (:169-192)") {
    // optional columns: temporal function defaults are ignored
    assert(parseDefault("DATE", 4, None, optional = true, "TODAY").isEmpty)
    assert(parseDefault("DATETIME YEAR TO SECOND", 20, None, optional = true, "CURRENT").isEmpty)
    // non-optional: epoch
    assert(parseDefault("DATE", 4, None, optional = false, "TODAY")
      .contains(java.time.LocalDate.of(1970, 1, 1)))
    assert(parseDefault("DATETIME YEAR TO SECOND", 20, None, optional = false, "CURRENT")
      .contains(java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0)))
  }

  test("CURRENT fraction digits from type expression (:176-188)") {
    assert(currentDefaultScale("DATETIME YEAR TO FRACTION(5)") == 5)
    assert(currentDefaultScale("DATETIME YEAR TO FRACTION") == 3)
    assert(currentDefaultScale("DATETIME YEAR TO SECOND") == 0)
    assert(currentDefaultScale("DATETIME (3)") == 3)
    assert(currentDefaultScale("DATE") == 0)
  }

  test("F8 identifier quoting (InformixIdentifierQuoter.java:11-22)") {
    assert(quoteIfNecessary("lower_case_9$") == "lower_case_9$")
    assert(quoteIfNecessary("MixedCase") == "\"MixedCase\"")
    assert(quoteIfNecessary("with space") == "\"with space\"")
    assert(quoteIfNecessary("with-dash") == "\"with-dash\"")
    assert(quoteIfNecessary("\"AlreadyQuoted\"") == "\"AlreadyQuoted\"")
    assert(quoteIfNecessary("") == "")
  }

  test("F8 Column form agrees with the reference-pinned Scala form on an ASCII corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // every branch + edge cases (empty, lone quote, half-quoted, digits)
    val corpus = Seq("lower_case_9$", "MixedCase", "with space", "with-dash",
      "\"AlreadyQuoted\"", "", "\"", "\"half", "half\"", "123", "_", "$",
      "a b c", "UPPER", "mixed_Case$", "tab\tchar")
    val got = corpus.toDF("ident")
      .select(col("ident"), ValueConv.quoteIfNecessaryCol(col("ident")).as("q"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    corpus.foreach { id =>
      assert(got(id) == quoteIfNecessary(id), s"ident <$id>")
    }
  }

  test("f5b type matrix runs and is deterministic") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val a = ValueConv.typeMatrix(events).collect()
    val b = ValueConv.typeMatrix(events).collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("binary.handling.mode: base64 / url-safe / hex match java.util.Base64 exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val payloads = Seq(
      1L -> Array[Byte](0, 1, 2, -1, 62, 63, -5, -17),
      2L -> "héllo?>world".getBytes("UTF-8"),
      3L -> Array.empty[Byte],
      // LONG payload: Spark's base64() MIME-chunks past 76 chars (a
      // \r\n java.util.Base64 never emits) — must come out unchunked
      4L -> Array.tabulate(300)(i => ((i * 37 + 11) % 256).toByte))
    val df = payloads.toDF("id", "b")
    val got = df.select(col("id"),
      ValueConv.binaryAs(col("b"), "base64").as("b64"),
      ValueConv.binaryAs(col("b"), "base64-url-safe").as("u"),
      ValueConv.binaryAs(col("b"), "hex").as("h"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    payloads.foreach { case (id, bytes) =>
      assert(got(id)._1 == java.util.Base64.getEncoder.encodeToString(bytes), s"b64 $id")
      assert(got(id)._2 == java.util.Base64.getUrlEncoder.encodeToString(bytes), s"url $id")
      assert(got(id)._3 == bytes.map(x => f"${x & 0xff}%02x").mkString, s"hex $id")
    }
    intercept[IllegalArgumentException](ValueConv.binaryAs(col("b"), "nope"))
  }
}

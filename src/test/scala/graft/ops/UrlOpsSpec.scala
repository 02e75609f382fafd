package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL parsing/canonicalization edges and the domain-cap reuse. */
class UrlOpsSpec extends SparkSpec {

  private def parsed(url: String): (String, String, Long, String) = {
    import spark.implicits._
    Seq((1L, url)).toDF("doc_id", "url")
      .select(UrlOps.host(col("url")), UrlOps.domain(col("url")),
        UrlOps.pathDepth(col("url")), UrlOps.canonical(col("url")))
      .as[(String, String, Long, String)].head()
  }

  test("host/domain/depth/canonical across URL shapes") {
    assert(parsed("https://www.Example.org/a/b/c?q=1#f") ==
      ("www.example.org", "example.org", 3L, "https://example.org/a/b/c"))
    assert(parsed("http://example.org") ==
      ("example.org", "example.org", 0L, "https://example.org"))
    assert(parsed("https://example.org/") ==
      ("example.org", "example.org", 0L, "https://example.org"))
    assert(parsed("https://sub.www.example.org/x//y/") ==
      // www. strips only as a PREFIX; empty path segments don't count
      ("sub.www.example.org", "sub.www.example.org", 2L,
        "https://sub.www.example.org/x//y"))
    assert(parsed("ftp+ssh://host.io/a") == ("host.io", "host.io", 1L,
      "https://host.io/a"))
  }

  test("a non-URL yields empty host, not an error") {
    assert(parsed("not a url") == ("", "", 0L, "https://"))
  }

  test("domain caps: over-cap domain thinned, under-cap domains intact") {
    import spark.implicits._
    // 40 docs on one domain, 2 on another: 15% cap bites only the first
    val docs = (0L until 40L).map(i => (i, s"https://big.org/p/$i")) ++
      Seq((100L, "https://small.org/x"), (101L, "https://small.org/y"))
    val df = docs.toDF("doc_id", "url")
    val kept = UrlOps.applyDomainCaps(df)
    val byDomain = kept.withColumn("d", UrlOps.domain(col("url")))
      .groupBy("d").count().as[(String, Long)].collect().toMap
    assert(byDomain("small.org") == 2L)
    assert(byDomain.getOrElse("big.org", 0L) < 40L)
    assert(!kept.columns.contains("__domain"))
    // deterministic: same kept set on a repartitioned input
    val again = UrlOps.applyDomainCaps(df.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSet)
  }
}

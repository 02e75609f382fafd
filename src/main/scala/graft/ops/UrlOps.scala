package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation — the crawl-side operators a web-scale
  * training pipeline runs before any text op: parse each document's
  * URL into host / registrable domain / path shape, canonicalize URLs
  * for exact re-crawl dedup, and balance the corpus per DOMAIN (the
  * crawl analog of [[Curation.applySourceCaps]] — one domain of a
  * 100 TB crawl can be half the corpus).
  *
  * The testdata tables carry no URL column, so the driver queries
  * derive one deterministically from (source, lang, doc_id) — the
  * operators themselves take any URL column.
  *
  * Scale notes: every extraction here is a per-row codegen'd string
  * expression (no UDF, no shuffle); domain aggregation is one
  * map-side-combined groupBy over the extracted column; domain caps
  * reuse the broadcast-rate-table + hash-threshold discipline of
  * [[Curation.applySourceCaps]], so the corpus itself never shuffles.
  */
object UrlOps {

  /** Host part of a URL (scheme-relative, up to the first `/`, `?` or
    * `#`). A plain anchored regex rather than `parse_url`: bit-portable
    * to the SQL oracle and free of java.net.URI's exotic-input
    * behaviors; crawls hold billions of well-formed URLs and a regex
    * non-match yields '' (flagged, not thrown).
    */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))

  /** Registrable-ish domain: the host with a leading `www.` stripped.
    * (True eTLD+1 needs the public-suffix list — a broadcast dict join
    * in this engine's idiom; the testdata hosts are single-suffix so
    * the strip is exact here.)
    */
  def domain(url: Column): Column =
    regexp_replace(host(url), "^www\\.", "")

  /** Path component (no query/fragment). */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Path depth = number of non-empty `/`-separated segments. */
  def pathDepth(url: Column): Column = {
    val p = path(url)
    size(filter(split(p, "/"), s => length(s) > 0)).cast("long")
  }

  /** Canonical URL for re-crawl dedup: lowercase scheme+host, `www.`
    * stripped, query/fragment dropped, trailing slash trimmed — the
    * standard crawl-frontier canonicalization.
    */
  def canonical(url: Column): Column =
    concat(lit("https://"), domain(url),
      regexp_replace(path(url), "/$", ""))

  /** Per-document URL features: the parse surface as columns. */
  def urlFeatures(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    df.select(col("doc_id"), host(u).as("host"), domain(u).as("domain"),
      pathDepth(u).as("path_depth"), canonical(u).as("canonical_url"))
  }

  /** Per-domain corpus profile: doc count, corpus share (basis points,
    * integer arithmetic so oracles replay it), distinct hosts under the
    * domain, and mean path depth.
    */
  def domainStats(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val agg = df.groupBy(domain(u).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(host(u)).as("n_hosts"),
        sum(pathDepth(u)).as("__depth_sum"))
    val total = agg.agg(sum(col("n_docs")).as("__tot"))
    agg.crossJoin(broadcast(total))
      .select(col("domain"), col("n_docs"),
        expr("n_docs * 10000L div __tot").as("share_bp"),
        col("n_hosts"),
        round(col("__depth_sum").cast("double") / col("n_docs"), 4)
          .as("mean_depth"))
  }

  /** Domain-capped corpus: [[Curation.applySourceCaps]] keyed on the
    * extracted domain — each domain's corpus share capped at
    * `maxShareBp` via the nested hash-threshold sample.
    */
  def applyDomainCaps(df: DataFrame, urlCol: String = "url",
      maxShareBp: Int = Curation.SourceCapBp): DataFrame =
    Curation.applySourceCaps(
      df.withColumn("__domain", domain(col(urlCol))),
      sourceCol = "__domain", maxShareBp = maxShareBp)
      .drop("__domain")
}

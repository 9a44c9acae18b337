package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host-level rollups — the CCNet/RefinedWeb
  * "front door" of a web-scale training-data pipeline (Wenzek et al.
  * 2020; Penedo et al. 2023): before any content-based dedup runs, the
  * crawl is collapsed by CANONICAL URL (the same page arrives under
  * tracking-param, case, port, and fragment variants on every fetch)
  * and per-host quality priors are rolled up so known-bad hosts can be
  * gated cheaply.
  *
  * Canonical form implemented here (the common subset of the published
  * pipelines' rules — each is a deterministic string rewrite, so the
  * whole canonicalizer has a DuckDB restatement and the queries carry
  * full hash oracles):
  *   - scheme and host lowercased; a leading `www.` dropped
  *   - default ports stripped (`:80` for http, `:443` for https);
  *     other explicit ports kept
  *   - trailing slashes stripped from the path; an empty path becomes `/`
  *   - tracking query params dropped (`utm_*`, `gclid`, `fbclid`,
  *     `ref`, `sessionid`, `msclkid`), the survivors SORTED and
  *     rejoined — param-order noise collapses; an emptied query drops
  *     its `?`
  *   - the fragment dropped
  *
  * Scale shape: canonicalization is a row-local projection — regexp
  * parts are codegen'd string expressions; the only Catalyst lambdas
  * (the param filter/sort) run over an array bounded by the URL's own
  * param count (single digits), not by data size, so the interpreted-
  * HOF-per-element trap (q260) does not apply. [[canonicalDedup]] then
  * costs ONE map-side-combinable groupBy on the canonical string —
  * at 100 TB that is the single row-scale shuffle, and its output is
  * bounded by the number of DISTINCT canonical URLs; [[hostPriors]]
  * re-aggregates that frame by host (canonical-key-scale, never
  * row-scale). No UDFs, no driver loops.
  */
object Urls {

  /** Query params dropped by canonicalization: click/campaign trackers
    * that vary per fetch without changing the page. */
  val TrackingParamRegex = "^(utm_[^=]*|gclid|fbclid|ref|sessionid|msclkid)(=|$)"

  /** Authority with any RFC-3986 `userinfo@` prefix stripped (userinfo
    * may not contain `/` or `@`, so the prefix regex is exact). The
    * canonicalizer's PRECONDITION is an absolute, scheme-qualified URL
    * — a schemeless input yields empty scheme/host and the row should
    * be filtered by the caller, not silently canonicalized. */
  private def authority(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "^[^/@]*@", "")

  /** Canonical (lowercased, `www.`-stripped) host of a raw URL. */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(authority(url), "^([^:]*)", 1)), "^www\\.", "")

  /** The full canonical URL of a raw URL column (rules in the object
    * scaladoc). Pure built-in string/array expressions. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = authority(url)
    val host = canonicalHost(url)
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val portC = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRegex)))
    val queryC = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, portC, path, queryC)
  }

  /** True iff the raw URL carries at least one tracking param — the
    * host-prior signal (a host whose links are mostly tracking-tagged
    * is syndication/ad inventory, not organic content). */
  def hasTrackingParams(url: Column): Column = {
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    exists(split(query, "&"), p => p.rlike(TrackingParamRegex))
  }

  /** Canonical-URL dedup census: one row per canonical URL with its
    * fetch count and the deterministic survivor (min id). The
    * keep-first election that runs BEFORE content dedup — collapsing
    * k fetch variants here saves k−1 shingle/minhash passes later. */
  def canonicalDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_fetches"), min(col(idCol)).as("survivor_id"))

  /** Host-level quality priors over raw URLs: per canonical host, the
    * fetch count, distinct canonical URLs, the fetch/canonical dup
    * ratio, and the share of fetches carrying tracking params.
    * `extraAggs` lets callers fold content signals (mean length,
    * quality score) into the same pass. */
  def hostPriors(df: DataFrame, urlCol: String, extraAggs: Seq[Column] = Nil): DataFrame = {
    val base = df
      .withColumn("host", canonicalHost(col(urlCol)))
      .withColumn("canonical_url", canonicalize(col(urlCol)))
      .withColumn("has_tracking", hasTrackingParams(col(urlCol)))
    val aggs = Seq(
      count(lit(1)).as("n_fetches"),
      countDistinct(col("canonical_url")).as("n_canonical"),
      round(count(lit(1)).cast("double") / countDistinct(col("canonical_url")), 4)
        .as("dup_ratio"),
      round(lit(100.0) * sum(when(col("has_tracking"), 1L).otherwise(0L)) / count(lit(1)), 4)
        .as("tracking_pct")) ++ extraAggs
    base.groupBy("host").agg(aggs.head, aggs.tail: _*)
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Urls
import graft.sources.Tables

/** Web-crawl front-door queries (tranche G): URL canonicalization,
  * canonical-URL dedup, and host-level quality priors — the
  * CCNet/RefinedWeb stage that runs BEFORE content dedup (r10 verdict
  * item 3: the one missing LLM-pipeline family).
  *
  * The documents table has no URL column, so both engines derive the
  * SAME synthetic crawl URL from (doc_id, source) — the established
  * synthetic-attribute discipline (q270's md5 cost table): scheme/www/
  * host-case/port/trailing-slash/param-order/tracking/fragment noise
  * all keyed off doc_id residues, so the canonicalizer has real work
  * and the collapse factor is deterministic. Everything downstream of
  * the synthesis is the [[graft.operators.Urls]] operator itself.
  */
object WebQueries {

  /** Deterministic synthetic crawl URL — Spark side. Mirrors the
    * DuckDB expression in the oracles below, term for term. */
  private val synthUrl =
    """concat(
      |  CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'https' END, '://',
      |  CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
      |  CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END,
      |  '.example.com',
      |  CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END,
      |  '/docs/', cast(doc_id % 50 AS string),
      |  CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END,
      |  CASE WHEN doc_id % 2 = 0
      |    THEN concat('?utm_source=feed&id=', cast(doc_id % 25 AS string), '&v=2')
      |    ELSE concat('?v=2&id=', cast(doc_id % 25 AS string)) END,
      |  CASE WHEN doc_id % 9 = 0 THEN concat('&gclid=', cast(doc_id AS string)) ELSE '' END,
      |  CASE WHEN doc_id % 8 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  /** Canonical-URL dedup census: every fetch variant of a page —
    * tracking params, host case, default port, trailing slash, param
    * order, fragment — collapses to one canonical row with its fetch
    * count and min-id survivor. Planted: ids −1/−2/−4 are three raw
    * variants of ONE canonical URL (www+case+port+slash+utm noise,
    * param order scrambled, a gclid) and must collapse to n_fetches=3
    * survivor −4; −3 is the same page over plain http and must stay
    * its own row (scheme is identity-bearing). Scale: canonicalization
    * is row-local; the census is ONE map-side-combinable groupBy on
    * the canonical string, output bounded by distinct canonical URLs. */
  def q281UrlCanonical(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planted = Seq(
      (-1L, "https://www.Example.ORG:443/a/b/?utm_source=x&z=1&a=2#top"),
      (-2L, "HTTPS://example.org/a/b?a=2&z=1"),
      (-3L, "http://example.org:80/a/b?a=2&z=1"),
      (-4L, "https://example.org/a/b?a=2&z=1&gclid=abc"))
      .toDF("doc_id", "url")
    val crawl = Tables.documents(s, d)
      .select(col("doc_id"), expr(synthUrl).as("url"))
      .unionByName(planted)
    Urls.canonicalDedup(crawl, "url", "doc_id")
      .orderBy("canonical_url")
  }

  /** Host-level quality priors: per canonical host, fetch count,
    * distinct canonical URLs, the fetch/canonical dup ratio, the share
    * of tracking-tagged fetches, and mean document length — the
    * signals a crawl pipeline gates hosts on before reading content.
    * Scale: one groupBy(host) with a distinct-count over (host,
    * canonical) pairs — host cardinality is web-scale-small (~1e8)
    * next to page count, and the distinct partial-aggregates
    * map-side. */
  def q282HostPriors(s: SparkSession, d: String): DataFrame = {
    val crawl = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), expr(synthUrl).as("url"))
    Urls.hostPriors(crawl, "url",
        extraAggs = Seq(round(avg(col("n_chars")), 4).as("avg_chars")))
      .orderBy("host")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q281_url_canonical" -> (q281UrlCanonical _),
    "q282_host_priors" -> (q282HostPriors _)
  )

  /** The DuckDB canonicalizer: the same regex parts and list ops as
    * [[Urls.canonicalize]] (regexp_extract group-1 semantics and
    * empty-on-no-match agree across engines; params are ASCII so
    * list_sort and array_sort share one order). */
  private val duckSynthUrl =
    """concat(
      |      CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'https' END, '://',
      |      CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END,
      |      CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END,
      |      '.example.com',
      |      CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END,
      |      '/docs/', cast(doc_id % 50 AS VARCHAR),
      |      CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END,
      |      CASE WHEN doc_id % 2 = 0
      |        THEN concat('?utm_source=feed&id=', cast(doc_id % 25 AS VARCHAR), '&v=2')
      |        ELSE concat('?v=2&id=', cast(doc_id % 25 AS VARCHAR)) END,
      |      CASE WHEN doc_id % 9 = 0 THEN concat('&gclid=', cast(doc_id AS VARCHAR)) ELSE '' END,
      |      CASE WHEN doc_id % 8 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  private val duckCanonParts =
    """parts AS (
      |  SELECT doc_id, n_chars, url,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
      |    regexp_extract(url, '\?([^#]*)', 1) AS query
      |  FROM u),
      |withp AS (
      |  SELECT *,
      |    regexp_extract(auth, ':([0-9]+)$', 1) AS port,
      |    regexp_replace(lower(regexp_extract(auth, '^([^:]*)', 1)), '^www\.', '')
      |      AS host,
      |    regexp_replace(rawpath, '/+$', '') AS tpath,
      |    list_sort(list_filter(string_split(query, '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '^(utm_[^=]*|gclid|fbclid|ref|sessionid|msclkid)(=|$)'))) AS params,
      |    len(list_filter(string_split(query, '&'),
      |      x -> regexp_matches(x,
      |        '^(utm_[^=]*|gclid|fbclid|ref|sessionid|msclkid)(=|$)'))) > 0
      |      AS has_tracking
      |  FROM parts),
      |c AS (
      |  SELECT doc_id, n_chars, host, has_tracking,
      |    concat(scheme, '://', host,
      |      CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
      |        OR (scheme = 'http' AND port = '80')
      |        THEN '' ELSE concat(':', port) END,
      |      CASE WHEN tpath = '' THEN '/' ELSE tpath END,
      |      CASE WHEN len(params) > 0
      |        THEN concat('?', array_to_string(params, '&')) ELSE '' END)
      |      AS canonical_url
      |  FROM withp)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q281_url_canonical" ->
      s"""WITH u AS (
         |  SELECT doc_id, 0 AS n_chars, $duckSynthUrl AS url FROM documents
         |  UNION ALL
         |  SELECT * FROM (VALUES
         |    (-1, 0, 'https://www.Example.ORG:443/a/b/?utm_source=x&z=1&a=2#top'),
         |    (-2, 0, 'HTTPS://example.org/a/b?a=2&z=1'),
         |    (-3, 0, 'http://example.org:80/a/b?a=2&z=1'),
         |    (-4, 0, 'https://example.org/a/b?a=2&z=1&gclid=abc'))
         |    v(doc_id, n_chars, url)),
         |$duckCanonParts
         |SELECT canonical_url, count(*) AS n_fetches,
         |  min(doc_id) AS survivor_id
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q282_host_priors" ->
      s"""WITH u AS (
         |  SELECT doc_id, n_chars, $duckSynthUrl AS url FROM documents),
         |$duckCanonParts
         |SELECT host, count(*) AS n_fetches,
         |  count(DISTINCT canonical_url) AS n_canonical,
         |  round(count(*) / CAST(count(DISTINCT canonical_url) AS DOUBLE), 4)
         |    AS dup_ratio,
         |  round(100.0 * sum(CASE WHEN has_tracking THEN 1 ELSE 0 END)
         |    / count(*), 4) AS tracking_pct,
         |  round(avg(n_chars), 4) AS avg_chars
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  )
}

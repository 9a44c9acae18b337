package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Driver-side HTTP connectors (SURVEY §2.1 S1-S3): generic GET with
  * retry/backoff, NOAA CDO and EIA v2 request builders with
  * pagination planning.
  *
  * Connectors run on the driver and land raw JSON into the raw zone;
  * Spark then reads the landed files with the explicit schemas in
  * [[graft.domain.Schemas]] — the fetch never blocks executors. At
  * 100 TB-class ingest this becomes a DataSourceV2 TableProvider whose
  * `planInputPartitions` returns one InputPartition per (station/region,
  * date-range, page) — [[EiaConnector.pagePlan]] is exactly that
  * partition plan, kept transport-agnostic so it is unit-testable
  * without network (this environment has zero egress). */
object Connectors {

  /** S1 — HTTP GET with retries and exponential backoff 2·2^attempt s
    * (reference _fetch_with_retries, src/data_fetcher.py:8-22).
    * Transport injected for testability. */
  def fetchWithRetries(
      url: String,
      headers: Map[String, String] = Map.empty,
      maxRetries: Int = 3,
      backoffFactor: Double = 2.0,
      timeoutSec: Int = 30,
      sleep: Long => Unit = Thread.sleep,
      transport: Option[HttpRequest => HttpResponse[String]] = None): Option[String] = {
    val send: HttpRequest => HttpResponse[String] = transport.getOrElse { req =>
      HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()
        .send(req, HttpResponse.BodyHandlers.ofString())
    }
    val builder = HttpRequest.newBuilder(URI.create(url)).timeout(Duration.ofSeconds(timeoutSec))
    headers.foreach { case (k, v) => builder.header(k, v) }
    val req = builder.GET().build()
    var attempt = 0
    while (attempt < maxRetries) {
      try {
        val resp = send(req)
        if (resp.statusCode() / 100 == 2) return Some(resp.body())
      } catch { case _: Exception => () }
      attempt += 1
      if (attempt < maxRetries) sleep((backoffFactor * math.pow(2, attempt) * 1000).toLong)
    }
    None
  }

  /** S2 — NOAA CDO request URL (reference fetch_weather_data,
    * src/data_fetcher.py:24-55): GHCND, TMAX/TMIN, metric units,
    * limit 1000. */
  def noaaUrl(baseUrl: String, stationId: String, start: String, end: String,
      limit: Int = 1000, offset: Int = 1): String =
    s"$baseUrl/data?datasetid=GHCND&stationid=$stationId" +
      s"&datatypeid=TMAX&datatypeid=TMIN&startdate=$start&enddate=$end" +
      s"&units=metric&limit=$limit&offset=$offset"

  /** S3 — EIA v2 request URL for one page (reference fetch_energy_data,
    * src/data_fetcher.py:57-125): hourly regional demand, sorted asc by
    * period, 5000 rows/page. */
  def eiaUrl(baseUrl: String, regionCode: String, start: String, end: String,
      apiKey: String, length: Int = 5000, offset: Int = 0): String =
    s"$baseUrl/electricity/rto/region-data/data/?api_key=$apiKey" +
      s"&frequency=hourly&data[0]=value&facets[respondent][]=$regionCode" +
      s"&start=$start&end=$end&sort[0][column]=period&sort[0][direction]=asc" +
      s"&offset=$offset&length=$length"

  /** EIA pagination plan: probe reports `total`, plan ⌈total/pageSize⌉
    * offsets (the reference's probe-then-page loop at
    * src/data_fetcher.py:66-115, reified as a partition plan). */
  def pagePlan(total: Long, pageSize: Int = 5000): Seq[Long] =
    if (total <= 0) Seq.empty
    else 0L.until(total, pageSize.toLong)

  /** S4 — raw-zone landing path for one fetched payload (reference
    * naming `weather_{city}_{start}_{end}.json`,
    * src/data_fetcher.py:48-49). `kind` is "weather" or "energy". */
  def rawLandingPath(rawDir: String, kind: String, city: String,
      start: String, end: String): String =
    s"${rawDir.stripSuffix("/")}/${kind}_${city}_${start}_${end}.json"

  /** S4 — land one raw API payload into the raw zone for lineage and
    * replay (reference src/data_fetcher.py:48-53: every NOAA response is
    * persisted before processing). Driver-side single-payload write —
    * Spark then reads the landed files with the pinned schemas in
    * [[graft.domain.Schemas]]; the replay test proves land→read→process
    * reproduces the same fact rows as processing the in-flight payload. */
  def landRaw(payload: String, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}

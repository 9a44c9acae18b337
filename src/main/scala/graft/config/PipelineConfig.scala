package graft.config

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Parsed pipeline configuration (reference
  * config/config.example.yaml:1-49, loaded at src/pipeline.py:16-17):
  * API endpoints + credentials, landing/output paths, the city
  * dimension, and data-quality thresholds. Everything the reference
  * drives from YAML is parameterized here instead of hardcoded —
  * `QualityOps` and `Pipeline` accept a config, and [[cityDim]] turns
  * the city list into the broadcast-able dimension frame
  * (Schemas.cityDim shape, joined at dashboards/app.py:182). */
final case class PipelineConfig(
    noaa: ApiConfig,
    eia: ApiConfig,
    paths: PathsConfig,
    cities: Seq[CityConfig],
    quality: QualityThresholds) {

  /** The config's city list as the broadcast dimension table. */
  def cityDim(spark: SparkSession): DataFrame = {
    val rows = cities.map(c => Row(c.name, c.state, c.noaaStationId, c.eiaRegionCode, c.lat, c.lon))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), graft.domain.Schemas.cityDim)
  }
}

/** One API endpoint + credential (reference `noaa:`/`eia:` blocks). The
  * credential is whatever the YAML carries — never logged; see
  * [[PipelineConfig.masked]]. */
final case class ApiConfig(baseUrl: String, credential: String)

/** Landing/output paths (reference `paths:` block). */
final case class PathsConfig(rawData: String, processedData: String, logFile: String)

/** One configured city (reference `cities:` list entries). */
final case class CityConfig(
    name: String, state: String, noaaStationId: String, eiaRegionCode: String,
    lat: Double, lon: Double)

/** Quality thresholds (reference `data_quality.temp_outlier_fahrenheit`,
  * consumed at src/data_processor.py:93-98). */
final case class QualityThresholds(tempMaxF: Double, tempMinF: Double)

object PipelineConfig {

  /** The reference example config minus secrets — the default the
    * engine runs with when no YAML is supplied. */
  val default: PipelineConfig = PipelineConfig(
    noaa = ApiConfig("https://www.ncdc.noaa.gov/cdo-web/api/v2", ""),
    eia = ApiConfig("https://api.eia.gov/v2", ""),
    paths = PathsConfig("data/raw/", "data/processed/", "logs/pipeline.log"),
    cities = Seq(
      CityConfig("New York", "New York", "GHCND:USW00094728", "NYIS", 40.7128, -74.0060),
      CityConfig("Chicago", "Illinois", "GHCND:USW00094846", "PJM", 41.8781, -87.6298),
      CityConfig("Houston", "Texas", "GHCND:USW00012960", "ERCO", 29.7604, -95.3698),
      CityConfig("Phoenix", "Arizona", "GHCND:USW00023183", "AZPS", 33.4484, -112.0740),
      CityConfig("Seattle", "Washington", "GHCND:USW00024233", "SCL", 47.6062, -122.3321)),
    quality = QualityThresholds(tempMaxF = 130.0, tempMinF = -50.0))

  /** Mask a credential for logs (reference masks keys in its debug
    * tooling — F12): keep first/last 2 chars, star the middle. */
  def masked(credential: String): String =
    if (credential.length <= 4) "*" * credential.length
    else credential.take(2) + "*" * (credential.length - 4) + credential.takeRight(2)

  /** Load from a YAML file (the reference's config/config.yaml shape). */
  def fromFile(path: String): PipelineConfig =
    fromYaml(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Parse the reference's config shape from YAML text. Unknown keys are
    * ignored; missing blocks fall back to [[default]] values, so a
    * partial override file (e.g. only `data_quality:`) is valid. */
  def fromYaml(text: String): PipelineConfig = {
    val root = MiniYaml.parse(text)
    def str(path: String*) : Option[String] = MiniYaml.string(root, path)
    def dbl(path: String*): Option[Double] = str(path: _*).map(_.toDouble)
    val cities = MiniYaml.list(root, Seq("cities")).map { m =>
      CityConfig(
        name = m.getOrElse("name", ""),
        state = m.getOrElse("state", ""),
        noaaStationId = m.getOrElse("noaa_station_id", ""),
        eiaRegionCode = m.getOrElse("eia_region_code", ""),
        lat = m.get("lat").map(_.toDouble).getOrElse(0.0),
        lon = m.get("lon").map(_.toDouble).getOrElse(0.0))
    }
    PipelineConfig(
      noaa = ApiConfig(
        str("noaa", "base_url").getOrElse(default.noaa.baseUrl),
        str("noaa", "token").getOrElse("")),
      eia = ApiConfig(
        str("eia", "base_url").getOrElse(default.eia.baseUrl),
        str("eia", "api_key").getOrElse("")),
      paths = PathsConfig(
        str("paths", "raw_data").getOrElse(default.paths.rawData),
        str("paths", "processed_data").getOrElse(default.paths.processedData),
        str("paths", "log_file").getOrElse(default.paths.logFile)),
      cities = if (cities.nonEmpty) cities else default.cities,
      quality = QualityThresholds(
        tempMaxF = dbl("data_quality", "temp_outlier_fahrenheit", "max")
          .getOrElse(default.quality.tempMaxF),
        tempMinF = dbl("data_quality", "temp_outlier_fahrenheit", "min")
          .getOrElse(default.quality.tempMinF)))
  }
}

/** Minimal YAML-subset parser covering the reference config's shape:
  * nested maps by indentation, lists of flat maps (`- key: value`),
  * scalar values with optional single/double quotes, `#` comments.
  * Deliberately NOT a general YAML implementation (no anchors, no
  * multi-line scalars, no flow style) — the sandbox has no YAML
  * dependency and the config grammar is this small. */
private[config] object MiniYaml {

  sealed trait Node
  final case class MapNode(entries: Map[String, Node]) extends Node
  final case class ListNode(items: Seq[Map[String, String]]) extends Node
  final case class ScalarNode(value: String) extends Node

  def string(root: MapNode, path: Seq[String]): Option[String] =
    path.foldLeft(Option(root: Node)) {
      case (Some(MapNode(m)), k) => m.get(k)
      case _ => None
    }.collect { case ScalarNode(v) => v }

  def list(root: MapNode, path: Seq[String]): Seq[Map[String, String]] =
    path.foldLeft(Option(root: Node)) {
      case (Some(MapNode(m)), k) => m.get(k)
      case _ => None
    } match {
      case Some(ListNode(items)) => items
      case _ => Seq.empty
    }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Strip a trailing comment that is OUTSIDE quotes. Per YAML, '#'
    * opens a comment only at line start or after whitespace — an
    * unquoted value like `abc#def` (a credential, an anchor URL) must
    * NOT be truncated. */
  private def stripComment(s: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD && (i == 0 || s.charAt(i - 1).isWhitespace) =>
          return s.substring(0, i)
        case _ =>
      }
      i += 1
    }
    s
  }

  private final case class Line(indent: Int, isItem: Boolean, key: String, value: String)

  def parse(text: String): MapNode = {
    val lines = text.linesIterator.map(stripComment).filter(_.trim.nonEmpty).map { raw =>
      val indent = raw.takeWhile(_ == ' ').length
      val body = raw.trim
      val (isItem, rest) = if (body.startsWith("- ")) (true, body.drop(2)) else (false, body)
      val ci = rest.indexOf(':')
      require(ci > 0, s"unparseable config line: '$raw'")
      Line(indent, isItem, rest.take(ci).trim, unquote(rest.drop(ci + 1)))
    }.toVector
    parseMap(lines, 0)._1
  }

  /** Parse a map starting at lines(from); returns (map, next index). */
  private def parseMap(lines: Vector[Line], from: Int): (MapNode, Int) = {
    require(from < lines.length, "empty config block")
    val indent = lines(from).indent
    var i = from
    val out = scala.collection.mutable.LinkedHashMap[String, Node]()
    while (i < lines.length && lines(i).indent >= indent && !lines(i).isItem) {
      val l = lines(i)
      if (l.indent > indent) { i += 1 } // over-indented stray — skip
      else if (l.value.nonEmpty) { out(l.key) = ScalarNode(l.value); i += 1 }
      else {
        // block value: a list of flat maps, or a nested map
        val childFrom = i + 1
        if (childFrom < lines.length && lines(childFrom).indent > indent) {
          if (lines(childFrom).isItem) {
            val (items, next) = parseList(lines, childFrom)
            out(l.key) = ListNode(items); i = next
          } else {
            val (m, next) = parseMap(lines, childFrom)
            out(l.key) = m; i = next
          }
        } else { out(l.key) = ScalarNode(""); i = childFrom }
      }
    }
    (MapNode(out.toMap), i)
  }

  /** Parse a list of flat maps: each `- k: v` opens an item whose
    * continuation lines are the deeper-indented `k: v` pairs. */
  private def parseList(lines: Vector[Line], from: Int): (Seq[Map[String, String]], Int) = {
    val indent = lines(from).indent
    var i = from
    val items = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    while (i < lines.length && lines(i).indent == indent && lines(i).isItem) {
      val item = scala.collection.mutable.LinkedHashMap[String, String]()
      item(lines(i).key) = lines(i).value
      i += 1
      while (i < lines.length && lines(i).indent > indent && !lines(i).isItem) {
        item(lines(i).key) = lines(i).value
        i += 1
      }
      items += item.toMap
    }
    (items.toSeq, i)
  }
}

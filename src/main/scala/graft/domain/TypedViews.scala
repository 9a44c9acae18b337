package graft.domain

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed row models + Dataset views of the canonical tables (SURVEY
  * §1.4: untyped DataFrame core, typed views for API ergonomics —
  * compile-time field checks where a case class models the row). */
case class WeatherDaily(date: Date, temp_max_f: Option[Double],
    temp_min_f: Option[Double], temp_avg_f: Option[Double], city: String)

case class EnergyDaily(date: Date, city: String, energy_demand_gwh: Option[Double])

case class WeatherEnergyRow(date: Date, city: String,
    temp_max_f: Option[Double], temp_min_f: Option[Double],
    temp_avg_f: Option[Double], energy_demand_gwh: Option[Double])

case class CityDim(name: String, state: String, noaa_station_id: String,
    eia_region_code: String, lat: Double, lon: Double)

object TypedViews {
  def weather(spark: SparkSession, df: DataFrame): Dataset[WeatherDaily] = {
    import spark.implicits._
    df.as[WeatherDaily]
  }
  def energy(spark: SparkSession, df: DataFrame): Dataset[EnergyDaily] = {
    import spark.implicits._
    df.as[EnergyDaily]
  }
  def fact(spark: SparkSession, df: DataFrame): Dataset[WeatherEnergyRow] = {
    import spark.implicits._
    df.as[WeatherEnergyRow]
  }
}

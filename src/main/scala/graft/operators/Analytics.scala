package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.domain.OlsSummary
import graft.functions.Stats

/** The five dashboard analytics queries (SURVEY EP2) as library
  * operators over the canonical fact table, plus OLS-with-CI — the one
  * genuinely custom analytic (X3). */
object Analytics {

  /** Q-geo part 1 (A5/W3): latest row per city with previous-day energy
    * and guarded pct-change — the reference's self-join (J3,
    * dashboards/app.py:602-613) rewritten as the idiomatic lag window:
    * one shuffle on city instead of two joins. */
  def latestWithPrevDay(fact: DataFrame): DataFrame = {
    val byCity = Window.partitionBy("city").orderBy(col("date"))
    val latest = Window.partitionBy("city").orderBy(col("date").desc)
    fact
      .withColumn("prev_energy", lag("energy_demand_gwh", 1).over(byCity))
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .drop("rn")
      .withColumn("prev_energy", coalesce(col("prev_energy"), lit(0.0))) // reference fillna(0)
      .withColumn("pct_change",
        when(col("prev_energy") > 0,
          (col("energy_demand_gwh") - col("prev_energy")) / col("prev_energy") * 100)
          .otherwise(0.0))
  }

  /** Q-timeseries (A3/W1): all-cities daily series (mean temp, summed
    * energy), optionally first-differenced for the stationarity toggle
    * (reference dashboards/app.py:701-716).
    *
    * The diff lag runs over a YEAR-partitioned window, not a global
    * `Window.orderBy` (which moves the whole series to one partition —
    * harmless at rows = #days, but the wrong template to copy into a
    * per-key series at scale). Year boundaries stay exact: each year's
    * last row is unioned into the NEXT YEAR PRESENT IN THE DATA as a
    * carry row that feeds the lag and is dropped from the output (the
    * next-existing-year assignment — a tiny per-year self-join — is
    * what keeps the diff exact across calendar-year gaps), so the
    * partitioned diff equals the global one row-for-row. */
  def timeSeries(fact: DataFrame, diff: Boolean = false): DataFrame = {
    val daily = fact.groupBy("date")
      .agg(avg("temp_avg_f").as("temp_avg_f"), sum("energy_demand_gwh").as("energy_demand_gwh"))
    if (!diff) daily.orderBy("date")
    else {
      val keyed = daily.withColumn("yr", year(col("date")))
        .withColumn("carry", lit(false))
      // max over (date-first) structs = the latest row of each year
      val perYearLast = keyed.groupBy("yr")
        .agg(max(struct(col("date"), col("temp_avg_f"), col("energy_demand_gwh"))).as("s"))
      // carry each year's last row into the next year PRESENT in the
      // data (min existing year above it) — `yr + 1` would strand the
      // carry in an empty partition across a calendar-year gap and
      // silently drop the post-gap diff row. Rows here = #years.
      val years = perYearLast.select(col("yr").as("later_yr"))
      val carry = perYearLast
        .join(years, col("later_yr") > col("yr"))
        .groupBy(col("yr"), col("s"))
        .agg(min("later_yr").as("target_yr"))
        .select(col("target_yr").as("yr"), col("s.date").as("date"),
          col("s.temp_avg_f").as("temp_avg_f"),
          col("s.energy_demand_gwh").as("energy_demand_gwh"),
          lit(true).as("carry"))
      val w = Window.partitionBy("yr").orderBy("date")
      keyed.unionByName(carry)
        .withColumn("temp_avg_f", col("temp_avg_f") - lag("temp_avg_f", 1).over(w))
        .withColumn("energy_demand_gwh",
          col("energy_demand_gwh") - lag("energy_demand_gwh", 1).over(w))
        .filter(!col("carry"))
        .drop("yr", "carry")
        .na.drop(Seq("temp_avg_f", "energy_demand_gwh"))
        .orderBy("date")
    }
  }

  /** F8 — temperature binning, left-closed [lo, hi) with the `<50°F`
    * bin included (resolving the reference's three-way discrepancy in
    * favor of covering all values — SURVEY §7.4 trap 5). */
  val defaultBinEdges: Seq[Double] = Seq(50, 60, 70, 80, 90)
  val defaultBinLabels: Seq[String] = Seq("<50°F", "50-60°F", "60-70°F", "70-80°F", "80-90°F", ">90°F")

  def temperatureBin(c: Column,
      edges: Seq[Double] = defaultBinEdges, labels: Seq[String] = defaultBinLabels): Column = {
    require(labels.length == edges.length + 1)
    // NULL input → NULL bin (without the explicit guard, every `when`
    // evaluates NULL and control falls through to the LAST label,
    // silently counting missing readings as the hottest bin)
    val base: Column = when(c.isNull, lit(null)).when(c < edges.head, labels.head)
    edges.indices.tail.foldLeft(base) { (acc, i) =>
      acc.when(c < edges(i), labels(i))
    }.otherwise(labels.last)
  }

  /** Q-heatmap (A7): mean energy by temperature bin × day-of-week, with
    * fixed row/column ordering (reference src/analysis.py:59-66). */
  def heatmap(fact: DataFrame): DataFrame = {
    val dayOrder = Seq("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")
    val labelRank = defaultBinLabels.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (l, i)) => when(col("temp_range") === l, i).otherwise(acc) }
    fact
      .na.drop(Seq("temp_avg_f", "energy_demand_gwh"))
      .withColumn("temp_range", temperatureBin(col("temp_avg_f")))
      .withColumn("day_of_week", date_format(col("date"), "EEEE"))
      .groupBy("temp_range")
      .pivot("day_of_week", dayOrder)
      .agg(avg("energy_demand_gwh"))
      .na.fill(0.0, dayOrder)
      .withColumn("bin_rank", labelRank)
      .orderBy(col("bin_rank").desc) // reference: descending bin order
      .drop("bin_rank")
  }

  /** X1/X2 + sufficient statistics for X3, in ONE pass: slope,
    * intercept, r, r², x̄, Sxx and the residual standard error
    * s = sqrt(SSE/(n-2)) — everything the CI bands need. */
  def olsSummary(df: DataFrame, xCol: String, yCol: String): Option[OlsSummary] = {
    val clean = df.na.drop(Seq(xCol, yCol))
    val r = clean.agg(
      count(lit(1)).as("n"),
      corr(xCol, yCol).as("r"),
      expr(s"regr_slope($yCol, $xCol)").as("slope"),
      expr(s"regr_intercept($yCol, $xCol)").as("intercept"),
      avg(xCol).as("xbar"),
      expr(s"regr_sxx($yCol, $xCol)").as("sxx"),
      expr(s"regr_syy($yCol, $xCol)").as("syy"),
      expr(s"regr_sxy($yCol, $xCol)").as("sxy")).collect().head
    val n = r.getAs[Long]("n")
    if (n < 2) None // X4 degenerate-input guard (reference src/analysis.py:13-14)
    else {
      val slope = r.getAs[Double]("slope")
      val sxx = r.getAs[Double]("sxx")
      val syy = r.getAs[Double]("syy")
      val sxy = r.getAs[Double]("sxy")
      val sse = math.max(syy - slope * sxy, 0.0)
      val residStdErr = if (n > 2) math.sqrt(sse / (n - 2)) else 0.0
      val pearson = Option(r.getAs[java.lang.Double]("r")).map(_.toDouble).getOrElse(0.0)
      Some(OlsSummary(n, slope, r.getAs[Double]("intercept"), pearson,
        pearson * pearson, r.getAs[Double]("xbar"), sxx, residStdErr))
    }
  }

  /** X3 — OLS 95% mean-CI bands over a prediction grid: ŷ ± t(α/2, n−2)
    * · s · sqrt(1/n + (x−x̄)²/Sxx). The t quantile is one driver-side
    * scalar (graft.functions.Stats); the band arithmetic is column
    * expressions over the grid — no per-row driver work. */
  def olsCiBands(df: DataFrame, xCol: String, yCol: String,
      alpha: Double = 0.05): Option[DataFrame] =
    olsSummary(df, xCol, yCol).filter(_.n > 2).map { s =>
      val t = Stats.tQuantile(1 - alpha / 2, (s.n - 2).toDouble)
      val grid = df.na.drop(Seq(xCol)).select(col(xCol).as("x")).distinct()
      val se = lit(s.residStdErr) *
        sqrt(lit(1.0 / s.n) + pow(col("x") - s.xMean, 2) / lit(s.sxx))
      grid
        .withColumn("y_hat", lit(s.intercept) + lit(s.slope) * col("x"))
        .withColumn("ci_lower", col("y_hat") - lit(t) * se)
        .withColumn("ci_upper", col("y_hat") + lit(t) * se)
        .orderBy("x")
    }

  /** X5 — narrow-temperature-range warning (reference
    * dashboards/app.py:784-789). */
  def narrowRangeWarning(fact: DataFrame, minRangeF: Double = 20.0): Boolean = {
    val r = fact.na.drop(Seq("temp_avg_f"))
      .agg((max("temp_avg_f") - min("temp_avg_f")).as("range")).collect().head
    !r.isNullAt(0) && r.getDouble(0) < minRangeF
  }
}

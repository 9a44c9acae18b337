package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Seasonal decomposition + anomaly flagging for grouped daily series —
  * the monitoring layer over any metric the engine already rolls up
  * (the reference plots exactly this shape: daily city series with
  * weekly structure, dashboards/app.py's usage charts).
  *
  * Decomposition is the classic additive moving-average scheme:
  * trend = centered rolling mean, seasonal = per-weekday mean of the
  * detrended series, residual = value - trend - seasonal, anomaly =
  * |residual z-score| above threshold.
  *
  * Scale contract: the input is the DAILY rollup, not raw events —
  * callers aggregate first (one shuffle on (key, day), map-side
  * combined), so every window here runs over a per-key series of
  * ~365 rows/year regardless of raw volume. All four windows partition
  * by the series key (or key+weekday): no global window, no
  * single-partition choke point, and a 1000-executor cluster spreads
  * keys evenly. Weekday is epoch-day mod 7 — pure integer arithmetic,
  * so the grouping is reproducible across engines and timezones.
  */
object Seasonal {

  /** @param daily one row per (key, day) with a numeric value (callers
    *              should round the rolled-up value so shuffle-order
    *              float noise cannot leak into the decomposition)
    * @param halfWindow centered trend window is 2·halfWindow+1 days
    * @param zThreshold anomaly cut on |z| of the residual (applied to
    *                   the 4-decimal-rounded z so the verdict is exact)
    */
  def anomalies(daily: DataFrame, keyCol: String, dayCol: String, valCol: String,
      halfWindow: Int = 3, zThreshold: Double = 2.0): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val trendW = byKey.rowsBetween(-halfWindow, halfWindow)
    val dow = pmod(datediff(col(dayCol), to_date(lit("1970-01-01"))), lit(7))

    daily
      .withColumn("trend", avg(col(valCol)).over(trendW))
      .withColumn("dow", dow)
      .withColumn("detr", col(valCol) - col("trend"))
      .withColumn("seasonal",
        avg(col("detr")).over(Window.partitionBy(col(keyCol), col("dow"))))
      .withColumn("residual", col("detr") - col("seasonal"))
      .withColumn("sd",
        stddev_samp(col("residual")).over(Window.partitionBy(col(keyCol))))
      .withColumn("z",
        when(col("sd").isNull || col("sd") === 0.0, lit(0.0))
          .otherwise(col("residual") / col("sd")))
      .select(col(keyCol), col(dayCol), col(valCol),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("residual"), 4).as("residual"),
        round(col("z"), 4).as("z"),
        (abs(round(col("z"), 4)) > zThreshold).cast("int").as("is_anomaly"))
  }

  /** One-sided CUSUM change-point detection on grouped daily series —
    * the sequential test that catches a small persistent LEVEL SHIFT
    * (a 5% regression every day) that per-day z-scores never flag
    * because no single day is extreme.
    *
    * The classic recursion S_t = max(0, S_{t-1} + (x_t − μ − k)) looks
    * inherently sequential, but it equals the DRAWUP of the cumulative
    * deviation series: with C_t = Σ_{j≤t}(x_j − μ − k),
    * S_t = C_t − min_{j≤t} C_j. Proof sketch: both satisfy the same
    * recurrence — subtracting the running min is exactly the "clamp at
    * zero" reset. That identity turns the recursion into TWO ordered
    * window functions (running sum, running min) per key — fully
    * parallel across keys, restatable in any SQL engine, no UDF/fold.
    *
    * μ and σ come from the first `baselineDays` days per key (the
    * in-control period); k = slack·σ is the standard allowance (half
    * the shift magnitude worth detecting); the alarm fires where
    * S_t > h·σ. Same daily-rollup input contract as [[anomalies]].
    *
    * Engine-stable arithmetic (r11): values are quantized to exact
    * 1e-4 units (the daily-rollup contract is 2-dp values, so this is
    * lossless), μ/σ derive from exact BIGINT/DECIMAL power sums with
    * ONE double conversion each, and the cumulative deviation is
    * C_t = Σu/1e4 − rn·(μ + slack·σ) — the running sum is exact
    * integer arithmetic, so the statistic cannot drift on float
    * accumulation order. The previous avg/stddev_samp baseline summed
    * doubles in engine-chosen partial-aggregation order, which put
    * `s` a half-ulp across its 4-dp rounding boundary vs DuckDB at
    * sf0.001 (0.1335 vs 0.1336 on one row).
    */
  def cusum(daily: DataFrame, keyCol: String, dayCol: String, valCol: String,
      baselineDays: Int = 14, slack: Double = 0.5, h: Double = 4.0): DataFrame = {
    require(baselineDays >= 2, s"baseline too short: $baselineDays")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val ranked = daily
      .withColumn("__rn", row_number().over(byKey))
      .withColumn("__u", round(col(valCol) * 10000).cast("long"))
    val dec = "decimal(38,0)"
    // keys without a FULL baseline are excluded, not scored against a
    // 2-point "in-control period" whose noisy sigma alarms spuriously
    val base = ranked.where(col("__rn") <= baselineDays)
      .groupBy(col(keyCol))
      .agg(sum(col("__u")).as("__sv"),
        sum(col("__u").cast(dec) * col("__u").cast(dec)).as("__svv"),
        count(lit(1)).as("n_base"))
      .withColumn("mu", col("__sv").cast("double") / 10000.0 / col("n_base"))
      // sample stddev from the exact power sums: the n·Σu² − (Σu)²
      // numerator is DECIMAL(38,0)-exact (u ~ 1e10 at large SF, u²
      // ~ 1e20 — past BIGINT, far under 1e38), converted to double once
      .withColumn("sigma",
        sqrt((col("n_base").cast(dec) * col("__svv") -
            col("__sv").cast(dec) * col("__sv").cast(dec)).cast("double") /
          (col("n_base") * (col("n_base") - 1))) / 10000.0)
      .where(col("sigma").isNotNull && col("sigma") > 0.0 &&
        col("n_base") === baselineDays)
      .select(col(keyCol), col("mu"), col("sigma"))

    ranked.join(base, Seq(keyCol))
      .withColumn("c", sum("__u").over(byKey).cast("double") / 10000.0 -
        col("__rn") * (col("mu") + lit(slack) * col("sigma")))
      .withColumn("cmin", min(least(col("c"), lit(0.0))).over(byKey))
      .withColumn("s", round((col("c") - col("cmin")) / col("sigma"), 4))
      .select(col(keyCol), col(dayCol), col(valCol),
        round(col("mu"), 4).as("mu"), col("s"),
        (col("s") > h).cast("int").as("alarm"))
      .orderBy(keyCol, dayCol)
  }

  /** Lead-lag cross-correlation between every pair of daily series:
    * Pearson r of (series_a at day t, series_b at day t+lag) for each
    * lag in [-maxLag, +maxLag] — "which metric moves first" across the
    * rolled-up key set. A positive best lag means a LEADS b.
    *
    * Scale shape: the series are the daily rollup (the q144 contract),
    * so the lag alignment join and the per-(pair, lag) moment
    * aggregates run over |keys|·days rows; correlation is explicit-
    * sums algebra (restatable), and the best-lag flag is a window over
    * the 2·maxLag+1 rows of each pair. Pairs are a·(a−1)/2 over the
    * KEY set — this is a metric-pairs operator, not a row-pairs one.
    */
  def leadLagCorr(daily: DataFrame, keyCol: String, dayCol: String,
      valCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 30, s"maxLag out of range: $maxLag")
    // both join sides derive from `daily`, which is usually an
    // aggregate over a row-scale table — checkpoint the (key, day)
    // cell frame so the upstream scan+shuffle runs once, not once per
    // side (measured 2.6 s → 1.4 s on q154 at the derived sf1)
    val cells0 = daily.select(col(keyCol).as("__k"), col(dayCol).as("__d"),
      col(valCol).cast("double").as("__v")).transform(Pin.lazily)
    val a = cells0.select(col("__k").as("key_a"), col("__d").as("day"),
      col("__v").as("va"))
    val b = cells0.select(col("__k").as("key_b"), col("__d").as("day_b"),
      col("__v").as("vb"))
    val lags = (-maxLag to maxLag).map(l => lit(l))

    val aligned = a
      .select(col("key_a"), col("day"), col("va"),
        explode(array(lags: _*)).as("lag"))
      .join(b, expr("day_b = date_add(day, lag)"))
      .where(col("key_a") < col("key_b"))

    val cells = aligned.groupBy("key_a", "key_b", "lag")
      .agg(count(lit(1)).as("n"),
        sum("va").as("sa"), sum("vb").as("sb"),
        sum(col("va") * col("va")).as("saa"),
        sum(col("vb") * col("vb")).as("sbb"),
        sum(col("va") * col("vb")).as("sab"))
      .withColumn("den",
        sqrt((col("n") * col("saa") - col("sa") * col("sa")) *
             (col("n") * col("sbb") - col("sb") * col("sb"))))
      .withColumn("r",
        when(col("den") === 0.0 || col("den").isNull, lit(0.0))
          .otherwise((col("n") * col("sab") - col("sa") * col("sb")) / col("den")))
      .withColumn("r", round(col("r"), 6))

    val byPair = Window.partitionBy(col("key_a"), col("key_b"))
    cells
      .withColumn("best_abs", max(abs(col("r"))).over(byPair))
      .withColumn("is_best",
        (abs(col("r")) === col("best_abs")).cast("int"))
      .select("key_a", "key_b", "lag", "n", "r", "is_best")
      .orderBy("key_a", "key_b", "lag")
  }
}

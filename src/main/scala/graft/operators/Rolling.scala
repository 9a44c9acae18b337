package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window OLS trend per key — the moving version of the
  * grouped regression (q73): at every day, the slope/intercept/R² of
  * y over the last `windowDays` days, via the closed-form sums
  *
  *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
  *
  * computed with RANGE-frame window aggregates (gaps in the series
  * narrow the frame by time, not by rows — a missing day is absent,
  * not zero).
  *
  * Cross-engine exactness: window-frame SUM order differs between
  * engines (running vs segment-tree), so double sums would drift in
  * the last bits. Here BOTH regression inputs are integers — x is the
  * epoch day, y is the day's value total in integer cents — so every
  * frame sum and every product in the closed form is exact integer
  * arithmetic in double (all magnitudes < 2⁵³), and the final
  * division is the first rounding anywhere: bit-identical across
  * engines and partitionings, including the 9-digit cancellation in
  * nΣx² − (Σx)². The cents totals themselves come from a groupBy sum
  * rounded to 2dp — above any summation-order noise.
  *
  * Scale shape: one shuffle to the (key, day) grain, then one window
  * partitioned by key ordered by day — per-key state is the frame,
  * never the series. Degenerate frames (n < 2, or zero x-variance,
  * impossible with distinct days but guarded) yield null slope. */
object Rolling {

  /** df must carry (keyCols..., dayCol: date, centsCol: long). Returns
    * per (key, day): n_days in frame, slope/intercept in cents/day,
    * r2 — round 6. */
  def rollingOls(df: DataFrame, keyCols: Seq[String], dayCol: String,
      centsCol: String, windowDays: Int): DataFrame = {
    val g = keyCols.map(col)
    val base = df.select((g :+ col(dayCol).as("day")) :+
      col(centsCol).cast("double").as("y"): _*)
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("double"))
    val w = Window.partitionBy(g: _*).orderBy(col("x"))
      .rangeBetween(-(windowDays - 1).toLong, Window.currentRow)
    val sums = base
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("y").over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    sums
      .withColumn("slope0", when(col("n") >= 2 && dx =!= 0, cov / dx))
      .select((g ++ Seq(col("day"), col("n").cast("long").as("n_days"),
        round(col("slope0"), 6).as("slope"),
        round((col("sy") - col("slope0") * col("sx")) / col("n"), 6)
          .as("intercept"),
        round(when(dy =!= 0, cov * cov / (dx * dy)), 6).as("r2"))): _*)
      .orderBy(g :+ col("day"): _*)
  }
}

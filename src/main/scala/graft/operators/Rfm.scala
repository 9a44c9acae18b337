package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic marketing-analytics operator: score every customer 1–5 on
  * each axis by population quintile, then label coarse behavioral
  * segments from the score triple.
  *
  * Scale design: the per-customer rollup is ONE key shuffle; quintile
  * cut values come from [[Quantiles.bandCuts]] (the exact two-phase
  * histogram — NOT an unpartitioned `ntile(5)` window, which would
  * sort every customer through a single ordering spine); scoring is
  * then a row-local comparison against the broadcast 1-row cut frame.
  * The rollup is pinned with a lazy localCheckpoint because four
  * consumers (three quantile passes + the final scoring projection)
  * would otherwise each replay the orders scan and shuffle (the q178
  * lineage-replay lesson).
  *
  * Cross-engine determinism: recency is an integer day diff, frequency
  * an integer count, monetary an exact integer cents sum
  * (`round(amount·100)` per order — the Benford cents discipline), so
  * every quantile rank, cut comparison, and CASE label is integer
  * arithmetic the DuckDB oracle reproduces bit-for-bit. Tied metric
  * values always share a band (the [[Quantiles.bandCuts]] semantics),
  * so no arbitrary tie split can flip a score between engines. */
object Rfm {

  /** Per-customer RFM scores + segment label.
    *
    * Recency is measured against the LATEST order date in the frame
    * (the data's own "now" — reproducible, unlike wall clock); r = 5
    * means most recent. Output: (cust, recency_days, n_orders,
    * monetary_cents, r, f, m, segment), one row per customer with ≥ 1
    * order. */
  def scores(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    val cents = round(col(amountCol).cast("double") * 100).cast("long")
    // checkpoint the rollup ITSELF, before anything branches: the
    // anchor aggregate, the melted quantile pass, and the scoring
    // projection all read it — pinned any later, the orders scan +
    // per-customer shuffle would run once per branch (review finding
    // on this tranche: the first cut checkpointed below the anchor
    // cross-join, leaving the scan in both the main and broadcast
    // subtrees)
    val perCust0 = orders
      .filter(col(custCol).isNotNull && col(dateCol).isNotNull &&
        col(amountCol).isNotNull)
      .groupBy(col(custCol))
      .agg(max(to_date(col(dateCol))).as("__last"),
        count(lit(1)).as("n_orders"),
        sum(cents).as("monetary_cents"))
      .transform(Pin.lazily)
    val anchor = perCust0.agg(max(col("__last")).as("__anchor"))
    val perCust = perCust0.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      .drop("__last", "__anchor")

    // all three axes' quintile cuts from ONE melted quantile pass —
    // see Quantiles.bandCutsMulti
    val cuts = Quantiles.bandCutsMulti(perCust,
      Seq(("recency_days", "r"), ("n_orders", "f"), ("monetary_cents", "m")),
      nBands = 5)

    def band(v: Column, p: String): Column =
      Quantiles.bandExpr(v, (1 to 4).map(i => col(s"${p}_c$i")))

    perCust.crossJoin(broadcast(cuts))
      .withColumn("r", lit(6) - band(col("recency_days"), "r")) // recent = low days = high score
      .withColumn("f", band(col("n_orders"), "f"))
      .withColumn("m", band(col("monetary_cents"), "m"))
      .withColumn("segment",
        when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4, "champion")
          .when(col("r") >= 4 && col("f") <= 2, "new_or_promising")
          .when(col("r") <= 2 && col("f") >= 4, "at_risk")
          .when(col("r") <= 2 && col("f") <= 2, "hibernating")
          .otherwise("core"))
      .select(col(custCol), col("recency_days"), col("n_orders"),
        col("monetary_cents"), col("r"), col("f"), col("m"), col("segment"))
      .orderBy(col(custCol))
  }
}

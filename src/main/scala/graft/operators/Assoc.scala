package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (support / confidence / lift) — the
  * co-occurrence analysis layer over any (container, item) relation:
  * parts per order, tags per document, tools per session.
  *
  * Scale shape: pair generation happens WITHIN baskets only (one
  * equi-shuffle on the basket key), so cost is Σ|basket|², not n² —
  * and baskets above `maxBasket` are EXCLUDED before pair generation
  * (the q136/q139 oversized-block discipline: a degenerate mega-basket
  * would alone dominate the join; it carries no per-pair signal
  * anyway). `minSupport` prunes the pair cells BEFORE the per-item
  * stats join, so the rule frame the metrics run on is already small.
  * Item totals and the basket count broadcast back (1-row / |items|
  * dims).
  *
  * Rules are directional (a→b and b→a emitted from each qualifying
  * pair): confidence = n_ab/n_a, lift = n_ab·N/(n_a·n_b) — lift > 1 is
  * genuine affinity, lift < 1 substitution.
  */
object Assoc {

  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int = 2, maxBasket: Int = 1000): DataFrame = {
    val items = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .where(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val sized = items
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("basket"))))
      .where(col("bsize") <= maxBasket)
      .select("basket", "item")

    val nBaskets = sized.select("basket").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemN = sized.groupBy(col("item")).agg(count(lit(1)).as("n_item"))

    val pairs = sized.join(sized.select(col("basket"), col("item").as("item2")),
        Seq("basket"))
      .where(col("item") < col("item2"))
      .groupBy(col("item").as("a"), col("item2").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)

    // both directions from each qualifying pair
    val directed = pairs.select(col("a").as("antecedent"), col("b").as("consequent"), col("n_ab"))
      .unionByName(pairs.select(col("b").as("antecedent"), col("a").as("consequent"), col("n_ab")))

    directed
      .join(itemN.select(col("item").as("antecedent"), col("n_item").as("n_a")), "antecedent")
      .join(itemN.select(col("item").as("consequent"), col("n_item").as("n_b")), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        round(col("n_ab") / col("n_baskets").cast("double"), 6).as("support"),
        round(col("n_ab") / col("n_a").cast("double"), 6).as("confidence"),
        // n_a·n_b in DOUBLE: two popular items over ~1e10 baskets
        // overflow a long product silently (wraps negative)
        round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy("antecedent", "consequent")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Item-item collaborative filtering over co-occurrence baskets — the
  * retrieval artifact behind "users who bought X also bought Y":
  * cosine similarity of items' binary basket-incidence vectors,
  *
  *   cos(a, b) = n_ab / sqrt(n_a · n_b)
  *
  * (n_ab = baskets containing both, n_i = baskets containing i),
  * ranked to each item's top-k neighbors. Differs from association
  * rules (q152) in both metric (symmetric cosine vs directional
  * confidence/lift) and output shape (a per-item ranked neighbor list
  * — the thing a recommender actually serves — vs a flat rule table).
  *
  * Scale discipline (the q152/q136 bound): pairs generate ONLY within
  * a basket — Σ|basket|² work, never |items|² — and baskets larger
  * than `maxBasket` are EXCLUDED from the entire computation (pairs
  * AND the n_i denominators, so cosine stays consistent with the pair
  * universe) rather than allowed to explode quadratically; at 100 TB
  * an oversized basket is a data-quality signal, not a workload. The
  * ranking window partitions by item — bounded by each item's
  * co-occurring-neighbor count, which `maxBasket` caps at
  * |baskets per item| · maxBasket.
  */
object Cooccur {

  /** Top-`k` neighbors per item: (item, neighbor, n_ab, n_a, n_b,
    * cosine round 6, rank). Ties rank by neighbor id for determinism.
    * `minPairs` prunes noise pairs before the metric join. */
  def itemItemTopK(baskets: DataFrame, basketCol: String, itemCol: String,
      k: Int = 5, maxBasket: Int = 10, minPairs: Long = 2): DataFrame = {
    // ONE per-basket aggregate replaces the (bk, item) distinct, the
    // basket-size window, AND the basket self-join of the original
    // formulation: collect_set dedups inside the aggregate (one
    // shuffle, not distinct-then-regroup — measured 25 → 12 s on this
    // stage at derived sf10), the item list is bounded (≤ maxBasket
    // elements after the size filter), pairs explode ROW-LOCALLY from
    // the sorted list, and the frame is checkpointed because it feeds
    // both the pair generation and the per-item denominators
    val bitems = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .groupBy("bk")
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .where(size(col("items")) <= maxBasket) // singletons stay: they
      // contribute to the n_i denominators (and emit no pairs below)
      .transform(Pin.lazily)
    val itemCounts = bitems.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_i"))
    // a < b once per basket (the sorted list makes every pair emit in
    // canonical order); both directions re-emitted for ranking
    val half = bitems.select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairs)
    val directed = half.unionByName(
      half.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
    val scored = directed
      .join(itemCounts.withColumnRenamed("item", "a").withColumnRenamed("n_i", "n_a"), Seq("a"))
      .join(itemCounts.withColumnRenamed("item", "b").withColumnRenamed("n_i", "n_b"), Seq("b"))
      // double product before sqrt: BIGINT n_a·n_b overflows Int64 for
      // two ~4e9-basket items; doubles are exact below 2^53 so small-
      // scale cosines are bit-identical
      .withColumn("cosine",
        round(col("n_ab") / sqrt(col("n_a").cast("double") * col("n_b")), 6))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("a"))
        .orderBy(col("cosine").desc, col("b"))))
      .where(col("rank") <= k)
      .select(col("a").as("item"), col("b").as("neighbor"),
        col("n_ab"), col("n_a"), col("n_b"), col("cosine"), col("rank"))
      .orderBy("item", "rank")
  }

  /** Audience overlap matrix: for every unordered pair of segments
    * (distinct values of `segCol`), the distinct-entity intersection
    * plus Jaccard and lift — the "how much do these two audiences
    * share" readout behind reach planning and segment pruning.
    *
    *   jaccard = n_ab / (n_a + n_b − n_ab)
    *   lift    = (n_ab · N) / (n_a · n_b)     (1 = independent)
    *
    * Scale shape: one (entity, segment) dedup shuffle, then the pair
    * join keyed on the ENTITY — each entity contributes only its own
    * segment pairs, so work is Σ per-entity |segments|², bounded by
    * the segment-vocabulary size squared (segments are a curated
    * enumeration — tens, not millions), never |entities|². Counts are
    * exact integers; the two ratios are single divisions, round 6. */
  def audienceOverlap(df: DataFrame, entityCol: String, segCol: String): DataFrame = {
    // es feeds four branches (both self-join sides, per-segment
    // counts, the total) — checkpoint so the scan + dedup shuffle
    // runs once, not per branch (the q178 replay discipline)
    val es = df.select(col(entityCol).as("ent"), col(segCol).as("seg"))
      .where(col("ent").isNotNull && col("seg").isNotNull)
      .distinct()
      .transform(Pin.lazily)
    val segCounts = es.groupBy(col("seg")).agg(countDistinct("ent").as("n"))
    val total = es.agg(countDistinct("ent").as("n_total"))
    val pairs = es.as("x").join(es.as("y"), col("x.ent") === col("y.ent"))
      .where(col("x.seg") < col("y.seg"))
      .groupBy(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(segCounts.select(col("seg").as("seg_a"), col("n").as("n_a"))), Seq("seg_a"))
      .join(broadcast(segCounts.select(col("seg").as("seg_b"), col("n").as("n_b"))), Seq("seg_b"))
      .crossJoin(broadcast(total))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab").cast("double") / (col("n_a") + col("n_b") - col("n_ab")), 6)
          .as("jaccard"),
        round(col("n_ab").cast("double") * col("n_total") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy("seg_a", "seg_b")
  }
}

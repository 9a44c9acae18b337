package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Pin

/** Grid-bucketed nearest-neighbor spatial join — "nearest station
  * within radius", the geo primitive of the weather domain (the
  * reference pins one station per city in config; at fleet scale the
  * assignment itself is a query).
  *
  * Semantics: for each left row, the right row minimizing planar
  * squared degree distance d² = (Δlat)² + (Δlon)², restricted to
  * d ≤ `radiusDeg`; ties broken by right id ASC. The NEIGHBOR METRIC
  * is deliberately planar-degree, not great-circle: both engines
  * evaluate (a−b)² in identical IEEE arithmetic, so the argmin is
  * bit-deterministic with no trig in the decision path. The
  * great-circle haversine distance is still REPORTED (rounded to 2 km
  * decimals, far above cross-libm ulp drift) — decide on exact
  * arithmetic, describe with real geodesy.
  *
  * Scale shape: each side is hashed to (⌊lat/cell⌋, ⌊lon/cell⌋) grid
  * cells; the RIGHT (station/dimension) side explodes to its 3×3
  * neighborhood (9 rows), the fact side stays one row per point, then
  * a plain equi-shuffle on the cell key joins candidates. Cell size ≥
  * cutoff guarantees every right row within the cutoff of a left row
  * lands in the neighborhood, so grid output ≡ the |L|×|R| cross join
  * the oracle runs — without materializing it. The search runs in two
  * phases (fine cutoff first, full radius only for the unmatched
  * remainder — see [[nearestWithinRadius]]) so the dense-regime
  * candidate volume stays linear in points, not density × r². */
object Geo {

  private def cellOf(c: String, r: Double) = floor(col(c) / r).cast("long")

  /** Earth great-circle distance in km (haversine, R=6371.0088). */
  def haversineKm(lat1: org.apache.spark.sql.Column, lon1: org.apache.spark.sql.Column,
      lat2: org.apache.spark.sql.Column, lon2: org.apache.spark.sql.Column) = {
    val toRad = math.Pi / 180.0
    val dLat = (lat2 - lat1) * toRad
    val dLon = (lon2 - lon1) * toRad
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1 * toRad) * cos(lat2 * toRad) * pow(sin(dLon / 2), 2)
    lit(2 * 6371.0088) * asin(sqrt(a))
  }

  /** One grid pass: argmin-within-`cutoff` using `cell`-sized buckets.
    * Correct only when cutoff ≤ cell: every right point with per-axis
    * delta ≤ cell lands in the left point's 3×3 neighborhood, and
    * d ≤ cutoff ≤ cell bounds both axis deltas — so the pass sees ALL
    * rights within cutoff (including every tie at the minimum). */
  private def gridArgmin(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, cell: Double, cutoff: Double): DataFrame = {
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
    // the RIGHT (station/dimension) side takes the 9× neighborhood
    // explosion, the left (fact) side keeps one row per point: a pair
    // (cl, cr) matches iff |cl−cr| ≤ 1 per axis, which is symmetric in
    // which side offsets — so explode the side that's small at scale
    // (review finding: the first cut exploded the fact side)
    val lc = left.select(col(leftId), col("lat").as("l_lat"), col("lon").as("l_lon"),
      cellOf("lat", cell).as("cx"), cellOf("lon", cell).as("cy"))
    val r9 = right.select(col(rightId), col("lat").as("r_lat"), col("lon").as("r_lon"),
        cellOf("lat", cell).as("cx0"), cellOf("lon", cell).as("cy0"),
        explode(offsets).as("o"))
      .select(col(rightId), col("r_lat"), col("r_lon"),
        (col("cx0") + col("o.dx")).as("cx"), (col("cy0") + col("o.dy")).as("cy"))
    val cand = lc.join(r9, Seq("cx", "cy"))
      .withColumn("d2",
        (col("l_lat") - col("r_lat")) * (col("l_lat") - col("r_lat")) +
          (col("l_lon") - col("r_lon")) * (col("l_lon") - col("r_lon")))
      .where(col("d2") <= cutoff * cutoff)
    val w = Window.partitionBy(leftId).orderBy(col("d2"), col(rightId))
    cand.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(leftId), col(rightId),
        round(sqrt(col("d2")), 6).as("dist_deg"),
        round(haversineKm(col("l_lat"), col("l_lon"),
          col("r_lat"), col("r_lon")), 2).as("dist_km"))
  }

  /** left: (leftId, lat, lon); right: (rightId, lat, lon). Returns
    * (leftId, rightId, dist_deg round 6, dist_km round 2) for left
    * rows with ≥1 right neighbor within radiusDeg (inner semantics —
    * unmatched lefts are a diagnostic anti-join away, not a null
    * column).
    *
    * Two-phase expanding-ring search. A single radius-sized grid pass
    * materializes EVERY within-radius pair before the argmin — at high
    * point density that is Θ(|L|·|R|·r²/area), quadratic in points
    * (the r10 full-registry sf10 audit measured it at 69× for 10× the
    * data). But the NEAREST neighbor is almost always far closer than
    * the radius cap, so phase 1 reruns the same grid argmin with a
    * fine cutoff radius/`fineFactor`: when density is high nearly
    * every left point confirms there (candidate volume shrinks by
    * fineFactor², and a fine-pass winner at d ≤ fine is the GLOBAL
    * argmin — any unseen right is farther by construction). Only the
    * lefts with no fine-pass neighbor escalate to the full-radius
    * pass — few when density is high; cheap anyway when it is low,
    * because sparse density is what makes the coarse pass small. The
    * two regimes cover each other's worst case. */
  def nearestWithinRadius(left: DataFrame, right: DataFrame,
      leftId: String, rightId: String, radiusDeg: Double,
      fineFactor: Int = 8): DataFrame = {
    require(fineFactor >= 1, "fineFactor must be >= 1")
    if (fineFactor == 1)
      return gridArgmin(left, right, leftId, rightId, radiusDeg, radiusDeg)
        .orderBy(leftId)
    val fine = radiusDeg / fineFactor
    // winners feed BOTH the union and the escalation anti-join; without
    // the checkpoint the fine grid join would replay for each consumer
    val confirmed = gridArgmin(left, right, leftId, rightId, fine, fine)
      .transform(Pin.eager)
    val escalated = left.join(confirmed.select(leftId), Seq(leftId), "left_anti")
    confirmed.unionByName(
        gridArgmin(escalated, right, leftId, rightId, radiusDeg, radiusDeg))
      .orderBy(leftId)
  }
}

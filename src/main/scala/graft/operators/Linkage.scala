package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution with blocking — the structured-
  * data sibling of near-dup text detection (q31/q33): find records
  * that denote the SAME entity under typos and formatting drift
  * (customer/supplier master-data hygiene before any join on entity
  * identity).
  *
  * Scale discipline (Fellegi–Sunter blocking, the same bound as every
  * candidate generator in this engine): records pair ONLY within a
  * blocking key — one equi-shuffle on the block, never an n² cross
  * join — and the expensive pair scorer (levenshtein is O(len²) per
  * comparison) runs on candidates alone. Pathological blocks are the
  * failure mode (a constant key degenerates to all-pairs), so blocks
  * larger than `maxBlock` are EXCLUDED from pairing and reported
  * in-row (`oversized`, `block_size`) rather than silently exploding:
  * at 100 TB an oversized block means the blocking key needs
  * refinement, and the operator says so instead of running forever. */
object Linkage {

  /** Candidate matches within blocks: pairs (id_a < id_b) sharing
    * `blockCols`, scored `1 − lev/maxlen` on `nameCol`, kept at
    * `threshold`+. Output carries the block size so a reviewer sees
    * how selective the key was. */
  def blockedMatches(df: DataFrame, idCol: String, blockCols: Seq[String],
      nameCol: String, threshold: Double, maxBlock: Int = 100): DataFrame = {
    // a null blocking key can never equi-match (SQL join null
    // semantics), so such records are excluded EXPLICITLY here rather
    // than silently by the join; a pipeline that cares about the
    // unblocked fraction counts nulls upstream, where the fix (key
    // derivation) lives
    val base = df
      .filter(blockCols.map(col(_).isNotNull).reduce(_ && _))
      .select((idCol +: nameCol +: blockCols).map(col): _*)
    // per-block size via a key-partitioned window (no extra join); the
    // oversized cut happens BEFORE pair generation, so a degenerate
    // block costs its row count, not its row count squared
    val sized = base.withColumn("block_size",
      count(lit(1)).over(Window.partitionBy(blockCols.map(col): _*)))
    val ok = sized.filter(col("block_size") <= maxBlock)
    val a = ok.select((Seq(col(idCol).as("id_a"), col(nameCol).as("name_a")) ++
      (blockCols :+ "block_size").map(col)): _*)
    val b = ok.select((Seq(col(idCol).as("id_b"), col(nameCol).as("name_b")) ++
      blockCols.map(col)): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .withColumn("sim",
        round(lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("name_a")), length(col("name_b"))), 4))
      .filter(col("sim") >= threshold)
      .select((Seq("id_a", "id_b").map(col) ++ blockCols.map(col) ++
        Seq(col("block_size"), col("edit_dist"), col("sim"))): _*)
  }

  /** The blocks the cut excluded — the refinement worklist. */
  def oversizedBlocks(df: DataFrame, blockCols: Seq[String],
      maxBlock: Int = 100): DataFrame =
    df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlock)
}

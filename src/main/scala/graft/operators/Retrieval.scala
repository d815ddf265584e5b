package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank fusion for hybrid retrieval: combine a lexical ranking (BM25)
  * with a vector ranking (embedding cosine) — the standard two-tower
  * retrieval shape — without score calibration, via reciprocal-rank
  * fusion (Cormack, Clarke & Buettcher 2009): each list contributes
  * 1/(k + rank) for the ids it contains, absent ids contribute
  * nothing, and the sum orders the fused list.
  *
  * Engine-stable by construction: ranks are exact integers, each
  * reciprocal is rounded (6 dp) BEFORE the cross-list sum, and the
  * sum is a decimal (order-independent), so the fused ordering cannot
  * drift between engines or partitionings. Scale shape: each ranking
  * is already a skinny (id, rank) frame; fusion is one union + one
  * groupBy on the id — no corpus-sized data moves.
  */
object Retrieval {

  /** Fuse rankings (each an (idCol, rankCol) frame, rank 1 = best)
    * into (id, rrf, n_lists). `k` damps the head of each list.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      k: Int = 60
  ): DataFrame =
    rrfFuseWeighted(rankings.map(_ -> 1.0), idCol, rankCol, k)

  /** Weighted fusion: each list's reciprocal is scaled by its weight
    * before the rounded decimal sum — the knob for boosting one
    * retrieval tower (e.g. lexical 2:1 over vector) without score
    * calibration. Weights multiply INSIDE the per-list rounding so
    * the engine-stability argument is unchanged.
    */
  def rrfFuseWeighted(
      rankings: Seq[(DataFrame, Double)],
      idCol: String,
      rankCol: String,
      k: Int = 60
  ): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings
      .map { case (df, w) => df.select(
        col(idCol),
        round(lit(w) / (lit(k.toDouble) + col(rankCol).cast("double")), 6)
          .cast(DecimalType(18, 6)).as("_contrib")) }
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(
        round(sum(col("_contrib")).cast("double"), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
  }
}

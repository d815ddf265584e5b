package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (a hot
  * user, a null-ish default), the shuffle partition for that key
  * becomes the straggler. Salting splits each left key into
  * `saltFactor` synthetic sub-keys and replicates the (small) right
  * side once per salt, so the hot key's rows spread over `saltFactor`
  * reducers. AQE's skew-join handles moderate skew automatically; this
  * operator is for the pathological keys AQE can't split (e.g. a
  * single key bigger than an executor).
  *
  * The left salt is derived deterministically from the full row hash,
  * so results are stable run-to-run. Replicating the right side costs
  * `saltFactor ×` its size — use for big-left × modest-right joins.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq.filterNot(_ == key)

    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))

    val salts = explode(sequence(lit(0), lit(saltFactor - 1)))
    val saltedRight = right.withColumn("_salt", salts)

    saltedLeft
      .join(saltedRight, Seq(key, "_salt"))
      .select((leftCols ++ rightCols).map(col): _*)
  }
}

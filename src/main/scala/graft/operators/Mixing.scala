package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-based domain mixing — the training-mix primitive that
  * rebalances a multi-domain corpus before sampling (multilingual /
  * multi-source training à la "temperature sampling", e.g. mBERT,
  * XLM-R: p_d ∝ (n_d/N)^(1/T)). T=1 keeps natural proportions; T→∞
  * approaches uniform over domains; T<1 sharpens toward the head.
  *
  * Two-phase, scale-shaped:
  *  1. one skinny `groupBy(domain).count()` shuffle, collected on the
  *     driver — bounded by the number of DOMAINS (metadata scale, not
  *     data scale) — where the mix weights and integer quotas are
  *     computed exactly once;
  *  2. one window pass ranking each domain's docs by the portable
  *     md5 order (partition-invariant, engine-portable), keeping each
  *     domain's bottom-`quota` — exact quotas, deterministic members.
  *
  * The per-domain sort is the price of EXACT quotas; a corpus with a
  * single giant domain should pre-salt or fall back to the
  * expected-size variant ([[Sampling.sampledBy]] with rate
  * quota/n_d), which needs no window at all.
  *
  * Quotas are computed on the driver and spliced into the plan as a
  * literal map, so the DuckDB oracle can splice the identical values
  * — no cross-engine `pow` in either engine's per-row path.
  */
object Mixing {

  final case class DomainQuota(domain: String, nDocs: Long, quota: Long)

  /** Exact integer quotas per domain: floor(targetFraction · N ·
    * m_d), m_d ∝ (n_d/N)^(1/T), capped at n_d. Deterministic given
    * the data (counts are exact; the double arithmetic happens once,
    * driver-side, in domain-name order).
    */
  def temperatureQuotas(
      docs: DataFrame,
      groupCol: String,
      temperature: Double,
      targetFraction: Double
  ): Seq[DomainQuota] = {
    require(temperature > 0, "temperature must be positive")
    require(targetFraction > 0 && targetFraction <= 1, "targetFraction in (0, 1]")
    // Domains are compared as strings (any groupCol type works) and a
    // NULL domain gets no quota — an unclassified doc can't be "like"
    // anything, so it is excluded from both quotas and totals.
    val counts = docs.groupBy(col(groupCol).cast("string").as("_d")).count()
      .where(col("_d").isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) return Seq.empty
    val total = counts.map(_._2).sum.toDouble
    val powed = counts.map { case (_, n) => math.pow(n / total, 1.0 / temperature) }
    val z = powed.sum
    counts.zip(powed).map { case ((d, n), p) =>
      DomainQuota(d, n, math.min(n, math.floor(targetFraction * total * (p / z)).toLong))
    }.toSeq
  }

  /** The portable per-row mixing order: md5 of `salt|id` reduced into
    * the prime field — identical to the oracle's SQL spelling.
    */
  def mixOrder(id: Column, salt: String): Column =
    PortableHash.md5Mod(concat_ws("|", lit(salt), id.cast("string")))

  /** The temperature-rebalanced subsample: each domain's bottom-quota
    * docs in md5 order (id tie-break). Adds nothing but membership —
    * schema is preserved.
    */
  def temperatureSample(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      temperature: Double,
      targetFraction: Double,
      salt: String = "mix"
  ): DataFrame = {
    val quotas = temperatureQuotas(docs, groupCol, temperature, targetFraction)
    if (quotas.isEmpty) return docs.limit(0)
    val qMap = map(quotas.flatMap(q => Seq(lit(q.domain), lit(q.quota))): _*)
    val w = Window.partitionBy(groupCol)
      .orderBy(mixOrder(col(idCol), salt).asc, col(idCol).asc)
    docs
      .withColumn("_mix_rk", row_number().over(w))
      // string-cast lookup matches the quota keys; a NULL domain finds
      // no quota and is excluded
      .where(col("_mix_rk") <= element_at(qMap, col(groupCol).cast("string")))
      .drop("_mix_rk")
  }
}

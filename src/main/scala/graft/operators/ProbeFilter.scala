package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Membership filtering of a corpus against a probe key set whose size
  * rules out an exact broadcast — cross-corpus decontamination, "seen"
  * suppression, incremental-dedup probes. EXACT results, Bloom-paced:
  *
  * phase 1 aggregates the probe keys into an m-bit Bloom filter
  * ([[graft.functions.BloomFilterAgg]]) — m/8 bytes per partial buffer
  * cross the shuffle and m/8 bytes broadcast, regardless of probe
  * cardinality; phase 2 scans the corpus once against the broadcast
  * filter: keys the filter rejects are DEFINITELY absent (no false
  * negatives) and skip the join entirely, only the may-hit sliver
  * (true hits + the ~1% false-positive rate at 10 bits/key) shuffles
  * into an exact semi/anti join for confirmation. At a 1% hit rate
  * that is a ~50× cut of join input vs joining the whole corpus, and
  * the result is exactly the plain join's.
  *
  * The reference has no scale path here — its decontamination-style
  * probes materialize the probe set (datarepo's in-memory frames);
  * this is the Spark-native re-expression of the same contract.
  */
object ProbeFilter {

  /** Bloom filter of `key` (BIGINT) as a one-row aggregate Column. */
  def bloomFilterAgg(key: Column, numBits: Int, numHashes: Int = 7): Column =
    Bridge.column(graft.functions.BloomFilterAgg(
      Bridge.expression(key), numBits, numHashes).toAggregateExpression())

  def bloomMightContain(filter: Column, key: Column): Column =
    Bridge.column(graft.functions.BloomMightContain(
      Bridge.expression(filter), Bridge.expression(key)))

  /** `numBits` for an expected probe cardinality at ~10 bits/key
    * (false-positive rate ≈ 1% with 7 hashes), floored for tiny sets.
    */
  def bitsFor(expectedKeys: Long): Int =
    math.min(math.max(expectedKeys * 10L, 1024L), Int.MaxValue.toLong / 2).toInt

  /** Rows of `corpus` whose `keyCol` appears in `probe`'s `keyCol`
    * (`negate = false`) or does not (`negate = true` — the
    * decontamination direction). Exactly the semi/anti join result.
    */
  def bloomJoin(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Int,
      negate: Boolean = false
  ): DataFrame = {
    val bloom = probe.agg(bloomFilterAgg(col(keyCol), numBits).as("_bloom"))
    val keys = probe.select(keyCol).distinct()
    val tagged = corpus.crossJoin(broadcast(bloom))
      .withColumn("_may", bloomMightContain(col("_bloom"), col(keyCol)))
      .drop("_bloom")
    if (!negate)
      // may-hits only — the filter's misses cannot be in the probe
      tagged.where(col("_may")).drop("_may")
        .join(keys, Seq(keyCol), "left_semi")
    else
      // filter-misses are definitely clean and BYPASS the join; only
      // the may-hit sliver needs the exact anti-join confirm
      tagged.where(!col("_may")).drop("_may")
        .unionByName(
          tagged.where(col("_may")).drop("_may")
            .join(keys, Seq(keyCol), "left_anti"))
  }
}

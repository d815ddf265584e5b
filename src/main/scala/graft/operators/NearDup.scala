package graft.operators

import graft.functions.{PortableHash, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection: MinHash + LSH banding and SimHash.
  *
  * Scale shape: signatures are computed *within-row* with higher-order
  * functions (no explode, no shuffle — pure scan work over the
  * corpus). The only shuffle in the whole pipeline is the LSH
  * bucket self-join, which is an equi-join on band hashes — bounded
  * fan-out, never the O(n²) all-pairs join. Candidate verification
  * (exact Jaccard) happens only inside buckets. All hashing is
  * md5-derived (PortableHash), so the DuckDB oracle reproduces results
  * bit-for-bit.
  */
object NearDup {

  def sigCol(j: Int): String = s"sig_$j"

  /** Append `numHashes` MinHash signature columns computed over char
    * `k`-shingles of `textCol`. Duplicate shingles don't affect a min,
    * so no distinct pass is needed.
    */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      k: Int = 5,
      numHashes: Int = 8
  ): DataFrame = {
    val hashes = transform(Text.shingles(col(textCol), k), sh => PortableHash.md5Mod(sh))
    val withH = df.withColumn("_sh", hashes)
    (0 until numHashes)
      .foldLeft(withH) { (d, j) =>
        d.withColumn(sigCol(j), array_min(transform(col("_sh"), h => PortableHash.affine(h, j))))
      }
      .drop("_sh")
  }

  /** LSH band key: md5 over the '|'-joined signatures of the band. */
  def bandKey(sigs: Seq[Column]): Column =
    md5(concat_ws("|", sigs: _*))

  /** Candidate near-duplicate pairs via banding, verified with exact
    * shingle-set Jaccard; returns (a_id, b_id, jaccard) with
    * jaccard >= threshold, a_id < b_id, rounded to 4 decimals.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      numHashes: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val signed = minhashSignatures(df, textCol, k, numHashes)
      .withColumn("_shset", array_distinct(Text.shingles(col(textCol), k)))
      .select((Seq(col(idCol), col("_shset")) ++ (0 until numHashes).map(j => col(sigCol(j)))): _*)

    // (id, band_id, band_hash) — explode only the band keys, not the shingles
    val banded = signed.select(
      col(idCol).as("_id"),
      col("_shset"),
      array((0 until bands).map { b =>
        val sigs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(sigCol(j)))
        struct(lit(b).as("band"), bandKey(sigs).as("bh"))
      }: _*).as("_bands"))
      .select(col("_id"), col("_shset"), explode(col("_bands")).as("_b"))
      .select(col("_id"), col("_shset"), col("_b.band").as("band"), col("_b.bh").as("bh"))

    val a = banded.select(col("band"), col("bh"), col("_id").as("a_id"), col("_shset").as("a_sh"))
    val b = banded.select(col("band"), col("bh"), col("_id").as("b_id"), col("_shset").as("b_sh"))

    val candidates = a
      .join(b, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh")
      .dropDuplicates("a_id", "b_id")

    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val union = (size(col("a_sh")) + size(col("b_sh"))).cast("double") - inter
    candidates
      .withColumn("jaccard", round(inter / union, 4))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Exact n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, k: Int = 5): Column = {
    val sa = array_distinct(Text.shingles(a, k))
    val sb = array_distinct(Text.shingles(b, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    round(inter / (size(sa) + size(sb) - inter).cast("double"), 4)
  }

  /** SimHash over whitespace tokens: `bits`-wide bit-majority of
    * md5-derived token hashes (token multiplicity = natural term
    * weighting). Pure per-row arithmetic; DuckDB mirror uses the same
    * shift/mask expressions.
    */
  def simhash(textCol: Column, bits: Int = 16): Column = {
    val hashes = transform(Text.wsTokens(textCol), t => PortableHash.md5Long(t))
    (0 until bits)
      .map { i =>
        val vote = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + when((shiftright(h, i) % 2) === 1, 1L).otherwise(-1L))
        when(vote > 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Hamming distance between two simhash values (for near-dup
    * thresholding at query time).
    */
  def hammingDistance(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits)
      .map(i => (shiftright(a.bitwiseXOR(b), i) % 2).cast("int"))
      .reduce(_ + _)
}

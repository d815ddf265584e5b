package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for LLM pretraining: documents are concatenated
  * (in a deterministic order, per stream) into one token stream and
  * cut into fixed-budget examples — the concat-and-chunk shape
  * autoregressive training batches use. The packing plan is pure
  * window arithmetic over integer token counts: one shuffle on the
  * stream key, no RNG, no iteration, bit-stable across engines (the
  * DuckDB oracle runs the identical window SQL).
  *
  * Each document's span in the stream is [tok_start, tok_start + n);
  * the examples it lands in are chunk_first..chunk_last (a document
  * longer than the budget spans several; a document ending exactly on
  * a boundary does not bleed into the next chunk). At 100 TB the
  * stream key shards the corpus and each partition's plan is
  * independent — the window never sees more than one stream.
  */
object Packing {

  /** Chunk-assignment plan: adds `tok_start`, `chunk_first`,
    * `chunk_last`, `crosses_boundary` to `df`.
    *
    * @param streamCol  independent packing stream (e.g. source)
    * @param orderCol   deterministic order within the stream — must be
    *                   unique per stream or the packing is ambiguous
    * @param tokenCol   integer token count of the document
    * @param budget     tokens per packed example
    */
  /** Length-bucketed batch assignment — the padded-batch complement
    * of [[concatChunks]] (encoder / SFT batches pad every sequence to
    * the batch max, so batching SIMILAR lengths together is what
    * keeps the padding waste down): documents bucket by length into
    * power-of-two bins (`bin` = ceil(log2(len)) over a floor), each
    * bin's batch capacity is `floor(budget / binCap)` sequences
    * (binCap = the bin's upper length bound = what every member pads
    * to), and members fill batches in (len, id) order —
    * `batch = row_number div capacity`. Fully deterministic integer
    * arithmetic, so the plan is SQL-replayable; the padded cost of a
    * batch never exceeds `budget`.
    *
    * Adds `bin` (log2 upper bound exponent), `bin_cap`, `batch`
    * (0-based within the bin), and `padded` (= bin_cap, what the
    * sequence pads to). One shuffle on `bin`; only skinny
    * (len, id) columns ride it.
    */
  def lengthBucketBatches(
      df: DataFrame,
      idCol: String,
      lenCol: String,
      budget: Long,
      minBin: Int = 4
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(minBin >= 0 && minBin < 63, s"minBin out of range: $minBin")
    require((1L << minBin) <= budget,
      s"smallest bin cap ${1L << minBin} exceeds the batch budget $budget")
    val len = col(lenCol).cast(LongType)
    // bin = smallest power-of-two exponent with 2^bin >= len, floored
    // at minBin. ceil(log2(n)) = bit length of n-1, computed EXACTLY
    // as length(bin(n-1)) — a float log2 could land on either side of
    // a power-of-two boundary and flip the bin cross-engine
    val bin = greatest(lit(minBin),
      length(expr(s"bin(greatest($lenCol, 2) - 1)")).cast("int"))
    val withBin = df
      .where(len > 0 && len <= budget)
      .withColumn("bin", bin)
      // the pad target; clamped to the budget so capacity >= 1 (a
      // 100-token budget puts 65..100-token docs in one-per-batch)
      .withColumn("bin_cap",
        least(expr("shiftleft(CAST(1 AS BIGINT), bin)").cast(LongType), lit(budget)))
    withBin
      .withColumn("batch",
        expr(s"(row_number() over (partition by bin order by " +
          s"cast($lenCol as bigint) asc, $idCol asc) - 1) div ($budget div bin_cap)"))
      .withColumn("padded", col("bin_cap"))
  }

  def concatChunks(
      df: DataFrame,
      streamCol: String,
      orderCol: String,
      tokenCol: String,
      budget: Long
  ): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokenCol).cast(LongType)).over(w)
    val start = (cum - col(tokenCol).cast(LongType)).as("tok_start")
    df.withColumn("tok_start", start)
      // integer `div` on both engines: exact, no float rounding
      .withColumn("chunk_first", expr(s"tok_start div $budget"))
      .withColumn("chunk_last",
        expr(s"greatest(tok_start, tok_start + $tokenCol - 1) div $budget"))
      .withColumn("crosses_boundary", col("chunk_last") > col("chunk_first"))
  }

  /** Per-stream packing summary: number of documents, total tokens,
    * packed examples produced, and documents crossing an example
    * boundary (the fraction a pipeline pads or masks across).
    */
  def chunkStats(
      df: DataFrame,
      streamCol: String,
      orderCol: String,
      tokenCol: String,
      budget: Long
  ): DataFrame =
    concatChunks(df, streamCol, orderCol, tokenCol, budget)
      .groupBy(col(streamCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol).cast(LongType)).as("n_tokens"),
        // ceil(total/budget) from the total, NOT max(chunk_last)+1: a
        // zero-token doc whose tok_start lands exactly on a budget
        // boundary indexes a chunk past the data and would overcount.
        // A stream of only zero-token docs packs into ZERO examples.
        when(sum(col(tokenCol).cast(LongType)) > 0,
          expr(s"(sum(cast($tokenCol as bigint)) - 1L) div $budget + 1L"))
          .otherwise(lit(0L)).as("n_chunks"),
        sum(when(col("crosses_boundary"), 1L).otherwise(0L)).as("n_boundary_docs"))
}

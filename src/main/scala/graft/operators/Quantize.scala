package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Int8 scalar quantization of embedding vectors — the memory-scale
  * path for ANN serving (a float32 corpus quantized to int8 codes is
  * 4× smaller, which at 100 TB of embeddings is the difference
  * between RAM-resident and not; the standard trick behind FAISS's
  * SQ8 / product-quantization baselines, e.g. Jégou et al. 2011).
  *
  * Per-vector SYMMETRIC quantization: scale = maxabs/127, code_i =
  * floor(v_i · 127 / maxabs) ∈ [-127, 127]. Everything is a pure scan
  * expression (one pass, no shuffle, codegen'd HOFs); floor — not
  * round — so the arithmetic is bit-identical across engines (no
  * half-up vs half-even ambiguity), which keeps the whole profile
  * oracle-checkable.
  */
object Quantize {

  /** Quantization profile per vector: `maxabs` (range anchor), the
    * int8 `codes`, and reconstruction diagnostics. All-zero vectors
    * quantize to all-zero codes with maxabs 0.
    */
  def int8Profile(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val maxabs = array_max(transform(v, x => abs(x.cast(DoubleType))))
    val codes = when(col("maxabs") > 0,
      transform(v, x =>
        floor(x.cast(DoubleType) * lit(127.0) / col("maxabs")).cast(LongType)))
      .otherwise(transform(v, _ => lit(0L)))
    df.select(col(idCol), v, maxabs.as("maxabs"))
      .withColumn("codes", codes)
      .withColumn("scale", col("maxabs") / lit(127.0))
  }

  /** Flat per-vector summary (oracle-friendly: integers + rounded
    * doubles only): code sum/min/max and the max reconstruction error.
    */
  def int8Summary(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val p = int8Profile(df, idCol, vecCol)
    val err: Column = array_max(zip_with(col(vecCol), col("codes"),
      (x, c) => abs(x.cast(DoubleType) - c * col("scale"))))
    p.select(
      col(idCol),
      round(col("maxabs"), 4).as("maxabs"),
      aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
      array_min(col("codes")).as("code_min"),
      array_max(col("codes")).as("code_max"),
      round(err, 4).as("max_err"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns using
  * higher-order functions — codegen'd, no UDFs, no shuffle; scales as
  * pure scan work. Elements are cast to double before any arithmetic
  * and accumulation is sequential left-to-right, which is exactly what
  * the DuckDB oracle does, so rounded outputs are engine-identical.
  */
object Vectors {

  /** Sequential-sum dot product.
    * DuckDB: list_sum(list_transform(range(1, len(a)+1),
    *   i -> a[i]::DOUBLE * b[i]::DOUBLE))
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded for cross-engine hash stability.
    * Evaluated by the native one-pass [[VecCosine]] expression —
    * arithmetic identical to [[cosineDeclarative]] (asserted in
    * tests), ~10× faster than the interpreted HOF path.
    */
  def cosine(a: Column, b: Column, scale: Int = 4): Column =
    round(VectorExpressions.cosine(a, b), scale)

  /** Declarative HOF formulation — the readable specification the
    * native expression must reproduce.
    */
  def cosineDeclarative(a: Column, b: Column, scale: Int = 4): Column =
    round(dot(a, b) / (norm(a) * norm(b)), scale)

  /** Squared L2 distance (rounded), native one-pass evaluation. */
  def l2sq(a: Column, b: Column, scale: Int = 4): Column =
    round(VectorExpressions.l2sq(a, b), scale)

  def l2sqDeclarative(a: Column, b: Column, scale: Int = 4): Column =
    round(
      aggregate(
        zip_with(a, b, (x, y) => {
          val d = x.cast("double") - y.cast("double")
          d * d
        }),
        lit(0.0),
        (acc, v) => acc + v),
      scale)
}

package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling (the ANALYZE / SUMMARIZE surface a data catalog
  * serves next to schema introspection): per-column row/null/distinct
  * counts and min/max, computed in ONE aggregation job over all
  * requested columns (4 aggregates per column, map-side combined; the
  * result is one k·4-wide row, exploded to k rows on the driver —
  * KB, not data).
  *
  * `exact = true` uses exact count(distinct) — Spark plans multiple
  * distinct aggregates via an expand, k columns ≈ k× the shuffled
  * rows, fine for dimension tables; at corpus scale pass
  * `exact = false` for the HLL approx_count_distinct (one pass, no
  * expand — not oracle-stable, so the gate checks the exact form).
  *
  * min/max render deterministically cross-engine: integers/strings
  * cast verbatim; floating columns round(4) through DECIMAL(18,4)
  * before the string cast (double→string formatting differs between
  * engines; decimal rendering doesn't).
  */
object Profile {

  final case class ColumnProfile(
      column: String, n_rows: Long, n_null: Long, n_distinct: Long,
      min_s: Option[String], max_s: Option[String])

  def summarize(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true
  ): DataFrame = {
    require(cols.nonEmpty, "summarize needs at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"column $c not in ${df.columns.mkString(", ")}"))
    val spark = df.sparkSession
    import spark.implicits._

    def rendered(c: String, agg: org.apache.spark.sql.Column) =
      df.schema(c).dataType match {
        case DoubleType | FloatType =>
          agg.cast(DoubleType).cast(DecimalType(18, 4)).cast(StringType)
        case _ => agg.cast(StringType)
      }

    // resolve by exact name (df(c) backtick-interprets; a column
    // literally named "a.b" must not resolve as a nested field)
    def qc(c: String) = col(s"`${c.replace("`", "``")}`")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(qc(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(qc(c))
         else approx_count_distinct(qc(c))).as(s"__dst_$c"),
        rendered(c, min(qc(c))).as(s"__min_$c"),
        rendered(c, max(qc(c))).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    cols.map { c =>
      ColumnProfile(c, n,
        n - row.getAs[Long](s"__cnt_$c"),
        row.getAs[Long](s"__dst_$c"),
        Option(row.getAs[String](s"__min_$c")),
        Option(row.getAs[String](s"__max_$c")))
    }.toDF()
  }
}

package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "alpha", 1.5, Seq("x", "y")),
    (2L, "beta", 2.5, Seq("y", "z")),
    (3L, "gamma", 3.5, Seq("z")),
    (4L, "alpha beta", 4.5, Seq.empty[String])
  ).toDF("id", "name", "score", "tags")

  private def ids(fs: Seq[Filter]): Seq[Long] =
    df.filter(Filters.toColumn(Filters.normalize(fs)).get)
      .select("id").as[Long].collect().toSeq.sorted

  test("comparison operators") {
    assert(ids(Seq(Filter("score", "<", 2.0))) == Seq(1L))
    assert(ids(Seq(Filter("score", ">=", 2.5))) == Seq(2L, 3L, 4L))
    assert(ids(Seq(Filter("name", "=", "beta"))) == Seq(2L))
    assert(ids(Seq(Filter("name", "!=", "beta"))) == Seq(1L, 3L, 4L))
  }

  test("in / not in") {
    assert(ids(Seq(Filter("name", "in", Seq("alpha", "gamma")))) == Seq(1L, 3L))
    assert(ids(Seq(Filter("name", "not in", Seq("alpha", "gamma")))) == Seq(2L, 4L))
  }

  test("contains on strings") {
    assert(ids(Seq(Filter("name", "contains", "eta"))) == Seq(2L, 4L))
  }

  test("includes family on arrays") {
    assert(ids(Seq(Filter("tags", "includes", "y"))) == Seq(1L, 2L))
    assert(ids(Seq(Filter("tags", "includes any", Seq("x", "z")))) == Seq(1L, 2L, 3L))
    assert(ids(Seq(Filter("tags", "includes all", Seq("y", "z")))) == Seq(2L))
  }

  test("DNF: OR of ANDs") {
    val dnf = Filters.normalizeDnf(Seq(
      Seq(Filter("name", "=", "alpha"), Filter("score", "<", 2.0)),
      Seq(Filter("tags", "includes", "z"), Filter("score", ">", 3.0))))
    val got = df.filter(Filters.toColumn(dnf).get).select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 3L))
  }

  test("empty filters mean no filtering") {
    assert(Filters.toColumn(Filters.normalize(Seq.empty)).isEmpty)
  }

  test("empty conjunction inside a DNF means TRUE, not dropped") {
    // [[<empty>], [name=beta]] — the empty conjunction matches every
    // row, so the whole disjunction is TRUE. (The reference's
    // _filters_to_expr drops the empty conjunction, silently losing
    // those rows; we diverge on purpose — see Filters.toColumn.)
    val dnf: Filters.Normalized = Seq(Seq.empty, Seq(Filter("name", "=", "beta")))
    val got = df.filter(Filters.toColumn(dnf).get).select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("toSql mirrors the reference grammar") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("s", StringType),
      StructField("arr", ArrayType(StringType))))
    val sql = Filters.toSql(schema, Seq(
      Seq(Filter("a", ">", 1), Filter("s", "=", "x'y")),
      Seq(Filter("arr", "includes any", Seq("u", "v")))))
    assert(sql == "((a > 1) and (s = 'x''y')) or ((array_contains(arr, 'u') or array_contains(arr, 'v')))")
    assert(Filters.toSql(schema, Seq.empty) == "true")
    intercept[IllegalArgumentException] {
      Filters.toSql(schema, Seq(Seq(Filter("nope", "=", 1))))
    }
  }

  test("sql predicate round-trips through Spark") {
    val sql = Filters.toSql(df.schema, Seq(
      Seq(Filter("name", "contains", "alpha"), Filter("score", "<", 2.0))))
    val got = df.filter(expr(sql)).select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}

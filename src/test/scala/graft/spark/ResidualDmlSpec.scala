package graft.spark

import graft.SparkSpec
import graft.tables.{DeltaSql, DeltaWrite, HudiWrite, IcebergWrite, LakehouseSql}

/** Residual DML (r15): UPDATE/DELETE predicates OUTSIDE the pruning
  * filter algebra (modulo, LIKE, length, arithmetic between columns)
  * no longer refuse — the algebra-expressible conjuncts prune files
  * and the full predicate evaluates row-by-row in the writers, across
  * the catalog SQL door and both string front doors, on all three
  * formats. Subqueries and non-deterministic predicates refuse
  * loudly; NULL predicates keep rows (DELETE) / leave them untouched
  * (UPDATE), per SQL.
  */
class ResidualDmlSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog[A](f: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    f
  }

  private def rows(d: String): Set[(Long, String, Option[Long])] =
    spark.sql(s"SELECT id, v, x FROM graft.`$d`").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  private val seed = Seq(
    (1L, "a", Option(10L)), (2L, "bb", Option(20L)),
    (3L, "ccc", Option(30L)), (4L, "dd", Option(40L)),
    (5L, "e", Option.empty[Long]))

  test("catalog UPDATE and DELETE with modulo predicates (Delta CoW)") {
    withCatalog {
      val d = tempDir("res-delta").toString + "/t"
      DeltaWrite.append(spark, seed.toDF("id", "v", "x"), d)
      spark.sql(s"UPDATE graft.`$d` SET v = upper(v) WHERE id % 2 = 0")
      assert(rows(d) == Set(
        (1L, "a", Some(10L)), (2L, "BB", Some(20L)), (3L, "ccc", Some(30L)),
        (4L, "DD", Some(40L)), (5L, "e", None)))
      // NULL predicate rows stay: x % 20 = 0 is NULL for id 5
      spark.sql(s"DELETE FROM graft.`$d` WHERE x % 20 = 0")
      assert(rows(d) == Set(
        (1L, "a", Some(10L)), (3L, "ccc", Some(30L)), (5L, "e", None)))
    }
  }

  test("catalog residual DML routes through deletion vectors when enabled") {
    withCatalog {
      val d = tempDir("res-dv").toString + "/t"
      DeltaWrite.append(spark, seed.toDF("id", "v", "x"), d)
      DeltaWrite.setTableProperties(spark, d,
        Map("delta.enableDeletionVectors" -> "true"))
      spark.sql(s"UPDATE graft.`$d` SET x = x + 1 WHERE length(v) = 2")
      spark.sql(s"DELETE FROM graft.`$d` WHERE v LIKE 'c%'")
      assert(rows(d) == Set(
        (1L, "a", Some(10L)), (2L, "bb", Some(21L)),
        (4L, "dd", Some(41L)), (5L, "e", None)))
    }
  }

  test("catalog residual UPDATE and DELETE on Iceberg") {
    withCatalog {
      val d = tempDir("res-ice").toString + "/t"
      IcebergWrite.append(spark, seed.toDF("id", "v", "x"), d)
      spark.sql(s"UPDATE graft.`$d` SET v = concat(v, '!') WHERE id % 2 = 1")
      // lengths AFTER the update decide: only 'ccc!' has length 4
      spark.sql(s"DELETE FROM graft.`$d` WHERE length(v) = 4")
      assert(rows(d) == Set(
        (2L, "bb", Some(20L)), (4L, "dd", Some(40L)),
        (1L, "a!", Some(10L)), (5L, "e!", None)))
    }
  }

  test("catalog residual UPDATE and DELETE on Hudi") {
    withCatalog {
      val d = tempDir("res-hudi").toString + "/t"
      HudiWrite.bulkInsert(spark, seed.toDF("id", "v", "x"), d, "id", Seq.empty)
      spark.sql(s"UPDATE graft.`$d` SET x = x * 2 WHERE id % 2 = 1 AND x IS NOT NULL")
      spark.sql(s"DELETE FROM graft.`$d` WHERE length(v) > 2")
      assert(rows(d) == Set(
        (1L, "a", Some(20L)), (2L, "bb", Some(20L)),
        (4L, "dd", Some(40L)), (5L, "e", None)))
    }
  }

  test("subqueries and non-deterministic predicates refuse loudly") {
    withCatalog {
      val d = tempDir("res-refuse").toString + "/t"
      DeltaWrite.append(spark, seed.toDF("id", "v", "x"), d)
      Seq(1L).toDF("k").createOrReplaceTempView("res_keys")
      val e1 = intercept[Exception] {
        spark.sql(
          s"UPDATE graft.`$d` SET v = 'z' WHERE id IN (SELECT k FROM res_keys)")
      }
      assert(e1.getMessage.contains("subquery"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"DELETE FROM graft.`$d` WHERE rand() < 0.5 AND id % 2 = 0")
      }
      assert(e2.getMessage.contains("deterministic"), e2.getMessage)
      // and through the string front door too
      val e3 = intercept[Exception] {
        DeltaSql.exec(spark, s"DELETE FROM delta.`$d` WHERE rand() < 0.5 AND id % 2 = 0")
      }
      assert(e3.getMessage.contains("deterministic"), e3.getMessage)
      assert(rows(d).size == 5)
    }
  }

  test("delete-all shapes keep the DSv2 refusal on Iceberg (not hijacked)") {
    withCatalog {
      val d = tempDir("res-delall").toString + "/t"
      IcebergWrite.append(spark, seed.toDF("id", "v", "x"), d)
      // foldable conditions must stay with the DSv2 route, whose
      // canDeleteWhere gate refuses delete-all on Iceberg/Hudi — the
      // residual route must NOT write a position delete per table row
      intercept[Exception] { spark.sql(s"DELETE FROM graft.`$d` WHERE 1 = 1") }
      assert(rows(d).size == 5)
      intercept[Exception] { spark.sql(s"DELETE FROM graft.`$d`") }
      assert(rows(d).size == 5)
    }
  }

  test("string front doors take residual predicates; algebra conjuncts still prune") {
    withCatalog {
      val d = tempDir("res-doors").toString + "/t"
      // two files with disjoint id ranges — the algebra conjunct must
      // keep the low file untouched (filesRemoved == 1)
      DeltaWrite.append(spark,
        Seq((1L, "a", Option(10L)), (2L, "bb", Option(20L)))
          .toDF("id", "v", "x").coalesce(1), d)
      DeltaWrite.append(spark,
        Seq((101L, "ccc", Option(30L)), (102L, "dd", Option(40L)))
          .toDF("id", "v", "x").coalesce(1), d)
      val res = DeltaSql.exec(spark,
        s"UPDATE delta.`$d` SET v = upper(v) WHERE id % 2 = 0 AND id >= 100")
        .collect().head
      assert(res.getLong(1) == 1L,
        s"expected exactly one rewritten file (pruned by id >= 100), got $res")
      assert(rows(d) == Set(
        (1L, "a", Some(10L)), (2L, "bb", Some(20L)),
        (101L, "ccc", Some(30L)), (102L, "DD", Some(40L))))
      val ice = tempDir("res-doors-ice").toString + "/t"
      IcebergWrite.append(spark, seed.toDF("id", "v", "x"), ice)
      LakehouseSql.exec(spark, s"DELETE FROM iceberg.`$ice` WHERE length(v) = 2")
      assert(rows(ice) == Set(
        (1L, "a", Some(10L)), (3L, "ccc", Some(30L)), (5L, "e", None)))
      val hud = tempDir("res-doors-hud").toString + "/t"
      HudiWrite.bulkInsert(spark, seed.toDF("id", "v", "x"), hud, "id", Seq.empty)
      LakehouseSql.exec(spark, s"DELETE FROM hudi.`$hud` WHERE id % 2 = 1")
      assert(rows(hud) == Set((2L, "bb", Some(20L)), (4L, "dd", Some(40L))))
    }
  }
}

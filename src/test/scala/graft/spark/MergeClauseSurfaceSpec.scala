package graft.spark

import graft.SparkSpec
import graft.tables.{DeltaWrite, HudiWrite, IcebergWrite}

/** The widened catalog MERGE clause surface (r15): multiple WHEN
  * MATCHED clauses under SQL first-match-wins statement order,
  * conditional and column-list INSERT clauses (unassigned columns
  * NULL-fill), WHEN NOT MATCHED BY SOURCE UPDATE/DELETE, and the
  * clause-subset shapes (insert-only, update-only, delete-only).
  * DELETE clauses stay Delta-only and refuse at PLAN time on
  * Iceberg/Hudi; the non-delete surface works across the triad.
  */
class MergeClauseSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog[A](f: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    f
  }

  private def rows(d: String): Set[(Long, String, Option[Long])] =
    spark.sql(s"SELECT id, v, x FROM graft.`$d`").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("multiple WHEN MATCHED UPDATE clauses: first match wins in statement order") {
    withCatalog {
      val d = tempDir("mcs-multi").toString + "/t"
      DeltaWrite.append(spark, Seq(
        (1L, "a", Option(10L)), (2L, "b", Option(20L)),
        (3L, "c", Option(30L)), (4L, "d", Option(40L))).toDF("id", "v", "x"), d)
      Seq((1L, "s1", Option(5L)), (2L, "s2", Option(25L)),
        (3L, "s3", Option(100L)), (9L, "s9", Option(9L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_multi_src")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_multi_src s ON t.id = s.id
           |WHEN MATCHED AND s.x > 50 THEN UPDATE SET x = s.x + t.x, v = 'big'
           |WHEN MATCHED AND s.x > t.x THEN UPDATE SET x = s.x
           |WHEN MATCHED THEN UPDATE SET v = upper(s.v)
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // id 1: clauses 1,2 fail → clause 3 (v=S1, x keeps 10)
      // id 2: clause 2 (x=25, v keeps b); id 3: clause 1 (x=130, v=big)
      // id 4: unmatched by source → untouched; id 9 inserts
      assert(rows(d) == Set(
        (1L, "S1", Some(10L)), (2L, "b", Some(25L)), (3L, "big", Some(130L)),
        (4L, "d", Some(40L)), (9L, "s9", Some(9L))))
    }
  }

  test("conditional and column-list INSERT clauses NULL-fill and first-match-win") {
    withCatalog {
      val d = tempDir("mcs-ins").toString + "/t"
      DeltaWrite.append(spark,
        Seq((1L, "a", Option(10L))).toDF("id", "v", "x"), d)
      Seq((1L, "s1", Option(5L)), (2L, "s2", Option(60L)),
        (3L, "s3", Option(1L)), (4L, "s4", Option(7L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_ins_src")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_ins_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND s.x > 50
           |  THEN INSERT (id, v) VALUES (s.id, concat(s.v, '!'))
           |WHEN NOT MATCHED AND s.x > 5 THEN INSERT *""".stripMargin)
      // id 1 matched → full update; id 2 → clause 1, x NULL-fills;
      // id 3 fires no insert clause → NOT inserted; id 4 → clause 2
      assert(rows(d) == Set(
        (1L, "s1", Some(5L)), (2L, "s2!", None), (4L, "s4", Some(7L))))
    }
  }

  test("WHEN NOT MATCHED BY SOURCE DELETE and UPDATE reshape unmatched target rows") {
    withCatalog {
      val d = tempDir("mcs-bysrc").toString + "/t"
      DeltaWrite.append(spark, Seq(
        (1L, "a", Option(10L)), (2L, "b", Option(20L)),
        (3L, "c", Option(30L)), (4L, "d", Option(40L))).toDF("id", "v", "x"), d)
      Seq((1L, "s1", Option(11L)), (9L, "s9", Option(9L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_bs_src")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_bs_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE AND t.x >= 40 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE AND t.x >= 30
           |  THEN UPDATE SET v = 'stale'""".stripMargin)
      // 1 updates, 9 inserts, 2 untouched, 3 marked stale, 4 deleted
      assert(rows(d) == Set(
        (1L, "s1", Some(11L)), (2L, "b", Some(20L)),
        (3L, "stale", Some(30L)), (9L, "s9", Some(9L))))
    }
  }

  test("clause-subset shapes: insert-only, update-only, delete-only") {
    withCatalog {
      val d = tempDir("mcs-subset").toString + "/t"
      DeltaWrite.append(spark, Seq(
        (1L, "a", Option(10L)), (2L, "b", Option(20L))).toDF("id", "v", "x"), d)
      // insert-only: matched rows stay untouched
      Seq((2L, "n2", Option(22L)), (5L, "n5", Option(55L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_sub_src1")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_sub_src1 s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(d) == Set(
        (1L, "a", Some(10L)), (2L, "b", Some(20L)), (5L, "n5", Some(55L))))
      // update-only: unmatched source rows do NOT insert; partial SET
      // keeps the other target columns
      Seq((1L, "u1", Option(100L)), (7L, "u7", Option(7L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_sub_src2")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_sub_src2 s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET x = s.x""".stripMargin)
      assert(rows(d) == Set(
        (1L, "a", Some(100L)), (2L, "b", Some(20L)), (5L, "n5", Some(55L))))
      // delete-only: no insert clause, no update clause — the writers
      // see an empty effective source plus the delete-key frame
      Seq((5L, "z", Option(0L)), (8L, "z", Option(0L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_sub_src3")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_sub_src3 s ON t.id = s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(rows(d) == Set((1L, "a", Some(100L)), (2L, "b", Some(20L))))
    }
  }

  test("Iceberg: DELETE clauses refuse at plan time; BY SOURCE UPDATE works") {
    withCatalog {
      val d = tempDir("mcs-ice").toString + "/t"
      IcebergWrite.append(spark, Seq(
        (1L, "a", Option(10L)), (2L, "b", Option(20L))).toDF("id", "v", "x"), d)
      Seq((1L, "s1", Option(11L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_ice_src")
      val e = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO graft.`$d` t USING mcs_ice_src s ON t.id = s.id
             |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.contains("Delta-only"))
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_ice_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED BY SOURCE
           |  THEN UPDATE SET v = concat(t.v, '_old')""".stripMargin)
      assert(rows(d) == Set((1L, "s1", Some(11L)), (2L, "b_old", Some(20L))))
    }
  }

  test("a target row matched by two clause-firing source rows refuses (cardinality)") {
    withCatalog {
      val d = tempDir("mcs-card").toString + "/t"
      DeltaWrite.append(spark,
        Seq((1L, "a", Option(10L))).toDF("id", "v", "x"), d)
      // two source rows share key 1 and BOTH fire a matched clause
      Seq((1L, "x1", Option(1L)), (1L, "x2", Option(2L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_card_src")
      val e = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO graft.`$d` t USING mcs_card_src s ON t.id = s.id
             |WHEN MATCHED AND s.x = 1 THEN UPDATE SET v = s.v
             |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.contains("cardinality"), e.getMessage)
      // duplicate source keys where only ONE row fires stay legal
      Seq((1L, "y1", Option(1L)), (1L, "y2", Option(99L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_card_src2")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_card_src2 s ON t.id = s.id
           |WHEN MATCHED AND s.x = 1 THEN UPDATE SET v = s.v""".stripMargin)
      assert(rows(d) == Set((1L, "y1", Some(10L))))
    }
  }

  test("Hudi: conditional INSERT routes through the pairing path") {
    withCatalog {
      val d = tempDir("mcs-hudi").toString + "/t"
      HudiWrite.bulkInsert(spark, Seq(
        (1L, "a", Option(10L)), (2L, "b", Option(20L))).toDF("id", "v", "x"),
        d, "id", Seq.empty)
      Seq((1L, "s1", Option(11L)), (5L, "s5", Option(55L)),
        (6L, "s6", Option(2L))).toDF("id", "v", "x")
        .createOrReplaceTempView("mcs_hudi_src")
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING mcs_hudi_src s ON t.id = s.id
           |WHEN MATCHED AND s.x > t.x THEN UPDATE SET *
           |WHEN NOT MATCHED AND s.x > 10 THEN INSERT *""".stripMargin)
      // 1 updates (11 > 10); 5 inserts (55 > 10); 6 fires no clause
      assert(rows(d) == Set(
        (1L, "s1", Some(11L)), (2L, "b", Some(20L)), (5L, "s5", Some(55L))))
    }
  }
}

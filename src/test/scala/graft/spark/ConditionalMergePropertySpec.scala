package graft.spark

import graft.SparkSpec
import graft.tables.DeltaWrite

/** PROPERTY: randomized conditional MERGE statements (random clause
  * ORDER, conditions referencing BOTH sides, partial expression SETs,
  * delete-only shapes) through the catalog must match a row-by-row
  * SQL-semantics model: for each matched (target, source) pair the
  * FIRST clause whose condition holds applies — update projects SET
  * expressions over the pair and keeps target values elsewhere,
  * delete removes the row, no-clause-applies keeps the row untouched;
  * unmatched source rows insert.
  */
class ConditionalMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private def withCatalog[A](f: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    f
  }

  test("randomized conditional MERGE matches the first-match-wins model") {
    val rnd = new scala.util.Random(41)
    withCatalog {
      (1 to 6).foreach { round =>
        val d = tempDir(s"cond-merge-prop-$round").toString + "/t"
        // target: ids 0..9 with varying x
        val target: Map[Long, (String, Long)] =
          (0L until 10L).map(i => i -> ((s"t$i", (i * 7 % 5) * 10))).toMap
        DeltaWrite.append(spark,
          target.toSeq.map { case (k, (s, x)) => (k, s, x) }.toDF("id", "v", "x"), d)
        // source: half overlapping, half fresh, random x
        val source = (0L until 10L).map { _ =>
          val k = rnd.nextInt(15).toLong
          (k, s"s$k", rnd.nextInt(60).toLong)
        }.distinctBy(_._1)
        source.toDF("id", "v", "x").createOrReplaceTempView("cmp_src")

        val thresh = rnd.nextInt(50).toLong
        val updFirst = rnd.nextBoolean()
        val deleteOnly = rnd.nextInt(4) == 0
        val updClause =
          s"WHEN MATCHED AND s.x > t.x THEN UPDATE SET x = s.x + t.x, v = upper(s.v)"
        val delClause = s"WHEN MATCHED AND s.x < $thresh THEN DELETE"
        val matched =
          if (deleteOnly) delClause
          else if (updFirst) s"$updClause\n$delClause"
          else s"$delClause\n$updClause"
        spark.sql(
          s"""MERGE INTO graft.`$d` t USING cmp_src s ON t.id = s.id
             |$matched
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

        // the model, clause for clause
        val expected = scala.collection.mutable.Map.empty[Long, (String, Long)]
        target.foreach { case (k, tv) => expected(k) = tv }
        source.foreach { case (k, sv, sx) =>
          target.get(k) match {
            case None => expected(k) = (sv, sx) // NOT MATCHED: insert
            case Some((tvv, tx)) =>
              val updApplies = !deleteOnly && sx > tx
              val delApplies = sx < thresh
              if (deleteOnly) { if (delApplies) expected.remove(k) }
              else if (updFirst) {
                if (updApplies) expected(k) = (sv.toUpperCase, sx + tx)
                else if (delApplies) expected.remove(k)
              } else {
                if (delApplies) expected.remove(k)
                else if (updApplies) expected(k) = (sv.toUpperCase, sx + tx)
              }
          }
        }
        val got = spark.sql(s"SELECT id, v, x FROM graft.`$d`")
          .as[(Long, String, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got == expected.toMap,
          s"round $round diverged (updFirst=$updFirst deleteOnly=$deleteOnly " +
            s"thresh=$thresh; seed-determined)")
      }
    }
  }
}

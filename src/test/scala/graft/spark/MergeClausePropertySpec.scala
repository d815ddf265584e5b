package graft.spark

import graft.SparkSpec
import graft.tables.DeltaWrite

/** PROPERTY: randomized MERGE statements over the FULL late-r15
  * clause surface — 2-3 matched clauses in random order (update and
  * delete, overlapping conditions), a conditional column-list INSERT,
  * and NOT MATCHED BY SOURCE DELETE/UPDATE bands — must match a
  * row-by-row SQL-semantics model: per matched pair the FIRST clause
  * whose condition holds applies; unmatched source rows insert
  * through the first firing insert clause (others NULL-fill nothing —
  * no clause, no row); unmatched target rows run the BY SOURCE ladder
  * the same way; everything untouched stays byte-identical.
  */
class MergeClausePropertySpec extends SparkSpec {
  import spark.implicits._

  test("randomized full-surface MERGE matches the first-match-wins model") {
    spark.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
    val rnd = new scala.util.Random(271)
    (1 to 5).foreach { round =>
      val d = tempDir(s"full-merge-prop-$round").toString + "/t"
      val target: Map[Long, (String, Long)] =
        (0L until 12L).map(i => i -> ((s"t$i", (i * 5 % 7) * 10))).toMap
      // x nullable: the column-list INSERT clause NULL-fills it, and a
      // NOT NULL declaration would (correctly) refuse that write
      DeltaWrite.append(spark,
        target.toSeq.map { case (k, (s, x)) => (k, s, Option(x)) }
          .toDF("id", "v", "x"), d)
      // source: overlapping + fresh keys, random x
      val source = (0L until 12L).map { _ =>
        val k = rnd.nextInt(18).toLong
        (k, s"s$k", rnd.nextInt(80).toLong)
      }.distinctBy(_._1)
      source.toDF("id", "v", "x").createOrReplaceTempView("fmp_src")

      val t1 = rnd.nextInt(60).toLong  // matched delete threshold
      val t2 = rnd.nextInt(60).toLong  // by-source delete threshold
      val updFirst = rnd.nextBoolean()
      val upd1 = "WHEN MATCHED AND s.x > t.x THEN UPDATE SET x = s.x + t.x"
      val upd2 = "WHEN MATCHED THEN UPDATE SET v = upper(s.v)"
      val del1 = s"WHEN MATCHED AND s.x < $t1 THEN DELETE"
      val matched =
        if (updFirst) s"$upd1\n$del1\n$upd2" else s"$del1\n$upd1\n$upd2"
      spark.sql(
        s"""MERGE INTO graft.`$d` t USING fmp_src s ON t.id = s.id
           |$matched
           |WHEN NOT MATCHED AND s.x % 2 = 0
           |  THEN INSERT (id, v) VALUES (s.id, concat('n', s.v))
           |WHEN NOT MATCHED BY SOURCE AND t.x >= $t2 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE AND t.x >= ${t2 / 2}
           |  THEN UPDATE SET v = 'stale'""".stripMargin)

      // the model, clause for clause
      val expected = scala.collection.mutable.Map.empty[Long, (String, Option[Long])]
      target.foreach { case (k, (v, x)) => expected(k) = (v, Some(x)) }
      val srcKeys = source.map(_._1).toSet
      // matched + insert clauses
      source.foreach { case (k, sv, sx) =>
        target.get(k) match {
          case None =>
            if (sx % 2 == 0) expected(k) = (s"n$sv", None)
          case Some((_, tx)) =>
            val clauses: Seq[(Boolean, Int)] =
              if (updFirst) Seq((sx > tx, 1), (sx < t1, 2), (true, 3))
              else Seq((sx < t1, 2), (sx > tx, 1), (true, 3))
            clauses.find(_._1).map(_._2) match {
              case Some(1) => expected(k) = (expected(k)._1, Some(sx + tx))
              case Some(2) => expected.remove(k)
              case Some(3) => expected(k) = (sv.toUpperCase, expected(k)._2)
              case _       => ()
            }
        }
      }
      // by-source ladder over unmatched target rows
      target.foreach { case (k, (_, tx)) =>
        if (!srcKeys.contains(k)) {
          if (tx >= t2) expected.remove(k)
          else if (tx >= t2 / 2)
            expected.get(k).foreach(cur => expected(k) = ("stale", cur._2))
        }
      }
      val got = spark.sql(s"SELECT id, v, x FROM graft.`$d`").collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
      assert(got == expected.toMap,
        s"round $round diverged (updFirst=$updFirst t1=$t1 t2=$t2)")
    }
  }
}

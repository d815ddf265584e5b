package graft.tables

import graft.SparkSpec
import graft.core.{Filter, Filters}
import org.apache.spark.sql.functions.col

/** PROPERTY: a randomized interleaving of append / renameColumn /
  * deleteWhere / updateWhere / deleteEquality against a native
  * Iceberg table must match a driver-side model after EVERY step —
  * with the twist that the model tracks columns by FIELD (not name),
  * so any file the reader resolves by a stale name shows up as a
  * divergence immediately. This is the strongest pin on the r15
  * field-id resolution: every rename leaves earlier files carrying
  * the old physical name, and every later predicate/SET/read must
  * keep binding them correctly.
  */
class IcebergRenameDmlPropertySpec extends SparkSpec {
  import spark.implicits._

  test("randomized rename+DML sequences match the field-tracked model") {
    val rnd = new scala.util.Random(29)
    val t = tempDir("ice-ren-prop").toString + "/t"
    // fields: key (id), text (string), num (long) — names drift below
    var nameOfText = "txt"
    var nameOfNum = "num"
    var nextKey = 0L
    // model: key -> (text, num)
    val model = scala.collection.mutable.Map.empty[Long, (String, Long)]

    def appendBatch(n: Int, tag: String): Unit = {
      val rows = (0 until n).map { _ =>
        val k = nextKey; nextKey += 1
        val v = (s"$tag-$k", k * 10)
        model(k) = v
        (k, v._1, v._2)
      }
      IcebergWrite.append(spark,
        rows.toDF("id", nameOfText, nameOfNum).repartition(1 + rnd.nextInt(3)), t)
    }

    def readBack(): Map[Long, (String, Long)] =
      new IcebergTable("t", t)(spark, ReadArgs())
        .select(col("id"), col(nameOfText), col(nameOfNum))
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

    appendBatch(6, "s0")
    var renames = 0
    (1 to 16).foreach { step =>
      rnd.nextInt(5) match {
        case 0 => appendBatch(1 + rnd.nextInt(4), s"s$step")
        case 1 => // rename one of the two non-key columns
          renames += 1
          if (rnd.nextBoolean()) {
            val nn = s"txt_r$renames"
            IcebergWrite.renameColumn(spark, t, nameOfText, nn)
            nameOfText = nn
          } else {
            val nn = s"num_r$renames"
            IcebergWrite.renameColumn(spark, t, nameOfNum, nn)
            nameOfNum = nn
          }
        case 2 => // MoR position delete, predicate on the RENAMED num column
          val bound = rnd.nextInt(math.max(1, nextKey.toInt)).toLong * 10
          IcebergWrite.deleteWhere(spark, t,
            Filters.normalize(Seq(Filter(nameOfNum, ">=", bound))))
          model.filterInPlace((_, v) => v._2 < bound)
        case 3 => // CoW update, SET over the renamed text column
          val k = rnd.nextInt(math.max(1, nextKey.toInt)).toLong
          IcebergWrite.updateWhere(spark, t,
            Filters.normalize(Seq(Filter("id", "=", k))),
            Seq(nameOfText -> s"concat($nameOfText, '+u$step')"))
          model.get(k).foreach { case (s0, n0) => model(k) = (s0 + s"+u$step", n0) }
        case _ => // equality delete on one key
          val k = rnd.nextInt(math.max(1, nextKey.toInt)).toLong
          IcebergWrite.deleteEquality(spark, t, Seq(k).toDF("id"))
          model.remove(k)
      }
      assert(readBack() == model.toMap,
        s"divergence after step $step (ops are seed-determined; " +
          s"columns now $nameOfText/$nameOfNum, $renames renames so far)")
    }
    assert(renames >= 2, "seed must exercise at least two renames")
  }
}

package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "tag", "v")

  test("merge: updates replace, unmatched updates insert") {
    val updates = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "tag", "v")
    val got = Upsert.merge(base, updates, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("merge is deterministic under duplicate update keys") {
    val updates = Seq((2L, "z1", 1.0), (2L, "z2", 2.0)).toDF("id", "tag", "v")
    val got = Upsert.merge(base, updates, Seq("id"))
      .where($"id" === 2L).as[(Long, String, Double)].head()
    assert(got == ((2L, "z2", 2.0))) // max over (version, row) total order
  }

  test("delete removes exactly the keyed rows") {
    val got = Upsert.delete(base, Seq(Tuple1(2L)).toDF("id"), Seq("id"))
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 3L))
  }
}

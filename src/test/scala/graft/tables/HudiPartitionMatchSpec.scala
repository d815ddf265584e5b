package graft.tables

import graft.core.{Filter, Filters}
import org.scalatest.funsuite.AnyFunSuite

/** Typed partition-segment matching: rendering differences between a
  * filter literal and the raw hive path segment must never prune a
  * matching partition (silent row loss); ambiguity fails open.
  */
class HudiPartitionMatchSpec extends AnyFunSuite {

  private def matches(path: String, f: Filter*): Boolean =
    HudiWrite.partitionMayMatch(path, Filters.normalize(f.toSeq))

  test("numeric literals match across renderings") {
    assert(matches("part=1", Filter("part", "=", 1.0))) // double vs int-rendered
    assert(matches("part=1.0", Filter("part", "=", 1))) // int vs double-rendered
    assert(matches("part=1.10", Filter("part", "=", 1.1f)))
    assert(!matches("part=2", Filter("part", "=", 1.0)))
    assert(matches("part=3", Filter("part", "in", Seq(1.0, 3.0))))
    assert(!matches("part=2", Filter("part", "in", Seq(1.0, 3.0))))
  }

  test("strings compare exactly; booleans and dates by canonical rendering") {
    assert(matches("k=a+b", Filter("k", "=", "a+b")))
    assert(!matches("k=a", Filter("k", "=", "b")))
    assert(matches("k=true", Filter("k", "=", java.lang.Boolean.TRUE)))
    assert(matches("d=2024-01-05", Filter("d", "=", java.sql.Date.valueOf("2024-01-05"))))
    assert(!matches("d=2024-01-06", Filter("d", "=", java.sql.Date.valueOf("2024-01-05"))))
  }

  test("ambiguity fails open: unparseable segment under a numeric filter") {
    assert(matches("part=__HIVE_DEFAULT_PARTITION__", Filter("part", "=", 1)))
    assert(matches("part=xyz", Filter("part", "=", 1.5)))
    // non-partition columns and non-equality ops always keep
    assert(matches("part=1", Filter("other", "=", 9)))
    assert(matches("part=1", Filter("part", ">", 5)))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def eval(text: String, m: Column => Column): Double =
    Seq(text).toDF("text").select(m(col("text")).as("m"))
      .collect()(0).getDouble(0)

  private def evalToks(text: String, m: Column => Column): Double =
    Seq(text).toDF("text")
      .select(m(Text.wsTokens(col("text"))).as("m"))
      .collect()(0).getDouble(0)

  test("duplicate-line fraction and char fraction (hand-computed)") {
    // lines a, b, a: one of three lines is a repeat
    assert(eval("a\nb\na\n", Repetition.dupLineFrac) == 0.3333)
    // dup chars = both copies of 'a' (2), total chars 3
    assert(eval("a\nb\na\n", Repetition.dupLineCharFrac) == 0.6667)
    // blank/whitespace-only lines are dropped before counting
    assert(eval("a\n\n  \nb", Repetition.dupLineFrac) == 0.0)
    assert(eval("", Repetition.dupLineFrac) == 0.0)
    assert(eval("", Repetition.dupLineCharFrac) == 0.0)
  }

  test("top n-gram char fraction: count, tie-break, short docs") {
    // grams: 'x y' x2, 'y x' x1 -> 2*3 / len('x y x y')=7
    assert(evalToks("x y x y", Repetition.topNgramCharFrac(_, 2)) == 0.8571)
    // all grams unique: cnt 1, LONGEST gram wins the tie -> 'a bb'|'bb c' (4) / 6
    assert(evalToks("a bb c", Repetition.topNgramCharFrac(_, 2)) == 0.6667)
    // fewer tokens than n -> no grams -> 0
    assert(evalToks("solo", Repetition.topNgramCharFrac(_, 2)) == 0.0)
    assert(evalToks("", Repetition.topNgramCharFrac(_, 2)) == 0.0)
  }

  test("duplicated n-gram char fraction counts every copy (overlaps as written)") {
    // grams 'x x' x2 (overlapping) -> 6 chars over len('x x x')=5
    assert(evalToks("x x x", Repetition.dupNgramCharFrac(_, 2)) == 1.2)
    // no repeats -> 0
    assert(evalToks("a b c d", Repetition.dupNgramCharFrac(_, 2)) == 0.0)
  }

  test("dropRepeatedLines keeps first occurrences in document order") {
    def ded(text: String): String =
      Seq(text).toDF("text")
        .select(Repetition.dropRepeatedLines(col("text")).as("d"))
        .collect()(0).getString(0)
    assert(ded("b\na\nb\nc\na") == "b\na\nc")
    // trim + empty-drop normalization applies before dedup
    assert(ded(" x \n\nx\ny") == "x\ny")
    assert(ded("") == "")
  }

  test("combined metrics on a mixed document") {
    val text = "a b a b c\nx\nx\na b a b c"
    // 4 lines, 2 distinct -> (4-2)/4 = 0.5; all 20 chars duplicated
    assert(eval(text, Repetition.dupLineFrac) == 0.5)
    assert(eval(text, Repetition.dupLineCharFrac) == 1.0)
    // tokens a b a b c x x a b a b c; 'a b' x4 -> 12 / 23 chars
    assert(evalToks(text, Repetition.topNgramCharFrac(_, 2)) == 0.5217)
    // dup 2-grams: 'a b' x4, 'b a' x2, 'b c' x2 -> 24 / 23 chars
    assert(evalToks(text, Repetition.dupNgramCharFrac(_, 2)) == 1.0435)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting in ONE text pass (Aho-Corasick
  * 1975): the blocklist/contamination primitive. A P-pattern
  * blocklist applied as `P` separate `contains`/`replace` scans reads
  * every document P times — O(P·n) per corpus pass; the automaton
  * walks each document once, O(n + matches) regardless of P, which is
  * the difference between feasible and not at a 100 TB corpus with a
  * thousand-phrase blocklist.
  *
  * The automaton is built once per expression instance from the
  * literal pattern list (driver-serialized as plain strings; the
  * transient automaton rebuilds lazily on each executor) — no UDF, no
  * broadcast, no shuffle: pure scan work.
  *
  * Semantics: per pattern, the number of occurrences counted at EVERY
  * position (overlapping occurrences all count). For patterns with no
  * nonempty border (no proper prefix that is also a suffix),
  * occurrences cannot overlap, so this equals DuckDB's
  * replace-difference count — which is how the oracle replays it
  * (BlocklistSpec asserts the borderless precondition for the query's
  * pattern list).
  */
object AhoCorasick {

  /** `array<int>`: occurrence count per pattern, in pattern-list
    * order.
    */
  def countMatches(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiPatternCount(Bridge.expression(text), patterns))

  /** Compiled automaton: goto/fail/output tables over a dense state
    * array (trie of the patterns + BFS failure links, outputs
    * flattened through the dictionary-suffix chain at build time so
    * eval does O(outputs-at-state) work, not a chain walk).
    */
  final class Automaton(patterns: Seq[String]) {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    require(patterns.distinct.size == patterns.size, "duplicate patterns")

    private val root = new java.util.HashMap[Character, Integer]()
    // per-state char transitions (trie edges only; fail links close them)
    private val gotoMaps =
      scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
    private val failLink = scala.collection.mutable.ArrayBuffer(0)
    // pattern ids terminating at each state, pre-flattened via suffix links
    private val outs = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { ch =>
        val m = gotoMaps(s)
        val nxt = m.get(ch)
        s = if (nxt != null) nxt.intValue()
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          failLink += 0
          outs += Nil
          val ns = gotoMaps.size - 1
          m.put(ch, ns)
          ns
        }
      }
      outs(s) = id :: outs(s)
    }

    locally { // BFS failure links + output flattening
      val queue = new java.util.ArrayDeque[Integer]()
      gotoMaps(0).forEach((_, s) => { failLink(s) = 0; queue.add(s) })
      while (!queue.isEmpty) {
        val s = queue.poll().intValue()
        outs(s) = outs(s) ::: outs(failLink(s))
        gotoMaps(s).forEach { (ch, t) =>
          var f = failLink(s)
          while (f != 0 && !gotoMaps(f).containsKey(ch)) f = failLink(f)
          val fn = gotoMaps(f).get(ch)
          failLink(t) = if (fn != null && fn.intValue() != t.intValue()) fn.intValue() else 0
          queue.add(t)
        }
      }
    }

    private val outArrays: Array[Array[Int]] = outs.map(_.toArray).toArray
    private val gotoArr: Array[java.util.HashMap[Character, Integer]] = gotoMaps.toArray
    private val failArr: Array[Int] = failLink.toArray

    /** Per-pattern occurrence counts over `s`, one pass. */
    def count(s: String): Array[Int] = {
      val counts = new Array[Int](patterns.size)
      var state = 0
      var i = 0
      val n = s.length
      while (i < n) {
        val ch = s.charAt(i)
        var nxt = gotoArr(state).get(ch)
        while (nxt == null && state != 0) {
          state = failArr(state)
          nxt = gotoArr(state).get(ch)
        }
        state = if (nxt == null) 0 else nxt.intValue()
        val o = outArrays(state)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }
}

case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_multi_pattern_count"

  @transient private lazy val automaton = new AhoCorasick.Automaton(patterns)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(automaton.count(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

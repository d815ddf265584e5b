package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer with a learned merge table — the
  * "BPE-ish" half of the prompt's token-counting requirement made
  * real: `learn` builds a merge table from a corpus, `encode` applies
  * it (SURVEY §7 r2).
  *
  * Learning runs on the DISTINCT-WORD frequency table, not the corpus
  * (the standard trick — vocabulary grows ~sublinearly with corpus
  * size, so a 100 TB corpus learns from a few GB of word counts). Each
  * merge round is one partial-aggregated pair count over the word
  * table + one in-place merge (native expression, no shuffle of the
  * corpus itself). Encoding is a pure per-row scan — no state, no
  * shuffle; the merge table rides along as a literal (a few KB), the
  * same way it would ship to 1000 executors via the closure.
  *
  * Everything is deterministic: pair ranking breaks count ties
  * lexically, so learn() is partitioning- and run-invariant.
  */
object Bpe {

  type Merges = Seq[(String, String)]

  /** Learn `numMerges` merges from the corpus text column.
    *
    * The distinct-word table's ROW count never changes while learning
    * (merge rounds rewrite token arrays, not rows), so the execution
    * path is decided up front from one count: a vocabulary at or
    * under `localVocabThreshold` is collected once and learned
    * locally — 2 Spark jobs TOTAL instead of 2 per merge round (a
    * realistic 32k-merge vocab was ~64k sequential jobs on the old
    * path). The distributed loop remains for vocabularies beyond the
    * threshold (a corpus so large its vocab doesn't fit the driver);
    * both paths produce identical merges (equality-tested in BpeSpec).
    */
  def learn(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      localVocabThreshold: Long = 250000L
  ): Merges = {
    val spark = df.sparkSession
    import spark.implicits._

    // distinct-word frequency table
    val wordFreq = df
      .select(explode(Text.wsTokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

    val vocab = wordFreq.count()
    if (vocab <= localVocabThreshold)
      return learnLocal(wordFreq.as[(String, Long)].collect().toMap, numMerges)

    // Each round rebuilds `words` from the previous round's frame.
    // Eager localCheckpoint truncates BOTH the logical plan and the
    // RDD lineage each round — without it the nested plan strings OOM
    // the driver around ~20 merges, and even with a plan-only rebase
    // the chained RDD lineage overflows task-deserialization stacks
    // around ~150 rounds. (Tradeoff: checkpoint blocks are not
    // recomputable after executor loss; a reliable checkpoint dir is
    // the production alternative for the huge-vocab path.)

    // code points as initial symbols, via the SAME native expression
    // encode uses (an empty merge table = split to symbols) — one
    // shared alphabet for learn/encode/local, and regex splits like
    // "(?!^)" are code-UNIT-based, which would halve surrogate pairs
    var words = wordFreq
      .select(encode(col("w"), Seq.empty).as("toks"), col("freq"))
      .localCheckpoint()

    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      // count adjacent symbol pairs, weighted by word frequency — ONE
      // job per ROUND collects the top-K ranking, and a locally-proved
      // safe PREFIX of it applies as a batch (O(merges/batch) driver
      // round-trips instead of O(merges), the fix for the carried
      // 32k-merges-=-32k-jobs caveat)
      val top = words
        .select(explode(adjacentPairs(col("toks"))).as("p"), col("freq"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(BatchRankWindow)
        .as[(String, String, Long)]
        .collect().toSeq

      val accepted = safeBatchPrefix(top, merges.toSeq, numMerges - merges.size)
      if (accepted.isEmpty) exhausted = true // no pair occurs twice
      else {
        merges ++= accepted
        val next = words
          .select(
            accepted.foldLeft(col("toks")) { case (c, (a, b)) => mergePair(c, a, b) }
              .as("toks"),
            col("freq"))
          .localCheckpoint() // eager: materializes + truncates lineage
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Candidates ranked per round; bounds the batch (the proof below
    * needs the K-th count as the floor for unseen pairs).
    */
  private[functions] val BatchRankWindow = 64

  /** The longest PREFIX of the ranked candidates that provably
    * produces the SAME merge sequence as one-at-a-time learning.
    * Candidate `p_i` is safe after accepting `p_1..p_{i-1}` when:
    *
    *  1. its symbols are disjoint from every accepted pair's symbols
    *     (so its count is untouched by their merges — merging (a,b)
    *     only changes counts of pairs containing a or b, or pairs
    *     containing the new symbol),
    *  2. no accepted concatenation aliases a pre-existing symbol
    *     (initial symbols are single code points; every multi-point
    *     symbol came from `merges`, so the check is local) — an alias
    *     would let an UNSEEN pair's count increase,
    *  3. `count(p_i)` strictly exceeds every possible post-merge
    *     count of a pair we cannot see: created pairs (x, ab) are
    *     bounded by their origin pair (x, a) — ≤ the max count among
    *     visible pairs sharing a symbol with accepted, or ≤ the K-th
    *     count if the origin is outside the window. Decreased pairs
    *     can never overtake `p_i` (they ranked at or below it with
    *     ties already broken lexically in its favor).
    *
    * The batch stops at the first unsafe candidate — skipping it
    * would diverge, because sequential learning might legitimately
    * pick it next. Rows with count < 2 never merge (the sequential
    * stop rule).
    */
  private[functions] def safeBatchPrefix(
      ranked: Seq[(String, String, Long)],
      priorMerges: Merges,
      maxAccept: Int
  ): Merges = {
    val live = ranked.filter(_._3 >= 2)
    if (live.isEmpty || maxAccept <= 0) return Seq.empty
    // floor for pairs outside the ranking window: 0 when we see the
    // whole distribution (fewer than K candidates survived)
    val floor = if (ranked.size < BatchRankWindow) 0L else ranked.last._3
    // every multi-code-point symbol in the vocabulary is the concat
    // of some prior merge (initial symbols are single code points) —
    // so symbol existence is checkable locally
    val priorSymbols = priorMerges.flatMap { case (a, b) => Seq(a, b, a + b) }.toSet
    val accepted = scala.collection.mutable.Buffer.empty[(String, String)]
    val acceptedSyms = scala.collection.mutable.Set.empty[String]
    var stop = false
    var i = 0
    while (!stop && i < live.size && accepted.size < maxAccept) {
      val (a, b, n) = live(i)
      val disjoint = !acceptedSyms.contains(a) && !acceptedSyms.contains(b)
      val safeCount = accepted.isEmpty || {
        // created pairs (x, a_j·b_j) / (a_j·b_j, y) are bounded by
        // their ORIGIN pair (x, a_j) / (b_j, y); visible origins cap
        // at sharedMax, unseen ones at the window floor. (A non-self
        // accepted pair is never its own origin; a self-pair (s,s)
        // matches the form and is correctly included.)
        val firsts = accepted.map(_._1).toSet
        val seconds = accepted.map(_._2).toSet
        val sharedMax = live.collect {
          case (x, y, m) if firsts.contains(y) || seconds.contains(x) => m
        }.maxOption.getOrElse(0L)
        n > math.max(floor, sharedMax)
      }
      if (disjoint && safeCount) {
        // alias: the new symbol string already exists → counts of
        // pairs containing it (possibly unseen) can GROW; this
        // candidate is still the provable sequential pick, but
        // nothing after it is
        val alias = priorSymbols.contains(a + b) || acceptedSyms.contains(a + b)
        accepted += ((a, b))
        acceptedSyms ++= Seq(a, b, a + b)
        if (alias) stop = true
      } else stop = true
      i += 1
    }
    accepted.toSeq
  }

  /** Encode text into BPE tokens (array<string>): whitespace-split,
    * then per word greedy lowest-rank merging — the standard BPE
    * apply loop.
    */
  def encode(text: Column, merges: Merges): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges))

  def tokenCount(text: Column, merges: Merges): Column = size(encode(text, merges))

  /** struct(a,b) list of adjacent token pairs (HOF; learning-side
    * only, runs over the small distinct-word table).
    */
  private def adjacentPairs(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (x, y) => struct(x.as("a"), y.as("b"))))

  private def mergePair(toks: Column, a: String, b: String): Column =
    Bridge.column(BpeMergePair(Bridge.expression(toks), a, b))

  /** Driver-side reference implementation (tests assert the
    * distributed learner matches it exactly).
    */
  def learnLocal(wordFreqs: Map[String, Long], numMerges: Int): Merges = {
    // per code POINT via the same splitter as encode/learn — UTF-16
    // units would split surrogate pairs (emoji, supplementary CJK)
    // into different initial symbols and diverge the learned merges
    var words: Map[Vector[String], Long] =
      wordFreqs.map { case (w, f) => codePointSyms(w).toVector -> f }
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (toks, f) =>
        toks.sliding(2).foreach {
          case Vector(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + f
          case _            => ()
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best.filter(_._2 >= 2) match {
        case Some(((a, b), _)) =>
          merges += ((a, b))
          words = words.map { case (toks, f) => mergeLocal(toks, a, b) -> f }
            .groupMapReduce(_._1)(_._2)(_ + _)
        case None => done = true
      }
    }
    merges.toSeq
  }

  private[functions] def mergeLocal(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += a + b; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** One symbol per code POINT (surrogate pairs stay whole). */
  private[functions] def codePointSyms(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Greedy rank-ordered application of a merge table to one word. */
  private[functions] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var toks = codePointSyms(word)
    var changed = true
    while (changed && toks.length > 1) {
      // find the lowest-rank adjacent pair present
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < toks.length - 1) {
        ranks.get((toks(i), toks(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestIdx = i
          case _                       => ()
        }
        i += 1
      }
      if (bestIdx < 0) changed = false
      else {
        val merged = toks(bestIdx) + toks(bestIdx + 1)
        toks = (toks.take(bestIdx) :+ merged) ++ toks.drop(bestIdx + 2)
      }
    }
    toks
  }
}

/** One-pass adjacent-pair merge over a token array (learning hot
  * loop; a HOF formulation would interpret per element).
  */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_pair"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val uab = UTF8String.fromString(a + b)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (i + 1 < n && t == ua && arr.getUTF8String(i + 1) == ub) {
        out.add(uab); i += 2
      } else { out.add(t); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

/** Whitespace-split + greedy BPE encode of a text against a fixed
  * merge table (rank = table index). Pure scan work; the table ships
  * in the expression itself.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    s.split("\\s+").foreach { w =>
      if (w.nonEmpty)
        Bpe.encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[AnyRef])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

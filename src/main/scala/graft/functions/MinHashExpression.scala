package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing all MinHash signatures of a
  * text column in one pass.
  *
  * Semantically identical to the declarative formulation
  * `aggregate(transform(shingles(text,k), md5Mod), ..., least(...))`
  * (see [[PortableHash]] / OracleSql — same md5-derived 48-bit hash,
  * same affine seeds), but evaluated as a tight JVM loop: Catalyst
  * higher-order functions interpret their lambda per array element
  * (boxing every shingle, allocating hex strings for md5/conv), which
  * makes an 8-signature pass over a 100 TB corpus lambda-bound. This
  * expression hashes each shingle's UTF-8 bytes once with a reused
  * MessageDigest, takes the first 6 digest bytes directly as the
  * 48-bit value (== conv(substr(md5(x),1,12),16,10)), and folds all
  * seed minima in-place — no per-element allocation at all.
  *
  * Note: shingle positions are UTF-16-unit based, which matches
  * Spark's code-point semantics for all BMP text (the corpora here are
  * ASCII); equality with the declarative form is asserted in tests.
  */
case class MinHashSigs(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val mins = Array.fill(numHashes)(PortableHash.Prime)
    val digest = md.get()

    def fold(sh: String): Unit = {
      digest.reset()
      val d = digest.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h %= PortableHash.Prime
      var j = 0
      while (j < numHashes) {
        val v = ((PortableHash.A0 + PortableHash.DA * j) * h +
          PortableHash.B0 + PortableHash.DB * j) % PortableHash.Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }

    val n = s.length
    if (n >= k) {
      var i = 0
      while (i + k <= n) { fold(s.substring(i, i + k)); i += 1 }
    } else fold(s)
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Column API: array of `numHashes` signature minima. */
  def minhash(text: Column, k: Int, numHashes: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(text), k, numHashes))

  /** Signatures from an ALREADY-HASHED shingle array (the
    * [[TextHashExpressions.shingleHashSet]] output). */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    Bridge.column(MinHashFromHashes(Bridge.expression(hashes), numHashes))
}

/** [[MinHashSigs]] over a pre-hashed shingle array: folds the affine
  * seed minima over 48-bit hashes that were already computed (e.g. by
  * [[ShingleHashSet]]). MinHash is a min over a SET — duplicate
  * shingles never change a minimum — so signatures from the sorted
  * DISTINCT hash set are bit-identical to [[MinHashSigs]] over the
  * raw text (asserted in MinHashSpec). The point: a pipeline that
  * needs both the signature bands and the exact verification sets
  * (near-dup detection) md5-hashes each document ONCE instead of
  * twice — at corpus scale the md5 pass over the text dominates, and
  * this fold is plain integer arithmetic over the cached array.
  */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_from_hashes"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(numHashes)(PortableHash.Prime)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = ((PortableHash.A0 + PortableHash.DA * j) * h +
          PortableHash.B0 + PortableHash.DB * j) % PortableHash.Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

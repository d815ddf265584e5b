package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the *hashed shingle set* of a text —
  * sorted distinct 48-bit md5 hashes (PortableHash.md5Mod semantics)
  * of the char k-shingles. Equivalent to
  * `list_sort(list_distinct(list_transform(shingles(text,k), md5Mod)))`
  * in the DuckDB oracle; a tight loop here because interpreting that
  * per shingle dominates near-dup verification at corpus scale.
  * Downstream set operations (Jaccard) work on sorted longs, which is
  * both engine-portable (identical cardinalities — any 48-bit
  * collision collides identically in both engines) and merge-walkable.
  */
case class ShingleHashSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashset"

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val digest = md.get()

    def h48(sh: String): Long = {
      digest.reset()
      val d = digest.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h % PortableHash.Prime
    }

    val n = s.length
    val set = new java.util.TreeSet[java.lang.Long]()
    if (n >= k) {
      var i = 0
      while (i + k <= n) { set.add(h48(s.substring(i, i + k))); i += 1 }
    } else set.add(h48(s))
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** Intersection cardinality of two SORTED distinct long arrays via a
  * single merge walk — O(|a|+|b|) with zero allocation, vs the
  * hash-set build generic array_intersect does per row. Value equals
  * `len(list_intersect(a, b))` on the same lists.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val xn = xs.numElements(); val yn = ys.numElements()
    while (i < xn && j < yn) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

object TextHashExpressions {
  def shingleHashSet(text: Column, k: Int): Column =
    Bridge.column(ShingleHashSet(Bridge.expression(text), k))

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}

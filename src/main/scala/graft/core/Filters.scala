package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Filter operator vocabulary.
  *
  * Mirrors the reference's `FilterOperator` literal set
  * (datarepo/core/tables/filters.py:4-18): `= != < <= > >= in "not in"
  * contains includes "includes any" "includes all"`.
  */
sealed abstract class FilterOp(val symbol: String)
object FilterOp {
  case object Eq          extends FilterOp("=")
  case object Neq         extends FilterOp("!=")
  case object Lt          extends FilterOp("<")
  case object Le          extends FilterOp("<=")
  case object Gt          extends FilterOp(">")
  case object Ge          extends FilterOp(">=")
  case object In          extends FilterOp("in")
  case object NotIn       extends FilterOp("not in")
  case object Contains    extends FilterOp("contains")
  case object Includes    extends FilterOp("includes")
  case object IncludesAny extends FilterOp("includes any")
  case object IncludesAll extends FilterOp("includes all")

  val all: Seq[FilterOp] =
    Seq(Eq, Neq, Lt, Le, Gt, Ge, In, NotIn, Contains, Includes, IncludesAny, IncludesAll)

  def fromSymbol(s: String): FilterOp =
    all.find(_.symbol == s).getOrElse(throw new IllegalArgumentException(s"Unsupported operator $s"))
}

/** A condition on a column, equivalent to the reference's
  * `Filter(column, operator, value)` NamedTuple (filters.py:21-26).
  */
final case class Filter(column: String, op: FilterOp, value: Any)

object Filter {
  /** String-operator convenience: `Filter("l_quantity", "<", 24)`. */
  def apply(column: String, op: String, value: Any): Filter =
    Filter(column, FilterOp.fromSymbol(op), value)
}

/** DNF filter algebra: input filters normalize to an OR of AND-lists,
  * then compile to a single Catalyst [[Column]] (so Spark pushes the
  * predicate into the scan) or to a SQL string (for SQL-speaking
  * sources — mirrors util.py:filters_to_sql_predicate).
  */
object Filters {

  /** OR-of-ANDs. Outer list = disjunction, inner = conjunction. */
  type Normalized = Seq[Seq[Filter]]

  /** Normalize a flat conjunction into DNF form; the empty input means
    * "no filters" (reference filters.py:normalize_filters semantics).
    */
  def normalize(filters: Seq[Filter]): Normalized =
    if (filters.isEmpty) Seq.empty else Seq(filters)

  def normalizeDnf(filters: Seq[Seq[Filter]]): Normalized =
    filters.filter(_ != null)

  /** Compile one filter to a Catalyst column predicate. All operators
    * map onto codegen'd built-ins — no UDFs, so every one of these can
    * be pushed into a parquet scan or partition pruning by Catalyst.
    */
  def toColumn(f: Filter): Column = {
    val c = col(f.column)
    f.op match {
      case FilterOp.Eq  => c === lit(f.value)
      case FilterOp.Neq => c =!= lit(f.value)
      case FilterOp.Lt  => c < lit(f.value)
      case FilterOp.Le  => c <= lit(f.value)
      case FilterOp.Gt  => c > lit(f.value)
      case FilterOp.Ge  => c >= lit(f.value)
      case FilterOp.In =>
        c.isin(seqValue(f.value).map(lit): _*)
      case FilterOp.NotIn =>
        !c.isin(seqValue(f.value).map(lit): _*)
      case FilterOp.Contains =>
        c.contains(lit(f.value))
      case FilterOp.Includes =>
        array_contains(c, lit(f.value))
      case FilterOp.IncludesAny =>
        seqValue(f.value).map(v => array_contains(c, lit(v))).reduce(_ || _)
      case FilterOp.IncludesAll =>
        seqValue(f.value).map(v => array_contains(c, lit(v))).reduce(_ && _)
    }
  }

  /** AND-fold of a conjunction; None when empty. */
  def conjunctionColumn(fs: Seq[Filter]): Option[Column] =
    fs.map(toColumn).reduceOption(_ && _)

  /** Full DNF → Column. None when no filters at all. An *empty
    * conjunction* inside the DNF means TRUE (consistent with toSql,
    * which renders it as "true") — dropping it would silently discard
    * rows matched by that disjunct. Note the reference's
    * _filters_to_expr drops such conjunctions; we diverge on purpose.
    */
  def toColumn(filters: Normalized): Option[Column] =
    if (filters.isEmpty) None
    else Some(filters.map(fs => conjunctionColumn(fs).getOrElse(lit(true))).reduce(_ || _))

  /** Row-level predicate for the residual-DML seam (r15): the SQL
    * residual — when present — is the truth the writers evaluate
    * (`filters` then only OVER-approximate for file pruning);
    * otherwise the algebra compiles exactly.
    */
  def rowPredicate(filters: Normalized, predicateSql: Option[String]): Column =
    predicateSql.map(expr).getOrElse(toColumn(filters).getOrElse(lit(true)))

  /** DNF → ANSI SQL predicate ("true" when empty), same output grammar
    * as the reference's filters_to_sql_predicate (util.py:152-295).
    * `schema` validates columns and drives string quoting.
    */
  def toSql(schema: StructType, filters: Normalized): String =
    if (filters.isEmpty) "true"
    else filters.map(fs => conjunctionSql(schema, fs)).mkString(" or ")

  private def conjunctionSql(schema: StructType, fs: Seq[Filter]): String =
    if (fs.isEmpty) "true"
    else fs.map(f => filterSql(schema, f)).mkString("(", " and ", ")")

  private def filterSql(schema: StructType, f: Filter): String = {
    if (!schema.fieldNames.contains(f.column))
      throw new IllegalArgumentException(s"Invalid column name ${f.column}")
    val fieldType = schema(f.column).dataType
    f.op match {
      case FilterOp.Eq | FilterOp.Neq | FilterOp.Lt | FilterOp.Le | FilterOp.Gt | FilterOp.Ge =>
        s"(${f.column} ${f.op.symbol} ${valueSql(f.value, fieldType)})"
      case FilterOp.In | FilterOp.NotIn =>
        s"(${f.column} ${f.op.symbol} ${valueSql(f.value, fieldType)})"
      case FilterOp.Contains =>
        val escaped = escapeSql(f.value.toString)
        s"(${f.column} like '%$escaped%')"
      case FilterOp.Includes | FilterOp.IncludesAny | FilterOp.IncludesAll =>
        val elemType = fieldType match {
          case ArrayType(et, _) => et
          case other => throw new IllegalArgumentException(
            s"'${f.op.symbol}' needs an array column, got $other")
        }
        val values = f.op match {
          case FilterOp.Includes => Seq(f.value)
          case _                 => seqValue(f.value)
        }
        val joinOp = if (f.op == FilterOp.IncludesAny) " or " else " and "
        values
          .map(v => s"array_contains(${f.column}, ${valueSql(v, elemType)})")
          .mkString("(", joinOp, ")")
    }
  }

  private def valueSql(value: Any, t: DataType): String = value match {
    case xs: Seq[_]   => xs.map(v => valueSql(v, t)).mkString("(", ", ", ")")
    case xs: Array[_] => xs.toSeq.map(v => valueSql(v, t)).mkString("(", ", ", ")")
    case v =>
      t match {
        case StringType => s"'${escapeSql(v.toString)}'"
        case _          => v.toString
      }
  }

  def escapeSql(s: String): String = s.replace("'", "''")

  private def seqValue(v: Any): Seq[Any] = v match {
    case xs: Seq[_]      => xs
    case xs: Array[_]    => xs.toSeq
    case xs: Iterable[_] => xs.toSeq
    case other =>
      throw new IllegalArgumentException(s"Expected a sequence value, got $other")
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable hashing primitives.
  *
  * Everything is built on `md5(string)` — bit-identical in Spark,
  * DuckDB, and any other engine — so every derived operator
  * (fingerprints, minhash, LSH bands) is oracle-checkable. All
  * expressions are Catalyst built-ins (codegen'd, no UDFs).
  */
object PortableHash {

  /** Large prime modulus for affine (universal) hashing: 2^31 - 1. */
  val Prime: Long = 2147483647L

  /** Deterministic affine-hash coefficients; seed j uses
    * (A(j), B(j)) = (A0 + dA·j, B0 + dB·j). Fixed constants so Spark
    * and oracle SQL agree, and linear in j so a dynamic-j expression
    * (one pass over the data computing every seed) produces bit-equal
    * values to the per-seed constants.
    */
  val A0 = 1000003L; val DA = 131074L
  val B0 = 12345L; val DB = 7919L
  def coeffA(j: Int): Long = A0 + DA * j
  def coeffB(j: Int): Long = B0 + DB * j

  /** 48-bit integer digest of a string column:
    * first 12 hex chars of md5 → int64 (always positive).
    * DuckDB equivalent: CAST('0x' || substr(md5(x),1,12) AS BIGINT).
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** md5Long reduced into the prime field, ready for affine mixing. */
  def md5Mod(c: Column): Column = md5Long(c) % Prime

  /** Affine re-hash of an already-reduced hash column, seed j.
    * Operands stay < 2^62, no overflow.
    */
  def affine(h: Column, j: Int): Column =
    (lit(coeffA(j)) * h + lit(coeffB(j))) % Prime

  /** DuckDB SQL fragments mirroring the above — generated from the
    * same constants so the oracle can never drift from the Spark side.
    */
  object Sql {
    def md5Long(x: String): String =
      s"CAST('0x' || substr(md5($x), 1, 12) AS BIGINT)"
    def md5Mod(x: String): String = s"(${md5Long(x)} % $Prime)"
    def affine(h: String, j: Int): String =
      s"((${coeffA(j)} * $h + ${coeffB(j)}) % $Prime)"
  }
}

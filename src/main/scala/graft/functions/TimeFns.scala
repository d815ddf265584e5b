package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** Timestamp-encoding tolerance helpers.
  *
  * Parquet stores timestamps either as instants (`isAdjustedToUTC=true`,
  * read by Spark as TIMESTAMP) or as wall-clock values
  * (`isAdjustedToUTC=false`, read as TIMESTAMP_NTZ). `unix_micros`
  * accepts only TIMESTAMP and throws DATATYPE_MISMATCH on NTZ at
  * analysis time. Real lakes contain both encodings, so every
  * epoch-micros consumer goes through [[tsUs]], which casts to
  * TIMESTAMP first: a no-op on LTZ input, and an instant-preserving
  * conversion on NTZ input under the engine's fixed UTC session
  * timezone (matching DuckDB's naive-timestamp reading, so oracle
  * hashes are unaffected).
  */
object TimeFns {

  /** Epoch micros of a timestamp column, tolerant of both TIMESTAMP
    * and TIMESTAMP_NTZ inputs.
    */
  def tsUs(c: Column): Column = unix_micros(c.cast(TimestampType))
}

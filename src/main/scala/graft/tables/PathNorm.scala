package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** THE path-comparison rule for everything that matches scan
  * `_metadata.file_path` values against driver-side metadata paths
  * (position-delete anti-joins, key→file-group lookups, stats
  * keying): `file:///tmp/x` / `file:/tmp/x` → `/tmp/x`. One
  * definition — the write side and the read side of a delete MUST
  * normalize identically or deleted rows silently resurface.
  */
private[tables] object PathNorm {
  val SchemePattern = "^[A-Za-z][A-Za-z0-9+.\\-]*:/+"

  def normalize(p: String): String = p.replaceFirst(SchemePattern, "/")

  def normalizeCol(c: Column): Column = regexp_replace(c, SchemePattern, "/")
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit token hash both Spark and DuckDB can compute identically:
  * the first 15 hex chars of md5, parsed base-16. Used by the
  * oracle-checked q22/q30 variants of simhash / fingerprinting — the
  * operators default to xxhash64 (faster, codegen'd), but DuckDB has no
  * xxhash64, so the driver's cross-engine check needs a shared hash.
  * 60 bits keeps the value strictly below 2^60: safe in a signed BIGINT
  * on both engines and under Spark 4's ANSI overflow checking.
  */
object SharedHash {
  /** Same value as `conv(substring(md5(x), 1, 15), 16, 10)` via the
    * codegen'd [[Md5Long60Expr]] — no per-row hex string / conv parse
    * (the composed form measured ~3x the cost of xxhash64 in the
    * shingling pipelines; this closes most of that gap). The legacy
    * composed form stays below for the equivalence spec.
    */
  def md5Long60(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Md5Long60Expr(org.apache.spark.sql.graftbridge.Bridge.expr(c.cast("binary"))))

  /** The pre-r13 composed form — spec reference only. */
  private[graft] def md5Long60Composed(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The same hash in DuckDB SQL, for oracle construction. */
  def md5Long60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::UBIGINT::BIGINT"
}

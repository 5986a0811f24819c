package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing used by the data-pipeline operators.
  *
  * `h60` is a 60-bit hash derived from the first 15 hex digits of md5 —
  * chosen because it is bit-identical in Spark
  * (`conv(substring(md5(x),1,15),16,10)`) and in the DuckDB oracle
  * (`('0x'||substr(md5(x),1,15))::BIGINT`), always positive, and fits a
  * signed 64-bit integer. Seeded variants prefix the input with
  * `"<seed>:"`, giving the independent hash families MinHash and LSH
  * need. md5 is used as a deterministic mixer, not for security.
  */
object Hashing {
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60(seed: Int, c: Column): Column =
    h60(concat(lit(s"$seed:"), c))

  /** Driver-side evaluation of [[h60]] (same md5-prefix formula) — for
    * precomputing row-independent constants like LSH plane weights. */
  def h60Scala(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL fragment equivalent of [[h60]], for oracle building. */
  def h60Sql(expr: String): String =
    s"('0x'||substr(md5($expr),1,15))::BIGINT"
  def h60Sql(seed: Int, expr: String): String =
    h60Sql(s"'$seed:'||$expr")
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // analysis-time knob only, results identical (see Bench.scala)
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q34,p17 restricts dump + oracle json (local
    // iteration aid; the driver always runs the full set)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def selected(name: String) = only.forall(_.exists(name.startsWith))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        val out = fn(spark, sfDir)
        // the ENGINE's store pins TIMESTAMP_MICROS for its own files
        // (Store constructor — manifest range stats need INT64 chunks),
        // but the DUMP read by the DuckDB comparator must stay INT96:
        // DuckDB reads MICROS(adjustedToUTC) as tz-aware TIMESTAMPTZ
        // while the oracle SQL produces naive timestamps — same values,
        // failed dtype compare. Scoped save/restore around the dump
        // write only (round-9 ADVICE): a store write deferred into the
        // dump action, or the next query's engine work, must never run
        // under the INT96 pin and silently lose manifest range stats.
        val tsKey = "spark.sql.parquet.outputTimestampType"
        val prevTs = spark.conf.getOption(tsKey)
        spark.conf.set(tsKey, "INT96")
        try out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        finally prevTs match {
          case Some(v) => spark.conf.set(tsKey, v)
          case None => spark.conf.unset(tsKey)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

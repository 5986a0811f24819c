package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    println("=== q01 (rollup agg) ===")
    queries.PowaQueries.queries("q01_db_rollup")(spark, d).explain("formatted")
    println("=== q09 (semi join) ===")
    queries.PowaQueries.queries("q09_semi_join")(spark, d).explain("formatted")
    println("=== q06 (readback) ===")
    queries.PowaQueries.queries("q06_readback_union")(spark, d).explain("formatted")
    spark.stop()
  }
}

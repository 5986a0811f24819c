package graft

import org.apache.spark.sql.SparkSession

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
    println("=== q22 multiTopK plan ===")
    queries.PowaQueries.queries("q22_constvalues_rankings")(spark, d).explain("formatted")
    spark.stop()
  }
}

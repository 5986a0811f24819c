package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.autoBroadcastJoinThreshold", 10485760)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      val nWin = "\\bWindow\\b".r.findAllIn(plan).length
      val nSort = "Sort ".r.findAllIn(plan).length
      println(s"[audit] $q shuffles=$nEx broadcasts=$nBc windows=$nWin sorts=$nSort")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Plan inspection harness. Two modes:
  *   - default: one summary line per query (shuffle/broadcast/window/
  *     sort counts from the executed plan) — the quick regression grep.
  *   - SPARK_GRAFT_PLAN_DIR=<dir> [SPARK_GRAFT_PLAN_SUFFIX=_before]:
  *     additionally writes each query's FULL `explain("formatted")`
  *     output to `<dir>/<query><suffix>.txt` — the committed artifact
  *     a plan-shape claim is checked against (optimization guide §1.1:
  *     capture the plan before and after every substantive change).
  * SPARK_GRAFT_PLAN_SF overrides the data dir (default sf0.001). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.autoBroadcastJoinThreshold", 10485760)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
      .map(java.nio.file.Paths.get(_))
    planDir.foreach(java.nio.file.Files.createDirectories(_))
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      val nWin = "\\bWindow\\b".r.findAllIn(plan).length
      val nSort = "Sort ".r.findAllIn(plan).length
      println(s"[audit] $q shuffles=$nEx broadcasts=$nBc windows=$nWin sorts=$nSort")
      planDir.foreach { dir =>
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(dir.resolve(s"$q$suffix.txt"),
          formatted.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}

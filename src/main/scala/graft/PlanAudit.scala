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
      // count from the FORMATTED plan: under AQE the executedPlan's
      // simple toString wraps the tree in AdaptiveSparkPlan and no
      // longer inlines `Exchange hashpartitioning`, so the old counters
      // read 0 for every query — the formatted tree always names each
      // operator once in the numbered tree section
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val tree = formatted.linesIterator
        .takeWhile(!_.startsWith("(1)")).mkString("\n")
      val nEx = "- Exchange ".r.findAllIn(tree).length
      val nBc = "- BroadcastExchange ".r.findAllIn(tree).length
      val nWin = "- Window".r.findAllIn(tree).length
      val nSort = "- Sort ".r.findAllIn(tree).length
      println(s"[audit] $q shuffles=$nEx broadcasts=$nBc windows=$nWin sorts=$nSort")
      planDir.foreach { dir =>
        java.nio.file.Files.write(dir.resolve(s"$q$suffix.txt"),
          formatted.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}

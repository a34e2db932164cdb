package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print exchange counts + the formatted plan of named battery
  * queries with AQE off — the quick feedback loop for keeping the
  * ScaleDesignSpec shuffle budgets honest.
  *
  * Usage: runMain graft.ExplainPlan q1[,q2,...] [sfDir] [--full]
  */
object ExplainPlan {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.001"
    val full = args.contains("--full")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan
      val n = plan.collect { case s: ShuffleExchangeExec => s }.size
      println(s"[exchanges] $q: $n")
      if (full) df.explain("formatted")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Dev probe: is the edges cache hit inside the orient chain? */
object ProfileGraph2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b0 = SparkSession.builder().master("local[32]")
    val b1 = sys.env.get("PROF_BYPASS").fold(b0)(v => b0.config("spark.shuffle.sort.bypassMergeThreshold", v))
    val spark = sys.env.get("PROF_LOCALDIR").fold(b1)(v => b1.config("spark.local.dir", v))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val items = load(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    def edges() = graft.operators.Relational3.basketPairs(items)
      .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .agg(count(lit(1)).as("pair_orders"))
      .where(col("pair_orders") >= 2)
      .select(col("pa"), col("pb"))
    val e = edges().cache()
    e.write.mode("overwrite").format("noop").save()
    val deg = e.select(col("pa").as("node")).unionAll(e.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val keyed = deg.select(col("node"), struct(col("d"), col("node")).as("k"))
    val withK = e
      .join(keyed.select(col("node").as("na"), col("k").as("ka")), col("pa") === col("na"))
      .join(keyed.select(col("node").as("nb"), col("k").as("kb")), col("pb") === col("nb"))
    val o = withK.select(
      when(col("ka") < col("kb"), col("pa")).otherwise(col("pb")).as("lo"),
      when(col("ka") < col("kb"), col("pb")).otherwise(col("pa")).as("hi"),
      when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("khi"))
    val p = o.queryExecution.executedPlan
    val s = p.toString
    println("[probe] InMemoryTableScan occurrences: " + "InMemoryTableScan".r.findAllIn(s).size)
    println("[probe] lineitem FileScan occurrences: " + "lineitem".r.findAllIn(s).size)
    println("[probe] real scan nodes: " + p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => "File:" + f.tableIdentifier.getOrElse(f.relation.location.rootPaths.headOption.getOrElse(""))
      case m if m.getClass.getSimpleName.contains("InMemoryTableScan") => "Mem"
    }.mkString(","))
    println(p.treeString.linesIterator.map(_.take(100)).mkString("\n"))
    def cpuMs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
        case _ => -1L
      }
    def bench(label: String, df: org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val c0 = cpuMs()
        df.write.mode("overwrite").format("noop").save()
        println(f"[probe] $label $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, ${(cpuMs() - c0) / 1000.0}%.1f core-s")
      }
    bench("e cached", e)
    bench("deg", deg)
    bench("withK", withK)
    bench("o", o)
    // discriminators
    val eChk = edges().localCheckpoint(true)
    val degChk = eChk.select(col("pa").as("node")).unionAll(eChk.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    bench("deg over localCheckpoint", degChk)
    val r = spark.range(0, 4000).select((col("id") % 1880).as("node"))
    val degR = r.groupBy("node").agg(count(lit(1)).as("d"))
    bench("deg over range", degR)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    bench("o @4part", o)
    bench("deg cached @4part", deg)
    bench("deg chk @4part", degChk)
    if (sys.env.contains("PROF_SPIN")) {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      println("[probe] spinning deg for 60s; jstack me: " +
        java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
      val t0 = System.nanoTime()
      var n = 0
      while ((System.nanoTime() - t0) / 1e9 < 60) {
        deg.write.mode("overwrite").format("noop").save(); n += 1
      }
      println(s"[probe] spun $n executions")
    }
    spark.stop()
  }
}

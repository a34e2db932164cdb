package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiler for the round-17 dd_canonical regression: times
  * the componentLabels phases so the 32-core blowup can be localized.
  * Not part of any driver surface. */
object ProfileCanonical {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.All.foreach(t => Tables.load(spark, dir, t).count())
    def cpuMs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
        case _ => -1L
      }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); val c0 = cpuMs(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s wall, ${(cpuMs() - c0) / 1000.0}%.1f core-s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Reproduce the computeComponentLabels internals phase by phase.
    val m = graft.operators.Dedup.getClass.getDeclaredMethods
    def call(name: String): org.apache.spark.sql.DataFrame = {
      val mm = m.find(_.getName.endsWith(name)).get
      mm.setAccessible(true)
      mm.invoke(graft.operators.Dedup, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    time("starEdges-ish: full jaccardPairs")(noop(call("jaccardPairs")))
    time("jaccardPairs again")(noop(call("jaccardPairs")))
    time("shingleSet")(noop(call("shingleSet")))
    val edges = call("jaccardPairs")
    val cc = m.find(_.getName.endsWith("connectedComponents")).get
    cc.setAccessible(true)
    time("full computeComponentLabels") {
      val mm = m.find(_.getName.endsWith("computeComponentLabels")).get
      mm.setAccessible(true)
      noop(mm.invoke(graft.operators.Dedup, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame])
    }
    time("full computeComponentLabels 2") {
      val mm = m.find(_.getName.endsWith("computeComponentLabels")).get
      mm.setAccessible(true)
      noop(mm.invoke(graft.operators.Dedup, spark, dir).asInstanceOf[org.apache.spark.sql.DataFrame])
    }
    // CC loop alone over a checkpointed edge frame
    val edgesChk = edges.select(col("doc_a").as("a"), col("doc_b").as("b")).localCheckpoint(true)
    time("connectedComponents(checkpointed edges)") {
      noop(cc.invoke(graft.operators.Dedup, edgesChk).asInstanceOf[org.apache.spark.sql.DataFrame])
    }
    time("connectedComponents 2") {
      noop(cc.invoke(graft.operators.Dedup, edgesChk).asInstanceOf[org.apache.spark.sql.DataFrame])
    }
    spark.stop()
  }
}

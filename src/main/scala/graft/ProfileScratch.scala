package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev profiler for round-16 optimization experiments: times
  * labeled sub-jobs of a battery query so regressions can be localized
  * without the UI. Not part of any driver surface. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
    val b1 = sys.env.get("PROF_BYPASS").fold(b0)(v => b0.config("spark.shuffle.sort.bypassMergeThreshold", v))
    val spark = sys.env.get("PROF_LOCALDIR").fold(b1)(v => b1.config("spark.local.dir", v))
      .config("x.ignore", "1")
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

    val raw = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val spreadDf = Par.spread(raw)
    time("serial md5")(noop(raw.select(md5(col("text")))))
    time("serial md5 again")(noop(raw.select(md5(col("text")))))
    time("spread md5")(noop(spreadDf.select(md5(col("text")))))
    time("spread md5 again")(noop(spreadDf.select(md5(col("text")))))
    time("spread only")(noop(spreadDf))
    time("spread hash32")(noop(spreadDf.select(graft.Exact.hash32(col("text")))))
    def bloomish(docs0: org.apache.spark.sql.DataFrame, chk: Boolean): org.apache.spark.sql.DataFrame = {
      val ks = (0 to 3).map(i => pmod(col("h1") + lit(i.toLong) * col("h2"), lit(65536L)))
      val d1 = docs0
        .select(col("doc_id"), md5(col("text")).as("m5"), graft.Exact.hash32(col("text")).as("h"))
        .select(col("doc_id"), col("m5"), expr("h div 65536").as("h1"), (expr("h % 32768") * 2 + 1).as("h2"))
      val docs = if (chk) d1.localCheckpoint() else d1
      val banned = docs.where(col("doc_id") % 7 === 0)
      val bits = banned.select(explode(array(ks: _*)).as("pos")).distinct()
      val probed = docs.select(col("doc_id"), col("m5"), explode(array(ks: _*)).as("pos"))
      probed.join(broadcast(bits), Seq("pos"), "left_semi")
        .groupBy("doc_id", "m5").agg(count(lit(1)).as("nm")).where(col("nm") === 4)
    }
    if (sys.env.contains("PROF_LOOP")) {
      for (i <- 1 to 60) time(s"loop$i")(noop(bloomish(spreadDf, true)))
    }
    time("bloomish serial+chk")(noop(bloomish(raw, true)))
    time("bloomish serial+chk 2")(noop(bloomish(raw, true)))
    time("bloomish spread+chk")(noop(bloomish(spreadDf, true)))
    time("bloomish spread+chk 2")(noop(bloomish(spreadDf, true)))
    time("bloomish spread nochk")(noop(bloomish(spreadDf, false)))
    time("bloomish serial nochk")(noop(bloomish(raw, false)))
    val qual = regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "\\s+", " ")
    time("serial regex")(noop(raw.select(qual)))
    time("spread regex")(noop(spreadDf.select(qual)))
    time("spread regex again")(noop(spreadDf.select(qual)))
    time("repart8 regex")(noop(raw.repartition(8).select(qual)))
    spark.stop()
  }
}

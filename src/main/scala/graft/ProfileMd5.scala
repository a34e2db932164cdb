package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Dev scratch: does per-row MessageDigest.getInstance inside Spark's md5
  * convoy at 32 concurrent tasks? Measures total task CPU for the same
  * md5 workload at 1 vs 32 partitions, plus a non-md5 control. */
object ProfileMd5 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpu = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpu.addAndGet(e.taskMetrics.executorCpuTime / 1000000)
    })
    val n = 2000000L
    def run(tag: String, parts: Int, expr: org.apache.spark.sql.Column): Unit = {
      val df = spark.range(0, n, 1, parts).select(expr.as("x"))
        .agg(count(col("x")))
      cpu.set(0); val t0 = System.nanoTime
      df.write.format("noop").mode("overwrite").save()
      println(f"[md5] $tag%-28s parts=$parts%2d wall=${(System.nanoTime - t0) / 1e9}%6.2f s taskCpu=${cpu.get / 1000.0}%7.2f s")
    }
    import spark.implicits._
    for (r <- 1 to 2; p <- Seq(1, 32)) {
      run("md5", p, md5($"id".cast("string")))
      run("control concat+length", p, length(concat($"id".cast("string"), lit("xyz"))))
      run("hash32 (md5+conv)", p, graft.Exact.hash32($"id".cast("string")))
    }
    spark.stop()
  }
}

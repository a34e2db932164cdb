package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: does AQE actually coalesce tiny post-shuffle stages under
  * the Bench session config, and what is the per-task overhead at 32
  * shuffle partitions vs coalesced? Prints task counts + wall/cpu.
  */
object ProfileTiny {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(tag: String)(f: => Unit): Unit = {
      val sc = spark.sparkContext
      val t0 = System.nanoTime
      f
      println(f"[tiny] $tag%-40s ${(System.nanoTime - t0) / 1e9}%8.3f s")
    }

    // warm
    spark.range(1000000).groupBy(($"id" % 97).as("k")).count()
      .write.format("noop").mode("overwrite").save()

    // tiny groupBy, lazy plan, AQE decides post-shuffle partitions
    val tiny = spark.range(4000).select(($"id" % 500).as("k"), $"id".as("v"))
    val g = tiny.groupBy("k").agg(sum("v").as("s"))
    g.write.format("noop").mode("overwrite").save()
    println("[tiny] post-shuffle partitions (AQE): " + g.rdd.getNumPartitions)

    for (_ <- 1 to 3) time("tiny groupBy noop")(
      g.write.format("noop").mode("overwrite").save())

    // the iterative shape: 10 rounds of join+agg like ta_textrank
    for (parts <- Seq(32, 4, 1)) {
      val adj = tiny.coalesce(parts).localCheckpoint(true)
      println("[tiny] checkpointed partitions: " + adj.rdd.getNumPartitions)
      var r = adj.select($"k", lit(1L).as("r"))
      for (_ <- 1 to 10)
        r = r.join(adj, "k").groupBy("k").agg(sum($"r" + $"v").as("r"))
      time(s"10-round join+agg chain (ckpt=$parts)")(
        r.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}

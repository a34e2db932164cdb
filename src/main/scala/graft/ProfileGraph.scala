package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Throwaway dev profiler for the round-17 graph-family work: phases of
  * the nodeTriangles wedge pipeline. Not part of any driver surface. */
object ProfileGraph {
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

    // rebuild the edge/orient chain inline (mirrors Graph.nodeTriangles)
    val items = load(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    def edges() = graft.operators.Relational3.basketPairs(items)
      .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
      .agg(count(lit(1)).as("pair_orders"))
      .where(col("pair_orders") >= 2)
      .select(col("pa"), col("pb"))
    time("edges build")(noop(edges()))
    time("edges build again")(noop(edges()))
    val e = edges().cache()
    time("edges cache fill")(noop(e))
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
    time("orient o")(noop(o))
    o.groupBy("lo").agg(count(lit(1)).as("od")).agg(max("od"), sum(col("od")*col("od"))).show()
    val wedges = o
      .groupBy("lo")
      .agg(sort_array(collect_list(struct(col("khi"), col("hi")))).as("ns"))
      .select(col("lo").as("u"), explode(expr(
        "flatten(transform(ns, (x, i) -> " +
          "transform(slice(ns, i + 2, size(ns) - i - 1), " +
          "y -> struct(x.hi AS v, y.hi AS w))))")).as("p"))
      .select(col("u"), col("p.v").as("v"), col("p.w").as("w"))
    time("wedges count")(println("wedges=" + wedges.count()))
    time("wedges noop")(noop(wedges))
    val tris = wedges
      .join(o.as("e3"), col("v") === col("e3.lo") && col("w") === col("e3.hi"))
      .select(col("u"), col("v"), col("w"))
    time("tris noop")(noop(tris))
    val oChk = o.localCheckpoint(true)
    val wedges2 = oChk
      .groupBy("lo")
      .agg(sort_array(collect_list(struct(col("khi"), col("hi")))).as("ns"))
      .select(col("lo").as("u"), explode(expr(
        "flatten(transform(ns, (x, i) -> " +
          "transform(slice(ns, i + 2, size(ns) - i - 1), " +
          "y -> struct(x.hi AS v, y.hi AS w))))")).as("p"))
      .select(col("u"), col("p.v").as("v"), col("p.w").as("w"))
    val tris2 = wedges2
      .join(oChk.as("e3"), col("v") === col("e3.lo") && col("w") === col("e3.hi"))
      .select(col("u"), col("v"), col("w"))
    time("tris with o checkpointed")(noop(tris2))
    time("tris with o checkpointed again")(noop(tris2))
    // full gr_clustering for reference
    time("gr_clustering full")(noop(SparkEntry.queries("gr_clustering")(spark, dir)))
    time("gr_triangles full")(noop(SparkEntry.queries("gr_triangles")(spark, dir)))
    spark.stop()
  }
}

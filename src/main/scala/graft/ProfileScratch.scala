package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway dev profiler for round-16 optimization experiments: times
  * labeled sub-jobs of ann_ivfpq so the regression can be localized
  * without the UI. Not part of any driver surface. */
object ProfileScratch {
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
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    graft.plans.ArrayExprs.register(spark)
    import graft.plans.ArrayExprs.dotProduct
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(dotProduct(col("v"), col("v"))))
    val seeds = e.where(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cnrm"))
    def cos(a: String, an: String, b: String, bn: String) =
      round(dotProduct(col(a), col(b)) / (col(an) * col(bn)), 6)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c").desc, col("cell"))
    val assigned = e.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("cell"), cos("v", "nrm", "cv", "cnrm").as("c"))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select("vec_id", "cell")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("c").desc, col("cell"))
    val probes = q.crossJoin(broadcast(seeds))
      .select(col("q_id"), col("cell"), cos("qv", "qnrm", "cv", "cnrm").as("c"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= 2)
      .select("q_id", "cell")
    val cands = probes.join(assigned, "cell")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    time("ivf-leg cands")(noop(cands))
    time("ivf-leg cands again")(noop(cands))
    time("full ann_ivfpq")(noop(SparkEntry.queries("ann_ivfpq")(spark, dir)))
    time("full ann_pq")(noop(SparkEntry.queries("ann_pq")(spark, dir)))
    time("full ann_pq_big")(noop(SparkEntry.queries("ann_pq_big")(spark, dir)))
    time("full ann_ivfpq again")(noop(SparkEntry.queries("ann_ivfpq")(spark, dir)))
    spark.stop()
  }
}

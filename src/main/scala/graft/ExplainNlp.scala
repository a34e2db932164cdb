package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, IDF, StopWordsRemover, Tokenizer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the §3.3 flagship, plus an EM-vs-online
  * LDA optimizer comparison on the same feature frame. */
object ExplainNlp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (r <- 1 to 2) {
      val c = time(s"r$r corpus persist+count") {
        val c0 = graft.operators.Analytics.corpus(spark, dir).persist()
        c0.count(); c0
      }
      val pipeline = new Pipeline().setStages(Array(
        new Tokenizer().setInputCol("text").setOutputCol("raw_tokens"),
        new StopWordsRemover().setInputCol("raw_tokens").setOutputCol("tokens"),
        new CountVectorizer().setInputCol("tokens").setOutputCol("tf")
          .setMinDF(2.0).setMaxDF(0.95),
        new IDF().setInputCol("tf").setOutputCol("features")))
      val fm = time(s"r$r pipeline.fit (CV+IDF)")(pipeline.fit(c))
      val vecs = time(s"r$r transform+cache+count") {
        val v = fm.transform(c).cache(); v.count(); v
      }
      val onModel = time(s"r$r LDA fit online k=20 iter=10") {
        new LDA().setK(20).setSeed(42L).setOptimizer("online").setMaxIter(10)
          .setFeaturesCol("features").fit(vecs)
      }
      time(s"r$r transform+project+orderBy+noop") {
        import org.apache.spark.ml.functions.vector_to_array
        onModel.transform(vecs)
          .withColumn("t", vector_to_array(col("topicDistribution")))
          .select(col("doc_id") +: (0 until 20).map(i => col("t")(i).as(s"topic_${i + 1}")): _*)
          .orderBy("doc_id")
          .write.mode("overwrite").format("noop").save()
      }
      vecs.unpersist(); c.unpersist()
    }
    spark.stop()
  }
}

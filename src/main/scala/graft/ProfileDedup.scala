package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.Tables.load

object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    load(spark, dir, "documents").count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = load(spark, dir, "documents")
    def toks(c: org.apache.spark.sql.Column) = split(lower(c), " ")
    docs.select(size(toks(col("text"))).as("n"))
      .agg(sum("n").as("tot"), max("n").as("mx"), avg("n").as("avg")).show()
    // variant A: current — transform(sequence) + element_at
    val t = toks(col("text"))
    val vA = when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
      .otherwise(array().cast("array<string>"))
    time("A transform+element_at")(docs.select(array_distinct(vA)).write.mode("overwrite").format("noop").save())
    // variant B: zip_with over sliced copies
    val vB = when(size(t) >= 3,
      zip_with(slice(t, lit(1), size(t) - 2),
        zip_with(slice(t, lit(2), size(t) - 2), slice(t, lit(3), size(t) - 2), (a, b) => concat_ws(" ", a, b)),
        (a, bc) => concat_ws(" ", a, bc)))
      .otherwise(array().cast("array<string>"))
    time("B zip_with+slice")(docs.select(array_distinct(vB)).write.mode("overwrite").format("noop").save())
    time("B again")(docs.select(array_distinct(vB)).write.mode("overwrite").format("noop").save())
    // variant C: no `when` guard around transform (filter afterwards)
    val vC = filter(transform(sequence(lit(0), greatest(size(t) - 3, lit(-1))),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))),
      x => x.isNotNull)
    time("C transform no-when")(docs.select(array_distinct(vC)).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}

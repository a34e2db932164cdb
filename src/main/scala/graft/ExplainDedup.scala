package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: time dd_minhash_lsh shapes on a warmed JVM (2nd run of each
  * variant is the signal; the 1st is JIT warm-up). */
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.Tables.load(spark, dir, "documents").count()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val P = 2147483647L
    def mixA(i: Int): Long = ((i + 1) * 2654435761L) % P | 1L
    def mixB(i: Int): Long = ((i + 1) * 40503L * 65537L + 17L) % P
    def toks(c: Column) = split(lower(c), " ")
    def shingleSet = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.VectorFns.shingles3(toks(col("text"))))).as("sh"))
    def docsh = shingleSet
      .select(col("doc_id"), (graft.Exact.hash32(col("sh")) % P).as("h"))
      .groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
    def mh(i: Int): Column = array_min(transform(col("hs"),
      h => (lit(mixA(i)) * h + lit(mixB(i))) % P))
    def bandCols = (0 until 4).map { b =>
      val hs = (0 until 3).map(r => mh(b * 3 + r))
      struct(lit(b).as("band"), md5(concat_ws("|", lit(b) +: hs: _*)).as("bkt"))
    }
    def bands = docsh.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkt").as("bkt"))

    // variant A: current self-join
    def vA = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(countDistinct(col("x.band")).as("n_bands"))
      .orderBy("doc_a", "doc_b")

    // variant B: bucket-grouped pair explode (single chain, no self-join)
    def vB = bands.groupBy("band", "bkt")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(col("band"), explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(countDistinct(col("band")).as("n_bands"))
      .orderBy("doc_a", "doc_b")

    for (r <- 1 to 2) {
      time(s"A self-join   r$r")(vA.write.mode("overwrite").format("noop").save())
      time(s"B bucket-pair r$r")(vB.write.mode("overwrite").format("noop").save())
    }
    println("A rows=" + vA.count() + " B rows=" + vB.count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QueueDumpSourceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def post(id: String, score: Int) =
    s"""{"author":"u_$id","created_utc":"2024-01-01T10:00:00Z","id":"$id","num_comments":2,"score":$score,"selftext":"s","subreddit":"sydney","title":"t $id","url":"http://x/$id"}"""

  private def writeDump(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dump")
    java.nio.file.Files.writeString(dir.resolve("f1.jsonl"),
      s"[${post("a", 1)},${post("b", 2)}]\n{broken\n[]\n")
    java.nio.file.Files.writeString(dir.resolve("f2.jsonl"),
      s"[${post("c", 3)}]\n")
    dir.toString
  }

  test("DSv2 queue-dump scan: payload explode, fixed schema, malformed skip") {
    import spark.implicits._
    val df = spark.read.format("graft.sources.QueueDumpSource").load(writeDump())
    assert(df.schema == graft.streaming.QueuePipeline.postSchema)
    assert(df.select("id").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    assert(df.where(col("score") >= 2).count() == 2)
  }

  test("column pruning is pushed into the source scan") {
    val df = spark.read.format("graft.sources.QueueDumpSource").load(writeDump())
      .select("id", "score")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("columns=[id,score]"), s"scan not pruned:\n$scan")
    assert(df.count() == 3)
  }

  test("one partition per dump file") {
    val df = spark.read.format("graft.sources.QueueDumpSource").load(writeDump())
    assert(df.rdd.getNumPartitions == 2)
  }

  test("equality and created_utc range predicates are pushed into the scan") {
    import spark.implicits._
    val dir = writeDump()
    val df = spark.read.format("graft.sources.QueueDumpSource").load(dir)
      .where(col("subreddit") === "sydney" && col("created_utc") >= "2024-01-01T00:00:00Z")
      .select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedFilters=[") && plan.contains("EqualTo(subreddit,sydney)")
      && plan.contains("GreaterThanOrEqual(created_utc,2024-01-01T00:00:00Z)"),
      s"predicates not pushed into the scan:\n$plan")
    assert(df.as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    // a pushed filter that eliminates everything
    val none = spark.read.format("graft.sources.QueueDumpSource").load(dir)
      .where(col("created_utc") < "2020-01-01T00:00:00Z")
    assert(none.count() == 0)
    // pushed + residual mix: score range is NOT pushable (int), still applies
    val mixed = spark.read.format("graft.sources.QueueDumpSource").load(dir)
      .where(col("subreddit") === "sydney" && col("score") >= 2)
    assert(mixed.select("id").as[String].collect().sorted.toSeq == Seq("b", "c"))
  }

  test("user-specified schema must match the declared post schema") {
    import org.apache.spark.sql.types._
    val dir = writeDump()
    // the exact declared schema is accepted
    val ok = spark.read.format("graft.sources.QueueDumpSource")
      .schema(graft.streaming.QueuePipeline.postSchema).load(dir)
    assert(ok.count() == 3)
    // a divergent schema fails loudly instead of silently mis-mapping
    val bad = intercept[Exception] {
      spark.read.format("graft.sources.QueueDumpSource")
        .schema(StructType(Seq(StructField("wrong", StringType)))).load(dir)
        .collect()
    }
    assert(bad.getMessage.contains("fixed schema"), s"unexpected: ${bad.getMessage}")
  }
}

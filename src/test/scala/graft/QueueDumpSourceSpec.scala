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
}

package graft

import graft.operators.RedditProcessor
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the §3.3 flagship on FIXTURES.md-shaped reddit frames: both F1
  * branches, null selftext, the union, sort, sentiment, LDA shape, and the
  * composite row ids. */
class RedditProcessorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def fixture() = {
    import spark.implicits._
    // 8 posts / 6 comments; half mention coffee (case/field varied), half not
    val posts = Seq(
      ("u1", "2024-01-01T10:00:00Z", "p1", 3, 10, "great COFFEE here", "melbourne", "morning Coffee run", "http://x"),
      ("u2", "2024-01-01T09:00:00Z", "p2", 0, -2, null, "sydney", "terrible coffee experience", "http://x"),
      ("u3", "2024-01-01T11:00:00Z", "p3", 1, 5, "tea is fine", "brisbane", "tea time", "http://x"),
      ("u4", "2024-01-01T08:00:00Z", "p4", 2, 7, "best espresso and coffee beans", "Adelaide", "beans", "http://x"))
      .toDF("author", "created_utc", "id", "num_comments", "score", "selftext", "subreddit", "title", "url")
    val comments = Seq(
      ("2024-01-01T10:05:00Z", "p1", "c1", "this coffee is really great", "melbourne", "morning Coffee run", 4),
      ("2024-01-01T10:06:00Z", "p1", "c2", "horrible coffee, never again!", "melbourne", "morning Coffee run", -1),
      ("2024-01-01T11:05:00Z", "p3", "c3", "matcha is better", "brisbane", "tea time", 2))
      .toDF("created_utc", "p_id", "c_id", "body", "subreddit", "title", "score")
    (posts, comments)
  }

  test("flagship pipeline: filter/union/sort/sentiment/LDA/ids end to end") {
    val (posts, comments) = fixture()
    val (analysis, topics) = RedditProcessor.analyze(spark, posts, comments, "batch_t")

    val rows = analysis.orderBy("row_id").collect()
    // F1 both branches: p3 (tea) and c3 (matcha) filtered out; null selftext ok
    assert(rows.length == 5)
    assert(analysis.where(col("id") === "p3").count() == 0)
    // schema contract: analysis shape of FIXTURES.md §4
    val cols = analysis.columns.toSeq
    assert(cols.take(7) == Seq("id", "created_utc", "subreddit", "score", "text",
      "sentiment_score", "sentiment"))
    assert((1 to 20).forall(i => cols.contains(s"topic_$i")))
    // X12 composite ids follow the (created_utc, id) order, 0-based
    assert(rows.map(_.getAs[String]("row_id")).toSeq ==
      (0 until 5).map(i => s"${i}_batch_t"))
    // X7: comment rows carry the PARENT id (p_id -> id rename)
    assert(analysis.where(col("id") === "p1").count() == 3) // post + 2 comments
    // D1: clearly-positive and clearly-negative docs got the right label
    assert(analysis.where(col("text").contains("horrible"))
      .select("sentiment").first().getString(0) == "negative")
    assert(analysis.where(col("text").contains("great coffee"))
      .select("sentiment").first().getString(0) == "positive")
    // topics output: 20 rows shaped "topic_i: w1 w2 ..." with batch id
    assert(topics.count() == 20)
    val t1 = topics.orderBy("topic").first()
    assert(t1.getAs[String]("topic_name").startsWith("topic_1: "))
    assert(t1.getAs[String]("batch_id") == "batch_t")
  }

  test("idempotent batch replay: same input + batch id -> identical analysis rows") {
    val (posts, comments) = fixture()
    val (a1, _) = RedditProcessor.analyze(spark, posts, comments, "batch_r")
    val (a2, _) = RedditProcessor.analyze(spark, posts, comments, "batch_r")
    val s1 = a1.select("row_id", "id", "text", "sentiment").orderBy("row_id").collect().toSeq
    val s2 = a2.select("row_id", "id", "text", "sentiment").orderBy("row_id").collect().toSeq
    assert(s1 == s2)
  }
}

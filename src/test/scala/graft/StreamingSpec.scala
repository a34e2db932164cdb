package graft

import graft.streaming.QueuePipeline._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def post(id: String, ts: String = "2024-01-01T10:00:00Z",
                   title: String = "coffee in melbourne"): String =
    s"""{"author":"u1","created_utc":"$ts","id":"$id","num_comments":3,
       |"score":5,"selftext":"","subreddit":"melbourne","title":"$title",
       |"url":"http://x"}""".stripMargin.replaceAll("\n", "")

  test("enqueue/decode roundtrip: batch -> JSON array payload -> typed rows") {
    import spark.implicits._
    val batch = Seq(("a1", 1), ("a2", 2)).toDF("id", "score")
      .withColumn("title", lit("t"))
    val payload = encodeBatch(batch).collect()
    assert(payload.length == 1 && payload.head.getString(0).startsWith("["))
    val decoded = decodePosts(Seq(payload.head.getString(0)).toDF("value"))
    assert(decoded.count() == 2)
    // defensive re-projection: fields absent from the payload are null
    assert(decoded.where(col("author").isNull).count() == 2)
    assert(decoded.columns.toSeq ==
      Seq("author", "created_utc", "id", "num_comments", "score", "selftext",
        "subreddit", "title", "url"))
  }

  test("empty batch is skipped (F3) and malformed JSON yields zero rows (error branch)") {
    import spark.implicits._
    val empty = encodeBatch(Seq.empty[(String, Int)].toDF("id", "score"))
    assert(empty.count() == 0)
    // malformed payload -> null array -> 0 rows; empty array -> 0 rows
    assert(decodePosts(Seq("{not json").toDF("value")).count() == 0)
    assert(decodePosts(Seq("[]").toDF("value")).count() == 0)
    // NB: from_json(ArrayType) wraps a bare top-level object into a
    // 1-element array (Spark permissive mode) — same forgiving behavior as
    // the reference's json.loads accepting any shape before re-projection.
    assert(decodePosts(Seq(post("solo")).toDF("value")).count() == 1)
    val good = decodePosts(Seq(s"[${post("ok1")},${post("ok2")}]").toDF("value"))
    assert(good.count() == 2)
  }

  test("streaming dedup across micro-batches with bounded state (T4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val stream = decodePosts(mem.toDF().withColumnRenamed("value", "value"))
    val deduped = dedupByKey(stream, "id", "created_utc")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(s"[${post("a")},${post("b")}]")
      q.processAllAvailable()
      mem.addData(s"[${post("b")},${post("c")}]") // b replays across batches
      q.processAllAvailable()
      // identity is the KEY, not (key, event time): a harvester re-emit of
      // the same id with a refreshed timestamp must also be dropped
      mem.addData(s"[${post("a", ts = "2024-01-01T11:30:00Z")}]")
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("id").as[String].collect().sorted
      assert(ids.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("idempotent keyed append: replaying a batch cannot duplicate (T3/K5)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val batch = Seq(("x", 1), ("y", 2)).toDF("id", "v")
    idempotentAppend(batch, "id", dir)
    idempotentAppend(batch, "id", dir) // replay, must be a no-op
    val next = Seq(("y", 2), ("z", 3)).toDF("id", "v")
    idempotentAppend(next, "id", dir) // partial overlap
    val got = spark.read.parquet(dir).select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("x", "y", "z"))
  }

  test("fan-in of parameterized per-subreddit streams (T8) and per-trigger cap (T2/O3)") {
    import spark.implicits._
    val subs = Seq("Adelaide", "australia", "brisbane", "melbourne", "sydney")
    val streams = subs.map(s => Seq((s, s"$s-1", 10), (s, s"$s-2", 5))
      .toDF("subreddit", "id", "score"))
    val all = fanIn(streams)
    assert(all.count() == 10)
    assert(all.select("subreddit").distinct().count() == 5)
    val capped = perTriggerCap(all, 3, col("score").desc, col("id"))
    assert(capped.count() == 3)
  }

  test("checkpoint recovery: restart resumes from committed offsets, sink stays exact (T3)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val src = base.resolve("src"); java.nio.file.Files.createDirectory(src)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString

    def writeFile(n: String, ids: String*): Unit =
      java.nio.file.Files.writeString(src.resolve(n),
        ids.map(id => s"[${post(id)}]").mkString("\n"))

    def runOnce(): Unit = {
      val stream = decodePosts(spark.readStream.text(src.toString))
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          idempotentAppend(b, "id", sink)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    writeFile("f1.jsonl", "r1", "r2")
    runOnce()
    // second run: f1 must NOT be reprocessed (committed offsets), f2 is new,
    // and r2's replayed duplicate is absorbed by the idempotent sink
    writeFile("f2.jsonl", "r2", "r3")
    runOnce()
    val got = spark.read.parquet(sink).select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("r1", "r2", "r3"))
  }

  test("topic routing: one stream partitioned by topic lands in per-topic sinks (T6)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_topics").toString + "/queue"
    val batch = Seq(
      ("rharvest", s"[${post("p1")}]"),
      ("rharvest", s"[${post("p2")}]"),
      ("rharvestcomment", """[{"c_id":"c1","p_id":"p1","body":"b","score":1}]"""))
      .toDF("topic", "value")
    batch.write.partitionBy("topic").parquet(dir)
    val posts = decodePosts(spark.read.parquet(dir).where(col("topic") === "rharvest"))
    val comments = decodeComments(spark.read.parquet(dir).where(col("topic") === "rharvestcomment"))
    assert(posts.count() == 2 && comments.count() == 1)
    // partition pruning: reading one topic only touches its directory
    val pruned = spark.read.parquet(dir).where(col("topic") === "rharvestcomment")
    assert(pruned.count() == 1)
  }

  test("windowed event-time aggregation with watermark (T5 streaming variant)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "etype")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("etype"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      mem.addData((t(10, 5), "click"), (t(10, 20), "click"), (t(11, 1), "view"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(col("etype"), col("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog then stops (T1 scheduled-run cadence)") {
    // The production cadence for a periodic ingest: start, drain whatever
    // accumulated (in rate-capped micro-batches if configured), shut down
    // — instead of a long-lived cluster idling between harvest windows.
    // awaitTermination returning (not timing out) IS the assertion that
    // the trigger self-terminates.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(s"[${post("x1")},${post("x2")}]")
    mem.addData(s"[${post("x3")}]")
    val q = decodePosts(mem.toDF())
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("avail_out").start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
      assert(spark.table("avail_out").count() == 3)
    } finally q.stop()
  }

  test("stream-static enrichment join: broadcast dim lookup, stateless, left semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("melbourne", "AU"), ("sydney", "AU"))
      .toDF("subreddit", "region")
    val mem = MemoryStream[String]
    mem.addData(s"[${post("e1")},${post("e2")}]")
    val q = enrich(decodePosts(mem.toDF()), dim, "subreddit")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val out1 = spark.table("enrich_out")
      assert(out1.count() == 2)
      assert(out1.where(col("region") === "AU").count() == 2, "dim lookup missed")
      // Left semantics: an event with no dim row passes through with null.
      mem.addData(s"""[{"author":"u2","created_utc":"2024-01-01T11:00:00Z",
        |"id":"e3","num_comments":0,"score":1,"selftext":"","subreddit":"perth",
        |"title":"t","url":"u"}]""".stripMargin.replaceAll("\n", ""))
      q.processAllAvailable()
      val out2 = spark.table("enrich_out")
      assert(out2.count() == 3)
      assert(out2.where(col("subreddit") === "perth" && col("region").isNull)
        .count() == 1, "unmatched event dropped or mis-enriched")
      // Stateless: a broadcast per micro-batch, never a state store.
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static join grew state rows")
    } finally q.stop()
  }
}

package graft

import graft.streaming.QueuePipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet: CSV and JSON (and JSONL
  * queue dumps) read against DECLARED schemas — the engine never relies on
  * schema inference in production paths (SURVEY §1.3), so a malformed row
  * degrades predictably instead of silently retyping a column.
  */
class SourceFormatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV roundtrip with declared schema; malformed rows go to the corrupt column") {
    val dir = tmp("graft_csv") + "/c"
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == li.count())
    assert(back.schema == schema)
    val s = back.agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).first().getDouble(0)
    val s0 = li.agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).first().getDouble(0)
    assert(s == s0)
  }

  test("ORC roundtrip: schema, exact aggregates, and filter pushdown at the scan") {
    val dir = tmp("graft_orc") + "/o"
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == li.count())
    assert(back.schema.fieldNames.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
    // exact decimal-summed parity with the parquet original
    def s(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")).first().getDouble(0)
    assert(s(back) == s(li))
    // predicate + projection reach the ORC scan (same contract we pin for
    // parquet): PushedFilters carries the predicate, ReadSchema is pruned
    val q = back.where(col("l_returnflag") === "R").select("l_orderkey")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_returnflag"),
      s"ORC scan did not receive the filter:\n$scan")
    assert(q.count() == li.where(col("l_returnflag") === "R").count())
  }

  test("partitionBy layout: a date predicate prunes partitions at the scan " +
    "(SURVEY §4's write-layout claim, measured not asserted)") {
    // The engine's write discipline partitions hot tables by
    // (routing key, date) "so pruning actually fires" — until now that
    // claim had no test because the driver's testdata is flat parquet.
    // Write events partitioned by event date, read back with a one-day
    // predicate, and pin BOTH plan shape (PartitionFilters carries the
    // predicate — the PushedFilters precedent one level up: partition
    // pruning happens at planning, before any file IO) and the measured
    // effect (the scan's numFiles/numPartitions metrics read ONE
    // partition, not all of them). At 100 TB this is the difference
    // between scanning a day and scanning a decade.
    val dir = tmp("graft_part") + "/p"
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("d", to_date(col("ts")))
    ev.write.partitionBy("d").parquet(dir)
    val nPart = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("d="))
    assert(nPart > 3, s"need several date partitions to prove pruning, got $nPart")
    val oneDay = ev.select(max("d")).first().getDate(0).toString
    val q = spark.read.parquet(dir).where(col("d") === lit(oneDay))
      .select("event_id", "value")
    // plan shape: the date predicate lands in PartitionFilters (planning-
    // time pruning), not in the row-level data filter
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(d"),
      s"date predicate did not reach PartitionFilters:\n$plan")
    // measured effect: the executed scan touched exactly one partition.
    // NOTE: execute q's OWN plan (collect) — q.count() would build a new
    // QueryExecution and leave the inspected plan's metrics at zero.
    val got = q.collect().length.toLong
    assert(got == ev.where(col("d") === lit(oneDay)).count())
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numPartitions").value == 1L,
      s"scan read ${scan.metrics("numPartitions").value} partitions of $nPart " +
        "— partition pruning did not fire")
  }

  test("JSONL roundtrip with declared schema + corrupt-record branch") {
    import spark.implicits._
    val dir = tmp("graft_json") + "/j"
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("_corrupt", StringType)))
    // splice a malformed line alongside the real files
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.json"), "{definitely not json\n")
    // corrupt-column-only queries on raw JSON are disallowed — cache first
    val back = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt").json(dir).cache()
    try {
      assert(back.where(col("_corrupt").isNotNull).count() == 1)
      assert(back.where(col("_corrupt").isNull).count() == ev.count())
    } finally back.unpersist()
  }

  test("JSONL queue-dump file decodes through the streaming payload path") {
    import spark.implicits._
    val dir = tmp("graft_queue") + "/q"
    def post(id: String) =
      s"""{"author":"u","created_utc":"2024-01-01T10:00:00Z","id":"$id","num_comments":1,"score":7,"selftext":"s","subreddit":"sydney","title":"t","url":"u"}"""
    // one JSON-array payload per line — the Redis-list dump shape (FIXTURES §3)
    Seq(s"""[${post("a")},${post("b")}]""", "[]", s"""[${post("c")}]""")
      .toDF("value").write.text(dir)
    val decoded = QueuePipeline.decodePosts(spark.read.text(dir))
    assert(decoded.select("id").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
  }
}

package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Keyed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("flatMapGroupsWithState dedup suppresses repeats across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Keyed]
    // ttlMs = 0 (NoTimeout): ProcessingTimeTimeout keeps the engine firing
    // empty batches and processAllAvailable never settles in a sync test
    val q = StatefulOps.dedupWithTtl(mem.toDS(), ttlMs = 0L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    try {
      mem.addData(Keyed("a", "v1"), Keyed("a", "v1-dup-same-batch"), Keyed("b", "v2"))
      q.processAllAvailable()
      mem.addData(Keyed("a", "v1-dup-next-batch"), Keyed("c", "v3"))
      q.processAllAvailable()
      val keys = spark.table("sdedup_out").as[Keyed].collect().map(_.key).sorted
      assert(keys.toSeq == Seq("a", "b", "c"))
      // the survivor for 'a' is its FIRST payload
      val aPayload = spark.table("sdedup_out").as[Keyed]
        .collect().find(_.key == "a").get.payload
      assert(aPayload == "v1")
    } finally q.stop()
  }

  test("transformWithState running totals match the mapGroupsWithState semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Double)]
    val q = StatefulOps.runningTotalsTws(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("stws_out").start()
    try {
      mem.addData(("u1", 10.0), ("u1", 5.0), ("u2", 1.0))
      q.processAllAvailable()
      mem.addData(("u1", 2.0))
      q.processAllAvailable()
      val latest = spark.table("stws_out")
        .as[StatefulOps.RunningTotal].collect()
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n) }
      assert(latest("u1").n == 3 && latest("u1").total == 17.0)
      assert(latest("u2").n == 1 && latest("u2").total == 1.0)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join attributes clicks within the window only") {
    import spark.implicits._
    import graft.streaming.StatefulOps.{Click, Impression}
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    val imps = MemoryStream[Impression]
    val clicks = MemoryStream[Click]
    val q = StatefulOps.attributeClicks(imps.toDS(), clicks.toDS(), windowMinutes = 10)
      .toDF("ad_id", "impression_ts", "click_ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      imps.addData(Impression("ad1", ts(0)), Impression("ad2", ts(0)))
      q.processAllAvailable()
      // ad1 clicked inside the window; ad2 clicked after it; ad3 never shown
      clicks.addData(Click("ad1", ts(5)), Click("ad2", ts(15)), Click("ad3", ts(5)))
      q.processAllAvailable()
      // a second impression of ad1 arriving across micro-batches still joins
      imps.addData(Impression("ad1", ts(4)))
      q.processAllAvailable()
      val rows = spark.table("attr_out")
        .as[(String, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
      assert(rows == Set(
        ("ad1", ts(0), ts(5)),
        ("ad1", ts(4), ts(5))))
    } finally q.stop()
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = StatefulOps.runningTotals(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("srun_out").start()
    try {
      mem.addData(("u1", 10.0), ("u1", 5.0), ("u2", 1.0))
      q.processAllAvailable()
      mem.addData(("u1", 2.0))
      q.processAllAvailable()
      // memory sink in update mode appends each update; take the latest per key
      val latest = spark.table("srun_out")
        .as[StatefulOps.RunningTotal].collect()
        .groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.n) }
      assert(latest("u1").n == 3 && latest("u1").total == 17.0)
      assert(latest("u2").n == 1 && latest("u2").total == 1.0)
    } finally q.stop()
  }
}

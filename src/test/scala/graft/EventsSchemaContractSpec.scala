package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-schema contract for `Tables.load(_, _, "events")`.
  *
  * The driver has regenerated `events.parquet` with different physical `ts`
  * encodings between rounds — TIMESTAMP(NANOS) originally, then
  * TIMESTAMP(MICROS) not UTC-adjusted (Spark's TIMESTAMP_NTZ) — and the
  * round-7 loader, hardwired to the nanos layout, failed analysis for every
  * events query. This suite pins the contract that makes the next
  * regeneration a no-op: whatever encoding the file carries, the loader
  * yields `ts: TimestampType` holding the SAME instants under the UTC
  * session timezone.
  *
  * Three fixtures, one per encoding the driver has shipped or could ship:
  *  - INT64 raw value (what the reader yields for a TIMESTAMP(NANOS) file
  *    under `spark.sql.legacy.parquet.nanosAsLong=true` — Spark cannot
  *    WRITE nanos parquet, but the loader only ever sees the post-read
  *    LongType, so a written long column exercises the identical branch);
  *  - TIMESTAMP_NTZ (micros, isAdjustedToUTC=false — the current testdata);
  *  - TIMESTAMP (micros, UTC-adjusted — the pass-through case).
  */
class EventsSchemaContractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  // One instant with sub-millisecond precision to prove micros survive:
  // 2024-03-05 06:07:08.123456 UTC.
  private val MicrosA = 1709618828123456L
  private val MicrosB = 1709618900000001L

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"events-contract-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Write a 2-row events fixture whose `ts` column is produced by `tsCol`,
    * then load it through Tables.load and return (dataType, micros values). */
  private def roundTrip(tag: String, tsCol: org.apache.spark.sql.Column)
      : (DataType, Seq[Long]) = {
    val dir = tmpDir(tag)
    spark.range(2).toDF("event_id")
      .withColumn("us", when(col("event_id") === 0, MicrosA).otherwise(MicrosB))
      .withColumn("ts", tsCol)
      .select("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.load(spark, dir, "events")
    val tpe = loaded.schema("ts").dataType
    val micros = loaded.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().toSeq.map(_.getLong(0))
    (tpe, micros)
  }

  test("INT64 nanos-as-long ts loads as TimestampType with ns->us truncation") {
    // 789 extra nanos beyond the microsecond must truncate away (matching
    // DuckDB's ns->us truncation, so both engines see identical instants).
    val (tpe, micros) = roundTrip("nanos", col("us") * 1000L + 789L)
    assert(tpe === TimestampType)
    assert(micros === Seq(MicrosA, MicrosB))
  }

  test("TIMESTAMP_NTZ micros ts loads as TimestampType, instants preserved") {
    val (tpe, micros) =
      roundTrip("ntz", timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(tpe === TimestampType)
    assert(micros === Seq(MicrosA, MicrosB))
  }

  test("UTC-adjusted TIMESTAMP ts passes through unchanged") {
    val (tpe, micros) = roundTrip("utc", timestamp_micros(col("us")))
    assert(tpe === TimestampType)
    assert(micros === Seq(MicrosA, MicrosB))
  }

  test("real testdata events loads with TimestampType ts and non-zero rows") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }

  test("ts predicates push down into the events parquet scan") {
    // The cast-to-timestamp fallback for TIMESTAMP_NTZ files blocks
    // pushdown (PushedFilters: []) — at 100 TB that is a full scan per
    // time-window query. The loader reads MICROS files as TimestampType
    // directly (inferTimestampNTZ=false), so a ts filter must reach the
    // scan as a pushed filter and the read schema must be plain timestamp.
    val plan = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .where(col("ts") >= lit("2024-01-01").cast("timestamp"))
      .select("event_id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts filter not pushed to the events scan:\n$plan")
    assert(!plan.contains("timestamp_ntz"),
      s"events scan still reads TIMESTAMP_NTZ (cast fallback engaged):\n$plan")
  }
}

package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Loader-surface contract for every driver-generated table.
  *
  * Round 7 showed the driver regenerates the testdata parquet between
  * rounds and may change a column's physical encoding when it does (events
  * `ts`: TIMESTAMP(NANOS) → TIMESTAMP_NTZ micros). The events-specific
  * normalization is pinned in EventsSchemaContractSpec; this suite pins the
  * rest of the surface the 131-query battery consumes: every table loads
  * through `Tables.load`, every column a query references exists, and each
  * column's type sits in the family the queries assume. Families (not exact
  * types) keep benign regenerations green — int32 vs int64 for a key is
  * fine; a key becoming a string, a date becoming a long, or a column
  * disappearing is a loud test failure instead of forty silent query
  * deaths at Verify time.
  */
class TestdataContractSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private val integral: DataType => Boolean = {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private val numeric: DataType => Boolean = {
    case t if integral(t) => true
    case _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }
  private val stringy: DataType => Boolean = _.isInstanceOf[StringType]
  private val temporal: DataType => Boolean = {
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case _ => false
  }
  private val floatArray: DataType => Boolean = {
    case ArrayType(et, _) => numeric(et)
    case _ => false
  }

  /** table -> (column -> allowed type family). */
  private val contract: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map("r_regionkey" -> integral, "r_name" -> stringy),
    "nation" -> Map("n_nationkey" -> integral, "n_name" -> stringy,
      "n_regionkey" -> integral),
    "customer" -> Map("c_custkey" -> integral, "c_name" -> stringy,
      "c_nationkey" -> integral, "c_acctbal" -> numeric,
      "c_mktsegment" -> stringy),
    "supplier" -> Map("s_suppkey" -> integral, "s_name" -> stringy,
      "s_nationkey" -> integral, "s_acctbal" -> numeric),
    "part" -> Map("p_partkey" -> integral, "p_name" -> stringy,
      "p_brand" -> stringy, "p_type" -> stringy, "p_size" -> integral,
      "p_retailprice" -> numeric),
    "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> stringy, "o_totalprice" -> numeric,
      "o_orderdate" -> temporal, "o_orderpriority" -> stringy),
    "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> numeric, "l_extendedprice" -> numeric,
      "l_discount" -> numeric, "l_tax" -> numeric,
      "l_returnflag" -> stringy, "l_linestatus" -> stringy,
      "l_shipdate" -> temporal),
    "events" -> Map("event_id" -> integral, "ts" -> temporal,
      "user_id" -> integral, "event_type" -> stringy, "value" -> numeric,
      "props" -> stringy),
    "documents" -> Map("doc_id" -> integral, "text" -> stringy,
      "lang" -> stringy, "source" -> stringy, "n_chars" -> integral),
    "embeddings" -> Map("vec_id" -> integral, "embedding" -> floatArray,
      "label" -> integral))

  for ((table, cols) <- contract.toSeq.sortBy(_._1))
    test(s"$table loads with the column surface the battery assumes") {
      val schema = Tables.load(spark, dir, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.keys.filterNot(byName.contains)
      assert(missing.isEmpty,
        s"columns missing from $table: ${missing.mkString(", ")} " +
          s"(driver testdata regeneration changed the schema?)")
      val badType = cols.collect {
        case (c, ok) if !ok(byName(c)) => s"$c is ${byName(c).simpleString}"
      }
      assert(badType.isEmpty,
        s"type-family violations in $table: ${badType.mkString("; ")}")
    }

  test("loader view is load-order independent: no NTZ/nanos surface anywhere") {
    // Tables.load sets nanosAsLong=true / inferTimestampNTZ=false before
    // EVERY read (not just events), so reader semantics cannot depend on
    // which table loaded first. This matters beyond events: orders'
    // o_orderdate is NTZ-encoded in the parquet, so with an events-only
    // conf flip its Spark type would have depended on load order (the
    // round-8 ADVICE finding). Pin the invariant the battery consumes:
    // through Tables.load every temporal column surfaces as plain
    // TimestampType/DateType — never TIMESTAMP_NTZ, never raw nano longs
    // masquerading as a `ts` column.
    for (table <- Tables.All) {
      val schema = Tables.load(spark, dir, table).schema
      val ntz = schema.fields.filter(_.dataType.isInstanceOf[TimestampNTZType])
      assert(ntz.isEmpty,
        s"$table surfaces TIMESTAMP_NTZ through Tables.load " +
          s"(${ntz.map(_.name).mkString(", ")}) — the loader confs are not " +
          "being applied before the read")
      val rawTs = schema.fields.filter(f => f.name == "ts" && integral(f.dataType))
      assert(rawTs.isEmpty,
        s"$table's ts column surfaces as a raw integer through Tables.load")
    }
  }

  test("events value domain stays inside ev_anomaly's int64-exact envelope") {
    // ev_anomaly keeps integer power sums over cents: css sums AnomWin=100
    // cent-squares, so n·css − cs² stays int64-exact while |value| ≲ 9×10⁶
    // — and DuckDB would RAISE on overflow where Spark wraps, so the bound
    // is a cross-engine divergence guard, not just precision. Pin the
    // actual domain two orders of magnitude inside it.
    import org.apache.spark.sql.functions._
    val mx = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .agg(max(abs(col("value")))).collect()(0).getDouble(0)
    assert(mx < 1e5,
      s"events.value grew to |$mx| — re-derive ev_anomaly's integer-sum " +
        "overflow envelope (EventWindows.scala) before trusting the oracle")
    // a16_gini's concentration index assumes a non-negative value domain
    // (Gini over mixed-sign data is not a well-defined inequality measure).
    val mn = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .agg(min(col("value"))).collect()(0).getDouble(0)
    assert(mn >= 0,
      s"events.value went negative ($mn) — a16_gini's domain assumption broke")
  }

  test("sketch self-audit: prof_hll / prof_kmv rel_err stays inside the " +
    "published accuracy envelope") {
    // The DuckDB oracle proves the sketches compute what the SQL says —
    // but the oracle matches the SKETCH, not the truth. A future hash or
    // register-derivation change that silently degrades accuracy would
    // still pass the hash gate. Pin |rel_err| against the published
    // standard errors instead: HLL p=12 → σ ≈ 1.04/√4096 ≈ 1.63%, KMV
    // k=256 → σ ≈ 1/√254 ≈ 6.3%; allow 3σ (these are fixed deterministic
    // hashes, so the draw never changes — the bound is a tripwire, not a
    // statistical test).
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val hll = SparkEntry.queries("prof_hll")(spark, d)
        .select(col("event_type"), abs(col("rel_err")).as("e")).collect()
      assert(hll.nonEmpty)
      for (r <- hll)
        assert(r.getDouble(1) < 3 * 0.0163,
          s"$d prof_hll ${r.getString(0)}: |rel_err|=${r.getDouble(1)} " +
            "outside 3σ of the p=12 envelope — the sketch degraded")
      val kmv = SparkEntry.queries("prof_kmv")(spark, d)
        .select(col("event_type"), abs(col("rel_err")).as("e")).collect()
      assert(kmv.nonEmpty)
      for (r <- kmv)
        assert(r.getDouble(1) < 3 * 0.063,
          s"$d prof_kmv ${r.getString(0)}: |rel_err|=${r.getDouble(1)} " +
            "outside 3σ of the k=256 envelope — the sketch degraded")
    }
  }

  test("documents.lang domain equals ta_nb_langid's generated class list") {
    // The NB classifier's pivot columns and argmax chain are GENERATED
    // over a fixed class list (the oracle SQL is a static string); a lang
    // appearing outside it would silently train into no class.
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val langs = Tables.load(spark, d, "documents")
        .select(col("lang")).distinct().collect().map(_.getString(0)).sorted.toSeq
      assert(langs == Seq("de", "en", "es", "fr", "zh"),
        s"$d lang domain drifted to $langs — regenerate NbLangs")
    }
  }
}

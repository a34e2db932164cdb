package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Gate-shape contract for the whole battery: every `SparkEntry.queries`
  * output column must be a scalar type. The driver's correctness gate sorts
  * the result frame in pandas before hashing, and pandas cannot factorize
  * list/map/struct cells (`TypeError: unhashable type: 'numpy.ndarray'`) —
  * the exact failure that turned `ir_invindex` and `emb_quantize` red in
  * round 5. Collections must be emitted via the arr_collect house pattern
  * (`array_join(...)` to a string, Relational2.scala) or exploded to rows.
  *
  * Schema resolution is analysis-only (no job runs) for all but the few
  * queries whose construction is eager (pivot distinct, localCheckpoint),
  * so this sweep stays cheap at sf0.001.
  */
class QuerySchemaShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val Dir = "/root/testdata/sf0.001"

  test("every query has an oracle and every oracle has a query (nlp_* exempt)") {
    // A queries() entry without its oracleSql twin silently downgrades
    // the driver gate to a rows-only check — the exact failure mode the
    // battery exists to prevent. Only the golden-pinned nlp_* family is
    // exempt by design (SURVEY §5.4).
    val q = SparkEntry.queries.keySet.filterNot(_.startsWith("nlp_"))
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty,
      s"queries with NO oracle (weak driver check): ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty,
      s"orphan oracles with no query: ${(o diff q).toSeq.sorted}")
  }

  test("no query emits a top-level array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        q(spark, Dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"comparator-unsafe output columns:\n  ${offenders.mkString("\n  ")}")
  }

  // ---- round-12 pin: output-type discipline (the round-11 red class) ----
  // The round-11 driver gate's only 3 red rows were EXACTLY the 3 queries
  // whose DuckDB oracle emitted raw HUGEINT/decimal128 output columns: the
  // driver's hash canonicalization renders decimals differently per engine
  // (e.g. a pandas HUGEINT→float64 `-2865057471.0` vs Spark's decimal
  // `-2865057471`) even when values are identical. DECIMAL is welcome as an
  // INTERNAL accumulator (exact big-integer sums); it must never cross the
  // gate — final selects CAST bounded results to BIGINT/DOUBLE (the gr_hits
  // discipline, Graph.scala:511). The DuckDB side of the same pin lives in
  // tools/check_oracle.py, which fails any oracle result carrying a
  // DECIMAL/HUGEINT column.

  /** Gate-crossable scalar types: everything both engines and the driver's
    * pandas canonicalization agree on bit-for-bit. */
  private def gateSafe(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | DoubleType | StringType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false // DecimalType, FloatType, ByteType/ShortType, BinaryType…
  }

  private def typeOffenders(name: String, df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if !gateSafe(f.dataType) =>
        s"$name.${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("no query emits a DECIMAL (or any non-gate-safe) output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) => typeOffenders(name, q(spark, Dir))
    }
    assert(offenders.isEmpty,
      s"non-gate-safe output columns (CAST the final select):\n  " +
        offenders.mkString("\n  "))
  }

  test("the type gate catches a seeded DECIMAL violation") {
    import spark.implicits._
    val seeded = Seq(1L, 2L).toDF("x")
      .agg(sum(col("x").cast("decimal(38,0)")).as("s"))
    val hits = typeOffenders("seeded", seeded)
    assert(hits.nonEmpty && hits.head.contains("decimal"),
      s"sweep failed to flag a decimal output: $hits")
  }
}

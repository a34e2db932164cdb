package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
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
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * All folds are sequential left-to-right (`aggregate` over `zip_with`), in
  * double precision — bit-identical to DuckDB's `list_cosine_similarity` /
  * `list_sum(list_transform(...))`, which makes cosine scores reproducible
  * across engines without tolerance windows. Everything here is codegen'd
  * expression trees (no UDFs), so the hot path stays inside whole-stage
  * codegen and scales linearly with partition count.
  */
object VectorFns {

  /** float[] → double[] (exact widening, matches `::DOUBLE[]`). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product of two double[] columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, same operation order as DuckDB's builtin:
    * dot / (sqrt(na) * sqrt(nb)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Word n-gram shingles from a token array (n=3): the unit of MinHash /
    * Jaccard near-dup detection. Empty array when the doc is too short.
    *
    * Built from three shifted `slice`s zipped together, NOT
    * `transform(sequence(...), i => element_at(t, i+k))`: inside a lambda,
    * `t` is an outer expression — not a lambda variable — so `element_at`
    * re-evaluates the whole token-split per ELEMENT, turning an O(n) shingle
    * build into O(n²) per doc (measured 8× slower on the documents table).
    * The slice form evaluates `t` a constant number of times per ROW. */
  def shingles3(toks: Column): Column = {
    val t = toks
    val n = size(t)
    when(n >= 3,
      zip_with(
        slice(t, lit(1), n - 2),
        zip_with(slice(t, lit(2), n - 2), slice(t, lit(3), n - 2),
          (b, c) => concat_ws(" ", b, c)),
        (a, bc) => concat_ws(" ", a, bc)))
      .otherwise(array().cast("array<string>"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: interleave the low `bits` bits of two
  * dimensions so that sorting by the key co-locates rows that are close in
  * EITHER dimension. This is the data-layout primitive behind
  * multi-dimensional file skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`):
  * write the table range-partitioned + sorted by `zkey(a, b)` and parquet
  * min/max stats prune point/range queries on `a` AND on `b` — a linear
  * sort can only serve one of them.
  *
  * Pure bit arithmetic over built-in expressions (shiftright / bitwiseAND /
  * shiftleft / sum) — whole-stage-codegen friendly, no UDF, and the exact
  * same formula is emitted as DuckDB SQL by [[zkeySql]] so the oracle gate
  * covers it bit-for-bit. ScaleDesignSpec pins the clustering property
  * (chunk min/max overlap shrinks on both dimensions).
  */
object ZOrder {

  /** Morton key of (a, b): bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Inputs must be non-negative and fit in `bits` bits.
    *
    * Interleaving only balances dimensions whose values USE comparable bit
    * widths — a 4-bit-wide column interleaved with a 7-bit-wide one sorts
    * by the wide column's top bits alone and the narrow dimension never
    * clusters. Production layouts normalize each dimension to the same
    * width first (rank/quantile → fixed-width int); ScaleDesignSpec
    * demonstrates both the failure and the normalized fix. */
  def zkey(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .plus(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL over integer expressions — one
    * formula, two engines. */
  def zkeySql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}

package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact integer Gramian accumulator: row count, per-dimension sums, and
  * upper-triangle pair-product sums of an integer-valued vector column, in
  * ONE pass with map-side partial aggregation.
  *
  * Scale rationale vs the explode formulation: building a d×d covariance
  * by exploding d(d+1)/2 pair products per row generates ~2080·n
  * intermediate rows for d=64 (104M at sf0.1) just to feed a 2080-group
  * aggregate. This buffer keeps the d(d+1)/2 running sums as primitive
  * longs per partition — the classic distributed-Gramian accumulator
  * (Spark MLlib RowMatrix.computeGramianMatrix does the same with a
  * per-partition BLAS buffer) — so the only thing that crosses the wire
  * is one ~2 KB array per partition.
  *
  * Exactness: inputs are small integers (the emb_quantize 0..255 grid),
  * so every sum is exact long arithmetic — identical to the DuckDB
  * oracle's HUGEINT sums — while ‖pair sums‖ ≤ 255²·n stays int64-safe to
  * n ≈ 1.4e14 rows.
  *
  * Emitted layout: [n, dimSum_0..d−1, pairSum_(0,0), (0,1)…(0,d−1),
  * (1,1)…(d−1,d−1)] as one array<bigint> row.
  */
final class GramBuffer(val d: Int) {
  val dims = new Array[Long](d)
  val pairs = new Array[Long](d * (d + 1) / 2)
  var n = 0L

  def add(q: Array[Long]): Unit = {
    var i = 0
    var idx = 0
    while (i < d) {
      val qi = q(i)
      dims(i) += qi
      var j = i
      while (j < d) {
        pairs(idx) += qi * q(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    n += 1
  }

  def merge(o: GramBuffer): Unit = {
    var i = 0
    while (i < d) { dims(i) += o.dims(i); i += 1 }
    i = 0
    while (i < pairs.length) { pairs(i) += o.pairs(i); i += 1 }
    n += o.n
  }
}

/** `gramian_agg(vec, d)` → `array<bigint>` (see [[GramBuffer]] layout). */
case class GramianAgg(
    child: Expression,
    dExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  private lazy val d: Int = dExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, dExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(d)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gramian_agg: vector of ${arr.numElements()} elements, expected $d")
      buf.add(arr.toLongArray())
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: GramBuffer): Any = {
    val out = new Array[Long](1 + buf.d + buf.pairs.length)
    out(0) = buf.n
    System.arraycopy(buf.dims, 0, out, 1, buf.d)
    System.arraycopy(buf.pairs, 0, out, 1 + buf.d, buf.pairs.length)
    new GenericArrayData(out)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 8 * (buf.d + buf.pairs.length))
    bb.putInt(buf.d).putLong(buf.n)
    buf.dims.foreach(bb.putLong)
    buf.pairs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(bb.getInt())
    buf.n = bb.getLong()
    var i = 0
    while (i < buf.d) { buf.dims(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < buf.pairs.length) { buf.pairs(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramianAgg =
    copy(child = newChildren(0), dExpr = newChildren(1))

  override def prettyName: String = "gramian_agg"
}

object GramianAgg {
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "gramian_agg", exprs => GramianAgg(exprs(0), exprs(1)), "built-in")

  /** Column API; requires [[register]] on the session first. */
  def gramian(vec: Column, d: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "gramian_agg", vec, org.apache.spark.sql.functions.lit(d))
}

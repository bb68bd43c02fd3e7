package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Exact interpolated quantile with the reference's rule
  * (reference: native_libs/src/Analysis.cpp:19-37 `vectorQuantile`):
  *
  *   n  = N*q - 0.5;  lerp(sorted[floor(n)], sorted[ceil(n)], frac(n))
  *   q<=0 -> min, q>=1 -> max; nulls dropped; empty -> null.
  *
  * This differs from SQL `percentile` ((N-1)*q) and from DuckDB
  * `quantile_cont`, except at q=0.5 where all three agree — so `median`
  * can be oracle-checked directly while other q's need the explicit
  * arithmetic on the oracle side.
  *
  * Implemented as a TypedImperativeAggregate buffering valid doubles —
  * O(group) memory like every exact-quantile algorithm; partial/merge
  * aggregation keeps the shuffle to one Array[Double] per group per
  * partition. Works as a grouped aggregate AND as a window function.
  */
case class InterpolatedQuantile(
    child: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty[Double]

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => (v: Any) => v.asInstanceOf[Double]
    case FloatType  => (v: Any) => v.asInstanceOf[Float].toDouble
    case LongType   => (v: Any) => v.asInstanceOf[Long].toDouble
    case IntegerType => (v: Any) => v.asInstanceOf[Int].toDouble
    case ShortType  => (v: Any) => v.asInstanceOf[Short].toDouble
    case _: DecimalType => (v: Any) => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalArgumentException(s"quantile: unsupported type $other")
  }

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += toDouble(v)
    buf
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = b1 ++= b2

  override def eval(buf: ArrayBuffer[Double]): Any =
    if (buf.isEmpty) null else InterpolatedQuantile.quantile(buf.toArray, q)

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.length * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): InterpolatedQuantile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): InterpolatedQuantile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): InterpolatedQuantile =
    copy(child = newChild)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantile"
}

object InterpolatedQuantile {
  /** The reference's lerp rule over a sorted copy; mutates nothing. */
  def quantile(values: Array[Double], q: Double): Double = {
    java.util.Arrays.sort(values)
    val len = values.length
    if (q >= 1.0) return values(len - 1)
    if (q <= 0.0) return values(0)
    val n = len * q - 0.5
    val n1 = math.max(0, math.floor(n).toInt)
    val n2 = math.min(len - 1, math.ceil(n).toInt)
    val t = n - math.floor(n)
    (1 - t) * values(n1) + t * values(n2)
  }

  def quantileCol(c: Column, q: Double): Column =
    Bridge.column(InterpolatedQuantile(Bridge.expression(c), q).toAggregateExpression())
  def medianCol(c: Column): Column = quantileCol(c, 0.5)
}

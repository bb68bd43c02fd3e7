package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Growable primitive double vector — the aggregation buffer for the exact
  * quantile aggregates. A `scala.collection.mutable.ArrayBuffer[Double]`
  * boxes every element (ArrayBuffer is not @specialized): a 3-column
  * describe over 600k rows allocated ~5M java.lang.Double objects per
  * aggregate pass, and the resulting GC pressure bled into NEIGHBORING
  * queries in long shared-JVM runs. This stores raw doubles — zero boxing
  * on update, merge, serialize, and eval. */
final class DoubleVec(initialCapacity: Int = 16) {
  private var arr: Array[Double] = new Array[Double](math.max(initialCapacity, 1))
  private var n: Int = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0

  def append(v: Double): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(n) = v
    n += 1
  }

  def appendAll(other: DoubleVec): Unit = {
    if (n + other.n > arr.length)
      arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, n + other.n))
    System.arraycopy(other.arr, 0, arr, n, other.n)
    n += other.n
  }

  /** The used prefix, sorted in place (the buffer is consumed at eval). */
  def sortedValues(): Array[Double] = {
    java.util.Arrays.sort(arr, 0, n)
    arr
  }

  def writeTo(out: DataOutputStream): Unit = {
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(arr(i)); i += 1 }
  }
}

object DoubleVec {
  def readFrom(in: DataInputStream): DoubleVec = {
    val n = in.readInt()
    val v = new DoubleVec(n)
    var i = 0
    while (i < n) { v.append(in.readDouble()); i += 1 }
    v
  }
}

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
  * Implemented as a TypedImperativeAggregate buffering valid doubles in a
  * primitive [[DoubleVec]] — O(group) memory like every exact-quantile
  * algorithm; partial/merge aggregation keeps the shuffle to one
  * Array[Double] per group per partition. Works as a grouped aggregate AND
  * as a window function. For several q's over the SAME column use
  * [[InterpolatedQuantiles]]: one buffer and one sort instead of k. */
abstract class QuantileAggBase extends TypedImperativeAggregate[DoubleVec]
    with UnaryLike[Expression] {
  def child: Expression

  override def createAggregationBuffer(): DoubleVec = new DoubleVec()

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => (v: Any) => v.asInstanceOf[Double]
    case FloatType  => (v: Any) => v.asInstanceOf[Float].toDouble
    case LongType   => (v: Any) => v.asInstanceOf[Long].toDouble
    case IntegerType => (v: Any) => v.asInstanceOf[Int].toDouble
    case ShortType  => (v: Any) => v.asInstanceOf[Short].toDouble
    case _: DecimalType => (v: Any) => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalArgumentException(s"quantile: unsupported type $other")
  }

  override def update(buf: DoubleVec, input: InternalRow): DoubleVec = {
    val v = child.eval(input)
    if (v != null) buf.append(toDouble(v))
    buf
  }

  override def merge(b1: DoubleVec, b2: DoubleVec): DoubleVec = { b1.appendAll(b2); b1 }

  override def serialize(buf: DoubleVec): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bos)
    buf.writeTo(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DoubleVec =
    DoubleVec.readFrom(new DataInputStream(new ByteArrayInputStream(bytes)))

  override def nullable: Boolean = true
}

case class InterpolatedQuantile(
    child: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QuantileAggBase {

  override def eval(buf: DoubleVec): Any =
    if (buf.isEmpty) null
    else InterpolatedQuantile.quantileSorted(buf.sortedValues(), buf.size, q)

  override def withNewMutableAggBufferOffset(offset: Int): InterpolatedQuantile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): InterpolatedQuantile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): InterpolatedQuantile =
    copy(child = newChild)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quantile"
}

/** All of `qs` from ONE buffer and ONE sort, as array<double> (null iff the
  * group has no valid values). k independent [[InterpolatedQuantile]]s over
  * the same column buffer, shuffle, and sort the column k times — aggregate
  * inputs share nothing — so describe/equi-depth/winsorize use this form. */
case class InterpolatedQuantiles(
    child: Expression,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends QuantileAggBase {

  override def eval(buf: DoubleVec): Any =
    if (buf.isEmpty) null
    else {
      val sorted = buf.sortedValues()
      val n = buf.size
      new GenericArrayData(qs.map(q =>
        InterpolatedQuantile.quantileSorted(sorted, n, q)).toArray)
    }

  override def withNewMutableAggBufferOffset(offset: Int): InterpolatedQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): InterpolatedQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): InterpolatedQuantiles =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_quantiles"
}

object InterpolatedQuantile {
  /** The reference's lerp rule over a sorted copy; mutates nothing. */
  def quantile(values: Array[Double], q: Double): Double = {
    val copy = java.util.Arrays.copyOf(values, values.length)
    java.util.Arrays.sort(copy)
    quantileSorted(copy, copy.length, q)
  }

  /** The lerp rule against an already-sorted prefix `sorted[0, len)`. */
  def quantileSorted(sorted: Array[Double], len: Int, q: Double): Double = {
    if (q >= 1.0) return sorted(len - 1)
    if (q <= 0.0) return sorted(0)
    val n = len * q - 0.5
    val n1 = math.max(0, math.floor(n).toInt)
    val n2 = math.min(len - 1, math.ceil(n).toInt)
    val t = n - math.floor(n)
    (1 - t) * sorted(n1) + t * sorted(n2)
  }

  def quantileCol(c: Column, q: Double): Column =
    Bridge.column(InterpolatedQuantile(Bridge.expression(c), q).toAggregateExpression())
  def medianCol(c: Column): Column = quantileCol(c, 0.5)

  /** One buffered pass answering every q in `qs` — element i of the result
    * array is quantile qs(i). */
  def quantilesCol(c: Column, qs: Seq[Double]): Column =
    Bridge.column(InterpolatedQuantiles(Bridge.expression(c), qs).toAggregateExpression())
}

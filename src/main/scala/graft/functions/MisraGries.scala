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
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a partial/merge aggregate: at most
  * k−1 counters per buffer, with the classic guarantee that EVERY item
  * whose true frequency exceeds n/k survives into the final summary — for
  * any partitioning and any merge order (summary merge per Agarwal et al.,
  * "Mergeable Summaries", PODS'12: combine counts, then subtract the k-th
  * largest and drop non-positives).
  *
  * This is the frequent-token/domain profile for corpora whose vocabulary
  * is too large to groupBy: the shuffle carries one ≤(k−1)-entry map per
  * map partition — O(k) bytes — instead of a vocab-sized count table. The
  * summary's residual counts (and its sub-threshold extras) DO depend on
  * merge order, so [[eval]] exposes only the candidate item set; callers
  * needing exact figures re-count just the candidates
  * ([[graft.operators.Sketch.heavyHitters]]) — the guarantee makes that
  * second pass exact, deterministic, and engine-reproducible.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"misra-gries: k must be >= 2 ($k)")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string item column (cast first), got ${other.simpleString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k - 1 => buf.update(key, 1L)
        case None =>
          // decrement-all step; amortized O(1) per input
          val dead = buf.iterator.collect { case (ky, 1L) => ky }.toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (ky, c) => b1.update(ky, b1.getOrElse(ky, 0L) + c) }
    if (b1.size > k - 1) {
      // subtract the k-th largest count, drop non-positive — mergeable-
      // summaries rule; error stays <= n/k after any merge tree
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - (k - 1) - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace { (ky, c) =>
        val nc = c - kth
        if (nc <= 0) dead += ky
        nc
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  /** Candidate items only (sorted for a stable result); residuals are
    * merge-order-dependent by nature and deliberately not exposed. */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8, not writeUTF: items over 64 KiB (long
    // URLs, whole-document keys) would hit writeUTF's u2 length limit
    buf.foreach { case (ky, c) =>
      val b = ky.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesSketch =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitter_candidates"
}

object MisraGries {
  /** Column form: string column -> array of candidate heavy-hitter items. */
  def candidatesCol(c: Column, k: Int): Column =
    Bridge.column(MisraGriesSketch(Bridge.expression(c), k).toAggregateExpression())
}

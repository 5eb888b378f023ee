package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_mg(item, k)` — the Misra–Gries frequent-items summary
  * (Misra & Gries, Sci. Comp. Prog. 1982; merge rule from Agarwal,
  * Cormode, Huang, Phillips, Wei & Yi, "Mergeable Summaries",
  * PODS 2012 §3): at most k counters of bounded state per partial,
  * merged by counter addition followed by subtracting the (k+1)-th
  * largest count — after any merge tree, every item's kept count
  * undercounts its true frequency by at most N/(k+1), so every item
  * with true frequency > N/(k+1) SURVIVES in the summary.
  *
  * The summary's exact counter values depend on arrival/merge order
  * (inherent to MG), so this aggregate is NOT a gate-facing result —
  * it is the bounded-state CANDIDATE pass of
  * [[graft.ops.Sketches.heavyHittersExact]], whose exact recount over
  * the ≤ k candidates is deterministic. The no-false-negative
  * guarantee above is the part that holds under ANY order, and is what
  * the operator's loud threshold check leans on.
  */
case class MgSummaryAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 65536, s"graft_mg: k must sit in [1, 65536]: $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = v.asInstanceOf[UTF8String].toString
    buf.get(s) match {
      case Some(c) => buf(s) = c + 1
      case None if buf.size < k => buf(s) = 1L
      case None => // all k counters busy: decrement everyone, drop zeros
        buf.keysIterator.toArray.foreach { key =>
          val c = buf(key) - 1
          if (c == 0L) buf.remove(key) else buf(key) = c
        }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf(s) = buf.getOrElse(s, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all, drop <= 0 —
      // the PODS 2012 merge; ties on count break nowhere because the
      // subtraction keeps any count strictly above the pivot
      val pivot = buf.values.toArray.sortBy(-_).apply(k)
      buf.keysIterator.toArray.foreach { key =>
        val c = buf(key) - pivot
        if (c <= 0L) buf.remove(key) else buf(key) = c
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1).map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_mg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_mg expects string, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(off: Int): MgSummaryAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MgSummaryAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgSummaryAgg =
    copy(child = newChildren.head)
}

/** `graft_mgw(item, w, k)` — the WEIGHTED Misra–Gries summary (Berinde,
  * Indyk, Cormode & Strauss, TODS 2010 generalize the guarantee to
  * weighted streams): each arrival adds its weight to the item's
  * counter; when a (k+1)-th counter appears, the minimum counter value
  * is subtracted from all and zeros drop — the per-arrival form of the
  * PODS 2012 pivot merge, so after any merge tree every item with true
  * weight > W/(k+1) (W = total weight) survives. The candidate pass of
  * [[graft.ops.Sketches.heavyHittersByWeightShare]] — "which domains
  * hold >= x% of the corpus' tokens/bytes" without a full groupBy over
  * the domain column. Weights must be positive and <= 9·10¹² (the
  * operator's cross-multiply headroom), loudly enforced.
  */
case class MgWeightedAgg(
    item: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 65536, s"graft_mgw: k must sit in [1, 65536]: $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    val wv = weight.eval(input)
    if (v == null || wv == null) return buf
    val w = wv.asInstanceOf[Number].longValue()
    require(w > 0 && w <= 9000000000000L,
      s"graft_mgw: weight $w outside (0, 9e12]")
    val s = v.asInstanceOf[UTF8String].toString
    buf(s) = buf.getOrElse(s, 0L) + w
    if (buf.size > k) {
      // k+1 counters: the (k+1)-th largest is the minimum — subtract
      // it everywhere; at least the argmin drops
      val pivot = buf.values.min
      buf.keysIterator.toArray.foreach { key =>
        val c = buf(key) - pivot
        if (c <= 0L) buf.remove(key) else buf(key) = c
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf(s) = buf.getOrElse(s, 0L) + c }
    if (buf.size > k) {
      val pivot = buf.values.toArray.sortBy(-_).apply(k)
      buf.keysIterator.toArray.foreach { key =>
        val c = buf(key) - pivot
        if (c <= 0L) buf.remove(key) else buf(key) = c
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1).map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item, weight)
  override def prettyName: String = "graft_mgw"

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mgw expects (string, bigint), got " +
        s"(${item.dataType.sql}, ${weight.dataType.sql})")

  override def withNewMutableAggBufferOffset(off: Int): MgWeightedAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MgWeightedAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgWeightedAgg =
    copy(item = newChildren(0), weight = newChildren(1))
}

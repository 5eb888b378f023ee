package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Packed-register HLL layout for the iterative graph sketches
  * (HyperANF, Boldi–Rosa–Vigna WWW 2011 §4: "the registers of a
  * counter are kept in a single array"). The row-per-(node, bucket)
  * register table ([[graft.ops.Sketches.hllRegisters]]) is the right
  * shape for one-shot reads, but an r-round frontier merge that joins
  * the edge list against it moves |E|·m rows per round and starves the
  * partial aggregate (owner keys scatter across neighbor-keyed
  * partitions — the r10 golden sweep measured the q250/q251 pair
  * super-linear, 771.6 s at 10×, on exactly this). Packing the m
  * registers into ONE BinaryType cell per node makes each round's join
  * move |E| rows and each merge a bytewise max — state and shuffle both
  * shrink by the register count.
  *
  * Register values are rho ≤ [[graft.ops.Sketches.MaxRho]] = 30, so a
  * byte holds them with room; the max is over SIGNED bytes, which
  * agrees with unsigned order on [0, 127] — [[HllPackAgg]] rejects
  * anything past 127 loudly.
  */
object ByteMax {
  /** Elementwise max of `other` into `buf` (mutates and returns buf).
    * Lazy-sized: an empty buffer adopts the first input's width. */
  def mergeInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other.clone()
    require(buf.length == other.length,
      s"graft_bytemax: mixed widths ${buf.length} vs ${other.length}")
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  /** Unsigned-widen a packed byte cell to array<bigint> for SQL reads. */
  def unpack(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xffL; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** SWAR lane-wise max of eight byte lanes packed in one long —
    * branch-free, one instruction chain, valid for lanes in [0, 127]
    * (the high bit of each lane is the borrow guard): with the guard
    * bits set on `a`, the subtraction never borrows across lanes, so
    * each lane's guard bit survives iff a_lane >= b_lane; spreading
    * those indicator bits to full-lane masks selects per lane. The
    * classic SIMD-within-a-register idiom (Lamport, CACM 1975 —
    * "multiple byte processing with full-word instructions"). */
  def swarMax(a: Long, b: Long): Long = {
    val H = 0x8080808080808080L
    val d = (a | H) - (b & ~H)
    val sel = ((d & H) >>> 7) * 0xFFL
    b ^ ((a ^ b) & sel)
  }
}

/** `graft_bytemax(binary)` — aggregate: elementwise (bytewise) max of
  * fixed-width binary cells; the HLL register union in packed form.
  * Commutative and associative, so map-side partial aggregation and
  * any merge order give the same bytes. Widths must agree within a
  * group (loud raise otherwise); NULL inputs are skipped; an
  * all-NULL group reads NULL.
  */
case class ByteMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else ByteMax.mergeInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    ByteMax.mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_bytemax"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bytemax expects binary, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(off: Int): ByteMaxAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): ByteMaxAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ByteMaxAgg =
    copy(child = newChildren.head)
}

/** `graft_hllpack(bucket, rho, m)` — aggregate: fold (bucket, rho)
  * observations ([[graft.ops.Sketches.hllRhoRows]]'s projection) into
  * one m-byte packed register cell per group: cell(bucket) =
  * max(rho). The packed twin of [[graft.ops.Sketches.hllRegisters]] —
  * same observables, same max — for callers that keep iterating on the
  * sketch. Out-of-range buckets or rho > 127 raise loudly (a silent
  * clamp would corrupt every downstream estimate).
  */
case class HllPackAgg(
    bucket: Expression,
    rho: Expression,
    numBytes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBytes >= 1 && numBytes <= (1 << 14),
    s"graft_hllpack: register count must sit in [1, 16384]: $numBytes")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val b = bucket.eval(input)
    val r = rho.eval(input)
    if (b == null || r == null) return buf
    val idx = b.asInstanceOf[Number].longValue()
    val v = r.asInstanceOf[Number].longValue()
    require(idx >= 0 && idx < numBytes,
      s"graft_hllpack: bucket $idx outside [0, $numBytes)")
    require(v >= 0 && v <= 127, s"graft_hllpack: rho $v outside [0, 127]")
    if (v.toByte > buf(idx.toInt)) buf(idx.toInt) = v.toByte
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    ByteMax.mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(bucket, rho)
  override def prettyName: String = "graft_hllpack"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(bucket, rho).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hllpack expects (bigint, bigint), got " +
        s"(${bucket.dataType.sql}, ${rho.dataType.sql})")

  override def withNewMutableAggBufferOffset(off: Int): HllPackAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllPackAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllPackAgg =
    copy(bucket = newChildren(0), rho = newChildren(1))
}

/** `graft_swarmax(a, b)` — scalar: lane-wise max of eight 7-bit byte
  * lanes packed in one bigint ([[ByteMax.swarMax]]); the codegen'd
  * building block of [[PackedRegMaxAgg]]. Lanes past 127 are out of
  * contract (the guard bit is the algorithm's own). */
case class SwarByteMaxExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_swarmax"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_swarmax expects (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any =
    ByteMax.swarMax(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ByteMax.swarMax($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SwarByteMaxExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_packmax(arr, n)` — aggregate: lane-wise max of packed
  * register vectors, each an array of exactly `n` bigints holding
  * eight [0, 127] byte lanes apiece. DECLARATIVE, over primitive
  * long buffer slots — so it aggregates on HashAggregateExec's fast
  * path inside whole-stage codegen with map-side partial combine,
  * which is the difference between this and a TypedImperativeAggregate
  * (ObjectHashAggregate, per-row interpreted eval, sort-based fallback
  * past 128 groups) on an |E|-row register merge. The iterative graph
  * sketches ([[graft.ops.GraphRank.hyperBall]]) run on this.
  *
  * NULL input rows are skipped (buffer unchanged); groups are never
  * empty under groupBy, and the all-NULL group reads all-zero lanes —
  * the empty sketch, which is the union identity.
  */
case class PackedRegMaxAgg(child: Expression, numLongs: Int)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {

  require(numLongs >= 1 && numLongs <= 2048,
    s"graft_packmax: lane-long count must sit in [1, 2048]: $numLongs")

  private lazy val regs: Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference] =
    (0 until numLongs).map(i =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        s"__reg$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference] = regs

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(numLongs)(org.apache.spark.sql.catalyst.expressions.Literal(0L))

  override lazy val updateExpressions: Seq[Expression] =
    (0 until numLongs).map { i =>
      org.apache.spark.sql.catalyst.expressions.If(
        org.apache.spark.sql.catalyst.expressions.IsNull(child),
        regs(i),
        SwarByteMaxExpr(regs(i),
          org.apache.spark.sql.catalyst.expressions.GetArrayItem(
            child, org.apache.spark.sql.catalyst.expressions.Literal(i))))
    }

  override lazy val mergeExpressions: Seq[Expression] =
    regs.map(r => SwarByteMaxExpr(r.left, r.right))

  override lazy val evaluateExpression: Expression =
    org.apache.spark.sql.catalyst.expressions.CreateArray(regs)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_packmax expects array<bigint>, got ${other.sql}")
  }

  override def prettyName: String = "graft_packmax"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PackedRegMaxAgg =
    copy(child = newChildren.head)
}

/** `graft_unpack_bytes(binary)` — scalar: unsigned-widen a packed byte
  * cell to array<bigint> so the integer-exact HLL estimate fold
  * ([[graft.ops.Sketches.hllEstimate]]'s arithmetic) reads packed cells
  * through plain codegen'd SQL (`aggregate`/`filter`), keeping the
  * estimate spelling engine-portable. */
case class UnpackBytesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unpack_bytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unpack_bytes expects binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ByteMax.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteMax.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): UnpackBytesExpr =
    copy(child = newChild)
}

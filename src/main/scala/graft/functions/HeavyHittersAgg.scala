package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `heavy_hitters(tok, k)` — Misra–Gries frequent-items sketch as a
  * mergeable TypedImperativeAggregate over a string column.
  *
  * Each partition keeps at most k (item, count) pairs: a present item
  * increments; an absent item on a full summary decrements EVERY
  * tracked count by one (dropping zeros) — the classic MG step, O(k)
  * worst case but amortized O(1) per input because each decrement
  * event cancels k+1 stream items. Partial summaries merge by
  * pointwise count addition followed by the mergeable-summaries trim
  * (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
  * Summaries", PODS 2012): subtract the (k+1)-th largest count from
  * every entry and drop non-positives. The merged sketch keeps the
  * sequential guarantees:
  *
  *   - UNDERESTIMATE: est(x) <= tf(x) for every x;
  *   - BOUNDED ERROR: tf(x) - est(x) <= n/(k+1), n = total items;
  *   - COVERAGE: every x with tf(x) > n/(k+1) is present.
  *
  * This is the scale-correct corpus-level heavy-hitters plan: the
  * exact formulation (q_vocab_topk) shuffles a vocabulary-sized
  * partial aggregate, while this ships AT MOST k rows per partition
  * into a driver-bounded merge — over 100 TB of tokens the exchange
  * is k×partitions, independent of vocabulary size. The surviving
  * item SET depends on partition/merge order (only the guarantees
  * are deterministic), so query-level gates verify the three bounds
  * against an exact count rather than hash-matching sketch contents
  * (q_vocab_heavy_approx).
  *
  * Reference inventory context: SURVEY §2 text-analysis family;
  * the reference engine has no sketch aggregates — this extends the
  * training-data-pipeline surface alongside topk_struct
  * ([[TopKStruct]], same TypedImperativeAggregate idiom).
  */
case class HeavyHitters(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  private val itemType = StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(itemType, containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else if (!kExpr.foldable)
      TypeCheckFailure(s"$prettyName requires a literal k")
    else kExpr.eval(null) match {
      case n: Number if n.intValue() > 0 => TypeCheckSuccess
      case other => TypeCheckFailure(s"$prettyName requires a positive integer k, got $other")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      buf.get(tok) match {
        case Some(c) => buf(tok) = c + 1
        case None if buf.size < k => buf(tok) = 1L
        case None =>
          // full + absent: cancel one count everywhere (incl. the
          // arriving item's implicit 1), dropping exhausted entries
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (tok, c) => b1(tok) = b1.getOrElse(tok, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count; at most k survive (ties
      // with the pivot fall to zero and drop)
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - (k + 1))
      b1.mapValuesInPlace((_, c) => c - pivot)
      b1.filterInPlace((_, c) => c > 0)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (tok, est) => (-est, tok) }
      .map { case (tok, est) =>
        InternalRow(UTF8String.fromString(tok), est): Any
      }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (tok, c) =>
      out.writeUTF(tok)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ => buf(in.readUTF()) = in.readLong() }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

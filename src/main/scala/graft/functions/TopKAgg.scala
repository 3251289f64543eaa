package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** `topk_struct(struct, k)` — bounded top-k per aggregation group as
  * a custom TypedImperativeAggregate: each partition keeps a k-sized
  * heap of struct rows (natural ascending struct order — encode
  * "descending" by negating the sort field), partial heaps merge
  * associatively, and eval emits the k smallest rows ascending.
  *
  * This is the scale-correct top-k-per-key: the window/row_number
  * formulation shuffles and fully sorts EVERY row of every key, while
  * the heap aggregate ships at most k rows per (partition, group) to
  * the merge side — top-3 over a billion-row key moves 3 rows per
  * partition, not a billion through a sort.
  */
case class TopKStruct(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UnsafeRow]] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val rowOrd =
    RowOrdering.createNaturalAscendingOrdering(structType.map(_.dataType))
  // PriorityQueue dequeues the LARGEST under this ordering → evicting
  // the head keeps the k smallest rows
  private implicit lazy val heapOrd: Ordering[UnsafeRow] =
    (a: UnsafeRow, b: UnsafeRow) => rowOrd.compare(a, b)
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = "topk_struct"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!child.dataType.isInstanceOf[StructType])
      TypeCheckFailure(s"$prettyName requires a struct input, got ${child.dataType.catalogString}")
    else if (!kExpr.foldable)
      TypeCheckFailure(s"$prettyName requires a literal k")
    else kExpr.eval(null) match {
      case n: Number if n.intValue() > 0 => TypeCheckSuccess
      case other => TypeCheckFailure(s"$prettyName requires a positive integer k, got $other")
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow]

  override def update(buf: mutable.PriorityQueue[UnsafeRow],
                      input: InternalRow): mutable.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val cand = v.asInstanceOf[InternalRow]
      // hot-path guard: only project/copy/insert when the candidate
      // can actually enter the top-k — for the typical row (worse
      // than the current k-th) this is one comparison, no allocation,
      // no heap rebalance
      if (buf.size < k) {
        buf.enqueue(proj(cand).copy())
      } else if (rowOrd.compare(cand, buf.head) < 0) {
        buf.dequeue()
        buf.enqueue(proj(cand).copy())
      }
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[UnsafeRow],
                     b2: mutable.PriorityQueue[UnsafeRow]): mutable.PriorityQueue[UnsafeRow] = {
    b2.foreach { r =>
      b1.enqueue(r)
      if (b1.size > k) b1.dequeue()
    }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray.sorted(rowOrd).map(x => x: Any))

  override def serialize(buf: mutable.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UnsafeRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(structType.size)
      row.pointTo(b, len)
      buf.enqueue(row)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStruct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStruct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStruct =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k SMALLEST input structs under
  * the struct's natural ascending field-by-field ordering, returned as
  * a sorted array.
  *
  * Why a custom aggregate (SURVEY §4.2): the obvious per-group top-k
  * formulations are either `row_number() OVER (PARTITION BY g ORDER BY
  * ...) <= k` — whose partial phase (Spark's InferWindowGroupLimit
  * does run a map-side WindowGroupLimit before the exchange) still
  * fully SORTS every scored row per task — or
  * `slice(sort_array(collect_list(...)), 1, k)` — whose partial
  * buffers are UNBOUNDED (collect_list keeps every row until the final
  * merge). This aggregate is the shape a 100 TB re-rank needs:
  *   - O(n log k) heap updates instead of an O(n log n) sort per task;
  *   - partial aggregation bounds BOTH memory (k rows per group per
  *     task) and the exchange (≤ k rows per group per map task cross
  *     the shuffle), regardless of corpus size;
  *   - merge is a k-way heap union, associative and order-insensitive.
  *
  * Determinism contract: callers must make the ordering struct a TOTAL
  * order (e.g. lead with the negated score, tie-break on a unique id)
  * so the result is independent of partitioning and merge order.
  * Mixed-direction orderings encode as field negation (score DESC ≡
  * -score ASC for doubles; negation is exact, and ties negate to ties,
  * so ordering semantics are preserved bit-for-bit).
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"topk_rows requires k > 0, got $k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val fieldTypes: Array[DataType] =
    structType.fields.map(_.dataType)

  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    fieldTypes.map(TypeUtils.getInterpretedOrdering)

  /** Natural ascending, field by field; nulls sort first (the fixture
    * orderings never feed nulls, but the aggregate stays total). */
  @transient private lazy val rowOrd: Ordering[InternalRow] =
    (a: InternalRow, b: InternalRow) => {
      var i = 0
      var c = 0
      while (c == 0 && i < fieldTypes.length) {
        val av = a.get(i, fieldTypes(i))
        val bv = b.get(i, fieldTypes(i))
        c =
          if (av == null && bv == null) 0
          else if (av == null) -1
          else if (bv == null) 1
          else fieldOrds(i).compare(av, bv)
        i += 1
      }
      c
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    // rowOrd ascending ⇒ scala's PriorityQueue dequeues the LARGEST
    // retained row first — exactly the eviction candidate for a
    // keep-k-smallest heap.
    mutable.PriorityQueue.empty[InternalRow](rowOrd)

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) {
        buf.enqueue(row.copy())
      } else if (rowOrd.compare(row, buf.head) < 0) {
        buf.dequeue()
        buf.enqueue(row.copy())
      }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (rowOrd.compare(row, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(row)
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      buf.toArray.sorted(rowOrd).asInstanceOf[Array[Any]])

  @transient private lazy val toUnsafe = UnsafeProjection.create(fieldTypes)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val u = toUnsafe(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKRows {
  /** Column-API entry: `topk(struct(-score, id, payload...), k)` →
    * array of the k smallest structs, ascending. */
  def topk(sortStruct: Column, k: Int): Column =
    ColumnBridge.column(
      TopKRows(ColumnBridge.expression(sortStruct), k).toAggregateExpression())
}

package graft.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Top-k (score, id) accumulator as a custom `TypedImperativeAggregate`.
  *
  * The window-rank idiom (`row_number().over(partitionBy(q).orderBy
  * (score.desc))` then `rank <= k`) must shuffle and sort *every*
  * scored candidate. This aggregate keeps a bounded k-element heap per
  * group on the map side, so at 10⁹ candidates per query only
  * k-element buffers cross the wire — the difference between a top-3
  * lookup and re-sorting the corpus per query.
  *
  * Result: `array<struct<score:double, id:bigint>>`, descending score,
  * id-ascending tie-break (same total order as the window idiom).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  // wrong-typed arguments must fail ANALYSIS, not throw
  // ClassCastException per row on the executors (the asInstanceOf in
  // update) — the same contract the sibling expressions declare
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (score.dataType != DoubleType)
      TypeCheckFailure(s"score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckFailure(s"id must be BIGINT, got ${id.dataType.sql}")
    else TypeCheckSuccess
  }

  /* ALL score comparisons use java.lang.Double.compare — the same
   * TOTAL order Spark's sort uses (NaN greatest, +0.0 > -0.0) — so a
   * NaN score ranks exactly where the window-rank idiom ranks it
   * (first under desc) instead of poisoning the heap: the old
   * IEEE `s > ws` test was always false against a NaN head, which
   * let one early NaN permanently block a group's top-k and made the
   * result depend on partition/merge order. */

  // min-heap: the head is the entry to evict — worst score under the
  // total order, and among equals the largest id (ids ascend on ties)
  private def heapOrder: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // bigger id = worse
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrder)

  private def push(
      buf: mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      val c = java.lang.Double.compare(s, ws)
      if (c > 0 || (c == 0 && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      push(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => push(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // same total order as the heap, inverted: score desc, id asc
    val sorted = buf.toArray.sorted(heapOrder)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {

  /** `topK(score, id, k)` aggregate Column: use inside `groupBy(...)
    * .agg(...)`; explode the result to get (rank, score, id) rows.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}

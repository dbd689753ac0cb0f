package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group top-k as a real aggregate: a bounded max-heap of (score, tag)
  * pairs kept per group, combined map-side.
  *
  * Why it exists: the window realization of top-k
  * (`row_number().over(partitionBy(g).orderBy(desc(score)))` + filter)
  * must shuffle and fully sort EVERY row of every group. This aggregate
  * keeps only k candidates per group per partition, participates in
  * partial aggregation (map-side combine), and shuffles at most
  * k × groups rows — at 100 TB that is the difference between sorting the
  * corpus and sorting a per-group constant.
  *
  * Semantics: highest score wins; ties break on the LOWER tag (string
  * ascending), matching the deterministic `ORDER BY score DESC, tag ASC`
  * discipline of the window queries. Result: array<struct<score,tag>> in
  * rank order.
  */
case class TopKAggregate(
    scoreExpr: Expression,
    tagExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, String)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, tagExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false))))

  // heap whose head is the WEAKEST element (lowest score; among equal
  // scores the lexicographically larger tag), so eviction is O(log k)
  private val weakestFirst: Ordering[(Double, String)] =
    new Ordering[(Double, String)] {
      def compare(a: (Double, String), b: (Double, String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score first
        if (c != 0) c else a._2.compareTo(b._2)      // larger tag first
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, String)] =
    mutable.PriorityQueue.empty[(Double, String)](weakestFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, String)],
      score: Double, tag: String): Unit = {
    if (buf.size < k) buf.enqueue((score, tag))
    else {
      val weakest = buf.head
      // stronger = higher score, or same score with lexicographically
      // smaller tag
      if (score > weakest._1 || (score == weakest._1 && tag < weakest._2)) {
        buf.dequeue()
        buf.enqueue((score, tag))
      }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, String)],
      input: InternalRow): mutable.PriorityQueue[(Double, String)] = {
    val s = scoreExpr.eval(input)
    val t = tagExpr.eval(input)
    if (s != null && t != null) {
      insert(buf, s.asInstanceOf[Double], t.toString)
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, String)],
      other: mutable.PriorityQueue[(Double, String)])
      : mutable.PriorityQueue[(Double, String)] = {
    other.foreach { case (s, t) => insert(buf, s, t) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, String)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, t) => (-s, t) }
    new GenericArrayData(sorted.map { case (s, t) =>
      InternalRow(s, UTF8String.fromString(t))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, String)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, t) =>
      out.writeDouble(s)
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((s, new String(b, "UTF-8")))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(scoreExpr = newChildren(0), tagExpr = newChildren(1))
  override def prettyName: String = "top_k"
}

object TopKAggregate {
  /** Column entry point: top_k(score, tag, k) → array<struct<score,tag>>
    * in rank order.
    */
  def top_k(score: Column, tag: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAggregate(
        GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(tag), k)
        .toAggregateExpression())
}

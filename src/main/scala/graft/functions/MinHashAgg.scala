package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** MinHash signature as ONE imperative aggregate: buffer = long[k] of
  * running minima under k wrapping multiply-add permutations, updated in
  * a single tight loop per input hash. Replaces k separate `min(...)`
  * aggregate columns (k buffer slots touched through one dispatch instead
  * of k aggregate-function dispatches per row) and is mergeable — the
  * partial signatures combine associatively across partitions, which is
  * what makes the sketch usable in map-side partial aggregation at scan
  * scale. SQL: `minhash_agg(hashCol, k)` → array<bigint> of length k.
  *
  * The permutation coefficients match [[graft.dedup.Dedup.minhashCoeffs]]
  * exactly, so signatures are interchangeable with the column-expression
  * form.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val coeffs: Array[(Long, Long)] =
    graft.dedup.Dedup.minhashCoeffs(numHashes).toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && numHashes > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires (bigint, positive literal int), got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val h = coeffs(i)._1 * x + coeffs(i)._2 // wrapping, as in the column form
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Builder for GraftExtensions: second argument must be a literal int. */
  def fromChildren(children: Seq[Expression]): MinHashAgg = {
    val k = children(1) match {
      case e if e.foldable && e.dataType == IntegerType => e.eval().asInstanceOf[Int]
      case other => throw new IllegalArgumentException(
        s"minhash_agg: numHashes must be a literal int, got $other")
    }
    MinHashAgg(children.head, k)
  }
}

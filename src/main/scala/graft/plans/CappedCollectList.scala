package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a HARD buffer bound (cap-before-collect, r21):
  * the aggregation buffer never holds more than `limit` elements — a
  * degenerate bucket cannot build an array past the bound, at ANY
  * scale, because the bound is enforced inside update/merge rather
  * than by a filter over an already-materialized array.
  *
  * Intended use is the bucket-cap idiom with `limit = cap + 1`:
  * buckets whose true population is ≤ cap collect COMPLETELY (the
  * buffer bound is never hit, output identical to collect_list);
  * buckets past the cap arrive with exactly cap + 1 elements, which
  * the caller's `size(...) <= cap` filter drops — so WHICH cap + 1
  * elements survived truncation (partition-order dependent, like
  * collect_list's own element order) can never reach the output.
  * Callers must treat element order and over-limit content as
  * unspecified, exactly as they must for collect_list.
  *
  * Why not a pre-count + semi-join, and not a count window (both
  * measured at sf10, winnow/minhash bucket tables of ~10⁷ exploded
  * rows): the window form buffers every bucket group through
  * ExternalAppendOnlyUnsafeRowArray's 4096-row spill threshold (x34
  * 13 s → 107 s); the semi-join form pays a second pass plus a
  * sort-merge join of the full exploded stream against the qualifying
  * keys (x34 ~74 s). This form is the r20 single hash aggregation —
  * no sort, no join, no second pass — with the buffer bound the r20
  * form lacked.
  *
  * update/merge/serialization ride Spark's own [[Collect]] machinery
  * (element copying, UnsafeRow-based buffer serialization); only the
  * bound is new. Nulls are skipped (collect_list convention). */
case class CappedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(limit > 0, s"capped_collect: limit must be positive, got $limit")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    val n = other.length
    while (buffer.length < limit && i < n) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def dataType: DataType = ArrayType(child.dataType, false)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectList =
    copy(child = newChild)

  override def prettyName: String = "capped_collect"
}

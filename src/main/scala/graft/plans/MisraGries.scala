package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native Spark AGGREGATE
  * (TypedImperativeAggregate): `misra_gries(item, k)` returns ≤ k
  * candidate items guaranteed to include EVERY item whose true
  * frequency exceeds N/(k+1) — the mergeable heavy-hitter sketch
  * (Misra & Gries 1982; merge rule and its preserved error bound from
  * Agarwal et al. 2012, "Mergeability of Summaries").
  *
  * Why an aggregate and not a group-by: the exact hot-token/hot-key
  * report at 100 TB would shuffle the full item cardinality (the whole
  * vocabulary / key space). This sketch reduces each map partition to a
  * k-entry summary before the exchange — shuffle volume k·partitions,
  * independent of cardinality — and a second k-bounded EXACT pass
  * (see graft.ops.HeavyHitters) turns the candidate superset into a
  * deterministic exact answer. The candidate SET itself may vary with
  * partitioning (survivor low-count entries are merge-order dependent);
  * the guarantee — no false negatives above the threshold — holds for
  * every order, which is what the exact verification pass needs.
  *
  * update: counter bump, or insert while < k entries, else decrement
  * all (amortized by the zero-entry sweep). merge: add counts, then if
  * over k entries subtract the (k+1)-largest count from all and drop
  * the non-positive — both sides' undercounts add, staying ≤ N/(k+1)
  * total. eval emits array<struct<item, cnt>> sorted by item — the
  * counts are the summary's LOWER BOUNDS (true count ≥ cnt, undercount
  * ≤ N/(k+1)); carrying them makes emitted summaries re-mergeable
  * (the streaming composition merges per-batch summaries by the same
  * rule). The item SET above threshold is order-invariant; the cnt
  * values themselves are merge-order dependent — consumers needing
  * determinism recount exactly (graft.ops.HeavyHitters). Nulls are
  * skipped (SQL aggregate convention).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"misra_gries: k must be positive, got $k")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k =>
        // the input UTF8String may point into a reused row buffer —
        // copy before it escapes into the summary
        buf.update(item.clone(), 1L)
      case None =>
        // decrement-all step: every counter drops one; zeros evicted
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.keysIterator.foreach { it =>
          val c = buf(it) - 1
          if (c == 0) dead += it else buf.update(it, c)
        }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (it, c) =>
      buf.update(it, buf.getOrElse(it, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-largest count from every counter; ≤ k
      // strictly-positive entries survive (ties with the pivot go to 0)
      val counts = buf.values.toArray.sortBy(-_)
      val pivot = counts(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { it =>
        val c = buf(it) - pivot
        if (c <= 0) dead += it else buf.update(it, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(buf.toArray.sortBy(_._1.toString).map {
      case (it, c) =>
        new GenericInternalRow(Array[Any](it, c)): Any
    })

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, c) =>
      val bytes = it.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"
}

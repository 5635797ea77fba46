package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a native mergeable aggregate:
  * `cms_sketch(hash, depth, width)` returns the depth×width counter
  * matrix (row-major array<bigint>) of Cormode & Muthukrishnan 2005 —
  * the point-frequency sketch the heavy-hitter summaries cannot give:
  * Misra–Gries answers "which items are frequent", KMV answers "how
  * many distinct"; CMS answers "how often does THIS key occur" for ANY
  * key, overcount-only (est ≥ true, est ≤ true + εN with ε = e/width
  * at failure probability e^−depth).
  *
  * Row hashes are pairwise-independent Lehmer mixes of the caller's
  * 64-bit hash: cell_r(h) = ((h mod P)·48271^(r+1) + r) mod P mod
  * width, P = 2^31−1 — exact integer arithmetic (the product stays
  * under 2^62), reproducible in any engine, so the EMITTED SKETCH
  * ITSELF is deterministic: counters are pure sums, commutative and
  * associative, identical under any partitioning or merge order
  * (unlike Misra–Gries, whose survivor set is order-dependent; the
  * standard — not "conservative" — update rule is what buys this).
  * Negative hashes are folded by true mod (pmod), nulls skipped.
  *
  * Why an aggregate: the exact frequency table shuffles the full key
  * cardinality; this reduces every map partition to depth·width longs
  * before the exchange — shuffle volume independent of both corpus
  * size and key cardinality, and sketches from disjoint corpora merge
  * by elementwise addition (sketch-of-union ≡ sum-of-sketches,
  * exactly — not approximately — for the counter matrix). */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16,
    s"cms_sketch: depth must be in [1, 16], got $depth")
  require(width > 1, s"cms_sketch: width must be > 1, got $width")

  import CmsSketchAgg.P

  // 48271^(r+1) mod P for r = 0..depth-1 (computed once per operator)
  @transient private lazy val rowMul: Array[Long] =
    Array.iterate(48271L, depth)(a => a * 48271L % P)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % P
      val hp = if (h < 0) h + P else h
      var r = 0
      while (r < depth) {
        buf(r * width + (((hp * rowMul(r) + r) % P) % width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"
}

object CmsSketchAgg {
  /** Hash modulus (2^31 − 1, Mersenne prime — the Lehmer classic). */
  val P: Long = 2147483647L

  /** Row multipliers for an external point query against an emitted
    * sketch: 48271^(r+1) mod P. */
  def rowMultipliers(depth: Int): Array[Long] =
    Array.iterate(48271L, depth)(a => a * 48271L % P)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native float-vector folds for the similarity tier.
  *
  * CRITICAL numeric contract: these are SEQUENTIAL LEFT FOLDS in double
  * precision starting from 0.0, in array order — the exact operation the
  * HOF forms (`aggregate(zip_with(...))`) and the DuckDB oracle
  * (`list_reduce(list_transform(...))`) perform. float→double promotion
  * is exact and IEEE addition is deterministic given order, so all three
  * implementations agree bit-for-bit. Do NOT "optimize" into vectorized
  * or pairwise summation — that changes the rounding and breaks oracle
  * hash-compare (and cross-run reproducibility on a cluster). */
object VecUtil {
  def dotFold(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def sqNormFold(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    acc
  }

  private final val M31 = 2147483647L

  /** Deterministic Rademacher (±1) entry of random hyperplane `i` at
    * dimension `d` for table `seed`: parity of a double-Lehmer mix of
    * (d+1)(2i+1)+7919·seed. Two multiplier steps are required — a single
    * product of these small operands never wraps the modulus and its
    * parity would degenerate to parity(d). */
  def radSign(i: Int, d: Int, seed: Int): Boolean = {
    var v = ((d + 1).toLong * (2 * i + 1) + 7919L * seed) % M31
    v = v * 48271L % M31
    v = v * 69621L % M31
    (v & 1L) == 1L
  }

  /** Random-hyperplane sign-LSH bucket: bit i is the sign of the
    * sequential left-fold (in dimension order — oracle-reproducible) of
    * ±emb[d] with Rademacher signs. One pass over the vector accumulates
    * all `bits` hyperplane projections. */
  def signBucketRH(emb: ArrayData, bits: Int, seed: Int): Long = {
    val n = emb.numElements()
    val acc = new Array[Double](bits)
    var d = 0
    while (d < n) {
      val x = emb.getFloat(d).toDouble
      var i = 0
      while (i < bits) {
        acc(i) += (if (radSign(i, d, seed)) x else -x)
        i += 1
      }
      d += 1
    }
    var bucket = 0L
    var i = 0
    while (i < bits) { if (acc(i) >= 0.0) bucket |= (1L << i); i += 1 }
    bucket
  }
}

/** dot_fold(array<float>, array<float>): DOUBLE — sequential left-fold
  * dot product. */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_fold requires two ARRAY<FLOAT>, got ${l.catalogString}, ${r.catalogString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VecUtil.dotFold($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_fold"
}

/** sign_bucket_rh(array<float>, bits, seed): LONG — random-hyperplane
  * sign-LSH bucket id with corpus-scalable bit count. */
case class SignBucketRH(child: Expression, bits: Int, seed: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 62, "sign_bucket_rh bits must be in [1, 62]")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket_rh requires ARRAY<FLOAT>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    VecUtil.signBucketRH(input.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.VecUtil.signBucketRH($c, $bits, $seed);")
  override protected def withNewChildInternal(newChild: Expression): SignBucketRH =
    copy(child = newChild)
  override def prettyName: String = "sign_bucket_rh"
}

/** sqnorm_fold(array<float>): DOUBLE — sequential left-fold squared L2. */
case class SqNormFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sqnorm_fold requires ARRAY<FLOAT>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    VecUtil.sqNormFold(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.VecUtil.sqNormFold($c);")
  override protected def withNewChildInternal(newChild: Expression): SqNormFold =
    copy(child = newChild)
  override def prettyName: String = "sqnorm_fold"
}

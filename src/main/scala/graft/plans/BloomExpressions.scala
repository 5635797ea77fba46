package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(key: bigint, bloom: binary-literal): BOOLEAN —
  * membership probe against a pre-built Bloom filter riding the plan as
  * a literal (the model-as-literal convention; deserialized once per
  * executor via the lazy val, probed at codegen speed).
  *
  * The j07 use: prune a corpus-sized fact scan against the SELECTIVE
  * dim side's key set BEFORE the shuffle — no false negatives means the
  * pre-filter is semantically transparent for an inner join (false
  * positives survive the filter and die in the real join), so the
  * result is exactly the plain join's while only ~|dim|·fpp of the
  * non-matching fact rows pay shuffle I/O. This is the explicit,
  * engine-portable form of Spark's InjectRuntimeFilter rewrite — built
  * deliberately where the dim side is known-bounded (the sketch's size
  * is set by expectedNumItems at build time, NOT by the corpus; a dim
  * too big to sketch belongs with the runtime-filter optimizer, not a
  * plan literal).
  *
  * Null keys → null (three-valued logic: a null key never joins, and
  * `filter` drops null predicates — same rows as the plain join). */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires BIGINT key, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  /** Codegen entry point (keeps the lazy deserialized filter on the
    * expression instance the generated class references). */
  def probe(key: Long): Boolean = bloom.mightContainLong(key)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"

  /* Case-class equality on Array[Byte] is reference-based, which makes
   * two semantically identical probes never `equals` — Catalyst
   * subexpression elimination, sameResult/exchange reuse, and plan
   * canonicalization all key on expression equality, so they'd silently
   * miss. Structural content equality restores them. */
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      child == c && java.util.Arrays.equals(bloomBytes, b)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

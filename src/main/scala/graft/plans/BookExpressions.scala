package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass native kernel for the orderbook side summary
  * ([[graft.ops.Book.summarize]]). The HOF formulation walked each side
  * array ~8x per row (depth fold, best-price transform+array_max,
  * best-size filter+transform+array_max, largest transform+array_max read
  * twice) and every walk is an interpreted lambda tree per element —
  * measured as the dominant final-stage CPU of a05/s02. This kernel
  * produces all five per-side fields in one tight loop.
  *
  * NULL SEMANTICS ARE PINNED to the exact HOF chain it replaces
  * (BookSideStatsSpec asserts equality against the live HOF expressions,
  * including null elements/fields; CodegenSuiteParitySpec covers the
  * eval/doGenCode pair on every declared query):
  *  - best_price_c = array_max/min over non-null prices of non-null
  *    elements (null if none);
  *  - best_size_c  = max non-null size among elements whose price equals
  *    best_price_c (null if none — `filter` drops null-price elements,
  *    array_max skips null sizes);
  *  - total_volume_c = fold 0L + size: ONE null element or null size
  *    makes the whole sum null (null is absorbing in `+`), empty → 0;
  *  - largest_* = struct-max of (size_c, price_c) where transform maps a
  *    null ELEMENT to struct(null, null) (a non-null struct!) and struct
  *    ordering ranks null fields smallest; null only for an empty array.
  *  - long addition wraps on overflow (order-book cent sums cannot
  *    approach Long.Max; the ANSI HOF arm would raise there instead).
  */
object BookUtil {

  val sideSchema: StructType = StructType(Seq(
    StructField("best_price_c", LongType),
    StructField("best_size_c", LongType),
    StructField("total_volume_c", LongType),
    StructField("largest_size_c", LongType),
    StructField("largest_price_c", LongType)))

  /** -1 / 0 / 1 with null smallest — Spark's struct-field ordering. */
  private def cmpN(v: Long, vNull: Boolean, w: Long, wNull: Boolean): Int =
    if (vNull && wNull) 0
    else if (vNull) -1
    else if (wNull) 1
    else java.lang.Long.compare(v, w)

  def sideStats(side: ArrayData, isBid: Boolean): InternalRow = {
    val n = side.numElements()
    var bestP = 0L; var hasBestP = false
    var bestS = 0L; var hasBestS = false
    var total = 0L; var totalNull = false
    var lS = 0L; var lSNull = true
    var lP = 0L; var lPNull = true
    var seen = false
    var i = 0
    while (i < n) {
      val elemNull = side.isNullAt(i)
      var p = 0L; var pNull = true
      var sz = 0L; var sNull = true
      if (!elemNull) {
        val row = side.getStruct(i, 2)
        if (!row.isNullAt(0)) { p = row.getLong(0); pNull = false }
        if (!row.isNullAt(1)) { sz = row.getLong(1); sNull = false }
      }
      // total: fold with absorbing null
      if (elemNull || sNull) totalNull = true
      else total += sz
      // best price + size-at-best (single pass: reset the size max when
      // a strictly better price arrives, fold into it on a tie)
      if (!pNull) {
        if (!hasBestP || (if (isBid) p > bestP else p < bestP)) {
          bestP = p; hasBestP = true
          hasBestS = !sNull; bestS = sz
        } else if (p == bestP && !sNull && (!hasBestS || sz > bestS)) {
          bestS = sz; hasBestS = true
        }
      }
      // largest: struct-max over (size, price); a null element transforms
      // to struct(null, null), which still participates
      val cSNull = elemNull || sNull
      val cPNull = elemNull || pNull
      if (!seen) { lS = sz; lSNull = cSNull; lP = p; lPNull = cPNull; seen = true }
      else {
        val c = {
          val cs = cmpN(sz, cSNull, lS, lSNull)
          if (cs != 0) cs else cmpN(p, cPNull, lP, lPNull)
        }
        if (c > 0) { lS = sz; lSNull = cSNull; lP = p; lPNull = cPNull }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      if (hasBestP) java.lang.Long.valueOf(bestP) else null,
      if (hasBestS) java.lang.Long.valueOf(bestS) else null,
      if (totalNull) null else java.lang.Long.valueOf(total),
      if (seen && !lSNull) java.lang.Long.valueOf(lS) else null,
      if (seen && !lPNull) java.lang.Long.valueOf(lP) else null))
  }
}

/** book_side_stats(side array<struct<price_c:bigint,size_c:bigint>>,
  * isBid): STRUCT<best_price_c, best_size_c, total_volume_c,
  * largest_size_c, largest_price_c> — see [[BookUtil.sideStats]]. */
case class BookSideStats(child: Expression, isBid: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = BookUtil.sideSchema
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 &&
          s(0).name == "price_c" && s(0).dataType == LongType &&
          s(1).name == "size_c" && s(1).dataType == LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "book_side_stats requires ARRAY<STRUCT<price_c:BIGINT,size_c:BIGINT>>, " +
          s"got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    BookUtil.sideStats(input.asInstanceOf[ArrayData], isBid)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BookUtil.sideStats($c, $isBid);")
  override protected def withNewChildInternal(newChild: Expression): BookSideStats =
    copy(child = newChild)
  override def prettyName: String = "book_side_stats"
}

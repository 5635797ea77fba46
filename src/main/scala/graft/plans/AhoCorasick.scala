package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton (Aho & Corasick 1975) over a fixed literal
  * pattern set, built once per operator instance and shipped to
  * executors as a plan reference object. `matchCounts` returns the
  * number of occurrences of EVERY pattern (overlapping included — one
  * count per occurrence end position, the automaton's natural
  * semantics) in a single pass over the text.
  *
  * Why this exists: the C4-style badword/blocklist gate tests a
  * document against hundreds-to-thousands of terms. P separate
  * `contains` predicates scan the text P times (and a regex
  * alternation backtracks); the automaton is O(n + matches) per
  * document REGARDLESS of pattern count — the difference between a
  * scan-speed first-funnel stage and a P-pass one at 100 TB.
  *
  * Chars are UTF-16 units; an ASCII pattern can never span a surrogate
  * pair, so counts agree with codepoint-based engines for ASCII
  * pattern sets (the oracle's). Dictionary-suffix outputs are merged at
  * build time (`out(n) ++= out(fail(n))` in BFS order), so nested
  * patterns ("he" inside "she") each count at every end position. */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "ac_match_counts: pattern set must be non-empty")
  require(patterns.forall(_.nonEmpty), "ac_match_counts: empty pattern")
  require(patterns.distinct.length == patterns.length,
    "ac_match_counts: duplicate pattern")

  private val next = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outBuf = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])

  patterns.zipWithIndex.foreach { case (p, pid) =>
    var node = 0
    p.foreach { ch =>
      node = next(node).getOrElseUpdate(ch, {
        next += mutable.HashMap.empty[Char, Int]
        outBuf += mutable.ArrayBuffer.empty[Int]
        next.length - 1
      })
    }
    outBuf(node) += pid
  }

  private val fail = new Array[Int](next.length)
  locally { // BFS fail links + dictionary-suffix output merge
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach(queue.enqueue(_)) // depth-1: fail -> root
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outBuf(u) ++= outBuf(fail(u))
      next(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(v) = next(f).get(ch).filter(_ != v).getOrElse(0)
        queue.enqueue(v)
      }
    }
  }

  private val out: Array[Array[Int]] = outBuf.map(_.toArray).toArray

  /** All-occurrence counts per pattern, one pass. */
  def matchCounts(text: UTF8String): GenericArrayData = {
    val counts = new Array[Long](patterns.length)
    val s = text.toString
    var state = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      while (state != 0 && !next(state).contains(ch)) state = fail(state)
      state = next(state).getOrElse(ch, 0)
      val hits = out(state)
      var k = 0
      while (k < hits.length) { counts(hits(k)) += 1L; k += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** ac_match_counts(str, array<string> patterns): ARRAY<BIGINT> — per-
  * pattern all-occurrence counts via a shared Aho–Corasick automaton
  * (see [[AcAutomaton]]); patterns must be a literal (the automaton is
  * built at plan time and rides the plan, the model-as-literal x72
  * convention). Null text → null. */
case class AcMatchCounts(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  @transient private lazy val auto = new AcAutomaton(patterns.toArray)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ac_match_counts requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    auto.matchCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", auto,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matchCounts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMatchCounts =
    copy(child = newChild)
  override def prettyName: String = "ac_match_counts"
}

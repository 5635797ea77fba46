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
  * Hot-path shape: the automaton is compiled to a DENSE byte-level DFA
  * (failure links folded into a 256-wide goto table per node at build
  * time), and the scan walks the UTF8String's bytes directly — one
  * array lookup per input byte, no per-row String decode, no
  * allocation. Byte-level matching over UTF-8 is exact for ANY valid
  * UTF-8 pattern (UTF-8 is uniquely decodable, so a byte-sequence match
  * IS a character-sequence match — no surrogate caveats).
  * Dictionary-suffix outputs are merged at build time (`out(n) ++=
  * out(fail(n))` in BFS order), so nested patterns ("he" inside "she")
  * each count at every end position. Memory is nodes·256·4 B — a
  * realistic multi-thousand-term blocklist compiles to a few MB; the
  * node cap below fails fast long before the table could strain an
  * executor. */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "ac_match_counts: pattern set must be non-empty")
  require(patterns.forall(_.nonEmpty), "ac_match_counts: empty pattern")
  require(patterns.distinct.length == patterns.length,
    "ac_match_counts: duplicate pattern")

  // 64 MB of goto table at the cap: the automaton rides the PLAN as a
  // reference object, so a pattern set that compiles past this belongs
  // in a broadcast-join formulation, not a plan literal — fail fast
  private val MaxNodes = 65536

  private val compiled = AcAutomaton.compile(patterns, MaxNodes)
  /** goto(node << 8 | byte) = next node; failure links pre-folded. */
  private val goto: Array[Int] = compiled._1
  /** out(node) = pattern ids ending at this node (suffix-merged). */
  private val out: Array[Array[Int]] = compiled._2

  /** All-occurrence counts per pattern, one pass over the raw bytes. */
  def matchCounts(text: UTF8String): GenericArrayData = {
    val counts = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = text.numBytes()
    while (i < n) {
      state = goto((state << 8) | (text.getByte(i) & 0xff))
      val hits = out(state)
      var k = 0
      while (k < hits.length) { counts(hits(k)) += 1L; k += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object AcAutomaton {
  /** Trie + BFS failure links + dictionary-suffix merge, then the
    * failure function folded into a dense goto table (the classic
    * DFA-ization): goto(u, b) = child if present, else goto(fail(u), b)
    * — computed in BFS order so the parent's resolution is final. */
  private def compile(patterns: Array[String],
                      maxNodes: Int): (Array[Int], Array[Array[Int]]) = {
    val next = mutable.ArrayBuffer(mutable.HashMap.empty[Int, Int])
    val outBuf = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        node = next(node).getOrElseUpdate(b & 0xff, {
          require(next.length < maxNodes,
            s"ac_match_counts: pattern set compiles past $maxNodes nodes")
          next += mutable.HashMap.empty[Int, Int]
          outBuf += mutable.ArrayBuffer.empty[Int]
          next.length - 1
        })
      }
      outBuf(node) += pid
    }
    val nNodes = next.length
    val fail = new Array[Int](nNodes)
    val goto = new Array[Int](nNodes << 8) // root row starts all-zero = root
    val queue = mutable.Queue.empty[Int]
    next(0).foreach { case (b, v) => goto(b) = v; queue.enqueue(v) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outBuf(u) ++= outBuf(fail(u))
      val base = u << 8
      var b = 0
      while (b < 256) {
        goto(base | b) = next(u).get(b) match {
          case Some(v) =>
            fail(v) = goto((fail(u) << 8) | b) // parent's row is final
            queue.enqueue(v)
            v
          case None => goto((fail(u) << 8) | b)
        }
        b += 1
      }
    }
    (goto, outBuf.map(_.toArray).toArray)
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

package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Generalized suffix automaton (Blumer et al. 1985 construction) over a
  * benchmark's TOKEN sequences, for exact longest-substring decontam —
  * the Lee et al. ("Deduplicating Training Data Makes Language Models
  * Better", 2022) exact-substring unit, at token grain. x24/x108 test
  * fixed 8-gram membership, which dilutes at paraphrase boundaries: a
  * 50-token verbatim quote and a single shared 8-gram score identically.
  * The automaton answers "what is the LONGEST contiguous token run this
  * document shares with the benchmark, anywhere" in one pass per
  * document — the statistic a contamination auditor actually ranks by.
  *
  * Construction: benchmark docs are token-id sequences concatenated with
  * a separator symbol that no corpus token can map to (it is outside the
  * dictionary), so matches never span document boundaries; the automaton
  * is the standard online SAM (≤ 2N states for N total symbols) built
  * once on the driver from the BOUNDED benchmark (the model-as-literal
  * x72/x114 convention) and shipped as a plan reference object.
  *
  * Matching (the classic LCS-via-SAM walk): maintain (state, len); on a
  * token with a transition, extend; otherwise follow suffix links until
  * one appears (len collapses to the link target's len+1) or reset at
  * the root. Out-of-vocabulary tokens reset the walk — they cannot be
  * part of any benchmark substring. O(tokens) amortized per document.
  *
  * Hot-path shape: transitions are frozen to per-state SORTED symbol
  * arrays (binary search per step — the alphabet is the benchmark
  * vocabulary, so dense rows would be V-wide); the tokenizer walks the
  * UTF8String's bytes splitting on 0x20 (inputs are pre-normalized by
  * [[graft.text.TextOps.norm]]'s whitespace collapse), and dictionary
  * lookup is one hash probe per token over UTF8String keys — no per-row
  * String decode. */
final class SamAutomaton(benchTokenSeqs: Array[Array[String]]) extends Serializable {
  require(benchTokenSeqs.nonEmpty, "sam_longest_match: empty benchmark")

  // token -> symbol id; the separator uses id = vocab.size (never mapped)
  private val dict = new java.util.HashMap[UTF8String, Integer]()
  benchTokenSeqs.foreach(_.foreach { t =>
    val k = UTF8String.fromString(t)
    if (!dict.containsKey(k)) dict.put(k, dict.size())
  })
  private val sep = dict.size()

  // ---- online SAM build over the concatenated id sequence
  private val (samLen, samLink, transSym, transNext) = {
    val total = benchTokenSeqs.map(_.length + 1).sum
    val cap = 2 * total + 5
    val len = new Array[Int](cap)
    val link = new Array[Int](cap)
    val trans = Array.fill(cap)(null: mutable.HashMap[Int, Int])
    var nStates = 1
    len(0) = 0; link(0) = -1; trans(0) = mutable.HashMap.empty
    var last = 0
    def extend(c: Int): Unit = {
      val cur = nStates; nStates += 1
      len(cur) = len(last) + 1; link(cur) = -1
      trans(cur) = mutable.HashMap.empty
      var p = last
      while (p != -1 && !trans(p).contains(c)) {
        trans(p)(c) = cur; p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p)(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = nStates; nStates += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          trans(clone) = trans(q).clone()
          while (p != -1 && trans(p).get(c).contains(q)) {
            trans(p)(c) = clone; p = link(p)
          }
          link(q) = clone; link(cur) = clone
        }
      }
      last = cur
    }
    benchTokenSeqs.foreach { seq =>
      seq.foreach(t => extend(dict.get(UTF8String.fromString(t))))
      extend(sep) // boundary: unmatchable symbol, runs never cross docs
    }
    // freeze transitions to sorted parallel arrays for binary search
    val ts = new Array[Array[Int]](nStates)
    val tn = new Array[Array[Int]](nStates)
    var s = 0
    while (s < nStates) {
      val es = trans(s).toArray.sortBy(_._1)
      ts(s) = es.map(_._1); tn(s) = es.map(_._2)
      s += 1
    }
    (len.take(nStates), link.take(nStates), ts, tn)
  }

  private def step(state: Int, c: Int): Int = {
    val sym = transSym(state)
    var lo = 0; var hi = sym.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (sym(mid) == c) return transNext(state)(mid)
      else if (sym(mid) < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Longest benchmark-matching token run in `text` (pre-normalized,
    * single-space separated), in tokens. */
  def longestMatch(text: UTF8String): Long = {
    var state = 0; var l = 0; var best = 0
    val bytes = text.getBytes // one copy per row; token slices alias it
    val n = bytes.length
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && bytes(j) != ' ') j += 1
      if (j > i) { // skip empty tokens (leading/double spaces)
        // byte-offset slice (UTF8String.substring is CHAR-indexed, and
        // i/j here are byte positions — fromBytes keeps them exact for
        // any multibyte content)
        val tok = UTF8String.fromBytes(bytes, i, j - i)
        val id = dict.get(tok)
        if (id == null) { state = 0; l = 0 }
        else {
          val c = id.intValue()
          var nxt = step(state, c)
          if (nxt >= 0) { state = nxt; l += 1 }
          else {
            var p = samLink(state)
            while (p != -1 && { nxt = step(p, c); nxt < 0 }) p = samLink(p)
            if (p == -1) { state = 0; l = 0 }
            else { l = samLen(p) + 1; state = nxt }
          }
          if (l > best) best = l
        }
      }
      i = j + 1
    }
    best.toLong
  }
}

/** sam_longest_match(str): BIGINT — longest contiguous token run shared
  * with the benchmark (see [[SamAutomaton]]); the benchmark token
  * sequences must be bounded and known at plan time. Null text → null. */
case class SamLongestMatch(child: Expression, benchTokenSeqs: Seq[Seq[String]])
  extends UnaryExpression {

  @transient private lazy val auto =
    new SamAutomaton(benchTokenSeqs.map(_.toArray).toArray)

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sam_longest_match requires STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    auto.longestMatch(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("samAutomaton", auto,
      classOf[SamAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.longestMatch($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SamLongestMatch =
    copy(child = newChild)
  override def prettyName: String = "sam_longest_match"
}

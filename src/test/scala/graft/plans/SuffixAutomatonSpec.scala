package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Generalized suffix automaton (x119): longest-shared-token-run
  * semantics, generalized multi-doc boundaries, OOV resets, the
  * expression contract, a brute-force cross-check property, and the
  * exactSubstringDecontam operator end to end. */
class SuffixAutomatonSpec extends SparkSpec {
  import spark.implicits._

  private def longest(text: String, bench: String*): Long =
    new SamAutomaton(bench.map(_.split(" ").filter(_.nonEmpty)).toArray)
      .longestMatch(UTF8String.fromString(text))

  test("longest contiguous token run, anywhere in the benchmark") {
    assert(longest("x a b c y", "q a b c d e") === 3L)
    assert(longest("a b c d e", "a b c d e") === 5L)
    assert(longest("e d c b a", "a b c d e") === 1L) // reversed: singletons only
    assert(longest("u v w", "a b c") === 0L)
    assert(longest("", "a b c") === 0L)
  }

  test("an out-of-vocabulary token resets the run (it can't be inside any benchmark substring)") {
    assert(longest("a b ZZ c d", "a b c d") === 2L)
    // after the reset the walk resumes cleanly
    assert(longest("ZZ a b c", "a b c") === 3L)
  }

  test("generalized: runs never cross benchmark-document boundaries") {
    // "c d" only exists if doc1's tail glues to doc2's head — it must not
    assert(longest("c d", "a b c", "d e f") === 1L)
    assert(longest("b c", "a b c", "d e f") === 2L)
    assert(longest("d e", "a b c", "d e f") === 2L)
  }

  test("suffix-link fallback keeps partial progress (not a full reset)") {
    // after failing to extend "a b" with "d", the suffix "b" still
    // extends: "b d" is in the benchmark
    assert(longest("a b d", "a b c", "z b d") === 2L)
  }

  test("brute-force cross-check over random small corpora") {
    val rnd = new scala.util.Random(421)
    val vocab = Array("a", "b", "c", "d", "e")
    def randSeq(n: Int): Array[String] =
      Array.fill(n)(vocab(rnd.nextInt(vocab.length)))
    def brute(doc: Array[String], bench: Seq[Array[String]]): Int = {
      val subs = bench.flatMap(b =>
        for (i <- b.indices; j <- i + 1 to b.length)
          yield b.slice(i, j).mkString(" ")).toSet
      val ls = for (i <- doc.indices; j <- i + 1 to doc.length
                    if subs.contains(doc.slice(i, j).mkString(" ")))
        yield j - i
      if (ls.isEmpty) 0 else ls.max
    }
    (1 to 60).foreach { _ =>
      val bench = Seq(randSeq(3 + rnd.nextInt(12)), randSeq(3 + rnd.nextInt(12)))
      val doc = randSeq(1 + rnd.nextInt(20))
      val sam = new SamAutomaton(bench.toArray)
      val got = sam.longestMatch(UTF8String.fromString(doc.mkString(" ")))
      val want = brute(doc, bench).toLong
      assert(got === want,
        s"doc=${doc.mkString(" ")} bench=${bench.map(_.mkString(" "))}")
    }
  }

  test("exactSubstringDecontam: planted quote flagged, clean docs pass, zero shuffles") {
    val bench = Seq((0L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "completely unrelated content with nothing shared at all"),
      (11L, "he said the quick brown fox jumps over the lazy dog and left"),
      (12L, "only the word fox appears here")
    ).toDF("doc_id", "text")
    val got = graft.dedup.Decontam
      .exactSubstringDecontam(corpus, col("doc_id"), col("text"),
        bench, col("text"), minRun = 8L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq((10L, 0L, false), (11L, 9L, true), (12L, 1L, false)))
    // the scoring plan is a pure projection over the scan — no Exchange
    val plan = graft.dedup.Decontam.exactSubstringDecontam(corpus,
      col("doc_id"), col("text"), bench, col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decontam scoring must not shuffle:\n$plan")
  }
}

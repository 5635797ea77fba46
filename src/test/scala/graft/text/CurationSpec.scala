package graft.text

import graft.SparkSpec
import graft.dedup.Decontam
import org.apache.spark.sql.functions._

/** The round-8 curation family: duplicate-n-gram fraction, Gopher
  * quality rules, hash-based split assignment, and the bloom-gated
  * decontamination sweep. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("dupNgramStats: planted verbatim span is flagged, unique text is not") {
    // docs 1 and 2 share an 8-word span verbatim; doc 3 is disjoint
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$span alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$span iota kappa lambda mu nu xi omicron pi"),
      (3L, "red orange yellow green blue indigo violet ultra infra x-ray"))
      .toDF("doc_id", "text")
    val out = TextOps.dupNgramStats(docs, col("doc_id"), col("text"), n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 16 words → 9 8-gram positions; exactly position 1 (the planted
    // span) duplicates across docs 1 and 2
    assert(out(1L) === (9L, 1L))
    assert(out(2L) === (9L, 1L))
    assert(out(3L)._2 === 0L) // 10 words, 3 positions, no dups
    // a doc shorter than n words emits no row
    val short = TextOps.dupNgramStats(
      Seq((9L, "too short")).toDF("doc_id", "text"), col("doc_id"), col("text"))
    assert(short.count() === 0L)
  }

  test("dupNgramStats: within-doc repetition also counts as duplication") {
    val doc = Seq((1L, ("spam " * 20).trim)).toDF("doc_id", "text")
    val out = TextOps.dupNgramStats(doc, col("doc_id"), col("text"), n = 8)
      .collect().head
    // every 8-gram is "spam x8" — all 13 positions duplicate each other
    assert(out.getAs[Long]("n_ngrams") === 13L)
    assert(out.getAs[Long]("dup_ngrams") === 13L)
    assert(out.getAs[Double]("dup_frac") === 1.0)
  }

  test("gopherFlags: each rule fires on its designed violation") {
    val goodText = (("the quick brown fox jumps over a lazy dog and " +
      "every word here lands inside sane bounds for mean length ") * 5).trim
    val docs = Seq(
      (1L, goodText),                          // passes everything
      (2L, "too few words to pass the count"), // words_ok = false
      (3L, ("#### " * 60).trim),               // symbols + no alpha + no stops
      (4L, (("internationalization disproportionately " * 30).trim))) // mwl > 10
      .toDF("doc_id", "text")
    val out = TextOps.gopherFlags(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Boolean]("words_ok"), r.getAs[Boolean]("mwl_ok"),
          r.getAs[Boolean]("sym_ok"), r.getAs[Boolean]("alpha_ok"),
          r.getAs[Boolean]("stops_ok"), r.getAs[Boolean]("passes"))).toMap
    assert(out(1L) === ((true, true, true, true, true, true)))
    assert(out(2L)._1 === false)
    assert(out(2L)._6 === false)
    assert(out(3L)._3 === false) // every "word" is a symbol run
    assert(out(3L)._4 === false) // no alphabetic words
    assert(out(3L)._5 === false) // no stopwords
    assert(out(4L)._2 === false) // mean word length way above 10
  }

  test("splitAssign: buckets are deterministic, exhaustive, and row-order immune") {
    val docs = (1L to 200L).map(i => (i, s"document number $i with content $i", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.splitAssign(docs, col("doc_id"), col("text"), col("lang"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet.subsetOf(Set("train", "val", "test")))
    assert(out.values.map(_._1).sum === 200L)
    // hash split should be roughly 80/10/10 — allow wide slack, the
    // point is determinism not exact proportions
    assert(out("train")._1 > 100L)
    // identical corpus in reversed row order → identical manifest
    val rev = TextOps.splitAssign(docs.orderBy(col("doc_id").desc),
        col("doc_id"), col("text"), col("lang"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rev === out)
  }

  test("cleanCorpus: contaminated docs are dropped, clean docs keep exact overlap counts") {
    val benchText = "the secret benchmark passage that must never leak into training data at all"
    val docs = Seq(
      (0L, benchText),                                      // the benchmark doc itself
      (1L, s"prefix words then $benchText and a suffix"),   // near-verbatim copy
      (2L, "completely unrelated text about weather patterns and ocean currents today"),
      (3L, "more clean text that shares nothing with the protected evaluation set"))
      .toDF("doc_id", "text")
    val out = Decontam.cleanCorpus(
      docs, col("doc_id"), col("text"),
      docs.filter(col("doc_id") === 0L), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0 and 1 carry >= 10 benchmark 20-char shingles → dropped
    assert(!out.contains(0L) && !out.contains(1L))
    assert(out.keySet === Set(2L, 3L))
    // clean docs may share a few incidental shingles, but few ("the" runs)
    assert(out.values.forall(_ < 10L))
    spark.catalog.clearCache()
  }

  test("cleanCorpus result is identical to the no-bloom exact sweep") {
    // the bloom is a pre-gate only: false positives die in the exact
    // join, so removing it must not change the output
    val docs = (1L to 50L).map(i =>
        (i, s"shared leading words for everyone then unique tail $i ${i * 31} ${i * 7}"))
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") <= 2)
    val withBloom = Decontam.cleanCorpus(docs, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // exact reference: same joins without the gate
    val sh = graft.dedup.Dedup.stagedShingles(docs, col("doc_id"), col("text"), k = 20)
    val bs = graft.dedup.Dedup.stagedShingles(bench, col("doc_id"), col("text"), k = 20)
      .select(explode(col("_sh")).as("h")).distinct()
    val overlap = sh.select(col("_id").as("doc_id"), explode(col("_sh")).as("h"))
      .join(bs, "h").groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    val exact = docs.select(col("doc_id"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .filter(col("n_overlap") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(withBloom.toSeq === exact.toSeq)
    spark.catalog.clearCache()
  }

  test("dupNgramStats invariants on sampled corpora: frac in [0,1], unique text scores 0") {
    // small-vocab random docs (duplication likely) + guaranteed-unique docs
    val gen = org.scalacheck.Gen.listOfN(30, org.scalacheck.Gen.listOfN(12,
      org.scalacheck.Gen.oneOf("a", "b", "c", "d")))
    val noisy = gen.sample.get.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val unique = (100 until 105).map(i =>
      (i.toLong, (0 until 10).map(j => s"uniq${i}w$j").mkString(" ")))
    val out = TextOps.dupNgramStats((noisy ++ unique).toDF("doc_id", "text"),
        col("doc_id"), col("text"), n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.foreach { case (id, (n, d, f)) =>
      assert(d >= 0L && d <= n, s"doc $id: dup $d outside [0, $n]")
      assert(f >= 0.0 && f <= 1.0)
      if (id >= 100L) assert(d === 0L, s"unique doc $id flagged")
    }
    // n_ngrams = words - 7 for every 12-word doc
    out.filter(_._1 < 100L).foreach { case (_, (n, _, _)) => assert(n === 5L) }
    spark.catalog.clearCache()
  }

  test("mixtureWeights: shares sum to 1, weights equalize the mixture") {
    // source a: 3 docs x 4 tokens = 12; source b: 1 doc x 4 tokens = 4
    val docs = Seq(
      (1L, "one two three four", "a"), (2L, "one two three four", "a"),
      (3L, "one two three four", "a"), (4L, "one two three four", "b"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.mixtureWeights(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("a") === ((3L, 12L, 0.75, 0.666667))) // (1/2) / (3/4), round 6
    assert(out("b") === ((1L, 4L, 0.25, 2.0)))       // (1/2) / (1/4)
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-9)
    // token-weighted mixture under the weights is uniform:
    // weight * actual_share = target share (up to the 6-decimal rounding)
    out.values.foreach(v => assert(math.abs(v._4 * v._3 - 0.5) < 1e-5))
  }

  test("curation ops run unmodified inside a streaming query (batch fn = stream fn)") {
    // gopherFlags and splitAssign's per-doc projection are stateless
    // narrow transforms — the same DataFrame => DataFrame functions the
    // batch oracle verifies run directly on an unbounded stream
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val flags = TextOps.gopherFlags(
      in.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"))
    val q = flags.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      val good = ("the quick brown fox jumps over a lazy dog and " * 6).trim
      in.addData((1L, good), (2L, "too short"))
      q.processAllAvailable()
      val out = spark.table("curation_stream")
        .select("doc_id", "passes").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out === Map(1L -> true, 2L -> false))
    } finally q.stop()
  }

  test("fuzzyOverlap: verbatim span yields one long run, scattered hits yield runs of 1") {
    val bw = (1 to 30).map(i => s"b$i") // 30 bench words → 23 8-grams
    val bench = Seq((0L, bw.mkString(" "))).toDF("doc_id", "text")
    val docs = Seq(
      (0L, bw.mkString(" ")),                        // the bench doc itself
      // 5 junk + bench[1..20] + 5 junk: matched grams start 6..18 → one
      // run of 13 out of 23 grams
      (1L, ((1 to 5).map(i => s"j$i") ++ bw.take(20) ++ (6 to 10).map(i => s"j$i")).mkString(" ")),
      // bench[1..8] + junk + bench[13..20]: two isolated matched grams
      // (positions 1 and 10), every gram between crosses the junk word
      (2L, (bw.take(8) ++ Seq("zz") ++ bw.slice(12, 20)).mkString(" ")),
      (3L, (1 to 12).map(i => s"clean$i").mkString(" ")), // no overlap
      (4L, "below eight words total here"))              // < n → no row
      .toDF("doc_id", "text")
    val out = Decontam.fuzzyOverlap(docs, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"),
        n = 8, fracThreshold = 0.5, runThreshold = 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(0L) === ((23L, 23L, 23L, true)))
    assert(out(1L) === ((23L, 13L, 13L, true)))  // 13/23 ≈ 0.565 ≥ 0.5, run 13 ≥ 10
    assert(out(2L) === ((10L, 2L, 1L, false)))   // scattered: frac 0.2, max run 1
    assert(out(3L) === ((5L, 0L, 0L, false)))
    assert(!out.contains(4L))
    spark.catalog.clearCache()
  }

  test("fuzzyOverlap: empty benchmark set marks nothing contaminated") {
    val docs = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Decontam.fuzzyOverlap(docs, col("doc_id"), col("text"),
        docs.filter(col("doc_id") < 0), col("doc_id"), col("text"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 0L && r.getLong(4) === 0L && !r.getBoolean(5))
    spark.catalog.clearCache()
  }

  test("dsirWeights: target-like docs score positive, off-target docs negative") {
    // target vocabulary {alpha..epsilon}, off-target {zulu..xray}; the
    // mixed doc shares half its words with the target
    val tgtText = "alpha beta gamma delta epsilon alpha beta gamma"
    val offText = "zulu yankee xray zulu yankee xray zulu yankee"
    val docs = Seq(
      (1L, tgtText), (2L, offText),
      (3L, "alpha beta zulu yankee alpha beta zulu yankee"))
      .toDF("doc_id", "text")
    val target = Seq((10L, tgtText), (11L, "beta gamma delta alpha beta"))
      .toDF("doc_id", "text")
    val out = TextOps.dsirWeights(docs, col("doc_id"), col("text"),
        target, col("text"), m = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getBoolean(4)))).toMap
    // 8 words → 8 unigrams + 7 bigrams
    assert(out.values.forall(_._1 === 15L))
    assert(out(1L)._3 && out(1L)._2 > 0.0, s"target-like doc not selected: $out")
    assert(!out(2L)._3 && out(2L)._2 < 0.0, s"off-target doc selected: $out")
    // the mixed doc sits strictly between the two
    assert(out(3L)._2 > out(2L)._2 && out(3L)._2 < out(1L)._2)
    spark.catalog.clearCache()
  }

  test("dsirWeights: empty target degrades to uniform p, no crash, nothing positive-selected by vocabulary") {
    val docs = Seq((1L, "some words here repeated words here"))
      .toDF("doc_id", "text")
    val out = TextOps.dsirWeights(docs, col("doc_id"), col("text"),
        docs.filter(col("doc_id") < 0), col("text"), m = 64)
      .collect()
    assert(out.length === 1) // still scores (p uniform via smoothing)
    spark.catalog.clearCache()
  }

  test("charEntropy: degenerate repetition scores 0, alternation ln2, prose above the bar") {
    val docs = Seq(
      (1L, "aaaaaaaa"),                                   // one char → H = 0
      (2L, "abababab"),                                   // two equal chars → ln 2
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, " \t "))                                       // normalizes to "" → no row
      .toDF("doc_id", "text")
    val out = TextOps.charEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((8L, 1L, 0.0, true)))
    assert(out(2L)._3 === 0.693147 && out(2L)._4) // round(ln 2, 6)
    assert(out(3L)._3 > 2.0 && !out(3L)._4)
    assert(!out.contains(4L))
    spark.catalog.clearCache()
  }

  test("trainOrder: dense permutation 1..N, row-order immune, nulls first") {
    val docs = ((1L to 200L).map(i => (i, s"document body $i ${i * 37}")) :+
      (999L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.trainOrder(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq.sorted === (1L to 201L)) // dense, no gaps/dups
    assert(out(999L) === 1L) // null hash sorts first (dedicated bucket)
    val rev = TextOps.trainOrder(docs.orderBy(col("doc_id").desc),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rev === out)
    // the permutation actually scrambles id order (hash order, not input
    // order): some doc must move far from its id rank
    assert((1L to 200L).exists(i => math.abs(out(i) - i) > 20))
  }

  test("curation invariants on sampled corpora: fuzzyOverlap bounds, entropy bounds, dsir finiteness") {
    // small-vocab random docs: overlaps and repetition are likely, so
    // the invariants are exercised on non-trivial values
    val gen = org.scalacheck.Gen.listOfN(40, org.scalacheck.Gen.listOfN(
      14, org.scalacheck.Gen.oneOf("aa", "bb", "cc", "dd", "ee")))
    val docs = gen.sample.get.zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 4)
    val fo = Decontam.fuzzyOverlap(docs, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    fo.foreach { case (id, n, hit, frac, run) =>
      assert(hit >= 0L && hit <= n, s"doc $id: n_hit $hit outside [0, $n]")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(run >= 0L && run <= hit,
        s"doc $id: max_run $run exceeds n_hit $hit") // a run IS hits
      assert(run > 0L || hit === 0L) // hits imply a run of >= 1
    }
    // bench docs are fully contaminated against themselves
    fo.filter(_._1 < 4).foreach { case (id, n, hit, _, run) =>
      assert(hit === n && run === n, s"bench doc $id not fully matched")
    }
    val ce = TextOps.charEntropy(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    ce.foreach { case (id, distinct, h) =>
      assert(h >= 0.0, s"doc $id: negative entropy $h")
      // H is maximized by the uniform distribution over distinct chars
      assert(h <= math.log(distinct.toDouble) + 1e-9,
        s"doc $id: H $h exceeds ln($distinct)")
    }
    val dw = TextOps.dsirWeights(docs, col("doc_id"), col("text"),
        bench, col("text"), m = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    dw.foreach { case (id, lw, sc) =>
      assert(!lw.isNaN && !lw.isInfinite, s"doc $id: log_w $lw")
      assert(!sc.isNaN && !sc.isInfinite, s"doc $id: dsir_score $sc")
    }
    spark.catalog.clearCache()
  }

  test("round-10 invariants on sampled corpora: c4 line rules, shard totals, cap bounds") {
    // multi-line docs with a mix of punctuated/unpunctuated short/long lines
    val lineGen = org.scalacheck.Gen.oneOf(
      "this is a proper sentence with words.",
      "short one.",
      "no terminal punctuation in this line",
      "does javascript lurk inside this line.",
      "another perfectly good line with enough words!")
    val gen = org.scalacheck.Gen.listOfN(60, org.scalacheck.Gen.listOfN(6, lineGen))
    val docs = gen.sample.get.zipWithIndex
      .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
      .toDF("doc_id", "text")
    // c4: counts bounded, and every surviving line re-passes the rules
    val c4 = TextOps.c4LineClean(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(6)))
    assert(c4.length === 60)
    c4.foreach { case (id, nl, nk, cleaned) =>
      assert(nl === 6L, s"doc $id: expected 6 lines, got $nl")
      assert(nk >= 0L && nk <= nl)
      val kept = if (cleaned.isEmpty) Array.empty[String] else cleaned.split("\n", -1)
      assert(kept.length.toLong === nk, s"doc $id: cleaned lines != n_kept")
      kept.foreach { l =>
        assert(l.trim.matches(".*[.!?\"]$") &&
          l.trim.split("\\s+").length >= 5 &&
          !l.toLowerCase.contains("javascript"),
          s"doc $id: surviving line violates a rule: '$l'")
      }
    }
    // shard manifest: totals reconcile with the corpus, shards in range
    val m = graft.silver.Export.shardManifest(docs, col("doc_id"), col("text"),
        nShards = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m.map(_._2).sum === 60L)
    assert(m.forall { case (sh, _) => sh >= 0L && sh < 16L })
    // cap: never more than k rows per stratum, ranks dense from 1
    val capped = TextOps.capPerStratum(docs, col("doc_id"),
        pmod(col("doc_id"), lit(5L)), length(col("text")).cast("long"), k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    capped.foreach { case (stratum, ranks) =>
      assert(ranks.size <= 4, s"stratum $stratum over cap: $ranks")
      assert(ranks === (1L to ranks.size.toLong), s"stratum $stratum ranks not dense: $ranks")
    }
    spark.catalog.clearCache()
  }

  test("mightContain: no false negatives; absent keys are overwhelmingly rejected") {
    val present = (1L to 1000L).toDF("h")
    val bloom = present.stat.bloomFilter("h", 1000L, 0.01)
    val bytes = { val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos); bos.toByteArray }
    val probes = (1L to 5000L).toDF("h")
      .select(col("h"), Decontam.mightContain(bytes, col("h")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 1000L).forall(probes(_))) // bloom contract: zero false negatives
    val fp = (1001L to 5000L).count(probes(_))
    assert(fp < 200) // ~1% fpp on 4000 absent keys, wide slack
  }

  test("scrubSpans: quoted benchmark passages mask in place, clean text survives verbatim") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val longer = passage + " iota kappa"                          // 10-word run
    val bench = Seq((100L, longer)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"clean head words here $passage clean tail words"),
      (2L, "completely unrelated document with enough words to gram"),
      (3L, longer),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = graft.dedup.Decontam.scrubSpans(corpus, col("doc_id"),
        col("text"), bench, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val s = "[scrubbed]"
    // the 8 quoted words mask; the 4+3 clean words survive verbatim
    assert(out(1L) === ((15L, 8L,
      s"clean head words here ${Seq.fill(8)(s).mkString(" ")} clean tail words")),
      s"got ${out(1L)}")
    assert(out(2L)._2 === 0L, "clean doc untouched")
    assert(out(2L)._3 === "completely unrelated document with enough words to gram")
    // overlapping 8-grams cover the whole 10-word run
    assert(out(3L) === ((10L, 10L, Seq.fill(10)(s).mkString(" "))))
    // below gram length: passes through
    assert(out(4L) === ((2L, 0L, "short doc")))
  }
}

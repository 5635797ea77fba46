package graft

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence probe: times the heavy LLM-tier operators on 1×,
  * 4×, and 8× corpora DERIVED from the driver testdata (word-rotated
  * copies with shifted ids — new content, same distribution, so
  * candidate volume stays proportional instead of exploding into
  * artificial duplicate clusters) and prints the runtime ratios. A
  * scale-safe plan shows t(k×)/t(1×) ≈ k (linear in corpus size, modulo
  * fixed overhead); anything superlinear is a design bug the bench at a
  * single SF cannot see. Results are recorded in PLANS.md per round. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

    /** k isomorphic copies: copy i applies a per-copy alphabet rotation
      * (a character BIJECTION via translate), so every copy has exactly
      * the original corpus's internal sharing statistics — same word
      * lengths, same cross-document shingle-collision distribution —
      * while its shingle space is fully disjoint from every other
      * copy's. This is the distribution-preserving scale-up; the two
      * rejected alternatives both skew the measurement: word-ROTATED
      * copies are near-dups of the original (measured shingle Jaccard
      * ~0.9 → quadratic pair clique), and per-word TAGGED copies add
      * aligned shared substrings that make each copy internally more
      * self-similar than the original (observed as a spurious
      * superlinear x34 ratio). */
    def docCorpus(k: Int): DataFrame = {
      val az = "abcdefghijklmnopqrstuvwxyz"
      (0 until k).map { i =>
        if (i == 0) docs
        else docs.select((col("doc_id") + i * 1000000L).as("doc_id"),
          translate(col("text"), az, az.drop(i % 25 + 1) + az.take(i % 25 + 1))
            .as("text"))
      }.reduce(_ unionAll _)
    }

    /** k dimension-rotated embedding copies: copy i cyclically shifts
      * every vector's dimensions by i — norm-preserving and
      * direction-diverse (each copy's pairwise-cosine distribution
      * matches the original corpus), so pair volume scales with content.
      * An additive common-direction perturbation instead makes all
      * copies mutually near-parallel — a corpus that IS one giant
      * near-dup cluster, whose pair set is inherently quadratic (first
      * probe version; kept as a cautionary note in PLANS.md). */
    def embCorpus(k: Int): DataFrame =
      (0 until k).map { i =>
        if (i == 0) emb
        else emb.select((col("vec_id") + i * 1000000L).as("vec_id"),
          // length sentinel, not a hardcoded dim: slice caps at the
          // array's actual size, so any embedding width rotates intact
          concat(slice(col("embedding"), i + 1, 100000),
            slice(col("embedding"), 1, i)).as("embedding"))
      }.reduce(_ unionAll _)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def run(df: DataFrame): Long = {
      val n = df.queryExecution.toRdd.count()
      spark.catalog.clearCache()
      n
    }

    val probes: Seq[(String, Int => DataFrame)] = Seq(
      "x01_exact_dedup" -> (k =>
        Dedup.exact(docCorpus(k), col("doc_id"), col("text"))),
      "x02_minhash_lsh" -> (k =>
        Dedup.minhashCandidates(docCorpus(k), col("doc_id"), col("text"))),
      "x29_dup_ngrams" -> (k =>
        TextOps.dupNgramStats(docCorpus(k), col("doc_id"), col("text"))),
      "x34_winnow_overlap" -> (k =>
        Dedup.winnowOverlapPairs(docCorpus(k), col("doc_id"), col("text"))),
      "x16_neardup_pairs" -> { k =>
        val c = embCorpus(k)
        Similarity.neardupPairs(c, c.count(), minCos = 0.999)
      },
      "x32_semantic_dedup" -> { k =>
        // corpus-scaled cells (ceil(sqrt(n))): the probe exists to show the
        // within-cell pair join stays ~linear once cells grow with the
        // corpus — the fixed nCells=8 it replaced was quadratic here
        val c = embCorpus(k)
        val n = c.count()
        Similarity.semanticDedup(c,
          nCells = Similarity.scaledCells(n), minCos = 0.999,
          knownCount = Some(n))
      },
      "x64_semdedup_banded" -> { k =>
        // the strictly-linear SemDeDup route: candidates from corpus-
        // scaled sign-LSH buckets (bits grow with n, population stays
        // ~constant) — the probe exists to show this family's slope
        // staying ~linear at the tier where x32's designed n^1.5
        // signature surfaces (t32/t8 = 8 for the cell route)
        val c = embCorpus(k)
        Similarity.semanticDedupBanded(c, c.count(), minCos = 0.999)
      },
      "x65_span_dedup" -> { k =>
        // cross-doc repeated spans: window explode is linear in tokens;
        // the dup-window agg + coverage join scale with window volume.
        // Copies are alphabet-rotated (disjoint shingle spaces), so the
        // duplicated-span mass per copy matches the original corpus's
        // natural repetition — candidate volume grows linearly
        TextOps.spanDedup(docCorpus(k), col("doc_id"), col("text"), k = 8)
      },
      "x36_boilerplate_lines" -> { k =>
        // planted header/footer on every 3rd doc (the x36 corpus shape);
        // the df count shuffles line hashes and the boilerplate set's
        // join strategy is stats-decided (AQE), so the slope should
        // track the line volume
        val c = docCorpus(k).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("nav menu home about contact\n"), col("text"),
              lit("\ncopyright footer all rights reserved")))
            .otherwise(col("text")).as("text"))
        TextOps.removeBoilerplateLines(c, col("doc_id"), col("text"))
      },
      "x37_token_budget" -> { k =>
        // budget scaled with k so the admitted set (the rows the
        // per-bucket windows actually sort) grows with the corpus —
        // a fixed budget would measure only the offset phase's slope
        TextOps.tokenBudgetSample(docCorpus(k), col("doc_id"), col("text"),
          pmod(col("doc_id"), lit(13L)), budget = 60000L * k)
      },
      "x38_fuzzy_decontam" -> { k =>
        // FIXED benchmark (the eval set doesn't grow with the corpus);
        // the corpus-side gram explode + broadcast probe is the scaling
        // surface, and only matched grams reach the per-doc window
        val c = docCorpus(k)
        graft.dedup.Decontam.fuzzyOverlap(c, col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 3), col("doc_id"), col("text"))
      },
      "x39_dsir_weights" -> { k =>
        // fixed target corpus, growing raw corpus: the q model and the
        // scoring join scale with the corpus, the p model doesn't
        TextOps.dsirWeights(docCorpus(k), col("doc_id"), col("text"),
          docs.limit(50), col("text"))
      },
      "x40_ann_ivf2" -> { k =>
        // corpus-scaled two-level sizing: both quantizer levels grow as
        // cbrt(n), so assignment + search should stay ~linear the way
        // the flat x15/x32 family does under scaledCells
        val c = embCorpus(k)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val cells = Similarity.scaledCells2(c.count())
        Similarity.ivfTopK2(c, q, 3, nCoarse = cells, nSub = cells,
          nprobeCoarse = 2, nprobeSub = 2)
      },
      "x42_char_entropy" -> (k =>
        TextOps.charEntropy(docCorpus(k), col("doc_id"), col("text"))),
      "x44_train_order" -> (k =>
        TextOps.trainOrder(docCorpus(k), col("doc_id"), col("text"))),
      "x86_epoch_order" -> (k =>
        // x44's bucketed two-phase rank over the SALTED hash domain —
        // the slope must match x44's (the salt is a per-row multiply)
        TextOps.epochOrder(docCorpus(k), col("doc_id"), col("text"), epoch = 3L)),
      "x85_recipe_apply" -> { k =>
        // the full recipe materializer: temperature budgets (13 strata,
        // one tiny agg) + the per-stratum budgeted selection. Budgets
        // scale with k so the admitted set — the rows the per-bucket
        // windows actually sort — grows with the corpus (the x37
        // discipline)
        val c = docCorpus(k)
        val budgets = TextOps.recipeBudgets(c,
          pmod(col("doc_id"), lit(13L)), col("text"),
          totalBudget = 780000L * k)
        TextOps.tokenBudgetSampleWeighted(c, col("doc_id"), col("text"),
          pmod(col("doc_id"), lit(13L)), budgets)
      },
      "x45_incremental" -> { k =>
        // FIXED batch vs growing index: the slope isolates the
        // corpus-side banding pass (the thing that must stay linear)
        val batch = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(col("text"), lit(" zz qq xx yy")).as("text"))
        Dedup.incrementalNearDup(docCorpus(k), col("doc_id"), col("text"),
          batch, col("doc_id"), col("text"))
      },
      "x41_pq_topk" -> { k =>
        // constant codebook/LUT, linear encode + code-scan: the slope is
        // the whole point (the scan ranks codes, never raw embeddings)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        Similarity.pqTopK(embCorpus(k), q, 3, dim = 64)
      },
      "x43_ivfpq_topk" -> { k =>
        // scaled cells + constant residual codebook: assignment and the
        // probed-cell code scan should both track the corpus linearly
        val c = embCorpus(k)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        Similarity.ivfPqTopK(c, q, 3, dim = 64,
          nCells = Similarity.scaledCells(c.count()), nprobe = 2)
      },
      "x61_bpe_merges" -> (k =>
        // the alphabet rotation makes every copy's words distinct, so
        // the word inventory grows ~k× — the worst case for BPE (real
        // corpora share words across shards); the slope measures the
        // one corpus pass + per-round inventory-keyed pair aggregations.
        // 4 merges keep probe wall-clock proportional to the per-round
        // cost being measured, not the round count
        TextOps.bpeMerges(docCorpus(k), col("doc_id"), col("text"), nMerges = 4)),
      "x63_bpe_encode" -> (k =>
        // x61's loop + the dictionary-encode join: the corpus-sized
        // surface is one equi-join on the word key + a doc-keyed agg,
        // so the slope over x61's should be the classic linear
        // dictionary-join increment
        TextOps.bpeEncode(docCorpus(k), col("doc_id"), col("text"), nMerges = 4)),
      "x23_cc_clusters" -> { k =>
        // the CC loop alone (x46 adds the survivor agg on top): O(log n)
        // rounds of node-keyed joins over (node, label) longs; the slope
        // must track candidate volume, with the extra 32x tier watching
        // for round-count growth bending it
        val c = docCorpus(k)
        Dedup.connectedComponents(
          Dedup.minhashCandidates(c, col("doc_id"), col("text")))
      },
      "x46_keep_best" -> { k =>
        // the CC labeling dominates (x23's probe shape); the added
        // struct-max aggregation + cluster join must not bend the slope
        val c = docCorpus(k)
        val cand = Dedup.minhashCandidates(c, col("doc_id"), col("text"))
        Dedup.keepBest(
          c.select(col("doc_id"), TextOps.wsTokenCount(col("text")).as("quality")),
          col("doc_id"), col("quality"), cand)
      },
      "x47_cell_sample" -> { k =>
        // corpus-scaled cells keep the per-cell window partitions ~sqrt(n):
        // the quota rank must track the assignment pass, not a sort bend
        val c = embCorpus(k)
        Similarity.cellBalancedSample(c, perCell = 10,
          nCells = Similarity.scaledCells(c.count()))
      },
      "x48_line_dedup" -> { k =>
        // same line volume as the x36 probe; the first-occurrence pick is
        // a hash aggregation on the line hash, so the slope should match
        val c = docCorpus(k).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("nav menu home about contact\n"), col("text"),
              lit("\ncopyright footer all rights reserved")))
            .otherwise(col("text")).as("text"))
        TextOps.dedupLinesFirstWins(c, col("doc_id"), col("text"))
      },
      "x49_c4_clean" -> { k =>
        // sentence-split corpus (the x49 oracle shape); every rule is a
        // codegen'd per-line projection and the reassembly aggregation
        // is the only shuffle, so the slope should track line volume
        val c = docCorpus(k).select(col("doc_id"),
          regexp_replace(col("text"), "\\. ", ".\n").as("text"))
        TextOps.c4LineClean(c, col("doc_id"), col("text"))
      },
      "x50_shard_manifest" -> (k =>
        // one narrow hash+count projection and a 64-row aggregation —
        // the flattest probe in the set by construction
        graft.silver.Export.shardManifest(docCorpus(k),
          col("doc_id"), col("text"))),
      "x51_domain_cap" -> (k =>
        // 13 strata regardless of k: the partial WindowGroupLimit must
        // keep per-task work flat as each stratum grows 8x
        TextOps.capPerStratum(docCorpus(k), col("doc_id"),
          pmod(col("doc_id"), lit(13L)), TextOps.wsTokenCount(col("text")),
          k = 25)),
      "x52_mmr_rerank" -> (k =>
        // the corpus-sized surface is the relevance scan + TakeOrdered;
        // the greedy runs on a bounded 32-row array whatever k is
        Similarity.mmrRerank(embCorpus(k), queryId = 0L)),
      "x53_bm25_topk" -> { k =>
        // the alphabet rotation renames words per copy, so probe with
        // rotation-invariant terms is impossible — query copy 0's terms;
        // the scaling surface (scan + explode + pre-shuffle term filter)
        // is identical either way, postings just stay copy-0-sized
        graft.text.Retrieval.bm25TopK(docCorpus(k), col("doc_id"),
          col("text"), Seq("vector", "merge", "spark"), k = 20)
      },
      "x54_temp_sample" -> (k =>
        // 13 strata; one per-source aggregation + a TakeOrdered top-n —
        // should track x50's near-flat scan slope
        TextOps.temperatureSample(docCorpus(k), col("doc_id"), col("text"),
          pmod(col("doc_id"), lit(13L)), n = 200)),
      "x56_vocab_build" -> (k =>
        // the term-keyed tf/df aggregation is the scaling surface; the
        // id window only ever sees the bounded top-V set
        TextOps.buildVocab(docCorpus(k), col("doc_id"), col("text"),
          vocabSize = 1024)),
      "x57_oov_stats" -> { k =>
        // FIXED vocab (copy 0's top terms) vs growing corpus: the
        // broadcast join + doc-keyed count must track token volume
        val vocab = TextOps.buildVocab(docs, col("doc_id"), col("text"),
          vocabSize = 1024).select("term")
        TextOps.oovStats(docCorpus(k), col("doc_id"), col("text"), vocab)
      },
      "x58_domain_filter" -> { k =>
        // planted URL tail on each doc (the x58 corpus shape): regexp
        // extraction + isin predicate + one host-keyed count — should
        // sit with x50 at the flat end of the probe set
        val c = docCorpus(k).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0, " via https://spam.example/x link")
              .when(col("doc_id") % 3 === 1, " see https://www.good.org/p here")
              .otherwise("")).as("text"))
        TextOps.domainManifest(c, col("doc_id"), col("text"),
          blocklist = Seq("spam.example"))
      },
      "x59_quality_pct" -> (k =>
        // 13 strata; the windows run over DISTINCT (stratum, quality)
        // values, not documents — the probe asserts exactly that claim:
        // quality is a token count so its distinct-value set grows far
        // slower than the corpus, and the slope must track the
        // aggregation scan, not a per-stratum document sort
        TextOps.qualityPercentiles(docCorpus(k), col("doc_id"),
          pmod(col("doc_id"), lit(13L)), TextOps.wsTokenCount(col("text")))),
      "x55_semantic_decontam" -> { k =>
        // FIXED benchmark vs growing corpus (the x38 shape in embedding
        // space): corpus-side bucketing is the scaling surface; bits
        // grow with n so bucket population — and the bipartite candidate
        // volume per eval vector — stays ~constant
        val c = embCorpus(k)
        val eval = emb.filter(col("vec_id") % 20 === 0)
          .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"))
        Similarity.semanticDecontam(c, eval, c.count(), minCos = 0.999)
      },
      "x71_hard_negatives" -> { k =>
        // FIXED query batch (8 vectors) vs growing corpus: the scorer is
        // a broadcast cross over the corpus scan — O(n·|q|) — and the
        // row_number filter pre-truncates each split to its local top-k
        // below the exchange, so the slope must track the corpus scan
        val c = embCorpus(k).withColumn("label",
          pmod(col("vec_id"), lit(7L)).cast("int"))
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            pmod(col("vec_id"), lit(7L)).cast("int").as("q_label"))
        Similarity.hardNegatives(c, q, k = 5)
      },
      "x75_int8_ann" -> { k =>
        // FIXED query batch vs growing corpus, the x71 shape but scored
        // with integer dots in the quantized space: quantization is a
        // per-row projection fused into the scan, so the slope must
        // track the corpus scan exactly like the fp32 brute force
        val c = embCorpus(k)
        val q = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        Similarity.int8TopK(c, q, 3)
      },
      "x76_compact_plan" -> { k =>
        // growing FILE INVENTORY (compaction planning is metadata-only —
        // the probed cost is the per-shard window prefix sum over k×
        // more files across a fixed 64-shard layout; the data the files
        // notionally hold is never touched)
        val files = docCorpus(k).select(
          pmod(col("doc_id"), lit(64L)).as("shard"), col("doc_id").as("file_id"),
          length(col("text")).cast("long").as("bytes"))
        graft.silver.Export.compactionSummary(graft.silver.Export.compactionPlan(
          files, col("shard"), col("file_id"), col("bytes"), targetBytes = 4000L))
      },
      "x90_novelty" -> (k =>
        // gram-keyed min agg + doc-keyed counts: should track the x01/
        // x29 hash-aggregation slope (the rotation keeps copies'
        // shingle spaces disjoint, so the gram inventory grows ~k×)
        TextOps.noveltyCurve(docCorpus(k), col("doc_id"), col("text"))),
      "x91_scene_cuts" -> { k =>
        // k doc-id-shifted copies are k× distinct tracks; the probe
        // watches the per-frame PNG decode + SAD pass (partition-local,
        // one row out per asset — should be embarrassingly linear)
        import org.apache.spark.sql.Encoders
        val media = docCorpus(k).select(col("doc_id"))
          .as[Long](Encoders.scalaLong)
          .mapPartitions(_.map(id => graft.multimodal.MediaRow(id, "video",
            graft.multimodal.Multimodal.sceneAsset(id, nFrames = 6,
              sceneLen = 2 + (id % 2).toInt),
            graft.multimodal.MediaMeta("mp4", 8, 6))))(
            Encoders.product[graft.multimodal.MediaRow])
        graft.multimodal.Multimodal.sceneCuts(media, threshold = 1000L).toDF()
      },
      "x89_audio_fp" -> { k =>
        // k doc-id-shifted copies are k× DISTINCT tracks (the PCM is
        // doc_id arithmetic); the probe watches the WAV encode→decode→
        // contour projection and the banded pair join slope together
        graft.multimodal.Multimodal.audioFpPairs(
          graft.multimodal.Multimodal.audioCorpus(docCorpus(k)))
      },
      "x89_contour_only" -> (k =>
        // isolation probe: the codec+contour projection WITHOUT the
        // pair join — separates javax.sound/GC slope from join slope
        graft.multimodal.Multimodal.audioEnergies(
          graft.multimodal.Multimodal.audioCorpus(docCorpus(k))).toDF()),
      "x87_image_phash" -> { k =>
        // k doc-id-shifted copies are k× DISTINCT images (the pixel
        // pattern is doc_id arithmetic), so planted-pair volume grows
        // linearly while the band-bucket population stays bounded — the
        // probe watches the encode→decode→hash projection AND the
        // banded pair join slope together
        graft.multimodal.Multimodal.imagePHashPairs(
          graft.multimodal.Multimodal.imageCorpus(docCorpus(k)))
      },
      "x96_embedding_drift" -> { k =>
        // two broadcast-argmax assignment passes over snapshot halves +
        // cell-keyed counts; cells scale as sqrt(n) so the assignment
        // cross stays the x15 O(n^1.5) family — the probe watches that
        // the share/delta tail stays metadata-sized
        val c = embCorpus(k)
        val oldS = c.filter(col("vec_id") % 2 === 0)
        val newS = c.filter(col("vec_id") % 2 === 1)
        Similarity.embeddingDrift(oldS, newS,
          Similarity.scaledCells(oldS.count()))
      },
      "x98_prototypicality" -> { k =>
        // assignment pass + per-cell FULL rank (every vector gets a
        // rank, no WindowGroupLimit pre-truncation applies): the probe
        // watches whether the ~sqrt(n)-member cell partitions keep the
        // rank window from bending the assignment slope
        val c = embCorpus(k)
        Similarity.prototypicality(c, Similarity.scaledCells(c.count()))
      },
      "x99_curriculum" -> (k =>
        // x44's bucketed two-phase rank with (band, bucket) keys — the
        // slope must match x44/x86 (the band only widens the bounded
        // offsets frame 8x)
        TextOps.curriculumOrder(docCorpus(k), col("doc_id"), col("text"),
          least(floor(size(split(TextOps.norm(col("text")), " ")) / 25),
            lit(7L)))),
      "x101_heavy_tokens" -> { k =>
        // the MG sketch pass is the probe target: shuffle is k-summary-
        // sized per partition regardless of vocabulary growth, and the
        // exact pass scans with a <= 32-literal isin filter — the slope
        // must track the token scan, with no cardinality term
        val toks = docCorpus(k).select(
            explode(split(graft.text.TextOps.norm(col("text")), " ")).as("item"))
          .filter(col("item") =!= "")
        graft.ops.HeavyHitters.exact(toks, col("item"), k = 32)
      },
      "x102_containment" -> { k =>
        // winnow candidates + two shingle-staged verification joins: the
        // alphabet rotation keeps planted slice/host pairs per copy, so
        // candidate volume grows linearly and the verify joins must
        // track it (the x34 probe shape plus the containment joins)
        val c0 = docCorpus(k)
        val c = c0.unionAll(c0.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 50000000L).as("doc_id"),
            substring(col("text"), 100, 150).as("text")))
        Dedup.containmentVerify(
          Dedup.winnowOverlapPairs(c, col("doc_id"), col("text"))
            .select("doc_a", "doc_b"),
          c, col("doc_id"), col("text"))
      },
      "x113_gram_pca" -> (k =>
        // ONE gram_matrix pass + scan-speed projection: slope should be
        // ~linear in the corpus with the exchange a constant O(dim^2)
        Similarity.principalComponent(embCorpus(k), dim = 64)),
      "x115_all_but_top" -> (k =>
        // same shape at dim+1 (augmented Gram) + two driver iterations;
        // the driver cost is corpus-independent, so slope ~= x113's
        Similarity.allButTop(embCorpus(k), dim = 64)),
      "x114_blocklist" -> (k =>
        // one automaton pass per document + a P-row exchange: pure
        // scan slope, pattern count invisible
        TextOps.blocklistScan(docCorpus(k), col("text"),
          Seq("able", "art", "can", "low", "slow", "table", "value"))),
      "x118_idr_sample" -> { k =>
        // k doc-id-shifted copies are k× distinct tracks; NAL walk +
        // IDR-ordinal selection is partition-local, one row per asset —
        // should sit with x88/x91 at the embarrassingly-linear end
        import org.apache.spark.sql.Encoders
        val media = docCorpus(k).select(col("doc_id"))
          .as[Long](Encoders.scalaLong)
          .mapPartitions(_.map(id => graft.multimodal.MediaRow(id, "video",
            graft.multimodal.FakeCodec.avcAsset(id, (3 + id % 5).toInt,
              (1 + id % 3).toInt),
            graft.multimodal.MediaMeta("mp4", 0, 0))))(
            Encoders.product[graft.multimodal.MediaRow])
        graft.multimodal.Multimodal.idrFrameSample(media, everyK = 2).toDF()
      },
      "x119_sam_decontam" -> { k =>
        // FIXED benchmark (copy-0 docs 0-2) vs growing corpus: the
        // automaton is plan-constant and the scorer a zero-shuffle
        // projection, so the slope must track the corpus scan exactly
        graft.dedup.Decontam.exactSubstringDecontam(docCorpus(k),
          col("doc_id"), col("text"),
          docs.filter(col("doc_id") < 3), col("text"))
      },
      "x100_host_rank" -> { k =>
        // host universe grows ~k (100k hosts) and edges with the corpus:
        // 3 fixed rounds of edge-join + dst-keyed sum — the slope should
        // track edge volume, with the rank frame staying host-sized
        val c = docCorpus(k)
        val nh = lit(100L * k)
        val ed = c.select(concat(lit("h"), pmod(col("doc_id"), nh)).as("src"),
            concat(lit("h"), pmod(TextOps.fingerprint(TextOps.norm(col("text"))),
              nh)).as("dst"))
          .filter(col("src") =!= col("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val hosts = ed.select(col("src").as("host"))
          .unionAll(ed.select(col("dst").as("host"))).distinct()
        graft.text.WebGraph.hostRank(hosts, ed, iters = 3)
      })

    // optional arg: comma-separated probe-name substrings to run a subset
    val selected = args.headOption match {
      case Some(f) =>
        val pats = f.split(',').toSeq
        probes.filter { case (n, _) => pats.exists(n.contains) }
      case None => probes
    }
    // tier list is env-configurable (SPARK_GRAFT_PROBE_TIERS="1,8,32"):
    // the heavy iterative probes get an occasional 32x reading without
    // making every routine 1/4/8 sweep pay for it
    val tiers = sys.env.getOrElse("SPARK_GRAFT_PROBE_TIERS", "1,4,8")
      .split(',').map(_.trim.toInt).toSeq
    require(tiers.nonEmpty && tiers.forall(_ >= 1), s"bad tiers $tiers")
    println(f"${"probe"}%-20s " +
      tiers.map(k => f"${s"t${k}x"}%8s").mkString(" ") + "  tmax/t1")
    selected.foreach { case (name, mk) =>
      // per-probe warm-up: each probe compiles its OWN expression
      // pipeline (whole-stage codegen); warming only the first probe
      // would charge the other probes' compilation to their timed 1×
      // run and deflate their reported ratios
      run(mk(1))
      val ts = tiers.map(k => time(run(mk(k))))
      println(f"$name%-20s " + ts.map(t => f"$t%8.2f").mkString(" ") +
        f"  ${ts.last / ts.head}%5.1f")
    }
    spark.stop()
  }
}

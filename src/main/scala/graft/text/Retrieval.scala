package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical retrieval over the document corpus: BM25 scoring against a
  * fixed term query — the classic data-selection / quality-retrieval
  * primitive (pull the documents most relevant to a seed query out of a
  * crawl; rank curation candidates against a topic description). The
  * reference's text surface stops at keyword membership
  * (`producers/market_discovery.py:35-48`); BM25 is the graded version
  * of that filter a 100 TB curation pipeline actually runs.
  *
  * Scale shape: the exploded token stream is filtered to the query's
  * terms BEFORE any shuffle — the grouped postings carry only matching
  * (doc_id, term) rows, a vanishing fraction of the corpus, so the
  * expensive part stays a narrow scan. Corpus statistics (N, Σdl) are
  * one exact-integer aggregate (a single tiny row, broadcast); per-term
  * document frequencies are bounded by the query's term count — both
  * broadcasts are bounded by the QUERY, not the corpus, so the forced
  * hints are safe at any scale (contrast x36's corpus-derived set,
  * where the hint had to go). The per-document score folds term
  * contributions in term order (`array_sort` + `aggregate`), the same
  * left-fold discipline every double-summing oracle query here uses, so
  * DuckDB reproduces the doubles bit-for-bit. Final top-k is a
  * TakeOrderedAndProject on (rounded score desc, doc_id) — no global
  * sort materializes.
  */
object Retrieval {

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (Robertson–Sparck Jones,
    * the +1 keeps it positive). Documents containing none of the query
    * terms never leave the scan. Output: (doc_id, n_terms, bm25), the k
    * highest scores, ties broken by doc_id. */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(id.as("doc_id"),
        split(TextOps.norm(text), " ").as("_ws"))
      .select(col("doc_id"), size(col("_ws")).cast(LongType).as("dl"),
        col("_ws"))
    // one tiny row: exact-integer corpus stats (a double avg would sum in
    // nondeterministic partition order; Σdl as a long is exact and the
    // division happens once, identically, in both engines)
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot_dl"))
    // postings: filter to query terms pre-shuffle, then exact tf counts
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("_ws")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("tot_dl").cast(DoubleType) / col("n_docs")
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val scored = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        (idf * (col("tf") * (k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
          .as("s"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        aggregate(array_sort(collect_list(struct(col("term"), col("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")).as("_sc"))
      .select(col("doc_id"), col("n_terms"), round(col("_sc"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Attach dense 1-based ranks to an ALREADY-TRUNCATED top-k result
    * (≤ k rows by construction — TakeOrderedAndProject upstream), for
    * feeding [[rrfFuse]]. The window runs over those k rows only; the
    * explicit `pmod(id, 1)` single-partition key is the repo-wide
    * bounded-window idiom (PlanAuditSpec bans implicit global windows).
    * Order must restate the upstream truncation's order. */
  def rankOf(topk: DataFrame, id: Column, order: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(id, lit(1L))).orderBy(order: _*)
    topk.withColumn("rnk", row_number().over(w).cast(LongType))
  }

  /** x81 — reciprocal-rank fusion (Cormack et al. 2009) of two ranked
    * retrieval lists: rrf(d) = Σ_list 1/(kRrf + rank_list(d)), absent
    * lists contribute 0. The standard hybrid-retrieval merge for a
    * curation pipeline that harvests with BOTH a lexical (BM25) and a
    * dense (embedding cosine) ranker — rank-based, so the two score
    * scales never need calibrating against each other.
    *
    * Scale shape: both inputs are top-k lists (bounded by construction
    * — the corpus-sized work already happened inside each ranker), so
    * the fusion is a ≤ 2k-row full-outer join + one TakeOrderedAndProject;
    * fusion cost is independent of corpus size. The reciprocal is
    * CAST(1 AS DOUBLE)/(kRrf + rank) — the same fixed-shape IEEE
    * expression in both engines (a bare 1.0 literal is DECIMAL in
    * DuckDB and would divide in decimal arithmetic).
    * Inputs: (doc_id, rnk) each. Output: (doc_id, rnk_s, rnk_d, rrf_r),
    * top `k` by (rrf desc, doc_id); absent ranks stay null. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, kRrf: Int = 60,
              k: Int = 10): DataFrame = {
    require(kRrf > 0 && k > 0, s"need positive kRrf/k, got $kRrf/$k")
    sparse.select(col("doc_id"), col("rnk").as("rnk_s"))
      .join(dense.select(col("doc_id"), col("rnk").as("rnk_d")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rnk_s"), col("rnk_d"),
        round(coalesce(expr(s"CAST(1 AS DOUBLE) / ($kRrf + rnk_s)"), lit(0.0))
          + coalesce(expr(s"CAST(1 AS DOUBLE) / ($kRrf + rnk_d)"), lit(0.0)), 6)
          .as("rrf_r"))
      .orderBy(col("rrf_r").desc, col("doc_id"))
      .limit(k)
  }
}

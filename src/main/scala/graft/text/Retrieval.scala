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
}

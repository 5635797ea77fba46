package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for the LLM-data-pipeline tier: exact dedup,
  * MinHash+LSH near-dup, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup is one hash-aggregate on a digest of the normalized
  *     text — map-side combine reduces each partition to its distinct
  *     keys before the single shuffle; no raw text ever shuffles.
  *   - near-dup NEVER does an all-pairs join. MinHash signatures are
  *     per-row narrow work; the LSH band explode multiplies rows by the
  *     (small, constant) band count; candidate generation is an equi-join
  *     on (band_id, band_key) — i.e. a shuffle whose key cardinality
  *     grows with the corpus, so bucket sizes stay bounded and skew is
  *     governed by real duplicate clusters, exactly the rows we want
  *     co-located. Exact Jaccard runs only on candidate pairs.
  *   - SimHash pairs bucket by the fingerprint's top byte (a 256-way
  *     partition of the space) — the classic Hamming-LSH compromise:
  *     cheap recall for small Hamming radii without pairwise scans.
  */
object Dedup {

  /** Exact dedup: group by md5 of the normalized text, keep the smallest
    * id as survivor plus the duplicate count. */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(TextOps.norm(text)).as("norm_key"))
      .agg(min(id).as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count")

  private val P = 1000000007L

  /** Distinct character k-shingles of the normalized text, each reduced to
    * a polynomial rolling hash (fold acc*31+codepoint mod 1e9+7) — one
    * cheap integer fold per shingle instead of a cryptographic digest.
    * Engine-portable: any SQL engine reproduces it with ord/list folds. */
  def shingleHashes(text: Column, k: Int = 7): Column = {
    val t = TextOps.norm(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => aggregate(
        transform(sequence(lit(0), lit(k - 1)),
          j => ascii(t.substr(i + j, lit(1))).cast(LongType)),
        lit(0L), (acc, x) => (acc * 31 + x) % P)))
  }

  /** MinHash signature over shingle hashes via an affine hash family:
    * g_h(x) = (x·(2h+1) + 12345·h) mod p. Derived hashes are integer
    * arithmetic on the one shingle hash — nHashes× cheaper than salted
    * digests, same minwise-independence in practice. */
  def minhashSignature(hs: Column, nHashes: Int = 12): Column =
    array((0 until nHashes).map { h =>
      array_min(transform(hs, x => (x * (2 * h + 1) + 12345L * h) % P))
    }: _*)

  /** LSH banding: rows×bands decomposition of the signature. Emits one
    * (band_id, band_key) struct per band; docs agreeing on ANY full band
    * become candidates. */
  def lshBands(sig: Column, bands: Int = 3, rows: Int = 4): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("|", (0 until rows).map(r =>
          get(sig, lit(b * rows + r)).cast(StringType)): _*).as("band_key"))
    }: _*)

  /** Near-dup candidate pairs via banded MinHash-LSH. Input: (id, text).
    * Output: distinct (doc_a, doc_b) with doc_a < doc_b. */
  def minhashCandidates(docs: DataFrame, id: Column, text: Column,
                        k: Int = 7, nHashes: Int = 12,
                        bands: Int = 3, rows: Int = 4): DataFrame = {
    val banded = docs.select(
        id.as("doc_id"),
        explode(lshBands(minhashSignature(shingleHashes(text, k), nHashes), bands, rows))
          .as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_key"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band_id") === col("b.band_id") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact shingle-Jaccard for given candidate pairs: |A∩B| / |A∪B| from
    * integer set sizes (one double division at the end). Operates on the
    * hashed shingle sets (long arrays — cheap set ops). `pairs` must have
    * (doc_a, doc_b); `docs` provides (id, text). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, id: Column, text: Column,
                    k: Int = 7): DataFrame = {
    val sh = docs.select(id.as("_id"), shingleHashes(text, k).as("_sh"))
    pairs
      .join(sh.select(col("_id").as("doc_a"), col("_sh").as("sh_a")), "doc_a")
      .join(sh.select(col("_id").as("doc_b"), col("_sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
            (size(col("sh_a")) + size(col("sh_b"))
              - size(array_intersect(col("sh_a"), col("sh_b")))).cast(DoubleType),
          6).as("jaccard"))
  }

  /** Distinct word-bigram tokens of the normalized text (falls back to the
    * unigram list for single-word docs). get() is 0-based and OOB-safe. */
  def bigramTokens(text: Column): Column = {
    val ws = split(TextOps.norm(text), " ")
    when(size(ws) >= 2,
      array_distinct(transform(sequence(lit(1), size(ws) - 1),
        i => concat(get(ws, i - 1), lit("_"), get(ws, i)))))
      .otherwise(ws)
  }

  /** 16-bit SimHash over the token set: bit i is set when the majority of
    * tokens have the high bit of hex digit i of their md5 set. All integer
    * arithmetic — engine-portable, no float rounding. The md5 is hashed
    * ONCE per token (hoisted out of the per-bit loop — 16× fewer digests). */
  def simhash(toks: Column, bits: Int = 16): Column = {
    val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val hashed = transform(toks, tk => md5(tk))
    (0 until bits).map { i =>
      val bitSum = aggregate(hashed, lit(0),
        (acc, hx) => acc + when(substring(hx, i + 1, 1).isin(highHex: _*), 1)
          .otherwise(-1))
      when(bitSum >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: bucket on the top `bits-8` bits (Hamming-LSH
    * band), then exact Hamming ≤ maxHamming within buckets. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(id.as("doc_id"), simhash(bigramTokens(text)).as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), 8))
    val a = fp.as("a")
    val b = fp.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast(LongType)
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}

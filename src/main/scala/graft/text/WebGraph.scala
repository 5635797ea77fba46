package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph reputation for crawl curation: a deterministic integer
  * PageRank-lite over the domain link graph — the signal CommonCrawl-
  * style pipelines use to rank domains before content heuristics ever
  * run (harmonic-centrality / PageRank domain ranking; a host linked by
  * many reputable hosts is likelier to host quality documents than one
  * only it links to itself).
  *
  * Numeric discipline: every rank is a scaled INTEGER (`scale` total
  * mass split exactly), every update exact long arithmetic — per-edge
  * contribution ⌊r·w / W⌋ (w = edge weight, W = source out-weight),
  * damped update ⌊(17·Σin + 3·base) / 20⌋ (damping 0.85 = 17/20,
  * base = ⌊scale/N⌋). Long sums are order-free, so any engine replays
  * the iterations bit-identically — no IEEE accumulation anywhere.
  * Truncation loses < 1 unit per edge per round of `scale`-denominated
  * mass (pick scale ≫ edges; default 10¹²). Mass of dangling hosts
  * (no out-edges) is dropped, not redistributed — declared semantics,
  * mirrored by the oracle. Caller chooses `scale` so that
  * scale × max edge weight < 2⁶³ (at 10¹² that allows ~9·10⁶ docs per
  * edge; shrink scale for bigger corpora).
  *
  * Scale shape: the host graph is corpus-SUBLINEAR (hosts ≪ documents;
  * edges bounded by host pairs seen). Each iteration is one equi-join
  * of the edge list against the current nHosts-row rank frame (AQE
  * broadcasts the rank side) + one dst-keyed sum, map-side combinable;
  * `iters` is a small constant so the driver loop is CC-discipline
  * (count-free, bounded rounds, no per-round collect). The edge list
  * with out-weights is persist()ed — read once per iteration; CACHE
  * LIFETIME CONTRACT as on graft.dedup.Dedup (callers clearCache after
  * consuming). */
object WebGraph {

  /** @param hosts  universe frame (host: String) — includes dangling
    *               hosts so every host gets a rank
    * @param edges  (src, dst, w) weighted link counts; duplicate pairs
    *               are summed, self-link policy is the caller's (filter
    *               before passing if unwanted)
    * @param iters  fixed power-iteration count
    * @param scale  total integer rank mass
    * @return (host, rank: Long, share: Double rounded 1e-6) */
  def hostRank(hosts: DataFrame, edges: DataFrame, iters: Int = 3,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(scale > 0, s"scale must be positive, got $scale")
    val e0 = edges.groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val outw = e0.groupBy("src").agg(sum(col("w")).as("tw"))
    // both relations are re-read per iteration by ONE final execution
    // (the loop builds a single nested plan), so they must be
    // MATERIALIZED, not just lazily cached: sibling AQE stages racing a
    // cold cache recompute the full edge derivation per iteration (r20
    // profile). The host universe is persisted too — its count below
    // doubles as the eager materialization.
    val e = e0.join(outw, "src").persist()
    e.count()
    val h = hosts.persist()
    val nHosts = h.count()
    require(nHosts > 0, "host universe is empty")
    val base = scale / nHosts
    var r = h.select(col("host"), lit(base).as("r"))
    for (_ <- 1 to iters) {
      val insum = e.join(r, e("src") === r("host"))
        .select(col("dst"), expr("r * w div tw").as("_c"))
        .groupBy("dst").agg(sum(col("_c")).as("_in"))
      r = h.join(insum, h("host") === insum("dst"), "left")
        .select(col("host"),
          expr(s"(17 * coalesce(_in, 0L) + 3 * ${base}L) div 20").as("r"))
    }
    r.select(col("host"), col("r").as("rank"),
      round(col("r").cast("double") / scale, 6).as("share"))
  }
}

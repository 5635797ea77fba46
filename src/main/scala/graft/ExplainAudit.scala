package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape audit: prints the formatted physical plan for the named
  * queries (args) or a default set of scale-sensitive ones. Used to check
  * partition pruning (PartitionFilters), pushed filters, broadcast vs
  * shuffle joins, and whole-stage codegen spans. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d05_partition_prune", "a07_topk_positions", "j02_asof_join",
        "x02_minhash_lsh", "x06_cosine_topk", "p11_dim_lookup",
        "x28_bloom_decontam", "x29_dup_ngrams", "x32_semantic_dedup",
        "x34_winnow_overlap", "x36_boilerplate_lines", "x37_token_budget",
        "x38_fuzzy_decontam", "x39_dsir_weights", "x40_ann_ivf2_cosine",
        "x41_pq_topk_cosine", "x42_char_entropy", "x43_ivfpq_topk_cosine",
        "x46_keep_best", "x47_cell_sample", "x48_line_dedup",
        "x49_c4_clean", "x50_shard_manifest", "x51_domain_cap",
        "x52_mmr_rerank", "x53_bm25_topk", "x54_temp_sample",
        "x55_semantic_decontam", "x56_vocab_build", "x57_oov_stats",
        "x58_domain_filter", "x59_quality_pct", "x60_packed_export",
        "x64_semdedup_banded", "x65_span_dedup", "x66_unicode_gate",
        "x67_split_leakage", "x70_html_extract", "x71_hard_negatives",
        "x72_classifier_score", "x73_epoch_plan", "x74_embed_quantize",
        "x75_int8_ann", "x76_compact_plan", "x77_pack_stats",
        "x78_matryoshka_ann", "x79_export_diff", "x80_triplets",
        "x81_rrf_fusion", "x82_pack_offsets", "x83_ivf_int8",
        "x84_signal_agreement", "x85_recipe_apply", "x86_epoch_order")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface smoke driver: a session with GraftExtensions registered,
  * testdata tables as views, and the native functions called from SQL. */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
    println("[sqldemo] scalar: " +
      spark.sql("SELECT poly_hash('hello'), size(shingle_hashes('hello world!', 7))")
        .head().toSeq.mkString(", "))
    println("[sqldemo] vector+simhash: " +
      spark.sql(
        """SELECT dot_fold(array(1.0f, 2.0f), array(3.0f, 4.0f)),
          |       sign_bucket_rh(array(1.0f, -2.0f, 3.0f, -4.0f), 4, 0),
          |       simhash64_bands(bigram_token_hashes('alpha beta gamma'))
          |""".stripMargin).head().toSeq.mkString(", "))
    println("[sqldemo] minhash+winnow: " +
      spark.sql(
        """SELECT minhash_sig(shingle_hashes('the quick brown fox', 7), 12)[0],
          |       size(winnow_hashes('the quick brown fox jumps over it', 20, 8))
          |""".stripMargin).head().toSeq.mkString(", "))
    println("[sqldemo] lz78+entropy: " +
      spark.sql(
        """SELECT lz78_phrases('abababab'), lz78_phrases('qwertyui'),
          |       char_entropy_stats('aabb').entropy
          |""".stripMargin).head().toSeq.mkString(", "))
    println("[sqldemo] ac_match_counts (nested patterns, one pass): " +
      spark.sql(
        "SELECT ac_match_counts('ushers heard', array('he', 'she', 'hers'))"
      ).head().toSeq.mkString(", "))
    println("[sqldemo] sam_longest_match (longest shared token run vs benchmark): " +
      spark.sql(
        """SELECT sam_longest_match('he wrote quick brown fox jumps here',
          |                         array('the quick brown fox jumps over it'))
          |""".stripMargin).head().toSeq.mkString(", "))
    println("[sqldemo] aggregates (misra_gries + kmv_sketch + cms_sketch over documents): " +
      spark.sql(
        """SELECT size(misra_gries(lang, 3)), size(kmv_sketch(poly_hash(lang), 8)),
          |       size(cms_sketch(poly_hash(lang), 4, 64))
          |FROM documents""".stripMargin).head().toSeq.mkString(", "))
    println("[sqldemo] gram_matrix (2-dim triangle of sum q q^T): " +
      spark.sql(
        """SELECT gram_matrix(q, 2) FROM (
          |  SELECT array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS q
          |  UNION ALL SELECT array(CAST(-1 AS BIGINT), CAST(4 AS BIGINT)))
          |""".stripMargin).head().getSeq[Long](0).mkString(", "))
    spark.sql(
      """SELECT count(DISTINCT poly_hash(lower(trim(text)))) AS distinct_fp,
        |       count(*) AS n
        |FROM documents""".stripMargin).show()
    spark.stop()
  }
}

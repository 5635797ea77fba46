package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The SQL surface of every native expression: runtime registration via
  * GraftBridge.registerFunctions (what GraftExtensions does at session
  * build), then each function through spark.sql, cross-checked against
  * the Column API on the same inputs. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("all 8 native expressions are callable from SQL and match the Column API") {
    GraftBridge.registerFunctions(spark)
    Seq(("hello world of spark", Seq(0.5f, -0.25f, 0.125f, 1.0f)))
      .toDF("t", "v").createOrReplaceTempView("sqlfns")
    val sql = spark.sql(
      """SELECT poly_hash(t), shingle_hashes(t, 7), bigram_token_hashes(t),
        |       simhash16(bigram_token_hashes(t)),
        |       simhash64_bands(bigram_token_hashes(t)),
        |       dot_fold(v, v), sqnorm_fold(v), sign_bucket_rh(v, 4, 0)
        |FROM sqlfns""".stripMargin).head()
    val api = spark.table("sqlfns").select(
      functions.poly_hash(col("t")),
      functions.shingle_hashes(col("t"), 7),
      functions.bigram_token_hashes(col("t")),
      functions.simhash16(functions.bigram_token_hashes(col("t"))),
      functions.simhash64_bands(functions.bigram_token_hashes(col("t"))),
      functions.dot_fold(col("v"), col("v")),
      functions.sqnorm_fold(col("v")),
      functions.sign_bucket_rh(col("v"), 4, 0)).head()
    assert(sql.toSeq === api.toSeq)
    assert(sql.getLong(0) > 0L)                    // poly_hash computed
    assert(sql.getDouble(5) === sql.getDouble(6))  // dot(v,v) == sqnorm(v)
  }
}

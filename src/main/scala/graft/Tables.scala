package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst predicate pushdown /
  * column pruning applies to whatever the caller selects downstream. At
  * cluster scale these would be catalog tables partitioned by date; the
  * query functions only depend on the logical schema.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    * raw long (spark.sql.legacy.parquet.nanosAsLong, set by Verify/Bench
    * sessions); values are µs-aligned, so ns→µs is exact. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      // integer division: ns epochs (~1.7e18) exceed double's 53-bit
      // mantissa, so a double `/` would corrupt low-order microseconds
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
}

/** One verifiable operator: a Spark query plus (optionally) the ANSI SQL
  * a DuckDB oracle runs over the same parquet tables. Column names of the
  * Spark result and the oracle result must match exactly (driver sorts
  * columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def apply(name: String, doc: String)(sql: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql), doc)

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def noOracle(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None, doc)
}

package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The silver layer: typed, cleaned projections of bronze JSON rows
  * (SURVEY.md D1/D2; reference `data/polymarket_analytics/models/silver/`).
  *
  * Bronze rows are `(id, ingested_at, payload STRING)` — schema-on-read.
  * D1 recovers typed columns with `from_json` (PERMISSIVE: malformed
  * payloads null out and are filtered, replacing the reference's
  * skip-bad-message policy, `consumers/db_writer.py:66-73`).
  *
  * D2 (incremental high-watermark) is what Structured Streaming
  * checkpointing gives us natively; the batch analog filters on
  * `ingested_at > (select max(...) from target)`. The watermark subquery
  * is a 1-row aggregate — broadcast, never a shuffle of the big side.
  */
object Silver {

  /** D1: parse + typed projection. `fields` maps output name -> cast type
    * applied to the parsed struct's field of the same name. */
  def project(bronze: DataFrame, payload: Column, schema: StructType,
              fields: Seq[(String, DataType)], keep: Seq[Column]): DataFrame = {
    val parsed = bronze.withColumn("_p", from_json(payload, schema))
    parsed
      .filter(col("_p").isNotNull) // P14 non-dict guard / corrupt-record drop
      .select(keep ++ fields.map { case (n, t) => col(s"_p.$n").cast(t).as(n) }: _*)
  }

  /** W7/P14: keep-and-flag variant of [[project]] matching the reference's
    * keep-everything contract (`consumers/db_writer.py:66-73` skips the
    * insert but logs and continues; unknown events are persisted at
    * `producers/polymarket_ws_manager.py:152-162`). Malformed payloads are
    * NOT dropped: typed fields null out and the raw payload surfaces in
    * `_corrupt_record`, so a replay/repair job can target them. */
  def projectKeepCorrupt(bronze: DataFrame, payload: Column, schema: StructType,
                         fields: Seq[(String, DataType)], keep: Seq[Column]): DataFrame = {
    // PERMISSIVE from_json yields an all-null struct (not NULL) for
    // malformed input, so corruption is detected via the dedicated
    // corrupt-record column, not struct nullness.
    val withCr = schema.add(StructField("_corrupt_record", StringType))
    val parsed = bronze.withColumn("_p",
      from_json(payload, withCr,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
    parsed.select(keep ++
      fields.map { case (n, t) => col(s"_p.$n").cast(t).as(n) } :+
      col("_p._corrupt_record").as("_corrupt_record"): _*)
  }

  /** D2: batch high-watermark increment with dbt `{{ this }}` semantics
    * (`models/silver/btc_prices.sql:17-19`): keep SOURCE rows newer than
    * the TARGET table's max of `watermarkCol` minus `lagBack` (late-data
    * grace) — "rows not yet loaded", not "last N days of source". The
    * watermark aggregate is a single row; Spark broadcasts it. On first
    * load (empty target) the null watermark passes everything through.
    * `d06`'s max_by MERGE is the companion upsert half. */
  def incrementalAfter(source: DataFrame, target: DataFrame,
                       watermarkCol: Column, lagBack: String): DataFrame = {
    val mx = target.agg(max(watermarkCol).as("_hwm"))
    source.crossJoin(broadcast(mx))
      .filter(col("_hwm").isNull ||
        watermarkCol > col("_hwm") - expr(s"INTERVAL $lagBack"))
      .drop("_hwm")
  }
}

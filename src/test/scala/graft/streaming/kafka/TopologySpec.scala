package graft.streaming.kafka

import java.nio.file.Files

import graft.ops.Norms
import graft.gold.Features
import graft.schemas.EventSchemas
import graft.silver.Silver
import graft.streaming.Pipelines
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end topology test: all SEVEN reference topics flow through ONE
  * live `format("kafka")` routed-bronze query (the Spark analog of the
  * reference's 7 writer threads, `consumers/db_writer.py:121-136` +
  * `docker-compose.yml` service graph) into per-topic bronze parquet,
  * then silver typed projections, then gold features — with a second
  * producer wave landing while the query is running, so the routing,
  * checkpointing, and incremental micro-batch paths all execute
  * concurrently rather than stage by stage.
  *
  * Every stage here is individually spec-verified elsewhere; this test
  * exists to prove the COMPOSITION: discovery → ws events → resolutions
  * → positions → prices wired together produce correct gold rows.
  */
class TopologySpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val topics = Seq(
    "asset-prices", "market-updates", "polymarket-prices",
    "market-resolutions", "market-resolution-failures",
    "user-positions", "service-errors")

  private def send(topic: String, json: String): Unit =
    FakeKafkaBroker.send(topic, null, json.getBytes("UTF-8"))

  test("7-topic topology: FakeKafka → routed bronze → silver → gold, two concurrent waves") {
    FakeKafkaBroker.reset()
    val bronzeRoot = tmp("graft_topo_bronze")
    val ckpt = tmp("graft_topo_ckpt")

    // ---- wave 1: discovery, ws book summaries, first position snapshot,
    //      first prices, a service error and a resolution failure
    send("market-updates",
      """{"market_id":"m1","condition_id":"c1","question":"Will BTC close up?",
        |"yes_price":0.55,"no_price":0.45,"token_ids":["tokY","tokN"],
        |"start_time":"2024-01-01T00:00:00Z","end_time":"2024-01-02T00:00:00Z",
        |"active":true,"best_bid":0.54,"best_ask":0.56,"liquidity":"1000",
        |"volume":"5000","slug":"btc-up"}""".stripMargin.replaceAll("\n", ""))
    send("asset-prices",
      """{"symbol":"BTC-USD","price":97000.5,"timestamp":"2024-01-01T10:00:00","volume":1.5}""")
    send("asset-prices",
      """{"symbol":"ETH-USD","price":3500.25,"timestamp":"2024-01-01T10:00:00","volume":10.0}""")
    send("polymarket-prices",
      """{"type":"orderbook_summary","market_id":"m1","asset_id":"tokY",
        |"condition_id":"c1","outcome":"Yes","timestamp":"2024-01-01T10:00:01Z",
        |"best_bid_price":0.54,"best_bid_size":100.0,"best_ask_price":0.56,
        |"best_ask_size":80.0,"total_bid_volume":500.0,"total_ask_volume":400.0,
        |"largest_bid_size":60.0,"largest_bid_price":0.53,"largest_ask_size":50.0,
        |"largest_ask_price":0.57,"book_imbalance":0.1111}""".stripMargin.replaceAll("\n", ""))
    send("user-positions",
      """{"type":"position","market_id":"m1","condition_id":"c1",
        |"snapshot_time":"2024-01-01T10:00:00Z","user":"0xwhale","asset_id":"tokY",
        |"outcome":"Yes","outcome_index":0,"balance":5000000,"position_count":null}"""
        .stripMargin.replaceAll("\n", ""))
    send("service-errors",
      """{"service_name":"coinbase_producer","error_type":"ws_disconnect",
        |"error_threshold":5,"consecutive_errors":1,"timestamp":"2024-01-01T10:00:02Z"}"""
        .stripMargin.replaceAll("\n", ""))
    send("market-resolution-failures",
      """{"slug":"eth-up","reason":"api_timeout","failed_at":"2024-01-01T10:00:03Z",
        |"last_known_status":"active"}""".stripMargin.replaceAll("\n", ""))

    // one live query consumes ALL topics concurrently (single subscribe,
    // per-topic routing inside the micro-batch), exactly the production
    // wiring Pipelines.routedBronzeSink declares
    val src = Pipelines.kafkaSource(spark, topics, "earliest")
    val q = Pipelines.routedBronzeSink(src, bronzeRoot, ckpt).start()
    try {
      q.processAllAvailable()

      // ---- wave 2 lands while the query is live: second price ticks,
      //      the whale's balance jump, and the market's resolution
      send("asset-prices",
        """{"symbol":"BTC-USD","price":97500.5,"timestamp":"2024-01-01T10:01:00","volume":2.0}""")
      send("asset-prices",
        """{"symbol":"BTC-USD","price":97200.0,"timestamp":"2024-01-01T10:02:00","volume":0.7}""")
      send("user-positions",
        """{"type":"position","market_id":"m1","condition_id":"c1",
          |"snapshot_time":"2024-01-01T10:01:00Z","user":"0xwhale","asset_id":"tokY",
          |"outcome":"Yes","outcome_index":0,"balance":12000000,"position_count":null}"""
          .stripMargin.replaceAll("\n", ""))
      send("market-resolutions",
        """{"market_id":"m1","market_slug":"btc-up","winner":"Up",
          |"final_yes_price":"1.0","final_no_price":"0.0","volume":"6000",
          |"resolution_status":"resolved","resolved_at":"2024-01-02T00:05:00Z"}"""
          .stripMargin.replaceAll("\n", ""))
      q.processAllAvailable()
    } finally q.stop()

    // ---- bronze: every topic routed to its own partition directory
    val bronze = spark.read.parquet(bronzeRoot)
    val landedTopics = bronze.select("topic").distinct()
      .collect().map(_.getString(0)).toSet
    assert(landedTopics === topics.toSet)
    assert(bronze.count() === 11L)

    // ---- silver: typed projections per topic (D1), same operators the
    //      batch oracle verifies, fed by the streamed bronze
    def silverFor(topic: String, schema: StructType,
                  fields: Seq[(String, DataType)]): DataFrame =
      Silver.project(bronze.filter(col("topic") === topic), col("payload"),
        schema, fields, keep = Seq.empty)

    val prices = silverFor("asset-prices", EventSchemas.assetPrice,
      Seq("symbol" -> StringType, "price" -> DoubleType, "timestamp" -> StringType))
      .withColumn("ts", Norms.isoTs(col("timestamp")))
    val markets = silverFor("market-updates", EventSchemas.marketUpdate,
      Seq("market_id" -> StringType, "question" -> StringType, "slug" -> StringType))
    val resolutions = silverFor("market-resolutions", EventSchemas.marketResolution,
      Seq("market_id" -> StringType, "winner" -> StringType,
        "resolution_status" -> StringType))
    val positions = silverFor("user-positions", EventSchemas.position,
      Seq("user" -> StringType, "asset_id" -> StringType,
        "snapshot_time" -> StringType, "balance" -> LongType))
      .withColumn("snap_ts", Norms.isoTs(col("snapshot_time")))
    val books = silverFor("polymarket-prices", EventSchemas.orderbookSummary,
      Seq("market_id" -> StringType, "book_imbalance" -> DoubleType))

    // ---- gold 1 (D6 momentum): per-symbol price delta across the two
    //      waves — proves cross-micro-batch rows compose into one series
    val mom = Features.momentum(prices, Seq(col("symbol")), Seq(col("ts")), col("price"))
      .filter(col("symbol") === "BTC-USD").orderBy("ts")
      .select("price", "delta_c").collect()
      .map(r => (r.getDouble(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
    assert(mom.toSeq === Seq(
      (97000.5, None), (97500.5, Some(500.0)), (97200.0, Some(-300.5))))

    // ---- gold 2 (D6 whale deltas): the wave-2 balance jump crosses the
    //      $1 (=1e6 micro-USDC) threshold exactly once
    val whale = Features.whaleDeltas(positions,
        Seq(col("user"), col("asset_id")), Seq(col("snap_ts")),
        col("balance"), thresholdC = 1000000L)
      .select("user", "delta_c").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(whale.toSeq === Seq(("0xwhale", 7000000L)))

    // ---- gold 3 (J1 star join + P7 winner): resolved market enriched
    //      with its discovery row through a broadcast dim join
    val resolved = resolutions.join(broadcast(markets), "market_id")
      .filter(col("resolution_status") === "resolved")
      .select("market_id", "winner", "question").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(resolved.toSeq === Seq(("m1", "Up", "Will BTC close up?")))

    // the remaining topics landed and parse (routing dropped nothing)
    assert(books.select("book_imbalance").collect().map(_.getDouble(0)).toSeq
      === Seq(0.1111))
    assert(silverFor("service-errors", EventSchemas.serviceError,
      Seq("service_name" -> StringType)).count() === 1L)
    assert(silverFor("market-resolution-failures", EventSchemas.resolutionFailure,
      Seq("slug" -> StringType, "reason" -> StringType)).count() === 1L)
  }
}

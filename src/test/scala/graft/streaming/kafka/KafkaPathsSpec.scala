package graft.streaming.kafka

import java.nio.file.Files
import graft.SparkSpec
import graft.streaming.Pipelines
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

final case class Ticker(product_id: String, price: Double, time: Long)

/** Executes the production Kafka paths (S1/S6/S7, K1, K3, W8) end to
  * end through the FakeKafka provider: `Pipelines.kafkaSink` and
  * `Pipelines.kafkaSource` run their REAL `format("kafka")` plans —
  * resolved, planned, and executed — against an in-JVM broker honoring
  * the connector's public contract. What a live broker would add beyond
  * this is network/client behavior, not engine wiring. */
class KafkaPathsSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val tickerSchema = StructType(Seq(
    StructField("product_id", StringType),
    StructField("price", DoubleType),
    StructField("time", LongType)))

  test("K1→S7: kafkaSink → broker → kafkaSource(earliest) → parseValue round-trips an event") {
    FakeKafkaBroker.reset()
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    // produce: the reference's coinbase producer shape (one JSON object
    // per row in the kafka value), through the real kafka sink path
    val in = MemoryStream[Ticker]
    val qw = Pipelines.kafkaSink(in.toDF(), "coinbase.ticker", tmp("graft_k1_ckpt")).start()
    try {
      in.addData(Ticker("BTC-USD", 97000.5, 1700000000L),
        Ticker("ETH-USD", 3500.25, 1700000001L))
      qw.processAllAvailable()
    } finally qw.stop()
    assert(FakeKafkaBroker.endOffset("coinbase.ticker") === 2L)
    // consume: earliest offsets → parseValue against the topic schema,
    // raw payload retained (P13/W7)
    val parsed = Pipelines.parseValue(
      Pipelines.kafkaSource(spark, Seq("coinbase.ticker"), "earliest"), tickerSchema)
    val qr = parsed.select(col("topic"), col("p.product_id"), col("p.price"), col("raw"))
      .writeStream.format("memory").queryName("kafka_rt").outputMode("append").start()
    try {
      qr.processAllAvailable()
      val rows = spark.table("kafka_rt")
        .select("topic", "product_id", "price", "raw")
        .as[(String, String, Double, String)].collect().toSet
      assert(rows === Set(
        ("coinbase.ticker", "BTC-USD", 97000.5,
          """{"product_id":"BTC-USD","price":97000.5,"time":1700000000}"""),
        ("coinbase.ticker", "ETH-USD", 3500.25,
          """{"product_id":"ETH-USD","price":3500.25,"time":1700000001}""")))
    } finally qr.stop()
  }

  test("S6/W8: startingOffsets=latest skips history; earliest replays it from offset 0") {
    FakeKafkaBroker.reset()
    val s = spark
    import s.implicits._
    FakeKafkaBroker.send("polymarket.book", null, """{"n":1}""".getBytes)
    FakeKafkaBroker.send("polymarket.book", null, """{"n":2}""".getBytes)
    // latest (the reference's control-consumer mode): history invisible
    val qLatest = Pipelines.kafkaSource(spark, Seq("polymarket.book"), "latest")
      .select(col("value").cast("string").as("v"), col("offset"))
      .writeStream.format("memory").queryName("kafka_latest").outputMode("append").start()
    try {
      qLatest.processAllAvailable()
      assert(spark.table("kafka_latest").count() === 0L)
      FakeKafkaBroker.send("polymarket.book", null, """{"n":3}""".getBytes)
      qLatest.processAllAvailable()
      val got = spark.table("kafka_latest").select("v", "offset")
        .as[(String, Long)].collect().toSeq
      assert(got === Seq(("""{"n":3}""", 2L))) // only the post-start record
    } finally qLatest.stop()
    // earliest (persistence/replay mode): the full log, in offset order
    val qEarliest = Pipelines.kafkaSource(spark, Seq("polymarket.book"), "earliest")
      .select(col("value").cast("string").as("v"), col("offset"))
      .writeStream.format("memory").queryName("kafka_earliest").outputMode("append").start()
    try {
      qEarliest.processAllAvailable()
      val got = spark.table("kafka_earliest").orderBy("offset").select("v")
        .as[String].collect().toSeq
      assert(got === Seq("""{"n":1}""", """{"n":2}""", """{"n":3}"""))
    } finally qEarliest.stop()
  }

  test("K3 on Kafka ingress: one multi-topic subscribe routes to per-topic bronze partitions") {
    FakeKafkaBroker.reset()
    val s = spark
    import s.implicits._
    FakeKafkaBroker.send("coinbase.ticker", null, """{"price":"1"}""".getBytes)
    FakeKafkaBroker.send("coinbase.ticker", null, """{"price":"2"}""".getBytes)
    FakeKafkaBroker.send("polymarket.book", null, """{"bids":[]}""".getBytes)
    val root = tmp("graft_kafka_routed") + "/bronze"
    val src = Pipelines.kafkaSource(spark,
      Seq("coinbase.ticker", "polymarket.book"), "earliest")
    val q = Pipelines.routedBronzeSink(src, root, tmp("graft_kafka_routed_ckpt")).start()
    try {
      q.processAllAvailable()
      val back = spark.read.parquet(root)
      assert(back.count() === 3L)
      assert(back.filter(col("topic") === "coinbase.ticker").count() === 2L)
      assert(new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("batch_id="))
        .exists(b => new java.io.File(b, "topic=polymarket.book").isDirectory))
    } finally q.stop()
  }

  test("W8: a restarted query resumes from its checkpointed offsets (no loss, no re-read)") {
    FakeKafkaBroker.reset()
    val s = spark
    import s.implicits._
    FakeKafkaBroker.send("events.t", null, """{"n":1}""".getBytes)
    val ckpt = tmp("graft_kafka_resume_ckpt")
    val out = tmp("graft_kafka_resume_out") + "/data"
    // parquet sink via foreachBatch: recoverable, unlike the memory sink
    def startQ() = Pipelines.kafkaSource(spark, Seq("events.t"), "earliest")
      .select(col("value").cast("string").as("v"), col("offset"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out)
      }.start()
    val q1 = startQ()
    try { q1.processAllAvailable() } finally q1.stop()
    // records land while the query is down
    FakeKafkaBroker.send("events.t", null, """{"n":2}""".getBytes)
    FakeKafkaBroker.send("events.t", null, """{"n":3}""".getBytes)
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      // offset 0 exactly once (deserializeOffset restored the committed
      // position: earliest did NOT re-read), offsets 1-2 caught up
      val got = spark.read.parquet(out).select("v", "offset")
        .as[(String, Long)].collect().sortBy(_._2)
      assert(got.toSeq === Seq(("""{"n":1}""", 0L), ("""{"n":2}""", 1L),
        ("""{"n":3}""", 2L)))
    } finally q2.stop()
  }

  test("contract: missing kafka.bootstrap.servers is rejected at load time") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("kafka").option("subscribe", "t").load()
    }
    assert(e.getMessage.contains("kafka.bootstrap.servers"))
  }

  test("contract: a misspelled option name is rejected, not silently ignored") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("subscribe", "t")
        .option("startingOffset", "earliest") // missing trailing 's'
        .load()
    }
    assert(e.getMessage.contains("startingoffset"))
  }

  test("contract: an invalid startingOffsets value fails the query") {
    FakeKafkaBroker.reset()
    val q = Pipelines.kafkaSource(spark, Seq("t"), startingOffsets = "begining")
      .writeStream.format("memory").queryName("kafka_bad").outputMode("append").start()
    try {
      val e = intercept[StreamingQueryException](q.processAllAvailable())
      assert(e.getMessage.contains("startingOffsets") ||
        Option(e.getCause).exists(_.getMessage.contains("startingOffsets")))
    } finally q.stop()
  }
}

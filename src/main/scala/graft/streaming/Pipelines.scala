package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured Streaming wiring for the reference's hot path (SURVEY.md
  * §2.1 S1-S8, §2.2 K1-K4, §2.7 W1-W3/W6-W8).
  *
  * The reference runs 6 Python services through Kafka (7 topics) into
  * Postgres JSONB bronze (`consumers/db_writer.py:44-136`). Here the same
  * surface is: `readStream.format("kafka")` sources → the SAME batch
  * operator functions (every operator in graft.ops/silver/gold is a pure
  * DataFrame => DataFrame, so it runs unchanged inside a streaming query)
  * → `writeStream` sinks with checkpointing. Checkpointed Kafka offsets +
  * idempotent file sinks upgrade the reference's at-least-once/autocommit
  * contract (`db_writer.py:48-50`) to effective exactly-once.
  *
  * Tests drive these with MemoryStream (no broker needed); production
  * needs the spark-sql-kafka connector on the classpath.
  */
object Pipelines {

  /** S1/S2/S6/S7: Kafka source for one or more topics. `startingOffsets`
    * mirrors the reference's latest-vs-earliest consumer split
    * (`polymarket_ws_manager.py:10-16` latest control reads vs
    * `db_writer.py` earliest persistence reads; W8 replay = "earliest"). */
  def kafkaSource(spark: SparkSession, topics: Seq[String],
                  startingOffsets: String = "latest",
                  bootstrap: String = "localhost:9092"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()

  /** S3: periodic-poll source analog. The reference polls the Gamma REST
    * API every 15-minute window (`market_discovery.py:14-33`); in Spark
    * the poller is an edge adapter landing JSON files (or Kafka
    * messages), and the engine consumes them as an unbounded file
    * source with the declared schema — each new file is a poll result,
    * discovered per trigger. Source-side predicate pushdown (the
    * reference's `closed=false` query param) stays in the adapter;
    * engine-side filters (P3/P4) compose downstream. */
  def fileJsonSource(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** S4: point-lookup by key — the engine form of
    * `get_market_by_slug(slug)` (`market_resolution.py:65-75`): a
    * stream-static broadcast join against a periodically refreshed
    * dimension snapshot. Left join keeps events whose key is missing
    * (lookup-miss visible downstream, matching the reference's
    * None-result branch). */
  def keyedLookup(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Parse the Kafka value column against a topic schema; the raw value
    * is retained so unknown/corrupt events stay persistable (P13/W7). */
  def parseValue(raw: DataFrame, schema: StructType): DataFrame =
    raw.select(col("topic"), col("timestamp").as("kafka_ts"),
      col("value").cast("string").as("raw"),
      from_json(col("value").cast("string"), schema).as("p"))

  /** K1 value serializer — mirror of the reference's `json.dumps`
    * (`coinbase_producer.py:14-17`): the whole row as one JSON object in
    * the Kafka `value` column. Factored out of [[kafkaSink]] so the
    * projection is testable without a broker. */
  def jsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** K1: Kafka JSON producer sink. */
  def kafkaSink(df: DataFrame, topic: String, checkpoint: String,
                bootstrap: String = "localhost:9092"): DataStreamWriter[Row] =
    jsonValue(df)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K2/W7: the per-batch bronze write. Partitioning by batch id with
    * DYNAMIC partition overwrite makes a replayed micro-batch replace its
    * own partition instead of appending duplicates — this is what turns
    * the checkpointed source's at-least-once redelivery into effective
    * exactly-once on a plain file sink, upgrading the reference's
    * duplicate-on-crash contract (`db_writer.py:48-50`, README.md:107). */
  def bronzeBatchWrite(path: String, tsCol: String)(batch: DataFrame, id: Long): Unit =
    batch.withColumn("ingest_date", to_date(col(tsCol)))
      .withColumn("batch_id", lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "ingest_date")
      .parquet(path)

  /** K2: bronze writer — idempotent parquet partitioned by (batch id,
    * ingest date); the date partition is the pruning analog of the
    * reference's JSONB expression indexes (`init.sql:14-15`; D5).
    * foreachBatch so one streaming query can also fan out side outputs
    * (K4) per micro-batch. */
  def bronzeSink(df: DataFrame, path: String, checkpoint: String,
                 tsCol: String = "kafka_ts"): DataStreamWriter[Row] =
    df.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch(bronzeBatchWrite(path, tsCol) _)

  /** K3's per-batch write, batch-id-addressed like [[bronzeBatchWrite]]:
    * dynamic partition overwrite on (batch_id, topic, ingest_date) makes
    * a replayed micro-batch REPLACE its own partitions — the earlier
    * `mode("append")` form silently duplicated every routed row when the
    * engine redelivered a batch after a crash between the sink write and
    * the checkpoint commit (the exact window TopologySpec's kill-restart
    * test drives). Exposed separately so specs can replay a batch id
    * directly. */
  def routedBronzeBatchWrite(root: String)(batch: DataFrame, id: Long): Unit =
    batch.select(col("topic"), col("value").cast("string").as("payload"),
        col("timestamp").as("ingested_at"),
        to_date(col("timestamp")).as("ingest_date"))
      .withColumn("batch_id", lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "topic", "ingest_date")
      .parquet(root)

  /** K3: multi-topic router — one bronze directory per topic from a single
    * subscribe-pattern source, the analog of `db_writer.py:121-136`'s
    * 7 writer threads. Partitioning keeps per-topic scans pruned; the
    * batch_id partition level carries the W7 replay-idempotence
    * discipline (see [[routedBronzeBatchWrite]]). */
  def routedBronzeSink(raw: DataFrame, root: String, checkpoint: String): DataStreamWriter[Row] =
    raw.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch(routedBronzeBatchWrite(root) _)

  /** K4: error-event side channel (`user_positions_tracker.py:139-151`):
    * split one parsed stream into (good, errors) inside foreachBatch so
    * both writes share the micro-batch boundary. */
  def withErrorChannel(df: DataFrame, isError: Column, goodPath: String,
                       errorPath: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          b.filter(!isError).write.mode("append").parquet(goodPath)
          b.filter(isError).write.mode("append").parquet(errorPath)
        } finally { b.unpersist(); () }
      }

  /** P2/W3 streaming form: last-value-wins decimation to one row per
    * (key, bucket) with watermarked state cleanup. Same max_by shape as
    * the batch operator (EventOps.throttle) — map-side combinable. */
  def throttle(df: DataFrame, tsCol: String, watermark: String,
               bucket: String, keys: Seq[Column],
               payload: Seq[(String, Column)]): DataFrame = {
    val ordKey = struct(col(tsCol))
    val aggs = payload.map { case (n, c) => max_by(c, ordKey).as(n) }
    // group on the window() column itself — extracting .start inside the
    // groupBy severs watermark propagation and append mode rejects the agg
    df.withWatermark(tsCol, watermark)
      .groupBy(keys :+ window(col(tsCol), bucket).as("_win"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("_win.start")).drop("_win")
  }

  /** W1/W6: watermarked tumbling-window aggregation — the 15-minute
    * market window unit with late-data tolerance ≥ the observed 30-60 s
    * subgraph lag (`README.md:330-332`). */
  def windowedAgg(df: DataFrame, tsCol: String, watermark: String,
                  windowLen: String, keys: Seq[Column],
                  aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(keys :+ window(col(tsCol), windowLen).as("_win"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("_win.start")).drop("_win")

  /** W1+ streaming session windows: gap-merged per-key sessions with
    * watermark-driven close — the streaming form of w03. Session state
    * merges windows per key until the watermark passes session end. */
  def sessionAgg(df: DataFrame, tsCol: String, watermark: String,
                 gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(keys :+ session_window(col(tsCol), gap).as("_win"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("_win.start"))
      .withColumn("session_end", col("_win.end"))
      .drop("_win")

  /** Stream-stream event-time interval join: enrich each left event with
    * right-side events for the same key whose timestamp falls in
    * [left.ts − maxLag, left.ts] — e.g. a trade joined to the quotes
    * that preceded it. Both sides carry watermarks and the join
    * condition bounds event time in BOTH directions, so Spark derives a
    * state-eviction horizon for each side: buffered state is bounded by
    * watermark + maxLag, never the stream's history. The two sides must
    * use disjoint column names (pass the right key as `rightKey`).
    * `joinType` "inner" emits a left event only when a match exists;
    * "leftOuter" also emits unmatched left events with nulls — but only
    * once the watermark proves no match can still arrive, which is why
    * outer stream-stream joins REQUIRE the time bound: without it there
    * is no point at which "no match" becomes a fact. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   maxLag: String, watermark: String,
                   joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $maxLag") &&
          col(rightTs) <= col(leftTs),
        joinType)

  /** Streaming NEAR-dup candidates: the banded MinHash-LSH candidate
    * join (graft.dedup.Dedup.minhashCandidates) as a watermarked
    * stream-stream self-join — near-duplicate detection at ingestion
    * time, before documents ever land. Fingerprinting (norm → native
    * shingle hashes → native signature → band explode) is the same
    * narrow, codegen'd pipeline the batch oracle verifies; candidates
    * are an equi-join on (band_id, band_key) with a SYMMETRIC event-time
    * bound of ±`maxLag`, so Spark derives a state-eviction horizon for
    * both buffers — state is bounded by watermark + maxLag, never the
    * stream's history (same contract as [[intervalJoin]]). A pair may
    * surface once per agreeing band; collapse downstream with
    * [[dedupWithinWatermark]] on (doc_a, doc_b) or an idempotent sink.
    * Output: (doc_a, ts_a, doc_b, ts_b). */
  def streamingNearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                                 tsCol: String, watermark: String, maxLag: String,
                                 k: Int = 7, nHashes: Int = 12,
                                 bands: Int = 3, rows: Int = 4): DataFrame = {
    import graft.dedup.Dedup
    def banded(suffix: String) = docs
      .select(col(idCol).as(s"doc$suffix"), col(tsCol).as(s"ts$suffix"),
        graft.text.TextOps.norm(col(textCol)).as("_t"))
      .select(col(s"doc$suffix"), col(s"ts$suffix"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("_t"), k), nHashes).as("_sig"))
      .select(col(s"doc$suffix"), col(s"ts$suffix"),
        explode(Dedup.lshBands(col("_sig"), bands, rows)).as("b"))
      .select(col(s"doc$suffix"), col(s"ts$suffix"),
        col("b.band_id").as(s"band_id$suffix"),
        col("b.band_key").as(s"band_key$suffix"))
      .withWatermark(s"ts$suffix", watermark)
    banded("_a").join(banded("_b"),
        col("band_id_a") === col("band_id_b") &&
          col("band_key_a") === col("band_key_b") &&
          col("doc_a") < col("doc_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL $maxLag") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $maxLag"))
      .select(col("doc_a"), col("ts_a"), col("doc_b"), col("ts_b"))
  }

  /** Streaming incremental near-dup: each arriving document is banded
    * and checked against a STATIC already-ingested corpus — the
    * continuous form of the x45 appending-crawl workflow ("is this new
    * page a near-copy of anything we already hold?"), run as the crawl
    * lands instead of in nightly batches. Emits
    * (batch_id, corpus_id, jaccard) for stream docs whose exact
    * shingle-Jaccard against a banding candidate reaches `minJaccard`.
    * A pair may surface once per agreeing band (the stateless-join
    * price; same contract as [[streamingNearDupCandidates]]) —
    * collapse downstream with [[dedupWithinWatermark]] on
    * (batch_id, corpus_id) or an idempotent sink.
    *
    * Scale shape: every stream-side op is a stateless narrow
    * projection (norm → shingle hashes → minhash bands), and both
    * joins are stream-STATIC equi-joins — no streaming state at all,
    * so memory is bounded by the micro-batch, not the stream history.
    * The stream row carries its shingle array through the band explode
    * (bands× duplication of one long array, bounded per doc) so the
    * verify step needs no second pass over the stream; the corpus side
    * is banded ONCE into `corpusIndex` (call it at setup, persist the
    * result — the cache contract is the caller's, since a static plan
    * inside a streaming query re-executes per micro-batch otherwise).
    * On a real cluster the corpus index is the thing to bucket by
    * band_key so each micro-batch's probe co-locates. */
  def streamingIncrementalNearDup(batch: DataFrame, idCol: String,
                                  textCol: String, corpusIndex: DataFrame,
                                  k: Int = 7, nHashes: Int = 12,
                                  bands: Int = 3, rows: Int = 4,
                                  minJaccard: Double = 0.5): DataFrame = {
    import graft.dedup.Dedup
    val b = batch
      .select(col(idCol).as("batch_id"),
        graft.text.TextOps.norm(col(textCol)).as("_t"))
      .select(col("batch_id"), Dedup.shingleHashes(col("_t"), k).as("sh_b"))
      .select(col("batch_id"), col("sh_b"),
        explode(Dedup.lshBands(
          Dedup.minhashSignature(col("sh_b"), nHashes), bands, rows)).as("bd"))
      .select(col("batch_id"), col("sh_b"),
        col("bd.band_id"), col("bd.band_key"))
    b.join(corpusIndex, Seq("band_id", "band_key"))
      .select(col("batch_id"), col("corpus_id"),
        size(array_intersect(col("sh_b"), col("sh_a"))).cast("double").as("_i"),
        (size(col("sh_b")) + size(col("sh_a"))).cast("double").as("_s"))
      .select(col("batch_id"), col("corpus_id"),
        round(col("_i") / (col("_s") - col("_i")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** The full curation gate chain over ONE micro-batch — the streaming
    * composition of the batch-verified curation tier (x70 HTML→text
    * extraction → x66 encoding hygiene + NFC fix → x49 C4 line/page
    * rules → x36 cross-doc boilerplate strike → x30 Gopher document
    * rules → x45 incremental near-dup against the already-ingested
    * corpus). Order matters: markup extraction first (every later gate
    * must score the text a trainer would see, not tags and scripts —
    * and a mostly-markup page should die at the cheapest stage),
    * encoding hygiene next so every later hash sees canonical bytes,
    * line-grain cleaning next, near-dup last
    * so fingerprints are computed on fully cleaned text (a boilerplate
    * footer shared by every page would otherwise dominate the shingle
    * set and glue unrelated docs into near-dups). Returns the surviving
    * documents as (doc_id, text, n_tokens).
    *
    * Scale shape: every stage is the already-audited batch operator —
    * C4 and Gopher are narrow projections + one doc-keyed reassembly;
    * boilerplate runs UNCACHED (its duplicate line-hash scan is bounded
    * by the micro-batch; a per-batch persist would leak across batches
    * and clearCache would evict the caller's corpus index); the
    * near-dup probe is a stream-static equi-join on band keys, so the
    * only per-batch state anywhere is the micro-batch itself. The
    * corpus index is the caller's: band it once with
    * [[corpusNearDupIndex]], persist it, and hand it in. */
  def curateBatch(batch: DataFrame, idCol: String, textCol: String,
                  corpusIndex: DataFrame,
                  gopherMinWords: Int = 50, c4MinWords: Int = 5,
                  c4MinKeptLines: Long = 3L, boilerMinDocs: Long = 5L,
                  minJaccard: Double = 0.5,
                  htmlMinRatio: Double = 0.05): DataFrame = {
    import graft.text.TextOps
    // markup extraction first: strip script/style/tags, decode entities,
    // reject mostly-markup pages — every later gate scores extracted
    // text, and the cheapest stage kills the biggest volume
    val extracted = TextOps.htmlExtract(batch, col(idCol), col(textCol),
        htmlMinRatio)
      .filter(col("keep"))
      .select(col("doc_id"), col("extracted").as("text"))
    // encoding hygiene next: reject undecodable docs (U+FFFD / control /
    // mojibake) and hand the NFC-FIXED text to every downstream gate, so
    // line hashes and shingles never see decomposed/composed variants of
    // the same content as different bytes
    val uni = TextOps.unicodeGate(extracted, col("doc_id"), col("text"))
      .filter(col("keep"))
      .select(col("doc_id"), col("nfc_text").as("text"))
    val c4 = TextOps.c4LineClean(uni, col("doc_id"), col("text"),
        c4MinWords, c4MinKeptLines)
      .filter(col("page_pass"))
      .select(col("doc_id"), col("cleaned").as("text"))
    val boiled = TextOps.removeBoilerplateLines(c4, col("doc_id"), col("text"),
        boilerMinDocs, cache = false)
      .filter(col("cleaned") =!= "")
      .select(col("doc_id"), col("cleaned").as("text"))
    val gophered = boiled.join(
      TextOps.gopherFlags(boiled, col("doc_id"), col("text"), gopherMinWords)
        .filter(col("passes")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val dupHits = streamingIncrementalNearDup(gophered, "doc_id", "text",
        corpusIndex, minJaccard = minJaccard)
      .select(col("batch_id").as("doc_id"))
    gophered.join(dupHits, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"),
        TextOps.wsTokenCount(col("text")).as("n_tokens"))
  }

  /** The curation chain as a streaming sink: [[curateBatch]] inside
    * foreachBatch, landing batch_id-partitioned parquet with DYNAMIC
    * partition overwrite — a replayed micro-batch replaces its own
    * partition, so the curated corpus stays exactly-once under
    * redelivery (same idempotence contract as [[bronzeSink]]). */
  def curationSink(stream: DataFrame, idCol: String, textCol: String,
                   corpusIndex: DataFrame, outPath: String, checkpoint: String,
                   gopherMinWords: Int = 50, c4MinWords: Int = 5,
                   c4MinKeptLines: Long = 3L, boilerMinDocs: Long = 5L,
                   minJaccard: Double = 0.5,
                   htmlMinRatio: Double = 0.05): DataStreamWriter[Row] =
    stream.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        curateBatch(batch, idCol, textCol, corpusIndex, gopherMinWords,
            c4MinWords, c4MinKeptLines, boilerMinDocs, minJaccard,
            htmlMinRatio)
          .withColumn("batch_id", lit(id))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
      }

  /** The static side of [[streamingIncrementalNearDup]]: the corpus
    * banded once — (band_id, band_key, corpus_id, sh_a). Persist the
    * returned frame before starting the query (a static sub-plan
    * re-executes per micro-batch; the cache contract is the caller's,
    * as on graft.dedup.Dedup). */
  def corpusNearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
                         k: Int = 7, nHashes: Int = 12,
                         bands: Int = 3, rows: Int = 4): DataFrame = {
    import graft.dedup.Dedup
    corpus
      .select(col(idCol).as("corpus_id"),
        graft.text.TextOps.norm(col(textCol)).as("_t"))
      .select(col("corpus_id"), Dedup.shingleHashes(col("_t"), k).as("sh_a"))
      .select(col("corpus_id"), col("sh_a"),
        explode(Dedup.lshBands(
          Dedup.minhashSignature(col("sh_a"), nHashes), bands, rows)).as("bd"))
      .select(col("bd.band_id"), col("bd.band_key"),
        col("corpus_id"), col("sh_a"))
  }

  /** W7 streaming exact-dedup: drop redelivered events by key within the
    * watermark horizon (`dropDuplicatesWithinWatermark` — state per key
    * is evicted once the watermark passes, so memory is bounded by the
    * late-data window, not the stream's history). This is the streaming
    * member of the dedup family (batch exact dedup = Dedup.exact) and
    * the engine form of the reference's at-least-once redelivery guard
    * (SURVEY §7.2 step 5 "dropDuplicates market dedupe"). */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String], tsCol: String,
                           watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** W2: 10-second cadence trigger (`user_positions_tracker.py:12`). */
  val snapshotTrigger: Trigger = Trigger.ProcessingTime("10 seconds")

  /** S8: console debug consumer (`consumers/simple_consumer.py`). */
  def consoleSink(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").option("truncate", "false")

  /** Start helper pinning the trigger + query name. */
  def start(w: DataStreamWriter[Row], name: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    w.queryName(name).trigger(trigger).start()
}

package graft.streaming.kafka

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-SCOPE stand-in for the `kafka` data source, so the production
  * Kafka wiring in graft.streaming.Pipelines (S1/S6/S7, K1, K3, W8)
  * EXECUTES in tests instead of merely compiling. This container ships
  * no Kafka artifacts at all (`spark-sql-kafka-0-10` and the broker
  * test-kit are absent from /opt/spark/jars and the offline coursier
  * cache — see PLANS.md), so a real embedded broker is impossible; this
  * double instead implements the PUBLIC contract of the connector
  * documented in the Structured Streaming + Kafka Integration Guide:
  *
  *   - registered under shortName "kafka" (test classpath only, via
  *     META-INF/services) so `format("kafka")` resolves to it;
  *   - the fixed source schema: key/value binary, topic string,
  *     partition int, offset long, timestamp, timestampType;
  *   - option surface: `kafka.bootstrap.servers` mandatory, `subscribe`
  *     topic lists, `startingOffsets` earliest|latest, sink `topic`
  *     option or per-row `topic` column, string-or-binary `value`;
  *   - micro-batch offsets tracked per topic and checkpointable
  *     (serialized in the connector's `{"topic":{"0":off}}` shape).
  *
  * Deliberately STRICTER than the real connector in one way: options
  * outside the known surface raise instead of being silently ignored —
  * a misspelled `startingOffsets` in production wiring is exactly the
  * class of bug only a live broker would otherwise surface, and this
  * harness exists to catch it in CI.
  *
  * The "broker" is an in-JVM topic→records map (valid under local[*]
  * where executors share the driver JVM); delivery is at-least-once,
  * matching the real producer's non-transactional contract.
  */
object FakeKafkaBroker {
  final case class Rec(key: Array[Byte], value: Array[Byte], tsMs: Long)
  private val topics =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayBuffer[Rec]]()
  private def buf(topic: String): ArrayBuffer[Rec] =
    topics.computeIfAbsent(topic, _ => ArrayBuffer.empty[Rec])
  def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit = {
    val b = buf(topic)
    b.synchronized { b += Rec(key, value, System.currentTimeMillis()); () }
  }
  def endOffset(topic: String): Long = {
    val b = buf(topic); b.synchronized(b.length.toLong)
  }
  def fetch(topic: String, from: Long, until: Long): IndexedSeq[(Long, Rec)] = {
    val b = buf(topic)
    b.synchronized((from until until).map(i => i -> b(i.toInt)).toIndexedSeq)
  }
  def reset(): Unit = topics.clear()
}

private object FakeKafka {
  /** The connector's fixed read schema (public contract). */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Known non-`kafka.`-prefixed option keys (lowercase). */
  val knownKeys: Set[String] = Set(
    "subscribe", "subscribepattern", "assign",
    "startingoffsets", "endingoffsets", "failondataloss",
    "maxoffsetspertrigger", "minpartitions", "groupidprefix",
    "includeheaders", "topic", "checkpointlocation", "path", "queryname")

  def validateCommon(o: CaseInsensitiveStringMap): Unit = {
    if (!o.containsKey("kafka.bootstrap.servers"))
      throw new IllegalArgumentException(
        "Option 'kafka.bootstrap.servers' must be specified for configuring Kafka consumer")
    val unknown = o.keySet().asScala.map(_.toLowerCase)
      .filterNot(k => k.startsWith("kafka.") || knownKeys(k))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"Unknown kafka option(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
          "misspelled? (FakeKafka rejects unknown options that the real " +
          "connector would silently ignore)")
  }
}

/** Per-topic offsets, serialized in the connector's JSON shape
  * (single partition 0 per topic). */
final case class TopicOffsets(offs: Map[String, Long]) extends Offset {
  override def json(): String =
    offs.toSeq.sortBy(_._1)
      .map { case (t, o) => s""""$t":{"0":$o}""" }.mkString("{", ",", "}")
}
object TopicOffsets {
  private val Re = """"([^"]+)":\{"0":(\d+)\}""".r
  def parse(j: String): TopicOffsets =
    TopicOffsets(Re.findAllMatchIn(j).map(m => m.group(1) -> m.group(2).toLong).toMap)
}

final case class TopicSlice(topic: String, from: Long, until: Long) extends InputPartition

class FakeKafkaMicroBatchStream(topics: Seq[String], startingOffsets: String)
    extends MicroBatchStream {
  override def initialOffset(): Offset = startingOffsets match {
    case "earliest" => TopicOffsets(topics.map(_ -> 0L).toMap)
    case "latest" => latestOffset()
  }
  override def latestOffset(): Offset =
    TopicOffsets(topics.map(t => t -> FakeKafkaBroker.endOffset(t)).toMap)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicOffsets].offs
    val e = end.asInstanceOf[TopicOffsets].offs
    topics.map(t => TopicSlice(t, s.getOrElse(t, 0L), e.getOrElse(t, 0L)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = FakeKafkaReaderFactory
  override def deserializeOffset(json: String): Offset = TopicOffsets.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object FakeKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sl = p.asInstanceOf[TopicSlice]
    val rows = FakeKafkaBroker.fetch(sl.topic, sl.from, sl.until).iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (!rows.hasNext) false
        else {
          val (off, r) = rows.next()
          cur = new GenericInternalRow(Array[Any](
            r.key, r.value, UTF8String.fromString(sl.topic),
            0, off, r.tsMs * 1000L, 0))
          true
        }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

class FakeKafkaScan(topics: Seq[String], startingOffsets: String) extends Scan {
  override def readSchema(): StructType = FakeKafka.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FakeKafkaMicroBatchStream(topics, startingOffsets)
}

private case object FakeKafkaCommit extends WriterCommitMessage

class FakeKafkaWriterFactory(topicOpt: Option[String], schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val valueIdx = schema.fieldIndex("value")
    val valueIsString = schema(valueIdx).dataType == StringType
    val keyIdx = schema.fieldNames.indexOf("key")
    val topicIdx = schema.fieldNames.indexOf("topic")
    new DataWriter[InternalRow] {
      override def write(row: InternalRow): Unit = {
        val value =
          if (valueIsString) row.getUTF8String(valueIdx).getBytes
          else row.getBinary(valueIdx)
        val key =
          if (keyIdx >= 0 && !row.isNullAt(keyIdx)) row.getBinary(keyIdx) else null
        val topic = topicOpt.getOrElse(row.getUTF8String(topicIdx).toString)
        FakeKafkaBroker.send(topic, key, value)
      }
      override def commit(): WriterCommitMessage = FakeKafkaCommit
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  }
}

class FakeKafkaStreamingWrite(topicOpt: Option[String], schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FakeKafkaWriterFactory(topicOpt, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class FakeKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  // common validation at construction = surfaces synchronously at load()
  FakeKafka.validateCommon(options)

  override def name(): String = "FakeKafka"
  override def schema(): StructType = FakeKafka.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val strategies = Seq("subscribe", "subscribePattern", "assign").filter(opts.containsKey)
    if (strategies.size != 1)
      throw new IllegalArgumentException(
        "exactly one of 'subscribe', 'subscribePattern', 'assign' must be specified")
    if (!opts.containsKey("subscribe"))
      throw new IllegalArgumentException(
        s"FakeKafka implements only 'subscribe' (got '${strategies.head}')")
    val topics = opts.get("subscribe").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (topics.isEmpty)
      throw new IllegalArgumentException("'subscribe' lists no topics")
    val so = Option(opts.get("startingOffsets")).getOrElse("latest")
    if (so != "earliest" && so != "latest")
      throw new IllegalArgumentException(
        s"startingOffsets must be 'earliest' or 'latest', got '$so'")
    new ScanBuilder { override def build(): Scan = new FakeKafkaScan(topics, so) }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    if (!s.fieldNames.contains("value"))
      throw new IllegalArgumentException("required attribute 'value' not found")
    val vt = s("value").dataType
    if (vt != StringType && vt != BinaryType)
      throw new IllegalArgumentException(
        s"'value' attribute must be STRING or BINARY, got ${vt.simpleString}")
    val topicOpt = Option(options.get("topic"))
    if (topicOpt.isEmpty && !s.fieldNames.contains("topic"))
      throw new IllegalArgumentException(
        "a 'topic' option or a 'topic' attribute is required")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new FakeKafkaStreamingWrite(topicOpt, s)
      }
    }
  }
}

class FakeKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FakeKafka.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FakeKafkaTable(new CaseInsensitiveStringMap(properties))
}

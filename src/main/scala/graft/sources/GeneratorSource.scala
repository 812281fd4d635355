package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 implementation of the reference's `Generator` concept
  * (`/root/reference/maps/maps.go:8-10` — a user-defined source that
  * pushes records until done; the shipped example emits 0 until n,
  * `cmd/fizzbuzz/fizzbuzz.go:11-17`).
  *
  * Where blow runs the generator as ONE goroutine feeding a channel,
  * this source hands Spark a partitioned plan: the range [0, n) splits
  * into `partitions` independent slices, each materialized executor-
  * side by its own reader — the generator's unordered-stream semantics
  * (SURVEY.md §1.1) with cluster parallelism instead of a single
  * producer. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.GeneratorSource")
  *   .option("n", 10000).option("partitions", 8).load()  // column: val
  * }}}
  *
  * The reference's generator interface is allowed to emit FOREVER
  * (`maps/maps.go:44-47` — `Next()` until `Done()`); the batch path
  * above is only its finite projection. The true unbounded twin is
  * the MICRO_BATCH_READ capability: the same table streams through
  * Structured Streaming, emitting `rowsPerBatch` values per trigger
  * until `n` (set `n` large for an effectively infinite stream):
  *
  * {{{
  * spark.readStream.format("graft.sources.GeneratorSource")
  *   .option("n", 100000).option("rowsPerBatch", 1000).load()
  * }}}
  *
  * At 100 TB the same shape backs any synthetic/replayed source: no
  * driver materialization, O(1) planning state per partition (an
  * offset is one long), and every slice is independently retryable
  * (lineage = its bounds).
  */
class GeneratorSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeneratorSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // getTable receives the ORIGINAL user-typed keys (unlike
    // inferSchema's CaseInsensitiveStringMap) — wrap, or
    // .option("rowsperbatch", ...) silently falls back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new GeneratorTable(
      opts.getLong("n", 10000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerBatch", 1000L))
  }
}

object GeneratorSource {
  val schema: StructType = StructType(Seq(StructField("val", LongType, nullable = false)))

  /** Range [start, end) split into `partitions` independent slices. */
  private[sources] def slice(start: Long, end: Long, partitions: Int): Array[InputPartition] = {
    val span = end - start
    if (span <= 0) Array.empty
    else {
      val step = math.max(1L, (span + partitions - 1) / partitions)
      (start until end by step)
        .map(s => GeneratorPartition(s, math.min(s + step, end)): InputPartition)
        .toArray
    }
  }

  /** Shared by the batch and micro-batch paths: a reader that counts
    * through its partition's bounds. */
  private[sources] val readerFactory: PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[GeneratorPartition]
      new PartitionReader[InternalRow] {
        private var cur = p.start - 1
        override def next(): Boolean = { cur += 1; cur < p.end }
        override def get(): InternalRow = InternalRow(cur)
        override def close(): Unit = ()
      }
    }
}

private[sources] class GeneratorTable(n: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"generator(n=$n)"
  override def schema(): StructType = GeneratorSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = GeneratorSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        GeneratorSource.slice(0L, n, partitions)
      override def createReaderFactory(): PartitionReaderFactory =
        GeneratorSource.readerFactory
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GeneratorMicroBatchStream(n, partitions, rowsPerBatch)
    }
}

/** Micro-batch view of the generator: the offset is simply "values
  * emitted so far"; each trigger advances it by `rowsPerBatch`
  * (capped at n) and the batch [start, end) reuses the batch path's
  * slicing and readers. Restart-safe: offsets restored from the
  * checkpoint (deserializeOffset / commit) ratchet the internal
  * high-water mark, so a resumed query never replans already-
  * committed values. */
private[sources] class GeneratorMicroBatchStream(n: Long, partitions: Int, rowsPerBatch: Long)
    extends MicroBatchStream {
  @volatile private var planned = 0L

  private def ratchet(v: Long): Unit =
    synchronized { if (v > planned) planned = v }

  override def initialOffset(): Offset = GeneratorOffset(0L)

  override def latestOffset(): Offset = synchronized {
    planned = math.min(n, planned + rowsPerBatch)
    GeneratorOffset(planned)
  }

  override def deserializeOffset(json: String): Offset = {
    val o = GeneratorOffset(json.trim.toLong)
    ratchet(o.v)
    o
  }

  override def commit(end: Offset): Unit =
    ratchet(end.asInstanceOf[GeneratorOffset].v)

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GeneratorSource.slice(
      start.asInstanceOf[GeneratorOffset].v,
      end.asInstanceOf[GeneratorOffset].v,
      partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    GeneratorSource.readerFactory
}

private[sources] case class GeneratorOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private[sources] case class GeneratorPartition(start: Long, end: Long)
  extends InputPartition

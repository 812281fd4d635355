package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  * At 100 TB the same shape backs any synthetic/replayed source: no
  * driver materialization, O(1) planning state per partition, and
  * every slice is independently retryable (lineage = its bounds).
  */
class GeneratorSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeneratorSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GeneratorTable(
      properties.asScala.getOrElse("n", "10000").toLong,
      properties.asScala.getOrElse("partitions", "4").toInt)
}

object GeneratorSource {
  val schema: StructType = StructType(Seq(StructField("val", LongType, nullable = false)))
}

private[sources] class GeneratorTable(n: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"generator(n=$n)"
  override def schema(): StructType = GeneratorSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = GeneratorSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val step = math.max(1L, (n + partitions - 1) / partitions)
        (0L until n by step)
          .map(start => GeneratorPartition(start, math.min(start + step, n)): InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
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
}

private[sources] case class GeneratorPartition(start: Long, end: Long)
  extends InputPartition

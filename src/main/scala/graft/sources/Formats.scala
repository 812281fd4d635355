package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond parquet. The reference's only
  * ingress is an in-process generator and its only egress a println
  * side effect (`/root/reference/maps/maps.go:8-10,23-32`); a usable
  * engine needs real formats. All of these are thin, explicit wrappers
  * over the built-in DataSource V2 readers/writers — schemas are
  * always supplied for text formats (schema inference is a full extra
  * pass over the data: never acceptable at 100 TB).
  *
  * Sinks default to overwrite semantics; writers parallelize per
  * partition (no driver funneling). CSV/JSON are interchange formats —
  * at scale, land data in parquet (columnar, statistics, pushdown).
  */
object Formats {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC: the other columnar-with-statistics format — same pushdown/
    * pruning properties as parquet, relevant when interoperating with
    * Hive-era estates. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partitioned parquet sink (directory-per-value layout): the 100 TB
    * table layout — partition pruning turns predicates on the
    * partition column into directory skips before any I/O. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Training-data export: JSONL shards partitioned by a split/shard
    * column (directory per split, `shards` files per split) plus a
    * manifest DataFrame of per-split row counts — the final stage
    * that hands a cleaned corpus to a training job. JSON-lines is the
    * exchange format trainers read; partition directories let a job
    * mount ONLY its split; `repartition(shards)` bounds file count
    * (at 100 TB the files-per-split knob is what keeps the
    * object-store listing sane). The repartition is round-robin over
    * ALL columns deliberately: hashing on the split column alone
    * would funnel each split — including the ~whole-corpus train
    * split — through a single writer task. Round-robin gives every
    * task rows of every split, so the partitionBy writer emits up to
    * `shards` evenly-sized files per split regardless of split
    * skew. */
  def writeJsonlBySplit(df: DataFrame, path: String, splitCol: String,
      shards: Int): DataFrame = {
    df.repartition(shards)
      .write.mode(SaveMode.Overwrite).partitionBy(splitCol).json(path)
    df.groupBy(splitCol)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"))
      .orderBy(splitCol)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Similarity search over `embeddings` (SURVEY.md §7.1 B4):
  * brute-force cosine top-k as the exact baseline, and an IVF
  * (inverted-file) probe as the approximate scale path.
  *
  * Float discipline: embeddings are float32 at rest; both engines cast
  * to double FIRST and compute dot products as a sequential
  * left-to-right double sum (Spark `aggregate`/`zip_with` ≙ DuckDB
  * `list_inner_product`), so cosine values agree bitwise. Scores are
  * still kept OUT of the oracle-compared output — ranks (with vec_id
  * tie-breaks) are compared instead, so a last-bit divergence can
  * only matter on exact ties, which the tie-break resolves.
  */
object Similarity {

  import graft.functions.CosineSimilarity.cosine_sim

  /** Embeddings with double-cast vectors (a codegen'd Cast — floats
    * widen exactly). Cosine itself is the native graft expression
    * `cosine_sim` (tight codegen loop; see functions/CosineSimilarity),
    * which computes dot and both norms in one pass per pair. */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private val normedSql: String =
    """n AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x * x), 'sum')) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  /** q29 — brute-force cosine k-NN: top-5 neighbors for each of the
    * 20 probe vectors. The probe set broadcasts (it is always small);
    * the corpus streams through one scan — O(Q×N) flops but only one
    * pass over the data and no shuffle until the per-query top-k,
    * which TakeOrdered-style windows keep at O(Q×k) rows. */
  def q29(spark: SparkSession, sfDir: String): DataFrame = {
    val n = vecs(spark, sfDir)
    val q = n.select(col("vec_id").as("q_id"), col("v").as("qv"))
      .filter(col("q_id") < 20)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  val q29Sql: String =
    s"""WITH $normedSql,
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 20),
       |pairs AS (
       |  SELECT q_id, vec_id,
       |    list_inner_product(qv, v) / (qn * nrm) AS cos
       |  FROM q, n WHERE vec_id <> q_id
       |)
       |SELECT q_id, rank, neighbor_id FROM (
       |  SELECT q_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** q30 — IVF approximate nearest neighbor: vectors with id < 8 act
    * as deterministic coarse centroids; every vector is assigned to
    * its nearest centroid (broadcast join + argmax — one pass); a
    * query probes only its own centroid's posting list. This is the
    * 100 TB ANN shape: the corpus is partitioned by cluster id, so a
    * probe touches 1/nlist of the data instead of all of it. */
  def q30(spark: SparkSession, sfDir: String): DataFrame = {
    val n = vecs(spark, sfDir)
    val cent = n.select(col("vec_id").as("c_id"), col("v").as("qv"))
      .filter(col("c_id") < 8)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("c_id"))
    val assigned = n.join(broadcast(cent), lit(true))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rk", row_number().over(wAssign))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("c_id").as("cluster"))
    val queries = assigned
      .filter(col("vec_id") >= 8 && col("vec_id") < 28)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("cluster"))
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(queries, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine_sim(col("qv"), col("v")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cluster").cast("long").as("cluster"))
      .orderBy("q_id", "rank")
  }

  val q30Sql: String =
    s"""WITH $normedSql,
       |cent AS (SELECT vec_id AS c_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
       |assigned AS (
       |  SELECT vec_id, v, nrm, c_id AS cluster FROM (
       |    SELECT n.vec_id, n.v, n.nrm, cent.c_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(cent.qv, n.v) / (cent.qn * n.nrm) DESC,
       |                 cent.c_id) AS rk
       |    FROM n, cent) t
       |  WHERE rk = 1
       |), queries AS (
       |  SELECT vec_id AS q_id, v AS qv, nrm AS qn, cluster
       |  FROM assigned WHERE vec_id >= 8 AND vec_id < 28
       |)
       |SELECT q_id, rank, neighbor_id, cluster FROM (
       |  SELECT q.q_id, a.vec_id AS neighbor_id,
       |    CAST(a.cluster AS BIGINT) AS cluster,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_inner_product(q.qv, a.v) / (q.qn * a.nrm) DESC,
       |               a.vec_id) AS rank
       |  FROM assigned a JOIN queries q ON a.cluster = q.cluster
       |  WHERE a.vec_id <> q.q_id) t
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_knn_brute" -> q29 _,
    "q30_ann_ivf" -> q30 _)

  val oracles: Map[String, String] = Map(
    "q29_knn_brute" -> q29Sql,
    "q30_ann_ivf" -> q30Sql)
}

package graft.functions

/** The engine's single deterministic-sampling primitive: a uniform
  * hash bucket derived from the first 8 hex digits of md5(id). Used
  * by q50 (hash sampling), q53 (pipeline capstone), q65 (stratified
  * quotas), q80/q101 (split assignment + leakage audit), and q102
  * (weighted sampling) — ONE definition on each engine so the
  * "same docs survive everywhere" guarantee can't drift between
  * queries. md5 is identical on any engine/JVM/locale, unlike RNG
  * sampling (seed + partitioning dependent) — which is what makes
  * sampled pipelines reproducible across retries and re-runs at
  * 100 TB.
  */
object HashBucket {

  /** Spark SQL text: uniform bucket in [0, mod) from an id column. */
  def bucketExpr(idCol: String, mod: Long): String =
    s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % $mod"

  /** Spark SQL text: the raw 32-bit hash value in [0, 2^32). */
  def rawExpr(idCol: String): String =
    s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT)"

  /** DuckDB twin of [[bucketExpr]]. */
  def bucketSql(idCol: String, mod: Long): String =
    s"CAST(('0x' || substring(md5(CAST($idCol AS VARCHAR)), 1, 8)) AS BIGINT) % $mod"

  /** DuckDB twin of [[rawExpr]]. */
  def rawSql(idCol: String): String =
    s"CAST(('0x' || substring(md5(CAST($idCol AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** Train/val/test boundaries (80/10/10) — ONE definition so the
    * split assignment (q80) and the leakage audit over that split
    * (q101) can never audit different splits. */
  private val TrainBelow = 80
  private val ValBelow = 90

  /** Spark SQL text: the deterministic split label for an id. */
  def splitExpr(idCol: String): String =
    s"CASE WHEN ${bucketExpr(idCol, 100)} < $TrainBelow THEN 'train' " +
      s"WHEN ${bucketExpr(idCol, 100)} < $ValBelow THEN 'val' ELSE 'test' END"

  /** DuckDB twin of [[splitExpr]]. */
  def splitSql(idCol: String): String =
    s"CASE WHEN ${bucketSql(idCol, 100)} < $TrainBelow THEN 'train' " +
      s"WHEN ${bucketSql(idCol, 100)} < $ValBelow THEN 'val' ELSE 'test' END"
}

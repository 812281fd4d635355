package graft

// Dev-only 10× stress-data generator (round-6 verdict item #7): build
// an sf1-SHAPED dataset from sf0.1 so the "survives 10×" claims on the
// top cost-tier queries become a measured data point, not plan-reading.
//   usage: graft.StressGen [srcSfDir] [outDir] [replicas]
//
// Design: each replica r ∈ [0, R) is a DISJOINT copy of the source
// problem — keys shift by r·10^ceil(log10(max+1)), document tokens get
// a per-replica suffix (disjoint shingle/minhash spaces), embeddings
// circularly rotate by r (norms and within-replica angles preserved;
// cross-replica pairs decorrelate) — so candidate-generation work
// scales exactly ×R and a super-linear runtime ratio indicts the PLAN,
// never an accidentally-denser problem. Deterministic: pure column
// transforms, no RNG (house rule). Not part of the driver contract.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object StressGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS) parquet (the Tables.events
      // workaround): read it as a nanos long; the replicated output
      // lands as plain INT64, which downstream reads identically.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // Decimal key-shift stride: next power of 10 above the max, so
    // replica ids stay human-decodable (replica = id / stride).
    def stride(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key))).collect()(0).getLong(0)
      var s = 1L; while (s <= mx) s *= 10; s
    }
    def replicate(df: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until replicas).map(i => per(df, i)).reduce(_ unionAll _)
    def shiftKeys(df: DataFrame, keys: Map[String, Long], i: Int): DataFrame =
      keys.foldLeft(df) { case (d, (k, s)) => d.withColumn(k, col(k) + lit(i * s)) }

    // Dimension lookups shared across replicas (25 nations / 5 regions
    // are schema constants, not scale-dependent volume).
    write(read("region"), "region")
    write(read("nation"), "nation")

    val cust = read("customer"); val cStride = stride(cust, "c_custkey")
    write(replicate(cust)((d, i) => shiftKeys(d, Map("c_custkey" -> cStride), i)), "customer")

    val supp = read("supplier"); val sStride = stride(supp, "s_suppkey")
    write(replicate(supp)((d, i) => shiftKeys(d, Map("s_suppkey" -> sStride), i)), "supplier")

    val part = read("part"); val pStride = stride(part, "p_partkey")
    write(replicate(part)((d, i) => shiftKeys(d, Map("p_partkey" -> pStride), i)), "part")

    val ord = read("orders"); val oStride = stride(ord, "o_orderkey")
    write(replicate(ord)((d, i) =>
      shiftKeys(d, Map("o_orderkey" -> oStride, "o_custkey" -> cStride), i)), "orders")

    write(replicate(read("lineitem"))((d, i) =>
      shiftKeys(d, Map("l_orderkey" -> oStride, "l_suppkey" -> sStride,
        "l_partkey" -> pStride), i)), "lineitem")

    val ev = read("events")
    val eStride = stride(ev, "event_id"); val uStride = stride(ev, "user_id")
    write(replicate(ev)((d, i) =>
      shiftKeys(d, Map("event_id" -> eStride, "user_id" -> uStride), i)), "events")

    // Documents: shifted ids + per-replica token suffix (replica 0
    // verbatim), so shingle/minhash/chunk-sig spaces are disjoint
    // across replicas and dedup candidate graphs scale exactly ×R.
    val docs = read("documents"); val dStride = stride(docs, "doc_id")
    write(replicate(docs) { (d, i) =>
      val shifted = shiftKeys(d, Map("doc_id" -> dStride), i)
      if (i == 0) shifted
      else shifted.withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1" + i.toString))
        // keep the derived column consistent with the suffixed text
        // (each token grew by len(str(i)) chars)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    // Embeddings: shifted ids + circular rotation by replica index —
    // rotation preserves norms and within-replica geometry, so each
    // replica's kNN/LSH structure is the source's, while cross-replica
    // vectors decorrelate.
    val emb = read("embeddings"); val vStride = stride(emb, "vec_id")
    val dim = emb.select(max(size(col("embedding")))).collect()(0).getInt(0)
    write(replicate(emb) { (d, i) =>
      val shifted = shiftKeys(d, Map("vec_id" -> vStride), i)
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        concat(slice(col("embedding"), i + 1, dim - i),
          slice(col("embedding"), 1, i)))
    }, "embeddings")

    println(s"wrote ${replicas}x $src -> $out")
    spark.stop()
  }
}

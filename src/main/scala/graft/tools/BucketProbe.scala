package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Bucket-population stats for every LSH candidate generator at an sf dir —
  * drives the hot-bucket cap choices in SparkEntry (cap = well above the
  * observed max at driver scale, so the oracled output is unchanged while
  * the guard is wired for skewed corpora). Also re-runs the verified
  * near-dup pipelines under the round-3 parameterizations to confirm the
  * output pair sets match the round-2 (oracle-green) ones.
  */
object BucketProbe {
  private def stats(tag: String, df: DataFrame, keys: Seq[String]): Unit = {
    val c = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val r = c.agg(max("n").as("max"), expr("percentile(n, 0.99)").as("p99"),
      count(lit(1)).as("buckets")).collect()(0)
    println(f"$tag%-34s max=${r.getLong(0)}%6d p99=${r.getDouble(1)}%8.1f buckets=${r.getLong(2)}")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val copies = d.filter(col("doc_id") < 30)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" xqz")).as("text"))
    val docs = d.union(copies)
    val n = docs.count()
    println(s"docs=$n")

    // minhash 16x5 band buckets
    val base = docs.select(col("doc_id").as("id"), col("text").as("txt"))
    val mh = base.select(col("id"),
        explode(Dedup.minhashBandKeys(
          graft.functions.MinHashSig.col(col("txt"), 5, 80), 80, 5)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    stats("minhash 16x5 (band,hash)", mh, Seq("band", "band_hash"))

    // simhash 4x16 band buckets
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val banded = sh.select(col("id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    stats("simhash 4x16 (band,key)", banded, Seq("band", "key"))

    // fingerprint gram document frequency
    val fp = Dedup.fingerprints(docs, "doc_id", "text")
      .select(col("id"), explode(col("fingerprint")).as("gram"))
    stats("fingerprint gram DF", fp, Seq("gram"))

    // hyperplane 40x8 band buckets over embeddings
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"emb=${emb.count()}")
    val hb = Dedup.embLshBands(emb, "vec_id", "embedding", 64, 40, 8)
      .select("id", "band", "key")
    stats("hyperplane 40x8 (band,key)", hb, Seq("band", "key"))

    // round-3 parameterizations vs round-2 verified outputs --------------
    def pairSet(df: DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val r2sim = pairSet(Dedup.simhashNearDup(docs, "doc_id", "text",
      maxHamming = 8, numBands = 8, minJaccard = 0.5))
    val r3sim = pairSet(Dedup.simhashNearDup(docs, "doc_id", "text",
      maxHamming = 8, numBands = 4, minJaccard = 0.5,
      probeBits = 2, maxBucket = 0))
    println(s"simhash r2=${r2sim.size} r3=${r3sim.size} equal=${r2sim == r3sim}")

    val cand3 = Dedup.embLshCandidates(emb, "vec_id", "embedding", 64,
      bands = 40, rowsPerBand = 8, probeBits = 1)
    println(s"emb cands 40x8+probe1 = ${cand3.count()} (n^2/2 = ${n * n / 2})")
    val r2emb = pairSet(Dedup.embNearDupLsh(emb, "vec_id", "embedding", 64,
      minSim = 0.45, bands = 32, rowsPerBand = 2))
    val r3emb = pairSet(Dedup.embNearDupLsh(emb, "vec_id", "embedding", 64,
      minSim = 0.45, bands = 40, rowsPerBand = 8, probeBits = 1))
    println(s"embLsh r2=${r2emb.size} r3=${r3emb.size} equal=${r2emb == r3emb}")

    // ANN kNN at recall-1 parameters vs exact top-5
    def knnSet(df: DataFrame) = df.select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val e = emb.selectExpr("vec_id", "cast(embedding as array<double>) v")
    val qv = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val exact = qv.join(e, col("query_id") =!= col("vec_id"))
      .withColumn("sim", graft.functions.CosineSim.col(col("qv"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
    val exactSet = knnSet(exact)
    val q = emb.filter(col("vec_id") < 20)
    val lsh = knnSet(Dedup.knnLsh(emb, q, "vec_id", "embedding", 64, 5,
      bands = 64, rowsPerBand = 1))
    val ivf = knnSet(Dedup.knnIvf(emb, q, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 16))
    println(s"knnLsh 64x1 == exact: ${lsh == exactSet} (${lsh.size}/${exactSet.size})")
    println(s"knnIvf probe-all == exact: ${ivf == exactSet} (${ivf.size}/${exactSet.size})")
    spark.stop()
  }
}

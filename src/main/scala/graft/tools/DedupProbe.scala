package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Stage-level timing of the text near-dup paths at a given sf dir. */
object DedupProbe {
  def timed(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"$tag%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s   rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val copies = d.filter(col("doc_id") < 30)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" xqz")).as("text"))
    val docs = d.union(copies)

    val base = docs.select(col("doc_id").as("id"), col("text").as("txt"))
    val numHashes = 80; val rowsPerBand = 5; val shingleK = 5
    val bands = base.select(col("id"),
        explode(Dedup.minhashBandKeys(
          graft.functions.MinHashSig.col(col("txt"), shingleK, numHashes),
          numHashes, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))

    // warm
    docs.count(); bands.count()
    timed("minhash sig + band keys (narrow)")(bands.count())
    val cands = Dedup.lshCandidates(bands)
    timed("band self-join + distinct → candidates")(cands.count())
    val pruned = Dedup.sigEstimateFilter(base, "id", "txt", cands, shingleK, 0.3, numHashes)
    timed("sig-estimate tier")(pruned.count())
    val sets = base.select(col("id"), Dedup.shingles(col("txt"), shingleK).as("arr"))
    timed("shingle arrays (narrow)")(sets.count())
    timed("exact verify on pruned")(
      Dedup.jaccardVerifyArrays(sets, pruned, 0.5).count())
    timed("full nearDupPairs")(
      Dedup.nearDupPairs(docs, "doc_id", "text", shingleK, numHashes, rowsPerBand, 0.5).count())

    val fp = Dedup.fingerprints(docs, "doc_id", "text")
      .select(col("id"), explode(col("fingerprint")).as("gram"))
    fp.count()
    timed("fingerprint explode (narrow)")(fp.count())
    val a = fp.select(col("gram"), col("id").as("id_a"))
    val b = fp.select(col("gram"), col("id").as("id_b"))
    val fpCands = a.join(b, Seq("gram")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2).select("id_a", "id_b")
    timed("gram join + groupBy count >= 2")(fpCands.count())
    val fpPruned = Dedup.sigEstimateFilter(base, "id", "txt", fpCands, shingleK, 0.3)
    timed("fp sig-estimate tier")(fpPruned.count())
    timed("full fingerprintNearDup")(
      Dedup.fingerprintNearDup(docs, "doc_id", "text", shingleK, 0.5).count())
    spark.stop()
  }
}

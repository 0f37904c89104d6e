package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q_docs_containment's cost: candidate gram join vs 128-hash
  * signature pass vs shingle-array verify pass. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best3(tag: String)(f: => Unit): Unit = {
      f
      println(f"[cp] $tag%-44s ${(1 to 3).map(_ => timed(f)).min}%6.2f s")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val prefixes = d.filter(col("doc_id") < 20)
      .select((col("doc_id") + 200000).as("doc_id"),
        substring(col("text"), 1, 120).as("text"))
    val docs = d.union(prefixes)
    val base = docs.select(col("doc_id").as("id"), col("text").as("txt"))
      .repartition(32)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    best3("fingerprints explode (gram rows)") {
      noop(graft.pipeline.Dedup.fingerprints(docs, "doc_id", "text")
        .select(col("id"), explode(col("fingerprint")).as("gram")))
    }
    best3("minhash sig 128 all docs") {
      noop(base.select(col("id"),
        graft.functions.MinHashSig.col(col("txt"), 5, 128).as("sig")))
    }
    best3("minhash sig 80 all docs") {
      noop(base.select(col("id"),
        graft.functions.MinHashSig.col(col("txt"), 5, 80).as("sig")))
    }
    best3("shingle arrays all docs") {
      noop(base.select(col("id"),
        graft.pipeline.Dedup.shingles(col("txt"), 5).as("arr")))
    }
    best3("full containmentPairs") {
      graft.pipeline.Dedup.containmentPairs(docs, "doc_id", "text",
        shingleK = 5, minContainment = 0.9, maxDocFreq = 2048).count(): Unit
    }
    spark.stop()
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.{CosineSim, TextSim}

/** Large-scale deduplication & similarity operators for training-data
  * pipelines. All shapes are the standard distributed formulations: shuffles
  * only on (id)- or (bucket)-keyed aggregations, candidate generation via
  * LSH banding so the pairwise work is bucket-local, never all-pairs.
  */
object Dedup {

  /** Exact dedup: one keeper per identical text (hash-groupBy shape;
    * map-side partial agg, one shuffle on the text hash). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies")

  /** Character k-shingles of a text column (distinct per doc). */
  def shingles(textCol: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(textCol) - k, lit(0))),
      i => substring(textCol, lit(1) + i, lit(k))))

  /** MinHash signatures → LSH band keys.
    * numHashes independent hash families via seed-prefixed xxhash64;
    * elementwise-min aggregated per doc; `bandsPerDoc = numHashes / rowsPerBand`
    * band hashes emitted per doc. Output: (id, band, band_hash). */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, numHashes: Int = 32,
                   rowsPerBand: Int = 4): DataFrame =
    minhashBandsFromShingles(
      docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleK)).as("sh")),
      numHashes, rowsPerBand)

  /** As `minhashBands` but over a pre-built (id, sh) shingle frame. */
  def minhashBandsFromShingles(shingleDf: DataFrame, numHashes: Int,
                               rowsPerBand: Int): DataFrame = {
    // one row per (doc, shingle) with the full hash vector inline; the
    // signature is numHashes min-aggregates in a single shuffle — never a
    // per-(doc, hash-position) row explosion (32x fewer shuffle rows)
    val sh = shingleDf
      .withColumn("hs", transform(sequence(lit(0), lit(numHashes - 1)),
        i => xxhash64(i.cast("string"), col("sh"))))
    val minCols = (0 until numHashes).map(i =>
      min(element_at(col("hs"), i + 1)).as(s"mh$i"))
    val sig = sh.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
    val nBands = numHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",",
          (b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(i => col(s"mh$i").cast("string")): _*)).as("band_hash"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
  }

  /** LSH candidate pairs (id_a < id_b) from shared band buckets. The join
    * is bucket-local: keyed on (band, band_hash), so only colliding docs
    * ever meet — the all-pairs blowup never materializes. */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = bands.select(col("band"), col("band_hash"), col("id").as("id_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs:
    * |A∩B| via shingle equi-join, |A∪B| = |A|+|B|−|A∩B|. */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame,
                    idCol: String, textCol: String, shingleK: Int = 5,
                    minJaccard: Double = 0.5): DataFrame =
    jaccardVerifyFromShingles(
      docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleK)).as("sh")),
      candidates, minJaccard)

  /** As `jaccardVerify` but over a pre-built (id, sh) shingle frame. */
  def jaccardVerifyFromShingles(sh: DataFrame, candidates: DataFrame,
                                minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = candidates
      .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash-LSH near-dup end to end: band → candidates → Jaccard verify.
    * The exploded shingle frame feeds both the signature aggregation and the
    * verify joins, so it is computed once and cached for the duration. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, numHashes: Int = 32, rowsPerBand: Int = 4,
                   minJaccard: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), shingleK)).as("sh")).cache()
    val bands = minhashBandsFromShingles(sh, numHashes, rowsPerBand)
    jaccardVerifyFromShingles(sh, lshCandidates(bands), minJaccard)
  }

  private val simhashUdf = udf((t: String) => TextSim.simhash64(if (t == null) "" else t))
  private val fingerprintUdf =
    udf((t: String) => TextSim.fingerprint(if (t == null) "" else t))

  /** 64-bit SimHash per doc. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs within `maxHamming`, candidate-limited by
    * 16-bit band collisions (4 bands of a 64-bit fingerprint — any pair
    * within Hamming ≤ 3 of each other must share ≥ 1 exact band). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("key"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Winnowing fingerprints per doc (rolling-hash k-grams, window minima). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), fingerprintUdf(col(textCol)).as("fingerprint"))

  // ---- embeddings ----------------------------------------------------------

  /** Brute-force cosine near-dup pairs (sim ≥ minSim) via broadcast self-
    * join + the native CosineSim expression. Baseline path; use the LSH
    * variant when neither side broadcasts. */
  def embNearDup(emb: DataFrame, idCol: String, vecCol: String,
                 minSim: Double = 0.95): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("sim", CosineSim.col(col("v_a"), col("v_b")))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }

  /** Random-hyperplane LSH buckets for embeddings: `planes` sign bits from
    * deterministic pseudo-random hyperplanes — the scale path: pairs only
    * meet within a bucket. Coefficients are derived once on the driver and
    * shipped as literal arrays (constant-folded into codegen), not
    * recomputed per row. */
  def embLshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                    dim: Int, planes: Int = 12): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val signBits = (0 until planes).map { p =>
      // plane p coefficient for dim d = centered splitmix hash in [-0.5, 0.5)
      val coeffs = (0 until dim).map { d =>
        val h = graft.fixture.Prng.derive(0x1A5B3CL, p.toLong, d.toLong).nextLong()
        Math.floorMod(h, 1000000L) / 1000000.0 - 0.5
      }
      val dotP = aggregate(
        zip_with(col("v"), typedLit(coeffs), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    e.withColumn("bucket", signBits.reduce(_ + _))
  }

  /** LSH-bucketed embedding near-dup: exact cosine only within buckets. */
  def embNearDupLsh(emb: DataFrame, idCol: String, vecCol: String,
                    dim: Int, minSim: Double = 0.95, planes: Int = 12): DataFrame = {
    val buk = embLshBuckets(emb, idCol, vecCol, dim, planes)
    val a = buk.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = buk.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", CosineSim.col(col("v_a"), col("v_b")))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }
}

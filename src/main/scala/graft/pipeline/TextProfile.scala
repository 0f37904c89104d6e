package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-profile operators for training-data curation: the aggregate
  * tables a quality-filter pipeline derives FROM the corpus to drive its
  * own rules (boilerplate phrase lists, contamination probes, vocabulary
  * audits). Pure declarative compositions — every step is a codegen'd
  * column expression feeding one map-side-combined aggregation. */
object TextProfile {

  /** Word n-gram document frequency: how many DISTINCT documents contain
    * each word n-gram. The standard input to boilerplate-phrase lists
    * (drop/flag grams with df over a ceiling) and train/test contamination
    * probes (join a held-out set's grams against the table). Per-doc
    * dedup happens BEFORE the count (distinct on (doc, gram)), so a gram
    * repeated inside one doc counts once; the groupBy is map-side combined
    * on the gram — one shuffle of (gram, df) rows, no doc content travels.
    * Documents shorter than n words contribute their whole text as one
    * (short) gram, mirroring `Dedup.shingles`' convention. */
  def ngramDocFreq(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minDf: Long = 3): DataFrame = {
    require(n >= 1, s"ngram size $n")
    val words = split(col(textCol), " ")
    docs.select(col(idCol).as("id"), words.as("ws"))
      .select(col("id"), explode(transform(
        sequence(lit(0), greatest(size(col("ws")) - n, lit(0))),
        i => concat_ws(" ", slice(col("ws"), i + 1, lit(n))))).as("gram"))
      .distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
  }

  /** Intra-document repetition score (the Gopher-rule family): the
    * fraction of word n-gram OCCURRENCES that are repeats of an n-gram
    * already seen in the same document — catches non-consecutive
    * copy-paste loops that a max-consecutive-run rule (H2) misses. Pure
    * per-row column expressions: no shuffle, no state, codegen'd. */
  def repetitionScore(textCol: Column, n: Int = 3): Column = {
    require(n >= 1, s"ngram size $n")
    val ws = split(textCol, " ")
    val grams = transform(
      sequence(lit(0), greatest(size(ws) - n, lit(0))),
      i => concat_ws(" ", slice(ws, i + 1, lit(n))))
    round((size(grams) - size(array_distinct(grams))).cast("double") /
      size(grams), 6)
  }

  /** Deterministic, content-stable train/val/test split: the standard
    * leakage-safe way to split a corpus. The split is a pure function of
    * the id's md5 (no RNG, no state), so it is identical across runs,
    * partitionings, engines, and corpus growth — a document NEVER migrates
    * between splits when more data arrives, which is what seeded `sample()`
    * cannot guarantee. Implementation compares the first 8 hex chars of
    * md5(id) lexicographically against cut points (hex strings order the
    * same as their values), so any engine with md5 reproduces it exactly.
    * Assignment order: [0, testFrac) → test, [testFrac, testFrac+valFrac)
    * → val, rest → train. */
  def hashSplit(docs: DataFrame, idCol: String,
                testFrac: Double = 0.1, valFrac: Double = 0.1): DataFrame = {
    require(testFrac >= 0 && valFrac >= 0 && testFrac + valFrac <= 1,
      s"bad split fractions test=$testFrac val=$valFrac")
    // a fraction of exactly 1.0 would format as 9 hex chars ('100000000'),
    // which sorts BEFORE 8-char prefixes lexicographically — clamp to a
    // sentinel that sorts after every hex string instead ('g' > 'f')
    def cut(f: Double): String = {
      val v = math.floor(f * 4294967296.0).toLong
      if (v >= 0x100000000L) "g" else f"$v%08x"
    }
    val h = substring(md5(col(idCol).cast("string")), 1, 8)
    docs.withColumn("split",
      when(h < lit(cut(testFrac)), "test")
        .when(h < lit(cut(testFrac + valFrac)), "val")
        .otherwise("train"))
  }
}

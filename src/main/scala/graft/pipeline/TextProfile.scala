package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}

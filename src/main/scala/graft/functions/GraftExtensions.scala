package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * as SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works.
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val cosineSimFn = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim(a, b) takes two array<double> args")
      CosineSim(children.head, children(1)): Expression
    }
  )

  private val minhashSigFn = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "minhash_sig(text, shingle_k, num_hashes) takes three args")
      MinHashSig(children.head, intArg(children(1), "shingle_k"),
        intArg(children(2), "num_hashes")): Expression
    }
  )

  private val matchCountFn = (
    FunctionIdentifier("match_count"),
    new ExpressionInfo(classOf[MatchCount].getName, "match_count"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "match_count(a, b) takes two array<bigint> args")
      MatchCount(children.head, children(1)): Expression
    }
  )

  private val sketchHammingFn = (
    FunctionIdentifier("sketch_hamming"),
    new ExpressionInfo(classOf[SketchHamming].getName, "sketch_hamming"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "sketch_hamming(a, b) takes two array<bigint> args")
      SketchHamming(children.head, children(1)): Expression
    }
  )

  private val simhash64Fn = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "simhash64(text) takes one string arg")
      SimHash64(children.head): Expression
    }
  )

  private val fingerprintFn = (
    FunctionIdentifier("fingerprint"),
    new ExpressionInfo(classOf[Fingerprint].getName, "fingerprint"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "fingerprint(text) takes one string arg")
      Fingerprint(children.head): Expression
    }
  )

  private val nfcNormalizeFn = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "nfc_normalize(text) takes one string arg")
      NfcNormalize(children.head): Expression
    }
  )

  private[functions] val all = Seq(
    cosineSimFn, minhashSigFn, matchCountFn, sketchHammingFn,
    simhash64Fn, fingerprintFn, nfcNormalizeFn)

  /** Register on an already-running session (extensions only apply at
    * session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(
        spark, id.funcName, info, builder)
    }
}

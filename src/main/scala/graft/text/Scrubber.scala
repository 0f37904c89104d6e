package graft.text

import java.util.regex.Pattern
import graft.model.ScrubHit

/** Compiled-regex PII/toxicity scrubber (SURVEY §2.6 R1).
  *
  * Reference analog: structured-noise removal — detect a structural pattern,
  * erase it while preserving surrounding content, and emit the removed mask
  * as lineage (`image_processing.py:1223-1254`, mask kept at `:887`). Here:
  * canonical ordered pattern set, single pass per rule, `scrub_hits` is the
  * "mask". Exact output equality is a gated invariant, so the rule ORDER is
  * part of the spec: rules apply in `Scrubber.rules` order, each rule a
  * global replaceAll, each subsequent rule seeing the prior rule's output.
  *
  * Patterns compile once per JVM (object init) — per-executor compile-once,
  * like the reference's module-level singletons (`ocr_engine.py:26-70`).
  */
object Scrubber {

  final case class Rule(name: String, pattern: Pattern, replacement: String)

  /** Synthetic toxicity lexicon (fixture plants exactly these tokens). */
  val toxLexicon: Seq[String] = Seq("frak", "gorram", "smeg", "feldercarb", "drokk")

  /** Canonical ordered rule set — order is load-bearing (email before phone
    * so digits inside an address are not double-matched; ssn before generic
    * id). */
  val rules: IndexedSeq[Rule] = IndexedSeq(
    Rule("email",
      Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
      "<EMAIL>"),
    Rule("ssn",
      Pattern.compile("\\b\\d{3}-\\d{2}-\\d{4}\\b"),
      "<ID>"),
    Rule("idnum",
      Pattern.compile("\\b[A-Z]{2}\\d{6,10}\\b"),
      "<ID>"),
    Rule("phone",
      Pattern.compile("\\+\\d{1,3}[- ]\\d{2,4}[- ]\\d{3,4}[- ]\\d{3,4}\\b"),
      "<PHONE>"),
    Rule("tox",
      Pattern.compile("(?i)\\b(" + toxLexicon.mkString("|") + ")\\b"),
      "<TOX>")
  )

  /** Declarative (Catalyst) twin of `scrub`: the same ordered rule chain
    * as codegen'd column expressions — per rule, the hit count via
    * `regexp_extract_all` BEFORE that rule's global `regexp_replace`, each
    * rule seeing the prior rule's output, exactly the JVM semantics (both
    * sides run Java regex). Returns (scrubbed text, (rule name → count)).
    * Lets the scrubber run inside any DataFrame plan (and be verified by
    * an external SQL engine); exact equality with the JVM `scrub` is
    * gated in TextSpec. */
  def scrubCol(text: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, Seq[(String, org.apache.spark.sql.Column)]) = {
    import org.apache.spark.sql.functions._
    var t = text
    val counts = rules.map { r =>
      val c = size(regexp_extract_all(t, lit(r.pattern.pattern), lit(0)))
        .cast("long")
      t = regexp_replace(t, r.pattern.pattern, r.replacement)
      r.name -> c
    }
    (t, counts)
  }

  /** Scrub: returns (scrubbed text, per-rule hit counts — only rules that
    * fired, in canonical order). Deterministic, idempotent (replacement
    * tokens match no rule). */
  def scrub(text: String): (String, Seq[ScrubHit]) = {
    var t = text
    val hits = IndexedSeq.newBuilder[ScrubHit]
    rules.foreach { r =>
      val m = r.pattern.matcher(t)
      var count = 0
      val sb = new java.lang.StringBuilder
      while (m.find()) { count += 1; m.appendReplacement(sb, r.replacement) }
      if (count > 0) {
        m.appendTail(sb)
        t = sb.toString
        hits += ScrubHit(r.name, count)
      }
    }
    (t, hits.result())
  }
}

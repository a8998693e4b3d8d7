package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Vocab-driven BPE tokenization as a pure codegen'd column expression.
  *
  * Real training pipelines budget in subword (BPE) tokens, not whitespace
  * words; whitespace counts skew English ~1.3× and code/CJK far more, so
  * every token budget, packed block, and chunk boundary computed from them
  * is systematically off. This module supplies a merge-table-driven BPE
  * encoder whose semantics are exactly reproducible in any engine with
  * left-to-right non-overlapping string `replace` — which is what makes it
  * gate-able against a DuckDB oracle (the oracle is the SAME replace chain,
  * generated from the SAME merge table by [[oracleTokenizedSql]] /
  * [[oracleCountSql]], so the two definitions cannot drift).
  *
  * Encoding scheme (the whole document is processed in ONE string; no
  * per-word explode, no HOF, no UDF):
  *
  *  1. whitespace runs collapse to a boundary sentinel `Bnd` (its own
  *     token — merges never contain it, so no merge crosses a word
  *     boundary);
  *  2. every character becomes a token by wrapping with the separator
  *     `Sep`: text `ab cd` → `§a§b§⊥§c§d§` (one leading `Sep`, one after
  *     every char);
  *  3. each merge rule (x, y) → xy, in FIXED TABLE ORDER, is one
  *     `replace(s, "§x§y§", "§xy§")` — string replace scans left to right
  *     over non-overlapping matches, which is precisely "merge every
  *     (x, y) token adjacency left-to-right". Wrapping both sides in `Sep`
  *     means a token PREFIX can never false-match (`a§st` does not match
  *     rule (a, s): the pattern `§a§s§` requires the whole next token to
  *     be `s`).
  *
  * Fixed-order application (each rule exhaustively, in the order the
  * table lists them) is the subword-nmt/learned-order variant of BPE
  * encoding — deterministic, streaming-friendly, and exactly expressible
  * as a replace chain in both engines. Token count falls out of
  * arithmetic: n_tokens = (#Sep − 1) − #Bnd (wrapping n tokens takes
  * n + 1 separators; boundary sentinels are not text tokens).
  *
  * Scale: the encoder is a per-row scalar expression — a pure map over
  * the corpus with zero shuffles, inside whole-stage codegen (regexp ×2 +
  * |merges| string replaces + length arithmetic). At 100 TB it pipelines
  * into whatever consumes the counts.
  *
  * The default table is a small fixture of high-frequency English merges
  * in the public GPT-2/subword-nmt merge-list FORMAT (one (left, right)
  * pair per rank); production callers load their model's real merge list
  * via the `merges` parameter — nothing below is specific to the fixture.
  */
object Bpe {
  /** Token separator (U+001F unit separator — never in real text). */
  val Sep = "\u001f"
  /** Word-boundary sentinel (U+0002 — merges never contain it). */
  val Bnd = "\u0002"

  /** Default merge table (fixed application order = rank order): common
    * English letter-pair merges plus a few depth-2/3 chains (the → th+e,
    * ing → in+g, and → an+d, table → ta+ble) that exercise merged-token
    * recursion. A fixture, not a trained vocab — see class doc. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e",
    "i" -> "n", "a" -> "n", "o" -> "n",
    "e" -> "r", "r" -> "e", "a" -> "t",
    "s" -> "t", "e" -> "n", "o" -> "r",
    "a" -> "r", "a" -> "l", "o" -> "u",
    "i" -> "s", "i" -> "t", "e" -> "s",
    "e" -> "d", "in" -> "g",
    "an" -> "d", "a" -> "s", "l" -> "e",
    "b" -> "le", "t" -> "a", "ta" -> "ble")

  private def validate(merges: Seq[(String, String)]): Unit =
    require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty &&
        !(a + b).contains(Sep) && !(a + b).contains(Bnd) &&
        !(a + b).contains("'")
    }, "merge rules must be non-empty, quote-free, and free of sentinels")

  /** The Sep-wrapped token string after all merges — the encoder core.
    * The explicit whitespace class (not \s) keeps Java-regex and RE2
    * semantics identical (Java \s additionally matches \x0B). */
  def tokenized(text: Column,
                merges: Seq[(String, String)] = DefaultMerges): Column = {
    validate(merges)
    val bounded = regexp_replace(text, "[ \\t\\n\\r]+", Bnd)
    val wrapped = concat(lit(Sep), regexp_replace(bounded, "(?s)(.)", "$1" + Sep))
    merges.foldLeft(wrapped) { case (s, (a, b)) =>
      replace(s, lit(Sep + a + Sep + b + Sep), lit(Sep + a + b + Sep))
    }
  }

  /** BPE token count per document: (#Sep − 1) − #Bnd. Empty and
    * whitespace-only documents count 0 with no special casing (wrapping
    * leaves exactly one Sep and zero text tokens). */
  def tokenCount(text: Column,
                 merges: Seq[(String, String)] = DefaultMerges): Column = {
    val s = tokenized(text, merges)
    val nSep = length(s) - length(replace(s, lit(Sep), lit("")))
    val nBnd = length(s) - length(replace(s, lit(Bnd), lit("")))
    (nSep - 1 - nBnd).cast(LongType)
  }

  /** The token sequence as array<string> (boundary sentinels dropped) —
    * for consumers that need the tokens themselves (chunking, packing
    * example materialization). Still fully in-row. */
  def tokens(text: Column,
             merges: Seq[(String, String)] = DefaultMerges): Column =
    filter(split(tokenized(text, merges), Sep, -1),
      t => t =!= lit("") && t =!= lit(Bnd))

  /** DuckDB SQL expression for the merged token string over `textCol` —
    * the same replace chain [[tokenized]] folds, generated from the same
    * merge table. Sentinels are spelled chr(31)/chr(2) so the SQL carries
    * no raw control characters. Embed in a CTE, then count with
    * [[oracleCountSql]]. */
  def oracleTokenizedSql(textCol: String,
                         merges: Seq[(String, String)] = DefaultMerges): String = {
    validate(merges)
    val sep = "chr(31)"
    val bnd = "chr(2)"
    val wrapped = s"$sep || regexp_replace(regexp_replace($textCol, " +
      s"'[ \\t\\n\\r]+', $bnd, 'g'), '(?s)(.)', '\\1' || $sep, 'g')"
    merges.foldLeft(wrapped) { case (s, (a, b)) =>
      s"replace($s, $sep || '$a' || $sep || '$b' || $sep, " +
        s"$sep || '$a$b' || $sep)"
    }
  }

  /** DuckDB SQL expression counting tokens in a column holding
    * [[oracleTokenizedSql]]'s output: (#Sep − 1) − #Bnd. */
  def oracleCountSql(sCol: String): String =
    s"(length($sCol) - length(replace($sCol, chr(31), '')) - 1) - " +
      s"(length($sCol) - length(replace($sCol, chr(2), '')))"
}

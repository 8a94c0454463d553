package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines
 * (beyond the reference's operator set — required engine components):
 * token counting, language-ID heuristic, quality scoring, document
 * fingerprinting. All pure Column expressions (codegen'd, no UDFs) with
 * SQL twins for the oracle.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))
  def tokenCountSql(t: String): String = s"len(string_split($t, ' '))"

  /** BPE-ish regex token count: alpha runs, digit runs, other symbols. */
  val TokenRegex = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]"
  def regexTokenCount(text: Column): Column = regexp_count(text, lit(TokenRegex))
  def regexTokenCountSql(t: String): String = s"len(regexp_extract_all($t, '$TokenRegex'))"

  /** Language marker words (n-gram heuristic lexicons). */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "value", "and", "of", "key"),
    "de" -> Seq("der", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "que", "de"))

  private def markerHits(text: Column, words: Seq[String]): Column =
    size(filter(split(text, " "), w => w.isin(words.map(lit): _*)))
  private def markerHitsSql(t: String, words: Seq[String]): String =
    s"len(list_filter(string_split($t, ' '), w -> list_contains([${words.map(w => s"'$w'").mkString(",")}], w)))"

  /**
   * Heuristic language id: argmax of marker-word hits, ties broken by
   * lexicon order, 'und' (undetermined) when no marker hits at all.
   */
  def langId(text: Column): Column = {
    val scores = Markers.map { case (l, ws) => l -> markerHits(text, ws) }
    val best = scores.foldLeft(lit("und") -> lit(0)) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    best._1
  }
  def langIdSql(t: String): String = {
    // same fold: strictly-greater replaces, so earlier lexicons win ties
    val folded = Markers.foldLeft(("'und'", "0")) { case ((bl, bs), (l, ws)) =>
      val s = markerHitsSql(t, ws)
      (s"(CASE WHEN $s > $bs THEN '$l' ELSE $bl END)",
       s"(CASE WHEN $s > $bs THEN $s ELSE $bs END)")
    }
    folded._1
  }

  /**
   * Quality score in [0,1]: length, stopword ratio and mean token length
   * components (the classic cheap quality gates), weighted sum.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopHits = markerHits(text, Markers.head._2).cast("double")
    val meanTokLen = (length(text) - (nTok - 1.0)) / nTok
    lit(0.3) * least(nTok / 100.0, lit(1.0)) +
      lit(0.4) * (stopHits / nTok) +
      lit(0.3) * least(meanTokLen / 8.0, lit(1.0))
  }
  def qualityScoreSql(t: String): String = {
    val nTok = s"CAST(${tokenCountSql(t)} AS DOUBLE)"
    val stop = s"CAST(${markerHitsSql(t, Markers.head._2)} AS DOUBLE)"
    val mean = s"((length($t) - ($nTok - 1.0)) / $nTok)"
    s"(0.3 * LEAST($nTok / 100.0, 1.0) + 0.4 * ($stop / $nTok) + 0.3 * LEAST($mean / 8.0, 1.0))"
  }

  /**
   * Rolling polynomial fingerprint: h = fold(h*31 + byte) mod 2^31 over
   * the text's UTF-8 bytes — a native codegen'd expression doing ONE
   * linear byte scan per document ([[graft.core.TextHash.fingerprint]]).
   * The SQL oracle replays the identical fold with `list_reduce` over
   * per-character `ord()` (== per-byte for the ASCII corpus; for
   * non-ASCII text the byte fold is the defined semantics).
   */
  def fingerprint(textCol: String): Column =
    graft.functions.text_fingerprint(col(textCol))
  def fingerprintSql(t: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ord($t[i]) AS BIGINT) for i in range(1, len($t)+1)]), " +
      s"(acc, code) -> (acc * 31 + code) % 2147483648)"

  /** 60-bit stable word hash from md5 (identical in Spark and DuckDB). */
  def wordHash(w: Column): Column =
    conv(substring(md5(w.cast("binary")), 1, 15), 16, 10).cast("long")
  def wordHashSql(w: String): String =
    s"CAST(concat('0x', substr(md5($w), 1, 15)) AS BIGINT)"
}

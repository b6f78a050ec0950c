package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Row-local greedy longest-match subword tokenizer (the WordPiece /
  * BPE-inference segmentation rule: at each position consume the
  * longest vocabulary entry, else one character) over an
  * `array<string>` of words, returning the total subword count.
  *
  * The vocabulary is a small embedded table of common English words,
  * affixes and character n-grams — public knowledge, deterministic,
  * and shared verbatim with the DuckDB oracle (which replays the same
  * greedy rule as a recursive CTE over distinct words). This makes
  * token budgeting for pretraining-data accounting REAL — a count
  * that tracks actual segmentation — where t03's previous
  * `ceil(len/3.6)` was a length proxy.
  *
  * Scale shape: one pass per row inside whole-stage codegen, zero
  * shuffles — scan-speed over a 100 TB corpus like the rest of t01-t05.
  * Greedy matching is O(len · maxEntryLen) per word with offset-based
  * substring checks; swap the vocab for a production BPE merge table
  * and nothing else changes.
  */
case class BpeCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCount.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {

  /** Embedded subword vocabulary: frequent English function words,
    * productive prefixes/suffixes, and high-frequency character
    * bigrams (single chars are the implicit fallback, so length-1
    * entries are excluded — they can never beat the fallback).
    */
  val Vocab: Seq[String] = Seq(
    // frequent whole words
    "the", "and", "that", "with", "this", "from", "have", "for", "are",
    "was", "not", "you", "all", "can", "her", "his", "one", "our", "out",
    "day", "get", "has", "him", "how", "man", "new", "now", "old", "see",
    "two", "way", "who", "its", "said", "each", "she", "which", "their",
    "time", "will", "about", "would", "there", "could", "other",
    // productive prefixes
    "anti", "auto", "counter", "dis", "down", "extra", "hyper", "inter",
    "intra", "micro", "mid", "mis", "non", "over", "post", "pre", "pro",
    "semi", "sub", "super", "trans", "ultra", "un", "under",
    // productive suffixes
    "able", "ance", "ation", "ence", "ent", "est", "ful", "ian", "ible",
    "ing", "ion", "ish", "ism", "ist", "ity", "ive", "ize", "less",
    "ly", "ment", "ness", "ous", "sion", "tion", "ward", "wise",
    // high-frequency character bigrams
    "th", "he", "in", "er", "an", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt",
    "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de",
    "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "re",
    // common digit pairs
    "00", "19", "20"
  ).distinct.filter(_.length >= 2)

  private val maxLen: Int = Vocab.iterator.map(_.length).max
  private val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](Vocab.size * 2)
    Vocab.foreach(s.add)
    s
  }

  /** Greedy longest-match count: at each position take the longest
    * vocab entry (≥2 chars), else consume one character; each consumed
    * unit counts one token. Identical to the oracle's recursive-CTE
    * step `pos += coalesce(max(len(match)), 1)`.
    */
  def compute(words: ArrayData): Long = {
    var total = 0L
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      val len = w.length
      var pos = 0
      while (pos < len) {
        var adv = 1
        var l = math.min(maxLen, len - pos)
        while (l >= 2 && adv == 1) {
          if (set.contains(w.substring(pos, pos + l))) adv = l
          l -= 1
        }
        total += 1L
        pos += adv
      }
      i += 1
    }
    total
  }
}

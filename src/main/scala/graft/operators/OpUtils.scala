package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic building blocks shared by the LLM-pipeline
  * operators (dedup / similarity / text analysis).
  *
  * Everything here is designed so the SAME value is computed by Spark and
  * by the DuckDB oracle:
  *   - hashing goes through md5 (identical lowercase hex in both engines);
  *   - numeric hash values are decoded positionally from the hex digits;
  *   - floating-point reductions fold left-to-right from an explicit zero
  *     accumulator, so the IEEE rounding sequence is identical;
  *   - min-over-strings is lexicographic on ASCII hex, identical under
  *     both engines' binary collations.
  */
object OpUtils {

  /** Whitespace-tokenized words of the trimmed text. */
  def words(text: Column): Column = split(trim(text), " +")

  /** Word 3-grams joined by single spaces (positions 1..n-2, 1-based). */
  def grams3(ws: Column): Column =
    when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i, lit(3)))))

  /** k-element MinHash signature of a gram set: element j is the
    * lexicographic minimum of md5(gram + "#" + j). Equivalent to k
    * independent hash functions (salted md5), min-aggregated.
    */
  def minhashSig(grams: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(grams, g => md5(concat(g, lit("#"), j.cast("string"))))))

  /** Numeric value of the first `digits` hex chars of md5(expr) — a
    * deterministic cross-engine hash in [0, 16^digits). */
  def md5Val(c: Column, digits: Int): Column =
    conv(substring(md5(c), 1, digits), 16, 10).cast("long")

  /** Left fold of a double array from an explicit 0.0 accumulator —
    * fixed FP rounding order, mirrored by the oracle's list_reduce. */
  def sumFold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two double arrays with deterministic fold order. */
  def dot(a: Column, b: Column): Column = sumFold(zip_with(a, b, (x, y) => x * y))

  /** Cosine similarity, computed as dot/(sqrt(na)*sqrt(nb)) — the exact
    * op sequence the oracle mirrors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  // ----- DuckDB-side snippet builders (oracle SQL fragments) -----

  /** DuckDB: words of trimmed text. */
  def oWords(text: String): String = s"string_split_regex(trim($text), ' +')"

  /** DuckDB: word 3-grams of a words-list expression `ws`. */
  def oGrams3(ws: String): String =
    s"CASE WHEN len($ws) < 3 THEN [] ELSE list_transform(range(1, len($ws) - 1), " +
      s"i -> array_to_string(($ws)[i:i+2], ' ')) END"

  /** DuckDB: k-element MinHash signature of grams-list expression. */
  def oMinhashSig(grams: String, k: Int): String =
    s"list_transform(range(0, $k), j -> list_min(list_transform($grams, " +
      s"g -> md5(g || '#' || j))))"

  /** DuckDB: numeric value of first `digits` hex chars of md5(expr). */
  def oMd5Val(e: String, digits: Int): String =
    s"list_reduce([0] || list_transform(range(1, ${digits + 1}), " +
      s"i -> instr('0123456789abcdef', (md5($e))[i:i]) - 1), (a, b) -> a * 16 + b)"

  /** DuckDB: left fold sum of a double-list expression from 0.0. */
  def oSumFold(arr: String): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || ($arr), (a, b) -> a + b)"

  /** DuckDB: dot product of two double-list columns by index. */
  def oDot(a: String, b: String): String =
    oSumFold(s"list_transform(range(1, len($a) + 1), i -> ($a)[i] * ($b)[i])")

  /** DuckDB: cosine similarity mirroring [[cosine]]'s op order. */
  def oCosine(a: String, b: String): String =
    s"${oDot(a, b)} / (sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)}))"
}

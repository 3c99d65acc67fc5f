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

  /** Bounded per-query persist: some operators persist a mid-plan frame
    * consumed by two downstream branches (s17's candidate set, t21/t23's
    * head counts). A bare `.persist()` there leaks — the frame can't be
    * unpersisted before the lazy result materializes, so every bench /
    * gate replay pinned another copy for the session lifetime (r7
    * ADVICE). This registry keeps AT MOST ONE live frame per
    * (session, tag): re-invoking the same query releases the previous
    * invocation's frame (each rep still recomputes — the timing
    * semantics are unchanged), and [[releaseTransients]] drops them all.
    */
  private val transients =
    scala.collection.concurrent.TrieMap[(Int, String), org.apache.spark.sql.DataFrame]()

  def transientPersist(s: org.apache.spark.sql.SparkSession, tag: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val k = (System.identityHashCode(s), tag)
    transients.remove(k).foreach(_.unpersist(false))
    val p = df.persist()
    transients(k) = p
    p
  }

  /** Release every transient frame registered for `s`. */
  def releaseTransients(s: org.apache.spark.sql.SparkSession): Unit = {
    val sid = System.identityHashCode(s)
    transients.keys.filter(_._1 == sid).foreach { k =>
      transients.remove(k).foreach(_.unpersist(true))
    }
  }

  /** Whitespace-tokenized words of the trimmed text. */
  def words(text: Column): Column = split(trim(text), " +")

  /** Word 3-grams joined by single spaces (positions 1..n-2, 1-based). */
  def grams3(ws: Column): Column =
    when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", slice(ws, i, lit(3)))))

  /** MinHash hash family: ONE md5 per gram → 30-bit base value, then k
    * universal-hash derivations h_j(v) = (A_j*v + B_j) mod P (cheap
    * integer ops, 16× less hashing than salted-md5-per-j). A_j < 2^31
    * and v < 2^30 keep the product inside a long. */
  val MinhashP = 1073741789L // largest prime < 2^30
  val MinhashK = 16
  val minhashA: Seq[Long] = (1 to MinhashK).map(j => (2654435761L * j) % MinhashP)
  val minhashB: Seq[Long] = (1 to MinhashK).map(j => (40503L * j * j + 17) % MinhashP)

  /** 30-bit gram values: first 15 hex digits of md5, mod 2^30. */
  def gramVals(grams: Column): Column =
    transform(grams, g => pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(1L << 30)))

  /** k-element numeric MinHash signature from a gram-values COLUMN.
    * Pass a materialized column (cached/shuffled), not an expression:
    * Catalyst's projection collapse would otherwise inline — and
    * recompute — the md5 pipeline once per hash function. */
  def minhashSigFromGvs(gvs: Column): Column =
    array((0 until MinhashK).map(j =>
      array_min(transform(gvs, v => pmod(v * minhashA(j) + minhashB(j), lit(MinhashP))))): _*)

  /** Numeric value of the first `digits` hex chars of md5(expr) — a
    * deterministic cross-engine hash in [0, 16^digits). */
  def md5Val(c: Column, digits: Int): Column =
    conv(substring(md5(c), 1, digits), 16, 10).cast("long")

  /** Left fold of a double array from an explicit 0.0 accumulator —
    * fixed FP rounding order, mirrored by the oracle's list_reduce. */
  def sumFold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two double arrays with deterministic fold order. */
  /** r14: native codegen'd left-fold dot (graft.functions.DotFold) —
    * bit-identical to sumFold(zip_with(a, b, _*_)), which evaluated
    * INTERPRETED (HOFs are CodegenFallback) on the similarity tier's
    * per-row norm and brute-force truth paths. DotFoldSpec pins the
    * equality; sessions register via GraftSession/operator builders. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dotFold(a, b)

  /** Cosine similarity via the native codegen'd Expression
    * ([[graft.functions.CosineSimilarity]]); per-accumulator FP op
    * order matches the fold the oracle mirrors (bitwise-identical).
    * Session must have GraftFunctions registered (GraftSession does;
    * operator builders call register defensively). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  // ----- DuckDB-side snippet builders (oracle SQL fragments) -----

  /** DuckDB: words of trimmed text. */
  def oWords(text: String): String = s"string_split_regex(trim($text), ' +')"

  /** DuckDB: word 3-grams of a words-list expression `ws`. */
  def oGrams3(ws: String): String =
    s"CASE WHEN len($ws) < 3 THEN [] ELSE list_transform(range(1, len($ws) - 1), " +
      s"i -> array_to_string(($ws)[i:i+2], ' ')) END"

  /** DuckDB: 30-bit gram values mirroring [[gramVals]]. */
  def oGramVals(grams: String): String =
    s"list_transform($grams, g -> ${oMd5Val("g", 15)} % ${1L << 30})"

  /** DuckDB: numeric MinHash signature from a gram-values column
    * (compute gvs in a prior CTE with [[oGramVals]]). */
  def oMinhashSigFromGvs(gvs: String): String = {
    val hashes = (0 until MinhashK).map(j =>
      s"list_min(list_transform($gvs, v -> (v * ${minhashA(j)} + ${minhashB(j)}) % $MinhashP))")
    s"[${hashes.mkString(", ")}]"
  }

  /** DuckDB: numeric value of first `digits` hex chars of md5(expr). */
  def oMd5Val(e: String, digits: Int): String =
    s"list_reduce([0] || list_transform(range(1, ${digits + 1}), " +
      s"i -> instr('0123456789abcdef', (md5($e))[i:i]) - 1), (a, b) -> a * 16 + b)"

  /** DuckDB: numeric value of hex chars `start .. start+digits-1`
    * (1-based) of md5(expr) — the offset twin of [[oMd5Val]], mirroring
    * [[graft.functions.GramHashes120]]'s lo half (start = 16). `digits`
    * ≤ 15 keeps the fold inside signed BIGINT. */
  def oMd5ValAt(e: String, start: Int, digits: Int): String =
    s"list_reduce([0] || list_transform(range($start, ${start + digits}), " +
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

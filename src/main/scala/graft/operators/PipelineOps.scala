package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import OpUtils._

/** Composed curation pipeline over `documents` — the audit frame a
  * training-data run actually ships: every document gets a verdict with
  * provenance (which stage dropped it), not just a filtered table.
  *
  * Scale design (100 TB): the whole pipeline is ONE pass + ONE shuffle.
  * Quality signals (word count, stopword ratio, mean word length — the
  * t02 score) compute map-side; exact dedup needs only a 16-byte
  * binary md5 hash shuffle; and the stage verdict is a single
  * row_number window over that same partitioning (no joins, no second
  * pass). Verdict precedence: quality first — a document whose text
  * fails the score reports 'quality' even when it is also a duplicate
  * (quality is text-determined, so every member of an exact-hash group
  * scores identically and the group fails or survives as one); among
  * surviving groups the min-id copy is 'kept', the rest 'exact_dup'.
  * PlanSpec asserts the one-shuffle shape; PipelineCompositionSpec
  * pins the verdict semantics on a constructed corpus.
  */
object PipelineOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("p01_curated_corpus",
      (s, d) => {
        val q = Tables.documents(s, d)
          .withColumn("ws", words(col("text")))
          .withColumn("n_words", size(col("ws")))
          .withColumn("stop_hits",
            size(filter(col("ws"), w => w.isin("the", "a", "of", "and", "to"))))
          .withColumn("sum_len",
            aggregate(transform(col("ws"), w => length(w)), lit(0), (a, b) => a + b))
          .withColumn("quality",
            least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.5 +
              (col("stop_hits").cast("double") / col("n_words")) * 0.3 +
              least((col("sum_len").cast("double") / col("n_words")) / 8.0, lit(1.0)) * 0.2)
          .withColumn("h", unhex(md5(trim(col("text")))))
        q.withColumn("rn",
            row_number().over(Window.partitionBy(col("h")).orderBy(col("doc_id"))))
          .withColumn("stage",
            when(col("quality") < 0.5, lit("quality"))
              .when(col("rn") > 1, lit("exact_dup"))
              .otherwise(lit("kept")))
          .select(col("doc_id"), col("lang"), col("source"), col("n_words"),
            col("quality"), col("stage"))
          .orderBy(col("doc_id"))
      },
      s"""WITH q AS (
         |  SELECT doc_id, lang, source, text, ${oWords("text")} AS ws FROM documents),
         |m AS (
         |  SELECT doc_id, lang, source, unhex(md5(trim(text))) AS h,
         |    len(ws) AS n_words,
         |    len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS stop_hits,
         |    list_reduce([0] || list_transform(ws, w -> length(w)), (a, b) -> a + b) AS sum_len
         |  FROM q),
         |sc AS (
         |  SELECT doc_id, lang, source, h, n_words,
         |    least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5 +
         |      (CAST(stop_hits AS DOUBLE) / n_words) * 0.3 +
         |      least((CAST(sum_len AS DOUBLE) / n_words) / 8.0, 1.0) * 0.2 AS quality
         |  FROM m),
         |st AS (
         |  SELECT doc_id, lang, source, n_words, quality,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
         |  FROM sc)
         |SELECT doc_id, lang, source, n_words, quality,
         |  CASE WHEN quality < 0.5 THEN 'quality'
         |       WHEN rn > 1 THEN 'exact_dup' ELSE 'kept' END AS stage
         |FROM st ORDER BY doc_id""".stripMargin)
  )
}

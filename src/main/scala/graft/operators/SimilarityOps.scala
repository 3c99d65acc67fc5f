package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import OpUtils._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - s01: brute-force cosine top-k — the exactness baseline. At scale
  *    this is a broadcast of the (small) query set against a partitioned
  *    corpus: corpus-side map + per-query top-k (no corpus shuffle).
  *  - s02: random-hyperplane LSH bucketing — the 100 TB path. Bucket
  *    signatures are computed map-side; the join touches only matching
  *    buckets, so work scales with bucket occupancy, not corpus size.
  *
  * Hyperplanes are derived deterministically from md5 so the DuckDB
  * oracle computes identical buckets (w[p][j] = +1 iff first hex digit of
  * md5(p||'_'||j) >= 8).
  */
object SimilarityOps {

  /** Centroid table cache per (session, dir) — the coarse quantizer is
    * built once and reused by every IVF query, the session-local
    * analogue of a persisted centroid table at cluster scale. */
  private val centCache = scala.collection.concurrent.TrieMap[(Int, String), DataFrame]()

  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
  }

  private val oVecs = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  /** Per-label centroid table (the IVF coarse quantizer), built once per
    * (session, dir) and persisted. Means are exact fixed-point sums —
    * order-independent, O(1) agg state (see s03).
    *
    * r14 (guide §1.2 per-task work): the fixed-point sums ride LONG
    * buffers, not DECIMAL(28,0) — `round(x*1e7)` is already an exact
    * integer double, so long and decimal sum the identical integers and
    * their final double casts agree bit-for-bit, but the decimal form
    * paid a Decimal allocation + overflow check per row PER DIMENSION
    * (64× per input row here). The oracle keeps DECIMAL as the semantic
    * spec. Bound: |v[i]| ≤ O(1), so a long overflows only past ~1e11
    * rows per label — far beyond any gate SF; at true 100 TB label
    * cardinalities revisit with a two-level (long partial, decimal
    * final) cascade. */
  private def centroids(s: SparkSession, d: String, e: DataFrame): DataFrame =
    centCache.getOrElseUpdate((System.identityHashCode(s), d),
      e.groupBy(col("label"))
        .agg(array((1 to 64).map(dim =>
          sum(round(element_at(col("v"), dim) * lit(1e7)).cast("long"))
            .cast("double") / lit(1e7) / count(lit(1))): _*).as("cv"))
        .persist())

  /** The s04/s05 shared oracle CTE for the centroid table. */
  private val oCents =
    s"""SELECT label, ${(1 to 64).map(i =>
         s"CAST(SUM(CAST(round(v[$i] * 1e7) AS DECIMAL(28,0))) AS DOUBLE) / 1e7 / COUNT(*)")
         .mkString("[", ", ", "]")} AS cv
       |  FROM e GROUP BY label""".stripMargin

  /** Hyperplane sign matrix w[p][j] ∈ {+1,−1}, p < 8, j ∈ 1..64, derived
    * ONCE from md5(p+"_"+j) — the identical values the oracle re-derives
    * per row. Precomputing drops the per-row cost from 512 interpreted
    * md5/instr/substring calls to 512 codegen'd adds/negates. */
  private val hyperplaneSigns: IndexedSeq[IndexedSeq[Double]] =
    (0 until 8).map { p =>
      (1 to 64).map { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(s"${p}_$j".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
      }
    }

  /** 8-bit LSH bucket from sign of 8 hyperplane projections. The fold is
    * unrolled left-associated from an explicit 0.0 accumulator — the same
    * FP op order as the oracle's list_reduce, so buckets are bitwise
    * identical (negate/identity are exact, so ±v[j] matches the oracle's
    * CASE arm exactly). Fully inside whole-stage codegen: no higher-order
    * functions, no per-row hashing. */
  /** 8-bit hyperplane LSH bucket — the native `hyperplane_bucket8`
    * expression (r13): the unrolled ~512-node fold, instantiated on
    * both sides of d10's self-join, pushed the join stage's generated
    * method past janino's 64 KB limit and the whole stage silently ran
    * INTERPRETED. One plan node keeps the stage inside whole-stage
    * codegen; [[bucketColUnrolled]] stays as the spec's bit-equality
    * reference. Callers register GraftFunctions via [[vecs]]. */
  private def bucketCol(v: Column): Column =
    call_function("hyperplane_bucket8", v)

  /** The original declarative fold — retained ONLY as the
    * HyperplaneBucket8Spec bit-exactness reference. */
  def bucketColUnrolled(v: Column): Column =
    (0 until 8).map { p =>
      val proj = hyperplaneSigns(p).zipWithIndex.foldLeft(lit(0.0)) {
        case (acc, (sgn, j0)) =>
          val x = element_at(v, j0 + 1)
          acc + (if (sgn > 0) x else -x)
      }
      when(proj > lit(0.0), lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  private val oBucketExpr =
    """list_reduce([0] || list_transform(range(0, 8), p ->
      |    CASE WHEN list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 65),
      |           j -> CASE WHEN instr('0123456789abcdef',
      |                  (md5(p || '_' || j))[1:1]) - 1 >= 8
      |                THEN v[j] ELSE -v[j] END), (a, b) -> a + b) > 0
      |         THEN (1 << p) ELSE 0 END), (a, b) -> a + b)""".stripMargin

  /** s17's multi-table sign tensor: [table][plane][dim] over the 65-dim
    * MIPS-augmented space. 16 tables × 5 planes — the recall lever
    * single-table sign-LSH lacks (s08 MEASURES that tier at ~0.01
    * recall@10 on this corpus; the union of 16 independent 32-bucket
    * partitions reads 0.85 recall@3 at a 41% candidate fraction here).
    * Seed recipe md5("{t}t{p}_{j}") keeps tables independent of each
    * other and of the s02 planes. */
  private val MipsTables = 16
  private val MipsBits = 5
  private[graft] val mipsSigns: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    (0 until MipsTables).map { t =>
      (0 until MipsBits).map { p =>
        (1 to 65).map { j =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val h = md.digest(s"${t}t${p}_$j".getBytes("UTF-8"))
          if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
        }
      }
    }

  /** Table-t bucket of the 65-dim augmented vector — the s02 unrolled
    * left-associated fold per plane, so buckets are bitwise equal to
    * the oracle's list_reduce. Retired from s17's plan (the unrolled
    * form is a compile bomb — see functions/MipsBuckets.scala); kept as
    * the independent truth MipsBucketsSpec checks the native expression
    * against. */
  private[graft] def mipsBucketCol(t: Int, va: Column): Column =
    (0 until MipsBits).map { p =>
      val proj = mipsSigns(t)(p).zipWithIndex.foldLeft(lit(0.0)) {
        case (acc, (sgn, j0)) =>
          val x = element_at(va, j0 + 1)
          acc + (if (sgn > 0) x else -x)
      }
      when(proj > lit(0.0), lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** All 16 (table, bucket) pairs for an augmented vector, as one
    * explodable array column. Spec-only — see [[mipsBucketCol]]. */
  private[graft] def mipsTableBuckets(va: Column): Column =
    array((0 until MipsTables).map(t =>
      struct(lit(t).as("t"), mipsBucketCol(t, va).as("bucket"))): _*)

  /** DuckDB mirror: bucket of `va` for table column `t`. */
  private val oMipsBucketExpr =
    s"""list_reduce([0] || list_transform(range(0, $MipsBits), p ->
       |    CASE WHEN list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 66),
       |           j -> CASE WHEN instr('0123456789abcdef',
       |                  (md5(t || 't' || p || '_' || j))[1:1]) - 1 >= 8
       |                THEN va[j] ELSE -va[j] END), (a, b) -> a + b) > 0
       |         THEN (1 << p) ELSE 0 END), (a, b) -> a + b)""".stripMargin

  /** d10's corpus-derived blocking granularity: cells = 2^k for the
    * largest k in 0..8 with n > 40·2^(k-1) — the integer-threshold form
    * of 2^ceil(log2(n / (10 labels × 4 docs/block))) clamped to
    * [1, 256]. Integer comparisons only, so Spark and the oracle's CASE
    * ladder agree bit-exactly at every n (BlockingCellsSpec pins the
    * curve incl. the exact threshold edges). */
  private[operators] def blockCells(n: Column): Column =
    (1 to 8).foldLeft(lit(1)) { (smaller, k) =>
      when(n > lit(40L << (k - 1)), lit(1 << k)).otherwise(smaller)
    }

  val all: Seq[QueryDef] = Seq(

    // -- brute-force cosine top-5 for the first 10 query vectors -------
    QueryDef.sql("s01_knn_bruteforce",
      (s, d) => {
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        q.join(e.filter(col("vec_id") >= 10).select(col("vec_id").as("n_id"), col("v")))
          .withColumn("cos", cosine(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |c AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id >= 10),
         |r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM c)
         |SELECT q_id, n_id, cos, rnk FROM r
         |WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // -- LSH-bucketed ANN: same-bucket candidates, exact re-rank -------
    QueryDef.sql("s02_ann_lsh",
      (s, d) => {
        val e = vecs(s, d).withColumn("bucket", bucketCol(col("v")))
        val q = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
        val cand = q.join(e.filter(col("vec_id") >= 50), Seq("bucket"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        cand
          .select(col("q_id"), col("vec_id").as("n_id"),
            cosine(col("qv"), col("v")).as("cos"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS (
         |  SELECT vec_id, v, $oBucketExpr AS bucket FROM ($oVecs)),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id < 50),
         |c AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id >= 50),
         |r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM c)
         |SELECT q_id, n_id, cos, rnk FROM r
         |WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // -- IVF search: coarse centroids -> probe best cell -> exact rank --
    // The inverted-file path at scale: centroid table is tiny
    // (broadcast), each query touches ONE cell's vectors instead of the
    // corpus. Centroid means are exact fixed-point sums: each coord is
    // quantized to 1e-7 (below float noise) and summed as DECIMAL —
    // order-independent and O(1) state per group, so the build is one
    // map-side-combined aggregation with no per-cell lists (a
    // collect_list fold would hold O(cell size) memory per key at
    // 100 TB) and no 64x posexplode row blowup. DuckDB mirrors the
    // same quantize/sum/divide sequence, so doubles are identical.
    QueryDef.sql("s04_ivf_search",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val q = e.filter(col("vec_id") < 30).select(col("vec_id").as("q_id"), col("v").as("qv"))
        val wc = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
        val best = q.crossJoin(broadcast(cents))
          .withColumn("cos_c", cosine(col("qv"), col("cv")))
          .withColumn("r", row_number().over(wc))
          .filter(col("r") === 1)
          .select(col("q_id"), col("qv"), col("label"))
        val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        best.as("b").join(e.as("c"),
            col("c.label") === col("b.label") && col("c.vec_id") =!= col("b.q_id"))
          .select(col("b.q_id").as("q_id"), col("c.vec_id").as("n_id"),
            cosine(col("b.qv"), col("c.v")).as("cos"))
          .withColumn("rnk", row_number().over(wr))
          .filter(col("rnk") <= 3)
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |cents AS ($oCents),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 30),
         |scored AS (
         |  SELECT q.q_id, q.qv, c.label, ${oCosine("q.qv", "c.cv")} AS cos_c
         |  FROM q CROSS JOIN cents c),
         |best AS (
         |  SELECT q_id, qv, label FROM (
         |    SELECT q_id, qv, label,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_c DESC, label) AS r
         |    FROM scored) WHERE r = 1),
         |cand AS (
         |  SELECT b.q_id, e.vec_id AS n_id, ${oCosine("b.qv", "e.v")} AS cos
         |  FROM best b JOIN e ON e.label = b.label AND e.vec_id != b.q_id),
         |r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM cand)
         |SELECT q_id, n_id, cos, rnk FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // -- centroid per label (the IVF coarse-quantizer build step) ------
    // Exact fixed-point sums (quantize to 1e-7, sum as DECIMAL): order-
    // independent, so partial/map-side aggregation is safe and no
    // per-group list is ever materialized — the r1 collect_list fold
    // was O(cell size) memory per key, an OOM at 100 TB cells.
    QueryDef.sql("s03_label_centroids",
      (s, d) => {
        def fxSum(dim: Int) =
          // r14: long buffer, bit-identical to the DECIMAL(28,0) sum —
          // see the centroids() note
          sum(round(element_at(col("v"), dim) * lit(1e7)).cast("long"))
            .cast("double") / lit(1e7)
        vecs(s, d)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            fxSum(1).as("sum_d1"),
            fxSum(64).as("sum_d64"))
          .orderBy(col("label"))
      },
      s"""SELECT label, COUNT(*) AS n,
         |  CAST(SUM(CAST(round(v[1] * 1e7) AS DECIMAL(28,0))) AS DOUBLE) / 1e7 AS sum_d1,
         |  CAST(SUM(CAST(round(v[64] * 1e7) AS DECIMAL(28,0))) AS DOUBLE) / 1e7 AS sum_d64
         |FROM ($oVecs)
         |GROUP BY label
         |ORDER BY label""".stripMargin),

    // -- IVF multiprobe: probe the 2 nearest cells, exact re-rank ------
    // The recall knob of an IVF index: nprobe=2 doubles the candidate
    // set while still touching a constant number of cells per query —
    // the same broadcast-centroids + cell-join plan as s04, so the
    // 100 TB shape is unchanged (work scales with probed-cell size, not
    // corpus size).
    QueryDef.sql("s05_ivf_multiprobe",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("q_id"), col("v").as("qv"))
        val wc = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
        val probed = q.crossJoin(broadcast(cents))
          .withColumn("cos_c", cosine(col("qv"), col("cv")))
          .withColumn("r", row_number().over(wc))
          .filter(col("r") <= 2)
          .select(col("q_id"), col("qv"), col("label"))
        val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        probed.as("b").join(e.as("c"),
            col("c.label") === col("b.label") && col("c.vec_id") =!= col("b.q_id"))
          .select(col("b.q_id").as("q_id"), col("c.vec_id").as("n_id"),
            cosine(col("b.qv"), col("c.v")).as("cos"))
          .withColumn("rnk", row_number().over(wr))
          .filter(col("rnk") <= 3)
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |cents AS ($oCents),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
         |scored AS (
         |  SELECT q.q_id, q.qv, c.label, ${oCosine("q.qv", "c.cv")} AS cos_c
         |  FROM q CROSS JOIN cents c),
         |probed AS (
         |  SELECT q_id, qv, label FROM (
         |    SELECT q_id, qv, label,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_c DESC, label) AS r
         |    FROM scored) WHERE r <= 2),
         |cand AS (
         |  SELECT b.q_id, e.vec_id AS n_id, ${oCosine("b.qv", "e.v")} AS cos
         |  FROM probed b JOIN e ON e.label = b.label AND e.vec_id != b.q_id),
         |r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM cand)
         |SELECT q_id, n_id, cos, rnk FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // -- int8 embedding quantization (scale + quantized vector) --------
    // The storage/compute shrink step of a vector pipeline: per-vector
    // symmetric int8 quantization (scale = 127/max|x|, q = floor(x*s +
    // 0.5)). Map-side only. floor(x+0.5) instead of round() because the
    // two engines disagree on round()'s tie rule but agree bit-for-bit
    // on floor. Quantized values ship as a pipe-joined string: flat
    // strings hash identically cross-engine (the d02 lesson).
    QueryDef.sql("s06_embedding_quantize",
      (s, d) => vecs(s, d)
        .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
        .filter(col("mx") > 0)
        .withColumn("scale", lit(127.0) / col("mx"))
        .select(col("vec_id"), col("scale"),
          concat_ws("|", transform(col("v"),
            x => floor(x * col("scale") + lit(0.5)).cast("long").cast("string")))
            .as("q"))
        .orderBy(col("vec_id")),
      s"""WITH e AS ($oVecs),
         |m AS (
         |  SELECT vec_id, v,
         |    list_max(list_transform(v, x -> abs(x))) AS mx
         |  FROM e),
         |s AS (
         |  SELECT vec_id, v, CAST(127.0 AS DOUBLE) / mx AS scale
         |  FROM m WHERE mx > 0)
         |SELECT vec_id, scale,
         |  array_to_string(list_transform(v,
         |    x -> CAST(CAST(floor(x * scale + 0.5) AS BIGINT) AS VARCHAR)), '|') AS q
         |FROM s
         |ORDER BY vec_id""".stripMargin),

    // -- k-NN over int8-quantized vectors (the s06 vectors in use) -----
    // The quantized search path: candidates rank by the INTEGER dot
    // product of int8 codes — exact arithmetic, so the ranking is
    // bit-stable under any partitioning/merge order (no FP reduction in
    // the hot path at all); the exact cosine is computed only for the
    // k winners. At 100 TB: 4x smaller vectors to scan and an
    // integer-SIMD inner loop, with FP touched k times per query.
    QueryDef.sql("s07_quantized_knn",
      (s, d) => {
        val e = vecs(s, d)
          .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
          .filter(col("mx") > 0)
          .withColumn("q8", transform(col("v"),
            x => floor(x * (lit(127.0) / col("mx")) + lit(0.5)).cast("long")))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("q8").as("qq"), col("v").as("qv"))
        val c = e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("n_id"), col("q8"), col("v"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("dot8").desc, col("n_id"))
        // native codegen'd integer dot (functions.Int8Dot) — one tight
        // generated loop instead of two HOFs + a lambda per element;
        // integer addition is associative, so the oracle fold matches
        q.join(c)
          .withColumn("dot8",
            graft.functions.GraftFunctions.int8Dot(col("qq"), col("q8")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("n_id"), col("dot8"),
            cosine(col("qv"), col("v")).as("cos_exact"), col("rnk"))
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e0 AS ($oVecs),
         |e AS (
         |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
         |  FROM e0),
         |k AS (
         |  SELECT vec_id, v, list_transform(v,
         |    x -> CAST(floor(x * (CAST(127.0 AS DOUBLE) / mx) + 0.5) AS BIGINT)) AS q8
         |  FROM e WHERE mx > 0),
         |q AS (SELECT vec_id AS q_id, q8 AS qq, v AS qv FROM k WHERE vec_id < 10),
         |c AS (SELECT vec_id AS n_id, q8, v FROM k WHERE vec_id >= 10),
         |sc AS (
         |  SELECT q.q_id, c.n_id,
         |    list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, len(q.qq) + 1),
         |      i -> (q.qq)[i] * (c.q8)[i]), (a, b) -> a + b) AS dot8,
         |    ${oCosine("q.qv", "c.v")} AS cos_exact
         |  FROM q CROSS JOIN c),
         |r AS (
         |  SELECT q_id, n_id, dot8, cos_exact,
         |    row_number() OVER (PARTITION BY q_id ORDER BY dot8 DESC, n_id) AS rnk
         |  FROM sc)
         |SELECT q_id, n_id, dot8, cos_exact, rnk FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // -- embedding near-dup with label × LSH-cell blocking --------------
    // d06 at the scale d06 can't reach: d06 blocks on label alone, and a
    // FIXED label count means block sizes grow linearly with the corpus,
    // the pair join quadratically (measured 40× work at 10× data at sf1,
    // STATUS.md r4). Sharding the blocking key with the s02 hyperplane
    // bucket caps expected block size — the scale-safe blocking rule:
    // expected block size must stay O(1) as the corpus grows, so the
    // blocking key must GAIN BITS as the corpus does. That rule is code
    // here, not a hand-picked literal: the cell count is the integer-
    // threshold form of 2^ceil(log2(n / (10 labels × 4 docs/block)))
    // clamped to [1, 256], derived from a COUNT(*) computed inside the
    // plan (1-row broadcast, no driver collect) and re-derived
    // identically by the oracle — integer comparisons, so both engines
    // agree bit-exactly. n=500 (sf0.01) → 16 cells (4 of the 8 sign
    // bits, the r4 dial position); n=5,000 (sf0.1) → 128; n>5,120
    // (sf1+) → all 256. The contract changes from d06's exact-within-
    // label to LSH recall: a candidate must agree on the low
    // log2(cells) hyperplane sign bits, the standard (1 − θ/π)^bits
    // recall curve — the recall/cost dial, not a defect — which is why
    // d10 is a VARIANT query rather than a replacement; d06 remains the
    // exact-within-label reference.
    QueryDef.sql("d10_embedding_neardup_lsh",
      (s, d) => {
        val e0 = vecs(s, d)
        val nrows = e0.select(count(lit(1)).as("n"))
        val e = e0.crossJoin(broadcast(nrows))
          .withColumn("bucket", pmod(bucketCol(col("v")), blockCells(col("n"))))
          .drop("n")
        e.as("a").join(e.as("b"),
            col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
            cosine(col("a.v"), col("b.v")).as("cos"))
          .filter(col("cos") >= 0.30)
          .orderBy(col("a_id"), col("b_id"))
      },
      s"""WITH nr AS (SELECT COUNT(*) AS n FROM embeddings),
         |cl AS (SELECT ${(8 to 1 by -1).map(k =>
             s"WHEN n > ${40L << (k - 1)} THEN ${1 << k}")
             .mkString("CASE ", " ", " ELSE 1 END")} AS cells FROM nr),
         |e AS (
         |  SELECT vec_id, label, v, ($oBucketExpr) % cells AS bucket
         |  FROM ($oVecs) CROSS JOIN cl),
         |p AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, ${oCosine("a.v", "b.v")} AS cos
         |  FROM e a JOIN e b
         |    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT a_id, b_id, cos FROM p
         |WHERE cos >= 0.30
         |ORDER BY a_id, b_id""".stripMargin),

    // -- SemDeDup: semantic dedup over k-means-style cells --------------
    // The embedding-space dedup DECISION operator (the SemDeDup shape:
    // cluster, compare within clusters, keep one representative):
    // unlike d06/d10, which emit pair lists over the TRUE label column,
    // d16 runs the actual k-means assignment step — every vector is
    // assigned to its nearest centroid from the persisted IVF codebook
    // (s03's fixed-point table) — and emits a per-vector KEEP/DROP
    // verdict: drop iff a lower-id vector within cosine >= 0.30 shares
    // the cell (greedy min-id representative, the d03 convention).
    // 100 TB shape: assignment is a broadcast of the (bounded) codebook
    // folded map-side — NO corpus shuffle, no per-vector window (the
    // argmax fold is order-independent: total order on (cos, cell)) —
    // and the within-cell pair join is sub-blocked by the d10 LSH cell
    // ladder, so expected block size stays O(1) as the corpus grows
    // (the paper's cluster count k ∝ n, expressed as in-plan blocking
    // bits). The verdict join's build side is only vectors WITH dups.
    QueryDef.sql("d16_semantic_dedup",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
          .select(col("label").cast("long").as("cell"), col("cv"))
        val centArr = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
        val nrows = e.select(count(lit(1)).as("n"))
        val assigned = e.crossJoin(broadcast(centArr)).crossJoin(broadcast(nrows))
          .withColumn("best", aggregate(col("cents"),
            struct(lit(-2.0).as("s"), lit(-1L).as("c")),
            (acc, x) => {
              val sc = cosine(col("v"), x.getField("cv"))
              when(sc > acc.getField("s") ||
                  (sc === acc.getField("s") && x.getField("cell") < acc.getField("c")),
                struct(sc.as("s"), x.getField("cell").as("c")))
                .otherwise(acc)
            }))
          .select(col("vec_id"), col("v"), col("best").getField("c").as("cell"),
            pmod(bucketCol(col("v")), blockCells(col("n"))).as("sub"))
        val dups = assigned.as("x").join(assigned.as("y"),
            col("x.cell") === col("y.cell") && col("x.sub") === col("y.sub") &&
              col("x.vec_id") > col("y.vec_id"))
          .filter(cosine(col("x.v"), col("y.v")) >= 0.30)
          .groupBy(col("x.vec_id").as("vec_id"))
          .agg(count(lit(1)).as("n_dups"))
        assigned.select(col("vec_id"), col("cell"))
          .join(dups, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"))
          .withColumn("keep", col("n_dups") === 0)
          .orderBy(col("vec_id"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cents AS (SELECT CAST(label AS BIGINT) AS cell, cv FROM cents0),
         |nr AS (SELECT COUNT(*) AS n FROM e),
         |cl AS (SELECT ${(8 to 1 by -1).map(k =>
             s"WHEN n > ${40L << (k - 1)} THEN ${1 << k}")
             .mkString("CASE ", " ", " ELSE 1 END")} AS cells FROM nr),
         |ass0 AS (
         |  SELECT e.vec_id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCosine("e.v", "c.cv")} DESC, c.cell) AS r
         |  FROM e CROSS JOIN cents c),
         |ass AS (
         |  SELECT vec_id, v, cell, ($oBucketExpr) % cells AS sub
         |  FROM (SELECT vec_id, v, cell FROM ass0 WHERE r = 1) CROSS JOIN cl),
         |dups AS (
         |  SELECT x.vec_id, COUNT(*) AS n_dups
         |  FROM ass x JOIN ass y
         |    ON x.cell = y.cell AND x.sub = y.sub AND x.vec_id > y.vec_id
         |  WHERE ${oCosine("x.v", "y.v")} >= 0.30
         |  GROUP BY x.vec_id)
         |SELECT a.vec_id, a.cell,
         |  CAST(COALESCE(d.n_dups, 0) AS BIGINT) AS n_dups,
         |  COALESCE(d.n_dups, 0) = 0 AS keep
         |FROM ass a LEFT JOIN dups d ON d.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin),

    // -- ANN quality measurement: recall@10 of the LSH tier ------------
    // The eval operator an ANN deployment ships next to its index: for
    // a fixed query sample, compute the EXACT top-10 (the s01 brute
    // path) and the LSH top-10 (the s02 bucket path), and report
    // per-query recall = |truth ∩ lsh| / |truth|. The recall number is
    // a ratio of integer set sizes, so it is bit-exact cross-engine —
    // the approximation itself becomes oracle-checkable, the same move
    // q34 makes for HLL. Truth is a LEFT join against the LSH set (an
    // LSH miss must surface as recall < 1, not as a dropped row).
    // 100 TB shape: the query sample is fixed-size (broadcast on both
    // arms); the brute arm is corpus-map + per-query top-k — the
    // documented-linear exactness pass an eval run pays ONCE per index
    // build, while the LSH arm it certifies touches only matching
    // buckets. Per-query windows rank |sample|-keyed groups, never the
    // corpus.
    QueryDef.sql("s08_recall_eval",
      (s, d) => {
        val e = vecs(s, d)
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val truth = q.join(e.filter(col("vec_id") >= 20)
            .select(col("vec_id").as("n_id"), col("v")))
          .withColumn("cos", cosine(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("n_id"))
        val eb = e.withColumn("bucket", bucketCol(col("v")))
        val qb = eb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
        val lsh = qb.join(eb.filter(col("vec_id") >= 20), Seq("bucket"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            cosine(col("qv"), col("v")).as("cos"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
        truth.join(lsh, Seq("q_id", "n_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_truth"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .withColumn("recall", col("n_hit").cast("double") / col("n_truth"))
          .orderBy(col("q_id"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
         |tc AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id >= 20),
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |    FROM tc) WHERE rnk <= 10),
         |eb AS (SELECT vec_id, v, $oBucketExpr AS bucket FROM e),
         |qb AS (SELECT vec_id AS q_id, v AS qv, bucket FROM eb WHERE vec_id < 20),
         |lc AS (
         |  SELECT qb.q_id, eb.vec_id AS n_id, ${oCosine("qb.qv", "eb.v")} AS cos
         |  FROM qb JOIN eb ON qb.bucket = eb.bucket AND eb.vec_id >= 20),
         |lsh AS (
         |  SELECT q_id, n_id, 1 AS hit FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |    FROM lc) WHERE rnk <= 10)
         |SELECT t.q_id, COUNT(*) AS n_truth,
         |  CAST(SUM(COALESCE(l.hit, 0)) AS BIGINT) AS n_hit,
         |  CAST(SUM(COALESCE(l.hit, 0)) AS DOUBLE) / COUNT(*) AS recall
         |FROM truth t LEFT JOIN lsh l ON l.q_id = t.q_id AND l.n_id = t.n_id
         |GROUP BY t.q_id
         |ORDER BY t.q_id""".stripMargin),

    // -- product-quantization ADC search (the IVF-PQ compression tier) --
    // The missing piece between s06's scalar int8 (4× compression) and
    // a production vector index: PQ stores each vector as m=8 sub-space
    // CODE bytes — here 64 doubles (512 B) become 8 codes, a 64×
    // memory cut — and ranks by Asymmetric Distance Computation: the
    // query precomputes one distance table per chunk (8×10 doubles) and
    // each corpus vector costs 8 table lookups, no float math per pair.
    // Codebooks are the persisted s03/s04 fixed-point centroids sliced
    // into 8-dim chunks (bounded: 10 codes/chunk here, k=256 in
    // production — same plan shape). 100 TB: encode is a map-side fold
    // over the broadcast codebook (order-independent total order on
    // (dist, code) — no per-vector window); the scan ships only (vec_id,
    // codes) — the 64×-smaller frame is what a 1000-executor scan
    // actually reads. Every distance is a fixed-order left fold, so ADC
    // values — and therefore ranks — are bit-exact cross-engine.
    QueryDef.sql("s09_pq_search",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = vecs(s, d)
        val cb = centroids(s, d, e)
          .select(col("label").cast("long").as("code"), col("cv"))
          .agg(collect_list(struct(col("code"), col("cv"))).as("cb"))
        // native pq_encode/pq_dist_table (r11): one JVM loop per vector
        // instead of the 8-chunk interpreted aggregate-HOF fold —
        // PqCodecSpec pins both bit-equal to the declarative form
        val enc = e.crossJoin(broadcast(cb))
          .select(col("vec_id"),
            call_function("pq_encode", col("v"), col("cb")).as("codes"))
        val q = e.filter(col("vec_id") < 10)
          .crossJoin(broadcast(cb))
          .select(col("vec_id").as("q_id"),
            call_function("pq_dist_table", col("v"), col("cb")).as("qtab"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
        enc.crossJoin(broadcast(q))
          .select(col("q_id"), col("vec_id").as("n_id"),
            (0 until 8).foldLeft(lit(0.0)) { (acc, c) =>
              acc + element_at(element_at(col("qtab"), c + 1),
                (element_at(col("codes"), c + 1) + 1).cast("int"))
            }.as("adc"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("rnk"), col("n_id"), col("adc"))
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cb AS (SELECT CAST(label AS BIGINT) AS code, cv FROM cents0),
         |ch AS (SELECT unnest(range(0, 8)) AS c),
         |cd AS (
         |  SELECT e.vec_id, ch.c, cb.code,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 9),
         |      j -> (e.v[ch.c*8+j] - cb.cv[ch.c*8+j]) *
         |           (e.v[ch.c*8+j] - cb.cv[ch.c*8+j])),
         |      (a, b) -> a + b) AS dist
         |  FROM e CROSS JOIN ch CROSS JOIN cb),
         |enc AS (
         |  SELECT vec_id, c, code FROM (
         |    SELECT vec_id, c, code,
         |      row_number() OVER (PARTITION BY vec_id, c ORDER BY dist, code) AS rk
         |    FROM cd) WHERE rk = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |qd AS (
         |  SELECT q.q_id, ch.c, cb.code,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 9),
         |      j -> (q.qv[ch.c*8+j] - cb.cv[ch.c*8+j]) *
         |           (q.qv[ch.c*8+j] - cb.cv[ch.c*8+j])),
         |      (a, b) -> a + b) AS dist
         |  FROM q CROSS JOIN ch CROSS JOIN cb),
         |pad AS (
         |  SELECT qd.q_id, enc.vec_id AS n_id,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list(qd.dist ORDER BY qd.c),
         |      (a, b) -> a + b) AS adc
         |  FROM enc JOIN qd ON qd.c = enc.c AND qd.code = enc.code
         |  GROUP BY qd.q_id, enc.vec_id),
         |r AS (
         |  SELECT q_id, n_id, adc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rnk
         |  FROM pad)
         |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, adc
         |FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin),

    // -- embedding outlier detection (distance-to-centroid OOD filter) --
    // The embedding-space QUALITY operator a curation run pairs with
    // its dedup tier: the vectors farthest from their own label's
    // centroid are the mislabeled / out-of-distribution candidates a
    // data audit reviews first (the embedding analogue of a CLIP-score
    // floor). Reports the top-20 farthest per label by exact squared
    // L2 distance to the persisted s03/s04 centroid. 100 TB shape: the
    // 10-row centroid table broadcasts, the distance is a map-side
    // fixed-order fold (bit-exact cross-engine), and the per-label
    // top-k window is bounded BEFORE its exchange by Spark's
    // WindowGroupLimit (each map partition forwards at most k rows per
    // label — the same guard p05 leans on), so the 10 hot label
    // partitions never receive the corpus.
    QueryDef.sql("s10_centroid_outliers",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val w = Window.partitionBy(col("label"))
          .orderBy(col("dist2").desc, col("vec_id"))
        e.join(broadcast(cents), Seq("label"))
          .select(col("label"), col("vec_id"),
            (1 to 64).foldLeft(lit(0.0)) { (acc, j) =>
              val dv = element_at(col("v"), j) - element_at(col("cv"), j)
              acc + dv * dv
            }.as("dist2"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 20)
          .select(col("label"), col("rk"), col("vec_id"), col("dist2"))
          .orderBy(col("label"), col("rk"))
      },
      s"""WITH e AS ($oVecs),
         |c AS ($oCents),
         |dd AS (
         |  SELECT e.label, e.vec_id,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 65),
         |      j -> (e.v[j] - c.cv[j]) * (e.v[j] - c.cv[j])),
         |      (a, b) -> a + b) AS dist2
         |  FROM e JOIN c USING (label)),
         |r AS (
         |  SELECT label, vec_id, dist2,
         |    row_number() OVER (PARTITION BY label ORDER BY dist2 DESC, vec_id) AS rk
         |  FROM dd)
         |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, dist2
         |FROM r WHERE rk <= 20
         |ORDER BY label, rk""".stripMargin),

    // -- IVF-PQ search (coarse probe + in-cell ADC rank) ----------------
    // The production vector-index layout, composed from the pieces this
    // tier already ships: s04's coarse probe picks ONE inverted list
    // per query (nearest centroid by cosine), s09's PQ codes are what
    // that list STORES (8 bytes/vector, 64× under the raw doubles),
    // and ranking inside the probed list is pure ADC — 8 table lookups
    // per candidate, no float math against raw vectors at query time.
    // This is exactly FAISS's IVFPQ composition. 100 TB shape: the
    // index scan ships (vec_id, label, codes) — the 64×-compressed
    // frame; centroids and per-query distance tables broadcast; the
    // label equi-join touches one cell per query so work scales with
    // cell occupancy, not corpus size; the per-query top-k is bounded
    // pre-exchange by WindowGroupLimit (the s10/p05 guard). Encode and
    // every ADC sum are fixed-order folds — bit-exact cross-engine.
    QueryDef.sql("s11_ivfpq_search",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val cb = cents
          .select(col("label").cast("long").as("code"), col("cv"))
          .agg(collect_list(struct(col("code"), col("cv"))).as("cb"))
        // the inverted lists: cell = label, payload = the 8 PQ codes
        // (native pq_encode — one JVM loop, PqCodecSpec-pinned)
        val enc = e.crossJoin(broadcast(cb))
          .select(col("vec_id"), col("label"),
            call_function("pq_encode", col("v"), col("cb")).as("codes"))
        // coarse probe: nearest-cosine centroid picks the one cell
        val wc = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
        val q = e.filter(col("vec_id") < 15)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
          .crossJoin(broadcast(cents))
          .withColumn("cos_c", cosine(col("qv"), col("cv")))
          .withColumn("r", row_number().over(wc))
          .filter(col("r") === 1)
          .select(col("q_id"), col("qv"), col("label"))
        val qtab = q.crossJoin(broadcast(cb))
          .select(col("q_id"), col("label"),
            call_function("pq_dist_table", col("qv"), col("cb")).as("qtab"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("n_id"))
        enc.as("c").join(broadcast(qtab).as("b"),
            col("c.label") === col("b.label") && col("c.vec_id") =!= col("b.q_id"))
          .select(col("b.q_id").as("q_id"), col("c.vec_id").as("n_id"),
            (0 until 8).foldLeft(lit(0.0)) { (acc, c) =>
              acc + element_at(element_at(col("qtab"), c + 1),
                (element_at(col("codes"), c + 1) + 1).cast("int"))
            }.as("adc"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("rnk"), col("n_id"), col("adc"))
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cb AS (SELECT CAST(label AS BIGINT) AS code, cv FROM cents0),
         |ch AS (SELECT unnest(range(0, 8)) AS c),
         |cd AS (
         |  SELECT e.vec_id, e.label, ch.c, cb.code,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 9),
         |      j -> (e.v[ch.c*8+j] - cb.cv[ch.c*8+j]) *
         |           (e.v[ch.c*8+j] - cb.cv[ch.c*8+j])),
         |      (a, b) -> a + b) AS dist
         |  FROM e CROSS JOIN ch CROSS JOIN cb),
         |enc AS (
         |  SELECT vec_id, label, c, code FROM (
         |    SELECT vec_id, label, c, code,
         |      row_number() OVER (PARTITION BY vec_id, c ORDER BY dist, code) AS rk
         |    FROM cd) WHERE rk = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 15),
         |qs AS (
         |  SELECT q.q_id, q.qv, c.label, ${oCosine("q.qv", "c.cv")} AS cos_c
         |  FROM q CROSS JOIN cents0 c),
         |best AS (
         |  SELECT q_id, qv, label FROM (
         |    SELECT q_id, qv, label,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos_c DESC, label) AS r
         |    FROM qs) WHERE r = 1),
         |qd AS (
         |  SELECT b.q_id, b.label AS cell, ch.c, cb.code,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 9),
         |      j -> (b.qv[ch.c*8+j] - cb.cv[ch.c*8+j]) *
         |           (b.qv[ch.c*8+j] - cb.cv[ch.c*8+j])),
         |      (a, b) -> a + b) AS dist
         |  FROM best b CROSS JOIN ch CROSS JOIN cb),
         |pad AS (
         |  SELECT qd.q_id, enc.vec_id AS n_id,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list(qd.dist ORDER BY qd.c),
         |      (a, b) -> a + b) AS adc
         |  FROM enc
         |  JOIN qd ON qd.c = enc.c AND qd.code = enc.code AND qd.cell = enc.label
         |  WHERE enc.vec_id != qd.q_id
         |  GROUP BY qd.q_id, enc.vec_id),
         |r AS (
         |  SELECT q_id, n_id, adc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rnk
         |  FROM pad)
         |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, adc
         |FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin),

    // -- radius (range) search: ALL neighbors with cos >= tau ----------
    // The other half of the ANN API surface: s02 answers "top-k", this
    // answers "everything within radius" (the primitive behind d10-style
    // near-dup mining and retrieval-with-threshold). Contract matches
    // s02's: candidates are same-LSH-bucket pairs (the (1 − θ/π)^8
    // recall curve is the dial), then the exact cosine gate — both
    // engines compute the identical candidate set and folds, so the
    // result is deterministic even though the LSH tier is approximate.
    // 100 TB shape: the query side is a bounded broadcast; corpus rows
    // meet it in a map-side hash join keyed by bucket, so corpus-side
    // work is one scan and NO row ever shuffles (vs top-k's per-query
    // window); the neighbor-count rollup shuffles only (q_id, 1) pairs.
    QueryDef.sql("s12_range_search",
      (s, d) => {
        val e = vecs(s, d).withColumn("bucket", bucketCol(col("v")))
        val q = e.filter(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
        // the query side is a fixed ≤50-row frame; AQE broadcasts it
        // (no explicit hint — the bounded-hints guard can't prove a
        // filter's cardinality, and the planner doesn't need the help)
        q.join(e.filter(col("vec_id") >= 50), Seq("bucket"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            cosine(col("qv"), col("v")).as("cos"))
          .filter(col("cos") >= 0.30)
          .orderBy(col("q_id"), col("n_id"))
      },
      s"""WITH e AS (
         |  SELECT vec_id, v, $oBucketExpr AS bucket FROM ($oVecs)),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM e WHERE vec_id < 50),
         |c AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id >= 50)
         |SELECT q_id, n_id, cos FROM c
         |WHERE cos >= 0.30
         |ORDER BY q_id, n_id""".stripMargin),

    // -- cascaded retrieval: low-dim prefix scan, exact re-rank --------
    // The Matryoshka / dimension-cascade pattern: pass 1 ranks the
    // corpus by the dot product of the FIRST 16 of 64 dims (4× less
    // data read — at scale the prefix lives in its own narrow column /
    // index file), keeps the top-20 candidates per query; pass 2
    // re-ranks only those 20 by exact full-width cosine and keeps 5.
    // Both passes are per-query windows over (score DESC, n_id) total
    // orders; Spark's WindowGroupLimit prunes each map partition to
    // the per-query limit BEFORE the exchange, and the second window
    // reuses the first's q_id partitioning (one exchange total,
    // PlanSpec-pinned). Folds are fixed-order from an explicit zero —
    // bit-identical to the oracle's list_reduce.
    QueryDef.sql("s13_cascade_rerank",
      (s, d) => {
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val w1 = Window.partitionBy(col("q_id")).orderBy(col("pd").desc, col("n_id"))
        val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        q.join(e.filter(col("vec_id") >= 10)
            .select(col("vec_id").as("n_id"), col("v")))
          .withColumn("pd", dot(slice(col("qv"), 1, 16), slice(col("v"), 1, 16)))
          .withColumn("r1", row_number().over(w1))
          .filter(col("r1") <= 20)
          .withColumn("cos", cosine(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w2))
          .filter(col("rnk") <= 5)
          .select(col("q_id"), col("rnk"), col("n_id"), col("pd"), col("cos"))
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         |c AS (
         |  SELECT q.q_id, e.vec_id AS n_id, q.qv, e.v,
         |    ${oDot("(q.qv)[1:16]", "(e.v)[1:16]")} AS pd
         |  FROM q CROSS JOIN e WHERE e.vec_id >= 10),
         |p1 AS (
         |  SELECT q_id, n_id, qv, v, pd,
         |    row_number() OVER (PARTITION BY q_id ORDER BY pd DESC, n_id) AS r1
         |  FROM c),
         |p2 AS (
         |  SELECT q_id, n_id, pd, ${oCosine("qv", "v")} AS cos
         |  FROM p1 WHERE r1 <= 20),
         |r AS (
         |  SELECT q_id, n_id, pd, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM p2)
         |SELECT q_id, rnk, n_id, pd, cos FROM r WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin),

    // -- embedding-space health sheet (collapse / drift detection) -----
    // The QA frame an embedding pipeline reads before trusting any
    // downstream ANN tier: per label, the population size, the mean
    // squared norm (a norm drifting to 0 or exploding flags a bad
    // encoder checkpoint), the centroid's squared norm, and the
    // NEAREST OTHER CENTROID with its squared distance — two labels
    // whose centroids nearly coincide mean the space has collapsed for
    // them (s04/s11's coarse quantizer can't separate what the encoder
    // didn't). 100 TB shape: per-row norms fold map-side and sum as
    // quantized decimals (order-independent, O(1) agg state); the
    // centroid table is the persisted 10-row frame, so the
    // nearest-neighbor pass is a broadcast self-join over 90 pairs.
    QueryDef.sql("s14_embedding_health",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val stats = e.withColumn("nrm2", dot(col("v"), col("v")))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            // r14: long buffer, bit-identical (see centroids() note)
            (sum(round(col("nrm2") * lit(1e7)).cast("long"))
              .cast("double") / lit(1e7) / count(lit(1))).as("mean_norm2"))
        val sq = (a: Column, b: Column) =>
          sumFold(zip_with(a, b, (x, y) => (x - y) * (x - y)))
        val w = Window.partitionBy(col("label")).orderBy(col("d2"), col("other"))
        val nn = cents.as("a").join(broadcast(cents.as("b")),
            col("a.label") =!= col("b.label"))
          .select(col("a.label").as("label"), col("b.label").as("other"),
            sq(col("a.cv"), col("b.cv")).as("d2"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("label"), col("other").as("nn_label"), col("d2").as("nn_dist2"))
        stats
          .join(cents.select(col("label"), dot(col("cv"), col("cv")).as("centroid_norm2")),
            Seq("label"))
          .join(nn, Seq("label"))
          .orderBy(col("label"))
      },
      s"""WITH e AS ($oVecs),
         |cents AS ($oCents),
         |st AS (
         |  SELECT label, COUNT(*) AS n_vecs,
         |    CAST(SUM(CAST(round(${oDot("v", "v")} * 1e7) AS DECIMAL(28,0)))
         |      AS DOUBLE) / 1e7 / COUNT(*) AS mean_norm2
         |  FROM e GROUP BY label),
         |cn AS (SELECT label, ${oDot("cv", "cv")} AS centroid_norm2 FROM cents),
         |pd AS (
         |  SELECT a.label, b.label AS other,
         |    ${oSumFold("list_transform(range(1, 65), i -> (a.cv[i] - b.cv[i]) * (a.cv[i] - b.cv[i]))")} AS d2
         |  FROM cents a JOIN cents b ON a.label != b.label),
         |nn AS (
         |  SELECT label, other AS nn_label, d2 AS nn_dist2 FROM (
         |    SELECT label, other, d2,
         |      row_number() OVER (PARTITION BY label ORDER BY d2, other) AS rn
         |    FROM pd) WHERE rn = 1)
         |SELECT st.label, st.n_vecs, st.mean_norm2, cn.centroid_norm2,
         |  nn.nn_label, nn.nn_dist2
         |FROM st JOIN cn USING (label) JOIN nn USING (label)
         |ORDER BY st.label""".stripMargin),

    // -- metadata-filtered ANN (the vector-DB "filtered search") -------
    // Every production vector store exposes "top-k WHERE attribute = X"
    // — and the naive plan (search, then filter) under-fills k when
    // the filter is selective. The scale-correct plan searches INSIDE
    // the filtered partition: corpus vectors are label-partitioned
    // (the attribute IS the inverted-list key here), each query
    // equi-joins exactly its own label's list, so work ∝ the filtered
    // subset — never the corpus — and k always fills when the subset
    // allows. Exact cosine rank inside the cell (the cell is 1/|labels|
    // of the corpus; compose with s02's buckets when cells outgrow
    // memory); WindowGroupLimit bounds the per-query top-k
    // pre-exchange as in s11.
    QueryDef.sql("s15_filtered_knn",
      (s, d) => {
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("label"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        q.join(e.filter(col("vec_id") >= 10)
            .select(col("vec_id").as("n_id"), col("v"), col("label")), Seq("label"))
          .withColumn("cos", cosine(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("q_id"), col("rnk"), col("label"), col("n_id"), col("cos"))
          .orderBy(col("q_id"), col("rnk"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (SELECT vec_id AS q_id, v AS qv, label FROM e WHERE vec_id < 10),
         |c AS (
         |  SELECT q.q_id, q.label, e.vec_id AS n_id, ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q JOIN e ON q.label = e.label AND e.vec_id >= 10),
         |r AS (
         |  SELECT q_id, label, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM c)
         |SELECT q_id, rnk, label, n_id, cos FROM r WHERE rnk <= 3
         |ORDER BY q_id, rnk""".stripMargin),

    // -- binary (sign-bit) embedding search ----------------------------
    // The cheapest ANN tier of all: each vector reduces MAP-SIDE to a
    // 60-bit sign mask in ONE BIGINT (dims 1..60; 61..64 dropped to
    // keep the mask in positive-BIGINT range in both engines — at
    // production dims the mask is an array of words), 64 doubles →
    // 8 bytes, 64× less data than s01's scan and integer-only compare:
    // rank = bit_count(xor(q, n)). s09's PQ needs a codebook; the sign
    // mask needs nothing — it's the tier-0 shortlist in front of an
    // exact re-rank. Top-10 per query by (hamming, n_id) — integers,
    // bit-stable under any partitioning; WindowGroupLimit bounds each
    // query's group before the (q_id, n_id, ham) fixed-width exchange.
    QueryDef.sql("s16_binary_hamming",
      (s, d) => {
        // native sign_mask60 (r12): one generated loop replaces the
        // 60-step interpreted aggregate HOF — same exact bits
        val m = vecs(s, d).select(col("vec_id"),
          graft.functions.GraftFunctions.signMask60(col("v")).as("mask"))
        val q = m.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("mask").as("qm"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("hamming"), col("n_id"))
        m.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("n_id"), col("mask"))
          .join(q)
          .withColumn("hamming", expr("bit_count(qm ^ mask)"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("rnk"), col("n_id"), col("hamming"))
          .orderBy(col("q_id"), col("rnk"))
      }, {
      val oMask = "list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, 61), " +
        "i -> CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) " +
        "ELSE CAST(0 AS BIGINT) END), (a, b) -> a + b)"
      s"""WITH e AS ($oVecs),
         |m AS (SELECT vec_id, $oMask AS mask FROM e),
         |q AS (SELECT vec_id AS q_id, mask AS qm FROM m WHERE vec_id < 10),
         |c AS (
         |  SELECT q.q_id, m.vec_id AS n_id,
         |    CAST(bit_count(xor(q.qm, m.mask)) AS INTEGER) AS hamming
         |  FROM q CROSS JOIN m WHERE m.vec_id >= 10),
         |r AS (
         |  SELECT q_id, n_id, hamming,
         |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, n_id) AS rnk
         |  FROM c)
         |SELECT q_id, rnk, n_id, hamming FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin
      }),

    // -- MIPS (max inner product) through a multi-table LSH tier -------
    // Recommendation/retrieval scores are raw dot products, which no
    // cosine index answers directly. Two composed moves:
    //  1. the norm-augmentation reduction (Bachrach et al. /
    //     Shrivastava-Li): append sqrt(M² − ‖x‖²) to every corpus
    //     vector (M = max corpus norm) and 0 to the query — every
    //     augmented corpus vector then has norm exactly M, so
    //     augmented-cosine order IS dot-product order and any
    //     cosine-ANN structure serves MIPS unchanged;
    //  2. the multi-table recall lever: s08 MEASURES the single-table
    //     8-bit tier at ~0.01 recall@10 on this corpus — one sign
    //     partition is simply too coarse a filter. 16 independent
    //     5-plane tables, candidates = the union of same-(t, bucket)
    //     matches, reads 0.85 avg recall@3 here. At scale the bit
    //     count b grows with log(corpus) (the d10 ladder argument) to
    //     hold the candidate fraction L/2^b down.
    // Scale shape: buckets fold map-side; the 16× explosion carries
    // ONLY (t, bucket, id) fixed-width rows — vectors re-join by id
    // for the exact-dot re-rank after the candidate set is distinct.
    // The s08 audit: recall@3 + candidate counts against the in-plan
    // brute-force dot truth, so the tier's quality is oracle-checked.
    QueryDef.sql("s17_mips_lsh",
      (s, d) => {
        val e = vecs(s, d).withColumn("n2", dot(col("v"), col("v")))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("dp").desc, col("n_id"))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val corpus = e.filter(col("vec_id") >= 20)
        val truth = q.join(corpus.select(col("vec_id").as("n_id"), col("v")))
          .withColumn("dp", dot(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("q_id"), col("n_id"))
        val m2 = corpus.agg(max(col("n2")).as("m2"))
        // native mips_buckets: one codegen'd plan node computing all 16
        // table buckets (bitwise equal to the unrolled fold —
        // MipsBucketsSpec); the former declarative form was a
        // ~5,200-node tree whose analysis+codegen alone cost 42-61 s
        // cold (r7 verdict). posexplode's pos IS the table index.
        val ct = corpus.crossJoin(m2)
          .withColumn("va", concat(col("v"), array(sqrt(col("m2") - col("n2")))))
          .select(col("vec_id"),
            posexplode(graft.functions.GraftFunctions.mipsBuckets(col("va")))
              .as(Seq("t", "bucket")))
        val qt = q
          .withColumn("va", concat(col("qv"), array(lit(0.0))))
          .select(col("q_id"),
            posexplode(graft.functions.GraftFunctions.mipsBuckets(col("va")))
              .as(Seq("t", "bucket")))
        // transientPersist: the candidate set feeds BOTH the per-query
        // count and the exact-dot re-rank — without the barrier the
        // whole 16-table bucket pipeline would run twice. Routed
        // through the bounded registry so replays release the previous
        // frame instead of pinning one per invocation (r7 ADVICE).
        val cand = OpUtils.transientPersist(s, s"s17:$d",
          qt.join(ct, Seq("t", "bucket"))
            .select(col("q_id"), col("vec_id").as("n_id")).distinct())
        val nc = cand.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand"))
        val mips = cand
          .join(corpus.select(col("vec_id").as("n_id"), col("v")), Seq("n_id"))
          .join(q, Seq("q_id"))
          .withColumn("dp", dot(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
        truth.join(mips, Seq("q_id", "n_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_truth"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .join(broadcast(nc), Seq("q_id")) // aggregate-bounded: ≤1 row/query
          .withColumn("recall", col("n_hit").cast("double") / col("n_truth"))
          .select(col("q_id"), col("n_truth"), col("n_hit"), col("n_cand"),
            col("recall"))
          .orderBy(col("q_id"))
      },
      s"""WITH e AS (SELECT vec_id, v, ${oDot("v", "v")} AS n2 FROM ($oVecs)),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
         |tc AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${oDot("q.qv", "e.v")} AS dp
         |  FROM q CROSS JOIN e WHERE e.vec_id >= 20),
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY dp DESC, n_id) AS rnk
         |    FROM tc) WHERE rnk <= 3),
         |m AS (SELECT MAX(n2) AS m2 FROM e WHERE vec_id >= 20),
         |ca AS (
         |  SELECT vec_id, v || [sqrt(m.m2 - n2)] AS va
         |  FROM e, m WHERE vec_id >= 20),
         |ct AS (
         |  SELECT vec_id, t, $oMipsBucketExpr AS bucket
         |  FROM ca, (SELECT unnest(range(0, $MipsTables)) AS t)),
         |qa AS (SELECT q_id, qv || [CAST(0.0 AS DOUBLE)] AS va FROM q),
         |qt AS (
         |  SELECT q_id, t, $oMipsBucketExpr AS bucket
         |  FROM qa, (SELECT unnest(range(0, $MipsTables)) AS t)),
         |cand AS (
         |  SELECT DISTINCT qt.q_id, ct.vec_id AS n_id
         |  FROM qt JOIN ct ON qt.t = ct.t AND qt.bucket = ct.bucket),
         |nc AS (SELECT q_id, COUNT(*) AS n_cand FROM cand GROUP BY q_id),
         |mc AS (
         |  SELECT cand.q_id, cand.n_id, ${oDot("q.qv", "e.v")} AS dp
         |  FROM cand JOIN e ON e.vec_id = cand.n_id JOIN q ON q.q_id = cand.q_id),
         |mips AS (
         |  SELECT q_id, n_id, 1 AS hit FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY dp DESC, n_id) AS rnk
         |    FROM mc) WHERE rnk <= 3)
         |SELECT t.q_id, COUNT(*) AS n_truth,
         |  CAST(SUM(COALESCE(l.hit, 0)) AS BIGINT) AS n_hit,
         |  CAST(MIN(nc.n_cand) AS BIGINT) AS n_cand,
         |  CAST(SUM(COALESCE(l.hit, 0)) AS DOUBLE) / COUNT(*) AS recall
         |FROM truth t
         |LEFT JOIN mips l ON l.q_id = t.q_id AND l.n_id = t.n_id
         |JOIN nc ON nc.q_id = t.q_id
         |GROUP BY t.q_id
         |ORDER BY t.q_id""".stripMargin),

    // -- k-NN label classification (embedding-quality eval) ------------
    // Does the embedding space separate the labels? Leave-one-out 3-NN
    // majority vote on a deterministic 20% query sample, per-label
    // accuracy in integer ppm — the standard probe read before trusting
    // embeddings for curation (a collapsed space scores ~chance). Both
    // the top-3 cut and the vote are (count DESC, label ASC) total
    // orders, so prediction ties break identically cross-engine. 100 TB
    // shape: the s01 contract — the query side is an ABSOLUTE cap
    // (vec_id < 100), not a proportional sample: a pmod-style 20%
    // sample theta-joined against the corpus is O(n²/5) — 20× the work
    // on 10× data (r7 verdict "What's wrong #4"). The accuracy read
    // needs a fixed-size probe, not a census; per-query windows stay
    // WindowGroupLimit-bounded and the final rollup is label-wide.
    QueryDef.sql("s18_knn_classify",
      (s, d) => {
        val e = vecs(s, d)
        val q = e.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("label").as("true_label"),
            col("v").as("qv"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
        val top = q.join(
            e.select(col("vec_id").as("n_id"), col("label").as("n_label"), col("v")),
            col("n_id") =!= col("q_id"))
          .withColumn("cos", cosine(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
        val wv = Window.partitionBy(col("q_id")).orderBy(col("votes").desc, col("n_label"))
        top.groupBy(col("q_id"), col("true_label"), col("n_label"))
          .agg(count(lit(1)).as("votes"))
          .withColumn("vr", row_number().over(wv))
          .filter(col("vr") === 1)
          .groupBy(col("true_label"))
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("n_label") === col("true_label"), 1L).otherwise(0L))
              .as("n_correct"))
          .withColumn("acc_ppm", expr("n_correct * 1000000 div n_queries"))
          .orderBy(col("true_label"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (
         |  SELECT vec_id AS q_id, label AS true_label, v AS qv
         |  FROM e WHERE vec_id < 100),
         |c AS (
         |  SELECT q.q_id, q.true_label, e.vec_id AS n_id, e.label AS n_label,
         |    ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id),
         |r AS (
         |  SELECT q_id, true_label, n_label,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM c),
         |t AS (
         |  SELECT q_id, true_label, n_label, COUNT(*) AS votes
         |  FROM r WHERE rnk <= 3 GROUP BY 1, 2, 3),
         |p AS (
         |  SELECT q_id, true_label, n_label,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY votes DESC, n_label) AS vr
         |  FROM t)
         |SELECT true_label, COUNT(*) AS n_queries,
         |  CAST(SUM(CASE WHEN n_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_correct,
         |  CAST(SUM(CASE WHEN n_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // COUNT(*) AS acc_ppm
         |FROM p WHERE vr = 1
         |GROUP BY true_label
         |ORDER BY true_label""".stripMargin),

    // -- one k-means (Lloyd) iteration over the IVF codebook -----------
    // The codebook REFINEMENT step s04/s09 assume has already happened:
    // re-assign every vector to its best cell (the d16 map-side argmax
    // fold over the broadcast centroid array — no per-vector window, no
    // corpus shuffle beyond the cell rollup), recompute per-cell means
    // with the same exact fixed-point DECIMAL sums as s03 (O(1) agg
    // state, order-independent), and report each cell's population,
    // defection count, and mean drift on the probe dims. Iterating this
    // operator IS distributed k-means; one step is enough to pin the
    // arithmetic contract. 100 TB shape: one fixed-width (cell) shuffle
    // of partial-agg rows; the 10-row codebook join is broadcast.
    QueryDef.sql("s19_kmeans_step",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
          .select(col("label").cast("long").as("cell"), col("cv"))
        val centArr = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
        val assigned = e.crossJoin(broadcast(centArr))
          .withColumn("best", aggregate(col("cents"),
            struct(lit(-2.0).as("s"), lit(-1L).as("c")),
            (acc, x) => {
              val sc = cosine(col("v"), x.getField("cv"))
              when(sc > acc.getField("s") ||
                  (sc === acc.getField("s") && x.getField("cell") < acc.getField("c")),
                struct(sc.as("s"), x.getField("cell").as("c")))
                .otherwise(acc)
            }))
          .select(col("vec_id"), col("label"), col("v"),
            col("best").getField("c").as("cell"))
        def fxSum(dim: Int) =
          // r14: long buffer, bit-identical to the DECIMAL(28,0) sum —
          // see the centroids() note
          sum(round(element_at(col("v"), dim) * lit(1e7)).cast("long"))
            .cast("double") / lit(1e7)
        assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_assigned"),
            sum(when(col("label").cast("long") =!= col("cell"), 1L).otherwise(0L))
              .as("n_defectors"),
            (fxSum(1) / count(lit(1))).as("new_mean_d1"),
            (fxSum(64) / count(lit(1))).as("new_mean_d64"))
          .join(cents, Seq("cell"))
          .select(col("cell"), col("n_assigned"), col("n_defectors"),
            col("new_mean_d1"), col("new_mean_d64"),
            (col("new_mean_d1") - element_at(col("cv"), 1)).as("shift_d1"),
            (col("new_mean_d64") - element_at(col("cv"), 64)).as("shift_d64"))
          .orderBy(col("cell"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cents AS (SELECT CAST(label AS BIGINT) AS cell, cv FROM cents0),
         |ass0 AS (
         |  SELECT e.vec_id, e.label, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCosine("e.v", "c.cv")} DESC, c.cell) AS r
         |  FROM e CROSS JOIN cents c),
         |ass AS (SELECT vec_id, label, v, cell FROM ass0 WHERE r = 1),
         |n AS (
         |  SELECT cell, COUNT(*) AS n_assigned,
         |    CAST(SUM(CASE WHEN CAST(label AS BIGINT) <> cell THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_defectors,
         |    CAST(SUM(CAST(round(v[1] * 1e7) AS DECIMAL(28,0))) AS DOUBLE)
         |      / 1e7 / COUNT(*) AS new_mean_d1,
         |    CAST(SUM(CAST(round(v[64] * 1e7) AS DECIMAL(28,0))) AS DOUBLE)
         |      / 1e7 / COUNT(*) AS new_mean_d64
         |  FROM ass GROUP BY cell)
         |SELECT n.cell, n_assigned, n_defectors, new_mean_d1, new_mean_d64,
         |  new_mean_d1 - c.cv[1] AS shift_d1,
         |  new_mean_d64 - c.cv[64] AS shift_d64
         |FROM n JOIN cents c ON c.cell = n.cell
         |ORDER BY n.cell""".stripMargin),

    // -- Exact embedding covariance matrix ------------------------------
    // The statistic behind whitening / PCA / drift monitors: the full
    // 64×64 covariance upper triangle in ONE distributed pass. Exactness
    // recipe: vectors are quantized to 1/64-grid integers map-side
    // (floor(x*64+.5) — floor, not round: round's tie rule diverges
    // across engines on exact .5 fractions, floor+0.5 doesn't), so every
    // per-row product and both running sums are exact BIGINTs —
    // order-independent under any partitioning, no decimal needed.
    // r10 verdict #2: the old declarative pair explode amplified every
    // row ×2080 structs before partial aggregation — the native
    // [[graft.functions.CovTriangleAgg]] folds each quantized vector
    // into ONE 2145-long buffer (n + 64 dim sums + 2080 products) with
    // zero row amplification; partials merge by addition, so the
    // shuffle is 2145 longs/partition at ANY corpus size and the two
    // old broadcast joins vanish (dim sums ride the same buffer). The
    // cell fan-out is a constant 2080-row local table against the one
    // sketch row. n·Σxy−ΣxΣy stays under 2^63 up to ~10M rows per
    // corpus slice; beyond that the same plan runs with DECIMAL(38)
    // sums. cov is in original units (÷64²). CovTriangleSpec pins the
    // native plan bit-equal to the old explode formulation.
    QueryDef.sql("s20_embedding_covariance",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        import graft.functions.CovTriangle
        val q = Tables.embeddings(s, d).select(
          transform(col("embedding"),
            x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("q"))
        val sk = q.agg(call_function("cov_triangle_agg", col("q")).as("b"))
        import s.implicits._
        val cells = (1 to CovTriangle.Dims).flatMap(i =>
          (i to CovTriangle.Dims).map(j =>
            (i.toLong, j.toLong, CovTriangle.slot(i, j) + 1)))
          .toDF("i", "j", "pos")
        sk.crossJoin(cells) // 1 sketch row × constant 2080-cell index
          .select(col("i"), col("j"),
            element_at(col("b"), lit(1)).as("n"),
            element_at(col("b"), (col("i") + 1).cast("int")).as("si"),
            element_at(col("b"), (col("j") + 1).cast("int")).as("sj"),
            element_at(col("b"), col("pos").cast("int")).as("spq"))
          .select(col("i"), col("j"), col("n"),
            ((col("n") * col("spq") - col("si") * col("sj")).cast("double") /
              (col("n") * col("n")) / lit(4096)).as("cov"))
          .orderBy(col("i"), col("j"))
      },
      """WITH qv AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 64 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, unnest(q) AS qi,
        |    unnest(range(1, 65)) AS i FROM qv),
        |ds AS (SELECT i, CAST(SUM(qi) AS BIGINT) AS s FROM ex GROUP BY i),
        |agg AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS n,
        |    CAST(SUM(a.qi * b.qi) AS BIGINT) AS spq
        |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT agg.i, agg.j, agg.n,
        |  CAST(agg.n * agg.spq - di.s * dj.s AS DOUBLE)
        |    / (agg.n * agg.n) / 4096 AS cov
        |FROM agg JOIN ds di ON agg.i = di.i JOIN ds dj ON agg.j = dj.i
        |ORDER BY agg.i, agg.j""".stripMargin),

    // -- pairwise-similarity histogram (anisotropy probe) --------------
    // The distribution read taken before trusting cosine thresholds
    // anywhere else (d10/d16's cut points, s12's radius): if random-pair
    // similarity piles up near a single value the space is anisotropic
    // and every threshold needs re-centering. Probe = ALL pairs of an
    // absolute 200-vector sample (≤19,900 pairs at any SF — the s01/s18
    // bounded-probe contract, never a census). Buckets are
    // floor((cos+1)·10) clamped to 19 — one exact double op chain, so
    // bucket ids are bit-identical cross-engine; shares are integer ppm.
    QueryDef.sql("s21_similarity_histogram",
      (s, d) => {
        val e = vecs(s, d).filter(col("vec_id") < 200)
        val a = e.select(col("vec_id").as("i"), col("v").as("vi"))
        val b = e.select(col("vec_id").as("j"), col("v").as("vj"))
        // transientPersist: the ≤20-row histogram feeds both the total
        // and the output — without the barrier Catalyst inlines the
        // whole pair pipeline into the total agg (= cosines computed
        // twice; the PlanSpec guard caught exactly this)
        val g = OpUtils.transientPersist(s, s"s21:$d",
          a.join(b, col("i") < col("j"))
            .withColumn("cos", cosine(col("vi"), col("vj")))
            .withColumn("bucket",
              least(floor((col("cos") + 1.0) * 10.0).cast("int"), lit(19)))
            .groupBy(col("bucket"))
            .agg(count(lit(1)).as("n_pairs")))
        val tot = g.agg(sum(col("n_pairs")).as("tot_pairs"))
        g.crossJoin(broadcast(tot)) // aggregate-bounded: 1 row
          .select(col("bucket"), col("n_pairs"),
            // DECIMAL(38,0) route (r8 ADVICE): n_pairs*1e6 is safe under
            // the 200-vector cap, but every share_ppm in the repo rides
            // the overflow-proof q41 pattern so a cap change can't wrap
            expr("CAST(CAST(n_pairs AS DECIMAL(38,0)) * 1000000 DIV tot_pairs AS BIGINT)")
              .as("share_ppm"))
          .orderBy(col("bucket"))
      },
      s"""WITH e AS ($oVecs),
         |a AS (SELECT vec_id AS i, v AS vi FROM e WHERE vec_id < 200),
         |b AS (SELECT vec_id AS j, v AS vj FROM e WHERE vec_id < 200),
         |p AS (
         |  SELECT LEAST(CAST(floor((${oCosine("a.vi", "b.vj")} + 1.0) * 10.0)
         |    AS INTEGER), 19) AS bucket
         |  FROM a JOIN b ON a.i < b.j),
         |g AS (SELECT bucket, COUNT(*) AS n_pairs FROM p GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tot_pairs FROM g)
         |SELECT bucket, n_pairs,
         |  CAST(CAST(n_pairs AS HUGEINT) * 1000000 // tot_pairs AS BIGINT) AS share_ppm
         |FROM g, t
         |ORDER BY bucket""".stripMargin),

    // -- IVF inverted-list balance audit -------------------------------
    // The index-health read every IVF deployment watches (faiss calls
    // it the imbalance factor): probe latency is governed by the
    // LARGEST visited list, not the average — a skewed codebook
    // quietly turns top-k into a scan. Re-derive each vector's best
    // cell with the d16/s19 map-side argmax over the broadcast
    // codebook (no per-vector window, one bounded (cell) shuffle of
    // partials), then per cell: population, corpus share, and load
    // vs the perfectly balanced list — load_ppm > 1e6 is overloaded,
    // and max(load_ppm) IS the imbalance factor in ppm.
    QueryDef.sql("s22_ivf_balance",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
          .select(col("label").cast("long").as("cell"), col("cv"))
        val centArr = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
        val assigned = e.crossJoin(broadcast(centArr))
          .withColumn("best", aggregate(col("cents"),
            struct(lit(-2.0).as("s"), lit(-1L).as("c")),
            (acc, x) => {
              val sc = cosine(col("v"), x.getField("cv"))
              when(sc > acc.getField("s") ||
                  (sc === acc.getField("s") && x.getField("cell") < acc.getField("c")),
                struct(sc.as("s"), x.getField("cell").as("c")))
                .otherwise(acc)
            }))
          .select(col("best").getField("c").as("cell"))
        // transientPersist: the ≤|cells| frame feeds the totals AND the
        // output — the barrier keeps the corpus argmax to one pass
        val g = OpUtils.transientPersist(s, s"s22:$d",
          assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs")))
        val tot = g.agg(sum(col("n_vecs")).as("tot"), count(lit(1)).as("n_cells"))
        g.crossJoin(broadcast(tot)) // aggregate-bounded: 1 row
          .select(col("cell"), col("n_vecs"),
            expr("n_vecs * 1000000 div tot").as("share_ppm"),
            expr("n_vecs * n_cells * 1000000 div tot").as("load_ppm"))
          .orderBy(col("cell"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cents AS (SELECT CAST(label AS BIGINT) AS cell, cv FROM cents0),
         |ass0 AS (
         |  SELECT e.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCosine("e.v", "c.cv")} DESC, c.cell) AS r
         |  FROM e CROSS JOIN cents c),
         |g AS (SELECT cell, COUNT(*) AS n_vecs FROM ass0 WHERE r = 1
         |  GROUP BY cell),
         |t AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS tot,
         |  COUNT(*) AS n_cells FROM g)
         |SELECT cell, n_vecs,
         |  CAST(n_vecs * 1000000 // tot AS BIGINT) AS share_ppm,
         |  CAST(n_vecs * n_cells * 1000000 // tot AS BIGINT) AS load_ppm
         |FROM g, t
         |ORDER BY cell""".stripMargin),

    // -- kNN-graph reciprocity audit -----------------------------------
    // A kNN graph (the input to graph-based dedup, label propagation,
    // and HNSW-style index builds) is healthy when edges are MUTUAL —
    // low reciprocity means hubs are absorbing everyone's edge budget
    // and graph traversals will funnel through a few nodes. Per probe
    // vector: its top-3 neighbors' ids and how many of those edges
    // point back. Probe = absolute 200-vector sample (the s01/s21
    // bounded contract — the read needs a fixed-size sample, never a
    // census); pairs are probe×probe, top-3 bounded by WindowGroupLimit
    // BEFORE any exchange; the mutual check is a self-join of the ≤600
    // directed edges (transient-persisted so the pair pipeline runs
    // once — the s21 lesson).
    QueryDef.sql("s23_knn_graph",
      (s, d) => {
        val e = vecs(s, d).filter(col("vec_id") < 200)
        val q = e.select(col("vec_id").as("q_id"), col("label"), col("v").as("qv"))
        val n = e.select(col("vec_id").as("n_id"), col("v").as("nv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        val top3 = OpUtils.transientPersist(s, s"s23:$d",
          q.join(n, col("q_id") =!= col("n_id"))
            .withColumn("cos", cosine(col("qv"), col("nv")))
            .withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 3)
            .select(col("q_id"), col("label"), col("n_id"), col("rnk")))
        val back = top3.select(col("q_id").as("b_q"), col("n_id").as("b_n"))
        val mutual = top3.join(back,
            col("q_id") === col("b_n") && col("n_id") === col("b_q"))
          .groupBy(col("q_id").as("m_q"))
          .agg(count(lit(1)).as("n_mutual"))
        top3.filter(col("rnk") === 1)
          .join(mutual, col("q_id") === col("m_q"), "left")
          .select(col("q_id").as("vec_id"), col("label"),
            col("n_id").as("nn1_id"),
            coalesce(col("n_mutual"), lit(0L)).as("n_mutual"))
          .orderBy(col("vec_id"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (SELECT vec_id AS q_id, label, v AS qv FROM e WHERE vec_id < 200),
         |n AS (SELECT vec_id AS n_id, v AS nv FROM e WHERE vec_id < 200),
         |top3 AS (
         |  SELECT q_id, label, n_id, rnk FROM (
         |    SELECT q.q_id, q.label, n.n_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${oCosine("q.qv", "n.nv")} DESC, n.n_id) AS rnk
         |    FROM q JOIN n ON q.q_id <> n.n_id)
         |  WHERE rnk <= 3),
         |m AS (
         |  SELECT a.q_id AS m_q, COUNT(*) AS n_mutual
         |  FROM top3 a JOIN top3 b ON a.q_id = b.n_id AND a.n_id = b.q_id
         |  GROUP BY 1)
         |SELECT t.q_id AS vec_id, t.label, t.n_id AS nn1_id,
         |  CAST(COALESCE(m.n_mutual, 0) AS BIGINT) AS n_mutual
         |FROM top3 t LEFT JOIN m ON t.q_id = m.m_q
         |WHERE t.rnk = 1
         |ORDER BY vec_id""".stripMargin),

    // -- ANN hubness audit ---------------------------------------------
    // The other kNN-graph pathology: in high dimensions a few vectors
    // appear in EVERYONE's top-k (hubness grows with dimension —
    // Radovanović et al.), which skews recall measurements and makes
    // graph walks degenerate. Count each vector's in-degree over the
    // probe set's top-3 lists and surface the 20 biggest hubs with
    // their share of the total edge budget in ppm. Same bounded probe
    // and WindowGroupLimit shape as s23; the in-degree agg runs over
    // ≤600 directed edges.
    QueryDef.sql("s24_ann_hubness",
      (s, d) => {
        val e = vecs(s, d).filter(col("vec_id") < 200)
        val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"))
        val n = e.select(col("vec_id").as("n_id"), col("label"), col("v").as("nv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        // transientPersist: the ≤600-row edge list feeds both the
        // in-degree agg and the edge total — the barrier keeps the pair
        // pipeline to one pass, and the DERIVED total (r8 ADVICE: the
        // literal 600 misscaled shares on corpora with < 200 vectors)
        // makes the shares sum to ~1e6 at any probe size
        val top3 = OpUtils.transientPersist(s, s"s24:$d",
          q.join(n, col("q_id") =!= col("n_id"))
            .withColumn("cos", cosine(col("qv"), col("nv")))
            .withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 3)
            .select(col("n_id"), col("label")))
        val tot = top3.agg(count(lit(1)).as("tot_edges"))
        top3.groupBy(col("n_id"), col("label"))
          .agg(count(lit(1)).as("in_degree"))
          .crossJoin(broadcast(tot)) // aggregate-bounded: 1 row
          .withColumn("share_ppm",
            expr("CAST(CAST(in_degree AS DECIMAL(38,0)) * 1000000 DIV tot_edges AS BIGINT)"))
          .orderBy(col("in_degree").desc, col("n_id"))
          .limit(20)
          .select(col("n_id").as("vec_id"), col("label"),
            col("in_degree"), col("share_ppm"))
      },
      s"""WITH e AS ($oVecs),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 200),
         |n AS (SELECT vec_id AS n_id, label, v AS nv FROM e WHERE vec_id < 200),
         |top3 AS (
         |  SELECT n_id, label FROM (
         |    SELECT q.q_id, n.n_id, n.label,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${oCosine("q.qv", "n.nv")} DESC, n.n_id) AS rnk
         |    FROM q JOIN n ON q.q_id <> n.n_id)
         |  WHERE rnk <= 3),
         |t AS (SELECT COUNT(*) AS tot_edges FROM top3),
         |g AS (
         |  SELECT n_id AS vec_id, label, COUNT(*) AS in_degree
         |  FROM top3 GROUP BY 1, 2)
         |SELECT vec_id, label, in_degree,
         |  CAST(CAST(in_degree AS HUGEINT) * 1000000 // tot_edges AS BIGINT) AS share_ppm
         |FROM g, t
         |ORDER BY in_degree DESC, vec_id LIMIT 20""".stripMargin),

    // -- k-means assignment churn (the convergence read) ----------------
    // s19 reports how far the centroids MOVE in one Lloyd step; the
    // operational stop-signal is how many VECTORS change cell under the
    // moved centroids — assignment churn. Pass 1 assigns every vector
    // to its argmax-cosine cell under the persisted codebook (the s19
    // order-independent fold: total order on (score, cell), so any
    // partitioning agrees); the refined codebook is rebuilt from those
    // assignments with the exact fixed-point DECIMAL means (bounded:
    // one row per cell); pass 2 re-assigns under the refined codebook.
    // Per original cell: population and churn fraction in integer ppm.
    // 100 TB shape: both codebooks broadcast (10 rows), both argmax
    // passes are map-side folds, and the ONE corpus-wide frame read
    // twice (assignments) sits behind a transient persist barrier —
    // without it Catalyst inlines pass 1 into both consumers and the
    // corpus scans twice (the s21/t25 lesson).
    QueryDef.sql("s25_kmeans_churn",
      (s, d) => {
        val e = vecs(s, d)
        def argmax(cents: Column): Column =
          aggregate(cents,
            struct(lit(-2.0).as("s"), lit(-1L).as("c")),
            (acc, x) => {
              val sc = cosine(col("v"), x.getField("cv"))
              when(sc > acc.getField("s") ||
                  (sc === acc.getField("s") && x.getField("cell") < acc.getField("c")),
                struct(sc.as("s"), x.getField("cell").as("c")))
                .otherwise(acc)
            }).getField("c")
        val cents0 = centroids(s, d, e)
          .select(col("label").cast("long").as("cell"), col("cv"))
        val arr0 = cents0.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
        val a1 = OpUtils.transientPersist(s, "s25a1",
          e.crossJoin(broadcast(arr0))
            .withColumn("cell1", argmax(col("cents")))
            .select(col("vec_id"), col("v"), col("cell1")))
        def fxMean(dim: Int) =
          // r14: long buffer, bit-identical to the DECIMAL(28,0) sum —
          // see the centroids() note
          sum(round(element_at(col("v"), dim) * lit(1e7)).cast("long"))
            .cast("double") / lit(1e7) / count(lit(1))
        val refined = a1.groupBy(col("cell1").as("cell"))
          .agg(array((1 to 64).map(fxMean): _*).as("cv"))
        val arr1 = refined.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
        a1.crossJoin(broadcast(arr1))
          .withColumn("cell2", argmax(col("cents")))
          .groupBy(col("cell1").as("cell"))
          .agg(count(lit(1)).as("n_vectors"),
            sum(when(col("cell2") =!= col("cell1"), 1L).otherwise(0L))
              .as("n_churned"))
          .select(col("cell"), col("n_vectors"), col("n_churned"),
            expr("n_churned * 1000000 div n_vectors").as("churn_ppm"))
          .orderBy(col("cell"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |c0 AS (SELECT CAST(label AS BIGINT) AS cell, cv FROM cents0),
         |a1r AS (
         |  SELECT e.vec_id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCosine("e.v", "c.cv")} DESC, c.cell) AS r
         |  FROM e CROSS JOIN c0 c),
         |a1 AS (SELECT vec_id, v, cell AS cell1 FROM a1r WHERE r = 1),
         |c1 AS (
         |  SELECT cell1 AS cell, ${(1 to 64).map(i =>
             s"CAST(SUM(CAST(round(v[$i] * 1e7) AS DECIMAL(28,0))) AS DOUBLE) / 1e7 / COUNT(*)")
             .mkString("[", ", ", "]")} AS cv
         |  FROM a1 GROUP BY 1),
         |a2r AS (
         |  SELECT a1.vec_id, a1.cell1, c.cell AS cell2,
         |    row_number() OVER (PARTITION BY a1.vec_id
         |      ORDER BY ${oCosine("a1.v", "c.cv")} DESC, c.cell) AS r
         |  FROM a1 CROSS JOIN c1 c),
         |a2 AS (SELECT vec_id, cell1, cell2 FROM a2r WHERE r = 1)
         |SELECT cell1 AS cell, COUNT(*) AS n_vectors,
         |  CAST(SUM(CASE WHEN cell2 <> cell1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_churned,
         |  CAST(SUM(CASE WHEN cell2 <> cell1 THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS churn_ppm
         |FROM a2 GROUP BY 1 ORDER BY cell""".stripMargin),

    // -- truncated-dimension (matryoshka) retrieval audit ----------------
    // Matryoshka-style adaptive retrieval serves the FIRST 16 of 64
    // dims from the hot tier and reranks with the full vector — this
    // audit measures what that truncation costs: per probe query, the
    // top-3 overlap between full-dim and 16-dim-prefix cosine, and
    // whether rank-1 survives. 100 TB shape: the pair frame computes
    // BOTH cosines in one pass behind a transient persist (the s21
    // lesson — without the barrier each window consumer re-runs the
    // pair join), each ranking is WindowGroupLimit-bounded pre-
    // exchange, and everything rides the absolute 200-vector probe cap
    // (a fixed audit budget, never a corpus census).
    QueryDef.sql("s26_matryoshka_recall",
      (s, d) => {
        val e = vecs(s, d).filter(col("vec_id") < 200)
        val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"))
        val n = e.select(col("vec_id").as("n_id"), col("v").as("nv"))
        val pc = OpUtils.transientPersist(s, s"s26:$d",
          q.join(n, col("q_id") =!= col("n_id"))
            .withColumn("cos_full", cosine(col("qv"), col("nv")))
            .withColumn("cos_trunc",
              cosine(slice(col("qv"), 1, 16), slice(col("nv"), 1, 16)))
            .select(col("q_id"), col("n_id"), col("cos_full"), col("cos_trunc")))
        val wf = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_full").desc, col("n_id"))
        val wt = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_trunc").desc, col("n_id"))
        val tf = pc.withColumn("rf", row_number().over(wf))
          .filter(col("rf") <= 3).select(col("q_id"), col("n_id"), col("rf"))
        val tt = pc.withColumn("rt", row_number().over(wt))
          .filter(col("rt") <= 3).select(col("q_id"), col("n_id"), col("rt"))
        tf.join(tt, Seq("q_id", "n_id"), "full_outer")
          .groupBy(col("q_id"))
          .agg(sum(when(col("rf").isNotNull && col("rt").isNotNull, 1L)
              .otherwise(0L)).as("n_overlap"),
            max(when(col("rf") === 1, col("n_id"))).as("nn1_full"),
            max(when(col("rt") === 1, col("n_id"))).as("nn1_trunc"))
          .withColumn("top1_match", col("nn1_full") === col("nn1_trunc"))
          .select(col("q_id").as("vec_id"), col("n_overlap"),
            col("nn1_full"), col("nn1_trunc"), col("top1_match"))
          .orderBy(col("vec_id"))
      },
      s"""WITH e AS ($oVecs),
         |sq AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 200),
         |sn AS (SELECT vec_id AS n_id, v AS nv FROM e WHERE vec_id < 200),
         |pc AS (
         |  SELECT q_id, n_id,
         |    ${oCosine("qv", "nv")} AS cos_full,
         |    ${oCosine("qv[1:16]", "nv[1:16]")} AS cos_trunc
         |  FROM sq JOIN sn ON q_id <> n_id),
         |tf AS (SELECT q_id, n_id, rf FROM (
         |  SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_full DESC, n_id) AS rf FROM pc) WHERE rf <= 3),
         |tt AS (SELECT q_id, n_id, rt FROM (
         |  SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos_trunc DESC, n_id) AS rt FROM pc) WHERE rt <= 3),
         |j AS (
         |  SELECT COALESCE(tf.q_id, tt.q_id) AS q_id,
         |    COALESCE(tf.n_id, tt.n_id) AS n_id, rf, rt
         |  FROM tf FULL OUTER JOIN tt
         |    ON tf.q_id = tt.q_id AND tf.n_id = tt.n_id)
         |SELECT q_id AS vec_id,
         |  CAST(SUM(CASE WHEN rf IS NOT NULL AND rt IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_overlap,
         |  MAX(CASE WHEN rf = 1 THEN n_id END) AS nn1_full,
         |  MAX(CASE WHEN rt = 1 THEN n_id END) AS nn1_trunc,
         |  MAX(CASE WHEN rf = 1 THEN n_id END) = MAX(CASE WHEN rt = 1 THEN n_id END)
         |    AS top1_match
         |FROM j GROUP BY 1 ORDER BY vec_id""".stripMargin),

    // -- embedding drift between corpus halves ---------------------------
    // The data-drift monitor a retrieval deployment runs per refresh:
    // split the corpus into interleaved halves (vec_id parity — both
    // halves span the full ingest timeline), compute each label's
    // exact fixed-point centroid per half (the s03/s25 DECIMAL recipe:
    // order-independent sums, O(1) agg state), and report the cosine
    // between the half-centroids. Drift < 1 on a label says its
    // members moved, not that sampling jittered — parity halves make a
    // near-1 cosine the null hypothesis. 100 TB shape: ONE corpus pass
    // into a 2·|labels|-row persisted frame; the half-vs-half join and
    // the cosine are driver-scale arithmetic.
    QueryDef.sql("s27_centroid_drift",
      (s, d) => {
        val e = vecs(s, d)
          .withColumn("half", pmod(col("vec_id"), lit(2)).cast("int"))
        def fxMean(dim: Int) =
          // r14: long buffer, bit-identical to the DECIMAL(28,0) sum —
          // see the centroids() note
          sum(round(element_at(col("v"), dim) * lit(1e7)).cast("long"))
            .cast("double") / lit(1e7) / count(lit(1))
        val halves = OpUtils.transientPersist(s, s"s27:$d",
          e.groupBy(col("label"), col("half"))
            .agg(count(lit(1)).as("n"), array((1 to 64).map(fxMean): _*).as("cv")))
        val a = halves.filter(col("half") === 0)
          .select(col("label"), col("n").as("n_even"), col("cv").as("cva"))
        val b = halves.filter(col("half") === 1)
          .select(col("label").as("lb"), col("n").as("n_odd"), col("cv").as("cvb"))
        a.join(b, col("label") === col("lb"))
          .select(col("label"), col("n_even"), col("n_odd"),
            cosine(col("cva"), col("cvb")).as("drift_cos"))
          .orderBy(col("label"))
      },
      s"""WITH e AS ($oVecs),
         |h AS (
         |  SELECT label, CAST(vec_id % 2 AS INTEGER) AS half, COUNT(*) AS n,
         |    ${(1 to 64).map(i =>
               s"CAST(SUM(CAST(round(v[$i] * 1e7) AS DECIMAL(28,0))) AS DOUBLE) / 1e7 / COUNT(*)")
               .mkString("[", ", ", "]")} AS cv
         |  FROM e GROUP BY 1, 2)
         |SELECT a.label AS label, a.n AS n_even, b.n AS n_odd,
         |  ${oCosine("a.cv", "b.cv")} AS drift_cos
         |FROM h a JOIN h b ON a.label = b.label AND a.half = 0 AND b.half = 1
         |ORDER BY a.label""".stripMargin),

    // -- nprobe → recall@10 curve (the IVF tuning sheet) -----------------
    // s05 fixes nprobe=2; the operating question is the CURVE — how much
    // recall each extra probed cell buys, measured against the s08
    // brute-force truth. One ranked (query, cell) table (queries ×
    // labels, bounded) fans out to nprobe ∈ {1,2,4} by a literal
    // explode; candidates join per probed cell exactly as s04/s05, so
    // work scales with probed-cell size, not corpus size. Truth is
    // computed ONCE and reused across the three settings. The rollup is
    // 3 rows; recall is exact integer ppm (DECIMAL house pattern).
    QueryDef.sql("s28_nprobe_recall",
      (s, d) => {
        import s.implicits._
        val nps = Seq(1, 2, 4).toDF("nprobe")
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        val truth = q.join(e.filter(col("vec_id") >= 20)
            .select(col("vec_id").as("n_id"), col("v")))
          .withColumn("cos", cosine(col("qv"), col("v")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select(col("q_id"), col("n_id"))
        val wc = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("label"))
        val cells = q.crossJoin(broadcast(cents))
          .withColumn("cos_c", cosine(col("qv"), col("cv")))
          .withColumn("r", row_number().over(wc))
          .filter(col("r") <= 4)
          .select(col("q_id"), col("qv"), col("label"), col("r"))
        val probed = cells
          .crossJoin(broadcast(nps)) // literal-bounded: 3 rows
          .filter(col("r") <= col("nprobe"))
        val wr = Window.partitionBy(col("nprobe"), col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))
        val ivf = probed.as("b").join(e.as("c"),
            col("c.label") === col("b.label") && col("c.vec_id") >= 20)
          .select(col("nprobe"), col("b.q_id").as("q_id"),
            col("c.vec_id").as("n_id"),
            cosine(col("b.qv"), col("c.v")).as("cos"))
          .withColumn("rnk", row_number().over(wr))
          .filter(col("rnk") <= 10)
          .select(col("nprobe"), col("q_id"), col("n_id"), lit(1L).as("hit"))
        truth.crossJoin(broadcast(nps.select(col("nprobe").as("np"))))
          .join(ivf, col("np") === col("nprobe") &&
            truth("q_id") === ivf("q_id") && truth("n_id") === ivf("n_id"), "left")
          .groupBy(col("np"))
          .agg(count(lit(1)).as("n_truth"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(col("np").as("nprobe"), col("n_truth"), col("n_hit"),
            expr("CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 DIV n_truth AS BIGINT)")
              .as("recall_ppm"))
          .orderBy(col("nprobe"))
      },
      s"""WITH e AS ($oVecs),
         |cents AS ($oCents),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 20),
         |tc AS (
         |  SELECT q.q_id, e.vec_id AS n_id, ${oCosine("q.qv", "e.v")} AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id >= 20),
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |    FROM tc) WHERE rnk <= 10),
         |cells AS (
         |  SELECT q_id, qv, label, r FROM (
         |    SELECT q.q_id, q.qv, c.label,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${oCosine("q.qv", "c.cv")} DESC, c.label) AS r
         |    FROM q CROSS JOIN cents c) WHERE r <= 4),
         |probed AS (
         |  SELECT np.nprobe, c.q_id, c.qv, c.label
         |  FROM cells c CROSS JOIN (SELECT unnest([1, 2, 4]) AS nprobe) np
         |  WHERE c.r <= np.nprobe),
         |ic AS (
         |  SELECT b.nprobe, b.q_id, e.vec_id AS n_id,
         |    ${oCosine("b.qv", "e.v")} AS cos
         |  FROM probed b JOIN e ON e.label = b.label AND e.vec_id >= 20),
         |ivf AS (
         |  SELECT nprobe, q_id, n_id, 1 AS hit FROM (
         |    SELECT nprobe, q_id, n_id,
         |      row_number() OVER (PARTITION BY nprobe, q_id
         |        ORDER BY cos DESC, n_id) AS rnk
         |    FROM ic) WHERE rnk <= 10)
         |SELECT np.np AS nprobe, COUNT(*) AS n_truth,
         |  CAST(SUM(COALESCE(i.hit, 0)) AS BIGINT) AS n_hit,
         |  CAST(CAST(SUM(COALESCE(i.hit, 0)) AS HUGEINT) * 1000000 // COUNT(*)
         |    AS BIGINT) AS recall_ppm
         |FROM truth t
         |CROSS JOIN (SELECT unnest([1, 2, 4]) AS np) np
         |LEFT JOIN ivf i ON i.nprobe = np.np AND i.q_id = t.q_id AND i.n_id = t.n_id
         |GROUP BY 1 ORDER BY nprobe""".stripMargin),

    // -- int8 quantization distortion audit (codebook health) ------------
    // s06 ships the int8 codes; this measures what the compression COSTS
    // — per label: reconstruction error sum/mean/max of dequantized
    // vectors, in exact nano fixed point. Why integers: per-vector error
    // is a fixed-order fold (bit-identical cross-engine), but a label
    // SUM of doubles is order-dependent — rounding each vector's error
    // to 1e-9 first makes the rollup associative and the gate exact.
    // 100 TB shape: everything per-vector computes map-side; ONE label
    // shuffle of 3 integers per vector; no joins.
    QueryDef.sql("s29_quant_distortion",
      (s, d) => {
        val e = vecs(s, d)
          .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
          .filter(col("mx") > 0)
          .withColumn("scale", lit(127.0) / col("mx"))
        val err = aggregate(
          zip_with(col("v"),
            transform(col("v"),
              x => floor(x * col("scale") + lit(0.5)) / col("scale")),
            (x, r) => (x - r) * (x - r)),
          lit(0.0), (acc, t) => acc + t)
        e.withColumn("err_nano", round(err * lit(1e9)).cast("long"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("err_nano")).as("total_err_nano"),
            max(col("err_nano")).as("max_err_nano"))
          .select(col("label"), col("n_vecs"), col("total_err_nano"),
            expr("CAST(total_err_nano DIV n_vecs AS BIGINT)").as("mean_err_nano"),
            col("max_err_nano"))
          .orderBy(col("label"))
      },
      s"""WITH e0 AS ($oVecs),
         |e AS (
         |  SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS mx
         |  FROM e0),
         |s AS (
         |  SELECT label, v, CAST(127.0 AS DOUBLE) / mx AS scale
         |  FROM e WHERE mx > 0),
         |pe AS (
         |  SELECT label,
         |    CAST(round(list_reduce([CAST(0 AS DOUBLE)] || list_transform(v,
         |      x -> (x - floor(x * scale + 0.5) / scale)
         |         * (x - floor(x * scale + 0.5) / scale)),
         |      (a, b) -> a + b) * 1e9) AS BIGINT) AS err_nano
         |  FROM s)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(SUM(err_nano) AS BIGINT) AS total_err_nano,
         |  CAST(SUM(err_nano) // COUNT(*) AS BIGINT) AS mean_err_nano,
         |  MAX(err_nano) AS max_err_nano
         |FROM pe GROUP BY 1 ORDER BY label""".stripMargin),

    // -- cluster quality profile (SemDeDup-style cluster curation) -------
    // The cluster-level read SemDeDup/SSL-curation pipelines act on:
    // per embedding cluster (the IVF label), the member documents'
    // quality distribution and token mass — a low-quality cluster is
    // pruned WHOLE, far cheaper than per-doc filtering. Quality is the
    // t02/d28 integer-milli score (order-independent BIGINT sums, no FP
    // rollup). Shape: doc metrics reduce map-side to (id, qm, tokens)
    // before the id-equi join with the (vec_id, label) projection —
    // text and vectors stay at their scans; one id shuffle; the label
    // rollup re-groups the joined keys.
    QueryDef.sql("s30_cluster_quality",
      (s, d) => {
        val q = Tables.documents(s, d)
          // native word_profile (r11): one pass for n/sum_len/stop_hits
          .withColumn("wp", graft.functions.GraftFunctions.wordProfile(words(col("text"))))
          .withColumn("n", element_at(col("wp"), 1))
          .withColumn("stop_hits", element_at(col("wp"), 3))
          .withColumn("sum_len", element_at(col("wp"), 2))
          .withColumn("qm", floor((
            least(col("n").cast("double") / 100.0, lit(1.0)) * 0.5 +
              (col("stop_hits").cast("double") / col("n")) * 0.3 +
              least((col("sum_len").cast("double") / col("n")) / 8.0, lit(1.0)) * 0.2
            ) * 1000.0).cast("long"))
          .select(col("doc_id"), col("n").cast("long").as("n_tokens"), col("qm"))
        Tables.embeddings(s, d).select(col("vec_id"), col("label"))
          .join(q, col("vec_id") === col("doc_id"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_members"),
            sum(col("qm")).as("sum_qm"),
            min(col("qm")).as("min_qm"),
            sum(col("n_tokens")).as("cluster_tokens"))
          .select(col("label"), col("n_members"),
            expr("CAST(sum_qm DIV n_members AS BIGINT)").as("mean_quality_milli"),
            col("min_qm").as("min_quality_milli"), col("cluster_tokens"))
          .orderBy(col("label"))
      },
      s"""WITH kq AS (
         |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |    CAST(floor((
         |      least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0) * 0.5 +
         |      (CAST(len(list_filter(ws, w -> w IN ('the', 'a', 'of', 'and', 'to')))
         |         AS DOUBLE) / len(ws)) * 0.3 +
         |      least((CAST(list_reduce([0] || list_transform(ws, w -> length(w)),
         |         (a, b) -> a + b) AS DOUBLE) / len(ws)) / 8.0, 1.0) * 0.2
         |      ) * 1000.0) AS BIGINT) AS qm
         |  FROM (SELECT doc_id, ${oWords("text")} AS ws FROM documents)),
         |j AS (
         |  SELECT e.label, k.qm, k.n_tokens
         |  FROM embeddings e JOIN kq k ON e.vec_id = k.doc_id)
         |SELECT label, COUNT(*) AS n_members,
         |  CAST(SUM(qm) // COUNT(*) AS BIGINT) AS mean_quality_milli,
         |  MIN(qm) AS min_quality_milli,
         |  CAST(SUM(n_tokens) AS BIGINT) AS cluster_tokens
         |FROM j GROUP BY 1 ORDER BY label""".stripMargin),

    // -- quantization decision sheet: recall@10 × storage per format ------
    // The one-page answer to "which vector format do we ship?" (r10
    // verdict #5): fp64 (the truth, 512 B/vec), scalar int8 (s06's
    // per-vector max-abs codes, 64 B), 8-byte PQ (s09's ADC), and the
    // 60-bit sign binary (s16's hamming, 8 B) — recall@10 of each
    // against the SAME exact-cosine truth, as exact integer ppm.
    // 100 TB shape: every derived form (int8 codes, sign mask, PQ
    // codes) computes in ONE map-side projection over ONE corpus scan
    // (codebook broadcast, the s09 argmin fold — no per-vector window);
    // the pair pass against the bounded query sample (vec_id < 20,
    // broadcast) emits FIXED-WIDTH scalars (cos, dot8, hamming, adc) —
    // 4 numbers per candidate, no vectors — into ONE persisted scored
    // frame that all four rankings share; every ranking is a per-query
    // top-10 window (WindowGroupLimit keeps k rows per map partition
    // pre-exchange). Rank tie rules are total orders, so recall is
    // bit-exact cross-engine.
    QueryDef.sql("s31_quantization_sheet",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = vecs(s, d)
        val cb = centroids(s, d, e)
          .select(col("label").cast("long").as("code"), col("cv"))
          .agg(collect_list(struct(col("code"), col("cv"))).as("cb"))
        val forms = e
          .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
          .filter(col("mx") > 0)
          .withColumn("q8", transform(col("v"),
            x => floor(x * (lit(127.0) / col("mx")) + lit(0.5)).cast("long")))
          // native sign_mask60 (r12): one generated loop, same bits as
          // the 60-step aggregate HOF it replaces
          .withColumn("mask", graft.functions.GraftFunctions.signMask60(col("v")))
          .crossJoin(broadcast(cb))
        val q = forms.filter(col("vec_id") < 20)
          .withColumn("qtab", call_function("pq_dist_table", col("v"), col("cb")))
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("q8").as("qq"), col("mask").as("qm"), col("qtab"))
        val n = forms.filter(col("vec_id") >= 20)
          .withColumn("codes", call_function("pq_encode", col("v"), col("cb")))
          .select(col("vec_id").as("n_id"), col("v").as("nv"),
            col("q8"), col("mask"), col("codes"))
        // r15 (r14 verdict #5, guide §2.4): the sheet is ONE linear
        // pass. The r14 shape persisted the pair frame and then ran
        // truth + 4 arms as 8 separate rank windows feeding 4
        // SortMergeJoins and 4 single-partition aggregates — 35 scan
        // nodes / 6 SinglePartition exchanges in the plan, a dozen tiny
        // jobs of pure fixed cost at bench SF. But every arm's top-10
        // and the truth top-10 rank the SAME (q_id, n_id) pair set, so
        // one Exchange(q_id) feeds FOUR rank windows (one sort each,
        // same partitioning — no further exchange), the truth filter
        // (r_cos ≤ 10) keeps 10 rows per query, and each arm's hit
        // count is a conditional sum over those rows: hit ⇔ the pair
        // also ranks ≤ 10 under the arm's order — exactly the old
        // truth⋈arm-top10 join membership, computed without the join.
        // The persist is gone too: the pair frame is consumed once.
        val pairs = n.crossJoin(broadcast(q))
          .select(col("q_id"), col("n_id"),
            cosine(col("qv"), col("nv")).as("cos"),
            graft.functions.GraftFunctions.int8Dot(col("qq"), col("q8"))
              .as("dot8"),
            expr("bit_count(qm ^ mask)").as("hamming"),
            (0 until 8).foldLeft(lit(0.0)) { (acc, c) =>
              acc + element_at(element_at(col("qtab"), c + 1),
                (element_at(col("codes"), c + 1) + 1).cast("int"))
            }.as("adc"))
        def rk(order: Column*): Column =
          row_number().over(Window.partitionBy(col("q_id")).orderBy(order: _*))
        val ranked = pairs
          .withColumn("r_cos", rk(col("cos").desc, col("n_id")))
          .withColumn("r_ham", rk(col("hamming"), col("n_id")))
          .withColumn("r_dot", rk(col("dot8").desc, col("n_id")))
          .withColumn("r_adc", rk(col("adc"), col("n_id")))
          .filter(col("r_cos") <= 10) // the truth set (fp64 arm ≡ truth)
        ranked
          .agg(count(lit(1)).as("n_truth"),
            sum(when(col("r_ham") <= 10, 1L).otherwise(0L)).as("hit_bin60"),
            sum(when(col("r_dot") <= 10, 1L).otherwise(0L)).as("hit_int8"),
            sum(when(col("r_adc") <= 10, 1L).otherwise(0L)).as("hit_pq8"))
          .select(expr("stack(4, 'bin60', 8L, hit_bin60, 'fp64', 512L, n_truth, " +
              "'int8', 64L, hit_int8, 'pq8', 8L, hit_pq8) " +
              "AS (format, bytes_per_vec, n_hit)"),
            col("n_truth"))
          .select(col("format"), col("bytes_per_vec"), col("n_truth"), col("n_hit"),
            expr("CAST(CAST(n_hit AS DECIMAL(38,0)) * 1000000 DIV n_truth AS BIGINT)")
              .as("recall_ppm"))
          .orderBy(col("format"))
      }, {
      val oMask = "list_reduce([CAST(0 AS BIGINT)] || list_transform(range(1, 61), " +
        "i -> CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) " +
        "ELSE CAST(0 AS BIGINT) END), (a, b) -> a + b)"
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cb AS (SELECT CAST(label AS BIGINT) AS code, cv FROM cents0),
         |em AS (
         |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx
         |  FROM e),
         |k AS (
         |  SELECT vec_id, v,
         |    list_transform(v, x -> CAST(floor(x * (CAST(127.0 AS DOUBLE) / mx)
         |      + 0.5) AS BIGINT)) AS q8,
         |    $oMask AS mask
         |  FROM em WHERE mx > 0),
         |ch AS (SELECT unnest(range(0, 8)) AS c),
         |cd AS (
         |  SELECT k.vec_id, ch.c, cb.code,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, 9),
         |      j -> (k.v[ch.c*8+j] - cb.cv[ch.c*8+j]) *
         |           (k.v[ch.c*8+j] - cb.cv[ch.c*8+j])),
         |      (a, b) -> a + b) AS dist
         |  FROM k CROSS JOIN ch CROSS JOIN cb),
         |enc AS (
         |  SELECT vec_id, c, code FROM (
         |    SELECT vec_id, c, code,
         |      row_number() OVER (PARTITION BY vec_id, c ORDER BY dist, code) AS rk
         |    FROM cd) WHERE rk = 1),
         |adc AS (
         |  SELECT qd.vec_id AS q_id, enc.vec_id AS n_id,
         |    list_reduce([CAST(0.0 AS DOUBLE)] || list(qd.dist ORDER BY qd.c),
         |      (a, b) -> a + b) AS adc
         |  FROM enc JOIN (SELECT * FROM cd WHERE vec_id < 20) qd
         |    ON qd.c = enc.c AND qd.code = enc.code
         |  WHERE enc.vec_id >= 20
         |  GROUP BY qd.vec_id, enc.vec_id),
         |p0 AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         |    ${oCosine("q.v", "n.v")} AS cos,
         |    list_reduce([CAST(0 AS BIGINT)] || list_transform(
         |      range(1, len(q.q8) + 1), i -> (q.q8)[i] * (n.q8)[i]),
         |      (a, b) -> a + b) AS dot8,
         |    CAST(bit_count(xor(q.mask, n.mask)) AS INTEGER) AS hamming
         |  FROM (SELECT * FROM k WHERE vec_id < 20) q
         |  CROSS JOIN (SELECT * FROM k WHERE vec_id >= 20) n),
         |pairs AS (
         |  SELECT p0.q_id, p0.n_id, p0.cos, p0.dot8, p0.hamming, adc.adc
         |  FROM p0 JOIN adc ON p0.q_id = adc.q_id AND p0.n_id = adc.n_id),
         |truth AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS r
         |    FROM pairs) WHERE r <= 10),
         |arm AS (
         |  SELECT 'bin60' AS format, 8 AS bytes_per_vec, q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY hamming, n_id) AS r FROM pairs) WHERE r <= 10
         |  UNION ALL
         |  SELECT 'fp64', 512, q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, n_id) AS r FROM pairs) WHERE r <= 10
         |  UNION ALL
         |  SELECT 'int8', 64, q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY dot8 DESC, n_id) AS r FROM pairs) WHERE r <= 10
         |  UNION ALL
         |  SELECT 'pq8', 8, q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY adc, n_id) AS r FROM pairs) WHERE r <= 10),
         |tx AS (
         |  SELECT f.format, f.bytes_per_vec, t.q_id, t.n_id
         |  FROM (SELECT DISTINCT format, bytes_per_vec FROM arm) f
         |  CROSS JOIN truth t)
         |SELECT tx.format, CAST(tx.bytes_per_vec AS BIGINT) AS bytes_per_vec,
         |  COUNT(*) AS n_truth,
         |  CAST(SUM(CASE WHEN arm.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hit,
         |  CAST(CAST(SUM(CASE WHEN arm.n_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
         |FROM tx LEFT JOIN arm
         |  ON arm.format = tx.format AND arm.q_id = tx.q_id AND arm.n_id = tx.n_id
         |GROUP BY 1, 2
         |ORDER BY tx.format""".stripMargin
      }),

    // -- IVF split advisor ----------------------------------------------
    // The index-maintenance decision s22's balance audit feeds: WHICH
    // inverted lists to split when the index degrades. A list is a
    // split candidate when it is both POPULATED and SPREAD — score =
    // n_vecs × mean residual, where the residual of a vector is
    // (1 − cosine-to-its-centroid) in exact nano fixed point (per-row
    // floor to integer, then exact integer sums — the s27/s29 rule: a
    // double SUM over a shuffle is order-dependent and would flap the
    // oracle hash). 100 TB shape: assignment is the s22 map-side fold
    // over the broadcast codebook (no corpus shuffle for the join),
    // one partial-agg exchange on cell, and the ranking window runs on
    // the ≤|cells| aggregate-bounded frame.
    QueryDef.sql("s32_ivf_split_advisor",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
          .select(col("label").cast("long").as("cell"), col("cv"))
        val centArr = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("cents"))
        val assigned = e.crossJoin(broadcast(centArr))
          .withColumn("best", aggregate(col("cents"),
            struct(lit(-2.0).as("s"), lit(-1L).as("c")),
            (acc, x) => {
              val sc = cosine(col("v"), x.getField("cv"))
              when(sc > acc.getField("s") ||
                  (sc === acc.getField("s") && x.getField("cell") < acc.getField("c")),
                struct(sc.as("s"), x.getField("cell").as("c")))
                .otherwise(acc)
            }))
          .select(col("best").getField("c").as("cell"),
            floor((lit(1.0) - col("best").getField("s")) * lit(1e9))
              .cast("long").as("resid_nano"))
        val g = OpUtils.transientPersist(s, s"s32:$d",
          assigned.groupBy(col("cell"))
            .agg(count(lit(1)).as("n_vecs"),
              sum(col("resid_nano")).as("sum_resid_nano")))
        g.withColumn("mean_resid_nano", expr("sum_resid_nano DIV n_vecs"))
          .withColumn("split_score",
            expr("n_vecs * (sum_resid_nano DIV n_vecs)"))
          .withColumn("split_rank", row_number().over(
            Window.orderBy(col("split_score").desc, col("cell"))))
          .select(col("cell"), col("n_vecs"), col("mean_resid_nano"),
            col("split_score"), col("split_rank"),
            (col("split_rank") <= 3).as("split_now"))
          .orderBy(col("cell"))
      },
      s"""WITH e AS ($oVecs),
         |cents0 AS ($oCents),
         |cents AS (SELECT CAST(label AS BIGINT) AS cell, cv FROM cents0),
         |ass0 AS (
         |  SELECT e.vec_id, c.cell, ${oCosine("e.v", "c.cv")} AS sc,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oCosine("e.v", "c.cv")} DESC, c.cell) AS r
         |  FROM e CROSS JOIN cents c),
         |res AS (
         |  SELECT cell, CAST(floor((1 - sc) * 1e9) AS BIGINT) AS resid_nano
         |  FROM ass0 WHERE r = 1),
         |g AS (
         |  SELECT cell, COUNT(*) AS n_vecs,
         |    CAST(SUM(resid_nano) AS BIGINT) AS sum_resid_nano
         |  FROM res GROUP BY cell),
         |sheet AS (
         |  SELECT cell, n_vecs, sum_resid_nano // n_vecs AS mean_resid_nano,
         |    n_vecs * (sum_resid_nano // n_vecs) AS split_score
         |  FROM g)
         |SELECT cell, n_vecs, mean_resid_nano, split_score,
         |  CAST(row_number() OVER (ORDER BY split_score DESC, cell) AS INTEGER)
         |    AS split_rank,
         |  row_number() OVER (ORDER BY split_score DESC, cell) <= 3 AS split_now
         |FROM sheet
         |ORDER BY cell""".stripMargin),

    // -- centroid-margin histogram (IVF boundary-mass audit) -------------
    // How much of the corpus sits ON an IVF cell boundary? For EVERY
    // vector (a full linear scan, not a probe — this is the audit you
    // run once per index build), the margin between its nearest and
    // second-nearest centroid, banded at 0.02-cosine resolution, plus
    // the band's off-cell mass (vectors whose nearest centroid is not
    // their own label's). Low-margin mass is exactly the recall that
    // nprobe=1 forfeits (s28 measures the forfeit on a probe set; this
    // prices WHERE it comes from corpus-wide), and off-cell mass is the
    // re-assignment pressure a re-clustering step (s19) would relieve.
    // 100 TB shape: n × k cosines against a BROADCAST centroid table
    // compute map-side; the top-2-per-vector cut is a row_number ≤ 2 —
    // Spark's WindowGroupLimit trims each map partition to 2 rows per
    // vec_id BEFORE the exchange (the q57 argmin pattern), so the
    // shuffle carries 2n skinny rows, never n × k; the band rollup is
    // ~50 cells. No joins back to the corpus, no quadratic term.
    QueryDef.sql("s33_centroid_margin",
      (s, d) => {
        val e = vecs(s, d)
        val cents = centroids(s, d, e)
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos_c").desc, col("c_label"))
        val top2 = e.crossJoin(broadcast(
            cents.select(col("label").as("c_label"), col("cv"))))
          .select(col("vec_id"), col("label"), col("c_label"),
            cosine(col("v"), col("cv")).as("cos_c"))
          .withColumn("r", row_number().over(w))
          .filter(col("r") <= 2)
        val perVec = top2.groupBy(col("vec_id"), col("label"))
          .agg(max(when(col("r") === 1, col("cos_c"))).as("cos1"),
            max(when(col("r") === 2, col("cos_c"))).as("cos2"),
            max(when(col("r") === 1, col("c_label"))).as("cell"))
          .filter(col("cos2").isNotNull)
          .select(col("label"), col("cell"),
            least(floor((col("cos1") - col("cos2")) * lit(50.0)).cast("int"),
              lit(19)).as("band"))
        perVec.groupBy(col("band"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("cell") =!= col("label"), 1L).otherwise(0L))
              .as("n_off_cell"))
          .withColumn("off_cell_ppm",
            expr("CAST(CAST(n_off_cell AS DECIMAL(38,0)) * 1000000 " +
              "DIV n_vecs AS BIGINT)"))
          .orderBy(col("band"))
      },
      s"""WITH e AS ($oVecs),
         |cents AS ($oCents),
         |sc AS (
         |  SELECT e.vec_id, e.label, c.label AS c_label,
         |    ${oCosine("e.v", "c.cv")} AS cos_c
         |  FROM e CROSS JOIN cents c),
         |r AS (
         |  SELECT vec_id, label, c_label, cos_c,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_c DESC, c_label) AS r
         |  FROM sc),
         |pv AS (
         |  SELECT vec_id, label,
         |    max(CASE WHEN r = 1 THEN cos_c END) AS cos1,
         |    max(CASE WHEN r = 2 THEN cos_c END) AS cos2,
         |    max(CASE WHEN r = 1 THEN c_label END) AS cell
         |  FROM r WHERE r <= 2 GROUP BY 1, 2),
         |b AS (
         |  SELECT label, cell,
         |    LEAST(CAST(floor((cos1 - cos2) * 50.0) AS INTEGER), 19) AS band
         |  FROM pv WHERE cos2 IS NOT NULL)
         |SELECT band, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN cell != label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_off_cell,
         |  CAST(CAST(SUM(CASE WHEN cell != label THEN 1 ELSE 0 END)
         |    AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS off_cell_ppm
         |FROM b
         |GROUP BY band
         |ORDER BY band""".stripMargin)
  )
}

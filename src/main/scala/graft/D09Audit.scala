package graft

import org.apache.spark.sql.functions._

/** d09 output-proportionality audit (r11 verdict #2): measures, per SF,
  * how much of the simhash band join's work is the ANSWER versus the
  * blocking scheme — band-join output rows (the pre-verify shuffle
  * volume), distinct colliding pairs, and post-verify true near-dup
  * pairs. d09's superlinear growth claim ("candidates densify with dup
  * structure, not with the join") becomes a recorded number instead of
  * a comment: if true pairs grow at least as fast as runtime, the cell
  * is output-proportional; if collisions dominate, the band layout is
  * the problem. Prints ONE `D09AUDIT {json}` line; optional 2nd arg
  * writes the json to a file (gate artifact).
  *
  * usage: runMain graft.D09Audit <sfDir> [outFile]
  */
object D09Audit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: D09Audit <sfDir> [outFile]")
    val sfDir = args(0)
    val spark = GraftSession.builder("graft-d09audit", "32").getOrCreate()
    try {
      graft.functions.GraftFunctions.register(spark)
      val t0 = System.nanoTime()
      // the exact d09 sketch pipeline (DedupOps d09_simhash_band_pairs)
      val sh = Tables.documents(spark, sfDir)
        .withColumn("hs", graft.functions.GraftFunctions
          .gramHashes60(operators.OpUtils.words(col("text")), 1))
        .withColumn("simhash", graft.functions.GraftFunctions.simHash60(col("hs")))
        .select(col("doc_id"), col("simhash"))
        .persist()
      val nDocs = sh.count()
      val bands = sh.select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("key", expr("shiftright(simhash, band * 15) & 32767"))
      val joined = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .persist()
      val collisionRows = joined.count() // band-join output (incl. multi-band hits)
      val candidatePairs = joined.select("a_id", "b_id").distinct().count()
      val truePairs =
        joined.filter(col("hamming") <= 3).select("a_id", "b_id").distinct().count()
      // the same candidate join over the DISTINCT sketch frame (the m18
      // exact-dedup-first move): how much of the collision volume is
      // identical sketches colliding with themselves copy × copy?
      val reps = sh.select(col("simhash")).distinct().persist()
      val nSketches = reps.count()
      val bandsD = reps.select(col("simhash"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("key", expr("shiftright(simhash, band * 15) & 32767"))
      val distinctCollisions = bandsD.as("a").join(bandsD.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.simhash") < col("b.simhash")).count()
      reps.unpersist()
      val secs = (System.nanoTime() - t0) / 1e9
      joined.unpersist(); sh.unpersist()
      val json =
        f"""{"sf_dir":"$sfDir","n_docs":$nDocs,"n_sketches":$nSketches,""" +
          f""""collision_rows":$collisionRows,""" +
          f""""distinct_sketch_collisions":$distinctCollisions,""" +
          f""""candidate_pairs":$candidatePairs,"true_pairs":$truePairs,""" +
          f""""collisions_per_true_pair":${
            if (truePairs == 0) -1.0 else candidatePairs.toDouble / truePairs}%.2f,""" +
          f""""audit_secs":$secs%.2f}"""
      println(s"D09AUDIT $json")
      args.lift(1).foreach(p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
    } finally spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (EXTENSION, SURVEY.md §2.K
  * q_sim_topk). Vectors are `array<float>`; all arithmetic is promoted to
  * double with a fixed left-to-right fold so results are deterministic and
  * oracle-comparable.
  *
  * Scale notes: brute-force top-k is a map-side score + a global top-k
  * (TakeOrdered, no full sort shuffle). The IVF variant prunes the scan to
  * the probe's cell(s): at 100 TB the table is pre-partitioned by cell_id
  * so a probe touches 1/K of the data (nprobe/K with multi-probe).
  */
object Similarity {

  /** dot/norm/cosine delegate to the codegen'd Catalyst expressions
    * (graft.functions.VectorDot/VectorNorm): Spark's higher-order
    * functions (`aggregate(zip_with(...))`) run interpreted — a closure
    * call per element — while these compile to a primitive loop inside
    * whole-stage codegen. Same double-accumulation order, so results are
    * bit-identical to the HOF form. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def l2Norm(a: Column): Column =
    graft.functions.VectorFunctions.vecNorm(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k vs one probe vector (the exact baseline).
    * The probe is a literal pushed into every task; ordering ties broken
    * by id for determinism. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      probe: Array[Float], k: Int): DataFrame = {
    val probeCol = typedLit(probe.toSeq)
    embeddings
      .select(col(idCol), round(cosine(col(vecCol), probeCol), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF cell assignment: nearest of K fixed centroid vectors (supplied by
    * the caller — e.g. sampled rows or k-means output). Deterministic
    * argmax with index tiebreak. Centroids ride along as a broadcast-sized
    * literal array. */
  def assignCells(embeddings: DataFrame, vecCol: String,
      centroids: Seq[Array[Float]]): DataFrame = {
    val cent = typedLit(centroids.map(_.toSeq))
    embeddings.withColumn("cell_id", cellIdExpr(col(vecCol), cent, centroids.size))
  }

  private def cellIdExpr(vec: Column, cent: Column, k: Int): Column = {
    val scored = transform(sequence(lit(0), lit(k - 1)),
      i => struct(round(cosine(vec, element_at(cent, i + 1)), 9).as("s"), (-i).as("negi")))
    // array_max on struct orders lexicographically: max score, then min index
    (-array_max(scored).getField("negi")).as("cell_id")
  }

  /** IVF top-k: score only rows in the probe's `nprobe` nearest cells.
    * Approximate (recall < 1 when true neighbors live in unprobed cells) —
    * the scale path: the scan prunes to nprobe/K of the table. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Float]], probe: Array[Float], k: Int,
      nprobe: Int = 2): DataFrame = {
    val cent = typedLit(centroids.map(_.toSeq))
    val assigned = embeddings.withColumn("cell_id",
      cellIdExpr(col(vecCol), cent, centroids.size))
    // probe's nearest cells, computed once on the driver-side literal
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (cosineLocal(c, probe), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nprobe).map(_._2)
    assigned
      .filter(col("cell_id").isin(probeCells: _*))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(probe.toSeq)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All-pairs cosine near-dups, exact (no blocking) — the oracle-checkable
    * baseline; use [[embeddingNearDupPairs]] at scale. */
  def bruteNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // precompute each row's norm ONCE (O(n·d)) so the quadratic pair stage
    // is a single dot product per pair, not dot + two norms
    val withNorm = embeddings.select(col(idCol), col(vecCol),
      l2Norm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      col("nrm").as("nrm_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      col("nrm").as("nrm_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos",
        round(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** All near-duplicate pairs by embedding cosine ≥ threshold, bucketed by
    * IVF cell so the pair join is per-cell, not global (same-cell pairs
    * only — approximate, standard blocked-ANN dedup). */
  def embeddingNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Float]], threshold: Double): DataFrame = {
    val cent = typedLit(centroids.map(_.toSeq))
    val assigned = embeddings
      .withColumn("cell_id", cellIdExpr(col(vecCol), cent, centroids.size))
    val a = assigned.select(col("cell_id"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"), l2Norm(col(vecCol)).as("nrm_a"))
    val b = assigned.select(col("cell_id"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"), l2Norm(col(vecCol)).as("nrm_b"))
    a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        round(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}

package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CosineSim, HyperplaneSig, NearestCells, TopKByScore}
import graft.ops.Par

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Scale design: brute force is the exact baseline — a broadcast of the
  * (small) query set against the corpus scan, cosine evaluated by a native
  * codegen expression, top-k per query via a bounded partial aggregate
  * (only ≤k rows per partition per query ever reach the shuffle). The
  * LSH variant prunes the corpus with random-hyperplane sign buckets so
  * the per-query work drops from O(corpus) to O(bucket); IVF-style
  * coarse quantization would slot into the same bucket-join shape.
  */
object Ann {

  /** Normalize the vector column to `array<float>` (no-op when already
    * float) so callers with `array<double>` embeddings keep working. */
  private def asFloatVec(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, col(c).cast("array<float>"))

  /** Cosine similarity of two float-array columns, accumulated in double
    * (sequential fold → deterministic; native codegen expression). */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries`/`corpus`: (id, vec). Output: (query_id, neighbor_id, rank,
    * cos). Broadcast the query side — at 100 TB the corpus streams once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(asFloatVec(queries.toDF("query_id", "q_vec"), "q_vec"))
    val c = Par.ensureMin(asFloatVec(corpus.toDF("neighbor_id", "c_vec"), "c_vec"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cos"))
    rankTopK(scored, k)
  }

  /** Random-hyperplane signature: one bit per plane = sign of dot(v, h).
    * Planes are generated once on the driver (seeded) and shipped with the
    * plan; the per-row work is one fused native loop. */
  def lshSignature(vec: Column, dim: Int, nBits: Int = 16, seed: Long = 42L): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(vec), dim, nBits, seed))

  /** IVF-style approximate top-k: coarse-quantize the corpus against
    * `nCells` centroids (deterministically sampled from the corpus itself —
    * a k-means-- that needs no iterative training), then each query probes
    * only its `nProbe` nearest cells. The centroids are the quantizer
    * "model": collected once on the driver (like k-means centers) and
    * shipped with the plan, so cell assignment is a shuffle-free native
    * map over the corpus scan — no crossJoin, no window. At 100 TB the
    * assignment is computed once and persisted/bucketed by cell so queries
    * touch ~nProbe/nCells of the data. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = Par.ensureMin(asFloatVec(corpus.toDF("neighbor_id", "c_vec"), "c_vec"))
    // deterministic centroids: the nCells corpus vectors with smallest ids;
    // cells are numbered by POSITION 0..nCells-1, independent of the id
    // column's type (any orderable id works)
    val cents = c.orderBy(col("neighbor_id")).limit(nCells).collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val cellIds = Array.tabulate(cents.length)(_.toLong)
    def nearest(vec: Column, n: Int) = GraftBridge.column(
      NearestCells(GraftBridge.expression(vec), cellIds, cents, n))
    val cellC = c.withColumn("cell_id", element_at(nearest(col("c_vec"), 1), 1))
    val cellQ = broadcast(asFloatVec(queries.toDF("query_id", "q_vec"), "q_vec")
      .withColumn("cell_id", explode(nearest(col("q_vec"), nProbe))))
    // pairs are unique (1 cell per corpus vector, nProbe distinct cells per
    // query) — no distinct needed
    val scored = cellQ.join(cellC, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cos"))
    rankTopK(scored, k)
  }

  /** Approximate top-k: candidates = same-signature bucket (multi-probe:
    * original + each 1-bit flip), ranked by exact cosine within bucket.
    * Recall grows with probes; shuffle volume shrinks with nBits. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nBits: Int = 12, seed: Long = 42L): DataFrame = {
    val sigC = Par.ensureMin(asFloatVec(corpus.toDF("neighbor_id", "c_vec"), "c_vec"))
      .withColumn("sig", lshSignature(col("c_vec"), dim, nBits, seed))
    val probes = array((0 until nBits).map(b =>
      col("q_sig").bitwiseXOR(lit(1L << b))) :+ col("q_sig"): _*)
    val sigQ = broadcast(asFloatVec(queries.toDF("query_id", "q_vec"), "q_vec")
      .withColumn("q_sig", lshSignature(col("q_vec"), dim, nBits, seed))
      .withColumn("sig", explode(probes)))
    val scored = sigQ.join(sigC, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cos")).distinct()
    rankTopK(scored, k)
  }

  /** Rank the scored candidates to (query_id, rank, neighbor_id, cos).
    * Long ids go through the native bounded top-k aggregate: map-side
    * partial aggregation reduces every partition to ≤k entries per query
    * BEFORE the shuffle, where a row_number window would shuffle the whole
    * scored set. Other id types fall back to the window. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    if (scored.schema("neighbor_id").dataType == LongType) {
      val agg = GraftBridge.column(TopKByScore(
        GraftBridge.expression(col("cos")),
        GraftBridge.expression(col("neighbor_id")), k).toAggregateExpression())
      scored.groupBy("query_id").agg(agg.as("_nn"))
        .select(col("query_id"), posexplode(col("_nn")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("neighbor_id"), col("col.score").as("cos"))
    } else {
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    }
  }
}

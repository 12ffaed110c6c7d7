package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-principal-component PCA by power iteration, in EXACT integer
  * arithmetic end to end — the dimensionality-reduction step an
  * embedding pipeline runs before ANN/clustering, built so a second
  * engine can replay it bit-for-bit (no float accumulation order, no
  * BLAS, no RNG):
  *
  *  1. ONE distributed scan computes the exact moment matrix: per-dim
  *     sums S_d and the dim×dim product sums P_ij over ×10⁴ fixed-point
  *     components. The explode is dim²-bounded PER ROW (the Gram-matrix
  *     shape); the shuffle carries only dim² + dim groups with map-side
  *     partial aggregation — at 100 TB the reduce state is still 4096
  *     cells.
  *  2. The covariance NUMERATORS C_ij = n·P_ij − S_i·S_j and the power
  *     iteration v ← requantize(C·v) run driver-side over exact BigInt —
  *     a documented bounded fit (dim² = 4096 integers, like the IVF
  *     centroid and BPE licenses). Requantizing each iterate to max
  *     |component| = 10⁶ (truncated division on the ABS, sign
  *     reattached — floor vs truncate differs on negatives across
  *     engines, abs sidesteps it) keeps every iterate integral, so the
  *     usually-floating iteration becomes deterministic and
  *     oracle-replayable; scaling C or v by positive constants does not
  *     change the dominant eigendirection.
  *  3. Projections score_fp = Σ_d xf_d·v_d are a distributed map over a
  *     broadcast literal vector — exact 64-term integer dot products.
  *
  * Sign and convergence policy: v₀ = (10⁶, …, 10⁶) fixes the sign
  * deterministically; a fixed iteration count (not a tolerance) keeps
  * the replay static. The DuckDB oracle unrolls the same iterations as
  * chained CTEs (see `ClusterOps`). */
object Pca {

  /** (n, S_d, P_ij) → iterated component → per-vector projections. */
  def topComponentProjections(s: SparkSession, dir: String,
      iters: Int): DataFrame = {
    val x = graft.ops.Tables(s, dir, "embeddings").select(
      col("vec_id"), col("label"),
      expr("""transform(embedding,
             |  t -> CAST(floor(CAST(t AS DOUBLE) * 10000 + 0.5) AS BIGINT))"""
        .stripMargin).as("xf"))

    val pairs = x.select(explode(expr(
        """flatten(transform(sequence(0, size(xf) - 1), i ->
          |  transform(sequence(0, size(xf) - 1), j ->
          |    named_struct('i', i, 'j', j,
          |      'pr', element_at(xf, i + 1) * element_at(xf, j + 1)))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(sum(col("p.pr")).as("pij"))
      .collect()
    val sums = x.select(posexplode(col("xf")).as(Seq("d", "v")))
      .groupBy("d").agg(sum(col("v")).as("sd"), count(lit(1)).as("cnt"))
      .collect()

    val dim = sums.length
    val n = BigInt(sums.head.getLong(2))
    val sd = new Array[BigInt](dim)
    sums.foreach(r => sd(r.getInt(0)) = BigInt(r.getLong(1)))
    val c = Array.ofDim[BigInt](dim, dim)
    pairs.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      c(i)(j) = n * BigInt(r.getLong(2)) - sd(i) * sd(j)
    }

    val scale = BigInt(1000000)
    var v = Array.fill(dim)(scale)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { d =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) { acc += c(d)(j) * v(j); j += 1 }
        acc
      }
      val m = w.map(_.abs).max
      if (m != 0)
        v = w.map(wd => (if (wd < 0) -BigInt(1) else BigInt(1)) *
          (wd.abs * scale / m))
      it += 1
    }

    val vlit = array(v.map(b => lit(b.toLong)): _*)
    x.select(col("vec_id"), col("label"),
      aggregate(zip_with(col("xf"), vlit, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).as("score_fp"))
  }
}

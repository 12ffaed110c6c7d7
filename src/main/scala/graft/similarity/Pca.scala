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
  *     components, via the native `GramMatrixAgg` buffer — dim²
  *     multiply-adds per row in a tight loop, one dim²+dim+1 partial
  *     vector per partition, partials adding pointwise. At 100 TB the
  *     reduce state is still ~4096 cells; no per-row explode exists.
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
      expr(graft.ops.Tables.fpVecSpark).as("xf"))

    // ONE aggregation for all moments — the native Gram-matrix buffer
    // does the dim² multiply-adds per row in a tight loop and ships a
    // single dim²+dim+1 vector per partition; no dim²-per-row explode
    // ever materializes (measured at sf0.1: 5.1 s → sub-second)
    val dim = x.select(size(col("xf"))).limit(1).collect().headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "Pca.topComponentProjections: embeddings table is empty — no dimension to infer"))
    val moments = {
      import org.apache.spark.sql.GraftBridge
      x.agg(GraftBridge.column(graft.functions.GramMatrixAgg(
          GraftBridge.expression(col("xf")), dim)).as("m"))
        .first().getSeq[Long](0)
    }
    val n = BigInt(moments(dim * dim + dim))
    val sd = Array.tabulate(dim)(d => BigInt(moments(dim * dim + d)))
    val c = Array.tabulate(dim, dim)((i, j) =>
      n * BigInt(moments(i * dim + j)) - sd(i) * sd(j))

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
      // zero iterate (v in the null space of C): RESET to the start
      // vector — the oracle's CASE WHEN m = 0 spells exactly this, and
      // the two replays must agree even on the degenerate branch
      v =
        if (m == 0) Array.fill(dim)(scale)
        else w.map(wd => (if (wd < 0) -BigInt(1) else BigInt(1)) *
          (wd.abs * scale / m))
      it += 1
    }

    val vlit = array(v.map(b => lit(b.toLong)): _*)
    x.select(col("vec_id"), col("label"),
      aggregate(zip_with(col("xf"), vlit, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).as("score_fp"))
  }
}

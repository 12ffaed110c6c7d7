package graft.ops

import org.apache.spark.sql.functions._

import graft.similarity.KMeans

/** Embedding-clustering registry queries: distributed k-means and the
  * SemDeDup within-cluster semantic dedup built on it. The DuckDB oracle
  * replays the IDENTICAL algorithm — same seed centroids, same exact
  * fixed-point component means, same left-to-right double cosine fold,
  * same (cos DESC, cid ASC) tie-break — so the hash compare is exact by
  * construction, not fixture luck (see [[graft.similarity.KMeans]]). */
object ClusterOps {

  private val K = 8
  private val SemT = 0.42
  // NOTE: must be declared BEFORE `all` — the Q oracle strings are built
  // eagerly at object init, and a later-declared val would still be 0.
  private val PcaIters = 8

  /** Left-to-right double cosine — textual mirror of [[KMeans.cosD]]. */
  private def oCos(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]*$b[i]))" +
      s" / (sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]*$a[i])))" +
      s" * sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i]*$b[i]))))"

  /** Shared oracle CTEs: cast → seed → assign → exact mean update →
    * reassign (one Lloyd iteration, exactly [[KMeans.assignClusters]]). */
  private val KmeansCtes: String =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM e
       |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $K),
       |s1 AS (SELECT e.vec_id, c0.cid, ${oCos("e.v", "c0.cv")} AS cos FROM e, c0),
       |a1 AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, cid) AS rn FROM s1) WHERE rn = 1),
       |dd AS (SELECT a1.cid, unnest(generate_series(1, len(e.v))) AS dim, e.v AS v
       |       FROM e JOIN a1 USING (vec_id)),
       |comp AS (SELECT cid, dim,
       |    CAST(SUM(CAST(floor(v[dim]*10000 + 0.5) AS BIGINT)) / 10000.0 AS DOUBLE)
       |      / count(*) AS m
       |  FROM dd GROUP BY 1, 2),
       |cm AS (SELECT cid, list(m ORDER BY dim) AS cv FROM comp GROUP BY cid),
       |c1 AS (SELECT c0.cid, coalesce(cm.cv, c0.cv) AS cv
       |       FROM c0 LEFT JOIN cm USING (cid)),
       |s2 AS (SELECT e.vec_id, c1.cid, ${oCos("e.v", "c1.cv")} AS cos FROM e, c1),
       |a2 AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, cid) AS rn FROM s2) WHERE rn = 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- k-means clustering of embeddings ---------------------------------
    Q("q_kmeans_embed",
      s"WITH $KmeansCtes\nSELECT vec_id, cid AS cluster FROM a2") { (s, d) =>
      KMeans.assignClusters(Tables(s, d, "embeddings"), "vec_id", "embedding", K)
    },

    // ---- SemDeDup: within-cluster semantic dedup --------------------------
    // Pairs are scored inside clusters only (O(n²/k) — the operator's
    // point); a vector is dropped when a lower-id cluster-mate is within
    // the cosine threshold. Cross-cluster near-dups surviving is expected
    // operator behavior, not a recall bug.
    Q("q_semdedup",
      s"""WITH $KmeansCtes,
         |p AS (SELECT x.vec_id AS ida, y.vec_id AS idb
         |      FROM a2 x JOIN a2 y ON x.cid = y.cid AND x.vec_id < y.vec_id
         |      JOIN e ea ON ea.vec_id = x.vec_id
         |      JOIN e eb ON eb.vec_id = y.vec_id
         |      WHERE ${oCos("ea.v", "eb.v")} >= $SemT),
         |dr AS (SELECT DISTINCT idb AS vec_id FROM p)
         |SELECT a2.vec_id, a2.cid AS cluster, dr.vec_id IS NULL AS kept
         |FROM a2 LEFT JOIN dr USING (vec_id)""".stripMargin) { (s, d) =>
      KMeans.semDedup(Tables(s, d, "embeddings"), "vec_id", "embedding", K, SemT)
    },

    // ---- PCA first component (exact power iteration) ----------------------
    // See graft.similarity.Pca: one dim²-bounded moment scan, a bounded
    // BigInt power iteration driver-side, and a distributed exact dot-
    // product projection. The oracle replays EVERYTHING — moments,
    // covariance numerators, all unrolled requantized iterations, and
    // the projections — in HUGEINT SQL, so a hash match certifies the
    // whole pipeline, not just the final map.
    Q("q_pca_project", PcaOracle(PcaIters)) { (s, d) =>
      graft.similarity.Pca.topComponentProjections(s, d, PcaIters)
    }
  )

  /** Unrolled power-iteration oracle: wk = C·v(k−1); mk = max|wk|;
    * vk = sign(wk)·(|wk|·10⁶ // mk) — abs-then-divide so floor vs
    * truncate on negatives cannot differ across engines. */
  private def PcaOracle(iters: Int): String = {
    val its = (1 to iters).map { k =>
      s"""w$k AS (SELECT i AS d, sum(cij * vd) AS wd
         |  FROM c JOIN v${k - 1} ON v${k - 1}.d = c.j GROUP BY 1),
         |m$k AS (SELECT max(abs(wd)) AS m FROM w$k),
         |v$k AS (SELECT d, CASE WHEN m = 0 THEN CAST(1000000 AS HUGEINT)
         |    ELSE (CASE WHEN wd < 0 THEN -1 ELSE 1 END)
         |         * ((abs(wd) * 1000000) // m) END AS vd
         |  FROM w$k CROSS JOIN m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH x AS (SELECT vec_id, label,
       |    list_transform(embedding,
       |      t -> CAST(floor(CAST(t AS DOUBLE) * 10000 + 0.5) AS BIGINT))
       |      AS xf
       |  FROM embeddings),
       |e AS (SELECT vec_id, i - 1 AS d, xf[i] AS v
       |  FROM x, unnest(generate_series(1, len(xf))) AS u(i)),
       |s AS (SELECT d, sum(v) AS sd FROM e GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM x),
       |p AS (SELECT a.d AS i, b.d AS j, sum(a.v * b.v) AS pij
       |  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2),
       |c AS (SELECT i, j, n * pij - sa.sd * sb.sd AS cij
       |  FROM p CROSS JOIN nn
       |  JOIN s sa ON sa.d = p.i JOIN s sb ON sb.d = p.j),
       |v0 AS (SELECT d, CAST(1000000 AS HUGEINT) AS vd FROM s),
       |$its
       |SELECT x.vec_id, x.label, CAST(pr.score AS BIGINT) AS score_fp
       |FROM x JOIN (SELECT e.vec_id, sum(e.v * v$iters.vd) AS score
       |  FROM e JOIN v$iters ON v$iters.d = e.d GROUP BY 1) pr
       |  USING (vec_id)""".stripMargin
  }
}

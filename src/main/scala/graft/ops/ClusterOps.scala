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
    }
  )
}

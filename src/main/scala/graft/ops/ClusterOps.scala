package graft.ops

import org.apache.spark.sql.expressions.Window
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

    // ---- Achlioptas ±1 random projection (JL dimensionality reduction) ----
    // 64-dim embeddings → 16 dims through a dense ±1 sign matrix drawn
    // from the md5-ppm device (sign(i,j) = 1 − 2·(hexUniform(md5('jl' i
    // ':' j)) mod 2)) — Achlioptas 2003's database-friendly JL
    // transform, exactly replayable on any engine because the
    // "randomness" is a hash. The Spark side materializes the sign
    // matrix ONCE on the driver (16 array literals — deterministic, no
    // per-row md5) and each output dim is one zip_with·aggregate over
    // the fixed-point vector: all-BIGINT arithmetic, map-only, no
    // shuffle at all; the oracle recomputes every sign in SQL. Long
    // (vec_id, out_dim, proj_fp) output. At 100 TB this is the cheap
    // prefilter before ANN/clustering — 4× fewer bytes per vector with
    // JL-bounded distance distortion (SketchStatsSpec checks the
    // pairwise-distance ratios empirically).
    Q("q_embed_rproject", {
      val sign =
        s"(1 - 2 * (${Tables.hexUniform("md5('jl' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR))", 2)}))"
      s"""WITH x AS (SELECT vec_id, ${Tables.fpVecDuck} AS vf
         |  FROM embeddings),
         |p AS (SELECT vec_id, j,
         |    CAST(list_sum(list_transform(generate_series(1, len(vf)),
         |      i -> vf[i] * $sign)) AS BIGINT) AS proj_fp
         |  FROM x, unnest(generate_series(1, 16)) g(j))
         |SELECT vec_id, CAST(j AS BIGINT) AS out_dim, proj_fp FROM p"""
        .stripMargin
    }) { (s, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hexU2(msg: String): Int = {
        val h = md.digest(msg.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (h.take(6).foldLeft(0L)((a, c) =>
          a * 16 + "0123456789abcdef".indexOf(c)) % 2).toInt
      }
      val dim = 64
      val x = Tables(s, d, "embeddings")
        .select(col("vec_id"), expr(Tables.fpVecSpark).as("vf"))
      val projCols = (1 to 16).map { j =>
        val signs = array((1 to dim).map(i =>
          lit((1 - 2 * hexU2(s"jl$i:$j")).toLong)): _*)
        aggregate(zip_with(col("vf"), signs, (v, sg) => v * sg),
          lit(0L), (acc, t) => acc + t).as(s"p$j")
      }
      x.select(col("vec_id") +: projCols: _*)
        .select(col("vec_id"), posexplode(array((1 to 16).map(j => col(s"p$j")): _*)))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("out_dim"),
          col("col").as("proj_fp"))
    },

    // ---- embedding-table QA audit: norms, zeros, constants, per label -----
    // The ingest gate an embedding pipeline runs before ANY ANN/cluster
    // work: count vectors whose ×10⁴ fixed-point norm² is zero (dead
    // encoder outputs), whose components are all equal (collapsed /
    // padding rows), and the exact norm² mass per label — all integer
    // (norm² of fp components; no sqrt crosses the engine boundary).
    // One map-side pass + one label-keyed rollup; at 100 TB this is a
    // single scan with a 256-row result.
    Q("q_embed_norm_audit",
      s"""WITH x AS (SELECT label, ${Tables.fpVecDuck} AS xf FROM embeddings),
         |s AS (SELECT label,
         |    coalesce(list_sum(list_transform(xf, v -> v * v)), 0) AS n2,
         |    CASE WHEN len(list_distinct(xf)) <= 1 THEN 1 ELSE 0 END AS is_const
         |  FROM x)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(sum(is_const) AS BIGINT) AS n_const,
         |  CAST(sum(n2) AS BIGINT) AS sum_norm2_fp,
         |  CAST(min(n2) AS BIGINT) AS min_norm2_fp,
         |  CAST(max(n2) AS BIGINT) AS max_norm2_fp
         |FROM s GROUP BY label""".stripMargin) { (s, d) =>
      Tables(s, d, "embeddings")
        .select(col("label"), expr(Tables.fpVecSpark).as("xf"))
        .select(col("label"),
          coalesce(expr("aggregate(xf, CAST(0 AS BIGINT), (a, v) -> a + v * v)"),
            lit(0L)).as("n2"),
          expr("CASE WHEN size(array_distinct(xf)) <= 1 THEN 1 ELSE 0 END")
            .cast("long").as("is_const"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero"),
          sum(col("is_const")).as("n_const"),
          sum(col("n2")).as("sum_norm2_fp"),
          min(col("n2")).as("min_norm2_fp"),
          max(col("n2")).as("max_norm2_fp"))
    },

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

    // ---- k-means cluster quality report (cohesion + separation) -----------
    // After q_kmeans_embed assigns clusters, the questions that matter:
    // how TIGHT is each cluster (mean squared distance to its centroid)
    // and how FAR is its nearest neighbour centroid? Both come from the
    // per-(cluster, dim) moment frame alone: cohesion's Σd²(x,μ) =
    // (n·ΣQ − ΣS²)/n needs no second data pass, and centroid-pair
    // separation Σ(S_a/n_a − S_b/n_b)² cross-multiplies to the exact
    // integer Σ(n_b·S_a − n_a·S_b)² over a k²-row grid. The only floats
    // are final division chains spelled identically on both engines.
    // The oracle replays the Lloyd assignment via the shared KmeansCtes
    // and rebuilds the same moments in HUGEINT.
    Q("q_cluster_quality",
      s"""WITH $KmeansCtes,
         |m AS (SELECT a2.cid, i - 1 AS d,
         |      CAST(floor(e.v[i] * 10000 + 0.5) AS BIGINT) AS xv
         |  FROM e JOIN a2 USING (vec_id),
         |    unnest(generate_series(1, len(e.v))) AS t(i)),
         |mom AS (SELECT cid, d, sum(xv) AS s,
         |    sum(CAST(xv AS HUGEINT) * xv) AS qq,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM m GROUP BY 1, 2),
         |cl AS (SELECT cid, min(n) AS n, sum(qq) AS sq,
         |    sum(CAST(s AS HUGEINT) * s) AS ss
         |  FROM mom GROUP BY 1),
         |sep AS (SELECT ma.cid AS ca, mb.cid AS cb,
         |    min(ma.n) AS na, min(mb.n) AS nb,
         |    sum(CAST(mb.n * ma.s - ma.n * mb.s AS HUGEINT)
         |        * (mb.n * ma.s - ma.n * mb.s)) AS sepv
         |  FROM mom ma JOIN mom mb ON ma.d = mb.d AND ma.cid <> mb.cid
         |  GROUP BY 1, 2),
         |near AS (SELECT ca, cb, na, nb, sepv,
         |    row_number() OVER (PARTITION BY ca
         |      ORDER BY CAST(sepv AS DOUBLE) / na / na / nb / nb, cb) AS rn
         |  FROM sep)
         |SELECT cl.cid AS cluster, cl.n,
         |  CAST(cl.n * cl.sq - cl.ss AS DOUBLE) / cl.n / cl.n AS cohesion,
         |  near.cb AS nearest_cluster,
         |  CAST(near.sepv AS DOUBLE) / near.na / near.na / near.nb / near.nb
         |    AS separation
         |FROM cl JOIN near ON near.ca = cl.cid AND near.rn = 1""".stripMargin) {
      (s, d) =>
      val emb = Tables(s, d, "embeddings")
      val asg = KMeans.assignClusters(emb, "vec_id", "embedding", K)
      val e2 = emb.join(asg, "vec_id")
        .select(col("cluster").as("cid"),
          expr(Tables.fpVecSpark).as("xf"))
        .select(col("cid"), posexplode(col("xf")).as(Seq("d", "xv")))
      // The moment frame feeds THREE consumers (cl, ma, mb) — left lazy,
      // the assignment+explode subtree evaluates once per consumer.
      // k×dims rows: materialize eagerly (blocks outside the SQL cache,
      // cacheManager stays empty — the graph-loop device).
      val mom = e2.groupBy("cid", "d")
        .agg(sum(col("xv")).as("s"),
          sum(col("xv").cast("decimal(38,0)") * col("xv")).as("qq"),
          count(lit(1)).as("n"))
        .localCheckpoint(true)
      val cl = mom.groupBy("cid")
        .agg(min(col("n")).as("n"), sum(col("qq")).as("sq"),
          sum(col("s").cast("decimal(38,0)") * col("s")).as("ss"))
      val ma = mom.select(col("cid").as("ca"), col("d"), col("s").as("sa"),
        col("n").as("na"))
      val mb = mom.select(col("cid").as("cb"), col("d"), col("s").as("sb"),
        col("n").as("nb"))
      val sep = ma.join(mb, Seq("d")).filter(col("ca") =!= col("cb"))
        .groupBy("ca", "cb")
        .agg(min(col("na")).as("na"), min(col("nb")).as("nb"),
          sum((col("nb").cast("decimal(38,0)") * col("sa") -
            col("na").cast("decimal(38,0)") * col("sb")) *
            (col("nb").cast("decimal(38,0)") * col("sa") -
              col("na").cast("decimal(38,0)") * col("sb"))).as("sepv"))
      val w = Window.partitionBy("ca").orderBy(
        col("sepv").cast("double") / col("na") / col("na") /
          col("nb") / col("nb"), col("cb"))
      val near = sep.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      cl.join(near, cl("cid") === near("ca"))
        .select(col("cid").as("cluster"), cl("n"),
          ((cl("n").cast("decimal(38,0)") * col("sq") - col("ss"))
            .cast("double") / cl("n") / cl("n")).as("cohesion"),
          col("cb").as("nearest_cluster"),
          (col("sepv").cast("double") / col("na") / col("na") /
            col("nb") / col("nb")).as("separation"))
    },

    // ---- Fisher score per embedding dimension (feature selection) ---------
    // Which dimensions separate the classes? F_d = between-class /
    // within-class variance, with BOTH variance sums built from exact
    // per-(label, dim) moments and each label's term quantized to
    // micro-units by integer division BEFORE summing (the StatsOps
    // device) — no float accumulation across labels, so the ranking is
    // engine-exact. One (label, dim)-keyed pass; everything after is
    // grid-sized. At 100 TB this is how you pick the 16-of-64 dims
    // worth keeping before a Matryoshka truncation (q_embed_truncate).
    Q("q_fisher_score",
      s"""WITH x AS (SELECT vec_id, label,
        |    ${Tables.fpVecDuck} AS xf
        |  FROM embeddings),
        |e AS (SELECT vec_id, label, i - 1 AS d, xf[i] AS v
        |  FROM x, unnest(generate_series(1, len(xf))) AS u(i)),
        |gl AS (SELECT label, d, sum(v) AS s, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(v AS HUGEINT) * v) AS q
        |  FROM e GROUP BY 1, 2),
        |tot AS (SELECT d, sum(s) AS st, sum(n) AS nt FROM gl GROUP BY 1),
        |terms AS (SELECT gl.d,
        |    ((nt * s - n * st) * (nt * s - n * st) * 1000000)
        |      // (n * nt * nt) AS btw,
        |    ((n * q - s * s) * 1000000) // n AS wth
        |  FROM gl JOIN tot USING (d))
        |SELECT CAST(d AS INT) AS dim,
        |  CAST(sum(btw) AS BIGINT) AS between_micro,
        |  CAST(sum(wth) AS BIGINT) AS within_micro,
        |  CASE WHEN sum(wth) = 0 THEN NULL
        |       ELSE CAST(sum(btw) AS DOUBLE) / CAST(sum(wth) AS DOUBLE)
        |  END AS fisher
        |FROM terms GROUP BY 1""".stripMargin) { (s, d) =>
      val e = Tables(s, d, "embeddings").select(col("label"),
          expr(Tables.fpVecSpark).as("xf"))
        .select(col("label"), posexplode(col("xf")).as(Seq("d", "v")))
      val gl = e.groupBy("label", "d")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
          sum(col("v").cast("decimal(38,0)") * col("v")).as("q"))
      val tot = gl.groupBy("d")
        .agg(sum(col("s")).as("st"), sum(col("n")).as("nt"))
      // SCALE CEILING (and its failure mode): `div` here is Spark's
      // IntegralDivide — DECIMAL(38,0) operands but a BIGINT result, so a
      // per-term quotient past 2^63 cannot be represented, while DuckDB's
      // HUGEINT `//` keeps going. Numerator magnitude is
      // ~(nt·s)²·10⁶ ≲ (n_vecs·10⁴·|v_fp|)²·10⁶, which stays under 2^63
      // up to ~10¹¹ vectors per label at the ×10⁴ fixed-point range —
      // far past any fixture and most corpora. If a corpus ever crosses
      // it, this fails LOUDLY (ANSI mode, Spark 4 default, throws
      // ARITHMETIC_OVERFLOW on the cast) rather than nulling silently.
      // The same ceiling note applies to the q_skew_report/q_interarrival
      // ratio terms.
      gl.join(tot, "d")
        .select(col("d"),
          expr("""((CAST(nt AS DECIMAL(38,0)) * s - CAST(n AS DECIMAL(38,0)) * st)
                 | * (CAST(nt AS DECIMAL(38,0)) * s - CAST(n AS DECIMAL(38,0)) * st)
                 | * 1000000) div (CAST(n AS DECIMAL(38,0)) * nt * nt)"""
            .stripMargin).as("btw"),
          expr("((CAST(n AS DECIMAL(38,0)) * q - CAST(s AS DECIMAL(38,0)) * s)" +
            " * 1000000) div CAST(n AS DECIMAL(38,0))").as("wth"))
        .groupBy(col("d").cast("int").as("dim"))
        .agg(sum(col("btw")).cast("long").as("between_micro"),
          sum(col("wth")).cast("long").as("within_micro"),
          when(sum(col("wth")) === 0, lit(null).cast("double"))
            .otherwise(sum(col("btw")).cast("double") /
              sum(col("wth")).cast("double")).as("fisher"))
    },

    // ---- nearest-centroid classification + confusion matrix ---------------
    // The embedding-quality eval: classify every vector by its nearest
    // class centroid and cross-tabulate against the true label. The
    // per-candidate distance is the EXACT integer n_l²·d² = Σ(n_l·x −
    // S_l)²; candidates have different n_l, so the argmin compares
    // d² = A/n_l² as the same two IEEE divisions on both engines
    // (identical doubles → identical ordering), label tiebreak. Scale:
    // a k-row broadcast of centroid sum-vectors against one corpus
    // scan — the standard classifier-probe shape.
    Q("q_nn_centroid_confusion",
      s"""WITH x AS (SELECT vec_id, label,
        |    ${Tables.fpVecDuck} AS xf
        |  FROM embeddings),
        |e AS (SELECT vec_id, label, i - 1 AS d, xf[i] AS v
        |  FROM x, unnest(generate_series(1, len(xf))) AS u(i)),
        |cl AS (SELECT label, d, sum(v) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |a AS (SELECT e.vec_id, cl.label AS cand,
        |    sum(CAST(cl.n * e.v - cl.s AS HUGEINT) * (cl.n * e.v - cl.s))
        |      AS a2,
        |    min(cl.n) AS nl
        |  FROM e JOIN cl ON cl.d = e.d GROUP BY 1, 2),
        |p AS (SELECT vec_id, cand, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY CAST(a2 AS DOUBLE) / nl / nl, cand) AS rn FROM a)
        |SELECT x.label AS true_label, p.cand AS pred_label,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM p JOIN x USING (vec_id) WHERE rn = 1
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val x = Tables(s, d, "embeddings").select(col("vec_id"), col("label"),
        expr(Tables.fpVecSpark).as("xf"))
      val e = x.select(col("vec_id"), col("label"),
        posexplode(col("xf")).as(Seq("d", "v")))
      val cent = e.groupBy(col("label").as("cand"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .groupBy("cand")
        // min(n) — matches the oracle; n is uniform across dims because
        // embeddings are fixed-width (jagged rows would fail loudly in
        // GramMatrixAgg on the PCA path, the canary for this family)
        .agg(min(col("n")).as("nl"),
          expr("transform(sort_array(collect_list(struct(d, s))), p -> p.s)")
            .as("sarr"))
      val a2 = expr(
        """aggregate(zip_with(xf, sarr,
          |    (xv, sv) -> CAST(nl AS DECIMAL(38,0)) * xv - sv),
          |  CAST(0 AS DECIMAL(38,0)), (acc, t) -> acc + t * t)""".stripMargin)
      val w = Window.partitionBy("vec_id")
        .orderBy(col("a2").cast("double") / col("nl") / col("nl"),
          col("cand"))
      x.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("cand"), col("nl"),
          a2.as("a2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("label").as("true_label"),
          col("cand").as("pred_label"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- centroid-distance outliers (mislabeled-sample screen) ------------
    // The 10 vectors FURTHEST from their own class centroid, per class:
    // the candidates a labeling audit reviews first. Within one label
    // the n_l² scale is shared, so the integer A = Σ(n_l·x − S_l)²
    // ranks EXACTLY (no division at all); vec_id tiebreak.
    Q("q_centroid_outliers",
      s"""WITH x AS (SELECT vec_id, label,
        |    ${Tables.fpVecDuck} AS xf
        |  FROM embeddings),
        |e AS (SELECT vec_id, label, i - 1 AS d, xf[i] AS v
        |  FROM x, unnest(generate_series(1, len(xf))) AS u(i)),
        |cl AS (SELECT label, d, sum(v) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |a AS (SELECT e.vec_id, e.label,
        |    sum(CAST(cl.n * e.v - cl.s AS HUGEINT) * (cl.n * e.v - cl.s))
        |      AS a2
        |  FROM e JOIN cl ON cl.label = e.label AND cl.d = e.d
        |  GROUP BY 1, 2),
        |r AS (SELECT vec_id, label, CAST(a2 AS BIGINT) AS n2d2,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY a2 DESC, vec_id) AS rk
        |  FROM a)
        |SELECT label, vec_id, n2d2, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 10""".stripMargin) { (s, d) =>
      val x = Tables(s, d, "embeddings").select(col("vec_id"), col("label"),
        expr(Tables.fpVecSpark).as("xf"))
      val e = x.select(col("vec_id"), col("label"),
        posexplode(col("xf")).as(Seq("d", "v")))
      val cent = e.groupBy(col("label"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .groupBy("label")
        .agg(min(col("n")).as("nl"),
          expr("transform(sort_array(collect_list(struct(d, s))), p -> p.s)")
            .as("sarr"))
      val a2 = expr(
        """aggregate(zip_with(xf, sarr,
          |    (xv, sv) -> CAST(nl AS DECIMAL(38,0)) * xv - sv),
          |  CAST(0 AS DECIMAL(38,0)), (acc, t) -> acc + t * t)""".stripMargin)
      val w = Window.partitionBy("label")
        .orderBy(col("a2").desc, col("vec_id"))
      x.join(broadcast(cent), "label")
        .select(col("vec_id"), col("label"), a2.as("a2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("label"), col("vec_id"),
          col("a2").cast("long").as("n2d2"), col("rk").cast("int").as("rk"))
    },

    // ---- PCA first component (exact power iteration) ----------------------
    // See graft.similarity.Pca: one dim²-bounded moment scan, a bounded
    // BigInt power iteration driver-side, and a distributed exact dot-
    // product projection. The oracle replays EVERYTHING — moments,
    // covariance numerators, all unrolled requantized iterations, and
    // the projections — in HUGEINT SQL, so a hash match certifies the
    // whole pipeline, not just the final map.
    // the power-iteration chain references the covariance CTE once per
    // unrolled step — DuckDB's default CTE inlining re-evaluates the
    // full 82M-row moment join 8x (764 s at sf1); materialized, 3.8 s
    Q("q_pca_project", PcaOracle(PcaIters)) { (s, d) =>
      graft.similarity.Pca.topComponentProjections(s, d, PcaIters)
    }.atScale("materialized-cte",
      ScaleOracles.materializeCtes(PcaOracle(PcaIters)))
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
       |    ${Tables.fpVecDuck} AS xf
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

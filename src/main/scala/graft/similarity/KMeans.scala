package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column plus the SemDeDup
  * (Abbas et al. 2023, arXiv:2303.09540) within-cluster semantic dedup
  * built on it — the clustering layer of a training-data pipeline.
  *
  * Built for engine-exact verification: deterministic seed centroids (the
  * k smallest md5(id) digests — a seeded pseudo-random draw that works on
  * ANY id domain, dense or sparse, and is replayable in the DuckDB oracle
  * because md5 is bit-identical across engines), ONE Lloyd update whose
  * component means use the exact
  * fixed-point scheme of [[graft.ops.Tables.dsum]] (quantize ×10⁴ → exact
  * long sums → one double division), and cosine folded left-to-right in
  * double ([[cosD]]) so every comparison is bit-identical to the DuckDB
  * oracle's `list_sum(list_transform(...))`.
  *
  * Scale shape: assignment is a pure per-row expression over broadcast
  * centroid literals — no join, no shuffle, survives codegen. The update
  * step shuffles only (cluster, dim) partial sums: k×dim groups,
  * map-side combined. Driver-side state is the centroid set alone (k
  * rows + k×dim component means — the same bounded model-fit license as
  * [[Ann.ivfTopK]]'s trained quantizer). Reference analogue: the
  * reference has no clustering operator; this is part of the
  * LLM-pipeline capability superset (SURVEY.md §6).
  */
object KMeans {

  /** Cosine of two `array<double>` columns via builtin HOFs: sequential
    * left-to-right accumulation in double, matching the oracle's
    * `list_sum` fold order term for term (sqrt/division are IEEE
    * correctly-rounded, so the whole expression is bit-exact across
    * engines). */
  def cosD(a: Column, b: Column): Column = {
    def s(c: Column) = aggregate(c, lit(0.0), (acc, x) => acc + x)
    s(zip_with(a, b, (x, y) => x * y)) /
      (sqrt(s(transform(a, x => x * x))) * sqrt(s(transform(b, x => x * x))))
  }

  /** Argmax-cosine cluster id over centroid literals, ties to the SMALLER
    * centroid id (mirrors the oracle's `ORDER BY cos DESC, cid ASC`).
    * One fused native expression ([[graft.functions.CentroidArgmax]],
    * bit-exact with [[argmaxCosHof]] — spec'd): the per-centroid HOF
    * struct-max was the measured wall of the whole operator at
    * production k ≈ √n (k=450 at 200k vectors: ~400 s of interpreted
    * per-centroid evals, BENCH_semdedup_ab_r12.json). */
  private def argmaxCos(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.CentroidArgmax(
      org.apache.spark.sql.GraftBridge.expression(vec),
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))

  /** The original HOF formulation (struct-max over (cosD, -cid)) — kept
    * as the semantic reference the native kernel is spec'd bit-equal
    * against (ClusterSpec). */
  private[graft] def argmaxCosHof(vec: Column,
      cents: Seq[(Long, Seq[Double])]): Column = {
    val scored = cents.map { case (cid, cv) =>
      struct(cosD(vec, typedLit(cv)).as("cos"), lit(-cid).as("ncid"))
    }
    (array_max(array(scored: _*)).getField("ncid") * -1).cast("long")
  }

  private def asDouble(emb: DataFrame, idCol: String, vecCol: String) =
    emb.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("_v"))

  /** Cluster every vector: seeds = the k rows with the smallest
    * md5(id-as-string) digest (id tie-break) — a deterministic
    * pseudo-random draw that needs no dense/contiguous id space (`id < k`
    * silently under-seeds any real corpus) and costs one bounded top-k
    * collect (k rows — the [[Ann]] trainCentroids model-fit license); at
    * 100 TB the top-k runs as a partial-agg, never a full sort. One exact
    * Lloyd update, final assignment. Output: (idCol, cluster). Empty
    * clusters keep their seed centroid. */
  def assignClusters(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val e = asDouble(emb, idCol, vecCol)
    val seeds: Seq[(Long, Seq[Double])] =
      e.orderBy(md5(col(idCol).cast("string").cast("binary")).asc,
          col(idCol).asc)
        .limit(k).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq
    val a1 = e.withColumn("_c", argmaxCos(col("_v"), seeds))
    // exact fixed-point component means; k×dim groups, map-side combined
    val comp = a1
      .select(col("_c"), posexplode(col("_v")).as(Seq("_dim", "_x")))
      .groupBy("_c", "_dim")
      .agg(sum(floor(col("_x") * 10000d + 0.5d).cast("long")).as("_s"),
        count(lit(1)).as("_n"))
      .select(col("_c"), col("_dim"),
        ((col("_s") / 10000.0).cast("double") / col("_n")).as("_m"))
      .collect()
    val means: Map[Long, Seq[Double]] = comp.groupBy(_.getLong(0)).map {
      case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
    }
    val updated = seeds.map { case (cid, cv) => cid -> means.getOrElse(cid, cv) }
    e.withColumn("cluster", argmaxCos(col("_v"), updated))
      .select(col(idCol), col("cluster"))
  }

  /** SemDeDup: within each k-means cluster, drop every vector whose
    * cosine to a LOWER-id cluster-mate reaches `threshold`. Pairs are
    * scored inside clusters only — O(n²/k) instead of O(n²), which is
    * the operator's entire point at scale (production runs pick
    * k ≈ √n so cluster sizes stay bounded). Output:
    * (idCol, cluster, kept). */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      threshold: Double, broadcastConfirmMax: Long = 1500000L): DataFrame = {
    val a = assignClusters(emb, idCol, vecCol, k)
    // Pair enumeration is SKINNY (id, cluster) only: carrying both
    // vectors through the cluster self-join shuffles ~520 B per pair —
    // at 200k vectors / k=8 that is 2.5e9 pairs ≈ 40+ GB per side
    // (measured: the sf10e gate ground >16 min before being killed).
    // With ids only the same join moves 16 B per pair, and the cosine
    // runs map-side against the broadcast vector table while it fits
    // (n ≤ 1.5M — see the confirm-path guard below; past that the
    // confirm switches to shuffle joins).
    // ...and SALTED: a join keyed on `cluster` alone has at most k
    // distinct keys, so at the fixed-k oracle setting (k=8) all 2.5e9
    // within-cluster pairs landed on 8 tasks of a 32-thread session.
    // Bucketing the right side by id % S and exploding the left across
    // the S buckets keeps every pair exactly once while spreading the
    // work over k·S join keys — full parallelism at any k.
    val S = 32
    val left = a.select(col(idCol).as("id_a"), col("cluster"))
      .withColumn("_b", explode(array((0 until S).map(lit(_)): _*)))
      // EXPLICIT partition count: the join inputs are tiny (n·S skinny
      // rows), so AQE coalesces the pre-join shuffle to a few partitions
      // and the 2.5e9-pair EXPLOSION then runs ~8-way; a user-specified
      // repartition is exempt from coalescing and keeps all cores busy
      .repartition(256, col("cluster"), col("_b"))
    val right = a.select(col(idCol).as("id_b"), col("cluster"),
      pmod(col(idCol), lit(S)).cast("int").as("_b"))
    // Vectors keep their SOURCE element type (ADVICE r11): float inputs
    // use the native codegen CosineSim (sequential double accumulation
    // over float→double casts — term-for-term the same IEEE math as
    // cosD's HOF fold and the oracle's list_sum, ~10× faster per pair
    // than the interpreted HOF eval); double inputs stay double and use
    // cosD, because a silent float downcast can flip near-threshold
    // pairs relative to the oracle's double fold.
    val isFloat = emb.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    val ef = emb.select(col(idCol),
      (if (isFloat) col(vecCol) else transform(col(vecCol), x => x.cast("double")))
        .as("_vf"))
    def cos(x: Column, y: Column): Column =
      if (isFloat) graft.similarity.Ann.cosine(x, y) else cosD(x, y)
    val pairs = left.join(right, Seq("cluster", "_b"))
      .filter(col("id_a") < col("id_b"))
    // Exact-cosine confirm: map-side against the BROADCAST vector table
    // while it plausibly fits (n·dim·4B ≈ 3.8 GB at 1.5M×640 float —
    // the same cutoff as Dedup.nearDupEmbeddingLsh's confirm), because
    // only the survivor set is then ever shuffled. PAST the cutoff the
    // broadcast itself is the failure mode (VERDICT r11 #3: at 1B×64
    // it is ~512 GB and the operator dies at exactly the scale it
    // exists for), so the confirm falls back to two shuffle joins —
    // sort-merge, spillable, bounded by cluster shuffle capacity, the
    // pre-r11 shape that completes at any n (k ≈ √n keeps the pair
    // stream itself O(n^1.5)).
    val n = emb.select(col(idCol)).count()
    val confirmed =
      if (n <= broadcastConfirmMax) pairs
        .join(broadcast(ef.select(col(idCol).as("id_a"), col("_vf").as("_va"))), "id_a")
        .join(broadcast(ef.select(col(idCol).as("id_b"), col("_vf").as("_vb"))), "id_b")
      else pairs
        .join(ef.select(col(idCol).as("id_a"), col("_vf").as("_va")), "id_a")
        .join(ef.select(col(idCol).as("id_b"), col("_vf").as("_vb")), "id_b")
    val drops = confirmed
      .filter(cos(col("_va"), col("_vb")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("_dropped", lit(true))
    a.join(drops, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("_dropped").isNull.as("kept"))
  }
}

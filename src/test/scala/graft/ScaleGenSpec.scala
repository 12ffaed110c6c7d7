package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf1 staging generator must scale every relation `copies`× while
  * keeping the properties the scale sweep's queries rely on: referential
  * integrity per copy, copy-disjoint key domains, copy 0 = identity, the
  * documents `n_chars = length(text)` invariant, and NO cross-copy
  * exact/near duplicates (verbatim replication would inject a quadratic
  * dup-cluster artifact into the dedup tier — ScaleGen scaladoc). */
class ScaleGenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def stage(): (String, String) = {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_sgen_src").toString
    val dst = Files.createTempDirectory("graft_sgen_dst").toString
    def w(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$src/$name.parquet")
    w("region", Seq((0, "r0"), (1, "r1")).toDF("r_regionkey", "r_name"))
    w("nation", Seq((0, "n0", 0), (1, "n1", 1)).toDF("n_nationkey", "n_name", "n_regionkey"))
    w("customer", (0L to 4L).map(i => (i, s"c$i", (i % 2).toInt, i * 1.5, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    w("supplier", (0L to 2L).map(i => (i, s"s$i", (i % 2).toInt, i * 2.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    w("part", (0L to 3L).map(i => (i, s"p$i", s"B$i", "T", 1, 9.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    w("orders", (0L to 9L).map(i => (i, i % 5, "O", 10.0 * i,
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    w("lineitem", (0L to 19L).map(i => (i % 10, i % 4, i % 3, (i % 7).toInt,
        1.0, 2.0, 0.05, 0.01, "N", "O",
        java.sql.Timestamp.valueOf("2020-02-01 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"))
    w("events", (0L to 7L).map(i => (i,
        java.sql.Timestamp.valueOf(s"2024-01-0${(i % 5) + 1} 00:00:00"),
        i % 5, "view", 1.0, """{"k": 1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val docs = Seq((0L, "spark query engine", "en", "src0"),
      (1L, "fast hash join", "en", "src1"),
      (2L, "spark query engine", "zh", "src0")) // an intra-copy exact dup
    w("documents", docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long")))
    w("embeddings", (0L to 3L).map(i => (i, Array(0.25f * i, 1.0f, -0.5f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label"))
    (src, dst)
  }

  test("3-copy replication: counts, FK integrity, key disjointness, copy-0 identity") {
    val (src, dst) = stage()
    ScaleGen.run(spark, src, dst, copies = 3)
    def rd(d: String, t: String) = spark.read.parquet(s"$d/$t.parquet")

    // dimension tables copy as-is, everything else scales 3x
    assert(rd(dst, "region").count() === 2L)
    assert(rd(dst, "nation").count() === 2L)
    for (t <- Seq("customer" -> 15L, "supplier" -> 9L, "part" -> 12L,
        "orders" -> 30L, "lineitem" -> 60L, "events" -> 24L,
        "documents" -> 9L, "embeddings" -> 12L))
      assert(rd(dst, t._1).count() === t._2, t._1)

    // keys stay unique across copies
    assert(rd(dst, "orders").select("o_orderkey").distinct().count() === 30L)
    assert(rd(dst, "customer").select("c_custkey").distinct().count() === 15L)

    // per-copy referential integrity: every FK resolves
    val o = rd(dst, "orders"); val c = rd(dst, "customer")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count() === 0L)
    val l = rd(dst, "lineitem")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count() === 0L)
    assert(l.join(rd(dst, "part"), l("l_partkey") === col("p_partkey"), "left_anti").count() === 0L)
    assert(l.join(rd(dst, "supplier"), l("l_suppkey") === col("s_suppkey"), "left_anti").count() === 0L)
    // events.user_id moves WITH the customer stride (it is a custkey FK)
    val e = rd(dst, "events")
    assert(e.join(c, e("user_id") === c("c_custkey"), "left_anti").count() === 0L)

    // copy 0 is the identity: the source relations are a strict subset
    val srcOrders = rd(src, "orders")
    assert(srcOrders.except(rd(dst, "orders")).count() === 0L)
    assert(rd(src, "documents").except(rd(dst, "documents")).count() === 0L)
  }

  test("perturbation: docs stay length-consistent and cross-copy disjoint; vectors never tie") {
    val (src, dst) = stage()
    ScaleGen.run(spark, src, dst, copies = 3)
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    // n_chars invariant survives the Caesar rotation
    assert(docs.where(col("n_chars") =!= length(col("text"))).count() === 0L)
    // the intra-copy exact dup is PRESERVED per copy (2 distinct texts of 3
    // docs, times 3 disjoint copies = 6 distinct texts over 9 docs) and no
    // cross-copy collisions appear
    assert(docs.select("text").distinct().count() === 6L)
    // embeddings: all vectors pairwise distinct (no cosine ties by construction)
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    assert(emb.select("embedding").distinct().count() === 12L)
    // copy 1 of source vec 0 ([0, 1, -0.5], stride 4) is the CIRCULAR
    // ROTATION by 1 plus the copy/1024 tie-break on component 0 — an
    // isometry, so copies are ~orthogonal to their originals instead of
    // 0.9999-cosine near-dups (the measured quadratic LSH artifact a
    // nudge-only perturbation injected at sf1)
    val v = emb.where(col("vec_id") === 4L)
      .head().getAs[scala.collection.Seq[Float]]("embedding")
    assert(v === Seq(1.0f + 1.0f / 1024, -0.5f, 0.0f))
  }

  test("letter substitution is a bijection and never wraps below 312 copies") {
    val (from, to) = ScaleGen.shifted(3)
    assert(from.length === to.length)
    assert(to.toSet.size === to.length)
    assert(ScaleGen.shifted(0)._1 === ScaleGen.shifted(0)._2)
    // copies 0..25 remain the original Caesar rotation (staged-dir
    // compatibility)
    assert(ScaleGen.shifted(5)._2.take(26) === "fghijklmnopqrstuvwxyzabcde")
    // the affine extension must NOT wrap at 26 (copy 26 == copy 0 would
    // plant verbatim cross-copy duplicate text at 100-copy stagings)
    val maps = (0 until 312).map(c => ScaleGen.shifted(c)._2)
    assert(maps.distinct.size === 312)
    maps.foreach(m => assert(m.take(26).toSet.size === 26)) // all bijections
  }

  test("many-copy staging: grouped appends keep the row set, embeddings never re-collide past the rotation wrap") {
    import spark.implicits._
    val (src, dst) = stage()
    // realistic-dim embeddings for the wrap test: production vectors are
    // dim 64; a dim-3 fixture gives the flip pattern only 3 bits, so
    // all-zero patterns appear by pigeonhole no matter the hash. dim 16
    // with copies=20 exercises exactly the 100-copies-at-dim-64 shape:
    // copies 16..19 share copies 0..3's rotations and must decorrelate
    // via the sign-flip isometry (P(all-zero pattern) = 2^-16).
    (0L to 3L).map(i => (i,
        Array.tabulate(16)(j => 0.1f * ((i + j) % 7) - 0.25f), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    // copies=20 exercises the grouped-append path (two write groups)
    ScaleGen.run(spark, src, dst, copies = 20)
    def rd(t: String) = spark.read.parquet(s"$dst/$t.parquet")
    assert(rd("lineitem").count() === 400L)
    assert(rd("orders").select("o_orderkey").distinct().count() === 200L)
    val emb = rd("embeddings")
    assert(emb.count() === 80L)
    // all vectors pairwise distinct — rotation+flip+epsilon never ties
    assert(emb.select("embedding").distinct().count() === 80L)
    val vecs = emb.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("embedding"))
      .toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // sign flips are an isometry: every copy of vec 0 keeps its norm
    val n0 = math.sqrt(vecs(0L).map(x => x.toDouble * x).sum)
    for (c <- 1 until 20) {
      val nc = math.sqrt(vecs(c * 4L).map(x => x.toDouble * x).sum)
      assert(math.abs(nc - n0) < 0.05, s"copy $c norm drifted: $nc vs $n0")
    }
    // copies sharing a rotation (c and c+dim) must NOT be near-dups —
    // the additive-nudge artifact the sign-flip exists to prevent
    for (c <- 16 until 20) {
      val sim = cos(vecs((c - 16) * 4L).toSeq, vecs(c * 4L).toSeq)
      assert(math.abs(sim) < 0.98, s"copy $c is a near-dup of copy ${c - 16} (cos=$sim)")
    }
    // docs: 20 copies x 2 distinct texts per copy, no cross-copy collision
    val docs = rd("documents")
    assert(docs.where(col("n_chars") =!= length(col("text"))).count() === 0L)
    assert(docs.select("text").distinct().count() === 40L)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a driver testdata dir: replicates every
  * scale-bearing table `copies`× with key-domain offsets, preserving
  * referential integrity, so the scaling sweep gets a measurement point
  * past `/root/testdata/sf0.1` (VERDICT r9 #1 — the crossover claim must
  * be measured, not extrapolated; the reference's own methodology runs at
  * 10 GB-class scale, /root/reference/benchmarks/zillow/Z1/runtuplex.py:12).
  *
  * Both engines (Spark and the DuckDB oracle) read the SAME staged parquet,
  * so the generator only needs determinism, not engine-neutral replay:
  * copy 0 is the identity (the scaled dir strictly contains the source
  * relations), copies 1..n-1 offset each key domain by `c × (max(key)+1)`
  * — strides derived from the data, dense 0-based keys stay dense.
  *
  * Foreign keys move together: `events.user_id` is a customer-key FK in
  * the driver data (every distinct user_id resolves against c_custkey at
  * sf0.1), so it shifts by the CUSTOMER stride, keeping per-copy
  * event→customer joins intact.
  *
  * Naive replication would also create artifacts the original data does
  * not have, so two tables get deterministic per-copy perturbation:
  *  - `documents.text` is Caesar-rotated by the copy index (letters only,
  *    length-preserving — the `n_chars = length(text)` invariant holds).
  *    Verbatim copies would make every doc a 10-way exact/near duplicate:
  *    dup-cluster sizes ×10 ⇒ LSH pair expansion ×100 — a QUADRATIC
  *    artifact of the generator, not the corpus. Rotation keeps each
  *    copy's internal dup structure identical to the source (what dedup
  *    should scale against) while cross-copy vocabularies stay disjoint.
  *  - `embeddings.embedding` is circularly rotated by the copy index and
  *    component 0 then shifts by `copy/1024f` (exact in binary). Rotation
  *    is an isometry — every within-copy dot product (so all cluster
  *    geometry) is exactly the source's — while cross-copy vectors
  *    decorrelate to ~orthogonal. A small additive nudge alone was
  *    measured WRONG: it left copies ~0.9999-cosine near-dups of their
  *    originals, so embedding near-dup clusters grew 10× and LSH pair
  *    expansion 100× — a quadratic generator artifact (q_dedup_embed_lsh
  *    1.7 s → 23 s at sf1), the exact failure the text rotation avoids.
  *    The epsilon stays to break exact ties for shift-periodic vectors.
  *
  * Region/nation are dimension tables (5/25 rows) and copy as-is; nation
  * FKs in customer/supplier are therefore left untouched.
  *
  * Output layout: `<dest>/<table>.parquet` as a DIRECTORY of part files
  * sized ~8 MB so a scan parallelizes (a single coalesced file would hold
  * one row group and serialize every read at exactly the scale point that
  * exists to measure throughput). scripts/check.py and baseline_bench.py
  * glob directories transparently.
  */
object ScaleGen {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Per-copy letter substitution. Copies 0..25 are the original Caesar
    * rotation (bit-compatible with every staged dir built before copy
    * counts above 26 existed); past 26 the map generalizes to the affine
    * cipher `i -> (a·i + b) mod 26` with `a` stepping through the
    * residues coprime to 26 — 312 distinct length-preserving injective
    * vocabularies, so a 100-copy staging (sf0.1 -> sf10 directly, the
    * embedding-family gate) never wraps back to an earlier copy's text
    * the way pure rotation does at period 26 (copy 26 ≡ copy 0 would
    * plant verbatim cross-copy duplicates — the quadratic generator
    * artifact this perturbation exists to avoid). */
  private[graft] def shifted(c: Int): (String, String) = {
    val coprimes = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val a = coprimes((c / 26) % 12)
    val b = ((c % 26) + 26) % 26
    val lo = (0 until 26).map(i => alpha((a * i + b) % 26)).mkString
    (alpha + alpha.toUpperCase, lo + lo.toUpperCase)
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val destDir = args.lift(1).getOrElse(
      s"${System.getProperty("user.dir")}/testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset — a single-family
    // scale point (e.g. the 2M-vector embeddings dir for the confirm
    // fallback gate) must not pay lineitem×1000 in disk
    val only = args.lift(3).map(_.split(",").map(_.trim).toSet)
    require(copies >= 1, s"copies must be >= 1, got $copies")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scalegen")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, srcDir, destDir, copies, only)
    spark.stop()
    println(s"""{"scalegen":"ok","src":"$srcDir","dest":"$destDir","copies":$copies}""")
  }

  private def srcBytes(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    else f.length
  }

  def run(spark: SparkSession, srcDir: String, destDir: String,
      copies: Int, only: Option[Set[String]] = None): Unit = {
    def want(t: String) = only.forall(_.contains(t))
    def rd(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    // stride = max(key)+1 over every relation carrying the domain, so a
    // dangling FK in the source could never collide across copies
    def stride(cols: (String, String)*): Long =
      cols.map { case (t, c) =>
        rd(t).agg(max(col(c).cast("long"))).head().getLong(0)
      }.max + 1L

    val soKey = stride("orders" -> "o_orderkey", "lineitem" -> "l_orderkey")
    val scKey = stride("customer" -> "c_custkey", "orders" -> "o_custkey",
      "events" -> "user_id")
    val spKey = stride("part" -> "p_partkey", "lineitem" -> "l_partkey")
    val ssKey = stride("supplier" -> "s_suppkey", "lineitem" -> "l_suppkey")
    val seKey = stride("events" -> "event_id")
    val sdKey = stride("documents" -> "doc_id")
    val svKey = stride("embeddings" -> "vec_id")

    def off(name: String, s: Long, c: Int) =
      (df: DataFrame) => df.withColumn(name, col(name) + lit(s * c))

    def replicate(t: String)(perCopy: (DataFrame, Int) => DataFrame): Unit = {
      val src = rd(t)
      // At least 8 parts per replicated table: a small compressed table
      // (documents at 10x sf0.1 is ~6 MB) written as ONE part is one row
      // group = one input split, so every stage derived from it runs 1-2
      // tasks on a 32-thread session — the scale point then times
      // SINGLE-THREADED text kernels and misreports their growth (found
      // live: q_bpe_packing's 5.7 s and q_langid_confusion's 5.8 s
      // 2-task stages at sf1). A 100 TB corpus is never one file; the
      // staged dir should have the scan parallelism the real thing has.
      val parts = math.max(8, math.min(64,
        (srcBytes(s"$srcDir/$t.parquet") * copies / (4L << 20)).toInt))
      // Loop-of-appends in groups of <=10 copies: a single 100-wide union
      // plan grows the optimizer/codegen cost superlinearly with the copy
      // count (ADVICE r10) — grouped appends keep every written plan at
      // most 10-wide while producing the identical row set.
      val groups = (0 until copies).grouped(10).toSeq
      groups.zipWithIndex.foreach { case (g, gi) =>
        val out = g.map(c => perCopy(src, c)).reduce(_ union _)
        // ceiling division (ADVICE r11): truncation could make group part
        // counts sum BELOW the >=8-part floor (parts=8, copies=15 → 5+2=7)
        val gParts = math.max(1, (parts * g.size + copies - 1) / copies)
        // SKIP the repartition shuffle for big tables: its only purpose is
        // the >=8-part floor for small inputs, and a big staged table
        // (lineitem x10 at the sf100 point = 13 GB) already carries >=
        // copies x input-split parts naturally — shuffling it doubles the
        // transient disk (shuffle files + parquet temporaries) and killed
        // the sf100 staging on a 27 GB-free box ("No space left on
        // device") for zero layout benefit.
        val writer =
          if (srcBytes(s"$srcDir/$t.parquet") * g.size > (512L << 20)) out
          else out.repartition(gParts)
        writer.write
          .mode(if (gi == 0) "overwrite" else "append")
          .parquet(s"$destDir/$t.parquet")
      }
    }
    def copyAsIs(t: String): Unit =
      rd(t).coalesce(1).write.mode("overwrite").parquet(s"$destDir/$t.parquet")

    if (want("region")) copyAsIs("region")
    if (want("nation")) copyAsIs("nation")
    if (want("customer")) replicate("customer") { (df, c) => off("c_custkey", scKey, c)(df) }
    if (want("supplier")) replicate("supplier") { (df, c) => off("s_suppkey", ssKey, c)(df) }
    if (want("part")) replicate("part") { (df, c) => off("p_partkey", spKey, c)(df) }
    if (want("orders")) replicate("orders") { (df, c) =>
      off("o_custkey", scKey, c)(off("o_orderkey", soKey, c)(df))
    }
    if (want("lineitem")) replicate("lineitem") { (df, c) =>
      off("l_suppkey", ssKey, c)(off("l_partkey", spKey, c)(
        off("l_orderkey", soKey, c)(df)))
    }
    if (want("events")) replicate("events") { (df, c) =>
      off("user_id", scKey, c)(off("event_id", seKey, c)(df))
    }
    if (want("documents")) replicate("documents") { (df, c) =>
      val based = off("doc_id", sdKey, c)(df)
      if (c == 0) based
      else {
        val (from, to) = shifted(c)
        based.withColumn("text", translate(col("text"), from, to))
      }
    }
    if (want("embeddings")) replicate("embeddings") { (df, c) =>
      val based = off("vec_id", svKey, c)(df)
      if (c == 0) based
      else {
        // circular rotation by c mod dim: element i of the output is
        // element (i + k) mod dim of the source — norm- and
        // geometry-preserving for any copy count. Rotation alone wraps at
        // dim copies (copy 64 of a 64-dim corpus would be a ~0.9999-
        // cosine near-dup of copy 0 — the additive-nudge artifact that
        // was measured wrong at sf1), so past the first wrap each copy
        // ALSO applies a deterministic per-copy sign-flip pattern keyed
        // on q = c / dim: any fixed sign pattern is an isometry (all
        // within-copy geometry exact), while two copies with equal
        // rotation but different q decorrelate to ~orthogonal. q == 0
        // (every staging with copies <= dim, incl. the existing sf1/sf10
        // dirs) flips nothing — bit-compatible with prior stagings.
        val k = pmod(lit(c), size(col("embedding")))
        val q = floor(lit(c) / size(col("embedding"))).cast("long")
        based.withColumn("embedding", transform(
          concat(slice(col("embedding"), k + 1, size(col("embedding"))),
            slice(col("embedding"), lit(1), k)),
          (x, i) => {
            // xxhash64 for the flip bit: a multiplicative bit-13 hash
            // left q=3 (copy 9, dim 3) with an all-zero pattern — a
            // 0.99997-cosine near-dup, the exact artifact this prevents
            val flip = q > 0 && pmod(xxhash64(i, q), lit(2)) === 1
            val signed = when(flip, -x).otherwise(x)
            when(i === 0, signed + lit(c / 1024.0f)).otherwise(signed)
          }))
      }
    }
  }
}

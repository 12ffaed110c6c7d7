package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SynthText

/** Structural properties of the long-tail synthetic text fixture
  * (ops/SynthText.scala) — the planted group layout every re-pointed
  * similarity/dedup query depends on. Cross-ENGINE identity is proven
  * separately by the DuckDB oracle runs (each re-pointed oracle
  * regenerates the corpus via SynthText.duckCte and hash-matches). */
class SynthTextSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val dir = "/root/testdata/sf0.001"

  private lazy val texts: Map[Long, String] =
    SynthText.docs(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("members 0 and 4 of every full group are verbatim identical") {
    val groups = texts.keys.groupBy(_ / 5)
    val full = groups.filter(_._2.size == 5)
    assert(full.nonEmpty)
    full.keys.foreach { g =>
      assert(texts(5 * g) === texts(5 * g + 4), s"group $g exact-dup pair")
    }
  }

  test("members 1..3 differ from the base in at most position 12-3r") {
    val groups = texts.keys.groupBy(_ / 5).filter(_._2.size == 5)
    var nDiff = 0
    groups.keys.foreach { g =>
      val base = texts(5 * g).split(" ")
      (1 to 3).foreach { r =>
        val m = texts(5 * g + r).split(" ")
        assert(m.length === base.length, s"group $g member $r length")
        val diffs = base.indices.filter(i => base(i) != m(i))
        // the doc-keyed override word occasionally COINCIDES with the
        // base word (head-octave collisions, ~0.6% of draws) — then the
        // member is another exact duplicate, which the queries handle;
        // a diff anywhere else would be a generator bug
        assert(diffs.isEmpty || diffs === Seq(12 - 3 * r - 1),
          s"group $g member $r diff positions $diffs")
        if (diffs.nonEmpty) nDiff += 1
      }
    }
    assert(nDiff > groups.size * 2, "perturbations almost never coincide")
  }

  test("vocabulary is long-tail: thousands of types, head df far above median df") {
    val toks = texts.values.flatMap(_.split(" ")).toSeq
    val df = texts.values
      .flatMap(_.split(" ").distinct).groupBy(identity).map(_._2.size)
    val types = df.size
    // ~12k skewed draws at sf0.001 sample ~1.6k of the 16k-word domain
    assert(types > 1000, s"only $types distinct words")
    // 15x, not a knife-edge: the exact head df moves a little with the
    // scale salt (99 vs 100 under the sf0.001 lineitem-count salt); the
    // property being guarded is an order-of-magnitude head/median gap
    val sorted = df.toSeq.sortBy(-_)
    assert(sorted.head > 15 * sorted(types / 2),
      s"head df ${sorted.head} vs median ${sorted(types / 2)} — not long-tail")
    // word ids live in the documented octave range [16, 16384)
    toks.foreach { w =>
      val id = w.stripPrefix("w").toLong
      assert(id >= 16 && id < 16384, s"word id $id out of range")
    }
  }

  test("corpus is scale-dependent: same doc_id, different text across SFs") {
    // The documents table carries the SAME doc_id set at every SF, so a
    // doc_id-only generator would make the dual-scale oracle gate run
    // identical data twice (ADVICE r8). The lineitem-count salt must
    // produce a different corpus at a different scale factor.
    val other = SynthText.docs(spark, "/root/testdata/sf0.01")
      .filter(col("doc_id") < 25).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(other.nonEmpty)
    val differing = other.keys.count(id => texts.get(id).exists(_ != other(id)))
    assert(differing > other.size / 2,
      s"only $differing/${other.size} texts differ between sf0.001 and sf0.01 — salt inert")
  }

  test("vocabulary grows Heaps-style past the sf0.1-sized salt, frozen below it") {
    import spark.implicits._
    // evaluate textExpr directly under controlled salts: the octave range
    // must stay [4,13] (word ids < 2^14) for every driver test scale —
    // the committed expected hashes depend on byte-identity there — and
    // gain one octave per corpus doubling past that (tail dfs stay
    // scale-invariant like real text, so similarity self-joins keep
    // their sf0.1 shape instead of going quadratic on a closed vocab)
    def maxWid(salt: Long): Long =
      (0L until 400L).map(i => (i, salt)).toDF("doc_id", "salt")
        .select(explode(split(expr(SynthText.textExpr("spark")), " ")).as("w"))
        .select(max(substring(col("w"), 2, 10).cast("long"))).head().getLong(0)
    val frozen = maxWid(600001L)
    assert(frozen < (1L << 14), s"sf<=0.1 vocab must stay in [16,16384): $frozen")
    val grown = maxWid(600001L * 10)
    assert(grown >= (1L << 16) && grown < (1L << 17),
      s"10x salt must add exactly 3 octaves (ids reach [2^16,2^17)): $grown")
  }

  test("document lengths are group-keyed in [18, 30]") {
    val groups = texts.keys.groupBy(_ / 5).filter(_._2.size == 5)
    groups.foreach { case (g, ids) =>
      val lens = ids.map(texts(_).split(" ").length).toSet
      assert(lens.size === 1, s"group $g mixed lengths $lens")
      assert(lens.head >= 18 && lens.head <= 30)
    }
  }
}

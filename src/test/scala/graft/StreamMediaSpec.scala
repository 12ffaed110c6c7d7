package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.ops.Tables
import graft.streaming.Streams

class StreamMediaSpec extends AnyFunSuite {

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

  val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals batch aggregation") {
    val streamed = Streams.runWindowedAgg(spark, dir, "1 day",
        Seq("n" -> count(lit(1))))
      .select(to_date(col("window.start")).as("day"), col("event_type"), col("n"))
    val batch = Tables(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful mapGroupsWithState user counts equal batch counts") {
    val streamed = Streams.userEventCounts(spark, dir)
    val batch = Tables(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("resize/resample update typed metadata, payload intact") {
    val media = Multimodal.withBinaryPayload(
      Tables(spark, dir, "documents").limit(10), "text", "image")
    val r = Multimodal.resample(Multimodal.resize(media, 224, 224), 8000)
      .select(col("meta.width"), col("meta.height"), col("meta.sample_rate"),
        octet_length(col("payload")).as("len"), length(col("text")).as("tlen"))
      .collect()
    assert(r.forall(x => x.getInt(0) == 224 && x.getInt(1) == 224 && x.getInt(2) == 8000))
    assert(r.forall(x => x.getInt(3) == x.getInt(4))) // payload untouched
  }

  test("streaming watermarked dedup equals batch dropDuplicates") {
    val streamed = Streams.dedupStream(spark, dir,
      Seq("user_id", "event_type"))
    val batch = Tables(spark, dir, "events")
      .dropDuplicates("user_id", "event_type", "ts")
    assert(streamed.count() == batch.count())
  }

  test("png payloads decode to their true dimensions via javax.imageio") {
    val media = Multimodal.withPngPayload(
      Tables(spark, dir, "documents").select("doc_id").limit(5), "doc_id")
    media.collect().foreach { row =>
      val id = row.getLong(0)
      val (w, h) = Multimodal.decodeImageMeta(row.getAs[Array[Byte]]("payload"))
      assert(w == 8 + (id % 24).toInt && h == 8 + (id % 16).toInt)
    }
  }

  test("multimodal payload round-trip: bytes, meta, batched features") {
    val media = Multimodal.withBinaryPayload(
      Tables(spark, dir, "documents"), "text", "image")
    val row = media.select(col("payload"), col("meta.kind"),
      col("meta.sample_rate"), col("text")).head()
    assert(new String(row.getAs[Array[Byte]](0), "UTF-8") == row.getString(3))
    assert(row.getString(1) == "image" && row.getInt(2) == 16000)

    val feats = Multimodal.extractFeatures(media, "doc_id", "payload", dim = 8)
    val f = feats.head()
    assert(f.getSeq[Float](1).size == 8)
    assert(feats.count() == media.count())
    // deterministic: same payload → same features
    val twice = Multimodal.extractFeatures(media, "doc_id", "payload", dim = 8)
    assert(feats.exceptAll(twice).isEmpty)
  }

  test("frame sampling yields n binary chunks") {
    val media = Multimodal.withBinaryPayload(
      Tables(spark, dir, "documents"), "text", "video")
    val r = Multimodal.frameSample(media, "payload", 4).select("frames").head()
    assert(r.getSeq[Array[Byte]](0).size == 4)
  }

  test("foreachBatch upsert collapses a replayed stream to the batch table") {
    val table = Streams.upsertStream(spark, dir, Seq("event_id"))
    val batch = Tables(spark, dir, "events")
    assert(table.count() == batch.count()) // replay fully deduplicated
    val t = table.select("event_id", "event_type", "user_id")
    val b = batch.select("event_id", "event_type", "user_id")
    assert(t.exceptAll(b).isEmpty && b.exceptAll(t).isEmpty)
  }

  test("index-probed streaming ingest equals the batch dedup formulation") {
    import org.apache.spark.sql.functions._
    val got = Streams.dedupIngestStream(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), md5(lower(regexp_replace(trim(col("text")),
        "\\s+", " ")).cast("binary")).as("content_hash"))
    val corpusHashes = docs.filter(col("doc_id") % 3 =!= 0)
      .select("content_hash").distinct()
    val want = docs.join(corpusHashes, Seq("content_hash"), "left_anti")
      .groupBy("content_hash").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "content_hash")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // second run reuses the memoized index + staging, same answer
    val again = Streams.dedupIngestStream(spark, dir)
    assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty)
  }

  test("stream-static join + windowed agg equals the batch join") {
    val dim = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val streamed = Streams.streamStaticWindowedAgg(spark, dir, dim,
        "user_id", "c_custkey", "c_nationkey", "1 day",
        Seq("n" -> count(lit(1))))
      .select(to_date(col("window.start")).as("day"), col("c_nationkey"), col("n"))
    val batch = Tables(spark, dir, "events")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(to_date(col("ts")).as("day"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stream-stream banded join pairs every event exactly once") {
    val joined = Streams.streamStreamJoin(spark, dir)
    val batch = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    assert(joined.exceptAll(batch).isEmpty && batch.exceptAll(joined).isEmpty)
  }

  test("nearest-neighbor resize is pixel-exact through the PNG round-trip") {
    val media = Multimodal.withPngPayload(
      Tables(spark, dir, "documents").select("doc_id").limit(8), "doc_id")
    val probed = Multimodal.imageProbe(
      Multimodal.imageResize(media, "doc_id", "payload", w = 12, h = 10),
      "doc_id", "payload").collect()
    probed.foreach { r =>
      val id = r.getLong(0)
      val (sw, sh) = (8 + (id % 24).toInt, 8 + (id % 16).toInt)
      val seed = id * 2654435761L
      def px(x: Int, y: Int) = (seed + 31L * x + 17L * y) & 0xFFFFFF
      assert(r.getInt(1) == 12 && r.getInt(2) == 10)
      assert(r.getLong(3) == px(0, 0))
      assert(r.getLong(4) == px(11 * sw / 12, 9 * sh / 10))
    }
  }

  /** Deterministic test images for the perceptual-hash tier: structure
    * (not palette) drives dHash, so the pattern function is the control. */
  private def patternPng(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y) & 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image dHash: re-encode/resize invariance, perturbation tolerance, structure separation") {
    import spark.implicits._
    // brightness is a function of the 9x8 dHash CELL the pixel falls in,
    // so the area-averaged grid recovers the exact same values at any
    // resolution (true resize invariance, non-degenerate hash)
    def cells(w: Int, h: Int)(f: (Int, Int) => Int)(x: Int, y: Int): Int = {
      val v = f(x * 9 / w, y * 8 / h) & 0xFF; (v << 16) | (v << 8) | v
    }
    def base(cx: Int, cy: Int) = ((cx * 37 + cy * 53) % 9) * 28
    def checker(x: Int, y: Int) = if (((x / 4) + (y / 4)) % 2 == 0) 0xFFFFFF else 0
    val imgs = Seq(
      (0L, patternPng(32, 24)(cells(32, 24)(base))),  // base pattern
      (1L, patternPng(32, 24)(cells(32, 24)(base))),  // exact duplicate bytes
      (2L, patternPng(64, 48)(cells(64, 48)(base))),  // same structure, 2x size
      (3L, patternPng(32, 24)((x, y) =>              // light noise on the base
        cells(32, 24)(base)(x, y) ^ (if ((x * 7 + y * 13) % 97 == 0) 0x000008 else 0))),
      (4L, patternPng(32, 24)(checker)),              // different structure
      (5L, patternPng(32, 24)(cells(32, 24)((cx, cy) => base(8 - cx, cy)))) // mirrored
    ).toDF("doc_id", "payload")
    val hs = Multimodal.imageDHash(imgs, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(0L) == hs(1L), "identical payloads must hash identically")
    assert(hs(0L) == hs(2L), "area-averaged dHash must be resize-invariant")
    assert(ham(hs(0L), hs(3L)) <= 3, "light perturbation flips at most a few bits")
    assert(ham(hs(0L), hs(4L)) > 10, "different structure must be far")
    assert(ham(hs(0L), hs(5L)) > 10, "mirrored gradient must be far")
    // near-dup pairs via banding: the {0,1,2,3} cluster, never 4/5
    // (clear first: the session is shared across suites and registry
    // queries legitimately leave harness-released persists behind)
    spark.sqlContext.clearCache()
    val pairs = Multimodal.imageNearDupDHash(imgs, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) &&
      pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L || a == 5L || b == 5L })
    assert(spark.sharedState.cacheManager.isEmpty,
      "imageNearDupDHash must release its hash cache")
  }

  test("WAV round-trip: encode -> parse recovers rate and every sample") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 511L, 513L)
    val df = Multimodal.withWavPayload(ids.toDF("doc_id"), "doc_id")
    val probed = Multimodal.wavProbe(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    ids.foreach { id =>
      val n = 256 + (id % 512).toInt
      val ref = (0 until n).map(i =>
        (java.lang.Math.floorMod(id * 2654435761L + i.toLong * 40503L, 65536L) - 32768L))
      val peak = ref.map(math.abs).max
      val sumSq = ref.map(v => v * v).sum
      val zc = ref.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(probed(id) == ((8000, n.toLong, n.toLong * 1000 / 8000, peak, sumSq, zc.toLong)),
        s"id $id")
    }
  }

  test("wavDecimate emits a valid half-rate WAV equal to every-2nd-sample") {
    import spark.implicits._
    val df = Multimodal.withWavPayload(Seq(3L, 300L).toDF("doc_id"), "doc_id")
    val dec = Multimodal.wavDecimate(df, "doc_id", "payload", factor = 2)
    dec.collect().foreach { r =>
      val id = r.getLong(0)
      val (rate, s) = Multimodal.parseWav(r.getAs[Array[Byte]](1))
      assert(rate == 4000)
      val n = 256 + (id % 512).toInt
      val ref = (0 until n by 2).map(i =>
        (java.lang.Math.floorMod(id * 2654435761L + i.toLong * 40503L, 65536L) - 32768L).toShort)
      assert(s.toSeq == ref, s"id $id decimated samples")
    }
  }

  test("parseWav rejects non-RIFF payloads and truncated containers") {
    intercept[IllegalArgumentException] {
      Multimodal.parseWav("definitely not a wav".getBytes ++ new Array[Byte](40))
    }
    // valid header tag but no chunks -> missing fmt/data must be caught
    val bare = java.nio.ByteBuffer.allocate(44)
    bare.put("RIFF".getBytes); bare.putInt(36); bare.put("WAVE".getBytes)
    intercept[IllegalArgumentException] { Multimodal.parseWav(bare.array()) }
  }

  test("AVI encode -> parse round-trips every frame pixel-exactly") {
    val w = 10; val h = 8; val n = 3; val seed = 42L * 2654435761L
    val bytes = Multimodal.encodeAviFrames(w, h, (0 until n).map(f =>
      Array.tabulate(w * h)(i => (java.lang.Math.floorMod(
        seed + 31L * (i % w) + 17L * (i / w) + 73L * f, 16777216L)).toInt)))
    val (pw, ph, frames) = Multimodal.parseAvi(bytes)
    assert(pw == w && ph == h && frames.length == n)
    for (f <- 0 until n; y <- 0 until h; x <- 0 until w)
      assert(frames(f)(y * w + x) == (java.lang.Math.floorMod(
        seed + 31L * x + 17L * y + 73L * f, 16777216L)).toInt,
        s"frame $f pixel ($x,$y)")
  }

  test("aviFrameSample keeps exactly the stride frames and emits a valid AVI") {
    import spark.implicits._
    val df = Multimodal.withAviPayload(Seq(5L).toDF("doc_id"), "doc_id") // 3 frames
    val sampled = Multimodal.aviFrameSample(df, "doc_id", "payload", stride = 2)
      .collect().head.getAs[Array[Byte]](1)
    val (_, _, frames) = Multimodal.parseAvi(sampled)
    assert(frames.length == 2) // frames 0 and 2 of 3
    val seed = 5L * 2654435761L
    assert(frames(0)(0) == java.lang.Math.floorMod(seed, 16777216L).toInt)
    assert(frames(1)(0) == java.lang.Math.floorMod(seed + 73L * 2, 16777216L).toInt)
  }

  test("parseAvi fails loudly on compressed streams and non-AVI payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.parseAvi("not an avi at all, sorry".getBytes ++ new Array[Byte](20))
    }
    // flip the compression field of a valid container to a fake fourcc
    val ok = Multimodal.encodeAviFrames(4, 4, Seq(Array.fill(16)(0)))
    val idx = {
      // locate 'strf' chunk body: biCompression is at +16 of BITMAPINFOHEADER
      val s2 = new String(ok.map(b => (b & 0xff).toChar))
      s2.indexOf("strf") + 8 + 16
    }
    ok(idx) = 1 // BI_RLE8
    intercept[IllegalArgumentException] { Multimodal.parseAvi(ok) }
  }

  test("persisted image-hash index probe equals the direct dHash join on the split") {
    import spark.implicits._
    val imgs = Multimodal.withPngPayload((0L until 120L).toDF("doc_id"), "doc_id")
    val corpus = imgs.filter(col("doc_id") % 5 =!= 0)
    val delta = imgs.filter(col("doc_id") % 5 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_imgidx_spec").toString
    Multimodal.buildImageHashIndex(corpus, "doc_id", "payload", idx)
    val probed = Multimodal.imageNearDupProbeIndexed(spark, idx, delta,
        "doc_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // direct formulation on the union, restricted to delta x corpus pairs
    val direct = Multimodal.imageNearDupDHash(imgs, "doc_id", "payload", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .flatMap { case (a, b, h) =>
        (if (a % 5 == 0 && b % 5 != 0) Seq((a, b, h)) else Nil) ++
          (if (b % 5 == 0 && a % 5 != 0) Seq((b, a, h)) else Nil)
      }.toSet
    assert(probed == direct, s"probe=${probed.size} direct=${direct.size}")
    assert(spark.sharedState.cacheManager.isEmpty, "probe left cache behind")
  }
}

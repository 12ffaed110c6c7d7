package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plants deterministic near-duplicate "echo" companions into a staged
  * embeddings dir so a high-threshold near-dup run has a NONZERO ground
  * truth (the staged corpus's real pairs all sit below cosine 0.6, but
  * thresholds that low need cluster-scale table counts at 2M vectors —
  * the committed fallback gate instead validates recall against planted
  * pairs at its feasible threshold).
  *
  * Every vec_id % `every` == 0 gains one companion: id' = id + 10^9
  * (clear of every staged id domain), embedding' = embedding +
  * δ·(±1 per component, sign = xxhash64(id, i) parity). For unit-norm
  * sources the companion's cosine is ≈ 1/√(1+dim·δ²) — δ=0.03 at dim 64
  * puts the planted pairs at ~0.97, comfortably above a 0.95 gate.
  * The gate's ground truth stays INDEPENDENT of the planting: it
  * brute-forces sampled exact cosines over the final corpus, so planted
  * and organic pairs are validated the same way.
  *
  * Usage: run_main.sh graft.EchoPlant <dir> [every] [delta]
  * Appends to <dir>/embeddings.parquet in place.
  */
object EchoPlant {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val every = args.lift(1).map(_.toInt).getOrElse(20)
    val delta = args.lift(2).map(_.toDouble).getOrElse(0.03)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = spark.read.parquet(s"$dir/embeddings.parquet")
    // Idempotency guard (ADVICE r13): planted ids are id + 10^9 and
    // 10^9 % every can be 0, so a second run would re-select originals
    // AND echo the planted rows themselves — duplicate vec_ids corrupt
    // the staged corpus and every lower-id/uniqueness assumption
    // downstream. Refuse to re-plant.
    val maxId = src.agg(max("vec_id")).head().getLong(0)
    require(maxId < 1000000000L,
      s"EchoPlant: corpus already contains planted ids (max vec_id=$maxId " +
        ">= 10^9) — re-planting would duplicate vec_ids; restage the dir first")
    val echoes = src.filter(pmod(col("vec_id"), lit(every)) === 0)
      .withColumn("embedding", transform(col("embedding"), (x, i) =>
        (x + lit(delta.toFloat) *
          when(pmod(xxhash64(col("vec_id"), i), lit(2)) === 1, lit(1f))
            .otherwise(lit(-1f))).cast("float")))
      .withColumn("vec_id", col("vec_id") + lit(1000000000L))
      // materialize BEFORE appending to the dir being read (ADVICE r13:
      // an append into one's own lazy source is a self-read hazard)
      .localCheckpoint(true)
    val nEchoes = echoes.count()
    echoes.repartition(4).write.mode("append").parquet(s"$dir/embeddings.parquet")
    println(s"""{"echoplant":"ok","dir":"$dir","every":$every,"delta":$delta,"planted":$nEchoes}""")
    spark.stop()
  }
}

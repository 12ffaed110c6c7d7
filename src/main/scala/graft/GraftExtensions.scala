package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CharNgramHashes, CosineSim, CountMinAgg, HyperplaneSig, MinHashSig, MisraGriesTopK, ShingleHashes, SimHash64, SortedIntersectCount, TokenStats, TopKByScore, WordListHits}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(...)")`
  * works next to the Column API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // opt-in optimizer rule (spark.graft.rangeJoin.bucketWidth > 0):
    // pure range-condition inner joins become bucketized equi-joins
    // instead of nested-loop joins
    e.injectOptimizerRule(_ => graft.plans.RangeJoinBucketRule)
  }
}

object GraftExtensions {

  /** Attach graft's SQL functions + optimizer rule to an ALREADY-BUILT
    * session (the `withExtensions` path needs to run before
    * `getOrCreate`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinBucketRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinBucketRule
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      if (v < Int.MinValue || v > Int.MaxValue) throw new IllegalArgumentException(
        s"$fn: integer argument $v overflows Int")
      else v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $other")
  }

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal argument, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val out = Seq.newBuilder[(String, Seq[Expression] => Expression)]
    def register(name: String)(builder: Seq[Expression] => Expression): Unit =
      out += (name -> builder)

    register("simhash64") { args => SimHash64(args.head) }
    register("nfc_normalize") { args => graft.functions.NfcNormalize(args.head) }
    register("strip_accents") { args => graft.functions.StripAccents(args.head) }
    register("shingle_hashes") { args =>
      ShingleHashes(args(0), intLit(args(1), "shingle_hashes")) }
    register("char_ngram_hashes") { args =>
      CharNgramHashes(args(0), intLit(args(1), "char_ngram_hashes")) }
    register("minhash_sig") { args =>
      MinHashSig(args(0), intLit(args(1), "minhash_sig")) }
    register("sorted_intersect_count") { args =>
      SortedIntersectCount(args(0), args(1)) }
    register("cosine_sim") { args => CosineSim(args(0), args(1)) }
    register("token_stats") { args => TokenStats(args.head) }
    register("word_list_hits") { args =>
      val words = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
          items.map {
            case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
            case other => throw new IllegalArgumentException(
              s"word_list_hits: expected string literals, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"word_list_hits: expected array(...) of string literals, got $other")
      }
      WordListHits(args(0), words)
    }
    register("hyperplane_sig") { args =>
      HyperplaneSig(args(0), intLit(args(1), "hyperplane_sig"),
        intLit(args(2), "hyperplane_sig"),
        if (args.length > 3) longLit(args(3), "hyperplane_sig") else 42L) }
    // typed aggregates register as plain expressions: the analyzer wraps
    // an AggregateFunction in its AggregateExpression at resolution, so
    // `SELECT top_k_by_score(s, id, 3) FROM ... GROUP BY g` just works
    register("top_k_by_score") { args =>
      TopKByScore(args(0), args(1), intLit(args(2), "top_k_by_score")) }
    register("misra_gries") { args =>
      MisraGriesTopK(args(0), intLit(args(1), "misra_gries")) }
    register("count_min") { args =>
      CountMinAgg(args(0), intLit(args(1), "count_min"),
        intLit(args(2), "count_min")) }

    out.result()
  }
}

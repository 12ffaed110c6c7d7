package graft.api

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exception merge-order matrix, mirroring the reference's exhaustive
  * ordered-merge tests (`python/tests/test_exceptions.py:37-268`): rows
  * that divert through filter / resolver / ignore must merge back into
  * EXACTLY the original row order under every interleaving.
  *
  * Marker encoding (like the reference's process() matrix):
  *   -1 → dropped by the filter
  *   -2 → throws in the map, repaired by the resolver (to 100)
  *   -3 → throws in the map, resolver rethrows, second resolver repairs
  *        (to 200) or ignore() drops it
  *   other → passes straight through (doubled by the map)
  */
class ExceptionOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  lazy val ctx = new Context(spark)

  private def mapUdf(x: Int): Int =
    if (x == -2 || x == -3) throw new ArithmeticException(s"boom $x")
    else x * 2

  private def resolve1(x: Int): Int =
    if (x == -3) throw new IllegalStateException("still bad")
    else 100

  /** input → (pipeline output in collect() order, with both resolvers). */
  private def runChain(input: Seq[Int]): Seq[Int] = {
    import spark.implicits._
    ctx.parallelize(input, Seq("x"))
      .filter(col("x") =!= -1)
      .mapColumnUdf[Int, Int]("x")(mapUdf)
      .resolve(classOf[ArithmeticException])(resolve1 _)
      .resolve(classOf[IllegalStateException])((_: Int) => 200)
      .collect().map(_.getInt(0)).toSeq
  }

  private def expected(input: Seq[Int]): Seq[Int] =
    input.filter(_ != -1).map {
      case -2 => 100
      case -3 => 200
      case x => x * 2
    }

  test("all 24 interleavings of (ok, filtered, resolved, unresolved) merge in order") {
    for (perm <- Seq(1, -1, -2, -3).permutations) {
      val input = perm ++ Seq(7, 8) // trailing plain rows after any marker
      assert(runChain(input) == expected(input), s"perm=$perm")
    }
  }

  test("marker runs at head, middle, and tail merge in order") {
    val shapes = Seq(
      Seq(-2, -2, 1, 2, 3),
      Seq(1, 2, -2, -2, 3),
      Seq(1, 2, 3, -2, -2),
      Seq(-3, 1, -3, 2, -3),
      Seq(-1, -2, -3, 1, 2),
      Seq(1, -3, -2, -1, 2))
    for (in <- shapes)
      assert(runChain(in) == expected(in), s"input=$in")
  }

  test("seeded 0.25/0.25/0.25 matrix at n=400 merges in order") {
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val input = Seq.tabulate(400) { i =>
        rnd.nextInt(4) match {
          case 0 => -1
          case 1 => -2
          case 2 => -3
          case _ => i + 1
        }
      }
      assert(runChain(input) == expected(input), s"seed=$seed")
    }
  }

  test("ignore() instead of a second resolver drops unresolved rows in place") {
    import spark.implicits._
    val input = Seq(1, -3, 2, -2, -3, 3)
    val got = ctx.parallelize(input, Seq("x"))
      .filter(col("x") =!= -1)
      .mapColumnUdf[Int, Int]("x")(mapUdf)
      .resolve(classOf[ArithmeticException])(resolve1 _)
      .ignore(classOf[IllegalStateException])
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 4, 100, 6)) // positions: 1→2, 2→4, -2→100, 3→6
  }

  test("exception counts survive partial resolution") {
    import spark.implicits._
    val ds = ctx.parallelize(Seq(1, -2, -3, -3), Seq("x"))
      .mapColumnUdf[Int, Int]("x")(mapUdf)
    assert(ds.exceptionCounts == Map("java.lang.ArithmeticException" -> 3L))
    val after = ds.resolve(classOf[ArithmeticException])(resolve1 _)
    assert(after.exceptionCounts == Map("java.lang.IllegalStateException" -> 2L))
  }

  // -------- reference matrix shapes (test_exceptions.py:123-268) --------

  test("resolver rethrowing the same class leaves those rows unresolved") {
    // test_merge_some_fail: map throws for every negative marker; the
    // resolver repairs -1/-3 in place but rethrows for -2 — the -2 rows
    // must drop out of collect() while everything else keeps its slot.
    import spark.implicits._
    val input = Seq(1, 2, -1, 5, 6, 7, -2, 10, 11, 12, -3, 15)
    val got = ctx.parallelize(input, Seq("x"))
      .mapColumnUdf[Int, Int]("x")(x =>
        if (x < 0) throw new ArithmeticException("neg") else x * 2)
      .resolve[Int, Int](classOf[ArithmeticException])(x =>
        if (x == -2) throw new ArithmeticException("still") else x)
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 4, -1, 10, 12, 14, 20, 22, 24, -3, 30))
  }

  test("all rows fail and resolve (n=500)") {
    import spark.implicits._
    val got = ctx.parallelize(1 to 500, Seq("x"))
      .mapColumnUdf[Int, Int]("x")(_ => throw new ArithmeticException("all"))
      .resolve[Int, Int](classOf[ArithmeticException])(x => -x)
      .collect().map(_.getInt(0)).toSeq
    assert(got == (1 to 500).map(-_))
  }

  test("sparse failures (every 100th of n=2000) merge in order") {
    import spark.implicits._
    val got = ctx.parallelize(1 to 2000, Seq("x"))
      .mapColumnUdf[Int, Int]("x")(x =>
        if (x % 100 == 0) throw new ArithmeticException("p") else x * 2)
      .resolve[Int, Int](classOf[ArithmeticException])(identity)
      .collect().map(_.getInt(0)).toSeq
    val want = (1 to 2000).map(x => if (x % 100 == 0) x else x * 2)
    assert(got == want)
  }

  test("no normal rows in the result (all rows via the error channel)") {
    import spark.implicits._
    val got = ctx.parallelize(Seq(-2, -2, -3, -2), Seq("x"))
      .mapColumnUdf[Int, Int]("x")(mapUdf)
      .resolve(classOf[ArithmeticException])(resolve1 _)
      .resolve(classOf[IllegalStateException])((_: Int) => 200)
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(100, 100, 200, 100))
  }

  test("empty result after filter plus error channel") {
    import spark.implicits._
    val got = ctx.parallelize(Seq(1, -2, 3), Seq("x"))
      .mapColumnUdf[Int, Int]("x")(mapUdf)
      .resolve(classOf[ArithmeticException])(resolve1 _)
      .filter(col("x") > 10000)
      .collect()
    assert(got.isEmpty)
  }

  test("filter-UDF exceptions divert and resolve in order") {
    // test_merge_with_filter: the PREDICATE itself throws; resolved rows
    // re-apply the resolver as the predicate and keep/drop accordingly.
    import spark.implicits._
    val input = Seq(3, 0, 7, 0, 12, 15, 0)
    val got = ctx.parallelize(input, Seq("x"))
      .filterUdf[Int](col("x"))(x =>
        if (x == 0) throw new ArithmeticException("zero") else x > 5)
      .resolve[Int, Boolean](classOf[ArithmeticException])(_ => true)
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 7, 0, 12, 15, 0)) // 3 dropped by predicate, 0s kept by resolver
  }

  // ------------- csv input (parse) errors × position matrix -------------

  /** One single-part csv file of `lines`; parse errors are "USD"-prefixed
    * amounts (string where the hinted schema wants a long). */
  private def csvChain(lines: Seq[String]): DataSet = {
    val dir = java.nio.file.Files.createTempDirectory("graft_exc_csv")
    val f = dir.resolve("in.csv")
    java.nio.file.Files.writeString(f,
      lines.mkString("", "\n", "\n"))
    ctx.csv(f.toString, columns = Seq("k", "amt"), header = Some(false),
      delimiter = Some(","),
      typeHintsAt = Map(0 -> org.apache.spark.sql.types.LongType,
        1 -> org.apache.spark.sql.types.LongType))
  }

  private def csvLines(markers: Seq[Boolean]): Seq[String] =
    markers.zipWithIndex.map { case (bad, i) =>
      if (bad) s"$i,USD${i * 10}" else s"$i,${i * 10}"
    }

  test("csv parse errors at every position pattern resolve and merge in file order") {
    val shapes = Seq(
      Seq(true, true, false, false, false),  // head run
      Seq(false, false, true, true, false),  // middle run
      Seq(false, false, false, true, true),  // tail run
      Seq(true, false, true, false, true),   // alternating
      Seq(true, true, true, true, true),     // all bad
      Seq(false, false, false, false, false) // none bad
    )
    for (shape <- shapes) {
      val got = csvChain(csvLines(shape))
        .resolve[Row, Row](classOf[CsvParseError]) { cells =>
          Row(cells.getString(0).toLong,
            cells.getString(1).stripPrefix("USD").toLong)
        }
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = shape.indices.map(i => (i.toLong, i * 10L))
      assert(got == want, s"shape=$shape")
    }
  }

  test("csv parse errors ignored drop in place, order preserved") {
    val shape = Seq(false, true, false, true, false, false, true)
    val got = csvChain(csvLines(shape))
      .ignore(classOf[CsvParseError])
      .collect().map(_.getLong(0)).toSeq
    assert(got == shape.zipWithIndex.filterNot(_._1).map(_._2.toLong))
  }

  test("csv parse errors then a throwing map UDF: both channels merge in order") {
    // input errors and runtime errors coexist (test_merge_both): parse
    // repairs re-enter first, then the map's own exceptions resolve.
    val shape = Seq(false, true, false, false, true, false)
    val got = csvChain(csvLines(shape))
      .resolve[Row, Row](classOf[CsvParseError]) { cells =>
        Row(cells.getString(0).toLong,
          cells.getString(1).stripPrefix("USD").toLong)
      }
      .mapColumnUdf[Long, Long]("amt")(a =>
        if (a % 20 == 0) throw new ArithmeticException("even ten") else a + 1)
      .resolve[Long, Long](classOf[ArithmeticException])(a => a)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = shape.indices.map { i =>
      val amt = i * 10L
      (i.toLong, if (amt % 20 == 0) amt else amt + 1)
    }
    assert(got == want, s"shape=$shape")
  }
}

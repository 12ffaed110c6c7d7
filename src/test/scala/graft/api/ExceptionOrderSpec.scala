package graft.api

import org.apache.spark.sql.SparkSession
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
}

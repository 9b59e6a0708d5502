package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AMS pair-estimate sketch: shape, determinism, order-of-magnitude
  * accuracy on a planted skew, and the parameter contracts. */
class PairSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(keys: Seq[String]) =
    TextDedup.pairEstimateSketch(keys.toDF("k"), col("k"))
      .as[(Long, Long, Long)].collect().head

  test("n_rows counts the relation; estimate is non-negative") {
    val (n, f2, pairs) = sketch((1 to 500).map(i => s"k$i"))
    n shouldBe 500L
    f2 should be >= 0L
    pairs should be >= 0L
  }

  test("planted mega-bucket dominates the estimate within sketch error") {
    // one key with 1000 rows + 500 singletons: F2 = 1e6 + 500,
    // exact pairs = 499,500 + 0. Median-of-means over 6 groups of 4
    // should land within a small factor.
    val keys = Seq.fill(1000)("hot") ++ (1 to 500).map(i => s"k$i")
    val (n, _, pairs) = sketch(keys)
    n shouldBe 1500L
    pairs should be >= 499500L / 10
    pairs should be <= 499500L * 10
  }

  test("deterministic across runs") {
    val keys = Seq.fill(100)("a") ++ (1 to 300).map(i => s"k$i")
    sketch(keys) shouldBe sketch(keys)
  }

  test("groups must divide counters") {
    an[IllegalArgumentException] should be thrownBy
      TextDedup.pairEstimateSketch(Seq("a").toDF("k"), col("k"),
        counters = 10, groups = 4)
  }

  test("hashed-key form: mega-bucket estimate within sketch error, no md5") {
    val keys = Seq.fill(1000)(7L) ++ (100L to 599L)
    val out = TextDedup.pairEstimateSketchHashed(keys.toDF("k"),
        pmod(col("k") * 2654435761L, lit(2147483647L)))
      .as[(Long, Long, Long)].collect().head
    out._1 shouldBe 1500L
    out._3 should be >= 499500L / 10
    out._3 should be <= 499500L * 10
  }
}

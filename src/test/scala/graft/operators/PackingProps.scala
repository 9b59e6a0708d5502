package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for sequence packing — the invariants the
  * training-data contract rests on: every doc lands in exactly one bin
  * at a sub-budget offset, bins are monotone in id order, and
  * (bin, bin_offset) exactly reconstructs the token stream position. */
object PackingProps extends Properties("packSequences") {

  private lazy val spark = TestSpark.spark

  private val budget = 512

  private val docsGen: Gen[List[(String, Long, Long)]] =
    Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        shard <- Gen.oneOf("a", "b", "c")
        toks <- Gen.choose(1L, budget.toLong) // budget-capped, the contract
      } yield (shard, toks))
    }.map(_.zipWithIndex.map { case ((s, t), i) => (s, i.toLong, t) })

  private def pack(rows: List[(String, Long, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Curation.packSequences(
        rows.toDF("shard", "id", "toks"), "shard", "id", col("toks"), budget)
      .select(col("shard"), col("id"), col("n_tokens"), col("bin"),
        col("bin_offset"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
  }

  property("offsets stay under the budget; bins start at 0") =
    Prop.forAll(docsGen) { rows =>
      val out = pack(rows)
      out.forall(r => r._5 >= 0 && r._5 < budget && r._4 >= 0)
    }

  property("bins are monotone nondecreasing in id order per shard") =
    Prop.forAll(docsGen) { rows =>
      val out = pack(rows)
      out.groupBy(_._1).values.forall { g =>
        val bins = g.sortBy(_._2).map(_._4)
        bins.zip(bins.drop(1)).forall { case (a, b) => a <= b }
      }
    }

  property("(bin, offset) reconstructs the shard token-stream position") =
    Prop.forAll(docsGen) { rows =>
      val out = pack(rows)
      out.groupBy(_._1).values.forall { g =>
        val sorted = g.sortBy(_._2)
        val before = sorted.map(_._3).scanLeft(0L)(_ + _)
        sorted.zip(before).forall { case (r, pos) =>
          r._4 * budget + r._5 == pos
        }
      }
    }
}

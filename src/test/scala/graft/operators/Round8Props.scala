package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the round-8 operators — the invariants
  * stated in their docstrings, checked on random corpora:
  * winnowing's shared-run guarantee, the packing split's stream
  * conservation, and lineDedup's reassembly identity. */
object Round8Props extends Properties("round8") {

  private lazy val spark = TestSpark.spark

  // small vocabulary so random docs genuinely collide
  private val word: Gen[String] = Gen.oneOf(
    "ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx", "ix", "jx")

  private val docGen: Gen[List[String]] =
    Gen.choose(8, 30).flatMap(n => Gen.listOfN(n, word))

  property("winnowing: a planted shared >= w+k-1 run yields a shared fingerprint") =
    Prop.forAll(docGen, docGen, Gen.listOfN(7, Gen.alphaLowerStr.suchThat(_.nonEmpty))) {
      (a, b, runWords) =>
        import spark.implicits._
        // plant the same 7-word run (w + k - 1 = 7) mid-doc in both;
        // run words are alpha-only so they cannot collide with the vocab
        val run = runWords.map(w => s"r$w")
        val docs = Seq(
          (0L, (a.take(5) ++ run ++ a.drop(5)).mkString(" ")),
          (1L, (b.take(3) ++ run ++ b.drop(3)).mkString(" "))).toDF("doc_id", "text")
        val out = TextAnalysis.winnowingFingerprints(docs, "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
        out(0L) >= 1L && out(1L) >= 1L
    }

  property("packingSplit: heads + spilled tails conserve every full bin at budget") =
    Prop.forAll(Gen.choose(4, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 64L)))) { toks =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val rows = toks.zipWithIndex.map { case (t, i) => ("s", i.toLong, t) }
      val out = Curation.packSequencesSplit(
          rows.toDF("shard", "id", "toks"), "shard", "id", col("toks"), 64)
        .select(col("id"), col("n_tokens"), col("bin"),
          col("head_tokens"), col("tail_tokens"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val lastBin = out.map(_._3).max
      val headsByBin = out.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
      val tailsInto = out.filter(_._5 > 0).groupBy(_._3 + 1)
        .view.mapValues(_.map(_._5).sum).toMap
      val conserved = (0L until lastBin).forall { b =>
        headsByBin.getOrElse(b, 0L) + tailsInto.getOrElse(b, 0L) == 64L
      }
      val splitsSum = out.forall(r => r._4 + r._5 == r._2 && r._4 >= 1)
      conserved && splitsSum
    }

  property("lineDedup: ceiling minDocs is the identity; result is idempotent") =
    Prop.forAll(Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(m => Gen.listOfN(m, word))))) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      // minDocs above the corpus size: nothing is boilerplate
      val id = TextDedup.lineDedup(df, "doc_id", "text",
          sep = "\n", minDocs = docs.size + 1)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(3)))
      val identity = id.toSeq == docs.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
      // idempotence at any threshold: cleaning the cleaned corpus with
      // the same threshold removes nothing new IF a fixpoint exists —
      // lineDedup removes whole line-classes, so one pass IS the
      // fixpoint for minDocs = 2 (every surviving line occurs in < 2
      // docs ... unless removals merged docs' remaining lines — they
      // cannot, line sets only shrink)
      val once = TextDedup.lineDedup(df, "doc_id", "text", sep = "\n", minDocs = 2)
        .select("doc_id", "text").orderBy("doc_id")
      val twice = TextDedup.lineDedup(once, "doc_id", "text", sep = "\n", minDocs = 2)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(3)))
      val fixpoint = twice.toSeq == once.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      identity && fixpoint
    }
}

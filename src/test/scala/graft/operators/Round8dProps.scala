package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the late-round-8 operators — the
  * docstring invariants on random corpora: upsample's floor-or-ceil
  * copy law, rareTokenScrub's token-count conservation and identity,
  * contaminationSpans' planted-quote guarantee, and the ranking
  * metrics' bounds. */
object Round8dProps extends Properties("round8d") {

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] = Gen.oneOf(
    "ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx", "ix", "jx")

  property("upsample: every doc gets floor(r) or ceil(r) copies, dense indices") =
    Prop.forAll(Gen.choose(5, 40), Gen.choose(0, 120)) { (nDocs, targetN) =>
      import spark.implicits._
      val docs = (1L to nDocs.toLong).map(i => (i, "s")).toDF("doc_id", "source")
      val targets = Seq(("s", targetN.toLong)).toDF("src", "target_n")
      val out = Curation.upsample(docs, "doc_id", "source", targets)
        .select("doc_id", "copy").as[(Long, Long)].collect()
      val rate = (targetN.toLong * 1000000L + nDocs - 1) / nDocs
      val lo = rate / 1000000L
      val hi = lo + (if (rate % 1000000L == 0) 0 else 1)
      val perDoc =
        out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val copyLaw = (1L to nDocs.toLong).forall { i =>
        val n = perDoc.get(i).map(_.length).getOrElse(0)
        (n == lo || n == hi) &&
          perDoc.getOrElse(i, Nil) == (0L until n.toLong).toSeq
      }
      copyLaw && out.length >= nDocs * lo && out.length <= nDocs * hi
    }

  property("rareTokenScrub: token counts conserved; >= minDocs everywhere is identity") =
    Prop.forAll(Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(3, 12).flatMap(m => Gen.listOfN(m, word))))) {
      docLists =>
        import spark.implicits._
        val docs = docLists.zipWithIndex
          .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
          .toDF("doc_id", "text")
        val out = TextDedup.rareTokenScrub(docs, "doc_id", "text", minDocs = 2)
          .select("doc_id", "n_tokens", "n_scrubbed", "text")
          .as[(Long, Long, Long, String)].collect()
        val conserved = out.forall { case (id, n, _, t) =>
          n == docLists(id.toInt).length && t.split(" ").length == n
        }
        // df per token over the ORIGINAL corpus decides the scrub count
        val df = docLists.flatMap(_.distinct).groupBy(identity)
          .view.mapValues(_.size).toMap
        val scrubLaw = out.forall { case (id, _, s, t) =>
          val rare = docLists(id.toInt).count(w => df(w) < 2)
          s == rare && t.split(" ").count(_ == "<unk>") == rare
        }
        conserved && scrubLaw
    }

  property("contaminationSpans: a planted n-word quote is found with exact span") =
    Prop.forAll(Gen.choose(6, 20).flatMap(n => Gen.listOfN(n, word)),
      Gen.choose(3, 6)) { (corpusWords, quoteLen) =>
      import spark.implicits._
      // quote words are disjoint from the vocab, so the quote's grams
      // cannot occur outside the planted run (and pure-vocab grams
      // cannot be contaminated)
      val quote = (1 to quoteLen).map(i => s"qq$i")
      val corpus = Seq(
        (100L, (corpusWords.take(4) ++ quote ++ corpusWords.drop(4))
          .mkString(" "))).toDF("doc_id", "text")
      val ev = Seq((1L, quote.mkString(" "))).toDF("doc_id", "text")
      val r = TextDedup.contaminationSpans(corpus, ev, "doc_id", "text", n = 3)
        .head()
      val (nGrams, nHit, maxRun, span) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // the quote contributes exactly quoteLen - 2 grams, contiguously
      nHit == quoteLen - 2 && maxRun == nHit && span == maxRun + 2 &&
        nHit <= nGrams
    }

  property("rankingMetrics: bounds hold for arbitrary truth/retrieved sets") =
    Prop.forAll(Gen.choose(1, 5), Gen.listOfN(8, Gen.choose(1L, 20L)),
      Gen.listOfN(8, Gen.choose(1L, 20L))) { (k, truthIds, retIds) =>
      import spark.implicits._
      val truth = truthIds.distinct.map(i => (1L, i)).toDF("qid", "id")
      val retrieved = retIds.distinct.zipWithIndex
        .map { case (i, r) => (1L, i, (r + 1).toLong) }
        .toDF("qid", "id", "rank")
      val row = Similarity.rankingMetrics(truth, retrieved, k).head()
      val (nh, rec, rr) = (row.getLong(1), row.getLong(2), row.getLong(3))
      val expHits = retIds.distinct.toSet.intersect(truthIds.distinct.toSet).size
      nh == expHits && rec == nh * 1000000L / k && rr >= 0 && rr <= 1000000L &&
        (nh == 0) == (rr == 0)
    }
}

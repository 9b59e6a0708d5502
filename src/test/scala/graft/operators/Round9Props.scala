package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the round-9 operators: URL normalization
  * idempotence, weighted-Jaccard bounds/identity, and the semDedup
  * cell-cap's under-dedup law on random corpora. */
object Round9Props extends Properties("round9") {

  private lazy val spark = TestSpark.spark

  private val word: Gen[String] = Gen.oneOf(
    "ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx", "ix", "jx")
  private val text: Gen[String] =
    Gen.nonEmptyListOf(word).map(_.mkString(" "))

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("example.com", "Sub.Example.com", "other.org")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/a", "/a/b", "/a/b/", "/a//")
    query <- Gen.oneOf("", "?x=1", "?b=2&a=1", "?utm_source=t&a=1", "?utm_campaign=z")
    frag <- Gen.oneOf("", "#top", "#a/b")
  } yield s"$scheme://$www$host$port$path$query$frag"

  property("normalizeUrl is idempotent: norm(norm(u)) == norm(u)") =
    Prop.forAll(Gen.listOfN(20, urlGen)) { urls =>
      import spark.implicits._
      val once = urls.toDF("u")
        .select(TextDedup.normalizeUrl(col("u")).as("n")).as[String].collect()
      val twice = once.toSeq.toDF("u")
        .select(TextDedup.normalizeUrl(col("u")).as("n")).as[String].collect()
      once.toSeq == twice.toSeq
    }

  property("weighted Jaccard: bounds in [0,1], self-pair scores 1") =
    Prop.forAll(Gen.choose(2, 12), Gen.listOfN(12, text)) { (n, texts) =>
      import spark.implicits._
      val docs = texts.take(n).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val ids = (0L until n.toLong)
      val pairs = (ids.map(i => (i, i)) ++
        ids.flatMap(a => ids.filter(_ > a).map(b => (a, b))))
        .toDF("a", "b")
      val wj = TextDedup.weightedJaccardPairs(docs, "doc_id", "text", pairs)
        .as[(Long, Long, Double)].collect()
      wj.forall { case (a, b, j) =>
        j >= 0.0 && j <= 1.0 && (a != b || j == 1.0)
      }
    }

  property("stripHtml on markup-free text = whitespace collapse (and is idempotent)") =
    Prop.forAll(Gen.listOfN(30, Gen.oneOf(word, Gen.const(" "), Gen.const("  ")))) { parts =>
      import spark.implicits._
      val raw = parts.mkString(" ")
      val out = Seq(raw).toDF("t")
        .select(TextAnalysis.stripHtml(col("t"))).as[String].head()
      val again = Seq(out).toDF("t")
        .select(TextAnalysis.stripHtml(col("t"))).as[String].head()
      out == raw.trim.replaceAll("\\s+", " ") && again == out
    }

  property("semDedup cellCap only under-dedups: capped survivors ⊇ uncapped") =
    Prop.forAll(Gen.choose(2, 30), Gen.choose(1, 6)) { (nVecs, cap) =>
      import spark.implicits._
      // vectors on a small grid so near-identical directions occur
      val vecs = (0L until nVecs.toLong).map { i =>
        (i, Array(1.0f + (i % 3), (i % 2).toFloat, 1.0f))
      }.toDF("id", "vec")
      val cen = Seq((0L, Array(1.0f, 0.0f, 1.0f)), (1L, Array(3.0f, 1.0f, 1.0f)))
      val uncapped = Similarity.semDedup(vecs, cen, minCos = 0.95)
        .select(col("id")).as[Long].collect().toSet
      val capped = Similarity.semDedup(vecs, cen, minCos = 0.95, cellCap = cap)
        .select(col("id")).as[Long].collect().toSet
      uncapped.subsetOf(capped)
    }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL normalization: equivalent page identities collapse, genuinely
  * different ones never do. */
class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(TextDedup.normalizeUrl($"u")).as[String].collect().toSeq

  test("case, www., default port, trailing slash, tracking, order, fragment all collapse") {
    val canonical = "https://example.com/d/7?a=1&b=2"
    norm(
      "https://www.example.com/d/7?b=2&a=1",
      "HTTPS://EXAMPLE.COM:443/d/7/?a=1&b=2",
      "https://example.com/d/7?utm_source=feed&b=2&fbclid=x&a=1",
      "https://www.example.com:443/d/7/?a=1&utm_campaign=z&b=2#frag"
    ) shouldBe Seq(canonical, canonical, canonical, canonical)
  }

  test("real differences never collapse") {
    // different host, different scheme, different path, different
    // param VALUE, non-default port — five distinct identities
    norm(
      "https://example.com/d/7?a=1",
      "https://other.com/d/7?a=1",
      "http://example.com/d/7?a=1",
      "https://example.com/d/8?a=1",
      "https://example.com/d/7?a=2",
      "https://example.com:8443/d/7?a=1"
    ).distinct.size shouldBe 6
  }

  test("http default port 80 strips; 443 on http does not") {
    norm("http://example.com:80/x", "http://example.com:443/x") shouldBe
      Seq("http://example.com/x", "http://example.com:443/x")
  }

  test("degenerate inputs: empty corpus and non-URL strings don't blow up") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "url")
    TextDedup.urlDedup(empty, "doc_id", "url").count() shouldBe 0L
    // non-URL input normalizes to the documented degenerate "://"
    norm("not a url", "") shouldBe Seq("://", "://")

    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    TextDedup.weightedLshCandidatePairs(emptyDocs, "doc_id", "text")
      .count() shouldBe 0L
    TextDedup.dfTokenWeights(emptyDocs, "doc_id", "text").count() shouldBe 0L
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    Similarity.semDedupCellAudit(emptyVecs,
      Seq((0L, Array(1.0f))), cellCap = 5).count() shouldBe 0L
  }

  test("histogram: exact integer bins, clamped ends, single-value degenerate") {
    val df = (0L to 99L).toDF("v")
    val out = Analytics.histogram(df, $"v", nBins = 10)
      .orderBy($"bin").as[(Long, Long, Long, Long)].collect()
    // span 100, 10 bins of exactly 10; mn=0 mx=99 on every row
    out shouldBe (0L until 10L).map(b => (b, 10L, 0L, 99L)).toArray
    val one = Seq(7L, 7L, 7L).toDF("v")
    Analytics.histogram(one, $"v", nBins = 5)
      .as[(Long, Long, Long, Long)].collect() shouldBe Array((0L, 3L, 7L, 7L))
  }

  test("urlDedup keeps the min-id variant with an exact count") {
    val rows = Seq(
      (10L, "https://www.example.com/p?x=1"),
      (11L, "https://example.com/p/?x=1"),
      (12L, "https://example.com/q")
    ).toDF("doc_id", "url")
    val out = TextDedup.urlDedup(rows, "doc_id", "url")
      .orderBy($"url").as[(String, Long, Long)].collect()
    out shouldBe Array(
      ("https://example.com/p?x=1", 10L, 2L),
      ("https://example.com/q", 12L, 1L))
  }
}

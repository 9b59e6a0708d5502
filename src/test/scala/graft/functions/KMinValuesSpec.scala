package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMinValuesSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k smallest DISTINCT hashes, sorted ascending") {
    val df = Seq(5L, 3L, 9L, 3L, 1L, 7L, 1L).toDF("h")
    val out = df.agg(call_function("graft_kmv", col("h"), lit(3)).as("kmv"))
      .selectExpr("kmv").as[Seq[Long]].head()
    out shouldBe Seq(1L, 3L, 5L)
  }

  test("undersaturated sketch IS the distinct set") {
    val df = Seq(5L, 3L, 3L).toDF("h")
    df.agg(call_function("graft_kmv", col("h"), lit(64)))
      .as[Seq[Long]].head() shouldBe Seq(3L, 5L)
  }

  test("merge across partitions equals the single-partition result") {
    val data = (1L to 10000L).map(i => (i % 7, i * 2654435761L % 1000003L))
    val one = data.toDF("g", "h").repartition(1)
      .groupBy("g").agg(call_function("graft_kmv", col("h"), lit(16)).as("kmv"))
    val many = data.toDF("g", "h").repartition(32)
      .groupBy("g").agg(call_function("graft_kmv", col("h"), lit(16)).as("kmv"))
    val a = one.orderBy("g").as[(Long, Seq[Long])].collect().toSeq
    val b = many.orderBy("g").as[(Long, Seq[Long])].collect().toSeq
    a shouldBe b
  }

  test("nulls are skipped; callable from SQL") {
    Seq(Some(4L), None, Some(2L)).toDF("h").createOrReplaceTempView("kmv_in")
    spark.sql("SELECT graft_kmv(h, 8) AS kmv FROM kmv_in")
      .as[Seq[Long]].head() shouldBe Seq(2L, 4L)
  }

  test("estimator is within KMV error bounds on a saturated sketch") {
    import graft.operators.TextDedup.md5Hash60
    val k = 256
    val n = 20000L
    val est = spark.range(n)
      .agg(call_function("graft_kmv", md5Hash60(col("id").cast("string")), lit(k)).as("kmv"))
      .select((lit((k - 1).toDouble) * lit(1152921504606846976.0) /
        element_at(col("kmv"), k).cast("double")).as("est"))
      .as[Double].head()
    // ~1/sqrt(k-2) ≈ 6.3% relative error at 1 sigma; allow 4 sigma
    math.abs(est - n.toDouble) / n.toDouble should be < 0.25
  }
}

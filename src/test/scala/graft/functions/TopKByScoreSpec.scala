package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("keeps the k best (score DESC, id ASC) entries, best-first") {
    val df = Seq((0.5, 1L), (0.9, 2L), (0.9, 3L), (0.1, 4L), (0.7, 5L))
      .toDF("s", "id")
    val out = df
      .agg(call_function("graft_topk", col("s"), col("id"), lit(3)).as("tk"))
      .selectExpr("transform(tk, e -> e.id)").as[Seq[Long]].head()
    out shouldBe Seq(2L, 3L, 5L) // 0.9/id2, 0.9/id3 (tie by id), 0.7/id5
  }

  test("matches the window row_number form on grouped data") {
    val data = (1L to 5000L).map(i => (i % 13, (i * 2654435761L % 1000L).toDouble / 1000.0, i))
    val df = data.toDF("g", "s", "id").repartition(32)
    val viaAgg = df.groupBy("g")
      .agg(call_function("graft_topk", col("s"), col("id"), lit(7)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("e.id").as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7).select(col("g"), col("rank"), col("id"))
    viaAgg.orderBy("g", "rank").collect().toSeq shouldBe
      viaWindow.orderBy("g", "rank").collect().toSeq
  }

  test("groups smaller than k return everything, still sorted") {
    val df = Seq((0.2, 9L), (0.8, 7L)).toDF("s", "id")
    val out = df
      .agg(call_function("graft_topk", col("s"), col("id"), lit(10)).as("tk"))
      .selectExpr("transform(tk, e -> e.id)").as[Seq[Long]].head()
    out shouldBe Seq(7L, 9L)
  }
}

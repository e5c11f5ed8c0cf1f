package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("dot_product is callable from SQL and matches the Column API") {
    GraftExtensions.install(spark)
    Tables(spark, sf, "embeddings").createOrReplaceTempView("emb_view")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product(embedding, embedding) AS d FROM emb_view")
    val viaCol = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), VectorFns.dot(col("embedding"), col("embedding")).as("d"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    import graft.operators.Relational
    // one hot key with 5k rows + long tail
    val left = ((1 to 5000).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val right = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map(k => (k, k.length))
      .toDF("k", "w")
    val plain = left.join(right, "k")
    val salted = Relational.saltedJoin(left, right, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "v", "w").exceptAll(plain.select("k", "v", "w")).count() == 0)
  }
}

package graft

class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from SQL") {
    GraftSession.registerFunctions(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(10)
      .createOrReplaceTempView("emb_sql")
    val cos = spark.sql(
      """SELECT round(cosine_similarity(a.embedding, a.embedding), 6) AS c
        |FROM emb_sql a""".stripMargin).as[Double].collect()
    assert(cos.forall(_ == 1.0))

    val hash = spark.sql("SELECT hadoop_text_hash('zu+i') AS h").as[Int].head()
    assert((hash & Int.MaxValue) % 32 == 26) // SURVEY §8.4 golden placement

    val sim = spark.sql(
      "SELECT simhash64(array('a','b','c')) = simhash64(array('a','b','c')) AS eq")
      .as[Boolean].head()
    assert(sim)

    val sig = spark.sql("SELECT size(minhash_sig(array(1L, 2L, 3L))) AS n")
      .as[Int].head()
    assert(sig == 64)

    val toks = spark.sql("SELECT sanitize_tokens('The QUICK, brown_fox!') AS t")
      .as[Seq[String]].head()
    assert(toks == Seq("the", "quick", "brown", "fox"))

    val bigs = spark.sql("SELECT word_bigrams(sanitize_tokens('zu i people')) AS b")
      .as[Seq[String]].head()
    assert(bigs == Seq("zu+i", "i+people"))

    // zorder_key(a, b) = 31-bit-per-column Morton interleave
    val z = spark.sql("SELECT zorder_key(3L, 1L) AS z").as[Long].head()
    val viaColumn = Seq((3L, 1L)).toDF("a", "b")
      .select(graft.operators.Layout.zValue(
        Seq(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")), bits = 31).as("z"))
      .as[Long].head()
    assert(z === viaColumn && z === (8L + 2L + 1L))
  }
}

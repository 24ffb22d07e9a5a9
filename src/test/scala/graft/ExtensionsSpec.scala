package graft

class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions: vec_cosine, word_shingles, tdigest_percentile") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT round(vec_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)), 6) AS c,
        |       vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d,
        |       word_shingles(array('a', 'b', 'c', 'b', 'c'), 2) AS sh""".stripMargin).head()
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b", "b c", "c b"))

    spark.range(0, 1000).createOrReplaceTempView("nums")
    val p = spark.sql(
      "SELECT tdigest_percentile(CAST(id AS DOUBLE), 0.5) AS med FROM nums")
      .head().getAs[Double]("med")
    assert(math.abs(p - 499.5) < 10.0, s"median $p")
  }

  test("registered SQL functions: winnow_hashes, compress_ratio, heavy_hitters") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT size(winnow_hashes(array('a', 'b', 'c', 'd', 'e'), 3, 2)) AS nw,
        |       compress_ratio('xyxyxyxyxyxyxyxyxyxyxyxyxyxyxyxy') AS cr""".stripMargin)
      .head()
    assert(r.getAs[Int]("nw") >= 1)
    assert(r.getAs[Double]("cr") < 0.5)
    spark.sql("SELECT explode(sequence(1, 20)) AS i")
      .selectExpr("CASE WHEN i <= 15 THEN 'hot' ELSE concat('w', i) END AS w")
      .createOrReplaceTempView("hh_in")
    val hh = spark.sql("SELECT heavy_hitters(w, 4) AS hh FROM hh_in")
      .selectExpr("inline(hh)").collect()
    assert(hh.head.getString(0) == "hot")
  }

  test("GraftExtensions injects into a session-extensions instance") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw; builders validated above
  }

  test("ewma as a SQL window function: recurrence over the running frame") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq((0, 0L, 4.0), (0, 1L, 8.0), (0, 2L, 0.0), (1, 0L, 9.0))
      .toDF("g", "t", "v").createOrReplaceTempView("ewma_in")
    val got = spark.sql(
      """SELECT g, t, ewma(v, 0.5) OVER (PARTITION BY g ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ewma_in ORDER BY g, t""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0, 0L, 4.0), (0, 1L, 6.0), (0, 2L, 3.0), (1, 0L, 9.0)))
    // out-of-range alpha fails analysis, not silently
    val err = intercept[Exception] {
      spark.sql("""SELECT ewma(v, 1.5) OVER (PARTITION BY g ORDER BY t
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM ewma_in""").head()
    }
    assert(err.getMessage.contains("alpha"))

    // null inputs carry the previous smoothed value (LOCF of the line);
    // a leading null stays null until the first observation seeds
    Seq((0L, Some(4.0)), (1L, None), (2L, Some(8.0)), (3L, None))
      .toDF("t", "v").createOrReplaceTempView("ewma_nulls")
    val withNulls = spark.sql(
      """SELECT t, ewma(v, 0.5) OVER (ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
        |FROM ewma_nulls ORDER BY t""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(withNulls.toSeq == Seq(
      (0L, Some(4.0)), (1L, Some(4.0)), (2L, Some(6.0)), (3L, Some(6.0))))
  }

  test("holt_trend as a SQL window function: struct(level, trend) per row") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq((0L, 4.0), (1L, 8.0), (2L, 12.0)).toDF("t", "v")
      .createOrReplaceTempView("holt_in")
    val got = spark.sql(
      """SELECT t, h.level AS l, h.trend AS b FROM (
        |  SELECT t, holt_trend(v, 0.5, 0.5) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
        |  FROM holt_in) ORDER BY t""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 4.0, 0.0), (1L, 6.0, 1.0), (2L, 9.5, 2.25)))
  }

  test("non-literal quantile is rejected with a clear error") {
    GraftFunctions.registerAll(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT tdigest_percentile(1.0, rand()) AS x").head()
    }
    assert(err.getMessage.contains("literal"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextHashExprs, VectorExprs}
import graft.pipeline.TextAnalysis

/** `GraftExtensions` SQL surface: every registered function must agree
  * with its Column-API kernel on the same inputs, and reject non-literal
  * config arguments with a clear error.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("SQL functions match the Column API kernels") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftExtensions.install(spark)

    val docs = Seq(
      "the quick brown fox jumps over the lazy dog and the cat",
      "la casa de el perro y los gatos en un jardin del sur",
      "a a a a a a a a a a a a",
      "").toDF("text")
    docs.createOrReplaceTempView("__ext_docs")

    val sql = spark.sql(
      """SELECT graft_simhash64(text) AS sh,
                graft_simhash64(text, true) AS shp,
                graft_minhash_sig(text, 3, 16, true) AS mh,
                graft_lang_id(text) AS lang,
                graft_repetition_stats(text) AS rep
         FROM __ext_docs""").collect()
    val api = docs.select(
      TextHashExprs.simhash64(col("text")).as("sh"),
      TextHashExprs.simhash64(col("text"), portable = true).as("shp"),
      TextHashExprs.minhashSig(col("text"), 3, 16, portable = true)
        .as("mh"),
      graft.functions.TextHashExprs.langId(col("text"),
        TextAnalysis.langOrder.map(l => l -> TextAnalysis.stopwords(l)))
        .as("lang"),
      TextHashExprs.repetitionStats(col("text")).as("rep")).collect()
    assert(sql.map(_.toString).toSeq == api.map(_.toString).toSeq)

    val vecs = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
    vecs.createOrReplaceTempView("__ext_vecs")
    val vsql = spark.sql(
      """SELECT graft_cosine_sim(a, b) AS cos,
                graft_lsh_sig(a, 8, true) AS sig
         FROM __ext_vecs""").head
    val vapi = vecs.select(
      VectorExprs.cosineSim(col("a"), col("b")).as("cos"),
      VectorExprs.lshSig(col("a"), 8, portable = true).as("sig")).head
    assert(vsql.getDouble(0) == vapi.getDouble(0))
    assert(vsql.getLong(1) == vapi.getLong(1))
  }

  test("graft_topk_longs works from pure SQL and matches the Column API") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftExtensions.install(spark)
    Seq(("a", 9L, 7L), ("a", 9L, 3L), ("a", 5L, 1L), ("b", 4L, 2L))
      .toDF("g", "m", "id").createOrReplaceTempView("__ext_topk")
    val sql = spark.sql(
      "SELECT g, graft_topk_longs(m, id, 2) AS top FROM __ext_topk " +
      "GROUP BY g ORDER BY g").collect()
    assert(sql.length == 2)
    val aTop = sql(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(aTop == Seq((9L, 3L), (9L, 7L)), aTop.toString)
    val bTop = sql(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bTop == Seq((4L, 2L)), bTop.toString)
    // narrower integer inputs widen at analysis (ImplicitCastInputTypes)
    // instead of cast-crashing at runtime
    val widened = spark.sql(
      "SELECT graft_topk_longs(CAST(m AS INT), id, 1) FROM __ext_topk")
      .collect()
    assert(widened.length == 1)
  }

  test("graft_jaro_winkler: textbook values, null/empty semantics, " +
       "SQL registration") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftExtensions.install(spark)
    val jw = graft.functions.StringSimExprs.jaroWinkler _
    val got = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"),
      ("jellyfish", "smellyfish"), ("abc", "abc"), ("", ""),
      ("", "abc"), ("a", "b"), ("crate", "trace"),
      // prefix present but jaro <= 0.7: NO Winkler boost (the DuckDB/
      // rapidfuzz variant)
      ("aaxxxxxxxx", "aayyyyyyyy"), ("abcdwxyz", "abcdefgh"))
      .toDF("a", "b")
      .select(jw(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = Seq(0.9611111111111111, 0.8133333333333332,
                   0.8962962962962964, 1.0, 1.0, 0.0, 0.0,
                   0.7333333333333334, 0.4666666666666666,
                   0.6666666666666666)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"got $g want $w")
    }
    // nulls propagate
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jw(col("a"), col("b"))).collect()
    assert(n(0).isNullAt(0))
    // SQL surface
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta')").head.getDouble(0)
    assert(viaSql == 0.9611111111111111)
  }

  test("non-literal config arguments are rejected with guidance") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftExtensions.install(spark)
    Seq("doc").toDF("text").createOrReplaceTempView("__ext_docs")
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash_sig(text, length(text), 16) " +
        "FROM __ext_docs").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
           err.getMessage.toLowerCase.contains("graft_minhash_sig"))
  }
}

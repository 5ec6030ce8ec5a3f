package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** The codegen'd vector expressions must agree exactly with the
  * higher-order-function formulations they replace (same sequential
  * Long arithmetic), in both codegen and interpreted eval paths. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  lazy val quantized = Tables.embeddings(spark, dir)
    .select(col("vec_id"),
      expr("transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))").as("q"))

  test("LongArrayDot == zip_with+aggregate HOF form") {
    val both = quantized.select(col("vec_id"),
      VectorExpressions.dotLongs(col("q"), col("q")).as("native"),
      expr("aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // and in the interpreted path (codegen disabled)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(both.filter(col("native") =!= col("hof")).count() === 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("UniversalMinHash == per-perm transform+array_min HOF form") {
    val P = 2147483647L
    val k = 8
    val hashed = Tables.documents(spark, dir).select(col("doc_id"),
      expr(s"transform(split(text, ' '), x -> pmod(xxhash64(x), ${P}L))").as("hs"))
    val native = hashed.select(col("doc_id"),
      VectorExpressions.universalMinhash(col("hs"), k, P).as("mh"))
    val hofCols = (0 until k).map { j =>
      val a = 1103515245L * (j + 1) % P
      val b = 12345L * (j + 7919) % P
      expr(s"array_min(transform(hs, h -> ($a * h + $b) % ${P}L))").as(s"mh_$j")
    }
    val hof = hashed.select(col("doc_id") +: hofCols: _*)
    val joined = native.join(hof, "doc_id")
    val mismatches = (0 until k).map(j =>
      joined.filter(col("mh").getItem(j) =!= col(s"mh_$j")).count()).sum
    assert(mismatches === 0)
  }

  test("WordShingles == array_distinct/transform/slice HOF pipeline") {
    val docs = Tables.documents(spark, dir)
      .filter(size(split(col("text"), " ")) >= 3)
    val both = docs.select(col("doc_id"),
      VectorExpressions.wordShingles(col("text"), 3, distinct = true).as("native"),
      expr("""array_distinct(transform(
             |  sequence(0, size(split(text, ' ')) - 3),
             |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))""".stripMargin)
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // non-distinct bigrams too (the simhash feature stream)
    val bg = docs.select(
      VectorExpressions.wordShingles(col("text"), 2, distinct = false).as("native"),
      expr("""transform(sequence(0, size(split(text, ' ')) - 2),
             |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, 2)))""".stripMargin)
        .as("hof"))
    assert(bg.filter(col("native") =!= col("hof")).count() === 0)
    // edge semantics: too-short input -> empty array (not a throw);
    // consecutive/trailing spaces keep empty words like split(' ', -1)
    import spark.implicits._
    val edge = Seq("one", "a  b", "x y ").toDF("text")
      .select(VectorExpressions.wordShingles(col("text"), 2, distinct = false).as("s"))
      .collect()
    assert(edge(0).getSeq[String](0).isEmpty)
    assert(edge(1).getSeq[String](0) === Seq("a ", " b"))
    assert(edge(2).getSeq[String](0) === Seq("x y", "y "))
  }

  test("XxHashModArray == transform(pmod(xxhash64)) HOF form") {
    val P = 2147483647L
    val both = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("toks"))
      .select(
        VectorExpressions.xxhashModArray(col("toks"), P).as("native"),
        expr(s"transform(toks, x -> pmod(xxhash64(x), ${P}L))").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("null inputs propagate as null") {
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS a, array(1L, 2L) AS b")
    val out = df.select(VectorExpressions.dotLongs(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
  }

  test("SQL registration: dot_longs and universal_minhash callable from spark.sql") {
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    val d = spark.sql("SELECT dot_longs(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .collect()(0).getLong(0)
    assert(d === 32L)
    val mh = spark.sql(
      "SELECT universal_minhash(array(7L, 11L, 13L), 4, 2147483647L) AS mh")
      .collect()(0).getSeq[Long](0)
    assert(mh.length === 4)
    // matches the Column-API form
    import org.apache.spark.sql.functions._
    val viaCol = spark.range(1)
      .select(graft.functions.VectorExpressions.universalMinhash(
        expr("array(7L, 11L, 13L)"), 4, 2147483647L).as("mh"))
      .collect()(0).getSeq[Long](0)
    assert(mh === viaCol)
    // r2 expressions are SQL-registered too
    val sh = spark.sql("SELECT word_shingles('a b c d', 2, true) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh === Seq("a b", "b c", "c d"))
    val sb = spark.sql(
      "SELECT sign_buckets(array(1L, -2L, 3L, -4L), 8, 4, 4) AS b")
      .collect()(0).getSeq[Long](0)
    assert(sb.length === 8 && sb.forall(b => b >= 0 && b < 16))
    val xh = spark.sql(
      "SELECT xxhash_mod_array(array('x', 'y'), 2147483647L) AS h")
      .collect()(0).getSeq[Long](0)
    val xhHof = spark.sql(
      "SELECT transform(array('x', 'y'), s -> pmod(xxhash64(s), 2147483647L)) AS h")
      .collect()(0).getSeq[Long](0)
    assert(xh === xhHof)
  }

  test("SQL surface: NULL array elements are handled, wrong types fail at analysis") {
    // a NULL element propagates as a NULL element (the HOF behavior),
    // not an NPE — these functions are user-callable via SQL
    val xh = spark.sql(
      "SELECT xxhash_mod_array(array('x', CAST(NULL AS STRING), 'y'), 97L) AS h")
      .collect()(0).getSeq[Any](0)
    assert(xh.length === 3 && xh(1) == null && xh(0) != null)
    // numeric expressions skip NULL elements instead of throwing
    val dot = spark.sql(
      "SELECT dot_longs(array(1L, NULL, 3L), array(2L, 5L, NULL)) AS d")
      .collect()(0).getLong(0)
    assert(dot === 2L) // only index 0 has both sides non-null
    val mh = spark.sql(
      "SELECT universal_minhash(array(7L, NULL), 4, 2147483647L) AS m")
      .collect()(0).getSeq[Long](0)
    val mhRef = spark.sql(
      "SELECT universal_minhash(array(7L), 4, 2147483647L) AS m")
      .collect()(0).getSeq[Long](0)
    assert(mh === mhRef)
    // wrong input type → descriptive analysis error, not ClassCastException
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_longs(array('a'), array('b'))").collect()
    }
    assert(err.getMessage.contains("array<bigint>"))
  }
}

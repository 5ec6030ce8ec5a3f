package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("CSV and JSON round-trip preserve the relation (schema given)") {
    val tmp = Files.createTempDirectory("graft_src").toString
    val orig = Tables.nation(spark, dir)
    Sources.writeJson(orig, s"$tmp/nation_json")
    Sources.writeCsv(orig, s"$tmp/nation_csv")
    val viaJson = Sources.json(spark, s"$tmp/nation_json", Some(orig.schema))
    val viaCsv = Sources.csv(spark, s"$tmp/nation_csv", schema = Some(orig.schema))
    val key = Seq("n_nationkey", "n_name", "n_regionkey")
    assert(viaJson.select(key.map(col): _*).collect().toSet ===
      orig.select(key.map(col): _*).collect().toSet)
    assert(viaCsv.select(key.map(col): _*).collect().toSet ===
      orig.select(key.map(col): _*).collect().toSet)
  }

  test("CSV schema inference matches explicit schema on clean data") {
    val tmp = Files.createTempDirectory("graft_src2").toString
    Sources.writeCsv(Tables.region(spark, dir), s"$tmp/region_csv")
    val inferred = Sources.csv(spark, s"$tmp/region_csv")
    assert(inferred.schema.map(_.dataType.typeName).toSet === Set("integer", "string"))
    assert(inferred.count() === 5)
  }
}

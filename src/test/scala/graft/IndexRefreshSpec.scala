package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Indexes, Similarity}

/** The daily-snapshot index refresh motion (r9 verdict #5): build the
  * stored index on a base slice, append one batch's rows as a second
  * parquet commit, and verify that probes served from the MERGED scan
  * are row-identical to probes of a full rebuild. Sound because the LSH
  * signature is a per-vector artifact of frozen hyperplanes — the batch
  * rows are bit-identical whether built alone or with the corpus. */
class IndexRefreshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("appended LSH index == full rebuild, for both contents and probes") {
    val tag = "lshsig_refresh_demo"
    val isBase = col("vec_id") % 10 =!= 0 // base snapshot: 90% of vectors
    val base = Indexes.materializedIndex(spark, dir, tag)(
      Similarity.buildLshSignatures(spark, dir).where(isBase))
    val nBase = base.count()
    assert(nBase > 0)

    // the daily batch arrives: signatures for the NEW vectors only,
    // appended to the stored index dir as a second commit
    Indexes.appendToIndex(spark, dir, tag,
      Similarity.buildLshSignatures(spark, dir).where(!isBase))

    // the next consumer re-reads the dir — merged scan, NOT a rebuild
    // (the build thunk throwing proves no rebuild happens)
    val merged = Indexes.materializedIndex(spark, dir, tag)(
      sys.error("append must re-read the stored index, not rebuild it"))

    // contents: merged == full rebuild, row for row
    val full = Similarity.buildLshSignatures(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("norm2"), col("buckets"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
      .toSet
    assert(rows(merged) === rows(full))
    assert(merged.count() === full.count()) // no dup rows either

    // probes: ANN top-3 served from the merged index is row-identical to
    // the declared query's (which probes the normal full-corpus index)
    def probes(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(probes(Similarity.lshAnnTopKFrom(merged)) ===
      probes(Similarity.lshAnnTopK(spark, dir)))
  }

  test("appendToIndex refuses a tag that was never built") {
    intercept[IllegalArgumentException] {
      Indexes.appendToIndex(spark, dir, "never_built_tag",
        Similarity.buildLshSignatures(spark, dir).limit(1))
    }
  }
}

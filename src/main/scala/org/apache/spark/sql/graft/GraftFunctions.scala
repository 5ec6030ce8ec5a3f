package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.VectorExpressions.{ContentChunks, GopherTextStats, HashOrderKeys, LongArrayDot, LongArrayIntersectCount, Md5GramKeys, Md5HeadLong, SignRandomProjection, SimhashVotes, UniversalMinHash, WordShingles, XxHashModArray}

/** SQL-surface registration for the graft custom expressions, so
  * `spark.sql("SELECT dot_longs(a, b) ...")` works alongside the Column
  * API. Two entry points:
  *
  *  - `GraftExtensions` for `spark.sql.extensions=` /
  *    `builder.withExtensions(...)` (session-independent install);
  *  - `GraftFunctions.registerAll(spark)` for an existing session
  *    (bridges the private[sql] sessionState registry).
  */
object GraftFunctions {

  private def dotBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_longs(arrayA, arrayB)")
    LongArrayDot(exprs(0), exprs(1))
  }

  private def minhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      "universal_minhash(hashedArray, numPerms, primeModulus)")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => sys.error(s"numPerms must be an int literal, got $other")
    }
    val p = exprs(2) match {
      case Literal(v: Long, _) => v
      case Literal(v: Int, _) => v.toLong
      case other => sys.error(s"primeModulus must be a literal, got $other")
    }
    UniversalMinHash(exprs(0), k, p)
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => sys.error(s"$what must be an int literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => sys.error(s"$what must be a literal, got $other")
  }

  private def signBucketsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      "sign_buckets(quantizedArray, numTables, numPlanes, dim)")
    SignRandomProjection(exprs(0), intLit(exprs(1), "numTables"),
      intLit(exprs(2), "numPlanes"), intLit(exprs(3), "dim"))
  }

  private def shinglesBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "word_shingles(text, n, distinct)")
    val distinct = exprs(2) match {
      case Literal(v: Boolean, _) => v
      case other => sys.error(s"distinct must be a boolean literal, got $other")
    }
    WordShingles(exprs(0), intLit(exprs(1), "n"), distinct)
  }

  private def xxhashModBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "xxhash_mod_array(stringArray, primeModulus)")
    XxHashModArray(exprs(0), longLit(exprs(1), "primeModulus"))
  }

  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("dot_longs", dotBuilder _, "sum of elementwise products of two array<bigint>"),
    ("universal_minhash", minhashBuilder _,
      "k universal-hash minima over an array<bigint> in one pass"),
    ("sign_buckets", signBucketsBuilder _,
      "sign-random-projection LSH bucket ids, one per hash table"),
    ("word_shingles", shinglesBuilder _,
      "contiguous word n-grams of a space-separated text"),
    ("xxhash_mod_array", xxhashModBuilder _,
      "pmod(xxhash64(s), p) per element of an array<string>"),
    ("hash_order_keys", { exprs: Seq[Expression] =>
      require(exprs.length == 2, "hash_order_keys(stringArray, hotArray)")
      HashOrderKeys(exprs(0), exprs(1))
    }, "xxhash64 keys of an array<string> in (is_hot, hash, value) order"),
    ("long_array_intersect_count", { exprs: Seq[Expression] =>
      require(exprs.length == 2, "long_array_intersect_count(arrayA, arrayB)")
      LongArrayIntersectCount(exprs(0), exprs(1))
    }, "multiset intersection count of two array<bigint>"),
    ("content_chunks", { exprs: Seq[Expression] =>
      require(exprs.length == 1, "content_chunks(binary)")
      ContentChunks(exprs(0))
    }, "CDC chunk md5 fingerprints of a binary blob (rolling-hash boundaries)"),
    // SQL surface names the signature WIDTH; the width → (digest,
    // 32-bit-word layout) mapping (64 → md5 Seq(1, 0), 128 → md5
    // Seq(0, 1, 2, 3), 256 → sha256 Seq(0..7)) is pinned here so SQL
    // callers get bit-for-bit the Column-API signatures.
    ("simhash_votes", { exprs: Seq[Expression] =>
      require(exprs.length == 3, "simhash_votes(features, bits, hashInput)")
      val (order, algo) = intLit(exprs(1), "bits") match {
        case 64 => (Seq(1, 0), "md5")
        case 128 => (Seq(0, 1, 2, 3), "md5")
        case 256 => ((0 until 8).toSeq, "sha256")
        case 512 => ((0 until 16).toSeq, "sha256x2")
        case other => sys.error(s"bits must be 64, 128, 256 or 512, got $other")
      }
      val hashInput = exprs(2) match {
        case Literal(v: Boolean, _) => v
        case other => sys.error(s"hashInput must be a boolean literal, got $other")
      }
      SimhashVotes(exprs(0), order, hashInput, algo)
    }, "SimHash signature words (array<bigint>) of a feature array"),
    // stopwords ride a comma-joined string literal (a SQL array literal
    // is not a Literal at builder time; the Column API takes a Seq)
    ("gopher_text_stats", { exprs: Seq[Expression] =>
      require(exprs.length == 2, "gopher_text_stats(text, stopwordsCsv)")
      val stops = exprs(1) match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
          v.toString.split(",", -1).toSeq
        case other => sys.error(s"stopwordsCsv must be a string literal, got $other")
      }
      GopherTextStats(exprs(0), stops)
    }, "per-document Gopher-rule stats struct (tokens/chars/alpha/stopwords/gram masses)"),
    ("md5_gram_keys", { exprs: Seq[Expression] =>
      require(exprs.length == 3, "md5_gram_keys(words, k, nHex)")
      Md5GramKeys(exprs(0), intLit(exprs(1), "k"), intLit(exprs(2), "nHex"))
    }, "md5 keys (full hex or first-nHex-digits long) of every contiguous word k-gram"),
    ("md5_head_long", { exprs: Seq[Expression] =>
      require(exprs.length == 2, "md5_head_long(s, nHex)")
      Md5HeadLong(exprs(0), intLit(exprs(1), "nHex"))
    }, "integer value of the first nHex hex digits of md5(s)"))

  /** Register into an existing session's function registry. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder, _) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** For `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder, usage) =>
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name, usage),
        builder))
    }
    // sargable-rewrite layer: year(col) filters become pushable ranges
    e.injectOptimizerRule(_ => graft.plans.SargableYearFilter)
  }
}

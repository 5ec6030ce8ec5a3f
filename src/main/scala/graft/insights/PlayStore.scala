package graft.insights

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** The reference pipeline itself (grey-h/app-insights-generator
  * `main.py:363-404`): Play-Store CSV → int casts → range filter →
  * floor-bucket → all 2^14−1 grouping-set insights → CSV append →
  * compaction. Config literals mirror `main.py:57-120`.
  *
  * Two execution modes (SURVEY.md §7.3):
  *  - compat: the reference's literal loop — repartition(2), cache, one
  *    aggregate per subset, 128-subset unionAll batches, two-phase write;
  *  - scale: single-cube shuffle, no coalesce(1), partition count left to
  *    AQE — the plan that survives 100 TB.
  */
object PlayStore {

  /** Columns force-cast to int after inference (main.py:106-116,151-160). */
  val numericCols: Seq[String] = Seq("minInstalls", "originalPrice", "price",
    "ratings", "len screenshots", "reviews", "score", "releasedYear")

  /** Bucket widths (main.py:106-115). NB `len screenshots` has a space. */
  val buckets: Map[String, Long] = Map(
    "minInstalls" -> 1000000L, "originalPrice" -> 100L, "price" -> 100L,
    "ratings" -> 1000000L, "len screenshots" -> 5L, "reviews" -> 1000000L,
    "score" -> 1L, "releasedYear" -> 5L)

  /** Id cols group but display their value cols (main.py:77-84). */
  val idValues: Map[String, Seq[String]] = Map(
    "developerId" -> Seq("developer", "developerWebsite"),
    "genreId" -> Seq("genre"))

  /** The 14 grouping columns, canonical order (main.py:88-103). */
  val groupingCols: Seq[String] = Seq("developerId", "free", "genreId",
    "minInstalls", "offersIAP", "originalPrice", "price", "ratings",
    "len screenshots", "adSupported", "containsAds", "reviews", "score",
    "releasedYear")

  val cfg: InsightsConfig = InsightsConfig(groupingCols, buckets, idValues,
    thresholdPercent = 2.0)

  /** Data-cleaning ranges (main.py:206-218; upper year hardcoded there). */
  val rangeFilters: Seq[(String, Long, Long)] =
    Seq(("ratings", 0L, 100L), ("releasedYear", 1971L, 2023L))

  /** Explicit Play-Store CSV schema — the engine default (SURVEY.md §1.2):
    * schema inference costs an extra full pass over the input and is
    * nondeterministic under data drift at 100 TB. Types are the widest
    * the reference's inference produces on the public dataset; the
    * numeric columns are cast to int by `clean` afterwards either way,
    * so schema-read and inference-read pipelines agree (golden-tested). */
  val schema: StructType = StructType(Seq(
    StructField("_c0", LongType), StructField("appId", StringType),
    StructField("developer", StringType), StructField("developerId", StringType),
    StructField("developerWebsite", StringType), StructField("free", BooleanType),
    StructField("genre", StringType), StructField("genreId", StringType),
    StructField("minInstalls", LongType), StructField("offersIAP", BooleanType),
    StructField("originalPrice", DoubleType), StructField("price", DoubleType),
    StructField("ratings", LongType), StructField("len screenshots", LongType),
    StructField("adSupported", BooleanType), StructField("containsAds", BooleanType),
    StructField("reviews", LongType), StructField("score", DoubleType),
    StructField("releasedYear", LongType)))

  /** O1: CSV source. The reference passes a numPartitions read option the
    * CSV source ignores — not replicated. Explicit schema optional;
    * default mirrors the reference's header+inferSchema. */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", header)
    schema match {
      case Some(st) => r.schema(st).csv(path)
      case None     => r.option("inferSchema", inferSchema).csv(path)
    }
  }

  /** O2/O17: CSV sink, append mode, optional single file. */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", header).mode(SaveMode.Append).csv(path)
  }

  /** O3+O4: int casts then range filters. */
  def clean(df: DataFrame): DataFrame =
    InsightsEngine.rangeFilter(InsightsEngine.castInts(df, numericCols), rangeFilters)

  /** O5: floor-bucket the numeric columns. */
  def prepare(df: DataFrame): DataFrame = InsightsEngine.bucket(clean(df), buckets)

  /** Full job, compat mode (reference main.py:363-404): batched loop with
    * `first()` semantics and two-phase output (O20: append batches under
    * `<out>_partitioned`, then compact to one CSV at `<out>`). The
    * reference writes every CSV with header=True and names the single
    * output column "Insights" (main.py:312,358,393) — reproduced here so
    * compat-mode files are format-identical. */
  def extractCompat(spark: SparkSession, csvPath: String, outPath: String,
      batchSize: Int = 128, numPartitions: Int = 2,
      config: InsightsConfig = cfg): Unit = {
    val prepared = prepare(readCsv(spark, csvPath))
      .repartition(numPartitions) // O16
      .cache()                    // O18
    try {
      val n = prepared.count()    // O19 — the single reused count
      InsightsEngine.enumerateLoop(prepared, config, n, batchSize, useFirst = true)
        .foreach(batch => writeCsv(batch.withColumnRenamed("insight", "Insights"),
          s"${outPath}_partitioned", header = true))
      val all = readCsv(spark, s"${outPath}_partitioned", header = true,
        inferSchema = true)       // O20 re-read (main.py:393 passes True, True)
      writeCsv(all, outPath, header = true)
    } finally prepared.unpersist()
  }

  /** Full job, scale mode: one cube shuffle, parallel output. At 100 TB
    * this is the only viable shape — 16 383 aggregate exchanges over the
    * same cached input (compat mode) do not survive a real cluster.
    *
    * Plan shape (r6 verdict #1/#2): the cube aggregate below the 2^k
    * Expand carries ONLY count+grouping_id (fixed-width → HashAggregate;
    * `min(string)` value buffers would force SortAggregate exactly where
    * row volume is ×2^k) — value columns re-attach post-HAVING from
    * broadcast dictionaries (`insightsCubeNativeDict`; valid because the
    * Play-Store id→value columns are functionally dependent on their id).
    * Display semantics are therefore deterministic `min` per id, not the
    * reference's nondeterministic `first()` — compat mode keeps `first()`
    * literally; scale mode's output for value columns is one reproducible
    * member of the reference's nondeterministic output family.
    *
    * Routing: one combined stats pass (count + per-column HLL) decides
    * cube vs iceberg vs hybrid, COST-BASED by default
    * (`InsightsEngine.costBasedHighCard`): a column routes to iceberg
    * pruning when its NDV exceeds the popular-value bound N/threshold by
    * a 4× margin — the condition under which pruning provably collapses
    * its cube state (≤ 50 surviving values at the 2 % threshold). Pass
    * `maxGroupsPerCol = Some(n)` to override with a fixed NDV cut.
    *
    * Why the split matters, measured (SCALE.md): ONE ~5000-distinct
    * column at k=10 → cube 87–92 s vs hybrid 293 s (the cube absorbs a
    * single wide column; hybrid just pays loop planning for the 2^(k-1)
    * subsets containing it); TWO ~600k-distinct columns at k=8 → cube
    * state explodes into the hundreds of millions and does not finish,
    * hybrid stays bounded. Iceberg beats both when NDV ≫ N/threshold:
    * k=14 corpus, dict cube 1 992 s vs iceberg 1 396 s, identical rows
    * (BASELINE.md r7) — which default flags now pick automatically. */
  def extractScale(spark: SparkSession, csvPath: String, outPath: String,
      config: InsightsConfig = cfg,
      maxGroupsPerCol: Option[Long] = None): Unit = {
    // scale mode reads with the explicit schema: no inference pass
    val prepared = prepare(readCsv(spark, csvPath, schema = Some(schema)))
    val (n, cards) = InsightsEngine.cardinalityStats(prepared, config)
    val highCard = maxGroupsPerCol match {
      case Some(cut) => cards.filter { case (_, c) => c > cut }.keySet
      case None      => InsightsEngine.costBasedHighCard(n, cards, config)
    }
    val route = if (highCard.isEmpty) "cube"
      else if (highCard.size <= 4) "iceberg" else "hybrid"
    println(s"INSIGHTS route=$route n=$n highCard=${highCard.toSeq.sorted.mkString(",")} " +
      s"cards=${config.groupingCols.map(c => s"$c:${cards(c)}").mkString(",")}")
    // The Expand runs BEFORE the first shuffle, so per-TASK expanded
    // volume is rows-per-input-partition × 2^k (SCALE.md): a small CSV
    // arriving as one split would put the entire Expand + partial agg in
    // ONE task whose hash map degrades to a single-threaded sort. At
    // 100 TB input splits bound this naturally (maxPartitionBytes); the
    // CLI re-balances only when the scan gives fewer splits than cores.
    val cores = spark.sparkContext.defaultParallelism
    val balanced =
      if (prepared.rdd.getNumPartitions < cores) prepared.repartition(cores)
      else prepared
    val insights =
      if (highCard.isEmpty)
        InsightsEngine.insightsCubeNativeDict(balanced, config, n)
      else if (highCard.size <= 4)
        // iceberg support pruning: rows with sub-threshold high-card
        // values are provably dead for every subset containing that
        // column (count is monotone under grouping refinement), so the
        // high-card cubes see only the ≤ N/threshold popular values —
        // result identical, state bounded (InsightsEngine scaladoc)
        InsightsEngine.insightsCubeIceberg(balanced, config, n, highCard)
      else
        InsightsEngine.insightsHybrid(balanced, config, n, highCard,
          useFirst = false, dictValues = true)
    insights.write.mode(SaveMode.Overwrite).option("header", false).csv(outPath)
  }
}

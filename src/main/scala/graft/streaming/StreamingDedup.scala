package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Calibrate, Dedup, Indexes}

/** STREAMING near-dup admission filter — the production gate in front of
  * a training corpus: every incoming document is probed against the
  * STORED MinHash-LSH band index of the corpus-so-far, and verified
  * matches (exact Jaccard ≥ 0.5, the same threshold and ±100-char length
  * band as the batch dedup family) are emitted as (new_id, dup_of,
  * jaccard) rejections. `StreamingPipeline` handles EXACT dedup in-stream
  * (digest state); this closes the near-dup half the scaladoc there
  * defers to the index: the index is a STATIC side (build once per
  * corpus snapshot — `Indexes`), the stream probes it with a stateless
  * stream-static equi-join on (band, bucket), and each admitted batch's
  * own band rows are APPENDED to the stored index
  * (`Indexes.appendToIndexOrRebuild` — the daily-snapshot motion, with
  * transparent rebuild when the calibrated banding rung has moved) so
  * later batches
  * dedup against earlier ones — reference scope: the reference engine has
  * no streaming or dedup at all; this is the §2.2 extension surface
  * composed with Structured Streaming.
  *
  * Scale shape: the stream side carries its own shingle set through the
  * banding (`bandedSigs(keep = shingles)`) because a stream cannot
  * re-join to itself for verification — per-row cost is the shingle
  * array ×8 band rows, bounded by document length, zero state. The
  * candidate join shuffles only (band, bucket) keyed index rows; the
  * verification join attaches corpus shingles for CANDIDATE dup_of ids
  * only (a semi-join against the raw table — the index never stores
  * text). The only stateful operator is the within-watermark candidate
  * dedup (a doc's band rows can match the same corpus doc in several
  * bands), whose state is the recent candidate-pair keys, watermark-
  * bounded — O(recent batch × match rate), never O(corpus).
  */
object StreamingDedup {

  /** Corpus split for the two-batch spec drive: the stored index is
    * built from residues ∉ {0, 5}; batch 1 streams residue 0, batch 2
    * residue 5 (after batch 1's bands are appended, batch 2's dups
    * against batch-1 docs are caught — the cross-snapshot catch). */
  private[graft] def residuePred(residues: Int*): Column =
    pmod(col("doc_id"), lit(10)).isin(residues.map(_.asInstanceOf[Any]): _*)

  /** The CALIBRATED banding the gate runs at — as of r16 the MinHash
    * banding is calibrator-derived (`Calibrate.minhashRowsFor`, the last
    * fixed similarity-family config retired), so the gate pays one
    * stored-calibration fetch per corpus snapshot and every piece of
    * the pipeline (index build, stream-side banding, batch truth,
    * append stamp) consumes the SAME (rows, bands). */
  private[graft] def bandingParams(s: SparkSession, dir: String): Map[String, Long] =
    Calibrate.currentMinhashBanding(Calibrate.storedParams(s, dir))

  /** The banding the STREAM side must probe at: the stored index's OWN
    * stamp — layout coherence with the artifact that actually exists,
    * including right after a mid-stream re-rung through
    * [[appendBatchAt]] (probing a (5, 32) index with (4, 16) stream
    * bands would hit only foreign buckets and silently admit every
    * dup — the r16 review's finding). Forces the index build first, so
    * an unbuilt gate starts at the calibrated answer and the stamp is
    * always present after. */
  private[graft] def activeBanding(s: SparkSession, dir: String): Map[String, Long] = {
    corpusBandIndex(s, dir)
    Indexes.indexStamp(s, dir, "mhbands") match {
      case Some(st) if st.contains("minhash_rows") && st.contains("minhash_bands") =>
        st
      case _ =>
        // a FOREIGN or legacy stamp (e.g. the pre-r16 minhash_perms/bands
        // keys) means the stored rows' banding is unprovable — probing
        // them at any guessed layout silently admits dups, and the old
        // unchecked map lookups threw NoSuchElementException instead of
        // recovering (r16 advice). Fail closed the way the checked
        // append does: rebuild at the calibrated banding and re-stamp.
        val params = bandingParams(s, dir)
        val (r, b) = rowsBands(params)
        Indexes.rebuildIndex(s, dir, "mhbands", params)(
          corpusBandRows(s, dir, r, b))
        params
    }
  }

  /** Total only for calibrator-derived maps ([[bandingParams]] and
    * stamps [[activeBanding]] has already key-validated). */
  private def rowsBands(params: Map[String, Long]): (Int, Int) =
    (params("minhash_rows").toInt, params("minhash_bands").toInt)

  private def corpusBandRows(s: SparkSession, dir: String,
      r: Int, b: Int): DataFrame =
    Dedup.bandedSigs(Dedup.shingled(
      Tables.documents(s, dir).filter(!residuePred(0, 5))),
      rows = r, bands = b)

  /** The stored band index of the corpus-so-far (tag `mhbands`): same
    * row format as `Dedup.bandedSigs` — (doc_id, band, bucket). First
    * call builds + materializes, STAMPED with the calibrated banding;
    * `appendBatch` adds snapshots through the staleness-checked
    * recovery path. Serves at the STORED stamp (not the checked serve):
    * after a mid-stream rung crossing rebuilds this index at the grown
    * corpus's banding, the fixture corpus's own calibration still
    * answers the old rung, and a checked serve would "recover" the
    * index right back down — rung transitions for this tag are owned by
    * the append path, and the stream probes the layout that exists. */
  def corpusBandIndex(s: SparkSession, dir: String): DataFrame = {
    val params = bandingParams(s, dir)
    val (r, b) = rowsBands(params)
    Indexes.materializedIndexAtStoredStamp(s, dir, "mhbands", params)(
      corpusBandRows(s, dir, r, b))
  }

  /** Append one admitted batch's band rows to the stored index — the
    * post-admission half of the daily motion, through the RECOVERY path
    * (r15 verdict #3: the throwing checked append was fine while the
    * banding was frozen, but a calibrated banding makes the ingest gate
    * the one consumer that would crash on a decade crossing): when the
    * stored stamp still matches the calibrated banding, the batch's
    * band rows append (the cheap daily motion); when the corpus has
    * crossed a banding rung, the index transparently REBUILDS at the
    * current rung from `corpusSoFar` and re-stamps. `corpusSoFar` is a
    * REQUIRED caller obligation — base plus EVERY batch admitted so
    * far, which only the caller can supply (a production gate reads it
    * back from its admitted-output table; the stored index holds band
    * rows, not text, so it cannot reconstruct the corpus itself; a
    * convenience default was rejected because any fixed expression
    * silently drops earlier batches on the rebuild branch — the
    * r16 review's finding). Returns true iff the rebuild was taken, so
    * the gate can surface the event in its run log. */
  def appendBatch(s: SparkSession, dir: String, batch: DataFrame)(
      corpusSoFar: => DataFrame): Boolean =
    appendBatchAt(s, dir, batch, bandingParams(s, dir))(corpusSoFar)

  /** [[appendBatch]] at an EXPLICIT calibrated banding — the seam the
    * spec uses to drive the mid-stream rung crossing (the fixture
    * corpus is immutable, so its own calibration never flips; a grown
    * corpus's params are passed in to play the decade-crossing day). */
  private[graft] def appendBatchAt(s: SparkSession, dir: String,
      batch: DataFrame, current: Map[String, Long])(
      corpusSoFar: => DataFrame): Boolean = {
    val (r, b) = rowsBands(current)
    Indexes.appendToIndexOrRebuild(s, dir, "mhbands",
      Dedup.bandedSigs(Dedup.shingled(batch), rows = r, bands = b), current)(
      Dedup.bandedSigs(Dedup.shingled(corpusSoFar), rows = r, bands = b))
  }

  /** Parquet-backed document stream over a staged arrival DIRECTORY
    * (one "day's" feed; the file source needs a directory it can watch,
    * so arrivals are staged as files), file-per-micro-batch. */
  def readNewDocsStream(s: SparkSession, stagedDir: String): DataFrame = {
    val schema = s.read.parquet(stagedDir).schema
    s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(stagedDir)
  }

  /** newDocs (streaming) → (new_id, dup_of, jaccard) rejection stream.
    *
    * ingest_ts is synthesized from doc_id AT MICROSECOND GRANULARITY
    * (the fixture has no arrival time; a real feed supplies its own):
    * a 24 h watermark then tolerates an id spread of 8.64e10 before any
    * row could be late-dropped — seconds-granularity synthesis would
    * hit that cliff at an id spread of just 86 400 (e.g. one 10M-stride
    * re-key) and silently drop rejections on out-of-order files. The
    * watermark exists to bound the candidate-dedup state, not to
    * sequence events. Verification recomputes the EXACT Jaccard, so the
    * stream's rejections are provably the batch probe's pairs
    * (StreamingDedupSpec pins stream ≡ batch for both snapshots). */
  def admissionFilter(s: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
    // band the stream at the stored index's OWN layout ([[activeBanding]])
    val (r, b) = rowsBands(activeBanding(s, dir))
    val banded = Dedup.bandedSigs(
        Dedup.shingled(newDocs), keep = Seq("n_chars", "shingles"),
        rows = r, bands = b)
      .withColumn("ingest_ts",
        timestamp_micros(col("doc_id") + 86400000000L))
      .withWatermark("ingest_ts", "24 hours")
    val candidates = banded
      .join(corpusBandIndex(s, dir).withColumnRenamed("doc_id", "dup_of"),
        Seq("band", "bucket"))
      .select(col("doc_id").as("new_id"), col("dup_of"), col("ingest_ts"),
        col("n_chars").as("a_nc"), col("shingles").as("a_sh"))
      .dropDuplicatesWithinWatermark("new_id", "dup_of")
    // corpus text enters only here, for candidate ids — never the index
    val corpusSh = Dedup.shingled(Tables.documents(s, dir))
      .select(col("doc_id").as("dup_of"),
        col("n_chars").as("b_nc"), col("shingles").as("b_sh"))
    candidates
      .join(corpusSh, "dup_of")
      .filter(abs(col("a_nc") - col("b_nc")) <= 100)
      .select(col("new_id"), col("dup_of"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Batch replica of one admission snapshot — the spec's truth side:
    * probe `newPred` docs against `corpusPred` docs with the identical
    * band/verify parameters (mirrors `Dedup.dedupIncremental`'s shape
    * with parameterized sides). */
  private[graft] def batchTruth(s: SparkSession, dir: String,
      newPred: Column, corpusPred: Column): DataFrame = {
    // truth side probes at the same layout the stream does
    val (r, b) = rowsBands(activeBanding(s, dir))
    val docs = Tables.documents(s, dir)
    val newSh = Dedup.shingled(docs.filter(newPred))
    val corpusSh = Dedup.shingled(docs.filter(corpusPred))
    Dedup.bandedSigs(newSh, rows = r, bands = b).as("n")
      .join(Dedup.bandedSigs(corpusSh, rows = r, bands = b).as("c"),
        col("n.band") === col("c.band") && col("n.bucket") === col("c.bucket"))
      .select(col("n.doc_id").as("new_id"), col("c.doc_id").as("dup_of"))
      .dropDuplicates("new_id", "dup_of")
      .join(newSh.select(col("doc_id").as("new_id"),
        col("shingles").as("a_sh"), col("n_chars").as("a_nc")), "new_id")
      .join(corpusSh.select(col("doc_id").as("dup_of"),
        col("shingles").as("b_sh"), col("n_chars").as("b_nc")), "dup_of")
      .filter(abs(col("a_nc") - col("b_nc")) <= 100)
      .select(col("new_id"), col("dup_of"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }
}

package graft

import java.io.{BufferedWriter, FileWriter}

/** Deterministic synthetic Play-Store-shaped CSV generator — the corpus
  * for the reference-shape vs engine-shape head-to-head and the k=14
  * full-powerset scale measurement (BASELINE.md). Shape mirrors the r1
  * head-to-head data: one high-cardinality id column (`developerId`,
  * ~5 000 distinct) whose value columns are functionally dependent on it
  * (the dict-cube premise, true of real Play-Store data), every other
  * grouping column low-cardinality by construction after the reference's
  * own bucketing (reference main.py:106-115) — bools, ~50 genres, small
  * numeric buckets. ~2 % of rows violate the cleaning ranges
  * (reference main.py:206-218) so `clean` has real work.
  *
  * Pure JVM writer (no Spark): 100k rows is ~12 MB; generation must not
  * perturb the measurement JVM. Seeded — reruns emit byte-identical data.
  *
  * Usage: runMain graft.SynthPlayStore <outPath.csv> [rows=100000] [distinctDevs=5000]
  * `distinctDevs` scales the high-cardinality column: 5 000 is the r1
  * head-to-head shape; ≥100 000 is the routing stress shape (NO dev
  * value can clear the 2 % threshold — iceberg pruning proves the whole
  * dev-containing half of the powerset empty).
  */
object SynthPlayStore {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(sys.error("usage: SynthPlayStore <out.csv> [rows]"))
    val rows = if (args.length > 1) args(1).toInt else 100000
    val distinctDevs = if (args.length > 2) args(2).toInt else 5000
    val rnd = new scala.util.Random(42)
    val w = new BufferedWriter(new FileWriter(path), 1 << 20)
    w.write("_c0,appId,developer,developerId,developerWebsite,free,genre," +
      "genreId,minInstalls,offersIAP,originalPrice,price,ratings," +
      "len screenshots,adSupported,containsAds,reviews,score,releasedYear\n")
    def b(p: Int): String = if (rnd.nextInt(100) < p) "True" else "False"
    var i = 0
    while (i < rows) {
      val dev = rnd.nextInt(distinctDevs)
      val devId = s"dev$dev"
      // website nulls are a function of the ID (not the row) so the
      // id→value functional dependency holds corpus-wide
      val website = if (dev % 7 == 0) "" else s"http://$devId.example.com"
      val genre = rnd.nextInt(50)
      val dirty = rnd.nextInt(100) < 2 // fails the cleaning ranges
      val minInstalls = math.pow(10, rnd.nextInt(8)).toLong * (1 + rnd.nextInt(9))
      val price = if (rnd.nextInt(10) < 8) 0 else 1 + rnd.nextInt(499)
      val line = Seq(
        i.toString, s"com.app.a$i", s"Developer_$dev", devId, website,
        b(80), s"Genre_$genre", s"GENRE$genre", minInstalls.toString,
        b(30), price.toString, price.toString,
        (if (dirty && rnd.nextBoolean()) 200 else rnd.nextInt(101)).toString,
        rnd.nextInt(31).toString, b(60), b(55),
        rnd.nextInt(5000000).toString,
        (rnd.nextInt(50) / 10.0).toString,
        (if (dirty) 1950 else 1990 + rnd.nextInt(34)).toString
      ).mkString(",")
      w.write(line); w.write("\n")
      i += 1
    }
    w.close()
    println(s"wrote $rows rows to $path")
  }
}

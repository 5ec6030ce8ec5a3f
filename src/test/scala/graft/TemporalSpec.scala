package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("nearest as-of equals a brute-force candidate ranking (tolerance, ties)") {
    val dir = "/root/testdata/sf0.001"
    val got = Temporal.eventsAsofNearest(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(4))))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val views = ev.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(t => (t._3, t._4)).toSeq).toMap
    val purchases = ev.filter(_._2 == "purchase")
    assert(got.size === purchases.length)
    purchases.foreach { case (u, _, pid, pus) =>
      val cands = views.getOrElse(u, Seq.empty)
        .map { case (vid, vus) => (math.abs(vus - pus), vus, vid) }
        .filter(_._1 <= 600000000L)
      val want =
        if (cands.isEmpty) None
        else { val (_, vus, vid) = cands.min; Some((vid, vus - pus)) }
      assert(got(pid) === want, s"purchase $pid user $u")
    }
    // both signs occur on real data (views before AND after purchases)
    val deltas = got.values.flatten.map(_._2)
    assert(deltas.exists(_ < 0) && deltas.exists(_ > 0))
  }

  test("asofJoin picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 250L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 100L, 10L), (1L, 200L, 20L), (1L, 300L, 30L), (2L, 60L, 40L))
      .toDF("k", "rt", "v")
    val got = Temporal.asofJoin(left, right, "k", "t", "rt", "v")
      .select("name", "asof_v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got("p1") === 10L) // simultaneous right row IS visible
    assert(got("p2") === 20L) // 300 is after 250 -> 200 wins
    assert(got("p3") === -1L) // no right row at/before 50 -> null
  }

  test("asofJoin ties on time resolve to the max value") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 90L, 7L), (1L, 90L, 9L)).toDF("k", "rt", "v")
    val got = Temporal.asofJoin(left, right, "k", "t", "rt", "v")
      .select("asof_v").collect()(0).getLong(0)
    assert(got === 9L)
  }

  test("attribution output: every asof view precedes its purchase") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = Temporal.eventsAsofAttribution(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(e(r.getLong(3)) <= r.getLong(2),
        s"view ${r.getLong(3)} after purchase ${r.getLong(0)}")
    }
  }

  test("linear interpolation matches a driver-side recomputation of every grid row") {
    val dir = "/root/testdata/sf0.001"
    // observed hourly sums per series, recomputed independently
    val obs = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour"),
        Tables.cents(col("value")).as("vc"))
      .groupBy("event_type", "hour").agg(sum("vc").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = Temporal.eventsResampleInterp(spark, dir).collect()
    assert(rows.nonEmpty)
    val bySeries = obs.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    rows.foreach { r =>
      val (et, h) = (r.getString(0), r.getLong(1))
      val hours = bySeries(et)
      val expected: Option[Double] = obs.get((et, h)) match {
        case Some(v) => Some(v.toDouble)
        case None =>
          val prev = hours.filter(_ < h).lastOption
          val next = hours.find(_ > h)
          (prev, next) match {
            case (Some(p), Some(nx)) =>
              val (pv, nv) = (obs((et, p)), obs((et, nx)))
              Some(pv.toDouble + (nv - pv).toDouble * (h - p).toDouble / (nx - p).toDouble)
            case _ => None // outside the observed span stays null
          }
      }
      expected match {
        case Some(v) =>
          // result is round(v, 4), so it sits within 5e-5 of the raw value
          assert(!r.isNullAt(3) && math.abs(r.getDouble(3) - v) <= 6e-5,
            s"($et,$h)")
        case None => assert(r.isNullAt(3), s"($et,$h) should be null")
      }
    }
  }
}

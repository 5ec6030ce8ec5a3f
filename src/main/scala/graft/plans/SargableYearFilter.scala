package graft.plans

import java.time.{LocalDate, ZoneId}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType, TimestampNTZType, TimestampType}

/** Optimizer rule: unwrap `year(col) <cmp> N` filters into sargable
  * range predicates on the underlying date/timestamp column.
  *
  * `year(ts) = 1996` wraps the column in a function, so the parquet
  * scan cannot serve it from row-group min/max statistics and reads
  * every row — at 100 TB the difference between scanning one year and
  * scanning the whole table. The equivalent half-open range
  * (`ts >= '1996-01-01' AND ts < '1997-01-01'`, boundaries computed in
  * the cast's time zone) reaches PushedFilters and prunes row groups
  * (and partitions, when the table is date-partitioned). Null semantics
  * are preserved: both forms are NULL exactly when the column is NULL.
  *
  * This is the same family as Spark's own UnwrapCastInBinaryComparison
  * (which handles casts but not date-part extraction). Queries in this
  * repo already write the range form by hand (`Tables.yearIs`); the rule
  * makes the engine apply it to any user-written filter. Install with
  * `spark.experimental.extraOptimizations` (existing session) or
  * `GraftExtensions` (spark.sql.extensions).
  */
object SargableYearFilter extends Rule[LogicalPlan] {

  /** Matches year(<date-col>) or year(cast(<ts-col> as date)) and yields
    * the column plus a boundary builder from year → comparable literal. */
  private object YearOf {
    def unapply(e: Expression): Option[(Expression, Int => Literal)] = e match {
      case Year(Cast(ts, DateType, tzOpt, _)) if ts.dataType == TimestampType &&
          ts.deterministic =>
        val zone = ZoneId.of(tzOpt.getOrElse(conf.sessionLocalTimeZone))
        Some((ts, y => Literal(
          LocalDate.of(y, 1, 1).atStartOfDay(zone).toInstant.getEpochSecond
            * 1000000L,
          TimestampType)))
      // TIMESTAMP_NTZ (what parquet timestamps without a zone read as):
      // the wall-clock date IS the date — boundaries are zone-free micros
      case Year(Cast(ts, DateType, _, _)) if ts.dataType == TimestampNTZType &&
          ts.deterministic =>
        Some((ts, y => Literal(
          LocalDate.of(y, 1, 1).toEpochDay * 86400L * 1000000L,
          TimestampNTZType)))
      case Year(d) if d.dataType == DateType && d.deterministic =>
        Some((d, y => Literal(LocalDate.of(y, 1, 1).toEpochDay.toInt, DateType)))
      case _ => None
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  // year() yields values far inside Int range; +1 cannot overflow a
  // LocalDate year, but guard absurd literals (year(ts) can never be
  // > 9999 on sane data and LocalDate caps at 999999999)
  private def sane(y: Int): Boolean = y > -9999 && y < 9999

  private def geq(c: Expression, lo: Int => Literal, y: Int) =
    GreaterThanOrEqual(c, lo(y))
  private def lt(c: Expression, lo: Int => Literal, y: Int) =
    LessThan(c, lo(y))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f: Filter => f transformExpressionsUp {
      case EqualTo(YearOf(c, lo), IntLit(y)) if sane(y) =>
        And(geq(c, lo, y), lt(c, lo, y + 1))
      case EqualTo(IntLit(y), YearOf(c, lo)) if sane(y) =>
        And(geq(c, lo, y), lt(c, lo, y + 1))
      case GreaterThanOrEqual(YearOf(c, lo), IntLit(y)) if sane(y) =>
        geq(c, lo, y)
      case GreaterThan(YearOf(c, lo), IntLit(y)) if sane(y) =>
        geq(c, lo, y + 1)
      case LessThanOrEqual(YearOf(c, lo), IntLit(y)) if sane(y) =>
        lt(c, lo, y + 1)
      case LessThan(YearOf(c, lo), IntLit(y)) if sane(y) =>
        lt(c, lo, y)
      // mirrored literal-on-left comparisons
      case GreaterThanOrEqual(IntLit(y), YearOf(c, lo)) if sane(y) =>
        lt(c, lo, y + 1)
      case GreaterThan(IntLit(y), YearOf(c, lo)) if sane(y) =>
        lt(c, lo, y)
      case LessThanOrEqual(IntLit(y), YearOf(c, lo)) if sane(y) =>
        geq(c, lo, y)
      case LessThan(IntLit(y), YearOf(c, lo)) if sane(y) =>
        geq(c, lo, y + 1)
    }
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared duck-convention day-of-week / epoch-microseconds kernels (r12,
  * timestamp fuzz mode).
  *
  * `graft_dow(x)` — DuckDB's 0=Sunday..6=Saturday day-of-week for
  * TIMESTAMP/DATE inputs. Pure epoch arithmetic (1970-01-01 was a
  * Thursday: floorMod(epochDays + 4, 7)), no calendar object. Exists as
  * a kernel because every SQL spelling is a re-capture trap: Spark's
  * `extract(DAYOFWEEK …)` is itself a duck spelling the translator must
  * shift (extract(dayofweek) is 0-based THERE — r12 ts-fuzz find, the
  * r11 emissions used the extract spelling and were unshiftable without
  * matching our own output), and Spark's `dayofweek()` call collides
  * with duck's 0-based function of the same name.
  *
  * `graft_epoch_us(x)` — microseconds-since-epoch for TIMESTAMP/DATE and
  * INTERVAL inputs (probe-pinned duck conventions: year-month intervals
  * count 30-day months = 2,592,000 s; day-time intervals are their exact
  * micros; DATE is midnight UTC). Feeds epoch()/epoch_ms()/epoch_us()
  * and extract(epoch/second/millisecond/microsecond) emissions — the
  * r11 unix_micros emission was TIMESTAMP-only (interval args were a
  * loud analysis error where duck answers) and unix_millis FLOORS where
  * duck's epoch_ms TRUNCATES toward zero (probed:
  * epoch_ms(TIMESTAMP '1969-12-31 23:59:59.999249') = 0, not −1). */
object DateTimeKernels {
  private val MicrosPerDay = 86400000000L
  /** 30-day month in micros — duck's interval-epoch convention. */
  private val MicrosPerMonth = 2592000000000L

  def dow(epochDays: Long): Int =
    java.lang.Math.floorMod(epochDays + 4L, 7L).toInt
}

/** `graft_dow(ts_or_date)` → INT 0=Sunday..6=Saturday (duck convention). */
case class GraftDowExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_dow"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType | DateType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dow requires a timestamp or date input, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType =>
      DateTimeKernels.dow(v.asInstanceOf[Int].toLong)
    case _ =>
      DateTimeKernels.dow(
        java.lang.Math.floorDiv(v.asInstanceOf[Long], 86400000000L))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType =>
        defineCodeGen(ctx, ev,
          d => s"graft.functions.DateTimeKernels.dow((long)($d))")
      case _ =>
        defineCodeGen(ctx, ev, us =>
          s"graft.functions.DateTimeKernels.dow(java.lang.Math.floorDiv($us, 86400000000L))")
    }
  override protected def withNewChildInternal(c: Expression): GraftDowExpr =
    copy(child = c)
}

/** `graft_epoch_us(x)` → BIGINT micros since epoch; see object doc. */
case class GraftEpochUsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_epoch_us"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType | DateType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case _: DayTimeIntervalType | _: YearMonthIntervalType =>
      TypeCheckResult.TypeCheckSuccess
    case CalendarIntervalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_epoch_us requires a timestamp, date or interval input, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType => v.asInstanceOf[Int].toLong * 86400000000L
    case _: YearMonthIntervalType =>
      v.asInstanceOf[Int].toLong * 2592000000000L
    case CalendarIntervalType =>
      // mixed make_interval emissions (the translator's mixed-class
      // string-interval rewrite): duck epoch sums 30-day months + days
      // + micros
      val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
      ci.months.toLong * 2592000000000L + ci.days.toLong * 86400000000L +
        ci.microseconds
    case _ => v.asInstanceOf[Long]
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DateType =>
        defineCodeGen(ctx, ev, d => s"((long)($d)) * 86400000000L")
      case _: YearMonthIntervalType =>
        defineCodeGen(ctx, ev, m => s"((long)($m)) * 2592000000000L")
      case CalendarIntervalType =>
        defineCodeGen(ctx, ev, ci =>
          s"(((long)($ci).months) * 2592000000000L + ((long)($ci).days) * 86400000000L + ($ci).microseconds)")
      case _ => defineCodeGen(ctx, ev, us => s"(long)($us)")
    }
  override protected def withNewChildInternal(c: Expression): GraftEpochUsExpr =
    copy(child = c)
}

package graft.dialect

import org.apache.spark.sql.catalyst.expressions.{Cast, Hour, MakeTime, Minute, SecondWithFraction}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{TimeType, TimestampNTZType, TimestampType}

/** Trino supports `CAST(timestamp AS TIME)` (time-of-day extraction,
  * fractional seconds preserved — reference pass-through surface,
  * `/root/reference/internal/trino/client.go:284-290`). Spark 4.1's
  * native `TimeType` has no timestamp→time cast, so this resolution
  * rule rewrites the cast to the equivalent
  * `make_time(hour(ts), minute(ts), second-with-fraction(ts))` before
  * the analyzer's cast check can reject it. `SecondWithFraction` (the
  * internal DECIMAL(8,6) seconds field used by `make_timestamp`) keeps
  * sub-second precision, matching Trino's cast semantics.
  *
  * Timezone handling: `Hour`/`Minute`/`SecondWithFraction` are
  * `TimeZoneAwareExpression`s left without an explicit zone here; the
  * analyzer's own ResolveTimeZone fills in the session zone afterward
  * (same treatment as user-written `hour(ts)`).
  */
object TimeCastRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case Cast(child, _: TimeType, _, _)
            if child.resolved &&
              (child.dataType == TimestampType || child.dataType == TimestampNTZType) =>
          MakeTime(Hour(child), Minute(child), SecondWithFraction(child))
      }
    }
}

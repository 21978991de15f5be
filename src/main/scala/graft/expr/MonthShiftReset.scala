package graft.expr

import java.time.LocalDate

/** Month arithmetic with the reference's day-reset semantics
  * (src/crawler/CrawlerSupport.py:30-83): shift by `months`, keeping the
  * day-of-month; if that day does not exist in the target month (e.g.
  * Feb 30), fall back to day 1 — of the target month itself when
  * `rollForward` is false (the reference's lower search bound), or of the
  * month after when true (the upper bound). Spark's `add_months` clamps to
  * month-end instead, so this needs a custom expression.
  *
  * The reference's upper-bound fallback writes literal `month + 1`, which
  * overflows to month 13 in December (a latent bug, SURVEY.md §7.5); this
  * implementation rolls the year correctly instead.
  */
object DateShiftImpl {
  /** days-since-epoch -> days-since-epoch */
  def monthShiftReset(epochDay: Int, months: Int, rollForward: Boolean): Int = {
    val d = LocalDate.ofEpochDay(epochDay.toLong)
    val base = d.withDayOfMonth(1).plusMonths(months.toLong)
    val shifted =
      if (d.getDayOfMonth <= base.lengthOfMonth) base.withDayOfMonth(d.getDayOfMonth)
      else if (rollForward) base.plusMonths(1L)
      else base
    shifted.toEpochDay.toInt
  }
}

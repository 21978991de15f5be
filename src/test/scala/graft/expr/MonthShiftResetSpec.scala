package graft.expr

import java.sql.Date

import graft.SparkSpec
import graft.GraftFunctions._
import org.apache.spark.sql.functions._

class MonthShiftResetSpec extends SparkSpec {
  private def shift(d: String, m: Int, roll: Boolean): String = {
    import spark.implicits._
    Seq(Date.valueOf(d)).toDF("d")
      .select(month_shift_reset($"d", m, roll).as("r"))
      .collect().head.getDate(0).toString
  }

  test("valid day is kept") {
    assert(shift("2001-01-15", 1, false) == "2001-02-15")
    assert(shift("2001-05-15", -4, false) == "2001-01-15")
  }

  test("invalid day resets to day 1 (not month-end clamp)") {
    // reference lower bound: Mar 31 - 1 month -> Feb 31 invalid -> Feb 1
    assert(shift("2001-03-31", -1, false) == "2001-02-01")
    // reference upper bound: Jan 30 + 1 month -> Feb 30 invalid -> Mar 1
    assert(shift("2001-01-30", 1, true) == "2001-03-01")
    // Spark's add_months would clamp to Feb 28 in both cases
  }

  test("December upper-bound fallback rolls the year (reference bug fixed)") {
    // Nov 30 + 1 month = Dec 30 valid; Oct 31 + 2 months -> Dec 31 valid
    assert(shift("2001-10-31", 2, true) == "2001-12-31")
    // Nov 31 does not exist: Aug 31 + 3 -> Nov 31 invalid -> Dec 1
    assert(shift("2001-08-31", 3, true) == "2001-12-01")
    // Dec 31 - 1 + ... : Jan 31 + 11 -> Dec 31 valid
    assert(shift("2001-01-31", 11, true) == "2001-12-31")
    // Feb 30 across a year boundary rolls into March of the next year
    assert(shift("2000-01-30", 13, true) == "2001-03-01")
    // Dec 30 - 1 month -> Nov 30 valid; Dec 31 - 1 -> Nov 31 invalid -> Nov 1
    assert(shift("2001-12-31", -1, false) == "2001-11-01")
  }

  test("year boundaries and leap years") {
    assert(shift("2001-01-29", 1, false) == "2001-02-01")  // 2001 not leap
    assert(shift("2000-01-29", 1, false) == "2000-02-29")  // 2000 leap
    assert(shift("2001-01-15", -1, false) == "2000-12-15")
    assert(shift("2000-12-15", 1, false) == "2001-01-15")
  }
}

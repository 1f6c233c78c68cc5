package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

class FuzzySpec extends SparkSpec {

  private lazy val part = Tables.load(spark, sf, "part")

  test("blocked fuzzy pairs == brute force on the part dictionary") {
    import spark.implicits._
    val got = Fuzzy.fuzzyNamePairs(part, "p_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

    // brute force over the distinct normalized dictionary
    val names = part.select(
        lower(trim(regexp_replace(col("p_name"), "\\s+", " "))).as("nm"))
      .distinct().as[String].collect().sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names if a < b
      dv = lev(a, b) if dv <= 2
    } yield (a, b, dv)).toSet

    // every close pair in this fixture shares an edge token, so the
    // blocked path must achieve full recall here (and is always exact
    // on precision)
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("support counts are true row counts; normalization collapses case " +
      "and whitespace") {
    import spark.implicits._
    val rows = Seq("Red  Widget", "red widget ", "RED WIDGET", "red wodget",
      "blue bolt").toDF("name")
    val got = Fuzzy.fuzzyNamePairs(rows, "name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    // the three Red Widget variants collapse to one dictionary entry
    // with support 3; its only close neighbor is "red wodget"
    assert(got.toSeq === Seq(("red widget", "red wodget", 1, 3L, 1L)))
  }

  test("block cap is deterministic and capped output is a subset") {
    val full = Fuzzy.fuzzyNamePairs(part, "p_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val capped = Fuzzy.fuzzyNamePairs(part, "p_name", maxBlock = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val capped2 = Fuzzy.fuzzyNamePairs(part, "p_name", maxBlock = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped === capped2)
    assert(capped.subsetOf(full))
  }

  test("length prefilter never drops a within-threshold pair") {
    import spark.implicits._
    // dist("ab", "abcd") = 2 == maxDist, length gap exactly maxDist
    val rows = Seq("ab xx", "ab xxcd").toDF("name")
    val got = Fuzzy.fuzzyNamePairs(rows, "name").collect()
    assert(got.length === 1 && got.head.getInt(2) === 2)
  }
}

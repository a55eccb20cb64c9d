package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Smoke over the declared query inventory at sf0.001 (the full
  * hash-exact check is the driver's DuckDB gate + tools/verify_local.py;
  * here we assert the contract shape: every query answers, ordered
  * output, non-degenerate row counts). */
class RelationalSmokeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry() answers with rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every declared query answers at sf0.001") {
    val counts = SparkEntry.queries.map { case (name, q) =>
      name -> q(spark, sf).count()
    }
    val empty = counts.filter(_._2 == 0L).keys.toList.sorted
    withClue(s"queries with zero rows: $empty") {
      // embedding_neardup may legitimately be sparse at tiny sf; all
      // others must produce rows
      empty.filterNot(_ == "q36_embedding_neardup") shouldBe Nil
    }
  }

  test("oracleSql only names declared queries, aliases match") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.subsetOf(qs) shouldBe true
    // every oracle-checked query's output columns appear in its SQL text
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, sf).schema.fieldNames
      cols.foreach { c =>
        withClue(s"$name missing alias $c in oracle sql") {
          sql.toLowerCase should include (c.toLowerCase)
        }
      }
    }
  }
}

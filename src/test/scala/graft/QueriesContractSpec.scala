package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every oracle key names a real query, every
  * query produces rows on the smoke dataset (the driver's t1 check), and
  * output column names contain no duplicates or parquet-hostile
  * characters. */
class QueriesContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has an oracle (no rows-only checks on this surface)") {
    // The driver downgrades oracle-less queries to a weak rows>0 check;
    // this surface has held 100% oracled since round 1 — lock it in.
    val weak = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(weak.isEmpty, s"query without oracle: $weak")
  }

  test("QueriesPart files are key-disjoint (++ can never absorb a duplicate)") {
    // Queries merges the part maps with ++, which silently keeps the last
    // value on a key collision — a duplicated query name across two part
    // files would drop one implementation without any compile error.
    val qSum = Queries.parts.map(_._1.size).sum
    val oSum = Queries.parts.map(_._2.size).sum
    assert(qSum == Queries.queries.size,
      s"duplicate query keys across parts: $qSum entries merge to ${Queries.queries.size}")
    assert(oSum == Queries.oracle.size,
      s"duplicate oracle keys across parts: $oSum entries merge to ${Queries.oracle.size}")
  }

  test("entry() is non-empty (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Catalog.registerAll exposes every table to spark.sql") {
    Catalog.registerAll(spark, TestSpark.sf0001)
    Catalog.tables.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"table $t")
    }
  }

  test("oracle lint: integer window sums flow through CAST(... AS BIGINT)") {
    // DuckDB promotes integer sum() to HUGEINT; a HUGEINT output column is
    // rendered float64 by the driver's pandas fetch and the value hash
    // diverges even when the integers match (the q84_r7 bug). Lint: every
    // windowed sum must either be CAST(... AS BIGINT) at the window, sum a
    // float expression, or have every later projection of its alias wrapped
    // in an AS BIGINT cast.
    val winSum = """(?i)\bSUM\s*\(([^()]*)\)\s+OVER\b""".r
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val lines = sql.linesIterator.toVector
        // Columns defined as DOUBLE earlier in the SQL (CAST(... AS DOUBLE)
        // AS x, or avg/var/round outputs) are float; summing them is safe.
        // So are the base tables' DOUBLE columns (TESTDATA.md schemas):
        // summing a double never promotes to HUGEINT.
        val baseDoubles = Set("value", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax")
        val floatAliases = """(?i)(?:AS\s+DOUBLE\s*\)|\bavg\s*\(|\bvar_samp\s*\(|\bround\s*\()[^,\n]*?\bAS\s+(\w+)""".r
          .findAllMatchIn(sql).map(_.group(1)).toSet ++ baseDoubles
        winSum.findAllMatchIn(sql).flatMap { m =>
          val arg = m.group(1)
          val argIdents = """[A-Za-z_]\w*""".r.findAllIn(arg).toSet
          val lineOfMatch = sql.take(m.start).count(_ == '\n')
          val line = lines(lineOfMatch)
          val castAtWindow =
            """(?i)CAST\s*\(\s*SUM\b""".r.findFirstIn(line).isDefined &&
              line.toUpperCase.contains("AS BIGINT")
          val floatSum = argIdents.exists(floatAliases) ||
            arg.contains("1.0") || arg.toUpperCase.contains("DOUBLE")
          if (castAtWindow || floatSum) None
          else {
            // Uncast integer window sum: its alias may only be projected
            // through CAST(... AS BIGINT) on later lines.
            val alias = """(?i)OVER\s*\([^)]*\)\s+AS\s+(\w+)""".r
              .findFirstMatchIn(sql.drop(m.start)).map(_.group(1))
            alias match {
              case None => Some(s"$name: windowed sum '${m.matched}' has no CAST and no alias")
              case Some(a) =>
                val uses = lines.drop(lineOfMatch + 1).filter(l =>
                  s"""\\b$a\\b""".r.findFirstIn(l).isDefined)
                val bad = uses.filterNot(_.toUpperCase.contains("AS BIGINT"))
                if (bad.nonEmpty)
                  Some(s"$name: window-sum alias '$a' projected without CAST(... AS BIGINT): ${bad.head.trim}")
                else None
            }
          }
        }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: runs at sf0.001, rows > 0, clean schema") {
      val df = fn(spark, TestSpark.sf0001)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"duplicate columns: ${cols.toSeq}")
      assert(cols.forall(c => !c.exists(ch => " ,;{}()\n\t=".contains(ch))),
        s"parquet-hostile column name in ${cols.toSeq}")
      assert(df.count() > 0, s"$name produced no rows at sf0.001")
    }
  }
}

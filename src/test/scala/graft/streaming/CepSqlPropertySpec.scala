package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the dialect translator — the parser extension
  * puts translate() in front of EVERY spark.sql statement, so its
  * no-op path must be provably inert and its rewrite path total on the
  * dialect's grammar (no Spark session needed; this is pure string
  * logic). */
class CepSqlPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[List[A]], seed: Long): List[A] =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("statements without an OVER-window clause pass through IDENTICALLY") {
    // random SQL-ish soup: identifiers, literals (with quotes/escapes),
    // parens, comments, keywords — anything WITHOUT the dialect clause
    val frag: Gen[String] = Gen.oneOf(
      Gen.identifier.map(_.take(8)),
      Gen.oneOf("SELECT", "FROM", "WHERE", "GROUP BY", "ORDER BY",
        "LIMIT 5", "HAVING", "OVER", "WINDOW", "(", ")", ",", "*", "=",
        "'it''s'", "'a -- b'", "\"quoted id\"", "`tick`", "-- comment",
        "/* block */", "'OVER (WINDOW ''60'' SECONDS)'"),
      Gen.choose(0, 9999).map(_.toString))
    val stmt: Gen[List[String]] = Gen.choose(1, 25)
      .flatMap(n => Gen.listOfN(n, frag))
    (1L to 300L).foreach { seed =>
      val s = sample(stmt, seed).mkString(" ")
      // the only way a random soup forms the clause is the quoted literal
      // fragment — inside quotes, so still a no-op
      assert(CepSql.translate(s) eq s,
        s"translate must return the SAME instance for non-dialect text: $s")
    }
  }

  test("generated dialect statements always gain exactly one window()") {
    val gen = for {
      w <- Gen.choose(1, 86400)
      slide <- Gen.option(Gen.choose(1, 86400))
      table <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      grouped <- Gen.oneOf(true, false)
      tail <- Gen.oneOf("", " ORDER BY cnt DESC", " LIMIT 7",
        " HAVING count(*) > 2")
    } yield {
      val over = slide match {
        case Some(sl) => s"OVER (WINDOW '$w' SECONDS, SLIDE '$sl' SECONDS)"
        case None => s"OVER (WINDOW '$w' SECONDS)"
      }
      val gb = if (grouped) " GROUP BY event_type" else ""
      (w, slide,
        s"SELECT event_type, count(*) AS cnt FROM $table $over$gb$tail")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (w, slide, q) =>
        val t = CepSql.translate(q)
        val sl = slide.getOrElse(w)
        val expected = s"window(ts, '$w seconds', '$sl seconds')"
        assert(t.contains(s"GROUP BY $expected"), s"$q ->\n$t")
        assert(!t.toUpperCase.contains("OVER (WINDOW"), t)
        // exactly one injection
        assert(t.indexOf(expected) == t.lastIndexOf(expected), t)
      }
    }
  }
}

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

  test("generated MATCH PATTERN statements translate total on the grammar") {
    val gen = for {
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECOND", "SECONDS", "MINUTE", "MINUTES", "HOUR",
        "HOURS", "seconds", "minutes", "hours")
      a <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      b <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      tbl <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      key <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      neg <- Gen.oneOf(true, false)
      quoted <- Gen.oneOf(true, false)
      semi <- Gen.oneOf("", ";", " ; ")
      kw <- Gen.oneOf("MATCH PATTERN", "match pattern", "Match  Pattern")
    } yield {
      def ev(e: String) = if (quoted) s"'$e'" else e
      val thenKw = if (neg) "THEN NOT" else "THEN"
      (neg, s"SELECT * FROM $tbl $kw (${ev(a)} $thenKw ${ev(b)} " +
        s"WITHIN '$n' $unit) PARTITION BY $key$semi")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (neg, q) =>
        val t = CepSql.translate(q)
        // rewrites to plain Spark SQL: dialect keyword gone, the right
        // formulation chosen, exactly one INTERVAL injected
        assert(!t.toUpperCase.contains("MATCH"), s"$q ->\n$t")
        assert(t.toUpperCase.contains("LEFT ANTI JOIN") === neg, s"$q ->\n$t")
        assert(t.toUpperCase.contains("ROW_NUMBER") === !neg, s"$q ->\n$t")
        val iv = t.toUpperCase.indexOf("INTERVAL")
        assert(iv >= 0 && iv == t.toUpperCase.lastIndexOf("INTERVAL"), t)
      }
    }
  }

  test("generated N-step chains translate total on the grammar (r6)") {
    val gen = for {
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS", "minutes")
      k <- Gen.choose(3, 5) // chain length (2-step covered above)
      evs <- Gen.listOfN(k, Gen.identifier.map(_.take(8))
        .suchThat(_.nonEmpty))
      tbl <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      key <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      neg <- Gen.oneOf(true, false)
    } yield {
      val chain = evs.init.mkString(" THEN ") +
        (if (neg) s" THEN NOT ${evs.last}" else s" THEN ${evs.last}")
      (neg, evs.length,
        s"SELECT * FROM $tbl MATCH PATTERN ($chain " +
          s"WITHIN '$n' $unit) PARTITION BY $key")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (neg, k, q) =>
        val t = CepSql.translate(q)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$q ->\n$t")
        assert(t.toUpperCase.contains("LEFT ANTI JOIN") === neg, s"$q ->\n$t")
        // one rank-1 join per non-anchor chained step
        val chained = if (neg) k - 2 else k - 1
        val rn = "ROW_NUMBER".r.findAllIn(t.toUpperCase).length
        assert(rn === chained, s"$q ->\n$t")
        // the final projection carries id_1..id_N for the matched chain
        val np = if (neg) k - 1 else k
        assert(t.contains(s"id_$np") && !t.contains(s"id_${np + 1}"), t)
      }
    }
  }

  test("generated quantified-run patterns translate total (r6)") {
    val gen = for {
      mt <- Gen.choose(1, 99)
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS")
      a <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      b <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      tbl <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      key <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      neg <- Gen.oneOf(true, false)
    } yield {
      val thenKw = if (neg) "THEN NOT" else "THEN"
      (neg, mt, s"SELECT * FROM $tbl MATCH PATTERN ($a{$mt,} $thenKw $b " +
        s"WITHIN '$n' $unit) PARTITION BY $key")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (neg, mt, q) =>
        val t = CepSql.translate(q)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$q ->\n$t")
        // runs formulation: gaps-and-islands (2 row_numbers) + HAVING
        assert("ROW_NUMBER".r.findAllIn(t.toUpperCase).length === 2, t)
        assert(t.contains(s">= $mt"), t)
        assert(t.toUpperCase.contains("LEFT ANTI JOIN") === neg, t)
      }
    }
  }

  test("generated 3-way PERMUTE patterns translate total (r9)") {
    val gen = for {
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS")
      a <- Gen.identifier.map("a" + _.take(6))
      b <- Gen.identifier.map("b" + _.take(6))
      c <- Gen.identifier.map("c" + _.take(6))
      tbl <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      key <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    } yield (a, b, c,
      s"SELECT * FROM $tbl MATCH PATTERN (PERMUTE($a, $b, $c) " +
        s"WITHIN '$n' $unit) PARTITION BY $key")
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (a, b, c, q) =>
        val t = CepSql.translate(q)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$q ->\n$t")
        // 6 CTE'd rank-1 chains, each with 2 row_numbers, plus ONE
        // listed-order preference window over the tagged arm union
        // (r14: replaced the 3 NOT-IN anti joins, which re-executed
        // each first-preference chain subquery)
        assert("ROW_NUMBER".r.findAllIn(t.toUpperCase).length === 13, t)
        assert(!t.toUpperCase.contains("NOT IN"), t)
        assert(t.contains("PARTITION BY id_1"), t)
        Seq(a, b, c).foreach(e =>
          assert(t.contains(s"'$e' AS first_ev"), s"$e missing: $t"))
      }
    }
    // duplicates and 4-way stay loud at parse
    intercept[IllegalArgumentException](CepSql.parsePattern(
      "SELECT * FROM t MATCH PATTERN (PERMUTE(x, y, x) WITHIN '5' " +
        "MINUTES) PARTITION BY k"))
    intercept[IllegalArgumentException](CepSql.parsePattern(
      "SELECT * FROM t MATCH PATTERN (PERMUTE(w, x, y, z) WITHIN '5' " +
        "MINUTES) PARTITION BY k"))
  }

  test("generated RELUCTANT quantifier patterns translate total (r8)") {
    // `{m,}?` on head / mid / tail positions: always a lazy-truncation
    // runs subquery (FILTER (WHERE __rn <= m)), never parsed as an
    // optional step, bounded lazy forms always rejected
    val gen = for {
      mt <- Gen.choose(2, 99)
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS")
      evs <- Gen.listOfN(3, Gen.identifier.map(_.take(8))
        .suchThat(_.nonEmpty))
      tbl <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      key <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      pos <- Gen.choose(0, 2)
    } yield {
      val steps = evs.zipWithIndex.map { case (ev, i) =>
        if (i == pos) s"$ev{$mt,}?" else ev }
      (mt, s"SELECT * FROM $tbl MATCH PATTERN (${steps.mkString(" THEN ")} " +
        s"WITHIN '$n' $unit) PARTITION BY $key")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (mt, q) =>
        val spec = CepSql.parsePattern(q)
        assert(spec.steps.count(_.reluctant) === 1, q)
        assert(!spec.steps.exists(_.optional), q)
        val t = CepSql.translate(q)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$q ->\n$t")
        assert(t.contains(s"FILTER (WHERE __rn <= $mt)"), s"$q ->\n$t")
        assert(t.contains(s"CAST($mt AS BIGINT) AS run_len"), t)
        // bounded lazy forms of the same text are rejected
        val bad = q.replace(s"{$mt,}?", s"{$mt,${mt + 1}}?")
        intercept[IllegalArgumentException](CepSql.parsePattern(bad))
        val bad2 = q.replace(s"{$mt,}?", s"{$mt}?")
        intercept[IllegalArgumentException](CepSql.parsePattern(bad2))
      }
    }
  }

  test("generated alternation/mid-quantifier/skip patterns translate total (r7)") {
    val ident = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    val gen = for {
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS")
      k <- Gen.choose(2, 4)
      steps <- Gen.listOfN(k, for {
        nAlt <- Gen.choose(1, 3)
        evs <- Gen.listOfN(nAlt, ident)
        mt <- Gen.option(Gen.choose(1, 99))
        // quantifier form (r7): 0 = {m,}, 1 = {m,n}, 2 = {m}
        form <- Gen.choose(0, 2)
        span <- Gen.choose(0, 50)
      } yield (evs.distinct, mt,
        mt.flatMap(m => form match {
          case 0 => None
          case 1 => Some(m + span)
          case _ => Some(m)
        }), form))
      tbl <- ident
      key <- ident
      quantified = steps.exists(_._2.isDefined)
      // a mid-chain optional step (r7): only on quantifier-free chains of
      // length >= 3, never first/last — the validated grammar shape
      optIdx <- if (k >= 3 && !quantified) Gen.option(Gen.choose(1, k - 2))
                else Gen.const(None: Option[Int])
      skip <- if (quantified || optIdx.isDefined) Gen.const(false)
              else Gen.oneOf(true, false)
    } yield {
      val stepTxt = steps.zipWithIndex.map { case ((evs, mt, mx, form), i) =>
        evs.mkString("|") + mt.map { m =>
          form match {
            case 0 => s"{$m,}"
            case 1 => s"{$m,${mx.get}}"
            case _ => s"{$m}"
          }
        }.getOrElse("") + (if (optIdx.contains(i)) "?" else "")
      }.mkString(" THEN ")
      val skipTxt = if (skip) " AFTER MATCH SKIP PAST LAST ROW" else ""
      (steps, skip, optIdx,
        s"SELECT * FROM $tbl MATCH PATTERN ($stepTxt WITHIN '$n' $unit) " +
          s"PARTITION BY $key$skipTxt")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (steps, skip, optIdx, q) =>
        val t = CepSql.translate(q)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$q ->\n$t")
        assert(t.toUpperCase.contains("WITH RECURSIVE") === skip, s"$q ->\n$t")
        // an optional step surfaces as the composite pivot's branch union
        assert(t.toUpperCase.contains("UNION ALL") === optIdx.isDefined,
          s"$q ->\n$t")
        // every multi-event step widens to an IN (...) type predicate
        steps.filter(_._1.size > 1).foreach { case (evs, _, _, _) =>
          assert(t.contains(evs.map(e => s"'$e'").mkString("(", ", ", ")")),
            s"$q ->\n$t")
        }
        // every quantifier surfaces as a HAVING >= bound; a bounded one
        // (r7 {m,n} / {m}) also as the <= cap
        steps.foreach { case (_, mt, mx, _) =>
          mt.foreach(m => assert(t.contains(s">= $m"), s"$q ->\n$t"))
          mx.foreach(x => assert(t.contains(s"<= $x"), s"$q ->\n$t"))
        }
      }
    }
  }

  test("generated optional/absence combinations translate total (r8)") {
    // the r8 grammar corner: an optional step inside an absence
    // pattern's prefix (never directly before the NOT step — the
    // validated shape). The translation must be total: absence → the
    // anti join, optional → the composite pivot's branch union, both
    // together → both.
    val ident = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    val gen = for {
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS")
      k <- Gen.choose(3, 5)
      evs <- Gen.listOfN(k, ident)
      absent <- Gen.oneOf(true, false)
      optIdx <- {
        val hi = if (absent) k - 3 else k - 2
        if (hi >= 1) Gen.option(Gen.choose(1, hi))
        else Gen.const(None: Option[Int])
      }
    } yield {
      val body = evs.zipWithIndex.map { case (e, i) =>
        e + (if (optIdx.contains(i)) "?" else "")
      }
      val stepTxt = body.init.mkString(" THEN ") +
        (if (absent) " THEN NOT " else " THEN ") + body.last
      (absent, optIdx,
        s"SELECT * FROM t MATCH PATTERN ($stepTxt WITHIN '$n' $unit) " +
          "PARTITION BY k")
    }
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (absent, optIdx, q) =>
        val t = CepSql.translate(q)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$q ->\n$t")
        assert(t.toUpperCase.contains("ANTI JOIN") === absent,
          s"$q ->\n$t")
        assert(t.toUpperCase.contains("UNION ALL") === optIdx.isDefined,
          s"$q ->\n$t")
      }
    }
  }

  test("generated FIRST/LAST boundary-ref measures translate total (r8)") {
    // FIRST|LAST(ev.col) on the quantified step of a 2-step chain:
    // always parses to a BoundRef on that step, translates without
    // MATCH PATTERN remnants, and the same measure on the UNQUANTIFIED
    // step is always rejected with the ev.col pointer
    val gen = for {
      mt <- Gen.choose(2, 9)
      n <- Gen.choose(1, 9999)
      unit <- Gen.oneOf("SECONDS", "MINUTES", "HOURS")
      a <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      b <- Gen.identifier.map(_.take(8)).suchThat(s => s.nonEmpty && s != "zz")
      tbl <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      key <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
      fn <- Gen.oneOf("FIRST", "LAST")
      mcol <- Gen.oneOf("ts", "value", "event_id")
    } yield (fn, mcol,
      s"SELECT * FROM $tbl MATCH PATTERN ($a{$mt,} THEN zz_$b " +
        s"WITHIN '$n' $unit) PARTITION BY $key " +
        s"MEASURES $fn($a.$mcol) AS bref",
      s"SELECT * FROM $tbl MATCH PATTERN ($a{$mt,} THEN zz_$b " +
        s"WITHIN '$n' $unit) PARTITION BY $key " +
        s"MEASURES $fn(zz_$b.$mcol) AS bref")
    (1L to 300L).foreach { seed =>
      sample(gen.map(List(_)), seed).foreach { case (fn, mcol, ok, bad) =>
        val spec = CepSql.parsePattern(ok)
        spec.measures match {
          case Seq(CepSql.BoundRef(f, _, c, st, al)) =>
            assert(f == fn && c == mcol && st == 1 && al == "bref", ok)
          case other => fail(s"expected one BoundRef, got $other: $ok")
        }
        val t = CepSql.translate(ok)
        assert(!t.toUpperCase.contains("MATCH PATTERN"), s"$ok ->\n$t")
        assert(t.contains("AS `bref`"), t)
        val e = intercept[IllegalArgumentException](CepSql.parsePattern(bad))
        assert(e.getMessage.contains("not") &&
          e.getMessage.contains("quantified"), bad)
      }
    }
  }

  test("near-miss MATCH PATTERN text is rejected, never half-translated") {
    val bads = Seq(
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES)",
      "SELECT x FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k",
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN 5 MINUTES) " +
        "PARTITION BY k", // unquoted width
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' DAYS) " +
        "PARTITION BY k", // unsupported unit
      "SELECT * FROM t MATCH PATTERN (a THEN NOT b{2,} WITHIN '5' " +
        "MINUTES) PARTITION BY k", // a NOT step cannot be quantified (r7)
      "SELECT * FROM t MATCH PATTERN (a{2,} THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k AFTER MATCH SKIP PAST LAST ROW", // skip+quantifier
      "SELECT * FROM t MATCH PATTERN (a THEN NOT b WITHIN '5' MINUTES) " +
        "PARTITION BY k AFTER MATCH SKIP PAST LAST ROW", // skip+absence
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k AFTER MATCH SKIP HALF WAY", // bad skip mode
      "SELECT * FROM t MATCH PATTERN (a THEN b(value >) WITHIN '5' " +
        "MINUTES) PARTITION BY k", // incomplete condition (r7)
      "SELECT * FROM t MATCH PATTERN (a THEN b(value > 1 OR 1=1) " +
        "WITHIN '5' MINUTES) PARTITION BY k", // compound condition (r7)
      "SELECT * FROM t MATCH PATTERN (a THEN b(value > x) WITHIN '5' " +
        "MINUTES) PARTITION BY k", // non-numeric bound (r7)
      "SELECT * FROM t MATCH PATTERN (a{0,} THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k", // zero minimum
      "SELECT * FROM t MATCH PATTERN (a{3,2} THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k", // bounded quantifier with max < min (r7)
      "SELECT * FROM t MATCH PATTERN (a{2,x} THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k", // non-numeric quantifier bound (r7)
      "SELECT * FROM t MATCH PATTERN (a{,3} THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k", // missing quantifier minimum (r7)
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN " +
        "'99999999999999999999' SECONDS) PARTITION BY k", // numeral > Long
      "SELECT * FROM t MATCH PATTERN (a THEN NOT b THEN c WITHIN '5' " +
        "MINUTES) PARTITION BY k", // NOT off the final step
      "SELECT * FROM t MATCH PATTERN (NOT a THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k", // NOT on the first step
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k GROUP BY k", // trailing clause
      "SELECT * FROM t MATCH PATTERN (PERMUTE(a, b) WITHIN '5' MINUTES) " +
        "PARTITION BY k MEASURES COUNT(*)", // permute takes no measure (r7)
      "SELECT * FROM t MATCH PATTERN (PERMUTE(a|c, b) WITHIN '5' " +
        "MINUTES) PARTITION BY k", // permute takes plain events only (r7)
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k MEASURES MEDIAN(value)", // unsupported measure fn
      "SELECT * FROM t MATCH PATTERN (a THEN b WITHIN '5' MINUTES) " +
        "PARTITION BY k MEASURES SUM(value) MEASURES COUNT(*)") // two measures
    bads.foreach { q =>
      intercept[IllegalArgumentException](CepSql.translate(q))
    }
    // in-literal keyword is data and must return the SAME instance
    val lit = "SELECT 'MATCH PATTERN (a THEN b)' AS s FROM t"
    assert(CepSql.translate(lit) eq lit)
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

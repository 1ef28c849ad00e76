package graft.dsq

import org.scalatest.funsuite.AnyFunSuite

/** Unit + property tests for the SQLite→Spark dialect translator. */
class DialectSpec extends AnyFunSuite {

  test("table ref macros") {
    val (q, refs) = Dialect.extractTableRefs(
      """select * from {} join {1} on a=b join {0, "x.y"} join {'p'}""")
    assert(refs == Seq(
      Dialect.TableRef(0, None), Dialect.TableRef(1, None),
      Dialect.TableRef(0, Some("x.y")), Dialect.TableRef(0, Some("p"))))
    assert(q.contains("from t_0 join t_1"))
  }

  test("double quotes: known column → backticks, unknown → string literal") {
    val t = Dialect.translate("""SELECT "a b", "nope" FROM t_0""", Set("a b"))
    assert(t == "SELECT `a b`, 'nope' FROM t_0")
  }

  test("REGEXP becomes RLIKE, only outside quotes") {
    val t = Dialect.translate(
      """SELECT 'x REGEXP y' FROM t_0 WHERE a REGEXP 'p'""", Set("a"))
    assert(t == "SELECT 'x REGEXP y' FROM t_0 WHERE a RLIKE 'p'")
  }

  test("arrow operators: -> fragment UDF, ->> raw get_json_object") {
    assert(Dialect.translate("SELECT c->1 FROM t_0", Set("c"))
      == "SELECT dsq_json_frag(c, '$[1]') FROM t_0")
    assert(Dialect.translate("SELECT c->>'k' FROM t_0", Set("c"))
      == "SELECT get_json_object(c, '$.k') FROM t_0")
  }

  test("output labels: SQLite naming rules") {
    assert(Dialect.outputLabels("SELECT COUNT(*) FROM x")
      == Some(Seq("COUNT(*)")))
    assert(Dialect.outputLabels("SELECT COUNT(1) AS c FROM x")
      == Some(Seq("c")))
    assert(Dialect.outputLabels("SELECT url_host(r) host, count(1) count FROM x")
      == Some(Seq("host", "count")))
    assert(Dialect.outputLabels("""SELECT " Name " FROM x""")
      == Some(Seq(" Name ")))
    assert(Dialect.outputLabels("SELECT t.name, u.age FROM x")
      == Some(Seq("name", "age")))
    assert(Dialect.outputLabels("SELECT * FROM x") == None)
    assert(Dialect.outputLabels(
      "SELECT name, AVG(time) FROM x GROUP BY name")
      == Some(Seq("name", "AVG(time)")))
    // nested FROM in a subquery doesn't confuse the splitter
    assert(Dialect.outputLabels(
      "SELECT (SELECT max(y) FROM t2) m, a FROM t1")
      == Some(Seq("m", "a")))
  }

  test("translate is idempotent (seeded fuzz over SQL-ish fragments)") {
    val rnd = new scala.util.Random(42)
    val atoms = Seq("SELECT", "a", "b", "\"a\"", "\"zz\"", "'str''x'",
      "REGEXP", "->", "->>", "1", ",", "(", ")", "*", "FROM", "t_0",
      "WHERE", "||", ">", "c->2", "c ->> 'k'")
    (1 to 500).foreach { _ =>
      val q = Seq.fill(rnd.nextInt(12) + 1)(atoms(rnd.nextInt(atoms.length)))
        .mkString(" ")
      val cols = Set("a", "c")
      // fragments with operand-less arrows are rejected loudly (DsqError)
      // rather than passed through to Spark; idempotence applies to the
      // samples the dialect accepts
      try {
        val once = Dialect.translate(q, cols)
        val twice = Dialect.translate(once, cols)
        assert(twice == once, s"not idempotent for: $q\nonce:  $once\ntwice: $twice")
      } catch { case _: DsqError => () }
    }
  }

  test("arrow inside a string literal is untouched") {
    val q = "SELECT 'a->1' AS j FROM t_0"
    assert(Dialect.translate(q, Set.empty) == q)
  }

  test("chained arrows rewrite left-to-right") {
    assert(Dialect.translate("SELECT data->'a'->'b' FROM t_0", Set("data"))
      == "SELECT dsq_json_frag(dsq_json_frag(data, '$.a'), '$.b') FROM t_0")
    assert(Dialect.translate("SELECT data->'a'->>'b' FROM t_0", Set("data"))
      == "SELECT get_json_object(dsq_json_frag(data, '$.a'), '$.b') FROM t_0")
    // depth-3 chains need the balanced-paren left operand
    assert(Dialect.translate("SELECT data->'a'->'b'->'c' FROM t_0", Set("data"))
      == "SELECT dsq_json_frag(dsq_json_frag(dsq_json_frag(data, '$.a'), '$.b'), '$.c') FROM t_0")
  }

  test("Spark lambda arrows pass through untouched") {
    // right operand is not a literal → higher-order lambda, not JSON
    val q = "SELECT transform(a, x -> upper(x)) FROM t_0"
    assert(Dialect.translate(q, Set("a")) == q)
    val q2 = "SELECT aggregate(a, 0L, (acc, x) -> acc + x) FROM t_0"
    assert(Dialect.translate(q2, Set("a")) == q2)
  }

  test("lambda arrows with LITERAL bodies pass through untouched") {
    // single param in a higher-order function's argument list
    val q = "SELECT transform(a, x -> 0) FROM t_0"
    assert(Dialect.translate(q, Set("a")) == q)
    // parenthesized parameter tuple — never a valid scalar expression
    val q2 = "SELECT aggregate(a, 0, (acc, x) -> 1) FROM t_0"
    assert(Dialect.translate(q2, Set("a")) == q2)
    val q3 = "SELECT filter(a, x -> 'y') FROM t_0"
    assert(Dialect.translate(q3, Set("a")) == q3)
    // an earlier argument containing a freestanding string literal must
    // not hide the higher-order callee from the lambda detector (the
    // literal splits the rewrite segment; the walk crosses the boundary)
    val q4 = "SELECT transform(split(t, ','), x -> 0) FROM t_0"
    assert(Dialect.translate(q4, Set("t")) == q4)
    val q5 = "SELECT aggregate(split(t, ';'), 0, (acc, x) -> 1) FROM t_0"
    assert(Dialect.translate(q5, Set("t")) == q5)
    // a single parenthesized parameter is valid Spark lambda syntax
    val q6 = "SELECT transform(a, (x) -> 0) FROM t_0"
    assert(Dialect.translate(q6, Set("a")) == q6)
    // …but a JSON arrow nested in an ORDINARY call still rewrites
    assert(Dialect.translate("SELECT upper(c->>'k') FROM t_0", Set("c"))
      == "SELECT upper(get_json_object(c, '$.k')) FROM t_0")
    assert(Dialect.translate("SELECT coalesce(a, b->'x') FROM t_0",
      Set("a", "b"))
      == "SELECT coalesce(a, dsq_json_frag(b, '$.x')) FROM t_0")
  }

  test("arbitrary call left operands rewrite (SQLite allows any expr)") {
    assert(Dialect.translate("SELECT upper(c)->'k' FROM t_0", Set("c"))
      == "SELECT dsq_json_frag(upper(c), '$.k') FROM t_0")
    assert(Dialect.translate("SELECT (c)->>'k' FROM t_0", Set("c"))
      == "SELECT get_json_object((c), '$.k') FROM t_0")
  }

  test("over-deep arrow chains with literal keys still fail loudly") {
    // depth beyond the paren matcher; the residual '->' has a literal key
    val deep = "SELECT data" + (1 to 9).map(i => s"->'k$i'").mkString + " FROM t_0"
    assertThrows[DsqError](Dialect.translate(deep, Set("data")))
  }

  test("quoted identifiers resolve case-insensitively (SQLite semantics)") {
    assert(Dialect.translate("""SELECT "Name" FROM t_0""", Set("name"))
      == "SELECT `Name` FROM t_0")
  }

  test("string literals survive translation verbatim") {
    val q = "SELECT 'it''s a ''test'' REGEXP \"x\"' FROM t_0"
    assert(Dialect.translate(q, Set.empty) == q)
  }
}

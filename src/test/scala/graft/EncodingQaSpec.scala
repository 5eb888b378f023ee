package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** X220 encoding / mojibake QA: each corruption witness counted from a
  * hand-built string whose true counts are knowable by eye. */
class EncodingQaSpec extends SparkSpec {
  import spark.implicits._

  private def scan(s: String): Map[String, Long] = {
    val cols = TextAnalysis.encodingQaColumns(col("text"))
    Seq(Tuple1(s)).toDF("text")
      .select(cols.map { case (n, c) => c.as(n) }: _*)
      .collect().head.getValuesMap[Long](cols.map(_._1)).map(identity)
  }

  test("clean ASCII reads zero on every witness") {
    val m = scan("a plain ascii sentence, nothing else.")
    assert(m("n_replacement") == 0 && m("n_c1_controls") == 0 &&
      m("n_mojibake_digraphs") == 0 && m("n_non_ascii") == 0)
    assert(m("n_chars") == 37)
  }

  test("replacement chars, C1 controls, and mojibake digraphs count separately") {
    // 'café' UTF-8 read as latin-1 -> 'caf' + U+00C3 U+00A9 (one digraph,
    // two non-ASCII chars); U+2019 as latin-1 -> U+00E2 U+0080 U+0099
    // (one digraph; U+0080 and U+0099 are ALSO C1 controls); one U+FFFD;
    // one bare C1 NEL (U+0085)
    val s = "caf\u00C3\u00A9 x \u00E2\u0080\u0099 y \uFFFD z \u0085"
    val m = scan(s)
    assert(m("n_replacement") == 1, m.toString)
    assert(m("n_mojibake_digraphs") == 2, m.toString)
    assert(m("n_c1_controls") == 3, m.toString) // 0080, 0099, 0085
    assert(m("n_non_ascii") == 7, m.toString) // C3 A9 E2 80 99 FFFD 85
  }

  test("legitimately non-ASCII text is non-ASCII but NOT flagged as corrupt") {
    val m = scan("na\u00EFve r\u00E9sum\u00E9 \u00FCber") // ï é é ü
    assert(m("n_non_ascii") == 4)
    assert(m("n_replacement") == 0 && m("n_c1_controls") == 0 &&
      m("n_mojibake_digraphs") == 0)
  }

  test("the NBSP-class digraph (U+00C2 + latin-1 punct) counts as mojibake") {
    // UTF-8 NBSP (C2 A0) read as latin-1 -> U+00C2 U+00A0
    val m = scan("gap\u00C2\u00A0here")
    assert(m("n_mojibake_digraphs") == 1)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextNorm

class TextNormSpec extends AnyFunSuite {

  test("cell mode: accent strip, upper, space/newline to underscore, junk dropped") {
    assert(TextNorm.normalizeCell("Código do Item") == "CODIGO_DO_ITEM")
    assert(TextNorm.normalizeCell("  preço (R$) ") == "PRECO_R")
    assert(TextNorm.normalizeCell("a\nb") == "A_B")
  }

  test("header mode collapses whitespace runs, including Unicode NBSP") {
    assert(TextNorm.normalizeHeader("Código  do\n Item") == "CODIGO_DO_ITEM")
    // NBSP (u00A0) is whitespace in Python's re \s — must map to '_',
    // not silently disappear (ADVICE r1).
    assert(TextNorm.normalizeHeader("COD ITEM") == "COD_ITEM")
  }

  test("cell mode maps each space individually (two regimes are distinct)") {
    assert(TextNorm.normalizeCell("a  b") == "A__B")
    assert(TextNorm.normalizeHeader("a  b") == "A_B")
  }

  test("uppercasing is locale-independent") {
    val deflt = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // Turkish default locale would map 'i' -> dotted capital İ, which
      // the [^A-Z0-9_] filter would then strip.
      assert(TextNorm.normalizeCell("item") == "ITEM")
    } finally java.util.Locale.setDefault(deflt)
  }

  test("idempotence and ASCII closure (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(500) {
      val len = rnd.nextInt(30)
      (0 until len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar
          case 1 => "áéíóúçãõ ÀÂÊ"(rnd.nextInt(12))
          case 2 => " \t\n !@#$%"(rnd.nextInt(9))
          case 3 => ('0' + rnd.nextInt(10)).toChar
          case _ => ('A' + rnd.nextInt(26)).toChar
        }
      }.mkString
    }
    samples.foreach { s =>
      val once = TextNorm.normalizeCell(s)
      assert(TextNorm.normalizeCell(once) == once, s"cell not idempotent on ${s.toList}")
      assert(once.forall(c => c == '_' || c.isDigit || ('A' to 'Z').contains(c)))
      val h = TextNorm.normalizeHeader(s)
      assert(TextNorm.normalizeHeader(h) == h, s"header not idempotent on ${s.toList}")
    }
  }
}

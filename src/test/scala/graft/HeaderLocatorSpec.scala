package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.HeaderLocator

class HeaderLocatorSpec extends AnyFunSuite {

  test("locates first row containing all keywords, normalized") {
    val rows = Seq(
      Seq("SINAPI - Relatório", "", ""),
      Seq("", "", ""),
      Seq("Código do Insumo", "Descrição do Insumo", "Unidade"),
      Seq("1", "AREIA", "M3"))
    assert(HeaderLocator.locate(rows, Seq("CODIGO", "DESCRICAO", "UNIDADE")) == Some(2))
  }

  test("returns None when not found within the limit") {
    val rows = (0 until 30).map(i => Seq(s"junk $i"))
    assert(HeaderLocator.locate(rows :+ Seq("CODIGO", "DESCRICAO", "UNIDADE"),
      Seq("CODIGO", "DESCRICAO"), limit = 20).isEmpty)
  }

  test("normalizedColumns dedupes clashes positionally") {
    assert(HeaderLocator.normalizedColumns(Seq("Custo Total", "custo  total", "Código")) ==
      Seq("CUSTO_TOTAL", "CUSTO_TOTAL_1", "CODIGO"))
  }

  test("two-row header: UF clean + ffill + fuse") {
    val ufRow  = Seq("", "", "", "SP", "", "RJ", "x1")
    val subRow = Seq("Código da Composição", "Descrição", "Unidade",
      "Custo Total", "Outro", "Custo Total", "Custo Total")
    assert(HeaderLocator.fuseTwoRowHeader(ufRow, subRow) == Seq(
      "CODIGO_DA_COMPOSICAO", "DESCRICAO", "UNIDADE",
      "SP_CUSTO_TOTAL", "SP_OUTRO", "RJ_CUSTO_TOTAL", "RJ_CUSTO_TOTAL_1"))
  }
}

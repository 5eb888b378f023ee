package graft

import org.apache.spark.sql.functions._

import graft.ops.UnpivotUf

class UnpivotUfSpec extends SparkSpec {
  import spark.implicits._

  test("structural UF-column predicate: exactly 2 alphabetic chars") {
    assert(UnpivotUf.ufColumns(Seq("CODIGO", "SP", "RJ", "X1", "ABC", "mg")) ==
      Seq("SP", "RJ", "mg"))
  }

  test("melt row-count invariant: rows_out = rows_in x |UF| - nulls; comma decimals parsed") {
    val df = Seq(
      ("1", "120,50", "130,00"),
      ("2", "0,89", null),
      ("3", "oops", "1,00")).toDF("CODIGO", "SP", "RJ")
    val out = UnpivotUf.unpivot(df, Seq("CODIGO"), "preco_mediano")
    // 3 rows x 2 UFs - 1 null = 5; "oops" is kept as a null value
    // (coerce-don't-fail), not dropped.
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("CODIGO", "uf", "preco_mediano"))
    val sp1 = out.filter($"CODIGO" === "1" && $"uf" === "SP")
      .select("preco_mediano").as[BigDecimal].head()
    assert(sp1 == BigDecimal("120.50").setScale(6))
    assert(out.filter($"CODIGO" === "3" && $"uf" === "SP")
      .select("preco_mediano").head().isNullAt(0))
  }

  test("empty UF set returns empty frame with the right schema, not an error") {
    val df = Seq(("1", "x")).toDF("CODIGO", "DESCRICAO")
    val out = UnpivotUf.unpivot(df, Seq("CODIGO"), "preco_mediano")
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("CODIGO", "uf", "preco_mediano"))
  }

  test("fused cost columns: marker + 2-letter prefix selection (U2)") {
    val df = Seq((100, "a", "1234,56", "x", "2000,00"))
      .toDF("CODIGO", "DESCRICAO", "SP_CUSTO_TOTAL", "SP_OUTRO", "RJ_CUSTO_TOTAL")
    val out = UnpivotUf.unpivotFused(df, Seq("CODIGO"), "custo_total")
    assert(out.select("uf").as[String].collect().sorted.toSeq == Seq("RJ", "SP"))
    assert(out.filter($"uf" === "SP").select("custo_total").as[BigDecimal].head() ==
      BigDecimal("1234.56").setScale(6))
  }
}

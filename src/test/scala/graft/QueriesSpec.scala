package graft

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.query.Queries
import graft.store.TableStore

/** The documented downstream query surface (SURVEY §3 E3 — the
  * reference's REST patterns, docs/DataModel.md:372-401) against a tiny
  * hand-built warehouse:
  *   composition 100 = 2.5 × insumo 1 + 1.0 × composition 200
  *   composition 200 = 3.0 × insumo 2
  */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)
  private val jan = d("2025-01-01")

  private def warehouse(): TableStore = {
    val store = new TableStore(spark, tmpDir("graft_q_wh"))
    store.overwrite("composicoes",
      Seq((100, "ALVENARIA", "M2", null: String, "ATIVO"),
        (200, "CHAPISCO", "M2", null: String, "DESATIVADO"))
        .toDF("codigo", "descricao", "unidade", "grupo", "status"))
    store.overwrite("composicao_insumos",
      Seq((100, 1, BigDecimal("2.5")), (200, 2, BigDecimal("3.0")))
        .toDF("composicao_pai_codigo", "insumo_filho_codigo", "coeficiente"))
    store.overwrite("composicao_subcomposicoes",
      Seq((100, 200, BigDecimal("1.0")))
        .toDF("composicao_pai_codigo", "composicao_filho_codigo", "coeficiente"))
    store.overwrite("custos_composicoes_mensal",
      Seq((100, "SP", jan, "NAO_DESONERADO", BigDecimal("1234.56")))
        .toDF("composicao_codigo", "uf", "data_referencia", "regime", "custo_total"))
    store.overwrite("precos_insumos_mensal",
      Seq((1, "SP", jan, "NAO_DESONERADO", BigDecimal("10.00")),
        (2, "SP", jan, "NAO_DESONERADO", BigDecimal("4.00")))
        .toDF("insumo_codigo", "uf", "data_referencia", "regime", "preco_mediano"))
    store.overwrite("manutencoes_historico",
      Seq((1, "INSUMO", d("2025-02-01"), "DESATIVAÇÃO", "x"),
        (1, "INSUMO", d("2025-01-01"), "ALTERAÇÃO", "x"))
        .toDF("item_codigo", "tipo_item", "data_referencia", "tipo_manutencao", "descricao_item"))
    store
  }

  test("cost point lookup with status join") {
    val store = warehouse()
    val row = Queries.custoComposicao(store, 100, "SP", jan, "NAO_DESONERADO").head()
    assert(row.getAs[java.math.BigDecimal]("custo_total").doubleValue() == 1234.56)
    assert(row.getAs[String]("status") == "ATIVO")
  }

  test("recursive structure explosion over both edge tables") {
    val store = warehouse()
    val out = Queries.estrutura(store, 100)
      .select(col("node"), col("eff_coeff").cast("double"))
      .as[(Int, Double)].collect().toMap
    // direct: insumo 1 @2.5, sub 200 @1.0; transitive: insumo 2 @ 1.0*3.0
    assert(out == Map(1 -> 2.5, 200 -> 1.0, 2 -> 3.0))
  }

  test("rolled-up cost = sum over exploded leaves x prices") {
    val store = warehouse()
    val total = Queries.custoRolledUp(store, 100, "SP", jan, "NAO_DESONERADO")
      .select(col("custo_total").cast("double")).as[Double].head()
    // 2.5*10.00 + 3.0*4.00 = 37.00 (node 200 has no insumo price row)
    assert(total == 37.0)
  }

  test("ad-hoc SQL surface: spark.sql over registered views (S14)") {
    val store = warehouse()
    graft.query.Views.registerAll(store)
    // the documented history-scan SQL shape (docs/DataModel.md:393-401)
    val hist = spark.sql(
      """SELECT data_referencia, tipo_manutencao FROM manutencoes_historico
        |WHERE item_codigo = 1 AND tipo_item = 'INSUMO'
        |ORDER BY data_referencia DESC""".stripMargin)
      .collect().map(_.getString(1)).toSeq
    assert(hist == Seq("DESATIVAÇÃO", "ALTERAÇÃO"))
    // point cost lookup with status join, as SQL
    val cost = spark.sql(
      """SELECT c.custo_total, d.status FROM custos_composicoes_mensal c
        |JOIN composicoes d ON d.codigo = c.composicao_codigo
        |WHERE c.composicao_codigo = 100 AND c.uf = 'SP'
        |  AND c.data_referencia = DATE'2025-01-01' AND c.regime = 'NAO_DESONERADO'""".stripMargin)
      .head()
    assert(cost.getDecimal(0).doubleValue() == 1234.56 && cost.getString(1) == "ATIVO")
    // unified view with discriminator
    assert(spark.sql(
      "SELECT count(*) FROM vw_composicao_itens_unificados WHERE tipo_item = 'INSUMO'")
      .head().getLong(0) == 2L)
  }

  test("recursive-CTE front door: the documented WITH RECURSIVE SQL runs at the S14 surface") {
    val store = warehouse()
    graft.query.Views.registerAll(store)
    // the documented recursive shape (docs/DataModel.md:386-391) typed
    // at the SQL surface. Note the casts: a recursive CTE's step output
    // must type-match its anchor EXACTLY (decimal multiplication widens
    // precision every iteration, which can't converge), same rule as PG.
    val out = spark.sql(
      """WITH RECURSIVE estrutura AS (
        |  SELECT item_filho_codigo, tipo_item,
        |         CAST(coeficiente AS double) AS coef_total
        |  FROM vw_composicao_itens_unificados
        |  WHERE composicao_pai_codigo = 100
        |  UNION ALL
        |  SELECT v.item_filho_codigo, v.tipo_item,
        |         CAST(e.coef_total * v.coeficiente AS double)
        |  FROM estrutura e
        |  JOIN vw_composicao_itens_unificados v
        |    ON v.composicao_pai_codigo = e.item_filho_codigo
        |  WHERE e.tipo_item = 'COMPOSICAO'
        |)
        |SELECT item_filho_codigo, CAST(sum(coef_total) AS double) AS eff_coeff
        |FROM estrutura GROUP BY item_filho_codigo""".stripMargin)
      .as[(Int, Double)].collect().toMap
    assert(out == Map(1 -> 2.5, 200 -> 1.0, 2 -> 3.0))
    // and it agrees with the programmatic TreeExplode path
    val prog = Queries.estrutura(store, 100)
      .select(col("node"), col("eff_coeff").cast("double"))
      .as[(Int, Double)].collect().toMap
    assert(out == prog)
  }

  test("item history: filtered scan, newest first") {
    val store = warehouse()
    val out = Queries.historico(store, 1, Schemas.ItemType.Insumo)
      .select(col("data_referencia").cast("string"), col("tipo_manutencao"))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("2025-02-01", "DESATIVAÇÃO"), ("2025-01-01", "ALTERAÇÃO")))
  }
}

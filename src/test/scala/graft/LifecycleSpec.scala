package graft

import graft.model.Schemas
import graft.ops.Lifecycle

class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("deactivation match is accent-SENSITIVE like PG ILIKE (SURVEY §7.4)") {
    val catalog = Seq((1, "A", "ATIVO"), (2, "B", "ATIVO"), (3, "C", "ATIVO"))
      .toDF("codigo", "descricao", "status")
    def d(s: String) = java.sql.Date.valueOf(s)
    val manut = Seq(
      // accented keyword -> matches
      (1, "INSUMO", d("2025-02-01"), "DESATIVAÇÃO DO INSUMO"),
      // unaccented spelling -> must NOT match (PG ILIKE '%DESATIVAÇÃO%'
      // does not strip accents; two normalization regimes, kept distinct)
      (2, "INSUMO", d("2025-02-01"), "DESATIVACAO DO INSUMO"),
      // older deactivation superseded by a later non-deactivation event
      (3, "INSUMO", d("2025-01-01"), "DESATIVAÇÃO"),
      (3, "INSUMO", d("2025-02-01"), "ALTERAÇÃO DE PREÇO"))
      .toDF("item_codigo", "tipo_item", "data_referencia", "tipo_manutencao")
    val out = Lifecycle.syncStatus(catalog, manut, Schemas.ItemType.Insumo, "DESATIVAÇÃO")
      .select("codigo", "status").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "DESATIVADO", 2 -> "ATIVO", 3 -> "ATIVO"))
  }
}

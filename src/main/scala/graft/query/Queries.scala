package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.TreeExplode
import graft.store.TableStore

/** The documented downstream query surface
  * (`/root/reference/docs/DataModel.md:372-401`, SURVEY §3 E3) as Spark
  * programs over the warehouse. Physical notes: catalogs are
  * dimension-sized → broadcast; facts are month/uf-keyed → lookups prune
  * to single partitions once the table is laid out by `data_referencia`.
  */
object Queries {

  /** GET /custo_composicao — point lookup with optional status join
    * (`docs/DataModel.md:376-384`). */
  def custoComposicao(store: TableStore, codigo: Int, uf: String,
                      dataRef: java.sql.Date, regime: String,
                      checkStatus: Boolean = true): DataFrame = {
    val custos = store.read("custos_composicoes_mensal")
      .filter(col("composicao_codigo") === codigo && col("uf") === uf &&
        col("data_referencia") === dataRef && col("regime") === regime)
    if (!checkStatus) custos
    else custos.join(
      broadcast(store.read("composicoes").select(col("codigo"), col("status"))),
      custos("composicao_codigo") === col("codigo"), "left").drop("codigo")
  }

  /** GET /composicao/{codigo}/estrutura — recursive explosion of the
    * composition tree over the unified edge view
    * (`docs/DataModel.md:386-391`), via the iterative-BFS TreeExplode. */
  def estrutura(store: TableStore, codigo: Int): DataFrame = {
    val ins = store.read("composicao_insumos").select(
      col("composicao_pai_codigo").as("parent"),
      col("insumo_filho_codigo").as("child"), col("coeficiente").as("coeff"))
    val subs = store.read("composicao_subcomposicoes").select(
      col("composicao_pai_codigo").as("parent"),
      col("composicao_filho_codigo").as("child"), col("coeficiente").as("coeff"))
    val roots = ins.sparkSession.range(1).select(lit(codigo).as("root"))
    TreeExplode.explode(ins.unionByName(subs), roots)
  }

  /** Rolled-up composition cost: explode to leaves, join insumo prices,
    * sum effective-coefficient × price (SURVEY §2.4 note + §7.4). */
  def custoRolledUp(store: TableStore, codigo: Int, uf: String,
                    dataRef: java.sql.Date, regime: String): DataFrame = {
    val tree = estrutura(store, codigo)
    val prices = store.read("precos_insumos_mensal")
      .filter(col("uf") === uf && col("data_referencia") === dataRef &&
        col("regime") === regime)
      .select(col("insumo_codigo"), col("preco_mediano"))
    tree.join(prices, tree("node") === prices("insumo_codigo"))
      .agg(sum((col("eff_coeff") * col("preco_mediano")).cast(Schemas.money))
        .as("custo_total"))
  }

  /** GET /insumo/{codigo}/historico — filtered ordered scan of the
    * immutable maintenance log (`docs/DataModel.md:393-401`). */
  def historico(store: TableStore, codigo: Int, tipoItem: String): DataFrame =
    store.read("manutencoes_historico")
      .filter(col("item_codigo") === codigo && col("tipo_item") === tipoItem)
      .orderBy(col("data_referencia").desc)
}

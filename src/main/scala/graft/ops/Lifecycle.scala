package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Catalog-lifecycle programs: placeholder repair (SURVEY §2.3 J1-J3,
  * `etl_pipeline.py:287-338`) and status synchronization from the
  * maintenance log (§2.5 W1 + §2.3 J4, `etl_pipeline.py:399-423`).
  */
object Lifecycle {

  /** J1/J2: codes referenced by `edges(childCol)` but absent from
    * `catalog(codigo)`. Anti-join, never driver-side set algebra — the
    * catalog side is broadcast when small. */
  def missingCodes(edges: DataFrame, childCol: String, catalog: DataFrame): DataFrame =
    edges.select(col(childCol).as("codigo")).distinct()
      .join(broadcast(catalog.select("codigo")), Seq("codigo"), "left_anti")

  /** J3: placeholder rows for missing codes, enriched from `details`
    * (codigo, descricao, unidade) with template fallbacks
    * (`etl_pipeline.py:300-336`, templates `config.py:37-39`). */
  def placeholderRows(missing: DataFrame, details: DataFrame,
                      descTemplate: String, defaultUnit: String): DataFrame =
    missing.join(details, Seq("codigo"), "left")
      .select(
        col("codigo"),
        coalesce(col("descricao"),
          concat(lit(descTemplate), col("codigo").cast("string"))).as("descricao"),
        coalesce(col("unidade"), lit(defaultUnit)).as("unidade"))

  /** W1 + J4: deactivation sync. The latest maintenance event per
    * (item_codigo) of the given tipo decides the status: if its
    * tipo_manutencao contains the (accent-sensitive, reference ILIKE
    * semantics) deactivation keyword, the catalog row flips to
    * DESATIVADO; otherwise the current status stands.
    */
  def syncStatus(catalog: DataFrame, manutencoes: DataFrame, tipoItem: String,
                 deactivationKeyword: String): DataFrame = {
    val latest = Relational.latestPerKey(
        manutencoes.filter(col("tipo_item") === tipoItem),
        Seq("item_codigo"),
        Seq(col("data_referencia").desc, col("tipo_manutencao").desc))
      .filter(upper(col("tipo_manutencao"))
        .contains(deactivationKeyword.toUpperCase(java.util.Locale.ROOT)))
      .select(col("item_codigo").as("codigo"), lit(true).as("__deactivate"))
    catalog.join(broadcast(latest), Seq("codigo"), "left")
      .withColumn("status",
        when(col("__deactivate"), Schemas.Status.Desativado)
          .otherwise(coalesce(col("status"), lit(Schemas.Status.Ativo))))
      .drop("__deactivate")
  }
}

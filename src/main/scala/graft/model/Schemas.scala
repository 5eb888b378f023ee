package graft.model

import org.apache.spark.sql.types._

/** Target warehouse schema of the engine — the 7 tables + union view of
  * the reference (`/root/reference/autosinapi/core/database.py:96-133`,
  * `/root/reference/docs/DataModel.md:26-132`), as Spark StructTypes.
  *
  * Money/coefficients are DECIMAL(18,6): exact like PostgreSQL NUMERIC,
  * and decimal aggregation is order-independent under Spark's parallel
  * partial aggregation (doubles would not be).
  */
object Schemas {

  /** Regime domain, assigned from the sheet name via SHEET_MAP
    * (`config.py:53-57`, applied `processor.py:486`). */
  object Regime {
    val NaoDesonerado = "NAO_DESONERADO"
    val Desonerado    = "DESONERADO"
    val SemEncargos   = "SEM_ENCARGOS"
    val all: Seq[String] = Seq(NaoDesonerado, Desonerado, SemEncargos)
  }

  object ItemType {
    val Insumo     = "INSUMO"
    val Composicao = "COMPOSICAO"
  }

  /** Lifecycle status (`docs/DataModel.md:26-44`). */
  object Status {
    val Ativo      = "ATIVO"
    val Desativado = "DESATIVADO"
  }

  val money: DecimalType = DecimalType(18, 6)

  val insumos: StructType = StructType(Seq(
    StructField("codigo", IntegerType, nullable = false),
    StructField("descricao", StringType, nullable = false),
    StructField("unidade", StringType),
    StructField("classificacao", StringType),
    StructField("status", StringType)))

  val composicoes: StructType = StructType(Seq(
    StructField("codigo", IntegerType, nullable = false),
    StructField("descricao", StringType, nullable = false),
    StructField("unidade", StringType),
    StructField("grupo", StringType),
    StructField("status", StringType)))

  val precosInsumosMensal: StructType = StructType(Seq(
    StructField("insumo_codigo", IntegerType, nullable = false),
    StructField("uf", StringType, nullable = false),
    StructField("data_referencia", DateType, nullable = false),
    StructField("regime", StringType, nullable = false),
    StructField("preco_mediano", money)))

  val custosComposicoesMensal: StructType = StructType(Seq(
    StructField("composicao_codigo", IntegerType, nullable = false),
    StructField("uf", StringType, nullable = false),
    StructField("data_referencia", DateType, nullable = false),
    StructField("regime", StringType, nullable = false),
    StructField("custo_total", money)))

  val composicaoInsumos: StructType = StructType(Seq(
    StructField("composicao_pai_codigo", IntegerType, nullable = false),
    StructField("insumo_filho_codigo", IntegerType, nullable = false),
    StructField("coeficiente", money)))

  val composicaoSubcomposicoes: StructType = StructType(Seq(
    StructField("composicao_pai_codigo", IntegerType, nullable = false),
    StructField("composicao_filho_codigo", IntegerType, nullable = false),
    StructField("coeficiente", money)))

  val manutencoesHistorico: StructType = StructType(Seq(
    StructField("item_codigo", IntegerType, nullable = false),
    StructField("tipo_item", StringType, nullable = false),
    StructField("data_referencia", DateType, nullable = false),
    StructField("tipo_manutencao", StringType, nullable = false),
    StructField("descricao_item", StringType)))

  val all: Map[String, StructType] = Map(
    "insumos" -> insumos,
    "composicoes" -> composicoes,
    "precos_insumos_mensal" -> precosInsumosMensal,
    "custos_composicoes_mensal" -> custosComposicoesMensal,
    "composicao_insumos" -> composicaoInsumos,
    "composicao_subcomposicoes" -> composicaoSubcomposicoes,
    "manutencoes_historico" -> manutencoesHistorico)

  /** Partition layout: monthly fact/log tables are laid out by
    * `data_referencia` (one partition per month — the reference's
    * period granularity, `etl_pipeline.py:483`). Month lookups touch one
    * partition; replace-period becomes a dynamic partition overwrite;
    * append-ignore's anti-join prunes to the incoming months. Dims stay
    * unpartitioned (they are small and upsert-rewritten). */
  val partitionedBy: Map[String, Seq[String]] = Map(
    "precos_insumos_mensal" -> Seq("data_referencia"),
    "custos_composicoes_mensal" -> Seq("data_referencia"),
    "manutencoes_historico" -> Seq("data_referencia"))

  /** Engine-side PK registry — replaces the reference's pg_index
    * introspection (`database.py:178-189`). Drives the anti-join /
    * merge keys of the load policies (SURVEY §2.1 S9/S10). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "insumos" -> Seq("codigo"),
    "composicoes" -> Seq("codigo"),
    "precos_insumos_mensal" -> Seq("insumo_codigo", "uf", "data_referencia", "regime"),
    "custos_composicoes_mensal" -> Seq("composicao_codigo", "uf", "data_referencia", "regime"),
    "composicao_insumos" -> Seq("composicao_pai_codigo", "insumo_filho_codigo"),
    "composicao_subcomposicoes" -> Seq("composicao_pai_codigo", "composicao_filho_codigo"),
    "manutencoes_historico" -> Seq("item_codigo", "tipo_item", "data_referencia", "tipo_manutencao"))
}

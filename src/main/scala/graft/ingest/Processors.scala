package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.functions.Coerce
import graft.model.Schemas
import graft.ops.{Relational, UnpivotUf}

/** Sheet → tidy-table transforms, the Spark counterpart of the
  * reference's `Processor` (`/root/reference/autosinapi/core/processor.py`).
  * Every cast is coerce-don't-fail (null on failure, SURVEY §1.2) followed
  * by explicit key-null drops; every keep-first dedup is ordered by the
  * staged `__line` column — exact pandas file-order semantics, made
  * deterministic under parallelism.
  */
object Processors {

  private def money(c: Column): Column = Coerce.toMoney(c)

  private def byLine = Seq(col("__line").asc)

  /** Maintenance sheet → `manutencoes_historico` rows
    * (processor.py:168-204): rename via MANUT_COL_MAP, `MM/yyyy` date
    * coerce, upper+trim on tipo columns, numeric-coerce code, drop
    * null-key rows.
    */
  def processManutencoes(staged: DataFrame, cfg: EngineConfig): DataFrame = {
    val renamed = HeaderLocator.standardizeIds(staged, EngineConfig.subMap(cfg, "MANUT_COL_MAP"))
    renamed
      .withColumn("data_referencia", Coerce.toDate(col("data_referencia"), cfg("DATE_FORMAT")))
      .withColumn("tipo_item", upper(trim(col("tipo_item"))))
      .withColumn("tipo_manutencao", upper(trim(col("tipo_manutencao"))))
      .withColumn("item_codigo", Coerce.toInt(col("item_codigo")))
      .select(col("item_codigo"), col("tipo_item"), col("data_referencia"),
        col("tipo_manutencao"), col("descricao_item"), col("__line"))
      .na.drop(Seq("item_codigo", "tipo_item", "data_referencia", "tipo_manutencao"))
      .transform(df => Relational.dedupKeepFirst(df,
        Schemas.primaryKeys("manutencoes_historico"), byLine))
      .drop("__line")
  }

  /** Price sheet (ISD/ICD/ISE) → (catalog fragment, monthly price facts)
    * (processor.py:327-346 single-pass dual output; unpivot 134-158).
    * One staged scan yields both projections.
    */
  def processPrecosSheet(staged: DataFrame, regime: String, dataRef: java.sql.Date,
                         cfg: EngineConfig): (DataFrame, DataFrame) = {
    val idd = HeaderLocator.standardizeIds(staged, EngineConfig.subMap(cfg, "ID_COL_MAP"))
      .withColumn("CODIGO", Coerce.toInt(col("CODIGO")))
      .na.drop(Seq("CODIGO"))
    val catalog = Relational.dedupKeepFirst(idd, Seq("CODIGO"), byLine)
      .select(col("CODIGO").as("codigo"), col("DESCRICAO").as("descricao"),
        col("UNIDADE").as("unidade"))
    val prices = UnpivotUf.unpivot(
        idd.select((Seq(col("CODIGO")) ++
          UnpivotUf.ufColumns(idd.columns.toSeq).map(col)): _*),
        Seq("CODIGO"), cfg("PRECO_VALUE_NAME"))
      .select(col("CODIGO").as("insumo_codigo"), col("uf"),
        lit(dataRef).as("data_referencia"), lit(regime).as("regime"),
        col(cfg("PRECO_VALUE_NAME")))
    (catalog, prices)
  }

  /** Analítico sheet → (parent catalog, child details, insumo edges,
    * sub-composition edges) (processor.py:206-325).
    */
  def processAnalitico(staged: DataFrame, cfg: EngineConfig)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val typed = staged
      .withColumn("__tipo", upper(trim(col("TIPO_ITEM"))))
      .withColumn("__pai", Coerce.toInt(col("CODIGO_DA_COMPOSICAO")))
    val itemTypes = Seq(Schemas.ItemType.Insumo, Schemas.ItemType.Composicao)

    // P4 + P6 + A1: child rows, coerced keys, deduped on the natural key.
    val children = typed
      .filter(col("__tipo").isin(itemTypes: _*))
      .withColumn("__item", Coerce.toInt(col("CODIGO_DO_ITEM")))
      .withColumn("__coef", money(col("COEFICIENTE")))
      .na.drop(Seq("__pai", "__item", "__tipo"))
      .transform(df => Relational.dedupKeepFirst(df, Seq("__pai", "__item", "__tipo"), byLine))

    val insumoEdges = children.filter(col("__tipo") === Schemas.ItemType.Insumo)
      .select(col("__pai").as("composicao_pai_codigo"),
        col("__item").as("insumo_filho_codigo"), col("__coef").as("coeficiente"))
    val subcompEdges = children.filter(col("__tipo") === Schemas.ItemType.Composicao)
      .select(col("__pai").as("composicao_pai_codigo"),
        col("__item").as("composicao_filho_codigo"), col("__coef").as("coeficiente"))

    // P5 + A2: parent (block-header) rows -> composition catalog.
    val parents = typed
      .filter(col("__pai").isNotNull && !col("__tipo").isin(itemTypes: _*))
      .transform(df => Relational.dedupKeepFirst(df, Seq("__pai"), byLine))
      .select(col("__pai").as("codigo"), col("DESCRICAO").as("descricao"),
        col("UNIDADE").as("unidade"))

    // A3: child details for placeholder enrichment (dedup on code+tipo).
    val childDetails = children
      .transform(df => Relational.dedupKeepFirst(df, Seq("__item", "__tipo"), byLine))
      .select(col("__item").as("codigo"), col("__tipo").as("tipo"),
        col("DESCRICAO").as("descricao"), col("UNIDADE").as("unidade"))

    (parents, childDetails, insumoEdges, subcompEdges)
  }

  /** Cost sheet (CSD/CCD/CSE, two-row fused header) → monthly cost facts
    * (processor.py:352-405): P7 formula-cell code extraction, U2
    * selective melt of `{UF}_CUSTO` columns.
    */
  def processCustosSheet(stagedFused: DataFrame, regime: String, dataRef: java.sql.Date,
                         cfg: EngineConfig): DataFrame = {
    val idd = HeaderLocator.standardizeIds(stagedFused, EngineConfig.subMap(cfg, "ID_COL_MAP"))
    val coded = idd
      .withColumn("CODIGO",
        Coerce.toInt(regexp_extract(col("CODIGO"), cfg("CODE_EXTRACT_REGEX"), 1)))
      .na.drop(Seq("CODIGO"))
    UnpivotUf.unpivotFused(coded, Seq("CODIGO"), cfg("CUSTO_VALUE_NAME"))
      .select(col("CODIGO").as("composicao_codigo"), col("uf"),
        lit(dataRef).as("data_referencia"), lit(regime).as("regime"),
        col(cfg("CUSTO_VALUE_NAME")))
  }
}

package graft.config

/** Configuration failure (the reference's `ConfigurationError`,
  * `/root/reference/autosinapi/exceptions.py`): unreadable or malformed
  * config files fail fast and loudly. */
final class ConfigurationException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Layered engine configuration mirroring the reference's constant
  * namespace (`/root/reference/autosinapi/config.py:19-98`) and its
  * override mechanism (`config.py:136-143`, `etl_pipeline.py:139-158`,
  * JSON file source `__init__.py:71-110` + `etl_pipeline.py:139-158`):
  * defaults ++ config file ++ caller overrides ++ environment
  * (AUTOSINAPI_* vars), later layers winning. JSON parsing via the
  * Jackson that ships on Spark's classpath — no extra dependency.
  */
final case class EngineConfig(constants: Map[String, String]) {

  def apply(key: String): String =
    constants.getOrElse(key,
      throw new IllegalArgumentException(s"missing config constant: $key"))

  def int(key: String): Int = apply(key).toInt

  def list(key: String): Seq[String] =
    apply(key).split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  def withOverrides(over: Map[String, String]): EngineConfig =
    EngineConfig(constants ++ over)
}

object EngineConfig {

  /** Defaults mirror `config.py` constant names (values that shape the
    * dataflow; acquisition-only constants like URLs are in ingest). */
  val defaults: Map[String, String] = Map(
    // sheet-name substring -> "<table>:<regime>" (config.py:53-57)
    "SHEET_MAP.ISD" -> "precos:NAO_DESONERADO",
    "SHEET_MAP.ICD" -> "precos:DESONERADO",
    "SHEET_MAP.ISE" -> "precos:SEM_ENCARGOS",
    "SHEET_MAP.CSD" -> "custos:NAO_DESONERADO",
    "SHEET_MAP.CCD" -> "custos:DESONERADO",
    "SHEET_MAP.CSE" -> "custos:SEM_ENCARGOS",
    // explicit sheet priority — the reference relies on workbook sheet
    // order for its first-sheet-wins catalog consolidation
    // (processor.py:417-436); under parallelism the order must be declared
    "SHEET_PRIORITY" -> "ISD,ICD,ISE,CSD,CCD,CSE",
    // header keyword sets (config.py:51-52)
    "MANUTENCOES_HEADER_KEYWORDS" -> "REFERENCIA,TIPO,CODIGO,DESCRICAO,MANUTENCAO",
    "PRECOS_HEADER_KEYWORDS" -> "CODIGO,DESCRICAO,UNIDADE",
    "CUSTOS_HEADER_KEYWORDS" -> "CODIGO_DA_COMPOSICAO,DESCRICAO,UNIDADE",
    "COMPOSICAO_HEADER_KEYWORDS" -> "CODIGO_DA_COMPOSICAO,TIPO_ITEM,CODIGO_DO_ITEM,COEFICIENTE",
    // id-column standardization (config.py:58-61)
    "ID_COL_MAP.CODIGO_DO_INSUMO" -> "CODIGO",
    "ID_COL_MAP.CODIGO_DA_COMPOSICAO" -> "CODIGO",
    "ID_COL_MAP.DESCRICAO_DO_INSUMO" -> "DESCRICAO",
    "ID_COL_MAP.DESCRICAO_DA_COMPOSICAO" -> "DESCRICAO",
    // maintenance column map (config.py:62-65)
    "MANUT_COL_MAP.REFERENCIA" -> "data_referencia",
    "MANUT_COL_MAP.TIPO" -> "tipo_item",
    "MANUT_COL_MAP.CODIGO" -> "item_codigo",
    "MANUT_COL_MAP.DESCRICAO" -> "descricao_item",
    "MANUT_COL_MAP.MANUTENCAO" -> "tipo_manutencao",
    // scan bounds and formats (config.py:72-79)
    "HEADER_SEARCH_LIMIT" -> "20",
    "DATE_FORMAT" -> "MM/yyyy",
    "CODE_EXTRACT_REGEX" -> ",\\((\\d+)\\)$",
    "PRECO_VALUE_NAME" -> "preco_mediano",
    "CUSTO_VALUE_NAME" -> "custo_total",
    "CSV_SEPARATOR" -> ";",
    // placeholder templates (config.py:37-39)
    "PLACEHOLDER_INSUMO_DESC" -> "INSUMO_DESCONHECIDO_",
    "PLACEHOLDER_COMPOSICAO_DESC" -> "COMPOSICAO_DESCONHECIDA_",
    "PLACEHOLDER_UNIT" -> "UN",
    // deactivation keyword — accent-sensitive ILIKE (config.py:31)
    "DEACTIVATION_KEYWORD" -> "DESATIVAÇÃO",
    // run statuses (config.py:40-42)
    "STATUS_SUCCESS" -> "SUCESSO",
    "STATUS_NO_DATA" -> "SUCESSO (SEM DADOS)",
    "STATUS_FAILURE" -> "FALHA")

  private val EnvPrefix = "AUTOSINAPI_"

  /** defaults ++ file ++ overrides ++ env (env wins, `__init__.py:143-167`;
    * the JSON file layer mirrors `etl_pipeline.py:139-158`
    * `_load_base_config`). */
  def load(overrides: Map[String, String] = Map.empty,
           env: Map[String, String] = sys.env,
           configFile: Option[java.nio.file.Path] = None): EngineConfig = {
    val fromEnv = env.collect {
      case (k, v) if k.startsWith(EnvPrefix) => k.stripPrefix(EnvPrefix) -> v
    }
    val fromFile = configFile.map(loadFile).getOrElse(Map.empty)
    EngineConfig(defaults ++ fromFile ++ overrides ++ fromEnv)
  }

  /** Read a JSON config file into a flat constant map. Nested objects
    * flatten with dots (`{"SHEET_MAP": {"ISD": "…"}}` →
    * `SHEET_MAP.ISD`), matching this config's dotted-key convention;
    * scalars stringify. Missing file / non-JSON / non-object payloads
    * raise [[ConfigurationException]] exactly like the reference's
    * `_load_base_config` (`etl_pipeline.py:139-158`). */
  def loadFile(path: java.nio.file.Path): Map[String, String] = {
    if (!java.nio.file.Files.exists(path))
      throw new ConfigurationException(
        s"Arquivo de configuração não encontrado: $path")
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(path))
      catch {
        case e: Exception => throw new ConfigurationException(
          s"Erro ao decodificar o arquivo JSON de configuração: $path", e)
      }
    if (node == null || !node.isObject)
      throw new ConfigurationException(
        s"Erro ao decodificar o arquivo JSON de configuração: $path (not a JSON object)")
    flatten(node, "")
  }

  private def flatten(node: com.fasterxml.jackson.databind.JsonNode,
                      prefix: String): Map[String, String] = {
    val it = node.fields()
    val out = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      val key = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
      val v = e.getValue
      if (v.isObject) out ++= flatten(v, key)
      else out += key -> v.asText()
    }
    out.result()
  }

  /** Sub-map view of dotted keys, e.g. idColMap = map("ID_COL_MAP"). */
  def subMap(cfg: EngineConfig, prefix: String): Map[String, String] =
    cfg.constants.collect {
      case (k, v) if k.startsWith(prefix + ".") => k.stripPrefix(prefix + ".") -> v
    }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.store.TableStore

/** Data-quality validation of the warehouse — the engine-side answer to
  * the constraints PostgreSQL enforced declaratively in the reference
  * (SURVEY §2.3 J6: FKs `database.py:106,111,116-117,122-123`; PKs
  * `database.py:98-127`; `CHAR(2)` UF shape `database.py:104,109`).
  * Spark tables don't enforce constraints, so they become assertable
  * checks: each is one aggregate/anti-join job returning a violation
  * count (0 = healthy). The placeholder repair (J1-J3) should make the
  * FK checks pass by construction — this verifies it.
  */
object Quality {

  final case class Check(name: String, violations: Long)

  /** Declarative frame-level audit: each entry names a check and gives
    * the DataFrame of its VIOLATING rows; the result is one row per
    * check with the violation count (0 = healthy). The distributed
    * companion to [[run]]'s warehouse suite — usable on any frames,
    * not just the staged warehouse, so the FK/PK/domain discipline is
    * oracle-checkable on the raw tables too. Scale shape: each check
    * is an independent count aggregate (anti-joins/group-filters stay
    * inside the check's own frame); the union concatenates |checks|
    * single-row aggregates — no cross-check shuffle exists.
    */
  def audit(checks: Seq[(String, org.apache.spark.sql.DataFrame)]): org.apache.spark.sql.DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    checks.map { case (name, bad) =>
      bad.agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }.reduce(_.unionByName(_))
  }

  /** Count of child-side keys with no parent row (FK orphan anti-join). */
  private def orphans(store: TableStore, child: String, childKey: String,
                      parent: String, parentKey: String): Long =
    store.read(child).select(col(childKey).as("k")).distinct()
      .join(broadcast(store.read(parent).select(col(parentKey).as("k"))), Seq("k"), "left_anti")
      .count()

  /** Count of PK groups with more than one row. */
  private def pkDuplicates(store: TableStore, table: String): Long =
    store.read(table)
      .groupBy(Schemas.primaryKeys(table).map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()

  /** Full check suite over a warehouse. */
  def run(store: TableStore): Seq[Check] = {
    val fks = Seq(
      ("fk precos->insumos", "precos_insumos_mensal", "insumo_codigo", "insumos", "codigo"),
      ("fk custos->composicoes", "custos_composicoes_mensal", "composicao_codigo", "composicoes", "codigo"),
      ("fk edges.pai->composicoes", "composicao_insumos", "composicao_pai_codigo", "composicoes", "codigo"),
      ("fk edges.filho->insumos", "composicao_insumos", "insumo_filho_codigo", "insumos", "codigo"),
      ("fk subedges.pai->composicoes", "composicao_subcomposicoes", "composicao_pai_codigo", "composicoes", "codigo"),
      ("fk subedges.filho->composicoes", "composicao_subcomposicoes", "composicao_filho_codigo", "composicoes", "codigo"))
      .map { case (n, c, ck, p, pk) => Check(n, orphans(store, c, ck, p, pk)) }

    val pks = Schemas.primaryKeys.keys.toSeq.sorted
      .map(t => Check(s"pk unique $t", pkDuplicates(store, t)))

    val ufShape = Seq("precos_insumos_mensal", "custos_composicoes_mensal").map { t =>
      Check(s"uf shape $t",
        store.read(t).filter(!col("uf").rlike("^[A-Za-z]{2}$")).count())
    }

    val statusDomain = Seq("insumos", "composicoes").map { t =>
      Check(s"status domain $t",
        store.read(t).filter(!col("status").isin(
          Schemas.Status.Ativo, Schemas.Status.Desativado)).count())
    }

    fks ++ pks ++ ufShape ++ statusDomain
  }

  def violations(store: TableStore): Seq[Check] = run(store).filter(_.violations > 0)
}

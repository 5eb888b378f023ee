package graft.query

import graft.model.Schemas
import graft.store.TableStore

/** S14 — the ad-hoc SQL surface (`database.py:261-280`): register every
  * warehouse table plus the unified edge view as temp views, making
  * `spark.sql(...)` the engine's public query API (parse → Catalyst →
  * executors), exactly the role `Database.execute_query` plays over
  * PostgreSQL in the reference.
  *
  * The documented `WITH RECURSIVE` tree-explosion shape
  * (`docs/DataModel.md:386-391`) runs natively at this surface — Spark 4
  * executes recursive CTEs via `UnionLoopExec` (QueriesSpec pins it
  * against the programmatic [[graft.ops.TreeExplode]] path; as in PG,
  * the step's output types must match the anchor exactly, so widening
  * decimal products need an explicit cast). For iterative workloads at
  * scale prefer [[graft.query.Queries.estrutura]]: its per-level
  * checkpointing bounds lineage and collapses converging paths each hop.
  */
object Views {
  def registerAll(store: TableStore): Unit = {
    Schemas.all.keys.foreach { t =>
      store.read(t).createOrReplaceTempView(t)
    }
    store.registerUnifiedView()
  }
}

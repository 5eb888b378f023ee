package graft.query

import graft.model.Schemas
import graft.store.TableStore

/** S14 — the ad-hoc SQL surface (`database.py:261-280`): register every
  * warehouse table plus the unified edge view as temp views, making
  * `spark.sql(...)` the engine's public query API (parse → Catalyst →
  * executors), exactly the role `Database.execute_query` plays over
  * PostgreSQL in the reference.
  */
object Views {
  def registerAll(store: TableStore): Unit = {
    Schemas.all.keys.foreach { t =>
      store.read(t).createOrReplaceTempView(t)
    }
    store.registerUnifiedView()
  }
}

package graft

/** Bounded driver-side registry of broadcastable model objects, keyed by a
  * monotonically-increasing id.
  *
  * The registration contract shared by every model-backed SQL function
  * (`graft_lang_score`, `graft_lm_logcount`, `graft_ivf_cells`): the
  * caller `put`s a model, passes the returned id as a LITERAL argument so
  * the function factory resolves it at analysis time (concurrent queries
  * with their own ids cannot race), and `remove`s the entry as soon as the
  * result frame is built — Dataset construction analyzes eagerly, so the
  * model object is already embedded in the plan by then. The access-
  * bounded LRU (64 entries) is the backstop for callers that skip the
  * prompt release: driver memory must not grow without bound in a
  * long-lived session (models range from 100s of KB for trigram profiles
  * to ~25 MB for nlist=4096 centroid matrices).
  */
abstract class ModelRegistry[T <: AnyRef](kind: String) {
  private val MaxEntries = 64
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)
  private val models = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Long, T](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, T]): Boolean = size() > MaxEntries
    })

  def put(model: T): Long = {
    val id = nextId.incrementAndGet()
    models.put(id, model)
    id
  }

  def get(id: Long): T = {
    val m = models.get(id)
    require(m != null, s"no $kind registered under id $id (evicted or never put)")
    m
  }

  /** Callers done with a model should release it promptly (see class doc). */
  def remove(id: Long): Unit = models.remove(id)

  /** Live-entry count — eviction regression gates assert this stays
    * bounded under repeated operator calls. */
  def size: Int = models.size()
}

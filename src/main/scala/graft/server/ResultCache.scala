package graft.server

/** LRU cache of encoded responses keyed by `query_id` (reference S8,
  * `LRUCache(maxsize=10)`, `/root/reference/main.py:65,276-278,287-288`):
  * a GET carrying only `query_id` replays the cached bytes. */
final class ResultCache(maxSize: Int = 10) {
  private val map = new java.util.LinkedHashMap[String, Array[Byte]](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Byte]]): Boolean =
      size() > maxSize
  }
  def get(id: String): Option[Array[Byte]] = synchronized(Option(map.get(id)))
  def put(id: String, bytes: Array[Byte]): Unit = synchronized { map.put(id, bytes); () }
  def size: Int = synchronized(map.size())
}

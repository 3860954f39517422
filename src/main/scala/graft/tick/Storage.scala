package graft.tick

import scala.collection.immutable.TreeMap

/** The storage layer's SEMANTICS as a library (reference
  * `services/storage/` — the BoltDB-backed versioned KV every service
  * registry persists through):
  *
  *  - `MemStore` — the `storage.Interface` contract over a sorted key
  *    space (bolt's lexicographic byte order): Put/Get/Delete/List-by-
  *    prefix, snapshot-consistent views;
  *  - `IndexedStore` — indexed.go's CRUD with secondary-index
  *    maintenance: data under `<prefix>/data/<id>`, index entries under
  *    `<prefix>/indexes/<name>/<value>` where a NON-unique index
  *    appends `/<id>` to its value (ValueOf, :39-48); Create refuses an
  *    existing id (ErrObjectExists), Replace requires one
  *    (ErrNoObjectExists), Put upserts; a replace rewrites only the
  *    index entries whose value changed (:205-266); List/ReverseList
  *    walk one index in (reverse) key order, glob-match on the object
  *    id, and page with `DoListFunc`'s quirk — the page size is capped
  *    by `min(offset+limit, TOTAL entries) - offset` computed BEFORE
  *    matching (storage.go:124-157), so a filtered listing near the end
  *    of the key space returns short pages; `Rebuild` drops and rewalks
  *    every index (:382-428).
  *
  * The store is deliberately driver-side (registries are bounded
  * metadata, not data); the glob is the same `*`/`?` subset the alert
  * topic queries use.
  */
object Storage {

  class ObjectExists extends IllegalStateException("object already exists")
  class NoObjectExists extends NoSuchElementException("no object exists")

  /** storage.Interface over a sorted in-memory key space. */
  final class MemStore {
    private var kv = TreeMap.empty[String, Array[Byte]]
    def put(key: String, value: Array[Byte]): Unit =
      synchronized { kv += key -> value }
    def get(key: String): Option[Array[Byte]] = synchronized(kv.get(key))
    def delete(key: String): Unit = synchronized { kv -= key }
    /** All (key, value) with the prefix, key-ascending. */
    def list(prefix: String): Seq[(String, Array[Byte])] =
      synchronized(kv.iteratorFrom(prefix)
        .takeWhile(_._1.startsWith(prefix)).toSeq)
  }

  /** indexed.go Index: `ValueOf` appends `/<id>` for non-unique
    * indexes so equal values stay distinct keys in sorted order. */
  final case class Index[O](name: String, valueOf: O => String,
      unique: Boolean = false) {
    def keyValue(id: String, o: O): String =
      if (unique) valueOf(o) else s"${valueOf(o)}/$id"
  }

  /** The default unique `id` index every store carries (:70-84). */
  def idIndex[O](id: O => String): Index[O] =
    Index("id", id, unique = true)

  final class IndexedStore[O](store: MemStore, prefix: String,
      id: O => String, marshal: O => Array[Byte],
      unmarshal: Array[Byte] => O, extraIndexes: Seq[Index[O]] = Nil) {

    private val indexes: Seq[Index[O]] = idIndex(id) +: extraIndexes
    private def dataKey(oid: String) = s"$prefix/data/$oid"
    private def indexKey(index: String, value: String) =
      s"$prefix/indexes/$index/$value"

    def get(oid: String): O =
      store.get(dataKey(oid)).map(unmarshal).getOrElse(throw new NoObjectExists)
    def exists(oid: String): Boolean = store.get(dataKey(oid)).isDefined

    def create(o: O): Unit = putImpl(o, allowReplace = false, requireReplace = false)
    def put(o: O): Unit = putImpl(o, allowReplace = true, requireReplace = false)
    def replace(o: O): Unit = putImpl(o, allowReplace = true, requireReplace = true)

    private def putImpl(o: O, allowReplace: Boolean,
        requireReplace: Boolean): Unit = synchronized {
      val oid = id(o)
      val old = store.get(dataKey(oid)).map(unmarshal)
      if (old.isEmpty && requireReplace) throw new NoObjectExists
      if (old.isDefined && !allowReplace) throw new ObjectExists
      store.put(dataKey(oid), marshal(o))
      indexes.foreach { idx =>
        val newKey = indexKey(idx.name, idx.keyValue(oid, o))
        val oldKey = old.map(p => indexKey(idx.name, idx.keyValue(oid, p)))
        if (!oldKey.contains(newKey)) {
          store.put(newKey, oid.getBytes("UTF-8"))
          oldKey.foreach(store.delete)
        }
      }
    }

    def delete(oid: String): Unit = synchronized {
      store.get(dataKey(oid)).map(unmarshal).foreach { o =>
        store.delete(dataKey(oid))
        indexes.foreach(idx =>
          store.delete(indexKey(idx.name, idx.keyValue(oid, o))))
      }
    }

    /** List objects by index order with the reference's paging quirk.
      * `limit < 0` = unbounded (no offset either, list():349-360). */
    def list(index: String = "id", pattern: String = "",
        offset: Int = 0, limit: Int = -1, reverse: Boolean = false): Seq[O] =
      synchronized {
        val entries0 = store.list(indexKey(index, ""))
          .map { case (_, v) => new String(v, "UTF-8") }
        val entries = if (reverse) entries0.reverse else entries0
        val rx = if (pattern.isEmpty) None
          else Some(java.util.regex.Pattern.compile("^" + globRegex(pattern) + "$"))
        def matches(oid: String) = rx.forall(_.matcher(oid).matches())
        val ids =
          if (limit < 0) entries
          else {
            // DoListFunc: the page cap counts TOTAL entries, not matches
            val size = math.min(offset + limit, entries.size) - offset
            if (size <= 0) Seq.empty
            else entries.filter(matches).slice(offset, offset + size)
          }
        ids.map(get)
      }

    /** Drop and rebuild every index from the data tree (:382-428). */
    def rebuild(): Unit = synchronized {
      indexes.foreach { idx =>
        store.list(indexKey(idx.name, "")).foreach { case (k, _) => store.delete(k) }
      }
      store.list(s"$prefix/data/").foreach { case (_, bytes) =>
        val o = unmarshal(bytes)
        indexes.foreach(idx =>
          store.put(indexKey(idx.name, idx.keyValue(id(o), o)),
            id(o).getBytes("UTF-8")))
      }
    }
  }

  /** Go `path.Match` translated to a Java regex: `*`/`?` never cross a
    * `/` (path.Match matches non-Separator runes), `[...]` classes with
    * `^` negation pass through. */
  private def globRegex(pattern: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern(i) match {
        case '*' => sb ++= "[^/]*"
        case '?' => sb ++= "[^/]"
        case '[' =>
          sb += '['
          i += 1
          if (i < pattern.length && (pattern(i) == '^' || pattern(i) == '!')) {
            sb += '^'; i += 1
          }
          while (i < pattern.length && pattern(i) != ']') {
            if (pattern(i) == '\\') sb ++= "\\\\" else sb += pattern(i)
            i += 1
          }
          sb += ']'
        case c if "\\.{}()+^$|".indexOf(c) >= 0 => sb ++= ("\\" + c)
        case c => sb += c
      }
      i += 1
    }
    sb.toString
  }
}

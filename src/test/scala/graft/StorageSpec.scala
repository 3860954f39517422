package graft

import graft.tick.Storage
import graft.tick.Storage.{Index, IndexedStore, MemStore, NoObjectExists, ObjectExists}
import org.scalatest.funsuite.AnyFunSuite

/** The storage layer semantics (services/storage/indexed.go +
  * indexed_test.go TestIndexedStore_CRUD). */
class StorageSpec extends AnyFunSuite {

  private case class Obj(id: String, value: String, date: String)
  private def newStore(): (MemStore, IndexedStore[Obj]) = {
    val ms = new MemStore
    val is = new IndexedStore[Obj](ms, "crud",
      _.id,
      o => s"${o.id}|${o.value}|${o.date}".getBytes("UTF-8"),
      b => { val p = new String(b, "UTF-8").split("\\|", -1); Obj(p(0), p(1), p(2)) },
      extraIndexes = Seq(Index[Obj]("date", _.date)))
    (ms, is)
  }

  test("CRUD with index maintenance (TestIndexedStore_CRUD)") {
    val (_, is) = newStore()
    val o1 = Obj("1", "obj1", "2017-10-05T00:00:00Z")
    is.create(o1)
    intercept[ObjectExists](is.create(o1))
    assert(is.get("1") === o1)
    assert(is.list("id") === Seq(o1))
    assert(is.list("date") === Seq(o1))

    // second object dated EARLIER: id order differs from date order
    val o2 = Obj("2", "obj2", "2017-09-01T00:00:00Z")
    is.put(o2)
    intercept[ObjectExists](is.create(o2))
    assert(is.list("id") === Seq(o1, o2))
    assert(is.list("date") === Seq(o2, o1))

    // modify: replace o1's value, move o2's date AFTER o1's
    val o1b = o1.copy(value = "modified obj1")
    is.replace(o1b)
    val o2b = o2.copy(date = "2018-01-01T00:00:00Z")
    is.put(o2b)
    assert(is.get("1") === o1b && is.get("2") === o2b)
    assert(is.list("id") === Seq(o1b, o2b))
    assert(is.list("date") === Seq(o1b, o2b)) // old date index entry gone

    // delete removes data AND index entries
    is.delete("2")
    intercept[NoObjectExists](is.get("2"))
    assert(is.list("id") === Seq(o1b) && is.list("date") === Seq(o1b))

    // replace of a missing object is ErrNoObjectExists
    intercept[NoObjectExists](is.replace(Obj("3", "x", "2019-01-01T00:00:00Z")))
  }

  test("list: glob pattern, reverse order, and the DoListFunc paging quirk") {
    val (_, is) = newStore()
    (1 to 5).foreach(i => is.create(Obj(s"t$i", s"v$i", s"2017-0$i-01T00:00:00Z")))
    assert(is.list("id", pattern = "t[13]", limit = 100).map(_.id) ===
      Seq("t1", "t3"))
    // limit < 0 skips DoListFunc entirely — the pattern is IGNORED on
    // the unbounded path (list():349-360, a faithful quirk)
    assert(is.list("id", pattern = "t[13]").size === 5)
    assert(is.list("id", reverse = true).map(_.id) ===
      Seq("t5", "t4", "t3", "t2", "t1"))
    assert(is.list("id", offset = 1, limit = 2).map(_.id) === Seq("t2", "t3"))
    // the quirk: size = min(offset+limit, TOTAL) - offset, computed
    // BEFORE matching — offset past the total yields an empty page even
    // when matches remain
    assert(is.list("id", pattern = "t5", offset = 5, limit = 10) === Nil)
    // limit < 0 = unbounded (offset ignored, list():349-360)
    assert(is.list("id", offset = 3, limit = -1).size === 5)
  }

  test("non-unique index values collide safely; rebuild restores indexes") {
    val (ms, is) = newStore()
    val a = Obj("a", "x", "2017-01-01T00:00:00Z")
    val b = Obj("b", "y", "2017-01-01T00:00:00Z") // same date value
    is.create(a); is.create(b)
    // both survive under date (value gets /<id> appended), id-tiebreak order
    assert(is.list("date").map(_.id) === Seq("a", "b"))
    // wipe the index tree, rebuild recovers it from data
    ms.list("crud/indexes/").foreach { case (k, _) => ms.delete(k) }
    assert(is.list("date") === Nil)
    is.rebuild()
    assert(is.list("date").map(_.id) === Seq("a", "b"))
    assert(is.list("id").map(_.id) === Seq("a", "b"))
  }
}

package graft

import graft.tick.Diag
import graft.tick.Diag._
import org.scalatest.funsuite.AnyFunSuite

/** The diagnostic log formats + session filtering
  * (services/diagnostic/log_test.go vectors, sessions.go laws). */
class DiagSpec extends AnyFunSuite {

  // log_test.go defaultTime = 2009-11-10T23:00:00Z
  private val ts = 1257894000000L
  private val tsStr = "2009-11-10T23:00:00.000Z"
  private def lf(msg: String, fields: Seq[Field] = Nil) =
    logfmtLine(ts, "error", msg, Nil, fields)

  test("logfmt lines: the TestLoggerWithoutContext vectors byte-for-byte") {
    assert(lf("this") === s"ts=$tsStr lvl=error msg=this\n")
    assert(lf("this/is/a/test") === s"ts=$tsStr lvl=error msg=this/is/a/test\n")
    assert(lf("this is \" a test/yeah") ===
      s"ts=$tsStr lvl=error msg=" + "\"this is \\\" a test/yeah\"\n")
    assert(lf("test", Seq(FString("test", "this"))) ===
      s"ts=$tsStr lvl=error msg=test test=this\n")
    assert(lf("test", Seq(FString("test", "this is \" a test/yeah"))) ===
      s"ts=$tsStr lvl=error msg=test test=" + "\"this is \\\" a test/yeah\"\n")
    assert(lf("test", Seq(FGrouped("test", Seq(FString("a", "this"))))) ===
      s"ts=$tsStr lvl=error msg=test test_a=this\n")
    assert(lf("test", Seq(FGrouped("test",
      Seq(FString("a", "this"), FString("b", "other"))))) ===
      s"ts=$tsStr lvl=error msg=test test_a=this test_b=other\n")
    assert(lf("test", Seq(FStrings("test", Seq("this")))) ===
      s"ts=$tsStr lvl=error msg=test test_0=this\n")
    assert(lf("test", Seq(FStrings("test", Seq("this", "other")))) ===
      s"ts=$tsStr lvl=error msg=test test_0=this test_1=other\n")
    assert(lf("test", Seq(FInt("test", 10))) ===
      s"ts=$tsStr lvl=error msg=test test=10\n")
    assert(lf("test", Seq(FFloat("test", 3.1415926535))) ===
      s"ts=$tsStr lvl=error msg=test test=3.1415926535\n")
    assert(lf("test", Seq(FBool("test", true))) ===
      s"ts=$tsStr lvl=error msg=test test=true\n")
    assert(lf("test", Seq(FError(Some("this")))) ===
      s"ts=$tsStr lvl=error msg=test err=this\n")
    assert(lf("test", Seq(FError(None))) ===
      s"ts=$tsStr lvl=error msg=test err=nil\n")
    assert(lf("test", Seq(FTime("time", 1257894000000000000L))) ===
      s"ts=$tsStr lvl=error msg=test time=2009-11-10T23:00:00Z\n")
    assert(lf("test", Seq(FDuration("test", 1000000000L))) ===
      s"ts=$tsStr lvl=error msg=test test=1s\n")
    assert(lf("test", Seq(FString("testing", "that this"),
      FDuration("works", 1000000000L))) ===
      s"ts=$tsStr lvl=error msg=test testing=" + "\"that this\" works=1s\n")
  }

  test("context fields render before call fields") {
    assert(logfmtLine(ts, "info", "m",
      context = Seq(FString("service", "http")),
      fields = Seq(FInt("n", 1))) ===
      s"ts=$tsStr lvl=info msg=m service=http n=1\n")
  }

  test("JSON lines: quoted keys, raw numerics/bools, indexed strings") {
    assert(jsonLine(ts, "error", "test", Nil, Seq(FInt("n", 10))) ===
      s"""{"ts":"$tsStr","lvl":"error","msg":"test","n":10}""" + "\n")
    assert(jsonLine(ts, "error", "t", Nil, Seq(
      FGrouped("g", Seq(FString("a", "x"), FBool("b", false))))) ===
      s"""{"ts":"$tsStr","lvl":"error","msg":"t","g":{"a":"x","b":false}}""" + "\n")
    // Strings keep indexed keys in JSON too; empty renders "nil"
    assert(jsonLine(ts, "error", "t", Nil, Seq(FStrings("s", Seq("a", "b")))) ===
      s"""{"ts":"$tsStr","lvl":"error","msg":"t","s_0":"a","s_1":"b"}""" + "\n")
    assert(jsonLine(ts, "error", "t", Nil, Seq(FStrings("s", Nil))) ===
      s"""{"ts":"$tsStr","lvl":"error","msg":"t","s":"nil"}""" + "\n")
    assert(jsonLine(ts, "error", "t", Nil, Seq(FFloat("f", 0.5))) ===
      s"""{"ts":"$tsStr","lvl":"error","msg":"t","f":0.5}""" + "\n")
  }

  test("sessions: level floor, tag conjunction, only string fields match") {
    val fields = Seq(FString("task", "t1"), FInt("count", 3))
    // tag on msg, lvl, and a string field all match together
    val s1 = Session(tags = Seq("msg" -> "hello", "lvl" -> "info", "task" -> "t1"))
    assert(s1.render(ts, "info", "hello", Nil, fields).isDefined)
    // an int field never matches its tag (the reference quirk)
    val s2 = Session(tags = Seq("count" -> "3"))
    assert(s2.render(ts, "info", "hello", Nil, fields).isEmpty)
    // level floor: an error-floor session drops info lines
    val s3 = Session(level = ErrorLevel)
    assert(s3.render(ts, "info", "hello").isEmpty)
    assert(s3.render(ts, "error", "hello").isDefined)
    // content negotiation
    val sj = Session(contentType = "application/json")
    assert(sj.render(ts, "info", "m").get.startsWith("{\"ts\":"))
    assert(Session().render(ts, "info", "m").get.startsWith("ts="))
  }

  test("session decode: lvl=name+ is the floor, others are tags, dups refuse") {
    val s = sessionFromQuery(Seq("lvl" -> "INFO+", "task" -> "t1"),
      accept = "application/json")
    assert(s.level === InfoLevel)
    assert(s.tags === Seq("task" -> "t1"))
    assert(s.contentType === "application/json")
    // a lvl param WITHOUT '+' is a plain tag on the lvl column
    val s2 = sessionFromQuery(Seq("lvl" -> "error"))
    assert(s2.level === DebugLevel && s2.tags === Seq("lvl" -> "error"))
    assert(s2.contentType === "application/logfmt")
    intercept[IllegalArgumentException](
      sessionFromQuery(Seq("a" -> "1", "a" -> "2")))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tick.ConfigOverride
import graft.tick.ConfigOverride._

/** Pins the config-override resolution laws to the reference's own test
  * corpus (services/config/override/override_test.go): the
  * ExampleOverrideConfig flow, weak numeric conversion, redaction,
  * element create (with Initer defaults) / delete / sort order, and the
  * error shapes. */
class ConfigOverrideSpec extends AnyFunSuite {

  // the override_test.go TestConfig schema (lines 13-72)
  private val schema = Seq(
    SectionSpec("section-a", Seq(OptionSpec("option1"), OptionSpec("option2"))),
    SectionSpec("section-b", Seq(OptionSpec("option3"))),
    SectionSpec("section-c",
      Seq(OptionSpec("option4", zero = 0L), OptionSpec("password", redact = true))),
    SectionSpec("section-nums",
      Seq(OptionSpec("Int", zero = 0L), OptionSpec("Float64", zero = 0.0))),
    SectionSpec("section-d",
      Seq(OptionSpec("id"), OptionSpec("option5"), OptionSpec("option6")),
      elementKey = Some("id"),
      init = Map("option5" -> "o5"), // SectionD.Init (test line 31-33)
      validate = e => // SectionD.Validate (test line 35-40)
        if (String.valueOf(e.getOrElse("id", "")).isEmpty) Some("ID cannot be empty")
        else None))

  private val config: Map[String, Seq[Element]] = Map(
    "section-a" -> Seq(Map("option1" -> "o1", "option2" -> "")),
    "section-b" -> Seq(Map("option3" -> "o2")),
    "section-c" -> Seq(Map("option4" -> -1L, "password" -> "")),
    "section-nums" -> Seq(Map("Int" -> 0L, "Float64" -> 0.0)),
    "section-d" -> Seq(
      Map("id" -> "x", "option5" -> "x-5", "option6" -> Map.empty[String, Any]),
      Map("id" -> "y", "option5" -> "y-5", "option6" -> Map.empty[String, Any]),
      Map("id" -> "z", "option5" -> "z-5", "option6" -> Map.empty[String, Any])))

  test("ExampleOverrideConfig end-to-end (override_test.go:75-181)") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-a", options = Map(
        "option1" -> "new option1 value", "option2" -> "initial option2 value")),
      Override("section-b", options = Map("option3" -> "initial option3 value")),
      Override("section-c", options = Map("option4" -> 586L)),
      Override("section-d", element = "x", options = Map("option5" -> "x-new-5")),
      Override("section-d", element = "y", options = Map("option5" -> "y-new-5")),
      Override("section-d", create = true,
        options = Map("id" -> "w", "option5" -> "w-new-5"))))
    assert(out("section-a").head("option1") === "new option1 value")
    assert(out("section-a").head("option2") === "initial option2 value")
    assert(out("section-b").head("option3") === "initial option3 value")
    assert(out("section-c").head("option4") === 586L)
    // elements sorted by element key: w, x, y, z
    assert(out("section-d").map(_("id")) === Seq("w", "x", "y", "z"))
    assert(out("section-d").map(_("option5")) ===
      Seq("w-new-5", "x-new-5", "y-new-5", "z-5"))
  }

  test("weak numeric conversion (TestOverrideConfig_Single section-nums)") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-nums", options = Map("Int" -> "42", "Float64" -> 7))))
    assert(out("section-nums").head("Int") === 42L)
    assert(out("section-nums").head("Float64") === 7.0)
    val e = intercept[OverrideException] {
      overrideConfig(schema, config, Seq(
        Override("section-nums", options = Map("Int" -> "not-a-number"))))
    }
    assert(e.getMessage.contains("cannot convert string"))
    val e2 = intercept[OverrideException] {
      overrideConfig(schema, config, Seq(
        Override("section-a", options = Map("option1" -> 42L))))
    }
    assert(e2.getMessage.contains("wrong kind"))
  }

  test("option-name lookup falls back to lowercase (override.go:223-227)") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-a", options = Map("OPTION1" -> "upper"))))
    assert(out("section-a").head("option1") === "upper")
  }

  test("redaction (SectionC password, redact tag)") {
    val spec = schema.find(_.name == "section-c").get
    val (opts0, names0) = ConfigOverride.redacted(spec, config("section-c").head)
    assert(opts0("password") === false && names0 === Seq("password"))
    val out = overrideConfig(schema, config, Seq(
      Override("section-c", options = Map("password" -> "supersecret"))))
    val (opts, names) = ConfigOverride.redacted(spec, out("section-c").head)
    assert(opts("password") === true, "non-zero value redacts to true")
    assert(opts("option4") === -1L, "unredacted options pass through")
    assert(names === Seq("password"))
  }

  test("overriding a section absent from the config applies onto the zero struct") {
    // a single-struct section missing from the loaded config is the Go
    // zero struct, not a null map — the override must land, typed
    val noB = config - "section-b"
    val out = overrideConfig(schema, noB, Seq(
      Override("section-b", options = Map("option3" -> "from-zero"))))
    assert(out("section-b").head("option3") === "from-zero")
    // numeric sections get their typed zeros, so weak conversion works
    val noNums = config - "section-nums"
    val out2 = overrideConfig(schema, noNums, Seq(
      Override("section-nums", options = Map("Int" -> "9"))))
    assert(out2("section-nums").head("Int") === 9L)
    assert(out2("section-nums").head("Float64") === 0.0, "untouched options keep zeros")
  }

  test("created elements start from Init defaults (override_test.go:1401)") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-d", create = true, options = Map("id" -> "w"))))
    val w = out("section-d").find(_("id") == "w").get
    assert(w("option5") === "o5", "Initer default applied")
  }

  test("delete element / delete all (override_test.go:1285,1530)") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-d", element = "y", delete = true)))
    assert(out("section-d").map(_("id")) === Seq("x", "z"))
    val empty = overrideConfig(schema, config, Seq(
      Override("section-d", element = "x", delete = true),
      Override("section-d", element = "y", delete = true),
      Override("section-d", element = "z", delete = true)))
    assert(empty("section-d").isEmpty)
    // non-overridden sections still present in the result
    assert(empty("section-a").head("option1") === "o1")
  }

  test("error shapes: unknown option/section, element key rules, validator") {
    def err(os: Override*): String =
      intercept[OverrideException](overrideConfig(schema, config, os)).getMessage
    assert(err(Override("section-a", options = Map("nope" -> "x")))
      .contains("unknown options [nope] in section section-a"))
    assert(err(Override("section-zzz", options = Map("a" -> "b")))
      .contains("unknown section section-zzz"))
    assert(err(Override("section-d", element = "x", options = Map("id" -> "q")))
      .contains("cannot override element key id"))
    assert(err(Override("section-d", create = true, options = Map("option5" -> "v")))
      .contains("element key \"id\" not present in options"))
    assert(err(Override("section-d", create = true, options = Map("id" -> 7L)))
      .contains("type of element key must be a string"))
    assert(err(Override("section-d", create = true, options = Map("id" -> "")))
      .contains("failed validation: ID cannot be empty"))
    // Override.Validate (override.go:51-68)
    assert(err(Override("", options = Map("a" -> "b")))
      .contains("section cannot be empty"))
    assert(err(Override("section-d", delete = true))
      .contains("element cannot be empty if deleting"))
    assert(err(Override("section-d", element = "x", create = true))
      .contains("element must be empty if creating"))
    assert(err(Override("section-d", element = "x", delete = true,
      options = Map("a" -> "b")))
      .contains("cannot delete an element and provide options"))
  }

  test("recursive same-kind container copy (Option6-style nested maps)") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-d", element = "x", options = Map(
        "option6" -> Map("a" -> Map("b" -> 1L), "c" -> Map("d" -> 2L))))))
    assert(out("section-d").find(_("id") == "x").get("option6") ===
      Map("a" -> Map("b" -> 1L), "c" -> Map("d" -> 2L)))
  }

  test("overrides compose on one copy: create then modify then delete") {
    val out = overrideConfig(schema, config, Seq(
      Override("section-d", create = true, options = Map("id" -> "w")),
      Override("section-d", element = "w", options = Map("option5" -> "w-2")),
      Override("section-d", element = "x", delete = true)))
    assert(out("section-d").map(_("id")) === Seq("w", "y", "z"))
    assert(out("section-d").head("option5") === "w-2")
  }
}

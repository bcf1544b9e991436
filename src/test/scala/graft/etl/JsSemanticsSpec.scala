package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import J._

/** JS-semantics helpers: toNum parity with `Number(String(v ?? '')
  * .replace(/[^0-9.\-]/g,''))`, maxNum, and the JSON number formatting of
  * JSON.stringify. */
class JsSemanticsSpec extends AnyFunSuite {

  import AuditEtl.{jsToNum, maxNum}

  test("jsToNum mirrors JS Number() on stripped strings") {
    assert(jsToNum(Some("5")) == 5.0)
    assert(jsToNum(Some("5.")) == 5.0)          // Number('5.') = 5
    assert(jsToNum(Some("-.5")) == -0.5)        // Number('-.5') = -0.5
    assert(jsToNum(Some("007")) == 7.0)
    assert(jsToNum(Some("$1,234.56")) == 1234.56)
    assert(jsToNum(Some("12 apples")) == 12.0)
    assert(jsToNum(Some("")) == 0.0)            // Number('') = 0
    assert(jsToNum(Some("junk")) == 0.0)        // strips to '' -> 0
    assert(jsToNum(None) == 0.0)                // String(undefined ?? '') = ''
    assert(jsToNum(Some("1-2")).isNaN)
    assert(jsToNum(Some("1.2.3")).isNaN)
    assert(jsToNum(Some("-")).isNaN)
    assert(jsToNum(Some(".")).isNaN)
  }

  test("maxNum: max of finite casts, None when nothing is numeric") {
    val rows = Vector(Map("v" -> "10"), Map("v" -> "abc"), Map("v" -> "30"))
    assert(maxNum(rows, "v").contains(30.0))    // 'abc' -> 0, max still 30
    val bad = Vector(Map("v" -> "1-2"), Map("v" -> "."))
    assert(maxNum(bad, "v").isEmpty)
  }

  test("JNum formats like JSON.stringify") {
    assert(JNum(24.0).toJson == "24")
    assert(JNum(0.5).toJson == "0.5")
    assert(JNum(6.3).toJson == "6.3")
    assert(JNum(Double.NaN).toJson == "null")
    assert(JNum(-0.0).toJson == "0")
  }

  test("JStr escapes controls, quotes, backslashes") {
    assert(JStr("a\"b\\c\nd").toJson == "\"a\\\"b\\\\c\\nd\"")
  }
}

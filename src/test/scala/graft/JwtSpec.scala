package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Jwt, JwtKernel, MiniJson}

/** JWT/HMAC pinned against published spec vectors (RFC 4231 HMAC-SHA256
  * test cases; RFC 7515 appendix A.1 HS256 JWS), plus the reference's
  * validation semantics (issuer/audience/expiry + 30 s skew,
  * src/auth_manager.cpp validateJWTToken). */
class JwtSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.GraftSession
    .builder("jwt-spec", "4").getOrCreate()

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("HMAC-SHA256 matches RFC 4231 test cases 1 and 2") {
    val tc1 = JwtKernel.hmac("Hi There".getBytes("UTF-8"),
      Array.fill[Byte](20)(0x0b))
    assert(hex(tc1) ==
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
    val tc2 = JwtKernel.hmac("what do ya want for nothing?".getBytes("UTF-8"),
      "Jefe".getBytes("UTF-8"))
    assert(hex(tc2) ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  // RFC 7515 A.1: exact signing input, key, and HS256 signature
  private val Jws715SigningInput =
    "eyJ0eXAiOiJKV1QiLA0KICJhbGciOiJIUzI1NiJ9" + "." +
    "eyJpc3MiOiJqb2UiLA0KICJleHAiOjEzMDA4MTkzODAsDQogImh0dHA6Ly9leGFt" +
    "cGxlLmNvbS9pc19yb290Ijp0cnVlfQ"
  private val Jws715Key = java.util.Base64.getUrlDecoder.decode(
    "AyM1SysPpbyDfgZld3umj1qzKObwVMkoqQ-EstJQLr_T-1qS0gZH75aKtMN3Yj0iPS4hcgUuTwjAzZr1Z9CAow")
  private val Jws715Sig = "dBjftJeZ4CVP-mB92K27uhbUJU1p1r_wW1gFWFOEjXk"

  test("JWS HS256 signature matches RFC 7515 A.1 — kernel and column paths") {
    assert(JwtKernel.hmacB64Url(
      Jws715SigningInput.getBytes("UTF-8"), Jws715Key) == Jws715Sig)
    // same vector through the codegen'd column expression
    import spark.implicits._
    val got = Seq(Jws715SigningInput).toDF("si")
      .select(Jwt.signature(col("si"), Jws715Key).as("sig"))
      .collect().head.getString(0)
    assert(got == Jws715Sig)
  }

  private val Secret = "a-unit-test-secret-at-least-32-chars!".getBytes("UTF-8")

  test("column round trip: issue → validate; tamper/expiry/skew semantics") {
    import spark.implicits._
    val iat = 1700000000L
    val exp = iat + Jwt.ExpiryHours * 3600L
    val df = Seq(("42", "alice")).toDF("uid", "uname")
      .select(Jwt.issue(col("uid"), col("uname"), lit(iat), lit(exp), Secret)
        .as("token"))
    val token = df.collect().head.getString(0)
    assert(token.count(_ == '.') == 2)

    def validAt(t: String, now: Long): Boolean =
      Seq(t).toDF("t")
        .select(Jwt.isValid(col("t"), Secret, lit(now)).as("v"))
        .collect().head.getBoolean(0)
    def subjectAt(t: String, now: Long): Option[String] = {
      val r = Seq(t).toDF("t")
        .select(Jwt.subject(col("t"), Secret, lit(now)).as("s"))
        .collect().head
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }

    assert(validAt(token, iat + 10))
    assert(subjectAt(token, iat + 10).contains("42"))
    // expiry: within 30 s skew accepted, beyond rejected (reference rule)
    assert(validAt(token, exp + Jwt.SkewSeconds))
    assert(!validAt(token, exp + Jwt.SkewSeconds + 1))
    // tampered payload: flip one char in the middle part
    val parts = token.split("\\.")
    val tampered = parts(0) + "." + parts(1).dropRight(1) +
      (if (parts(1).last == 'A') "B" else "A") + "." + parts(2)
    assert(!validAt(tampered, iat + 10))
    // wrong secret
    val wrong = Seq(token).toDF("t")
      .select(Jwt.isValid(col("t"), "other-secret".getBytes("UTF-8"), lit(iat))
        .as("v")).collect().head.getBoolean(0)
    assert(!wrong)
    // malformed shapes
    assert(!validAt("not-a-token", iat))
    assert(!validAt(parts(0) + "." + parts(1), iat))
  }

  test("JVM mirror agrees with the column path byte-for-byte") {
    import spark.implicits._
    val iat = 1690000000L
    val exp = iat + 3600L
    val colToken = Seq(("u7", "bob")).toDF("uid", "uname")
      .select(Jwt.issue(col("uid"), col("uname"), lit(iat), lit(exp), Secret))
      .collect().head.getString(0)
    val jvmToken = Jwt.issueJvm("u7", "bob", iat, exp, Secret)
    assert(colToken == jvmToken)
    assert(Jwt.subjectJvm(jvmToken, Secret, iat + 5).contains("u7"))
    assert(Jwt.subjectJvm(jvmToken, Secret, exp + 31).isEmpty)
    assert(Jwt.subjectJvm(jvmToken, "x".getBytes, iat).isEmpty)
    assert(Jwt.subjectJvm("a.b", Secret, iat).isEmpty)
  }

  test("issuer/audience claims are enforced") {
    import spark.implicits._
    // hand-build a token with the right signature but wrong issuer
    val badPayload = """{"iss":"intruder","sub":"9","aud":"etl-api","exp":9999999999}"""
    val hp = JwtKernel.b64url(Jwt.HeaderJson.getBytes("UTF-8")) + "." +
      JwtKernel.b64url(badPayload.getBytes("UTF-8"))
    val t = hp + "." + JwtKernel.hmacB64Url(hp.getBytes("UTF-8"), Secret)
    val v = Seq(t).toDF("t")
      .select(Jwt.isValid(col("t"), Secret, lit(0L)).as("v"))
      .collect().head.getBoolean(0)
    assert(!v)
    assert(Jwt.subjectJvm(t, Secret, 0L).isEmpty)
  }

  test("claim values with quotes/backslashes are escaped, not injected") {
    import spark.implicits._
    // a crafted username that would otherwise close the string and add
    // its own claims to the signed payload
    val evil = """u","iss":"intruder","x":"""
    val t = Jwt.issueJvm("7", evil, 1000L, 9999999999L, Secret)
    // the token validates (its payload is well-formed JSON)...
    assert(Jwt.subjectJvm(t, Secret, 2000L).contains("7"))
    // ...and the username round-trips as DATA: the iss claim is still
    // the real issuer, not the injected one
    val payload = new String(java.util.Base64.getUrlDecoder.decode(
      t.split("\\.")(1) + "=" * ((4 - t.split("\\.")(1).length % 4) % 4)), "UTF-8")
    assert(MiniJson.topLevelString(payload, "iss").contains(Jwt.Issuer))
    assert(MiniJson.topLevelString(payload, "username").contains(evil))
    assert(MiniJson.topLevelString(payload, "x").isEmpty)
    // backslash alone must not swallow the closing quote
    val bs = Jwt.issueJvm("8", """trailing\""", 1000L, 9999999999L, Secret)
    assert(Jwt.subjectJvm(bs, Secret, 2000L).contains("8"))
    // column path composes the identical bytes for the same inputs
    val colToken = Seq((evil, "7")).toDF("u", "s")
      .select(Jwt.issue(col("s"), col("u"), lit(1000L), lit(9999999999L),
        Secret).as("t")).collect().head.getString(0)
    assert(colToken == t, "JVM and column escaping diverged")
  }

  test("MiniJson: top-level extraction is depth- and escape-aware") {
    val j = """{"username":"al\"ice","password":"p w","n":42,"ok":true,""" +
      """"nested":{"username":"evil"},"roles":["a","b\"c"]}"""
    assert(MiniJson.topLevelString(j, "username").contains("al\"ice"))
    assert(MiniJson.topLevelString(j, "password").contains("p w"))
    assert(MiniJson.topLevelLong(j, "n").contains(42L))
    assert(MiniJson.topLevelBoolean(j, "ok").contains(true))
    assert(MiniJson.topLevelStringArray(j, "roles").contains(Seq("a", "b\"c")))
    // nested key is not top-level; string-typed number rejected by Long
    assert(MiniJson.topLevelString(j, "missing").isEmpty)
    assert(MiniJson.topLevelLong("""{"n":"42"}""", "n").isEmpty)
    assert(MiniJson.topLevelString("""{"a":{"username":"x"}}""", "username").isEmpty)
    // unicode escape
    assert(MiniJson.topLevelString("""{"u":"A"}""", "u").contains("A"))
  }
}

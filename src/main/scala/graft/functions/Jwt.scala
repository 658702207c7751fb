package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JWT bearer tokens (HS256) as column expressions — the reference's
  * AuthManager token path (reference: include/auth_manager.hpp:67-75,
  * src/auth_manager.cpp generateJWTToken/validateJWTToken): issuer
  * `etl-backend`, audience `etl-api`, subject = user id, HMAC-SHA256
  * signature, and expiry checked with the reference's 30 s clock-skew
  * tolerance.
  *
  * Spark shape: the only primitive Spark lacks is HMAC-SHA256, so that —
  * and only that — is a custom codegen'd expression
  * ([[HmacSha256B64UrlExpr]], pinned against the JWS spec's published
  * HS256 test vector in JwtSpec). Everything else is declarative:
  * base64url is `base64`+`translate`, claims come back out through
  * `get_json_object`, and verification composes those — so issuing or
  * validating tokens for a billion sessions is one narrow projection,
  * no UDF, no driver loop.
  */
object Jwt {

  val Issuer = "etl-backend"
  val Audience = "etl-api"
  /** Reference: validateJWTToken allows 30 s clock skew. */
  val SkewSeconds = 30
  /** Reference: getJWTExpiryHours default (24 h, same as sessions). */
  val ExpiryHours = 24

  val HeaderJson = """{"alg":"HS256","typ":"JWT"}"""

  /** base64url (RFC 4648 §5, no padding) of a binary column. */
  def b64url(bin: Column): Column =
    translate(regexp_replace(base64(bin), "[=\r\n]", ""), "+/", "-_")

  /** base64url of a string column's UTF-8 bytes. */
  def b64urlString(s: Column): Column = b64url(s.cast("binary"))

  /** Decode base64url back to a UTF-8 string. `unbase64` tolerates the
    * missing padding (MIME decoder). */
  def unb64urlString(s: Column): Column =
    unbase64(translate(s, "-_", "+/")).cast("string")

  /** base64url(HMAC-SHA256(data, secret)) — the JWS HS256 signature. */
  def signature(signingInput: Column, secret: Array[Byte]): Column =
    Bridge.column(HmacSha256B64UrlExpr(
      Bridge.expression(signingInput), Bridge.expression(lit(secret))))

  /** JSON string escape for interpolated claim values — without it a
    * username containing a quote or backslash yields malformed payload
    * JSON and lets a crafted users-table row inject extra claims into
    * its own signed token. Same two-char rule in the column and JVM
    * paths so both compose identical bytes for identical inputs. */
  private def jsonEscaped(c: Column): Column =
    org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(c, lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\""))

  private def jsonEscapedJvm(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Canonical payload JSON for the reference's claim set. Field order is
    * fixed so the oracle can recompose the identical bytes. */
  def payloadJson(sub: Column, username: Column, iatEpoch: Column,
      expEpoch: Column): Column =
    concat(
      lit(s"""{"iss":"$Issuer","sub":""""), jsonEscaped(sub),
      lit(s"""","aud":"$Audience","iat":"""), iatEpoch.cast("long"),
      lit(""","exp":"""), expEpoch.cast("long"),
      lit(""","username":""""), jsonEscaped(username), lit("\"}"))

  /** Issue a token: b64url(header).b64url(payload).b64url(sig)
    * (reference: src/auth_manager.cpp generateJWTToken). */
  def issue(sub: Column, username: Column, iatEpoch: Column,
      expEpoch: Column, secret: Array[Byte]): Column = {
    val hp = concat(b64urlString(lit(HeaderJson)), lit("."),
      b64urlString(payloadJson(sub, username, iatEpoch, expEpoch)))
    concat(hp, lit("."), signature(hp, secret))
  }

  private def part(token: Column, i: Int): Column =
    element_at(split(token, "\\."), i)

  /** Decoded payload JSON of a (not yet verified) token. */
  def payload(token: Column): Column = unb64urlString(part(token, 2))

  def claim(token: Column, name: String): Column =
    get_json_object(payload(token), s"$$.$name")

  /** Full validation (reference: src/auth_manager.cpp validateJWTToken):
    * three-part shape, signature over header.payload, issuer, audience,
    * and expiry with 30 s skew (a missing exp claim is accepted, as in
    * the reference). True only if every check passes. */
  def isValid(token: Column, secret: Array[Byte], nowEpoch: Column): Column = {
    val parts = split(token, "\\.")
    val hp = concat(element_at(parts, 1), lit("."), element_at(parts, 2))
    val exp = claim(token, "exp").cast("long")
    (size(parts) === 3) &&
      (element_at(parts, 3) === signature(hp, secret)) &&
      (claim(token, "iss") === Issuer) &&
      (claim(token, "aud") === Audience) &&
      (exp.isNull || nowEpoch.cast("long") <= exp + SkewSeconds)
  }

  /** Validated subject: the user id when [[isValid]], else null —
    * the reference returns optional<userId> the same way. */
  def subject(token: Column, secret: Array[Byte], nowEpoch: Column): Column =
    when(isValid(token, secret, nowEpoch), claim(token, "sub"))

  // ---- driver-side mirrors for the HTTP edge (one token per request;
  // same kernel as the column path, so the spec vectors pin both) ----

  def issueJvm(sub: String, username: String, iatEpoch: Long, expEpoch: Long,
      secret: Array[Byte]): String = {
    val payload =
      s"""{"iss":"$Issuer","sub":"${jsonEscapedJvm(sub)}","aud":"$Audience",""" +
      s""""iat":$iatEpoch,"exp":$expEpoch,"username":"${jsonEscapedJvm(username)}"}"""
    val hp = JwtKernel.b64url(HeaderJson.getBytes("UTF-8")) + "." +
      JwtKernel.b64url(payload.getBytes("UTF-8"))
    hp + "." + JwtKernel.hmacB64Url(hp.getBytes("UTF-8"), secret)
  }

  /** Validated subject, or None (shape/signature/claims/expiry). */
  def subjectJvm(token: String, secret: Array[Byte], nowEpoch: Long): Option[String] = {
    val parts = token.split("\\.", -1)
    if (parts.length != 3) return None
    val sig = JwtKernel.hmacB64Url((parts(0) + "." + parts(1)).getBytes("UTF-8"), secret)
    if (!java.security.MessageDigest.isEqual(
        sig.getBytes("UTF-8"), parts(2).getBytes("UTF-8"))) return None
    val payload = try new String(
      java.util.Base64.getUrlDecoder.decode(padB64(parts(1))), "UTF-8")
      catch { case _: IllegalArgumentException => return None }
    def str(k: String) = MiniJson.topLevelString(payload, k)
    if (!str("iss").contains(Issuer) || !str("aud").contains(Audience)) return None
    MiniJson.topLevelLong(payload, "exp") match {
      case Some(exp) if nowEpoch > exp + SkewSeconds => None
      case _ => str("sub")
    }
  }

  private def padB64(s: String): String =
    s + "=" * ((4 - s.length % 4) % 4)
}

/** The one non-declarative primitive: HMAC-SHA256 → base64url. Left is
  * the UTF-8 signing input (string), right the raw key bytes (binary).
  * Real `doGenCode` via a static kernel call (CompressionRatioExpr
  * pattern) keeps the enclosing projection in WholeStageCodegen. */
case class HmacSha256B64UrlExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256_b64url"
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : HmacSha256B64UrlExpr = copy(left = l, right = r)

  override def nullSafeEval(data: Any, key: Any): Any =
    JwtKernel.hmacUtf8(data.asInstanceOf[UTF8String], key.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, k) =>
      s"${ev.value} = graft.functions.JwtKernel$$.MODULE$$.hmacUtf8($d, $k);")
}

object JwtKernel {
  def hmac(data: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def b64url(bytes: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(bytes)

  def hmacB64Url(data: Array[Byte], key: Array[Byte]): String =
    b64url(hmac(data, key))

  def hmacUtf8(data: UTF8String, key: Array[Byte]): UTF8String =
    UTF8String.fromString(hmacB64Url(data.getBytes, key))
}

/** Minimal top-level JSON field extraction for control-plane request and
  * token payloads — depth/string-aware scan (never fooled by nested
  * objects or values containing braces); not a general JSON parser. */
object MiniJson {

  /** Raw token (string content unescaped for common escapes, or the
    * literal for numbers/booleans) of a top-level key. */
  def topLevelToken(json: String, key: String): Option[String] = {
    val n = json.length
    var i = 0
    var depth = 0
    while (i < n) {
      json.charAt(i) match {
        case '"' =>
          val sb = new StringBuilder
          var j = i + 1
          while (j < n && json.charAt(j) != '"') {
            if (json.charAt(j) == '\\' && j + 1 < n) {
              json.charAt(j + 1) match {
                case '"' => sb.append('"'); j += 2
                case '\\' => sb.append('\\'); j += 2
                case 'n' => sb.append('\n'); j += 2
                case 't' => sb.append('\t'); j += 2
                case 'r' => sb.append('\r'); j += 2
                case '/' => sb.append('/'); j += 2
                case 'u' if j + 5 < n =>
                  try { sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar); j += 6 }
                  catch { case _: NumberFormatException => sb.append(json.charAt(j)); j += 1 }
                case c => sb.append(c); j += 2
              }
            } else { sb.append(json.charAt(j)); j += 1 }
          }
          val s = sb.toString
          i = j + 1
          if (depth == 1 && s == key) {
            var k = i
            while (k < n && json.charAt(k).isWhitespace) k += 1
            if (k < n && json.charAt(k) == ':') {
              k += 1
              while (k < n && json.charAt(k).isWhitespace) k += 1
              if (k >= n) return None
              if (json.charAt(k) == '"') {
                // string value: decode with the same escape rules
                val vb = new StringBuilder
                var m = k + 1
                while (m < n && json.charAt(m) != '"') {
                  if (json.charAt(m) == '\\' && m + 1 < n) {
                    json.charAt(m + 1) match {
                      case '"' => vb.append('"'); m += 2
                      case '\\' => vb.append('\\'); m += 2
                      case 'n' => vb.append('\n'); m += 2
                      case 't' => vb.append('\t'); m += 2
                      case 'r' => vb.append('\r'); m += 2
                      case '/' => vb.append('/'); m += 2
                      case 'u' if m + 5 < n =>
                        try { vb.append(Integer.parseInt(json.substring(m + 2, m + 6), 16).toChar); m += 6 }
                        catch { case _: NumberFormatException => vb.append(json.charAt(m)); m += 1 }
                      case c => vb.append(c); m += 2
                    }
                  } else { vb.append(json.charAt(m)); m += 1 }
                }
                return Some(vb.toString)
              } else {
                var m = k
                while (m < n && !",}]".contains(json.charAt(m))) m += 1
                return Some(json.substring(k, m).trim)
              }
            }
          }
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case _ => i += 1
      }
    }
    None
  }

  /** Top-level STRING field (quoted values only). */
  def topLevelString(json: String, key: String): Option[String] =
    topLevelTokenWithKind(json, key) match {
      case Some((v, true)) => Some(v)
      case _ => None
    }

  def topLevelLong(json: String, key: String): Option[Long] =
    topLevelTokenWithKind(json, key) match {
      case Some((v, false)) => v.toLongOption
      case _ => None
    }

  def topLevelStringArray(json: String, key: String): Option[Seq[String]] =
    topLevelTokenWithKind(json, key, raw = true) match {
      case Some((v, _)) if v.startsWith("[") =>
        Some("\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(v)
          .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq)
      case _ => None
    }

  def topLevelBoolean(json: String, key: String): Option[Boolean] =
    topLevelTokenWithKind(json, key) match {
      case Some(("true", false)) => Some(true)
      case Some(("false", false)) => Some(false)
      case _ => None
    }

  /** Like topLevelToken but reports whether the value was quoted; with
    * raw=true an array/object value is returned as its raw source span. */
  private def topLevelTokenWithKind(json: String, key: String,
      raw: Boolean = false): Option[(String, Boolean)] = {
    val n = json.length
    var i = 0
    var depth = 0
    while (i < n) {
      json.charAt(i) match {
        case '"' =>
          val start = i + 1
          var j = start
          var escaped = false
          while (j < n && (escaped || json.charAt(j) != '"')) {
            escaped = !escaped && json.charAt(j) == '\\'
            j += 1
          }
          val s = json.substring(start, math.min(j, n))
          i = j + 1
          if (depth == 1 && s == key) {
            var k = i
            while (k < n && json.charAt(k).isWhitespace) k += 1
            if (k < n && json.charAt(k) == ':') {
              k += 1
              while (k < n && json.charAt(k).isWhitespace) k += 1
              if (k >= n) return None
              if (json.charAt(k) == '"') {
                return topLevelToken(json, key).map((_, true))
              } else if (raw && (json.charAt(k) == '[' || json.charAt(k) == '{')) {
                // raw span of a bracketed value
                var m = k
                var d = 0
                var inStr = false
                var esc = false
                while (m < n) {
                  val c = json.charAt(m)
                  if (inStr) {
                    if (esc) esc = false
                    else if (c == '\\') esc = true
                    else if (c == '"') inStr = false
                  } else c match {
                    case '"' => inStr = true
                    case '[' | '{' => d += 1
                    case ']' | '}' =>
                      d -= 1
                      if (d == 0) return Some((json.substring(k, m + 1), false))
                    case _ => ()
                  }
                  m += 1
                }
                return None
              } else {
                var m = k
                while (m < n && !",}]".contains(json.charAt(m))) m += 1
                return Some((json.substring(k, m).trim, false))
              }
            }
          }
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case _ => i += 1
      }
    }
    None
  }
}

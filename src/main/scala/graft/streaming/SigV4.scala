package graft.streaming

/** AWS Signature Version 4 request signing — the credential scheme the
  * CLOUDWATCH log-ship transport needs (PutLogEvents is a SigV4-signed
  * JSON POST; reference transport: src/log_aggregator.cpp CLOUDWATCH
  * branch). Implemented from the public signing specification with the
  * JDK's HmacSHA256/SHA-256 only; the spec's own published example
  * request is the test vector (SigV4Spec).
  *
  * Scope: single-chunk signing with an empty or pre-canonicalized query
  * string — what a log PUT needs. Chunked/streaming signatures and
  * query-string presigning are out of scope. */
object SigV4 {

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  def sha256Hex(s: String): String =
    hex(java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")))

  /** kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    * service), "aws4_request") */
  private def signingKey(secret: String, dateStamp: String, region: String,
      service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes("UTF-8"), dateStamp),
      region), service), "aws4_request")

  /** The Authorization header for one request.
    *
    * `headers` must include `host` and `x-amz-date`; names are
    * lowercased and sorted here (the canonical form), values taken
    * as-is (callers pass trimmed single-line values).
    * `canonicalQuery` must already be RFC 3986 canonical ("" for POST
    * bodies). `amzDate` is `yyyyMMdd'T'HHmmss'Z'`. */
  def authorization(method: String, canonicalUri: String,
      canonicalQuery: String, headers: Seq[(String, String)],
      payload: String, accessKey: String, secretKey: String,
      region: String, service: String, amzDate: String): String = {
    val dateStamp = amzDate.take(8)
    val sorted = headers.map { case (k, v) => (k.toLowerCase, v) }
      .sortBy(_._1)
    val canonicalHeaders = sorted.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sorted.map(_._1).mkString(";")
    val canonicalRequest = Seq(method, canonicalUri, canonicalQuery,
      canonicalHeaders, signedHeaders, sha256Hex(payload)).mkString("\n")
    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest)).mkString("\n")
    val signature =
      hex(hmac(signingKey(secretKey, dateStamp, region, service), stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }
}

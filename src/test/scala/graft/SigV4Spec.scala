package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SigV4

/** SigV4 against the signing specification's own published example
  * request (GET iam ListUsers, 20150830T123600Z, the EXAMPLE key pair) —
  * the canonical cross-implementation test vector. */
class SigV4Spec extends AnyFunSuite {

  test("published AWS doc example vector signs bit-for-bit") {
    val auth = SigV4.authorization(
      method = "GET",
      canonicalUri = "/",
      canonicalQuery = "Action=ListUsers&Version=2010-05-08",
      headers = Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      payload = "",
      accessKey = "AKIDEXAMPLE",
      secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      region = "us-east-1",
      service = "iam",
      amzDate = "20150830T123600Z")
    assert(auth == "AWS4-HMAC-SHA256 " +
      "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, " +
      "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }
}

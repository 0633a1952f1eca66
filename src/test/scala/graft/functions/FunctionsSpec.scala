package graft.functions

import graft.SparkSpec
import graft.ingest.{EncryptedObject, Envelope, Zlib}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.util.Base64

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import CompressionFunctions._
  import EnvelopeFunctions._
  import VectorFunctions._

  test("zlib expressions round-trip and interop with the plain Scala implementation") {
    import spark.implicits._
    val data = Seq((1L, ("abc" * 1000).getBytes), (2L, Array.emptyByteArray)).toDF("id", "payload")
    val out = data
      .select($"id", $"payload", zlib_compress($"payload").as("z"))
      .select($"id", $"payload", $"z", zlib_decompress($"z").as("back"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Array[Byte]]("back").sameElements(r.getAs[Array[Byte]]("payload")))
      // cross-check: expression output inflates with the plain implementation
      assert(Zlib.decompress(r.getAs[Array[Byte]]("z")).sameElements(r.getAs[Array[Byte]]("payload")))
    }
  }

  test("vector kernels match driver-side math") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val row = df.select(dot_product($"a", $"b").as("d"), cosine_similarity($"a", $"b").as("c")).head()
    assert(row.getDouble(0) == 32.0)
    val expect = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(row.getDouble(1) - expect) < 1e-12)
  }

  test("envelope_encrypt expression: struct shape, fresh keys per row, decryptable") {
    import spark.implicits._
    val (pub, priv) = Envelope.generateKeyPair()
    val pubB64 = Base64.getEncoder.encodeToString(pub.getEncoded)
    val df = Seq((1L, "secret-one".getBytes), (2L, "secret-one".getBytes)).toDF("id", "payload")
    val rows = df
      .select($"id", envelope_encrypt(zlib_compress($"payload"), pubB64, "kid-9").as("env"))
      .select($"id", $"env.data", $"env.iv", $"env.wrapped_key", $"env.key_id")
      .collect()
      .sortBy(_.getLong(0))
    assert(rows.forall(_.getString(4) == "kid-9"))
    // same plaintext, fresh key+nonce per row
    assert(rows(0).getString(2) != rows(1).getString(2))
    assert(!rows(0).getAs[Array[Byte]](1).sameElements(rows(1).getAs[Array[Byte]](1)))
    rows.foreach { r =>
      val obj = EncryptedObject(
        r.getAs[Array[Byte]](1),
        Map("iv" -> r.getString(2), "ciphertext" -> r.getString(3), "datakeyencryptionkeyid" -> r.getString(4))
      )
      assert(new String(Zlib.decompress(Envelope.decrypt(obj, priv))) == "secret-one")
    }
  }

  test("envelope_decrypt expression inverts envelope_encrypt (GCM) column-to-column") {
    import spark.implicits._
    val (pub, priv) = Envelope.generateKeyPair()
    val pubB64 = Base64.getEncoder.encodeToString(pub.getEncoded)
    val privB64 = Base64.getEncoder.encodeToString(priv.getEncoded)
    val out = Seq((1L, "alpha".getBytes), (2L, Array.emptyByteArray))
      .toDF("id", "payload")
      .select($"id", $"payload", envelope_decrypt(envelope_encrypt($"payload", pubB64, "kid"), privB64).as("back"))
      .collect()
      .sortBy(_.getLong(0))
    assert(out.forall(r => r.getAs[Array[Byte]](1).sameElements(r.getAs[Array[Byte]](2))))
  }

  test("envelope_decrypt handles EAX objects and metadata-map input (the graft-objects read shape)") {
    import spark.implicits._
    val (pub, priv) = Envelope.generateKeyPair()
    val privB64 = Base64.getEncoder.encodeToString(priv.getEncoded)
    // EAX objects produced by the batch ingest path (driver-side encrypt),
    // presented as the (data, metadata map) read schema.
    val objs = Seq("one", "two").zipWithIndex.map { case (s, i) =>
      val o = Envelope.encrypt(s.getBytes, pub, "kid", Envelope.AesMode.Eax)
      (i.toLong, o.ciphertext, o.metadata)
    }
    val back = objs
      .toDF("id", "data", "metadata")
      .select($"id", envelope_decrypt(encrypted_object($"data", $"metadata"), privB64, "eax").as("plain"))
      .collect()
      .sortBy(_.getLong(0))
      .map(r => new String(r.getAs[Array[Byte]](1)))
    assert(back.sameElements(Array("one", "two")))
  }

  test("nearest_centroid: argmax-cosine with lowest-id ties, and a NaN embedding ranks " +
    "GREATEST with the lowest id (the old array_max struct ordering) — never a sentinel cell") {
    import spark.implicits._
    val cents: Array[(Int, Array[Float])] = Array(
      3 -> Array(1f, 0f), 7 -> Array(0f, 1f), 5 -> Array(1f, 0f))
    val df = Seq(
      (1L, Seq(0.9f, 0.1f)),          // nearest = x-axis; ids 3 and 5 tie -> 3
      (2L, Seq(0.1f, 0.9f)),          // nearest = y-axis -> 7
      (3L, Seq(Float.NaN, 0.5f))      // corrupt: every cosine NaN -> lowest id 3
    ).toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
      nearest_centroid($"embedding", cents).getField("cluster").as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 7, 3L -> 3), s"got $got")
  }
}

package graft.storage

import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** At-rest encryption for array-tables (reference:
  * tiledb/array.py:304-305,398-431 `Array.create(key=)` /
  * `sm.encryption_key` — AES-256-GCM over every array file).
  *
  * Spark-first mapping, two layers with ONE key registry:
  *
  *  - **Fragment data** → Parquet modular encryption (AES-GCM-V1,
  *    uniform mode: footer + every column encrypted under the array's
  *    key). This is the published Spark columnar-encryption path —
  *    `parquet.crypto.factory.class` + a pluggable
  *    [[org.apache.parquet.crypto.keytools.KmsClient]] — so data
  *    pages, dictionary pages, column statistics and the footer are
  *    all ciphertext, and decryption happens inside the vectorized
  *    parquet reader with zero extra copies. Key wrapping is
  *    [[GraftKmsClient]] (local AES-GCM wrap of the per-file data
  *    keys under the registered master key); production swaps a real
  *    KMS-backed client via the same
  *    `parquet.encryption.kms.client.class` property without touching
  *    this library.
  *  - **Sidecars that carry user data** (fragment manifests with MBR
  *    coordinate values, metadata KV, delete conditions, schema JSON)
  *    → AES-256-GCM envelopes written by [[encrypt]]/[[decrypt]]
  *    with a random 96-bit IV per file and the array-relative file
  *    role bound as GCM AAD (a manifest ciphertext pasted over a
  *    metadata file fails authentication instead of decoding).
  *
  * The registry is session-level configuration — the analogue of the
  * reference's ctx-config `sm.encryption_key`: [[enable]] stores
  * `keyId:base64` pairs in the session Hadoop configuration, which
  * Spark ships to executors with each scan/write job over its
  * encrypted RPC. Keys are NEVER written to any array file: the array
  * records only the key NAME (`_encryption.json`), and `LEAKCHECK`
  * stays clean because key bytes exist only in session config and
  * process memory.
  *
  * Wrong key / missing key behavior: parquet footer decryption fails
  * with a GCM tag mismatch (loud, not garbage rows), and the sidecar
  * layer raises the descriptive errors in [[requireKey]] /
  * [[decrypt]] before any data read is attempted. */
object Encryption {

  /** Session property holding the key registry: `keyId:base64key`
    * pairs, comma-separated. Same shape as the published Spark
    * columnar-encryption examples. */
  val KeyListProp = "graft.encryption.key.list"

  val CryptoFactoryProp = "parquet.crypto.factory.class"
  val KmsClientProp = "parquet.encryption.kms.client.class"
  val UniformKeyProp = "parquet.encryption.uniform.key"

  /** The marker file at the array root. Holds the cipher name and the
    * key NAME only — never key material. */
  val MarkerFile = "_encryption.json"

  private val rng = new SecureRandom()

  /** Register master keys for this session and install the parquet
    * modular-encryption machinery on the session Hadoop conf. 32-byte
    * keys only (AES-256, matching the reference's key-length check —
    * tiledb libtiledb rejects non-256-bit keys the same way). Safe to
    * call repeatedly; later calls replace the registry.
    *
    * Re-keying semantics: the cache flush below reaches THIS JVM only.
    * On a multi-executor cluster, executors hold their own static
    * parquet key caches for up to
    * `parquet.encryption.cache.lifetime.seconds` (default 600), so
    * REPLACING the material under an existing key id takes up to that
    * long to propagate. Rotate by introducing a NEW key id instead
    * (the caches are id-keyed, so a new id can never hit stale
    * material) — which is also what re-encrypting existing data
    * requires anyway. */
  def enable(spark: SparkSession, keys: Map[String, Array[Byte]]): Unit = {
    require(keys.nonEmpty, "Encryption.enable needs at least one key")
    keys.foreach { case (id, k) =>
      require(id.nonEmpty && !id.contains(':') && !id.contains(','),
        s"key id '$id' must be non-empty and contain no ':' or ','")
      require(k.length == 32,
        s"key '$id' must be exactly 32 bytes (AES-256), got ${k.length}")
    }
    // flush parquet's JVM-wide unwrapped-key + KMS-client caches:
    // without this a re-enable with different key material keeps
    // decrypting through the previously cached keys (stale client
    // snapshots of the session conf) for up to the 10-minute cache
    // lifetime. Driver-JVM only (covers local[*] fully); see the
    // scaladoc for cluster re-key semantics — rotate via NEW key ids
    org.apache.parquet.crypto.keytools.KeyToolkit.removeCacheEntriesForAllTokens()
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set(CryptoFactoryProp,
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory")
    conf.set(KmsClientProp, "graft.storage.GraftKmsClient")
    conf.set(KeyListProp, keys.map { case (id, k) =>
      s"$id:${Base64.getEncoder.encodeToString(k)}" }.mkString(","))
  }

  /** Convenience: register a single key given as a UTF-8 passphrase of
    * exactly 32 bytes (the reference's `key="0123..."` idiom). */
  def enable(spark: SparkSession, keyId: String, key: String): Unit =
    enable(spark, Map(keyId -> key.getBytes(StandardCharsets.UTF_8)))

  /** The session key registry (empty when encryption was never
    * enabled). */
  def sessionKeys(conf: Configuration): Map[String, Array[Byte]] =
    Option(conf.get(KeyListProp)).filter(_.nonEmpty).map {
      _.split(',').map { pair =>
        val i = pair.indexOf(':')
        require(i > 0, s"malformed $KeyListProp entry: $pair")
        pair.substring(0, i) -> Base64.getDecoder.decode(pair.substring(i + 1))
      }.toMap
    }.getOrElse(Map.empty)

  /** The master key for `keyId`, or a descriptive failure naming the
    * remedy — raised BEFORE any parquet read so "array is encrypted
    * and this session has no key" is a one-line error, not a GCM
    * stack trace. */
  def requireKey(conf: Configuration, keyId: String, uri: String): Array[Byte] =
    sessionKeys(conf).getOrElse(keyId, sys.error(
      s"array at $uri is encrypted with key '$keyId' but this session has no " +
        s"such key; call graft.storage.Encryption.enable(spark, ...) first"))

  /** Parquet write options that turn on uniform modular encryption for
    * one fragment write (footer + all columns under `keyId`). */
  def writeOptions(keyId: String): Map[String, String] = Map(
    CryptoFactoryProp ->
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
    KmsClientProp -> "graft.storage.GraftKmsClient",
    UniformKeyProp -> keyId)

  // ------------------------- derived-artifact (index) dir encryption

  /** Persisted derived artifacts — BM25 postings (raw terms), dedup
    * signature indexes, ANN cells/centroids (embeddings) — live
    * OUTSIDE an array root but still hold user data, so they carry
    * their own `_encryption.json` marker. Builders mark the dir once;
    * every later write (append, compact, generation flip) resolves
    * the key from the marker, so incremental maintenance inherits
    * encryption without re-passing the key. No process cache: these
    * dirs are deleted and rebuilt wholesale. */
  def markDir(spark: SparkSession, uri: String, keyId: String): Unit = {
    requireKey(spark.sparkContext.hadoopConfiguration, keyId, uri)
    val fs = VFS(spark)
    fs.mkdirs(uri)
    fs.writeString(s"$uri/$MarkerFile",
      s"""{"cipher":"AES_256_GCM","key_id":"$keyId"}""")
  }

  def dirKeyId(spark: SparkSession, uri: String): Option[String] = {
    val p = s"$uri/$MarkerFile"
    val fs = VFS(spark)
    if (!fs.exists(p)) None
    else graft.core.Json.parse(fs.readString(p)).obj("key_id").map(_.str)
  }

  def dirKey(spark: SparkSession, uri: String): Option[Array[Byte]] =
    dirKeyId(spark, uri).map(id =>
      requireKey(spark.sparkContext.hadoopConfiguration, id, uri))

  /** Parquet write options for a (possibly) marked dir — empty map for
    * plaintext dirs, so callers chain it unconditionally. */
  def dirWriteOptions(spark: SparkSession, uri: String): Map[String, String] =
    dirKeyId(spark, uri).map(writeOptions).getOrElse(Map.empty)

  /** The single encrypt-or-plain text-file writer every sidecar layer
    * (array sidecars, profile sketch params, index stats/codebooks)
    * funnels through — key resolution differs per layer, the envelope
    * does not. */
  def envelopeWrite(spark: SparkSession, key: Option[Array[Byte]],
      path: String, role: String, content: String): Unit = key match {
    case Some(k) => VFS(spark).writeBytes(path, encryptString(k, content, role))
    case None => VFS(spark).writeString(path, content)
  }

  def envelopeRead(spark: SparkSession, key: Option[Array[Byte]],
      path: String, role: String): String = key match {
    case Some(k) => decryptString(k, VFS(spark).readBytes(path), role)
    case None => VFS(spark).readString(path)
  }

  /** JSON sidecars of a marked dir (stats, params, centroids,
    * codebooks) ride the same AES-GCM envelope with role "index". */
  def dirJsonWrite(spark: SparkSession, uri: String, path: String,
      content: String): Unit =
    envelopeWrite(spark, dirKey(spark, uri), path, "index", content)

  def dirJsonRead(spark: SparkSession, uri: String, path: String): String =
    envelopeRead(spark, dirKey(spark, uri), path, "index")

  // ------------------------------------------------- sidecar envelope

  private val Magic = "GFT1".getBytes(StandardCharsets.US_ASCII)

  /** AES-256-GCM envelope: magic || 12-byte IV || ciphertext+tag, with
    * `aad` (the file's role, e.g. "manifest") authenticated. */
  def encrypt(key: Array[Byte], plain: Array[Byte], aad: String): Array[Byte] = {
    val iv = new Array[Byte](12)
    rng.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, iv))
    c.updateAAD(aad.getBytes(StandardCharsets.UTF_8))
    val ct = c.doFinal(plain)
    val out = new Array[Byte](Magic.length + 12 + ct.length)
    System.arraycopy(Magic, 0, out, 0, Magic.length)
    System.arraycopy(iv, 0, out, Magic.length, 12)
    System.arraycopy(ct, 0, out, Magic.length + 12, ct.length)
    out
  }

  def decrypt(key: Array[Byte], bytes: Array[Byte], aad: String): Array[Byte] = {
    require(bytes.length > Magic.length + 12 &&
      bytes.startsWith(Magic), "not an encrypted graft sidecar (bad magic)")
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, bytes, Magic.length, 12))
    c.updateAAD(aad.getBytes(StandardCharsets.UTF_8))
    try c.doFinal(bytes, Magic.length + 12, bytes.length - Magic.length - 12)
    catch {
      case e: javax.crypto.AEADBadTagException => sys.error(
        s"sidecar decryption failed (wrong key, or $aad content tampered): $e")
    }
  }

  def encryptString(key: Array[Byte], s: String, aad: String): Array[Byte] =
    encrypt(key, s.getBytes(StandardCharsets.UTF_8), aad)

  def decryptString(key: Array[Byte], bytes: Array[Byte], aad: String): String =
    new String(decrypt(key, bytes, aad), StandardCharsets.UTF_8)
}

/** The pluggable key-wrapping client behind parquet modular
  * encryption: wraps each file's random data keys under the master
  * key registered by [[Encryption.enable]] (local AES-GCM wrap — the
  * wrapped keys travel inside the parquet footer key material, so no
  * extra key files exist on disk). A production deployment replaces
  * this class via `parquet.encryption.kms.client.class` with one that
  * calls a real KMS; the array format is unchanged. */
class GraftKmsClient
    extends org.apache.parquet.crypto.keytools.LocalWrapKmsClient {

  override protected def initializeInternal(): Unit = ()

  override protected def getMasterKeyFromServer(keyId: String): Array[Byte] =
    Encryption.sessionKeys(hadoopConfiguration).getOrElse(keyId,
      throw new org.apache.parquet.crypto.KeyAccessDeniedException(
        s"no key '$keyId' in session registry (${Encryption.KeyListProp}); " +
          "call graft.storage.Encryption.enable(spark, ...)"))
}

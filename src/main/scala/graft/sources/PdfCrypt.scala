package graft.sources

/** PDF standard security handler — ISO 32000-1 §7.6.3 (public spec),
  * Algorithms 1–5: RC4 (`/V 1`/`/V 2`) and AES-128-CBC (`/V 4` with
  * `/CFM /AESV2`) string/stream encryption, the two ciphers that
  * cover essentially every encrypted PDF a crawl encounters below
  * PDF 2.0.
  *
  * A crawl pipeline only ever holds the EMPTY user password (the
  * "encrypted for DRM, readable by anyone" case that dominates the
  * wild); [[PdfOps]] derives the file key from it and verifies the
  * `/U` entry, failing closed (null text) when a real password would
  * be required. Closes the last PDF non-goal (encryption) left by
  * rounds 7–8; reference scope: the reference engine has no document
  * parsing surface at all (LLM-pipeline brief addition).
  *
  * Everything here is from the published ISO algorithm text: the
  * 32-byte padding constant, MD5 key schedule with the 50-round
  * strengthening for `/R 3+`, per-object keys salted with the object
  * number (and `sAlT` for AES), CBC with a per-stream IV prefix. */
private[graft] object PdfCrypt {

  /** The 32-byte password padding constant (ISO 32000-1 Table 3.1). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 stream cipher (public design; ~10 lines by construction). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s(((s(x) & 0xff) + (s(y) & 0xff)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Password padded/truncated to exactly 32 bytes (Algorithm 2 step a). */
  def padPassword(pwd: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(pwd.length, 32)
    System.arraycopy(pwd, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  private def intLE(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: the file encryption key from the (user) password.
    * `keyLen` in BYTES (Length/8; 5 for 40-bit, 16 for 128-bit). */
  def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int,
              id0: Array[Byte], r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(padPassword(userPwd), o, intLE(p), id0)
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        h = md5(java.util.Arrays.copyOf(h, keyLen)); i += 1
      }
    }
    java.util.Arrays.copyOf(h, keyLen)
  }

  /** Algorithm 3: the `/O` entry (owner password; user pwd recovery). */
  def ownerValue(ownerPwd: Array[Byte], userPwd: Array[Byte],
                 r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(padPassword(ownerPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val key = java.util.Arrays.copyOf(h, keyLen)
    var v = rc4(key, padPassword(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        v = rc4(key.map(b => (b ^ i).toByte), v); i += 1
      }
    }
    v
  }

  /** Algorithms 4 (R2) / 5 (R3+): the `/U` entry from the file key.
    * Always 32 bytes; for R3+ only the first 16 are significant. */
  def userValue(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var v = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        v = rc4(key.map(b => (b ^ i).toByte), v); i += 1
      }
      java.util.Arrays.copyOf(v, 32) // 16 significant + 16 zero pad
    }

  /** Algorithm 1: the per-object key — MD5(fileKey ‖ objNum
    * low-3-LE ‖ gen low-2-LE ‖ "sAlT" when AES), truncated to
    * min(keyLen+5, 16). */
  def objectKey(fileKey: Array[Byte], objNum: Int, gen: Int,
                aes: Boolean): Array[Byte] = {
    val salt = Array[Byte](
      (objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
      ((objNum >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val aesSalt =
      if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
      else Array.emptyByteArray
    val h = md5(fileKey, salt, aesSalt)
    java.util.Arrays.copyOf(h, math.min(fileKey.length + 5, 16))
  }

  /** AES-128-CBC encrypt; the stored form is IV ‖ ciphertext
    * (ISO 32000-1 §7.6.2: "the block cipher ... with a 16-byte random
    * initialization vector prepended"). PKCS#7 block padding, which
    * the JDK names PKCS5Padding. */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte],
                 plain: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(plain)
  }

  /** AES-128-CBC decrypt of an IV-prefixed buffer. */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    require(data.length >= 16, "pdf aes: buffer shorter than its IV")
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(
        java.util.Arrays.copyOf(data, 16)))
    c.doFinal(data, 16, data.length - 16)
  }

  /** Decrypt one object's string/stream bytes under a derived file
    * key. */
  def decrypt(fileKey: Array[Byte], objNum: Int, gen: Int,
              aes: Boolean, data: Array[Byte]): Array[Byte] = {
    val k = objectKey(fileKey, objNum, gen, aes)
    if (aes) aesDecrypt(k, data) else rc4(k, data)
  }

  /** Encrypt one object's bytes (fixture side — same key schedule). */
  def encrypt(fileKey: Array[Byte], objNum: Int, gen: Int,
              aes: Boolean, iv: Array[Byte],
              data: Array[Byte]): Array[Byte] = {
    val k = objectKey(fileKey, objNum, gen, aes)
    if (aes) aesEncrypt(k, iv, data) else rc4(k, data)
  }
}

package graft.sources

/** PDF standard security handler — ISO 32000-1 §7.6.3 (public spec),
  * Algorithms 1–5: RC4 (`/V 1`/`/V 2`) and AES-128-CBC (`/V 4` with
  * `/CFM /AESV2`) string/stream encryption, plus the ISO 32000-2
  * §7.6.4 AES-256 handler (`/V 5`, legacy `/R 5` single-SHA-256 and
  * `/R 6` Algorithm-2.B hashing) — together covering essentially
  * every encrypted PDF a crawl encounters, PDF 2.0 included.
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
    * `keyLen` in BYTES (Length/8; 5 for 40-bit, 16 for 128-bit).
    * `encryptMetadata = false` (R4+, /EncryptMetadata false) appends
    * the 0xFFFFFFFF salt the spec's step f requires — such files are
    * readable with the empty password in real readers and would
    * otherwise fail /U verification here. */
  def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int,
              id0: Array[Byte], r: Int, keyLen: Int,
              encryptMetadata: Boolean = true): Array[Byte] = {
    // Spec bound: V<5 keys are 40-128 bits. Clamping here (rather than
    // trusting /Length) means a hostile V1-V4 dict declaring
    // /Length 256 can never yield a 32-byte key and be mis-routed to
    // [[decrypt]]'s direct-AES-256 branch — key length 32 is reachable
    // ONLY via fileKeyV5.
    val kl = math.max(5, math.min(16, keyLen))
    val metaSalt =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](-1, -1, -1, -1)
      else Array.emptyByteArray
    var h = md5(padPassword(userPwd), o, intLE(p), id0, metaSalt)
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        h = md5(java.util.Arrays.copyOf(h, kl)); i += 1
      }
    }
    java.util.Arrays.copyOf(h, kl)
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

  def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** Algorithm 2.B (ISO 32000-2 §7.6.4.3.4) — the R6 password hash:
    * start from SHA-256(pwd ‖ salt ‖ udata), then iterate
    * K1 = (pwd ‖ K ‖ udata)×64, E = AES-128-CBC(K[0..16], iv
    * K[16..32]) of K1, K = SHA-{256,384,512}(E) picked by
    * (ΣE[0..16]) mod 3 — at least 64 rounds, stopping once the last
    * byte of E ≤ round − 32. Returns the first 32 bytes of K.
    * (`udata` is empty for user-password checks; the 48-byte /U for
    * owner-password checks.) */
  def hash2B(pwd: Array[Byte], salt: Array[Byte],
             udata: Array[Byte]): Array[Byte] = {
    var k = sha256(pwd, salt, udata)
    var e = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e(e.length - 1) & 0xff) > i - 32) {
      val unit = new Array[Byte](pwd.length + k.length + udata.length)
      System.arraycopy(pwd, 0, unit, 0, pwd.length)
      System.arraycopy(k, 0, unit, pwd.length, k.length)
      System.arraycopy(udata, 0, unit, pwd.length + k.length,
        udata.length)
      val k1 = new Array[Byte](unit.length * 64)
      var j = 0
      while (j < 64) {
        System.arraycopy(unit, 0, k1, j * unit.length, unit.length)
        j += 1
      }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(
          java.util.Arrays.copyOf(k, 16), "AES"),
        new javax.crypto.spec.IvParameterSpec(
          java.util.Arrays.copyOfRange(k, 16, 32)))
      e = c.doFinal(k1)
      var sum = 0
      var q = 0
      while (q < 16) { sum += e(q) & 0xff; q += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      i += 1
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** AES-256 (V5: R5 legacy / R6 per ISO 32000-2 §7.6.4.4.10-11)
    * empty-user-password key recovery: /U is hash(32) ‖ validation
    * salt(8) ‖ key salt(8); verify the hash against the password,
    * then decrypt /UE (AES-256-CBC, zero IV, no padding) with the
    * key-salt hash to recover the 32-byte file key. Returns
    * (fileKey, passwordVerified). R5 hashes with a single SHA-256;
    * R6 with Algorithm 2.B. */
  def fileKeyV5(pwd: Array[Byte], u: Array[Byte], ue: Array[Byte],
                r: Int): (Array[Byte], Boolean) = {
    require(u.length >= 48, "pdf v5: /U shorter than 48 bytes")
    require(ue.length >= 32, "pdf v5: /UE shorter than 32 bytes")
    val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    val expect =
      if (r >= 6) hash2B(pwd, vSalt, Array.emptyByteArray)
      else sha256(pwd, vSalt)
    val ok = java.util.Arrays.equals(expect,
      java.util.Arrays.copyOf(u, 32))
    if (!ok) (Array.emptyByteArray, false)
    else {
      val ikey =
        if (r >= 6) hash2B(pwd, kSalt, Array.emptyByteArray)
        else sha256(pwd, kSalt)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
        new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
      (c.doFinal(java.util.Arrays.copyOf(ue, 32)), true)
    }
  }

  /** Fixture side of [[fileKeyV5]]: build (/U, /UE) for a chosen file
    * key + empty user password from two 8-byte salts. */
  def makeUV5(fileKey: Array[Byte], vSalt: Array[Byte],
              kSalt: Array[Byte], r: Int): (Array[Byte], Array[Byte]) = {
    val pwd = Array.emptyByteArray
    val h =
      if (r >= 6) hash2B(pwd, vSalt, Array.emptyByteArray)
      else sha256(pwd, vSalt)
    val ikey =
      if (r >= 6) hash2B(pwd, kSalt, Array.emptyByteArray)
      else sha256(pwd, kSalt)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ikey, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue = c.doFinal(fileKey)
    (h ++ vSalt ++ kSalt, ue)
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
              aes: Boolean, data: Array[Byte]): Array[Byte] =
    if (fileKey.length == 32)
      // V5/AES-256: the file key encrypts directly — no per-object
      // key derivation (ISO 32000-2 §7.6.4; Algorithm 1.A)
      aesDecrypt(fileKey, data)
    else {
      val k = objectKey(fileKey, objNum, gen, aes)
      if (aes) aesDecrypt(k, data) else rc4(k, data)
    }

  /** Encrypt one object's bytes (fixture side — same key schedule). */
  def encrypt(fileKey: Array[Byte], objNum: Int, gen: Int,
              aes: Boolean, iv: Array[Byte],
              data: Array[Byte]): Array[Byte] =
    if (fileKey.length == 32) aesEncrypt(fileKey, iv, data)
    else {
      val k = objectKey(fileKey, objNum, gen, aes)
      if (aes) aesEncrypt(k, iv, data) else rc4(k, data)
    }
}

package graft.multimodal

/** Externally-injected VP8 entropy/quantizer tables (RFC 6386 §11.5,
  * §13.2-13.5, §14.1) — the ~3k normative constants this zero-egress
  * environment cannot transcribe verifiably (see MultimodalOps object
  * doc). The decode skeleton in [[Vp8]] is pure ALGORITHM: every
  * constant — tree shapes included — loads from a user-supplied file
  * named by the JVM property `graft.vp8TablesPath`, checksum- and
  * structure-gated here. Absent or invalid tables keep lossy-WebP
  * decode fail-closed (null pixels), exactly as before.
  *
  * File format (text, line-oriented; `#` comments ignored):
  * {{{
  *   sha256: <hex digest of every following non-comment line, each
  *            trimmed, joined with '\n', UTF-8>
  *   <name>: <int> <int> ...
  * }}}
  * Required sections and shapes (counts validated; probability arrays
  * additionally range-checked to [1, 255]; trees to the RFC tree
  * invariant: even length, entries either non-positive leaves or even
  * in-range forward indices):
  *
  *   - token_tree            22 ints  (12-leaf coefficient-token tree)
  *   - coeff_probs           1056     [4][8][3][11] default token probs
  *   - coeff_update_probs    1056     [4][8][3][11] header-update gates
  *   - coeff_bands           16       coefficient-position → band map
  *   - zigzag                16       natural → scan order
  *   - cat_probs             1+2+3+4+5+11 = 26, the six DCT_CAT
  *                           extra-bit probability runs, concatenated
  *   - kf_ymode_tree         8, kf_ymode_probs 4
  *   - bmode_tree            18, kf_bmode_probs 900 ([10][10][9])
  *   - uv_mode_tree          6,  kf_uv_mode_probs 3
  *   - mb_segment_tree       6   (3-prob segment-id tree shape)
  *   - dc_qlookup            128, ac_qlookup 128 (positive, ascending)
  */
final case class Vp8Tables(
    tokenTree: Array[Int],
    coeffProbs: Array[Int],        // flat [4][8][3][11]
    coeffUpdateProbs: Array[Int],  // flat [4][8][3][11]
    coeffBands: Array[Int],
    zigzag: Array[Int],
    catProbs: Array[Array[Int]],   // 6 runs: 1,2,3,4,5,11 probs
    kfYmodeTree: Array[Int], kfYmodeProbs: Array[Int],
    bmodeTree: Array[Int], kfBmodeProbs: Array[Int], // flat [10][10][9]
    uvModeTree: Array[Int], kfUvModeProbs: Array[Int],
    mbSegmentTree: Array[Int],
    dcQ: Array[Int], acQ: Array[Int]) {

  def coeffProb(pl: Int, band: Int, ctx: Int, node: Int): Int =
    coeffProbs(((pl * 8 + band) * 3 + ctx) * 11 + node)
  def coeffUpdateProb(pl: Int, band: Int, ctx: Int, node: Int): Int =
    coeffUpdateProbs(((pl * 8 + band) * 3 + ctx) * 11 + node)
  def setCoeffProb(pl: Int, band: Int, ctx: Int, node: Int,
                   v: Int): Unit =
    coeffProbs(((pl * 8 + band) * 3 + ctx) * 11 + node) = v
  def bmodeProbs(above: Int, left: Int): Array[Int] = {
    val o = (above * 10 + left) * 9
    java.util.Arrays.copyOfRange(kfBmodeProbs, o, o + 9)
  }
  /** Deep copy (frame decode mutates coeffProbs via header updates). */
  def copyMutable: Vp8Tables =
    copy(coeffProbs = coeffProbs.clone())
}

object Vp8Tables {

  /** Tables from `graft.vp8TablesPath`; None when the property is
    * unset, the file is unreadable, the checksum fails, or any
    * structural gate fails (each failure logs loudly). Cached per
    * property VALUE — changing the property re-resolves, so a long
    * session (or a test) can inject/retract tables. */
  @volatile private var cache: (Option[String], Option[Vp8Tables]) = null
  def loaded: Option[Vp8Tables] = {
    val p = sys.props.get("graft.vp8TablesPath")
    val c = cache
    if (c != null && c._1 == p) c._2
    else {
      val t = p.flatMap { path =>
        try Some(parse(new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8)))
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] vp8 tables at $path REJECTED (decode stays " +
                s"fail-closed): ${e.getMessage}")
            None
        }
      }
      cache = (p, t)
      t
    }
  }

  /** Parse + gate a tables file. Throws IllegalArgumentException with
    * the precise violation on any gate failure. */
  def parse(text: String): Vp8Tables = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    require(lines.nonEmpty && lines.head.startsWith("sha256:"),
      "first non-comment line must be 'sha256: <hex>'")
    val declared = lines.head.drop("sha256:".length).trim.toLowerCase
    val payload = lines.tail.mkString("\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    require(digest == declared,
      s"checksum mismatch: declared $declared, computed $digest — " +
        "refusing unverified entropy tables")
    val sections: Map[String, Array[Int]] = lines.tail.map { l =>
      val i = l.indexOf(':')
      require(i > 0, s"malformed line (want 'name: ints'): $l")
      val name = l.substring(0, i).trim
      val vals = l.substring(i + 1).trim.split("\\s+")
        .filter(_.nonEmpty).map(_.toInt)
      name -> vals
    }.toMap
    def sec(name: String, n: Int): Array[Int] = {
      val a = sections.getOrElse(name,
        throw new IllegalArgumentException(s"missing section: $name"))
      require(a.length == n, s"$name: expected $n ints, got ${a.length}")
      a
    }
    def probs(name: String, n: Int): Array[Int] = {
      val a = sec(name, n)
      a.zipWithIndex.foreach { case (v, i) =>
        require(v >= 1 && v <= 255, s"$name[$i]=$v outside [1,255]") }
      a
    }
    /** RFC tree invariant: 2 entries per interior node; entry <= 0 is
      * a leaf (-value), positive entries are even forward indices. */
    def tree(name: String, n: Int, leaves: Int): Array[Int] = {
      val a = sec(name, n)
      var leafCnt = 0
      a.zipWithIndex.foreach { case (v, i) =>
        if (v <= 0) leafCnt += 1
        else require(v % 2 == 0 && v > 0 && v < n,
          s"$name[$i]=$v is not an even in-range child index")
      }
      require(leafCnt == leaves, s"$name: $leafCnt leaves, want $leaves")
      a
    }
    def qlut(name: String): Array[Int] = {
      val a = sec(name, 128)
      a.zipWithIndex.foreach { case (v, i) =>
        require(v > 0 && v < 10000, s"$name[$i]=$v not a plausible step")
        require(i == 0 || v >= a(i - 1), s"$name not non-decreasing at $i")
      }
      a
    }
    val catLens = Seq(1, 2, 3, 4, 5, 11)
    val cat = probs("cat_probs", catLens.sum)
    val catRuns = catLens.scanLeft(0)(_ + _).sliding(2).map {
      case Seq(a, b) => java.util.Arrays.copyOfRange(cat, a, b)
    }.toArray
    val tokenTree = tree("token_tree", 22, 12)
    // decoder conventions the tree must satisfy: leaves are the twelve
    // token ids 0..11 (11 = EOB), EOB is the root's 0-branch (so the
    // after-ZERO decode can skip it by starting the walk at index 2)
    require(tokenTree.filter(_ <= 0).map(-_).sorted
      .sameElements(0 to 11),
      "token_tree leaves must be exactly the token ids 0..11")
    require(tokenTree(0) == -11,
      "token_tree root 0-branch must be the EOB leaf (-11)")
    def modeTreeLeaves(name: String, a: Array[Int], n: Int): Unit =
      require(a.filter(_ <= 0).map(-_).sorted.sameElements(0 until n),
        s"$name leaves must be exactly the mode ids 0..${n - 1}")
    Vp8Tables(
      tokenTree = tokenTree,
      coeffProbs = probs("coeff_probs", 1056),
      coeffUpdateProbs = probs("coeff_update_probs", 1056),
      coeffBands = {
        val a = sec("coeff_bands", 16)
        a.foreach(v => require(v >= 0 && v < 8, s"coeff_bands value $v"))
        a
      },
      zigzag = {
        val a = sec("zigzag", 16)
        require(a.sorted.sameElements(0 until 16),
          "zigzag must be a permutation of 0..15")
        require(a(0) == 0, "zigzag must start at the DC position")
        a
      },
      catProbs = catRuns,
      kfYmodeTree = {
        val a = tree("kf_ymode_tree", 8, 5)
        modeTreeLeaves("kf_ymode_tree", a, 5); a
      },
      kfYmodeProbs = probs("kf_ymode_probs", 4),
      bmodeTree = {
        val a = tree("bmode_tree", 18, 10)
        modeTreeLeaves("bmode_tree", a, 10); a
      },
      kfBmodeProbs = probs("kf_bmode_probs", 900),
      uvModeTree = {
        val a = tree("uv_mode_tree", 6, 4)
        modeTreeLeaves("uv_mode_tree", a, 4); a
      },
      kfUvModeProbs = probs("kf_uv_mode_probs", 3),
      mbSegmentTree = tree("mb_segment_tree", 6, 4),
      dcQ = qlut("dc_qlookup"),
      acQ = qlut("ac_qlookup"))
  }

  /** Render a tables object back to the file format (with a fresh
    * checksum) — used by the spec to build synthetic table files and
    * by users to re-emit a verified file. */
  def render(t: Vp8Tables): String = {
    val body = Seq(
      "token_tree" -> t.tokenTree, "coeff_probs" -> t.coeffProbs,
      "coeff_update_probs" -> t.coeffUpdateProbs,
      "coeff_bands" -> t.coeffBands, "zigzag" -> t.zigzag,
      "cat_probs" -> t.catProbs.flatten,
      "kf_ymode_tree" -> t.kfYmodeTree,
      "kf_ymode_probs" -> t.kfYmodeProbs,
      "bmode_tree" -> t.bmodeTree, "kf_bmode_probs" -> t.kfBmodeProbs,
      "uv_mode_tree" -> t.uvModeTree,
      "kf_uv_mode_probs" -> t.kfUvModeProbs,
      "mb_segment_tree" -> t.mbSegmentTree,
      "dc_qlookup" -> t.dcQ, "ac_qlookup" -> t.acQ)
      .map { case (n, a) => s"$n: ${a.mkString(" ")}" }
    val payload = body.mkString("\n")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"sha256: $digest\n$payload\n"
  }
}

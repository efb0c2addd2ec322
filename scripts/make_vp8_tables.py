#!/usr/bin/env python3
"""Generate the checksum-gated VP8 constants file graft's lossy-WebP
decoder loads via -Dgraft.vp8TablesPath (see
src/main/scala/graft/multimodal/Vp8Tables.scala for the format and the
structural gates).

The repo ships the full RFC 6386 decode ALGORITHM but none of the ~3k
normative table constants — they cannot be transcribed verifiably in
the zero-egress build sandbox. At deployment time, run this script
against a PUBLIC normative source you already have locally:

  # the RFC itself (contains the reference decoder tables verbatim):
  python3 scripts/make_vp8_tables.py vp8_tables.txt rfc6386.txt

  # or a libvpx checkout (vp8/common holds the same tables):
  python3 scripts/make_vp8_tables.py vp8_tables.txt path/to/libvpx/vp8

Then start Spark with -Dgraft.vp8TablesPath=vp8_tables.txt — the Scala
side re-verifies the sha256 and every structural invariant before any
byte of table data is trusted; a failed gate keeps decode fail-closed
(null pixels).

The extractor resolves the C enum symbols the sources use in tree
initializers (dct_eob, B_DC_PRED, ...) and accepts the identifier
spellings of both the RFC reference code and libvpx. Nothing here
hardcodes a single table VALUE — the values come from your source.

Self-test (no sources needed): --selftest builds a synthetic C source
with structurally-valid placeholder tables and round-trips it through
the extractor, validator and emitter.
"""
import hashlib
import os
import re
import sys

# graft section -> (candidate C identifiers, expected flat length)
SECTIONS = [
    ("token_tree", ["coeff_tree", "vp8_coef_tree"], 22),
    ("coeff_probs",
     ["default_coeff_probs", "vp8_default_coef_probs", "CoeffsProba0"],
     1056),
    ("coeff_update_probs",
     ["coeff_update_probs", "vp8_coef_update_probs", "CoeffsUpdateProba"],
     1056),
    ("coeff_bands", ["coeff_bands", "vp8_coef_bands"], 16),
    ("zigzag", ["zigzag", "vp8_default_zig_zag1d", "kZigzag"], 16),
    # cat_probs is assembled from six per-category runs below
    ("kf_ymode_tree",
     ["kf_ymode_tree", "ymode_tree", "vp8_kf_ymode_tree"], 8),
    ("kf_ymode_probs", ["kf_ymode_prob", "vp8_kf_ymode_prob"], 4),
    ("bmode_tree", ["bmode_tree", "vp8_bmode_tree"], 18),
    ("kf_bmode_probs", ["kf_bmode_prob", "vp8_kf_bmode_prob"], 900),
    ("uv_mode_tree", ["uv_mode_tree", "vp8_uv_mode_tree"], 6),
    ("kf_uv_mode_probs", ["kf_uv_mode_prob", "vp8_kf_uv_mode_prob"], 3),
    ("mb_segment_tree", ["mb_segment_tree", "vp8_segment_tree"], 6),
    ("dc_qlookup", ["dc_qlookup", "kDcTable"], 128),
    ("ac_qlookup", ["ac_qlookup", "kAcTable"], 128),
]
CAT_ALIASES = [([f"Pcat{i}", f"kCat{i}Prob", f"vp8_prob_Pcat{i}"], n)
               for i, n in zip(range(1, 7), [1, 2, 3, 4, 5, 11])]


def read_sources(paths):
    texts = []
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    if f.endswith((".c", ".h", ".txt")):
                        texts.append(open(os.path.join(root, f),
                                          errors="replace").read())
        else:
            texts.append(open(p, errors="replace").read())
    cleaned = []
    for t in texts:
        keep = []
        for line in t.split("\n"):
            # RFC page furniture can interrupt an array initializer
            if "[Page " in line or line.startswith("RFC 6386"):
                continue
            keep.append(line.replace("\f", ""))
        cleaned.append("\n".join(keep))
    return "\n".join(cleaned)


def strip_comments(s):
    s = re.sub(r"/\*.*?\*/", " ", s, flags=re.S)
    return re.sub(r"//[^\n]*", " ", s)


def parse_enums(src):
    """Symbol table from every enum block (sequential values, explicit
    `= <int>` respected). First definition wins."""
    table = {}
    for m in re.finditer(r"enum\s*(?:\w+\s*)?\{(.*?)\}", src, re.S):
        body = strip_comments(m.group(1))
        val = 0
        for entry in body.split(","):
            entry = entry.strip()
            if not entry:
                continue
            if "=" in entry:
                name, _, rhs = entry.partition("=")
                name, rhs = name.strip(), rhs.strip()
                try:
                    val = int(rhs, 0)
                except ValueError:
                    continue  # computed enum value: skip symbol
            else:
                name = entry
            if re.fullmatch(r"[A-Za-z_]\w*", name) and name not in table:
                table[name] = val
            val += 1
    return table


def find_array(src, names):
    """Flattened int list of the first matching `name [...] = { ... }`
    initializer, resolving enum symbols."""
    enums = parse_enums(src)
    for name in names:
        m = re.search(r"\b" + re.escape(name) + r"\s*(\[[^=;{]*)?=\s*\{",
                      src)
        if not m:
            continue
        i = src.index("{", m.start())
        depth, j = 0, i
        while j < len(src):
            if src[j] == "{":
                depth += 1
            elif src[j] == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body = strip_comments(src[i + 1:j])
        out = []
        for tok in re.finditer(r"(-?)\s*([A-Za-z_]\w*|\d+)", body):
            sign, sym = tok.group(1), tok.group(2)
            if sym.isdigit():
                v = int(sym)
            elif sym in enums:
                v = enums[sym]
            else:
                raise SystemExit(
                    f"{name}: unresolvable symbol '{sym}' — is the file "
                    "missing the enum definitions? Pass the whole RFC "
                    "text or the full vp8/common directory.")
            out.append(-v if sign == "-" else v)
        return out
    return None


def validate(sections):
    """Mirror of the Scala gate (Vp8Tables.parse) so a generated file
    never fails on the JVM side."""
    def req(cond, msg):
        if not cond:
            raise SystemExit(f"VALIDATION FAILED: {msg}")

    def probs(name):
        for i, v in enumerate(sections[name]):
            req(1 <= v <= 255, f"{name}[{i}]={v} outside [1,255]")

    def tree(name, leaves):
        a = sections[name]
        cnt = 0
        for i, v in enumerate(a):
            if v <= 0:
                cnt += 1
            else:
                req(v % 2 == 0 and v < len(a),
                    f"{name}[{i}]={v} is not an even in-range child")
        req(cnt == leaves, f"{name}: {cnt} leaves, want {leaves}")

    for name, _, n in SECTIONS:
        req(len(sections[name]) == n,
            f"{name}: {len(sections[name])} ints, want {n}")
    req(len(sections["cat_probs"]) == 26, "cat_probs: want 26 ints")
    probs("coeff_probs")
    probs("coeff_update_probs")
    probs("cat_probs")
    probs("kf_ymode_probs")
    probs("kf_bmode_probs")
    probs("kf_uv_mode_probs")
    tree("token_tree", 12)
    tt = sections["token_tree"]
    req(sorted(-v for v in tt if v <= 0) == list(range(12)),
        "token_tree leaves must be token ids 0..11")
    req(tt[0] == -11, "token_tree root 0-branch must be EOB (-11)")
    for nm, nl in [("kf_ymode_tree", 5), ("bmode_tree", 10),
                   ("uv_mode_tree", 4), ("mb_segment_tree", 4)]:
        tree(nm, nl)
    for nm, nl in [("kf_ymode_tree", 5), ("bmode_tree", 10),
                   ("uv_mode_tree", 4)]:
        req(sorted(-v for v in sections[nm] if v <= 0) ==
            list(range(nl)), f"{nm} leaves must be mode ids 0..{nl-1}")
    for i, v in enumerate(sections["coeff_bands"]):
        req(0 <= v < 8, f"coeff_bands[{i}]={v}")
    req(sorted(sections["zigzag"]) == list(range(16)) and
        sections["zigzag"][0] == 0, "zigzag must be a 0-led permutation")
    for nm in ("dc_qlookup", "ac_qlookup"):
        a = sections[nm]
        for i, v in enumerate(a):
            req(0 < v < 10000, f"{nm}[{i}]={v} not a plausible step")
            req(i == 0 or v >= a[i - 1], f"{nm} decreasing at {i}")


ORDER = ["token_tree", "coeff_probs", "coeff_update_probs",
         "coeff_bands", "zigzag", "cat_probs", "kf_ymode_tree",
         "kf_ymode_probs", "bmode_tree", "kf_bmode_probs",
         "uv_mode_tree", "kf_uv_mode_probs", "mb_segment_tree",
         "dc_qlookup", "ac_qlookup"]


def emit(sections, out_path):
    body = [f"{n}: {' '.join(str(v) for v in sections[n])}"
            for n in ORDER]
    payload = "\n".join(body)
    digest = hashlib.sha256(payload.encode()).hexdigest()
    with open(out_path, "w") as f:
        f.write("# generated by scripts/make_vp8_tables.py — "
                "RFC 6386 normative tables\n")
        f.write(f"sha256: {digest}\n{payload}\n")
    print(f"wrote {out_path}: {len(ORDER)} sections, "
          f"{sum(len(sections[n]) for n in ORDER)} ints, sha256 {digest}")


def extract(src):
    sections = {}
    for name, aliases, _ in SECTIONS:
        a = find_array(src, aliases)
        if a is None:
            raise SystemExit(
                f"section '{name}' not found under any of {aliases} — "
                "pass the RFC 6386 text or a libvpx vp8/common tree")
        sections[name] = a
    cat = []
    for aliases, n in CAT_ALIASES:
        a = find_array(src, aliases)
        if a is None:
            raise SystemExit(f"cat_probs run not found: {aliases}")
        if len(a) != n:
            raise SystemExit(f"{aliases[0]}: {len(a)} ints, want {n}")
        cat.extend(a)
    sections["cat_probs"] = cat
    return sections


def selftest():
    """Round-trip a synthetic, structurally-valid C source (placeholder
    VALUES — real deployments extract from a normative source)."""
    tt = [-11, 2]
    for i in range(10):
        tt += [-i, 2 * (i + 2)] if i < 9 else [-9, -10]

    def tree_c(n):  # left-comb over n leaves
        a = []
        for i in range(n - 1):
            a.append(-i)
            a.append(2 * (i + 1) if i < n - 2 else -(n - 1))
        return a
    src = f"""
typedef enum {{ DCT_0, DCT_1, DCT_2, DCT_3, DCT_4, dct_cat1, dct_cat2,
  dct_cat3, dct_cat4, dct_cat5, dct_cat6, dct_eob, num_dct_tokens }} t;
const int coeff_tree[] = {{ {', '.join(map(str, tt))} }};
const int default_coeff_probs[4][8][3][11] = {{ {', '.join(['128']*1056)} }};
const int coeff_update_probs[] = {{ {', '.join(['255']*1056)} }};
const int coeff_bands[] = {{ 0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7 }};
const int zigzag[] = {{ 0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15 }};
const int Pcat1[] = {{ 159 }};
const int Pcat2[] = {{ 165, 145 }};
const int Pcat3[] = {{ 173, 148, 140 }};
const int Pcat4[] = {{ 176, 155, 140, 135 }};
const int Pcat5[] = {{ 180, 157, 141, 134, 130 }};
const int Pcat6[] = {{ {', '.join(['254']*11)} }};
const int kf_ymode_tree[] = {{ {', '.join(map(str, tree_c(5)))} }};
const int kf_ymode_prob[] = {{ 145, 156, 163, 128 }};
const int bmode_tree[] = {{ {', '.join(map(str, tree_c(10)))} }};
const int kf_bmode_prob[10][10][9] = {{ {', '.join(['128']*900)} }};
const int uv_mode_tree[] = {{ {', '.join(map(str, tree_c(4)))} }};
const int kf_uv_mode_prob[] = {{ 142, 114, 183 }};
const int mb_segment_tree[] = {{ 2, 4, -0, -1, -2, -3 }};
const int dc_qlookup[] = {{ {', '.join(str(4 + i) for i in range(128))} }};
const int ac_qlookup[] = {{ {', '.join(str(4 + 2 * i) for i in range(128))} }};
"""
    secs = extract(src)
    validate(secs)
    out = "/tmp/vp8_tables_selftest.txt"
    emit(secs, out)
    # emitted file re-parses: checksum matches, sections intact
    lines = [l.strip() for l in open(out)
             if l.strip() and not l.startswith("#")]
    assert lines[0].startswith("sha256: ")
    payload = "\n".join(lines[1:])
    assert (hashlib.sha256(payload.encode()).hexdigest()
            == lines[0].split()[1])
    assert len(lines) == 1 + len(ORDER)
    print("selftest OK")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    out, sources = sys.argv[1], sys.argv[2:]
    src = read_sources(sources)
    secs = extract(src)
    validate(secs)
    emit(secs, out)

"""PDF text-layer extraction — ISO 32000 (public spec), the feasible
subset the r13 close-or-freeze decision named: PDFs with
FlateDecode / ASCIIHex / ASCII85 streams, classic xref or compressed
object streams (ObjStm), simple fonts (Standard/WinAnsi base +
/Differences glyph names) and composite Type0 fonts via /ToUnicode
CMaps. Standard-security-handler encryption with an EMPTY user
password — the common "readable by anyone, owner-permissions-only"
encrypted PDF a crawl hits — decrypts transparently (r15,
operators/pdfcrypt.py: RC4-40..128 / AES-128 / AES-256). Everything
else refuses BY NAME (password-protected documents, non-Standard
security handlers, LZW/DCT/JBIG2/CCITT/RunLength filters, stream
predictors) — never silent garbage.

Design notes:

  - **Linear reconstruction, not xref trust.** The object map is
    built by scanning for ``N G obj`` (newest occurrence wins — the
    incremental-update rule) and then expanding every /Type /ObjStm
    stream; this sidesteps parsing cross-reference STREAMS (PDF 1.5
    binary xref with predictors) entirely and doubles as the repair
    path real extractors fall back to on damaged files.
  - **Text assembly heuristics are the standard ones** (same family
    as the public pdfminer/pdftotext behavior): a vertical text-matrix
    move starts a new line; a TJ kern adjustment below
    ``-SPACE_KERN`` thousandths of an em emits a space (TeX engines
    encode inter-word spaces as kerns, not space glyphs). Form
    XObjects are recursed into (depth-capped).
  - The **writer** (`encode_pdf`) emits deterministic single-font
    (Helvetica, WinAnsi) FlateDecode PDFs with a classic xref table —
    byte-identical re-exports, the fixture/oracle twin of the reader.

Spark mapping: `pdf_pages` is one Arrow mapInPandas pass (doc_id,
page, text) — map-side, no shuffle; the probe hook in
operators/multimodal.py stays header-only.

Embedded images (r14): `extract_pdf_images` pulls /Subtype /Image
XObjects — DCTDecode payloads decode through the repo's own T.81
JPEG codec (operators/jpeg.py) and FlateDecode/unfiltered 8-bit
DeviceRGB/DeviceGray samples decode directly; Indexed/ICC/CMYK color
spaces, other bit depths, image masks and JPX/JBIG2/CCITT refuse by
name. `pdf_image_features` is the Spark pass emitting the SAME dHash
the image near-dup family keys on, so figures extracted from PDFs
feed hash64_near_dup unchanged; `encode_pdf_images` is the
deterministic writer twin.

Reference parity note: the reference engine (hicder/muopdb) has no
document-format operators; this module is brief-driven (training-data
acquisition) like the WARC/HTML/URL families it completes.
"""

from __future__ import annotations

import re
import struct
import zlib
from typing import Iterator

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num, self.gen = num, gen

    def __repr__(self) -> str:
        return f"{self.num} {self.gen} R"


class _Name(str):
    """PDF name object (distinct from strings, which are bytes)."""


# ------------------------------------------------------------- lexer


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to EOL
            e1 = data.find(b"\n", pos)
            e2 = data.find(b"\r", pos)
            e = min(x for x in (e1, e2, n) if x >= 0)
            pos = e + 1
        else:
            break
    return pos


# regular-name fast path: every byte up to the next whitespace/delim,
# stopping at '#' so hex escapes fall to the slow loop
_NAME_RUN_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%#]*")


def _parse_name(data: bytes, pos: int) -> tuple[_Name, int]:
    pos += 1  # '/'
    m = _NAME_RUN_RE.match(data, pos)
    end = m.end()
    if end >= len(data) or data[end] != 0x23:  # no #xx escape (common)
        return _Name(m.group(0).decode("latin-1")), end
    out = bytearray(m.group(0))
    pos = end
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # #xx hex escape
            out.append(int(data[pos + 1:pos + 3], 16))
            pos += 3
        else:
            out.append(c)
            pos += 1
    return _Name(out.decode("latin-1")), pos


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    pos += 1  # '('
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                            0x66: 12}[e])
                pos += 1
            elif e in b"()\\":
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_s = bytearray()
                while pos < n and len(oct_s) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_s.append(data[pos])
                    pos += 1
                out.append(int(oct_s, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                pos += 1
                return bytes(out), pos
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("pdf: unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.find(b">", pos + 1)
    if end < 0:
        raise PdfError("pdf: unterminated hex string")
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1:end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode()), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R(?![a-zA-Z0-9])")
# one probe for both token kinds: group 1 is a plain unsigned integer
# followed by the `G R` indirect-reference tail, else group 3 is a
# bare number — same accepted language as _REF_RE then _NUM_RE
_NUM_OR_REF_RE = re.compile(
    rb"(\d+)\s+(\d+)\s+R(?![a-zA-Z0-9])|([+-]?(?:\d+\.?\d*|\.\d+))"
)


def parse_object(data: bytes, pos: int, depth: int = 0):
    """Parse one PDF object at `pos`; returns (obj, next_pos)."""
    if depth > 64:
        raise PdfError("pdf: object nesting too deep")
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("pdf: unexpected end of data")
    c = data[pos]
    if c == 0x2F:  # '/' name — the most common token kind
        return _parse_name(data, pos)
    if data.startswith(b"<<", pos):
        pos += 2
        out: dict[str, object] = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return out, pos + 2
            if data[pos] != 0x2F:
                raise PdfError(
                    f"pdf: dict key must be a name at offset {pos}"
                )
            key, pos = _parse_name(data, pos)
            val, pos = parse_object(data, pos, depth + 1)
            out[str(key)] = val
    if c == 0x3C:  # '<' hex string
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # '['
        pos += 1
        arr: list = []
        while True:
            pos = _skip_ws(data, pos)
            if pos < len(data) and data[pos] == 0x5D:
                return arr, pos + 1
            v, pos = parse_object(data, pos, depth + 1)
            arr.append(v)
    if c == 0x28:
        return _parse_literal_string(data, pos)
    m = _NUM_OR_REF_RE.match(data, pos)
    if m:
        s = m.group(3)
        if s is None:
            return _Ref(int(m.group(1)), int(m.group(2))), m.end()
        val = float(s) if b"." in s else int(s)
        return val, m.end()
    for kw, v in ((b"true", True), (b"false", False), (b"null", None)):
        if data.startswith(kw, pos):
            return v, pos + len(kw)
    raise PdfError(f"pdf: cannot parse object at offset {pos}")


# ---------------------------------------------------------- document


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")


class PdfDocument:
    """Parsed PDF: object map via linear reconstruction + ObjStm
    expansion (see module docstring). Encrypted files refuse by
    name."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF-"):
            raise PdfError("pdf: missing %PDF- header")
        self.data = data
        self.version = data[5:8].decode("latin-1", "replace")
        # newest definition of each object number wins (incremental
        # updates append re-definitions)
        self._offsets: dict[int, int] = {}
        self._gens: dict[int, int] = {}
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            self._offsets[num] = m.end()
            self._gens[num] = int(m.group(2))
        self._cache: dict[int, object] = {}
        self._streams: dict[int, bytes] = {}  # raw (undecoded)
        # r15: standard security handler, empty user password
        # (ISO 32000-1 §7.6.3 / 32000-2 §7.6.4 — RC4-40..128, AES-128,
        # AES-256). Password-protected files and non-Standard handlers
        # refuse by name inside open_standard.
        self._handler = None
        self._encrypt_num: int | None = None
        self._setup_encryption()
        self._expand_objstms()

    def _setup_encryption(self) -> None:
        refs = list(re.finditer(
            rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", self.data
        ))
        inline = None
        if not refs:
            m = re.search(rb"/Encrypt\s*<<", self.data)
            if not m:
                return
            inline, _ = parse_object(
                self.data, m.end() - 2
            )
        from muopdb_spark.operators.pdfcrypt import open_standard

        if inline is not None:
            enc = inline
        else:
            self._encrypt_num = int(refs[-1].group(1))
            enc = self.resolve(self.get(self._encrypt_num))
        if not isinstance(enc, dict):
            raise PdfError("pdf: malformed /Encrypt")
        # trailer /ID: parse with the real object parser — hex strings
        # may contain whitespace per ISO 32000 §7.3.4.3 and literal
        # strings are legal; a bespoke stricter regex would derive the
        # wrong key and misreport a readable file as password-protected
        # (r15 review fix). Newest trailer wins.
        id0 = b""
        for m in re.finditer(rb"/ID\s*\[", self.data):
            try:
                arr, _ = parse_object(self.data, m.end() - 1)
            except PdfError:
                continue
            if isinstance(arr, list) and arr and isinstance(arr[0], bytes):
                id0 = arr[0]

        def _resolve(v):
            v = self.resolve(v)
            if isinstance(v, _Name):
                return str(v)
            return v

        self._handler = open_standard(
            {str(k): v for k, v in enc.items()}, id0, _resolve
        )

    def _decrypt_strings(self, obj, num: int, gen: int):
        """Decrypt every string in a freshly parsed TOP-LEVEL object
        tree (objects inside ObjStms are covered by the stream's own
        decryption, per spec)."""
        if isinstance(obj, bytes):
            return self._handler.decrypt_string(num, gen, obj)
        if isinstance(obj, dict):
            return {
                k: self._decrypt_strings(v, num, gen)
                for k, v in obj.items()
            }
        if isinstance(obj, list):
            return [self._decrypt_strings(v, num, gen) for v in obj]
        return obj

    # -- object access

    def _load_toplevel(self, num: int):
        pos = self._offsets[num]
        obj, end = parse_object(self.data, pos)
        if isinstance(obj, dict):
            m = _STREAM_RE.match(self.data, _skip_ws(self.data, end))
            if m:
                s0 = m.end()
                length = self.resolve(obj.get("Length"))
                if not isinstance(length, int):
                    # damaged /Length: fall back to endstream scan
                    e = self.data.find(b"endstream", s0)
                    if e < 0:
                        raise PdfError("pdf: unterminated stream")
                    length = e - s0
                self._streams[num] = self.data[s0:s0 + length]
        return obj

    def get(self, num: int):
        if num not in self._cache:
            if num not in self._offsets:
                raise PdfError(f"pdf: missing object {num}")
            obj = self._load_toplevel(num)
            if self._handler is not None and num != self._encrypt_num:
                obj = self._decrypt_strings(
                    obj, num, self._gens.get(num, 0)
                )
            self._cache[num] = obj
        return self._cache[num]

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, _Ref):
            if depth > 32:
                raise PdfError("pdf: reference cycle")
            obj = self.get(obj.num)
            depth += 1
        return obj

    # -- streams

    def stream_bytes(self, num_or_dict, num: int | None = None) -> bytes:
        """Decoded stream content for object `num` (dict + raw)."""
        if isinstance(num_or_dict, int):
            num = num_or_dict
            d = self.resolve(self.get(num))
        else:
            d = num_or_dict
        raw = self._streams.get(num, b"")
        if self._handler is not None and raw:
            raw = self._handler.decrypt_stream(
                num, self._gens.get(num, 0), raw
            )
        return _apply_filters(d, raw, self)

    # -- ObjStm expansion

    def _expand_objstms(self) -> None:
        for num in list(self._offsets):
            try:
                obj = self.get(num)
            except PdfError:
                continue
            if not (isinstance(obj, dict)
                    and obj.get("Type") == "ObjStm"):
                continue
            plain = self.stream_bytes(obj, num)
            n = int(self.resolve(obj["N"]))
            first = int(self.resolve(obj["First"]))
            head = plain[:first].split()
            for i in range(n):
                onum = int(head[2 * i])
                ooff = first + int(head[2 * i + 1])
                if onum in self._offsets:
                    # a top-level (newer) definition wins
                    continue
                val, _ = parse_object(plain, ooff)
                self._cache[onum] = val
                self._offsets[onum] = -1  # mark known

    # -- page tree

    def catalog(self) -> dict:
        for num in self._offsets:
            try:
                obj = self.resolve(self.get(num))
            except PdfError:
                continue
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                return obj
        raise PdfError("pdf: no /Type /Catalog object")

    def pages(self) -> list[dict]:
        """Page leaf dicts in document order, /Resources and /MediaBox
        inherited down the tree."""
        root = self.resolve(self.catalog().get("Pages"))
        if not isinstance(root, dict):
            raise PdfError("pdf: catalog has no /Pages tree")
        out: list[dict] = []

        def walk(node: dict, inherited: dict, depth: int) -> None:
            if depth > 64:
                raise PdfError("pdf: page tree too deep")
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            t = node.get("Type")
            if t == "Page":
                leaf = dict(inh)
                leaf.update(node)
                out.append(leaf)
                return
            for kid in self.resolve(node.get("Kids")) or []:
                kd = self.resolve(kid)
                if isinstance(kd, dict):
                    walk(kd, inh, depth + 1)

        walk(root, {}, 0)
        return out


def _apply_filters(d: dict, raw: bytes, doc: PdfDocument) -> bytes:
    filters = doc.resolve(d.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = doc.resolve(d.get("DecodeParms"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    out = raw
    for f, p in zip(filters, parms):
        f = doc.resolve(f)
        p = doc.resolve(p)
        if isinstance(p, dict) and doc.resolve(p.get("Predictor", 1)) not in (None, 1):
            raise NotImplementedError(
                f"pdf: stream predictor {p.get('Predictor')!r} is not"
                " supported"
            )
        if f == "FlateDecode":
            out = zlib.decompress(out)
        elif f == "ASCIIHexDecode":
            hx = re.sub(rb"[^0-9A-Fa-f>]", b"", out)
            hx = hx.split(b">")[0]
            if len(hx) % 2:
                hx += b"0"
            out = bytes.fromhex(hx.decode())
        elif f == "ASCII85Decode":
            import base64

            body = out.split(b"~>")[0]
            if body.startswith(b"<~"):
                body = body[2:]
            out = base64.a85decode(
                re.sub(rb"\s", b"", body), adobe=False
            )
        else:
            raise NotImplementedError(
                f"pdf: stream filter {f!r} is not supported"
            )
    return out


# -------------------------------------------------------------- fonts


# Adobe Glyph List subset: the Latin-text names simple-font
# /Differences arrays use (TeX CM/Nimbus subsets and the base-14
# fonts); uniXXXX / uXXXX names are handled algorithmically and
# one-character names map to themselves.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_",
    "grave": "`", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~", "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ",
    "ffl": "ﬄ", "dotlessi": "ı", "dotlessj": "ȷ",
    "germandbls": "ß", "ae": "æ", "AE": "Æ",
    "oe": "œ", "OE": "Œ", "oslash": "ø",
    "Oslash": "Ø", "aring": "å", "Aring": "Å",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "adieresis": "ä", "odieresis": "ö",
    "udieresis": "ü", "Adieresis": "Ä",
    "Odieresis": "Ö", "Udieresis": "Ü", "ntilde": "ñ",
    "degree": "°", "section": "§", "paragraph": "¶",
    "dagger": "†", "daggerdbl": "‡", "sterling": "£",
    "euro": "€", "yen": "¥", "cent": "¢",
    "copyright": "©", "registered": "®",
    "trademark": "™", "ellipsis": "…", "minus": "−",
    "multiply": "×", "divide": "÷", "plusminus": "±",
    "circumflex": "ˆ", "tilde": "˜", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "cedilla": "¸", "hungarumlaut": "˝", "macron": "¯",
    "acute": "´", "dieresis": "¨",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "guillemotleft": "«", "guillemotright": "»",
    "exclamdown": "¡", "questiondown": "¿",
    "florin": "ƒ", "fraction": "⁄", "perthousand": "‰",
}


def _glyph_to_char(name: str) -> str:
    if len(name) == 1:
        return name
    if name in _AGL:
        return _AGL[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        return chr(int(m.group(1), 16))
    return "�"


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_tounicode(plain: bytes) -> dict[int, str]:
    """code -> unicode string from a ToUnicode CMap's bfchar/bfrange
    sections (the public CMap spec subset those sections use)."""
    out: dict[int, str] = {}

    def u(hx: bytes) -> str:
        b = bytes.fromhex(hx.decode())
        return b.decode("utf-16-be", "replace")

    for m in _BFCHAR_RE.finditer(plain):
        toks = _HEX_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            out[int(toks[i], 16)] = u(toks[i + 1])
    for m in _BFRANGE_RE.finditer(plain):
        body = m.group(1)
        pos = 0
        while True:
            mm = _HEX_RE.search(body, pos)
            if not mm:
                break
            lo = int(mm.group(1), 16)
            m2 = _HEX_RE.search(body, mm.end())
            if not m2:
                break
            hi = int(m2.group(1), 16)
            pos = m2.end()
            nxt = _skip_ws(body, pos)
            if body.startswith(b"[", nxt):
                end = body.find(b"]", nxt)
                dsts = _HEX_RE.findall(body[nxt:end])
                for i, dh in enumerate(dsts):
                    out[lo + i] = u(dh)
                pos = end + 1
            else:
                m3 = _HEX_RE.search(body, nxt)
                if not m3:
                    break
                base = bytes.fromhex(m3.group(1).decode())
                for i in range(hi - lo + 1):
                    bb = (int.from_bytes(base, "big") + i).to_bytes(
                        max(2, len(base)), "big"
                    )
                    out[lo + i] = bb.decode("utf-16-be", "replace")
                pos = m3.end()
    return out


# WinAnsi base table, built once: _Font.__init__ used to re-decode
# all 256 code points per font instance (~500 charmap_decode calls
# per document — 17% of the warm pdf3 profile, r16)
_CP1252_BASE = tuple(
    bytes([i]).decode("cp1252", "replace") for i in range(256)
)


class _Font:
    """Decoder from show-string bytes to unicode for one font."""

    def __init__(self, doc: PdfDocument, fd: dict, num: int | None) -> None:
        fd = doc.resolve(fd)
        self.two_byte = False
        self.cmap: dict[int, str] = {}
        self.table: list[str] | None = None
        subtype = fd.get("Subtype")
        tu = fd.get("ToUnicode")
        if isinstance(tu, _Ref):
            plain = doc.stream_bytes(tu.num)
            self.cmap = _parse_tounicode(plain)
        if subtype == "Type0":
            self.two_byte = True  # Identity-H/V, the dominant layout
            return
        # simple font: 256-entry table — WinAnsi(cp1252) base (the
        # StandardEncoding differences that matter for text are
        # covered by /Differences in real files), then /Differences
        table = list(_CP1252_BASE)
        enc = doc.resolve(fd.get("Encoding"))
        if isinstance(enc, dict):
            diffs = doc.resolve(enc.get("Differences")) or []
            code = 0
            for item in diffs:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    if 0 <= code < 256:
                        table[code] = _glyph_to_char(str(item))
                    code += 1
        self.table = table

    def decode(self, s: bytes) -> str:
        if self.two_byte:
            out = []
            for i in range(0, len(s) - 1, 2):
                code = (s[i] << 8) | s[i + 1]
                out.append(self.cmap.get(code, "�"))
            return "".join(out)
        if self.cmap:
            return "".join(
                self.cmap.get(b, self.table[b] if self.table else "�")
                for b in s
            )
        return "".join(self.table[b] for b in s)


# -------------------------------------------------- content interpreter


# TJ kern adjustment (thousandths of an em) below which a space is
# emitted — TeX encodes inter-word gaps as kerns (-250..-600 at text
# sizes) while letter kerns stay within about +-60
SPACE_KERN = -100.0

_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_tokens(data: bytes) -> Iterator[tuple[str, object]]:
    """Yield ('op', name) / ('val', obj) over one content stream."""
    pos = 0
    n = len(data)
    while True:
        pos = _skip_ws(data, pos)
        if pos >= n:
            return
        c = data[pos]
        if c in b"/<([" or c in b"+-." or 0x30 <= c <= 0x39:
            try:
                val, pos = parse_object(data, pos)
            except PdfError:
                pos += 1
                continue
            yield "val", val
            continue
        m = _OP_RE.match(data, pos)
        if m:
            yield "op", m.group(0).decode("latin-1")
            pos = m.end()
            if m.group(0) == b"BI":
                # inline image: skip to EI (rare in text PDFs)
                e = data.find(b"EI", pos)
                pos = n if e < 0 else e + 2
            continue
        pos += 1  # unknown byte: skip (content must stay total)


def _page_fonts(doc: PdfDocument, resources) -> dict[str, _Font]:
    resources = doc.resolve(resources) or {}
    fonts = doc.resolve(resources.get("Font")) or {}
    out = {}
    for name, fref in fonts.items():
        try:
            out[str(name)] = _Font(
                doc, fref, fref.num if isinstance(fref, _Ref) else None
            )
        except (PdfError, NotImplementedError):
            continue
    return out


def _run_content(
    doc: PdfDocument, content: bytes, resources, parts: list[str],
    depth: int = 0,
) -> None:
    if depth > 8:
        return
    fonts = _page_fonts(doc, resources)
    resources = doc.resolve(resources) or {}
    xobjects = doc.resolve(resources.get("XObject")) or {}
    font: _Font | None = None
    stack: list = []

    def show(s) -> None:
        if isinstance(s, bytes) and font is not None:
            parts.append(font.decode(s))

    def newline() -> None:
        if parts and parts[-1] != "\n":
            parts.append("\n")

    for kind, tok in _content_tokens(content):
        if kind == "val":
            stack.append(tok)
            continue
        op = tok
        if op == "Tf" and len(stack) >= 2:
            font = fonts.get(str(stack[-2]))
        elif op in ("Td", "TD") and len(stack) >= 2:
            try:
                if float(stack[-1]) != 0.0:
                    newline()
            except (TypeError, ValueError):
                pass
        elif op == "Tm" and len(stack) >= 6:
            newline()
        elif op == "T*":
            newline()
        elif op == "Tj" and stack:
            show(stack[-1])
        elif op == "'" and stack:
            newline()
            show(stack[-1])
        elif op == '"' and stack:
            newline()
            show(stack[-1])
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    show(item)
                elif isinstance(item, (int, float)) and item < SPACE_KERN:
                    if parts and not parts[-1].endswith((" ", "\n")):
                        parts.append(" ")
        elif op == "Do" and stack and isinstance(stack[-1], _Name):
            xref = xobjects.get(str(stack[-1]))
            if isinstance(xref, _Ref):
                try:
                    xd = doc.resolve(xref)
                    if (isinstance(xd, dict)
                            and xd.get("Subtype") == "Form"):
                        _run_content(
                            doc, doc.stream_bytes(xd, xref.num),
                            xd.get("Resources", resources), parts,
                            depth + 1,
                        )
                except (PdfError, NotImplementedError):
                    pass
        elif op == "BT":
            pass
        elif op == "ET":
            newline()
        stack = []
    return


def _page_content(doc: PdfDocument, page: dict) -> bytes:
    contents = page.get("Contents")
    refs = contents if isinstance(contents, list) else [contents]
    chunks = []
    for r in refs:
        r = r if isinstance(r, _Ref) else None
        if r is None:
            continue
        d = doc.resolve(doc.get(r.num))
        if isinstance(d, dict):
            chunks.append(doc.stream_bytes(d, r.num))
    return b"\n".join(chunks)


def _clean(parts: list[str]) -> str:
    lines = "".join(parts).split("\n")
    out = []
    for ln in lines:
        ln = " ".join(ln.split())
        if ln:
            out.append(ln)
    return "\n".join(out)


def extract_pdf_text(data: bytes) -> list[str]:
    """Text layer per page (list of one string per page, lines joined
    with newlines, whitespace-normalized). Raises PdfError /
    NotImplementedError (named) on malformed or unsupported files."""
    doc = PdfDocument(data)
    out = []
    for page in doc.pages():
        parts: list[str] = []
        _run_content(
            doc, _page_content(doc, page), page.get("Resources"), parts
        )
        out.append(_clean(parts))
    return out


def pdf_info(data: bytes) -> dict:
    """Header-level triage: {version, n_pages, width, height} (first
    page's MediaBox, in PDF points)."""
    doc = PdfDocument(data)
    pages = doc.pages()
    info = {"version": doc.version, "n_pages": len(pages),
            "width": None, "height": None}
    if pages:
        mb = doc.resolve(pages[0].get("MediaBox"))
        if isinstance(mb, list) and len(mb) == 4:
            vals = [float(doc.resolve(v)) for v in mb]
            info["width"] = int(round(vals[2] - vals[0]))
            info["height"] = int(round(vals[3] - vals[1]))
    return info


# -------------------------------------------------------------- writer


def _pdf_escape(s: str) -> bytes:
    b = s.encode("cp1252", "strict")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(") \
        .replace(b")", b"\\)")


_ENC_BUILDS: dict[tuple, tuple] = {}


def _cached_encrypt_build(mode, owner_password, id0, seed):
    memo = (mode, bytes(owner_password), bytes(id0), bytes(seed))
    hit = _ENC_BUILDS.get(memo)
    if hit is None:
        from muopdb_spark.operators.pdfcrypt import build_standard_encrypt

        hit = build_standard_encrypt(
            mode, owner_password=owner_password, id0=id0, seed=seed
        )
        if len(_ENC_BUILDS) > 64:
            _ENC_BUILDS.clear()
        _ENC_BUILDS[memo] = hit
    return hit


def _ser_pdf_value(v) -> bytes:
    """Serialize an /Encrypt-dict value (names as str, binary as hex
    strings, nested dicts)."""
    if isinstance(v, bool):
        return b"true" if v else b"false"
    if isinstance(v, int):
        return str(v).encode()
    if isinstance(v, bytes):
        return b"<" + v.hex().encode() + b">"
    if isinstance(v, str):
        return b"/" + v.encode()
    if isinstance(v, dict):
        parts = b" ".join(
            b"/" + k.encode() + b" " + _ser_pdf_value(val)
            for k, val in v.items()
        )
        return b"<< " + parts + b" >>"
    raise ValueError(f"pdf: cannot serialize {type(v)}")


def encode_pdf(
    pages: list[str], *, compress: bool = True,
    encrypt: str | None = None, owner_password: bytes = b"owner",
    encrypt_seed: bytes | None = None,
) -> bytes:
    """Deterministic single-font PDF: one page per input string
    (lines split on newline; Helvetica 11pt, WinAnsi — non-WinAnsi
    text raises ValueError by name), FlateDecode content streams,
    classic xref table, no dates — re-exports are byte-identical.
    The fixture/oracle twin of extract_pdf_text.

    `encrypt` (r15): 'rc4-40' | 'rc4-128' | 'aes-128' | 'aes-256'
    emits a standard-security-handler document with an EMPTY user
    password (readable by anyone, like most encrypted PDFs in the
    wild); /ID and all salts/IVs derive from the content — or from
    `encrypt_seed` when given, which additionally memoizes the
    security-dict build so a batch of fixtures pays the aes-256
    Algorithm 2.B cost once, not per document (fixture-only
    concession: shared seed means shared file key + per-object IVs
    across the batch)."""
    if not pages:
        raise ValueError("encode_pdf: no pages")
    handler = None
    enc_fields = None
    id0 = b""
    if encrypt is not None:
        import hashlib as _hl

        seed = encrypt_seed if encrypt_seed is not None else _hl.md5(
            ("\x00".join(pages) + "\x01" + encrypt).encode(
                "utf-8", "replace"
            )
        ).digest()
        id0 = _hl.md5(seed + b"|id0").digest()
        enc_fields, handler = _cached_encrypt_build(
            encrypt, owner_password, id0, seed
        )
    objs: list[bytes] = []

    def obj(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages, 3 font, then per page
    # (page, content) pairs
    page_nums = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    obj(b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode())
    obj(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>")
    for i, text in enumerate(pages):
        pnum = page_nums[i]
        obj(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            f" /Resources << /Font << /F1 3 0 R >> >>"
            f" /Contents {pnum + 1} 0 R >>".encode()
        )
        lines = text.split("\n")
        try:
            shown = b" T*\n".join(
                b"(" + _pdf_escape(ln) + b") Tj" for ln in lines
            )
        except UnicodeEncodeError as e:
            raise ValueError(
                f"encode_pdf: page {i} has non-WinAnsi text ({e})"
            ) from None
        content = (
            b"BT\n/F1 11 Tf\n13 TL\n72 720 Td\n" + shown + b"\nET\n"
        )
        if compress:
            payload = zlib.compress(content, 9)
            filt = b" /Filter /FlateDecode"
        else:
            payload = content
            filt = b""
        if handler is not None:
            import hashlib as _hl

            iv = _hl.md5(id0 + b"|iv|%d" % (pnum + 1)).digest()
            payload = handler.encrypt_stream(pnum + 1, 0, payload, iv=iv)
        head = (f"<< /Length {len(payload)}".encode() + filt + b" >>")
        obj(head + b"\nstream\n" + payload + b"\nendstream")

    enc_num = None
    if enc_fields is not None:
        enc_num = obj(_ser_pdf_value(enc_fields))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    extra = ""
    if enc_num is not None:
        hx = id0.hex()
        extra = f" /Encrypt {enc_num} 0 R /ID [<{hx}> <{hx}>]"
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{extra} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------------ spark operator


PDF_PAGES_SCHEMA = "doc_id long, page int, text string"


def pdf_pages(
    df, *, content_col: str = "content", id_col: str = "doc_id",
    on_error: str = "error",
):
    """(doc_id, page, text) — one row per PDF page, text-layer
    extracted executor-side in one Arrow mapInPandas pass (map-side,
    no shuffle; the 100 TB shape is identical to the image/audio
    decode operators). on_error='skip' drops undecodable documents
    (the crawl posture); 'error' re-raises (the fixture posture)."""
    import pandas as pd

    if on_error not in ("error", "skip"):
        raise ValueError(f"pdf_pages: bad on_error {on_error!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out = {"doc_id": [], "page": [], "text": []}
            for did, blob in zip(pdf_batch[id_col],
                                 pdf_batch[content_col]):
                try:
                    texts = extract_pdf_text(bytes(blob))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                for i, t in enumerate(texts):
                    out["doc_id"].append(did)
                    out["page"].append(i)
                    out["text"].append(t)
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, PDF_PAGES_SCHEMA)


# ----------------------------------------------------- embedded images


def _image_xobjects(doc: PdfDocument, resources, depth: int = 0):
    """Yield (name, dict, ref) for every /Image XObject reachable from
    `resources`, recursing through Form XObjects (depth-capped)."""
    if depth > 8 or not isinstance(resources, dict):
        return
    xobjects = doc.resolve(resources.get("XObject")) or {}
    if not isinstance(xobjects, dict):
        return
    for name, ref in xobjects.items():
        if not isinstance(ref, _Ref):
            continue
        try:
            xd = doc.resolve(ref)
        except PdfError:
            continue
        if not isinstance(xd, dict):
            continue
        sub = xd.get("Subtype")
        if sub == "Image":
            yield str(name), xd, ref
        elif sub == "Form":
            yield from _image_xobjects(
                doc, doc.resolve(xd.get("Resources")), depth + 1
            )


def _decode_image_xobject(doc: PdfDocument, xd: dict, ref: _Ref):
    """One /Image XObject -> np.ndarray (h,w,3) u8 RGB or (h,w) u8
    gray. Refuses unsupported shapes BY NAME."""
    import numpy as np

    if doc.resolve(xd.get("ImageMask")) is True:
        raise NotImplementedError("pdf image: ImageMask is not supported")
    w = int(doc.resolve(xd.get("Width") or 0))
    h = int(doc.resolve(xd.get("Height") or 0))
    if w <= 0 or h <= 0:
        raise PdfError("pdf image: missing/invalid Width/Height")
    filters = doc.resolve(xd.get("Filter"))
    if not isinstance(filters, list):
        filters = [filters] if filters is not None else []
    filters = [str(doc.resolve(f)) for f in filters]
    if filters and filters[-1] == "DCTDecode":
        # the payload after any earlier filters IS a JFIF/JPEG file;
        # decode with the repo's own T.81 codec
        from muopdb_spark.operators.jpeg import decode_jpeg

        head = dict(xd)
        head["Filter"] = [_Name(f) for f in filters[:-1]]
        parms = doc.resolve(xd.get("DecodeParms"))
        if isinstance(parms, list) and len(parms) == len(filters):
            head["DecodeParms"] = parms[:-1]
        payload = _apply_filters(head, doc._streams.get(ref.num, b""), doc)
        arr = decode_jpeg(payload)
        return arr, "jpeg"
    bits = int(doc.resolve(xd.get("BitsPerComponent") or 8))
    if bits != 8:
        raise NotImplementedError(
            f"pdf image: BitsPerComponent {bits} is not supported"
        )
    cs = doc.resolve(xd.get("ColorSpace"))
    if isinstance(cs, list):
        csname = str(doc.resolve(cs[0])) if cs else ""
    else:
        csname = str(cs) if cs is not None else ""
    if csname not in ("DeviceRGB", "DeviceGray", "CalRGB", "CalGray"):
        raise NotImplementedError(
            f"pdf image: color space {csname!r} is not supported"
        )
    ncomp = 3 if csname in ("DeviceRGB", "CalRGB") else 1
    samples = doc.stream_bytes(xd, ref.num)
    need = w * h * ncomp
    if len(samples) < need:
        raise PdfError(
            f"pdf image: {len(samples)} sample bytes for {w}x{h}x{ncomp}"
        )
    arr = np.frombuffer(samples[:need], dtype=np.uint8)
    arr = arr.reshape((h, w, ncomp)) if ncomp == 3 else arr.reshape((h, w))
    return arr, ("flate" if "FlateDecode" in filters else "raw")


def extract_pdf_images(data: bytes) -> list[dict]:
    """Embedded raster images of every page: [{page, name, width,
    height, format, pixels}] where format is 'jpeg' (DCTDecode via the
    repo JPEG codec), 'flate' or 'raw' (8-bit DeviceRGB/DeviceGray
    samples) and pixels is the decoded np.uint8 array. Unsupported
    image shapes raise NotImplementedError by name; malformed files
    raise PdfError. Soft masks (/SMask alpha) are ignored — the RGB
    plane is extracted."""
    doc = PdfDocument(data)
    out: list[dict] = []
    for pageno, page in enumerate(doc.pages()):
        res = doc.resolve(page.get("Resources"))
        for name, xd, ref in _image_xobjects(doc, res):
            arr, fmt = _decode_image_xobject(doc, xd, ref)
            out.append({
                "page": pageno,
                "name": name,
                "width": int(arr.shape[1]),
                "height": int(arr.shape[0]),
                "format": fmt,
                "pixels": arr,
            })
    return out


def encode_pdf_images(
    pages: list[tuple[str, list]], *, jpeg_quality: int = 90,
) -> bytes:
    """Deterministic writer twin for image PDFs: each page is
    (text, [images]) where an image is an np.uint8 RGB (h,w,3) or
    gray (h,w) array, or a ('jpeg', rgb_array) tuple to embed it
    DCTDecode-compressed through the repo JPEG encoder. Text uses the
    encode_pdf Helvetica/WinAnsi convention; zero dates/IDs, classic
    xref — byte-identical re-exports."""
    import numpy as np

    if not pages:
        raise ValueError("encode_pdf_images: no pages")
    objs: list[bytes] = []

    def obj(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    obj(b"<< /Type /Catalog /Pages 2 0 R >>")
    obj(b"PLACEHOLDER-PAGES")
    obj(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>")
    page_nums: list[int] = []
    for i, (text, images) in enumerate(pages):
        img_nums: list[int] = []
        img_dims: list[tuple[int, int]] = []
        for img in images:
            fmt = "flate"
            if isinstance(img, tuple):
                fmt, img = img
                if fmt != "jpeg":
                    raise ValueError(
                        f"encode_pdf_images: bad image format {fmt!r}"
                    )
            arr = np.asarray(img, dtype=np.uint8)
            if arr.ndim == 3 and arr.shape[2] == 3:
                cs, gray = b"/DeviceRGB", False
            elif arr.ndim == 2:
                cs, gray = b"/DeviceGray", True
            else:
                raise ValueError(
                    f"encode_pdf_images: bad image shape {arr.shape}"
                )
            h, w = int(arr.shape[0]), int(arr.shape[1])
            if fmt == "jpeg":
                from muopdb_spark.operators.jpeg import encode_jpeg

                if gray:
                    raise ValueError(
                        "encode_pdf_images: jpeg embedding requires RGB"
                    )
                payload = encode_jpeg(arr, quality=jpeg_quality)
                filt = b"/DCTDecode"
            else:
                payload = zlib.compress(arr.tobytes(), 9)
                filt = b"/FlateDecode"
            head = (
                b"<< /Type /XObject /Subtype /Image"
                + f" /Width {w} /Height {h}".encode()
                + b" /ColorSpace " + cs
                + b" /BitsPerComponent 8 /Filter " + filt
                + f" /Length {len(payload)} >>".encode()
            )
            img_nums.append(
                obj(head + b"\nstream\n" + payload + b"\nendstream")
            )
            img_dims.append((w, h))
        lines = (text or "").split("\n") if text else []
        body = b"BT\n/F1 11 Tf\n13 TL\n72 720 Td\n"
        if lines:
            try:
                body += b" T*\n".join(
                    b"(" + _pdf_escape(ln) + b") Tj" for ln in lines
                )
            except UnicodeEncodeError as e:
                raise ValueError(
                    f"encode_pdf_images: page {i} non-WinAnsi ({e})"
                ) from None
        body += b"\nET\n"
        for j, (inum, (w, h)) in enumerate(zip(img_nums, img_dims)):
            x, y = 72 + 20 * j, 400 - 20 * j
            body += (
                f"q {w} 0 0 {h} {x} {y} cm /Im{j} Do Q\n".encode()
            )
        payload = zlib.compress(body, 9)
        cnum = obj(
            f"<< /Length {len(payload)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + payload + b"\nendstream"
        )
        xdict = b" ".join(
            f"/Im{j} {n} 0 R".encode() for j, n in enumerate(img_nums)
        )
        page_nums.append(obj(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> /XObject << "
            + xdict + b" >> >>"
            + f" /Contents {cnum} 0 R >>".encode()
        ))
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    objs[1] = (
        f"<< /Type /Pages /Count {len(page_nums)} /Kids [{kids}] >>"
        .encode()
    )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


PDF_IMAGES_SCHEMA = (
    "doc_id long, page int, img_idx int, width int, height int,"
    " format string, dhash long"
)


def pdf_image_features(
    df, *, content_col: str = "content", id_col: str = "doc_id",
    on_error: str = "error",
):
    """(doc_id, page, img_idx, width, height, format, dhash) — one row
    per embedded raster image, decoded and perceptually hashed
    executor-side in one Arrow pass. The dhash column is the SAME
    64-bit dHash the image near-dup family keys on (operators/image.py
    to_gray -> area_resize -> dhash64), so PDF figures join
    hash64_near_dup / image_near_dup pipelines unchanged. on_error=
    'skip' drops undecodable documents (crawl posture)."""
    import pandas as pd

    if on_error not in ("error", "skip"):
        raise ValueError(f"pdf_image_features: bad on_error {on_error!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from muopdb_spark.operators.image import (
            area_resize,
            dhash64,
            to_gray,
        )

        for pdf_batch in batches:
            out = {k: [] for k in (
                "doc_id", "page", "img_idx", "width", "height",
                "format", "dhash",
            )}
            for did, blob in zip(pdf_batch[id_col],
                                 pdf_batch[content_col]):
                try:
                    images = extract_pdf_images(bytes(blob))
                except Exception:
                    if on_error == "skip":
                        continue
                    raise
                for j, im in enumerate(images):
                    px = im["pixels"]
                    gray = to_gray(px) if px.ndim == 3 else \
                        px.astype("float64")
                    out["doc_id"].append(did)
                    out["page"].append(im["page"])
                    out["img_idx"].append(j)
                    out["width"].append(im["width"])
                    out["height"].append(im["height"])
                    out["format"].append(im["format"])
                    out["dhash"].append(dhash64(area_resize(gray, 8, 9)))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, PDF_IMAGES_SCHEMA)

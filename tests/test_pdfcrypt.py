"""PDF standard security handler (operators/pdfcrypt.py, r15):
primitive ciphers pinned against published vectors (FIPS-197
appendix C for AES, the classic public RC4 vectors), key-derivation
algorithms per ISO 32000, writer<->reader roundtrips for all four
modes through the real PDF codec, and named refusals for
password-protected documents and foreign handlers."""

from __future__ import annotations

import hashlib
import struct

import pytest

from muopdb_spark.operators.pdf import (
    PdfDocument,
    encode_pdf,
    extract_pdf_text,
)
from muopdb_spark.operators.pdfcrypt import (
    PAD,
    PdfPasswordError,
    _INV_SBOX,
    _SBOX,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_ecb_decrypt,
    aes_ecb_encrypt,
    aes_pdf_decrypt,
    aes_pdf_encrypt,
    build_standard_encrypt,
    compute_o_r234,
    compute_u_r34,
    derive_key_r234,
    hash_2b,
    open_standard,
    rc4,
)

# --------------------------------------------------- cipher vectors


def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for khex, chex in cases:
        k = bytes.fromhex(khex)
        ct = aes_ecb_encrypt(k, pt)
        assert ct.hex() == chex
        assert aes_ecb_decrypt(k, ct) == pt


def test_aes_sbox_generated_matches_spec_points():
    # FIPS-197 §5.1.1 published S-box spot values
    assert _SBOX[0x00] == 0x63
    assert _SBOX[0x53] == 0xED
    assert _SBOX[0xFF] == 0x16
    assert all(_INV_SBOX[_SBOX[x]] == x for x in range(256))


def test_rc4_public_vectors():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert rc4(b"Secret", b"Attack at dawn").hex().upper() == \
        "45A01F645FC35B383552544B9BF5"
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"roundtrip")) == b"roundtrip"


def test_cbc_and_pdf_payload_roundtrips():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    data = bytes(range(96))
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, data)) == data
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes(range(n % 256)) * (n // max(n % 256, 1) + 1)
        msg = msg[:n]
        assert aes_pdf_decrypt(key, aes_pdf_encrypt(key, msg, iv)) == msg
    # damaged short payloads never raise
    assert aes_pdf_decrypt(key, b"") == b""
    assert aes_pdf_decrypt(key, b"short") == b""


# ------------------------------------------ key derivation contracts


def test_pad_constant_shape():
    assert len(PAD) == 32 and PAD[0] == 0x28 and PAD[-1] == 0x7A


def test_derive_key_independent_reimplementation():
    """Algorithm 2 recomputed from the spec text, structured
    differently, must agree — catches transcription slips the
    roundtrip tests can't see."""
    o = bytes(range(32))
    id0 = b"\xAB" * 16
    p = -44
    got = derive_key_r234(b"", o, p, id0, 3, 16, True)
    # independent: explicit md5 chain
    m = hashlib.md5(
        PAD + o + struct.pack("<i", p) + id0
    ).digest()
    for _ in range(50):
        m = hashlib.md5(m[:16]).digest()
    assert got == m[:16]
    # R4 without metadata encryption appends ffffffff
    got4 = derive_key_r234(b"", o, p, id0, 4, 16, False)
    m = hashlib.md5(
        PAD + o + struct.pack("<i", p) + id0 + b"\xff" * 4
    ).digest()
    for _ in range(50):
        m = hashlib.md5(m[:16]).digest()
    assert got4 == m[:16]


def test_hash_2b_properties():
    # deterministic, 32 bytes, salt-sensitive
    a = hash_2b(b"", b"saltsalt")
    assert len(a) == 32
    assert a == hash_2b(b"", b"saltsalt")
    assert a != hash_2b(b"", b"other--8")
    assert a != hash_2b(b"x", b"saltsalt")


# --------------------------------------------- handler + codec e2e


PAGES = ["Hello encrypted world\nSecond line", "Page two text"]
MODES = ("rc4-40", "rc4-128", "aes-128", "aes-256")


@pytest.mark.parametrize("mode", MODES)
def test_encrypted_pdf_roundtrip(mode):
    plain = extract_pdf_text(encode_pdf(PAGES))
    data = encode_pdf(PAGES, encrypt=mode)
    assert extract_pdf_text(data) == plain
    # deterministic re-export (the writer contract)
    assert data == encode_pdf(PAGES, encrypt=mode)
    # really encrypted: the plaintext content markers are absent
    assert b"BT\n/F1" not in data
    doc = PdfDocument(data)
    assert doc._handler is not None


@pytest.mark.parametrize("mode", MODES)
def test_handler_string_and_stream_symmetry(mode):
    enc, h = build_standard_encrypt(mode, id0=b"\x01" * 16)
    h2 = open_standard(enc, b"\x01" * 16, lambda x: x)
    iv = bytes(16)
    for num, gen in ((1, 0), (500, 0), (7, 3)):
        ct = h.encrypt_stream(num, gen, b"stream payload", iv=iv)
        assert h2.decrypt_stream(num, gen, ct) == b"stream payload"
        ct = h.encrypt_string(num, gen, b"(str)", iv=iv)
        assert h2.decrypt_string(num, gen, ct) == b"(str)"
    if mode != "aes-256":
        # per-object keys differ per (num, gen) below V5
        c1 = h.encrypt_stream(1, 0, b"x" * 16, iv=iv)
        c2 = h.encrypt_stream(2, 0, b"x" * 16, iv=iv)
        assert c1 != c2


@pytest.mark.parametrize("cf_length", [16, 128])
def test_r4_missing_document_length_falls_back_to_cf(cf_length):
    """A V=4/R=4 AESV2 file whose key size lives ONLY in the /CF StdCF
    /Length entry (the document-level /Length is deprecated and real
    writers omit it) must derive the 16-byte key, pass the /U check,
    and decrypt — not be misreported as password-protected (r16 advice
    fix). Both CF encodings occur in the wild: bytes (16, per spec)
    and bits (128)."""
    enc, h = build_standard_encrypt("aes-128", id0=b"\x01" * 16)
    del enc["Length"]
    enc["CF"]["StdCF"]["Length"] = cf_length
    h2 = open_standard(enc, b"\x01" * 16, lambda x: x)
    iv = bytes(16)
    ct = h.encrypt_stream(3, 0, b"fallback payload", iv=iv)
    assert h2.decrypt_stream(3, 0, ct) == b"fallback payload"


def test_password_protected_refuses_by_name():
    """A real (non-empty) user password must refuse, naming the
    reason — owner/user-password documents stay out of scope."""
    o = compute_o_r234(b"owner", b"realpw", 3, 16)
    key = derive_key_r234(b"realpw", o, -4, b"\x01" * 16, 3, 16, True)
    u = compute_u_r34(key, b"\x01" * 16)
    with pytest.raises(NotImplementedError, match="password"):
        open_standard(
            {"Filter": "Standard", "V": 2, "R": 3, "Length": 128,
             "O": o, "U": u[:32], "P": -4},
            b"\x01" * 16, lambda x: x,
        )
    assert issubclass(PdfPasswordError, NotImplementedError)


def test_foreign_handler_and_revision_refuse_by_name():
    with pytest.raises(NotImplementedError, match="security handler"):
        open_standard({"Filter": "FooSec"}, b"", lambda x: x)
    with pytest.raises(NotImplementedError, match="revision"):
        open_standard(
            {"Filter": "Standard", "V": 1, "R": 99}, b"", lambda x: x
        )


def test_encrypted_doc_through_document_reader_strings():
    """Strings in top-level objects decrypt through PdfDocument.get
    (content streams are covered by stream decryption; this pins the
    string path with a hand-built document)."""
    from muopdb_spark.operators.pdfcrypt import (
        StandardSecurityHandler,
    )

    enc_fields, h = build_standard_encrypt("aes-128", id0=b"\x02" * 16)
    secret = h.encrypt_string(
        4, 0, b"decrypted title", iv=hashlib.md5(b"iv4").digest()
    )
    from muopdb_spark.operators.pdf import _ser_pdf_value

    body = []
    body.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    body.append(b"<< /Type /Pages /Count 0 /Kids [] >>")
    body.append(_ser_pdf_value(enc_fields))
    body.append(b"<< /Title <" + secret.hex().encode() + b"> >>")
    out = bytearray(b"%PDF-1.4\n")
    for i, b in enumerate(body, start=1):
        out += f"{i} 0 obj\n".encode() + b + b"\nendobj\n"
    hx = (b"\x02" * 16).hex()
    out += (
        f"trailer\n<< /Size 5 /Root 1 0 R /Encrypt 3 0 R"
        f" /ID [<{hx}> <{hx}>] >>\n%%EOF\n"
    ).encode()
    doc = PdfDocument(bytes(out))
    info = doc.resolve(doc.get(4))
    assert info["Title"] == b"decrypted title"
    # the encrypt dict's own strings are NOT decrypted
    enc = doc.resolve(doc.get(3))
    assert bytes(enc["O"]) == bytes(enc_fields["O"])


def test_unencrypted_paths_unchanged():
    data = encode_pdf(PAGES)
    doc = PdfDocument(data)
    assert doc._handler is None
    assert extract_pdf_text(data)[0].startswith("Hello encrypted world")


def test_mixed_crypt_filters_identity_strings():
    """V4 documents may encrypt streams but pass strings through
    (/StrF /Identity) — the selector honors each face separately."""
    enc, h = build_standard_encrypt("aes-128", id0=b"\x03" * 16)
    enc = dict(enc)
    enc["StrF"] = "Identity"
    h2 = open_standard(enc, b"\x03" * 16, lambda x: x)
    assert h2.stm_cfm == "AESV2" and h2.str_cfm == "Identity"
    # strings untouched, streams decrypted
    assert h2.decrypt_string(4, 0, b"plain (str)") == b"plain (str)"
    ct = h.encrypt_stream(4, 0, b"payload", iv=bytes(16))
    assert h2.decrypt_stream(4, 0, ct) == b"payload"


def test_trailer_id_hex_with_whitespace_parses():
    """ISO 32000 §7.3.4.3 allows whitespace inside hex strings; the
    /ID parser must use the real object parser, not a stricter regex
    that silently derives the wrong key and misreports a readable
    file as password-protected (r15 review fix)."""
    data = encode_pdf(["secret page"], encrypt="rc4-128")
    # rewrite the trailer /ID hex with whitespace sprinkled in
    import re

    m = list(re.finditer(rb"/ID \[<([0-9a-f]+)> <([0-9a-f]+)>\]", data))
    assert m, "writer trailer shape changed"
    hx = m[-1].group(1)
    spaced = b" ".join(hx[i:i + 4] for i in range(0, len(hx), 4))
    mutated = data.replace(
        b"<" + hx + b">", b"< " + spaced + b" >"
    )
    assert mutated != data
    assert extract_pdf_text(mutated) == extract_pdf_text(data)


def test_cfm_selector_resolves_indirect():
    """An indirect /StmF selector ('/StmF 12 0 R') resolves through
    the resolve callback like every other /Encrypt value (r15 review
    fix) — it must not stringify as '12 0 R' and refuse."""
    enc, h = build_standard_encrypt("aes-128", id0=b"\x04" * 16)
    sentinel = object()
    enc = dict(enc)
    enc["StmF"] = sentinel
    enc["StrF"] = sentinel

    def resolve(v):
        return "StdCF" if v is sentinel else v

    h2 = open_standard(enc, b"\x04" * 16, resolve)
    ct = h.encrypt_stream(5, 0, b"payload", iv=bytes(16))
    assert h2.decrypt_stream(5, 0, ct) == b"payload"


# ------------------------------ OpenSSL fast path (r16 optimization)


def test_openssl_and_pure_python_paths_agree(monkeypatch):
    """r16: rc4/aes_* delegate to OpenSSL when the `cryptography`
    wheel is present (guide §4.2 — native bulk byte work; measured
    ~95x on CBC). Both standard ciphers are fully specified, so the
    two paths must be BIT-IDENTICAL on every PDF-reachable key size;
    this pin forces the pure-Python rendition and compares."""
    import random

    from muopdb_spark.operators import pdfcrypt as pc

    if not pc._OPENSSL:
        pytest.skip("cryptography wheel not installed")
    rng = random.Random(0xC0FFEE)

    def rand(n: int) -> bytes:
        return bytes(rng.getrandbits(8) for _ in range(n))

    cases = []  # (fn args) computed with OpenSSL enabled
    for klen in (5, 10, 16):  # PDF RC4 keys: 40-bit, obj (n+5), 128
        key, data = rand(klen), rand(333)
        cases.append(("rc4", key, None, data, pc.rc4(key, data)))
    for klen in (16, 24, 32):
        key, iv = rand(klen), rand(16)
        data = rand(25 * 16)
        cases.append(
            ("ecb_e", key, None, data, pc.aes_ecb_encrypt(key, data)))
        cases.append(("cbc_e", key, iv, data,
                      pc.aes_cbc_encrypt(key, iv, data)))
        ct = pc.aes_cbc_encrypt(key, iv, data)
        cases.append(("cbc_d", key, iv, ct,
                      pc.aes_cbc_decrypt(key, iv, ct)))
        cases.append(("ecb_d", key, None, pc.aes_ecb_encrypt(key, data),
                      pc.aes_ecb_decrypt(key, pc.aes_ecb_encrypt(key, data))))

    monkeypatch.setattr(pc, "_OPENSSL", None)
    fns = {"rc4": lambda k, iv, d: pc.rc4(k, d),
           "ecb_e": lambda k, iv, d: pc.aes_ecb_encrypt(k, d),
           "ecb_d": lambda k, iv, d: pc.aes_ecb_decrypt(k, d),
           "cbc_e": pc.aes_cbc_encrypt,
           "cbc_d": pc.aes_cbc_decrypt}
    for name, key, iv, data, expected in cases:
        assert fns[name](key, iv, data) == expected, name


def test_pure_python_fallback_still_passes_vectors(monkeypatch):
    """The spec renditions stay pinned even where the OpenSSL path
    now serves the suite's other calls."""
    from muopdb_spark.operators import pdfcrypt as pc

    monkeypatch.setattr(pc, "_OPENSSL", None)
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == \
        "BBF316E8D940AF0AD3"
    k = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = pc.aes_ecb_encrypt(k, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert pc.aes_ecb_decrypt(k, ct) == pt

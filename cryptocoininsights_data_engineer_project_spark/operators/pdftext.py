"""PDF text extraction (ISO 32000 / the PDF 1.4 subset) — the most
common non-HTML text carrier in a real crawl (VERDICT r13 item 1).
Stdlib-only, like every decoder in this repo: FlateDecode is zlib
(the PNG precedent), and text is Tj/TJ/'/" show operators inside
BT/ET blocks of the page content streams.

Scope (each limit gates LOUDLY, the house convention):

* BOTH cross-reference forms: classic ``xref`` TABLES (+ ``trailer``
  dicts, /Prev chains followed) AND the PDF 1.5 cross-reference
  STREAMS (/Type /XRef with /W field widths, /Index subsections,
  and the PNG row predictors encoders ship them with) including
  type-2 entries that locate objects inside /Type /ObjStm object
  streams — the modern default for real crawled PDFs.
* Encrypted documents decode for the Standard handler with an
  empty user password: V1/V2 RC4 (r15), V4 /AESV2 crypt filters and
  V5 R6 /AESV3 AES-256 (r16); non-Standard handlers and non-empty
  user passwords raise by name.
* Stream filters: none (raw), /FlateDecode (zlib; /DecodeParms PNG
  predictors 10+ AND the TIFF predictor 2 decode as of r16),
  /LZWDecode (the TIFF-convention MSB-first variant with
  EarlyChange), /RunLengthDecode, /ASCIIHexDecode and
  /ASCII85Decode — filter CHAINS and per-filter DecodeParms arrays
  handled. Every other filter (DCTDecode outside pdf_images, CCITT,
  JBIG2, JPX, Crypt) raises naming it.
* Text strings: literal ``(...)`` with the full escape grammar
  (\\n \\r \\t \\b \\f \\( \\) \\\\, 1-3 digit octal, line
  continuations, balanced nested parens) and hex ``<...>`` strings.
  Bytes decode as Latin-1 — correct for the Standard/WinAnsi
  simple-font range the fixtures use; composite-font CID streams
  would need ToUnicode CMaps, which is out of subset (the extracted
  bytes are still deterministic, just not Unicode-mapped).
* Layout model: within a BT/ET block every show operator appends its
  string; any positioning operator between shows (Td/TD/T*/Tm, and
  the line-advancing ' and ") inserts ONE space. TJ kerning numbers
  are ignored (intra-array strings concatenate directly). Pages come
  out as separate rows — callers join with newlines for one text.

Reference parity note: the reference pipeline (coininsights.py) has
no document-format path at all — this module belongs to the
beyond-reference LLM-data frontier (pipeline/corpus.py::docs_from_warc
previously DROPPED every PDF response; see warc chain wiring in
operators/webarchive.py::warc_doc_text).
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    """Malformed PDF structure."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Byte-level PDF object lexer (ISO 32000-1 §7.2/7.3)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment runs to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_keyword(self, kw: bytes) -> bool:
        self._skip_ws()
        return self.data[self.pos : self.pos + len(kw)] == kw

    def expect_keyword(self, kw: bytes) -> None:
        if not self.peek_keyword(kw):
            got = self.data[self.pos : self.pos + len(kw) + 8]
            raise PdfError(f"expected {kw!r}, got {got!r}")
        self.pos += len(kw)

    def parse_object(self):
        """One PDF object: dict, array, name, number, string, hex
        string, bool, null, or an indirect reference (returned as
        ``("ref", num, gen)``)."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfError("unexpected end of data")
        c = d[self.pos]
        if d[self.pos : self.pos + 2] == b"<<":
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if d[self.pos : self.pos + 4] == b"true":
            self.pos += 4
            return True
        if d[self.pos : self.pos + 5] == b"false":
            self.pos += 5
            return False
        if d[self.pos : self.pos + 4] == b"null":
            self.pos += 4
            return None
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        raise PdfError(f"unparseable object at byte {self.pos}: {d[self.pos:self.pos+16]!r}")

    def _parse_dict(self):
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self._parse_name()
            out[key] = self.parse_object()

    def _parse_array(self):
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_name(self) -> str:
        if self.data[self.pos] != 0x2F:
            raise PdfError(f"expected name at byte {self.pos}")
        self.pos += 1
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes inside names (ISO 32000-1 §7.3.5)
        return re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        ).decode("latin-1")

    def _parse_number_or_ref(self):
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] in b"+-.0123456789":
            self.pos += 1
        tok = d[start : self.pos]
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError:
            # a lone sign/dot (e.g. "-" with nothing after it — seen
            # under fuzzed/garbled input) is a typed syntax error
            raise PdfError(f"malformed number {tok!r}") from None
        # "N G R" lookahead for an indirect reference
        save = self.pos
        self._skip_ws()
        start2 = self.pos
        while self.pos < len(d) and d[self.pos] in b"0123456789":
            self.pos += 1
        tok2 = d[start2 : self.pos]
        if tok2:
            save2 = self.pos
            self._skip_ws()
            if (
                self.data[self.pos : self.pos + 1] == b"R"
                and (
                    self.pos + 1 >= len(d)
                    or d[self.pos + 1] in _WS
                    or d[self.pos + 1] in _DELIM
                )
            ):
                self.pos += 1
                return ("ref", num, int(tok2))
            self.pos = save2 - len(tok2)
        self.pos = save
        return num

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while True:
            if self.pos >= len(d):
                raise PdfError("unterminated literal string")
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    raise PdfError("unterminated literal string")
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f",
                    }[e]
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":
                    oct_digits = bytearray()
                    while (
                        len(oct_digits) < 3
                        and self.pos < len(d)
                        and d[self.pos] in b"01234567"
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and d[self.pos : self.pos + 1] == b"\n":
                        self.pos += 1
                else:  # unknown escape: the char stands for itself
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1

    def _parse_hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        digits = bytearray()
        while True:
            if self.pos >= len(d):
                raise PdfError("unterminated hex string")
            c = d[self.pos]
            if c == 0x3E:  # '>'
                self.pos += 1
                break
            if c in _WS:
                self.pos += 1
                continue
            if c not in b"0123456789ABCDEFabcdef":
                raise PdfError(f"bad hex-string digit {bytes([c])!r}")
            digits.append(c)
            self.pos += 1
        if len(digits) % 2:  # odd count: final 0 implied (§7.3.4.3)
            digits.append(0x30)
        return bytes.fromhex(digits.decode("ascii"))




def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF/TIFF LZWDecode (ISO 32000-1 §7.4.4): MSB-first variable
    9-12 bit codes, Clear=256, EOD=257, code width grows one code
    EARLIER than the table fill when EarlyChange=1 (the default —
    the TIFF convention PDF inherited)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PdfError(f"LZW code {code} before any output")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PdfError(f"LZW code {code} skips the table")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    raise PdfError("LZW stream ended without an EOD code")


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): length byte < 128 copies the next
    n+1 bytes; > 128 repeats the next byte 257-n times; 128 is EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            return bytes(out)
        if n < 128:
            lit = data[i + 1 : i + 2 + n]
            if len(lit) != n + 1:
                raise PdfError("RunLengthDecode: literal run truncated")
            out += lit
            i += 2 + n
        else:
            if i + 1 >= len(data):
                raise PdfError("RunLengthDecode: repeat run truncated")
            out += data[i + 1 : i + 2] * (257 - n)
            i += 2
    raise PdfError("RunLengthDecode: missing EOD (128) byte")


def _asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>'
    terminates, odd final digit implies a trailing 0."""
    digits = bytearray()
    for c in data:
        if c in _WS:
            continue
        if c == 0x3E:  # '>'
            break
        if c not in b"0123456789ABCDEFabcdef":
            raise PdfError(f"ASCIIHexDecode: bad digit {bytes([c])!r}")
        digits.append(c)
    else:
        raise PdfError("ASCIIHexDecode: missing '>' terminator")
    if len(digits) % 2:
        digits.append(0x30)
    return bytes.fromhex(digits.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3) — Adobe dialect with the z shortcut and
    the ~> terminator; stdlib base64 implements it exactly."""
    import base64

    end = data.find(b"~>")
    if end < 0:
        raise PdfError("ASCII85Decode: missing '~>' terminator")
    body = bytes(c for c in data[:end] if c not in _WS)
    try:
        return base64.a85decode(body)
    except ValueError as e:
        raise PdfError(f"ASCII85Decode failed: {e}") from e

def _tiff_unpredict(data: bytes, columns: int, colors: int) -> bytes:
    """Undo TIFF predictor 2 (horizontal differencing, 8-bit
    components): within each row of ``columns`` pixels x ``colors``
    components, sample[i] += sample[i - colors] — no per-row tag
    byte (unlike the PNG predictors)."""
    row = columns * colors
    if row <= 0 or len(data) % row:
        raise PdfError(
            f"TIFF-predicted stream length {len(data)} is not a "
            f"multiple of row size {row}"
        )
    out = bytearray(data)
    for r in range(0, len(out), row):
        for i in range(colors, row):
            out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
    return bytes(out)


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Undo the PNG row predictors (RFC 2083 filters 0-4) over
    1-byte-per-pixel rows — the encoding xref streams almost always
    ship with (Predictor 12 = per-row Up). Each row is a 1-byte
    filter tag + ``columns`` bytes."""
    row = columns + 1
    if len(data) % row:
        raise PdfError(
            f"predicted stream length {len(data)} is not a multiple "
            f"of row size {row}"
        )
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), row):
        tag = data[r]
        cur = bytearray(data[r + 1 : r + row])
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for i in range(1, columns):
                cur[i] = (cur[i] + cur[i - 1]) & 0xFF
        elif tag == 2:  # Up
            for i in range(columns):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif tag == 3:  # Average
            for i in range(columns):
                left = cur[i - 1] if i else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for i in range(columns):
                a = cur[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise PdfError(f"unknown PNG predictor row tag {tag}")
        out += cur
        prev = cur
    return bytes(out)


# --------------------------------------------- standard security handler
# RC4 decryption for the /Filter /Standard handler, V 1/2, R 2/3
# (VERDICT r14 item 3): hashlib.md5 + a stdlib RC4 decrypt the
# common "owner-locked, empty-user-password" class of real-world
# PDFs. AES (V >= 4 / crypt filters) stays a named gate; a non-empty
# user password gates too (no password input channel here).
_ENC_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=512)
def _rc4_keystream(key: bytes, n: int) -> bytes:
    """The first n RC4 keystream bytes for a key. Cached: the
    keystream is independent of the plaintext, so documents sharing
    a key (same credentials + same /ID -> same per-object keys)
    XOR against one computed schedule instead of re-running the KSA
    per string — the dominant cost of bulk decryption. Unique-key
    files simply miss (bounded cache)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(n)
    i = j = 0
    for k in range(n):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric): the standard handler's V1/V2 cipher."""
    ks = _rc4_keystream(key, len(data))
    return bytes(a ^ b for a, b in zip(data, ks))


def _pad_password(pw: bytes) -> bytes:
    return (pw + _ENC_PAD)[:32]


@lru_cache(maxsize=512)
def _std_file_key(
    pw: bytes, o: bytes, p: int, id0: bytes, r: int, n: int
) -> bytes:
    """ISO 32000-1 Algorithm 2: the file encryption key."""
    import hashlib

    h = hashlib.md5(
        _pad_password(pw) + o[:32]
        + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


@lru_cache(maxsize=512)
def _std_user_check(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the expected /U value (R3: first
    16 bytes are significant)."""
    import hashlib

    if r == 2:
        return _rc4(key, _ENC_PAD)
    x = _rc4(key, hashlib.md5(_ENC_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x


@lru_cache(maxsize=512)
def _std_owner_value(
    owner_pw: bytes, user_pw: bytes, r: int, n: int
) -> bytes:
    """Algorithm 3: the /O value (encrypt-side; the builder uses it
    so fixtures carry spec-true O entries)."""
    import hashlib

    h = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    x = _rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
    return x


@lru_cache(maxsize=512)
def _obj_rc4_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    import hashlib

    h = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


# ------------------------------------------------------ AES (r16)
# Pure-Python AES (FIPS-197) for the standard handler's V4 (/AESV2,
# AES-128-CBC) and V5 (/AESV3, AES-256 + the 32000-2 Algorithm 2.B
# KDF) classes — modern encrypted PDFs are AES; RC4 above is the
# legacy half (VERDICT r15 item 2). Every table is DERIVED in code
# (GF(2^8) inverse + affine transform for the S-box, xtime products
# for the T-tables), so nothing numeric is transcribed — the
# SCALE.md bundling policy is satisfied by construction, and the
# FIPS-197 example vectors for all three key sizes pin the cipher
# in tests/test_pdftext.py. The hot path is the T-table form (4
# lookups + xors per column per round).


def _aes_build_sbox() -> tuple[bytes, bytes]:
    def gmul(a: int, b: int) -> int:
        r = 0
        for _ in range(8):
            if b & 1:
                r ^= a
            hi = a & 0x80
            a = (a << 1) & 0xFF
            if hi:
                a ^= 0x1B
            b >>= 1
        return r

    def ginv(a: int) -> int:  # multiplicative inverse: a^254
        if a == 0:
            return 0
        r, base, e = 1, a, 254
        while e:
            if e & 1:
                r = gmul(r, base)
            base = gmul(base, base)
            e >>= 1
        return r

    sbox = [0] * 256
    for i in range(256):
        b = ginv(i)
        x = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            x ^= b
        sbox[i] = x ^ 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return bytes(sbox), bytes(inv)


_AES_SBOX, _AES_INV_SBOX = _aes_build_sbox()


def _aes_xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _aes_gmul(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        a = _aes_xtime(a)
        b >>= 1
    return r


def _aes_build_ttables():
    def rotr32(w: int, n: int) -> int:
        return ((w >> n) | (w << (32 - n))) & 0xFFFFFFFF

    te0, td0 = [0] * 256, [0] * 256
    for x in range(256):
        s = _AES_SBOX[x]
        te0[x] = (_aes_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _aes_gmul(s, 3)
        si = _AES_INV_SBOX[x]
        td0[x] = (
            (_aes_gmul(si, 14) << 24) | (_aes_gmul(si, 9) << 16)
            | (_aes_gmul(si, 13) << 8) | _aes_gmul(si, 11)
        )
    te = [te0] + [[rotr32(w, 8 * i) for w in te0] for i in (1, 2, 3)]
    td = [td0] + [[rotr32(w, 8 * i) for w in td0] for i in (1, 2, 3)]
    return te, td


_AES_TE, _AES_TD = _aes_build_ttables()


def _aes_expand_key(key: bytes) -> list[bytes]:
    nk = len(key) // 4
    nr = nk + 6
    w = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(_AES_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ rcon, t[1], t[2], t[3]])
            rcon = _aes_xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = bytes(_AES_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(nr + 1)]


@lru_cache(maxsize=64)
def _aes_rk_words(key: bytes) -> tuple:
    return tuple(
        tuple(int.from_bytes(rk[4 * i : 4 * i + 4], "big") for i in range(4))
        for rk in _aes_expand_key(key)
    )


@lru_cache(maxsize=64)
def _aes_dk_words(key: bytes) -> tuple:
    """Equivalent-inverse-cipher round keys: reversed schedule with
    InvMixColumns folded into all but the first and last keys."""
    rws = _aes_rk_words(key)
    nr = len(rws) - 1
    td0, td1, td2, td3 = _AES_TD
    s = _AES_SBOX
    out = [rws[nr]]
    for r in range(nr - 1, 0, -1):
        out.append(tuple(
            td0[s[(w >> 24) & 0xFF]] ^ td1[s[(w >> 16) & 0xFF]]
            ^ td2[s[(w >> 8) & 0xFF]] ^ td3[s[w & 0xFF]]
            for w in rws[r]
        ))
    out.append(rws[0])
    return tuple(out)


def _aes_encrypt_block(block: bytes, rws) -> bytes:
    te0, te1, te2, te3 = _AES_TE
    s = _AES_SBOX
    nr = len(rws) - 1
    w = [int.from_bytes(block[4 * i : 4 * i + 4], "big") ^ rws[0][i]
         for i in range(4)]
    for r in range(1, nr):
        rk = rws[r]
        w = [
            te0[(w[j] >> 24) & 0xFF] ^ te1[(w[(j + 1) % 4] >> 16) & 0xFF]
            ^ te2[(w[(j + 2) % 4] >> 8) & 0xFF] ^ te3[w[(j + 3) % 4] & 0xFF]
            ^ rk[j]
            for j in range(4)
        ]
    rk = rws[nr]
    out = bytearray(16)
    for j in range(4):
        v = (
            (s[(w[j] >> 24) & 0xFF] << 24)
            | (s[(w[(j + 1) % 4] >> 16) & 0xFF] << 16)
            | (s[(w[(j + 2) % 4] >> 8) & 0xFF] << 8)
            | s[w[(j + 3) % 4] & 0xFF]
        ) ^ rk[j]
        out[4 * j : 4 * j + 4] = v.to_bytes(4, "big")
    return bytes(out)


def _aes_decrypt_block(block: bytes, dws) -> bytes:
    td0, td1, td2, td3 = _AES_TD
    si = _AES_INV_SBOX
    nr = len(dws) - 1
    w = [int.from_bytes(block[4 * i : 4 * i + 4], "big") ^ dws[0][i]
         for i in range(4)]
    for r in range(1, nr):
        rk = dws[r]
        w = [
            td0[(w[j] >> 24) & 0xFF] ^ td1[(w[(j + 3) % 4] >> 16) & 0xFF]
            ^ td2[(w[(j + 2) % 4] >> 8) & 0xFF] ^ td3[w[(j + 1) % 4] & 0xFF]
            ^ rk[j]
            for j in range(4)
        ]
    rk = dws[nr]
    out = bytearray(16)
    for j in range(4):
        v = (
            (si[(w[j] >> 24) & 0xFF] << 24)
            | (si[(w[(j + 3) % 4] >> 16) & 0xFF] << 16)
            | (si[(w[(j + 2) % 4] >> 8) & 0xFF] << 8)
            | si[w[(j + 1) % 4] & 0xFF]
        ) ^ rk[j]
        out[4 * j : 4 * j + 4] = v.to_bytes(4, "big")
    return bytes(out)


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, NO padding (callers pad; the 2.B KDF and /UE
    mixing run unpadded by spec).

    CBC encryption chains, so unlike the decrypt side it cannot
    vectorize across blocks — instead the whole stream runs in ONE
    int-domain loop: plaintext words unpack once, the chaining state
    and round state live in four locals, rounds are the unrolled
    T-table form, and ciphertext packs once at the end. Measured ~4x
    over the former per-block helper (bytes slice + int.from_bytes +
    list building per round per block) — this is the scalar hot path
    of the Algorithm 2.B KDF (>= 64 rounds x 128-320 blocks per
    derivation, once per worker per credential class)."""
    if len(data) % 16:
        raise PdfError("AES-CBC input not block-aligned")
    import struct

    rws = _aes_rk_words(key)
    nr = len(rws) - 1
    te0, te1, te2, te3 = _AES_TE
    nw = len(data) // 4
    words = struct.unpack(f">{nw}I", data)
    c0, c1, c2, c3 = struct.unpack(">4I", iv)
    flat = tuple(w for rk in rws for w in rk)
    out = _cbc_enc_fn(nr)(
        words, c0, c1, c2, c3, flat, te0, te1, te2, te3, _AES_SBOX
    )
    return struct.pack(f">{nw}I", *out)


# round-count-specialized (NOT key-specialized — the 2.B KDF re-keys
# every round, so key-baked code would recompile per round) CBC
# encrypt bodies: the middle rounds fully unrolled and every round-key
# word a local bound once per CALL, replacing the former per-block
# `for rk in mid` tuple indexing. Same T-table arithmetic — the
# FIPS-197 pinned vectors in tests cover all three key sizes.
_CBC_ENC_FNS: dict[int, object] = {}


def _cbc_enc_fn(nr: int):
    fn = _CBC_ENC_FNS.get(nr)
    if fn is not None:
        return fn
    names = [f"k{r}_{j}" for r in range(nr + 1) for j in range(4)]
    rot = ((0, 1, 2, 3), (1, 2, 3, 0), (2, 3, 0, 1), (3, 0, 1, 2))
    src = [
        "def _enc(words, c0, c1, c2, c3, flat, te0, te1, te2, te3, s):",
        f"    ({', '.join(names)}) = flat",
        "    out = []",
        "    ap = out.extend",
        "    for i in range(0, len(words), 4):",
        "        w0 = words[i] ^ c0 ^ k0_0",
        "        w1 = words[i + 1] ^ c1 ^ k0_1",
        "        w2 = words[i + 2] ^ c2 ^ k0_2",
        "        w3 = words[i + 3] ^ c3 ^ k0_3",
    ]
    for r in range(1, nr):
        for j, (a, b, c, d) in enumerate(rot):
            src.append(
                f"        t{j} = te0[(w{a} >> 24) & 255]"
                f" ^ te1[(w{b} >> 16) & 255]"
                f" ^ te2[(w{c} >> 8) & 255]"
                f" ^ te3[w{d} & 255] ^ k{r}_{j}"
            )
        src.append("        w0 = t0; w1 = t1; w2 = t2; w3 = t3")
    for j, (a, b, c, d) in enumerate(rot):
        src.append(
            f"        c{j} = ((s[(w{a} >> 24) & 255] << 24)"
            f" | (s[(w{b} >> 16) & 255] << 16)"
            f" | (s[(w{c} >> 8) & 255] << 8)"
            f" | s[w{d} & 255]) ^ k{nr}_{j}"
        )
    src.append("        ap((c0, c1, c2, c3))")
    src.append("    return out")
    ns: dict = {}
    exec("\n".join(src), ns)  # noqa: S102 — source built from ints only
    fn = ns["_enc"]
    _CBC_ENC_FNS[nr] = fn
    return fn


_AES_TD_NP = None  # lazily-built numpy copies of the Td tables


def _aes_decrypt_blocks_np(data: bytes, dws) -> bytes:
    """Vectorized raw-block (ECB) decryption: all N blocks advance
    through the 10/12/14 rounds together as (N, 4) uint32 word
    arrays with fancy-indexed T-table lookups — CBC decryption is
    then one XOR against the shifted ciphertext, so bulk decrypt is
    ~20x the scalar per-block loop."""
    import numpy as _np

    global _AES_TD_NP
    if _AES_TD_NP is None:
        _AES_TD_NP = [
            _np.asarray(t, dtype=_np.uint32) for t in _AES_TD
        ] + [_np.frombuffer(_AES_INV_SBOX, dtype=_np.uint8)]
    td0, td1, td2, td3, isb = _AES_TD_NP
    w = _np.frombuffer(data, dtype=">u4").reshape(-1, 4).astype(_np.uint32)
    nr = len(dws) - 1
    w = w ^ _np.asarray(dws[0], dtype=_np.uint32)[None, :]
    for r in range(1, nr):
        rk = dws[r]
        w = _np.stack(
            [
                td0[(w[:, j] >> 24) & 0xFF]
                ^ td1[(w[:, (j + 3) % 4] >> 16) & 0xFF]
                ^ td2[(w[:, (j + 2) % 4] >> 8) & 0xFF]
                ^ td3[w[:, (j + 1) % 4] & 0xFF]
                ^ _np.uint32(rk[j])
                for j in range(4)
            ],
            axis=1,
        )
    rk = dws[nr]
    out = _np.stack(
        [
            (
                (isb[(w[:, j] >> 24) & 0xFF].astype(_np.uint32) << 24)
                | (isb[(w[:, (j + 3) % 4] >> 16) & 0xFF].astype(_np.uint32) << 16)
                | (isb[(w[:, (j + 2) % 4] >> 8) & 0xFF].astype(_np.uint32) << 8)
                | isb[w[:, (j + 1) % 4] & 0xFF].astype(_np.uint32)
            )
            ^ _np.uint32(rk[j])
            for j in range(4)
        ],
        axis=1,
    )
    return out.astype(">u4").tobytes()


def _aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise PdfError("AES-CBC ciphertext not block-aligned")
    dws = _aes_dk_words(key)
    # numpy pays ~2 ms fixed overhead per call; the scalar loop is
    # ~40 us/block, so vectorize only past the ~50-block crossover
    if len(data) >= 1024:
        import numpy as _np

        pt = _aes_decrypt_blocks_np(data, dws)
        prior = iv + data[:-16]  # CBC: plaintext = D(ct) ^ previous ct
        return (
            _np.frombuffer(pt, dtype=_np.uint8)
            ^ _np.frombuffer(prior, dtype=_np.uint8)
        ).tobytes()
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        out += bytes(
            a ^ b for a, b in zip(_aes_decrypt_block(ct, dws), prev)
        )
        prev = ct
    return bytes(out)


def _aes_decrypt_data(key: bytes, data: bytes) -> bytes:
    """One encrypted PDF string/stream: 16-byte IV prefix, CBC body,
    PKCS#7-style padding (7.6.3.1). Empty strings pass through (a
    zero-length string encrypts to zero bytes in the wild)."""
    if not data:
        return data
    if len(data) < 32 or len(data) % 16:
        raise PdfError(
            f"AES-encrypted data has invalid length {len(data)} "
            "(IV + at least one padded block required)"
        )
    pt = _aes_cbc_decrypt(key, data[:16], data[16:])
    pad = pt[-1]
    if not (1 <= pad <= 16) or pt[-pad:] != bytes([pad]) * pad:
        raise PdfError("AES padding invalid (wrong key or corrupt data)")
    return pt[:-pad]


def _aes_encrypt_data(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Forward twin of ``_aes_decrypt_data`` for the fixture
    encryptor: pad, prepend IV, CBC."""
    pad = 16 - (len(data) % 16)
    return iv + _aes_cbc_encrypt(key, iv, data + bytes([pad]) * pad)


@lru_cache(maxsize=512)
def _obj_aes_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 with the AES salt: md5(key + num + gen + sAlT)."""
    import hashlib

    h = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        + b"sAlT"
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


@lru_cache(maxsize=64)
def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (the R6 KDF): SHA-256 seed, then
    rounds of AES-128-CBC over (pw + K + udata) x 64 with the hash
    chosen by E[0:16] mod 3, until >= 64 rounds AND the last byte of
    E is <= round_count - 32. Cached: the fixture corpus shares
    credentials and salts, so each worker derives once."""
    import hashlib

    k = hashlib.sha256(pw + salt + udata).digest()
    e = b"\x00"
    i = 0
    while i < 64 or e[-1] > i - 32:
        k1 = (pw + k + udata) * 64
        e = _aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (
            hashlib.sha256(e) if mod == 0
            else hashlib.sha384(e) if mod == 1
            else hashlib.sha512(e)
        ).digest()
        i += 1
    return k[:32]


class _Pdf:
    """One parsed document: xref map + object cache."""

    def __init__(self, data: bytes):
        self.data = data
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._enc: tuple[bytes, str] | None = None  # (key, cipher)
        self._parse_xref_chain()
        if "Encrypt" in self.trailer:
            self._setup_decryption()

    def _setup_decryption(self) -> None:
        """Standard security handler, empty user password (the
        owner-locked class): V1/V2 RC4, V4 crypt filters (/AESV2
        AES-128-CBC or /V2 RC4-128), and V5 R6 (/AESV3 AES-256 with
        the Algorithm 2.B KDF). The /Encrypt dict itself resolves
        while ``self._enc`` is still None, so its own strings (O, U,
        UE, OE, Perms) stay raw per spec."""
        enc = self.resolve(self.trailer["Encrypt"])
        if not isinstance(enc, dict):
            raise PdfError("/Encrypt is not a dictionary")
        filt = self.resolve(enc.get("Filter"))
        if filt != "Standard":
            raise NotImplementedError(
                f"/Encrypt security handler /{filt} is outside the "
                "implemented subset (Standard only)"
            )
        v = int(self.resolve(enc.get("V", 0)))
        r = int(self.resolve(enc.get("R", 0)))
        o = self.resolve(enc.get("O"))
        u = self.resolve(enc.get("U"))
        p = int(self.resolve(enc.get("P")))
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfError("/Encrypt /O and /U must be strings")
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if isinstance(ids, list) and ids else b""
        if not isinstance(id0, bytes):
            raise PdfError("trailer /ID entry is not a string")
        if v == 5 and r == 6:
            self._setup_v5(enc, o, u)
            return
        cipher = "rc4"
        if v == 4 and r == 4:
            cipher = self._crypt_filter_method(enc)
            n = 16
        elif v in (1, 2) and r in (2, 3):
            n = 5 if v == 1 else int(self.resolve(enc.get("Length", 40))) // 8
        else:
            raise NotImplementedError(
                f"/Encrypt V={v} R={r} is outside the implemented "
                "subset — V 1/2 (RC4) R 2/3, V 4 R 4 (/AESV2 or /V2 "
                "crypt filters), and V 5 R 6 (/AESV3) decode; other "
                "combinations gate here"
            )
        if not (5 <= n <= 16):
            raise PdfError(f"/Encrypt /Length {n * 8} out of range")
        key = _std_file_key(b"", o, p, id0, r, n)
        want = _std_user_check(key, id0, r)
        got = u[:16] if r >= 3 else u[:32]
        if got != want[: len(got)]:
            raise NotImplementedError(
                "encrypted PDF with a NON-EMPTY user password: "
                "password input is outside the implemented subset "
                "(the empty-user-password /U check failed)"
            )
        self._enc = (key, cipher)

    def _crypt_filter_method(self, enc: dict) -> str:
        """V4: resolve /CF /StdCF /CFM with both /StmF and /StrF
        pointing at /StdCF (the layout real V4 writers emit).
        /AESV2 -> AES-128-CBC; /V2 -> RC4 with the V4 key length."""
        stmf = self.resolve(enc.get("StmF", "Identity"))
        strf = self.resolve(enc.get("StrF", "Identity"))
        if stmf != "StdCF" or strf != "StdCF":
            raise NotImplementedError(
                f"/Encrypt V=4 with /StmF /{stmf} /StrF /{strf} is "
                "outside the implemented subset (both must be /StdCF)"
            )
        cf = self.resolve(enc.get("CF"))
        stdcf = self.resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
        if not isinstance(stdcf, dict):
            raise PdfError("/Encrypt V=4 without a /CF /StdCF dictionary")
        cfm = self.resolve(stdcf.get("CFM"))
        if cfm == "AESV2":
            return "aesv2"
        if cfm == "V2":
            return "rc4"
        raise NotImplementedError(
            f"crypt filter method /{cfm} is outside the implemented "
            "subset (/AESV2 and /V2)"
        )

    def _setup_v5(self, enc: dict, o: bytes, u: bytes) -> None:
        """V5 R6 (ISO 32000-2): AES-256, Algorithm 2.B KDF, the
        48-byte /U = hash + validation salt + key salt, file key
        unwrapped from /UE, and the /Perms integrity block."""
        ue = self.resolve(enc.get("UE"))
        perms = self.resolve(enc.get("Perms"))
        if not isinstance(ue, bytes) or len(u) < 48 or len(ue) < 32:
            raise PdfError("/Encrypt V=5 needs 48-byte /U and 32-byte /UE")
        vsalt, ksalt = u[32:40], u[40:48]
        if _hash_2b(b"", vsalt, b"") != u[:32]:
            raise NotImplementedError(
                "encrypted PDF with a NON-EMPTY user password: "
                "password input is outside the implemented subset "
                "(the empty-user-password R6 /U check failed)"
            )
        ikey = _hash_2b(b"", ksalt, b"")
        file_key = _aes_cbc_decrypt(ikey, b"\x00" * 16, ue[:32])
        if isinstance(perms, bytes) and len(perms) >= 16:
            blk = _aes_decrypt_block(perms[:16], _aes_dk_words(file_key))
            if blk[9:12] != b"adb":
                raise PdfError(
                    "/Perms integrity check failed (bytes 9-11 != "
                    "'adb') — wrong key or corrupt /Encrypt"
                )
        self._enc = (file_key, "aesv3")

    def _obj_cipher_key(self, num: int, gen: int) -> tuple[str, bytes]:
        """(cipher, per-object key) for one indirect object."""
        fkey, cipher = self._enc
        if cipher == "rc4":
            return cipher, _obj_rc4_key(fkey, num, gen)
        if cipher == "aesv2":
            return cipher, _obj_aes_key(fkey, num, gen)
        return cipher, fkey  # aesv3: the file key, no per-object step

    def _decrypt_value(self, obj, key: bytes, cipher: str = "rc4"):
        """Recursively decrypt every string (and the raw stream
        bytes) of one indirect object with its per-object key."""
        if isinstance(obj, bytes):
            if cipher == "rc4":
                return _rc4(key, obj)
            return _aes_decrypt_data(key, obj)
        if isinstance(obj, list):
            return [self._decrypt_value(x, key, cipher) for x in obj]
        if isinstance(obj, dict):
            return {
                k: self._decrypt_value(v, key, cipher)
                for k, v in obj.items()
            }
        return obj

    def _parse_xref_chain(self) -> None:
        tail = self.data[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfError("startxref not found")
        offset = int(m.group(1))
        seen = set()
        while True:
            if offset in seen:
                raise PdfError("circular /Prev xref chain")
            seen.add(offset)
            lex = _Lexer(self.data, offset)
            if lex.peek_keyword(b"xref"):
                trailer = self._parse_xref_table(lex)
            else:
                # PDF 1.5 cross-reference STREAM ("N G obj" here)
                trailer = self._parse_xref_stream(offset)
            if not isinstance(trailer, dict):
                raise PdfError("trailer is not a dictionary")
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Prev" in trailer:
                offset = int(trailer["Prev"])
                continue
            return

    def _parse_xref_table(self, lex: _Lexer) -> dict:
        """Classic ``xref`` section + ``trailer`` dict."""
        lex.pos += 4
        while True:
            lex._skip_ws()
            if lex.peek_keyword(b"trailer"):
                lex.pos += 7
                break
            hdr = re.match(
                rb"(\d+)\s+(\d+)", self.data[lex.pos : lex.pos + 40]
            )
            if not hdr:
                raise PdfError("malformed xref subsection header")
            first, count = int(hdr.group(1)), int(hdr.group(2))
            lex.pos += hdr.end()
            lex._skip_ws()
            for i in range(count):
                ent = self.data[lex.pos : lex.pos + 20]
                em = re.match(rb"(\d{10}) (\d{5}) ([nf])", ent)
                if not em:
                    raise PdfError(f"malformed xref entry {ent!r}")
                if em.group(3) == b"n" and (first + i) not in self.xref:
                    self.xref[first + i] = int(em.group(1))
                # spec entries are exactly 20 bytes; tolerate
                # 19-byte single-EOL writers via the ws skip
                lex.pos += em.end()
                lex._skip_ws()
        return lex.parse_object()

    def _parse_xref_stream(self, offset: int) -> dict:
        """PDF 1.5 cross-reference stream (ISO 32000-1 §7.5.8): a
        /Type /XRef stream whose rows are [type, f2, f3] fields of
        /W byte widths over the /Index subsections — type 1 rows are
        classic offsets, type 2 rows locate an object INSIDE a
        /Type /ObjStm object stream. The stream dict doubles as the
        trailer."""
        obj = self._read_object_at(offset)
        if not isinstance(obj, dict) or obj.get("Type") != "XRef":
            raise PdfError(
                f"startxref points at byte {offset} but no xref table "
                "or /Type /XRef stream is there"
            )
        data = self.stream_data(obj)
        w = [int(x) for x in obj.get("W", [])]
        if len(w) != 3:
            raise PdfError(f"/XRef stream /W must have 3 widths, got {w}")
        size = int(obj.get("Size", 0))
        index = [int(x) for x in obj.get("Index", [0, size])]
        row = sum(w)
        pos = 0
        for s in range(0, len(index), 2):
            first, count = index[s], index[s + 1]
            for i in range(count):
                if pos + row > len(data):
                    raise PdfError("/XRef stream shorter than /Index")
                f = []
                for width in w:
                    f.append(
                        int.from_bytes(data[pos : pos + width], "big")
                    )
                    pos += width
                typ = f[0] if w[0] else 1  # default type 1 when w1 = 0
                num = first + i
                if num in self.xref:
                    continue  # earlier (newer) section wins
                if typ == 1:
                    self.xref[num] = f[1]
                elif typ == 2:
                    self.xref[num] = ("objstm", f[1], f[2])
                # type 0 (free) and unknown types: skip (§7.5.8.3
                # says treat unknown types as free)
        return obj

    def resolve(self, obj):
        """Follow indirect references to a direct object."""
        while isinstance(obj, tuple) and obj and obj[0] == "ref":
            obj = self.get_object(obj[1])
        return obj

    def _read_object_at(self, offset: int, expect_num: int | None = None):
        """Parse one ``N G obj ... endobj`` body (with its stream, if
        any) at a byte offset."""
        lex = _Lexer(self.data, offset)
        m = re.match(
            rb"(\d+)\s+(\d+)\s+obj", self.data[lex.pos : lex.pos + 40]
        )
        if not m or (expect_num is not None and int(m.group(1)) != expect_num):
            raise PdfError(
                f"object {expect_num}: header mismatch at xref offset"
            )
        lex.pos += m.end()
        obj = lex.parse_object()
        if isinstance(obj, dict):
            lex._skip_ws()
            if lex.peek_keyword(b"stream"):
                lex.pos += 6
                # EOL after 'stream' is CRLF or LF (§7.3.8.1)
                if self.data[lex.pos : lex.pos + 2] == b"\r\n":
                    lex.pos += 2
                elif self.data[lex.pos : lex.pos + 1] == b"\n":
                    lex.pos += 1
                length = self.resolve(obj.get("Length"))
                if not isinstance(length, int):
                    raise PdfError("stream without a direct /Length")
                raw = self.data[lex.pos : lex.pos + length]
                if len(raw) < length:
                    raise PdfError("stream truncated")
                obj = dict(obj)
                obj["__stream__"] = raw
        if self._enc is not None:
            # strings and stream bytes decrypt with the per-object
            # key; cross-reference streams are never encrypted
            # (§7.5.8.2), and objects INSIDE object streams are not
            # re-encrypted (_load_from_objstm handles those)
            if not (isinstance(obj, dict) and obj.get("Type") == "XRef"):
                cipher, key = self._obj_cipher_key(
                    int(m.group(1)), int(m.group(2))
                )
                obj = self._decrypt_value(obj, key, cipher)
        return obj

    def _load_from_objstm(self, num: int, stm_num: int, idx: int):
        """Load object ``num`` out of a /Type /ObjStm object stream
        (§7.5.7): the decoded stream opens with N (objnum, offset)
        integer pairs; object bodies follow from /First."""
        container = self.get_object(stm_num)
        if (
            not isinstance(container, dict)
            or container.get("Type") != "ObjStm"
            or "__stream__" not in container
        ):
            raise PdfError(
                f"object {num}: xref names object stream {stm_num}, "
                "which is not a /Type /ObjStm stream"
            )
        data = self.stream_data(container)
        n = int(self.resolve(container.get("N", 0)))
        first = int(self.resolve(container.get("First", 0)))
        if not 0 <= idx < n:
            raise PdfError(
                f"object {num}: index {idx} out of range for "
                f"/ObjStm {stm_num} with N={n}"
            )
        hdr = _Lexer(data)
        pairs = []
        for _ in range(n):
            pairs.append((hdr.parse_object(), hdr.parse_object()))
        objnum, rel = pairs[idx]
        if objnum != num:
            raise PdfError(
                f"/ObjStm {stm_num} entry {idx} holds object {objnum}, "
                f"xref claimed {num}"
            )
        return _Lexer(data, first + rel).parse_object()

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num not in self.xref:
            raise PdfError(f"object {num} not in xref")
        loc = self.xref[num]
        if isinstance(loc, tuple):  # ("objstm", stream_obj_num, index)
            obj = self._load_from_objstm(num, loc[1], loc[2])
        else:
            obj = self._read_object_at(loc, expect_num=num)
        self._cache[num] = obj
        return obj

    def stream_data(self, obj: dict) -> bytes:
        """Decoded stream bytes through the filter chain: raw,
        /FlateDecode (zlib, with the PNG row predictors xref-stream
        encoders use), /LZWDecode (the TIFF-convention MSB-first
        variant with EarlyChange), /ASCIIHexDecode and
        /ASCII85Decode, and /RunLengthDecode. Every other filter
        (DCTDecode, CCITT, JBIG2, JPX, Crypt) gates loudly by
        name."""
        raw = obj["__stream__"]
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return raw
        filts = (
            [self.resolve(f) for f in filt]
            if isinstance(filt, list)
            else [filt]
        )
        all_parms = self.resolve(obj.get("DecodeParms"))
        if not isinstance(all_parms, list):
            all_parms = [all_parms] * len(filts)
        for f, parms in zip(filts, all_parms):
            parms = self.resolve(parms) or {}
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise PdfError(f"FlateDecode failed: {e}") from e
            elif f == "LZWDecode":
                raw = _lzw_decode(
                    raw,
                    int(self.resolve(parms.get("EarlyChange", 1))),
                )
            elif f == "ASCIIHexDecode":
                raw = _asciihex_decode(raw)
                continue  # no predictors on the ASCII/RLE filters
            elif f == "ASCII85Decode":
                raw = _ascii85_decode(raw)
                continue
            elif f == "RunLengthDecode":
                raw = _runlength_decode(raw)
                continue
            else:
                raise NotImplementedError(
                    f"PDF stream filter /{f}: the implemented subset "
                    "is Flate/LZW/RunLength/ASCIIHex/ASCII85"
                )
            pred = int(self.resolve(parms.get("Predictor", 1)))
            if pred == 1:
                continue
            colors = int(self.resolve(parms.get("Colors", 1)))
            bpc = int(self.resolve(parms.get("BitsPerComponent", 8)))
            cols = int(self.resolve(parms.get("Columns", 1)))
            if pred == 2:
                # TIFF predictor 2 (r16, VERDICT r15 item 6):
                # horizontal differencing — real scanner output hits
                # this on Flate/LZW image and content streams
                if bpc != 8 or not (1 <= colors <= 4):
                    raise NotImplementedError(
                        f"TIFF predictor with Colors={colors} "
                        f"BitsPerComponent={bpc}: 8-bit, 1-4 "
                        "components only"
                    )
                raw = _tiff_unpredict(raw, cols, colors)
                continue
            if pred < 10:
                raise PdfError(
                    f"/DecodeParms /Predictor {pred} is not a spec "
                    "value (1, 2, or 10-15)"
                )
            if colors != 1 or bpc != 8:
                raise NotImplementedError(
                    f"PNG predictor with Colors={colors} "
                    f"BitsPerComponent={bpc}: 1x8 only (the xref-"
                    "stream shape)"
                )
            raw = _png_unpredict(raw, cols)
        return raw

    def pages(self) -> list[dict]:
        """The page objects in document order (depth-first /Kids
        walk of the page tree)."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("trailer /Root missing or not a dictionary")
        tree = self.resolve(root.get("Pages"))
        out: list[dict] = []

        def walk(node, depth=0):
            if depth > 64:
                raise PdfError("page tree too deep (cycle?)")
            node = self.resolve(node)
            if not isinstance(node, dict):
                raise PdfError("page-tree node is not a dictionary")
            t = node.get("Type")
            if t == "Pages":
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, depth + 1)
            elif t == "Page":
                out.append(node)
            else:
                raise PdfError(f"unexpected page-tree node type {t!r}")

        walk(tree)
        return out

    def page_fonts(self, page: dict) -> dict:
        """Byte->text decoders for the page's /Resources /Font dict
        (VERDICT r14 item 2). Precedence per font: a /ToUnicode CMap
        wins; else /Encoding (base name and/or /Differences over the
        bundled AGL subset); else the Latin-1 identity the extractor
        has always used. Composite /Type0 fonts decode when /Encoding
        is Identity-H/V AND a ToUnicode CMap is present (multi-byte
        codes map through it); any other composite shape gates
        loudly. A font name used in content but absent from the
        resources falls back to Latin-1 (the pre-r15 behavior the
        plain fixtures rely on)."""
        return self._fonts_from_res(self.resolve(page.get("Resources")))

    def _fonts_from_res(self, res) -> dict:
        fonts = self.resolve((res or {}).get("Font")) or {}
        out = {}
        for name, fref in fonts.items():
            fd = self.resolve(fref)
            if not isinstance(fd, dict):
                raise PdfError(f"font /{name} is not a dictionary")
            out[name] = self._font_decoder(name, fd)
        return out

    def form_xobjects(self, res, parent_fonts: dict | None = None,
                      depth: int = 0) -> dict:
        """Form XObjects reachable from one /Resources dict (VERDICT
        r15 item 3 — flattened forms, stamps and letterheads carry
        text through /Subtype /Form content streams): {name:
        (content bytes, font decoders, nested form map)}. A form's
        own /Resources wins; a form WITHOUT /Resources inherits the
        painting context's fonts (7.8.3). Image XObjects map to
        None (their ``Do`` paints no text and is skipped); any other
        subtype raises. Recursion (forms painting forms, including
        reference cycles) is bounded by ``_FORM_MAX_DEPTH`` —
        exceeding it raises the typed recursion-bomb error."""
        if depth > _FORM_MAX_DEPTH:
            raise PdfError(
                f"Form XObject nesting exceeds depth {_FORM_MAX_DEPTH} "
                "(reference cycle or recursion bomb)"
            )
        xobjs = self.resolve((res or {}).get("XObject")) or {}
        out = {}
        for nm, ref in xobjs.items():
            xo = self.resolve(ref)
            if not isinstance(xo, dict) or "__stream__" not in xo:
                raise PdfError(f"/XObject /{nm} missing or not a stream")
            sub = self.resolve(xo.get("Subtype"))
            if sub == "Image":
                out[nm] = None
                continue
            if sub != "Form":
                raise PdfError(f"/XObject /{nm} has /Subtype {sub!r}")
            fres = self.resolve(xo.get("Resources"))
            if fres is not None:
                ffonts = self._fonts_from_res(fres)
            else:
                # fonts carry over from the painting context; nested
                # XObjects painted by an INHERITED name are outside
                # the implemented subset and fail as unknown names
                ffonts = dict(parent_fonts or {})
            out[nm] = (
                self.stream_data(xo),
                ffonts,
                self.form_xobjects(fres, ffonts, depth + 1),
            )
        return out

    def _font_decoder(self, name: str, fd: dict):
        tu = self.resolve(fd.get("ToUnicode"))
        cmap = None
        if isinstance(tu, dict) and "__stream__" in tu:
            cmap = _parse_tounicode(self.stream_data(tu))
        subtype = self.resolve(fd.get("Subtype"))
        if subtype == "Type0":
            enc = self.resolve(fd.get("Encoding"))
            if enc not in ("Identity-H", "Identity-V"):
                raise NotImplementedError(
                    f"composite font /Encoding {enc!r} is outside the "
                    "implemented subset (Identity-H/V with ToUnicode)"
                )
            if cmap is None:
                raise NotImplementedError(
                    f"composite font /{name} without a /ToUnicode CMap: "
                    "raw CID extraction is outside the implemented "
                    "subset"
                )
            ranges, mp = cmap
            if all(w == 1 for w, _lo, _hi in ranges):
                # Identity-H/V codes are 2-byte; a CMap that only
                # declared 1-byte entries promotes (the pre-r16
                # max(width, 2) behavior)
                ranges = ((2, 0, 0xFFFF),)
                mp = {(2, c): v for (_w, c), v in mp.items()}
            return ("cid", ranges, mp, name)
        if cmap is not None:
            ranges, mp = cmap
            if any(w != 1 for w, _lo, _hi in ranges):
                raise NotImplementedError(
                    f"simple font /{name} with a multi-byte ToUnicode "
                    "codespace is outside the implemented subset"
                )
            return ("cid", ranges, mp, name)
        enc = self.resolve(fd.get("Encoding"))
        diffs = None
        base = None
        if isinstance(enc, dict):
            base = self.resolve(enc.get("BaseEncoding"))
            diffs = self.resolve(enc.get("Differences"))
        elif enc is not None:
            base = enc
        table = _base_encoding_map(base)
        if diffs is not None:
            code = None
            for item in diffs:
                item = self.resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, str):
                    if code is None or not (0 <= code <= 255):
                        raise PdfError("/Differences array malformed")
                    table[code] = _glyph_to_char(item)
                    code += 1
                else:
                    raise PdfError("/Differences entry must be int/name")
        return ("simple", table, None, name)

    def page_content(self, page: dict) -> bytes:
        """The page's concatenated, decoded content stream(s)."""
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, dict):
            parts = [contents]
        elif isinstance(contents, list):
            parts = [self.resolve(c) for c in contents]
        else:
            raise PdfError("/Contents is neither stream nor array")
        out = []
        for p in parts:
            if not isinstance(p, dict) or "__stream__" not in p:
                raise PdfError("/Contents entry is not a stream")
            out.append(self.stream_data(p))
        return b"\n".join(out)


# ------------------------------------------------- font byte mapping
# /Encoding + /ToUnicode support (VERDICT r14 item 2): show-string
# BYTES map to text through the page's font resources — the piece
# that turns embedded-subset-font PDFs from byte soup into text.
#
# Glyph names resolve through a bundled subset of the Adobe Glyph
# List: the full ASCII range by name, the common typographic names,
# and the ALGORITHMIC uniXXXX / uXXXX[XX] forms (AGL spec rule) —
# any other name gates loudly, naming the glyph.
_AGL: dict[str, int] = {
    "space": 0x20, "exclam": 0x21, "quotedbl": 0x22, "numbersign": 0x23,
    "dollar": 0x24, "percent": 0x25, "ampersand": 0x26,
    "quotesingle": 0x27, "parenleft": 0x28, "parenright": 0x29,
    "asterisk": 0x2A, "plus": 0x2B, "comma": 0x2C, "hyphen": 0x2D,
    "period": 0x2E, "slash": 0x2F, "colon": 0x3A, "semicolon": 0x3B,
    "less": 0x3C, "equal": 0x3D, "greater": 0x3E, "question": 0x3F,
    "at": 0x40, "bracketleft": 0x5B, "backslash": 0x5C,
    "bracketright": 0x5D, "asciicircum": 0x5E, "underscore": 0x5F,
    "grave": 0x60, "braceleft": 0x7B, "bar": 0x7C, "braceright": 0x7D,
    "asciitilde": 0x7E, "exclamdown": 0xA1, "cent": 0xA2,
    "sterling": 0xA3, "yen": 0xA5, "section": 0xA7, "copyright": 0xA9,
    "registered": 0xAE, "degree": 0xB0, "paragraph": 0xB6,
    "questiondown": 0xBF, "agrave": 0xE0, "aacute": 0xE1,
    "acircumflex": 0xE2, "atilde": 0xE3, "adieresis": 0xE4,
    "ccedilla": 0xE7, "egrave": 0xE8, "eacute": 0xE9,
    "ecircumflex": 0xEA, "edieresis": 0xEB, "igrave": 0xEC,
    "iacute": 0xED, "ntilde": 0xF1, "ograve": 0xF2, "oacute": 0xF3,
    "odieresis": 0xF6, "ugrave": 0xF9, "uacute": 0xFA,
    "udieresis": 0xFC, "endash": 0x2013, "emdash": 0x2014,
    "quoteleft": 0x2018, "quoteright": 0x2019, "quotesinglbase": 0x201A,
    "quotedblleft": 0x201C, "quotedblright": 0x201D,
    "quotedblbase": 0x201E, "dagger": 0x2020, "daggerdbl": 0x2021,
    "bullet": 0x2022, "ellipsis": 0x2026, "perthousand": 0x2030,
    "guilsinglleft": 0x2039, "guilsinglright": 0x203A, "Euro": 0x20AC,
    "trademark": 0x2122, "fi": 0xFB01, "fl": 0xFB02,
}
for _c in range(0x30, 0x3A):  # zero..nine by name
    _AGL[("zero one two three four five six seven eight "
          "nine".split())[_c - 0x30]] = _c
for _c in range(0x41, 0x5B):
    _AGL[chr(_c)] = _c
for _c in range(0x61, 0x7B):
    _AGL[chr(_c)] = _c
_UNI_NAME = re.compile(r"^uni([0-9A-F]{4})$")
_U_NAME = re.compile(r"^u([0-9A-F]{4,6})$")


def _glyph_to_char(name: str) -> str:
    m = _UNI_NAME.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _U_NAME.match(name)
    if m:
        cp = int(m.group(1), 16)
        if cp > 0x10FFFF:
            raise PdfError(f"glyph name /{name}: code point out of range")
        return chr(cp)
    if name in _AGL:
        return chr(_AGL[name])
    raise NotImplementedError(
        f"glyph name /{name} is outside the bundled AGL subset "
        "(ASCII names, common typographic names, uniXXXX/uXXXX forms)"
    )


def _base_encoding_map(name: str | None) -> dict[int, str]:
    """byte -> char for a named base encoding. None = the Latin-1
    identity this extractor has always used for unmapped content;
    WinAnsi/MacRoman are the stdlib cp1252/mac_roman tables (the PDF
    encodings are those Microsoft/Apple code pages, Annex D)."""
    if name is None:
        return {b: chr(b) for b in range(256)}
    if name == "WinAnsiEncoding":
        out = {}
        for b in range(256):
            try:
                out[b] = bytes([b]).decode("cp1252")
            except UnicodeDecodeError:
                pass  # the five cp1252 holes: undefined -> loud on use
        return out
    if name == "MacRomanEncoding":
        return {b: bytes([b]).decode("mac_roman") for b in range(256)}
    raise NotImplementedError(
        f"/Encoding /{name} is outside the implemented subset "
        "(WinAnsiEncoding, MacRomanEncoding, Differences arrays, "
        "ToUnicode CMaps)"
    )


_CMAP_KW = re.compile(rb"[A-Za-z]+")


def _parse_tounicode(
    data: bytes,
) -> tuple[tuple[tuple[int, int, int], ...], dict[tuple[int, int], str]]:
    """Parse a /ToUnicode CMap stream (bfchar + bfrange, including
    the array-destination bfrange form). Returns (codespace ranges,
    mapping): ranges are (byte width, lo, hi) tuples from
    begincodespacerange — MIXED widths decode as of r16 (VERDICT
    r15 item 6: real CJK CMaps declare e.g. a 1-byte <00><80> range
    next to a 2-byte <8140><9FFC> one; show strings then match
    greedily, shortest-width range first) — and the mapping is
    keyed (source byte width, code). A CMap with no explicit
    codespacerange synthesizes one full range per observed entry
    width."""
    lex = _Lexer(data)
    n = len(data)
    ranges: list[tuple[int, int, int]] = []
    out: dict[tuple[int, int], str] = {}

    def _utf16be(b: bytes) -> str:
        if len(b) % 2:
            raise PdfError("ToUnicode destination has odd byte length")
        return b.decode("utf-16-be")

    def _next_token():
        lex._skip_ws()
        if lex.pos >= n:
            return None
        c = data[lex.pos]
        if c == 0x3C:  # hex string
            return lex._parse_hex_string()
        if c == 0x5B:  # array of hex strings
            return lex._parse_array()
        if c == 0x2F:
            return lex._parse_name()
        if c in b"+-.0123456789":
            return lex._parse_number_or_ref()
        m = _CMAP_KW.match(data, lex.pos)
        if not m:
            raise PdfError(
                f"unparseable CMap token at byte {lex.pos}: "
                f"{data[lex.pos:lex.pos+12]!r}"
            )
        lex.pos = m.end()
        return m.group(0)

    def _key(b: bytes) -> tuple[int, int]:
        if not (1 <= len(b) <= 4):
            raise PdfError(
                f"ToUnicode source code width {len(b)} out of range"
            )
        return (len(b), int.from_bytes(b, "big"))

    while True:
        tok = _next_token()
        if tok is None:
            break
        if tok == b"begincodespacerange":
            while True:
                lo = _next_token()
                if lo == b"endcodespacerange":
                    break
                hi = _next_token()
                if not isinstance(lo, bytes) or not isinstance(hi, bytes):
                    raise PdfError("codespacerange bounds must be hex")
                if len(lo) != len(hi):
                    raise PdfError(
                        "codespacerange bounds differ in byte width"
                    )
                w, lo_i = _key(lo)
                hi_i = int.from_bytes(hi, "big")
                if hi_i < lo_i:
                    raise PdfError("codespacerange bounds out of order")
                ranges.append((w, lo_i, hi_i))
        elif tok == b"beginbfchar":
            while True:
                src = _next_token()
                if src == b"endbfchar":
                    break
                dst = _next_token()
                if not isinstance(src, bytes) or not isinstance(dst, bytes):
                    raise PdfError("bfchar entries must be hex strings")
                out[_key(src)] = _utf16be(dst)
        elif tok == b"beginbfrange":
            while True:
                lo = _next_token()
                if lo == b"endbfrange":
                    break
                hi = _next_token()
                dst = _next_token()
                if not isinstance(lo, bytes) or not isinstance(hi, bytes):
                    raise PdfError("bfrange bounds must be hex strings")
                if len(lo) != len(hi):
                    raise PdfError("bfrange bounds differ in byte width")
                w = _key(lo)[0]
                lo_i, hi_i = (
                    int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
                )
                if hi_i < lo_i or hi_i - lo_i > 0x10000:
                    raise PdfError("bfrange bounds out of order/too wide")
                if isinstance(dst, list):
                    if len(dst) != hi_i - lo_i + 1:
                        raise PdfError("bfrange array length mismatch")
                    for k, d in enumerate(dst):
                        if not isinstance(d, bytes):
                            raise PdfError("bfrange array entry not hex")
                        out[(w, lo_i + k)] = _utf16be(d)
                elif isinstance(dst, bytes):
                    # PDF 32000 9.10.3: a hex destination is UTF-16BE
                    # and the increment applies to the LAST code unit
                    # only — a multi-unit destination (e.g. a
                    # surrogate pair for non-BMP CJK/emoji) keeps its
                    # leading units fixed (ADVICE r15).
                    if not dst or len(dst) % 2:
                        raise PdfError(
                            "bfrange hex destination must be UTF-16BE "
                            f"(even, non-zero byte length; got {len(dst)})"
                        )
                    head = dst[:-2]
                    last = int.from_bytes(dst[-2:], "big")
                    for k in range(hi_i - lo_i + 1):
                        u = last + k
                        if u > 0xFFFF:
                            raise PdfError(
                                "bfrange destination increment overflows "
                                "the last UTF-16 code unit"
                            )
                        try:
                            out[(w, lo_i + k)] = _utf16be(
                                head + u.to_bytes(2, "big")
                            )
                        except UnicodeDecodeError as exc:
                            raise PdfError(
                                "bfrange destination is not valid "
                                f"UTF-16BE at +{k}: {exc}"
                            ) from exc
                else:
                    raise PdfError("bfrange destination must be hex/array")
        # every other token (dict boilerplate, usecmap names,
        # begincmap/endcmap, numbers) is structural noise
    if not ranges:
        widths = sorted({k[0] for k in out}) or [1]
        ranges = [(w, 0, (1 << (8 * w)) - 1) for w in widths]
    return tuple(sorted(set(ranges))), out


# show operators and the positioning operators that insert a space
_SHOW_OPS = {b"Tj", b"'", b'"', b"TJ"}
_POS_OPS = {b"Td", b"TD", b"T*", b"Tm"}
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _decode_show(s: bytes, font) -> str:
    """Map one show string's bytes to text through the current font
    decoder (None = the Latin-1 identity)."""
    if font is None:
        return s.decode("latin-1")
    kind, table, _mp, name = font[0], font[1], font[2], font[3]
    if kind == "cid":
        ranges, mp = font[1], font[2]
        out = []
        i = 0
        while i < len(s):
            for w, lo, hi in ranges:  # sorted: shortest width first
                if i + w <= len(s):
                    code = int.from_bytes(s[i : i + w], "big")
                    if lo <= code <= hi:
                        ch = mp.get((w, code))
                        if ch is None:
                            raise PdfError(
                                f"code {code:#06x} ({w}-byte) unmapped "
                                f"by font /{name}'s ToUnicode CMap"
                            )
                        out.append(ch)
                        i += w
                        break
            else:
                raise PdfError(
                    f"show string byte {i} of font /{name} matches no "
                    "ToUnicode codespace range"
                )
        return "".join(out)
    out = []
    for b in s:
        ch = table.get(b)
        if ch is None:
            raise PdfError(
                f"byte {b:#04x} undefined in font /{name}'s encoding"
            )
        out.append(ch)
    return "".join(out)


_FORM_MAX_DEPTH = 8


def _content_text(
    content: bytes,
    fonts: dict | None = None,
    xobjects: dict | None = None,
    depth: int = 0,
) -> str:
    """Extract the show-operator text of ONE page content stream per
    the documented layout model: strings from Tj/TJ/'/\" inside BT/ET
    blocks, one space wherever a positioning operator (or the
    line-advance of '/\") separates two shows. ``Tf`` switches the
    current font; show-string bytes map through the page's font
    decoders (page_fonts). ``Do`` of a /Subtype /Form XObject
    recurses into the form's own content stream with the form's
    resources (r16, VERDICT r15 item 3) — its text joins the page's
    with a single separating space; image Do's paint no text and
    are skipped; nesting past ``_FORM_MAX_DEPTH`` raises."""
    lex = _Lexer(content)
    n = len(content)
    out: list[str] = []
    in_text = False
    pending_sep = False
    operands: list = []
    cur_font = None
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        if c in b"([</+-.0123456789" or content[lex.pos : lex.pos + 2] == b"<<":
            operands.append(lex.parse_object())
            continue
        m = _OP_RE.match(content, lex.pos)
        if not m:
            raise PdfError(
                f"unparseable content token at byte {lex.pos}: "
                f"{content[lex.pos:lex.pos+12]!r}"
            )
        op = m.group(0)
        lex.pos = m.end()
        if op == b"BT":
            in_text = True
            pending_sep = False
        elif op == b"ET":
            in_text = False
        elif op == b"Tf":
            # operands: font resource name, size — a name missing
            # from the resources keeps the Latin-1 identity (the
            # pre-font-support fixture shape)
            fname = operands[-2] if len(operands) >= 2 else None
            cur_font = (fonts or {}).get(fname)
        elif op == b"Do" and operands and isinstance(operands[-1], str):
            nm = operands[-1]
            if xobjects is not None:
                if nm not in xobjects:
                    raise PdfError(f"Do of unknown /XObject /{nm}")
                form = xobjects[nm]
                if form is not None:  # None = image: no text
                    if depth >= _FORM_MAX_DEPTH:
                        raise PdfError(
                            "Form XObject nesting exceeds depth "
                            f"{_FORM_MAX_DEPTH} (reference cycle or "
                            "recursion bomb)"
                        )
                    sub = _content_text(
                        form[0], form[1], form[2], depth + 1
                    )
                    if sub:
                        if out:
                            out.append(" ")
                        out.append(sub)
                        pending_sep = False
        elif in_text and op in _SHOW_OPS:
            if op in (b"'", b'"'):
                pending_sep = True  # both advance to the next line
            s = operands[-1] if operands else b""
            if op == b"TJ":
                text = "".join(
                    _decode_show(e, cur_font)
                    for e in (s if isinstance(s, list) else [])
                    if isinstance(e, bytes)
                )
            else:
                text = (
                    _decode_show(s, cur_font) if isinstance(s, bytes) else ""
                )
            if text:
                if out and pending_sep:
                    out.append(" ")
                out.append(text)
                pending_sep = False
        elif in_text and op in _POS_OPS:
            pending_sep = True
        operands = []
    return "".join(out)


def pdf_text(data: bytes) -> list[str]:
    """Per-page extracted text of one PDF document — including text
    painted through /Subtype /Form XObjects (r16)."""
    pdf = _Pdf(bytes(data))
    out = []
    for p in pdf.pages():
        fonts = pdf.page_fonts(p)
        forms = pdf.form_xobjects(pdf.resolve(p.get("Resources")), fonts)
        out.append(_content_text(pdf.page_content(p), fonts, forms))
    return out


# --------------------------------------------------------- fixtures
# One spec, two emitters (the mpeg-fixture discipline): _pdf_ops
# renders the SAME constant-layout PDF as int-mode bytes AND as SQL
# hex pieces. Every doc-dependent field is CONSTANT LENGTH (doc_id
# zero-padded to 8 digits, words one char, the hex code two digits),
# so all xref byte offsets are Python-computed constants and the SQL
# side needs no offset arithmetic.
PDF_WORDS = 6


def _pdf_dynamic(doc, kind: str, i: int = 0):
    """One dynamic field as (sql_expr | literal str)."""
    sql = isinstance(doc, str)
    if kind == "id8":
        return (
            f"lpad(cast({doc} AS string), 8, '0')"
            if sql
            else f"{doc:08d}"
        )
    if kind == "word":
        return (
            f"char(97 + ({doc} * 7 + {5 * i}) % 26)"
            if sql
            else chr(97 + (doc * 7 + 5 * i) % 26)
        )
    if kind == "tailhex":  # the two ASCII hex digits of the char code
        return (
            f"hex(65 + ({doc} * 3) % 26)"
            if sql
            else format(65 + (doc * 3) % 26, "02X")
        )
    raise ValueError(kind)


def _pdf_content_pieces(doc, page: int) -> list:
    """Content-stream pieces for one page: str constants and
    ('dyn', kind, i) markers."""
    if page == 0:
        out = ["BT /F1 12 Tf 72 720 Td (Doc ", ("dyn", "id8", 0),
               " Title) Tj"]
        for i in range(PDF_WORDS):
            out += [" 0 -14 Td (", ("dyn", "word", i), ") Tj"]
        out.append(" ET")
        return out
    # page 2: TJ kerning array, an escaped paren, a hex string
    return ["BT 72 720 Td [(T)-120(ail)] TJ 0 -14 Td <",
            ("dyn", "tailhex", 0), "> Tj ET"]


def _pdf_ops(doc) -> list:
    """The whole document as pieces (str constants / dyn markers).
    Layout: catalog, page tree, 2 x (page, contents), classic xref
    table, trailer."""
    contents = [_pdf_content_pieces(doc, p) for p in range(2)]
    clens = [
        sum(len(p) if isinstance(p, str) else (8, 1, 2)[
            ("id8", "word", "tailhex").index(p[1])] for p in c)
        for c in contents
    ]
    objs: list[list] = [
        ["<< /Type /Catalog /Pages 2 0 R >>"],
        ["<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"],
        ["<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
         "/Annots [7 0 R] >>"],
        [f"<< /Length {clens[0]} >>\nstream\n", *contents[0],
         "\nendstream"],
        ["<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"],
        [f"<< /Length {clens[1]} >>\nstream\n", *contents[1],
         "\nendstream"],
        # a /Link annotation with a URI action (the crawl-frontier
        # outlink primitive, pdf_page_links); page 2 has none
        ["<< /Type /Annot /Subtype /Link /Rect [0 0 72 14] "
         "/A << /S /URI /URI (http://example.test/pdf/",
         ("dyn", "id8", 0), ") >> >>"],
    ]
    pieces: list = ["%PDF-1.4\n"]
    offsets: list[int] = []
    pos = len("%PDF-1.4\n")
    for n, body in enumerate(objs, start=1):
        offsets.append(pos)
        head = f"{n} 0 obj\n"
        pieces.append(head)
        pos += len(head)
        for p in body:
            pieces.append(p)
            pos += (
                len(p)
                if isinstance(p, str)
                else (8, 1, 2)[("id8", "word", "tailhex").index(p[1])]
            )
        pieces.append("\nendobj\n")
        pos += len("\nendobj\n")
    xref_off = pos
    xref = f"xref\n0 {len(objs) + 1}\n" + "0000000000 65535 f \n"
    for off in offsets:
        xref += f"{off:010d} 00000 n \n"
    pieces.append(
        xref
        + f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        + f"startxref\n{xref_off}\n%%EOF\n"
    )
    return pieces


def synth_pdf_bytes(doc: int) -> bytes:
    """Int-mode emitter: the document for one doc id."""
    out = []
    for p in _pdf_ops(doc):
        out.append(p if isinstance(p, str) else _pdf_dynamic(doc, p[1], p[2]))
    return "".join(out).encode("latin-1")


def _pdf_sql_pieces() -> list[str]:
    """SQL-mode emitter: hex-string expressions whose concat unhexes
    to the same bytes as synth_pdf_bytes(doc_id)."""
    exprs = []
    for p in _pdf_ops("doc_id"):
        if isinstance(p, str):
            exprs.append("'" + p.encode("latin-1").hex().upper() + "'")
        else:
            exprs.append(f"hex({_pdf_dynamic('doc_id', p[1], p[2])})")
    return exprs


# --------------------------------------------------- spark operators

from collections.abc import Iterator  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def synth_pdf_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, payload): one two-page PDF per document, built
    JVM-side from hex pieces (no Python in the synth path)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr(
            "unhex(concat(" + ", ".join(_pdf_sql_pieces()) + "))"
        ).alias("payload"),
    )


_PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("page_idx", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)


def pdf_page_text(assets: DataFrame) -> DataFrame:
    """PDF binaries → one row of extracted text per page, in ONE
    mapInPandas pass — payload bytes never shuffle; only the text
    column (what the lang-id → quality → dedup chain consumes)
    leaves the scan stage."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows: dict[str, list] = {f.name: [] for f in _PDF_TEXT_SCHEMA}
            for aid, payload in zip(
                pdf_batch["asset_id"], pdf_batch["payload"]
            ):
                for i, text in enumerate(pdf_text(bytes(payload))):
                    rows["asset_id"].append(int(aid))
                    rows["page_idx"].append(i)
                    rows["text"].append(text)
                    rows["n_chars"].append(len(text))
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        _extract, schema=_PDF_TEXT_SCHEMA
    )


def pdf_text_oracle_sql() -> str:
    """Closed form: the extractor's output is exactly
    'Doc <id8> Title w0 .. w5' (page 0) and 'Tail C' (page 1) — the
    oracle restates the word formulas with no PDF syntax on the
    DuckDB side at all (object walk, stream framing, escape grammar,
    TJ arrays, and hex strings are what the Spark side is tested
    on)."""
    return f"""
WITH w AS (
  SELECT doc_id,
    string_agg(chr(CAST(97 + (doc_id * 7 + 5 * g.i) % 26 AS INTEGER)),
               ' ' ORDER BY g.i) AS words
  FROM documents, UNNEST(generate_series(0, {PDF_WORDS - 1})) AS g(i)
  GROUP BY doc_id
), p0 AS (
  SELECT d.doc_id AS asset_id, CAST(0 AS BIGINT) AS page_idx,
    'Doc ' || lpad(CAST(d.doc_id AS VARCHAR), 8, '0') || ' Title '
      || w.words AS text
  FROM documents d JOIN w ON d.doc_id = w.doc_id
), p1 AS (
  SELECT doc_id AS asset_id, CAST(1 AS BIGINT) AS page_idx,
    'Tail ' || chr(CAST(65 + (doc_id * 3) % 26 AS INTEGER)) AS text
  FROM documents
), u AS (SELECT * FROM p0 UNION ALL SELECT * FROM p1)
SELECT asset_id, page_idx, text, CAST(length(text) AS BIGINT) AS n_chars
FROM u
"""


# ----------------------------------------------- PDF 1.5 fixture
# The MODERN layout: page dicts live inside an uncompressed
# /Type /ObjStm and the cross-reference is a /Type /XRef STREAM
# (W [1 2 1] binary rows — SQL hex pieces handle arbitrary bytes, so
# the whole document stays constant-layout/SQL-buildable with the
# same dynamic fields as the 1.4 fixture).


def _pdf15_ops(doc) -> list:
    contents = [_pdf_content_pieces(doc, p) for p in range(2)]
    clens = [
        sum(len(p) if isinstance(p, str) else (8, 1, 2)[
            ("id8", "word", "tailhex").index(p[1])] for p in c)
        for c in contents
    ]
    page_bodies = [
        f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R >>"
        for i in range(2)
    ]
    inner = page_bodies[0] + " " + page_bodies[1] + " "
    hdr = f"10 0 11 {len(page_bodies[0]) + 1} "
    stm = hdr + inner
    objs: dict[int, list] = {
        1: ["<< /Type /Catalog /Pages 2 0 R >>"],
        2: ["<< /Type /Pages /Kids [10 0 R 11 0 R] /Count 2 >>"],
        4: [f"<< /Length {clens[0]} >>\nstream\n", *contents[0],
            "\nendstream"],
        6: [f"<< /Length {clens[1]} >>\nstream\n", *contents[1],
            "\nendstream"],
        8: [f"<< /Type /ObjStm /N 2 /First {len(hdr)} "
            f"/Length {len(stm)} >>\nstream\n" + stm + "\nendstream"],
    }
    pieces: list = ["%PDF-1.5\n"]
    pos = len("%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for n in sorted(objs):
        offsets[n] = pos
        head = f"{n} 0 obj\n"
        pieces.append(head)
        pos += len(head)
        for p in objs[n]:
            pieces.append(p)
            pos += (
                len(p)
                if isinstance(p, str)
                else (8, 1, 2)[("id8", "word", "tailhex").index(p[1])]
            )
        pieces.append("\nendobj\n")
        pos += len("\nendobj\n")
    xref_off = pos
    offsets[9] = xref_off
    rows = b""
    for n in range(12):
        if n == 0:
            rows += bytes([0, 0, 0, 0])
        elif n in offsets:
            rows += bytes([1]) + offsets[n].to_bytes(2, "big") + bytes([0])
        elif n >= 10:
            rows += bytes([2, 0, 8, n - 10])
        else:  # unused numbers 3/5/7: free
            rows += bytes([0, 0, 0, 0])
    xref_obj = (
        f"9 0 obj\n<< /Type /XRef /Size 12 /W [1 2 1] /Root 1 0 R "
        f"/Length {len(rows)} >>\nstream\n"
    )
    pieces.append(xref_obj)
    pieces.append(("bin", rows))
    pieces.append(
        f"\nendstream\nendobj\nstartxref\n{xref_off}\n%%EOF\n"
    )
    return pieces


def synth_pdf15_bytes(doc: int) -> bytes:
    out = bytearray()
    for p in _pdf15_ops(doc):
        if isinstance(p, str):
            out += p.encode("latin-1")
        elif p[0] == "bin":
            out += p[1]
        else:
            out += _pdf_dynamic(doc, p[1], p[2]).encode("latin-1")
    return bytes(out)


def _pdf15_sql_pieces() -> list[str]:
    exprs = []
    for p in _pdf15_ops("doc_id"):
        if isinstance(p, str):
            exprs.append("'" + p.encode("latin-1").hex().upper() + "'")
        elif p[0] == "bin":
            exprs.append("'" + p[1].hex().upper() + "'")
        else:
            exprs.append(f"hex({_pdf_dynamic('doc_id', p[1], p[2])})")
    return exprs


def synth_pdf15_assets(docs):
    """(asset_id, payload): one PDF-1.5 document (xref stream +
    object stream) per doc, built JVM-side from hex pieces."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr(
            "unhex(concat(" + ", ".join(_pdf15_sql_pieces()) + "))"
        ).alias("payload"),
    )


# ------------------------------------------- unicode-font fixture
# One-page document exercising the FONT MAPPING chain (VERDICT r14
# item 2): /F2 is a simple font whose /Encoding applies /Differences
# [97 /bullet 98 /emdash] over /WinAnsiEncoding, /F3 is a composite
# /Type0 Identity-H font whose /ToUnicode bfrange maps 2-byte codes
# <0041>..<005A> onto U+0391.. (Greek capitals). The content switches
# fonts with Tf mid-page, so the extractor's current-font tracking,
# the Differences table, AND the CMap walk are all on the hash path.
_PDFU_TOUNICODE = (
    "/CIDInit /ProcSet findresource begin\n"
    "12 dict begin\n"
    "begincmap\n"
    "1 begincodespacerange\n"
    "<0000> <FFFF>\n"
    "endcodespacerange\n"
    "1 beginbfrange\n"
    "<0041> <005A> <0391>\n"
    "endbfrange\n"
    "endcmap\n"
    "end\nend\n"
)


def _pdfu_ops(doc) -> list:
    """The unicode-font document as pieces (str constants / dyn
    markers), the _pdf_ops discipline: constant layout, dyn widths
    id8=8 word=1 tailhex=2."""
    content: list = ["BT /F2 12 Tf 72 720 Td ("]
    for i in range(PDF_WORDS):
        if i:
            content.append(" ")
        content.append(("dyn", "word", i))
    content += [") Tj /F3 12 Tf 0 -14 Td <00", ("dyn", "tailhex", 0),
                "> Tj ET"]
    clen = sum(
        len(p) if isinstance(p, str) else (8, 1, 2)[
            ("id8", "word", "tailhex").index(p[1])] for p in content
    )
    objs: list[list] = [
        ["<< /Type /Catalog /Pages 2 0 R >>"],
        ["<< /Type /Pages /Kids [3 0 R] /Count 1 >>"],
        ["<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
         "<< /Font << /F2 5 0 R /F3 6 0 R >> >> >>"],
        [f"<< /Length {clen} >>\nstream\n", *content, "\nendstream"],
        ["<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
         "/Encoding << /BaseEncoding /WinAnsiEncoding "
         "/Differences [97 /bullet 98 /emdash] >> >>"],
        ["<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic "
         "/Encoding /Identity-H /ToUnicode 7 0 R >>"],
        [f"<< /Length {len(_PDFU_TOUNICODE)} >>\nstream\n"
         + _PDFU_TOUNICODE + "endstream"],
    ]
    pieces: list = ["%PDF-1.4\n"]
    offsets: list[int] = []
    pos = len("%PDF-1.4\n")
    for n, body in enumerate(objs, start=1):
        offsets.append(pos)
        head = f"{n} 0 obj\n"
        pieces.append(head)
        pos += len(head)
        for p in body:
            pieces.append(p)
            pos += (
                len(p)
                if isinstance(p, str)
                else (8, 1, 2)[("id8", "word", "tailhex").index(p[1])]
            )
        pieces.append("\nendobj\n")
        pos += len("\nendobj\n")
    xref_off = pos
    xref = f"xref\n0 {len(objs) + 1}\n" + "0000000000 65535 f \n"
    for off in offsets:
        xref += f"{off:010d} 00000 n \n"
    pieces.append(
        xref
        + f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        + f"startxref\n{xref_off}\n%%EOF\n"
    )
    return pieces


def synth_pdfu_bytes(doc: int) -> bytes:
    """Int-mode emitter for the unicode-font document."""
    out = []
    for p in _pdfu_ops(doc):
        out.append(p if isinstance(p, str) else _pdf_dynamic(doc, p[1], p[2]))
    return "".join(out).encode("latin-1")


def synth_pdfu_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, payload): one unicode-font PDF per document."""
    exprs = []
    for p in _pdfu_ops("doc_id"):
        if isinstance(p, str):
            exprs.append("'" + p.encode("latin-1").hex().upper() + "'")
        else:
            exprs.append(f"hex({_pdf_dynamic('doc_id', p[1], p[2])})")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr("unhex(concat(" + ", ".join(exprs) + "))").alias("payload"),
    )


def pdf_unicode_oracle_sql() -> str:
    """Closed form: page text is the word run with bytes 97/98
    remapped to bullet/emdash by /Differences, one space, then the
    Greek capital the Identity-H ToUnicode bfrange maps <0041+k>
    onto — no PDF or CMap syntax on the DuckDB side."""
    return f"""
WITH w AS (
  SELECT doc_id,
    string_agg(
      CASE WHEN (doc_id * 7 + 5 * g.i) % 26 = 0 THEN chr(8226)
           WHEN (doc_id * 7 + 5 * g.i) % 26 = 1 THEN chr(8212)
           ELSE chr(CAST(97 + (doc_id * 7 + 5 * g.i) % 26 AS INTEGER))
      END, ' ' ORDER BY g.i) AS words
  FROM documents, UNNEST(generate_series(0, {PDF_WORDS - 1})) AS g(i)
  GROUP BY doc_id
)
SELECT d.doc_id AS asset_id, CAST(0 AS BIGINT) AS page_idx,
  w.words || ' ' || chr(CAST(913 + (d.doc_id * 3) % 26 AS INTEGER))
    AS text,
  CAST(length(w.words) + 2 AS BIGINT) AS n_chars
FROM documents d JOIN w ON d.doc_id = w.doc_id
"""


# ------------------------------------ Form XObject fixture (r16)
# One page whose content paints text, then Do's a /Subtype /Form
# XObject that itself paints text AND Do's a NESTED form (which has
# no /Resources of its own — the inherit branch), then paints more
# text. Tests the recursion, resource scoping, and the separator
# model in one constant-layout document (VERDICT r15 item 3).


def _pdfform_ops(doc) -> list:
    """The form-xobject document as pieces (str constants / dyn
    markers), the _pdf_ops discipline: dyn widths id8=8 word=1."""
    widths = (8, 1, 2)
    kinds = ("id8", "word", "tailhex")

    def _clen(pieces: list) -> int:
        return sum(
            len(p) if isinstance(p, str) else widths[kinds.index(p[1])]
            for p in pieces
        )

    c_page: list = ["BT 72 720 Td (Pre ", ("dyn", "id8", 0),
                    ") Tj ET /Fx1 Do BT 72 600 Td (Post) Tj ET"]
    c_f1: list = ["BT 72 700 Td (Form ", ("dyn", "word", 0),
                  ") Tj ET /Fx2 Do"]
    c_f2: list = ["BT 0 0 Td (Inner ", ("dyn", "word", 1), ") Tj ET"]
    objs: list[list] = [
        ["<< /Type /Catalog /Pages 2 0 R >>"],
        ["<< /Type /Pages /Kids [3 0 R] /Count 1 >>"],
        ["<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
         "<< /XObject << /Fx1 5 0 R >> >> >>"],
        [f"<< /Length {_clen(c_page)} >>\nstream\n", *c_page,
         "\nendstream"],
        ["<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
         "/Resources << /XObject << /Fx2 6 0 R >> >> "
         f"/Length {_clen(c_f1)} >>\nstream\n", *c_f1, "\nendstream"],
        # the inner form has NO /Resources: fonts inherit from the
        # painting context (7.8.3) and it paints no nested XObjects
        ["<< /Type /XObject /Subtype /Form /BBox [0 0 100 100] "
         f"/Length {_clen(c_f2)} >>\nstream\n", *c_f2, "\nendstream"],
    ]
    pieces: list = ["%PDF-1.4\n"]
    offsets: list[int] = []
    pos = len("%PDF-1.4\n")
    for n, body in enumerate(objs, start=1):
        offsets.append(pos)
        head = f"{n} 0 obj\n"
        pieces.append(head)
        pos += len(head)
        for p in body:
            pieces.append(p)
            pos += (
                len(p) if isinstance(p, str)
                else widths[kinds.index(p[1])]
            )
        pieces.append("\nendobj\n")
        pos += len("\nendobj\n")
    xref_off = pos
    xref = f"xref\n0 {len(objs) + 1}\n" + "0000000000 65535 f \n"
    for off in offsets:
        xref += f"{off:010d} 00000 n \n"
    pieces.append(
        xref
        + f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        + f"startxref\n{xref_off}\n%%EOF\n"
    )
    return pieces


def synth_pdfform_bytes(doc: int) -> bytes:
    """Int-mode emitter for the form-xobject document."""
    out = []
    for p in _pdfform_ops(doc):
        out.append(p if isinstance(p, str) else _pdf_dynamic(doc, p[1], p[2]))
    return "".join(out).encode("latin-1")


def synth_pdfform_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, payload): one form-xobject PDF per document."""
    exprs = []
    for p in _pdfform_ops("doc_id"):
        if isinstance(p, str):
            exprs.append("'" + p.encode("latin-1").hex().upper() + "'")
        else:
            exprs.append(f"hex({_pdf_dynamic('doc_id', p[1], p[2])})")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr("unhex(concat(" + ", ".join(exprs) + "))").alias("payload"),
    )


def pdf_form_oracle_sql() -> str:
    """Closed form: 'Pre <id8> Form <w0> Inner <w1> Post' — the page
    text with the outer and nested forms' text spliced at their Do
    positions, one space at each form boundary; no PDF syntax on
    the DuckDB side."""
    return """
SELECT doc_id AS asset_id, CAST(0 AS BIGINT) AS page_idx,
  'Pre ' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
    || ' Form ' || chr(CAST(97 + (doc_id * 7) % 26 AS INTEGER))
    || ' Inner ' || chr(CAST(97 + (doc_id * 7 + 5) % 26 AS INTEGER))
    || ' Post' AS text,
  CAST(32 AS BIGINT) AS n_chars
FROM documents
"""


# --------------------------------------------- encrypt (fixture twin)
def _ser_obj(o) -> bytes:
    """Serialize one parsed object back to PDF syntax (names are str,
    strings are bytes — the parser's own convention). Strings emit as
    hex so encrypted bytes need no escaping."""
    if o is True:
        return b"true"
    if o is False:
        return b"false"
    if o is None:
        return b"null"
    if isinstance(o, int):
        return str(o).encode()
    if isinstance(o, float):
        s = f"{o:.6f}".rstrip("0").rstrip(".")
        return (s or "0").encode()
    if isinstance(o, str):
        return b"/" + o.encode("latin-1")
    if isinstance(o, bytes):
        return b"<" + o.hex().upper().encode() + b">"
    if isinstance(o, tuple) and o and o[0] == "ref":
        return f"{o[1]} {o[2]} R".encode()
    if isinstance(o, list):
        return b"[ " + b" ".join(_ser_obj(x) for x in o) + b" ]"
    if isinstance(o, dict):
        parts = [b"<<"]
        for k, v in o.items():
            if k == "__stream__":
                continue
            parts.append(b"/" + k.encode("latin-1") + b" " + _ser_obj(v))
        parts.append(b">>")
        return b" ".join(parts)
    raise PdfError(f"unserializable object {type(o).__name__}")


def _aes_encrypt_value(obj, key: bytes, ivgen):
    """Recursively AES-encrypt every string/stream of one object,
    updating /Length for streams (IV + padding grow the bytes —
    unlike RC4, AES ciphertext is longer than its plaintext)."""
    if isinstance(obj, bytes):
        return _aes_encrypt_data(key, next(ivgen), obj)
    if isinstance(obj, list):
        return [_aes_encrypt_value(x, key, ivgen) for x in obj]
    if isinstance(obj, dict):
        out = {
            k: _aes_encrypt_value(v, key, ivgen)
            for k, v in obj.items()
        }
        if "__stream__" in out:
            out["Length"] = len(out["__stream__"])
        return out
    return obj


def encrypt_pdf(
    data: bytes,
    owner_password: bytes = b"",
    user_password: bytes = b"",
    r: int = 3,
    key_bits: int = 128,
    file_id: bytes | None = None,
    cipher: str = "rc4",
) -> bytes:
    """Produce the encrypted twin of a plain PDF under the standard
    security handler: ``cipher`` selects RC4 (V2, R 2/3 — ``r``/
    ``key_bits`` apply), AES-128 crypt filters (``aesv2``: V4 R4
    /AESV2), or AES-256 (``aesv3``: V5 R6 with the Algorithm 2.B
    KDF, /UE key wrap and /Perms block). Every object re-serializes
    with its strings and stream bytes encrypted under the per-object
    (RC4/AESV2) or file (AESV3) key; /Encrypt + /ID join the
    trailer; a fresh classic xref table is written. The fixture/test
    encryptor — the decoder's independent counterpart (the spec
    algorithms run FORWARD here, so fixtures carry spec-true /O,
    /U, /UE, /OE and /Perms values). AES IVs are deterministic
    (md5 over /ID + object number + an in-object counter) so
    fixtures are byte-stable."""
    import hashlib

    if cipher not in ("rc4", "aesv2", "aesv3"):
        raise PdfError(f"encrypt_pdf cipher {cipher!r} unknown")
    if cipher == "rc4" and r not in (2, 3):
        raise PdfError(f"encrypt_pdf supports R 2/3, got {r}")
    pdf = _Pdf(bytes(data))
    if pdf._enc is not None or "Encrypt" in pdf.trailer:
        raise PdfError("document is already encrypted")
    p = -4  # all permission bits granted (the common owner-lock P)
    # /ID: content digest by default (the spec's recommendation); a
    # caller may pin it (the registry fixture does — a shared /ID
    # means shared file/object keys, so the cached keystreams turn
    # bulk encryption into XOR; still a perfectly valid document)
    id0 = hashlib.md5(data).digest() if file_id is None else bytes(file_id)
    if len(id0) != 16:
        raise PdfError("file_id must be 16 bytes")
    if cipher == "aesv3":
        # deterministic 32-byte file key + salts (any values are
        # spec-legal; the KDF pins U/UE/O/OE to them)
        key = hashlib.sha256(b"fixture-file-key" + id0).digest()
        vsalt, ksalt = b"uvsalt01", b"uksalt01"
        u = _hash_2b(user_password, vsalt, b"") + vsalt + ksalt
        ikey = _hash_2b(user_password, ksalt, b"")
        ue = _aes_cbc_encrypt(ikey, b"\x00" * 16, key)
        opw = owner_password or user_password
        ovs, oks = b"ovsalt01", b"oksalt01"
        o = _hash_2b(opw, ovs, u) + ovs + oks
        oe = _aes_cbc_encrypt(_hash_2b(opw, oks, u), b"\x00" * 16, key)
        perms_pt = (
            (p & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\xff\xff\xff\xff" + b"T" + b"adb" + b"\x00" * 4
        )
        perms = _aes_encrypt_block(perms_pt, _aes_rk_words(key))
        enc_dict = (
            "<< /Filter /Standard /V 5 /R 6 /Length 256 "
            "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
            "/Length 32 >> >> /StmF /StdCF /StrF /StdCF "
            f"/P {p} /O <{o.hex().upper()}> /U <{u.hex().upper()}> "
            f"/OE <{oe.hex().upper()}> /UE <{ue.hex().upper()}> "
            f"/Perms <{perms.hex().upper()}> >>"
        )
    else:
        if cipher == "aesv2":
            r, n = 4, 16
        else:
            n = 5 if r == 2 else key_bits // 8
        o = _std_owner_value(owner_password, user_password, r, n)
        key = _std_file_key(user_password, o, p, id0, r, n)
        u = _std_user_check(key, id0, r)
        if r >= 3:
            u = u + b"\x00" * 16  # 32-byte /U, last 16 arbitrary (spec)
        if cipher == "aesv2":
            enc_dict = (
                "<< /Filter /Standard /V 4 /R 4 /Length 128 "
                "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                "/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
                f"/P {p} /O <{o.hex().upper()}> /U <{u.hex().upper()}> >>"
            )
        else:
            enc_dict = (
                f"<< /Filter /Standard /V 2 /R {r} /Length {n * 8} "
                f"/P {p} /O <{o.hex().upper()}> /U <{u.hex().upper()}> >>"
            )
    nums = sorted(k for k in pdf.xref if not isinstance(pdf.xref[k], tuple))
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in nums:
        obj = pdf.get_object(num)
        if cipher == "rc4":
            okey = _obj_rc4_key(key, num, 0)
            enc_obj = pdf._decrypt_value(obj, okey)  # RC4 is symmetric
        else:
            okey = _obj_aes_key(key, num, 0) if cipher == "aesv2" else key

            def _ivgen(num=num):
                i = 0
                while True:
                    yield hashlib.md5(
                        id0 + num.to_bytes(4, "big")
                        + i.to_bytes(4, "big")
                    ).digest()
                    i += 1

            enc_obj = _aes_encrypt_value(obj, okey, _ivgen())
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode()
        body = _ser_obj(enc_obj)
        out += body
        if isinstance(enc_obj, dict) and "__stream__" in enc_obj:
            out += b"\nstream\n" + enc_obj["__stream__"] + b"\nendstream"
        out += b"\nendobj\n"
    enc_num = max(nums) + 1
    offsets[enc_num] = len(out)
    out += f"{enc_num} 0 obj\n{enc_dict}\nendobj\n".encode()
    xref_off = len(out)
    size = enc_num + 1
    out += f"xref\n0 {size}\n".encode() + b"0000000000 65535 f \n"
    for num in range(1, size):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    root = pdf.trailer["Root"]
    out += (
        f"trailer\n<< /Size {size} /Root {root[1]} {root[2]} R "
        f"/Encrypt {enc_num} 0 R /ID [<{id0.hex().upper()}> "
        f"<{id0.hex().upper()}>] >>\nstartxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_encrypt_payloads(assets: DataFrame, cipher: str = "rc4") -> DataFrame:
    """(asset_id, payload) -> the encrypted twin of each payload
    (``cipher``: rc4 / aesv2 / aesv3), executor-side (one
    mapInPandas; payload bytes never shuffle — chained straight into
    pdf_page_text the two Python stages fuse into one task with no
    exchange between them)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    # constant /ID across the fixture corpus: every document shares
    # file and per-object keys, so the cached RC4 keystreams make
    # bulk encryption an XOR after the first document — the decoder
    # path benefits identically (same cache, fed by parsed keys)
    fixture_id = bytes(range(16))

    def _encrypt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            yield pd.DataFrame(
                {
                    "asset_id": [int(a) for a in pdf_batch["asset_id"]],
                    "payload": [
                        encrypt_pdf(
                            bytes(p), file_id=fixture_id, cipher=cipher
                        )
                        for p in pdf_batch["payload"]
                    ],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _encrypt, schema=schema
    )


# -------------------------------------------------- image extraction
def _content_do_names(content: bytes) -> list[str]:
    """The XObject names painted by ``Do`` operators, in paint
    order (repeats kept — one emitted image per occurrence)."""
    lex = _Lexer(content)
    n = len(content)
    operands: list = []
    out: list[str] = []
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        if c in b"([</+-.0123456789" or content[lex.pos : lex.pos + 2] == b"<<":
            operands.append(lex.parse_object())
            continue
        m = _OP_RE.match(content, lex.pos)
        if not m:
            raise PdfError(
                f"unparseable content token at byte {lex.pos}: "
                f"{content[lex.pos:lex.pos+12]!r}"
            )
        if m.group(0) == b"Do" and operands and isinstance(operands[-1], str):
            out.append(operands[-1])
        lex.pos = m.end()
        operands = []
    return out


def pdf_images(data: bytes) -> list[tuple[int, int, int, int, int, bytes]]:
    """Extract and DECODE the images a PDF paints (VERDICT r14 item
    7 — the crawl front door stops dropping PDF images): every
    ``Do`` of an /Image XObject, in paint order, as (page_idx,
    img_ix, width, height, channels, pixels row-major bytes).

    /DCTDecode routes the embedded JPEG through the in-house T.81
    decoder (operators/jpegcodec.py), with the XObject's declared
    /Width //Height CROSS-CHECKED against the JPEG's own frame
    header — a stale declaration fails loudly. Raw and /FlateDecode
    samples decode directly (8-bit /DeviceGray or /DeviceRGB).
    /Subtype /Form XObjects RECURSE (r16, VERDICT r15 item 3):
    images painted inside a form surface in flattened paint order,
    with the form's own /Resources (falling back to the painting
    context's) and a ``_FORM_MAX_DEPTH`` recursion-bomb cap. Loud
    gates: the fax/JBIG2/JPX image filters, non-8-bit samples, and
    palette/ICC color spaces."""
    from .jpegcodec import decode_jpeg_pixels

    pdf = _Pdf(bytes(data))
    out: list[tuple[int, int, int, int, int, bytes]] = []

    def _walk(pi: int, content: bytes, res, counter: list, depth: int):
        xobjs = pdf.resolve((res or {}).get("XObject")) or {}
        for nm in _content_do_names(content):
            xo = pdf.resolve(xobjs.get(nm))
            if not isinstance(xo, dict) or "__stream__" not in xo:
                raise PdfError(f"/XObject /{nm} missing or not a stream")
            sub = pdf.resolve(xo.get("Subtype"))
            if sub == "Form":
                if depth >= _FORM_MAX_DEPTH:
                    raise PdfError(
                        "Form XObject nesting exceeds depth "
                        f"{_FORM_MAX_DEPTH} (reference cycle or "
                        "recursion bomb)"
                    )
                fres = pdf.resolve(xo.get("Resources"))
                _walk(
                    pi, pdf.stream_data(xo),
                    fres if fres is not None else res,
                    counter, depth + 1,
                )
                continue
            if sub != "Image":
                raise PdfError(f"/XObject /{nm} has /Subtype {sub!r}")
            ix = counter[0]
            counter[0] += 1
            w = int(pdf.resolve(xo.get("Width", 0)))
            h = int(pdf.resolve(xo.get("Height", 0)))
            filt = pdf.resolve(xo.get("Filter"))
            filts = (
                [pdf.resolve(f) for f in filt]
                if isinstance(filt, list)
                else ([filt] if filt is not None else [])
            )

            def _pre_chain():
                """Bytes after every filter BUT the last, plus the
                last filter's /DecodeParms (r16: /DCTDecode and
                /CCITTFaxDecode behind e.g. Flate/ASCIIHex chains)."""
                all_parms = pdf.resolve(xo.get("DecodeParms"))
                if not isinstance(all_parms, list):
                    all_parms = [all_parms] * len(filts)
                last_parms = pdf.resolve(all_parms[-1]) or {}
                if len(filts) == 1:
                    return xo["__stream__"], last_parms
                pre = dict(xo)
                pre["Filter"] = filts[:-1]
                pre["DecodeParms"] = list(all_parms[:-1])
                return pdf.stream_data(pre), last_parms

            if filts and filts[-1] == "DCTDecode":
                jraw, _p = _pre_chain()
                jw, jh, ch, px = decode_jpeg_pixels(jraw)
                if (jw, jh) != (w, h):
                    raise PdfError(
                        f"/XObject /{nm} declares {w}x{h} but its JPEG "
                        f"frame header says {jw}x{jh}"
                    )
            elif filts and filts[-1] == "CCITTFaxDecode":
                # r16: Group 4 (K = -1) scanned-document images
                from .faxcodec import FaxError, decode_g4

                raw, parms = _pre_chain()
                k = int(pdf.resolve(parms.get("K", 0)))
                if k != -1:
                    raise NotImplementedError(
                        f"/CCITTFaxDecode /K {k} (Group 3) is outside "
                        "the implemented subset — Group 4 (/K -1) "
                        "decodes"
                    )
                cols = int(pdf.resolve(parms.get("Columns", 1728)))
                rows = int(pdf.resolve(parms.get("Rows", h)))
                if (cols, rows) != (w, h):
                    raise PdfError(
                        f"/XObject /{nm} declares {w}x{h} but its "
                        f"CCITT parms say {cols}x{rows}"
                    )
                if "Decode" in xo:
                    raise NotImplementedError(
                        "a /Decode array on a CCITT image is outside "
                        "the implemented subset"
                    )
                eba = bool(pdf.resolve(
                    parms.get("EncodedByteAlign", False)
                ))
                try:
                    bilevel = decode_g4(
                        raw, cols, rows, encoded_byte_align=eba
                    )
                except FaxError as exc:
                    raise PdfError(f"/XObject /{nm}: {exc}") from exc
                # semantic colors -> DeviceGray bytes (0 black,
                # 255 white); /BlackIs1 only flips the PACKED
                # polarity, which decode_g4 abstracts away
                px = bytes(0 if b else 255 for b in bilevel)
                ch = 1
            elif filts and filts[-1] in ("JBIG2Decode", "JPXDecode"):
                raise NotImplementedError(
                    f"image filter /{filts[-1]} is outside the "
                    "implemented subset (DCTDecode routes to the "
                    "in-house T.81 decoder; CCITT G4 and Flate/raw "
                    "decode directly)"
                )
            else:
                samples = pdf.stream_data(xo)
                bpc = int(pdf.resolve(xo.get("BitsPerComponent", 8)))
                cs = pdf.resolve(xo.get("ColorSpace"))
                if pdf.resolve(xo.get("ImageMask")) is True:
                    # r16: stencil masks — 1-bit, no color space; by
                    # default (/Decode [0 1]) sample 0 PAINTS, 1 is
                    # transparent (8.9.6.2). Emitted as bilevel
                    # DeviceGray: painted = 0 (ink), clear = 255.
                    from .faxcodec import FaxError, unpack_bilevel

                    if bpc != 1:
                        raise PdfError(
                            f"/ImageMask with /BitsPerComponent {bpc}"
                            " (must be 1)"
                        )
                    dec = pdf.resolve(xo.get("Decode"))
                    if dec is not None and dec not in ([0, 1], [1, 0]):
                        raise PdfError(
                            f"/ImageMask /Decode {dec!r} must be "
                            "[0 1] or [1 0]"
                        )
                    inverted = dec == [1, 0]
                    try:
                        bits = unpack_bilevel(samples, w, h, True)
                    except FaxError as exc:
                        raise PdfError(
                            f"/XObject /{nm}: {exc}"
                        ) from exc
                    # paint bit: 0 by default, 1 under /Decode [1 0]
                    paint = 1 if inverted else 0
                    px = bytes(
                        0 if b == paint else 255 for b in bits
                    )
                    ch = 1
                elif bpc == 1:
                    # r16: bilevel sampled images (the scanned-doc
                    # shape) — rows byte-aligned per the PDF packing
                    from .faxcodec import FaxError, unpack_bilevel

                    if cs != "DeviceGray":
                        raise NotImplementedError(
                            f"1-bit /ColorSpace {cs!r}: DeviceGray "
                            "only"
                        )
                    try:
                        # sample 1 = white in DeviceGray: that IS
                        # black_is_1=False in faxcodec's 0-white
                        # convention... map explicitly: bit b ->
                        # gray 255*b
                        bits = unpack_bilevel(samples, w, h, True)
                    except FaxError as exc:
                        raise PdfError(
                            f"/XObject /{nm}: {exc}"
                        ) from exc
                    px = bytes(255 if b else 0 for b in bits)
                    ch = 1
                elif bpc != 8:
                    raise NotImplementedError(
                        f"/BitsPerComponent {bpc} images are outside "
                        "the implemented subset (1-bit and 8-bit)"
                    )
                elif (
                    isinstance(cs, list) and cs
                    and pdf.resolve(cs[0]) == "Indexed"
                ):
                    # r16: palette images — [/Indexed base hival
                    # lookup]
                    if len(cs) != 4:
                        raise PdfError("/Indexed needs 4 elements")
                    base = pdf.resolve(cs[1])
                    hival = int(pdf.resolve(cs[2]))
                    lookup = pdf.resolve(cs[3])
                    if isinstance(lookup, dict):
                        lookup = pdf.stream_data(lookup)
                    if not isinstance(lookup, bytes):
                        raise PdfError("/Indexed lookup must be bytes")
                    if base == "DeviceGray":
                        ch = 1
                    elif base == "DeviceRGB":
                        ch = 3
                    else:
                        raise NotImplementedError(
                            f"/Indexed base {base!r}: DeviceGray / "
                            "DeviceRGB only"
                        )
                    if len(lookup) < (hival + 1) * ch:
                        raise PdfError(
                            f"/Indexed lookup has {len(lookup)} bytes "
                            f"for hival {hival} x {ch}"
                        )
                    if len(samples) != w * h:
                        raise PdfError(
                            f"/XObject /{nm}: {len(samples)} index "
                            f"bytes for a {w}x{h} image"
                        )
                    px = bytearray()
                    for s in samples:
                        if s > hival:
                            raise PdfError(
                                f"palette index {s} > hival {hival}"
                            )
                        px += lookup[s * ch : (s + 1) * ch]
                    px = bytes(px)
                else:
                    if cs == "DeviceGray":
                        ch = 1
                    elif cs == "DeviceRGB":
                        ch = 3
                    else:
                        raise NotImplementedError(
                            f"/ColorSpace {cs!r} is outside the "
                            "implemented subset (DeviceGray / "
                            "DeviceRGB / Indexed)"
                        )
                    if len(samples) != w * h * ch:
                        raise PdfError(
                            f"/XObject /{nm}: {len(samples)} sample "
                            f"bytes for a {w}x{h}x{ch} image"
                        )
                    px = samples
            out.append((pi, ix, w, h, ch, bytes(px)))

    for pi, page in enumerate(pdf.pages()):
        _walk(
            pi,
            pdf.page_content(page),
            pdf.resolve(page.get("Resources")),
            [0],
            0,
        )
    return out


# -------------------------------------------------- link extraction


def pdf_links(data: bytes) -> list[tuple[int, str]]:
    """(page_idx, uri) for every /Subtype /Link annotation carrying a
    /URI action, in document order — the crawl-frontier outlink
    primitive (the PDF twin of webarchive.html_links). Non-link
    annotations and non-URI actions (GoTo, Launch, ...) are skipped;
    a /Link whose action is an unexpected shape is tolerated the way
    a crawler must be."""
    pdf = _Pdf(bytes(data))
    out: list[tuple[int, str]] = []
    for i, page in enumerate(pdf.pages()):
        annots = pdf.resolve(page.get("Annots")) or []
        if not isinstance(annots, list):
            raise PdfError("/Annots is not an array")
        for a in annots:
            a = pdf.resolve(a)
            if not isinstance(a, dict) or a.get("Subtype") != "Link":
                continue
            action = pdf.resolve(a.get("A"))
            if not isinstance(action, dict) or action.get("S") != "URI":
                continue
            uri = pdf.resolve(action.get("URI"))
            if isinstance(uri, bytes):
                out.append((i, uri.decode("latin-1")))
    return out


_PDF_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("page_idx", T.LongType(), False),
        T.StructField("link_idx", T.LongType(), False),
        T.StructField("uri", T.StringType(), False),
    ]
)


def pdf_page_links(assets: DataFrame) -> DataFrame:
    """PDF binaries → one row per /Link URI annotation, in ONE
    mapInPandas pass (payloads never shuffle)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows: dict[str, list] = {f.name: [] for f in _PDF_LINKS_SCHEMA}
            for aid, payload in zip(
                pdf_batch["asset_id"], pdf_batch["payload"]
            ):
                for j, (page, uri) in enumerate(pdf_links(bytes(payload))):
                    rows["asset_id"].append(int(aid))
                    rows["page_idx"].append(page)
                    rows["link_idx"].append(j)
                    rows["uri"].append(uri)
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        _extract, schema=_PDF_LINKS_SCHEMA
    )


def pdf_links_oracle_sql() -> str:
    """Closed form: page 0 carries exactly one link to the fixture
    URI; page 1 carries none."""
    return """
SELECT doc_id AS asset_id, CAST(0 AS BIGINT) AS page_idx,
  CAST(0 AS BIGINT) AS link_idx,
  'http://example.test/pdf/' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
    AS uri
FROM documents
"""

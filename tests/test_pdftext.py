"""PDF text extraction (operators/pdftext.py): fixture byte-equality
between the SQL hex pieces and the int-mode emitter, extractor vs
closed form, the literal-string escape grammar, FlateDecode, the page
tree walk, every loud gate, and the WARC chain wiring."""

from __future__ import annotations

import zlib

import pytest

from cryptocoininsights_data_engineer_project_spark.operators import (
    pdftext as P,
)


def build_pdf(contents_list, *, flate=False, extra_trailer="",
              filter_name="FlateDecode", decode_parms="",
              length_override=None):
    """Independent spec-true builder (NOT the module's emitter) so
    the extractor is tested against a second implementation."""
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>"]
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(contents_list)))
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(contents_list)} >>"
        .encode()
    )
    for i, c in enumerate(contents_list):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {4 + 2 * i} 0 R >>"
            .encode()
        )
        data = zlib.compress(c) if flate else c
        f = f" /Filter /{filter_name}".encode() if flate else b""
        declared = len(data) if length_override is None else length_override
        objs.append(
            b"<< /Length " + str(declared).encode() + f
            + decode_parms.encode() + b" >>\nstream\n" + data
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{extra_trailer} >>"
        f"\nstartxref\n{xref_off}\n%%EOF\n".encode()
    )
    return bytes(out)


def test_sql_fixture_bytes_equal_int_mode(spark):
    docs = spark.createDataFrame([(3,), (42,), (117,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in P.synth_pdf_assets(docs).collect()
    }
    for d in (3, 42, 117):
        assert got[d] == P.synth_pdf_bytes(d)
    # constant layout: every document has the same byte length
    assert len({len(v) for v in got.values()}) == 1


def test_fixture_text_closed_form():
    for d in (0, 9, 31337):
        pages = P.pdf_text(P.synth_pdf_bytes(d))
        words = " ".join(
            chr(97 + (d * 7 + 5 * i) % 26) for i in range(P.PDF_WORDS)
        )
        assert pages == [
            f"Doc {d:08d} Title {words}",
            f"Tail {chr(65 + (d * 3) % 26)}",
        ]


def test_flate_decode_and_second_builder():
    c1 = b"BT /F1 12 Tf 72 720 Td (Doc 42 Title) Tj 0 -14 Td (hello) Tj (!) Tj ET"
    c2 = b"BT 72 720 Td [(T)-120(ail \\()] TJ 0 -14 Td <4A4B> Tj T* (oct\\101) Tj ET"
    want = ["Doc 42 Title hello!", "Tail ( JK octA"]
    assert P.pdf_text(build_pdf([c1, c2])) == want
    assert P.pdf_text(build_pdf([c1, c2], flate=True)) == want


def test_escape_grammar():
    c = (
        b"BT (a\\nb\\tc) Tj T* (nest (inner) out) Tj T* "
        b"(cont\\\ninued) Tj T* (\\101\\10\\7) Tj T* <414> Tj ET"
    )
    pages = P.pdf_text(build_pdf([c]))
    # octal \101='A', \10='\x08', \7='\x07'; odd hex digit pads 0:
    # <414> = 0x41 0x40 = 'A@'
    assert pages == ["a\nb\tc nest (inner) out continued A\x08\x07 A@"]


def test_nested_page_tree():
    """Pages under intermediate /Pages nodes come out depth-first."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>",
        b"<< /Length 14 >>\nstream\nBT (p1) Tj ET\nendstream",
        b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        b"<< /Length 14 >>\nstream\nBT (p2) Tj ET\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_off}\n%%EOF\n".encode()
    )
    assert P.pdf_text(bytes(out)) == ["p1", "p2"]


def test_loud_gates():
    base = build_pdf([b"BT (x) Tj ET"])
    # encryption
    # the blanket encryption gate is RETIRED (r15 — RC4 V1/V2
    # decrypts; see test_encrypted_*); a dangling /Encrypt ref is
    # now a structural error, not a gate
    enc = build_pdf([b"BT (x) Tj ET"], extra_trailer=" /Encrypt 9 0 R")
    with pytest.raises(P.PdfError, match="not in xref"):
        P.pdf_text(enc)
    # startxref pointing at a non-XRef object is malformed (xref
    # STREAMS themselves decode since the 1.5 support landed)
    stream_xref = base[: base.rfind(b"startxref")] + (
        b"startxref\n9\n%%EOF\n"  # offset 9 = "1 0 obj" header
    )
    with pytest.raises(P.PdfError, match="no xref table or /Type /XRef"):
        P.pdf_text(stream_xref)
    # unimplemented filter gates by name (LZW/ASCIIHex/ASCII85
    # decode since the filter-chain extension — see
    # test_additional_filters)
    dct = build_pdf([b"BT (x) Tj ET"], flate=True, filter_name="DCTDecode")
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        P.pdf_text(dct)
    # a LYING predictor declaration over unpredicted data fails at
    # the row tags instead of silently mangling the stream
    parms = build_pdf(
        [b"BT (x) Tj ET"], flate=True,
        decode_parms=" /DecodeParms << /Predictor 12 >>",
    )
    with pytest.raises(P.PdfError, match="row tag"):
        P.pdf_text(parms)
    # not a PDF
    with pytest.raises(P.PdfError, match="%PDF-"):
        P.pdf_text(b"GIF89a not a pdf")
    # missing startxref
    with pytest.raises(P.PdfError, match="startxref"):
        P.pdf_text(b"%PDF-1.4\njunk\n%%EOF\n")
    # stream whose declared /Length overruns the file
    trunc = build_pdf([b"BT (x) Tj ET"], length_override=99999)
    with pytest.raises(P.PdfError, match="truncated"):
        P.pdf_text(trunc)


def test_warc_doc_text_extracts_html_and_pdf(spark):
    """The fused WARC extractor: one archive carrying an HTML page, a
    gzip-encoded PDF, and an image — two text rows out, the image
    skipped, Content-Encoding undone before the PDF parser."""
    import gzip

    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    html = b"<html><body><p>html doc text</p></body></html>"
    pdf = build_pdf([b"BT (pdf doc text) Tj ET"])

    def rec(url, ctype, entity, enc=None):
        hh = f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        if enc:
            hh += f"Content-Encoding: {enc}\r\n"
        http = hh.encode() + b"\r\n" + entity
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http + b"\r\n\r\n"
        )

    warc = (
        rec("http://x.test/a.html", "text/html", html)
        + rec("http://x.test/b.pdf", "application/pdf",
              gzip.compress(pdf), enc="gzip")
        + rec("http://x.test/c.png", "image/png", b"\x89PNG fake")
    )
    assets = spark.createDataFrame(
        [(1, bytearray(warc))], "asset_id long, payload binary"
    )
    rows = sorted(W.warc_doc_text(assets).collect(), key=lambda r: r.record_idx)
    assert [r.doc_format for r in rows] == ["html", "pdf"]
    assert "html doc text" in rows[0].text
    assert rows[1].text == "pdf doc text"

    from cryptocoininsights_data_engineer_project_spark.pipeline.corpus import (
        docs_from_warc,
    )

    docs = docs_from_warc(assets)
    texts = {r.text for r in docs.collect()}
    assert any("pdf doc text" in t for t in texts)
    assert any("html doc text" in t for t in texts)


def build_pdf15(contents, *, predictor=12, flate_xref=True,
                objstm_n_override=None, wrong_pair_num=False):
    """Independent PDF 1.5 builder (NOT the module's emitter): page
    dicts in an ObjStm, a /Type /XRef stream with W [1 2 1], and —
    unlike the in-query fixture — real zlib + PNG Up prediction on
    the xref stream."""
    bodies = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    kids = " ".join(f"{10 + i} 0 R" for i in range(len(contents)))
    bodies[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(contents)} >>"
        .encode()
    )
    for i, c in enumerate(contents):
        bodies[4 + i] = (
            b"<< /Length " + str(len(c)).encode() + b" >>\nstream\n"
            + c + b"\nendstream"
        )
    page_bodies = [
        f"<< /Type /Page /Parent 2 0 R /Contents {4 + i} 0 R >>".encode()
        for i in range(len(contents))
    ]
    pairs, inner, off = [], b"", 0
    for i, pb in enumerate(page_bodies):
        num = (10 + i) if not wrong_pair_num else (90 + i)
        pairs.append(f"{num} {off}".encode())
        inner += pb + b" "
        off = len(inner)
    hdr = b" ".join(pairs) + b" "
    stm = hdr + inner
    n_decl = (
        len(page_bodies) if objstm_n_override is None else objstm_n_override
    )
    bodies[8] = (
        b"<< /Type /ObjStm /N " + str(n_decl).encode()
        + b" /First " + str(len(hdr)).encode()
        + b" /Length " + str(len(stm)).encode()
        + b" >>\nstream\n" + stm + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    for n in sorted(bodies):
        offsets[n] = len(out)
        out += f"{n} 0 obj\n".encode() + bodies[n] + b"\nendobj\n"
    xref_off = len(out)
    max_obj = 10 + len(page_bodies)
    rows = b""
    for n in range(max_obj):
        if n in offsets:
            rows += bytes([1]) + offsets[n].to_bytes(2, "big") + bytes([0])
        elif n == 9:
            rows += bytes([1]) + xref_off.to_bytes(2, "big") + bytes([0])
        elif n >= 10:
            rows += bytes([2, 0, 8, n - 10])
        else:
            rows += bytes([0, 0, 0, 0])
    data, extra = rows, b""
    if predictor:
        cols, pred, prev = 4, [], bytes(4)
        for i in range(0, len(rows), 4):
            cur = rows[i : i + 4]
            pred.append(
                bytes([2]) + bytes((c - p) & 0xFF for c, p in zip(cur, prev))
            )
            prev = cur
        data = b"".join(pred)
        extra = (
            f" /DecodeParms << /Predictor {predictor} /Columns 4 >>"
            .encode()
        )
    filt = b""
    if flate_xref:
        data = zlib.compress(data)
        filt = b" /Filter /FlateDecode"
    out += (
        b"9 0 obj\n<< /Type /XRef /Size " + str(max_obj).encode()
        + b" /W [1 2 1] /Root 1 0 R" + filt + extra
        + b" /Length " + str(len(data)).encode()
        + b" >>\nstream\n" + data + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def test_pdf15_xref_stream_and_objstm():
    """The modern layout end-to-end against the independent builder:
    Flate-compressed PNG-Up-predicted xref stream, type-2 entries,
    object stream page dicts — and the raw (no filter, no predictor)
    variant."""
    c1 = b"BT (modern pdf page one) Tj ET"
    c2 = b"BT (page) Tj T* (two) Tj ET"
    want = ["modern pdf page one", "page two"]
    assert P.pdf_text(build_pdf15([c1, c2])) == want
    assert P.pdf_text(
        build_pdf15([c1, c2], predictor=0, flate_xref=False)
    ) == want


def test_pdf15_sql_fixture_bytes_equal_int_mode(spark):
    docs = spark.createDataFrame([(7,), (4242,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in P.synth_pdf15_assets(docs).collect()
    }
    for d in (7, 4242):
        assert got[d] == P.synth_pdf15_bytes(d)
        assert P.pdf_text(got[d]) == P.pdf_text(P.synth_pdf_bytes(d))


def test_pdf15_gates():
    c = [b"BT (x) Tj ET"]
    # a predictor value outside the spec set (1, 2, 10-15) is a
    # typed document error (TIFF predictor 2 DECODES as of r16 —
    # test_tiff_predictor_2_decodes; this fixture's rows are
    # PNG-shaped so predictor 2 would misparse them, as it should)
    bad = build_pdf15(c, predictor=5)
    with pytest.raises(P.PdfError, match="Predictor 5"):
        P.pdf_text(bad)
    # ObjStm whose header pair contradicts the xref claim
    lie = build_pdf15(c, wrong_pair_num=True)
    with pytest.raises(P.PdfError, match="xref claimed"):
        P.pdf_text(lie)
    # type-2 index out of the declared N range
    short = build_pdf15(c, objstm_n_override=0)
    with pytest.raises(P.PdfError, match="out of range"):
        P.pdf_text(short)
    # corrupt predictor row tag / bad row length
    with pytest.raises(P.PdfError, match="row tag 9"):
        P._png_unpredict(bytes([9, 1, 2, 3, 4]), 4)
    with pytest.raises(P.PdfError, match="not a multiple"):
        P._png_unpredict(bytes(7), 4)
    # all five legal tags round-trip against a reference forward pass
    import random

    rng = random.Random(5)
    raw = bytes(rng.randrange(256) for _ in range(40))
    cols = 8
    enc, prev = [], bytes(cols)
    for tag, i in zip((0, 1, 2, 3, 4), range(0, 40, cols)):
        cur = raw[i : i + cols]
        row = bytearray([tag])
        for j in range(cols):
            a = cur[j - 1] if j else 0
            b = prev[j]
            cc = prev[j - 1] if j else 0
            if tag == 0:
                pred = 0
            elif tag == 1:
                pred = a
            elif tag == 2:
                pred = b
            elif tag == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            row.append((cur[j] - pred) & 0xFF)
        enc.append(bytes(row))
        prev = cur
    assert P._png_unpredict(b"".join(enc), cols) == raw


def _lzw_encode(data: bytes, early_change=1) -> bytes:
    """Independent PDF-dialect LZW encoder for round-trip tests:
    MSB-first variable 9-12 bit codes, Clear first, EOD last."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bits = []

    def emit(code):
        bits.append(format(code, f"0{width}b"))

    emit(256)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(257)
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def test_additional_filters():
    """LZW round-trips against an independent encoder (incl. a body
    long enough to grow the code width); ASCIIHex and ASCII85 decode
    through real PDFs; unknown filters still gate by name."""
    body = (b"the quick brown fox jumps over the lazy dog " * 40)[:1500]
    assert P._lzw_decode(_lzw_encode(body)) == body
    content = b"BT (lzw text) Tj ET"
    lzw_pdf = build_pdf([content])
    raw = _lzw_encode(content)
    lzw_pdf = lzw_pdf.replace(
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content,
        b"<< /Length " + str(len(raw)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + raw,
    )
    # offsets shift; rebuild via the builder's filter hook instead
    import zlib as _z

    class _FakeZ:
        pass

    # simplest: hand-build a single-object variant
    def one_filter_pdf(data, filt_name, declared=None):
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length " + str(len(data)).encode()
            + f" /Filter /{filt_name} >>\nstream\n".encode() + data
            + b"\nendstream",
        ]
        out = bytearray(b"%PDF-1.4\n")
        offs = []
        for n, b_ in enumerate(objs, start=1):
            offs.append(len(out))
            out += f"{n} 0 obj\n".encode() + b_ + b"\nendobj\n"
        xo = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for o in offs:
            out += f"{o:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xo}\n%%EOF\n".encode()
        )
        return bytes(out)

    assert P.pdf_text(one_filter_pdf(raw, "LZWDecode")) == ["lzw text"]
    hexed = content.hex().upper().encode() + b">"
    assert P.pdf_text(
        one_filter_pdf(hexed, "ASCIIHexDecode")
    ) == ["lzw text"]
    import base64

    a85 = base64.a85encode(content) + b"~>"
    assert P.pdf_text(
        one_filter_pdf(a85, "ASCII85Decode")
    ) == ["lzw text"]
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        P.pdf_text(one_filter_pdf(b"\xff\xd8", "DCTDecode"))
    # malformed inputs gate typed
    with pytest.raises(P.PdfError, match="terminator"):
        P._asciihex_decode(b"4142")
    with pytest.raises(P.PdfError, match="terminator"):
        P._ascii85_decode(b"no-end-marker")
    with pytest.raises(P.PdfError, match="EOD"):
        P._lzw_decode(b"\x00\x00")


def test_pdf_links_tolerant_walk():
    """Non-link annotations and non-URI actions are skipped; multiple
    links on one page come out in order; /Annots on a 1.5-layout page
    would resolve through the object stream identically (pdf_links
    reuses the shared object machinery)."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Annots [5 0 R 6 0 R 7 0 R 8 0 R] >>",
        b"<< /Length 12 >>\nstream\nBT (x) Tj ET\nendstream",
        b"<< /Type /Annot /Subtype /Link "
        b"/A << /S /URI /URI (http://a.test/1) >> >>",
        b"<< /Type /Annot /Subtype /Text /Contents (a note) >>",
        b"<< /Type /Annot /Subtype /Link "
        b"/A << /S /GoTo /D [3 0 R] >> >>",
        b"<< /Type /Annot /Subtype /Link "
        b"/A << /S /URI /URI (http://a.test/2) >> >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for n, b_ in enumerate(objs, start=1):
        offs.append(len(out))
        out += f"{n} 0 obj\n".encode() + b_ + b"\nendobj\n"
    xo = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for o in offs:
        out += f"{o:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xo}\n%%EOF\n".encode()
    )
    assert P.pdf_links(bytes(out)) == [
        (0, "http://a.test/1"), (0, "http://a.test/2"),
    ]
    # fixture: page 0 one link, page 1 none
    assert P.pdf_links(P.synth_pdf_bytes(7)) == [
        (0, "http://example.test/pdf/00000007")
    ]


def test_runlength_filter():
    """RunLengthDecode: independent forward encoder round-trip plus
    the literal/repeat/EOD grammar and truncation gates."""

    def rle_encode(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            # repeat run?
            j = i
            while j < len(data) and data[j] == data[i] and j - i < 128:
                j += 1
            if j - i >= 3:
                out += bytes([257 - (j - i), data[i]])
                i = j
                continue
            # literal run up to the next 3-repeat
            k = i
            while k < len(data) and k - i < 128:
                if (
                    k + 2 < len(data)
                    and data[k] == data[k + 1] == data[k + 2]
                ):
                    break
                k += 1
            out += bytes([k - i - 1]) + data[i:k]
            i = k
        out.append(128)
        return bytes(out)

    body = b"aaaaabcdefggggggghhh" + bytes(range(256)) + b"zz" * 200
    assert P._runlength_decode(rle_encode(body)) == body
    with pytest.raises(P.PdfError, match="missing EOD"):
        P._runlength_decode(b"\x02abc")
    with pytest.raises(P.PdfError, match="literal run truncated"):
        P._runlength_decode(b"\x05ab")
    with pytest.raises(P.PdfError, match="repeat run truncated"):
        P._runlength_decode(b"\xfe")


# ----------------------------- round 15: /Encoding + /ToUnicode fonts


def build_font_pdf(content: bytes, font_bodies: dict, extra=()):
    """Independent builder with /Resources /Font: font objects are
    numbered from 5 in dict order; ``extra`` objects follow (callers
    compute refs as 5 + len(font_bodies) + i)."""
    fnames = list(font_bodies)
    res = " ".join(
        f"/{nm} {5 + i} 0 R" for i, nm in enumerate(fnames)
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            "<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            f"/Resources << /Font << {res} >> >> >>"
        ).encode(),
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
    ]
    objs += [font_bodies[nm] for nm in fnames]
    objs += list(extra)
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>"
        f"\nstartxref\n{xref_off}\n%%EOF\n".encode()
    )
    return bytes(out)


def _tounicode_obj(body: str) -> bytes:
    return (
        f"<< /Length {len(body)} >>\nstream\n{body}endstream"
    ).encode()


def test_unicode_sql_fixture_bytes_equal_int_mode(spark):
    docs = spark.createDataFrame([(3,), (77,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in P.synth_pdfu_assets(docs).collect()
    }
    assert got[3] == P.synth_pdfu_bytes(3)
    assert got[77] == P.synth_pdfu_bytes(77)


def test_differences_winansi_macroman_and_uni_names():
    f2 = (
        b"<< /Type /Font /Subtype /Type1 /Encoding "
        b"<< /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /uni0416 66 /u1F600] >> >>"
    )
    # WinAnsi 0x93 = LEFT DOUBLE QUOTATION MARK (cp1252)
    pdf = build_font_pdf(
        b"BT /F2 10 Tf (AB c \x93) Tj ET", {"F2": f2}
    )
    assert P.pdf_text(pdf) == ["Ж\U0001f600 c “"]
    f3 = b"<< /Type /Font /Subtype /Type1 /Encoding /MacRomanEncoding >>"
    # MacRoman 0xA5 = BULLET
    pdf = build_font_pdf(b"BT /F3 10 Tf (x\xa5) Tj ET", {"F3": f3})
    assert P.pdf_text(pdf) == ["x•"]
    # a name NOT in resources keeps the Latin-1 identity
    pdf = build_font_pdf(b"BT /F9 10 Tf (\xe9) Tj ET", {"F3": f3})
    assert P.pdf_text(pdf) == ["\xe9"]


def test_tounicode_bfchar_and_array_range():
    cmap = (
        "/CIDInit /ProcSet findresource begin\nbegincmap\n"
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        "2 beginbfchar\n<41> <0057>\n<42> <00660066>\nendbfchar\n"
        "1 beginbfrange\n<50> <51> [<0058> <0059>]\nendbfrange\n"
        "endcmap\nend\n"
    )
    f = b"<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R >>"
    pdf = build_font_pdf(
        b"BT /F1 10 Tf (AB) Tj 0 -14 Td (PQ) Tj ET",
        {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    # bfchar multi-char destination: the 'ff' ligature expansion
    assert P.pdf_text(pdf) == ["Wff XY"]


def test_bfrange_surrogate_pair_destination():
    """A 4-byte (two code unit) bfrange destination — a UTF-16
    surrogate pair for a non-BMP char — increments ONLY the last
    code unit (PDF 32000 9.10.3; ADVICE r15): <0041>..<0043> →
    U+1F600, U+1F601, U+1F602, not garbage from whole-int math."""
    cmap = (
        "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        "endcodespacerange\n1 beginbfrange\n<0041> <0043> <D83DDE00>\n"
        "endbfrange\nendcmap\n"
    )
    f = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <004100420043> Tj ET",
        {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    assert P.pdf_text(pdf) == ["\U0001f600\U0001f601\U0001f602"]


def test_bfrange_destination_errors_are_typed():
    """Destination increments that overflow the last UTF-16 code unit
    and odd-length destinations raise PdfError (not ValueError /
    UnicodeDecodeError) so executor tasks fail with the typed family
    (ADVICE r15)."""
    def _pdf(dst_hex):
        cmap = (
            "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
            "endcodespacerange\n"
            f"1 beginbfrange\n<0041> <0043> <{dst_hex}>\n"
            "endbfrange\nendcmap\n"
        )
        f = (
            b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
            b"/ToUnicode 6 0 R >>"
        )
        return build_font_pdf(
            b"BT /F1 10 Tf <0041> Tj ET",
            {"F1": f},
            extra=[_tounicode_obj(cmap)],
        )

    with pytest.raises(P.PdfError, match="overflows"):
        P.pdf_text(_pdf("FFFE"))  # FFFE + 2 > FFFF
    with pytest.raises(P.PdfError, match="even"):
        P.pdf_text(_pdf("61"))  # odd/1-byte destination
    with pytest.raises(P.PdfError, match="UTF-16BE"):
        P.pdf_text(_pdf("D83D"))  # lone high surrogate


def test_aes_fips197_vectors():
    """The derived S-box/T-table AES is pinned by the FIPS-197
    example vectors for all three key sizes (the cipher tables are
    COMPUTED from GF(2^8) algebra, so these vectors are the
    transcription witness — there is nothing transcribed to slip)."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for kh, ch in [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617"
         "18191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]:
        key = bytes.fromhex(kh)
        got = P._aes_encrypt_block(pt, P._aes_rk_words(key))
        assert got.hex() == ch
        assert P._aes_decrypt_block(got, P._aes_dk_words(key)) == pt
    # S-box spot values (FIPS-197 figure 7) + CBC round trip
    assert P._AES_SBOX[0] == 0x63 and P._AES_SBOX[0x53] == 0xED
    k, iv = bytes(range(16)), bytes(range(16, 32))
    data = bytes(range(64))
    assert P._aes_cbc_decrypt(k, iv, P._aes_cbc_encrypt(k, iv, data)) == data


@pytest.mark.parametrize("cipher", ["aesv2", "aesv3"])
def test_aes_encrypted_pdf_round_trip(cipher):
    """encrypt_pdf's AES twins (V4 /AESV2 and V5 R6 /AESV3) decode
    back to the plain text — the forward handler (Algorithm 2 /
    2.B, U/UE/O/OE/Perms, per-object sAlT keys, IV + padding with
    stream /Length rewrite) against the decoder."""
    plain = P.synth_pdf_bytes(7)
    want = P.pdf_text(plain)
    fid = bytes(range(16))
    enc = P.encrypt_pdf(plain, file_id=fid, cipher=cipher)
    assert P.pdf_text(enc) == want
    # deterministic fixture bytes
    assert enc == P.encrypt_pdf(plain, file_id=fid, cipher=cipher)
    # non-empty user password gates loudly
    locked = P.encrypt_pdf(
        plain, user_password=b"pw", file_id=fid, cipher=cipher
    )
    with pytest.raises(NotImplementedError, match="NON-EMPTY user"):
        P.pdf_text(locked)


def test_aes_error_paths_are_typed():
    # bad padding / truncated ciphertext raise PdfError, not
    # untyped slicing or decode errors
    key = bytes(16)
    with pytest.raises(P.PdfError, match="invalid length"):
        P._aes_decrypt_data(key, b"\x00" * 17)
    with pytest.raises(P.PdfError, match="invalid length"):
        P._aes_decrypt_data(key, b"\x00" * 16)  # IV with no block
    iv = bytes(16)
    ct = iv + P._aes_cbc_encrypt(key, iv, b"\xff" * 16)  # pad byte 0xff
    with pytest.raises(P.PdfError, match="padding"):
        P._aes_decrypt_data(key, ct)
    # V5 /Perms integrity: corrupting Perms fails the 'adb' check
    plain = P.synth_pdf_bytes(3)
    enc = bytearray(P.encrypt_pdf(plain, file_id=bytes(16), cipher="aesv3"))
    at = enc.find(b"/Perms <") + len(b"/Perms <")
    enc[at] = ord("0") if enc[at] != ord("0") else ord("1")
    with pytest.raises(P.PdfError, match="Perms"):
        P.pdf_text(bytes(enc))


def test_type0_identity_h_tounicode():
    cmap = (
        "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        "endcodespacerange\n1 beginbfrange\n<0041> <0043> <0061>\n"
        "endbfrange\nendcmap\n"
    )
    f = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <00410043> Tj ET",
        {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    assert P.pdf_text(pdf) == ["ac"]


def test_font_gates():
    # StandardEncoding gates by name
    f = b"<< /Type /Font /Subtype /Type1 /Encoding /StandardEncoding >>"
    pdf = build_font_pdf(b"BT /F1 10 Tf (A) Tj ET", {"F1": f})
    with pytest.raises(NotImplementedError, match="StandardEncoding"):
        P.pdf_text(pdf)
    # unknown glyph name gates naming the glyph
    f = (
        b"<< /Type /Font /Subtype /Type1 /Encoding "
        b"<< /Differences [65 /blorb] >> >>"
    )
    pdf = build_font_pdf(b"BT /F1 10 Tf (A) Tj ET", {"F1": f})
    with pytest.raises(NotImplementedError, match="blorb"):
        P.pdf_text(pdf)
    # composite without ToUnicode gates
    f = b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>"
    pdf = build_font_pdf(b"BT /F1 10 Tf <0041> Tj ET", {"F1": f})
    with pytest.raises(NotImplementedError, match="ToUnicode"):
        P.pdf_text(pdf)
    # composite with a non-Identity encoding gates
    f = b"<< /Type /Font /Subtype /Type0 /Encoding /UniJIS-UCS2-H >>"
    pdf = build_font_pdf(b"BT /F1 10 Tf <0041> Tj ET", {"F1": f})
    with pytest.raises(NotImplementedError, match="Identity"):
        P.pdf_text(pdf)
    # show bytes outside every codespace range are loud
    cmap = (
        "begincmap\n1 begincodespacerange\n<20> <7E>\n"
        "endcodespacerange\n1 beginbfchar\n<41> <0057>\nendbfchar\n"
        "endcmap\n"
    )
    f = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <0F> Tj ET", {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    with pytest.raises(P.PdfError, match="codespace"):
        P.pdf_text(pdf)


def test_mixed_width_codespace_decodes():
    """Mixed 1-/2-byte codespace ranges — the real CJK CMap shape
    (VERDICT r15 item 6, gate RETIRED): show strings match ranges
    greedily by width, so <41 8140 42> decodes as 1-byte A-range,
    2-byte CJK-range, 1-byte again."""
    cmap = (
        "begincmap\n2 begincodespacerange\n<00> <80>\n<8140> <9FFC>\n"
        "endcodespacerange\n"
        "2 beginbfchar\n<41> <0057>\n<42> <0058>\nendbfchar\n"
        "1 beginbfrange\n<8140> <8142> <4E00>\nendbfrange\n"
        "endcmap\n"
    )
    f = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <41814142> Tj ET", {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    assert P.pdf_text(pdf) == ["W丁X"]
    # an in-range but unmapped code is loud
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <43> Tj ET", {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    with pytest.raises(P.PdfError, match="unmapped"):
        P.pdf_text(pdf)
    # an undefined WinAnsi byte is a typed error naming the byte
    f = b"<< /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >>"
    pdf = build_font_pdf(b"BT /F1 10 Tf (\x81) Tj ET", {"F1": f})
    with pytest.raises(P.PdfError, match="0x81"):
        P.pdf_text(pdf)
    # an unmapped CID is a typed error
    cmap = (
        "begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        "endcodespacerange\n1 beginbfchar\n<0041> <0061>\nendbfchar\n"
        "endcmap\n"
    )
    f = (
        b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 6 0 R >>"
    )
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <0042> Tj ET", {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    with pytest.raises(P.PdfError, match="unmapped"):
        P.pdf_text(pdf)
    # odd-length show string under a 2-byte font is a typed error
    # (the trailing byte matches no codespace range)
    pdf = build_font_pdf(
        b"BT /F1 10 Tf <004100> Tj ET", {"F1": f},
        extra=[_tounicode_obj(cmap)],
    )
    with pytest.raises(P.PdfError, match="codespace"):
        P.pdf_text(pdf)


# --------------------------------- round 15: RC4 standard handler


def test_encrypted_round_trip_r2_r3():
    """The encrypted twin extracts the same text (and links) as the
    plain document, for both revisions — and the V1 40-bit shape."""
    for doc in (0, 9, 201):
        plain = P.synth_pdf_bytes(doc)
        for r in (2, 3):
            enc = P.encrypt_pdf(plain, owner_password=b"owner", r=r)
            assert b"/Encrypt" in enc
            assert P.pdf_text(enc) == P.pdf_text(plain)
            assert P.pdf_links(enc) == P.pdf_links(plain)
    # fonts + ToUnicode CMap streams survive decryption too
    up = P.synth_pdfu_bytes(4)
    assert P.pdf_text(P.encrypt_pdf(up)) == P.pdf_text(up)


def test_encrypted_u_value_is_spec_checked():
    """Corrupting /U must trip the Algorithm 4/5 verification — the
    decoder actually checks the password, it doesn't just decrypt."""
    enc = bytearray(P.encrypt_pdf(P.synth_pdf_bytes(1)))
    i = enc.rindex(b"/U <") + 4
    enc[i : i + 2] = b"00" if enc[i : i + 2] != b"00" else b"11"
    with pytest.raises(NotImplementedError, match="password"):
        P.pdf_text(bytes(enc))


def test_encrypted_gates():
    # non-empty USER password: no input channel -> loud gate
    enc = P.encrypt_pdf(P.synth_pdf_bytes(2), user_password=b"pw")
    with pytest.raises(NotImplementedError, match="user password"):
        P.pdf_text(enc)
    # V4 (AES / crypt filters) gates by name
    e = bytearray(P.encrypt_pdf(P.synth_pdf_bytes(2)))
    i = e.rindex(b"/V 2")
    e[i : i + 4] = b"/V 4"
    with pytest.raises(NotImplementedError, match="V=4"):
        P.pdf_text(bytes(e))
    # a non-Standard handler gates by name
    e = bytearray(P.encrypt_pdf(P.synth_pdf_bytes(2)))
    i = e.rindex(b"/Filter /Standard")
    e[i : i + 17] = b"/Filter /Acme9876"
    with pytest.raises(NotImplementedError, match="Acme9876"):
        P.pdf_text(bytes(e))


def test_encrypt_rejects_double_encryption():
    enc = P.encrypt_pdf(P.synth_pdf_bytes(3))
    with pytest.raises(P.PdfError, match="already encrypted"):
        P.encrypt_pdf(enc)


def test_encrypted_mutation_fuzz_typed():
    """Bit flips over an encrypted document must extract or raise a
    typed error — never an untyped crash (garbled RC4 output feeds
    every downstream parser)."""
    base = bytearray(P.encrypt_pdf(P.synth_pdf_bytes(17)))
    for i in range(0, len(base), 97):
        mut = bytearray(base)
        mut[i] ^= 0x41
        try:
            P.pdf_text(bytes(mut))
        except (P.PdfError, NotImplementedError):
            pass
        except (zlib.error,):
            pass


# --------------------------------- round 15: embedded-image extraction


def test_pdfimg_sql_fixture_bytes_equal_int_mode(spark):
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )

    docs = spark.createDataFrame([(2,), (61,)], "doc_id long")
    got = {
        r.asset_id: bytes(r.payload)
        for r in M.synth_pdfimg_assets(docs).collect()
    }
    assert got[2] == M.synth_pdfimg_bytes(2)
    assert got[61] == M.synth_pdfimg_bytes(61)


def _image_pdf(xobj_body: bytes, stream: bytes, content=b"/Im1 Do"):
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /XObject << /Im1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        xobj_body + b"\nstream\n" + stream + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>"
        f"\nstartxref\n{xref_off}\n%%EOF\n".encode()
    )
    return bytes(out)


def test_pdf_images_raw_and_flate():
    samples = bytes(range(24))  # 4x2 RGB
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 2 /ColorSpace /DeviceRGB "
        b"/BitsPerComponent 8 /Length 24 >>",
        samples,
    )
    assert P.pdf_images(pdf) == [(0, 0, 4, 2, 3, samples)]
    z = zlib.compress(samples)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 3 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 8 /Filter /FlateDecode /Length "
        + str(len(z)).encode() + b" >>",
        z,
    )
    assert P.pdf_images(pdf) == [(0, 0, 8, 3, 1, samples)]
    # paint order with repeats: two Do occurrences -> two rows
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 2 /ColorSpace /DeviceRGB "
        b"/BitsPerComponent 8 /Length 24 >>",
        samples,
        content=b"q /Im1 Do Q /Im1 Do",
    )
    assert [r[:2] for r in P.pdf_images(pdf)] == [(0, 0), (0, 1)]


def _form_pdf(objs_tail: list[bytes], content: bytes = b"/Fx1 Do"):
    """Assemble a 1-page PDF whose page /Resources /XObject maps
    /Fx1 (and whatever ``objs_tail`` adds as objects 5, 6, ...)."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources "
        b"<< /XObject << /Fx1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        *objs_tail,
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>"
        f"\nstartxref\n{xref_off}\n%%EOF\n".encode()
    )
    return bytes(out)


def test_form_xobject_text_and_fixture():
    """Text inside Do-painted /Subtype /Form streams extracts with
    the form's own resources, nested forms recurse, and the no-
    /Resources inherit branch works (VERDICT r15 item 3) — the
    registry fixture covers all three in one page."""
    b = P.synth_pdfform_bytes(7)
    assert P.pdf_text(b) == ["Pre 00000007 Form x Inner c Post"]
    # byte-equality across int and SQL emitters is pinned by the
    # oracle-parity sweep; here pin the closed form for doc 0 too
    assert P.pdf_text(P.synth_pdfform_bytes(0)) == [
        "Pre 00000000 Form a Inner f Post"
    ]


def test_form_xobject_recursion_bomb_gates():
    """A self-referencing form (its /Resources names itself) must
    raise the typed depth error, not recurse forever."""
    fc = b"/Fx1 Do"
    form = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 9 9] /Resources "
        b"<< /XObject << /Fx1 5 0 R >> >> /Length "
        + str(len(fc)).encode() + b" >>\nstream\n" + fc + b"\nendstream"
    )
    with pytest.raises(P.PdfError, match="depth"):
        P.pdf_text(_form_pdf([form]))
    with pytest.raises(P.PdfError, match="depth"):
        P.pdf_images(_form_pdf([form]))


def test_form_xobject_unknown_do_name_is_loud():
    fc = b"/Nope Do"
    form = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 9 9] /Resources "
        b"<< /XObject << >> >> /Length "
        + str(len(fc)).encode() + b" >>\nstream\n" + fc + b"\nendstream"
    )
    with pytest.raises(P.PdfError, match="unknown /XObject"):
        P.pdf_text(_form_pdf([form]))


def test_pdf_images_inside_form():
    """pdf_images recurses Form XObjects: an image painted from
    inside a form surfaces in flattened paint order with the form's
    resources (the r15 Form gate is retired)."""
    samples = bytes(range(24))  # 4x2 RGB
    fc = b"/Im1 Do"
    form = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 9 9] /Resources "
        b"<< /XObject << /Im1 6 0 R >> >> /Length "
        + str(len(fc)).encode() + b" >>\nstream\n" + fc + b"\nendstream"
    )
    img = (
        b"<< /Subtype /Image /Width 4 /Height 2 /ColorSpace /DeviceRGB "
        b"/BitsPerComponent 8 /Length 24 >>\nstream\n" + samples
        + b"\nendstream"
    )
    assert P.pdf_images(_form_pdf([form, img])) == [
        (0, 0, 4, 2, 3, samples)
    ]
    # a form with no /Resources falls back to the painting context's
    form_bare = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 9 9] /Length "
        + str(len(fc)).encode() + b" >>\nstream\n" + fc + b"\nendstream"
    )
    pdf = _form_pdf([form_bare, img])
    # page resources don't name /Im1 -> loud
    with pytest.raises(P.PdfError, match="missing"):
        P.pdf_images(pdf)


def test_pdf_images_ccitt_g4():
    """A /CCITTFaxDecode /K -1 image decodes through the in-house
    T.6 codec (r16 — the scanned-document shape): semantic bilevel
    pixels come back as DeviceGray 0/255 bytes, regardless of the
    packed /BlackIs1 polarity (which the codec abstracts away)."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        faxcodec as FX,
    )

    px = bytes([0, 0, 1, 1, 1, 0, 0, 0] * 3)  # 8x3
    enc = FX.encode_g4(px, 8, 3)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 3 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 1 /Filter /CCITTFaxDecode"
        b" /DecodeParms << /K -1 /Columns 8 /Rows 3 >> /Length "
        + str(len(enc)).encode() + b" >>",
        enc,
    )
    want = bytes(0 if b else 255 for b in px)
    assert P.pdf_images(pdf) == [(0, 0, 8, 3, 1, want)]
    # Group 3 gates by name; geometry contradiction is loud
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 3 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 1 /Filter /CCITTFaxDecode"
        b" /DecodeParms << /K 0 /Columns 8 >> /Length "
        + str(len(enc)).encode() + b" >>",
        enc,
    )
    with pytest.raises(NotImplementedError, match="Group 3"):
        P.pdf_images(pdf)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 9 /Height 3 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 1 /Filter /CCITTFaxDecode"
        b" /DecodeParms << /K -1 /Columns 8 /Rows 3 >> /Length "
        + str(len(enc)).encode() + b" >>",
        enc,
    )
    with pytest.raises(P.PdfError, match="CCITT parms"):
        P.pdf_images(pdf)


def test_pdf_images_ccitt_behind_flate():
    """CCITT (and DCT) streams behind an additional filter decode
    through the pre-chain (r16): Flate-compressed G4 bytes."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        faxcodec as FX,
    )

    px = bytes([1, 0] * 4 + [0, 1] * 4)  # 8x2 checker rows
    enc = FX.encode_g4(px, 8, 2)
    z = zlib.compress(enc)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 2 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 1 /Filter [/FlateDecode /CCITTFaxDecode]"
        b" /DecodeParms [null << /K -1 /Columns 8 /Rows 2 >>] /Length "
        + str(len(z)).encode() + b" >>",
        z,
    )
    want = bytes(0 if b else 255 for b in px)
    assert P.pdf_images(pdf) == [(0, 0, 8, 2, 1, want)]
    # DCT behind ASCIIHex
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )

    jpg = M._pdfimg_jpeg_bytes(5)
    hexed = jpg.hex().upper().encode() + b">"
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 16 /Height 8 "
        b"/Filter [/ASCIIHexDecode /DCTDecode] /Length "
        + str(len(hexed)).encode() + b" >>",
        hexed,
    )
    rows = P.pdf_images(pdf)
    assert len(rows) == 1 and rows[0][2:5] == (16, 8, 1)


def test_pdf_images_bilevel_and_indexed():
    """1-bit sampled DeviceGray images (byte-aligned rows) and
    /Indexed palette images decode (r16)."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        faxcodec as FX,
    )

    bits = bytes([1, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 1, 1, 1])
    packed = FX.pack_bilevel(bits, 8, 2, True)  # 1 = sample bit 1
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 2 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 1 /Length " + str(len(packed)).encode()
        + b" >>",
        packed,
    )
    want = bytes(255 if b else 0 for b in bits)  # sample 1 = white
    assert P.pdf_images(pdf) == [(0, 0, 8, 2, 1, want)]
    # Indexed over DeviceRGB: palette gather
    lookup = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R G B
    samples = bytes([0, 1, 2, 2, 1, 0])
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 3 /Height 2 /ColorSpace "
        b"[/Indexed /DeviceRGB 2 <FF000000FF000000FF>] "
        b"/BitsPerComponent 8 /Length 6 >>",
        samples,
    )
    want = b"".join(lookup[s * 3 : s * 3 + 3] for s in samples)
    assert P.pdf_images(pdf) == [(0, 0, 3, 2, 3, want)]
    # out-of-range palette index is loud
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 3 /Height 2 /ColorSpace "
        b"[/Indexed /DeviceRGB 1 <FF000000FF00>] "
        b"/BitsPerComponent 8 /Length 6 >>",
        samples,
    )
    with pytest.raises(P.PdfError, match="palette index"):
        P.pdf_images(pdf)


def test_tiff_predictor_2_decodes():
    """TIFF predictor 2 (horizontal differencing) on a Flate image
    stream — the scanner-output shape (VERDICT r15 item 6, gate
    RETIRED): forward-difference the samples per row, compress,
    and the decoder reconstructs the original bytes; Colors=3
    interleaved components difference per-component."""
    for colors, w, h in [(1, 6, 3), (3, 4, 2)]:
        samples = bytes(
            (7 * i + 3) % 256 for i in range(w * h * colors)
        )
        row = w * colors
        diffed = bytearray(samples)
        for r in range(0, len(diffed), row):
            for i in range(row - 1, colors - 1, -1):
                diffed[r + i] = (
                    samples[r + i] - samples[r + i - colors]
                ) & 0xFF
        z = zlib.compress(bytes(diffed))
        cs = b"/DeviceGray" if colors == 1 else b"/DeviceRGB"
        pdf = _image_pdf(
            b"<< /Subtype /Image /Width " + str(w).encode()
            + b" /Height " + str(h).encode()
            + b" /ColorSpace " + cs
            + b" /BitsPerComponent 8 /Filter /FlateDecode"
            + b" /DecodeParms << /Predictor 2 /Colors "
            + str(colors).encode() + b" /Columns " + str(w).encode()
            + b" >> /Length " + str(len(z)).encode() + b" >>",
            z,
        )
        assert P.pdf_images(pdf) == [(0, 0, w, h, colors, samples)]
    # a non-spec predictor value is a typed document error
    z = zlib.compress(bytes(6))
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 6 /Height 1 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 8 /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 5 /Columns 6 >> /Length "
        + str(len(z)).encode() + b" >>",
        z,
    )
    with pytest.raises(P.PdfError, match="Predictor 5"):
        P.pdf_images(pdf)


def test_pdf_images_gates():
    samples = bytes(16)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 4 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 4 /Length 16 >>",
        samples,
    )
    with pytest.raises(NotImplementedError, match="BitsPerComponent 4"):
        P.pdf_images(pdf)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 4 /ColorSpace /CalRGB"
        b" /BitsPerComponent 8 /Length 16 >>",
        samples,
    )
    with pytest.raises(NotImplementedError, match="ColorSpace"):
        P.pdf_images(pdf)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 4 /ImageMask true"
        b" /BitsPerComponent 1 /Decode [0 0.5 1] /Length 16 >>",
        samples,
    )
    with pytest.raises(P.PdfError, match="Decode"):
        P.pdf_images(pdf)


def test_image_mask_stencil_decodes():
    """/ImageMask stencils decode as bilevel (r16): sample 0 paints
    by default; /Decode [1 0] inverts the paint bit."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        faxcodec as FX,
    )

    bits = bytes([0, 1, 0, 1, 1, 0, 1, 0] * 2)  # 8x2
    packed = FX.pack_bilevel(bits, 8, 2, True)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 2 /ImageMask true"
        b" /BitsPerComponent 1 /Length " + str(len(packed)).encode()
        + b" >>",
        packed,
    )
    want = bytes(0 if b == 0 else 255 for b in bits)  # 0 paints
    assert P.pdf_images(pdf) == [(0, 0, 8, 2, 1, want)]
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 8 /Height 2 /ImageMask true"
        b" /BitsPerComponent 1 /Decode [1 0] /Length "
        + str(len(packed)).encode() + b" >>",
        packed,
    )
    want = bytes(0 if b == 1 else 255 for b in bits)  # inverted
    assert P.pdf_images(pdf) == [(0, 0, 8, 2, 1, want)]


def test_pdf_images_gates_filters():
    samples = bytes(16)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 4 /Height 4 "
        b"/Filter /JPXDecode /Length 16 >>",
        samples,
    )
    with pytest.raises(NotImplementedError, match="JPXDecode"):
        P.pdf_images(pdf)
    # declared size vs JPEG frame header mismatch is LOUD
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )

    jpg = M._pdfimg_jpeg_bytes(5)
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 99 /Height 8 /Filter /DCTDecode"
        b" /Length " + str(len(jpg)).encode() + b" >>",
        jpg,
    )
    with pytest.raises(P.PdfError, match="frame header"):
        P.pdf_images(pdf)
    # sample-count mismatch is LOUD
    pdf = _image_pdf(
        b"<< /Subtype /Image /Width 5 /Height 4 /ColorSpace /DeviceGray"
        b" /BitsPerComponent 8 /Length 16 >>",
        samples,
    )
    with pytest.raises(P.PdfError, match="sample bytes"):
        P.pdf_images(pdf)


def test_pdf_images_through_encryption():
    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )

    b = M.synth_pdfimg_bytes(9)
    assert P.pdf_images(P.encrypt_pdf(b, owner_password=b"o")) == \
        P.pdf_images(b)


def test_warc_pdf_images_composition(spark):
    """The crawl front door surfaces PDF-embedded images: a WARC
    carrying a gzip-encoded PDF-with-JPEG response (plus an HTML and
    an unrelated image record, both skipped) yields the SAME pixel
    stats as decoding the PDF directly."""
    import gzip

    from cryptocoininsights_data_engineer_project_spark.operators import (
        multimodal as M,
    )
    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    doc_pdf = M.synth_pdfimg_bytes(13)

    def rec(url, ctype, entity, enc=None):
        hh = f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        if enc:
            hh += f"Content-Encoding: {enc}\r\n"
        http = hh.encode() + b"\r\n" + entity
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http + b"\r\n\r\n"
        )

    warc = (
        rec("http://x.test/a.html", "text/html", b"<p>skip</p>")
        + rec("http://x.test/b.pdf", "application/pdf",
              gzip.compress(doc_pdf), enc="gzip")
        + rec("http://x.test/c.png", "image/png", b"\x89PNG fake")
    )
    assets = spark.createDataFrame(
        [(13, bytearray(warc))], "asset_id long, payload binary"
    )
    rows = W.warc_pdf_images(assets).collect()
    assert len(rows) == 1
    r = rows[0]
    (pi, ix, w, h, ch, px), = P.pdf_images(doc_pdf)
    want_sum = sum(px)
    want_chk = sum(v * (k + 1) * (k + 1) for k, v in enumerate(px))
    assert (r.record_idx, r.url) == (1, "http://x.test/b.pdf")
    assert (r.page_idx, r.img_ix, r.width, r.height, r.channels) == (
        pi, ix, w, h, ch)
    assert (r.pixel_sum, r.px_checksum) == (want_sum, want_chk)


def test_warc_doc_text_extracts_encrypted_pdf(spark):
    """An RC4-encrypted PDF response in a WARC extracts the same text
    as its plain twin through the crawl front door — no wiring
    needed, the decoder handles /Encrypt transparently; this pins
    the composition."""
    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    plain = P.synth_pdf_bytes(21)
    enc = P.encrypt_pdf(plain, owner_password=b"crawl")

    def rec(url, entity):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
            + entity
        )
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http + b"\r\n\r\n"
        )

    assets = spark.createDataFrame(
        [(1, bytearray(rec("http://x.test/a.pdf", plain)
                       + rec("http://x.test/b.pdf", enc)))],
        "asset_id long, payload binary",
    )
    rows = sorted(
        W.warc_doc_text(assets).collect(), key=lambda r: r.record_idx
    )
    assert len(rows) == 2
    assert rows[0].text == rows[1].text and rows[0].text
    assert {r.doc_format for r in rows} == {"pdf"}


def test_cbc_encrypt_unrolled_matches_blockwise_all_key_sizes():
    """The exec-specialized unrolled CBC encrypt (one compiled body
    per round count, r17) must be bit-identical to manual per-block
    _aes_encrypt_block chaining for 128/192/256-bit keys — pins the
    generated source against the reference cipher the FIPS vectors
    certify."""
    iv = bytes(range(16, 32))
    data = bytes(range(256)) * 2  # 32 blocks
    for klen in (16, 24, 32):
        key = bytes(range(klen))
        rws = P._aes_rk_words(key)
        chain, out = iv, b""
        for i in range(0, len(data), 16):
            blk = bytes(a ^ b for a, b in zip(data[i : i + 16], chain))
            chain = P._aes_encrypt_block(blk, rws)
            out += chain
        assert P._aes_cbc_encrypt(key, iv, data) == out

"""Unit tests for operators/webarchive.py — gzip member splitting,
WARC record parsing, HTTP envelope peeling, and the Spark operators.

Fixtures here are built independently of the module's own synth
helpers wherever the claim under test is spec conformance: real
zlib-DEFLATE members come from ``gzip.compress`` / ``zlib.compressobj``
(the reference implementation), header-flag walks are hand-assembled
per RFC 1952 §2.3, and WARC records are hand-assembled per ISO 28500.
"""

from __future__ import annotations

import gzip
import re
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
    GzipError,
    WarcError,
    gunzip_members,
    gunzip_stats,
    html_to_text,
    parse_warc,
    split_http_response,
    synth_gzip_assets,
    synth_warc_assets,
    synth_warc_html_assets,
    warc_html_text,
    warc_response_stats,
)


# ------------------------------------------------------------ gzip builders


def make_member(
    body: bytes,
    *,
    fextra: bytes | None = None,
    fname: bytes | None = None,
    fcomment: bytes | None = None,
    fhcrc: bool = False,
    level: int = 6,
    isize_override: int | None = None,
) -> bytes:
    """Hand-assemble one RFC 1952 member with REAL zlib DEFLATE data
    and any combination of the optional header fields."""
    flg = (
        (0x04 if fextra is not None else 0)
        | (0x08 if fname is not None else 0)
        | (0x10 if fcomment is not None else 0)
        | (0x02 if fhcrc else 0)
    )
    hdr = b"\x1f\x8b\x08" + bytes([flg]) + b"\x00\x00\x00\x00\x00\x03"
    if fextra is not None:
        hdr += struct.pack("<H", len(fextra)) + fextra
    if fname is not None:
        hdr += fname + b"\x00"
    if fcomment is not None:
        hdr += fcomment + b"\x00"
    if fhcrc:
        hdr += struct.pack("<H", zlib.crc32(hdr) & 0xFFFF)
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    deflated = co.compress(body) + co.flush()
    isize = len(body) & 0xFFFFFFFF if isize_override is None else isize_override
    trailer = struct.pack("<II", zlib.crc32(body) & 0xFFFFFFFF, isize)
    return hdr + deflated + trailer


# ------------------------------------------------------- gunzip_members OK


def test_real_deflate_single_member_matches_stdlib():
    body = b"the quick brown fox " * 200  # compressible: real Huffman blocks
    blob = gzip.compress(body, compresslevel=9)  # stdlib is the reference
    assert gunzip_members(blob) == [body]


def test_real_deflate_incompressible_body():
    # pseudo-random bytes force stored/least-compressed DEFLATE paths
    body = bytes((i * 197 + 13) % 256 for i in range(5000))
    assert gunzip_members(make_member(body)) == [body]


def test_concatenated_members_order_preserved():
    bodies = [f"member-{i}".encode() * (i + 1) for i in range(5)]
    blob = b"".join(make_member(x) for x in bodies)
    assert gunzip_members(blob) == bodies


def test_mixed_stdlib_and_handmade_members():
    blob = gzip.compress(b"alpha") + make_member(b"beta", fname=b"b.txt")
    assert gunzip_members(blob) == [b"alpha", b"beta"]


def test_empty_stream_yields_no_members():
    assert gunzip_members(b"") == []


def test_empty_body_member():
    assert gunzip_members(make_member(b"")) == [b""]


@pytest.mark.parametrize(
    "kw",
    [
        {"fextra": b"AB\x04\x00data"},
        {"fname": b"archive.warc"},
        {"fcomment": b"a comment"},
        {"fhcrc": True},
        {
            "fextra": b"XY\x02\x00ok",
            "fname": b"n",
            "fcomment": b"c",
            "fhcrc": True,
        },
    ],
    ids=["fextra", "fname", "fcomment", "fhcrc", "all-four"],
)
def test_optional_header_fields_walked(kw):
    body = b"header-field walk body " * 40
    assert gunzip_members(make_member(body, **kw)) == [body]
    # and stdlib agrees the member is well-formed
    assert gzip.decompress(make_member(body, **kw)) == body


def test_header_fields_on_second_member():
    blob = make_member(b"first") + make_member(
        b"second", fextra=b"ZZ\x01\x00!", fname=b"f", fhcrc=True
    )
    assert gunzip_members(blob) == [b"first", b"second"]


def test_isize_is_mod_2_32():
    # RFC 1952: ISIZE is the input size modulo 2^32 — a member whose
    # trailer already encodes the wrapped value must pass the check.
    body = b"x" * 10
    blob = make_member(body, isize_override=(len(body) + 2**32) & 0xFFFFFFFF)
    assert gunzip_members(blob) == [body]


# ---------------------------------------------------- gunzip_members gates


def test_bad_magic_raises():
    with pytest.raises(GzipError, match="magic"):
        gunzip_members(b"PK\x03\x04" + b"\x00" * 20)


def test_bad_magic_in_second_member_reports_offset():
    first = make_member(b"ok")
    with pytest.raises(GzipError, match=f"magic at {len(first)}"):
        gunzip_members(first + b"\x00\x01" + b"\x00" * 20)


def test_non_deflate_method_raises():
    blob = bytearray(make_member(b"x"))
    blob[2] = 7  # CM=7 is reserved
    with pytest.raises(GzipError, match="method 7"):
        gunzip_members(bytes(blob))


def test_truncated_fixed_header_raises():
    with pytest.raises(GzipError, match="truncated gzip header"):
        gunzip_members(b"\x1f\x8b\x08\x00\x00")


def test_truncated_fextra_length_raises():
    blob = b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\x03" + b"\x05"
    with pytest.raises(GzipError, match="FEXTRA"):
        gunzip_members(blob)


def test_fextra_length_past_end_raises():
    # XLEN says 200 bytes follow; only 2 do → p jumps past len(b)
    blob = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\x03"
        + struct.pack("<H", 200)
        + b"ab"
    )
    with pytest.raises(GzipError, match="truncated gzip header fields"):
        gunzip_members(blob)


def test_unterminated_fname_raises():
    blob = b"\x1f\x8b\x08\x08\x00\x00\x00\x00\x00\x03" + b"no-nul-here"
    with pytest.raises(GzipError, match="FNAME"):
        gunzip_members(blob)


def test_unterminated_fcomment_raises():
    blob = b"\x1f\x8b\x08\x10\x00\x00\x00\x00\x00\x03" + b"no-nul"
    with pytest.raises(GzipError, match="FCOMMENT"):
        gunzip_members(blob)


def test_garbage_deflate_raises():
    blob = (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"
        + b"\xff\xfe\xfd\xfc" * 4
        + b"\x00" * 8
    )
    with pytest.raises(GzipError, match="deflate"):
        gunzip_members(blob)


def test_truncated_deflate_stream_raises():
    full = make_member(b"truncate me please " * 50)
    with pytest.raises(GzipError, match="did not terminate"):
        gunzip_members(full[: len(full) - 30])


def test_truncated_trailer_raises():
    full = make_member(b"body")
    with pytest.raises(GzipError, match="trailer"):
        gunzip_members(full[:-3])


def test_isize_mismatch_raises():
    blob = make_member(b"twelve bytes", isize_override=999)
    with pytest.raises(GzipError, match="ISIZE 999"):
        gunzip_members(blob)


def test_first_member_error_even_if_rest_valid():
    bad = make_member(b"a", isize_override=5)
    with pytest.raises(GzipError):
        gunzip_members(bad + make_member(b"b"))


# ------------------------------------------------------------- WARC builders


def make_record(
    headers: list[tuple[str, str]], body: bytes, version: str = "WARC/1.0"
) -> bytes:
    head = "".join(f"{n}: {v}\r\n" for n, v in headers)
    return f"{version}\r\n{head}\r\n".encode() + body + b"\r\n\r\n"


def test_parse_warc_basic_record():
    body = b"hello warc"
    rec = make_record(
        [("WARC-Type", "resource"), ("Content-Length", str(len(body)))],
        body,
    )
    out = parse_warc(rec)
    assert len(out) == 1
    assert out[0]["version"] == "WARC/1.0"
    assert out[0]["headers"]["warc-type"] == "resource"
    assert out[0]["body"] == body


def test_parse_warc_11_version_and_multi_record_order():
    recs = [
        make_record(
            [("WARC-Type", "request"), ("Content-Length", str(len(b)))],
            b,
            version="WARC/1.1",
        )
        for b in (b"one", b"two two", b"three three three")
    ]
    out = parse_warc(b"".join(recs))
    assert [r["body"] for r in out] == [b"one", b"two two", b"three three three"]
    assert all(r["version"] == "WARC/1.1" for r in out)


def test_parse_warc_case_mixed_headers_lowercased():
    body = b"x" * 7
    rec = make_record(
        [
            ("wArC-tYpE", "response"),
            ("CONTENT-LENGTH", str(len(body))),
            ("WARC-Target-URI", "http://e.com/"),
        ],
        body,
    )
    h = parse_warc(rec)[0]["headers"]
    assert h["warc-type"] == "response"
    assert h["content-length"] == str(len(body))
    assert h["warc-target-uri"] == "http://e.com/"


def test_parse_warc_body_may_contain_crlf_crlf():
    # Content-Length is authoritative: separators inside the body must
    # not end the record early.
    body = b"part1\r\n\r\npart2"
    rec = make_record([("Content-Length", str(len(body)))], body)
    out = parse_warc(rec)
    assert out[0]["body"] == body


def test_parse_warc_missing_content_length_raises():
    rec = make_record([("WARC-Type", "resource")], b"")
    # strip the body framing so only the header defect is in play
    with pytest.raises(WarcError, match="Content-Length"):
        parse_warc(rec)


def test_parse_warc_bad_version_line_raises():
    with pytest.raises(WarcError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_parse_warc_missing_version_terminator_raises():
    with pytest.raises(WarcError, match="version line terminator"):
        parse_warc(b"WARC/1.0")


def test_parse_warc_unterminated_header_block_raises():
    with pytest.raises(WarcError, match="unterminated"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 3\r\n")


def test_parse_warc_malformed_header_line_raises():
    with pytest.raises(WarcError, match="malformed header line"):
        parse_warc(b"WARC/1.0\r\nno-colon-here\r\n\r\n\r\n\r\n")


def test_parse_warc_truncated_body_raises():
    rec = make_record([("Content-Length", "100")], b"short")
    with pytest.raises(WarcError, match="truncated"):
        parse_warc(rec)


def test_parse_warc_missing_record_separator_raises():
    body = b"abc"
    rec = make_record([("Content-Length", str(len(body)))], body)
    with pytest.raises(WarcError, match="separator"):
        parse_warc(rec[:-4] + b"\r\n")  # only one CRLF, not two


# -------------------------------------------------------- HTTP envelope


def test_split_http_response_basic():
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"X-Mixed-CASE: yes\r\n\r\n<html>hi</html>"
    )
    status, headers, entity = split_http_response(body)
    assert status == 200
    assert headers["content-type"] == "text/html"
    assert headers["x-mixed-case"] == "yes"
    assert entity == b"<html>hi</html>"


def test_split_http_response_status_line_only():
    status, headers, entity = split_http_response(b"HTTP/1.0 404\r\n\r\ngone")
    assert status == 404
    assert headers == {}
    assert entity == b"gone"


def test_split_http_response_missing_terminator_raises():
    with pytest.raises(WarcError, match="terminator"):
        split_http_response(b"HTTP/1.1 200 OK\r\nNo-End: true")


def test_split_http_response_bad_status_line_raises():
    with pytest.raises(WarcError, match="status line"):
        split_http_response(b"ICY 200 OK\r\n\r\nbody")


# --------------------------------------------------- spark-side operators


def _docs(spark, n=6):
    return spark.range(n).selectExpr("id AS doc_id")


def test_gunzip_stats_matches_python_decode(spark):
    assets = synth_gzip_assets(_docs(spark))
    got = {
        (r.asset_id, r.member_idx): (r.n_bytes, r.byte_sum, r.byte_checksum)
        for r in gunzip_stats(assets).collect()
    }
    # independent expectation: run the pure-python decoder driver-side
    # on the same payloads and recompute the stats
    for row in assets.collect():
        members = gunzip_members(bytes(row.payload))
        assert len(members) == 2
        for m, body in enumerate(members):
            want = (
                len(body),
                sum(body),
                sum(v * (i + 1) * (i + 1) for i, v in enumerate(body)),
            )
            assert got[(row.asset_id, m)] == want


def test_warc_response_stats_matches_python_decode(spark):
    assets = synth_warc_assets(_docs(spark))
    rows = warc_response_stats(assets).collect()
    # 2 records per archive: warcinfo then response
    by_key = {(r.asset_id, r.record_idx): r for r in rows}
    for arow in assets.collect():
        recs = parse_warc(bytes(arow.payload))
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo",
            "response",
        ]
        info = by_key[(arow.asset_id, 0)]
        assert (info.warc_type, info.status, info.entity_sum) == (
            "warcinfo",
            None,
            0,
        )
        status, _hh, entity = split_http_response(recs[1]["body"])
        resp = by_key[(arow.asset_id, 1)]
        assert resp.status == status == 200
        assert resp.url == f"http://example.com/doc/{arow.asset_id}"
        assert resp.entity_len == len(entity)
        assert resp.entity_sum == sum(entity)
        assert resp.content_length == int(recs[1]["headers"]["content-length"])


# ----------------------------------------------------- HTML text extraction


def test_html_to_text_strips_tags_and_collapses_whitespace():
    assert (
        html_to_text("<html><body><p>Hello\n\n  <b>world</b>!</p></body></html>")
        == "Hello world !"
    )


def test_html_to_text_drops_script_and_style_content():
    page = (
        "<head><script>if (a < 1 && b) { x = '<p>fake</p>'; }</script>"
        "<style>p { color: red; }</style></head><body>kept</body>"
    )
    assert html_to_text(page) == "kept"


def test_html_to_text_drops_comments_and_doctype():
    assert html_to_text("<!DOCTYPE html><!-- secret words -->visible") == "visible"


def test_html_to_text_decodes_entities_and_charrefs():
    assert html_to_text("<p>A &amp; B &#67; &lt;tag&gt; &quot;q&quot;</p>") == (
        'A & B C <tag> "q"'
    )


def test_html_to_text_tag_boundary_is_whitespace_boundary():
    # pinned semantics: every tag boundary separates tokens — block
    # elements never glue ("one</p><p>two"), inline splits accepted
    assert html_to_text("one</p><p>two") == "one two"
    assert html_to_text("fo<b>o</b>") == "fo o"


def test_html_to_text_unclosed_script_swallows_tail():
    # CDATA semantics: without </script> the rest of the page is
    # script data — graceful degradation, not an exception
    assert html_to_text("before<script>var x = 1; <p>gone</p>") == "before"


def test_html_to_text_nested_same_tag_after_skip():
    # skip flag clears on the matching end tag; later content returns
    assert html_to_text("<style>a{}</style>one<style>b{}</style>two") == "one two"


def test_warc_html_text_matches_python_composition(spark):
    assets = synth_warc_html_assets(_docs(spark))
    got = {r.asset_id: r for r in warc_html_text(assets).collect()}
    for arow in assets.collect():
        recs = parse_warc(bytes(arow.payload))
        # record 0 is warcinfo → skipped; record 1 is the HTML response
        assert len(recs) == 2
        _status, hh, entity = split_http_response(recs[1]["body"])
        assert "html" in hh["content-type"]
        want = html_to_text(entity.decode("utf-8"))
        r = got[arow.asset_id]
        assert (r.record_idx, r.text, r.n_chars) == (1, want, len(want))
        assert r.url == f"http://example.com/doc/{arow.asset_id}"


def test_warc_html_text_skips_non_html_responses(spark):
    body = b"HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n{}"
    rec = make_record(
        [
            ("WARC-Type", "response"),
            ("Content-Length", str(len(body))),
        ],
        body,
    )
    assets = spark.createDataFrame([(1, rec)], "asset_id LONG, payload BINARY")
    assert warc_html_text(assets).count() == 0


def test_docs_from_warc_feeds_corpus_pipeline(spark):
    from cryptocoininsights_data_engineer_project_spark.pipeline.corpus import (
        docs_from_warc,
        prepare_corpus_from_warc,
    )

    assets = synth_warc_html_assets(_docs(spark, 40))
    docs = docs_from_warc(assets)
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = docs.collect()
    assert len(rows) == 40
    assert all(r.source == "warc" and r.n_chars == len(r.text) for r in rows)

    # end-to-end: WARC in, packs out. Half the synthetic pages rank
    # 'unknown' (random letters, no stopwords) → gate on that class;
    # the benchmark is DISJOINT text (the corpus-subset case is
    # already pinned in tests/test_corpus_pipeline.py).
    benchmark = spark.createDataFrame(
        [(9001, "zz qq xx vv kk jj ww uu yy tt")], ["doc_id", "text"]
    )
    packs, stats = prepare_corpus_from_warc(
        assets, benchmark, lang="unknown", min_quality=0.1
    )
    st = {r.stage: r.n for r in stats.collect()}
    assert st["input"] == 40

    # manual composition of the standalone operators over the same docs
    from cryptocoininsights_data_engineer_project_spark.operators import (
        dedup,
        textops,
    )

    gate = textops.corpus_filter(docs, lang="unknown", min_quality=0.1)
    kept = {r.doc_id for r in gate.filter("keep").select("doc_id").collect()}
    survivors = docs.filter(F.col("doc_id").isin(kept))
    labels, _ = dedup.connected_components(
        dedup.minhash_candidate_pairs(survivors)
    )
    non_canon = {
        r.doc_id
        for r in labels.filter("doc_id != cluster_id").select("doc_id").collect()
    }
    contaminated = {
        r.doc_id
        for r in dedup.decontaminate(
            survivors.filter(~F.col("doc_id").isin(non_canon)), benchmark
        )
        .select("doc_id")
        .collect()
    }
    expect = kept - non_canon - contaminated
    got = {r.doc_id for r in packs.select("doc_id").collect()}
    assert got == expect and len(got) > 0
    assert set(packs.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "val",
        "test",
    }


# ------------------------------------------------- volume / plan shape


def test_multirecord_archives_match_python_decode(spark):
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        WARC_MULTI_RECORDS,
        synth_warc_multi_assets,
    )

    assets = synth_warc_multi_assets(_docs(spark, 8))
    got = {
        (r.asset_id, r.record_idx): (r.url, r.entity_len, r.entity_sum)
        for r in warc_response_stats(assets).collect()
    }
    assert len(got) == 8 * WARC_MULTI_RECORDS
    for arow in assets.collect():
        recs = parse_warc(bytes(arow.payload))
        assert len(recs) == WARC_MULTI_RECORDS
        for i, rec in enumerate(recs):
            _status, _hh, entity = split_http_response(rec["body"])
            assert got[(arow.asset_id, i)] == (
                f"http://example.com/doc/{arow.asset_id}/{i}",
                len(entity),
                sum(entity),
            )


def test_warc_volume_walk_stays_executor_side(spark):
    # the real-archive shape at volume: thousands of multi-record
    # archives through the one-pass walk — record count scales as
    # docs x records with NO exchange anywhere in the plan, so the
    # payload bytes provably never shuffle regardless of volume
    import contextlib
    import io

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        WARC_MULTI_RECORDS,
        synth_warc_multi_assets,
    )

    n = 4000
    out = warc_response_stats(
        synth_warc_multi_assets(_docs(spark, n))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    agg = out.groupBy().agg(
        F.count("*").alias("n"), F.sum("entity_len").alias("s")
    ).collect()[0]
    assert agg.n == n * WARC_MULTI_RECORDS
    assert agg.s == n * WARC_MULTI_RECORDS * 8


def test_registry_warc_plans_have_no_shuffle(spark):
    # every webarchive registry query: one parquet scan, one
    # mapInPandas, zero exchanges before it (payloads never shuffle)
    import contextlib
    import io

    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

    for name in (
        "warc_extract",
        "warc_multirecord",
        "html_text_extract",
        "text_gunzip",
        "tar_extract",
        "zip_extract",
        "tfrecord_extract",
        "ogg_extract",
        "warc_index_build",
        "warc_fetch_record",
    ):
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if name == "warc_fetch_record":
            # consumes the persisted capture index: the tiny index
            # rows BROADCAST to the archives — still zero shuffle
            # exchanges, so payload bytes provably never move
            assert re.findall(r"\(\d+\) Exchange\b", plan) == [], name
            assert "BroadcastExchange" in plan, name
        else:
            assert "Exchange" not in plan, name
        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, name


def test_gunzip_stats_on_real_deflate_archives(spark):
    # the registry fixture uses stored-DEFLATE; prove the operator is
    # codec-complete by feeding real zlib-compressed members through
    # the same mapInPandas path.
    bodies = {i: (f"doc {i} ".encode() * (10 + i)) for i in range(4)}
    pdf_rows = [
        (i, gzip.compress(bodies[i]) + make_member(bodies[i][::-1], fname=b"r"))
        for i in range(4)
    ]
    assets = spark.createDataFrame(pdf_rows, "asset_id LONG, payload BINARY")
    got = {
        (r.asset_id, r.member_idx): (r.n_bytes, r.byte_sum)
        for r in gunzip_stats(assets).collect()
    }
    for i, body in bodies.items():
        assert got[(i, 0)] == (len(body), sum(body))
        assert got[(i, 1)] == (len(body), sum(body[::-1]))


# ------------------------------------------------------- link extraction


def test_html_links_order_and_skips():
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        html_links,
    )

    page = (
        '<html><body><a name="top">no href</a>'
        '<a href="http://a.com/1">one</a>'
        '<p><a class="x" href="/rel">two</a></p>'
        '<a href="">empty</a>'
        "<a>bare</a>"
        '<A HREF="http://B.com/2">case</A>'
        '<script>var s = \'<a href="http://fake.com">\';</script>'
        "</body></html>"
    )
    # attribute values kept verbatim; tag/attr NAMES are
    # case-insensitive; empty href is a real (self) reference;
    # anchors inside script CDATA are not markup
    assert html_links(page) == [
        "http://a.com/1",
        "/rel",
        "",
        "http://B.com/2",
    ]


def test_warc_html_links_matches_python(spark):
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        html_links,
        synth_warc_linked_assets,
        warc_html_links,
    )

    assets = synth_warc_linked_assets(_docs(spark, 12))
    got = {}
    for r in warc_html_links(assets).collect():
        got.setdefault(r.asset_id, []).append((r.link_idx, r.href, r.base_url))
    for arow in assets.collect():
        recs = parse_warc(bytes(arow.payload))
        _s, _h, entity = split_http_response(recs[0]["body"])
        want = html_links(entity.decode())
        rows = sorted(got[arow.asset_id])
        assert [h for _i, h, _b in rows] == want
        assert len(want) == 3 and want[2] == "/relative/path"
        base = recs[0]["headers"]["warc-target-uri"]
        assert all(b == base for _i, _h, b in rows)


# ------------------------------------------------------------ fuzz


def test_gunzip_fuzz_never_crashes_untyped():
    # arbitrary bytes must either decode or raise GzipError — no
    # IndexError/struct.error/zlib.error may escape the gate layer
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=120))
    def run(blob):
        try:
            gunzip_members(blob)
        except GzipError:
            pass

    run()


def test_gunzip_fuzz_valid_members_with_junk_tail():
    # a valid member followed by corrupted bytes: the first member
    # decodes before the error surfaces (error names the offset)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.binary(min_size=1, max_size=40), st.binary(min_size=1, max_size=20))
    def run(body, junk):
        blob = make_member(body) + junk
        try:
            out = gunzip_members(blob)
            # junk happened to parse as members; first must be intact
            assert out[0] == body
        except GzipError:
            pass

    run()


def test_parse_warc_fuzz_never_crashes_untyped():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=150))
    def run(blob):
        try:
            parse_warc(blob)
        except WarcError:
            pass

    run()


def test_parse_warc_content_length_gates():
    # found by the fuzz: non-numeric / negative Content-Length must be
    # WarcError, not a bare stdlib ValueError escaping the gate layer
    with pytest.raises(WarcError, match="non-numeric"):
        parse_warc(b"WARC/1.0\r\nContent-Length: abc\r\n\r\n\r\n\r\n")
    with pytest.raises(WarcError, match="negative"):
        parse_warc(b"WARC/1.0\r\nContent-Length: -5\r\n\r\n\r\n\r\n")


def test_html_to_text_fuzz_total():
    # html.parser is a recovering parser: any unicode input must
    # produce SOME string, never raise
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=250, deadline=None)
    @given(st.text(max_size=200))
    def run(s):
        out = html_to_text(s)
        assert isinstance(out, str)
        assert "  " not in out  # whitespace normalization holds

    run()


def test_warc_html_text_honors_content_type_charset(spark):
    # review finding: a Latin-1 page must not dissolve into U+FFFD
    html = "<p>café touché</p>".encode("iso-8859-1")
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1"
        b"\r\n\r\n" + html
    )
    rec = make_record(
        [("WARC-Type", "response"), ("Content-Length", str(len(body)))],
        body,
    )
    assets = spark.createDataFrame([(1, rec)], "asset_id LONG, payload BINARY")
    row = warc_html_text(assets).collect()[0]
    assert row.text == "café touché"


# ------------------------------------------------------------- tar shards


def _stdlib_tar(members):
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, __import__("io").BytesIO(data))
    return buf.getvalue()


def test_parse_tar_matches_stdlib_encoder():
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        parse_tar,
    )

    members = [
        ("a.txt", b"hello world"),
        ("dir/nested.bin", bytes(range(256)) * 3),
        ("empty", b""),
        ("exactly512", bytes(512)),
    ]
    ms = parse_tar(_stdlib_tar(members))
    assert [(m["name"], m["body"]) for m in ms] == members
    assert all(m["typeflag"] == "0" for m in ms)


def test_parse_tar_concatenated_shards():
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        parse_tar,
    )

    # two shards glued end-to-end... the first's zero-block terminator
    # ends the walk (the WebDataset convention is one shard per file)
    one = _stdlib_tar([("x", b"1")])
    two = _stdlib_tar([("y", b"2")])
    assert [m["name"] for m in parse_tar(one + two)] == ["x"]

    def strip_term(blob):  # drop terminator + stdlib's 10240-recordsize pad
        end = len(blob.rstrip(b"\x00"))
        return blob[: ((end + 511) // 512) * 512]

    stripped = strip_term(one) + strip_term(two)
    assert [m["name"] for m in parse_tar(stripped)] == ["x", "y"]


def test_parse_tar_gates():
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        TarError,
        parse_tar,
    )

    good = bytearray(_stdlib_tar([("a", b"abc")]))
    bad = bytearray(good)
    bad[0] ^= 0xFF  # corrupt the name -> checksum mismatch
    with pytest.raises(TarError, match="checksum"):
        parse_tar(bytes(bad))
    bad2 = bytearray(good)
    bad2[124:136] = b"zzzzzzzzzzz\x00"  # non-octal size
    with pytest.raises(TarError, match="non-octal|checksum"):
        parse_tar(bytes(bad2))
    with pytest.raises(TarError, match="truncated"):
        parse_tar(bytes(good[:514]))  # body cut off mid-member


def test_synth_tar_fixture_is_stdlib_readable(spark):
    import io
    import tarfile

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        synth_tar_assets,
        tar_member_stats,
    )

    assets = synth_tar_assets(_docs(spark, 7))
    for row in assets.collect():
        with tarfile.open(fileobj=io.BytesIO(bytes(row.payload))) as tf:
            names = tf.getnames()
            assert names == [f"doc{row.asset_id}.txt"]
            data = tf.extractfile(names[0]).read()
            assert len(data) == 8
    got = {r.asset_id: r.byte_sum for r in tar_member_stats(assets).collect()}
    for d in range(7):
        assert got[d] == sum(97 + (d * 3 + j) % 26 for j in range(8))


def test_parse_tar_fuzz_never_crashes_untyped():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        TarError,
        parse_tar,
    )

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=1100))
    def run(blob):
        try:
            parse_tar(blob)
        except TarError:
            pass

    run()


def test_parse_tar_fuzz_valid_member_then_junk():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        TarError,
        parse_tar,
    )

    @settings(max_examples=80, deadline=None)
    @given(st.binary(min_size=1, max_size=60), st.binary(min_size=512, max_size=700))
    def run(body, junk):
        blob = _stdlib_tar([("f", body)])
        # Truncate at the member's structural end (512-byte header +
        # body padded to the next 512 boundary) — rstrip(b"\x00")
        # would eat the body block itself for all-zero bodies.
        end = 512 + ((len(body) + 511) // 512) * 512
        blob = blob[:end] + junk
        try:
            ms = parse_tar(blob)
            assert ms[0]["body"] == body  # first member intact regardless
        except TarError:
            pass

    run()


# ------------------------------------------------------------- zip shards


def _stdlib_zip(members, compress=False):
    import io
    import zipfile

    buf = io.BytesIO()
    mode = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", compression=mode) as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def test_parse_zip_matches_stdlib_encoder():
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        parse_zip,
    )

    members = [
        ("a.txt", b"hello world"),
        ("dir/nested.bin", bytes(range(256)) * 3),
        ("empty", b""),
    ]
    for compress in (False, True):
        ms = parse_zip(_stdlib_zip(members, compress=compress))
        assert [(m["name"], m["body"]) for m in ms] == members
        want = 8 if compress else 0
        # zipfile stores empty members uncompressed either way
        assert all(
            m["method"] == (want if m["body"] else m["method"])
            for m in ms
        )


def test_parse_zip_gates():
    import struct

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        ZipError,
        parse_zip,
    )

    good = _stdlib_zip([("a.txt", b"abcdefgh")])
    with pytest.raises(ZipError, match="end-of-central-directory"):
        parse_zip(good[: good.rfind(b"PK\x05\x06")])
    bad = bytearray(good)
    bad[30 + 5] ^= 0xFF  # flip a body byte under the stored member
    with pytest.raises(ZipError, match="CRC-32"):
        parse_zip(bytes(bad))
    bad2 = bytearray(good)
    bad2[0] ^= 0xFF  # local signature
    with pytest.raises(ZipError, match="local-header signature"):
        parse_zip(bytes(bad2))
    # encrypted flag set in the central entry
    cd = good.rfind(b"PK\x01\x02")
    bad3 = bytearray(good)
    bad3[cd + 8 : cd + 10] = struct.pack("<H", 0x1)
    with pytest.raises(ZipError, match="encrypted"):
        parse_zip(bytes(bad3))
    # unsupported method in the central entry
    bad4 = bytearray(good)
    bad4[cd + 10 : cd + 12] = struct.pack("<H", 98)  # PPMd
    with pytest.raises(ZipError, match="unsupported compression"):
        parse_zip(bytes(bad4))


def test_synth_zip_fixture_is_stdlib_readable(spark):
    import io
    import zipfile

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        synth_zip_assets,
        zip_member_stats,
    )

    assets = synth_zip_assets(_docs(spark, 7))
    for row in assets.collect():
        with zipfile.ZipFile(io.BytesIO(bytes(row.payload))) as zf:
            assert zf.testzip() is None  # stdlib verifies every CRC
            names = zf.namelist()
            assert names == [
                f"doc{row.asset_id}.txt",
                f"doc{row.asset_id}.bin",
            ]
            infos = zf.infolist()
            assert [i.compress_type for i in infos] == [0, 8]
            a = zf.read(names[0])
            b = zf.read(names[1])
        d = row.asset_id
        assert a == bytes(97 + (d * 5 + j) % 26 for j in range(8))
        assert b == bytes(97 + (d * 7 + j + 2) % 26 for j in range(8))
    got = {
        (r.asset_id, r.member_idx): (r.name, r.method, r.n_bytes, r.byte_sum)
        for r in zip_member_stats(assets).collect()
    }
    for d in range(7):
        assert got[(d, 0)] == (
            f"doc{d}.txt", 0, 8, sum(97 + (d * 5 + j) % 26 for j in range(8))
        )
        assert got[(d, 1)] == (
            f"doc{d}.bin", 8, 8,
            sum(97 + (d * 7 + j + 2) % 26 for j in range(8)),
        )


def test_parse_zip_fuzz_never_crashes_untyped():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        ZipError,
        parse_zip,
    )

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=1100))
    def run(blob):
        try:
            parse_zip(blob)
        except ZipError:
            pass

    run()


def test_parse_zip_fuzz_valid_archive_with_mutations():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        ZipError,
        parse_zip,
    )

    base = _stdlib_zip([("x.txt", b"payload bytes"), ("y", b"12")], True)

    @settings(max_examples=250, deadline=None)
    @given(
        st.integers(min_value=0, max_value=len(base) - 1),
        st.integers(min_value=1, max_value=255),
    )
    def run(i, x):
        blob = bytearray(base)
        blob[i] ^= x
        try:
            ms = parse_zip(bytes(blob))
            # a surviving parse must still produce internally
            # consistent members
            for m in ms:
                assert isinstance(m["name"], str)
                assert m["method"] in (0, 8)
        except ZipError:
            pass

    run()


# ---------------------------------------------------------- tfrecord shards


def _tfrec(datas):
    import struct

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        _tf_mask,
        crc32c,
    )

    out = bytearray()
    for data in datas:
        ln = struct.pack("<Q", len(data))
        out += ln + struct.pack("<I", _tf_mask(crc32c(ln)))
        out += data + struct.pack("<I", _tf_mask(crc32c(data)))
    return bytes(out)


def test_crc32c_public_check_value():
    # the Castagnoli polynomial's published check value — the one
    # external anchor every CRC-32C implementation must hit
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        crc32c,
    )

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_parse_tfrecord_roundtrip_and_gates():
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        TfrecordError,
        parse_tfrecord,
    )

    datas = [b"hello world", b"", bytes(range(256)) * 2]
    assert parse_tfrecord(_tfrec(datas)) == datas
    good = bytearray(_tfrec([b"abcdefgh"]))
    bad = bytearray(good)
    bad[12] ^= 0xFF  # payload byte -> data CRC mismatch
    with pytest.raises(TfrecordError, match="data CRC"):
        parse_tfrecord(bytes(bad))
    bad2 = bytearray(good)
    bad2[0] ^= 0x01  # length byte -> length CRC mismatch
    with pytest.raises(TfrecordError, match="length CRC"):
        parse_tfrecord(bytes(bad2))
    with pytest.raises(TfrecordError, match="truncated"):
        parse_tfrecord(bytes(good[:-2]))


def test_synth_tfrecord_fixture_parses_with_verified_crcs(spark):
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        parse_tfrecord,
        synth_tfrecord_assets,
        tfrecord_stats,
    )

    assets = synth_tfrecord_assets(_docs(spark, 7))
    for row in assets.collect():
        recs = parse_tfrecord(bytes(row.payload))  # verifies all CRCs
        d = row.asset_id
        assert recs[0] == bytes((d * 5 + j * 3) % 256 for j in range(8))
        assert recs[1] == bytes((d * 7 + j * 3 + 7) % 256 for j in range(8))
    got = {
        (r.asset_id, r.record_idx): r.byte_sum
        for r in tfrecord_stats(assets).collect()
    }
    for d in range(7):
        assert got[(d, 0)] == sum((d * 5 + j * 3) % 256 for j in range(8))
        assert got[(d, 1)] == sum(
            (d * 7 + j * 3 + 7) % 256 for j in range(8)
        )


def test_parse_tfrecord_fuzz_never_crashes_untyped():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        TfrecordError,
        parse_tfrecord,
    )

    @settings(max_examples=250, deadline=None)
    @given(st.binary(max_size=600))
    def run(blob):
        try:
            parse_tfrecord(blob)
        except TfrecordError:
            pass

    run()


# --------------------------------------------------------------- sitemaps


def test_sitemap_entries_shapes_and_malformed(spark):
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        sitemap_entries,
    )

    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.net/x</loc><lastmod>2024-01-01</lastmod>"
        "<priority>0.5</priority></url>"
        "<url><loc>http://a.net/y</loc></url></urlset>"
    )
    index = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>http://a.net/s1.xml</loc></sitemap></sitemapindex>"
    )
    assets = spark.createDataFrame(
        [(0, urlset), (1, index), (2, "not xml at all <<<")],
        "asset_id long, xml string",
    )
    rows = sitemap_entries(assets).collect()
    got = {(r.asset_id, r.entry_idx): r for r in rows}
    assert got[(0, 0)].loc == "http://a.net/x"
    assert got[(0, 0)].priority == 0.5
    assert got[(0, 1)].lastmod is None and got[(0, 1)].priority is None
    assert got[(1, 0)].kind == "sitemap"
    assert got[(1, 0)].loc == "http://a.net/s1.xml"
    # malformed XML parses to null arrays -> contributes zero rows
    # (quarantine upstream by anti-joining extracted asset_ids)
    assert all(r.asset_id != 2 for r in rows)


def test_sitemap_plan_is_jvm_only(spark):
    # from_xml + transform + posexplode: no Python workers, no
    # exchange before the explode
    import contextlib
    import io

    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

    df = REGISTRY["sitemap_extract"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


def test_warc_record_byte_ranges_slice_standalone():
    # every (offset, nbytes) reported by parse_warc must frame a
    # standalone parseable record equal to the original
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        parse_warc,
    )

    def rec(uri, body):
        head = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + b"WARC-Target-URI: " + uri + b"\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        )
        return head + body + b"\r\n\r\n"

    blob = b"".join(
        rec(f"http://x/{i}".encode(), bytes([i]) * (i * 7 % 23))
        for i in range(9)
    )
    recs = parse_warc(blob)
    assert sum(r["nbytes"] for r in recs) == len(blob)
    pos = 0
    for r in recs:
        assert r["offset"] == pos
        sl = blob[r["offset"] : r["offset"] + r["nbytes"]]
        again = parse_warc(sl)
        assert len(again) == 1 and again[0]["body"] == r["body"]
        pos += r["nbytes"]


def test_parse_zip_bzip2_and_lzma_members():
    # methods 12/14 through stdlib-written archives, plus gates
    import io
    import zipfile

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        ZipError,
        parse_zip,
    )

    for comp, want in [(zipfile.ZIP_BZIP2, 12), (zipfile.ZIP_LZMA, 14)]:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", compression=comp) as z:
            z.writestr("x.bin", bytes(range(256)) * 5)
            z.writestr("y.txt", b"repetitive " * 40)
        ms = parse_zip(buf.getvalue())
        assert [m["method"] for m in ms] == [want, want]
        assert ms[0]["body"] == bytes(range(256)) * 5
        assert ms[1]["body"] == b"repetitive " * 40
        # corrupt a compressed byte (past the LZMA props header,
        # whose dict-size field does not affect small-stream output)
        # -> typed error (stream or CRC)
        blob = bytearray(buf.getvalue())
        blob[60] ^= 0xFF
        with pytest.raises(ZipError):
            parse_zip(bytes(blob))


def test_persisted_index_drives_ranged_fetch(spark, tmp_path):
    """The production flow: the capture index is WRITTEN once, read
    back later, and its (offset, rec_bytes) ranges slice records out
    of the archives with a JVM substring — every slice parses
    standalone and matches the direct walk."""
    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        parse_warc,
        split_http_response,
        synth_warc_multi_assets,
        warc_record_index,
    )

    assets = synth_warc_multi_assets(_docs(spark, 5)).localCheckpoint()
    idx_path = str(tmp_path / "warc_index")
    warc_record_index(assets).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    # keep records 3 and 12 of each archive (one single- and one
    # double-digit index: both offset-formula branches)
    picked = idx.filter(F.col("record_idx").isin(3, 12))
    sliced = picked.join(assets, "asset_id").selectExpr(
        "asset_id",
        "record_idx",
        "target_uri",
        "substring(payload, CAST(offset + 1 AS INT), "
        "CAST(rec_bytes AS INT)) AS rec",
    )
    rows = sliced.collect()
    assert len(rows) == 10
    direct = {
        r.asset_id: parse_warc(bytes(r.payload))
        for r in assets.collect()
    }
    for r in rows:
        recs = parse_warc(bytes(r.rec))
        assert len(recs) == 1
        want = direct[r.asset_id][r.record_idx]
        assert recs[0]["headers"] == want["headers"]
        assert recs[0]["body"] == want["body"]
        assert r.target_uri == want["headers"]["warc-target-uri"]
        _s, _h, entity = split_http_response(recs[0]["body"])
        assert len(entity) == 8

def test_cdxj_lines_render_interop_format(spark):
    """CDXJ rendering of index rows: SURT key, fixed timestamp, JSON
    with url/offset/length/filename — checked against independently
    composed strings."""
    import json

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        cdxj_lines,
        synth_warc_multi_assets,
        warc_record_index,
    )

    idx = warc_record_index(synth_warc_multi_assets(_docs(spark, 3)))
    rows = {
        (r.asset_id, r.record_idx): r.cdxj
        for r in cdxj_lines(idx).collect()
    }
    direct = {
        (r.asset_id, r.record_idx): (r.offset, r.rec_bytes, r.target_uri)
        for r in idx.collect()
    }
    assert len(rows) == len(direct)
    for (aid, k), line in rows.items():
        off, ln, uri = direct[(aid, k)]
        surt, ts, js = line.split(" ", 2)
        assert surt == f"com,example)/doc/{aid}/{k}"
        assert ts == "20260101000000"
        meta = json.loads(js)
        assert meta["url"] == uri
        assert int(meta["offset"]) == off
        assert int(meta["length"]) == ln
        assert meta["filename"] == f"archive-{aid}.warc"


def test_zstd_gates_loudly():
    """ZIP method 93 and .warc.zst inputs raise the TYPED seam error
    (ZstdUnsupported is a NotImplementedError) — never a silent skip
    or an untyped parse failure."""
    import struct

    import pytest

    from cryptocoininsights_data_engineer_project_spark.operators.webarchive import (
        ZstdUnsupported,
        parse_warc,
        parse_zip,
    )

    # zstd frame magic and the warc-zstd skippable dictionary frame
    with pytest.raises(ZstdUnsupported, match="zstandard wheel"):
        parse_warc(b"\x28\xb5\x2f\xfd" + b"\x00" * 16)
    with pytest.raises(ZstdUnsupported, match="warc-zstd|zstandard"):
        parse_warc(b"\x5d\x2a\x4d\x18" + struct.pack("<I", 4) + b"dict")

    # minimal central directory declaring method 93
    name = b"a.txt"
    lfh = (
        b"PK\x03\x04" + struct.pack(
            "<HHHHHIIIHH", 20, 0, 93, 0, 0, 0, 4, 4, len(name), 0
        ) + name + b"zstd"
    )
    cdh = (
        b"PK\x01\x02" + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, 93, 0, 0, 0, 4, 4, len(name), 0, 0, 0, 0, 0, 0,
        ) + name
    )
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(cdh), len(lfh), 0
    )
    with pytest.raises(ZstdUnsupported, match="method 93"):
        parse_zip(lfh + cdh + eocd)


def test_zstd_seam_decodes_when_registered():
    """The optional-wheel seam (VERDICT r12 item 7): with a registered
    decompressor the SAME inputs that gate loudly above decode — warc
    .zst (including the IIPC skippable dictionary frame, and a
    zstd-compressed dictionary) through parse_warc, and ZIP method 93
    members through parse_zip. The container (zstandard wheel absent)
    exercises the plumbing with a deterministic fake; a wheel install
    swaps in real zstd with zero code changes."""
    import struct

    import pytest

    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    body = b"hello zstd world"
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    MAGIC = b"\x28\xb5\x2f\xfd"

    # deterministic fake: "frame" = magic + 4-byte length + plaintext;
    # a dict prepends its bytes (so dictionary routing is observable)
    def fake(data, dict_data=None):
        assert data[:4] == MAGIC, "fake decompressor fed a non-frame"
        n = int.from_bytes(data[4:8], "little")
        out = data[8 : 8 + n]
        return (dict_data or b"") + out

    def frame(payload: bytes) -> bytes:
        return MAGIC + struct.pack("<I", len(payload)) + payload

    try:
        W.register_zstd_decompressor(fake)
        assert W.zstd_available()
        # plain frame
        recs = W.parse_warc(frame(warc))
        assert len(recs) == 1 and recs[0]["body"] == body
        # skippable dictionary frame: dict carries the WARC prefix,
        # the data frame the rest
        head, tail = warc[:10], warc[10:]
        skippable = b"\x5d\x2a\x4d\x18" + struct.pack("<I", len(head)) + head
        recs = W.parse_warc(skippable + frame(tail))
        assert recs[0]["body"] == body
        # zstd-compressed dictionary (nested frame) also inflates
        cdict = frame(head)
        skippable2 = (
            b"\x5d\x2a\x4d\x18" + struct.pack("<I", len(cdict)) + cdict
        )
        recs = W.parse_warc(skippable2 + frame(tail))
        assert recs[0]["body"] == body
        # an ORDINARY skippable metadata frame (magic 0x184D2A50, not
        # the reserved dictionary magics 5D/5E) is skipped, not fed to
        # the dictionary path
        meta_frame = b"\x50\x2a\x4d\x18" + struct.pack("<I", 4) + b"meta"
        recs = W.parse_warc(meta_frame + frame(warc))
        assert recs[0]["body"] == body
        # a size-0 ordinary skippable frame is also fine
        recs = W.parse_warc(
            b"\x5f\x2a\x4d\x18" + struct.pack("<I", 0) + frame(warc)
        )
        assert recs[0]["body"] == body
        # metadata frame THEN dictionary frame: both honored
        skippable3 = (
            b"\x5e\x2a\x4d\x18" + struct.pack("<I", len(head)) + head
        )
        recs = W.parse_warc(meta_frame + skippable3 + frame(tail))
        assert recs[0]["body"] == body
        # an EMPTY dictionary frame gates loudly instead of erroring
        # inside the decompressor's dict constructor
        empty_dict = b"\x5d\x2a\x4d\x18" + struct.pack("<I", 0)
        with pytest.raises(W.WarcError, match="empty warc-zstd dict"):
            W.zstd_inflate_warc(empty_dict + frame(warc))

        # ZIP method 93 member decodes through the same seam
        name = b"a.txt"
        data = frame(b"zstd!")
        crc = __import__("zlib").crc32(b"zstd!")
        lfh = (
            b"PK\x03\x04"
            + struct.pack(
                "<HHHHHIIIHH", 20, 0, 93, 0, 0, crc, len(data), 5,
                len(name), 0
            )
            + name
            + data
        )
        cdh = (
            b"PK\x01\x02"
            + struct.pack(
                "<HHHHHHIIIHHHHHII",
                20, 20, 0, 93, 0, 0, crc, len(data), 5, len(name),
                0, 0, 0, 0, 0, 0,
            )
            + name
        )
        eocd = b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 1, 1, len(cdh), len(lfh), 0
        )
        members = W.parse_zip(lfh + cdh + eocd)
        assert members[0]["body"] == b"zstd!"
        assert members[0]["method"] == 93
    finally:
        W.register_zstd_decompressor(None)  # reset to wheel-or-gate

    # after reset (wheel absent in this container) the gate is loud again
    if not W.zstd_available():
        with pytest.raises(W.ZstdUnsupported):
            W.parse_warc(frame(warc))


def test_zstd_wheel_roundtrip():
    """Real-wheel integration: skips cleanly in this stdlib-only
    container, runs wherever the zstandard wheel is installed."""
    import pytest

    zstandard = pytest.importorskip("zstandard")
    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    body = b"x" * 100
    warc = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    comp = zstandard.ZstdCompressor().compress(warc)
    recs = W.parse_warc(comp)
    assert recs[0]["body"] == body


def test_content_encoding_dispatch():
    """decode_content_encoding: identity/missing pass through, gzip
    and both deflate flavors decode via stdlib, br/zstd gate loudly
    without a wheel, and an unrecognized token raises (a skipped
    encoding would surface as garbage text downstream)."""
    import gzip as _gzip
    import zlib as _zlib

    import pytest

    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    body = b"<html><body>hello encodings</body></html>"
    assert W.decode_content_encoding({}, body) == body
    assert (
        W.decode_content_encoding({"content-encoding": "identity"}, body)
        == body
    )
    assert (
        W.decode_content_encoding(
            {"content-encoding": "gzip"}, _gzip.compress(body)
        )
        == body
    )
    # deflate: zlib-wrapped (RFC 9110) and the raw-deflate servers
    # every crawl meets
    assert (
        W.decode_content_encoding(
            {"content-encoding": "deflate"}, _zlib.compress(body)
        )
        == body
    )
    raw = _zlib.compressobj(wbits=-15)
    assert (
        W.decode_content_encoding(
            {"content-encoding": "deflate"},
            raw.compress(body) + raw.flush(),
        )
        == body
    )
    with pytest.raises(W.WarcError, match="unrecognized Content-Encoding"):
        W.decode_content_encoding({"content-encoding": "compress"}, body)
    if not W.brotli_available():
        with pytest.raises(W.BrotliUnsupported, match="brotli"):
            W.decode_content_encoding({"content-encoding": "br"}, body)
    if not W.zstd_available():
        with pytest.raises(W.ZstdUnsupported, match="zstandard"):
            W.decode_content_encoding({"content-encoding": "zstd"}, body)


def test_brotli_seam_decodes_when_registered(spark):
    """The brotli optional-wheel seam (VERDICT r13 item 4, the zstd
    seam pattern): with a registered decompressor a Content-Encoding:
    br HTML entity flows through the full WARC → html text chain; a
    reset restores the loud gate."""
    import struct

    import pytest

    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    html = b"<html><body><p>brotli text path</p></body></html>"
    MAGIC = b"FAKEBR"

    def fake(data):
        assert data[:6] == MAGIC, "fake brotli fed a non-frame"
        n = int.from_bytes(data[6:10], "little")
        return data[10 : 10 + n]

    def frame(payload: bytes) -> bytes:
        return MAGIC + struct.pack("<I", len(payload)) + payload

    entity = frame(html)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Encoding: br\r\n\r\n" + entity
    )
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.test/br\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    assets = spark.createDataFrame(
        [(1, bytearray(warc))], "asset_id long, payload binary"
    )
    try:
        W.register_brotli_decompressor(fake)
        assert W.brotli_available()
        rows = W.warc_html_text(assets).collect()
        assert len(rows) == 1 and "brotli text path" in rows[0].text
        # direct seam check too
        assert (
            W.decode_content_encoding({"content-encoding": "br"}, entity)
            == html
        )
    finally:
        W.register_brotli_decompressor(None)
    if not W.brotli_available():
        with pytest.raises(W.BrotliUnsupported):
            W.decode_content_encoding({"content-encoding": "br"}, entity)


def test_brotli_wheel_roundtrip():
    """Real-wheel integration: skips cleanly in this container, runs
    wherever the brotli wheel is installed."""
    import pytest

    brotli = pytest.importorskip("brotli")
    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    body = b"brotli wheel roundtrip " * 20
    assert (
        W.decode_content_encoding(
            {"content-encoding": "br"}, brotli.compress(body)
        )
        == body
    )


def test_gzip_entity_through_html_chain(spark):
    """Content-Encoding: gzip entities (native path, no wheel) decode
    inside warc_html_text — the common crawl shape."""
    import gzip as _gzip

    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    html = b"<html><body><p>gzip entity text</p></body></html>"
    entity = _gzip.compress(html)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + entity
    )
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.test/gz\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    assets = spark.createDataFrame(
        [(1, bytearray(warc))], "asset_id long, payload binary"
    )
    rows = W.warc_html_text(assets).collect()
    assert len(rows) == 1 and "gzip entity text" in rows[0].text


def test_zstd_registration_reaches_executors(spark):
    """register_zstd_decompressor on the DRIVER must take effect
    inside Spark python workers: the codec snapshot rides the operator
    closure (module globals do not cross the process boundary). A
    .warc.zst asset flows through warc_response_stats end-to-end."""
    import struct

    from cryptocoininsights_data_engineer_project_spark.operators import (
        webarchive as W,
    )

    body = b"executor-side zstd"
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    MAGIC = b"\x28\xb5\x2f\xfd"

    def fake(data, dict_data=None):
        assert data[:4] == MAGIC
        n = int.from_bytes(data[4:8], "little")
        return (dict_data or b"") + data[8 : 8 + n]

    frame = MAGIC + struct.pack("<I", len(warc)) + warc
    assets = spark.createDataFrame(
        [(1, bytearray(frame))], "asset_id long, payload binary"
    )
    try:
        W.register_zstd_decompressor(fake)
        rows = W.warc_response_stats(assets).collect()
        assert len(rows) == 1 and rows[0].content_length == len(body)
    finally:
        W.register_zstd_decompressor(None)

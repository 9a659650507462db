"""Ogg container demux (RFC 3533) with Vorbis/Opus identification-header
parsing — the audio twin of the MP4 demuxer in multimodal.py.

A 100 TB audio-ingest pipeline reads stream metadata (codec, channels,
sample rate, duration) from container structure without decoding audio:
Ogg pages carry a granule position whose last value gives the stream
length, and the first packet of a logical stream is a self-describing
identification header (``\\x01vorbis`` / ``OpusHead``).  This module
implements the page layer natively — CRC-32 (poly 0x04C11DB7,
unreflected, zero init/xorout, computed with the CRC field zeroed),
segment-table lacing incl. the 255-boundary zero-lacing rule and
continued-packet reassembly — plus writers, so the parser is pinned by
coupled roundtrips and hand-built pages.  Codec PAYLOAD decode (Vorbis
floor/residue, Opus SILK/CELT) stays behind the documented soundfile
seam, exactly like H.264 in the MP4 path.
"""

from __future__ import annotations

import struct


def _crc_table() -> list:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table

_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def write_page(
    serial: int,
    seq: int,
    granule: int,
    packets_chunks: list,
    header_type: int = 0,
) -> bytes:
    """One Ogg page from a list of segment-lacing chunks (each entry is a
    packet SLICE laced into this page; the caller decides continuation)."""
    lacing = bytearray()
    payload = bytearray()
    for chunk, complete in packets_chunks:
        n = len(chunk)
        full, rem = divmod(n, 255)
        lacing += b"\xff" * full
        if complete:
            lacing.append(rem)  # includes the 0 lacing when n%255 == 0
        elif rem:
            raise ValueError("incomplete packet slice must be 255-aligned")
        payload += chunk
    if len(lacing) > 255:
        raise ValueError("too many segments for one page")
    hdr = struct.pack(
        "<4sBBqIIIB",
        b"OggS", 0, header_type, granule, serial, seq, 0, len(lacing),
    )
    page = bytearray(hdr + bytes(lacing) + bytes(payload))
    crc = ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def write_stream(serial: int, packets: list, granules: list) -> bytes:
    """Pack packets one-per-page (ident packets get their own pages, as
    the Vorbis/Opus mapping requires); ``granules[i]`` stamps page i.
    Oversized packets (>255 segments) spill onto continuation pages."""
    out = bytearray()
    seq = 0
    n = len(packets)
    for i, pkt in enumerate(packets):
        htype = 2 if seq == 0 else 0  # BOS
        remaining = pkt
        first = True
        while True:
            max_bytes = 255 * 255
            take = remaining[:max_bytes]
            remaining = remaining[max_bytes:]
            complete = not remaining
            last_page_of_pkt = complete
            ht = htype if first else 1  # continuation flag
            if i == n - 1 and last_page_of_pkt:
                ht |= 4  # EOS
            gran = granules[i] if last_page_of_pkt else -1
            out += write_page(serial, seq, gran, [(take, complete)], ht)
            seq += 1
            first = False
            if complete:
                break
    return bytes(out)


def read_pages(content: bytes):
    """Yield (header_type, granule, serial, seq, segments) per page;
    raises on capture-pattern or CRC mismatch."""
    pos = 0
    while pos + 27 <= len(content):
        if content[pos : pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        (
            _cap, version, htype, granule, serial, seq, crc, nseg,
        ) = struct.unpack_from("<4sBBqIIIB", content, pos)
        if version != 0:
            raise ValueError("unsupported Ogg version")
        lacing = content[pos + 27 : pos + 27 + nseg]
        body_len = sum(lacing)
        end = pos + 27 + nseg + body_len
        if end > len(content):
            raise ValueError("truncated Ogg page")
        page = bytearray(content[pos:end])
        struct.pack_into("<I", page, 22, 0)
        if ogg_crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        # split payload back into packet slices by the lacing values
        segs = []
        off = pos + 27 + nseg
        cur = bytearray()
        for lv in lacing:
            cur += content[off : off + lv]
            off += lv
            if lv < 255:
                segs.append((bytes(cur), True))
                cur = bytearray()
        if cur:
            segs.append((bytes(cur), False))  # continues on next page
        yield htype, granule, serial, seq, segs
        pos = end


def read_packets(content: bytes):
    """Reassemble full packets across pages -> (packets, last_granule,
    serial, n_pages)."""
    packets = []
    partial = b""
    last_granule = 0
    serial = None
    n_pages = 0
    for htype, granule, ser, _seq, segs in read_pages(content):
        n_pages += 1
        if serial is None:
            serial = ser
        elif ser != serial:
            raise NotImplementedError("multiplexed Ogg streams need a mux-aware reader")
        if not (htype & 1):
            partial = b""  # fresh page must not continue a packet
        for chunk, complete in segs:
            partial += chunk
            if complete:
                packets.append(partial)
                partial = b""
        if granule >= 0:
            last_granule = granule
    return packets, last_granule, serial, n_pages


def build_opus_head(channels: int, sample_rate: int, pre_skip: int = 312) -> bytes:
    return (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0)
    )


def build_vorbis_ident(channels: int, sample_rate: int) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<IB", 0, channels)
        + struct.pack("<Iiii", sample_rate, -1, 128000, -1)
        + bytes([0xB8, 1])  # blocksizes 2^8/2^11 + framing bit
    )


def probe(content: bytes) -> dict:
    """Codec/channels/rate/duration metadata from container structure
    alone — no payload decode."""
    packets, last_granule, serial, n_pages = read_packets(content)
    if not packets:
        raise ValueError("empty Ogg stream")
    ident = packets[0]
    if ident.startswith(b"OpusHead"):
        version, channels = ident[8], ident[9]
        pre_skip, input_rate = struct.unpack_from("<HI", ident, 10)
        # Opus granules tick at 48 kHz regardless of input rate
        dur = max(0, last_granule - pre_skip) / 48000.0
        return {
            "codec": "opus", "channels": channels,
            "sample_rate": input_rate, "duration_sec": dur,
            "pre_skip": pre_skip, "serial": serial,
            "n_pages": n_pages, "n_packets": len(packets),
        }
    if ident.startswith(b"\x01vorbis"):
        channels = ident[11]
        (rate,) = struct.unpack_from("<I", ident, 12)
        dur = last_granule / float(rate) if rate else 0.0
        return {
            "codec": "vorbis", "channels": channels,
            "sample_rate": rate, "duration_sec": dur,
            "pre_skip": 0, "serial": serial,
            "n_pages": n_pages, "n_packets": len(packets),
        }
    raise NotImplementedError(
        "Ogg stream with non-Vorbis/Opus first packet (e.g. FLAC-in-Ogg, "
        "Theora) — extend probe() or route to soundfile"
    )

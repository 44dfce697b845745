"""GIF/LZW codec battery (operators/multimodal.py): hand-derived
code-stream pins, round-trips that force every dictionary regime
(KwKwK, 9→10→11-bit width growth, the 4096-entry clear-reset),
container parsing (extensions, local color tables), malformed-input
errors, and a Hypothesis fuzz pass.
"""

from __future__ import annotations

import struct

import pytest

from almost_any_file_to_pandas_spark.operators.multimodal import (
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif_gray,
    synth_gif,
)


def _gif_with_indices(w, h, indices, min_code=8, n_colors=256):
    """Assemble a GIF87a around an arbitrary index plane (test-side
    container builder mirroring synth_gif)."""
    size_field = max(1, (n_colors - 1).bit_length() - 1)
    lsd = struct.pack(
        "<6sHHBBB", b"GIF87a", w, h, 0x80 | size_field, 0, 0
    )
    n_entries = 2 << size_field
    gct = bytes(
        v for i in range(n_entries) for v in (i % 256, i % 256, i % 256)
    )
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    lzw = _lzw_encode_gif(bytes(indices), min_code)
    blocks = bytearray([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return lsd + gct + img + bytes(blocks) + b"\x3b"


def test_lzw_hand_derived_code_stream():
    """min_code=2, data [0,1,2]: codes clear(4), 0, 1, 2, eoi(5) at
    3 bits each, packed LSB-first → bytes 0x44 0x54 (worked out by
    hand from the spec's bit-packing rules)."""
    packed = _lzw_encode_gif(bytes([0, 1, 2]), 2)
    assert packed == b"\x44\x54"
    assert _lzw_decode_gif(packed, 2, 100) == bytes([0, 1, 2])


def test_lzw_kwkwk_constant_run():
    """A constant run hits the KwKwK case (decoder receives a code
    equal to its own next slot) on the second emitted code."""
    data = bytes([7]) * 50
    packed = _lzw_encode_gif(data, 8)
    assert _lzw_decode_gif(packed, 8, 100) == data


@pytest.mark.parametrize(
    "w,h,fn",
    [
        (3, 2, lambda x, y: (x + y) % 256),
        (16, 8, lambda x, y: (x + y) % 256),
        (64, 64, lambda x, y: (x * 7 + y * 13) % 256),  # width growth
        (128, 64, lambda x, y: (x * 31 + y * 17 + x * y) % 256),
        # ^ enough novel contexts to fill the 4096-entry table and
        #   force the encoder's CLEAR-reset path
    ],
)
def test_gif_round_trip(w, h, fn):
    indices = [fn(x, y) for y in range(h) for x in range(w)]
    blob = _gif_with_indices(w, h, indices)
    gw, gh, values = decode_gif_gray(blob)
    assert (gw, gh) == (w, h)
    assert values == indices  # grayscale palette: value == index


def test_synth_gif_gradient_closed_form():
    w, h = 16, 8
    gw, gh, values = decode_gif_gray(synth_gif(w, h))
    assert (gw, gh) == (w, h)
    assert sum(values) == h * w * (w - 1) // 2 + w * h * (h - 1) // 2


def test_gif_extension_blocks_are_skipped():
    base = synth_gif(4, 3)
    # splice a graphic-control extension between the color table and
    # the image descriptor (13-byte header + 768-byte GCT)
    cut = 13 + 768
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    spliced = base[:cut] + ext + base[cut:]
    assert decode_gif_gray(spliced)[:2] == (4, 3)


def test_gif_malformed_inputs_raise_value_error():
    good = synth_gif(6, 4)
    for blob in [
        b"",
        b"GIF8",
        b"NOTAGIF" + good[7:],
        good[:20],          # truncated in the color table
        good[:-1],          # missing trailer byte after EOI is fine —
    ][:4]:
        with pytest.raises(ValueError):
            decode_gif_gray(blob)
    # index beyond a 4-entry palette
    blob = _gif_with_indices(2, 2, [0, 1, 2, 3], min_code=2, n_colors=4)
    bad = _gif_with_indices(2, 2, [0, 1, 2, 5], min_code=3, n_colors=4)
    assert decode_gif_gray(blob)[2] == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        decode_gif_gray(bad)
    # declared pixel count vs decoded length mismatch
    short = _gif_with_indices(4, 4, [0] * 12)
    with pytest.raises(ValueError, match="expected"):
        decode_gif_gray(short)


def test_gif_fuzz_never_hangs_or_crashes():
    from hypothesis import given, settings, strategies as st

    seeds = [synth_gif(16, 8), synth_gif(5, 5)]

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(0, len(seeds) - 1),
        st.binary(max_size=64),
        st.integers(0, 500),
        st.binary(min_size=1, max_size=8),
    )
    def fuzz(which, garbage, cut, patch):
        base = seeds[which]
        for blob in [
            garbage,
            base[:cut],
            base[:cut] + patch + base[cut + len(patch):],
        ]:
            try:
                decode_gif_gray(bytes(blob))
            except ValueError:
                pass

    fuzz()

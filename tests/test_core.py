"""Unit tests for the entropy-coding primitives (framework analog of
libavcodec/tests/rangecoder.c and tests/golomb.c)."""
import numpy as np
import pytest

from tpu_ffv1.core.rac import (RangeDecoder, RangeEncoder, build_rac_states,
                               carry_resolve, default_state_tables)
from tpu_ffv1.core.golomb import (BitReader, BitWriter, get_sr_golomb,
                                  get_ur_golomb, set_sr_golomb, set_ur_golomb)
from tpu_ffv1.core.crc import crc32_ieee
from tpu_ffv1.core.intmath import fold, mid_pred, av_log2
from tpu_ffv1.bitstream.symbols import get_symbol, put_symbol


def test_rac_state_tables_shape():
    one, zero = build_rac_states()
    assert one[0] == 0 and zero[0] == 0
    # states stay within [1, 255] on the active probability range
    assert all(1 <= one[i] <= 255 for i in range(256 - 248, 249))
    # zero/one symmetry (rangecoder.c:99-100)
    for i in range(1, 255):
        assert int(zero[i]) == (256 - int(one[256 - i])) % 256


def test_rac_roundtrip_10240_bits():
    """Range-coder self-test shape (libavcodec/tests/rangecoder.c:29-63):
    seeded random bits through one adaptive state, re-decoded exactly."""
    rng = np.random.RandomState(1)
    bits = rng.randint(0, 2, 10240)
    enc = RangeEncoder()
    st = np.array([128], dtype=np.uint8)
    for b in bits:
        enc.put_rac(st, 0, int(b))
    data = enc.terminate()
    dec = RangeDecoder(data)
    st = np.array([128], dtype=np.uint8)
    out = [dec.get_rac(st, 0) for _ in range(10240)]
    assert list(bits) == out


def test_rac_multi_context_roundtrip():
    rng = np.random.RandomState(7)
    n = 5000
    ctxs = rng.randint(0, 32, n)
    bits = rng.randint(0, 2, n)
    enc = RangeEncoder()
    st = np.full(32, 128, dtype=np.uint8)
    for c, b in zip(ctxs, bits):
        enc.put_rac(st, int(c), int(b))
    data = enc.terminate()
    dec = RangeDecoder(data)
    st = np.full(32, 128, dtype=np.uint8)
    for c, b in zip(ctxs, bits):
        assert dec.get_rac(st, int(c)) == b


def test_symbol_roundtrip():
    rng = np.random.RandomState(3)
    vals = list(rng.randint(-100000, 100000, 500)) + \
        [0, 1, -1, 255, -255, 65535, -65535, 1 << 20]
    enc = RangeEncoder()
    st = np.full(32, 128, dtype=np.uint8)
    for v in vals:
        put_symbol(enc, st, int(v), True)
    data = enc.terminate()
    dec = RangeDecoder(data)
    st = np.full(32, 128, dtype=np.uint8)
    for v in vals:
        assert get_symbol(dec, st, True) == v


def test_symbol_unsigned_roundtrip():
    vals = [0, 1, 2, 127, 128, 1000, 123456]
    enc = RangeEncoder()
    st = np.full(32, 128, dtype=np.uint8)
    for v in vals:
        put_symbol(enc, st, v, False)
    data = enc.terminate()
    dec = RangeDecoder(data)
    st = np.full(32, 128, dtype=np.uint8)
    for v in vals:
        assert get_symbol(dec, st, False) == v


def test_carry_resolve_matches_outstanding():
    """The provisional-byte formulation must emit the same bytes as the
    outstanding-byte encoder (basis of the TPU scan kernel)."""
    rng = np.random.RandomState(11)
    bits = rng.randint(0, 2, 4096)
    # run the outstanding-byte encoder and capture provisional stream
    enc = RangeEncoder()
    prov = []
    orig_renorm = enc._renorm

    def renorm_with_capture():
        while enc.range < 0x100:
            prov.append(enc.low >> 8)
            enc.low = (enc.low & 0xFF) << 8
            enc.range <<= 8
    # re-run separately: one encoder with capture-only renorm semantics
    enc2 = RangeEncoder()
    st = np.array([200], dtype=np.uint8)
    st2 = np.array([200], dtype=np.uint8)
    for b in bits:
        enc.put_rac(st, 0, int(b))
    data = enc.terminate()

    def put_rac_prov(states, i, bit):
        s = int(states[i])
        range1 = (enc2.range * s) >> 8
        if not bit:
            enc2.range -= range1
            states[i] = enc2.zero_state[s]
        else:
            enc2.low += enc2.range - range1
            enc2.range = range1
            states[i] = enc2.one_state[s]
        while enc2.range < 0x100:
            prov.append(enc2.low >> 8)
            enc2.low = (enc2.low & 0xFF) << 8
            enc2.range <<= 8

    for b in bits:
        put_rac_prov(st2, 0, int(b))
    # terminate in provisional form
    enc2.range = 0xFF
    enc2.low += 0xFF
    while enc2.range < 0x100:
        prov.append(enc2.low >> 8)
        enc2.low = (enc2.low & 0xFF) << 8
        enc2.range <<= 8
    enc2.range = 0xFF
    while enc2.range < 0x100:
        prov.append(enc2.low >> 8)
        enc2.low = (enc2.low & 0xFF) << 8
        enc2.range <<= 8
    resolved = carry_resolve(np.array(prov))
    # final provisional byte is held back (never flushed by terminate)
    assert bytes(resolved[:-1]) == data


@pytest.mark.parametrize("k", [0, 1, 2, 5, 8])
def test_golomb_roundtrip(k):
    rng = np.random.RandomState(5)
    vals = [int(v) for v in rng.randint(0, 4000, 200)] + [0, 1, 4094]
    pb = BitWriter()
    for v in vals:
        set_ur_golomb(pb, v, k, 12, 12)
    data = pb.flush()
    gb = BitReader(data)
    for v in vals:
        assert get_ur_golomb(gb, k, 12, 12) == v


def test_signed_golomb_roundtrip():
    vals = [0, 1, -1, 5, -5, 100, -100, 2000, -2000]
    for k in (0, 2, 4):
        pb = BitWriter()
        for v in vals:
            set_sr_golomb(pb, v, k, 12, 12)
        gb = BitReader(pb.flush())
        for v in vals:
            assert get_sr_golomb(gb, k, 12, 12) == v


def test_crc32_append_property():
    """Appending WL32(crc) makes the stream CRC zero (ffv1dec.c:609-618)."""
    data = bytes(range(256)) * 3 + b"hello ffv1"
    crc = crc32_ieee(data)
    assert crc32_ieee(data + int(crc).to_bytes(4, "little")) == 0
    # trailing zero bytes are CRC-neutral (AVI strf padding relies on it)
    assert crc32_ieee(data + int(crc).to_bytes(4, "little") + b"\x00") == 0


def test_intmath():
    assert av_log2(1) == 0 and av_log2(255) == 7 and av_log2(256) == 8
    assert mid_pred(1, 5, 3) == 3
    assert mid_pred(9, 2, 5) == 5
    assert fold(255, 8) == -1
    assert fold(-129, 8) == 127
    assert fold(1 << 15, 16) == -(1 << 15)

"""Minimal FLAC *encoder* used only to generate decoder test fixtures.

Supports constant/verbatim/fixed-predictor subframes with single-partition
Rice residuals — enough to exercise every structural element of the
decoder (bit reader, UTF-8 frame numbers, subframe headers, rice coding,
zigzag, warm-up samples, multi-frame streams, stereo). CRC fields are
written as zeros (the decoder parses but does not verify them).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(bw: BitWriter, n: int):
    if n < 0x80:
        bw.write(n, 8)
    elif n < 0x800:
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)
    else:
        bw.write(0xE0 | (n >> 12), 8)
        bw.write(0x80 | ((n >> 6) & 0x3F), 8)
        bw.write(0x80 | (n & 0x3F), 8)


FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _rice_encode(bw: BitWriter, residuals: Sequence[int], order: int):
    """Single-partition (partition order 0) 4-bit Rice coding."""
    bw.write(0, 2)  # method: rice 4-bit
    bw.write(0, 4)  # partition order 0
    # zigzag
    zz = [(-2 * e - 1) if e < 0 else (2 * e) for e in residuals]
    mean = max(1, int(np.mean(zz)) if zz else 1)
    param = min(14, max(0, int(np.log2(mean + 1))))
    bw.write(param, 4)
    for u in zz:
        q = u >> param
        assert q < (1 << 20), "residuals too large for chosen rice param"
        bw.write_unary(q)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _encode_subframe(bw: BitWriter, samples: np.ndarray, bps: int,
                     mode: str, order: int = 2):
    bw.write(0, 1)  # pad
    if mode == "constant":
        assert (samples == samples[0]).all()
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(samples[0]), bps)
    elif mode == "verbatim":
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(int(s), bps)
    elif mode == "lpc":
        # order-2 LPC with fixed coefficients/shift (tests the decoder's
        # quantized-coefficient prediction path)
        order2 = 2
        shift = 12
        coeffs = [int(1.9 * (1 << shift)), int(-0.92 * (1 << shift))]
        precision = 15
        bw.write(0b100000 | (order2 - 1), 6)
        bw.write(0, 1)
        for s0 in samples[:order2]:
            bw.write_signed(int(s0), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coeffs:
            bw.write_signed(c, precision)
        sv = samples.astype(np.int64)
        resid = []
        for i in range(order2, len(sv)):
            acc = sum(int(c) * int(sv[i - 1 - j]) for j, c in enumerate(coeffs))
            resid.append(int(sv[i] - (acc >> shift)))
        _rice_encode(bw, resid, order2)
    elif mode == "fixed":
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(int(s), bps)
        coeffs = FIXED_COEFFS[order]
        resid = []
        s = samples.astype(np.int64)
        for i in range(order, len(s)):
            pred = sum(c * s[i - 1 - j] for j, c in enumerate(coeffs))
            resid.append(int(s[i] - pred))
        _rice_encode(bw, resid, order)
    else:
        raise ValueError(mode)


def encode_flac(
    channels: List[np.ndarray],  # int16-range int arrays, same length
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    mode: str = "verbatim",
    order: int = 2,
) -> bytes:
    n = len(channels[0])
    n_ch = len(channels)
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)  # min block
    si.write(block_size, 16)  # max block
    si.write(0, 24)  # min frame size (unknown)
    si.write(0, 24)  # max frame size
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 zeros
    body = si.data()
    out.append(0x80)  # last-block | type 0
    out += len(body).to_bytes(3, "big")
    out += body

    frame_idx = 0
    pos = 0
    while pos < n:
        cur = min(block_size, n - pos)
        bw = BitWriter()
        bw.write(0x3FFE, 14)  # sync
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(0b0111, 4)  # block size: 16-bit value - 1 follows
        bw.write(0b0000, 4)  # sample rate: from STREAMINFO
        bw.write(n_ch - 1, 4)  # independent channels
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw.write(0, 1)  # reserved
        _utf8_number(bw, frame_idx)
        bw.write(cur - 1, 16)
        bw.write(0, 8)  # CRC-8 (not verified by our decoder)
        for ch in channels:
            _encode_subframe(bw, np.asarray(ch[pos : pos + cur]), bps, mode,
                             order)
        bw.align()
        bw.write(0, 16)  # CRC-16 (not verified)
        out += bw.data()
        pos += cur
        frame_idx += 1
    return bytes(out)

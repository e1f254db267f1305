"""Minimal FLAC encoder (test helper) — exercises the native decoder.

Writes spec-conformant FLAC bitstreams with full control over subframe types
(CONSTANT / VERBATIM / FIXED 0-4 / LPC), rice partition orders and stereo
modes (independent / mid-side), so the decoder's paths can be validated
without any third-party FLAC tooling in the image.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int):
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def align(self):
        if self._nbits:
            self.write(0, 8 - self._nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_encode(bw: BitWriter, values, k: int):
    for v in values:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q, r = u >> k, u & ((1 << k) - 1)
        bw.write(0, q)  # q zeros
        bw.write(1, 1)
        if k:
            bw.write(r, k)


def _best_k(res) -> int:
    mean = float(np.mean(np.abs(np.asarray(res, dtype=np.float64)))) if len(res) else 0.0
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def _write_residual(bw: BitWriter, res, order: int, blocksize: int, partition_order: int = 0):
    bw.write(0, 2)  # rice method 0 (4-bit params)
    bw.write(partition_order, 4)
    partitions = 1 << partition_order
    idx = 0
    for p in range(partitions):
        count = blocksize >> partition_order
        if p == 0:
            count -= order
        part = res[idx : idx + count]
        idx += count
        k = _best_k(part)
        bw.write(k, 4)
        _rice_encode(bw, part, k)


def _write_subframe(bw: BitWriter, x, bps: int, kind: str, blocksize: int, partition_order: int = 0):
    bw.write(0, 1)  # pad
    x = np.asarray(x, dtype=np.int64)
    if kind == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        coeffs = _FIXED[order]
        res = [
            int(x[i]) - sum(c * int(x[i - 1 - j]) for j, c in enumerate(coeffs))
            for i in range(order, len(x))
        ]
        _write_residual(bw, res, order, blocksize, partition_order)
    elif kind == "lpc":
        order = 2
        coefs = [3, -1]  # x[i] ~ (3*x[i-1] - 1*x[i-2]) >> shift
        precision, shift = 12, 1
        bw.write(32 + (order - 1), 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = [
            int(x[i]) - ((sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))) >> shift)
            for i in range(order, len(x))
        ]
        _write_residual(bw, res, order, blocksize, partition_order)
    else:
        raise ValueError(kind)


def write_flac(
    path: str,
    samples: np.ndarray,  # (channels, n) int16-range ints
    sample_rate: int = 16000,
    blocksize: int = 1024,
    kind: str = "fixed2",
    stereo_mode: str = "independent",
    partition_order: int = 0,
):
    samples = np.asarray(samples, dtype=np.int64)
    channels, n = samples.shape
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last block)
    info = BitWriter()
    info.write(blocksize, 16)
    info.write(blocksize, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    info_bytes = bytes(info.bytes) + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(info_bytes).to_bytes(3, "big") + info_bytes

    frame_no = 0
    for start in range(0, n, blocksize):
        block = samples[:, start : start + blocksize]
        bs = block.shape[1]
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        hdr.write(7, 4)  # blocksize: 16-bit at end of header
        hdr.write(0, 4)  # sample rate: streaminfo
        if stereo_mode == "mid_side" and channels == 2:
            hdr.write(10, 4)
        else:
            hdr.write(channels - 1, 4)
        hdr.write(4, 3)  # 16 bps
        hdr.write(0, 1)  # reserved
        assert frame_no < 128
        hdr.write(frame_no, 8)  # utf8 single byte
        hdr.write(bs - 1, 16)
        header_bytes = bytes(hdr.bytes)
        assert hdr._nbits == 0

        body = BitWriter()
        if stereo_mode == "mid_side" and channels == 2:
            l, r = block[0], block[1]
            mid = (l + r) >> 1
            side = l - r
            _write_subframe(body, mid, bps, kind, bs, partition_order)
            _write_subframe(body, side, bps + 1, kind, bs, partition_order)
        else:
            for c in range(channels):
                _write_subframe(body, block[c], bps, kind, bs, partition_order)
        body.align()

        frame = header_bytes + bytes([_crc8(header_bytes)]) + bytes(body.bytes)
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1

    with open(path, "wb") as f:
        f.write(bytes(out))

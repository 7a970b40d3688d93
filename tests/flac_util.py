"""Minimal FLAC *encoder* for tests.

The image ships no flac/ffmpeg/libsndfile, so conformant FLAC files for
decoder tests are synthesized here from the spec: STREAMINFO + frames with
CONSTANT / VERBATIM / FIXED(2) / LPC(1) subframes, partitioned Rice
residuals (with optional escape partitions), wasted bits, and the
left/side, right/side, mid/side stereo modes. CRC-8/CRC-16 are written
correctly so the files are also valid input for external decoders.

Test-only helper — the framework itself only *decodes* FLAC
(turkish_asr_tpu/audio/flacio.py, native/src/asr_native.cpp).
"""

import numpy as np


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value, n):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self):
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(n):
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_follow = 1
    while bits > 6 * n_follow + (6 - n_follow):
        n_follow += 1
    head_bits = 6 - n_follow
    out.append((0xFF << (head_bits + 1)) & 0xFF | (n >> (6 * n_follow)))
    for i in range(n_follow - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_param(resid):
    u = [(v << 1) ^ (v >> 63) for v in (int(x) for x in resid)]
    mean = (sum(u) / max(len(u), 1)) if u else 0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def _write_rice(bw, resid, k):
    for v in resid:
        v = int(v)
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        bw.write_unary(u >> k)
        if k:
            bw.write(u, k)


def _write_residual(bw, resid, order, block_size, part_order=0,
                    force_escape=False, escape_bits=17):
    bw.write(0, 2)            # rice method 0 (4-bit params)
    bw.write(part_order, 4)
    n_parts = 1 << part_order
    per = block_size // n_parts
    start = 0
    for p in range(n_parts):
        n = per - (order if p == 0 else 0)
        part = resid[start:start + n]
        start += n
        if force_escape:
            bw.write(0xF, 4)  # escape
            bw.write(escape_bits, 5)
            for v in part:
                bw.write_signed(int(v), escape_bits)
        else:
            k = _rice_param(part)
            bw.write(k, 4)
            _write_rice(bw, part, k)


def _write_subframe(bw, samples, bps, kind, part_order=0,
                    force_escape=False, wasted=0):
    samples = [int(s) for s in samples]
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps = bps - wasted
    bw.write(0, 1)  # sync
    if kind == "constant":
        assert all(s == samples[0] for s in samples)
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind == "fixed2":
        bw.write(8 + 2, 6)
    elif kind == "lpc1":
        bw.write(32 + 1 - 1, 6)  # LPC order 1 -> type 100000
    else:
        raise ValueError(kind)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)  # unary count: wasted = zeros + 1
    else:
        bw.write(0, 1)

    n = len(samples)
    if kind == "constant":
        bw.write_signed(samples[0], bps)
    elif kind == "verbatim":
        for s in samples:
            bw.write_signed(s, bps)
    elif kind == "fixed2":
        order = 2
        for s in samples[:order]:
            bw.write_signed(s, bps)
        resid = [samples[i] - 2 * samples[i - 1] + samples[i - 2]
                 for i in range(order, n)]
        _write_residual(bw, resid, order, n, part_order, force_escape)
    elif kind == "lpc1":
        order, precision, shift = 1, 12, 10
        coef = int(round(0.9 * (1 << shift)))  # ~0.9 * x[i-1]
        bw.write_signed(samples[0], bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        bw.write_signed(coef, precision)
        resid = [samples[i] - ((coef * samples[i - 1]) >> shift)
                 for i in range(order, n)]
        _write_residual(bw, resid, order, n, part_order, force_escape)


def encode_flac(pcm, sample_rate, bps=16, block_size=4096,
                subframe_kinds=None, stereo_modes=None,
                part_order=0, force_escape=False, wasted=0):
    """Encode int PCM (channels, samples) -> FLAC bytes.

    subframe_kinds: per-frame cycle of "constant"|"verbatim"|"fixed2"|
    "lpc1" (default fixed2). stereo_modes: per-frame cycle of
    "independent"|"ls"|"rs"|"ms" for 2-channel input.
    """
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[None, :]
    n_ch, total = pcm.shape
    kinds = subframe_kinds or ["fixed2"]
    modes = stereo_modes or ["independent"]

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si_body = si.getvalue() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_body).to_bytes(3, "big") + si_body

    frame_idx = 0
    for start in range(0, total, block_size):
        block = pcm[:, start:start + block_size]
        n = block.shape[1]
        kind = kinds[frame_idx % len(kinds)]
        mode = modes[frame_idx % len(modes)] if n_ch == 2 else "independent"
        if kind == "constant":
            block = np.repeat(block[:, :1], n, axis=1)

        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)   # reserved
        hdr.write(0, 1)   # fixed blocking
        hdr.write(7, 4)   # block size: 16-bit value - 1 follows
        hdr.write(0, 4)   # sample rate: from STREAMINFO
        ch_code = {"independent": n_ch - 1, "ls": 8, "rs": 9, "ms": 10}[mode]
        hdr.write(ch_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        hdr.write(ss_code, 3)
        hdr.write(0, 1)   # reserved
        header = hdr.getvalue() + _utf8_number(frame_idx)
        header += (n - 1).to_bytes(2, "big")
        header += bytes([crc8(header)])

        bw = BitWriter()
        if mode == "independent":
            for c in range(n_ch):
                _write_subframe(bw, block[c], bps, kind, part_order,
                                force_escape, wasted)
        else:
            left, right = block[0], block[1]
            side = left - right
            if mode == "ls":
                _write_subframe(bw, left, bps, kind, part_order, force_escape)
                _write_subframe(bw, side, bps + 1, kind, part_order,
                                force_escape)
            elif mode == "rs":
                _write_subframe(bw, side, bps + 1, kind, part_order,
                                force_escape)
                _write_subframe(bw, right, bps, kind, part_order,
                                force_escape)
            else:  # ms
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bps, kind, part_order, force_escape)
                _write_subframe(bw, side, bps + 1, kind, part_order,
                                force_escape)
        bw.align()
        frame = header + bw.getvalue()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        frame_idx += 1

    return bytes(out)

"""Baseline-JPEG decode tier (operators/multimodal.py::_jpeg_gray_pixels):
inputs are synthesized in-test by a minimal baseline SOF0 ENCODER
(standard Annex-K quantization + Huffman tables, FDCT via the same
orthonormal basis, byte stuffing, optional restart markers), so the
round-trip asserts real Huffman/DCT decoding against known pixels with
no codec library anywhere."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from power_generation_etl_spark.operators.multimodal import (
    _decode_image,
    _gray_image,
    _jpeg_gray_pixels,
    _jpeg_idct_basis,
)

# --- JPEG Annex K tables -----------------------------------------------------

_QY = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=float)

_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=float)

# (bits[16], values) — standard tables, JPEG Annex K.3
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           bytes(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           bytes(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _enc_table(bits, vals):
    """symbol -> (length, code), canonical Annex-C assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s
        return bytes(self.out)


def _category(v):
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _encode_block(w, block, q, dct, pred, dc_tab, ac_tab):
    coef = dct @ (block - 128.0) @ dct.T
    qz = np.round(coef / q).astype(int)
    zz = [int(qz.flat[_ZZ[i]]) for i in range(64)]
    diff = zz[0] - pred
    t = _category(diff)
    length, code = dc_tab[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tab[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_tab[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = ac_tab[0x00]  # EOB
        w.write(code, length)
    return zz[0]


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt(tq, q):
    zz = bytes(int(q.flat[_ZZ[i]]) for i in range(64))
    return _seg(0xDB, bytes([tq]) + zz)


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)


def _pad_to(img, mh, mw):
    h, w = img.shape[:2]
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    return np.pad(img, [(0, ph - h), (0, pw - w)] + [(0, 0)] * (img.ndim - 2),
                  mode="edge")


def encode_gray_jpeg(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """Minimal baseline grayscale JPEG (1 component, 8-bit, Annex-K
    luminance tables), optional restart markers."""
    h, w = img.shape
    padded = _pad_to(img.astype(float), 8, 8)
    dct = _jpeg_idct_basis()  # orthonormal: forward = C x C^T
    dc_tab, ac_tab = _enc_table(*_DC_LUM), _enc_table(*_AC_LUM)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QY)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, *_DC_LUM)
    out += _dht(1, 0, *_AC_LUM)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred, mcu, rst = 0, 0, 0
    for r0 in range(0, padded.shape[0], 8):
        for c0 in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                pred = 0
            pred = _encode_block(
                bw, padded[r0 : r0 + 8, c0 : c0 + 8], _QY, dct, pred,
                dc_tab, ac_tab,
            )
            mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_color_jpeg_420(rgb: np.ndarray) -> bytes:
    """Baseline 4:2:0 YCbCr JPEG (Y h2v2, Cb/Cr h1v1, Annex-K tables)."""
    h, w = rgb.shape[:2]
    rgbf = _pad_to(rgb.astype(float), 16, 16)
    r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # 2x2 mean downsample for chroma
    cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    dct = _jpeg_idct_basis()
    dcl, acl = _enc_table(*_DC_LUM), _enc_table(*_AC_LUM)
    dcc, acc = _enc_table(*_DC_CHR), _enc_table(*_AC_CHR)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QY) + _dqt(1, _QC)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _dht(0, 0, *_DC_LUM) + _dht(1, 0, *_AC_LUM)
    out += _dht(0, 1, *_DC_CHR) + _dht(1, 1, *_AC_CHR)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(rgbf.shape[0] // 16):
        for mx in range(rgbf.shape[1] // 16):
            for by in range(2):
                for bx in range(2):
                    r0, c0 = my * 16 + by * 8, mx * 16 + bx * 8
                    preds[0] = _encode_block(
                        bw, y[r0 : r0 + 8, c0 : c0 + 8], _QY, dct, preds[0],
                        dcl, acl,
                    )
            r0, c0 = my * 8, mx * 8
            preds[1] = _encode_block(
                bw, cb[r0 : r0 + 8, c0 : c0 + 8], _QC, dct, preds[1], dcc, acc
            )
            preds[2] = _encode_block(
                bw, cr[r0 : r0 + 8, c0 : c0 + 8], _QC, dct, preds[2], dcc, acc
            )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _quantized_blocks(img):
    """Raster-order list of zigzag-ordered quantized coefficient lists
    (the shared input of every progressive scan)."""
    padded = _pad_to(img.astype(float), 8, 8)
    dct = _jpeg_idct_basis()
    blocks = []
    for r0 in range(0, padded.shape[0], 8):
        for c0 in range(0, padded.shape[1], 8):
            coef = dct @ (padded[r0 : r0 + 8, c0 : c0 + 8] - 128.0) @ dct.T
            qz = np.round(coef / _QY).astype(int)
            blocks.append([int(qz.flat[_ZZ[i]]) for i in range(64)])
    return blocks


def _mshift(v, al):
    """JPEG point transform for AC: magnitude shift, sign kept."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgScanWriter:
    """One AC scan's EOB-run + correction-bit buffering (libjpeg's
    emit_eobrun / BR-buffer structure)."""

    def __init__(self, bw, ac_tab):
        self.bw, self.ac = bw, ac_tab
        self.eobrun, self.br = 0, []

    def flush_eobrun(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            length, code = self.ac[nbits << 4]
            self.bw.write(code, length)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.br:
            self.bw.write(b, 1)
        self.br = []


# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the
# standard BASELINE Annex-K table does not contain — real progressive
# encoders ship custom DHTs. The test encoder uses a flat table: every
# 8-bit symbol as a 9-bit canonical code (valid: 256 < 2^9 code space),
# which also exercises the decoder on longer-than-baseline codes.
_AC_PROG = ([0] * 8 + [255, 1] + [0] * 6, bytes(range(256)))


def encode_gray_progressive(img, scans=None):
    """Minimal progressive (SOF2) grayscale JPEG with the libjpeg-style
    default scan script: DC first at Al=1, AC bands at Al=2, two AC
    refinement passes, DC refinement. AC scans use a custom flat
    Huffman table (like real progressive encoders, which always ship
    scan-specific DHTs with EOBn symbols)."""
    if scans is None:
        scans = [
            (0, 0, 0, 1),
            (1, 5, 0, 2),
            (6, 63, 0, 2),
            (1, 63, 2, 1),
            (1, 63, 1, 0),
            (0, 0, 1, 0),
        ]
    h, w = img.shape
    blocks = _quantized_blocks(img)
    dc_tab, ac_tab = _enc_table(*_DC_LUM), _enc_table(*_AC_PROG)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QY)
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, *_DC_LUM)
    out += _dht(1, 0, *_AC_PROG)
    for ss, se, ah, al in scans:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        bw = _BitWriter()
        if ss == 0 and ah == 0:  # DC first: diffs of (dc >> al), floor shift
            pred = 0
            for blk in blocks:
                v = blk[0] >> al
                diff = v - pred
                pred = v
                t = _category(diff)
                length, code = dc_tab[t]
                bw.write(code, length)
                if t:
                    bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        elif ss == 0:  # DC refinement: one bit per block
            for blk in blocks:
                bw.write((blk[0] >> al) & 1, 1)
        elif ah == 0:  # AC first pass over the band
            ps = _ProgScanWriter(bw, ac_tab)
            for blk in blocks:
                shifted = [_mshift(blk[k], al) for k in range(ss, se + 1)]
                if not any(shifted):
                    ps.eobrun += 1
                    if ps.eobrun == 0x7FFF:
                        ps.flush_eobrun()
                    continue
                ps.flush_eobrun()
                r = 0
                last_nz = max(i for i, v in enumerate(shifted) if v)
                for i, v in enumerate(shifted):
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        length, code = ac_tab[0xF0]
                        bw.write(code, length)
                        r -= 16
                    s = _category(v)
                    length, code = ac_tab[(r << 4) | s]
                    bw.write(code, length)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    r = 0
                    if i == last_nz:
                        break
                if last_nz < len(shifted) - 1:
                    ps.eobrun += 1
            ps.flush_eobrun()
        else:  # AC refinement (Ah = Al + 1), libjpeg encode_mcu_AC_refine
            ps = _ProgScanWriter(bw, ac_tab)
            for blk in blocks:
                absv = [abs(blk[k]) >> al for k in range(ss, se + 1)]
                signs = [blk[k] > 0 for k in range(ss, se + 1)]
                newly = [i for i, a in enumerate(absv) if a == 1]
                last_new = newly[-1] if newly else -1
                r, br = 0, []
                for i, a in enumerate(absv):
                    if a == 0:
                        r += 1
                        continue
                    # ZRL flush happens at EVERY nonzero (history or
                    # new) while >15 zeros are pending, but only up to
                    # the last newly-visible coef — beyond it the tail
                    # folds into the EOB run.
                    while r > 15 and i <= last_new:
                        ps.flush_eobrun()
                        length, code = ac_tab[0xF0]
                        bw.write(code, length)
                        r -= 16
                        for b in br:
                            bw.write(b, 1)
                        br = []
                    if a > 1:  # history coefficient: buffer correction bit
                        br.append(a & 1)
                        continue
                    # newly visible ±1 at this Al
                    ps.flush_eobrun()
                    length, code = ac_tab[(r << 4) | 1]
                    bw.write(code, length)
                    bw.write(1 if signs[i] else 0, 1)
                    for b in br:
                        bw.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    ps.eobrun += 1
                    ps.br.extend(br)
                    if ps.eobrun == 0x7FFF:
                        ps.flush_eobrun()
            ps.flush_eobrun()
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_color_progressive_420(rgb):
    """Progressive 4:2:0 color JPEG: one INTERLEAVED DC scan (Al=1),
    per-component non-interleaved AC band scans, one interleaved DC
    refinement — exercises the decoder's interleaved-progressive path
    AND non-interleaved scans over a subsampled component's REAL block
    grid (smaller than the MCU-padded allocation)."""
    h, w = rgb.shape[:2]
    rgbf = _pad_to(rgb.astype(float), 16, 16)
    r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    dct = _jpeg_idct_basis()

    def qblocks(plane, q):
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        out = {}
        for by in range(bh):
            for bx in range(bw):
                coef = dct @ (plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ dct.T
                qz = np.round(coef / q).astype(int)
                out[(by, bx)] = [int(qz.flat[_ZZ[i]]) for i in range(64)]
        return out, bh, bw

    yb, ybh, ybw = qblocks(y, _QY)
    cbb, cbh, cbw = qblocks(cb, _QC)
    crb, _, _ = qblocks(cr, _QC)
    mcus_y, mcus_x = ybh // 2, ybw // 2
    dcl = _enc_table(*_DC_LUM)
    dcc = _enc_table(*_DC_CHR)
    acp = _enc_table(*_AC_PROG)
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QY) + _dqt(1, _QC)
    out += _seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _dht(0, 0, *_DC_LUM) + _dht(0, 1, *_DC_CHR)
    out += _dht(1, 0, *_AC_PROG) + _dht(1, 1, *_AC_PROG)

    def dc_emit(bw_, tab, v, pred, al):
        diff = (v >> al) - pred
        t = _category(diff)
        length, code = tab[t]
        bw_.write(code, length)
        if t:
            bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return v >> al

    # scan 1: interleaved DC first, Al=1
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x01]))
    bw_ = _BitWriter()
    preds = {0: 0, 1: 0, 2: 0}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(2):
                for bx in range(2):
                    preds[0] = dc_emit(bw_, dcl, yb[(my * 2 + by, mx * 2 + bx)][0], preds[0], 1)
            preds[1] = dc_emit(bw_, dcc, cbb[(my, mx)][0], preds[1], 1)
            preds[2] = dc_emit(bw_, dcc, crb[(my, mx)][0], preds[2], 1)
    out += bw_.flush()

    # scans 2-4: per-component AC 1..63 first pass at Al=0, over the
    # REAL (unpadded-to-MCU) block grid of each component
    def ac_scan(cid, blocks, real_bh, real_bw):
        nonlocal out
        out += _seg(0xDA, bytes([1, cid, (0 << 4) | (0 if cid == 1 else 1), 1, 63, 0]))
        w2 = _BitWriter()
        ps = _ProgScanWriter(w2, acp)
        for m in range(real_bh * real_bw):
            by, bx = divmod(m, real_bw)
            blk = blocks[(by, bx)]
            shifted = blk[1:64]
            if not any(shifted):
                ps.eobrun += 1
                continue
            ps.flush_eobrun()
            rr = 0
            last_nz = max(i for i, v in enumerate(shifted) if v)
            for i, v in enumerate(shifted):
                if v == 0:
                    rr += 1
                    continue
                while rr > 15:
                    length, code = acp[0xF0]
                    w2.write(code, length)
                    rr -= 16
                t = _category(v)
                length, code = acp[(rr << 4) | t]
                w2.write(code, length)
                w2.write(v if v >= 0 else v + (1 << t) - 1, t)
                rr = 0
                if i == last_nz:
                    break
            if last_nz < len(shifted) - 1:
                ps.eobrun += 1
        ps.flush_eobrun()
        out += w2.flush()

    ac_scan(1, yb, -(-h // 8), -(-w // 8))  # Y real grid (2x sampling: comp dims = image dims)
    ac_scan(2, cbb, -(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8))
    ac_scan(3, crb, -(-(-(-h // 2)) // 8), -(-(-(-w // 2)) // 8))

    # scan 5: interleaved DC refinement (Ah=1, Al=0)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x10]))
    w3 = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(2):
                for bx in range(2):
                    w3.write(yb[(my * 2 + by, mx * 2 + bx)][0] & 1, 1)
            w3.write(cbb[(my, mx)][0] & 1, 1)
            w3.write(crb[(my, mx)][0] & 1, 1)
    out += w3.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _test_image(h=40, w=56):
    """Gradient + sinusoid — NOT flat (flat images hide decode bugs:
    every coefficient but DC quantizes to zero)."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = 96 + 64 * np.sin(xx / 5.0) + 1.5 * yy + 0.8 * xx
    return np.clip(img, 0, 255)


class TestJpegRoundTrip:
    def test_grayscale(self):
        img = _test_image()
        got = _jpeg_gray_pixels(encode_gray_jpeg(img))
        assert got is not None and got.shape == img.shape
        assert _psnr(img, got) > 30, _psnr(img, got)

    def test_grayscale_non_mcu_aligned(self):
        img = _test_image(h=33, w=41)  # forces edge-padded partial MCUs
        got = _jpeg_gray_pixels(encode_gray_jpeg(img))
        assert got is not None and got.shape == img.shape
        assert _psnr(img, got) > 30

    def test_restart_markers(self):
        img = _test_image(h=32, w=64)
        plain = _jpeg_gray_pixels(encode_gray_jpeg(img))
        rst = _jpeg_gray_pixels(encode_gray_jpeg(img, restart_interval=2))
        assert rst is not None
        # same quantized data, different framing: bit-identical decode
        assert np.array_equal(plain, rst)

    def test_color_420_luma(self):
        rgb = np.stack(
            [_test_image(48, 48), _test_image(48, 48)[::-1], 128 + 0 * _test_image(48, 48)],
            axis=-1,
        )
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        got = _jpeg_gray_pixels(encode_color_jpeg_420(rgb))
        assert got is not None and got.shape == y.shape
        assert _psnr(y, got) > 28, _psnr(y, got)


class TestJpegProgressive:
    """Progressive (SOF2) decode: every scan script must reconstruct
    EXACTLY the same pixels as the baseline encoding of the same
    quantized coefficients — spectral selection and successive
    approximation are a transmission reordering, not a different
    image."""

    def test_default_scan_script_matches_baseline(self):
        img = _test_image()
        base = _jpeg_gray_pixels(encode_gray_jpeg(img))
        prog = _jpeg_gray_pixels(encode_gray_progressive(img))
        assert prog is not None
        assert np.array_equal(base, prog)

    def test_spectral_selection_only(self):
        img = _test_image(48, 40)
        base = _jpeg_gray_pixels(encode_gray_jpeg(img))
        prog = _jpeg_gray_pixels(
            encode_gray_progressive(
                img, scans=[(0, 0, 0, 0), (1, 20, 0, 0), (21, 63, 0, 0)]
            )
        )
        assert prog is not None and np.array_equal(base, prog)

    def test_deep_successive_approximation(self):
        img = _test_image(40, 40)
        scans = [
            (0, 0, 0, 3),
            (1, 63, 0, 3),
            (1, 63, 3, 2),
            (1, 63, 2, 1),
            (1, 63, 1, 0),
            (0, 0, 3, 2),
            (0, 0, 2, 1),
            (0, 0, 1, 0),
        ]
        base = _jpeg_gray_pixels(encode_gray_jpeg(img))
        prog = _jpeg_gray_pixels(encode_gray_progressive(img, scans=scans))
        assert prog is not None and np.array_equal(base, prog)

    def test_sparse_noise_exercises_zrl_and_eobruns(self):
        # seeded noise quantizes to scattered nonzeros: long zero runs
        # (ZRL), EOB runs across blocks, refinement correction bits
        rng = np.random.RandomState(7)
        img = np.clip(128 + 40 * rng.randn(56, 64), 0, 255)
        base = _jpeg_gray_pixels(encode_gray_jpeg(img))
        prog = _jpeg_gray_pixels(encode_gray_progressive(img))
        assert prog is not None and np.array_equal(base, prog)

    def test_non_mcu_aligned(self):
        img = _test_image(33, 41)
        base = _jpeg_gray_pixels(encode_gray_jpeg(img))
        prog = _jpeg_gray_pixels(encode_gray_progressive(img))
        assert prog is not None and np.array_equal(base, prog)

    def test_color_progressive_interleaved_dc_and_subsampled_grids(self):
        # interleaved progressive DC scan + non-interleaved AC scans
        # over the REAL per-component block grids (Y grid smaller than
        # its MCU-padded allocation at 40x56: 5x7 blocks vs 6x8)
        base_img = _test_image(40, 56)
        rgb = np.stack([base_img, base_img[::-1], np.full_like(base_img, 128)], axis=-1)
        base = _jpeg_gray_pixels(encode_color_jpeg_420(rgb))
        prog = _jpeg_gray_pixels(encode_color_progressive_420(rgb))
        assert prog is not None
        assert np.array_equal(base, prog)

    def test_truncated_progressive_does_not_raise(self):
        blob = encode_gray_progressive(_test_image())
        for cut in (30, len(blob) // 3, len(blob) // 2, len(blob) - 4):
            _jpeg_gray_pixels(blob[:cut])  # must not raise


class TestJpegRobustness:
    def test_not_jpeg_and_truncated(self):
        assert _jpeg_gray_pixels(b"") is None
        assert _jpeg_gray_pixels(b"\x89PNG\r\n\x1a\n") is None
        blob = encode_gray_jpeg(_test_image())
        for cut in (3, 20, len(blob) // 2, len(blob) - 3):
            _jpeg_gray_pixels(blob[:cut])  # must not raise

    def test_invalid_progressive_scan_rejected(self):
        # a baseline stream rebranded SOF2 carries an Ss=0,Se=63 scan —
        # illegal in progressive (DC band must be 0..0): fail closed
        blob = bytearray(encode_gray_jpeg(_test_image()))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # rebrand SOF0 as progressive
        assert _jpeg_gray_pixels(bytes(blob)) is None

    def test_garbage_entropy_returns_none_or_pixels(self):
        blob = bytearray(encode_gray_jpeg(_test_image()))
        blob[-20:-10] = b"\x55" * 10  # corrupt entropy tail
        _jpeg_gray_pixels(bytes(blob))  # must not raise


class TestJpegTierWiring:
    def test_decode_image_uses_real_tier(self):
        img = _test_image()
        mean, std = _decode_image(encode_gray_jpeg(img))
        assert abs(mean - img.mean()) < 2.0
        assert abs(std - img.std()) < 2.0

    def test_gray_image_feeds_dhash(self):
        img = _test_image(64, 72)
        gray = _gray_image(encode_gray_jpeg(img))
        assert gray is not None and gray.shape == img.shape

    def test_spark_features_end_to_end(self, spark):
        from power_generation_etl_spark.operators.multimodal import (
            extract_image_dhash,
            extract_image_features,
        )

        a = encode_gray_jpeg(_test_image(64, 72))
        noisy = np.clip(_test_image(64, 72) + 2.0, 0, 255)
        b = encode_gray_jpeg(noisy)
        df = spark.createDataFrame(
            [(i, "image", None, blob, None, None, None)
             for i, blob in enumerate([a, b])],
            "media_id bigint, kind string, mime string, content binary,"
            " width int, height int, duration_ms bigint",
        )
        feats = {r["media_id"]: r for r in extract_image_features(df).collect()}
        assert abs(feats[0]["feat_mean"] - _test_image(64, 72).mean()) < 2.0
        hashes = {r["media_id"]: r["dhash"] for r in extract_image_dhash(df).collect()}
        assert hashes[0] is not None and hashes[1] is not None
        # near-identical images: small Hamming distance between dHashes
        ham = bin((hashes[0] ^ hashes[1]) & ((1 << 64) - 1)).count("1")
        assert ham <= 8, ham


class TestGoldenRealEncoder:
    """Independent oracle (r9, closes the r8 ADVICE gap): every other
    test here round-trips against the encoder written in THIS file, so
    symmetric encoder/decoder bugs (mirrored zigzag, transposed IDCT,
    inverted sign conventions) would cancel out. These fixtures were
    produced by a real libjpeg-based encoder (CPython test-suite
    images, see tests/fixtures/real_jpeg/README.md) with a lossless
    PPM pixel dump of the same image as ground truth."""

    @staticmethod
    def _fixture(name: str) -> bytes:
        import pathlib

        return (
            pathlib.Path(__file__).parent / "fixtures" / "real_jpeg" / name
        ).read_bytes()

    @staticmethod
    def _ppm_luma() -> np.ndarray:
        import re

        raw = TestGoldenRealEncoder._fixture("python.ppm")
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", raw)
        w, h, _mx = map(int, m.groups())
        arr = (
            np.frombuffer(raw[m.end() : m.end() + w * h * 3], np.uint8)
            .reshape(h, w, 3)
            .astype(np.float64)
        )
        # ITU-R 601 luma — same weights as every gray tier in the repo
        return (arr[..., 0] * 299 + arr[..., 1] * 587 + arr[..., 2] * 114) / 1000

    def test_real_jpeg_matches_lossless_truth(self):
        truth = self._ppm_luma()
        gray = _jpeg_gray_pixels(self._fixture("python.jpg"))
        assert gray is not None and gray.shape == truth.shape == (16, 16)
        diff = gray - truth
        mse = float((diff**2).mean())
        psnr = 10 * np.log10(255.0**2 / mse)
        # measured 39.7 dB; a mirrored zigzag / transposed IDCT /
        # flipped sign convention lands far below 20 dB
        assert psnr > 35.0, psnr
        assert float(np.abs(diff).mean()) < 3.0
        assert abs(float(gray.mean()) - float(truth.mean())) < 1.0
        assert abs(float(gray.std()) - float(truth.std())) < 1.5

    def test_jfif_and_raw_variants_decode_identically(self):
        # python-raw.jpg is the same encoding minus the JFIF APP0 —
        # the decoder must not depend on the APP0 marker
        a = _jpeg_gray_pixels(self._fixture("python.jpg"))
        b = _jpeg_gray_pixels(self._fixture("python-raw.jpg"))
        assert a is not None and b is not None
        assert np.array_equal(a, b)

    def test_golden_scalar_vectors(self):
        # frozen scalar goldens so a silent future regression of the
        # decode path (not just a symmetric flip) trips loudly
        gray = _jpeg_gray_pixels(self._fixture("python.jpg"))
        assert round(float(gray.mean()), 2) == 97.12
        assert round(float(gray.std()), 2) == 86.05

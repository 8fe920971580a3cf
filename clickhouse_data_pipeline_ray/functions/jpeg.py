"""Pure-numpy baseline JPEG codec (ITU-T T.81, sequential DCT, 8-bit).

Implements the PUBLIC byte layout from the JPEG standard — marker segments
(SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI), canonical Huffman entropy coding with
byte stuffing and restart markers, zigzag + quantization with the Annex K
example tables, and the separable 8×8 DCT — with no third-party codec
dependency, so the multimodal "numpy" tier can decode the most common image
format in-container (the reference pipelines treat media as opaque bytes;
this engine decodes them).

Scope (documented, fail-loudly outside it):

- decode: BASELINE sequential DCT only (SOF0), 8-bit, 1 or 3 components,
  any sampling factors in {1, 2} (4:4:4 / 4:2:2 / 4:2:0), interleaved
  single-scan, optional restart intervals, custom or standard Huffman/quant
  tables. Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
  modes raise ValueError.
- encode: 4:4:4 (or grayscale), standard Annex K tables scaled by the
  libjpeg quality formula, no subsampling, no restarts — enough to
  round-trip-test the decoder and to plant realistic payloads in tests.

Everything here is vectorized per 8×8-block batch (DCT/quant/zigzag are one
einsum/gather over ALL blocks); only the entropy coder walks bits, which is
inherent to Huffman.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K example quantization tables (luminance, chrominance), row-major.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8×8 DCT-II basis: C[u, x] = a(u) · cos((2x+1)uπ/16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16)
_IDCT = _DCT.T.copy()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------- huffman


class _HuffTable:
    """Canonical Huffman table: (bits histogram, value list) → per-length
    min/max codes for the standard sequential decode, plus an encode map."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.bits = list(bits)
        self.vals = list(vals)
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.encode: dict[int, tuple[int, int]] = {}
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            for _ in range(bits[length - 1]):
                self.encode[vals[k]] = (code, length)
                code += 1
                k += 1
            self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # past the end: pad with 1-bits (T.81 F.2.2.5 allows the
                # final byte's padding); decoding stops at block count
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker sits at a byte boundary; the caller
                    # consumes it via sync_restart()
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # EOI or another marker: pad
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = self.bit()
        length = 1
        while code > table.maxcode[length]:
            code = (code << 1) | self.bit()
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: huffman code longer than 16 bits")
        return table.vals[table.valptr[length] + code - table.mincode[length]]

    def sync_restart(self, n: int) -> None:
        """Discard padding bits, consume the expected RSTn marker, reset."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] == 0xD0 + (n & 7):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("corrupt JPEG: missing restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the n-bit received value to its signed
    coefficient."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


# ---------------------------------------------------------------- decoder


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG → (H, W, 3) uint8 RGB (grayscale replicated
    to 3 channels). See module docstring for the supported envelope."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq)])
    data = payload

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        nxt = pos + 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
                quant[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline (extended seq ok)
            prec, h, w, ncomp = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (baseline is 8)")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF{marker - 0xC0}): only baseline "
                "sequential DCT is implemented by this pure-numpy decoder"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, nxt, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn/COM/etc: skipped
        pos = nxt
    raise ValueError("corrupt JPEG: no SOS scan found")


def _decode_scan(data, pos, frame, scan, quant, huff_dc, huff_ac, restart):
    h, w, comps = frame
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("unsupported sampling factors (h,v must be <= 2)")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per scan component: huffman tables + block accumulator
    plan = []
    for cs, td, ta in scan:
        hs, vs, tq = byid[cs]
        plan.append({
            "cid": cs, "h": hs, "v": vs,
            # file DQT tables are zigzag-ordered (T.81 B.2.4.1); dequant
            # happens elementwise in the zigzag domain below
            "qz": quant[tq].astype(np.int64),
            "dc": huff_dc[td], "ac": huff_ac[ta],
            "pred": 0,
            "coef": np.zeros((mcuy * vs, mcux * hs, 64), np.int64),
        })

    br = _BitReader(data, pos)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.sync_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                for p in plan:
                    p["pred"] = 0
            for p in plan:
                for by in range(p["v"]):
                    for bx in range(p["h"]):
                        blk = p["coef"][my * p["v"] + by, mx * p["h"] + bx]
                        # DC
                        t = br.decode(p["dc"])
                        diff = _extend(br.receive(t), t) if t else 0
                        p["pred"] += diff
                        blk[0] = p["pred"]
                        # AC
                        k = 1
                        while k < 64:
                            rs = br.decode(p["ac"])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overflow")
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
            mcu_count += 1

    # dequant + IDCT, all blocks of each component at once
    planes = []
    for p in plan:
        by, bx, _ = p["coef"].shape
        zz = p["coef"] * p["qz"][None, None, :]          # dequant in zigzag
        blocks = zz[:, :, UNZIGZAG].reshape(by, bx, 8, 8).astype(np.float64)
        # IDCT: pix[x,y] = Σ_{u,v} D[u,x]·C[u,v]·D[v,y]
        pix = np.einsum("ux,mnuv,vy->mnxy", _DCT, blocks, _DCT) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // p["v"], hmax // p["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: h, : w])
    out = np.clip(np.stack(planes, axis=-1).round(), 0, 255).astype(np.uint8)

    if out.shape[2] == 1:
        return np.repeat(out, 3, axis=2)
    if out.shape[2] != 3:
        raise ValueError(f"unsupported component count {out.shape[2]}")
    y = out[:, :, 0].astype(np.float64)
    cb = out[:, :, 1].astype(np.float64) - 128.0
    cr = out[:, :, 2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def restart(self, n: int) -> None:
        """Pad to a byte boundary and emit RSTn (unstuffed marker)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per T.81
        return bytes(self.out)


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, qz: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad (edge replicate) → 8×8 FDCT → zigzag quantize. Returns
    (ph/8, pw/8, 64) int coefficients in zigzag order."""
    h, w = plane.shape
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
    blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,mnxy,yv->mnuv", _DCT, blocks, _IDCT)
    zz = coef.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]
    # quantize in the zigzag domain with the zigzag-reordered table
    # (the DQT segment is written zigzag-ordered, T.81 B.2.4.1)
    return np.round(zz / qz[ZIGZAG][None, None, :]).astype(np.int64)


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dct: _HuffTable, act: _HuffTable) -> int:
    """Huffman-encode one zigzag coefficient block; returns the new DC."""
    dc = int(blk[0])
    diff = dc - pred
    s = _csize(diff)
    code, ln = dct.encode[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act.encode[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = act.encode[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = act.encode[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg_baseline(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) grayscale) → baseline JPEG bytes.
    ``subsample=True`` emits 4:2:0 (2×2-mean chroma, the common camera
    layout); ``restart_interval`` emits a DRI segment + RSTn markers every
    N MCUs. Standard Annex K tables scaled by ``quality``."""
    gray = arr.ndim == 2
    if gray:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    ql, qc = _quality_tables(quality)

    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    elif nc == 1:
        planes = [a[:, :, 0]]
    else:
        raise ValueError(f"encode expects 1 or 3 channels, got {nc}")
    sub = subsample and nc == 3

    if sub:
        # luma MCU = 16×16 (h=v=2); chroma downsampled by 2×2 mean
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        ypad = np.pad(planes[0], ((0, ph - h), (0, pw - w)), mode="edge")
        chroma = []
        for c in planes[1:]:
            cpad = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            chroma.append(
                cpad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
        comp_coefs = [_fdct_quant(ypad, ql, ph, pw)]
        comp_coefs += [_fdct_quant(c, qc, ph // 2, pw // 2) for c in chroma]
        samp = [(2, 2), (1, 1), (1, 1)]
        mcux, mcuy = pw // 16, ph // 16
    else:
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        comp_coefs = [
            _fdct_quant(p, ql if i == 0 else qc, ph, pw)
            for i, p in enumerate(planes)
        ]
        samp = [(1, 1)] * nc
        mcux, mcuy = pw // 8, ph // 8

    dc_l, ac_l = _HuffTable(DC_LUMA_BITS, DC_LUMA_VALS), _HuffTable(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c, ac_c = _HuffTable(DC_CHROMA_BITS, DC_CHROMA_VALS), _HuffTable(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0] * len(comp_coefs)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(comp_coefs)
            for ci, coefs in enumerate(comp_coefs):
                hs, vs = samp[ci]
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        blk = coefs[my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_block(bw, blk, preds[ci], dct, act)
            mcu_count += 1
    entropy = bw.flush()

    # --- marker segments
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = [b"\xFF\xD8"]
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].tolist())))
    if nc == 3:
        out.append(seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out.append(seg(0xC0, sof))
    for tid, (bits, vals) in (
        ((0x00, (DC_LUMA_BITS, DC_LUMA_VALS)),)
        + ((0x10, (AC_LUMA_BITS, AC_LUMA_VALS)),)
        + (((0x01, (DC_CHROMA_BITS, DC_CHROMA_VALS)),
            (0x11, (AC_CHROMA_BITS, AC_CHROMA_VALS))) if nc == 3 else ())
    ):
        out.append(seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(entropy)
    out.append(b"\xFF\xD9")
    return b"".join(out)

"""Gorilla-style compression, re-engineered for vectorized decode.

Two codecs (after Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 — the compression scheme is §4.1):

  * ``encode_xor_floats``      — XOR-with-previous float64 compression
  * ``encode_dod_timestamps``  — delta-of-delta int64 timestamp compression

Deviation from the paper's bit layout (deliberate, engine design): Gorilla
interleaves control bits and payloads in one stream, which forces sequential
decode.  Here each block splits into three *separate* streams —

  A: 1 control bit per element (XOR == 0?)          → np.unpackbits
  B: fixed-width descriptors for non-zero elements  → reshape + dot
  C: concatenated variable-width payloads           → cumsum/repeat gather

— so both encode and decode are pure vectorized NumPy (the XOR prefix-undo is
``np.bitwise_xor.accumulate``; payload extraction is a repeat/reduceat
gather).  Bit cost per element is the paper's minus the leading-window reuse
optimization, plus nothing: same asymptotics, fully parallel decode inside
mapInArrow workers.

Block layouts (little-endian):
  floats: [n:u32][m:u32][A: ceil(n/8)B][B: ceil(11m/8)B][C: payload bits]
          descriptor = 5-bit leading-zero count (clipped to 31) + 6-bit
          significant length L (L=64 encoded as 0)
  stamps: [n:u32][t0:i64][d0:i64][ctrl: 2 bits/elem][payload]
          control: 00 → Δ²=0, 01 → 7-bit zigzag, 10 → 9-bit zigzag,
          11 → 64-bit raw zigzag
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ONE = np.uint64(1)

# 256-entry leading/trailing zero tables for byte-wise clz/ctz
_CLZ8 = np.array([8 if i == 0 else 8 - int(i).bit_length() for i in range(256)], dtype=np.int64)
_CTZ8 = np.array([8 if i == 0 else (i & -i).bit_length() - 1 for i in range(256)], dtype=np.int64)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (byte-table based)."""
    shifts = np.arange(56, -8, -8, dtype=np.uint64)  # 56,48,...,0
    b = ((x[:, None] >> shifts[None, :]) & _U64(0xFF)).astype(np.uint8)
    nz = b != 0
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), 8)
    out = np.full(x.shape, 64, dtype=np.int64)
    has = first < 8
    out[has] = 8 * first[has] + _CLZ8[b[np.nonzero(has)[0], first[has]]]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    shifts = np.arange(0, 64, 8, dtype=np.uint64)  # 0,8,...,56
    b = ((x[:, None] >> shifts[None, :]) & _U64(0xFF)).astype(np.uint8)
    nz = b != 0
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), 8)
    out = np.full(x.shape, 64, dtype=np.int64)
    has = first < 8
    out[has] = 8 * first[has] + _CTZ8[b[np.nonzero(has)[0], first[has]]]
    return out


def pack_varbits(values: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Pack values[i]'s low widths[i] bits, MSB-first, into a byte array."""
    values = values.astype(_U64, copy=False)
    widths = widths.astype(np.int64, copy=False)
    total = int(widths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8)
    starts = np.cumsum(widths) - widths
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts, widths)
    shift = (np.repeat(widths, widths) - 1 - intra).astype(_U64)
    bits = ((np.repeat(values, widths) >> shift) & _ONE).astype(np.uint8)
    return np.packbits(bits)


def unpack_varbits(buf: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Inverse of pack_varbits; every width must be ≥ 1."""
    widths = widths.astype(np.int64, copy=False)
    total = int(widths.sum())
    if total == 0:
        return np.zeros(0, dtype=_U64)
    bits = np.unpackbits(buf, count=total).astype(_U64)
    starts = np.cumsum(widths) - widths
    intra = np.arange(total, dtype=np.int64) - np.repeat(starts, widths)
    shift = (np.repeat(widths, widths) - 1 - intra).astype(_U64)
    contrib = bits << shift
    return np.add.reduceat(contrib, starts)


def _bytes(n: int, m: int) -> tuple[int, int]:
    return (n + 7) // 8, (11 * m + 7) // 8


def encode_xor_floats(values: np.ndarray) -> bytes:
    """XOR-compress a float64 series (NaN-safe: NaN payloads round-trip
    bit-exactly)."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.shape[0]
    if n == 0:
        return np.uint32([0, 0]).tobytes()
    u = v.view(_U64)
    x = u.copy()
    x[1:] = u[1:] ^ u[:-1]
    nonzero = x != 0
    m = int(nonzero.sum())
    xs = x[nonzero]
    lz = np.minimum(_clz64(xs), 31)
    tz = _ctz64(xs)
    L = 64 - lz - tz  # ≥ 1
    desc = (lz.astype(_U64) << _U64(6)) | (L % 64).astype(_U64)  # L=64 → 0
    payload = xs >> tz.astype(_U64)
    head = np.uint32([n, m]).tobytes()
    a = np.packbits(nonzero.astype(np.uint8)).tobytes()
    b = pack_varbits(desc, np.full(m, 11, dtype=np.int64)).tobytes()
    c = pack_varbits(payload, L).tobytes()
    return head + a + b + c


def decode_xor_floats(blob: bytes) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n, m = np.frombuffer(buf[:8], dtype=np.uint32)
    n, m = int(n), int(m)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    na, nb = _bytes(n, m)
    pos = 8
    nonzero = np.unpackbits(buf[pos : pos + na], count=n).astype(bool)
    pos += na
    desc = unpack_varbits(buf[pos : pos + nb], np.full(m, 11, dtype=np.int64))
    pos += nb
    lz = (desc >> _U64(6)).astype(np.int64)
    L = (desc & _U64(0x3F)).astype(np.int64)
    L[L == 0] = 64
    tz = 64 - lz - L
    payload = unpack_varbits(buf[pos:], L)
    x = np.zeros(n, dtype=_U64)
    x[nonzero] = payload << tz.astype(_U64)
    u = np.bitwise_xor.accumulate(x)  # undo XOR-with-previous in one scan
    return u.view(np.float64).copy()


def _zigzag(v: np.ndarray) -> np.ndarray:
    return ((v << 1) ^ (v >> 63)).astype(_U64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    return (z >> _ONE).astype(np.int64) ^ -(z & _ONE).astype(np.int64)


def encode_dod_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta compress int64 timestamps (epoch seconds or any
    monotone-ish int64)."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.shape[0]
    head = [np.uint32([n]).tobytes()]
    if n == 0:
        return head[0]
    head.append(np.int64([t[0]]).tobytes())
    if n == 1:
        return b"".join(head)
    d = np.diff(t)
    head.append(np.int64([d[0]]).tobytes())
    if n == 2:
        return b"".join(head)
    dod = np.diff(d)
    z = _zigzag(dod)
    code = np.zeros(z.shape, dtype=np.uint8)
    code[z > 0] = 1
    code[z >= (1 << 7)] = 2
    code[z >= (1 << 9)] = 3
    widths = np.array([0, 7, 9, 64], dtype=np.int64)[code]
    ctrl = pack_varbits(code.astype(_U64), np.full(len(code), 2, dtype=np.int64))
    nz = widths > 0
    payload = pack_varbits(z[nz], widths[nz])
    return b"".join(head) + ctrl.tobytes() + payload.tobytes()


def decode_dod_timestamps(blob: bytes) -> np.ndarray:
    buf = np.frombuffer(blob, dtype=np.uint8)
    n = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    t0 = int(np.frombuffer(buf[4:12], dtype=np.int64)[0])
    if n == 1:
        return np.array([t0], dtype=np.int64)
    d0 = int(np.frombuffer(buf[12:20], dtype=np.int64)[0])
    if n == 2:
        return np.array([t0, t0 + d0], dtype=np.int64)
    k = n - 2
    nc = (2 * k + 7) // 8
    pos = 20
    code = unpack_varbits(buf[pos : pos + nc], np.full(k, 2, dtype=np.int64)).astype(np.int64)
    pos += nc
    widths = np.array([0, 7, 9, 64], dtype=np.int64)[code]
    nz = widths > 0
    z = np.zeros(k, dtype=_U64)
    if nz.any():
        z[nz] = unpack_varbits(buf[pos:], widths[nz])
    dod = _unzigzag(z)
    d = np.empty(n - 1, dtype=np.int64)
    d[0] = d0
    d[1:] = dod
    np.cumsum(d, out=d)  # Δ² → Δ
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + np.cumsum(d)  # Δ → t
    return out

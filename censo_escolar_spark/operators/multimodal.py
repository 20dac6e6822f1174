"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The 100 TB training-data pattern: media payloads travel as a ``binary``
column next to a typed metadata struct; everything cheap (format
sniffing, sizing, frame-index planning) is a native JVM expression over
the bytes, and only the genuinely pixel-level work (decode, resize,
feature extraction) crosses into Python — as Arrow-batched
``mapInPandas`` over bounded batches, never per-row UDFs.

Decoders are pluggable. ``real_decode`` import-probes the preferred
codec library per media family (Pillow, soundfile) and falls back to
pure-stdlib decoders for the open formats — PNG via ``zlib``/``struct``
(RFC 2083), WAV via the ``wave`` module — so the real path runs even in
lib-less environments; only formats with no stdlib codec (JPEG without
Pillow, video containers) raise ``NotImplementedError`` (clearly-marked
stub). ``fake_decode`` is a deterministic stand-in (pixels derived from
a splitmix64 stream seeded by the payload) that keeps the Spark-side
plumbing — schema, batch shape, partitioning, feature math — SQL-oracle
checkable. Swapping decoders changes ONE function argument.

Scale notes:
- payload columns are large: size shuffle partitions by bytes, not rows
  (``repartition_by_bytes``), and bound Arrow batches via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when decoding;
- metadata-only pipelines (sniff/stats/plan) never deserialize payloads
  into Python — column pruning drops the binary column when unused.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from censo_escolar_spark.functions.hashing import splitmix64

#: Magic-byte prefixes → media format (hex, uppercase). Public file
#: signatures; extend freely.
MAGIC_PREFIXES = (
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("52494646", "wav"),  # RIFF container
    ("000000", "mp4"),  # ISO BMFF size-box prefix (heuristic)
)


def sniff_format(bytes_col: str | Column) -> Column:
    """Media format from magic bytes — pure JVM expression, no decode."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    head = F.upper(F.hex(F.substring(c, 1, 4)))
    expr = F.lit(None).cast("string")
    for prefix, fmt in reversed(MAGIC_PREFIXES):
        expr = F.when(head.startswith(prefix), fmt).otherwise(expr)
    return expr


def media_metadata(bytes_col: str | Column) -> Column:
    """Typed metadata struct computed without decoding: format, byte size,
    and a 64-bit content hash (dedup / cache key)."""
    c = F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col
    return F.struct(
        sniff_format(c).alias("format"),
        F.octet_length(c).alias("n_bytes"),
        F.xxhash64(c).alias("content_hash"),
    )


def plan_frame_sample(n_frames_col: str | Column, k: int) -> Column:
    """Indices of ``k`` evenly-spaced frames out of ``n_frames`` — the
    metadata-only half of video frame sampling (the decode of those
    frames is the pluggable-decoder half). Matches the standard
    floor(i * n / k) spacing; fewer than k frames → all frames."""
    n = F.col(n_frames_col) if isinstance(n_frames_col, str) else n_frames_col
    return F.when(
        n <= k, F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.floor(i * n / F.lit(k)).cast("int"),
        )
    )


def repartition_by_bytes(
    df: DataFrame, bytes_col: str, *, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Partition a payload table by total BYTES, not rows — media sizes are
    wildly skewed, so row-count partitioning makes straggler tasks. One
    cheap count+sum pass sizes the shuffle; round-robin spread."""
    total = df.select(F.sum(F.octet_length(bytes_col))).first()[0] or 0
    n_parts = max(1, int(total / target_partition_bytes) + 1)
    return df.repartition(n_parts)


# --------------------------------------------------------------------------
# Decoders: (payload bytes, fmt) -> np.ndarray of shape (h, w) grayscale.
# --------------------------------------------------------------------------

Decoder = Callable[[bytes, str], np.ndarray]


def fake_decode(payload: bytes, fmt: str, *, h: int = 8, w: int = 8) -> np.ndarray:
    """DETERMINISTIC FAKE DECODER (the real codec libs are not in this
    container). Pixels are a splitmix64 stream seeded by the payload's
    first/last bytes and length — stable across runs and processes, so
    feature tests have golden values. Shape mimics a tiny grayscale
    thumbnail; real decoders return (h, w) uint8 exactly the same way."""
    seed = (len(payload) << 16) ^ (payload[0] if payload else 0) ^ (
        (payload[-1] << 8) if payload else 0
    )
    vals = splitmix64(seed, h * w)
    return (vals % np.uint64(256)).astype(np.uint8).reshape(h, w)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_decode_stdlib(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (``zlib`` + ``struct`` — the format is
    public: RFC 2083). Supports the mainstream profile: 8-bit depth,
    color types 0/2/3/4/6, filters 0–4, no interlace. Grayscale
    conversion uses Pillow's exact ITU-R 601-2 integer formula
    ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` so the stdlib and
    Pillow paths are bit-identical on the same payload."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad 8-byte signature)")
    pos = len(_PNG_SIG)
    idat: list[bytes] = []
    plte: np.ndarray | None = None
    ihdr = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"stdlib PNG decoder handles 8-bit non-interlaced only "
            f"(got depth={depth}, interlace={interlace}); install Pillow"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline stream has the wrong length")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:
                    ul = int(prev[i - bpp]) if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        prev = cur
        img[y] = cur.astype(np.uint8)
    px = img.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        px = plte[px[:, :, 0]]
        channels = 3
    if channels in (1, 2):  # gray / gray+alpha
        return np.ascontiguousarray(px[:, :, 0])
    r = px[..., 0].astype(np.uint32)
    g = px[..., 1].astype(np.uint32)
    b = px[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


#: islow IDCT fixed-point constants (Loeffler–Ligtenberg–Moshovitz as
#: specified in the public IJG/libjpeg documentation; CONST_BITS = 13).
_J_FIX = {
    "0_298631336": 2446, "0_390180644": 3196, "0_541196100": 4433,
    "0_765366865": 6270, "0_899976223": 7373, "1_175875602": 9633,
    "1_501321110": 12299, "1_847759065": 15137, "1_961570560": 16069,
    "2_053119869": 16819, "2_562915447": 20995, "3_072711026": 25172,
}
_J_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_islow(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """libjpeg's jpeg_idct_islow in integer numpy: bit-identical to the
    reference fixed-point implementation (CONST_BITS 13, PASS1_BITS 2,
    DESCALE = add-half-and-arithmetic-shift), so baseline decodes match
    libjpeg/Pillow byte-for-byte. ``block`` is the dezigzagged 8x8
    coefficient array; ``qt`` the matching natural-order quant table."""
    F = _J_FIX
    CB, P1 = 13, 2

    def descale(x, n):
        return (x + (1 << (n - 1))) >> n

    def pass_(m, shift):
        # operates column-wise on int64 matrix m (8 x 8), returns 8 x 8
        i0, i1, i2, i3 = m[0], m[1], m[2], m[3]
        i4, i5, i6, i7 = m[4], m[5], m[6], m[7]
        z1 = (i2 + i6) * F["0_541196100"]
        tmp2 = z1 - i6 * F["1_847759065"]
        tmp3 = z1 + i2 * F["0_765366865"]
        tmp0 = (i0 + i4) << CB
        tmp1 = (i0 - i4) << CB
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        o0, o1, o2, o3 = i7, i5, i3, i1
        z1 = o0 + o3
        z2 = o1 + o2
        z3 = o0 + o2
        z4 = o1 + o3
        z5 = (z3 + z4) * F["1_175875602"]
        o0 = o0 * F["0_298631336"]
        o1 = o1 * F["2_053119869"]
        o2 = o2 * F["3_072711026"]
        o3 = o3 * F["1_501321110"]
        z1 = -z1 * F["0_899976223"]
        z2 = -z2 * F["2_562915447"]
        z3 = -z3 * F["1_961570560"] + z5
        z4 = -z4 * F["0_390180644"] + z5
        o0 += z1 + z3
        o1 += z2 + z4
        o2 += z2 + z3
        o3 += z1 + z4
        return np.stack(
            [
                descale(t10 + o3, shift), descale(t11 + o2, shift),
                descale(t12 + o1, shift), descale(t13 + o0, shift),
                descale(t13 - o0, shift), descale(t12 - o1, shift),
                descale(t11 - o2, shift), descale(t10 - o3, shift),
            ]
        )

    deq = (block.astype(np.int64) * qt.astype(np.int64))
    cols = pass_(deq, CB - P1)  # pass 1: columns (input rows are coeffs)
    rows = pass_(cols.T, CB + P1 + 3).T  # pass 2: rows
    return np.clip(rows + 128, 0, 255).astype(np.uint8)


class _JpegBits:
    """MSB-first entropy bit reader with 0xFF00 byte-stuffing removal."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.bits, self.nbits = data, pos, 0, 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # restart/EOI marker reached: pad with 1s (spec behavior)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def align_to_marker(self) -> int:
        """Drop pending bits, consume one RSTn marker, return its index."""
        self.bits = self.nbits = 0
        while self.pos + 1 < len(self.data) and (
            self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _jpeg_huff_decode(bits: _JpegBits, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | bits.read(1)
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _fancy_h2(row: np.ndarray, bias0: int = 1, bias1: int = 2, shift: int = 2) -> np.ndarray:
    """libjpeg fancy (triangular) 2x horizontal upsample of one int row."""
    n = len(row)
    out = np.empty(2 * n, dtype=np.int64)
    left = np.concatenate(([row[0]], row[:-1]))
    right = np.concatenate((row[1:], [row[-1]]))
    out[0::2] = (row * 3 + left + bias0) >> shift
    out[1::2] = (row * 3 + right + bias1) >> shift
    # edge columns: libjpeg emits (value * 4 + bias) >> shift — a direct
    # copy at shift 2 (h2v1) and the documented h2v2 edge rounding
    out[0] = (row[0] * 4 + bias0) >> shift
    out[-1] = (row[-1] * 4 + bias1) >> shift
    return out


def _jpeg_upsample(plane: np.ndarray, hs: int, vs: int, w: int, h: int) -> np.ndarray:
    """Upsample a component plane by (hs, vs) ∈ {1, 2}² with libjpeg's
    fancy triangular filter (h2v1/h2v2; the rare h1v2 / 4:4:0 ratio uses
    libjpeg-turbo's fancy vertical filter — classic libjpeg replicates),
    then crop to (h, w). The caller passes the plane already cropped to
    its real sample size so edge triangles replicate the last REAL
    sample, never encoder MCU padding."""
    if (hs, vs) == (1, 1):
        return plane[:h, :w]
    p = plane.astype(np.int64)
    if vs == 2:
        up = np.empty((p.shape[0] * 2, p.shape[1]), dtype=np.int64)
        above = np.vstack([p[:1], p[:-1]])
        below = np.vstack([p[1:], p[-1:]])
        # vertical triangle -> values scaled x4 carried into the
        # horizontal pass (libjpeg h2v2: one combined >> 4 descale)
        up[0::2] = p * 3 + above
        up[1::2] = p * 3 + below
        if hs == 2:
            out = np.stack([_fancy_h2(r, 8, 7, 4) for r in up])
        else:
            out = (up + 2) >> 2
    else:  # vs == 1, hs == 2
        out = np.stack([_fancy_h2(r, 1, 2, 2) for r in p])
    return np.clip(out[:h, :w], 0, 255)


def _jpeg_decode_stdlib(payload: bytes) -> np.ndarray:
    """Pure-stdlib baseline-JPEG decode (the format is public: ITU T.81).
    Supports the mainstream baseline profile: SOF0, 8-bit, 1 or 3
    components, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers. The
    pipeline is libjpeg-faithful at each stage — islow fixed-point IDCT,
    fancy triangular chroma upsampling, fixed-point YCbCr→RGB, then
    Pillow's ITU-R 601-2 integer luma — targeting byte parity with
    Pillow's ``convert("L")`` (asserted for grayscale and 4:4:4 in the
    Pillow-gated half of the golden tests). Progressive (SOF2),
    arithmetic coding, and 12-bit precision raise NotImplementedError."""
    import struct

    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = payload[pos + 1]
        pos += 2
        if m in (0x00, 0xFF):
            raise ValueError(f"bad JPEG marker 0xFF{m:02X}")
        if m in (0x01,) or 0xD0 <= m <= 0xD9:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:
            raise ValueError("bad JPEG segment length")
        seg = payload[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq == 0:
                    vals = np.frombuffer(seg[s + 1 : s + 65], np.uint8)
                    s += 65
                else:
                    vals = np.frombuffer(seg[s + 1 : s + 129], ">u2")
                    s += 129
                nat = np.zeros(64, np.int64)
                nat[_J_ZIGZAG] = vals
                qts[tq] = nat.reshape(8, 8)
        elif m == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                counts = seg[s + 1 : s + 17]
                s += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = seg[s]
                        code += 1
                        s += 1
                    code <<= 1
                huffs[(tc, th)] = table
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("stdlib JPEG decoder is 8-bit only")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (h, w, comps)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"stdlib JPEG decoder handles baseline SOF0 only (got "
                f"SOF marker 0xFF{m:02X} — progressive/arithmetic/lossless); "
                "install Pillow"
            )
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            pos += seglen
            return _jpeg_decode_scan(
                payload, pos, frame, sel, qts, huffs, restart
            )
        pos += seglen
    raise ValueError("JPEG without SOS scan")


def _jpeg_decode_scan(data, pos, frame, sel, qts, huffs, restart):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if (hmax // c["h"], vmax // c["v"]) not in ((1, 1), (2, 1), (2, 2), (1, 2)):
            raise NotImplementedError("unsupported JPEG sampling ratio")
        c["plane"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.uint8)
        c["dc_t"], c["ac_t"] = sel[c["id"]]
        c["pred"] = 0
    bits = _JpegBits(data, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                m = bits.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError("expected JPEG restart marker")
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_tab = huffs[(0, c["dc_t"])]
                ac_tab = huffs[(1, c["ac_t"])]
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.int64)
                        s = _jpeg_huff_decode(bits, dc_tab)
                        diff = _jpeg_extend(bits.read(s), s) if s else 0
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(bits, ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                # corrupt stream: run-length past the last
                                # AC coefficient must be a codec error,
                                # never an IndexError (T.81 F.2.2.2)
                                raise ValueError("invalid JPEG AC run length")
                            coef[_J_ZIGZAG[k]] = _jpeg_extend(bits.read(s), s)
                            k += 1
                        blk = _jpeg_idct_islow(coef.reshape(8, 8), qt)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = blk
            n_mcu += 1
    if len(comps) == 1:
        return comps[0]["plane"][:h, :w]
    # Crop each plane to its REAL sample size (ceil(w·h_i/hmax) ×
    # ceil(h·v_i/vmax)) BEFORE upsampling, as libjpeg does (it upsamples
    # only downsampled_width/height): edge pixels of images whose
    # dimensions are not MCU multiples must replicate the last real
    # sample, not pull neighbors from encoder padding blocks.
    planes = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        planes.append(
            _jpeg_upsample(
                c["plane"][:ch, :cw], hmax // c["h"], vmax // c["v"], w, h
            ).astype(np.int64)
        )
    y, cb, cr = planes[0], planes[1] - 128, planes[2] - 128
    half = 1 << 15
    r = np.clip(y + ((91881 * cr + half) >> 16), 0, 255)
    b = np.clip(y + ((116130 * cb + half) >> 16), 0, 255)
    g = np.clip(y + ((-22554 * cb - 46802 * cr + half) >> 16), 0, 255)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def _wav_decode_stdlib(payload: bytes) -> np.ndarray:
    """Pure-stdlib WAV decode via the ``wave`` module: PCM 8/16-bit →
    mono float64 in [-1, 1], matching soundfile's scaling (int16/32768,
    (uint8-128)/128) so the stdlib and soundfile paths are bit-identical
    on the same PCM payload."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wv:
        nch = wv.getnchannels()
        sw = wv.getsampwidth()
        raw = wv.readframes(wv.getnframes())
    if sw == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(
            f"stdlib WAV decoder handles 8/16-bit PCM only (got width {sw}); "
            "install soundfile"
        )
    if nch > 1:  # downmix to mono
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples


def _quantize_frames(samples: np.ndarray, *, frame: int = 64) -> np.ndarray:
    """Shared audio→thumbnail contract: mono [-1, 1] samples quantized to
    uint8 and framed into fixed ``frame``-wide rows. Trailing partial
    frames are ALWAYS dropped; a clip shorter than one frame yields the
    (1, 1) zero thumbnail (the same undecodable-floor as empty audio),
    so the contract has no short-clip exception."""
    q = np.clip((samples + 1.0) * 127.5, 0, 255).astype(np.uint8)
    n = (len(q) // frame) * frame
    if n == 0:
        return np.zeros((1, 1), np.uint8)
    return q[:n].reshape(-1, frame)


def real_decode(payload: bytes, fmt: str) -> np.ndarray:
    """Real codec decode. Per media family, the preferred library is
    import-probed (Pillow for images, soundfile for audio) with a
    pure-stdlib fallback for the open formats, so the real-decode path
    runs (and is golden-tested) even in lib-less environments.
    ``decoder=fake_decode`` remains the deterministic oracle path
    (m02/m03's splitmix64 SQL replay).

    Decode support matrix (stdlib fallback — what runs without any
    media library installed):

    ======  ==========================  ==================================
    format  stdlib coverage             parity vs preferred lib
    ======  ==========================  ==================================
    png     8-bit, color types          bit-identical to Pillow (lossless
            0/2/3/4/6, filters 0-4,     format + same ITU-R 601-2 integer
            non-interlaced              luma)
    jpeg    baseline SOF0, 8-bit,       libjpeg-faithful fixed-point
            gray/YCbCr, 4:4:4/4:2:2/    pipeline (islow IDCT, fancy
            4:2:0, restart markers      upsample, integer YCbCr+luma);
                                        byte parity with Pillow asserted
                                        for gray and 4:4:4 in the
                                        Pillow-gated golden half
    wav     8/16-bit PCM, any channel   bit-identical to soundfile (same
            count (downmixed)           PCM scaling)
    ======  ==========================  ==================================

    Progressive JPEG (SOF2), arithmetic coding, 12-bit precision,
    16-bit PNG, and float WAV raise ``NotImplementedError`` without the
    preferred library, as does any unwired format."""
    if fmt in ("jpeg", "png"):
        try:
            from PIL import Image
        except ImportError:
            if fmt == "png":
                return _png_decode_stdlib(payload)
            return _jpeg_decode_stdlib(payload)
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    if fmt == "wav":
        try:
            import soundfile as sf
        except ImportError:
            return _quantize_frames(_wav_decode_stdlib(payload))
        import io

        samples, _rate = sf.read(io.BytesIO(payload), dtype="float64")
        if samples.ndim > 1:  # downmix to mono
            samples = samples.mean(axis=1)
        return _quantize_frames(samples)
    raise NotImplementedError(
        f"no decoder wired for format {fmt!r}; "
        "pass decoder=fake_decode for deterministic testing"
    )


# Back-compat name: the default `decoder=` argument below predates the
# import-probed implementation.
real_decode_stub = real_decode


def decode_media(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    decoder: Decoder = real_decode_stub,
    out_h: int = 8,
    out_w: int = 8,
) -> DataFrame:
    """Decode + resize: (id, payload) → (id, h, w, pixels array<int>).

    mapInPandas so one Arrow batch crosses the JVM↔Python boundary per
    ~10k rows (not per row); the decoder runs inside the iterator. Resize
    here is nearest-neighbor index sampling — replace alongside the
    decoder when real libs exist.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads are undecodable — drop them here rather than
            # kill the task; quarantine upstream if they must be kept.
            pdf = pdf[pdf[bytes_col].notna()]
            pixels = []
            for payload, fmt in zip(pdf[bytes_col], pdf["__fmt"]):
                img = decoder(bytes(payload), fmt)
                yi = (np.arange(out_h) * img.shape[0] // out_h)[:, None]
                xi = (np.arange(out_w) * img.shape[1] // out_w)[None, :]
                pixels.append(img[yi, xi].astype(np.int64).ravel())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "h": np.full(len(pdf), out_h, dtype=np.int32),
                    "w": np.full(len(pdf), out_w, dtype=np.int32),
                    "pixels": pixels,
                }
            )

    prepped = df.select(
        F.col(id_col), F.col(bytes_col), sniff_format(bytes_col).alias("__fmt")
    )
    return prepped.mapInPandas(run, "id long, h int, w int, pixels array<long>")


def media_features(decoded: DataFrame, *, n_bins: int = 8) -> DataFrame:
    """Pixel-level features from decoded thumbnails — JVM-side over the
    array column (mean/std/histogram), so only the decode itself ever
    touched Python."""
    px = F.col("pixels")
    n = F.size(px)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x) / n
    bin_width = 256 // n_bins
    hist = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda b: F.size(
            F.filter(px, lambda x: F.floor(x / bin_width) == b.cast("bigint"))
        ),
    )
    return decoded.select(
        "id",
        mean.alias("px_mean"),
        F.sqrt(
            F.aggregate(px, F.lit(0.0), lambda a, x: a + x * x) / n - mean * mean
        ).alias("px_std"),
        hist.alias("px_hist"),
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    n_frames_col: str = "n_frames",
    k: int = 4,
    decoder: Decoder = real_decode_stub,
) -> DataFrame:
    """Execute the frame-sample plan end to end: each payload's k
    evenly-spaced frame indices (``plan_frame_sample``) are decoded —
    the decoder is called once per (payload, frame_idx), with the index
    mixed into the payload so distinct frames decode distinctly — and
    summarized to (id, frame_idx, px_mean, px_std).

    Scale shape: the plan explode is a narrow per-row fan-out (k rows
    per media, no shuffle); the decode crosses into Python once per
    Arrow batch via ``mapInPandas``; NULL payloads drop (same rule as
    decode_media). Per-frame seeking in a real container format
    belongs in the decoder (pyav `seek`), not the Spark plan — the
    plumbing here is identical either way.
    """
    planned = df.filter(F.col(bytes_col).isNotNull()).select(
        F.col(id_col),
        F.col(bytes_col),
        F.explode(plan_frame_sample(n_frames_col, k)).alias("frame_idx"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            ids, idxs, means, stds = [], [], [], []
            for rid, payload, idx in zip(
                pdf[id_col], pdf[bytes_col], pdf["frame_idx"]
            ):
                img = decoder(bytes(payload) + bytes([idx % 256]), "frame")
                ids.append(rid)
                idxs.append(idx)
                # stats from EXACT integer moments with one fixed float
                # expression each (not np.mean/np.std, whose pairwise
                # float folds are summation-order-dependent): pixel sums
                # are exact in int64, so mean/std are bit-reproducible
                # on any batch split — and SQL-oracle-checkable
                arr = img.astype(np.int64).ravel()
                s1 = int(arr.sum())
                s2 = int((arr * arr).sum())
                n = arr.size
                mean = s1 / n
                means.append(mean)
                stds.append(math.sqrt(s2 / n - mean * mean))
            yield pd.DataFrame(
                {
                    id_col: np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "px_mean": np.asarray(means, dtype=np.float64),
                    "px_std": np.asarray(stds, dtype=np.float64),
                }
            )

    return planned.mapInPandas(
        run, f"{id_col} long, frame_idx int, px_mean double, px_std double"
    )


#: 8-point DCT-II basis cos((2x+1)·u·π/16), scaled by 1e6 and rounded to
#: a FIXED integer table — perceptual-hash coefficients become exact
#: BIGINT sums, bit-identical across engines, partitionings, and BLAS
#: builds (a float DCT would be fold-order-dependent and unhashable).
import math as _math

DCT8_SCALE = 1_000_000
DCT8 = [
    [round(_math.cos((2 * x + 1) * u * _math.pi / 16) * DCT8_SCALE) for x in range(8)]
    for u in range(8)
]


def phash64(decoded: DataFrame, *, id_col: str = "id") -> DataFrame:
    """Perceptual hash from decoded 8×8 grayscale thumbnails: the sign
    bits of the 63 non-DC integer-scaled 2D DCT-II coefficients packed
    into one BIGINT (bit u*8+v-1 set iff C(u,v) > 0) — the classic
    pHash shape (DCT low-frequency signs survive resizing, recompression
    and small edits; the DC term only encodes brightness and is
    dropped). 63 bits keep the hash strictly positive, so no engine
    needs wrapping arithmetic.

    Plan shape: ONE narrow Arrow pass over (id, pixels) — the separable
    2D DCT as two exact int64 matrix products per batch
    (R = PX·Aᵀ, C = Σ_y R·A — numpy integer matmul, no floats anywhere)
    with the sign bits packed vectorized. The earlier formulation
    (explode to 64 rows, two 64-row broadcast joins, two hash
    aggregations) paid TWO Exchanges per call for arithmetic that is
    pure per-row batch math (guide §2.4: remove shuffles outright;
    §4.2: hand whole batches to vectorized native code). A same-session
    A/B on the sf0.1 corpus measured 5.1 s (join/aggregate) vs 1.3 s
    (this pass), bit-identical over every hash. Only (id, pixels) cross
    the boundary — payloads and metadata never re-cross (§4.1). All
    exact BIGINT (|R| ≤ 2.1e9, |C| ≤ 1.6e16 ≪ 2^63); the factored sums
    are the same integer terms as the joined formulation, and integer
    arithmetic is order-free, so hashes are bit-identical to it and to
    the SQL oracles.
    """

    def run(batches):
        # mapInArrow: the array<long> pixels column is one contiguous
        # int64 buffer + offsets, so the (n, 8, 8) cube is a single
        # buffer reshape — the pandas form paid a per-row object
        # conversion + np.stack over object cells (guide §4.2, same
        # move as _verify_exact's prescore).
        import pyarrow as pa

        A = np.array(DCT8, dtype=np.int64)  # (u, x) basis == (v, y) basis
        upos, vpos = np.arange(8)[:, None], np.arange(8)[None, :]
        shifts = np.clip(upos * 8 + vpos - 1, 0, None)
        bitw = np.where(
            (upos == 0) & (vpos == 0), np.int64(0), np.int64(1) << shifts
        )  # DC term masked: brightness only, dropped
        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            # ravel() row-major over (h, w): reshape back to (n, y, x)
            px = (
                np.asarray(rb.column(names.index("pixels")).flatten())
                .astype(np.int64, copy=False)
                .reshape(-1, 8, 8)
            )
            r = px @ A.T  # (n, y, u): Σ_x px[y,x]·DCT8[u][x]
            c = np.einsum("nyu,vy->nuv", r, A)  # (n, u, v), exact int64
            ph = ((c > 0).astype(np.int64) * bitw).sum(axis=(1, 2))
            yield pa.RecordBatch.from_arrays(
                [rb.column(names.index(id_col)), pa.array(ph, type=pa.int64())],
                names=[id_col, "phash"],
            )

    return decoded.select(id_col, "pixels").mapInArrow(
        run, f"{id_col} long, phash long"
    )


def _phash_banded(vals: DataFrame, n_bands: int) -> DataFrame:
    """(phash, band_idx, band_val) — each hash exploded into its 16-bit
    pigeonhole band keys (the probe-side index rows)."""
    return vals.select(
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("int")
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )


def _phash_value_pairs(
    vals: DataFrame, *, max_hamming: int, n_bands: int
) -> DataFrame:
    """Verified (``__pha``, ``__phb``, ``hamming``) pairs between
    DISTINCT hash values: pigeonhole 16-bit band self-join + exact
    bit_count(xor) — the shared candidate core of ``phash_pairs`` and
    ``phash_clusters``. Shuffle is O(distinct hashes × bands)."""
    banded = _phash_banded(vals, n_bands)
    a = banded.alias("a")
    b = banded.alias("b")
    # each unordered VALUE pair once per shared band -> distinct over
    # the (tiny) verified value-pair set, never over record pairs
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.phash") < F.col("b.phash")),
        )
        .select(
            F.col("a.phash").alias("__pha"),
            F.col("b.phash").alias("__phb"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("__pha").bitwiseXOR(F.col("__phb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def phash_pairs(
    hashes: DataFrame,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes: pigeonhole
    band join (any pair within ``max_hamming`` agrees exactly on at
    least one of ``n_bands`` 16-bit chunks — exact recall requires
    ``max_hamming < n_bands``), then exact Hamming verification via
    bit_count(xor).

    Two-level, like ``operators/fuzzy.fuzzy_self_pairs``: candidates
    are generated over DISTINCT hash VALUES, then matched value pairs
    expand back to record pairs through output-proportional hash
    joins. Identical hashes (the dominant real-corpus case — exact
    re-uploads form huge cliques) therefore cost one join fan-out
    each, never a per-record band join: the record-level formulation
    put every m-clique through all ``n_bands`` bands (m² · bands
    candidate rows) and needed a record-pair ``distinct`` to collapse
    them (measured 52× wall at the 10× scale probe, m10). Value-level
    candidates are Σ per-(band, chunk) C(distinct values, 2) — never
    worse, and the verification bit_count runs once per value pair.
    Shuffle is O(distinct hashes × bands) + O(output)."""
    assert max_hamming < n_bands, "pigeonhole exactness requires max_hamming < n_bands"
    vals = hashes.select("phash").distinct()
    vpairs = _phash_value_pairs(vals, max_hamming=max_hamming, n_bands=n_bands)
    ra = hashes.select(F.col(id_col).alias("__ida"), F.col("phash").alias("__pha"))
    rb = hashes.select(F.col(id_col).alias("__idb"), F.col("phash").alias("__phb"))
    cross = (
        vpairs.join(ra, "__pha")
        .join(rb, "__phb")
        .select(
            F.least("__ida", "__idb").alias("id_a"),
            F.greatest("__ida", "__idb").alias("id_b"),
            "hamming",
        )
    )
    same = (
        ra.join(rb.withColumnRenamed("__phb", "__pha"), "__pha")
        .filter(F.col("__ida") < F.col("__idb"))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def phash_clusters(
    hashes: DataFrame,
    id_col: str,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Per-image near-dup cluster label + canonical keep flag — the
    scale-safe CONSUMER contract over the pHash pair graph (downstream
    keep/drop joins read O(images) labels, never the O(clique²) pair
    list ``phash_pairs`` is contractually bound to emit).

    Identical hashes CONTRACT to one vertex before the closure: each
    distinct hash is represented by its min record id, the component
    computation runs on the VALUE graph (O(distinct hashes) nodes,
    verified value pairs as edges), and record labels come back through
    one hash-value join. Running the closure on record pairs instead is
    output-quadratic in clique size — the 10× scale probe measured that
    formulation at 63× wall; the contraction is exact (records sharing a
    hash are pairwise Hamming-0, i.e. always one cluster, and component
    min-rep = the transitive group's min record id since every record id
    ≥ its hash's representative)."""
    from censo_escolar_spark.operators.dedup import clusters_from_pairs

    assert max_hamming < n_bands, "pigeonhole exactness requires max_hamming < n_bands"
    # two consumers (value pairs + label rejoin) — cut the lineage once
    reps = (
        hashes.groupBy("phash")
        .agg(F.min(id_col).alias("__rep"))
        .localCheckpoint(eager=True)
    )
    vpairs = _phash_value_pairs(
        reps.select("phash"), max_hamming=max_hamming, n_bands=n_bands
    )
    edges = (
        vpairs.join(
            reps.select(F.col("phash").alias("__pha"), F.col("__rep").alias("id_a")),
            "__pha",
        )
        .join(
            reps.select(F.col("phash").alias("__phb"), F.col("__rep").alias("id_b")),
            "__phb",
        )
        .select("id_a", "id_b")
    )
    labels = clusters_from_pairs(
        reps.select(F.col("__rep").alias(id_col)), edges, id_col, max_iter=max_iter
    ).select(F.col(id_col).alias("__rep"), "cluster_id")
    return (
        hashes.join(reps, "phash")
        .join(labels, "__rep")
        .select(
            F.col(id_col),
            "cluster_id",
            (F.col(id_col) == F.col("cluster_id")).alias("keep"),
        )
    )


def plan_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    shard_budget: int = 1 << 16,
    bucket_size: int = 100,
) -> DataFrame:
    """Offset-based shard plan for packing media payloads into
    ~``shard_budget``-byte archive shards (the WebDataset/tar-shard
    layout step before training ingestion).

    Every payload gets a virtual byte offset = the cumulative size of
    its predecessors in deterministic id order; its shard is
    ``offset div budget``. Shards may run over budget by at most one
    payload's tail — the price for a plan that is a pure function of
    (sizes, order), reproducible on any partitioning.

    Scale shape: the running sum is windowed per BUCKET (``id div
    bucket_size``), never globally — each bucket is an independent
    shard namespace, so the plan parallelizes to any corpus size
    (shard ids are (bucket, idx) pairs). One shuffle on the bucket.
    """
    size = F.octet_length(F.col(bytes_col)).cast("bigint")
    w = (
        Window.partitionBy("shard_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = df.select(
        F.col(id_col),
        (F.col(id_col) / bucket_size).cast("long").alias("shard_bucket"),
        size.alias("n_bytes"),
    )
    off = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    # BIGINT floor division (never a double route: cumulative bytes at
    # corpus scale exceed double's exact-integer range)
    return sized.select(
        id_col, "shard_bucket", "n_bytes", off.alias("__off")
    ).select(
        id_col,
        "shard_bucket",
        "n_bytes",
        F.expr(f"__off div {int(shard_budget)}").cast("long").alias("shard_idx"),
        F.expr(f"__off % {int(shard_budget)}").cast("bigint").alias("byte_offset"),
    )


def plan_audio_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "payload",
    rate_col: str = "sample_rate",
    channels_col: str = "channels",
    frame_len: int = 1024,
    hop: int = 512,
) -> DataFrame:
    """Audio framing plan over raw PCM (s16le) payloads: one row per
    fully-contained analysis frame, with its sample/byte offsets and
    start time. The plan half of an audio feature pipeline (the decode
    half — RMS/FFT per frame — is an Arrow batch over these offsets,
    same split as image decode in ``sample_frames``).

    Everything is BIGINT arithmetic on (octet_length, rate, channels) —
    no payload byte ever leaves the JVM, so the plan is oracle-checkable
    and the scan can prune the binary column entirely. Frame count per
    payload is ``(n_samples - frame_len) div hop + 1`` (payloads shorter
    than one frame emit nothing); the explode fan-out is proportional to
    audio duration, the same narrow shape as token chunking.
    """
    sized = df.select(
        F.col(id_col),
        F.col(rate_col).cast("bigint").alias("sample_rate"),
        F.col(channels_col).cast("bigint").alias("channels"),
        F.expr(f"octet_length({bytes_col}) div ({channels_col} * 2)")
        .cast("bigint")
        .alias("n_samples"),
    )
    framed = sized.select(
        "*",
        F.when(
            F.col("n_samples") < frame_len, F.lit(0).cast("bigint")
        )
        .otherwise(
            F.expr(f"(n_samples - {frame_len}) div {hop}").cast("bigint") + 1
        )
        .alias("n_frames"),
        F.expr("n_samples * 1000000 div sample_rate")
        .cast("bigint")
        .alias("duration_us"),
    )
    frames = framed.filter(F.col("n_frames") > 0).select(
        "*", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1)).alias("frame_idx")
    )
    return frames.select(
        id_col,
        "sample_rate",
        "channels",
        "n_samples",
        "n_frames",
        "duration_us",
        "frame_idx",
        (F.col("frame_idx") * hop).alias("sample_offset"),
        (F.col("frame_idx") * hop * F.col("channels") * 2).alias("byte_offset"),
        F.expr(f"frame_idx * {hop} * 1000000 div sample_rate")
        .cast("bigint")
        .alias("frame_start_us"),
    )

"""Stdlib-only PNG codec — the one real codec behind the multimodal hooks.

The container ships no image libraries, so ``multimodal.decode_features``
/ ``resize_media`` default to deterministic fakes. This module implements
actual PNG decode/encode from the public spec (RFC 2083) with nothing but
``zlib`` + ``struct``, so the multimodal plumbing can be exercised against
real image bytes: IHDR parse, IDAT inflate, all five scanline filters
(None/Sub/Up/Average/Paeth), and a filter-0 encoder for round-trips.

Scope: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced — the
shapes a training pipeline actually stores. Palette, 16-bit, and Adam7
raise ``NotImplementedError`` loudly rather than decoding wrong.

The hooks (``feature_fn``, ``resize``) slot into the multimodal operators'
``decode_fn`` / ``resize_fn`` parameters unchanged — the Arrow/mapInPandas
plumbing is identical for fake and real codecs by design.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "png_info",
    "png_decode",
    "png_encode",
    "resize",
    "feature_fn",
    "average_hash",
]

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (type 3 = palette, unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        yield typ, data[pos + 8 : pos + 8 + ln]
        if typ == b"IEND":
            return
        pos += 12 + ln


def png_info(payload: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, bit_depth, color_type, interlace) from IHDR."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    for typ, d in _chunks(payload):
        if typ == b"IHDR":
            try:
                w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                    ">IIBBBBB", d
                )
            except struct.error as e:
                # keep the module's documented error surface: truncated
                # IHDR (cut-off upload) is invalid data, not a crash
                raise ValueError(f"truncated IHDR chunk: {e}") from e
            return w, h, depth, ctype, inter
    raise ValueError("PNG has no IHDR chunk")


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """payload → (width, height, channels, raw pixels row-major).

    Undoes zlib compression and per-scanline filtering per the spec;
    pixels come back as ``width*height*channels`` bytes.
    """
    w, h, depth, ctype, inter = png_info(payload)
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8-bit supported)")
    if inter != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    ch = _CHANNELS.get(ctype)
    if ch is None:
        raise NotImplementedError(f"color type {ctype} (palette unsupported)")
    raw = zlib.decompress(
        b"".join(d for t, d in _chunks(payload) if t == b"IDAT")
    )
    stride = w * ch
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT size does not match dimensions")
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if f == 1:  # Sub: add left neighbor
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up: add the pixel above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average of left and above
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid scanline filter {f}")
        out += line
        prev = line
    return w, h, ch, bytes(out)


def png_encode(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Raw row-major pixels → PNG bytes (8-bit, filter 0, one IDAT)."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if ctype is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor PNG resize — drops into ``resize_media``'s
    ``resize_fn`` hook: PNG in, PNG of the requested dimensions out."""
    w, h, ch, px = png_decode(payload)
    out = bytearray()
    for y in range(height):
        sy = y * h // height
        row_base = sy * w
        for x in range(width):
            i = (row_base + x * w // width) * ch
            out += px[i : i + ch]
    return png_encode(bytes(out), width, height, ch)


def feature_fn(dim: int = 64):
    """Build a ``decode_features``-compatible hook: PNG → ``dim`` floats.

    Mean-pools the normalized pixel stream into ``dim`` equal buckets —
    a real (if simple) visual signature, deterministic, any image size.
    """

    def features(payload: bytes) -> list[float]:
        _w, _h, _ch, px = png_decode(payload)
        n = len(px)
        if n == 0:
            return [0.0] * dim
        out = []
        for b in range(dim):
            lo = b * n // dim
            hi = max(lo + 1, (b + 1) * n // dim)
            seg = px[lo:hi]
            out.append(sum(seg) / (255.0 * len(seg)))
        return out

    return features


def average_hash(payload: bytes, hash_size: int = 8) -> tuple[int, int]:
    """Perceptual average-hash (aHash) of a PNG: decode → grayscale →
    block-mean downsample to ``hash_size``² cells → bit per cell =
    "cell brighter than the global mean". Returns the 64 bits (for the
    default 8×8) packed little-endian into TWO 32-bit ints ``(lo, hi)``
    — the ``dedup.packed_hamming_pairs`` signature layout, chosen over
    one 64-bit pack for the same bit-63 reason as the portable SimHash.

    Robust to re-encoding, small pixel noise, and nearest-neighbor
    rescaling (an integer-factor upscale of an image whose dimensions
    are multiples of ``hash_size`` preserves every block mean exactly —
    unit-pinned; other shapes shift cell boundaries by a pixel and may
    flip a few bits, still well inside the Hamming-3 band); brightness
    inversion flips every bit.
    Deterministic pure-stdlib arithmetic: grayscale = sum of the first
    min(channels, 3) samples (alpha ignored), means compared
    cross-multiplied in integers so no float enters the hash.
    """
    if hash_size < 1 or hash_size * hash_size > 64:
        raise ValueError("hash_size must be in 1..8 (bits must fit 64)")
    w, h, ch, px = png_decode(payload)
    if w < 1 or h < 1:
        raise ValueError("empty image")
    cc = min(ch, 3)
    try:  # numpy fast path: identical integer sums, vectorized
        import numpy as np

        a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, ch)
        g = a[:, :, :cc].sum(axis=2, dtype=np.int64)
        cell = (
            (np.arange(h, dtype=np.int64) * hash_size // h)[:, None] * hash_size
            + (np.arange(w, dtype=np.int64) * hash_size // w)[None, :]
        ).ravel()
        n_cells = hash_size * hash_size
        # bincount weights are float64 but every partial sum is an
        # integer < 2^53, so the accumulation is exact
        sums = [
            int(v)
            for v in np.bincount(
                cell, weights=g.ravel(), minlength=n_cells
            )
        ]
        counts = [int(v) for v in np.bincount(cell, minlength=n_cells)]
    except ImportError:  # stdlib fallback: same arithmetic, looped
        sums = [0] * (hash_size * hash_size)
        counts = [0] * (hash_size * hash_size)
        for y in range(h):
            gy = y * hash_size // h
            row = y * w
            for x in range(w):
                i = (row + x) * ch
                g = 0
                for c in range(cc):
                    g += px[i + c]
                cell = gy * hash_size + (x * hash_size // w)
                sums[cell] += g
                counts[cell] += 1
    total = sum(sums)
    n_px = w * h
    lo = hi = 0
    for cell in range(hash_size * hash_size):
        # cell_mean > global_mean  ⇔  sums/counts > total/n_px — compare
        # cross-multiplied so the hash never touches floats
        if sums[cell] * n_px > total * counts[cell]:
            if cell < 32:
                lo |= 1 << cell
            else:
                hi |= 1 << (cell - 32)
    return lo, hi

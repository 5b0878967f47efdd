"""Texture/image IO in pure NumPy (no vendored C).

Replaces the reference's loaders: 24-bit BMP (reference bitmap.cpp:40-105,
scanline padding + BGR→RGB + float conversion), a minimal OpenEXR scanline
reader standing in for vendored TinyEXR (reference
third_party/tiny_exr_loader.h, used at material.cpp:71-94), and PNG/PPM
output for the display buffer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def load_bmp(path: str) -> np.ndarray:
    """24-bit uncompressed BMP → float32 [H,W,3] in [0,1], RGB, row 0 = bottom.

    Mirrors reference bitmap.cpp:40-105: scanlines padded to 4 bytes,
    BGR byte order, value/255 conversion.  (BMP stores rows bottom-up; the
    reference keeps that order and so do we.)
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size >= 40:
        width, height = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
    else:  # BITMAPCOREHEADER
        width, height = struct.unpack_from("<hh", data, 18)
        bpp = struct.unpack_from("<H", data, 24)[0]
        compression = 0
    if bpp != 24 or compression != 0:
        raise ValueError(f"{path}: only 24-bit uncompressed BMP supported (got {bpp}bpp)")
    flipped = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    img = np.frombuffer(data, np.uint8, stride * height, pixel_offset)
    img = img.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    img = img[:, :, ::-1].astype(np.float32) / 255.0  # BGR → RGB
    if flipped:
        img = img[::-1]
    return np.ascontiguousarray(img)


# --- minimal OpenEXR reader -------------------------------------------------

_EXR_MAGIC = 20000630
_PIX_UINT, _PIX_HALF, _PIX_FLOAT = 0, 1, 2
_COMP_NONE, _COMP_RLE, _COMP_ZIPS, _COMP_ZIP = 0, 1, 2, 3
_COMP_NAMES = {4: "PIZ", 5: "PXR24", 6: "B44", 7: "B44A", 8: "DWAA",
               9: "DWAB"}


def _read_cstr(data, off):
    end = data.index(b"\x00", off)
    return data[off:end].decode("latin-1"), end + 1


def _rle_decode(src: bytes) -> bytes:
    """OpenEXR RLE: signed count c — c < 0 → −c literal bytes follow;
    c ≥ 0 → the next byte repeats c+1 times (tiny_exr_loader.h RLE path)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c > 127:  # negative int8 → literal run
            cnt = 256 - c
            out += src[i + 1: i + 1 + cnt]
            i += 1 + cnt
        else:
            out += src[i + 1: i + 2] * (c + 1)
            i += 2
    return bytes(out)


def _exr_unpredict(raw: bytes) -> bytes:
    """Undo the EXR delta predictor + two-half interleave (shared by the
    ZIP/ZIPS and RLE codecs)."""
    buf = np.frombuffer(raw, np.uint8).astype(np.int64)
    deltas = np.cumsum(np.concatenate([buf[:1], (buf[1:] - 128)])).astype(np.uint8)
    half = (len(deltas) + 1) // 2
    out = np.zeros(len(deltas), np.uint8)
    out[0::2] = deltas[:half]
    out[1::2] = deltas[half: half + len(deltas) - half]
    return out.tobytes()


def load_exr(path: str) -> np.ndarray:
    """Minimal scanline OpenEXR reader → float32 [H,W,3] (R,G,B).

    Supports single-part scanline files with NONE/ZIPS/ZIP compression and
    HALF/FLOAT channels — the formats TinyEXR-loaded sky domes actually use.
    """
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<iI", data, 0)
    if magic != _EXR_MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR not supported")

    off = 8
    channels = []
    compression = None
    data_window = None
    while True:
        name, off = _read_cstr(data, off)
        if not name:
            break
        atype, off = _read_cstr(data, off)
        size = struct.unpack_from("<I", data, off)[0]
        off += 4
        payload = data[off: off + size]
        off += size
        if name == "channels":
            coff = 0
            while payload[coff] != 0:
                cname, coff = _read_cstr(payload, coff)
                ptype = struct.unpack_from("<i", payload, coff)[0]
                coff += 16  # pixel type + pLinear/reserved + x/y sampling
                channels.append((cname, ptype))
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<4i", payload)

    x0, y0, x1, y1 = data_window
    width = x1 - x0 + 1
    height = y1 - y0 + 1
    channels.sort(key=lambda c: c[0])  # EXR stores channels alphabetically
    nch = len(channels)

    if compression == _COMP_ZIP:
        lines_per_block = 16
    elif compression in (_COMP_NONE, _COMP_ZIPS, _COMP_RLE):
        lines_per_block = 1
    else:
        name = _COMP_NAMES.get(compression, str(compression))
        raise ValueError(
            f"{path}: EXR compression {name} is not supported "
            "(supported: NONE, RLE, ZIPS, ZIP). Re-encode the file, e.g. "
            "`oiiotool in.exr --compression zip -o out.exr`.")

    n_blocks = (height + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}Q", data, off)

    dtype_of = {_PIX_HALF: np.float16, _PIX_FLOAT: np.float32, _PIX_UINT: np.uint32}
    chan_arrays = {c: np.zeros((height, width), np.float32) for c, _ in channels}

    for block_off in offsets:
        y, size = struct.unpack_from("<iI", data, block_off)
        raw = data[block_off + 8: block_off + 8 + size]
        n_lines = min(lines_per_block, y1 - y + 1)
        expect = sum(
            width * n_lines * np.dtype(dtype_of[pt]).itemsize for _, pt in channels
        )
        if compression in (_COMP_ZIP, _COMP_ZIPS) and size < expect:
            raw = _exr_unpredict(zlib.decompress(raw))
        elif compression == _COMP_RLE and size < expect:
            raw = _exr_unpredict(_rle_decode(raw))
        pos = 0
        for line in range(n_lines):
            yy = y - y0 + line
            for cname, ptype in channels:
                dt = dtype_of[ptype]
                nbytes = width * np.dtype(dt).itemsize
                row = np.frombuffer(raw, dt, width, pos)
                chan_arrays[cname][yy] = row.astype(np.float32)
                pos += nbytes

    def chan(name):
        if name in chan_arrays:
            return chan_arrays[name]
        if "Y" in chan_arrays:  # grayscale
            return chan_arrays["Y"]
        return np.zeros((height, width), np.float32)

    return np.stack([chan("R"), chan("G"), chan("B")], axis=-1)


def load_texture(path: str) -> np.ndarray:
    """Dispatch by extension, reference material.cpp:63-95 semantics."""
    lower = path.lower()
    if lower.endswith(".bmp"):
        return load_bmp(path)
    if lower.endswith(".exr"):
        return load_exr(path)
    raise ValueError(f"unsupported texture format: {path}")


# --- output ----------------------------------------------------------------


def write_ppm(path: str, image_u8: np.ndarray):
    h, w = image_u8.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(image_u8).tobytes())


def write_png(path: str, image_u8: np.ndarray):
    """Minimal PNG writer (RGB8) using zlib — no external deps."""
    h, w = image_u8.shape[:2]
    raw = b"".join(
        b"\x00" + np.ascontiguousarray(image_u8[i]).tobytes() for i in range(h)
    )

    def chunk(tag, payload):
        out = struct.pack(">I", len(payload)) + tag + payload
        return out + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_image(path: str, image_u8: np.ndarray):
    if path.lower().endswith(".ppm"):
        write_ppm(path, image_u8)
    else:
        write_png(path, image_u8)

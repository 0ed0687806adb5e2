"""Minimal dependency-free PNG writer (host-side output path).

The reference's (commented-out) frame capture writes PNGs via the Rust
image crate (demo-save/src/main.rs:34-49); this is the equivalent output
path for the Python frontends. Pure stdlib: zlib + struct.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def write_png(path: str, img) -> None:
    """Write an (h, w, 3) float [0,1] or uint8 image as RGB8 PNG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", header)
           + _chunk(b"IDAT", zlib.compress(raw, 6))
           + _chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def argb_to_rgb(fb) -> np.ndarray:
    """Unpack an (h, w) uint32 ARGB framebuffer (engine/api.py render) to
    (h, w, 3) uint8."""
    fb = np.asarray(fb, np.uint32)
    return np.stack([(fb >> 16) & 0xFF, (fb >> 8) & 0xFF, fb & 0xFF],
                    axis=-1).astype(np.uint8)

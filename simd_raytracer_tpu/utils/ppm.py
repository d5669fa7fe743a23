"""ASCII P3 PPM writer, byte-compatible with the reference writer
(reference: include/raytracer/io/image/ppm.hpp:7-25): header `P3`, `W H`,
`255`, then one image row per line with `R G B\t` per pixel, where each
channel is `uint8(255.999 * clamp(c, 0, 1))` (truncating cast).
"""

from __future__ import annotations

import io

import numpy as np


def image_to_u8(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) float -> uint8 via the reference's 255.999*clamp cast.

    Arithmetic is kept in float32 (the reference's F=float) so the Python
    and C++ (native/ppm.cpp) encoders truncate identically at integer
    boundaries."""
    img = np.asarray(img, np.float32)
    return (np.float32(255.999) * np.clip(img, 0.0, 1.0)).astype(np.uint8)


def write_ppm(img: np.ndarray, stream) -> None:
    """Write (H, W, 3) float image as ASCII P3 to a text stream."""
    h, w = img.shape[:2]
    u8 = image_to_u8(img)
    stream.write(f"P3\n{w} {h}\n255\n")
    for row in u8:
        stream.write("".join(f"{r} {g} {b}\t" for r, g, b in row) + "\n")


def ppm_bytes(img: np.ndarray, use_native: bool = None) -> bytes:
    """Encode to P3 bytes; uses the C++ encoder (native/ppm.cpp) when the
    shared library is built (byte-identical, tested in test_native.py)."""
    if use_native is None or use_native:
        from ..native import native_ppm_encode
        out = native_ppm_encode(np.asarray(img, np.float32))
        if out is not None:
            return out
        if use_native:
            raise RuntimeError("native PPM encoder requested but the shared "
                               "library is not built; run `make -C native`")
    buf = io.StringIO()
    write_ppm(img, buf)
    return buf.getvalue().encode()


def save_ppm(img: np.ndarray, path: str) -> None:
    with open(path, "wb") as f:
        f.write(ppm_bytes(img))


def read_ppm(path: str) -> np.ndarray:
    """Read an ASCII P3 PPM back into a (H, W, 3) uint8 array (for tests)."""
    with open(path, "r") as f:
        tokens = f.read().split()
    assert tokens[0] == "P3"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4:4 + w * h * 3], dtype=np.int64)
    assert maxv == 255
    return data.reshape(h, w, 3).astype(np.uint8)

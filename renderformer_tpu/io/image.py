"""Image and video IO: EXR (HDR), PNG (LDR), MP4.

The reference writes EXR+PNG via imageio's FreeImage plugin and MP4 via
ffmpeg (infer.py:100-106, batch_infer.py:159-174).  This environment has
no EXR backend and no ffmpeg binary, so EXR is implemented natively here
(OpenEXR 2.0 single-part scanline, uncompressed float32 — readable by any
EXR consumer) and video uses cv2.VideoWriter.
"""

from __future__ import annotations

import os
import struct
from typing import List

import numpy as np

_EXR_MAGIC = 0x01312f76
_PIXEL_FLOAT = 2  # OpenEXR FLOAT (fp32)


def _attr(name: bytes, type_: bytes, value: bytes) -> bytes:
    return name + b'\x00' + type_ + b'\x00' + struct.pack('<i', len(value)) + value


def write_exr(path: str, img: np.ndarray) -> None:
    """Write [H, W, 3] float32 RGB as uncompressed scanline EXR."""
    img = np.asarray(img, dtype=np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f'expected [H, W, 3] image, got {img.shape}')
    h, w, _ = img.shape

    # channel list must be alphabetically sorted: B, G, R
    chlist = b''
    for name in (b'B', b'G', b'R'):
        chlist += (name + b'\x00' + struct.pack('<i', _PIXEL_FLOAT)
                   + struct.pack('<i', 0)  # pLinear + reserved
                   + struct.pack('<ii', 1, 1))  # x/y sampling
    chlist += b'\x00'

    box = struct.pack('<iiii', 0, 0, w - 1, h - 1)
    header = b''
    header += _attr(b'channels', b'chlist', chlist)
    header += _attr(b'compression', b'compression', b'\x00')  # NO_COMPRESSION
    header += _attr(b'dataWindow', b'box2i', box)
    header += _attr(b'displayWindow', b'box2i', box)
    header += _attr(b'lineOrder', b'lineOrder', b'\x00')  # INCREASING_Y
    header += _attr(b'pixelAspectRatio', b'float', struct.pack('<f', 1.0))
    header += _attr(b'screenWindowCenter', b'v2f', struct.pack('<ff', 0, 0))
    header += _attr(b'screenWindowWidth', b'float', struct.pack('<f', 1.0))
    header += b'\x00'

    preamble = struct.pack('<ii', _EXR_MAGIC, 2)  # magic, version 2
    offset_table_pos = len(preamble) + len(header)
    first_chunk = offset_table_pos + 8 * h
    row_bytes = 8 + 3 * w * 4  # y + size prefix + 3 channels
    offsets = [first_chunk + i * row_bytes for i in range(h)]

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(preamble)
        f.write(header)
        f.write(struct.pack(f'<{h}Q', *offsets))
        bgr = img[:, :, ::-1]  # channel order B, G, R
        for y in range(h):
            f.write(struct.pack('<ii', y, 3 * w * 4))
            f.write(np.ascontiguousarray(bgr[y].T).tobytes())


def read_exr(path: str) -> np.ndarray:
    """Read EXRs produced by :func:`write_exr` (uncompressed fp32 BGR)."""
    with open(path, 'rb') as f:
        data = f.read()
    magic, version = struct.unpack_from('<ii', data, 0)
    if magic != _EXR_MAGIC:
        raise ValueError('not an EXR file')
    pos = 8
    attrs = {}
    while data[pos] != 0:
        end = data.index(b'\x00', pos)
        name = data[pos:end].decode()
        pos = end + 1
        end = data.index(b'\x00', pos)
        type_ = data[pos:end].decode()
        pos = end + 1
        size, = struct.unpack_from('<i', data, pos)
        pos += 4
        attrs[name] = (type_, data[pos:pos + size])
        pos += size
    pos += 1
    if attrs['compression'][1] != b'\x00':
        raise NotImplementedError('only uncompressed EXR supported')
    x0, y0, x1, y1 = struct.unpack('<iiii', attrs['dataWindow'][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    pos += 8 * h  # offset table
    img = np.empty((h, w, 3), np.float32)
    for _ in range(h):
        y, size = struct.unpack_from('<ii', data, pos)
        pos += 8
        row = np.frombuffer(data, np.float32, count=3 * w, offset=pos)
        img[y] = row.reshape(3, w).T
        pos += size
    return img[:, :, ::-1]  # BGR -> RGB


def write_png(path: str, img_u8: np.ndarray) -> None:
    import imageio
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imageio.v3.imwrite(path, img_u8)


def write_video(path: str, frames: List[np.ndarray], fps: int = 24) -> None:
    """Write uint8 RGB frames to MP4 (batch_infer.py:170-174 equivalent)."""
    import cv2
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*'mp4v'), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f'cannot open video writer for {path}')
    for frame in frames:
        writer.write(frame[:, :, ::-1])  # RGB -> BGR
    writer.release()

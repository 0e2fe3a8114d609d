"""HDF5 scene container IO.

Field layout is byte-compatible with the reference
(/root/reference/scene_processor/to_h5.py:87-92, infer.py:12-30):
datasets ``triangles`` [N,3,3] f32, ``vn`` [N,3,3] f32, ``texture``
[N,13,32,32] f16, ``c2w`` [V,4,4] f32, ``fov`` [V] f32.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Optional

import h5py
import numpy as np


def load_scene_h5(file_path: str, padding_length: Optional[int] = None,
                  texture_dtype=np.float32) -> Dict[str, np.ndarray]:
    """Load one scene; optionally zero-pad triangles to ``padding_length``
    with a validity mask (batch_infer.py:37-47).

    ``texture_dtype=np.float16`` keeps the texture in its on-disk H5
    dtype (to_h5.py stores f16) — LOSSLESS, and halves the bytes a
    training batch ships host->device (the padded texture dominates)."""
    with h5py.File(file_path, 'r') as f:
        triangles = np.asarray(f['triangles'], dtype=np.float32)
        texture = np.asarray(f['texture'], dtype=texture_dtype)
        vn = np.asarray(f['vn'], dtype=np.float32)
        c2w = np.asarray(f['c2w'], dtype=np.float32)
        fov = np.asarray(f['fov'], dtype=np.float32)

    num_tris = triangles.shape[0]
    if padding_length is not None:
        if padding_length < num_tris:
            raise ValueError(
                f'padding_length {padding_length} < triangle count {num_tris}')
        pad = padding_length - num_tris
        triangles = np.concatenate(
            [triangles, np.zeros((pad,) + triangles.shape[1:], np.float32)])
        texture = np.concatenate(
            [texture, np.zeros((pad,) + texture.shape[1:], texture.dtype)])
        vn = np.concatenate([vn, np.zeros((pad,) + vn.shape[1:], np.float32)])
        mask = np.zeros(padding_length, dtype=bool)
        mask[:num_tris] = True
    else:
        mask = np.ones(num_tris, dtype=bool)

    return {'triangles': triangles, 'texture': texture, 'mask': mask,
            'vn': vn, 'c2w': c2w, 'fov': fov}


def save_scene_h5(path: str, triangles, vn, texture, c2w, fov) -> None:
    """Write the reference H5 layout (gzip-9, to_h5.py:87-92)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, 'w') as f:
        f.create_dataset('triangles', data=np.asarray(triangles, np.float32),
                         compression='gzip', compression_opts=9)
        f.create_dataset('vn', data=np.asarray(vn, np.float32),
                         compression='gzip', compression_opts=9)
        f.create_dataset('texture', data=np.asarray(texture, np.float16),
                         compression='gzip', compression_opts=9)
        f.create_dataset('c2w', data=np.asarray(c2w, np.float32),
                         compression='gzip', compression_opts=9)
        f.create_dataset('fov', data=np.asarray(fov, np.float32),
                         compression='gzip', compression_opts=9)


def load_cameras_h5(file_path: str):
    """Load only the per-frame camera datasets (c2w [V,4,4], fov [V]).

    The static-scene video path (VideoSceneDataset) reads cameras per
    frame but the heavy scene tensors (~10^2 MB of gzip'd texture
    patches) only once — the per-frame H5s of a camera-orbit video
    duplicate them byte-for-byte."""
    with h5py.File(file_path, 'r') as f:
        return (np.asarray(f['c2w'], dtype=np.float32),
                np.asarray(f['fov'], dtype=np.float32))


def _geometry_digest(file_path: str) -> str:
    """Cheap per-frame guard for the static-scene assumption: hash of the
    raw ``triangles`` + ``vn`` datasets (~300 KB at 4k tris) plus a
    STRIDED texture fingerprint — <=64 triangle rows of the texture
    dataset (~1.7 MB decompressed), so material/emission animation that
    only starts at frame >=2 raises like geometry animation does instead
    of silently rendering every frame with frame-0 texture (ADVICE r3
    medium #1).  Full-texture hashing would cost ~10^2 MB of gzip
    decompression per frame; the strided rows catch any texture edit that
    touches >=1/64th of the triangles, and the frames-0/1 bitwise probe
    already gates entry to this path."""
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    with h5py.File(file_path, 'r') as f:
        for k in ('triangles', 'vn'):
            arr = np.ascontiguousarray(np.asarray(f[k]))
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
        tex = f['texture']
        h.update(str(tex.shape).encode())
        stride = max(1, tex.shape[0] // 64)
        sample = np.ascontiguousarray(tex[::stride])
        h.update(sample.tobytes())
    return h.hexdigest()


def probe_static_scene(files: List[str]) -> bool:
    """True if the folder looks like a camera-only animation: the first
    two frames' scene tensors (triangles, vn, texture) are bitwise
    equal. Single-file folders count as static."""
    if len(files) < 2:
        return True
    with h5py.File(files[0], 'r') as a, h5py.File(files[1], 'r') as b:
        for k in ('triangles', 'vn', 'texture'):
            da, db = np.asarray(a[k]), np.asarray(b[k])
            if da.shape != db.shape or not np.array_equal(da, db):
                return False
    return True


class VideoSceneDataset:
    """Camera-animated video folder: ONE scene, per-frame cameras.

    The reference's video workload (render-videos.sh + per-frame H5
    folders, /root/reference/batch_infer.py:61-178) re-reads and
    re-uploads the full scene for every frame — free over PCIe,
    prohibitive over a bandwidth-limited device tunnel. This dataset
    loads the scene tensors from the first frame only, then streams
    per-frame cameras, so the caller can keep the scene device-resident
    and ship ~100 B/frame instead of ~10^2 MB/frame.

    Safety: every frame's digest — geometry (triangles+vn) plus a strided
    texture fingerprint — is checked against frame 0; a mismatch raises
    (the folder was not actually a static scene — fall back to
    SceneFolderDataset). Frames 0/1 are additionally compared bitwise
    over ALL scene tensors before this path is chosen
    (probe_static_scene).
    """

    def __init__(self, folder: str, verify_geometry: bool = True):
        self.files = list_scene_files(folder)
        if not self.files:
            raise FileNotFoundError(f'no .h5 scenes in {folder}')
        self.scene = load_scene_h5(self.files[0])
        self._digest0 = _geometry_digest(self.files[0]) if verify_geometry else None
        self.verify_geometry = verify_geometry

    def __len__(self):
        return len(self.files)

    def view_chunks(self, views_per_call: int):
        """Yield {'c2w' [1,V,4,4], 'fov' [1,V], 'entries' [(path, view_idx)],
        'n_valid'} — the final chunk is padded by repeating its last view
        (no recompile for the remainder; caller drops padded outputs)."""
        entries, c2ws, fovs = [], [], []
        for fp in self.files:
            if self.verify_geometry and fp != self.files[0]:
                if _geometry_digest(fp) != self._digest0:
                    raise ValueError(
                        f'{fp}: scene content (geometry or texture) differs '
                        'from frame 0 — folder is not a static scene; use '
                        'SceneFolderDataset')
            c2w, fov = load_cameras_h5(fp)
            for v in range(c2w.shape[0]):
                entries.append((fp, v))
                c2ws.append(c2w[v])
                fovs.append(fov[v])
        for start in range(0, len(entries), views_per_call):
            chunk = entries[start:start + views_per_call]
            n_valid = len(chunk)
            idx = list(range(start, start + n_valid))
            idx += [idx[-1]] * (views_per_call - n_valid)
            yield {
                'c2w': np.stack([c2ws[i] for i in idx])[None],
                'fov': np.stack([fovs[i] for i in idx])[None],
                'entries': chunk,
                'n_valid': n_valid,
            }


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r'(\d+)', os.path.basename(s))]


def list_scene_files(folder: str) -> List[str]:
    """Natural-sorted *.h5 listing (batch_infer.py:19-20, natsort
    equivalent without the dependency)."""
    return sorted(glob.glob(os.path.join(folder, '*.h5')), key=_natural_key)


class SceneFolderDataset:
    """Iterable over a folder of per-frame H5 scenes with static-shape
    padding — the video/batch-inference workload (batch_infer.py:17-58)."""

    def __init__(self, folder: str, padding_length: Optional[int] = None):
        self.files = list_scene_files(folder)
        self.padding_length = padding_length

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        data = load_scene_h5(self.files[idx], self.padding_length)
        data['file_path'] = self.files[idx]
        return data

    def batches(self, batch_size: int):
        """Yield stacked batches (final partial batch included)."""
        for start in range(0, len(self.files), batch_size):
            items = [self[i] for i in range(
                start, min(start + batch_size, len(self.files)))]
            batch = {
                k: np.stack([it[k] for it in items])
                for k in ('triangles', 'texture', 'mask', 'vn', 'c2w', 'fov')
            }
            batch['file_paths'] = [it['file_path'] for it in items]
            yield batch

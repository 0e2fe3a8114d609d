"""Remeshing: isotropic remesh + quadric decimation to a target face count.

Reference uses pymeshlab (C++ MeshLab, scene_processor/remesh.py:5-35).
This build ships its own native C++ implementation (native/meshops) loaded
via ctypes; see native/meshops.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, '..', '..', 'native', 'libmeshops.so'),
        os.path.join(here, 'libmeshops.so'),
    ]
    native_dir = os.path.join(here, '..', '..', 'native')
    if (not any(os.path.exists(p) for p in candidates)
            and os.path.exists(os.path.join(native_dir, 'Makefile'))):
        # Fresh checkout: build the library once, in-tree.
        try:
            subprocess.run(['make', '-C', native_dir], check=True,
                           capture_output=True, timeout=300)
        except (subprocess.SubprocessError, OSError):
            pass
    for path in candidates:
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.meshops_decimate.restype = ctypes.c_int
            lib.meshops_decimate.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,   # verts, nv
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,    # faces, nf
                ctypes.c_int,                                    # target faces
                ctypes.POINTER(ctypes.c_double),                 # out verts
                ctypes.POINTER(ctypes.c_int64),                  # out faces
                ctypes.POINTER(ctypes.c_int),                    # out nv
                ctypes.POINTER(ctypes.c_int),                    # out nf
            ]
            lib.meshops_isotropic_remesh.restype = ctypes.c_int
            lib.meshops_isotropic_remesh.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
                ctypes.c_double, ctypes.c_int,                   # edge len, iters
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int,                      # capacities
            ]
            _LIB = lib
            return lib
    raise RuntimeError(
        'native meshops library not built; run: make -C native')


def decimate(vertices: np.ndarray, faces: np.ndarray,
             target_faces: int) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric-error-metric edge-collapse decimation (QSlim-style, the
    algorithm behind pymeshlab's simplification filter)."""
    lib = _load_lib()
    v = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv_out = ctypes.c_int(0)
    nf_out = ctypes.c_int(0)
    rc = lib.meshops_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        int(target_faces),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nv_out), ctypes.byref(nf_out))
    if rc != 0:
        raise RuntimeError(f'meshops_decimate failed: {rc}')
    return out_v[:nv_out.value].copy(), out_f[:nf_out.value].copy()


def isotropic_remesh(vertices: np.ndarray, faces: np.ndarray,
                     target_edge_len: float,
                     iterations: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """Isotropic explicit remeshing: split long edges / collapse short
    edges / flip for valence / tangential relax (pymeshlab
    meshing_isotropic_explicit_remeshing equivalent)."""
    lib = _load_lib()
    v = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    # splits can grow the mesh: generous output capacity
    cap_v = max(len(v) * 16, 65536)
    cap_f = max(len(f) * 16, 131072)
    out_v = np.empty((cap_v, 3), np.float64)
    out_f = np.empty((cap_f, 3), np.int64)
    nv_out = ctypes.c_int(0)
    nf_out = ctypes.c_int(0)
    rc = lib.meshops_isotropic_remesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        float(target_edge_len), int(iterations),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nv_out), ctypes.byref(nf_out), cap_v, cap_f)
    if rc != 0:
        raise RuntimeError(f'meshops_isotropic_remesh failed: {rc}')
    return out_v[:nv_out.value].copy(), out_f[:nf_out.value].copy()


def remesh(input_v: np.ndarray, input_f: np.ndarray,
           expected_face_num: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-compatible entry (scene_processor/remesh.py:5-35):
    isotropic remesh toward a uniform edge length, then decimate to the
    exact target face count."""
    v = np.asarray(input_v, np.float64)
    f = np.asarray(input_f, np.int64)
    # pick a target edge length from total area ~= n_faces * (sqrt(3)/4) l^2
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1).sum()
    edge_len = float(np.sqrt(area / max(expected_face_num, 1)
                             / (np.sqrt(3) / 4.0)))
    # each pass splits at most the longest edge of every face (face count
    # can at best double per pass) — very coarse inputs (a 12-face box vs
    # a 2048-face target) need ~log2(ratio) extra passes
    grow = max(expected_face_num / max(len(f), 1), 1.0)
    iters = 5 + int(np.ceil(np.log2(grow)))
    v2, f2 = isotropic_remesh(v, f, edge_len, iterations=iters)
    if len(f2) > expected_face_num:
        v2, f2 = decimate(v2, f2, expected_face_num)
    return v2, f2

"""ctypes bindings for the native asset-IO runtime (native/rtbvh_native.cpp).

The reference's asset layer is native C++ (reference:
ObjectFileLoader.cpp:212-468, SaveBMP.cpp:3-62, Image.cpp:35-61); this is
its counterpart: a C-ABI shared library loaded via ctypes (no pybind11).
The library auto-builds with g++ on first use and every entry point has a
pure-Python fallback (io/obj.py, io/bmp.py), so the package works without
a toolchain.

Parity contract: `load_obj_native` produces bit-identical Scene arrays to
`io.obj.load_obj` (tests/test_native.py asserts this on the reference's
own assets).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librtbvh_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "rtbvh_native.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-fvisibility=hidden",
             "-shared", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    lib.rtbvh_last_error.restype = c.c_char_p
    lib.rtbvh_obj_load.restype = c.c_void_p
    lib.rtbvh_obj_load.argtypes = [c.c_char_p]
    lib.rtbvh_obj_free.argtypes = [c.c_void_p]
    for name in ("num_verts", "num_indices", "num_faces", "num_materials"):
        fn = getattr(lib, f"rtbvh_obj_{name}")
        fn.restype = c.c_int32
        fn.argtypes = [c.c_void_p]
    for name in ("positions", "normals", "uv", "materials"):
        fn = getattr(lib, f"rtbvh_obj_{name}")
        fn.restype = c.POINTER(c.c_float)
        fn.argtypes = [c.c_void_p]
    for name in ("indices", "mat_index"):
        fn = getattr(lib, f"rtbvh_obj_{name}")
        fn.restype = c.POINTER(c.c_int32)
        fn.argtypes = [c.c_void_p]
    for name in ("material_name", "texture_path"):
        fn = getattr(lib, f"rtbvh_obj_{name}")
        fn.restype = c.c_char_p
        fn.argtypes = [c.c_void_p, c.c_int32]
    lib.rtbvh_write_bmp.restype = c.c_int32
    lib.rtbvh_write_bmp.argtypes = [c.c_char_p, c.c_int32, c.c_int32,
                                    c.POINTER(c.c_uint8)]
    lib.rtbvh_read_bmp.restype = c.c_void_p
    lib.rtbvh_read_bmp.argtypes = [c.c_char_p, c.POINTER(c.c_int32),
                                   c.POINTER(c.c_int32)]
    lib.rtbvh_free.argtypes = [c.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.isfile(_SO_PATH) or (
            os.path.isfile(os.path.join(_NATIVE_DIR, "rtbvh_native.cpp"))
            and os.path.getmtime(os.path.join(_NATIVE_DIR, "rtbvh_native.cpp"))
            > os.path.getmtime(_SO_PATH)
        ):
            if not _build() and not os.path.isfile(_SO_PATH):
                _lib_failed = True
                return None
        try:
            _lib = _bind(ctypes.CDLL(_SO_PATH))
        except OSError:
            _lib_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def _copy(ptr, n, dtype):
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def load_obj_native(path: str, load_textures: bool = True):
    """Native OBJ+MTL load -> Scene. Raises on parse errors; returns None
    only if the native library is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    from .core.types import Materials, Scene, stack_textures
    from .io.image import load_texture

    h = lib.rtbvh_obj_load(path.encode())
    if not h:
        raise IOError(lib.rtbvh_last_error().decode())
    try:
        nv = lib.rtbvh_obj_num_verts(h)
        ni = lib.rtbvh_obj_num_indices(h)
        nf = lib.rtbvh_obj_num_faces(h)
        nm = lib.rtbvh_obj_num_materials(h)
        verts = _copy(lib.rtbvh_obj_positions(h), nv * 3, np.float32).reshape(nv, 3)
        normals = _copy(lib.rtbvh_obj_normals(h), nv * 3, np.float32).reshape(nv, 3)
        uv = _copy(lib.rtbvh_obj_uv(h), nv * 2, np.float32).reshape(nv, 2)
        indices = _copy(lib.rtbvh_obj_indices(h), ni, np.int32)
        mat_index = _copy(lib.rtbvh_obj_mat_index(h), nf, np.int32)
        flat = _copy(lib.rtbvh_obj_materials(h), nm * 15, np.float32).reshape(nm, 15)
        tex_paths = [
            lib.rtbvh_obj_texture_path(h, i).decode() for i in range(nm)
        ]
    finally:
        lib.rtbvh_obj_free(h)

    textures, tex_ids = [], []
    for p in tex_paths:
        if load_textures and p and os.path.isfile(p):
            tex_ids.append(len(textures))
            textures.append(load_texture(p))
        else:
            if load_textures and p:
                print(f"warning: cannot load texture {p}")
            tex_ids.append(-1)
    tex_stack, tex_hw = stack_textures(textures)
    mats = Materials(
        ambient=flat[:, 0:4].copy(),
        diffuse=flat[:, 4:8].copy(),
        specular=flat[:, 8:12].copy(),
        shininess=flat[:, 12].copy(),
        optical_density=flat[:, 13].copy(),
        alpha=flat[:, 14].copy(),
        tex_id=np.array(tex_ids, np.int32),
    )
    return Scene(
        verts=verts, normals=normals, uv=uv, indices=indices,
        mat_index=mat_index, materials=mats,
        textures=tex_stack, tex_hw=tex_hw,
    )


def write_bmp_native(path: str, rgb: np.ndarray) -> bool:
    """24-bit BMP write (reference: SaveBMP.cpp:3-62). rgb: [h,w,3] uint8."""
    lib = get_lib()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    ok = lib.rtbvh_write_bmp(
        path.encode(), w, h,
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if not ok:
        raise IOError(lib.rtbvh_last_error().decode())
    return True


def read_bmp_native(path: str) -> Optional[np.ndarray]:
    """BMP read -> [h,w,3] uint8 (reference: Image.cpp:35-61 via DevIL)."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    ptr = lib.rtbvh_read_bmp(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise IOError(lib.rtbvh_last_error().decode())
    try:
        arr = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)),
            shape=(h.value, w.value, 3),
        ).copy()
    finally:
        lib.rtbvh_free(ptr)
    return arr

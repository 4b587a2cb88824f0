"""Native C++ asset runtime vs the pure-Python fallback.

The native library (native/rtbvh_native.cpp — counterpart of the
reference's C++ ObjectFileLoader.cpp / SaveBMP.cpp / Image.cpp) must
produce bit-identical scenes and BMP bytes to io/obj.py and io/bmp.py.
"""

import os

import numpy as np
import pytest

from raytracebvh_tpu import native
from raytracebvh_tpu.io.bmp import read_bmp, write_bmp
from raytracebvh_tpu.io.obj import _load_obj_python, load_obj
from raytracebvh_tpu.utils.assets import find_asset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


@pytest.mark.parametrize("name", ["Rect.obj", "Test.obj", "Image_Test.obj"])
def test_obj_parity(name):
    path = find_asset(name)
    if path is None:
        pytest.skip(f"{name} not available")
    a = native.load_obj_native(path)
    b = _load_obj_python(path)
    np.testing.assert_array_equal(a.verts, b.verts)
    np.testing.assert_array_equal(a.normals, b.normals)
    np.testing.assert_array_equal(a.uv, b.uv)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(a.mat_index, b.mat_index)
    for field in ("ambient", "diffuse", "specular", "shininess",
                  "optical_density", "alpha", "tex_id"):
        np.testing.assert_array_equal(
            getattr(a.materials, field), getattr(b.materials, field),
            err_msg=field,
        )
    np.testing.assert_array_equal(a.textures, b.textures)
    np.testing.assert_array_equal(a.tex_hw, b.tex_hw)


def test_obj_error_paths(tmp_path):
    with pytest.raises(IOError):
        native.load_obj_native(str(tmp_path / "missing.obj"))
    quad = tmp_path / "quad.obj"
    quad.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    with pytest.raises(IOError, match="non-triangle"):
        native.load_obj_native(str(quad))


def test_bmp_roundtrip_and_byte_parity(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), np.uint8)  # odd width: row pad
    p_native = str(tmp_path / "n.bmp")
    p_python = str(tmp_path / "p.bmp")
    assert native.write_bmp_native(p_native, img)
    # force the pure-Python writer for the comparison file
    import raytracebvh_tpu.io.bmp as bmp_mod

    bmp_img = img
    row_size = (47 * 3 + 3) & ~3
    import struct

    header = struct.pack(
        "<2sIHHIIiiHHIIiiII", b"BM", 54 + row_size * 33, 0, 0, 54, 40,
        47, 33, 1, 24, 0, row_size * 33, 2835, 2835, 0, 0,
    )
    rows = np.zeros((33, row_size), np.uint8)
    rows[:, : 47 * 3] = bmp_img[::-1, :, ::-1].reshape(33, 47 * 3)
    with open(p_python, "wb") as f:
        f.write(header)
        f.write(rows.tobytes())

    with open(p_native, "rb") as f:
        na = f.read()
    with open(p_python, "rb") as f:
        py = f.read()
    assert na == py

    # native reader agrees with the Python reader and the original image
    np.testing.assert_array_equal(native.read_bmp_native(p_native), img)
    np.testing.assert_array_equal(read_bmp(p_native), img)


def test_reference_texture_native_read():
    """Balls.bmp (8-bit paletted) is Python-only; Map__1_Composite.bmp is
    24-bit and must decode identically in both readers."""
    path = os.path.join(os.path.dirname(find_asset("Rect.obj") or ""),
                        "Map__1_Composite.bmp")
    if not os.path.isfile(path):
        pytest.skip("reference texture not available")
    np.testing.assert_array_equal(native.read_bmp_native(path), read_bmp(path))

"""Native C++ TIFF codec: byte parity with the pure-Python writer."""

import numpy as np
import pytest

from rescan_line_sted_tpu.io import array_to_tif, tif_to_array
from rescan_line_sted_tpu.io.native import native_available, tiff_encode_native


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def test_native_bytes_match_python_writer(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.uniform(size=(3, 40, 56)).astype(np.float32)
    py_path, nat_path = str(tmp_path / "py.tif"), str(tmp_path / "nat.tif")
    array_to_tif(arr, py_path, use_native=False)
    array_to_tif(arr, nat_path, use_native=True)
    with open(py_path, "rb") as f:
        py_bytes = f.read()
    with open(nat_path, "rb") as f:
        nat_bytes = f.read()
    assert py_bytes == nat_bytes


@pytest.mark.parametrize("dtype", [np.uint16, np.float32])
def test_native_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(1)
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(0, 60000, size=(4, 33, 47)).astype(dtype)
    else:
        arr = rng.uniform(size=(4, 33, 47)).astype(dtype)
    path = str(tmp_path / "x.tif")
    array_to_tif(arr, path, use_native=True)
    np.testing.assert_array_equal(tif_to_array(path), arr)


def test_encode_speed_sanity():
    arr = np.random.default_rng(2).uniform(size=(16, 512, 512)).astype(
        np.float32)
    blob = tiff_encode_native(arr)
    assert blob is not None
    assert len(blob) == 8 + 16 * (2 + 9 * 12 + 4 + 512 * 512 * 4)

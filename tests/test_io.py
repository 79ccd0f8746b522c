"""TIFF + checkpoint I/O tests (C13; aux subsystems)."""

import numpy as np
import pytest

from rescan_line_sted_tpu.io import (
    SweepCheckpoint,
    array_to_tif,
    load_state,
    save_state,
    tif_to_array,
)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.uint16, np.uint8])
def test_tiff_roundtrip_single(tmp_path, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(0, np.iinfo(dtype).max, size=(17, 23)).astype(dtype)
    else:
        arr = rng.uniform(size=(17, 23)).astype(dtype)
    path = str(tmp_path / "x.tif")
    array_to_tif(arr, path)
    back = tif_to_array(path)
    assert back.dtype == dtype
    np.testing.assert_array_equal(back, arr)


def test_tiff_roundtrip_stack(tmp_path):
    arr = np.random.default_rng(1).uniform(size=(5, 8, 12)).astype(np.float32)
    path = str(tmp_path / "stack.tif")
    array_to_tif(arr, path)
    back = tif_to_array(path)
    assert back.shape == (5, 8, 12)
    np.testing.assert_array_equal(back, arr)


def test_tiff_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.tif")
    with open(path, "wb") as f:
        f.write(b"MM\x00\x99 not a tiff")
    with pytest.raises(ValueError):
        tif_to_array(path)


def test_state_roundtrip(tmp_path):
    tree = {"a": np.arange(5.0), "b": (np.ones((2, 3)), np.int32(7))}
    path = str(tmp_path / "state.npz")
    save_state(path, tree)
    back = load_state(path, tree)
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"][0], tree["b"][0])
    assert back["b"][1] == 7


def test_sweep_checkpoint_resume(tmp_path):
    ckpt = SweepCheckpoint(str(tmp_path / "ck"))
    example = {"x": np.zeros(3)}
    calls = []

    def run_all():
        out = []
        for i in range(4):
            if ckpt.has(i):
                out.append(ckpt.load(i, like=example))
                continue
            calls.append(i)
            res = {"x": np.full(3, float(i))}
            ckpt.save(i, res)
            out.append(res)
        return out

    first = run_all()
    assert calls == [0, 1, 2, 3]
    second = run_all()          # resumes: no recomputation
    assert calls == [0, 1, 2, 3]
    assert ckpt.completed() == [0, 1, 2, 3]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a["x"], b["x"])

    ckpt.write_meta(n=4)
    assert ckpt.read_meta() == {"n": 4}


def test_load_state_rejects_structure_mismatch(tmp_path):
    path = str(tmp_path / "state.npz")
    save_state(path, {"a": np.arange(5.0), "b": np.ones((2, 3))})
    with pytest.raises(ValueError, match="treedef mismatch"):
        load_state(path, {"a": np.arange(5.0), "c": np.ones((2, 3))})
    with pytest.raises(ValueError, match="leaf 0 mismatch"):
        load_state(path, {"a": np.arange(4.0), "b": np.ones((2, 3))})
    with pytest.raises(ValueError, match="leaf 1 mismatch"):
        load_state(path, {"a": np.arange(5.0),
                          "b": np.ones((2, 3), np.float32)})


def test_tiff_rejects_inconsistent_strip_tags(tmp_path):
    """Legitimate multi-strip files are decoded (test_foreign_* below), but
    a file whose StripOffsets/StripByteCounts disagree is rejected rather
    than decoded as garbage (r1 finding, updated for the r3 multi-strip
    reader)."""
    import struct

    arr = np.zeros((4, 4), np.uint8)
    path = str(tmp_path / "multi.tif")
    array_to_tif(arr, path)
    with open(path, "rb") as f:
        buf = bytearray(f.read())
    # Forge StripOffsets (tag 273) count=2 while ByteCounts stays count=1:
    # the strip tables now disagree and the file is undecodable.
    (n_entries,) = struct.unpack("<H", buf[8:10])
    for k in range(n_entries):
        base = 10 + 12 * k
        tag, typ, count = struct.unpack("<HHI", buf[base:base + 8])
        if tag == 273:
            buf[base + 4:base + 8] = struct.pack("<I", 2)
    with open(path, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(ValueError):
        tif_to_array(path)


def test_completed_skips_stale_tmp_files(tmp_path):
    """A chunk_*.npz.tmp.npz left by an interrupted save must neither crash
    completed() nor count as a finished chunk."""
    ckpt = SweepCheckpoint(str(tmp_path / "ck"))
    ckpt.save(0, {"x": np.zeros(2)})
    with open(tmp_path / "ck" / "chunk_00003.npz.tmp.npz", "wb") as f:
        f.write(b"torn")
    assert ckpt.completed() == [0]


def test_foreign_multistrip_tiff_roundtrip(tmp_path):
    """Read a standard writer's (PIL) grayscale TIFF, including multi-strip
    organization (VERDICT r2 item 9)."""
    from PIL import Image

    from rescan_line_sted_tpu.io.tiff import tif_to_array

    rng = np.random.default_rng(0)
    # tall image so PIL splits it into several strips (its default strip
    # size targets ~64 KB)
    arr = rng.integers(0, 65535, size=(512, 256), dtype=np.uint16)
    p = str(tmp_path / "foreign.tif")
    Image.fromarray(arr).save(p, compression=None)
    got = tif_to_array(p)
    np.testing.assert_array_equal(got, arr)

    arr8 = rng.integers(0, 255, size=(300, 77), dtype=np.uint8)
    p8 = str(tmp_path / "foreign8.tif")
    Image.fromarray(arr8).save(p8, compression=None)
    np.testing.assert_array_equal(tif_to_array(p8), arr8)

    f32 = rng.uniform(size=(96, 64)).astype(np.float32)
    pf = str(tmp_path / "foreign_f32.tif")
    Image.fromarray(f32).save(pf, compression=None)
    np.testing.assert_array_equal(tif_to_array(pf), f32)


def test_foreign_tiff_rejects_unsupported(tmp_path):
    """Compressed / RGB files are rejected, not mis-decoded."""
    import pytest
    from PIL import Image

    from rescan_line_sted_tpu.io.tiff import tif_to_array

    rgb = np.zeros((32, 32, 3), np.uint8)
    p = str(tmp_path / "rgb.tif")
    Image.fromarray(rgb).save(p, compression=None)
    with pytest.raises(ValueError):
        tif_to_array(p)

    gray = np.zeros((64, 64), np.uint8)
    pc = str(tmp_path / "lzw.tif")
    Image.fromarray(gray).save(pc, compression="tiff_lzw")
    with pytest.raises(ValueError):
        tif_to_array(pc)

"""Scan-animation pipeline test."""

from rescan_line_sted_tpu.pipelines import line_scan_animation


def test_line_scan_animation_gif(tmp_path):
    m = line_scan_animation(str(tmp_path), size=48, num_frames=6)
    assert m["frames"] == 6
    from PIL import Image

    with Image.open(m["path"]) as im:
        assert im.n_frames == 6
        assert im.size == (48 * 2 + 4, 48)

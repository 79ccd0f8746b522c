"""End-to-end pipeline + CLI tests on tiny grids (configs 1-5)."""

import json
import os

import pytest

import numpy as np

from rescan_line_sted_tpu.cli import main as cli_main
from rescan_line_sted_tpu.io import tif_to_array
from rescan_line_sted_tpu.pipelines import (
    comparison_pipeline,
    dose_sweep_pipeline,
    fusion_pipeline,
    rescan_pipeline,
)


def test_comparison_pipeline(tmp_path):
    m = comparison_pipeline(str(tmp_path), size=48, dose_budget=50.0)
    assert m["line_steps"] < m["point_steps"]
    img = tif_to_array(str(tmp_path / "comparison_point_sted.tif"))
    assert img.shape == (48, 48)
    assert os.path.exists(tmp_path / "comparison.png")
    assert os.path.exists(tmp_path / "metrics.jsonl")


def test_dose_sweep_pipeline_checkpoints_and_resumes(tmp_path):
    kwargs = dict(size=48, num_powers=4, chunk=2, dose_budget=50.0)
    m1 = dose_sweep_pipeline(str(tmp_path), **kwargs)
    # delete one artifact, rerun: resumes from checkpoints, same metrics
    m2 = dose_sweep_pipeline(str(tmp_path), **kwargs)
    assert m1["point_fwhm_x_at_smax"] == m2["point_fwhm_x_at_smax"]
    # 2 orientations * W line steps vs W*W point steps
    np.testing.assert_allclose(m1["line_to_point_step_ratio"], 2.0 / 48,
                               rtol=1e-6)


def test_fusion_pipeline(tmp_path):
    m = fusion_pipeline(str(tmp_path), size=48, num_angles=2, rl_iters=10)
    fused = tif_to_array(str(tmp_path / "fusion_fused_rl.tif"))
    assert np.isfinite(fused).all()
    assert m["view_kernel_fwhm_x"] < m["view_kernel_fwhm_y"]


def test_rescan_pipeline(tmp_path):
    m = rescan_pipeline(str(tmp_path), size=48)
    canvas = tif_to_array(str(tmp_path / "rescan_rescanned_canvas.tif"))
    assert canvas.shape == (48, 96)
    assert m["canvas_shape"] == [48, 96]


def test_ism_pipeline(tmp_path):
    from rescan_line_sted_tpu.pipelines import ism_pipeline

    m = ism_pipeline(str(tmp_path), size=48, depletion=4.0)
    canvas = tif_to_array(str(tmp_path / "ism_ism_canvas_sted.tif"))
    assert canvas.shape == (96, 96)
    assert m["canvas_shape"] == [96, 96]
    # depletion sharpens the reassigned kernel
    assert m["ism_sted_fwhm_sample_px"] < m["ism_confocal_fwhm_sample_px"]


def _strict_loads(s: str):
    """json.loads that rejects NaN/Infinity like RFC parsers (jq,
    JSON.parse) do — Python's default silently accepts them, which is
    exactly the bug _json_safe exists to prevent."""
    def no_const(c):
        raise ValueError(f"non-RFC JSON constant in CLI output: {c}")
    return json.loads(s, parse_constant=no_const)


def test_cli_figure_and_psf_report(tmp_path, capsys):
    cli_main(["figure", "comparison", "--out", str(tmp_path / "f"),
              "--size", "48", "--dose-budget", "50"])
    out = capsys.readouterr().out.strip().splitlines()
    metrics = _strict_loads(out[-1])
    assert metrics["pipeline"] == "comparison"

    cli_main(["psf-report", "--size", "64", "--depletion", "8",
              "--vectorial"])
    rep = _strict_loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["point_fwhm_x"] < rep["line_fwhm_y"]
    # vectorial panel: co-handed null is clean, counter-handed fill
    # degrades the achieved resolution
    assert rep["vectorial_circular_co_null"] < 1e-4 \
        < rep["vectorial_circular_counter_null"]
    assert rep["vectorial_circular_co_fwhm_x"] \
        < rep["vectorial_circular_counter_fwhm_x"]


def test_cli_json_safe_maps_nonfinite_to_null():
    """The metrics contract uses NaN for 'no measurable value'; the CLI
    must emit RFC-compliant JSON (null), preserving everything else."""
    from rescan_line_sted_tpu.cli import _json_safe

    src = {"a": float("nan"), "b": float("inf"), "c": 1.5,
           "nested": [np.float32("nan"), np.float64(2.0), "7", 3, True,
                      None]}
    got = _json_safe(src)
    assert got["a"] is None and got["b"] is None and got["c"] == 1.5
    assert got["nested"][0] is None
    assert got["nested"][1] == 2.0
    # strings/ints/bools/None pass through untouched (no float coercion)
    assert got["nested"][2:] == ["7", 3, True, None]
    _strict_loads(json.dumps(got))


def test_fusion_pipeline_rescan_modality(tmp_path):
    m = fusion_pipeline(str(tmp_path), size=48, num_angles=2, rl_iters=10,
                        modality="rescan")
    assert m["modality"] == "rescan"
    fused = tif_to_array(str(tmp_path / "fusion_fused_rl.tif"))
    assert fused.shape == (48, 48)
    assert np.isfinite(fused).all()


def test_dose_sweep_pipeline_ragged_final_chunk(tmp_path):
    """num_powers not divisible by chunk must run ALL points, not drop the
    trailing remainder."""
    m = dose_sweep_pipeline(str(tmp_path), size=48, num_powers=3, chunk=2,
                            max_power=8.0, dose_budget=50.0)
    assert m["num_sweep_points_run"] == 3
    assert np.isfinite(m["point_fwhm_x_at_smax"])
    curves = np.load(str(tmp_path / "dose_sweep_curves.npz"))
    assert curves["depletion_powers"].shape == (3,)
    assert curves["line_fwhm_x"].shape == (3,)


def test_dose_sweep_pipeline_fused_and_padded(tmp_path):
    """Sweep with the paper's fusion protocol + open boundary."""
    m = dose_sweep_pipeline(str(tmp_path), size=48, num_powers=2, chunk=2,
                            max_power=8.0, dose_budget=50.0,
                            orientations=2, fuse_orientations=True,
                            fusion_iters=15, boundary="padded")
    assert m["fused_orientations"] == 2
    assert m["boundary"] == "padded"
    # fused resolution is isotropic at smax
    np.testing.assert_allclose(m["line_fwhm_y_at_smax"],
                               m["line_fwhm_x_at_smax"], rtol=0.05)
    img = tif_to_array(str(tmp_path / "dose_sweep_images_line_smax.tif"))
    assert img.shape == (48, 48)


def test_dose_sweep_pipeline_rejects_stale_checkpoints(tmp_path):
    kwargs = dict(size=48, num_powers=2, chunk=2, dose_budget=50.0,
                  fuse_orientations=False)
    dose_sweep_pipeline(str(tmp_path), **kwargs)
    with pytest.raises(ValueError, match="different sweep settings"):
        dose_sweep_pipeline(str(tmp_path), **{**kwargs, "dose_budget": 60.0})


def test_html_report(tmp_path):
    """C15: the self-contained interactive publication report."""
    from rescan_line_sted_tpu.pipelines import html_report

    m = html_report(str(tmp_path), size=48, num_powers=2, num_angles=2,
                    rl_iters=5, scan_frames=3)
    path = tmp_path / "index.html"
    assert path.exists()
    html = path.read_text()
    # self-contained: all images are data URIs, sliders wired per figure
    assert html.count("data:image/png;base64,") == m["frames"]
    assert html.count("<input type=\"range\"") == 3
    assert "wire(" in html and "fig1-slider" in html
    assert m["bytes"] > 10_000


def test_dose_sweep_pipeline_with_ism_arm(tmp_path):
    m = dose_sweep_pipeline(str(tmp_path), size=48, num_powers=4, chunk=2,
                            dose_budget=50.0, include_ism=True,
                            boundary="padded")
    assert "ism_fwhm_x_at_smax" in m
    curves = np.load(tmp_path / "dose_sweep_curves.npz")
    assert curves["ism_fwhm_x"].shape == (4,)
    # cropped ISM canvases land back on the R-magnified requested field
    img = tif_to_array(str(tmp_path / "dose_sweep_images_ism_smax.tif"))
    assert img.shape == (96, 96)


def test_cli_multihost_flag_single_process():
    """--multihost is a safe no-op off-pod (no cluster env -> single
    process) and must not disturb the pipeline run. Subprocess: jax
    requires distributed init BEFORE the first backend use, which the CLI
    satisfies in a fresh process (this test process has already used jax)."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           # Strip cluster-manager vars: jax.distributed.initialize
           # auto-detects SLURM/OMPI/MPI and would block on a coordinator
           # that doesn't exist when the suite runs inside such a job.
           if not k.startswith(("SLURM", "OMPI_", "PMI_", "PMIX_"))}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "rescan_line_sted_tpu.cli", "--multihost",
         "--platform", "cpu", "psf-report", "--size", "48",
         "--depletion", "4"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, (out.stdout, out.stderr)
    rep = _strict_loads(out.stdout.strip().splitlines()[-1])
    assert rep["depletion"] == 4.0

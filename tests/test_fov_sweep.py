"""Resolution/FOV sweep tests (config 5 tail)."""

import jax

from rescan_line_sted_tpu.config import LineSTEDParams
from rescan_line_sted_tpu.sweeps import resolution_fov_sweep


def test_fov_sweep_records():
    params = LineSTEDParams.create(sigma_exc=2.5, sigma_det=2.5,
                                   stripe_period=10.0, depletion=8.0,
                                   brightness=200.0)
    recs = resolution_fov_sweep((48, 96), params, num_angles=2, rl_iters=30,
                                key=jax.random.key(0), spacing=24)
    assert [r["fov"] for r in recs] == [48, 96]
    for r in recs:
        # fused resolution beats the single view's wide axis
        assert r["fused_fwhm_y"] < r["view_kernel_fwhm_y"]
        assert r["scan_steps"] == r["fov"] * 2
        assert r["wall_s"] > 0

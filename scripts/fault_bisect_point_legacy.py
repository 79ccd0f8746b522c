"""Hardware bisect record: axon-runtime worker crash in the legacy
full-frame per-step point engine (r3; ROADMAP item 2).

DANGER: stage "crash" reliably KILLS the TPU worker (~10-30 min recovery
before the tunnel accepts connections again). Nothing here runs unless a
stage is named on the command line.

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/fault_bisect_point_legacy.py good   # proven-safe ops
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/fault_bisect_point_legacy.py crash  # minimal crasher
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/fault_bisect_point_legacy.py fixed  # validate the fix

Findings (2026-08-17, TPU v5 lite via the axon tunnel; each line one
process, crash = `UNAVAILABLE: TPU worker process crashed or restarted`):

| body per lax.scan iteration (256 iters, [C,H,W]=[256,256,256])  | result |
|---|---|
| shifted_images(eff) + sum                                        | ok |
| + 1D-OTF convs (x then y)                                        | ok |
| + tiered Pallas sampler (single call, no scan)                   | ok |
| two shifted_images + multiply + reduce  (NO conv/noise/scatter)  | CRASH |
| full legacy body, einsum detection                               | CRASH |
| full legacy body, multiply-reduce detection                      | CRASH |
| full legacy body, chunk 64 / 128 / 256                           | CRASH |
| 128^2 full legacy body (any form)                                | ok |

Minimal crasher: TWO full-frame `shifted_images` position-gathers feeding
one scan body at >= 256^2. One gather is always fine; chunk size and the
reduction form are irrelevant. The engine fix (imaging/point_sted.py
`_scan`): gather only the illumination; descanned pinhole detection runs
as a batched FFT correlation with the STATIC pinhole evaluated at the
scan position, raster rebuilt from scan's stacked outputs (no scatter).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from functools import partial

from rescan_line_sted_tpu.config import PointSTEDParams
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging.shifts import shifted_images
from rescan_line_sted_tpu.kernels import fftconv
from rescan_line_sted_tpu.physics import models
from rescan_line_sted_tpu.physics import psf as psfs

H = W = 256
CHUNK = 256


def main(stage: str) -> None:
    p = PointSTEDParams.create(depletion=16.0)
    sample = samples.siemens_star((H, W))
    eff = models.effective_point_psf((H, W), p)
    pin = psfs.pinhole_mask((H, W), p.pinhole_radius)
    otf_y = fftconv.profile_to_otf1d(psfs.detection_profile(H, p.sigma_det))
    otf_x = fftconv.profile_to_otf1d(psfs.detection_profile(W, p.sigma_det))
    steps = jnp.arange(H * W).reshape((H * W) // CHUNK, CHUNK)

    @partial(jax.jit, static_argnums=0)
    def run(which, eff, pin, otf_x, otf_y, sample):
        def body(acc, pos_flat):
            pos = jnp.stack([pos_flat // W, pos_flat % W], axis=-1)
            ill = shifted_images(eff, pos)
            if which == "crash":  # two full-frame gathers in one body
                pinholes = shifted_images(pin, pos)
                vals = jnp.sum(ill * pinholes, axis=(-2, -1))
                return acc + jnp.sum(vals), None
            blurred = fftconv.convolve_otf1d(
                fftconv.convolve_otf1d(ill * sample, otf_x, axis=-1, n=W),
                otf_y, axis=-2, n=H)
            return acc + jnp.sum(blurred), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), steps)
        return out

    print(stage, float(run(stage, eff, pin, otf_x, otf_y, sample)))


def fixed() -> None:
    """Validate the RESTRUCTURED legacy engine at the exact crash config.

    A model without ``gaussian_excitation`` forces the full-frame fallback
    (the same routing real custom illumination models take), so this runs
    the one-gather + static-pinhole-correlation body at 256^2 / chunk 256
    end to end. Pass = completes without a worker fault and the noisy sum
    tracks the collapsed noise-free image within 1%.
    """
    import time

    import numpy as np

    from rescan_line_sted_tpu.config import PointSTEDGeometry
    from rescan_line_sted_tpu.imaging import point_sted_image

    class CustomModel:
        # gaussian_excitation deliberately absent -> legacy fallback
        def excitation(self, shape, params):
            return psfs.gaussian_psf(shape, params.sigma_exc)

        def depletion(self, shape, params):
            return psfs.donut_psf(shape, params.sigma_dep)

    from rescan_line_sted_tpu.config import Grid

    print("devices:", jax.devices(), flush=True)
    geom = PointSTEDGeometry(Grid(H, W), chunk=CHUNK)
    p = PointSTEDParams.create(depletion=16.0, brightness=100.0,
                               model=CustomModel())
    sample = samples.siemens_star((H, W))
    noisefree = np.asarray(point_sted_image(sample, p, geom, key=None,
                                            method="scan").image)
    t0 = time.time()
    img = np.asarray(point_sted_image(sample, p, geom,
                                      key=jax.random.key(42), method="scan",
                                      noise_mode="per_step").image)
    ratio = img.sum() / max(noisefree.sum(), 1e-9)
    print(f"fixed legacy per-step {H}x{W} chunk={CHUNK}: "
          f"{time.time()-t0:.1f}s sum_ratio={ratio:.5f}", flush=True)
    assert 0.99 < ratio < 1.01, ratio
    assert np.isfinite(img).all()
    print("FIXED-ENGINE VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) != 2 or sys.argv[1] not in ("good", "crash", "fixed"):
        raise SystemExit(__doc__)
    fixed() if sys.argv[1] == "fixed" else main(sys.argv[1])

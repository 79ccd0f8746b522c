"""Figure-equivalent end-to-end pipelines (components C14/L3).

The reference's entry points are per-figure scripts that run the simulation
and write the paper's images (SURVEY.md section 2.1, L3). Here each pipeline
is a library function: the device computes arrays (one jitted program where
possible), the host renders TIFF (``io/tiff.py``) and PNG (matplotlib)
artifacts and returns a metrics dict (SURVEY.md section 6, observability).

Pipelines:

* ``comparison_pipeline``  -- point vs line STED at matched dose (fig-1/2
  class): acquisitions at several depletion powers, side by side.
* ``dose_sweep_pipeline``  -- the dose-matched resolution/signal tradeoff
  curves (call stack 4.4), with chunked checkpoint/resume.
* ``fusion_pipeline``      -- multi-orientation line-STED + Richardson-Lucy
  isotropic fusion (call stack 4.5).
* ``rescan_pipeline``      -- rescanned line-STED canvas formation and
  descan-vs-rescan comparison (call stack 4.3).
* ``ism_pipeline``         -- rescanned POINT-STED (2D pixel reassignment /
  ISM; beyond-reference modality, ``imaging/rescan_point.py``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rescan_line_sted_tpu.algorithms import richardson_lucy_views
from rescan_line_sted_tpu.algorithms.metrics import fwhm_2d
from rescan_line_sted_tpu.config import (
    Grid,
    LineSTEDGeometry,
    LineSTEDParams,
    PointSTEDGeometry,
    PointSTEDParams,
    RescanGeometry,
)
from rescan_line_sted_tpu.data import samples
from rescan_line_sted_tpu.imaging import (
    line_sted_image,
    rescanned_line_sted_image,
)
from rescan_line_sted_tpu.imaging.orientations import multi_orientation_line_sted
from rescan_line_sted_tpu.io import SweepCheckpoint, array_to_tif
from rescan_line_sted_tpu.sweeps import dose_matched_sweep
from rescan_line_sted_tpu.utils.observability import emit_metrics


def _default_sample(size: int) -> jnp.ndarray:
    return samples.siemens_star((size, size))


def _save_panels(out_dir: str, name: str, panels: dict[str, np.ndarray]):
    os.makedirs(out_dir, exist_ok=True)
    for key, img in panels.items():
        array_to_tif(np.asarray(img, np.float32),
                     os.path.join(out_dir, f"{name}_{key}.tif"))
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover - matplotlib is baked in
        return
    n = len(panels)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    for ax, (key, img) in zip(axes, panels.items()):
        ax.imshow(np.asarray(img), cmap="magma")
        ax.set_title(key)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{name}.png"), dpi=120)
    plt.close(fig)


def comparison_pipeline(out_dir: str, size: int = 256, depletion: float = 8.0,
                        dose_budget: float = 100.0, seed: int = 0) -> dict:
    """Point vs line STED at equal photodose, confocal baseline included."""
    grid = Grid(size, size)
    sample = _default_sample(size)
    pgeom, lgeom = PointSTEDGeometry(grid), LineSTEDGeometry(grid)
    pbase = PointSTEDParams.create(brightness=1.0)
    lbase = LineSTEDParams.create(brightness=1.0)
    powers = jnp.asarray([0.0, depletion])
    res = jax.jit(
        lambda p, k: dose_matched_sweep(
            sample, pbase, lbase, pgeom, lgeom, p, dose_budget, key=k)
    )(powers, jax.random.key(seed))
    panels = {
        "sample": sample,
        "point_confocal": res.point.image[0],
        "point_sted": res.point.image[1],
        "line_confocal": res.line.image[0],
        "line_sted": res.line.image[1],
    }
    _save_panels(out_dir, "comparison", panels)
    metrics = {
        "pipeline": "comparison",
        "point_fwhm_x": float(res.point.fwhm_x[1]),
        "line_fwhm_x": float(res.line.fwhm_x[1]),
        "point_steps": float(res.point.num_steps[1]),
        "line_steps": float(res.line.num_steps[1]),
        "point_signal": float(res.point.emitted_signal[1]),
        "line_signal": float(res.line.emitted_signal[1]),
    }
    emit_metrics(metrics, os.path.join(out_dir, "metrics.jsonl"))
    return metrics


def dose_sweep_pipeline(out_dir: str, size: int = 256, num_powers: int = 16,
                        max_power: float = 16.0, dose_budget: float = 100.0,
                        seed: int = 0, chunk: int = 4,
                        orientations: int = 2,
                        fuse_orientations: bool = True,
                        fusion_iters: int = 30,
                        boundary: str = "circular",
                        include_ism: bool = False,
                        frc: bool = False) -> dict:
    """Full dose-matched sweep with per-chunk checkpoint/resume.

    ``fuse_orientations`` (default on, the paper's protocol) reports the
    N-orientation RL-fused line/rescan arms and achieved post-fusion
    resolutions; see ``dose_matched_sweep``. ``boundary="padded"`` runs the
    whole sweep open-boundary (pad-acquire-crop). ``include_ism`` adds the
    beyond-reference rescanned-point (2D pixel reassignment) arm at the
    point arm's dose; prefer ``boundary="padded"`` or ``"apodized"`` with
    it -- the ISM arm's analytic canvas mean unwraps camera indices
    (exact for edge-zero samples), so under the default circular world
    the default siemens star's edge-touching spokes make its seam region
    deviate from a faithful wrapping scan (``imaging/rescan_point``
    module doc; the interior, where the resolution metrics are read, is
    unaffected). ``frc=True`` adds a second independent acquisition
    per arm and reports the achieved-with-noise FRC resolution curves
    (``*_frc_resolution`` in the curves npz and the resolution panel).
    """
    if boundary not in ("circular", "padded", "apodized"):
        raise ValueError(f"unknown boundary {boundary!r}")
    margin = 0
    if boundary == "padded":
        from rescan_line_sted_tpu.imaging.boundary import default_margin

        margin = default_margin(LineSTEDGeometry(Grid(size, size)))
    run_size = size + 2 * margin
    grid = Grid(run_size, run_size)
    sample = jnp.pad(_default_sample(size),
                     ((margin, margin), (margin, margin)))
    if boundary == "apodized":
        from rescan_line_sted_tpu.imaging.boundary import (
            apodize_sample,
            default_margin,
        )

        sample = apodize_sample(
            sample, default_margin(LineSTEDGeometry(grid)))
    pgeom, lgeom = PointSTEDGeometry(grid), LineSTEDGeometry(grid)
    pbase = PointSTEDParams.create(brightness=1.0)
    lbase = LineSTEDParams.create(brightness=1.0)
    powers = jnp.linspace(0.0, max_power, num_powers)

    rgeom = RescanGeometry(grid, rescan_factor=2.0)
    igeom = None
    if include_ism:
        from rescan_line_sted_tpu.config import RescanPointGeometry

        igeom = RescanPointGeometry(grid, rescan_factor=2.0)
    run = jax.jit(lambda p, k: dose_matched_sweep(
        sample, pbase, lbase, pgeom, lgeom, p, dose_budget, key=k,
        orientations=orientations, rescan_geom=rgeom,
        fuse_orientations=fuse_orientations, fusion_iters=fusion_iters,
        ism_geom=igeom, frc=frc))

    ckpt = SweepCheckpoint(os.path.join(out_dir, "sweep_ckpt"))
    meta = dict(size=size, num_powers=num_powers, max_power=max_power,
                dose_budget=dose_budget, seed=seed, chunk=chunk,
                orientations=orientations,
                fuse_orientations=fuse_orientations, boundary=boundary,
                include_ism=include_ism, frc=frc)
    stored = ckpt.read_meta()
    if stored and stored != meta and ckpt.completed():
        raise ValueError(
            f"checkpoint dir {ckpt.directory!r} was written with different "
            f"sweep settings ({stored}); delete it or change out_dir")
    ckpt.write_meta(**meta)
    results, example = [], None
    # Ragged final chunk: pad with the last power to keep one compiled
    # shape, then trim the merged results back to num_powers.
    n_chunks = -(-num_powers // chunk)
    keys = jax.random.split(jax.random.key(seed), n_chunks)
    for i in range(n_chunks):
        chunk_powers = powers[i * chunk:(i + 1) * chunk]
        if chunk_powers.shape[0] < chunk:
            pad = chunk - chunk_powers.shape[0]
            chunk_powers = jnp.concatenate(
                [chunk_powers, jnp.repeat(chunk_powers[-1:], pad)])
        if example is None:
            example = jax.eval_shape(run, chunk_powers, keys[i])
            example = jax.tree.map(
                lambda s: np.zeros(s.shape, s.dtype), example)
        if ckpt.has(i):
            results.append(ckpt.load(i, like=example))
        else:
            out = jax.tree.map(np.asarray, run(chunk_powers, keys[i]))
            ckpt.save(i, out)
            results.append(out)
    merged = jax.tree.map(
        lambda *xs: np.concatenate(xs)[:num_powers]
        if np.ndim(xs[0]) else xs[0], *results)

    if margin:  # crop padded acquisitions back to the requested field
        def crop(arr):
            return arr[:, margin:margin + size, margin:margin + size]

        rimg = merged.rescan.image
        if fuse_orientations:  # fused estimate lives on the sample grid
            rimg = crop(rimg)
        else:  # canvas grid: x scales by R, both axes by 1/binning
            r, b = rgeom.rescan_factor, rgeom.binning
            x0 = int(round(r * margin)) // b
            rimg = rimg[:, margin // b: margin // b + size // b,
                        x0: x0 + int(round(r * size)) // b]
        repl = dict(
            point=merged.point.replace(image=crop(merged.point.image)),
            line=merged.line.replace(image=crop(merged.line.image)),
            rescan=merged.rescan.replace(image=rimg))
        if include_ism:
            # ISM canvases (raw AND deconvolved) live on the R-magnified
            # grid; both axes scale by R (binning=1 here)
            ri = igeom.rescan_factor
            i0 = int(round(ri * margin))
            iw = int(round(ri * size))
            repl["ism"] = merged.ism.replace(
                image=merged.ism.image[:, i0:i0 + iw, i0:i0 + iw])
        merged = merged.replace(**repl)

    curves = dict(
        depletion_powers=np.asarray(merged.depletion_powers),
        point_fwhm_x=np.asarray(merged.point.fwhm_x),
        point_fwhm_y=np.asarray(merged.point.fwhm_y),
        line_fwhm_x=np.asarray(merged.line.fwhm_x),
        line_fwhm_y=np.asarray(merged.line.fwhm_y),
        rescan_fwhm_x=np.asarray(merged.rescan.fwhm_x),
        rescan_fwhm_y=np.asarray(merged.rescan.fwhm_y),
        point_signal=np.asarray(merged.point.emitted_signal),
        line_signal=np.asarray(merged.line.emitted_signal))
    if include_ism:
        curves["ism_fwhm_x"] = np.asarray(merged.ism.fwhm_x)
        curves["ism_fwhm_y"] = np.asarray(merged.ism.fwhm_y)
    if frc:
        curves["point_frc_resolution"] = np.asarray(
            merged.point.frc_resolution)
        curves["line_frc_resolution"] = np.asarray(
            merged.line.frc_resolution)
        if fuse_orientations:
            curves["rescan_frc_resolution"] = np.asarray(
                merged.rescan.frc_resolution)
        else:  # anisotropic unfused canvas: per-axis sectored FRC
            curves["rescan_frc_resolution_x"] = np.asarray(
                merged.rescan.frc_resolution_x)
            curves["rescan_frc_resolution_y"] = np.asarray(
                merged.rescan.frc_resolution_y)
        if include_ism:
            curves["ism_frc_resolution"] = np.asarray(
                merged.ism.frc_resolution)
    np.savez(os.path.join(out_dir, "dose_sweep_curves.npz"), **curves)
    panels = {
        "point_s0": merged.point.image[0],
        "point_smax": merged.point.image[-1],
        "line_s0": merged.line.image[0],
        "line_smax": merged.line.image[-1],
    }
    if include_ism:
        panels["ism_smax"] = merged.ism.image[-1]
    _save_panels(out_dir, "dose_sweep_images", panels)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        p = np.asarray(merged.depletion_powers)
        line_label = (f"line STED ({orientations}-orient. RL fused)"
                      if fuse_orientations else "line STED (scan axis)")
        ax1.plot(p, np.asarray(merged.point.fwhm_x), label="point STED")
        ax1.plot(p, np.asarray(merged.line.fwhm_x), label=line_label)
        ax1.plot(p, np.asarray(merged.rescan.fwhm_x), "--",
                 label="rescanned line STED")
        if include_ism:
            ax1.plot(p, np.asarray(merged.ism.fwhm_x), ":",
                     label="rescanned point (ISM)")
        if frc:
            ax1.plot(p, np.asarray(merged.point.frc_resolution), "x-",
                     alpha=0.6, label="point FRC (achieved)")
            ax1.plot(p, np.asarray(merged.line.frc_resolution), "x-",
                     alpha=0.6, label="line FRC (achieved)")
        ax1.set_xlabel("depletion power s"), ax1.set_ylabel("FWHM (px)")
        ax1.legend(), ax1.set_title("resolution at matched dose")
        ax2.plot(p, np.asarray(merged.point.emitted_signal), label="point")
        ax2.plot(p, np.asarray(merged.line.emitted_signal), label="line")
        ax2.set_xlabel("depletion power s"), ax2.set_ylabel("emitted signal")
        ax2.legend(), ax2.set_title("signal at matched dose")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "dose_sweep.png"), dpi=120)
        plt.close(fig)
    except ImportError:  # pragma: no cover
        pass

    metrics = {
        "pipeline": "dose_sweep",
        "num_powers": num_powers,
        "num_sweep_points_run": int(np.asarray(merged.point.fwhm_x).shape[0]),
        "fused_orientations": orientations if fuse_orientations else 0,
        "boundary": boundary,
        "point_fwhm_x_at_smax": float(merged.point.fwhm_x[-1]),
        "line_fwhm_x_at_smax": float(merged.line.fwhm_x[-1]),
        "line_fwhm_y_at_smax": float(merged.line.fwhm_y[-1]),
        "line_to_point_step_ratio": float(merged.line.num_steps[0]
                                          / merged.point.num_steps[0]),
    }
    if include_ism:
        metrics["ism_fwhm_x_at_smax"] = float(merged.ism.fwhm_x[-1])
    if frc:
        metrics["point_frc_resolution_at_smax"] = float(
            merged.point.frc_resolution[-1])
        metrics["line_frc_resolution_at_smax"] = float(
            merged.line.frc_resolution[-1])
    emit_metrics(metrics, os.path.join(out_dir, "metrics.jsonl"))
    return metrics


def fusion_pipeline(out_dir: str, size: int = 256, num_angles: int = 4,
                    depletion: float = 8.0, rl_iters: int = 50,
                    seed: int = 0, modality: str = "descan") -> dict:
    """Multi-orientation line-STED acquisition + RL fusion (config 5).

    ``modality="descan"`` fuses descanned images with per-view kernels;
    ``modality="rescan"`` fuses rescanned canvases through the operator-form
    RL (deconvolve + de-rescan in one loop, see ``algorithms/fusion.py``).
    """
    grid = Grid(size, size)
    sample = _default_sample(size)
    lgeom = LineSTEDGeometry(grid)
    params = LineSTEDParams.create(depletion=depletion, brightness=200.0)
    angles = jnp.arange(num_angles) * (jnp.pi / num_angles)

    if modality == "rescan":
        from rescan_line_sted_tpu.algorithms.fusion import (
            multi_orientation_rescan,
            rescan_fusion,
        )
        from rescan_line_sted_tpu.imaging.orientations import (
            orientation_kernels,
        )
        rgeom = RescanGeometry(grid, rescan_factor=2.0)
        # static angles: they parameterize per-view operators under jit
        angles_static = tuple(float(i) * np.pi / num_angles
                              for i in range(num_angles))

        @jax.jit
        def run(key):
            canvases = multi_orientation_rescan(
                sample, params, rgeom, jnp.asarray(angles_static), key=key)
            fused = rescan_fusion(canvases, params, rgeom, angles_static,
                                  num_iter=rl_iters)
            return canvases, fused

        canvases, fused = run(jax.random.key(seed))
        views = canvases
        kernels = orientation_kernels((size, size), params, angles)
    elif modality == "descan":

        @jax.jit
        def run(key):
            views, kernels = multi_orientation_line_sted(
                sample, params, lgeom, angles, key=key)
            fused = richardson_lucy_views(views, kernels, num_iter=rl_iters)
            return views, kernels, fused

        views, kernels, fused = run(jax.random.key(seed))
    else:
        raise ValueError(f"unknown modality {modality!r}")
    _save_panels(out_dir, "fusion", {
        "sample": sample,
        "view_0deg": views[0],
        f"view_{int(180 // num_angles)}deg": views[1],
        "fused_rl": fused,
    })
    ky, kx = fwhm_2d(kernels[0])
    metrics = {
        "pipeline": "fusion",
        "modality": modality,
        "num_angles": num_angles,
        "rl_iters": rl_iters,
        "view_kernel_fwhm_x": float(kx),
        "view_kernel_fwhm_y": float(ky),
    }
    emit_metrics(metrics, os.path.join(out_dir, "metrics.jsonl"))
    return metrics


def fov_pipeline(out_dir: str, sizes: tuple[int, ...] = (128, 256, 512),
                 depletion: float = 8.0, num_angles: int = 4,
                 rl_iters: int = 40, seed: int = 0) -> dict:
    """Batched resolution/FOV sweep (config 5): fused resolution + timing
    per field-of-view size."""
    from rescan_line_sted_tpu.sweeps import resolution_fov_sweep

    params = LineSTEDParams.create(depletion=depletion, brightness=200.0)
    records = resolution_fov_sweep(tuple(sizes), params,
                                   num_angles=num_angles, rl_iters=rl_iters,
                                   key=jax.random.key(seed))
    os.makedirs(out_dir, exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        fovs = [r["fov"] for r in records]
        ax1.plot(fovs, [r["fused_fwhm_x"] for r in records], "o-",
                 label="fused x")
        ax1.plot(fovs, [r["fused_fwhm_y"] for r in records], "s-",
                 label="fused y")
        ax1.plot(fovs, [r["view_kernel_fwhm_y"] for r in records], "--",
                 label="single view (wide axis)")
        ax1.set_xlabel("FOV (px)"), ax1.set_ylabel("FWHM (px)"), ax1.legend()
        ax1.set_title("fused resolution vs FOV")
        ax2.plot(fovs, [r["wall_s"] for r in records], "o-")
        ax2.set_xlabel("FOV (px)"), ax2.set_ylabel("wall (s)")
        ax2.set_title("acquisition+fusion wall-clock")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "fov_sweep.png"), dpi=120)
        plt.close(fig)
    except ImportError:  # pragma: no cover
        pass
    metrics = {"pipeline": "fov", "records": records}
    emit_metrics(metrics, os.path.join(out_dir, "metrics.jsonl"))
    return metrics


def ism_pipeline(out_dir: str, size: int = 256, depletion: float = 8.0,
                 rescan_factor: float = 2.0, seed: int = 0,
                 boundary: str = "padded") -> dict:
    """Rescanned POINT-STED (2D pixel reassignment / ISM; beyond-reference).

    Panels: descanned point-STED vs the ISM canvas at s=0 (classic rescan
    confocal, sqrt(2) gain) and at the requested depletion (rescan STED).
    Default ``boundary="padded"``: the siemens-star sample reaches the field
    edge, where the analytic canvas mean (unwrapped camera indices) and the
    wrapping scan path disagree under a circular world -- pad-acquire-crop
    keeps both exact (see ``imaging/rescan_point`` module doc).
    """
    from rescan_line_sted_tpu.algorithms.metrics import fwhm_1d
    from rescan_line_sted_tpu.config import PointSTEDParams, RescanPointGeometry
    from rescan_line_sted_tpu.imaging import (
        point_sted_image,
        rescan_point_system_kernel,
        rescanned_point_sted_image,
    )

    grid = Grid(size, size)
    sample = _default_sample(size)
    pgeom = PointSTEDGeometry(grid)
    rgeom = RescanPointGeometry(grid, rescan_factor=rescan_factor)
    conf = PointSTEDParams.create(depletion=0.0, brightness=200.0)
    sted = PointSTEDParams.create(depletion=depletion, brightness=200.0)
    key = jax.random.key(seed)

    @jax.jit
    def run(key):
        ks = jax.random.split(key, 3)
        descan = point_sted_image(sample, sted, pgeom, key=ks[0],
                                  boundary=boundary).image
        ism = rescanned_point_sted_image(sample, conf, rgeom, key=ks[1],
                                         boundary=boundary).image
        ism_sted = rescanned_point_sted_image(sample, sted, rgeom,
                                              key=ks[2],
                                              boundary=boundary).image
        kern_c = rescan_point_system_kernel(rgeom, conf)
        kern_s = rescan_point_system_kernel(rgeom, sted)
        hc = kern_c.shape[0] // 2
        return descan, ism, ism_sted, (fwhm_1d(kern_c[hc]) / rescan_factor,
                                       fwhm_1d(kern_s[hc]) / rescan_factor)

    descan, ism, ism_sted, (fwhm_c, fwhm_s) = run(key)
    _save_panels(out_dir, "ism", {
        "sample": sample,
        "point_sted_descanned": descan,
        "ism_canvas_confocal": ism,
        "ism_canvas_sted": ism_sted,
    })
    metrics = {
        "pipeline": "ism",
        "canvas_shape": list(ism.shape),
        "rescan_factor": rescan_factor,
        "ism_confocal_fwhm_sample_px": float(fwhm_c),
        "ism_sted_fwhm_sample_px": float(fwhm_s),
    }
    emit_metrics(metrics, os.path.join(out_dir, "metrics.jsonl"))
    return metrics


def rescan_pipeline(out_dir: str, size: int = 256, depletion: float = 8.0,
                    rescan_factor: float = 2.0, seed: int = 0) -> dict:
    """Rescanned line-STED canvas formation, descan comparison."""
    grid = Grid(size, size)
    sample = _default_sample(size)
    lgeom = LineSTEDGeometry(grid)
    rgeom = RescanGeometry(grid, rescan_factor=rescan_factor)
    params = LineSTEDParams.create(depletion=depletion, brightness=200.0)
    key = jax.random.key(seed)

    @jax.jit
    def run(key):
        k1, k2 = jax.random.split(key)
        descan = line_sted_image(sample, params, lgeom, key=k1).image
        rescan = rescanned_line_sted_image(sample, params, rgeom, key=k2).image
        return descan, rescan

    descan, rescan = run(key)
    _save_panels(out_dir, "rescan", {
        "sample": sample,
        "descanned": descan,
        "rescanned_canvas": rescan,
    })
    metrics = {
        "pipeline": "rescan",
        "canvas_shape": list(rescan.shape),
        "rescan_factor": rescan_factor,
        "descan_sum": float(jnp.sum(descan)),
        "rescan_sum": float(jnp.sum(rescan)),
    }
    emit_metrics(metrics, os.path.join(out_dir, "metrics.jsonl"))
    return metrics

#!/usr/bin/env python3
"""Honest device-kernel shootout on synthetic resident data.

Times every hot kernel with a data-dependent host-read sync (a checksum
pulled to the host after the timed reps) — `block_until_ready` alone can
acknowledge at dispatch on relay-attached backends and is never trusted
here (docs/PERF.md "Measurement integrity").

    python benchmarks/kernels.py [--frames 2000] [--ih 2048] [--iw 300]

All data is generated ON DEVICE, so the script measures kernels, not the
host link.  Representative v5e results live in docs/PERF.md.
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def host_main(args) -> None:
    """Host-kernel shootout (CPU-only / host-pipeline fast paths): each
    native kernel A/B'd against the numpy form it replaces, interleaved in
    one process so both sides see the same memory weather."""
    import tempfile

    from solex_ser_recon_en_tpu.io.synthetic import SyntheticScan
    from solex_ser_recon_en_tpu.io.native import NativeSerReader, get_lib
    from solex_ser_recon_en_tpu.io.hostreduce import host_mean_max
    from solex_ser_recon_en_tpu.io.ser import SerReader
    from solex_ser_recon_en_tpu.ops.warp import (
        warp_host_u16,
        warp_projective_host,
        warp_to_u16_host,
    )
    from solex_ser_recon_en_tpu.pipeline import products

    F, ih, iw = args.frames, args.ih, args.iw
    print(f"host kernels: native lib {'OK' if get_lib() else 'MISSING'}; "
          f"scan ({F}, {ih}, {iw}) u16 {F * ih * iw * 2 / 1e9:.2f} GB")
    rng = np.random.default_rng(0)

    def bench(tag, fn, n=args.reps):
        fn()  # warm (page cache / LUT build)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"{tag:46s} {dt * 1e3:8.1f} ms")
        return dt

    with tempfile.TemporaryDirectory() as td:
        scan = SyntheticScan(ih=ih, iw=iw, frames=F, depth=16)
        path = td + "/host_bench.ser"
        scan.write(path, transpose_to_wide=True)
        rdr = NativeSerReader(path)
        bench("pass A: native tile-major fused sum+max", lambda: rdr.mean_max())

        def np_two_pass():
            a = SerReader(path).raw_frames()
            np.add.reduce(a, axis=0, dtype=np.uint64)
            np.maximum.reduce(a, axis=0)

        bench("pass A: numpy two-pass (mmap)", np_two_pass, n=1)

    H, W = ih + 26, 2100
    img = rng.integers(0, 60000, size=(H, W), dtype=np.uint16)
    mat3 = np.array([[0.99, 0.02, -3.0], [0.0, 1.0, -8.0], [0, 0, 1.0]])
    bench("warp: native kernel (u16 in, u16 out)",
          lambda: warp_host_u16(img, mat3, H, W, 0.1))
    arr = img.astype(np.float32) / 65536.0
    bench("warp: numpy twin (4 masked tap planes)",
          lambda: warp_to_u16_host(
              warp_projective_host(arr, mat3, H, W, 0.1)), n=1)

    bench("product core: LUT stretches + hist pctl",
          lambda: products._products_body_host(img))

    def straight_numpy_core():
        import cv2

        cl1 = cv2.createCLAHE(clipLimit=0.8, tileGridSize=(2, 2)).apply(img)
        bright = max(float(np.percentile(img, 99.9999)), 1.0)
        dark = float(np.percentile(cl1, 10.0))
        hi = max(float(cl1.max()), dark + 1.0)
        for im, lo, h2 in ((cl1, dark, hi), (img, bright * 0.25, bright),
                           (img, 0.0, max(bright * 0.18, 1.0))):
            x = 65535.0 * (im.astype(np.float32) - lo) / np.float32(h2 - lo)
            np.clip(x, 0, 65535).astype(np.uint16)

    bench("product core: straight numpy forms", straight_numpy_core)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--ih", type=int, default=2048)
    ap.add_argument("--iw", type=int, default=300)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--host", action="store_true",
                    help="shoot out the HOST fast-path kernels instead "
                         "(native sweep/warp, LUT product core vs their "
                         "numpy forms)")
    args = ap.parse_args()

    if args.host:
        host_main(args)
        return

    import jax
    import jax.numpy as jnp

    from solex_ser_recon_en_tpu.models.shg import shg_forward_xla
    from solex_ser_recon_en_tpu.ops.fused_pallas import shg_fused_pallas
    from solex_ser_recon_en_tpu.ops.recon import (
        _recon_gather,
        _recon_onehot,
        build_shift_indices,
    )

    F, ih, iw = args.frames, args.ih, args.iw
    print(f"backend={jax.default_backend()}  slab=({F}, {ih}, {iw}) u16 "
          f"{F * ih * iw * 2 / 1e9:.2f} GB")
    slab = jax.random.randint(
        jax.random.PRNGKey(0), (F, ih, iw), 0, 65536, jnp.int32
    ).astype(jnp.uint16)
    float(jnp.sum(slab.astype(jnp.uint32)))  # force materialisation

    curve = iw / 2 + 0.001 * np.arange(ih)
    fl = np.floor(curve)
    ind_l, left_w = build_shift_indices(fl, curve - fl, [10, 0], iw)
    ind_l, left_w = jax.device_put(ind_l), jax.device_put(left_w)

    def bench(tag, make):
        try:
            float(make())  # compile + warm
        except Exception as e:  # pragma: no cover - report and continue
            print(f"{tag:42s} FAILED: {str(e)[:120]}")
            return
        t0 = time.perf_counter()
        acc = None
        for _ in range(args.reps):
            c = make()
            acc = c if acc is None else acc + c
        float(acc)  # true completion of every rep
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{tag:42s} {dt * 1e3:8.1f} ms   {F / dt:9.0f} frames/s")

    def ck(out):
        return jnp.sum(out[2].astype(jnp.uint32)) + jnp.sum(
            out[0].astype(jnp.uint32)
        )

    bench("fused pallas step VPU (mean+max+recon, S=2)",
          lambda: ck(shg_fused_pallas(slab, ind_l, left_w, mxu=False,
                                      window=False)))
    bench("fused pallas step VPU windowed (S=2)",
          lambda: ck(shg_fused_pallas(slab, ind_l, left_w, mxu=False)))
    bench("fused pallas step MXU (mean+max+recon, S=2)",
          lambda: ck(shg_fused_pallas(slab, ind_l, left_w, mxu=True)))
    bench("XLA step (reductions + one-hot matmul)",
          lambda: ck(shg_forward_xla(slab, ind_l, left_w)))

    # large Doppler sweep: where the VPU mask-reduce's O(S) scaling bites
    sweep = list(range(-10, 11, 3))  # S=7
    ind7, w7 = build_shift_indices(fl, curve - fl, sweep, iw)
    ind7, w7 = jax.device_put(ind7), jax.device_put(w7)
    bench(f"fused pallas step VPU (S={len(sweep)})",
          lambda: ck(shg_fused_pallas(slab, ind7, w7, mxu=False,
                                      window=False)))
    bench(f"fused pallas step VPU windowed (S={len(sweep)})",
          lambda: ck(shg_fused_pallas(slab, ind7, w7, mxu=False)))
    bench(f"fused pallas step MXU (S={len(sweep)})",
          lambda: ck(shg_fused_pallas(slab, ind7, w7, mxu=True)))
    bench(f"XLA step (S={len(sweep)})",
          lambda: ck(shg_forward_xla(slab, ind7, w7)))
    bench("recon only: one-hot MXU matmul",
          lambda: jnp.sum(_recon_onehot(slab, ind_l, left_w, iw=iw)
                          .astype(jnp.uint32)))
    bench("recon only: take_along_axis gather",
          lambda: jnp.sum(_recon_gather(slab, ind_l, left_w)
                          .astype(jnp.uint32)))

    # post-processing kernels on a warped-disk-sized image
    from solex_ser_recon_en_tpu.ops.clahe import _clahe
    from solex_ser_recon_en_tpu.ops.warp import warp_projective, warp_to_u16
    from solex_ser_recon_en_tpu.pipeline.products import _products_core_gained

    H, W = ih + 26, F + 100
    img = jax.random.randint(
        jax.random.PRNGKey(1), (H, W), 0, 60000, jnp.int32
    ).astype(jnp.uint16)
    float(jnp.sum(img.astype(jnp.uint32)))
    gain = jnp.ones((H,), jnp.float32)
    mat3 = jnp.asarray(
        np.array([[0.99, 0.02, -3.0], [0.015, 1.04, -8.0], [0, 0, 1.0]])
    )
    imgf = img.astype(jnp.float32) / 65536.0

    bench(f"CLAHE 2x2 u16 ({H}x{W})",
          lambda: jnp.sum(_clahe(img, 0.8, 2, 2, 65536).astype(jnp.float32)))
    bench("fused product core (gain+CLAHE+stretches)",
          lambda: jnp.sum(_products_core_gained(img, gain)[2]
                          .astype(jnp.uint32)))
    bench("warp: float 4-tap gathers",
          lambda: jnp.sum(warp_to_u16(
              warp_projective(imgf, mat3, H, W, cval=0.1)
          ).astype(jnp.uint32)))
    from solex_ser_recon_en_tpu.ops.warp import warp_projective_u16

    bench("warp: packed-pair u16 (pipeline path)",
          lambda: jnp.sum(warp_to_u16(
              warp_projective_u16(img, mat3, H, W, cval=0.1)
          ).astype(jnp.uint32)))

    # pipeline-shaped correction matrix (second row [0,1,ty]) for the
    # separable fast path vs the same matrix through the general warp
    from solex_ser_recon_en_tpu.geometry.ellipse import get_correction_matrix
    from solex_ser_recon_en_tpu.ops.warp_fast import warp_unit_y_u16

    corr, _ = get_correction_matrix(0.15, 0.93)
    m3u = np.zeros((3, 3))
    m3u[:2, :2] = corr
    m3u[2, 2] = 1.0
    m3u = m3u @ np.array([[1, 0, -13.4], [0, 1, 7.3], [0, 0, 1.0]])
    m3uj = jnp.asarray(m3u)
    bench("warp: packed-pair u16, unit-y matrix",
          lambda: jnp.sum(warp_to_u16(
              warp_projective_u16(img, m3uj, H, W, cval=0.1)
          ).astype(jnp.uint32)))
    bench("warp: separable gather-free kernel",
          lambda: jnp.sum(warp_to_u16(
              warp_unit_y_u16(img, m3u, H, W, cval=0.1)
          ).astype(jnp.uint32)))


if __name__ == "__main__":
    main()

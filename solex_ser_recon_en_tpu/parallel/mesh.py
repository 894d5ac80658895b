"""Multi-chip sharding for the reconstruction pipeline.

The reference's only parallelism is a 4-process pool over *files*
(Solex_recon.py:30-42, SURVEY.md §2.24).  The TPU-native equivalents:

- **frame axis** ("sequence parallel" analogue, SURVEY.md §5.7): each frame
  writes a disjoint column of the output disk, so sharding frames across
  chips needs *zero* communication in the recon itself; only the mean/max
  reduction inserts one psum over the frame axis.
- **batch axis** ("data parallel" analogue, §5.8): different files on
  different mesh rows, fully independent.

Everything is expressed with ``NamedSharding`` annotations on a 2-D
``Mesh(('batch', 'frame'))`` and left to XLA to partition — no hand-written
collectives needed for this workload (the collectives that do appear,
psum over 'frame' for the mean, ride ICI).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a ('batch', 'frame') mesh.

    axes: {"batch": B, "frame": F} with B*F == len(devices); default puts
    all devices on the frame axis (the zero-communication direction).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if axes is None:
        axes = {"batch": 1, "frame": n}
    b = int(axes.get("batch", 1))
    f = int(axes.get("frame", max(1, n // b)))
    if b * f != n:
        raise ValueError(f"mesh {axes} does not match {n} devices")
    return Mesh(devices.reshape(b, f), ("batch", "frame"))


def mesh_from_options(spec: Optional[Dict[str, int]]) -> Optional[Mesh]:
    """Build the pipeline mesh from ``Options.mesh``.

    Returns None (single-device operation) when the spec is empty, names a
    single device, or asks for more devices than the host has — the product
    pipeline degrades gracefully rather than aborting, mirroring the
    reference's per-file resilience posture (SHG_MAIN.py:104-129).
    """
    if not spec:
        return None
    b = int(spec.get("batch", 1))
    f = int(spec.get("frame", 1))
    n = b * f
    if n <= 1:
        return None
    devs = jax.devices()
    if n > len(devs):
        print(
            f"WARNING: mesh {spec} needs {n} devices, host has {len(devs)}; "
            "running single-device"
        )
        return None
    return make_mesh({"batch": b, "frame": f}, devs[:n])


def frame_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Sharding for a frames-leading array: frame axis split, rest replicated."""
    return NamedSharding(mesh, P("frame", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    """``frame=8`` / ``batch=2,frame=4`` / bare ``8`` (all-frame) -> dict."""
    spec = spec.strip()
    if spec.isdigit():
        return {"frame": int(spec)}
    out: Dict[str, int] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in ("batch", "frame") or not v.strip().isdigit():
            raise ValueError(f"invalid mesh spec {spec!r}")
        out[k] = int(v)
    return out


def shard_scan_recon(frames, ind_l, left_w, mesh: Mesh, kernel: str = "onehot"):
    """Single-file multi-shift recon with the frame axis sharded.

    frames (F, ih, iw) sharded over 'frame'; weights replicated. The output
    (S, ih, F) stays frame-sharded; gather it only when post-processing
    needs the whole disk (it is ~1000x smaller than the scan).
    """
    from ..ops.recon import _recon_gather, _recon_onehot

    fsh = NamedSharding(mesh, P("frame", None, None))
    rep = NamedSharding(mesh, P())
    frames = jax.device_put(frames, fsh)
    ind_l = jax.device_put(jnp.asarray(ind_l), rep)
    left_w = jax.device_put(jnp.asarray(left_w), rep)
    if kernel == "onehot":
        out = _recon_onehot(frames, ind_l, left_w, iw=frames.shape[2])
    else:
        out = _recon_gather(frames, ind_l, left_w)
    return out


@jax.jit
def _batched_recon(frames, ind_l, left_w):
    """Batched recon for B same-shape scans in ONE program.

    frames (B, F, ih, iw) uint16; ind_l (B, S, ih) int32; left_w (B, ih)
    float32.  The folder-batch data plane (no warp — the circularisation
    matrices are only known after the per-scan ellipse fit, which consumes
    these disks; no mean/max — the line fit needed those BEFORE this
    program's inputs could be built, so the caller computed them host-side).
    Returns raw disks (B, S, ih, F) uint16.
    """
    from ..ops.recon import _recon_onehot

    def one(frames1, ind1, w1):
        return _recon_onehot(frames1, ind1, w1, iw=frames1.shape[2])

    return jax.vmap(one)(frames, ind_l, left_w)


def device_recon_batch(frames, ind_l, left_w, mesh: Optional[Mesh] = None):
    """Run ``_batched_recon``, sharded (batch, frame) over ``mesh`` when
    given — the folder-batch data plane (cli.main.handle_files groups
    same-shape small scans through this; reference analogue: the per-file
    Pool, Solex_recon.py:26-44, which cannot batch across files at all)."""
    if mesh is not None:
        frames = jax.device_put(
            jnp.asarray(frames), NamedSharding(mesh, P("batch", "frame", None, None)))
        ind_l = jax.device_put(
            jnp.asarray(ind_l), NamedSharding(mesh, P("batch", None, None)))
        left_w = jax.device_put(
            jnp.asarray(left_w), NamedSharding(mesh, P("batch", None)))
    return _batched_recon(
        jnp.asarray(frames), jnp.asarray(ind_l), jnp.asarray(left_w))


@partial(jax.jit, static_argnames=("out_u16",))
def _batched_step(frames, ind_l, left_w, warp_mats, row_gains, out_u16=True):
    """The full device compute path for a batch of scans.

    frames    (B, F, ih, iw) uint16   — sharded (batch, frame)
    ind_l     (B, S, ih) int32        — per-scan shift indices
    left_w    (B, ih) float32         — per-scan interp weights
    warp_mats (B, 3, 3) float32       — circularisation inverse maps
    row_gains (B, ih) float32         — transversalium gains

    Returns dict of mean/max images, raw disks, corrected disks.
    All stages are batched with vmap; XLA partitions them over the mesh from
    the input shardings (frame-axis reductions become psums over ICI).
    """
    from ..ops.recon import _recon_onehot
    from ..ops.warp import warp_projective

    def one(frames1, ind1, w1, mat1, gain1):
        s = jnp.sum(frames1.astype(jnp.int32), axis=0)
        mean = (s // frames1.shape[0]).astype(jnp.uint16)
        mx = jnp.max(frames1, axis=0)
        disks = _recon_onehot(frames1, ind1, w1, iw=frames1.shape[2], out_u16=False)
        ih, F = disks.shape[1], disks.shape[2]

        def fix(disk):
            w = warp_projective(disk / 65536.0, mat1, ih, F, cval=0.0)
            w = jnp.clip(w * 65536.0, 0, 65535)
            return jnp.clip(w * gain1[:, None], 0, 65535)

        circ = jax.vmap(fix)(disks)
        if out_u16:
            disks = jnp.clip(disks, 0, 65535).astype(jnp.uint16)
            circ = circ.astype(jnp.uint16)
        return mean, mx, disks, circ

    mean, mx, disks, circ = jax.vmap(one)(frames, ind_l, left_w, warp_mats, row_gains)
    return {"mean": mean, "max": mx, "raw": disks, "circular": circ}


def device_pipeline_step(
    frames, ind_l, left_w, warp_mats, row_gains, mesh: Optional[Mesh] = None
):
    """Run the batched device step, sharded over ``mesh`` when given."""
    if mesh is not None:
        fsh = NamedSharding(mesh, P("batch", "frame", None, None))
        rep = NamedSharding(mesh, P("batch"))
        frames = jax.device_put(jnp.asarray(frames), fsh)
        ind_l = jax.device_put(jnp.asarray(ind_l), NamedSharding(mesh, P("batch", None, None)))
        left_w = jax.device_put(jnp.asarray(left_w), NamedSharding(mesh, P("batch", None)))
        warp_mats = jax.device_put(jnp.asarray(warp_mats), NamedSharding(mesh, P("batch", None, None)))
        row_gains = jax.device_put(jnp.asarray(row_gains), NamedSharding(mesh, P("batch", None)))
    return _batched_step(
        jnp.asarray(frames),
        jnp.asarray(ind_l),
        jnp.asarray(left_w),
        jnp.asarray(warp_mats),
        jnp.asarray(row_gains),
    )

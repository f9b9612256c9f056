"""Multi-chip sharding of the batched video pipeline.

The reference scales by running independent decoder/encoder instances per
GPU (SURVEY.md §2.4); the TPU build scales the *device* side the XLA way:
pick a mesh, annotate shardings, let the compiler insert collectives over
ICI. Axes:

  - "data":    frames/streams (pure data parallel — no communication)
  - "spatial": image height (spatial partitioning for large frames; the
    resize matmuls contract over H, so XLA turns this into
    reduce-scatter/all-gather pairs on ICI)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from ..ops.fused import fused_preprocess
from ..ops.resize import LANCZOS_AA


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map across JAX versions: jax.shard_map (>=0.8, no check_rep)
    or jax.experimental.shard_map (older, needs check_rep=False so
    pallas_call bodies pass replication checking)."""
    try:
        from jax import shard_map
        # check_vma=False: pallas_call outputs don't carry vma metadata
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        # TypeError: JAX versions where jax.shard_map exists but still
        # takes check_rep instead of check_vma
        try:
            from jax import shard_map
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)
        except (ImportError, TypeError):
            from jax.experimental.shard_map import shard_map
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def make_mesh(data: int = 0, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, spatial) mesh. data=0 means "all devices / spatial"."""
    devices = list(devices if devices is not None else jax.devices())
    if data <= 0:
        data = len(devices) // spatial
    if data * spatial != len(devices):
        devices = devices[: data * spatial]
    arr = np.array(devices).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_planes(planes, mesh: Mesh):
    """Place batched planes on the mesh: batch over data, rows over
    spatial. Host numpy inputs are snapshotted first on host-backed
    meshes (device_put can alias host memory there; see
    memory.surface._host_snapshot)."""
    sharding = NamedSharding(mesh, P("data", "spatial", None))
    if mesh.devices.flat[0].platform == "cpu":
        from ..memory.surface import _host_snapshot

        planes = tuple(
            _host_snapshot(p, mesh.devices.flat[0])
            if isinstance(p, np.ndarray) else p for p in planes)
    return tuple(jax.device_put(p, sharding) for p in planes)


def sharded_preprocess(
    mesh: Mesh,
    src_fmt: PixelFormat,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    planar: bool = False,
    method: str = LANCZOS_AA,
):
    """Compile the fused preprocess across the mesh.

    Inputs are expected sharded [B@data, H@spatial, W]; output is
    [B@data, dst_h, dst_w, 3] (spatial gathered — dst is small).
    """
    in_spec = P("data", "spatial", None)
    # output batch shards over data either way (dst is small, spatial
    # gathers)
    out_spec = P("data", None, None, None)

    def fn(planes):
        return fused_preprocess(planes, src_fmt, src_w, src_h, dst_w, dst_h,
                                space, crange, out_dtype, planar, method)

    n_planes = 1 if src_fmt in (PixelFormat.NV12, PixelFormat.P10,
                                PixelFormat.P12) else 3
    return jax.jit(
        fn,
        in_shardings=(tuple(NamedSharding(mesh, in_spec)
                            for _ in range(n_planes)),),
        out_shardings=NamedSharding(mesh, out_spec),
    )


def sharded_pallas_preprocess(mesh: Mesh, src_w: int, src_h: int,
                              dst_w: int, dst_h: int,
                              space: ColorSpace = ColorSpace.BT_709,
                              crange: ColorRange = ColorRange.MPEG,
                              out_dtype=None, planar: bool = True):
    """Multi-chip wrapper for the banded Pallas NV12 kernel: the batch is
    sharded over the mesh's "data" axis and each chip runs the kernel on
    its local shard (embarrassingly parallel — no collectives). Input must
    be [B, H*3/2(+pad), W] with B divisible by the data-axis size."""
    from ..ops.pallas_fused import pallas_nv12_preprocess

    if out_dtype is None:
        out_dtype = jnp.uint8

    def local_fn(nv12_shard):
        out = pallas_nv12_preprocess(
            nv12_shard, src_w=src_w, src_h=src_h, dst_w=dst_w, dst_h=dst_h,
            space=space, crange=crange, out_dtype=out_dtype)
        return out if planar else jnp.moveaxis(out, 1, -1)

    sharded = _shard_map(
        local_fn, mesh=mesh,
        in_specs=P("data", None, None),
        out_specs=P("data", None, None, None))
    return jax.jit(sharded)

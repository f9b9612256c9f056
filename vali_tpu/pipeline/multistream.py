"""Multi-stream batched decode -> TPU preprocess pipeline.

The TPU-native replacement for the reference's N-independent-decoder
pattern (SURVEY.md §2.4: instance-level concurrency, 64-stream north star).
Architecture:

  N demux/decode threads (GIL released in the native engine)
      -> per-stream host frame ring
      -> batch assembler (double-buffered pinned staging)
      -> one jitted fused CSC+resize pass per batch on the TPU
      -> async device futures handed to the consumer

Decode runs on host cores and overlaps with device compute; the TPU sees
one large batched kernel per tick instead of 64 small ones — the design
the hardware wants (SURVEY.md §7.6).
"""

from __future__ import annotations

import functools
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat, TaskExecInfo
from ..engine.decoder import PyDecoder
from ..ops.fused import fused_preprocess
from ..ops.resize import LANCZOS_AA
from ..utils.device import get_device


@functools.partial(jax.jit, static_argnames=(
    "src_fmt", "src_w", "src_h", "dst_w", "dst_h", "space", "crange",
    "out_dtype", "planar", "method", "normalize"))
def _preprocess_jit(planes, *, src_fmt, src_w, src_h, dst_w, dst_h, space,
                    crange, out_dtype, planar, method, normalize=None):
    return fused_preprocess(planes, src_fmt, src_w, src_h, dst_w, dst_h,
                            space, crange, out_dtype, planar, method,
                            normalize)


@functools.partial(jax.jit, static_argnames=(
    "dst_w", "dst_h", "left", "top", "pad_value", "normalize", "planar"))
def _letterbox_pad_jit(inner, *, dst_w, dst_h, left, top, pad_value,
                       normalize, planar):
    from ..ops.fused import letterbox_pad

    return letterbox_pad(inner, dst_w, dst_h, left, top,
                         pad_value=pad_value, normalize=normalize,
                         planar=planar)


def _pallas_usable(src_fmt, space, crange) -> bool:
    """True when a banded Pallas kernel covers the format on this
    platform (format set shared with staging_pad_rows and the
    pallas_preprocess dispatch — one source of truth)."""
    from ..utils.device import pallas_platform_available

    if not pallas_platform_available():
        return False
    from ..ops import colors
    from ..ops.pallas_fused import pallas_preprocess_formats

    return (PixelFormat(src_fmt) in pallas_preprocess_formats()
            and colors.yuv2rgb_matrix(space, crange) is not None)


class _StreamWorker(threading.Thread):
    """Decodes a GROUP of streams round-robin on one thread.

    Frames are decoded straight into recycled buffers from ``buf_pool``
    (no per-frame copy); the consumer returns them to the pool after the
    batch is staged. One thread per stream (group size 1) is the
    reference's model; for stream counts far above the host core count
    that thrashes the scheduler, so groups multiplex several decoders on
    one thread while every stream still progresses.
    """

    def __init__(self, streams, opts, out_q: "queue.Queue",
                 stop_event: threading.Event, buf_pool: "queue.Queue"):
        ids = [sid for sid, _ in streams]
        name = (f"vali-decode-{ids[0]}" if len(ids) == 1
                else f"vali-decode-mux-{ids[0]}-{ids[-1]}")
        super().__init__(daemon=True, name=name)
        self.streams = list(streams)  # [(stream_id, source), ...]
        self.n_streams = len(self.streams)
        self.opts = dict(opts)
        self.out_q = out_q
        self.stop_event = stop_event
        self.buf_pool = buf_pool
        self.error: Optional[Exception] = None

    def run(self):
        ended = set()
        live = {}
        try:
            for sid, src in self.streams:
                live[sid] = PyDecoder(src, self.opts, gpu_id=-1)
            while live and not self.stop_event.is_set():
                for sid in list(live):
                    if self.stop_event.is_set():
                        break
                    try:
                        buf = self.buf_pool.get(timeout=0.2)
                    except queue.Empty:
                        continue
                    ok, info = live[sid].DecodeSingleFrame(buf)
                    if not ok or info != TaskExecInfo.SUCCESS:
                        self.buf_pool.put(buf)
                        del live[sid]
                        self.out_q.put((sid, None))
                        ended.add(sid)
                        continue
                    self.out_q.put((sid, buf))
        except Exception as e:
            self.error = e
        finally:
            for sid, _ in self.streams:  # sentinels for streams cut short
                if sid not in ended:
                    self.out_q.put((sid, None))
                    ended.add(sid)


class MultiStreamPipeline:
    """Decode N streams and yield batched, preprocessed device tensors.

    Yields (batch, stream_ids): ``batch`` is a [B, dst_h, dst_w, 3] jax
    array on the target device (uint8, or float32 when ``normalize`` /
    ``out_dtype=float32``); ``stream_ids`` names the source of each row.
    """

    def __init__(self, sources: Sequence, dst_w: int, dst_h: int,
                 gpu_id: int = 0, opts: Optional[dict] = None,
                 batch_size: Optional[int] = None,
                 space: ColorSpace = ColorSpace.BT_709,
                 crange: ColorRange = ColorRange.MPEG,
                 out_dtype=jnp.uint8, planar: bool = False,
                 method: str = LANCZOS_AA,
                 normalize=None,
                 queue_depth: int = 4,
                 sync_streams: bool = False,
                 prefetch: int = 2,
                 decode_threads: Optional[int] = None,
                 mesh=None,
                 letterbox: bool = False,
                 pad_value: int = 114):
        """``sync_streams=True`` assembles batches with exactly one frame
        per live stream (lock-step across streams, e.g. for synchronized
        multi-camera rigs); the default takes frames in arrival order for
        maximum throughput. ``prefetch`` batches are staged and dispatched
        ahead of the consumer (host staging + H2D overlap with downstream
        compute — the double-buffering the reference gets from CUDA
        streams). ``decode_threads`` bounds the decode thread pool: when
        streams outnumber host cores, streams are multiplexed round-robin
        over this many threads instead of one thread per stream (default:
        min(n_streams, 4*cpu_count); sync_streams always uses one thread
        per stream). ``mesh``: a ``jax.sharding.Mesh`` with a "data" axis
        — staged batches are sharded over it and the preprocess runs on
        every chip of the mesh (batch_size must be divisible by the
        data-axis size; gpu_id is then ignored). ``letterbox=True``
        keeps the source aspect ratio: content is resized to fit inside
        dst_w x dst_h and centered on a ``pad_value`` canvas (detection
        convention — see ops/fused.letterbox_params for mapping model
        outputs back to source coordinates)."""
        if not sources:
            raise ValueError("Need at least one source")
        self.sources = list(sources)
        self.dst_w, self.dst_h = dst_w, dst_h
        self.device = get_device(gpu_id)
        self.batch_size = batch_size or len(self.sources)
        self.space, self.crange = space, crange
        self.out_dtype = out_dtype
        self.planar = planar
        self.method = method
        # per-channel (mean, std) folded into the preprocess kernel so
        # model-ready tensors come straight off the chip
        if normalize is not None and np.dtype(out_dtype) == np.uint8:
            raise ValueError(
                "normalize requires a float out_dtype (e.g. jnp.float32 "
                "or jnp.bfloat16)")
        self.normalize = normalize
        self.letterbox = bool(letterbox)
        self.pad_value = int(pad_value)
        self.sync_streams = sync_streams
        self.prefetch = max(1, int(prefetch))
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if "data" not in mesh.axis_names:
                raise ValueError("mesh needs a 'data' axis")
            data_size = mesh.shape["data"]
            if self.batch_size % data_size:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"mesh data axis ({data_size})")
            self._batch_sharding = NamedSharding(mesh, P("data", None,
                                                         None))

        # probe every source: the shared buffer pool and batch geometry
        # require uniform width/height/format across streams
        probe = PyDecoder(self.sources[0], opts or {}, gpu_id=-1)
        self.src_w, self.src_h = probe.Width, probe.Height
        self.src_fmt = probe.Format
        probe_size = probe.HostFrameSize
        del probe
        # Formats headed for a banded Pallas kernel get their staging
        # batches padded per plane on the HOST (a staging copy happens
        # anyway) so the kernels never pay device-side jnp.pad copies.
        self._stage_plane_dims = None
        self._staging_inflight = []  # (host buffer, jax future) pairs
        self._staging_free = []
        if _pallas_usable(self.src_fmt, space, crange):
            from ..core.formats import format_info as _fi
            from ..ops.fused import letterbox_params
            from ..ops.pallas_fused import staging_pad_rows

            # letterbox: the Pallas kernel resamples onto the INNER grid
            # (the pad is a separate cheap canvas update), so staging pads
            # follow the inner height.
            content_dst_h = dst_h if not self.letterbox else \
                letterbox_params(self.src_w, self.src_h, dst_w, dst_h)[1]
            pads = staging_pad_rows(self.src_fmt, self.src_w, self.src_h,
                                    content_dst_h, method=self.method)
            dims = _fi(self.src_fmt).plane_dims(self.src_w, self.src_h)
            if pads is not None and any(pads):
                self._stage_plane_dims = tuple(
                    (h + p, w) for (h, w), p in zip(dims, pads))
        # additional sources use the probe-only native decoder (demux
        # headers only, no codec open) — the workers' decoders are the
        # full opens
        from ..engine._loader import load_native
        from ..engine._opts import opt_str

        native = load_native()
        # the probe must see the SAME opts the workers decode with:
        # geometry-affecting options (e.g. video_size for raw input)
        # otherwise make uniform streams fail validation — or mismatched
        # ones pass it
        probe_opts = {opt_str(k): opt_str(v)
                      for k, v in (opts or {}).items()}
        seen = {self.sources[0]} if isinstance(self.sources[0],
                                               (str, bytes)) else set()
        for i, src in enumerate(self.sources[1:], start=1):
            if not isinstance(src, (str, bytes)) or src in seen:
                continue  # non-path sources are validated by their worker
            seen.add(src)
            p = native.Decoder(src, probe_opts, None, True).props()
            geom = (p["width"], p["height"], PixelFormat(p["format"]))
            if geom != (self.src_w, self.src_h, self.src_fmt):
                raise ValueError(
                    f"Source {i} geometry {geom[0]}x{geom[1]}/"
                    f"{geom[2].name} differs from source 0 "
                    f"{self.src_w}x{self.src_h}/"
                    f"{PixelFormat(self.src_fmt).name}; all streams in a "
                    f"pipeline must share resolution and pixel format")

        self._stop = threading.Event()
        # recycled decode buffers: enough for all queue slots + in-flight
        pool_size = (queue_depth + 2) * max(len(self.sources),
                                            self.batch_size)
        self._buf_pool: "queue.Queue" = queue.Queue()
        for _ in range(pool_size):
            self._buf_pool.put(np.zeros(probe_size, dtype=np.uint8))
        if sync_streams:
            self._queues: List["queue.Queue"] = [
                queue.Queue(maxsize=queue_depth)
                for _ in range(len(self.sources))
            ]
            self._workers = [
                _StreamWorker([(i, src)], opts or {}, self._queues[i],
                              self._stop, self._buf_pool)
                for i, src in enumerate(self.sources)
            ]
            self._frame_q = None
        else:
            self._frame_q = queue.Queue(
                maxsize=queue_depth * self.batch_size)
            self._queues = []
            import os as _os

            n_threads = decode_threads or min(
                len(self.sources), 4 * (_os.cpu_count() or 1))
            n_threads = max(1, min(n_threads, len(self.sources)))
            if n_threads == len(self.sources):
                groups = [[(i, src)] for i, src in enumerate(self.sources)]
            else:
                groups = [[] for _ in range(n_threads)]
                for i, src in enumerate(self.sources):
                    groups[i % n_threads].append((i, src))
            self._workers = [
                _StreamWorker(g, opts or {}, self._frame_q,
                              self._stop, self._buf_pool)
                for g in groups if g
            ]
        self._started = False
        self._live = 0
        self._alive_mask: List[bool] = [True] * len(self.sources)

    def start(self) -> "MultiStreamPipeline":
        if not self._started:
            for w in self._workers:
                w.start()
            # one EOS sentinel arrives per STREAM (mux workers own several)
            self._live = sum(getattr(w, "n_streams", 1)
                             for w in self._workers)
            self._started = True
        return self

    def stop(self) -> None:
        self._stop.set()
        # drain so workers blocked on put() can exit; recycle their buffers
        for q in ([self._frame_q] if self._frame_q else self._queues):
            try:
                while True:
                    _, frame = q.get_nowait()
                    if frame is not None:
                        self._buf_pool.put(frame)
            except queue.Empty:
                pass
        # join decode threads so interpreter teardown never kills a thread
        # mid-FFmpeg-call (they poll the stop event every 0.2s)
        deadline = 5.0
        for w in self._workers:
            if w.is_alive():
                import time as _time

                t0 = _time.monotonic()
                while w.is_alive() and _time.monotonic() - t0 < deadline:
                    # keep draining: a worker may be blocked on out_q.put
                    for q in ([self._frame_q] if self._frame_q
                              else self._queues):
                        try:
                            while True:
                                _, frame = q.get_nowait()
                                if frame is not None:
                                    self._buf_pool.put(frame)
                        except queue.Empty:
                            pass
                    w.join(timeout=0.1)

    def _q_get(self, q):
        """Queue get that honors the stop event. A public ``stop()`` call
        drains the queues — including the per-stream EOS sentinels — so a
        stager blocked in a plain ``q.get()`` would never wake. Returns
        None when stopped (treated as end of streams)."""
        while not self._stop.is_set():
            try:
                return q.get(timeout=0.2)
            except queue.Empty:
                continue
        return None

    def _assemble(self) -> Optional[Tuple[np.ndarray, List[int]]]:
        frames: List[np.ndarray] = []
        ids: List[int] = []
        if self.sync_streams:
            # lock-step: exactly one frame per live stream
            for sid, q in enumerate(self._queues):
                if not self._alive_mask[sid]:
                    continue
                item = self._q_get(q)
                if item is None:  # stopped mid-batch: recycle + bail
                    for buf in frames:
                        self._buf_pool.put(buf)
                    return None
                _, frame = item
                if frame is None:
                    self._alive_mask[sid] = False
                    self._live -= 1
                    continue
                frames.append(frame)
                ids.append(sid)
        else:
            while len(frames) < self.batch_size and self._live > 0:
                item = self._q_get(self._frame_q)
                if item is None:
                    for buf in frames:
                        self._buf_pool.put(buf)
                    return None
                stream_id, frame = item
                if frame is None:
                    self._live -= 1
                    continue
                frames.append(frame)
                ids.append(stream_id)
        if not frames:
            return None
        return frames, ids

    def _stage_one(self):
        """Assemble one batch, upload and dispatch its preprocess.

        Returns (device_future, ids) or None at end of streams."""
        item = self._assemble()
        if item is None:
            return None
        frames, ids = item
        staged_buf = None
        if self._stage_plane_dims is not None:
            batch_host = self._stage_padded(frames)
            staged_buf = batch_host
        else:
            batch_host = np.stack(frames)
        for buf in frames:  # recycle decode buffers
            self._buf_pool.put(buf)
        n_real = batch_host.shape[0]
        if self._batch_sharding is not None:
            data_size = self.mesh.shape["data"]
            rem = batch_host.shape[0] % data_size
            if rem:
                # EOS tail: pad so the batch shards evenly; the padded
                # rows are sliced back off the output below so the
                # (batch, ids) contract holds
                pad = data_size - rem
                batch_host = np.concatenate(
                    [batch_host,
                     np.repeat(batch_host[-1:], pad, axis=0)])
        planes = self._split(batch_host)
        target = self._batch_sharding or self.device
        planes = tuple(jax.device_put(p, target) for p in planes)
        out = self._dispatch_planes(planes, n_real)
        if staged_buf is not None:
            # the mesh EOS-tail path copies into a fresh concatenated
            # array, releasing the staged buffer immediately (fut=None)
            fut = out if staged_buf is batch_host else None
            self._staging_inflight.append((staged_buf, fut))
        return out, ids

    def _dispatch_planes(self, planes, n_real: Optional[int] = None):
        """Device-side half of :meth:`_stage_one`: run the (sharded or
        single-chip) fused preprocess over already-device-resident planes.
        Factored out so device-resident benchmarks (bench_configs config
        5 chip-side) exercise exactly the pipeline's dispatch path."""
        if self._batch_sharding is not None:
            out = self._sharded_preprocess()(planes)
            if n_real is not None and out.shape[0] != n_real:
                out = out[:n_real]
            return out
        return preprocess_batch(
            planes, self.src_fmt, self.src_w, self.src_h,
            self.dst_w, self.dst_h, space=self.space,
            crange=self.crange, out_dtype=self.out_dtype,
            planar=self.planar, method=self.method,
            normalize=self.normalize, letterbox=self.letterbox,
            pad_value=self.pad_value)

    def _sharded_preprocess(self):
        """shard_map the fused preprocess over the mesh's data axis: each
        chip runs the (Pallas or XLA) kernel on its local batch shard —
        embarrassingly parallel, no collectives (a Pallas custom call
        cannot be auto-partitioned by jit, hence the explicit map)."""
        if getattr(self, "_sharded_fn", None) is not None:
            return self._sharded_fn
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import _shard_map

        def local_fn(planes):
            return preprocess_batch(
                planes, self.src_fmt, self.src_w, self.src_h,
                self.dst_w, self.dst_h, space=self.space,
                crange=self.crange, out_dtype=self.out_dtype,
                planar=self.planar, method=self.method,
                normalize=self.normalize, letterbox=self.letterbox,
                pad_value=self.pad_value)

        from ..core.formats import format_info

        n_planes = len(format_info(self.src_fmt).plane_dims(
            self.src_w, self.src_h))
        in_specs = (tuple(P("data", None, None) for _ in range(n_planes)),)
        out_specs = P("data", None, None, None)
        self._sharded_fn = jax.jit(_shard_map(
            local_fn, mesh=self.mesh, in_specs=in_specs,
            out_specs=out_specs))
        return self._sharded_fn

    def __iter__(self) -> Iterator[Tuple[jax.Array, List[int]]]:
        self.start()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def stager():
            try:
                while not self._stop.is_set():
                    staged = self._stage_one()
                    out_q.put(staged)
                    if staged is None:
                        return
                # stopped (public stop() or iterator teardown): the
                # consumer may be parked in out_q.get() — terminate it
                out_q.put(None)
            except Exception as e:  # surfaced below
                out_q.put(e)

        t = threading.Thread(target=stager, daemon=True,
                             name="vali-stager")
        t.start()
        # Local binding: the finally block can run at generator
        # finalization during interpreter shutdown, when module globals
        # (queue) may already be cleared — a global lookup there raises
        # "catching classes that do not inherit from BaseException".
        _empty = queue.Empty
        try:
            while True:
                staged = out_q.get()
                if staged is None:
                    for w in self._workers:
                        if w.error is not None:
                            raise w.error
                    return
                if isinstance(staged, Exception):
                    raise staged
                yield staged
        finally:
            self._stop.set()
            # unblock a stager waiting on out_q.put
            try:
                while True:
                    out_q.get_nowait()
            except _empty:
                pass
            t.join(timeout=10.0)
            # full teardown: unblock + join decode workers and recycle
            # their queued buffers (without this, abandoning the iterator
            # leaks N parked threads plus the decode buffer pool)
            self.stop()

    def _split(self, batch_host: np.ndarray) -> Tuple[np.ndarray, ...]:
        """[B, host_frame_bytes] -> batched storage-layout planes.

        Pure views over the staged batch: single-plane formats (NV12, P10,
        packed RGB...) cost zero copies; multi-plane formats produce
        strided views that device_put consumes directly."""
        from ..core.formats import format_info

        info = format_info(self.src_fmt)
        b = batch_host.shape[0]
        flat = batch_host.view(info.dtype).reshape(b, -1)
        dims = (self._stage_plane_dims
                if self._stage_plane_dims is not None
                else info.plane_dims(self.src_w, self.src_h))
        planes = []
        off = 0
        for (h, w) in dims:
            planes.append(flat[:, off:off + h * w].reshape(b, h, w))
            off += h * w
        return tuple(planes)

    def _staging_acquire(self, n: int, total: int) -> np.ndarray:
        """Reuse a staging batch whose downstream preprocess finished.

        Frames are copied into padded plane slots; the pad rows must stay
        zero, so buffers are zero-filled once at allocation and the copy
        path only ever writes the real rows. A buffer is eligible for
        reuse when the jax computation that read it reports is_ready()
        (on the CPU backend device_put can alias host memory, so reuse
        before completion would corrupt the batch in flight)."""
        still = []
        for buf, fut in self._staging_inflight:
            if fut is None or fut.is_ready():
                self._staging_free.append(buf)
            else:
                still.append((buf, fut))
        self._staging_inflight = still
        for i, buf in enumerate(self._staging_free):
            if buf.shape == (n, total):
                self._staging_free.pop(i)
                return buf
        # no exact-shape buffer: evict mismatched ones beyond the prefetch
        # depth. Batch shape shrinks as streams hit EOS; without eviction
        # every shrink strands the old multi-MB buffers in the free list
        # for the pipeline's lifetime (64 streams ending one by one would
        # retain gigabytes).
        cap = self.prefetch + 2
        if len(self._staging_free) > cap:
            self._staging_free = self._staging_free[-cap:]
        return np.zeros((n, total), dtype=np.uint8)

    def _stage_padded(self, frames) -> np.ndarray:
        """Copy decoded frames into a batch whose planes carry the Pallas
        pre-pad rows (layout: padded planes back to back)."""
        from ..core.formats import format_info

        info = format_info(self.src_fmt)
        isz = info.dtype.itemsize
        orig = info.plane_dims(self.src_w, self.src_h)
        padded = self._stage_plane_dims
        total = sum(h * w for h, w in padded) * isz
        batch = self._staging_acquire(len(frames), total)
        for i, f in enumerate(frames):
            fu8 = f.view(np.uint8)
            src_off = 0
            dst_off = 0
            for (oh, w), (ph, _) in zip(orig, padded):
                nbytes = oh * w * isz
                batch[i, dst_off:dst_off + nbytes] = \
                    fu8[src_off:src_off + nbytes]
                src_off += nbytes
                dst_off += ph * w * isz
        return batch


def preprocess_batch(planes, src_fmt: PixelFormat, src_w: int, src_h: int,
                     dst_w: int, dst_h: int,
                     space: ColorSpace = ColorSpace.BT_709,
                     crange: ColorRange = ColorRange.MPEG,
                     out_dtype=jnp.uint8, planar: bool = False,
                     method: str = LANCZOS_AA,
                     normalize=None,
                     use_pallas: Optional[bool] = None,
                     letterbox: bool = False,
                     pad_value: int = 114) -> jax.Array:
    """One-shot jitted fused preprocess over already-batched planes.

    On TPU the NV12 path routes to the banded Pallas kernel
    (ops/pallas_fused.py, ~5x the XLA version); everything else uses the
    XLA fused op. Pass ``use_pallas=False`` to force the XLA path.
    ``letterbox=True`` resizes aspect-preserving onto a centered
    ``pad_value`` canvas (ops/fused.letterbox_preprocess semantics) —
    the content resample still takes the Pallas route when available.
    """
    src_fmt = PixelFormat(src_fmt)
    if use_pallas is None:
        use_pallas = _pallas_usable(src_fmt, space, crange)
    if normalize is not None:
        normalize = (tuple(float(v) for v in normalize[0]),
                     tuple(float(v) for v in normalize[1]))
    if letterbox:
        from ..ops.fused import letterbox_params

        inner_w, inner_h, left, top, _ = letterbox_params(
            src_w, src_h, dst_w, dst_h)
        inner = preprocess_batch(
            planes, src_fmt, src_w, src_h, inner_w, inner_h, space=space,
            crange=crange, out_dtype=out_dtype, planar=False,
            method=method, normalize=normalize, use_pallas=use_pallas)
        return _letterbox_pad_jit(
            inner, dst_w=dst_w, dst_h=dst_h, left=left, top=top,
            pad_value=int(pad_value), normalize=normalize, planar=planar)
    if use_pallas:
        from ..ops.pallas_fused import (pallas_preprocess,
                                        pallas_preprocess_formats)

        if src_fmt in pallas_preprocess_formats():
            out = pallas_preprocess(
                planes, src_fmt, src_w=src_w, src_h=src_h, dst_w=dst_w,
                dst_h=dst_h, space=space, crange=crange,
                out_dtype=out_dtype, method=method, normalize=normalize)
            return out if planar else jnp.moveaxis(out, 1, -1)
    return _preprocess_jit(
        tuple(planes), src_fmt=src_fmt, src_w=src_w,
        src_h=src_h, dst_w=dst_w, dst_h=dst_h, space=space, crange=crange,
        out_dtype=out_dtype, planar=planar, method=method,
        normalize=normalize)

"""RestorationEngine — owns the mesh, params, and compiled device programs.

One fused XLA program per (family, height, width, batch-bucket):
uint8 -> normalize -> bf16 backbone -> clip -> uint8, so the only host<->device
traffic is compact byte tensors and everything in between stays on-chip
(HBM-bandwidth rule: fuse elementwise work into the backbone program).

Batch sizes are bucketed to powers of two and spatial sizes to the configured
buckets, so concurrent mixed traffic reuses a small, warm executable cache
(SURVEY.md "hard parts": continuous micro-batching vs XLA static shapes).
"""

from __future__ import annotations

import threading
import time
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ServingConfig
from ..models import get_family, ParamCache
from ..obs.tracing import device_trace, get_tracer
from ..parallel.mesh import AXIS_DATA
from ..parallel.sharding import activation_sharding, batch_sharding, shard_params
from ..utils.logging import get_logger
from .exec_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def _batch_bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n and b < max_batch:
        b *= 2
    return b


class RestorationEngine:
    def __init__(
        self,
        mesh=None,
        compute_dtype=jnp.bfloat16,
        serving_config: ServingConfig | None = None,
        param_cache: ParamCache | None = None,
        seed: int = 0,
    ):
        self.mesh = mesh  # None => single-device path
        self.dtype = compute_dtype
        self.config = serving_config or ServingConfig()
        self.params_cache = param_cache or ParamCache(seed)
        self.logger = get_logger("engine")
        self._tracer = get_tracer("engine")
        self._compiled: dict = {}
        self._compiling: dict = {}  # key_sig -> Event (single-flight compiles)
        self._sharded_params: dict[str, dict] = {}
        self._lock = threading.Lock()
        self.device_seconds_total = 0.0
        # device-time accounting state (guarded by _acct_lock): with
        # pipeline_depth>1 batch N+1 dispatches while batch N executes, so
        # wall-from-dispatch double-counts the overlapped window (ADVICE r3).
        # _device_busy_until is the perf_counter stamp when the device last
        # finished work; accounted time for a span is clipped to start no
        # earlier than that.
        self._acct_lock = threading.Lock()
        self._device_busy_until = 0.0
        self.compile_count = 0  # actual XLA compiles (cache misses), for tests/ops
        self._rng_key = jax.random.PRNGKey(seed)

    def _account_device_time(self, t0: float) -> float:
        """Record a device-busy span [t0, now] into device_seconds_total,
        overlap-corrected: the accounted start is clipped to the end of the
        previously accounted span, so two pipelined batches whose windows
        overlap never double-count device time (the basis for per-request
        estimatedCostUsd and bench MFU). Thread-safe (collector thread and
        sync callers share the accumulator). Returns the accounted seconds.
        """
        t_end = time.perf_counter()
        with self._acct_lock:
            start = max(t0, self._device_busy_until)
            device_s = max(t_end - start, 0.0)
            self._device_busy_until = t_end
            self.device_seconds_total += device_s
        return device_s

    def _mesh_key(self) -> tuple:
        """Mesh topology component of executable-cache keys."""
        if self.mesh is None:
            return ()
        return tuple(sorted(self.mesh.shape.items()))

    def _is_multi_device(self) -> bool:
        return self.mesh is not None and int(np.prod(list(self.mesh.shape.values()))) > 1

    # ------------------------------------------------------------- params

    def _uses_folded(self, family_name: str) -> bool:
        """Families served in the W-folded layout (models/folded.py): exact
        reparameterization, MXU-filling channel counts at every level. SRNet
        (pure conv chain, no fold boundaries) folds under fold_w_sr; the UNet
        families under the opt-in fold_w (see config.py for measurements)."""
        if family_name.startswith("sr-"):
            return self.config.fold_w_sr
        return self.config.fold_w and family_name in (
            "restore-unet",
            "restore-unet-small",
            "diffusion-restore",
        )

    def _uses_s2d_io(self, family_name: str) -> bool:
        """Space-to-depth IO (config.py s2d_io): only meaningful for the
        unfolded space-to-depth-stem UNet families with a pure-RGB residual
        (in == out channels). The folded path has its own layout pipeline."""
        if self._uses_folded(family_name) or not self.config.s2d_io:
            return False
        cfg = get_family(family_name).config
        return (
            getattr(cfg, "input_scale", 1) > 1
            and getattr(cfg, "in_channels", 0) == getattr(cfg, "out_channels", -1)
            and not getattr(cfg, "time_conditioned", False)
        )

    def _sr_apply(self, family_name: str):
        """The SR forward matching what _params returns for this family."""
        if self._uses_folded(family_name):
            from ..models import folded

            return folded.apply_srnet
        return get_family(family_name).apply

    def _params(self, family_name: str) -> dict:
        with self._lock:
            if family_name not in self._sharded_params:
                params = self.params_cache.get(family_name)
                if self._uses_folded(family_name):
                    from ..models import folded
                    from ..models.registry import get_family as _gf

                    cfg = _gf(family_name).config
                    if family_name.startswith("sr-"):
                        params = folded.fold_params_srnet(params)
                    else:
                        params = folded.fold_params(params, getattr(cfg, "unet", cfg))
                if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1:
                    params = shard_params(params, self.mesh)
                else:
                    params = jax.device_put(params)
                self._sharded_params[family_name] = params
            return self._sharded_params[family_name]

    # ----------------------------------------------------------- programs
    #
    # Program construction lives in serve/programs/ (VERDICT r4 item 9);
    # the engine passes the structural facts that also key its caches.

    def _build_program(self, family_name: str, egress: str = "rgb"):
        from .programs import build_restore_program

        return build_restore_program(
            family_name,
            dtype=self.dtype,
            use_folded=self._uses_folded(family_name),
            use_s2d_io=self._uses_s2d_io(family_name),
            use_deblur=self.config.deblur,
            use_deblock=self.config.deblock,
            egress=egress,
        )

    def _compiled_fn(self, family_name: str, egress: str = "rgb"):
        key = family_name if egress == "rgb" else ("prog", family_name, egress)
        with self._lock:
            if key not in self._compiled:
                self._compiled[key] = self._build_program(family_name, egress)
            return self._compiled[key]

    # -------------------------------------------- executable disk cache
    #
    # Disk tier in serve/exec_cache.py; the engine keeps the in-memory dict
    # (self._compiled) and the single-flight gate.

    def _exec_key(self, tag, example_args: tuple):
        """Cache signature for one compiled program: the builder tag, every
        config flag that changes the program's STRUCTURE, and the arg
        shapes/dtypes.

        The fold flag changes the param tree shapes for the same tag+args,
        so it must key both the in-memory and the disk cache — and so do
        the gated serving stages (deblur/deblock), which add or remove
        whole program segments. Omitting them let an engine configured with
        deblur=False load a cached executable WITH the stage (found when a
        stage-ablation A/B measured three byte-identical programs).

        MODEL config (registry family dataclasses) is intentionally NOT in
        this key: it is static in source, and the disk digest already
        covers it through exec_cache's source-tree fingerprint. The
        corollary for A/B harnesses: a runtime ``dataclasses.replace`` on a
        family config does NOT change the digest — isolate
        ``IRP_EXEC_CACHE_DIR`` per variant or both variants silently run
        one executable (caught 2026-08-20 when a limiter on/off A/B
        measured 507.399 vs 507.409 ms)."""
        family_name = tag if isinstance(tag, str) else tag[1]
        if isinstance(tag, tuple) and tag[0] == "hdr_deblur":
            # not a model family: the pre-pass program has no fold/s2d/stage
            # structure — shape alone keys it
            structural = ()
        else:
            structural = (
                ("fold_w", self._uses_folded(family_name)),
                ("stages", self.config.deblur, self.config.deblock),
                ("s2d_io", self._uses_s2d_io(family_name)),
            )
        return (tag,) + structural + tuple(
            (tuple(a.shape), str(a.dtype)) for a in example_args if hasattr(a, "shape")
        )

    def _aot_executable(self, tag, example_args: tuple, fn=None, params=None):
        """Compile (or load) the program ``tag`` for this exact arg signature.

        ``tag`` identifies the program builder (a family name for the fused
        restore path, or a tuple like ("sr_tiled", family, ...)); ``fn`` and
        ``params`` default to the family program + family params.
        """
        family_name = tag if isinstance(tag, str) else tag[1]
        key_sig = self._exec_key(tag, example_args)
        # single-flight: exactly one thread compiles a given signature; the
        # rest block on its completion and read the cache. Without this, a
        # job retry whose first attempt timed out mid-compile launches a
        # DUPLICATE compile of the same program; on the remote-compile TPU
        # stack the duplicates contend and a cold-start job can burn its
        # whole retry budget behind serially-piled compiles of one executable
        # (observed live: 5 concurrent compiles, 0 finished in 13 min,
        # job -> DLQ).
        while True:
            with self._lock:
                cached = self._compiled.get(key_sig)
                if cached is not None:
                    return cached
                flight = self._compiling.get(key_sig)
                if flight is None:
                    flight = threading.Event()
                    self._compiling[key_sig] = flight
                    break  # we own the compile
            flight.wait()
            # loop: either the owner cached the executable, or it failed and
            # the next iteration takes ownership

        try:
            return self._compile_locked_out(key_sig, family_name, example_args, fn, params)
        finally:
            with self._lock:
                self._compiling.pop(key_sig, None)
            flight.set()

    def _compile_locked_out(self, key_sig, family_name, example_args, fn, params):
        """Body of _aot_executable once the calling thread owns the
        single-flight slot for ``key_sig``."""
        from . import exec_cache

        tag = key_sig[0]
        egress = "yuv420" if (isinstance(tag, tuple) and "yuv420" in tag) else "rgb"
        fn = fn if fn is not None else self._compiled_fn(family_name, egress)
        params = params if params is not None else self._params(family_name)

        # Disk caching is TPU-only: XLA:CPU AOT results are machine-feature
        # sensitive and reload unreliably (cpu_aot_loader feature mismatch).
        executable = None
        path = None
        if jax.default_backend() not in ("cpu",):
            path = exec_cache.cache_path(key_sig, self.dtype)
            executable = exec_cache.load(path, self.logger, family_name)
        if executable is None:
            if path is None:
                executable = fn.lower(params, *example_args).compile()
            else:
                executable = exec_cache.compile_and_store(
                    fn, params, example_args, path, self.logger, family_name
                )
            with self._lock:
                self.compile_count += 1

        with self._lock:
            self._compiled[key_sig] = executable
        return executable

    # ------------------------------------------------------------ serving

    def _place(self, imgs: np.ndarray, cond: np.ndarray | None):
        if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1:
            imgs_d = jax.device_put(imgs, activation_sharding(self.mesh, spatial=False))
            cond_d = (
                jax.device_put(cond, batch_sharding(self.mesh)) if cond is not None else None
            )
        else:
            imgs_d = jax.device_put(imgs)
            cond_d = jax.device_put(cond) if cond is not None else None
        return imgs_d, cond_d

    def restore_batch(
        self,
        canvas_u8: np.ndarray,
        valid_hw: np.ndarray | None = None,
        is_jpeg: np.ndarray | None = None,
        family_name: str = "restore-unet",
        egress: str = "rgb",
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Fused classify+condition+restore step (synchronous).

        canvas_u8 [N,B,B,3] letterboxed byte canvases, valid_hw [N,2] the
        un-padded (h, w) per image, is_jpeg [N] container flags. Returns
        (restored [N,B,B,3] u8, degradation scores [N,7], step metadata);
        with egress="yuv420" the first element is instead the plane tuple
        (Y [N,B,B], Cb [N,B/2,B/2], Cr [N,B/2,B/2]) u8 (see _build_program).
        """
        return self.restore_batch_async(
            canvas_u8, valid_hw, is_jpeg, family_name, egress
        )()

    def restore_batch_async(
        self,
        canvas_u8: np.ndarray,
        valid_hw: np.ndarray | None = None,
        is_jpeg: np.ndarray | None = None,
        family_name: str = "restore-unet",
        egress: str = "rgb",
    ):
        """Stage + dispatch the fused restore program WITHOUT waiting for the
        result; returns a fetch() closure that synchronizes and returns
        (restored [N,B,B,3] u8, scores [N,7], meta) — or, with
        egress="yuv420", ((Y, Cb, Cr) u8 plane batch, scores, meta).

        This is the host/device-overlap primitive (SURVEY.md section 7 "hard
        parts"): the micro-batcher dispatches batch N+1's H2D transfer and
        launch while batch N is still executing, then fetches N — transfer
        and compute pipeline instead of adding.

        The batch is padded to the next power-of-two bucket (repeating the
        last row) so every size hits a cached executable; padding work is
        discarded before returning.
        """
        n = canvas_u8.shape[0]
        if valid_hw is None:
            valid_hw = np.tile(
                np.asarray([canvas_u8.shape[1], canvas_u8.shape[2]], np.int32), (n, 1)
            )
        if is_jpeg is None:
            is_jpeg = np.zeros((n,), dtype=np.float32)
        valid_hw = np.asarray(valid_hw, dtype=np.int32)
        is_jpeg_f = np.asarray(is_jpeg, dtype=np.float32)

        data_parallel = 1
        if self.mesh is not None:
            data_parallel = self.mesh.shape[AXIS_DATA]
        bucket = max(_batch_bucket(n, self.config.max_batch), data_parallel)
        if bucket > n:
            pad = bucket - n
            canvas_u8 = np.concatenate([canvas_u8, np.repeat(canvas_u8[-1:], pad, axis=0)], axis=0)
            valid_hw = np.concatenate([valid_hw, np.repeat(valid_hw[-1:], pad, axis=0)], axis=0)
            is_jpeg_f = np.concatenate([is_jpeg_f, np.repeat(is_jpeg_f[-1:], pad, axis=0)], axis=0)

        params = self._params(family_name)
        imgs_d, _ = self._place(canvas_u8, None)
        multi_device = self._is_multi_device()

        t0 = time.perf_counter()
        trace_label = f"restore/{family_name}/{canvas_u8.shape[1]}x{canvas_u8.shape[2]}b{bucket}"
        if family_name == "diffusion-restore":
            egress = "rgb"  # the diffusion program has no plane egress
            with self._lock:
                self._rng_key, step_key = jax.random.split(self._rng_key)
            args = (imgs_d, valid_hw, is_jpeg_f, step_key)
        else:
            args = (imgs_d, valid_hw, is_jpeg_f)
        # single- and multi-device both go through the executable cache;
        # the lowering captures GSPMD shardings from the placed operands,
        # so a mesh deployment reuses serialized executables instead of
        # paying per-process compile storms (VERDICT round 1 weak #4)
        tag = family_name if not multi_device else ("mesh", family_name, self._mesh_key())
        if egress == "yuv420":
            tag = ("egress", family_name, "yuv420") if not multi_device else tag + ("yuv420",)
        executable = self._aot_executable(tag, args)
        out, scores = executable(params, *args)  # async dispatch

        def fetch() -> tuple[np.ndarray, np.ndarray, dict]:
            with device_trace(trace_label):
                # ONE synchronizing fetch for both outputs: the transport is
                # latency-bound (~10-30 ms per host<->device round trip
                # regardless of size), so block_until_ready + two np.asarray
                # calls cost three round trips where one device_get costs one
                # — measured 136 ms -> 72 ms per single-image request on the
                # v5e tunnel.
                t_fetch = time.perf_counter()
                out_h, scores_h = jax.device_get((out, scores))
            wall_s = time.perf_counter() - t0
            device_s = self._account_device_time(t0)
            meta = {
                "engineRequestId": uuid.uuid4().hex,
                # includes the device->host fetch (the fetch is the only sync
                # point, so compute and transfer are not separable here); the
                # fetch-only span is reported alongside so MFU-style
                # derivations can subtract transport (ADVICE r2).
                # deviceSeconds is overlap-corrected for pipelined batches;
                # wallSeconds is raw dispatch->fetch (incl. queue wait).
                "deviceSeconds": device_s,
                "wallSeconds": wall_s,
                "fetchSeconds": time.perf_counter() - t_fetch,
                "batchBucket": bucket,
                "batchOccupancy": n / bucket,
                "family": family_name,
            }
            if isinstance(out_h, tuple):  # yuv420 plane egress
                planes = tuple(np.asarray(p)[:n] for p in out_h)
                return planes, np.asarray(scores_h)[:n], meta
            return np.asarray(out_h)[:n], np.asarray(scores_h)[:n], meta

        return fetch

    def _run_sync(self, label, executable, params, args, family_name, **extra):
        """Dispatch a cached executable, fetch in ONE synchronizing
        device_get (the transport is latency-bound: one round trip, not one
        per output), and assemble the standard meta with overlap-corrected
        deviceSeconds. Shared by the synchronous fuse/sr surfaces."""
        t0 = time.perf_counter()
        with device_trace(label):
            out_d = executable(params, *args)
            t_fetch = time.perf_counter()
            out = jax.device_get(out_d)
        device_s = self._account_device_time(t0)
        meta = {
            "engineRequestId": uuid.uuid4().hex,
            "deviceSeconds": device_s,
            "fetchSeconds": time.perf_counter() - t_fetch,
            "family": family_name,
            **extra,
        }
        return out, meta

    def fuse_batch(
        self,
        canvas_u8: np.ndarray,
        valid_hw: np.ndarray,
        is_jpeg: np.ndarray,
        family_name: str = "restore-unet",
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Multi-image fusion: restore K aligned exposures and composite them
        in ONE device launch (BASELINE.json config 4).

        canvas_u8 [K,B,B,3] (K <= 3). Each image is classified and restored
        (shared fused program), then blended with per-image weights derived
        from its degradation scores: cleaner inputs (low blur/noise/lowLight)
        dominate the composite. Returns (fused [B,B,3], scores [K,7], meta).
        """
        k = canvas_u8.shape[0]
        from .programs import build_fusion_program

        fn = build_fusion_program(
            family_name, dtype=self.dtype, use_folded=self._uses_folded(family_name)
        )
        params = self._params(family_name)
        imgs_d, _ = self._place(canvas_u8, None)
        args = (imgs_d, np.asarray(valid_hw, np.int32), np.asarray(is_jpeg, np.float32))
        executable = self._aot_executable(
            ("fusion", family_name), args, fn=fn, params=params
        )
        (fused_h, scores_h), meta = self._run_sync(
            f"fuse/{family_name}/k{k}/{canvas_u8.shape[1]}",
            executable, params, args, family_name, fusionInputs=k,
        )
        return np.asarray(fused_h), np.asarray(scores_h), meta

    def hdr_deblur_batch(
        self, x_f32: np.ndarray, valid_hw: np.ndarray, compression: np.ndarray
    ) -> tuple[np.ndarray, dict]:
        """Float Wiener deblur with the disk channel enabled — the 16-bit
        PNG ingest pre-pass (ops/deblur.py deblur_canvas_f32). x_f32
        [N,B,B,3] in [0,1]; runs before any 8-bit quantization, which is
        what makes defocus (disk PSF) identification physically possible."""
        from ..ops.deblur import deblur_canvas_f32

        fn = jax.jit(lambda params, x, v, c: deblur_canvas_f32(x, v, c))
        args = (
            jax.device_put(np.asarray(x_f32, np.float32)),
            np.asarray(valid_hw, np.int32),
            np.asarray(compression, np.float32),
        )
        executable = self._aot_executable(
            ("hdr_deblur", x_f32.shape[1]), args, fn=fn, params={}
        )
        out, meta = self._run_sync(
            f"hdr_deblur/{x_f32.shape[1]}", executable, {}, args, "hdr_deblur"
        )
        return np.asarray(out), meta

    def sr_batch(self, imgs_u8: np.ndarray, family_name: str = "sr-x2") -> tuple[np.ndarray, dict]:
        """Super-resolution batch (no conditioning)."""
        n = imgs_u8.shape[0]
        params = self._params(family_name)
        imgs_d, _ = self._place(imgs_u8, None)
        executable = self._aot_executable(("sr", family_name), (imgs_d,))
        out, meta = self._run_sync(
            f"sr/{family_name}/{imgs_u8.shape[1]}x{imgs_u8.shape[2]}",
            executable, params, (imgs_d,), family_name,
        )
        return np.asarray(out)[:n], meta

    def sr_tiled(
        self,
        canvas_u8: np.ndarray,
        family_name: str = "sr-x2",
        tile: int = 256,
        overlap: int = 32,
        tile_batch: int = 8,
        output: str = "rgb",
    ) -> tuple[np.ndarray, dict]:
        """Tiled super-resolution with seam-free overlap-blend, one compiled
        program per canvas size (BASELINE.json config 3: 2K -> 4K).

        The whole tile -> SR -> Hann-blend pipeline (ops/tile.py) is traced
        into a single jit program: tile extraction, batched SRNet calls over
        tile chunks, and the windowed fold all fuse device-side — no
        host round-trips between tiles.

        On a multi-device mesh the tile axis is sharded over ``data``
        (SURVEY.md section 5 long-context analog): every device restores its
        slice of the tile batch in parallel, then the windowed fold runs on
        the gathered results. Output matches single-device exactly — tiling,
        SR, and blend are all per-tile/per-pixel deterministic.
        """
        from .programs import build_sr_tiled_mesh_program, build_sr_tiled_program

        size = canvas_u8.shape[0]
        sr_apply = self._sr_apply(family_name)

        if self._is_multi_device():
            fn = build_sr_tiled_mesh_program(
                family_name, dtype=self.dtype, sr_apply=sr_apply, mesh=self.mesh,
                tile=tile, overlap=overlap, tile_batch=tile_batch, output=output,
            )
            tag = (
                "sr_tiled_mesh", family_name, tile, overlap, tile_batch, output,
                self._mesh_key(),
            )
        else:
            fn = build_sr_tiled_program(
                family_name, dtype=self.dtype, sr_apply=sr_apply,
                tile=tile, overlap=overlap, tile_batch=tile_batch, output=output,
            )
            tag = ("sr_tiled", family_name, tile, overlap, tile_batch, output)

        params = self._params(family_name)
        canvas_d = jax.device_put(canvas_u8)
        executable = self._aot_executable(tag, (canvas_d,), fn=fn, params=params)
        out, meta = self._run_sync(
            f"sr_tiled/{family_name}/{size}t{tile}",
            executable, params, (canvas_d,), family_name, tile=tile, overlap=overlap,
        )
        if output == "yuv420":
            out = tuple(np.asarray(p) for p in out)
        else:
            out = np.asarray(out)
        return out, meta

    def sr_spatial(
        self, canvas_u8: np.ndarray, family_name: str = "sr-x2"
    ) -> tuple[np.ndarray, dict]:
        """Super-resolve ONE huge image row-sharded over the mesh's spatial
        axis with per-layer ppermute halo exchange (parallel/halo.py) — the
        counterpart of data-axis tile sharding for images too large to
        tile-batch. Every conv exchanges one boundary row with zero fill at
        the true image edges, reproducing XLA 'SAME' padding — the result
        matches the single-device program to within bf16 accumulation-order
        jitter (<=1 at the byte level, seam-free at shard boundaries).
        """
        from ..parallel.mesh import AXIS_SPATIAL
        from .programs import build_sr_spatial_program

        if self.mesh is None or self.mesh.shape[AXIS_SPATIAL] <= 1:
            raise ValueError("sr_spatial requires a mesh with a spatial axis > 1")

        fn, halo, scale, sp = build_sr_spatial_program(
            family_name, dtype=self.dtype, mesh=self.mesh
        )
        h_in = canvas_u8.shape[0]
        # arbitrary heights: edge-replicate rows to the next multiple of the
        # spatial axis and crop the output. Replicated rows match the image
        # content far better than zeros near the bottom edge (ADVICE r3 #4:
        # zero rows made the emitted bottom rows depend on mesh shape via a
        # black border bleeding through the receptive field). The result is
        # defined as (and tested bit-identical to) the single-device program
        # on the same edge-padded canvas, cropped — VERDICT r2 next #10.
        pad_rows = (-h_in) % sp
        if pad_rows:
            canvas_u8 = np.concatenate(
                [canvas_u8, np.repeat(canvas_u8[-1:], pad_rows, axis=0)], axis=0
            )
        h = canvas_u8.shape[0]

        from jax.sharding import NamedSharding, PartitionSpec as P

        # the row-sharded forward keeps the standard (unfolded) layout — its
        # per-layer halo exchange is defined on unfolded weights — so fetch
        # raw params regardless of the family's fold setting
        with self._lock:
            raw_key = ("raw", family_name)
            if raw_key not in self._sharded_params:
                raw = self.params_cache.get(family_name)
                self._sharded_params[raw_key] = (
                    shard_params(raw, self.mesh)
                    if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1
                    else jax.device_put(raw)
                )
            params = self._sharded_params[raw_key]
        canvas_d = jax.device_put(
            canvas_u8, NamedSharding(self.mesh, P(AXIS_SPATIAL, None, None))
        )
        executable = self._aot_executable(
            ("sr_spatial", family_name, canvas_u8.shape, self._mesh_key()),
            (canvas_d,),
            fn=fn,
            params=params,
        )
        out, meta = self._run_sync(
            f"sr_spatial/{family_name}/{h}",
            executable, params, (canvas_d,), family_name,
            spatialShards=sp, halo=halo, paddedRows=pad_rows,
        )
        out = np.asarray(out)
        if pad_rows:
            out = out[: h_in * scale]
        return out, meta

    SR_TILE_THRESHOLD = 512  # mirror of RestoratorService.SR_TILE_THRESHOLD
    SR_TILED_CANVAS = 2048   # the documented 2K->4K bucket

    def warmup(self, family_name="restore-unet", sizes=None, batches=None) -> float:
        """AOT-style compile warmup for the restore buckets (serve/warmup.py)."""
        from .warmup import warmup_restore

        return warmup_restore(self, family_name, sizes, batches)

    def warmup_serving(self, families=("restore-unet",), sizes=None, batches=None,
                       fusion_k=(3,), sr_tiled_canvas=None) -> dict:
        """Warm EVERY documented serving surface so no endpoint pays an
        in-request compile after boot (serve/warmup.py)."""
        from .warmup import warmup_serving

        return warmup_serving(self, families, sizes, batches, fusion_k, sr_tiled_canvas)

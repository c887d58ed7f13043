"""Executable-cache behavior: single-flight compilation.

A cold-start job retry must not launch a duplicate compile of the program its
first attempt is still compiling — on the remote-compile TPU stack duplicate
compiles contend and a job can exhaust its whole retry budget behind
serially-piled compiles of one executable (observed live in round 3)."""

import threading

import numpy as np

from image_restoration_platform_tpu.config import ServingConfig
from image_restoration_platform_tpu.serve.engine import RestorationEngine


def test_concurrent_requests_compile_once(tmp_path, monkeypatch):
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    engine = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2)
    )
    imgs = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)

    results, errors = [], []

    def worker():
        try:
            out, scores, _ = engine.restore_batch(imgs, family_name="restore-unet-small")
            results.append(out)
        except Exception as error:  # pragma: no cover
            errors.append(error)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert len(results) == 6
    # one compile for six concurrent identical requests
    assert engine.compile_count == 1
    for out in results[1:]:
        np.testing.assert_array_equal(out, results[0])


def test_warmup_serving_covers_every_surface(tmp_path, monkeypatch):
    """VERDICT r2 item 6: after warmup_serving, no documented surface pays an
    in-request compile — restore buckets (all batch buckets), SR direct+tiled,
    fusion k=3, and the diffusion family."""
    monkeypatch.setenv("IRP_EXEC_CACHE_DIR", str(tmp_path))
    engine = RestorationEngine(
        serving_config=ServingConfig(size_buckets=(32,), max_batch=2)
    )
    report = engine.warmup_serving(
        families=("restore-unet-small", "diffusion-restore", "sr-x2", "fusion"),
        sr_tiled_canvas=96,
        fusion_k=(3,),
    )
    # every surface appears in the report
    tags = set(report)
    assert {"restore-unet-small/restore/32/b1", "restore-unet-small/restore/32/b2"} <= tags
    assert {"diffusion-restore/restore/32/b1", "diffusion-restore/restore/32/b2"} <= tags
    assert {"sr-x2/direct/32", "sr-x2/tiled-rgb/96", "sr-x2/tiled-yuv420/96"} <= tags
    assert "fusion/k3/32" in tags
    compiles_after_warm = engine.compile_count

    rng = np.random.default_rng(1)
    img32 = rng.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    vhw = np.asarray([[32, 32]], np.int32)
    jf = np.zeros((1,), np.float32)
    engine.restore_batch(img32, vhw, jf, "restore-unet-small")
    engine.restore_batch(img32, vhw, jf, "diffusion-restore")
    engine.restore_batch(np.repeat(img32, 2, axis=0), family_name="restore-unet-small")
    engine.sr_batch(img32, "sr-x2")
    engine.sr_tiled(
        rng.integers(0, 255, (96, 96, 3)).astype(np.uint8), "sr-x2", tile=96
    )
    engine.sr_tiled(
        rng.integers(0, 255, (96, 96, 3)).astype(np.uint8), "sr-x2", tile=96,
        output="yuv420",
    )
    engine.fuse_batch(
        np.repeat(img32, 3, axis=0),
        np.tile(vhw, (3, 1)),
        np.zeros((3,), np.float32),
        "restore-unet",
    )
    assert engine.compile_count == compiles_after_warm, (
        "a warmed surface recompiled in-request"
    )


def test_exec_cache_key_includes_stage_flags():
    """The executable cache signature must change when a gated serving stage
    (deblur/deblock) or the fold flag flips: those flags add/remove whole
    program segments for the SAME tag and arg shapes. Round-5 regression —
    the key omitted the stage flags, so a stage-ablation A/B loaded one
    cached executable for all three variants (byte-identical timings) and,
    worse, an engine configured with deblur=False would serve a cached
    program WITH the stage."""
    import numpy as np

    args = (np.zeros((2, 32, 32, 3), np.uint8),)
    keys = set()
    for deblur in (False, True):
        for deblock in (False, True):
            for fold in (False, True):
                engine = RestorationEngine(
                    serving_config=ServingConfig(
                        size_buckets=(32,), max_batch=2,
                        deblur=deblur, deblock=deblock, fold_w=fold,
                    )
                )
                keys.add(engine._exec_key("restore-unet", args))
    assert len(keys) == 8, f"expected 8 distinct cache keys, got {len(keys)}"

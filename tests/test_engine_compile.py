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

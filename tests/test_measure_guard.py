"""Measurement-validity guard (utils/measure_guard.py, VERDICT r4 item 5).

On the CPU test backend the D2H probe is a no-op (mode=cpu); the stamping
logic itself is exercised with synthetic probe records so the INVALID path
— the one that silently recorded garbage three times in round 4 — is pinned
by tests, not by a human noticing a 2270 ms step time.
"""

from image_restoration_platform_tpu.utils import measure_guard as mg


class TestStamp:
    def test_host_valid_requires_both_probes(self):
        ok = {"mode": "tpu", "ok": True}
        bad = {"mode": "tpu", "ok": False}
        assert mg.stamp({}, ok, ok)["validity"]["status"] == mg.VALID
        assert mg.stamp({}, ok, bad)["validity"]["status"] == mg.INVALID
        assert mg.stamp({}, bad, ok)["validity"]["status"] == mg.INVALID
        assert mg.stamp({}, bad, bad)["validity"]["status"] == mg.INVALID

    def test_device_clock_exempt(self):
        bad = {"mode": "tpu", "ok": False}
        rec = mg.stamp({}, bad, bad, clock="device")
        assert rec["validity"]["status"] == mg.DEVICE_CLOCK

    def test_cpu_mode(self):
        cpu = {"mode": "cpu", "ok": True}
        assert mg.stamp({}, cpu, cpu)["validity"]["status"] == mg.CPU

    def test_stamp_preserves_record_fields(self):
        ok = {"mode": "tpu", "ok": True}
        rec = mg.stamp({"step_ms": 1.5}, ok, ok)
        assert rec["step_ms"] == 1.5
        assert rec["validity"]["pre"] is ok and rec["validity"]["post"] is ok


class TestProbe:
    def test_cpu_probe_is_noop(self):
        rec = mg.d2h_probe()
        assert rec == {"mode": "cpu", "ok": True}

    def test_guarded_context_cpu(self):
        with mg.guarded() as g:
            pass
        rec = g.stamp({"x": 1})
        assert rec["validity"]["status"] == mg.CPU and rec["x"] == 1

    def test_guarded_device_clock_skips_probes(self):
        with mg.guarded(clock="device") as g:
            pass
        rec = g.stamp({})
        assert rec["validity"]["status"] == mg.DEVICE_CLOCK

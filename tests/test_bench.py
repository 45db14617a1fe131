"""Driver-facing bench.py contracts that don't need a chip."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_backend_init_watchdog_emits_error_json():
    """If backend init hangs (dead TPU tunnel), bench must print ONE error
    JSON line and exit 2 instead of hanging the driver forever."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import time\n"
        "import bench\n"
        "t = bench._backend_init_watchdog(0.5)\n"
        "time.sleep(30)   # simulated hung jax.devices()\n" % REPO)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25)
    assert p.returncode == 2, p.stderr[-500:]
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "train_step_samples_per_sec"
    assert out["value"] is None
    assert "backend init exceeded" in out["error"]


def test_deviation_warnings_flag_cross_round_outliers(monkeypatch):
    """A suite row >20 % off the previous round's recorded number must
    surface a warning in the bench JSON (the round-2 37.2 %-MFU outlier
    would have been caught at write time)."""
    sys.path.insert(0, REPO)
    import bench

    prev = [{"B": 4, "L": 256, "dtype": "bf16", "remat": False,
             "samples_per_sec": 300.0},
            {"B": 2, "L": 640, "dtype": "bf16", "remat": True,
             "samples_per_sec": 100.0}]
    monkeypatch.setattr(bench, "_previous_round_suite",
                        lambda: ("BENCH_r03.json", prev))

    ok = [{"B": 4, "L": 256, "dtype": "bf16", "remat": False,
           "samples_per_sec": 310.0}]
    assert bench._deviation_warnings(ok) == []

    outlier = [{"B": 4, "L": 256, "dtype": "bf16", "remat": False,
                "samples_per_sec": 450.0},          # +50 % -> warn
               {"B": 2, "L": 640, "dtype": "bf16", "remat": True,
                "samples_per_sec": 101.0},          # fine
               {"B": 16, "L": 256, "dtype": "bf16", "remat": False,
                "samples_per_sec": 999.0}]          # no prior row -> silent
    warns = bench._deviation_warnings(outlier)
    assert len(warns) == 1 and "B4/L256" in warns[0] and "+50%" in warns[0]


def test_previous_round_suite_reads_driver_format(tmp_path, monkeypatch):
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    assert bench._previous_round_suite() == ("", [])
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"parsed": {"suite": [{"B": 4, "samples_per_sec": 1.0}]}}))
    (tmp_path / "BENCH_r10.json").write_text(json.dumps(
        {"parsed": {"suite": [{"B": 4, "samples_per_sec": 2.0}]}}))
    src, suite = bench._previous_round_suite()
    assert src == "BENCH_r10.json"      # highest round wins
    assert suite[0]["samples_per_sec"] == 2.0


def test_scan_step_time_detail_records_raw_repeats():
    from protein_ensemble_vae_tpu.utils.profiling import scan_step_time

    def make_run(n):
        return lambda: float(n) * 0.0 + 1.0

    best, detail = scan_step_time(make_run, n1=2, n2=6, repeats=3,
                                  return_detail=True)
    assert detail["method"] == "scan-diff"
    assert (detail["n1"], detail["n2"]) == (2, 6)
    assert len(detail["repeats"]) == 3
    for r in detail["repeats"]:
        assert set(r) == {"t_n1_s", "t_n2_s", "per_step_ms"}


def test_backend_init_watchdog_cancel_is_clean():
    """A canceled watchdog must not fire after the timeout elapses."""
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import time\n"
        "import bench\n"
        "t = bench._backend_init_watchdog(0.3)\n"
        "t.cancel()\n"
        "time.sleep(1.0)\n"
        "print('CLEAN')\n" % REPO)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=25)
    assert p.returncode == 0
    assert "CLEAN" in p.stdout
    assert "backend init exceeded" not in p.stdout


def test_make_fori_runner_single_module_any_length():
    """The shared runner (bench.py <-> roofline <-> opt_flatten) must
    serve every chain length from ONE jitted module (runtime fori bound):
    n is a traced argument, so two lengths may not trigger two compiles,
    and the returned loss must reflect exactly n steps."""
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import bench as benchmod

    def raw_step(state, batch, rng, klw_g, klw_l, lr):
        state = state + batch["x"]
        return state, {"loss": state}

    args = (jnp.uint32([0, 1]), jnp.float32(1.0), jnp.float32(0.5),
            jnp.float32(3e-5))
    make_run = benchmod.make_fori_runner(
        raw_step, jnp.float32(0.0), {"x": jnp.float32(2.0)}, args)
    assert float(make_run(3)()) == 6.0
    assert float(make_run(5)()) == 10.0

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

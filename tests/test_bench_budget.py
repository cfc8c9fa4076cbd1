"""Budget discipline of bench.py (VERDICT r3 weak #1 / next #9).

Round 3 lost ALL its performance evidence because bench.py printed its
JSON only after every section finished and the driver's timeout killed
it first (BENCH_r03.json: rc=124, parsed=null). These tests pin the
defenses without touching a TPU: sections that hang are cut by the
SIGALRM budget and recorded as <name>_error; a dead tunnel degrades to
<name>_skipped; an exhausted global deadline skips instead of running;
a SIGTERM (what `timeout` sends) still emits the current JSON line; and
every path leaves stdout ending in one parseable JSON object.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(monkeypatch):
    """Fresh bench module with an isolated RESULT dict and a generous
    deadline (tests manipulate time budgets explicitly). The tunnel
    probe is skipped: its jax.devices() subprocess would contend for
    the real device (or hang on a dead relay) from inside CI."""
    monkeypatch.setenv("ICEPY4D_BENCH_SKIP_TUNNEL_CHECK", "1")
    sys.path.insert(0, str(REPO))
    import importlib

    import bench as mod

    mod = importlib.reload(mod)
    mod.RESULT.clear()
    mod.RESULT.update({"metric": "t", "value": None})
    yield mod
    # never leave a stray itimer behind for the next test
    signal.setitimer(signal.ITIMER_REAL, 0.0)


def test_hung_section_is_cut_and_recorded(bench, capsys):
    def hang():
        time.sleep(60)
        return {"never": 1}

    t0 = time.monotonic()
    bench.section("slow", hang, budget_s=1.0, min_s=0.5)
    assert time.monotonic() - t0 < 10.0
    assert "timeout" in bench.RESULT["slow_error"]
    assert "never" not in bench.RESULT
    # the section re-emitted a parseable JSON line
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["slow_error"] == bench.RESULT["slow_error"]


def test_dead_tunnel_skips_section(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "_tpu_tunnel_alive", lambda: False)
    called = []
    bench.section("gone", lambda: called.append(1) or {}, budget_s=30.0)
    assert bench.RESULT["gone_skipped"] == "tunnel dead"
    assert not called
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_exhausted_deadline_skips_section(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "_remaining", lambda: 5.0)
    called = []
    bench.section("late", lambda: called.append(1) or {}, budget_s=300.0)
    assert "deadline" in bench.RESULT["late_skipped"]
    assert not called
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_failing_section_records_error_and_continues(bench, capsys):
    def boom():
        raise RuntimeError("tunnel reset mid-RPC")

    bench.section("broken", boom, budget_s=30.0, min_s=0.5)
    assert "tunnel reset" in bench.RESULT["broken_error"]
    bench.section("next", lambda: {"ok": 1}, budget_s=30.0, min_s=0.5)
    assert bench.RESULT["ok"] == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["ok"] == 1


def test_sigterm_emits_current_json():
    """`timeout` (the driver's kill path) sends SIGTERM: the guard must
    flush the best-so-far JSON before dying. Run a subprocess that
    installs the guards, stamps a provisional value, then hangs."""
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "import bench\n"
        "bench._install_exit_guards()\n"
        "bench.RESULT['value'] = 1.23\n"
        "print('READY', flush=True)\n"
        "time.sleep(120)\n" % str(REPO)
    )
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "READY"
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=30)
    last = json.loads(out.strip().splitlines()[-1])
    assert last["value"] == 1.23
    assert "terminated" in last


def test_tunnel_probe_respects_env_overrides(bench, monkeypatch):
    monkeypatch.setenv("ICEPY4D_BENCH_SKIP_TUNNEL_CHECK", "1")
    assert bench._tpu_tunnel_alive()
    monkeypatch.delenv("ICEPY4D_BENCH_SKIP_TUNNEL_CHECK")
    # explicit non-tunnel platform never probes loopback ports
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._tpu_tunnel_alive()

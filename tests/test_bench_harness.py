"""bench.py fault-tolerance tests (VERDICT r3 #1, r4 #1).

Round 3's official benchmark record was lost to ONE transient tunnel
error (`BENCH_r03.json` rc=1, parsed=null); round 4's to the driver's
wall clock (`BENCH_r04.json` rc=124: SIGTERM before the single
end-of-run emit). The harness must absorb transient faults (bounded
retry), re-emit the full record line after EVERY phase, emit on
SIGTERM/SIGINT, and skip phases whose estimated cost exceeds the
remaining wall budget — so the consumer's last parseable line always
carries everything measured so far. The reference bar: criterion never
loses a run to one flaky iteration and always produces its report
(/root/reference/benches/benchmark.rs:38-42).
"""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import textwrap

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class FakeJaxRuntimeError(Exception):
    pass


FakeJaxRuntimeError.__name__ = "JaxRuntimeError"


def test_transient_fault_is_retried(bench, monkeypatch):
    """A one-shot JaxRuntimeError inside a phase must be retried and the
    phase's result kept — the exact failure mode that cost round 3 its
    official record."""
    from rrt_tpu.utils import retry as _retry
    monkeypatch.setattr(_retry.time, "sleep", lambda s: None)
    rec = bench.Recorder()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise FakeJaxRuntimeError(
                "INTERNAL: http://127.0.0.1:8113/remote_compile: read "
                "body: response body closed before all bytes were read")
        rec.detail["fwd_mrays_per_s"] = 92.1
        return 42

    assert rec.phase("forward_tile", flaky) == 42
    assert calls["n"] == 2
    assert rec.errors == {}
    assert rec.detail["fwd_mrays_per_s"] == 92.1


def test_terminal_failure_still_emits_parseable_json(bench, monkeypatch,
                                                     capsys):
    """A phase that fails every attempt is recorded in `errors`, other
    phases' fields survive, and emit() prints one parseable JSON line
    with the headline fields present."""
    from rrt_tpu.utils import retry as _retry
    monkeypatch.setattr(_retry.time, "sleep", lambda s: None)
    rec = bench.Recorder()
    rec.detail["fwd_mrays_per_s"] = 92.1
    rec.detail["fwd_s_median"] = 0.35

    def always_fails():
        raise FakeJaxRuntimeError("UNAVAILABLE: TPU device error")

    assert rec.phase("backward_chain", always_fails) is None
    assert "backward_chain" in rec.errors
    capsys.readouterr()  # drop the traceback logging

    rec.emit(88.5, 6.86, "fwd+bwd Mrays/s/chip (chap12 1200x800)")
    out = capsys.readouterr().out.strip()
    parsed = json.loads(out)
    assert parsed["value"] == 88.5
    assert parsed["vs_baseline"] == 6.86
    assert parsed["unit"] == "Mrays/s"
    assert parsed["detail"]["fwd_mrays_per_s"] == 92.1
    assert "UNAVAILABLE" in parsed["errors"]["backward_chain"]


def test_emit_with_no_headline_is_still_parseable(bench, capsys):
    """Even a fully failed run emits JSON (value null), never a bare
    traceback exit — rc=0 with a partial record beats parsed: null."""
    rec = bench.Recorder()
    rec.errors["scene_build"] = "JaxRuntimeError: boom"
    rec.emit(None, None, "fwd+bwd Mrays/s/chip (chap12 1200x800)")
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] is None
    assert parsed["errors"]["scene_build"].startswith("JaxRuntimeError")


def test_non_transient_failure_not_retried(bench, monkeypatch):
    """Programming errors (TypeError etc. with no transient markers) must
    not be retried — retrying can't fix them and burns bench wall."""
    from rrt_tpu.utils import retry as _retry
    monkeypatch.setattr(_retry.time, "sleep", lambda s: None)
    rec = bench.Recorder()
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise TypeError("unsupported operand")

    assert rec.phase("train_tile", broken) is None
    assert calls["n"] == 1
    assert "train_tile" in rec.errors


def test_transient_classifier():
    """The transient classifier covers the observed tunnel failure modes
    without swallowing everything."""
    spec = importlib.util.spec_from_file_location("bench_mod2", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._is_transient(ConnectionResetError("peer reset"))
    assert mod._is_transient(RuntimeError(
        "INTERNAL: remote_compile: read body"))
    assert mod._is_transient(RuntimeError("UNAVAILABLE: TPU device error"))
    assert not mod._is_transient(TypeError("bad arg"))
    assert not mod._is_transient(ValueError("shape mismatch"))
    # Deterministic classes are never retried, even as JaxRuntimeError:
    # OOM / compile / shape errors cannot be fixed by re-running and
    # each futile retry burns minutes of wall on ~60 s phases.
    assert not mod._is_transient(FakeJaxRuntimeError(
        "RESOURCE_EXHAUSTED: Attempting to allocate 12.3G"))
    assert not mod._is_transient(FakeJaxRuntimeError(
        "INTERNAL: Mosaic failed to compile TPU kernel"))
    assert mod._is_transient(FakeJaxRuntimeError(
        "INTERNAL: http response body closed early"))


def test_terminal_failure_logs_real_traceback(bench, monkeypatch,
                                              capsys):
    """The stderr diagnostic must carry the actual traceback, not
    'NoneType: None' (format_exc() must be captured inside the except
    block — the exception state is cleared when it exits)."""
    from rrt_tpu.utils import retry as _retry
    monkeypatch.setattr(_retry.time, "sleep", lambda s: None)
    rec = bench.Recorder()

    def broken():
        raise ValueError("the real diagnostic")

    rec.phase("train_tile", broken)
    err = capsys.readouterr().err
    assert "the real diagnostic" in err
    assert "NoneType: None" not in err


def _last_json_line(out: str):
    """The consumer contract: the last parseable line of output wins."""
    parsed = None
    for line in out.splitlines():
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
    return parsed


def test_record_reemitted_after_every_phase(bench, capsys):
    """A SIGKILL at any point must cost only the unfinished phase, which
    requires the full record line on stdout after EVERY phase."""
    rec = bench.Recorder(wall_budget_s=1e9)

    def p1():
        rec.detail["fwd_mrays_per_s"] = 92.1

    def p2():
        rec.detail["cornell_mrays_per_s"] = 170.8

    rec.phase("forward_tile", p1)
    rec.phase("scene_cornell", p2)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.strip().startswith("{")]
    assert len(lines) == 2
    first, second = json.loads(lines[0]), json.loads(lines[1])
    assert first["detail"]["fwd_mrays_per_s"] == 92.1
    assert "cornell_mrays_per_s" not in first["detail"]
    assert second["detail"]["cornell_mrays_per_s"] == 170.8
    assert second["detail"]["fwd_mrays_per_s"] == 92.1  # fields survive
    assert second["detail"]["phase_walls"].keys() == {
        "forward_tile", "scene_cornell"}


def test_budget_skip_records_and_emits(bench, capsys):
    """A phase whose estimate exceeds the remaining wall budget is
    skipped (recorded in detail.skipped), never started, and the record
    line is re-emitted so the skip itself is visible."""
    rec = bench.Recorder(wall_budget_s=0.0)
    ran = []
    assert rec.phase("north_star_exact", lambda: ran.append(1),
                     est_s=120) is None
    assert ran == []
    assert rec.skipped == ["north_star_exact"]
    parsed = _last_json_line(capsys.readouterr().out)
    assert parsed["detail"]["skipped"] == ["north_star_exact"]
    assert "north_star_exact" not in parsed["detail"]["phase_walls"]
    # est_s=0 phases always run: they are the headline-bearing ones.
    assert rec.phase("forward_tile", lambda: 7) == 7


_BENCH_DIR = os.path.dirname(_BENCH)


def test_sigterm_emits_record_and_exits(tmp_path):
    """The SIGTERM handler (the driver's timeout sends SIGTERM first)
    must emit the record with everything measured so far and exit —
    BENCH_r04 died rc=124 with parsed:null precisely for lack of this."""
    script = textwrap.dedent("""
        import importlib.util, os, signal, sys
        spec = importlib.util.spec_from_file_location("bench_mod", %r)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        rec = bench.Recorder()
        bench.install_signal_handlers(rec)
        rec.detail["fwd_mrays_per_s"] = 92.1
        rec.current = "north_star_exact"
        os.kill(os.getpid(), signal.SIGTERM)
        sys.exit(3)  # unreachable: the handler exits
    """ % os.path.join(_BENCH_DIR, "bench.py"))
    p = tmp_path / "kill_self.py"
    p.write_text(script)
    out = subprocess.run([sys.executable, str(p)], capture_output=True,
                         text=True, timeout=120, cwd=_BENCH_DIR)
    assert out.returncode == 0, out.stderr
    parsed = _last_json_line(out.stdout)
    assert parsed is not None, out.stdout
    assert parsed["detail"]["fwd_mrays_per_s"] == 92.1
    assert "SIGTERM" in parsed["errors"]["signal"]
    assert "north_star_exact" in parsed["errors"]["signal"]


@pytest.mark.slow
def test_bench_under_timeout_prints_parseable_record():
    """The VERDICT r4 done-criterion, literally: `timeout 30 python
    bench.py` must leave a parseable JSON line with partial fields on
    stdout. Forced-CPU so the test never touches the single-process TPU
    tunnel; on CPU the Pallas phases fail fast into `errors`, exercising
    the emit-after-every-phase path end to end."""
    env = dict(os.environ, RRT_BENCH_FORCE_CPU="1", RRT_TN="256",
               RRT_BENCH_WALL_S="20")
    out = subprocess.run(
        ["timeout", "30", sys.executable,
         os.path.join(_BENCH_DIR, "bench.py")],
        capture_output=True, text=True, timeout=180, cwd=_BENCH_DIR,
        env=env)
    # rc 0 (clean finish inside the budget) or 124 (timeout killed it
    # after the SIGTERM emit) are both survivable; what matters is the
    # record.
    assert out.returncode in (0, 124), (out.returncode, out.stderr[-2000:])
    parsed = _last_json_line(out.stdout)
    assert parsed is not None, (out.stdout, out.stderr[-2000:])
    assert "scene_build_s" in parsed["detail"]
    assert "phase_walls" in parsed["detail"]

"""Crash-isolation gate for fused Pallas variants (utils/mosaic_gate).

The gate exists because Mosaic rejections can be hard aborts
(SIGABRT) that no in-process try/except catches; bench.py must keep
its one-JSON-line contract regardless (driver requirement). On real
TPU the gate spawns child processes; on CPU (these tests) the fused
kernels run in interpret mode, so the gate must pass everything
through without spawning anything.
"""

import subprocess
import sys

from radarml_tpu.utils import mosaic_gate


def test_parse_verdicts_extracts_ok_and_fail():
    ok, failed = mosaic_gate._parse_verdicts(
        "ok lookup\nsome noise\nok sel3\n",
        "fail sel ValueError: boom\nE1234 mosaic noise\n",
    )
    assert ok == {"lookup", "sel3"}
    assert failed == {"sel": "ValueError: boom"}
    assert mosaic_gate._parse_verdicts("", "") == (set(), {})
    assert mosaic_gate._parse_ok("ok lookup\n") == {"lookup"}


def test_non_tpu_backend_passes_through_without_children(monkeypatch):
    calls = []

    def no_spawn(*a, **k):  # any spawn on CPU is a bug
        calls.append(a)
        raise AssertionError("gate must not spawn children on CPU")

    monkeypatch.setattr(subprocess, "run", no_spawn)
    tails = mosaic_gate.gate_fused_variants(("lookup", "sel", "sel3"))
    assert tails == ["lookup", "sel", "sel3"]
    assert calls == []


def _fake_tpu(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


class _Proc:
    def __init__(self, stdout, returncode, stderr=""):
        self.stdout, self.returncode = stdout, returncode
        self.stderr = stderr


def test_parent_retries_past_a_crashed_tail(monkeypatch):
    """A child SIGABRT on one tail must not shadow the tails after it:
    the parent respawns for the remainder and skips only the crasher."""
    _fake_tpu(monkeypatch)
    calls = []

    def fake_run(cmd, **k):
        tails = [a for a in cmd if a in ("lookup", "sel", "sel3")]
        calls.append(tails)
        if tails == ["lookup", "sel", "sel3"]:
            return _Proc("ok lookup\n", -6)  # child aborted probing sel
        assert tails == ["sel3"]
        return _Proc("ok sel3\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("lookup", "sel", "sel3"))
    assert out == ["lookup", "sel3"]
    assert calls == [["lookup", "sel", "sel3"], ["sel3"]]


def test_parent_passes_batch_and_arena_to_child(monkeypatch):
    _fake_tpu(monkeypatch)
    seen = {}

    def fake_run(cmd, **k):
        seen["cmd"] = cmd
        return _Proc("ok lookup\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(
        ("lookup",), batch=2048, arena="10,120,2,-20,20,4,-10,10,2"
    )
    assert out == ["lookup"]
    cmd = seen["cmd"]
    assert cmd[cmd.index("--batch") + 1] == "2048"
    assert cmd[cmd.index("--arena") + 1] == "10,120,2,-20,20,4,-10,10,2"


def test_crash_attribution_skips_catchably_failed_tails(monkeypatch):
    """fail-verdict tails are NOT blamed for a later crash: the
    crasher is the first tail with neither verdict, and the respawn
    starts after it."""
    _fake_tpu(monkeypatch)
    calls, notes = [], []

    def fake_run(cmd, **k):
        tails = [a for a in cmd if a in ("lookup", "sel", "sel3")]
        calls.append(tails)
        if tails == ["lookup", "sel", "sel3"]:
            # lookup fails catchably, sel crashes the child
            return _Proc("", -6, stderr="fail lookup ValueError: bad\n")
        assert tails == ["sel3"]
        return _Proc("ok sel3\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(
        ("lookup", "sel", "sel3"), log=notes.append
    )
    assert out == ["sel3"]
    assert calls == [["lookup", "sel", "sel3"], ["sel3"]]
    assert any("sel crashed" in n for n in notes)
    assert not any("lookup crashed" in n for n in notes)
    assert any("lookup failed in-child" in n for n in notes)


def test_parent_drops_in_child_failures_without_respawn(monkeypatch):
    """rc=0 with a fail verdict = catchable in-child failure: drop
    the tail, no second child, reason surfaced via log."""
    _fake_tpu(monkeypatch)
    calls, notes = [], []

    def fake_run(cmd, **k):
        calls.append(1)
        return _Proc(
            "ok lookup\nok sel3\n", 0, stderr="fail sel TypeError: x\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(
        ("lookup", "sel", "sel3"), log=notes.append
    )
    assert out == ["lookup", "sel3"]
    assert calls == [1]
    assert any("sel failed in-child: TypeError: x" in n for n in notes)


def test_parent_keeps_partial_results_on_timeout(monkeypatch):
    """A hang (tunnel outage) keeps what already passed instead of
    spinning forever."""
    _fake_tpu(monkeypatch)

    def fake_run(cmd, **k):
        raise subprocess.TimeoutExpired(cmd, 1, output="ok lookup\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("lookup", "sel", "sel3"))
    assert out == ["lookup"]


def test_parent_crash_after_last_ok_returns_passed(monkeypatch):
    """A crash at interpreter exit (after every tail passed) keeps all."""
    _fake_tpu(monkeypatch)

    def fake_run(cmd, **k):
        return _Proc("ok lookup\nok sel\nok sel3\n", -11)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("lookup", "sel", "sel3"))
    assert out == ["lookup", "sel", "sel3"]


def test_split_and_resolve_tail_specs():
    assert mosaic_gate.split_tail_spec("combo@4") == ("combo", 4)
    assert mosaic_gate.split_tail_spec("lookup") == ("lookup", None)
    assert mosaic_gate.resolve_tail(["lookup", "combo@2"], "combo") == (
        True,
        2,
    )
    assert mosaic_gate.resolve_tail(["combo"], "combo") == (True, None)
    assert mosaic_gate.resolve_tail(["lookup"], "combo") == (False, None)


def test_zc_ladder_walks_down_on_combo_crash(monkeypatch):
    """A crashed bare 'combo' retries at half the auto z_chunk and
    keeps halving; the passing rung is returned as 'combo@<zc>'.
    auto_z_chunk(176, 2048) = 4 on the default rule, so the ladder is
    combo → combo@2 → combo@1 → (out)."""
    _fake_tpu(monkeypatch)
    calls = []

    def fake_run(cmd, **k):
        specs = [a for a in cmd if a.startswith("combo")]
        calls.append(specs)
        if specs == ["combo"]:
            return _Proc("", -6)  # Mosaic abort at the auto chunk
        assert specs == ["combo@2"]
        return _Proc("ok combo@2\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("combo",), batch=2048)
    assert out == ["combo@2"]
    assert calls == [["combo"], ["combo@2"]]
    assert mosaic_gate.resolve_tail(out, "combo") == (True, 2)


def test_zc_ladder_exhausts_to_rejection(monkeypatch):
    """Every rung crashing (down to zc=1) drops the tail for real."""
    _fake_tpu(monkeypatch)
    calls = []

    def fake_run(cmd, **k):
        specs = [a for a in cmd if a.startswith("combo")]
        calls.append(specs)
        return _Proc("", -6)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("combo",), batch=2048)
    assert out == []
    assert calls == [["combo"], ["combo@2"], ["combo@1"]]


def test_zc_ladder_on_catchable_combo_failure(monkeypatch):
    """An in-child (catchable) combo failure also walks the ladder —
    some Mosaic rejections surface as exceptions, not aborts."""
    _fake_tpu(monkeypatch)

    def fake_run(cmd, **k):
        specs = [a for a in cmd if a.startswith("combo")]
        if specs == ["combo"]:
            return _Proc("", 0, stderr="fail combo XlaRuntimeError: vmem\n")
        return _Proc(f"ok {specs[0]}\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("combo",), batch=2048)
    assert out == ["combo@2"]


def test_zc_ladder_keeps_combo1_spec_name(monkeypatch):
    """'combo1' (combo tail + fused_quant='single') walks the same
    z_chunk ladder under its OWN spec name — the single-level stack is
    a different Mosaic program, so its rungs must never alias combo's."""
    _fake_tpu(monkeypatch)
    calls = []

    def fake_run(cmd, **k):
        specs = [a for a in cmd if a.startswith("combo")]
        calls.append(specs)
        if specs == ["combo1"]:
            return _Proc("", -6)
        assert specs == ["combo1@2"]
        return _Proc("ok combo1@2\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("combo1",), batch=2048)
    assert out == ["combo1@2"]
    assert calls == [["combo1"], ["combo1@2"]]
    assert mosaic_gate.resolve_tail(out, "combo1") == (True, 2)
    assert mosaic_gate.resolve_tail(out, "combo") == (False, None)


def test_child_probes_combo1_as_single_quant(capsys):
    """The child maps the 'combo1' spec to the combo tail with
    single-level templates (interpret mode on CPU — the mapping and
    the predictor construction are what's under test). A catchable
    failure would print a 'fail' verdict instead of 'ok'."""
    rc = mosaic_gate._child_main(["--batch", "8", "combo1@2"])
    out = capsys.readouterr()
    assert rc == 0
    assert "ok combo1@2" in out.out
    assert "fail" not in out.err


def test_multi_batch_gate_passes_batch_list_to_child(monkeypatch):
    _fake_tpu(monkeypatch)
    seen = {}

    def fake_run(cmd, **k):
        seen["cmd"] = cmd
        return _Proc("ok lookup\n", 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("lookup",), batch=(128, 2048, 128))
    assert out == ["lookup"]
    cmd = seen["cmd"]
    assert cmd[cmd.index("--batch") + 1] == "128,2048"


def test_child_protocol_reports_each_passing_tail():
    # The child CLI is what real-TPU bench runs execute; drive it on the
    # CPU backend (interpret-mode kernel) with a tiny batch. One tail
    # keeps this fast; interpret-mode correctness of all tails is
    # covered by the fused-mode parity tests.
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "radarml_tpu.utils.mosaic_gate",
            "--batch",
            "8",
            "lookup",
            "not_a_tail",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
        },
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ok, failed = mosaic_gate._parse_verdicts(proc.stdout, proc.stderr)
    assert ok == {"lookup"}
    # the bogus tail fails in-child with a catchable error, not a crash
    assert "not_a_tail" in failed


def test_bench_headline_is_parity_only():
    """bench.py's record integrity policy: the headline "value" may
    only be taken by a bit-parity mode — fused_c1 (fused_quant=
    "single", ~1e-3 proba error) is recorded but never headlined,
    even when it is the fastest measured mode; and a record with no
    parity mode at all must fail loudly, never headline c1."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    rates = {"fast_i8": 1.7e6, "fused_c": 4.1e6, "fused_c1": 5.6e6}
    assert bench.pick_headline(rates) == ("fused_c", 4.1e6)
    # without c1 the policy is a plain argmax
    assert bench.pick_headline(
        {k: v for k, v in rates.items() if k != "fused_c1"}
    ) == ("fused_c", 4.1e6)
    try:
        bench.pick_headline({"fused_c1": 5.6e6})
    except ValueError as e:
        assert "parity" in str(e)
    else:
        raise AssertionError("c1-only rates must not produce a headline")


def test_zc_ladder_multi_batch_pins_lane_safe_chunk(monkeypatch):
    """With mixed batches a ladder rung pins ONE zc for every batch,
    so it must start from the SMALLEST auto chunk (the largest
    batch's — the only pin inside the lane budget at every batch);
    rungs above it are programs the budget already forbids, each a
    30-90 s child probe wasted at service startup."""
    _fake_tpu(monkeypatch)
    calls = []

    def fake_run(cmd, **k):
        specs = [a for a in cmd if a.startswith("combo")]
        calls.append(specs)
        if specs == ["combo"]:
            return _Proc("", 0, stderr="fail combo XlaRuntimeError: x\n")
        return _Proc(f"ok {specs[0]}\n", 0)

    # batches 128 and 2048: auto chunks are 8 and 4 -> first rung
    # must be combo@2 (half of min=4), never combo@4 (= half of
    # max=8, which is 8192 lanes at 2048 -- already the bare probe).
    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("combo",), batch=[128, 2048])
    assert out == ["combo@2"]
    assert calls == [["combo"], ["combo@2"]]


def test_zc_ladder_mixed_batches_retries_pinned_one(monkeypatch):
    """min(auto)=1 with bigger chunks at small batches: the bare probe
    never ran zc=1 at the SMALL batches, so the ladder still owes one
    rung pinning zc=1 everywhere before giving the tail up."""
    _fake_tpu(monkeypatch)
    calls = []

    def fake_run(cmd, **k):
        specs = [a for a in cmd if a.startswith("combo")]
        calls.append(specs)
        if specs == ["combo"]:
            return _Proc("", 0, stderr="fail combo XlaRuntimeError: x\n")
        return _Proc(f"ok {specs[0]}\n", 0)

    # batches 128 and 8192: auto chunks are 8 and 1.
    monkeypatch.setattr(subprocess, "run", fake_run)
    out = mosaic_gate.gate_fused_variants(("combo",), batch=[128, 8192])
    assert out == ["combo@1"]
    assert calls == [["combo"], ["combo@1"]]
